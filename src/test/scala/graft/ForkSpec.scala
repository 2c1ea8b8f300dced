package graft

import java.nio.file.{Files, Paths}

/** Two-JVM protocol smoke: the IVF seal/ticket fence exercised across
  * a REAL process boundary — a forked child JVM appends batches into
  * the shared index root while this JVM publishes (blue/green
  * refreshes and compactions) against it concurrently. The in-JVM
  * TriggerSpec races are faithful to the on-disk protocol, but only a
  * genuine fork proves no JVM-global state (the seal heartbeat
  * scheduler, per-index monitors, in-process locks) is accidentally
  * doing the fencing.
  */
class ForkSpec extends SparkSpec {

  private def slurp(f: java.io.File): String =
    if (f.exists()) new String(Files.readAllBytes(f.toPath)).takeRight(4000)
    else "<no log>"

  /** Fork a test-classpath main in a fresh JVM with the same module
    * opens the build gives every forked Spark JVM; stdout+stderr to
    * `log`.
    */
  private def forkMain(mainClass: String, log: java.io.File,
      args: String*): Process = {
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"), mainClass) ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(log)
    pb.start()
  }

  private def awaitFile(path: String, proc: Process, timeoutMs: Long): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!Files.exists(Paths.get(path)) && proc.isAlive &&
           System.currentTimeMillis() < deadline) Thread.sleep(100)
    Files.exists(Paths.get(path))
  }

  test("cross-process appends survive concurrent refreshes and compactions from this JVM (no loss, no dup, no protocol leftovers)") {
    val root = Files.createTempDirectory("graft-fork").toString
    val idxPath = s"$root/idx"
    val ready = s"$root/ready"
    val childLog = new java.io.File(s"$root/child.log")
    val trig = new graft.streaming.IvfIndexTrigger(
      spark, IvfFixtures.cents, idxPath)
    trig.fire("V/1Sec/EMB", IvfFixtures.batch(spark, 0))

    val childOffsets = Seq(1000, 2000, 3000, 4000, 5000)
    val proc = forkMain("graft.ForkedIvfAppender", childLog,
      idxPath, childOffsets.mkString(","), ready)
    try {
      // wait out the child's Spark bootstrap: its FIRST append marks ready
      assert(awaitFile(ready, proc, 180000L),
        s"child never appended (alive=${proc.isAlive}); log:\n${slurp(childLog)}")
      // publish repeatedly from THIS process while the child appends:
      // each publish seals, drains the child's live tickets, rebuilds,
      // flips — and the child's backed-off fires land in the new
      // generations under their persisted quantizers
      trig.refreshQuantizer(trainIters = 1)
      trig.compact()
      trig.refreshQuantizer(trainIters = 1)
      assert(proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        s"child did not exit; log:\n${slurp(childLog)}")
      assert(proc.exitValue() == 0,
        s"child exited ${proc.exitValue()}; log:\n${slurp(childLog)}")
      // one more publish after the child finished, so every batch has
      // crossed at least one snapshot/flip since it was appended
      trig.compact()
      val fresh = trig.currentQuantizer
      val all = (0 +: childOffsets)
        .map(o => IvfFixtures.batch(spark, o)).reduce(_ unionByName _)
      assert(IvfFixtures.rowsOf(trig.index) ==
        IvfFixtures.rowsOf(graft.ops.Similarity.ivfIndex(all, fresh)),
        s"cross-process interleaving lost or duplicated rows; child log:\n${slurp(childLog)}")
      // protocol hygiene across the boundary: no seal or tickets left
      val leftovers = IvfFixtures.protocolLeftovers(spark, idxPath)
      assert(leftovers.isEmpty, s"seal/ticket leftovers: $leftovers")
    } finally {
      proc.destroyForcibly()
      ()
    }
  }

  test("cross-process ticket renewal + ack fence: a stalled-but-RENEWING forked appender parks this JVM's drain for the whole write and is acked through the fence — no recovery, no loss, no dup") {
    val root = Files.createTempDirectory("graft-fork-renew").toString
    val idxPath = s"$root/idx"
    val ready = s"$root/ready"
    val stalling = s"$root/stalling"
    val childLog = new java.io.File(s"$root/child.log")
    // the lease clock every participant on this root must share (the
    // class-doc rule); 3x past it is the stall the r12 in-JVM heartbeat
    // test uses — but here the renewal scheduler, the mtime clock and
    // the ack fence all live in the CHILD JVM while the sealing,
    // draining publisher lives in THIS one: only the filesystem spans
    // them, so a renewal accidentally carried by JVM-global state
    // (in-process lastTouch, shared schedulers) cannot pass this.
    val expiry = 4000L
    val stall = 3 * expiry
    val trig = new graft.streaming.IvfIndexTrigger(
      spark, IvfFixtures.cents, idxPath, ticketExpiryMs = expiry)
    trig.fire("V/1Sec/EMB", IvfFixtures.batch(spark, 0))
    val proc = forkMain("graft.ForkedIvfAppender", childLog,
      idxPath, "1000,2000", ready, expiry.toString, stall.toString, stalling)
    try {
      assert(awaitFile(ready, proc, 180000L),
        s"child never appended (alive=${proc.isAlive}); log:\n${slurp(childLog)}")
      // the child is now inside its LAST append's stalled window:
      // ticket visible and renewing, parquet write not yet started
      assert(awaitFile(stalling, proc, 180000L),
        s"child never reached the stall (alive=${proc.isAlive}); log:\n${slurp(childLog)}")
      val t0 = System.currentTimeMillis()
      // seals, then drains THROUGH the child's stalled-but-renewing
      // write: pre-r12 semantics would presume the child dead at one
      // expiry and snapshot without its batch
      trig.refreshQuantizer(trainIters = 1)
      val waited = System.currentTimeMillis() - t0
      assert(waited >= stall - 2000L,
        s"the drain proceeded after ${waited}ms — it did not wait out the " +
          s"child's ${stall}ms stalled write (renewal not honored cross-process)")
      assert(proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        s"child did not exit; log:\n${slurp(childLog)}")
      assert(proc.exitValue() == 0,
        s"child exited ${proc.exitValue()}; log:\n${slurp(childLog)}")
      // the child's ack fence judged a CLEAN renewal: no recovery ran
      // (a lapse would have tripped the fence and self-healed — rows
      // would still match, which is why the log is the discriminator)
      assert(slurp(childLog).contains("FORKED_APPENDER_DONE recoveries=0"),
        s"the child's ack fence tripped — renewal lapsed across the " +
          s"process boundary; log:\n${slurp(childLog)}")
      // one more flip so the stalled batch crosses a snapshot, then
      // the relation must equal a full rebuild — no loss, no dup
      trig.compact()
      val all = Seq(0, 1000, 2000)
        .map(o => IvfFixtures.batch(spark, o)).reduce(_ unionByName _)
      assert(IvfFixtures.rowsOf(trig.index) ==
        IvfFixtures.rowsOf(graft.ops.Similarity.ivfIndex(all, trig.currentQuantizer)),
        s"the stalled cross-process batch was lost or duplicated; child log:\n${slurp(childLog)}")
      val leftovers = IvfFixtures.protocolLeftovers(spark, idxPath)
      assert(leftovers.isEmpty, s"seal/ticket leftovers: $leftovers")
    } finally {
      proc.destroyForcibly()
      ()
    }
  }

  test("cross-process catalog writers: a live foreign group lease refuses this JVM's writes; other groups proceed in parallel; the foreign rows read back") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.nolock.impl", classOf[NoLockFileSystem].getName)
    val root = Files.createTempDirectory("graft-fork-cat").toString
    val ready = s"$root.ready"
    val childLog = new java.io.File(s"$root.child.log")
    // the child is a REAL foreign writer on the LSE group of a shared
    // no-lock root (object-store shape — no OS byte-range locks, the
    // lease carries the single-writer contract): its writer id, lease
    // heartbeats and claim files live in another JVM
    val n = 8
    val proc = forkMain("graft.ForkedGroupWriter", childLog,
      "nolock:" + root, "AAPL/1Min/LSE", n.toString, ready)
    try {
      assert(awaitFile(ready, proc, 180000L),
        s"child never wrote (alive=${proc.isAlive}); log:\n${slurp(childLog)}")
      val cat = new graft.catalog.BucketCatalog(spark, "nolock:" + root)
      // (1) the child's lease on LSE is LIVE (its ts stays fresh for a
      // full expiry even if the child finishes early — no isAlive
      // race on a loaded box): this JVM's write to that group must
      // refuse rather than split-brain the group
      val e = intercept[IllegalStateException] {
        cat.write(graft.core.TimeBucketKey.parse("MSFT/1Min/LSE"),
          Seq((60L, 9.0, 9.5)).toDF("Epoch", "Open", "Close"))
      }
      assert(e.getMessage.contains("live lease"), e.getMessage)
      // (2) a DIFFERENT group of the same root proceeds in parallel
      // while the foreign writer is live — per-group leases, not a
      // root-wide writer
      val nyse = graft.core.TimeBucketKey.parse("IBM/1Min/NYSE")
      cat.create(nyse, ForkedGroupWriter.ohlcv, isVariable = false)
      cat.write(nyse, Seq((60L, 2.0, 2.5)).toDF("Epoch", "Open", "Close"))
      assert(cat.read(nyse).count() == 1)
      // (3) the foreign writer's commits read back exactly from this
      // process once it exits — manifest resolution is process-agnostic
      assert(proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        s"child did not exit; log:\n${slurp(childLog)}")
      assert(proc.exitValue() == 0,
        s"child exited ${proc.exitValue()}; log:\n${slurp(childLog)}")
      val got = cat.read(graft.core.TimeBucketKey.parse("AAPL/1Min/LSE"))
        .orderBy("Epoch").collect()
        .map(r => (r.getAs[Long]("Epoch"), r.getAs[Double]("Open"))).toSeq
      assert(got == (0 until n).map(i => (60L * (i + 1), 1.0 + i)),
        s"foreign rows did not read back: $got")
    } finally {
      proc.destroyForcibly()
      ()
    }
  }
}
