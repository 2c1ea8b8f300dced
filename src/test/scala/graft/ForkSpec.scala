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

  test("cross-process appends survive concurrent refreshes and compactions from this JVM (no loss, no dup, no protocol leftovers)") {
    val root = Files.createTempDirectory("graft-fork").toString
    val idxPath = s"$root/idx"
    val ready = s"$root/ready"
    val childLog = new java.io.File(s"$root/child.log")
    val trig = new graft.streaming.IvfIndexTrigger(
      spark, IvfFixtures.cents, idxPath)
    trig.fire("V/1Sec/EMB", IvfFixtures.batch(spark, 0))

    val childOffsets = Seq(1000, 2000, 3000, 4000, 5000)
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
    // same module opens the build gives every forked Spark JVM
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
      "-cp", System.getProperty("java.class.path"),
      "graft.ForkedIvfAppender",
      idxPath, childOffsets.mkString(","), ready)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(childLog)
    val proc = pb.start()
    try {
      // wait out the child's Spark bootstrap: its FIRST append marks ready
      val deadline = System.currentTimeMillis() + 180000L
      while (!Files.exists(Paths.get(ready)) && proc.isAlive &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(Files.exists(Paths.get(ready)),
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
}
