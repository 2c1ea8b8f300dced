package graft

import graft.catalog.{BucketCatalog, Integrity, ReplicaSync}
import graft.core.TimeBucketKey
import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** Sustained-ingest soak: many successive commits against one bucketed
  * group WITH the maintenance machinery running concurrently — replica
  * tailing on its own thread, a reader re-pinning snapshots on
  * another, vacuum and bounded compaction firing naturally as the
  * history grows, and periodic late data exercising the merge path
  * between appends. IngestProbe proves per-commit cost; this proves
  * the pieces don't corrupt each other when they overlap, which is the
  * operating mode of a real deployment.
  */
class SoakSpec extends SparkSpec {
  import spark.implicits._

  test("ingest soak: appends + late merges with concurrent replica sync and pinned readers; integrity, bounded files, replica convergence") {
    val primary = Files.createTempDirectory("graft-soak-p").toString
    val replica = Files.createTempDirectory("graft-soak-r").toString
    val nSym = 400
    val commits = 100
    val base = 1609459200L
    val cat = new BucketCatalog(spark, primary)

    val done = new AtomicBoolean(false)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

    // replica tail loop — applies whatever commits landed since its
    // marker; mid-copy vacuum races are converged by the next pass
    val syncer = new ReplicaSync(spark, primary, replica)
    val syncThread = new Thread(() => {
      while (!done.get()) {
        try syncer.sync()
        catch { case t: Throwable => errors.add(t) }
        Thread.sleep(200)
      }
    }, "soak-replica")

    // reader loop — re-pins a fresh snapshot each pass (the documented
    // reader contract: pin, read promptly; grace-window vacuum keeps
    // the pinned files alive) and checks monotone visibility: this
    // workload never deletes rows, so a later snapshot can never show
    // fewer than an earlier one
    val readerCat = new BucketCatalog(spark, primary)
    val lastSeen = new AtomicLong(0L)
    val readerTbk = TimeBucketKey.parse("S7/1Min/BARS")
    val readThread = new Thread(() => {
      while (!done.get()) {
        try {
          val n = readerCat.read(readerTbk).count()
          val prev = lastSeen.getAndSet(n)
          if (n < prev)
            errors.add(new IllegalStateException(
              s"snapshot went backwards: $prev -> $n rows"))
        } catch { case t: Throwable => errors.add(t) }
        Thread.sleep(150)
      }
    }, "soak-reader")

    syncThread.start()
    // let the first commits land before the reader pins anything
    val expected = scala.collection.mutable.Map[(String, Long), Double]()
    (1 to commits).foreach { c =>
      val fresh = (1 to nSym).map(i => (s"S$i", base + c * 60L, i * 1.0 + c))
      // every 10th commit also REWRITES a 5-commits-old minute with new
      // values — the late-data merge path (and, over time, compaction)
      // interleaved with the append fast path
      val late =
        if (c % 10 == 0 && c > 5)
          (1 to nSym).map(i => (s"S$i", base + (c - 5) * 60L, -1.0 * c - i))
        else Seq.empty
      val batch = (fresh ++ late).toDF("symbol", "Epoch", "V")
      cat.writeMulti("BARS", "1Min", batch)
      (fresh ++ late).foreach { case (s, e, v) => expected((s, e)) = v }
      if (c == 3) readThread.start()
    }
    done.set(true)
    syncThread.join(30000)
    readThread.join(30000)
    Option(errors.peek()).foreach(_.printStackTrace())
    assert(errors.isEmpty,
      s"concurrent maintenance errored: ${errors.size()} first=${errors.peek()}")
    assert(lastSeen.get() > 0, "reader never observed data")

    // integrity: every (symbol, timeframe, year) partition clean
    val report = Integrity.check(spark, primary).collect()
    assert(report.nonEmpty && report.forall(_.getAs[Boolean]("ok")),
      s"integrity violations: ${report.filterNot(_.getAs[Boolean]("ok")).take(3).mkString("; ")}")

    // bounded smallfiles: no partition above the compaction ceiling
    val perPart = cat.liveFiles("BARS").get
      .groupBy(f => f.substring(0, f.lastIndexOf('/'))).view.mapValues(_.size)
    assert(perPart.values.forall(_ <= BucketCatalog.CompactAtFiles),
      s"file count unbounded: ${perPart.maxBy(_._2)}")

    // primary content == the last-write-wins expectation
    val got = cat.readMulti("BARS", "1Min")
      .select("symbol", "Epoch", "V").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size == expected.size, s"${got.size} vs ${expected.size} keys")
    assert(got == expected.toMap, "primary rows diverge from last-write-wins")

    // quiesced convergence: drain the tail, then the replica read
    // equals the primary read exactly
    var applied = 1
    while (applied > 0) applied = syncer.sync()
    val rep = new BucketCatalog(spark, replica).readMulti("BARS", "1Min")
      .select("symbol", "Epoch", "V").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    if (rep != got) {
      val miss = (got.toSet -- rep.toSet).take(3)
      val extra = (rep.toSet -- got.toSet).take(3)
      fail(s"replica diverged: missing=$miss extra=$extra sizes ${rep.size}/${got.size}")
    }
  }
}
