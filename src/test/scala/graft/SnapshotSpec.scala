package graft

import graft.catalog.BucketCatalog
import graft.core.TimeBucketKey
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicReference

/** Snapshot isolation + write serialization of the manifest-committed
  * catalog: readers pinned to a manifest version survive concurrent
  * partition rewrites (the reference serializes this visibility
  * through its WAL'd single server process, executor/wal.go:29-45);
  * concurrent in-process writers cannot lose acknowledged rows.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-snap").toString

  private val schema = StructType(Seq(
    StructField("Epoch", LongType), StructField("V", DoubleType)))

  test("reader never fails or sees a torn snapshot across partition swaps") {
    val root = freshRoot()
    val cat = new BucketCatalog(spark, root)
    val tbk = TimeBucketKey.parse("SNAP/1Min/ISO")
    cat.create(tbk, schema, isVariable = false)
    // seed: epochs 1..50 across two year partitions (1970 + 2021)
    val y2021 = 1609459200L
    def batch(vs: Range, bias: Double) =
      vs.map(i => (if (i % 2 == 0) i * 60L else y2021 + i * 60L, bias + i)).toDF("Epoch", "V")
    cat.write(tbk, batch(1 to 50, 0.0))

    val failure = new AtomicReference[Throwable](null)
    @volatile var writerDone = false
    val reader = new Thread(() => {
      try {
        while (!writerDone && failure.get == null) {
          // every read must see a complete snapshot: exactly 50 keys,
          // and one single batch's bias across all of them (a torn read
          // mixing two commits would mix biases)
          val rows = cat.read(tbk).select("Epoch", "V").collect()
          assert(rows.length == 50, s"saw ${rows.length} rows")
          val biases = rows.map(r => r.getDouble(1) - (r.getLong(0) match {
            case e if e >= y2021 => (e - y2021) / 60
            case e => e / 60
          })).distinct
          assert(biases.length == 1, s"torn snapshot: biases ${biases.toSeq}")
        }
      } catch { case t: Throwable => failure.set(t) }
    })
    reader.start()
    // writer: full-keyset rewrites with a changing bias + range deletes
    // that rewrite one year partition
    (1 to 8).foreach { i =>
      cat.write(tbk, batch(1 to 50, i * 1000.0))
      cat.deleteRange(tbk, y2021 + 51 * 60L, 0, y2021 + 52 * 60L) // no-op range, same commit path
    }
    writerDone = true
    reader.join(60000)
    assert(failure.get == null, s"reader failed: ${failure.get}")
    val finalRows = cat.read(tbk).collect()
    assert(finalRows.length == 50)
    assert(finalRows.map(_.getAs[Double]("V")).forall(_ >= 8000.0))
  }

  test("concurrent writers to one bucket lose no acknowledged rows") {
    val root = freshRoot()
    val cat = new BucketCatalog(spark, root)
    val tbk = TimeBucketKey.parse("CONC/1Min/WRITES")
    cat.create(tbk, schema, isVariable = false)
    val failure = new AtomicReference[Throwable](null)
    // two writers interleave disjoint epoch ranges; without the
    // per-group write lock both merge from the same old snapshot and
    // the second manifest flip drops the first writer's rows
    def writer(offset: Long): Thread = new Thread(() => {
      try (1 to 5).foreach { i =>
        cat.write(tbk, Seq((offset + i * 60L, offset + i.toDouble)).toDF("Epoch", "V"))
      } catch { case t: Throwable => failure.set(t) }
    })
    val (w1, w2) = (writer(0L), writer(1000000L))
    w1.start(); w2.start(); w1.join(120000); w2.join(120000)
    assert(failure.get == null, s"writer failed: ${failure.get}")
    val got = cat.read(tbk).select("Epoch").collect().map(_.getLong(0)).toSet
    val want = (1 to 5).flatMap(i => Seq(i * 60L, 1000000L + i * 60L)).toSet
    assert(got == want, s"missing: ${want -- got}")
  }

  test("vacuum retains superseded files for the grace window, then deletes them") {
    val root = freshRoot()
    val cat = new BucketCatalog(spark, root)
    val tbk = TimeBucketKey.parse("VAC/1Min/GRACE")
    cat.create(tbk, schema, isVariable = false)
    def filesOnDisk(): Set[String] = {
      val dir = java.nio.file.Path.of(root, "GRACE")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p))
        .map(_.toString).filter(_.endsWith(".parquet")).toSet
    }
    cat.write(tbk, Seq((60L, 1.0)).toDF("Epoch", "V"))
    val gen1 = filesOnDisk()
    cat.write(tbk, Seq((60L, 2.0)).toDF("Epoch", "V")) // v2: gen1 superseded
    assert(gen1.subsetOf(filesOnDisk()), "superseded files must survive the grace window")
    cat.write(tbk, Seq((60L, 3.0)).toDF("Epoch", "V")) // v3
    cat.write(tbk, Seq((60L, 4.0)).toDF("Epoch", "V")) // v4: vacuums v2's removed = gen1
    assert(gen1.intersect(filesOnDisk()).isEmpty, "grace-expired files must be vacuumed")
    assert(cat.read(tbk).head().getAs[Double]("V") == 4.0)
  }

  test("time travel: readGroupAt pins a retained version, refuses vacuumed ones") {
    val root = freshRoot()
    val cat = new BucketCatalog(spark, root)
    val tbk = TimeBucketKey.parse("TT/1Min/TRAVEL")
    cat.create(tbk, schema, isVariable = false)
    // four generations of the same key, biases 1..4 → manifests v1..v4
    (1 to 4).foreach(i => cat.write(tbk, Seq((60L, i.toDouble)).toDF("Epoch", "V")))
    assert(cat.manifestVersions("TRAVEL") == Seq(1L, 2L, 3L, 4L))
    // current + grace window (VacuumGraceCommits = 2): v3 and v4 readable
    def vAt(v: Long): Double =
      cat.readGroupAt("TRAVEL", v).get.head().getAs[Double]("V")
    assert(vAt(4L) == 4.0 && vAt(3L) == 3.0)
    // v1's files were vacuumed at the v4 commit (v4 - grace = v2's
    // removed set = v1's files) — refused with a clear error, and the
    // error names the loss instead of failing mid-query
    val e = intercept[IllegalStateException](cat.readGroupAt("TRAVEL", 1L))
    assert(e.getMessage.contains("vacuum grace window"))
    // unknown versions are a different, explicit error
    intercept[IllegalArgumentException](cat.readGroupAt("TRAVEL", 99L))
  }

  test("incremental manifests: delta bytes stay flat as the file count grows") {
    val root = freshRoot()
    val cat = new BucketCatalog(spark, root)
    // 20 commits, each adding a NEW symbol partition: the live file
    // count grows every commit, so a full-snapshot-per-commit design
    // would write O(total files) JSON each time
    (1 to 20).foreach { i =>
      cat.write(TimeBucketKey.parse(f"S$i%03d/1Min/INC"),
        Seq((60L, i.toDouble)).toDF("Epoch", "V"))
    }
    val dir = java.nio.file.Path.of(root, "INC", BucketCatalog.ManifestDir)
    import scala.jdk.CollectionConverters._
    val byVersion = java.nio.file.Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .map(p => p.getFileName.toString.stripSuffix(".json").toLong ->
        java.nio.file.Files.size(p)).toMap
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def kindOf(v: Long): String = {
      val n = om.readTree(java.nio.file.Files.readAllBytes(
        dir.resolve(f"$v%015d.json"))).get("kind")
      if (n == null) "snapshot" else n.asText()
    }
    val (snaps, deltas) = byVersion.keys.toSeq.sorted.partition(v => kindOf(v) == "snapshot")
    assert(snaps.nonEmpty && deltas.nonEmpty, s"want both kinds, got snaps=$snaps")
    // checkpoints at v = 1, 9, 17 with the default cadence
    assert(snaps.forall(v => (v - 1) % BucketCatalog.ManifestCheckpointEvery == 0))
    // a delta's bytes must NOT grow with the live file count: the
    // newest delta (19 files live) stays within noise of the first
    // (1 file live), while snapshots do grow
    val firstDelta = byVersion(deltas.min)
    val lastDelta = byVersion(deltas.max)
    assert(lastDelta <= firstDelta * 2,
      s"delta grew with file count: v${deltas.min}=$firstDelta B → v${deltas.max}=$lastDelta B")
    assert(byVersion(snaps.max) > lastDelta,
      "late snapshot should outweigh a delta on a grown corpus")
    // resolution: live state covers all 20 symbols, and time travel
    // works across the checkpoint boundary (v17 snapshot): a delta
    // version before it, the checkpoint itself, and a delta after
    assert(cat.listSymbols("INC").size == 20)
    for (v <- Seq(16L, 17L, 18L)) {
      val syms = cat.readGroupAt("INC", v).get
        .select("symbol").distinct().count()
      assert(syms == v, s"v$v resolved $syms symbols")
    }
  }

  test("a reader pinned past the grace window is refused cleanly under concurrent vacuum") {
    val root = freshRoot()
    val cat = new BucketCatalog(spark, root)
    val tbk = TimeBucketKey.parse("PIN/1Min/PINNED")
    cat.create(tbk, schema, isVariable = false)
    cat.write(tbk, Seq((60L, 0.0)).toDF("Epoch", "V"))
    val failure = new AtomicReference[Throwable](null)
    val refusals = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var writerDone = false
    val reader = new Thread(() => {
      try {
        while (!writerDone && failure.get == null) {
          val vs = cat.manifestVersions("PINNED")
          if (vs.nonEmpty) {
            // within-grace pin: materializes while the writer vacuums
            cat.readGroupAt("PINNED", vs.max).foreach { df => df.collect(); () }
            // a pin past the grace window must get the clean refusal
            // (never a mid-query parquet FileNotFound): probe the
            // OLDEST retained version once it is provably beyond
            // grace (its replaced files vacuumed by now — the
            // contract only promises safety within the window)
            if (vs.max - vs.min > BucketCatalog.VacuumGraceCommits + 2) try {
              cat.readGroupAt("PINNED", vs.min).foreach { df => df.count(); () }
            } catch {
              case e: IllegalStateException
                  if e.getMessage.contains("vacuum grace window") =>
                refusals.incrementAndGet()
              case _: IllegalArgumentException => () // pruned between list and read
            }
          }
        }
      } catch { case t: Throwable => failure.set(t) }
    })
    reader.start()
    // every commit replaces the single key's file, so versions fall
    // out of grace (and get vacuumed) as fast as commits land
    (1 to 20).foreach(i => cat.write(tbk, Seq((60L, i.toDouble)).toDF("Epoch", "V")))
    writerDone = true
    reader.join(120000)
    assert(failure.get == null, s"reader failed uncleanly: ${failure.get}")
    assert(refusals.get > 0, "the past-grace refusal path never fired")
  }

  test("destroy removes the bucket from the snapshot immediately") {
    val root = freshRoot()
    val cat = new BucketCatalog(spark, root)
    cat.write(TimeBucketKey.parse("A/1Min/DST"), Seq((60L, 1.0)).toDF("Epoch", "V"))
    cat.write(TimeBucketKey.parse("B/1Min/DST"), Seq((60L, 2.0)).toDF("Epoch", "V"))
    cat.destroy(TimeBucketKey.parse("A/1Min/DST"))
    // physical files of A may persist through the grace window, but the
    // snapshot (listSymbols + reads) must not show them
    assert(cat.listSymbols("DST") == Seq("B"))
    assert(cat.read(TimeBucketKey.parse("B/1Min/DST")).count() == 1)
    assert(cat.readGroup("DST").get.select("symbol").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("B"))
  }

  test("TimeBucketKey rejects injection-prone characters") {
    TimeBucketKey.parse("BRK.A/1Min/OHLC-V") // dots/dashes fine
    TimeBucketKey.parse("A,B/1Min/X")        // comma lists fine
    TimeBucketKey.parse("*/1Min/X")          // wildcard fine
    intercept[IllegalArgumentException](TimeBucketKey.parse("A\"B/1Min/X"))
    intercept[IllegalArgumentException](TimeBucketKey.parse("A\\B/1Min/X"))
    intercept[IllegalArgumentException](TimeBucketKey.parse("A B/1Min/X"))
    intercept[IllegalArgumentException](TimeBucketKey.parse("//X"))
  }
}
