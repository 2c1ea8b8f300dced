package graft

import graft.catalog.BucketCatalog
import graft.core.TimeBucketKey
import graft.streaming.{DownsampleCascade, IngestPipeline, Trigger, TriggerRegistry}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import scala.collection.mutable

/** Trigger registry + ingest pipeline: glob-matched dispatch after the
  * write (plugins/trigger/trigger.go + executor/written.go), with the
  * downsample cascade registered as an ordinary trigger.
  */
class TriggerSpec extends SparkSpec {
  import spark.implicits._

  private val ohlcv = StructType(Seq(
    StructField("Epoch", LongType), StructField("Open", DoubleType),
    StructField("High", DoubleType), StructField("Low", DoubleType),
    StructField("Close", DoubleType), StructField("Volume", DoubleType)))

  test("triggers fire only for matching TBK patterns, after the write") {
    val root = Files.createTempDirectory("graft-trig").toString
    val cat = new BucketCatalog(spark, root)
    cat.create(TimeBucketKey.parse("X/1Min/OHLCV"), ohlcv, isVariable = false)
    val registry = new TriggerRegistry
    val fired = mutable.ArrayBuffer[String]()
    registry.register("*/1Min/OHLCV", new Trigger {
      def fire(tbk: String, batch: DataFrame): Unit = synchronized {
        // write already durable when the trigger observes it
        assert(cat.read(TimeBucketKey.parse(tbk)).count() > 0)
        fired += tbk
      }
    })
    registry.register("*/5Min/*", (tbk: String, _: DataFrame) => fired += s"WRONG:$tbk")
    // downsample cascade as a registered trigger
    val cascade = new DownsampleCascade(cat, "OHLCV", "1Min", Seq("5Min"))
    registry.register("*/1Min/OHLCV",
      (_: String, batch: DataFrame) => cascade.cascade(batch.select("symbol", "Epoch")))

    val pipe = new IngestPipeline(cat, registry)
    val t0 = 1704708000L
    pipe.ingest(TimeBucketKey.parse("AAPL/1Min/OHLCV"),
      Seq((t0, 10.0, 10.5, 9.5, 10.2, 1.0), (t0 + 60, 11.0, 11.5, 10.5, 11.2, 2.0))
        .toDF("Epoch", "Open", "High", "Low", "Close", "Volume"))

    assert(fired.toSeq == Seq("AAPL/1Min/OHLCV"))
    val fiveMin = cat.read(TimeBucketKey.parse("AAPL/5Min/OHLCV")).collect()
    assert(fiveMin.length == 1 && fiveMin.head.getAs[Double]("Volume") == 3.0)
  }

  test("IVF index maintenance as an on-write trigger: delta appends == full rebuild, serving exact at full probe") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-trig-ivf").toString
    val cat = new BucketCatalog(spark, root)
    val registry = new TriggerRegistry
    // frozen quantizer: 4 fixed 8-dim centroids (retraining would
    // invalidate the index — the documented IVF contract)
    val cents: Array[Seq[Float]] = Array(
      Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f),
      Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f), Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f))
    val idxPath = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString + "/idx"
    val trig = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath)
    registry.register("*/1Sec/EMB", trig)
    val pipe = new IngestPipeline(cat, registry)
    def mkBatch(off: Int, n: Int) = (0 until n).map { i =>
      (1704708000L + off + i, (off + i).toLong,
        (0 until 8).map(d => ((off + i) * 7 + d * 3) % 11 * (if (d % 2 == 0) 1f else -1f)))
    }.toDF("Epoch", "vec_id", "embedding")
    // two ingests through the engine's own write path — the trigger
    // assigns each batch under the frozen quantizer and appends
    pipe.ingest(TimeBucketKey.parse("V/1Sec/EMB"), mkBatch(0, 60))
    pipe.ingest(TimeBucketKey.parse("V/1Sec/EMB"), mkBatch(1000, 40))
    val all = mkBatch(0, 60).unionByName(mkBatch(1000, 40)).select("vec_id", "embedding")
    // index == full rebuild, row-identical (frozen-quantizer determinism)
    val got = trig.index.orderBy("vec_id").collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Long]("vec_id"))).toSeq
    val want = graft.ops.Similarity.ivfIndex(all, cents).orderBy("vec_id").collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Long]("vec_id"))).toSeq
    assert(got == want, s"index diverges from rebuild: ${got.diff(want).take(3)}")
    // serving at full probe from the index == exhaustive search
    val queries = all.filter(col("vec_id") < 3)
    val served = trig.topK(queries, k = 5, nProbe = cents.length)
      .orderBy("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val brute = graft.ops.Similarity.bruteForceTopK(all, queries, 5)
      .orderBy("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served == brute, s"served top-k diverges from exhaustive")
  }

  test("IVF index compaction: generations bound file count; relation and serving unchanged; resolution is generation-aware") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cents: Array[Seq[Float]] = Array(
      Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f),
      Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f), Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f))
    val idxPath = java.nio.file.Files.createTempDirectory("graft-ivf-cpt").toString + "/idx"
    // auto-compact every 3 fires
    val trig = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath,
      compactEvery = 3)
    def batch(off: Int) = (0 until 20).map { i =>
      ((off + i).toLong, (0 until 8).map(d => ((off + i) * 7 + d * 3) % 11
        * (if (d % 2 == 0) 1f else -1f)))
    }.toDF("vec_id", "embedding")
    def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Int, Long)] =
      df.collect().map(r => (r.getAs[Int]("cell"), r.getAs[Long]("vec_id"))).toSet
    (0 until 7).foreach(b => trig.fire("V/1Sec/EMB", batch(b * 1000)))
    // 7 fires at compactEvery=3 -> two compactions happened; current
    // generation resolves and holds everything ingested
    val resolved = graft.streaming.IvfIndexTrigger.resolveIndexPath(spark, idxPath)
    assert(resolved != idxPath && resolved.contains("gen-"),
      s"index did not resolve to a generation: $resolved")
    val all = (0 until 7).map(b => batch(b * 1000)).reduce(_ unionByName _)
    assert(rowsOf(trig.index) == rowsOf(graft.ops.Similarity.ivfIndex(all, cents)),
      "compacted index diverged from full rebuild")
    // serving from the compacted index at full probe == exhaustive
    val q = all.filter(col("vec_id") < 3)
    val served = trig.topK(q, k = 5, nProbe = 4)
      .orderBy("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val brute = graft.ops.Similarity.bruteForceTopK(all, q, 5)
      .orderBy("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served == brute, "serving from the compacted index diverged")
    // file count bounded AT a compaction point: the fresh generation
    // holds <= |cells| data files however many fires preceded it (the
    // 7th fire above appended into the current gen — that growth is
    // what the next compact resets); at most one spent generation is
    // grace-retained
    trig.compact()
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val genDirs = fs.listStatus(new org.apache.hadoop.fs.Path(idxPath)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen-"))
    assert(genDirs.size <= 2, s"more than one grace generation: ${genDirs.map(_.getPath.getName)}")
    val cur = graft.streaming.IvfIndexTrigger.resolveIndexPath(spark, idxPath)
    val curFiles = fs.listStatus(new org.apache.hadoop.fs.Path(cur)).toSeq
      .count(s => s.isFile && s.getPath.getName.startsWith("part-"))
    assert(curFiles <= cents.length,
      s"compacted generation not file-bounded: $curFiles part files")
    // post-compaction appends land in the current generation
    trig.fire("V/1Sec/EMB", batch(9000))
    val all8 = all.unionByName(batch(9000))
    assert(rowsOf(trig.index) == rowsOf(graft.ops.Similarity.ivfIndex(all8, cents)),
      "append after compaction lost or duplicated rows")
  }

  test("blue/green quantizer refresh: rebuild == fresh build under the new quantizer; no serving gap; appends follow the new quantizer") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cents: Array[Seq[Float]] = Array(
      Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f),
      Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f), Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f))
    val idxPath = java.nio.file.Files.createTempDirectory("graft-ivf-bg").toString + "/idx"
    val trig = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath)
    def batch(off: Int) = (0 until 25).map { i =>
      ((off + i).toLong, (0 until 8).map(d => ((off + i) * 7 + d * 3) % 11
        * (if (d % 2 == 0) 1f else -1f)))
    }.toDF("vec_id", "embedding")
    def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Int, Long)] =
      df.collect().map(r => (r.getAs[Int]("cell"), r.getAs[Long]("vec_id"))).toSet
    (0 until 3).foreach(b => trig.fire("V/1Sec/EMB", batch(b * 1000)))
    val all = (0 until 3).map(b => batch(b * 1000)).reduce(_ unionByName _)
    val genBefore = graft.streaming.IvfIndexTrigger.resolveIndexPath(spark, idxPath)
    // refresh: retrain from the index's own vectors, rebuild, flip
    trig.refreshQuantizer(trainIters = 2)
    val fresh = trig.currentQuantizer
    assert(!(fresh.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq),
      "retraining on this corpus should move the centroids")
    // rebuild under the new quantizer == a fresh build over the same
    // vectors under the same centroids
    assert(rowsOf(trig.index) == rowsOf(graft.ops.Similarity.ivfIndex(all, fresh)),
      "refreshed index diverged from a fresh build under the new quantizer")
    // the flip is a new generation; the spent pair is grace-retained
    // so a reader that resolved pre-flip finishes on a complete OLD
    // (index, quantizer) pair — old or new, never mixed
    val genAfter = graft.streaming.IvfIndexTrigger.resolveIndexPath(spark, idxPath)
    assert(genAfter != genBefore, "refresh must flip to a new generation")
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (genBefore != idxPath) // flat pre-gen roots have no marker dir
      assert(fs.exists(new org.apache.hadoop.fs.Path(genBefore)),
        "the spent generation must be grace-retained")
    assert(rowsOf(spark.read.parquet(genAfter)) ==
      rowsOf(graft.ops.Similarity.ivfIndex(all, fresh)))
    // the new generation carries ITS OWN quantizer artifact — the
    // serving pair flips in one marker
    val qPath = graft.streaming.IvfIndexTrigger.resolveQuantizerPath(spark, idxPath)
    assert(qPath.exists(_.startsWith(genAfter)), s"quantizer not in the generation: $qPath")
    val loaded = graft.ops.Similarity.loadCentroids(spark.read.parquet(qPath.get))
    assert(loaded.map(_.toSeq).toSeq == fresh.map(_.toSeq).toSeq,
      "persisted generation quantizer != the live one")
    // serving continuity at full probe: exact before and after
    val q = all.filter(col("vec_id") < 3)
    val served = trig.topK(q, k = 5, nProbe = fresh.length)
      .orderBy("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val brute = graft.ops.Similarity.bruteForceTopK(all, q, 5)
      .orderBy("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served == brute, "serving across the flip diverged from exhaustive")
    // post-refresh appends are assigned under the NEW quantizer
    trig.fire("V/1Sec/EMB", batch(9000))
    val all4 = all.unionByName(batch(9000))
    assert(rowsOf(trig.index) == rowsOf(graft.ops.Similarity.ivfIndex(all4, fresh)),
      "append after refresh must assign under the new quantizer")
    // a trigger RECONSTRUCTED over the same path (process restart,
    // still configured with the ORIGINAL centroids) must adopt the
    // generation's persisted quantizer — assigning restart appends
    // under the stale constructor set would mix two quantizers
    // inside one generation and silently strand rows from probing
    val trig2 = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath)
    assert(trig2.currentQuantizer.map(_.toSeq).toSeq == fresh.map(_.toSeq).toSeq,
      "reconstructed trigger must restore the generation quantizer")
    trig2.fire("V/1Sec/EMB", batch(17000))
    val all5 = all4.unionByName(batch(17000))
    assert(rowsOf(trig2.index) == rowsOf(graft.ops.Similarity.ivfIndex(all5, fresh)),
      "restart append must assign under the restored quantizer")
    // refresh/compact on a never-fired trigger are documented no-ops,
    // not Path-does-not-exist crashes (a periodic maintenance job may
    // outrun the first ingest batch)
    val virgin = new graft.streaming.IvfIndexTrigger(spark, cents,
      java.nio.file.Files.createTempDirectory("graft-ivf-virgin").toString + "/idx")
    virgin.refreshQuantizer()
    virgin.compact()
    // topKAtRecall: a 1.0 contract calibrates to full probe on this
    // corpus and therefore answers exactly — the serving call carries
    // the recall contract end-to-end
    val servedAt = trig2.topKAtRecall(q, 5, recallFloor = 1.0)
      .orderBy("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bruteAt = graft.ops.Similarity.bruteForceTopK(all5, q, 5)
      .orderBy("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(servedAt == bruteAt, "topKAtRecall(1.0) must answer exactly")
    // path-level refresh (the wire job's body) on the SAME index:
    // another flip, still equivalent to a fresh build under the
    // now-current quantizer
    val nAfter = graft.streaming.IvfIndexTrigger.refreshPath(spark, idxPath,
      trainIters = 1)
    assert(nAfter.contains(4), s"refreshPath cells: $nAfter")
    val trig3 = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath)
    assert(rowsOf(trig3.index) ==
      rowsOf(graft.ops.Similarity.ivfIndex(all5, trig3.currentQuantizer)),
      "refreshPath result must equal a fresh build under its quantizer")
    // OUT-OF-BAND flip adoption by a LIVE instance (the wire job's
    // refreshPath running beside a registered trigger in another
    // process): after the external flip, the live trigger's next
    // fire must assign under the NEW generation's quantizer, not its
    // stale in-memory one — otherwise one generation would mix rows
    // assigned under two quantizers and probing would strand them
    val live = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath)
    graft.streaming.IvfIndexTrigger.refreshPath(spark, idxPath, trainIters = 2)
    live.fire("V/1Sec/EMB", batch(23000))
    val qLive = live.currentQuantizer
    val all6 = all5.unionByName(batch(23000))
    assert(rowsOf(live.index) == rowsOf(graft.ops.Similarity.ivfIndex(all6, qLive)),
      "a live instance must adopt an out-of-band flip before appending")
  }

  test("cross-process refresh vs append: a fire landing mid-refresh survives the flip (seal/ticket fence)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cents: Array[Seq[Float]] = Array(
      Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f),
      Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f), Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f))
    val idxPath = java.nio.file.Files.createTempDirectory("graft-ivf-race")
      .toString + "/idx"
    // "process A" = the live ingest trigger; "process B" = the
    // out-of-band refresher (the knn_ivf_refresh wire job). Separate
    // instances: the JVM instance lock does NOT span them — exactly
    // like two processes — so the only fence is the on-disk
    // seal/ticket protocol.
    val trigA = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath)
    val trigB = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath)
    def batch(off: Int) = (0 until 25).map { i =>
      ((off + i).toLong, (0 until 8).map(d => ((off + i) * 7 + d * 3) % 11
        * (if (d % 2 == 0) 1f else -1f)))
    }.toDF("vec_id", "embedding")
    // dup-sensitive row view (a Set would hide a double-counted batch)
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long)] =
      df.collect().map(r => (r.getAs[Int]("cell"), r.getAs[Long]("vec_id")))
        .sortBy(identity).toSeq
    trigA.fire("V/1Sec/EMB", batch(0))
    val waitsBefore = graft.streaming.IvfIndexTrigger.sealWaits.get()
    val fireDone = new java.util.concurrent.CountDownLatch(1)
    val fireErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    // the hook runs inside refreshQuantizer AFTER the seal + ticket
    // drain + corpus snapshot and BEFORE the flip — the exact window
    // where the pre-r11 race stranded acknowledged batches in the
    // grace generation (deleted one flip later). Path-filtered: suites
    // run in parallel in this JVM and another suite's refresh must not
    // consume or execute this test's interleaving.
    graft.streaming.IvfIndexTrigger.testHookMidRefresh = Some(p => if (p == idxPath) {
      val t = new Thread(() => {
        try trigA.fire("V/1Sec/EMB", batch(1000))
        catch { case e: Throwable => fireErr.set(e) }
        finally fireDone.countDown()
      })
      t.setDaemon(true)
      t.start()
      // the appender must OBSERVE the seal and back off — it may not
      // slip its batch into the sealed (already-snapshotted) generation
      val deadline = System.currentTimeMillis() + 30000L
      while (graft.streaming.IvfIndexTrigger.sealWaits.get() == waitsBefore &&
             System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(graft.streaming.IvfIndexTrigger.sealWaits.get() > waitsBefore,
        "the mid-refresh appender never hit the seal")
      // ... and the REFRESHING instance keeps SERVING while its own
      // rebuild is in flight: the publisher runs outside the instance
      // monitor, so a read from another thread must complete now, not
      // after the flip (pre-r11b this deadlocked until the refresh
      // finished)
      val served = new java.util.concurrent.atomic.AtomicInteger(-1)
      val reader = new Thread(() => served.set(
        trigB.topK(batch(0).filter(col("vec_id") < 2), k = 3, nProbe = 4).collect().length))
      reader.setDaemon(true)
      reader.start()
      reader.join(60000)
      assert(!reader.isAlive && served.get() == 6,
        s"serving must not park behind an in-flight refresh (got ${served.get()})")
    })
    try trigB.refreshQuantizer(trainIters = 1)
    finally graft.streaming.IvfIndexTrigger.testHookMidRefresh = None
    assert(fireDone.await(60, java.util.concurrent.TimeUnit.SECONDS),
      "the mid-refresh fire never completed after the flip")
    assert(fireErr.get() == null, s"mid-refresh fire failed: ${fireErr.get()}")
    // the late batch landed in the NEW generation under the NEW
    // quantizer: index == full rebuild over ALL batches, no loss, no
    // double count
    val fresh = trigB.currentQuantizer
    val all = batch(0).unionByName(batch(1000))
    assert(rowsOf(trigA.index) ==
      rowsOf(graft.ops.Similarity.ivfIndex(all, fresh)),
      "mid-refresh append lost or duplicated rows across the flip")
    // ... and it SURVIVES subsequent flips: pre-r11 the stranded batch
    // sat in the grace generation and was deleted when that retired
    trigB.compact()
    trigB.compact()
    assert(rowsOf(trigA.index) ==
      rowsOf(graft.ops.Similarity.ivfIndex(all, fresh)),
      "the mid-refresh batch must survive generation retirement")
    // protocol hygiene: no seal or tickets left behind anywhere
    val leftovers = IvfFixtures.protocolLeftovers(spark, idxPath)
    assert(leftovers.isEmpty, s"seal/ticket leftovers: $leftovers")
  }

  test("publisher snapshot-vs-seal window: a foreign flip between the monitor snapshot and the seal re-targets the refresh and no-ops the compaction — never a stale publish") {
    import IvfFixtures.{cents, rowsOf}
    val idxPath = java.nio.file.Files.createTempDirectory("graft-ivf-preseal")
      .toString + "/idx"
    // "process A" = live ingest + foreign publisher; "process R" = the
    // racing refresher. Separate instances — only the on-disk protocol
    // spans them.
    val trigA = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath)
    val trigR = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath)
    def batch(off: Int) = IvfFixtures.batch(spark, off)
    trigA.fire("V/1Sec/EMB", batch(0))
    // the hook fires inside trigR.refreshQuantizer AFTER it snapshots
    // the resolved generation, BEFORE it seals — land a whole foreign
    // publish (flip) plus a post-flip append in exactly that window.
    // Pre-fix, trigR would seal the RETIRED generation (the foreign
    // publisher unsealed it after flipping), rebuild only batch(0),
    // and publish that stale corpus as the next generation — silently
    // dropping batch(1000).
    graft.streaming.IvfIndexTrigger.testHookPreSeal = Some(p => if (p == idxPath) {
      graft.streaming.IvfIndexTrigger.testHookPreSeal = None // one-shot
      trigA.compact()                   // foreign flip retires `resolved`
      trigA.fire("V/1Sec/EMB", batch(1000)) // rows only the NEW generation has
    })
    try trigR.refreshQuantizer(trainIters = 1)
    finally graft.streaming.IvfIndexTrigger.testHookPreSeal = None
    val fresh = trigR.currentQuantizer
    val all = batch(0).unionByName(batch(1000))
    assert(rowsOf(trigR.index) ==
      rowsOf(graft.ops.Similarity.ivfIndex(all, fresh)),
      "refresh racing a foreign flip published a stale snapshot (lost the post-flip batch)")
    // ... and it survives retirement (a stale publish would strand the
    // post-flip batch in the grace generation, deleted one flip later)
    trigA.compact()
    trigA.compact()
    assert(rowsOf(trigR.index) ==
      rowsOf(graft.ops.Similarity.ivfIndex(all, trigR.currentQuantizer)),
      "the post-flip batch must survive generation retirement")

    // same window for COMPACT: the racer must no-op (the foreign
    // generation already bounds the file count), never publish stale
    val genBefore = graft.streaming.IvfIndexTrigger.resolveIndexPath(spark, idxPath)
    graft.streaming.IvfIndexTrigger.testHookPreSeal = Some(p => if (p == idxPath) {
      graft.streaming.IvfIndexTrigger.testHookPreSeal = None // one-shot
      trigA.refreshQuantizer(trainIters = 1) // foreign flip
      trigA.fire("V/1Sec/EMB", batch(2000))
    })
    try trigR.compact()
    finally graft.streaming.IvfIndexTrigger.testHookPreSeal = None
    val genAfter = graft.streaming.IvfIndexTrigger.resolveIndexPath(spark, idxPath)
    assert(genAfter != genBefore, "the foreign refresh must have flipped")
    val all3 = all.unionByName(batch(2000))
    assert(rowsOf(trigR.index) ==
      rowsOf(graft.ops.Similarity.ivfIndex(all3, trigR.currentQuantizer)),
      "compact racing a foreign flip must no-op, not publish a stale snapshot")
    // no seal or tickets left behind anywhere
    val leftovers = IvfFixtures.protocolLeftovers(spark, idxPath)
    assert(leftovers.isEmpty, s"seal/ticket leftovers: $leftovers")
  }

  test("ticket heartbeat renewal: an append outliving TicketExpiryMs under a draining publisher is still included; a crashed appender's stale ticket does not park the drain") {
    import IvfFixtures.{cents, rowsOf}
    val idxPath = java.nio.file.Files.createTempDirectory("graft-ivf-ticket")
      .toString + "/idx"
    // instance-level ticket expiry (suites run in parallel in this
    // JVM — mutating the process-wide default would misjudge other
    // suites' in-flight appends): generous enough that the ack fence
    // can only trip on a REAL renewal lapse, not a loaded-box
    // scheduling stall (renewal period = expiry/4 = 1 s)
    val expiry = 4000L
    val trigA = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath,
      ticketExpiryMs = expiry)
    val trigB = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath,
      ticketExpiryMs = expiry)
    def batch(off: Int) = IvfFixtures.batch(spark, off)
    trigA.fire("V/1Sec/EMB", batch(0))
    val refreshErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val refresher = new Thread(() =>
      try trigB.refreshQuantizer(trainIters = 1)
      catch { case e: Throwable => refreshErr.set(e) })
    refresher.setDaemon(true)
    try {
      val fs = new org.apache.hadoop.fs.Path(idxPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // the hook runs inside a CLEAR append attempt — ticket visible,
      // checks passed, write not yet started. Start the publisher NOW
      // (it seals, then drains) and stall the write 3× past the ticket
      // expiry: pre-r12 the drain presumed this appender dead at one
      // expiry, snapshotted WITHOUT the batch, and the flip stranded
      // it; with renewal the ticket stays visibly live and the drain
      // waits out the whole write.
      graft.streaming.IvfIndexTrigger.testHookDuringAppend = Some(p => if (p == idxPath) {
        graft.streaming.IvfIndexTrigger.testHookDuringAppend = None // one-shot
        val sealPath = new org.apache.hadoop.fs.Path(
          graft.streaming.IvfIndexTrigger.resolveIndexPath(spark, idxPath),
          graft.streaming.IvfIndexTrigger.SealFile)
        refresher.start()
        val deadline = System.currentTimeMillis() + 30000L
        while (!fs.exists(sealPath) && System.currentTimeMillis() < deadline)
          Thread.sleep(20)
        assert(fs.exists(sealPath), "the publisher never sealed")
        // publisher is now draining our live ticket; outlive the expiry
        Thread.sleep(3 * expiry)
        assert(refresher.isAlive && refreshErr.get() == null,
          s"refresh finished or failed while a live ticket was renewing: ${refreshErr.get()}")
      })
      // must neither throw (the ack fence sees continuous renewal) nor
      // lose the batch across the concurrent publish
      trigA.fire("V/1Sec/EMB", batch(1000))
      refresher.join(120000)
      assert(!refresher.isAlive, "refresh never completed")
      assert(refreshErr.get() == null, s"refresh failed: ${refreshErr.get()}")
      val fresh = trigB.currentQuantizer
      val all = batch(0).unionByName(batch(1000))
      assert(rowsOf(trigA.index) ==
        rowsOf(graft.ops.Similarity.ivfIndex(all, fresh)),
        "an append outliving TicketExpiryMs was snapshotted over (lost or duplicated rows)")
      // drain-liveness unchanged: a ticket that STOPS renewing is a
      // crashed appender and the publisher proceeds one expiry later
      val resolved = graft.streaming.IvfIndexTrigger.resolveIndexPath(spark, idxPath)
      val stale = new org.apache.hadoop.fs.Path(resolved,
        graft.streaming.IvfIndexTrigger.TicketPrefix + "crashed")
      fs.create(stale, false).close()
      fs.setTimes(stale, System.currentTimeMillis() - 3 * expiry, -1)
      val t0 = System.currentTimeMillis()
      trigB.compact() // drains: the stale ticket must not park it
      assert(System.currentTimeMillis() - t0 < 60000L)
      try fs.delete(stale, false) catch { case _: Throwable => () }
      assert(rowsOf(trigA.index) ==
        rowsOf(graft.ops.Similarity.ivfIndex(all, trigB.currentQuantizer)),
        "compaction after the crashed-appender drain changed the relation")
    } finally graft.streaming.IvfIndexTrigger.testHookDuringAppend = None
  }

  test("a tripped ack fence self-heals: fire() re-appends exactly the rows the publisher's snapshot excluded — no loss, no dup, no exception") {
    import IvfFixtures.{cents, rowsOf}
    val idxPath = java.nio.file.Files.createTempDirectory("graft-ivf-ackfence")
      .toString + "/idx"
    val expiry = 3000L
    val trigA = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath,
      ticketExpiryMs = expiry)
    val trigB = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath,
      ticketExpiryMs = expiry)
    def batch(off: Int) = IvfFixtures.batch(spark, off)
    trigA.fire("V/1Sec/EMB", batch(0))
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val recoveriesBefore = graft.streaming.IvfIndexTrigger.ackFenceRecoveries.get()
    val refreshErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val refresher = new Thread(() =>
      try trigB.refreshQuantizer(trainIters = 1)
      catch { case e: Throwable => refreshErr.set(e) })
    refresher.setDaemon(true)
    // the hook runs inside a CLEAR append attempt — ticket visible,
    // checks passed, write not yet started. DELETE the live ticket
    // (a genuinely lapsed lease: renewal's read-back now fails and
    // lastTouch goes stale), let the publisher drain past the vanished
    // ticket, snapshot WITHOUT this batch and flip, and only then let
    // the write proceed — it commits into the RETIRED generation and
    // the ack fence must trip. Pre-r13 that was an exception telling
    // the operator to verify by hand (and a blind re-fire duplicated
    // every row); now fire() resolves the ambiguity itself.
    graft.streaming.IvfIndexTrigger.testHookDuringAppend = Some(p => if (p == idxPath) {
      graft.streaming.IvfIndexTrigger.testHookDuringAppend = None // one-shot
      val resolved = graft.streaming.IvfIndexTrigger.resolveIndexPath(spark, idxPath)
      fs.listStatus(new org.apache.hadoop.fs.Path(resolved)).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith(
          graft.streaming.IvfIndexTrigger.TicketPrefix))
        .foreach(s => fs.delete(s.getPath, false))
      refresher.start()
      val deadline = System.currentTimeMillis() + 60000L
      while (graft.streaming.IvfIndexTrigger.resolveIndexPath(spark, idxPath) == resolved &&
             System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(graft.streaming.IvfIndexTrigger.resolveIndexPath(spark, idxPath) != resolved,
        "the publisher never flipped past the vanished ticket")
      // outlive the expiry so the fence's lapse condition is real
      Thread.sleep(expiry + expiry / 2)
    })
    // must NOT throw: the fence trips and fire() recovers by diffing
    try trigA.fire("V/1Sec/EMB", batch(1000))
    finally graft.streaming.IvfIndexTrigger.testHookDuringAppend = None
    refresher.join(60000)
    assert(!refresher.isAlive && refreshErr.get() == null,
      s"refresh failed: ${refreshErr.get()}")
    assert(graft.streaming.IvfIndexTrigger.ackFenceRecoveries.get() > recoveriesBefore,
      "the interleaving never tripped the ack fence — the recovery path was not exercised")
    // index == full rebuild: the re-append restored exactly the
    // excluded rows, no loss, no dup
    val fresh = trigB.currentQuantizer
    val all = batch(0).unionByName(batch(1000))
    assert(rowsOf(trigA.index) ==
      rowsOf(graft.ops.Similarity.ivfIndex(all, fresh)),
      "ack-fence recovery lost or duplicated rows")
    // ... and survives retirement (the orphaned copy in the retired
    // generation must never resurface)
    trigB.compact()
    trigB.compact()
    assert(rowsOf(trigA.index) ==
      rowsOf(graft.ops.Similarity.ivfIndex(all, trigB.currentQuantizer)),
      "the recovered batch must survive generation retirement")
    assert(IvfFixtures.protocolLeftovers(spark, idxPath).isEmpty)
  }

  test("ticket renewal verifies the mtime moved: on a store whose setTimes silently no-ops, renewal falls back to rewriting the ticket — the drain still waits and the batch is never silently excluded") {
    import IvfFixtures.{cents, rowsOf}
    spark.sparkContext.hadoopConfiguration
      .set("fs.notouch.impl", classOf[NoTouchFileSystem].getName)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-notouch").toString
    val idxPath = "notouch:" + dir + "/idx"
    val expiry = 4000L
    val trigA = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath,
      ticketExpiryMs = expiry)
    val trigB = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath,
      ticketExpiryMs = expiry)
    def batch(off: Int) = IvfFixtures.batch(spark, off)
    trigA.fire("V/1Sec/EMB", batch(0))
    val failuresBefore = graft.streaming.IvfIndexTrigger.ticketRenewalFailures.get()
    val recoveriesBefore = graft.streaming.IvfIndexTrigger.ackFenceRecoveries.get()
    val refreshErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val refresher = new Thread(() =>
      try trigB.refreshQuantizer(trainIters = 1)
      catch { case e: Throwable => refreshErr.set(e) })
    refresher.setDaemon(true)
    try {
      val fs = new org.apache.hadoop.fs.Path(idxPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // stall the write 3x past the ticket expiry under a draining
      // publisher. Pre-r13 this was SILENT ROW LOSS on exactly this
      // store shape: setTimes returned without moving the mtime, the
      // drain presumed the appender crashed at one expiry and
      // snapshotted without the batch, while the in-process lastTouch
      // stayed fresh so the ack fence never tripped — the batch was
      // acknowledged yet deleted at grace retirement. With read-back
      // verification the renewal rewrites the ticket instead and the
      // drain waits out the whole write.
      graft.streaming.IvfIndexTrigger.testHookDuringAppend = Some(p => if (p == idxPath) {
        graft.streaming.IvfIndexTrigger.testHookDuringAppend = None // one-shot
        val sealPath = new org.apache.hadoop.fs.Path(
          graft.streaming.IvfIndexTrigger.resolveIndexPath(spark, idxPath),
          graft.streaming.IvfIndexTrigger.SealFile)
        refresher.start()
        val deadline = System.currentTimeMillis() + 30000L
        while (!fs.exists(sealPath) && System.currentTimeMillis() < deadline)
          Thread.sleep(20)
        assert(fs.exists(sealPath), "the publisher never sealed")
        Thread.sleep(3 * expiry)
        assert(refresher.isAlive && refreshErr.get() == null,
          s"the drain did not wait on the rewritten ticket: ${refreshErr.get()}")
      })
      trigA.fire("V/1Sec/EMB", batch(1000))
      refresher.join(120000)
      assert(!refresher.isAlive, "refresh never completed")
      assert(refreshErr.get() == null, s"refresh failed: ${refreshErr.get()}")
      // renewal held end-to-end: the ack fence never had to judge a gap
      assert(graft.streaming.IvfIndexTrigger.ackFenceRecoveries.get() == recoveriesBefore,
        "renewal lapsed despite the rewrite fallback")
      assert(graft.streaming.IvfIndexTrigger.ticketRenewalFailures.get() == failuresBefore,
        "rewrite-fallback renewals must not count as failures")
      val all = batch(0).unionByName(batch(1000))
      assert(rowsOf(trigA.index) ==
        rowsOf(graft.ops.Similarity.ivfIndex(all, trigB.currentQuantizer)),
        "a stalled append on a no-op-setTimes store was snapshotted over (silent loss)")
      assert(IvfFixtures.protocolLeftovers(spark, idxPath).isEmpty)
    } finally graft.streaming.IvfIndexTrigger.testHookDuringAppend = None
  }

  test("syncGeneration's adoption loop is bounded: pathological flipping surfaces a diagnostic instead of looping forever; a settling flip is adopted") {
    import IvfFixtures.cents
    val idxPath = java.nio.file.Files.createTempDirectory("graft-ivf-sync")
      .toString + "/idx"
    val trig = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath)
    trig.fire("V/1Sec/EMB", IvfFixtures.batch(spark, 0)) // knownResolved = flat root
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var n = 0
    def flip(): Unit = { // a foreign publish, reduced to what resolution reads
      n += 1
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$idxPath/gen-$n"))
      fs.create(new org.apache.hadoop.fs.Path(
        s"$idxPath/gen-$n/${"_COMPLETE"}"), true).close()
    }
    flip() // adoption begins at the next entry point
    // settling case: two more flips land mid-adoption, then stop — the
    // loop must converge on the final generation
    var flips = 2
    graft.streaming.IvfIndexTrigger.testHookMidSync =
      Some(p => if (p == idxPath && flips > 0) { flips -= 1; flip() })
    try assert(trig.currentQuantizer.nonEmpty)
    finally graft.streaming.IvfIndexTrigger.testHookMidSync = None
    assert(graft.streaming.IvfIndexTrigger.resolveIndexPath(spark, idxPath)
      .endsWith(s"gen-$n"), "adoption must converge on the final generation")
    // pathological case: a flip on EVERY adoption attempt — the loop
    // must surface a bounded diagnostic, not spin forever under the
    // instance monitor
    flip() // move the generation so adoption re-enters the loop
    graft.streaming.IvfIndexTrigger.testHookMidSync = Some(p => if (p == idxPath) flip())
    try {
      val e = intercept[IllegalStateException](trig.currentQuantizer)
      assert(e.getMessage.contains("flipping"), e.getMessage)
    } finally graft.streaming.IvfIndexTrigger.testHookMidSync = None
    // ... and the instance recovers once the flipping stops
    assert(trig.currentQuantizer.nonEmpty)
  }

  test("fireIdempotent: a blind redelivery after a caller crash neither loses nor duplicates; verifyBatch answers presence mechanically") {
    import IvfFixtures.{cents, rowsOf}
    import org.apache.spark.sql.functions.col
    val idxPath = java.nio.file.Files.createTempDirectory("graft-ivf-idem")
      .toString + "/idx"
    val trig = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath)
    def batch(off: Int) = IvfFixtures.batch(spark, off)
    trig.fireIdempotent("V/1Sec/EMB", batch(0)) // fresh: appends all
    trig.fireIdempotent("V/1Sec/EMB", batch(0)) // blind redelivery: no-op
    // partial redelivery (an at-least-once upstream replaying a mixed
    // buffer): only the genuinely new rows may land
    val mixed = batch(0).filter(col("vec_id") < 10).unionByName(batch(1000))
    trig.fireIdempotent("V/1Sec/EMB", mixed)
    val all = batch(0).unionByName(batch(1000))
    assert(rowsOf(trig.index) ==
      rowsOf(graft.ops.Similarity.ivfIndex(all, cents)),
      "idempotent redelivery lost or duplicated rows")
    assert(trig.verifyBatch(batch(0)) && trig.verifyBatch(batch(1000)))
    assert(!trig.verifyBatch(batch(2000)),
      "verifyBatch must refuse a batch that never committed")
  }

  test("a torn (unparseable) seal expires by file mtime — appends and publishers break it instead of wedging forever") {
    import IvfFixtures.{cents, rowsOf}
    val idxPath = java.nio.file.Files.createTempDirectory("graft-ivf-torn")
      .toString + "/idx"
    val trig = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath)
    def batch(off: Int) = IvfFixtures.batch(spark, off)
    trig.fire("V/1Sec/EMB", batch(0))
    // no expiry shrink needed (and suites run in parallel — mutating
    // the process-wide seal clock would break other suites' live
    // publishers): a torn seal with an mtime far in the past is
    // stale against the DEFAULT expiry
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a publisher that crashed INSIDE the seal write leaves an empty
    // (unparseable) _SEALING file: ts can never be parsed, so only
    // the mtime fallback can ever expire it
    def tornSealOn(gen: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(gen,
        graft.streaming.IvfIndexTrigger.SealFile)
      fs.create(p, false).close()
      fs.setTimes(p, System.currentTimeMillis() -
        3 * graft.streaming.IvfIndexTrigger.SealExpiryMs, -1)
      p
    }
    tornSealOn(graft.streaming.IvfIndexTrigger.resolveIndexPath(spark, idxPath))
    // an append must break the stale torn seal, not spin forever
    trig.fire("V/1Sec/EMB", batch(1000))
    val all = batch(0).unionByName(batch(1000))
    assert(rowsOf(trig.index) ==
      rowsOf(graft.ops.Similarity.ivfIndex(all, trig.currentQuantizer)),
      "append under a stale torn seal lost rows")
    // ... and a publisher must be able to acquire over it too
    tornSealOn(graft.streaming.IvfIndexTrigger.resolveIndexPath(spark, idxPath))
    trig.refreshQuantizer(trainIters = 1)
    assert(rowsOf(trig.index) ==
      rowsOf(graft.ops.Similarity.ivfIndex(all, trig.currentQuantizer)),
      "refresh over a stale torn seal diverged")
    assert(IvfFixtures.protocolLeftovers(spark, idxPath).isEmpty)
  }
}
