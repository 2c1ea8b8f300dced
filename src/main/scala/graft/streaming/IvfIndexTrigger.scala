package graft.streaming

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.hadoop.fs.Path
import scala.util.control.NonFatal

/** IVF-index maintenance as an on-write trigger — the reference's
  * trigger pattern (plugins/trigger/trigger.go:37-43, the ondiskagg
  * shape) applied to the ANN serving side: every batch written to a
  * matching embeddings bucket is assigned under a FROZEN coarse
  * quantizer (O(batch) — [[graft.ops.Similarity.ivfIndex]]'s
  * incremental contract: the historical corpus is never re-scanned and
  * the appended index is row-identical to a full rebuild) and appended
  * to a persisted (cell, id, embedding) index. Queries serve through
  * [[topK]] against the index alone, never the base table — the FAISS
  * serving contract wired into the engine's own write path.
  *
  * File-count discipline: each fire() appends one file set, so a
  * long-lived index accumulates small files without bound — [[compact]]
  * rewrites the current relation cell-clustered into a fresh
  * GENERATION directory (`gen-N` + `_COMPLETE` marker) and readers
  * resolve the highest complete generation, so the rewrite is atomic
  * to them and the steady-state file count is bounded by the compact
  * cadence (`compactEvery` automates it). One spent generation is
  * grace-retained per compaction for in-flight readers. Cell
  * clustering also means a compacted index serves probes from
  * parquet row groups that are contiguous per cell.
  *
  * Retraining the quantizer no longer invalidates the index (r10):
  * [[refreshQuantizer]] is a BLUE/GREEN reindex — train new centroids
  * from the index's own vectors, rebuild the whole relation into the
  * next generation UNDER the new quantizer with the quantizer
  * persisted INSIDE that generation (`gen-N/_quantizer`), and flip
  * atomically via the same `_COMPLETE` marker compaction uses.
  * Readers resolve (old index, old quantizer) or (new, new), never a
  * mix, and the spent pair is grace-retained one generation exactly
  * like a compaction — drift repair without a serving gap.
  */
final class IvfIndexTrigger(
    spark: SparkSession,
    centroids: Array[Seq[Float]],
    indexPath: String,
    id: String = "vec_id",
    emb: String = "embedding",
    compactEvery: Int = 0) extends Trigger {

  private val fs = new Path(indexPath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private var firesSinceCompact = 0
  // the LIVE quantizer (all mutation and reads of this var
  // synchronize on the trigger): the resolved generation's PERSISTED
  // quantizer when one exists — a trigger reconstructed after a
  // blue/green refresh (process restart) must keep assigning under
  // the retrained set the index was built with, or appends would mix
  // two quantizers inside one generation; constructor centroids only
  // for a fresh/pre-refresh index
  private var quantizer: Array[Seq[Float]] =
    IvfIndexTrigger.resolveQuantizerPath(spark, indexPath)
      .map(p => Similarity.loadCentroids(spark.read.parquet(p)))
      .getOrElse(centroids)
  // the generation this instance last observed; every mutating or
  // serving entry point re-checks it via [[syncGeneration]] so an
  // OUT-OF-BAND flip (another process's `knn_ivf_refresh` wire job or
  // compaction on the same path) is adopted instead of appending or
  // probing under a stale quantizer — the live-instance counterpart
  // of the constructor's restart adoption
  private var knownResolved: String =
    IvfIndexTrigger.resolveIndexPath(spark, indexPath)

  /** Re-resolve the current generation and adopt its persisted
    * quantizer if the generation moved since this instance last
    * looked (one directory listing; called under the instance lock by
    * every mutating/serving entry point). Returns the resolved path.
    */
  private def syncGeneration(): String = {
    val resolved = IvfIndexTrigger.resolveIndexPath(spark, indexPath)
    if (resolved != knownResolved) {
      val q = new Path(resolved, IvfIndexTrigger.QuantizerDir)
      if (fs.exists(q))
        quantizer = Similarity.loadCentroids(spark.read.parquet(q.toString))
      knownResolved = resolved
    }
    resolved
  }

  /** The quantizer current batches are assigned (and queries probed)
    * under — the constructor's until a refresh (this instance's or an
    * out-of-band one) flips it.
    */
  def currentQuantizer: Array[Seq[Float]] = synchronized {
    syncGeneration(); quantizer
  }

  def fire(tbk: String, batch: DataFrame): Unit = synchronized {
    val resolved = syncGeneration()
    Similarity.ivfIndex(batch.select(col(id), col(emb)), quantizer, id, emb)
      .write.mode("append").parquet(resolved)
    firesSinceCompact += 1
    if (compactEvery > 0 && firesSinceCompact >= compactEvery) compact()
  }

  /** The maintained (cell, id, embedding) index relation — the highest
    * complete generation (or the flat pre-compaction root).
    */
  def index: DataFrame =
    spark.read.parquet(IvfIndexTrigger.resolveIndexPath(spark, indexPath))

  /** Rewrite the current index relation cell-clustered into the next
    * generation and retire all but one predecessor: appends stop
    * growing the file count across compactions, and per-cell rows
    * become contiguous. Single-writer like every mutation here (fire
    * and compact synchronize on the trigger); readers are
    * generation-isolated and never see a partial rewrite — the marker
    * lands only after the generation is fully written.
    */
  def compact(): Unit = synchronized {
    if (!fs.exists(new Path(indexPath))) return // nothing fired yet
    syncGeneration()
    // losing the slot race means a concurrent publisher (another
    // process's refresh/compaction) just rewrote the relation — its
    // generation already bounds the file count, which is all a
    // compaction is for; the next entry-point call adopts it
    publishGeneration(index, quantizer)
    ()
  }

  /** Blue/green quantizer refresh — drift repair WITHOUT a serving
    * gap: retrain `nCells` centroids from the index's own vectors
    * (`trainIters` Lloyd iterations over exactly the rows being
    * served; the index rows carry full embeddings, so the base table
    * is never read), rebuild the whole relation into the next
    * generation under the NEW quantizer, persist that quantizer
    * inside the generation, and flip via the marker. Readers that
    * resolved before the flip finish on the grace-retained old
    * (index, quantizer) pair; everyone after gets the new pair;
    * subsequent [[fire]]s assign under the new quantizer. The rebuild
    * is row-identical to a fresh build over the same vectors under
    * the same centroids (assignment under a frozen quantizer is
    * deterministic). No-op on an empty index.
    */
  def refreshQuantizer(nCells: Int = 0, trainIters: Int = 3): Unit = synchronized {
    if (!fs.exists(new Path(indexPath))) return // nothing fired yet
    syncGeneration()
    val corpus = index.select(col(id), col(emb))
    if (corpus.isEmpty) return
    val n = if (nCells > 0) nCells else quantizer.length
    val fresh = Similarity.trainedCentroids(corpus, n, trainIters, id, emb)
    if (!publishGeneration(Similarity.ivfIndex(corpus, fresh, id, emb), fresh))
      // unlike compaction, a lost refresh means THIS retrain never
      // became the serving state — surface it so the caller retries
      // instead of believing its drift repair landed
      throw new IllegalStateException(
        s"concurrent generation publish on $indexPath — this refresh " +
          "lost the slot race; re-run it against the new generation")
    quantizer = fresh
  }

  /** One definition of the generation flip, shared by [[compact]] and
    * [[refreshQuantizer]]: write `rows` cell-clustered — with `cents`
    * at `_quantizer` (leading underscore — parquet readers of the
    * generation ignore it) and the `_COMPLETE` marker already inside
    * — into a UNIQUE tmp directory, then claim the gen-(N+1) slot by
    * atomic no-overwrite rename (the manifest version-slot CAS
    * applied to generations): concurrent publishers from other
    * processes (the `knn_ivf_refresh` wire job) target the same slot
    * and exactly one wins; the loser's bytes are dropped, never
    * half-merged into a marked generation. Returns whether THIS
    * publish won. The winner retires all but the immediate
    * predecessor (grace for readers that resolved just before the
    * flip). Readers are generation-isolated either way — the rename
    * makes a complete (index, quantizer, marker) trio appear in one
    * metadata operation.
    */
  private def publishGeneration(
      rows: DataFrame, cents: Array[Seq[Float]]): Boolean = {
    val gens = IvfIndexTrigger.completeGens(fs, indexPath)
    val cur = gens.maxOption
    val next = cur.getOrElse(0L) + 1
    val tmp = s"$indexPath/.gen_tmp_${java.util.UUID.randomUUID().toString.take(8)}"
    rows.repartition(math.min(cents.length, 4096), col("cell"))
      .sortWithinPartitions("cell", id)
      .write.mode("overwrite").parquet(tmp)
    Similarity.centroidsDF(spark, cents)
      .write.mode("overwrite")
      .parquet(s"$tmp/${IvfIndexTrigger.QuantizerDir}")
    fs.create(new Path(s"$tmp/${IvfIndexTrigger.Marker}"), true).close()
    val dst = new Path(s"$indexPath/gen-$next")
    val won = fs match {
      case _: org.apache.hadoop.fs.RawLocalFileSystem |
           _: org.apache.hadoop.fs.ChecksumFileSystem =>
        try {
          java.nio.file.Files.move( // atomic; throws if the slot is taken
            java.nio.file.Paths.get(new Path(tmp).toUri.getPath),
            java.nio.file.Paths.get(dst.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.nio.file.DirectoryNotEmptyException => false
        }
      case _ => !fs.exists(dst) && fs.rename(new Path(tmp), dst)
    }
    if (!won) {
      try fs.delete(new Path(tmp), true) catch { case NonFatal(_) => () }
      return false
    }
    // retire everything older than the immediate predecessor (grace
    // for readers that resolved just before the marker landed):
    // earlier generations, and — once the first generation has itself
    // been superseded — the flat pre-compaction files at the root
    gens.filter(_ < cur.getOrElse(0L)).foreach { g =>
      try fs.delete(new Path(s"$indexPath/gen-$g"), true)
      catch { case NonFatal(_) => () }
    }
    if (next >= 2) {
      try fs.listStatus(new Path(indexPath)).toSeq
        .filter(s => s.isFile)
        .foreach(s => fs.delete(s.getPath, false))
      catch { case NonFatal(_) => () }
    }
    knownResolved = s"$indexPath/gen-$next"
    firesSinceCompact = 0
    true
  }

  /** Persist the frozen quantizer beside the index: (index parquet,
    * centroids parquet) is the complete serving state, so an
    * out-of-process server (the RPC `knn_ivf` job) can answer queries
    * from the maintained index without sharing this JVM.
    */
  def writeCentroids(path: String): Unit = synchronized {
    Similarity.centroidsDF(spark, quantizer).write.mode("overwrite").parquet(path)
  }

  /** ANN top-k served from the maintained index (cell-pruned scan;
    * nProbe = nCells degenerates to exact search) under the LIVE
    * quantizer. The generation is resolved ONCE and its quantizer
    * snapshotted with it, so a concurrent flip can never pair a new
    * index with old centroids.
    */
  def topK(queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val (idxDf, cents) = pinServingPair()
    Similarity.ivfTopKIndexed(idxDf, queries, k, cents, nProbe, id, emb)
  }

  /** [[topK]] with the probe depth DERIVED from a recall contract
    * against this trigger's own index
    * ([[graft.ops.Similarity.ivfProbeForRecall]] — the index rows
    * carry full vectors, so the calibration truth never needs the
    * base table): the serving call a user should reach for when they
    * know the recall they need rather than a probe geometry. The
    * calibration and the serve share ONE pinned (index, quantizer)
    * pair — a flip landing during the calibration job cannot make
    * the serve probe a new generation with the calibrated-against
    * centroids.
    */
  def topKAtRecall(queries: DataFrame, k: Int,
      recallFloor: Double = 0.85, nCal: Int = 64): DataFrame = {
    val (idxDf, cents) = pinServingPair()
    val nProbe = Similarity.ivfProbeForRecall(
      idxDf.select(col(id), col(emb)), queries, k, cents, recallFloor, nCal, id, emb)
    Similarity.ivfTopKIndexed(idxDf, queries, k, cents, nProbe, id, emb)
  }

  /** One consistent (index DataFrame, quantizer) snapshot: resolved
    * under the lock, the DataFrame pinned to the resolved generation
    * path (grace retention keeps it readable one flip further).
    */
  private def pinServingPair(): (DataFrame, Array[Seq[Float]]) = synchronized {
    val resolved = syncGeneration()
    (spark.read.parquet(resolved), quantizer)
  }

  /** Continuous serving: a STREAM of query vectors answered per
    * micro-batch from the maintained index (stream-side foreachBatch —
    * each batch of queries runs the same cell-pruned plan as [[topK]],
    * so a batch and a stream answer identically; the index is re-read
    * per batch and therefore sees concurrent [[fire]] appends). The
    * results of each micro-batch go to `sink`.
    */
  def attachQueries(
      queryStream: DataFrame, k: Int, nProbe: Int, checkpointDir: String)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) sink(topK(batch, k, nProbe)))
      .start()
}

object IvfIndexTrigger {
  private[streaming] val Marker = "_COMPLETE"
  private[graft] val QuantizerDir = "_quantizer"

  private def completeGens(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Seq[Long] = {
    val p = new Path(path)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen-"))
      .map(_.getPath.getName.stripPrefix("gen-"))
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .filter(g => fs.exists(new Path(s"$path/gen-$g/$Marker")))
  }

  /** Resolve an index path to its CURRENT data location: the highest
    * complete generation written by [[IvfIndexTrigger.compact]], or
    * the path itself for a flat (never-compacted) index. Out-of-process
    * consumers (the RPC `knn_ivf` job) resolve through this, so a
    * compacted and an uncompacted index serve identically.
    */
  def resolveIndexPath(spark: SparkSession, path: String): String = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    completeGens(fs, path).maxOption.map(g => s"$path/gen-$g").getOrElse(path)
  }

  /** Blue/green refresh of an index PATH without a live trigger
    * instance — the serving-ops entry point (the RPC
    * `knn_ivf_refresh` job): adopt the resolved generation's
    * persisted quantizer (a flat pre-generation index seeds from a
    * deterministic sample of its own rows instead), retrain from the
    * index's vectors, rebuild into the next generation and flip. The
    * whole body is [[IvfIndexTrigger.refreshQuantizer]] on a
    * throwaway instance, so embedded and over-the-wire refreshes can
    * never diverge. Returns the retrained cell count, or None for a
    * missing or empty index.
    */
  def refreshPath(spark: SparkSession, indexPath: String,
      nCells: Int = 0, trainIters: Int = 3,
      id: String = "vec_id", emb: String = "embedding"): Option[Int] = {
    val fs = new Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(indexPath))) return None
    val rows = spark.read.parquet(resolveIndexPath(spark, indexPath))
    if (rows.isEmpty) return None
    // seed centroids only matter for a FLAT index with no persisted
    // quantizer — the constructor adopts gen-N/_quantizer otherwise
    // and refresh retrains regardless, so don't pay the two seed jobs
    // (distinct-cell count + hash-sample sort) in the common
    // already-refreshed case; cell count defaults to the index's own
    val seed =
      if (resolveQuantizerPath(spark, indexPath).isDefined) Array.empty[Seq[Float]]
      else Similarity.sampledCentroids(rows,
        if (nCells > 0) nCells
        else math.max(1, rows.select("cell").distinct().count().toInt), id, emb)
    val trig = new IvfIndexTrigger(spark, seed, indexPath, id, emb)
    trig.refreshQuantizer(nCells, trainIters)
    Some(trig.currentQuantizer.length)
  }

  /** The quantizer PAIRED with the resolved generation, if that
    * generation carries one (`gen-N/_quantizer`, written by compact
    * and refreshQuantizer since r10). Serving consumers (the RPC
    * `knn_ivf` job) prefer this over an external centroids path: a
    * blue/green quantizer refresh flips index and quantizer in one
    * marker, so reading the pair from one resolved generation can
    * never mix an old index with new centroids or vice versa.
    */
  def resolveQuantizerPath(spark: SparkSession, path: String): Option[String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val resolved = resolveIndexPath(spark, path)
    val q = s"$resolved/$QuantizerDir"
    if (fs.exists(new Path(q))) Some(q) else None
  }
}
