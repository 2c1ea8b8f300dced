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
  * Retraining the quantizer invalidates the index by design (as in any
  * IVF system); rebuild by deleting `indexPath` and re-firing, or
  * swap in a new trigger instance with fresh centroids.
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

  def fire(tbk: String, batch: DataFrame): Unit = synchronized {
    Similarity.ivfIndex(batch.select(col(id), col(emb)), centroids, id, emb)
      .write.mode("append").parquet(IvfIndexTrigger.resolveIndexPath(spark, indexPath))
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
    val gens = IvfIndexTrigger.completeGens(fs, indexPath)
    val cur = gens.maxOption
    val next = cur.getOrElse(0L) + 1
    index.repartition(math.min(centroids.length, 4096), col("cell"))
      .sortWithinPartitions("cell", id)
      .write.mode("overwrite").parquet(s"$indexPath/gen-$next")
    fs.create(new Path(s"$indexPath/gen-$next/${IvfIndexTrigger.Marker}"), true).close()
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
    firesSinceCompact = 0
  }

  /** Persist the frozen quantizer beside the index: (index parquet,
    * centroids parquet) is the complete serving state, so an
    * out-of-process server (the RPC `knn_ivf` job) can answer queries
    * from the maintained index without sharing this JVM.
    */
  def writeCentroids(path: String): Unit =
    Similarity.centroidsDF(spark, centroids).write.mode("overwrite").parquet(path)

  /** ANN top-k served from the maintained index (cell-pruned scan;
    * nProbe = centroids.length degenerates to exact search).
    */
  def topK(queries: DataFrame, k: Int, nProbe: Int): DataFrame =
    Similarity.ivfTopKIndexed(index, queries, k, centroids, nProbe, id, emb)

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
}
