package graft.streaming

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
  * Retraining the quantizer invalidates the index by design (as in any
  * IVF system); rebuild by deleting `indexPath` and re-firing, or
  * swap in a new trigger instance with fresh centroids.
  */
final class IvfIndexTrigger(
    spark: SparkSession,
    centroids: Array[Seq[Float]],
    indexPath: String,
    id: String = "vec_id",
    emb: String = "embedding") extends Trigger {

  def fire(tbk: String, batch: DataFrame): Unit =
    Similarity.ivfIndex(batch.select(col(id), col(emb)), centroids, id, emb)
      .write.mode("append").parquet(indexPath)

  /** The maintained (cell, id, embedding) index relation. */
  def index: DataFrame = spark.read.parquet(indexPath)

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
