package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed
  * metadata, decode/feature-extract/frame-sample stages.
  *
  * The decode itself is a STUB (this container ships no image/audio
  * codecs): a deterministic fake computed from the raw bytes. The
  * Spark-side shape is real — binary column, typed feature schema,
  * per-partition batch iteration (the Scala analogue of a vectorized
  * batch UDF: one `mapPartitions` pass, no per-row session state,
  * executor-local codec init amortized per partition).
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media: Array[Byte], format: String)
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, header_sum: Long, width: Int, height: Int)

  /** Documents → media table: payload as opaque binary + metadata. */
  def mediaTable(docs: DataFrame, id: String = "doc_id",
      payload: String = "text", format: String = "source"): DataFrame =
    docs.select(col(id).as("doc_id"), col(payload).cast("binary").as("media"),
      col(format).as("format"))

  /** STUB "decode": deterministic features from the payload bytes.
    * Real deployments replace the body with an image/audio codec —
    * the signature, schema and batch shape stay identical.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.media.length
    var hs = 0L
    var i = 0
    while (i < math.min(16, n)) { hs += (r.media(i) & 0xFF); i += 1 }
    MediaFeatures(r.doc_id, n, hs, (64 + hs % 512).toInt, (64 + (hs / 2) % 512).toInt)
  }

  /** Batch feature extraction over partitions. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media", "format").as[MediaRecord]
      .mapPartitions(_.map(decodeStub))
      .toDF()
  }

  /** Frame sampling: one row per sampled frame (every `bytesPerFrame`
    * bytes = one fake frame). Pure explode — no shuffle.
    */
  def sampleFrames(features: DataFrame, bytesPerFrame: Int): DataFrame =
    features.withColumn("frame_idx",
      explode(sequence(lit(0), greatest((col("n_bytes") / bytesPerFrame).cast("int") - 1, lit(0)))))
      .select(col("doc_id"), col("frame_idx"),
        (col("header_sum") + col("frame_idx")).as("frame_sig"))
}
