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

  /** Decoded media in the PIXEL domain: row-major grayscale. */
  final case class DecodedMedia(
      doc_id: Long, width: Int, height: Int, pixels: Array[Int])

  /** The injectable codec seam: real deployments bind an image/audio
    * library here (executor-local init amortizes per partition via
    * `mapPartitions` — construct the native decoder once per task in
    * an iterator wrapper, not per record). Everything downstream of
    * `decode` — schema, batch shape, the histogram features, the
    * similarity search — is codec-agnostic and stays identical when
    * the binding changes, which is what [[SyntheticCodec]] exists to
    * prove end-to-end under an exact oracle.
    */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRecord): DecodedMedia
  }

  /** Deterministic SYNTHETIC codec (no media libraries exist in this
    * environment): byte k of the payload is pixel k (0-255), row-major
    * at a fixed `width`, height = ceil(n / width), no padding (the
    * last row may be short). Exactly replayable by a SQL oracle over
    * the same payload bytes — the point: it drives the REAL decode-
    * domain plumbing (trait dispatch, partition-batch decode, feature
    * extraction, similarity) under a hash-level correctness gate.
    */
  final case class SyntheticCodec(width: Int = 16) extends MediaDecoder {
    require(width >= 1, s"width must be positive, got $width")
    def decode(r: MediaRecord): DecodedMedia = {
      val n = r.media.length
      val px = new Array[Int](n)
      var i = 0
      while (i < n) { px(i) = r.media(i) & 0xFF; i += 1 }
      DecodedMedia(r.doc_id, width, (n + width - 1) / width, px)
    }
  }

  /** Decode every payload through `decoder` — one partition-batch
    * pass, the vectorized-UDF shape.
    */
  def decodeMedia(spark: SparkSession, media: DataFrame,
                  decoder: MediaDecoder): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media", "format").as[MediaRecord]
      .mapPartitions(_.map(decoder.decode))
      .toDF()
  }

  /** Decode-domain features: a `bins`-bucket luminance histogram per
    * media row (embedding column, raw counts — cosine is scale-
    * invariant, and integer counts stay float-exact across engines).
    * Decode and histogram run in ONE mapPartitions pass, the way a
    * production feature extractor sits in the codec's batch loop.
    * Output: (doc_id, width, height, embedding).
    */
  def luminanceHistogram(spark: SparkSession, media: DataFrame,
                         decoder: MediaDecoder, bins: Int = 16): DataFrame = {
    require(bins >= 1 && 256 % bins == 0, s"bins must divide 256, got $bins")
    import spark.implicits._
    val per = 256 / bins
    media.select("doc_id", "media", "format").as[MediaRecord]
      .mapPartitions(_.map { r =>
        val d = decoder.decode(r)
        val h = new Array[Float](bins)
        var i = 0
        while (i < d.pixels.length) { h(d.pixels(i) / per) += 1f; i += 1 }
        (d.doc_id, d.width, d.height, h.toSeq)
      })
      .toDF("doc_id", "width", "height", "embedding")
  }

  /** Documents → media table: payload as opaque binary + metadata. */
  def mediaTable(docs: DataFrame, id: String = "doc_id",
      payload: String = "text", format: String = "source"): DataFrame =
    docs.select(col(id).as("doc_id"), col(payload).cast("binary").as("media"),
      col(format).as("format"))

  /** STUB "decode": deterministic features from the payload bytes.
    * Real deployments bind an image/audio codec through the
    * [[MediaDecoder]] seam instead — [[SyntheticCodec]] exercises that
    * whole decode-domain path under an exact oracle; this stub remains
    * only as the header-features fake for the metadata entries.
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

  /** Codec-free media near-dup pairs by POSITIONAL chunk hashing: each
    * payload splits into `chunks` equal byte slices, md5 per slice,
    * and two media rows pair when ≥ `minMatch` of their same-position
    * slice hashes agree. Catches exact duplicate payloads (all chunks
    * match) and locally-edited equal-length duplicates (re-tagged
    * copies, patched headers/trailers — only the touched chunks
    * differ). It is NOT a perceptual hash: re-encoding or resizing
    * changes every byte and honestly scores as different — decode-
    * domain similarity belongs to the (stubbed) codec stage.
    *
    * Scale shape: one explode to (doc, pos, hash), one (pos, hash)-
    * keyed equi self-join — the banding shuffle, never all pairs —
    * then one pair-keyed count. A byte-identical boilerplate chunk
    * shared by M equal-length payloads costs M²/2 candidate rows in
    * its (pos, hash) group, the same inherent banding behavior (and
    * the same collapse-gate escape) as the text simhash family.
    *
    * Output: (id1, id2, matching_chunks), id1 < id2.
    */
  def chunkDupPairs(media: DataFrame, chunks: Int = 8,
                    minMatch: Int = 6, collapseExact: Boolean = true): DataFrame = {
    require(chunks >= 1 && minMatch >= 1 && minMatch <= chunks,
      s"need 1 <= minMatch <= chunks, got chunks=$chunks minMatch=$minMatch")
    val base = media.filter(col("media").isNotNull && length(col("media")) > 0)
    // exact-payload collapse gate, the binary analogue of
    // [[Dedup.collapsedPairs]] (kept separate: that helper's key is
    // the text-normalizing contentHash and its payload column is
    // text-typed; both gates are pinned collapse ≡ direct by OpsSpec,
    // which is the guard against their logic diverging):
    // byte-identical payloads (the dominant duplication mode
    // — same file ingested twice) pair quadratically inside every
    // (pos, hash) group; collapsing to per-content representatives
    // first makes the banding join run on distinct payloads and
    // re-expands pairs through group membership. EXACT-byte md5 key —
    // no text normalization. Probe-gated like everywhere else.
    if (collapseExact && graft.ops.Dedup.cloneHeavy(base, md5(col("media")))) {
      val groups = base
        .select(col("doc_id"), col("media"), md5(col("media")).as("__ch"))
        .groupBy("__ch")
        .agg(min(col("doc_id")).as("__rep"), first(col("media")).as("__m"),
          sort_array(collect_list(col("doc_id"))).as("__ids"))
        .transform(graft.ops.CacheScope.scopedPersist)
      val repPairs = chunkDupPairs(
        groups.select(col("__rep").as("doc_id"), col("__m").as("media")),
        chunks, minMatch, collapseExact = false)
      val m1 = groups.select(col("__rep").as("id1"), col("__ids").as("__ids1"))
      val m2 = groups.select(col("__rep").as("id2"), col("__ids").as("__ids2"))
      val cross = repPairs.join(m1, "id1").join(m2, "id2")
        .withColumn("__a", explode(col("__ids1")))
        .withColumn("__b", explode(col("__ids2")))
        .select(least(col("__a"), col("__b")).as("id1"),
          greatest(col("__a"), col("__b")).as("id2"), col("matching_chunks"))
      // clone self-pairs: identical payloads match at every EMITTED
      // position — ceil(n / ceil(n / chunks)) of them
      val nEmitted = ceil(length(col("__m")).cast("double") /
        ceil(length(col("__m")).cast("double") / chunks)).cast("long")
      val self = groups.filter(size(col("__ids")) >= 2)
        .withColumn("matching_chunks", nEmitted)
        .filter(col("matching_chunks") >= minMatch)
        .withColumn("__a", explode(col("__ids")))
        .withColumn("__b", explode(col("__ids")))
        .filter(col("__a") < col("__b"))
        .select(col("__a").as("id1"), col("__b").as("id2"), col("matching_chunks"))
      return cross.unionByName(self)
    }
    val hashed = base
      .withColumn("__n", length(col("media")))
      .withColumn("__cl", ceil(col("__n").cast("double") / chunks).cast("int"))
      .select(col("doc_id"), posexplode_outer(expr(
        s"""transform(filter(sequence(0, $chunks - 1), i -> i * __cl < __n),
                      i -> md5(substring(media, 1 + i * __cl, __cl)))"""))
        .as(Seq("pos", "h")))
    val l = hashed.select(col("doc_id").as("id1"), col("pos"), col("h"))
    val r = hashed.select(col("doc_id").as("id2"), col("pos"), col("h"))
    l.join(r, Seq("pos", "h"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2")
      .agg(count(lit(1)).as("matching_chunks"))
      .filter(col("matching_chunks") >= minMatch)
  }
}
