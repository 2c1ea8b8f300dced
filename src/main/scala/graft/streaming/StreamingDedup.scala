package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-duplicate suppression on a DOCUMENT STREAM — the streaming
  * front of the corpus-dedup family in [[graft.ops.Dedup]]: a crawl /
  * feed ingest replays the same page under new ids, and the batch
  * dedup should not be the first place that notices.
  *
  * The key is the same md5 of the normalized text the batch operators
  * group on, so streamed survivors land in exactly the batch
  * operators' clone-group representative role: a later batch pass
  * over the accumulated corpus finds nothing new to collapse.
  *
  * State is WATERMARK-BOUNDED (`dropDuplicatesWithinWatermark`):
  * duplicates arriving within `lateness` of each other are dropped,
  * and hash state is reclaimed once the watermark passes — the
  * bounded-state trade the reference's trigger pipeline makes for
  * late data, applied to dedup. Replays separated by more than the
  * delay pass again by design (unbounded exactness over an infinite
  * stream is unbounded state; the batch pass stays the source of
  * truth, same division of labor as [[LiveCandles]] vs the cascade).
  */
object StreamingDedup {

  /** Suppress streamed documents whose normalized text was already
    * seen within the watermark delay. Adds `content_hash`; keeps every
    * input column.
    *
    * @param eventTimeCol timestamp column the watermark advances on
    * @param lateness     how far apart duplicate arrivals may be and
    *                     still be suppressed (state retention bound)
    */
  def dedupStream(stream: DataFrame, eventTimeCol: String,
                  lateness: String = "10 minutes",
                  text: String = "text"): DataFrame =
    stream
      .withColumn("content_hash", graft.ops.Dedup.contentHash(col(text)))
      .withWatermark(eventTimeCol, lateness)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Distill the ALREADY-INGESTED corpus into a Bloom filter of its
    * distinct content hashes — the streaming front of
    * [[graft.ops.Dedup.exactDeltaSurvivors]]'s corpus index, built by
    * one distributed aggregation (only the filter bytes reach the
    * driver; at 100 TB the input is the persisted hash index, not
    * text). Probing is STATELESS on the stream side, so the gate
    * needs no watermark and no state store, and the filter is
    * rebuilt/extended at the operator's cadence (e.g. per ingest
    * day), not per micro-batch.
    *
    * One-sided like the decontamination gate: every true corpus
    * duplicate is dropped (the gate never re-ingests known content);
    * a fresh doc is falsely dropped with probability bounded by
    * `numBits` sizing, and the batch exact operator remains the
    * source of truth for audits.
    */
  def corpusHashBloom(corpus: DataFrame,
      expectedDocs: Long = 1L << 20, numBits: Long = 1L << 23,
      text: String = "text"): Array[Byte] =
    BloomGate.build(
      corpus.filter(col(text).isNotNull)
        .select(graft.ops.Dedup.contentHash(col(text)).as("__ch")),
      col("__ch"), expectedDocs, numBits,
      "corpusHashBloom: corpus produced no content hashes — empty or wrong column?")

  /** Drop streamed documents whose normalized content the corpus
    * Bloom already holds (stateless; compose with [[dedupStream]] for
    * in-stream duplicate suppression).
    */
  def filterAgainstCorpus(stream: DataFrame, corpusBloom: Array[Byte],
      text: String = "text"): DataFrame =
    stream.filter(col(text).isNotNull &&
      !BloomGate.mightContain(corpusBloom, graft.ops.Dedup.contentHash(col(text))))

  /** Binary-payload variant of the corpus gate for multimodal ingest:
    * the index key is the EXACT-byte md5 of the media column (no text
    * normalization — the same key as
    * [[graft.ops.Multimodal.chunkDupPairs]]'s collapse gate), so a
    * re-ingested identical file drops statelessly in-stream. Same
    * one-sided contract as the text gate.
    */
  def mediaHashBloom(corpus: DataFrame,
      expectedRows: Long = 1L << 20, numBits: Long = 1L << 23,
      media: String = "media"): Array[Byte] =
    BloomGate.build(
      corpus.filter(col(media).isNotNull && length(col(media)) > 0)
        .select(md5(col(media)).as("__mh")),
      col("__mh"), expectedRows, numBits,
      "mediaHashBloom: corpus produced no payload hashes — empty or wrong column?")

  /** Drop streamed media rows whose exact payload the corpus Bloom
    * already holds (stateless).
    */
  def filterMediaAgainstCorpus(stream: DataFrame, corpusBloom: Array[Byte],
      media: String = "media"): DataFrame =
    stream.filter(col(media).isNotNull &&
      !BloomGate.mightContain(corpusBloom, md5(col(media))))
}
