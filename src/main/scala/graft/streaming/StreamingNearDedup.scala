package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.TextFunctions

/** NEAR-duplicate suppression on a document stream — the streaming
  * front of the simhash family in [[graft.ops.Dedup]], one rung above
  * [[StreamingDedup]]'s exact hash: boilerplate re-crawls that differ
  * by counters/timestamps/session ids hash to DIFFERENT md5s but to
  * the SAME 64-bit simhash (a few changed tokens cannot flip a
  * majority vote on enough bits), so fingerprint-equality dedup
  * catches the near-identical replays exact dedup misses.
  *
  * This exists because the signature became a PROJECTION: the
  * composed simhash (explode → groupBy 64-sum) is an aggregation,
  * which in a stream would be its own watermark-bound stateful
  * operator emitting only on watermark close; the fused
  * [[org.apache.spark.sql.graft.Simhash64]] expression computes the
  * identical bits row-locally, so the only stateful operator is the
  * dedup itself and rows flow through with no emission delay.
  *
  * Semantics and their limits, honestly stated:
  *   - catches: docs whose simhash is bit-for-bit equal within the
  *     watermark delay — exact clones and the tight near-dup core.
  *   - does not catch: near-dups at Hamming distance ≥ 1. Banded
  *     Hamming-radius matching needs a band self-join + per-pair
  *     verify; bounded-state streaming cannot hold the corpus side
  *     of that join, so radius > 0 stays the batch pass's job
  *     ([[graft.ops.Dedup.simhashPairs]]) — same division of labor
  *     as [[StreamingDedup]] vs the batch exact operators, one level
  *     up the near-dup ladder.
  *
  * State is watermark-bounded exactly as in [[StreamingDedup]]: one
  * 8-byte fingerprint key per distinct survivor inside the lateness
  * window, reclaimed as the watermark passes.
  */
object StreamingNearDedup {

  /** Suppress streamed documents whose simhash fingerprint was already
    * seen within the watermark delay. Adds `simhash`; keeps every
    * input column. Null-text rows are dropped (they have no
    * fingerprint; the batch family's inner semantics).
    */
  def nearDedupStream(stream: DataFrame, eventTimeCol: String,
                      lateness: String = "10 minutes",
                      text: String = "text"): DataFrame =
    stream
      .filter(col(text).isNotNull)
      .withColumn("simhash",
        TextFunctions.simhash64(split(lower(trim(col(text))), " ")))
      .withWatermark(eventTimeCol, lateness)
      .dropDuplicatesWithinWatermark("simhash")
}
