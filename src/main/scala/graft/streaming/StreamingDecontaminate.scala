package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftColumns

/** Ingest-time benchmark decontamination — the streaming front of
  * [[graft.ops.Dedup.contaminationReport]]: flag (or drop) streamed
  * documents sharing any word n-gram with a held-out evaluation set
  * BEFORE they land in the corpus, so eval leakage never needs a
  * retroactive purge.
  *
  * The eval set is distilled ONCE into a Bloom filter of its distinct
  * gram hashes (a distributed aggregation over the eval relation —
  * never collected as raw grams), and the stream side is a STATELESS
  * projection: explode nothing, shuffle nothing, probe each doc's
  * grams against the broadcast filter bytes inside codegen. No
  * watermark, no state store.
  *
  * Guarantees are one-sided, matching what a Bloom filter gives:
  * every truly contaminated document is flagged (zero false
  * negatives — the gate never leaks), while a clean document is
  * falsely flagged with probability ~(1 - e^{-kn/m})^k bounded by
  * sizing `numBits` for the eval gram count. The batch exact operator
  * remains the source of truth (same division of labor as
  * [[StreamingDedup]] vs the batch dedup family): a periodic batch
  * pass can audit or reclaim false positives, but nothing
  * contaminated ever passed.
  */
object StreamingDecontaminate {

  /** Build the eval-side gram Bloom filter (binary) — a distributed
    * agg; only the filter bytes (~numBits/8) reach the driver.
    */
  def evalGramBloom(evalSet: DataFrame, n: Int = 3,
      expectedGrams: Long = 1L << 20, numBits: Long = 1L << 23,
      text: String = "text"): Array[Byte] =
    BloomGate.build(
      evalSet.select(explode(graft.ops.Dedup.shingles(col(text), n)).as("gram")),
      col("gram"), expectedGrams, numBits,
      "evalGramBloom: eval set produced no grams — empty or wrong column?")

  private def mightContain(bloom: Array[Byte], value: Column): Column =
    BloomGate.mightContain(bloom, value)

  /** Add `maybe_contaminated` to a document stream: true iff any of
    * the doc's n-grams probes positive against the eval Bloom filter.
    * Stateless — safe in any output mode, no watermark required.
    */
  def flagStream(stream: DataFrame, evalBloom: Array[Byte], n: Int = 3,
      text: String = "text"): DataFrame = {
    require(evalBloom != null && evalBloom.nonEmpty,
      "flagStream: evalBloom must be a non-empty serialized Bloom filter")
    stream.withColumn("maybe_contaminated",
      exists(graft.ops.Dedup.shingles(col(text), n),
        g => mightContain(evalBloom, g)))
  }

  /** Drop flagged documents (the enforcing gate). */
  def filterStream(stream: DataFrame, evalBloom: Array[Byte], n: Int = 3,
      text: String = "text"): DataFrame =
    flagStream(stream, evalBloom, n, text)
      .filter(!col("maybe_contaminated"))
      .drop("maybe_contaminated")
}
