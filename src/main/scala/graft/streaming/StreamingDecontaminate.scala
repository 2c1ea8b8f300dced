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
      text: String = "text"): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.Literal
    // BloomFilterAggregate silently clamps its sizing to the
    // runtime-bloom-filter conf caps (Math.min in the 4.1.2 jar);
    // raise them to the requested size so "FP bounded by numBits"
    // actually holds for large eval suites instead of degrading
    // orders of magnitude past 2^26 bits
    val spark = evalSet.sparkSession
    def raiseCap(key: String, want: Long): Unit = {
      val cur = spark.conf.getOption(key).map(_.toLong)
      if (cur.forall(_ < want)) spark.conf.set(key, want.toString)
    }
    raiseCap("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", numBits)
    raiseCap("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", expectedGrams)
    val grams = evalSet.select(
      explode(graft.ops.Dedup.shingles(col(text), n)).as("gram"))
    val hashed = XxHash64(Seq(GraftColumns.expr(col("gram"))), 42L)
    val agg = GraftColumns.column(
      new BloomFilterAggregate(hashed, Literal(expectedGrams), Literal(numBits))
        .toAggregateExpression())
    val bf = grams.agg(agg.as("bf")).head().getAs[Array[Byte]](0)
    // zero grams → BloomFilterAggregate.eval returns null; a null
    // literal downstream would turn filterStream's !maybe_contaminated
    // into filter(null) and silently DROP the whole stream — fail
    // loudly on the misconfiguration instead
    if (bf == null)
      throw new IllegalArgumentException(
        "evalGramBloom: eval set produced no grams — empty or wrong column?")
    bf
  }

  private def mightContain(bloom: Array[Byte], value: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.types.BinaryType
    GraftColumns.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      XxHash64(Seq(GraftColumns.expr(value)), 42L)))
  }

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
