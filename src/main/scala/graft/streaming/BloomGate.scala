package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graft.GraftColumns

/** Shared Bloom-filter machinery of the stateless streaming gates
  * ([[StreamingDecontaminate]], [[StreamingDedup]]'s corpus-index
  * gate): one distributed build aggregation (only the filter bytes
  * reach the driver) and one codegen'd probe expression. Kept in ONE
  * place so the conf-cap workaround and the hash seed cannot diverge
  * between the gates.
  */
private[streaming] object BloomGate {

  /** Distributed Bloom build over `value` rows of `df`.
    *
    * BloomFilterAggregate silently clamps its sizing to the
    * runtime-bloom-filter conf caps (Math.min in the 4.1.2 jar);
    * the caps are raised to the requested size so "FP bounded by
    * numBits" actually holds instead of degrading orders of
    * magnitude past 2^26 bits. A build over zero rows aggregates to
    * null — a null literal downstream would turn `!mightContain`
    * into filter(null) and silently DROP the whole stream, so it
    * fails loudly with `emptyMsg` instead.
    */
  def build(df: DataFrame, value: Column,
            expectedItems: Long, numBits: Long,
            emptyMsg: String): Array[Byte] = BloomGate.synchronized {
    import org.apache.spark.sql.catalyst.expressions.XxHash64
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.Literal
    val spark = df.sparkSession
    // the caps only need to hold while the build aggregation runs;
    // raise them for that window and RESTORE the prior values after,
    // so a big gate build doesn't permanently resize every unrelated
    // runtime bloom join filter in the session. Builds SERIALIZE on
    // this object: two concurrent builds in one session would
    // save/restore the shared conf underneath each other (one build's
    // restore landing mid-analysis of the other would re-clamp its
    // filter); gate builds are rare one-off aggregations, so the
    // coarse lock costs nothing
    val wants = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> numBits,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> expectedItems)
    val saved = wants.map { case (k, _) => k -> spark.conf.getOption(k) }
    wants.foreach { case (k, want) =>
      if (spark.conf.getOption(k).map(_.toLong).forall(_ < want))
        spark.conf.set(k, want.toString)
    }
    try {
      val agg = GraftColumns.column(
        new BloomFilterAggregate(
          XxHash64(Seq(GraftColumns.expr(value)), 42L),
          Literal(expectedItems), Literal(numBits)).toAggregateExpression())
      val bf = df.agg(agg.as("bf")).head().getAs[Array[Byte]](0)
      if (bf == null) throw new IllegalArgumentException(emptyMsg)
      bf
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Probe `value` against serialized filter bytes (same 42L seed as
    * [[build]]).
    */
  def mightContain(bloom: Array[Byte], value: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.types.BinaryType
    require(bloom != null && bloom.nonEmpty,
      "mightContain: bloom must be a non-empty serialized Bloom filter")
    GraftColumns.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      XxHash64(Seq(GraftColumns.expr(value)), 42L)))
  }
}
