package graft.streaming

import graft.catalog.BucketCatalog
import graft.core.CandleDuration
import graft.functions.{Candler, Uda}
import graft.operators.{MarketCalendar, TimeQual}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming downsample cascade — the reference's defining trigger
  * behavior (contrib/ondiskagg/aggtrigger/aggtrigger.go): every write
  * to the base bucket (e.g. 1Min bars) re-derives the 5Min/15Min/1H/1D
  * candles whose windows the write touched, and overwrites them in
  * place.
  *
  * Spark-native shape: Structured Streaming `foreachBatch`. Per
  * micro-batch —
  *   1. upsert the batch into the base bucket (slot-overwrite
  *      semantics via the catalog's keyed merge);
  *   2. for each destination timeframe, recompute candles over
  *      [Truncate(batch head), Ceil(batch tail)) PER SYMBOL from the
  *      base bucket (aggtrigger.go writeAggregates:212-293) and upsert
  *      them into the destination partitions.
  *
  * This is late-data-safe the same way the reference is: an
  * out-of-order write re-fires the trigger for the window it lands in
  * and the destination candle is recomputed from ALL base rows of that
  * window — late data is never dropped, there is no watermark discard
  * (aggtrigger recompute semantics, SURVEY §2.7).
  *
  * Scale: the recompute READ is bounded by LITERAL predicates, not by
  * the join — the per-symbol (head, tail) spans are collected on the
  * driver (one tiny agg, ≤ batch symbols rows), their global
  * [min(head), max(tail)] window and symbol list are applied to the
  * base scan as literal `Epoch` bounds + `symbol IN (...)` + a `year`
  * range, so sbucket/year partition pruning and parquet Epoch
  * row-group stats fire (the reference bounds this same read,
  * aggtrigger.go:130-136); the broadcast spans join then refines to
  * each symbol's own window. Per-batch read cost is proportional to
  * the touched span, independent of base-table size.
  */
class DownsampleCascade(
    catalog: BucketCatalog,
    attGroup: String,
    baseTf: String,
    destinations: Seq[String],
    sums: Seq[String] = Seq("Volume"),
    marketFilter: Option[MarketCalendar] = None) {

  /** Process one batch of base-TF rows (symbol, Epoch, OHLCV...). */
  def ingest(batch: DataFrame): Unit = {
    // ONE probe job decides emptiness AND yields the per-symbol spans
    // the cascade needs (the old shape paid a separate isEmpty job per
    // batch before the span collect — guide §1.2: don't compute things
    // twice). Empty batch ⟺ empty span set, so the early-return
    // semantics are unchanged.
    val spans = collectSpans(batch.select(col("symbol"), col(Uda.EpochCol)))
    if (spans.isEmpty) return
    catalog.writeMulti(attGroup, baseTf, batch)
    cascade(spans, batch.sparkSession)
  }

  /** Recompute destination candles for the windows covering `touched`
    * (symbol, Epoch) rows.
    */
  /** The bounded base-bucket slice feeding one recompute: per-symbol
    * (symbol, head, tail) spans → the base rows of every window those
    * spans touch, for the WIDEST destination (it contains every
    * narrower destination's affected windows — the reference queries
    * the destinations' UpperBound for the same reason,
    * aggtrigger.go:130-136). Exposed for plan tests: the scan must
    * carry LITERAL pushed Epoch bounds + symbol/year pruning.
    */
  private[graft] def recomputeSlice(
      spark: org.apache.spark.sql.SparkSession,
      spans: Seq[(String, Long, Long)]): DataFrame = {
    val symbols = spans.map(_._1)
    val widest = destinations.map(CandleDuration.parse).maxBy(_.approxSeconds)
    val lo = widest.truncateEpoch(spans.map(_._2).min)
    val hi = widest.ceilEpoch(spans.map(_._3).max)
    val loYear = java.time.Instant.ofEpochSecond(lo)
      .atZone(java.time.ZoneOffset.UTC).getYear
    val hiYear = java.time.Instant.ofEpochSecond(hi)
      .atZone(java.time.ZoneOffset.UTC).getYear
    // readMulti(symbols) prunes sbucket partitions + pushes symbol IN;
    // the literal year range prunes year partitions; the literal Epoch
    // bounds reach parquet row-group stats (PlanSpec-pinned)
    val base = catalog.readMulti(attGroup, baseTf, symbols)
      .filter(col("year").between(loYear, hiYear))
      .drop("timeframe", "year")
      .filter(col(Uda.EpochCol) >= lit(lo) && col(Uda.EpochCol) < lit(hi))
    import spark.implicits._
    val spansDf = spans.toDF("symbol", "__head", "__tail")
    base.join(broadcast(spansDf), Seq("symbol"))
      .filter(col(Uda.EpochCol) >= widest.truncate(col("__head")) &&
        col(Uda.EpochCol) < widest.ceil(col("__tail")))
  }

  /** One tiny driver collect — ≤ batch-symbols rows — so the base read
    * in recomputeSlice can carry LITERAL (pushable) predicates instead
    * of join-dependent ones.
    */
  private def collectSpans(touched: DataFrame): Seq[(String, Long, Long)] =
    touched.groupBy("symbol")
      .agg(min(col(Uda.EpochCol)).as("__head"), max(col(Uda.EpochCol)).as("__tail"))
      .collect()
      .toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  def cascade(touched: DataFrame): Unit =
    cascade(collectSpans(touched), touched.sparkSession)

  private def cascade(spans: Seq[(String, Long, Long)],
                      session: org.apache.spark.sql.SparkSession): Unit = {
    if (spans.isEmpty) return
    val slice = recomputeSlice(session, spans)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // every destination's candles land in ONE multi-timeframe commit:
      // per-batch commit overhead stops scaling with |destinations|,
      // and readers see all cascade levels move atomically (5Min never
      // updates while 1H is still stale)
      val perDest = destinations.map { d =>
        val dest = CandleDuration.parse(d)
        val affected = slice
          .filter(col(Uda.EpochCol) >= dest.truncate(col("__head")) &&
            col(Uda.EpochCol) < dest.ceil(col("__tail")))
          .drop("__head", "__tail")
        // >= 1D destinations honor the market-hours TimeQual, like the
        // reference's nasdaq filter (aggtrigger.go:237-246)
        val filtered = marketFilter match {
          case Some(cal) if dest.approxSeconds >= 86400L =>
            affected.filter(TimeQual.isMarketOpen(col(Uda.EpochCol), cal))
          case _ => affected
        }
        val candles = Candler.candle(filtered, dest,
          openOf = col("Open"), closeOf = col("Close"),
          highOf = col("High"), lowOf = col("Low"),
          sums = sums, avgs = Nil, groupCols = Seq("symbol"))
        sums.foldLeft(candles)((df, c) => df.withColumnRenamed(s"${c}_SUM", c))
          .withColumn("timeframe", lit(d))
      }
      catalog.writeMultiTf(attGroup, perDest.reduce(_ unionByName _))
    } finally slice.unpersist(blocking = false)
  }

  /** Attach to a streaming source of base-TF rows: each micro-batch is
    * ingested + cascaded (the trigger contract,
    * plugins/trigger/trigger.go:37-43, as foreachBatch).
    */
  def attach(stream: DataFrame, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, _: Long) => ingest(batch))
      .start()
}
