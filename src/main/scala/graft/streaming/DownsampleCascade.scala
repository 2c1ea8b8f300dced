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
  * Scale: the recompute span is bounded by the batch's touched
  * windows, joined as a broadcast of per-symbol (head, tail) bounds —
  * base-table partition pruning + parquet epoch stats keep the re-read
  * proportional to the touched span, not the table.
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
    if (batch.isEmpty) return
    catalog.writeMulti(attGroup, baseTf, batch)
    cascade(batch.select(col("symbol"), col(Uda.EpochCol)))
  }

  /** Recompute destination candles for the windows covering `touched`
    * (symbol, Epoch) rows.
    */
  def cascade(touched: DataFrame): Unit = {
    val spans = touched.groupBy("symbol")
      .agg(min(col(Uda.EpochCol)).as("__head"), max(col(Uda.EpochCol)).as("__tail"))
    val base = catalog.readMulti(attGroup, baseTf)
      .drop("timeframe", "year")
    // read the base slice ONCE for the WIDEST destination's span — it
    // contains every narrower destination's affected windows (the
    // reference queries the destinations' UpperBound for the same
    // reason, aggtrigger.go:130-136) — and reuse it per destination
    val widest = destinations.map(CandleDuration.parse).maxBy(_.approxSeconds)
    val slice = base.join(broadcast(spans), Seq("symbol"))
      .filter(col(Uda.EpochCol) >= widest.truncate(col("__head")) &&
        col(Uda.EpochCol) < widest.ceil(col("__tail")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      destinations.foreach { d =>
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
        val renamed = sums.foldLeft(candles)((df, c) => df.withColumnRenamed(s"${c}_SUM", c))
        catalog.writeMulti(attGroup, d, renamed)
      }
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
