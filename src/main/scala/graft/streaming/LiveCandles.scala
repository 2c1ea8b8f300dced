package graft.streaming

import graft.core.CandleDuration
import graft.functions.Uda
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous candle stream: event-time tumbling windows with a
  * watermark bounding the aggregation state.
  *
  * This is the BOUNDED-STATE complement to [[DownsampleCascade]]:
  * the cascade (like the reference's trigger) recomputes from storage
  * and never drops late data; this operator is the pure Structured
  * Streaming view — windowed aggregation in `update` mode whose state
  * is reclaimed once the watermark passes a window, at the cost of
  * dropping rows later than the allowed delay. Use it for live
  * display/push feeds; the cascade remains the source of truth.
  */
object LiveCandles {

  /** Event-time OHLCV candles over a stream of rows carrying
    * (groupCols..., Epoch, price/volume columns). `tf` must be a
    * fixed-width timeframe (windows of W/M/Y width are served by the
    * cascade instead).
    *
    * CHECKPOINT COMPATIBILITY: the output (and thus the streaming
    * aggregation state) schema includes the VWAP column added after
    * the first release of this operator — a query restarted from a
    * checkpoint written by the pre-VWAP shape fails Spark's state
    * schema check. Restart such queries with a NEW checkpoint
    * location (the cascade remains the recovery source of truth, so
    * no data is lost); any future column addition here carries the
    * same contract.
    */
  def candles(
      stream: DataFrame,
      tf: CandleDuration,
      allowedLateness: String = "1 minute",
      priceCol: String = "Price",
      sizeCol: String = "Size",
      groupCols: Seq[String] = Seq("symbol")): DataFrame = {
    val width = tf.fixedSeconds.getOrElse(
      throw new IllegalArgumentException(
        s"streaming candles need a fixed-width timeframe, got ${tf.string}"))
    val withTs = stream.withColumn("__ts", timestamp_seconds(col(Uda.EpochCol)))
      .withWatermark("__ts", allowedLateness)
    val tkey = struct(col(Uda.EpochCol))
    withTs
      .groupBy((groupCols.map(col) :+ window(col("__ts"), s"$width seconds").as("__w")): _*)
      .agg(
        min_by(col(priceCol), tkey).as("Open"),
        max(col(priceCol)).as("High"),
        min(col(priceCol)).as("Low"),
        max_by(col(priceCol), tkey).as("Close"),
        sum(col(sizeCol)).as("Volume"),
        // live VWAP in the same state row — the `vw` field production
        // bar feeds carry (the reference ingests it precomputed,
        // contrib/polygon/api/schema.go:20-35; batch sibling:
        // graft.operators.Analytics.vwap)
        (sum(col(priceCol) * col(sizeCol)) / sum(col(sizeCol))).as("VWAP"))
      .select((groupCols.map(col) :+
        unix_timestamp(col("__w.start")).as(Uda.EpochCol)) ++
        Seq(col("Open"), col("High"), col("Low"), col("Close"), col("Volume"),
          col("VWAP")): _*)
  }
}
