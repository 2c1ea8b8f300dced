package graft.operators

import graft.core.CandleDuration
import graft.functions.Uda
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Derived market analytics over tick/bar tables — the downstream
  * workloads a marketstore user runs on query results. The reference
  * stores upstream-computed VWAP columns from its feeds
  * (contrib/polygon/api/schema.go:20-35 `vw`) but has no in-engine
  * aggregate for them; here VWAP, trailing volatility, and maximum
  * drawdown are first-class, computed from the raw tape.
  *
  * Scale shape: [[vwap]] is one partial-aggregated groupBy on
  * (keys, bucket) — the same single shuffle a candler does. The
  * window ops ([[logReturns]], [[rollingVol]], [[maxDrawdown]]) are
  * meant to run AFTER a bar-level aggregation, so their window
  * partitions hold bars (symbols × days), orders of magnitude
  * narrower than the tick input, and every window is keyed by the
  * group columns — no empty-key WindowExec (PlanSpec rejects those
  * repo-wide), no global sort.
  */
object Analytics {

  /** Volume-weighted average price per (groupCols, `tf` bucket):
    * Σ(price·size)/Σ(size), with total volume and tick count.
    */
  def vwap(df: DataFrame, tf: CandleDuration, priceCol: String, sizeCol: String,
      groupCols: Seq[String]): DataFrame =
    df.groupBy((groupCols.map(col) :+
        tf.truncate(col(Uda.EpochCol)).as(Uda.EpochCol)): _*)
      .agg((sum(col(priceCol) * col(sizeCol)) / sum(col(sizeCol))).as("VWAP"),
        sum(col(sizeCol)).as("Volume"),
        count(lit(1)).as("N"))

  /** Per-bar log return against the previous bar of the same keys:
    * ln(close_t / close_t−1); null on each key's first bar.
    */
  def logReturns(bars: DataFrame, closeCol: String,
      groupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(Uda.EpochCol))
    bars.withColumn("LogReturn", log(col(closeCol) / lag(col(closeCol), 1).over(w)))
  }

  /** Trailing `n`-bar sample stddev of `LogReturn` (the annualization
    * multiplier is the caller's); null until two returns exist in the
    * window — stddev_samp ignores the leading null return.
    */
  def rollingVol(returns: DataFrame, n: Int, groupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(Uda.EpochCol))
      .rowsBetween(-(n - 1L), Window.currentRow)
    returns.withColumn("Volatility", stddev_samp(col("LogReturn")).over(w))
  }

  /** Per-key maximum drawdown: min over bars of
    * close / runningMax(close) − 1 (≤ 0; 0 for a series that never
    * dips below a prior peak), with the trough's epoch. Ties on the
    * minimal drawdown — the monotone dd = 0 case is the common one —
    * resolve to the EARLIEST epoch via the lexicographic
    * (drawdown, epoch) min_by key, so the answer is deterministic
    * under shuffle and replayable by an oracle.
    */
  def maxDrawdown(bars: DataFrame, closeCol: String,
      groupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(Uda.EpochCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bars
      .withColumn("__dd", col(closeCol) / max(col(closeCol)).over(w) - 1)
      .groupBy(groupCols.map(col): _*)
      .agg(min(col("__dd")).as("MaxDrawdown"),
        min_by(col(Uda.EpochCol), struct(col("__dd"), col(Uda.EpochCol)))
          .as("TroughEpoch"))
  }
}
