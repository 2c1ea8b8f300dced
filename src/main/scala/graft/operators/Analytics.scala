package graft.operators

import graft.core.CandleDuration
import graft.functions.Uda
import org.apache.spark.sql.DataFrame
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
  * narrower than the tick input, and in every shipped entry the
  * window is keyed by the group columns — no empty-key WindowExec
  * (PlanSpec rejects those across all entries), no global sort.
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

  /** Gap-based sessionization of an event stream: per key, a new
    * session starts at the first event and whenever the epoch gap
    * from the previous event exceeds `gapSeconds`; output is one row
    * per (key, session) with start/end epochs and the event count.
    * The two windows share one per-key sort (same partition + order),
    * and the key is the natural partitioner at scale — a user's
    * events must meet on one executor to be ordered, which is the
    * problem statement, not an implementation choice. Extra ordering
    * columns (`orderTail`) break same-second ties deterministically.
    * With NO key columns the window is a single partition (one task
    * sorts everything) — only call it that way on per-bucket data the
    * surrounding query already bounded, never on a raw tape.
    */
  def sessionize(events: DataFrame, gapSeconds: Long, keyCols: Seq[String],
      orderTail: Seq[String] = Nil): DataFrame = {
    val ord = (col(Uda.EpochCol) +:
      (if (events.columns.contains(Uda.NanosCol)) Seq(col(Uda.NanosCol)) else Nil)) ++
      orderTail.map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    events
      .withColumn("__brk",
        when(col(Uda.EpochCol) - lag(col(Uda.EpochCol), 1).over(w) > gapSeconds ||
          lag(col(Uda.EpochCol), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("SessionId", sum(col("__brk")).over(w))
      .groupBy((keyCols.map(col) :+ col("SessionId")): _*)
      .agg(min(col(Uda.EpochCol)).as("SessionStart"),
        max(col(Uda.EpochCol)).as("SessionEnd"),
        count(lit(1)).as("NEvents"))
  }

  /** Exponential moving average of `valueCol` per key in epoch order
    * (span convention α = 2/(n+1)), via the native
    * [[org.apache.spark.sql.graft.EmaWindow]] window function — the
    * recursion runs inside the window operator's generated
    * projection, one double of state per key, same single per-key
    * sort as `lag`. See that class doc for why neither a frame
    * aggregate nor a closed form works.
    */
  def ema(bars: DataFrame, valueCol: String, n: Int,
      groupCols: Seq[String]): DataFrame =
    bars.withColumn("EMA",
      org.apache.spark.sql.graft.WindowFunctions.ema(col(valueCol), n,
        groupCols.map(col), Seq(col(Uda.EpochCol))))

  /** Bollinger bands: `n`-bar trailing mean ± `k`·sample-stddev of
    * `valueCol`; bands are null until the trailing window is full so
    * partial-window artifacts never leak into signals. Pure frame
    * aggregates — one per-key sort shared by all three columns.
    */
  def bollinger(bars: DataFrame, valueCol: String, n: Int, k: Double,
      groupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(Uda.EpochCol))
      .rowsBetween(-(n - 1L), Window.currentRow)
    val full = count(col(valueCol)).over(w) === n
    val mid = when(full, avg(col(valueCol)).over(w))
    val dev = when(full, stddev_samp(col(valueCol)).over(w) * k)
    bars.withColumn("BollMid", mid)
      .withColumn("BollUp", mid + dev)
      .withColumn("BollDown", mid - dev)
  }

  /** Cutler's RSI (simple-moving-average variant — Cutler's form is
    * the standard one that is expressible as a pure frame aggregate;
    * Wilder's smoothing is the [[ema]] recursion with α = 1/n and can
    * be composed from it): 100 − 100/(1 + SMA(gains,n)/SMA(losses,n))
    * over per-bar deltas, 100 where the loss average is zero, null
    * until `n` deltas exist. One per-key sort for delta + both SMAs.
    */
  /** Per-bar delta decomposed into `__gain`/`__loss` columns (null on
    * each key's first bar) — the shared front of both RSI variants.
    */
  private def gainsLosses(bars: DataFrame, valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(Uda.EpochCol))
    val delta = col(valueCol) - lag(col(valueCol), 1).over(w)
    bars
      .withColumn("__gain", when(delta > 0, delta).otherwise(when(delta.isNotNull, 0.0)))
      .withColumn("__loss", when(delta < 0, -delta).otherwise(when(delta.isNotNull, 0.0)))
  }

  def rsi(bars: DataFrame, valueCol: String, n: Int,
      groupCols: Seq[String]): DataFrame = {
    val wf = Window.partitionBy(groupCols.map(col): _*).orderBy(col(Uda.EpochCol))
      .rowsBetween(-(n - 1L), Window.currentRow)
    val withD = gainsLosses(bars, valueCol, groupCols)
    val full = count(col("__gain")).over(wf) === n
    val avgGain = avg(col("__gain")).over(wf)
    val avgLoss = avg(col("__loss")).over(wf)
    withD.withColumn("RSI",
        when(full && avgLoss === 0.0, 100.0)
          .when(full, lit(100.0) - lit(100.0) / (lit(1.0) + avgGain / avgLoss)))
      .drop("__gain", "__loss")
  }

  /** Wilder's RSI: gains/losses smoothed with the Wilder recursion
    * (α = 1/n) instead of [[rsi]]'s simple averages. Seed convention:
    * the smoothed averages seed with the FIRST delta's gain/loss (the
    * EMA-seed variant common in charting libraries; Wilder's original
    * seeds with an SMA of the first n — compose [[rsi]] if that is
    * required). Null on each key's first bar (no delta yet). Both
    * smoothings ride one [[org.apache.spark.sql.graft.EmaWindow]]
    * pass each over the same per-key sort.
    */
  def rsiWilder(bars: DataFrame, valueCol: String, n: Int,
      groupCols: Seq[String]): DataFrame = {
    val parts = groupCols.map(col); val ord = Seq(col(Uda.EpochCol))
    val alpha = 1.0 / n
    val withD = gainsLosses(bars, valueCol, groupCols)
    val smoothed = withD
      .withColumn("__ag",
        org.apache.spark.sql.graft.WindowFunctions.emaAlpha(col("__gain"), alpha, parts, ord))
      .withColumn("__al",
        org.apache.spark.sql.graft.WindowFunctions.emaAlpha(col("__loss"), alpha, parts, ord))
    smoothed.withColumn("RSIW",
        when(col("__ag").isNull || col("__al").isNull, lit(null).cast("double"))
          .when(col("__al") === 0.0, 100.0)
          .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + col("__ag") / col("__al"))))
      .drop("__gain", "__loss", "__ag", "__al")
  }

  /** MACD(fast, slow, signal): EMA(fast) − EMA(slow) of the value,
    * plus the signal EMA of the MACD line and the histogram — three
    * [[org.apache.spark.sql.graft.EmaWindow]] recursions chained over
    * the SAME per-key sort (adjacent Window operators with one
    * ordering: one exchange + one sort in the plan). All αs are
    * 2/(span+1) computed in double — an oracle deriving them with the
    * same division replays bit-equal.
    */
  def macd(bars: DataFrame, valueCol: String,
      fast: Int = 12, slow: Int = 26, signal: Int = 9,
      groupCols: Seq[String] = Nil): DataFrame = {
    val parts = groupCols.map(col); val ord = Seq(col(Uda.EpochCol))
    val wf = org.apache.spark.sql.graft.WindowFunctions
    bars
      .withColumn("__ef", wf.ema(col(valueCol), fast, parts, ord))
      .withColumn("__es", wf.ema(col(valueCol), slow, parts, ord))
      .withColumn("MACD", col("__ef") - col("__es"))
      .withColumn("MACDSignal", wf.ema(col("MACD"), signal, parts, ord))
      .withColumn("MACDHist", col("MACD") - col("MACDSignal"))
      .drop("__ef", "__es")
  }

  /** Average True Range (Wilder '78): true range =
    * max(H−L, |H−C₋₁|, |L−C₋₁|) smoothed with the Wilder recursion
    * (α = 1/n) through [[org.apache.spark.sql.graft.EmaWindow]] —
    * the bar's range widened by any overnight gap. First bar's TR is
    * H−L (no previous close); one per-key sort shared by the lag and
    * the smoothing.
    */
  def atr(bars: DataFrame, n: Int, groupCols: Seq[String],
      high: String = "High", low: String = "Low",
      close: String = "Close"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(Uda.EpochCol))
    val prevC = lag(col(close), 1).over(w)
    val tr = when(prevC.isNull, col(high) - col(low))
      .otherwise(greatest(col(high) - col(low),
        abs(col(high) - prevC), abs(col(low) - prevC)))
    bars.withColumn("__tr", tr)
      .withColumn("ATR",
        org.apache.spark.sql.graft.WindowFunctions.emaAlpha(col("__tr"), 1.0 / n,
          groupCols.map(col), Seq(col(Uda.EpochCol))))
      .drop("__tr")
  }

  /** Donchian channel: trailing `n`-bar highest high / lowest low and
    * their midline — pure frame aggregates (the window fills from the
    * first bar; partial windows are the standard Donchian convention).
    */
  def donchian(bars: DataFrame, n: Int, groupCols: Seq[String],
      high: String = "High", low: String = "Low"): DataFrame = {
    val wf = Window.partitionBy(groupCols.map(col): _*).orderBy(col(Uda.EpochCol))
      .rowsBetween(-(n - 1L), Window.currentRow)
    bars.withColumn("DonchianUp", max(col(high)).over(wf))
      .withColumn("DonchianDown", min(col(low)).over(wf))
      .withColumn("DonchianMid",
        (col("DonchianUp") + col("DonchianDown")) / 2.0)
  }

  /** Pearson correlation of per-bar values between every PAIR of
    * keys sharing an epoch: one epoch-keyed sort-merge self-join
    * (`k1 < k2` halves the pairs), then a partial-aggregated
    * `corr` per pair — the matrix entry count Θ(K²) is the problem
    * statement; the join and the aggregation each shuffle rows, never
    * materialize the matrix on the driver. Rows where either side's
    * value is null (e.g. a first-bar log return) drop out of `corr`
    * on both engines identically.
    */
  def pairCorrelation(bars: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val a = bars.select(col(keyCol).as("k1"), col(Uda.EpochCol),
      col(valueCol).as("v1"))
    val b = bars.select(col(keyCol).as("k2"), col(Uda.EpochCol),
      col(valueCol).as("v2"))
    // explicit co-moment sums instead of corr(): ANSI-mode corr THROWS
    // DIVIDE_BY_ZERO on a zero-variance or single-observation pair
    // (and NaNs with ANSI off) where SQL engines return NULL — sums
    // never divide, and the degenerate cases null out in the final
    // guarded expression
    val both = col("v1").isNotNull && col("v2").isNotNull
    val x = when(both, col("v1")); val y = when(both, col("v2"))
    a.join(b, Seq(Uda.EpochCol)).filter(col("k1") < col("k2"))
      .groupBy(col("k1"), col("k2"))
      .agg(count(when(both, 1)).as("NObs"),
        sum(x).as("__sx"), sum(y).as("__sy"), sum(x * x).as("__sxx"),
        sum(y * y).as("__syy"), sum(x * y).as("__sxy"))
      .withColumn("__den",
        sqrt(col("NObs") * col("__sxx") - col("__sx") * col("__sx")) *
          sqrt(col("NObs") * col("__syy") - col("__sy") * col("__sy")))
      .withColumn("Correlation",
        when(col("NObs") > 1 && col("__den") > 0,
          (col("NObs") * col("__sxy") - col("__sx") * col("__sy")) / col("__den")))
      .select(col("k1"), col("k2"), col("Correlation"), col("NObs"))
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
