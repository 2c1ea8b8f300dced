package graft.functions

import graft.core.{CandleDuration, FunctionCall}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-defined-aggregate surface.
  *
  * The reference's UDA contract (uda/datatypes.go:25-42 — New /
  * GetRequiredArgs / GetOptionalArgs / GetInitArgs / Accum) becomes a
  * declarative DataFrame→DataFrame transform: every reference aggregate
  * decomposes into built-in, codegen'd Spark aggregates, so none needs
  * an imperative accumulator. `Accum` over a ColumnSeries ≅ `apply`
  * over a DataFrame carrying `Epoch` (long seconds) and optionally
  * `Nanoseconds` (int).
  */
trait Uda {
  def name: String
  /** Required column parameters, in positional order. */
  def requiredArgs: Seq[String]
  /** Optional named column parameters (fed via `Name::Col`). */
  def optionalArgs: Seq[String] = Nil
  /** Quoted init args (e.g. the window: '5Min'). */
  def initArgs: Seq[String] = Nil
  def apply(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String]): DataFrame

  /** Grouped variant: run the aggregate independently per key group
    * (one multi-symbol job instead of a per-bucket fan-out — the
    * reference loops buckets serially, frontend/query.go:216-226).
    * Group columns are carried through the output.
    */
  def applyGrouped(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String],
      groupCols: Seq[String]): DataFrame =
    if (groupCols.isEmpty) apply(df, argMap, init)
    else throw new UnsupportedOperationException(s"$name has no grouped form")
}

object Uda {
  val EpochCol = "Epoch"
  val NanosCol = "Nanoseconds"

  /** Nanosecond-precision event-time ordering key: (Epoch, Nanoseconds).
    * Spark timestamps are µs — keeping (epoch, nanos) as two longs is
    * the overflow-safe total order (SURVEY §7.4). Used everywhere
    * `first/last` semantics appear: min_by/max_by on this struct is
    * deterministic under shuffle, unlike Spark's first()/last().
    */
  def timeKey(df: DataFrame): Column =
    if (df.columns.contains(NanosCol)) struct(col(EpochCol), col(NanosCol))
    else struct(col(EpochCol))
}

/** Shared shape for the scalar aggregates: one output column, with a
  * grouped form that keys the same aggregation by the group columns.
  */
abstract class ScalarUda extends Uda {
  protected def aggExpr(argMap: Map[String, Seq[String]]): Column
  def apply(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String]): DataFrame =
    df.agg(aggExpr(argMap))
  override def applyGrouped(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String],
      groupCols: Seq[String]): DataFrame =
    if (groupCols.isEmpty) apply(df, argMap, init)
    else df.groupBy(groupCols.map(col): _*).agg(aggExpr(argMap))
}

/** Row count → single row of (Epoch = now, Count) — the reference's
  * exact output shape (uda/count/count.go:65-74: Epoch stamped with
  * the current UTC second). Grouped counts keep the group key instead
  * of the timestamp (Spark superset path).
  */
object CountUda extends ScalarUda {
  val name = "count"
  val requiredArgs = Seq("Column")
  protected def aggExpr(argMap: Map[String, Seq[String]]): Column = count(lit(1)).as("Count")
  override def apply(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String]): DataFrame =
    df.agg(aggExpr(argMap)).select(unix_timestamp().as(Uda.EpochCol), col("Count"))
}

/** Single-column min (uda/min/min.go:42-62). */
object MinUda extends ScalarUda {
  val name = "min"
  val requiredArgs = Seq("Column")
  protected def aggExpr(argMap: Map[String, Seq[String]]): Column = min(col(argMap("Column").head)).as("Min")
}

/** Single-column max (uda/max/max.go:42-62). */
object MaxUda extends ScalarUda {
  val name = "max"
  val requiredArgs = Seq("Column")
  protected def aggExpr(argMap: Map[String, Seq[String]]): Column = max(col(argMap("Column").head)).as("Max")
}

/** Single-column mean (uda/avg/avg.go:42-60). */
object AvgUda extends ScalarUda {
  val name = "avg"
  val requiredArgs = Seq("Column")
  protected def aggExpr(argMap: Map[String, Seq[String]]): Column = avg(col(argMap("Column").head)).as("Avg")
}

/** Abnormal-gap detector (uda/gap/gap.go:61-186).
  *
  * Two modes, as in the reference: with an init arg ('5Sec') a fixed
  * threshold — emit consecutive-epoch gaps strictly larger than the
  * window width; with no init arg, gaps whose z-score over the gap
  * distribution exceeds 3 (gap.go:93-109).
  *
  * Scale note: `lag` needs a total order on event time. Within one
  * bucket that is a single window partition; the engine keeps
  * per-symbol partitioning upstream so the sort is per-symbol, not
  * global (see QueryService). For the unpartitioned parity case the
  * input is one bucket's rows, matching the reference's single-series
  * Accum.
  */
object GapUda extends Uda {
  val name = "gap"
  val requiredArgs = Seq("Column")
  override val initArgs = Seq("Timeframe")

  def apply(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String]): DataFrame =
    gaps(df, init.headOption.map(CandleDuration.parse), partitionCols = Nil)

  override def applyGrouped(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String],
      groupCols: Seq[String]): DataFrame =
    gaps(df, init.headOption.map(CandleDuration.parse), partitionCols = groupCols)

  def gaps(df: DataFrame, threshold: Option[CandleDuration], partitionCols: Seq[String]): DataFrame = {
    val w0 = if (partitionCols.isEmpty) Window.orderBy(Uda.timeKey(df))
             else Window.partitionBy(partitionCols.map(col): _*).orderBy(Uda.timeKey(df))
    val withGap = df
      .withColumn("PrevEpoch", lag(col(Uda.EpochCol), 1).over(w0))
      .withColumn("GapLength", col(Uda.EpochCol) - col("PrevEpoch"))
      .filter(col("PrevEpoch").isNotNull)
    val flagged = threshold match {
      case Some(tf) => withGap.filter(col("GapLength") > lit(tf.approxSeconds))
      case None =>
        // z-score > 3 over the gap distribution (population stddev)
        val stats = Seq(avg(col("GapLength")).as("m"), stddev_pop(col("GapLength")).as("s"))
        val keyed = partitionCols match {
          case Nil => withGap.crossJoin(broadcast(withGap.agg(stats.head, stats.tail: _*)))
          case ks  => withGap.join(
            broadcast(withGap.groupBy(ks.map(col): _*).agg(stats.head, stats.tail: _*)), ks)
        }
        keyed.filter(col("s") > 0 && (col("GapLength") - col("m")) / col("s") > 3)
    }
    flagged.select(
      (partitionCols.map(col) ++ Seq(
        col("PrevEpoch").as("Epoch"),
        col(Uda.EpochCol).as("GapEnd"),
        col("GapLength"))): _*)
  }
}

/** Shared OHLC candle construction (contrib/candler/candler.go:297-335
  * AddCandle: open = value at earliest time, close = value at latest,
  * high/low = extrema; optional Sum::X → X_SUM, Avg::X → X_AVG outputs,
  * candler.go:178-210).
  *
  * One shuffle: groupBy(window-start) with partial aggregation map-side.
  * min_by/max_by on the (Epoch, Nanoseconds) struct replaces the
  * reference's earliest/latest bookkeeping and stays deterministic on a
  * cluster.
  */
object Candler {
  def candle(
      df: DataFrame,
      tf: CandleDuration,
      openOf: Column, closeOf: Column, highOf: Column, lowOf: Column,
      sums: Seq[String], avgs: Seq[String],
      groupCols: Seq[String]): DataFrame = {
    val tkey = Uda.timeKey(df)
    val aggs =
      Seq(
        min_by(openOf, tkey).as("Open"),
        max(highOf).as("High"),
        min(lowOf).as("Low"),
        max_by(closeOf, tkey).as("Close")) ++
      sums.map(c => sum(col(c)).as(s"${c}_SUM")) ++
      avgs.map(c => avg(col(c)).as(s"${c}_AVG"))
    df.groupBy((groupCols.map(col) :+ tf.truncate(col(Uda.EpochCol)).as(Uda.EpochCol)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}

/** Tumbling OHLC candles from ticks
  * (contrib/candler/tickcandler/tickcandler.go:57-105). Required arg
  * CandlePrice may map several columns — their row-wise average is the
  * candle price (contrib/candler/candler.go:355-385).
  */
object TickCandlerUda extends Uda {
  val name = "tickcandler"
  val requiredArgs = Seq("CandlePrice")
  override val optionalArgs = Seq("Sum", "Avg")
  override val initArgs = Seq("Timeframe")

  def apply(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String]): DataFrame =
    applyGrouped(df, argMap, init, Nil)

  override def applyGrouped(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String],
      groupCols: Seq[String]): DataFrame = {
    val tf = CandleDuration.parse(init.head)
    val priceCols = argMap("CandlePrice")
    val price =
      if (priceCols.size == 1) col(priceCols.head)
      else priceCols.map(col).reduce(_ + _) / lit(priceCols.size)
    Candler.candle(df, tf,
      openOf = price, closeOf = price, highOf = price, lowOf = price,
      sums = argMap.getOrElse("Sum", Nil), avgs = argMap.getOrElse("Avg", Nil),
      groupCols = groupCols)
  }
}

/** Re-candling OHLC → coarser OHLC
  * (contrib/candler/candlecandler/candlecandler.go:60-130): open of
  * earliest bar, max high, min low, close of latest bar, plus Sum/Avg
  * passthroughs.
  */
object CandleCandlerUda extends Uda {
  val name = "candlecandler"
  val requiredArgs = Seq("Open", "High", "Low", "Close")
  override val optionalArgs = Seq("Sum", "Avg")
  override val initArgs = Seq("Timeframe")

  def apply(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String]): DataFrame =
    applyGrouped(df, argMap, init, Nil)

  override def applyGrouped(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String],
      groupCols: Seq[String]): DataFrame = {
    val tf = CandleDuration.parse(init.head)
    Candler.candle(df, tf,
      openOf = col(argMap("Open").head),
      closeOf = col(argMap("Close").head),
      highOf = col(argMap("High").head),
      lowOf = col(argMap("Low").head),
      sums = argMap.getOrElse("Sum", Nil), avgs = argMap.getOrElse("Avg", Nil),
      groupCols = groupCols)
  }
}

/** Volume-weighted average price: `vwap('1D', Price, Size)` →
  * Σ(p·s)/Σs per bucket, plus Volume and tick count N. Registry
  * superset — the reference only stores feed-computed VWAP columns
  * (contrib/polygon/api/schema.go:20-35 `vw`); see
  * [[graft.operators.Analytics.vwap]] for the aggregation shape.
  */
object VwapUda extends Uda {
  val name = "vwap"
  val requiredArgs = Seq("Price", "Size")
  override val initArgs = Seq("Timeframe")

  def apply(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String]): DataFrame =
    applyGrouped(df, argMap, init, Nil)

  override def applyGrouped(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String],
      groupCols: Seq[String]): DataFrame =
    graft.operators.Analytics.vwap(df, CandleDuration.parse(init.head),
      argMap("Price").head, argMap("Size").head, groupCols)
}

/** Exponential moving average: `ema('7', Close)` adds an EMA column
  * smoothed with span n (α = 2/(n+1)) per group in epoch order —
  * the native [[org.apache.spark.sql.graft.EmaWindow]] window
  * function. Registry superset (the reference's feeds ship no
  * smoothing aggregates at all). With NO group columns the window is
  * a single sorted partition — fine for one bucket's rows (the SQL
  * front's per-TBK tables), never for a raw multi-symbol tape; pass
  * group columns there (same bound as `sessionize`).
  */
object EmaUda extends Uda {
  val name = "ema"
  val requiredArgs = Seq("Value")
  override val initArgs = Seq("N")

  def apply(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String]): DataFrame =
    applyGrouped(df, argMap, init, Nil)

  override def applyGrouped(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String],
      groupCols: Seq[String]): DataFrame = {
    val n = init.head.trim.toInt
    require(n >= 1, s"ema span must be >= 1, got $n")
    graft.operators.Analytics.ema(df, argMap("Value").head, n, groupCols)
  }
}

/** Gap-based sessionization: `sessionize('30Min')` — one row per
  * (group, session) with start/end epochs and the event count; a new
  * session opens when the gap from the previous event exceeds the
  * init-arg duration. Registry superset (no reference UDA); see
  * [[graft.operators.Analytics.sessionize]] for the window shape.
  */
object SessionizeUda extends Uda {
  val name = "sessionize"
  val requiredArgs = Seq.empty[String]
  override val initArgs = Seq("Gap")

  def apply(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String]): DataFrame =
    applyGrouped(df, argMap, init, Nil)

  override def applyGrouped(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String],
      groupCols: Seq[String]): DataFrame = {
    val gap = CandleDuration.parse(init.head).fixedSeconds.getOrElse(
      throw new IllegalArgumentException(
        s"sessionize needs a fixed-width gap, got ${init.head}"))
    graft.operators.Analytics.sessionize(df, gap, groupCols)
  }
}

/** Corporate-action price adjustment (uda/adjust/adjust.go:99-153).
  *
  * The reference walks the price series backwards keeping a running
  * product of rate changes whose effective date is *after* the row.
  * Declarative form: factor(t) = Π rate over changes with epoch > t.
  * The CA table is tiny (per-symbol splits/dividends), so we broadcast
  * it and compute the product with exp(sum(log(rate))) — a broadcast
  * nested-loop join + one partial-aggregated groupBy; no global sort,
  * no driver loop, scales with the price table.
  */
object AdjustUda {
  def apply(
      prices: DataFrame,
      rateChanges: DataFrame, // columns: [matchCols...,] Epoch (long), Rate (double)
      priceCols: Seq[String],
      volumeCols: Seq[String],
      keyCols: Seq[String] = Seq(Uda.EpochCol),
      matchCols: Seq[String] = Nil, // e.g. symbol for multi-series CA tables
      roundTo: Int = 4): DataFrame = {
    val ca = broadcast(rateChanges.select(
      matchCols.map(c => col(c).as(s"__ca_$c")) ++
        Seq(col(Uda.EpochCol).as("caEpoch"), col("Rate").as("caRate")): _*))
    val cond = matchCols.foldLeft(col(Uda.EpochCol) < col("caEpoch")) {
      (acc, c) => acc && col(c) === col(s"__ca_$c")
    }
    val allKeys = (matchCols ++ keyCols).distinct
    val factors = prices.select(allKeys.map(col): _*)
      .join(ca, cond, "left")
      .groupBy(allKeys.map(col): _*)
      .agg(coalesce(exp(sum(log(col("caRate")))), lit(1.0)).as("AdjFactor"))
    val joined = prices.join(factors, allKeys)
    val adjusted = priceCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, round(col(c) * col("AdjFactor"), roundTo))
    }
    val withVol = volumeCols.foldLeft(adjusted) { (d, c) =>
      d.withColumn(c, col(c) / col("AdjFactor"))
    }
    withVol.drop("AdjFactor")
  }
}

/** Registry-bound adjust (sqlparser/registry.go:40 `adjust` with
  * CatalogDir): rate changes load from a corporate-actions bucket in
  * the catalog; init args pick 'split'/'dividend' event types when the
  * CA bucket carries a Type column (uda/adjust/adjust.go:56-96).
  * Grouped form joins CA rows per symbol — one broadcast join for all
  * symbols in the query.
  */
final class AdjustRegistryUda(
    catalog: graft.catalog.BucketCatalog,
    caAttGroup: String = "CA",
    caTimeframe: String = "1D") extends Uda {
  val name = "adjust"
  val requiredArgs = Seq("Price")
  override val optionalArgs = Seq("Volume")
  override val initArgs = Seq("Types")

  def apply(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String]): DataFrame =
    applyGrouped(df, argMap, init, Nil)

  override def applyGrouped(df: DataFrame, argMap: Map[String, Seq[String]], init: Seq[String],
      groupCols: Seq[String]): DataFrame = {
    val ca0 = catalog.readMulti(caAttGroup, caTimeframe)
    val ca1 =
      if (init.nonEmpty && ca0.columns.contains("Type"))
        ca0.filter(lower(col("Type")).isin(init.map(_.toLowerCase): _*))
      else ca0
    val matchCols = groupCols.filter(ca1.columns.contains)
    AdjustUda(df, ca1, priceCols = argMap("Price"),
      volumeCols = argMap.getOrElse("Volume", Nil),
      matchCols = matchCols)
  }
}

/** Name → UDA registry + chained runner
  * (sqlparser/registry.go:32-49 NewDefaultAggRunner; Run :51-113 chains
  * calls — output of agg N is input of agg N+1).
  */
object AggRegistry {
  val all: Map[String, Uda] = Seq(
    CountUda, MinUda, MaxUda, AvgUda, GapUda, TickCandlerUda, CandleCandlerUda,
    VwapUda, SessionizeUda, EmaUda)
    .map(u => u.name -> u).toMap

  /** Default registry + catalog-bound aggregates (`adjust` needs the
    * CA bucket — NewDefaultAggRunner(catDir), sqlparser/registry.go:32-49).
    */
  def forCatalog(catalog: graft.catalog.BucketCatalog,
      caAttGroup: String = "CA", caTimeframe: String = "1D"): Map[String, Uda] =
    all + ("adjust" -> new AdjustRegistryUda(catalog, caAttGroup, caTimeframe))

  def run(calls: Seq[String], df: DataFrame): DataFrame =
    runGrouped(calls, df, Nil)

  /** Chained pipeline keyed by group columns: every stage aggregates
    * per key, so a multi-symbol query is ONE job end-to-end.
    */
  def runGrouped(calls: Seq[String], df: DataFrame, groupCols: Seq[String],
      registry: Map[String, Uda] = all): DataFrame =
    calls.foldLeft(df) { (d, callStr) =>
      val call = FunctionCall.parse(callStr)
      val uda = registry.getOrElse(call.name,
        throw new IllegalArgumentException(s"unknown aggregate: ${call.name}"))
      uda.applyGrouped(d, call.argMap(uda.requiredArgs), call.initArgs, groupCols)
    }
}
