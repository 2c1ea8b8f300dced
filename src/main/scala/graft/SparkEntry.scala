package graft

import graft.functions._
import graft.operators.TimeSeries
import graft.ops.{Classifier, Cluster, Dedup, Multimodal, Packing, Sampling, Similarity, TextAnalysis}
import graft.sources.Tables
import graft.core.CandleDuration
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator from SURVEY §2 (or an
  * LLM-pipeline extension) against the driver testdata; `oracleSql`
  * holds the DuckDB-equivalent SQL. Column names and row order are
  * aligned on both sides; float aggregates are rounded to absorb
  * summation-order noise.
  *
  * The `events` table plays the role of a marketstore bucket:
  * `event_type` ≅ symbol, `value` ≅ price, `ts` → (Epoch, Nanoseconds).
  */
object SparkEntry {
  // epoch-second bounds used by range queries (UTC; events span Jan 2024)
  private val T1 = 1704844800L // 2024-01-10
  private val T2 = 1705708800L // 2024-01-20

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * per-type daily OHLC candles from raw events — the reference's
    * tickcandler shape (contrib/candler/tickcandler) over all symbols.
    */
  def entry(spark: SparkSession): DataFrame = {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    Candler.candle(ev, CandleDuration.parse("1D"),
      openOf = col("value"), closeOf = col("value"),
      highOf = col("value"), lowOf = col("value"),
      sums = Seq("value"), avgs = Nil, groupCols = Seq("event_type"))
  }

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  /** The sign-planted oracle construction shared by the semantic-dedup
    * and IVF entries: vectors become |x| (even ids) or −|x| (odd ids),
    * so cross-sign cosine ≤ 0 and the injected ±1⃗ quantizer assigns
    * each sign its own cell with certainty. ONE definition — the
    * oracles mirror it verbatim, and fixture-dimension changes must
    * hit every user at once.
    */
  private def signPlanted(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      when(col("vec_id") % 2 === 0, transform(col("embedding"), x => abs(x)))
        .otherwise(transform(col("embedding"), x => -abs(x))).as("embedding"))
  private val SignQuantizer =
    Array[Seq[Float]](Seq.fill(64)(1.0f), Seq.fill(64)(-1.0f))

  private def purchases(s: SparkSession, dir: String): DataFrame =
    ev(s, dir).filter(col("event_type") === "purchase")

  /** Daily OHLC candles of purchase values — shared input for the
    * re-candle / adjust queries.
    */
  private def dailyCandles(s: SparkSession, dir: String): DataFrame =
    AggRegistry.run(Seq("tickcandler('1D', value, Sum::value)"), purchases(s, dir))

  /** Per-source keep rates for q_sample_weighted — the mixing config a
    * corpus build would carry; sources beyond the map get 0.3.
    */
  private val SampleRates = Map(
    "src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25, "src4" -> 0.1)

  // Previous-invocation temp dirs for entries that materialize an
  // on-disk artifact (the IVF trigger/compact/refresh index copies,
  // the JSONL round-trip corpus): each new invocation reclaims the
  // SAME entry's previous dir — this process has moved past its lazy
  // reads of it — so repeated Verify/Bench iterations in one process
  // hold at most ONE artifact copy per entry (plus one shutdown hook
  // each for the final copy) instead of accumulating one per
  // iteration. A fixed path instead would race concurrent
  // Bench/Verify PROCESSES: one's overwrite deletes part files under
  // the other's lazy read.
  private val entryTmpDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def freshEntryDir(entry: String, prefix: String): String = {
    val out = java.nio.file.Files.createTempDirectory(prefix).toString
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    entryTmpDirs.put(entry, out) match {
      case null => sys.addShutdownHook {
        Option(entryTmpDirs.get(entry)).foreach(d => rm(new java.io.File(d)))
      }
      case prev => rm(new java.io.File(prev))
    }
    out
  }

  // q_sql_tbk_catalog's backing catalogs, one temp root per INPUT DIR
  // per process: a multi-scale bench run re-invokes the entry with
  // different dirs in one JVM, and a shared root would keep the
  // previous dir's rows (slot overwrite never deletes keys the new
  // batch doesn't touch) — stale rows the oracle, computed from the
  // current dir only, would flag. Re-invocations for the SAME dir
  // reuse the root; their rewrites are idempotent.
  // cache only the temp ROOT per dir, never the catalog: a catalog
  // captures its constructing SparkSession, and a later invocation for
  // the same dir may arrive with a different (or restarted) session
  private val tbkSqlState = new java.util.concurrent.ConcurrentHashMap[
    String, String]()

  /** Synthetic corporate-action rate changes, derived deterministically
    * from the events table (so the DuckDB oracle can rebuild them).
    */
  private def rateChanges(s: SparkSession, dir: String): DataFrame =
    ev(s, dir).filter(col("event_type") === "error" && col("event_id") % 97 === 0)
      .select(col("Epoch"), (lit(1.0) + (col("event_id") % 7).cast("double") / 100.0).as("Rate"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map[String, (SparkSession, String) => DataFrame](
    // ---- §2.1/§2.2 scan + range + projection --------------------------
    "q_scan_range_project" -> ((s, dir) => {
      val df = TimeSeries.project(
        TimeSeries.rangeFilter(ev(s, dir), T1, 0, T2 - 1),
        Seq("event_type", "value", "event_id"))
      df.select(
        col("Epoch").as("epoch"), col("Nanoseconds").cast("long").as("nanoseconds"),
        col("event_type"), col("value"), col("event_id"))
        .orderBy("event_id")
    }),

    // ---- §2.6 FIRST-n / LAST-n row limits -----------------------------
    "q_limit_first" -> ((s, dir) => {
      TimeSeries.limit(ev(s, dir).select(col("Epoch"), col("Nanoseconds"), col("event_id"), col("value")),
          100, fromStart = true, tieBreak = Seq("event_id"))
        .select(col("Epoch").as("epoch"), col("event_id"), col("value"))
        .orderBy("epoch", "event_id")
    }),
    "q_limit_last" -> ((s, dir) => {
      TimeSeries.limit(ev(s, dir).select(col("Epoch"), col("Nanoseconds"), col("event_id"), col("value")),
          100, fromStart = false, tieBreak = Seq("event_id"))
        .select(col("Epoch").as("epoch"), col("event_id"), col("value"))
        .orderBy("epoch", "event_id")
    }),

    // ---- §2.4 basic UDA pipeline (count/min/max/avg) ------------------
    "q_agg_count" -> ((s, dir) =>
      AggRegistry.run(Seq("count(value)"), purchases(s, dir))
        .select(col("Count").as("cnt"))),
    "q_agg_min_max_avg" -> ((s, dir) =>
      // one scan, one partial-agg pass — the individual Min/Max/Avg
      // UDAs (exercised in UdaSpec) compose into a single agg here
      purchases(s, dir).agg(
        min(col("value")).as("vmin"), max(col("value")).as("vmax"),
        round(avg(col("value")), 6).as("vavg"))),

    // ---- §2.4 gap detection -------------------------------------------
    "q_gap_threshold" -> ((s, dir) =>
      GapUda.gaps(ev(s, dir), Some(CandleDuration.parse("1H")), Seq("event_type"))
        .select(col("event_type"), col("Epoch").as("epoch"),
          col("GapEnd").as("gap_end"), col("GapLength").as("gap_length"))
        .orderBy("event_type", "epoch")),
    "q_gap_zscore" -> ((s, dir) =>
      // keyed by event_type: the lag window AND the z-score stats are
      // per-symbol, so no stage funnels the table through one task
      GapUda.gaps(ev(s, dir), None, Seq("event_type"))
        .select(col("event_type"), col("Epoch").as("epoch"),
          col("GapEnd").as("gap_end"), col("GapLength").as("gap_length"))
        .orderBy("event_type", "epoch")),

    // ---- §2.4/§2.5 candlers + tumbling windows ------------------------
    "q_tickcandler_1d" -> ((s, dir) =>
      dailyCandles(s, dir)
        .select(col("Epoch").as("epoch"), col("Open").as("open"),
          col("High").as("high"), col("Low").as("low"), col("Close").as("close"),
          round(col("value_SUM"), 6).as("value_sum"))
        .orderBy("epoch")),
    "q_candlecandler_1w" -> ((s, dir) => {
      val daily = dailyCandles(s, dir)
      AggRegistry.run(Seq("candlecandler('1W', Open, High, Low, Close, Sum::value_SUM)"), daily)
        .select(col("Epoch").as("epoch"), col("Open").as("open"),
          col("High").as("high"), col("Low").as("low"), col("Close").as("close"),
          round(col("value_SUM_SUM"), 6).as("value_sum"))
        .orderBy("epoch")
    }),
    "q_candler_monthly" -> ((s, dir) => {
      val daily = dailyCandles(s, dir)
      AggRegistry.run(Seq("candlecandler('1M', Open, High, Low, Close)"), daily)
        .select(col("Epoch").as("epoch"), col("Open").as("open"),
          col("High").as("high"), col("Low").as("low"), col("Close").as("close"))
        .orderBy("epoch")
    }),
    "q_candles_market_hours" -> ((s, dir) => {
      // TimeQual inside the scan (planner/planner.go:199-201): daily
      // candles honoring market hours 09:30-16:00 UTC, weekends +
      // 2024-01-15 closed — the reference's nasdaq 1D filter shape
      val cal = graft.operators.MarketCalendar("UTC", "09:30:00", "16:00:00",
        nonTradingDays = Seq("2024-01-15"))
      val p = purchases(s, dir)
        .filter(graft.operators.TimeQual.isMarketOpen(col("Epoch"), cal))
      AggRegistry.run(Seq("tickcandler('1D', value, Sum::value)"), p)
        .select(col("Epoch").as("epoch"), col("Open").as("open"),
          col("High").as("high"), col("Low").as("low"), col("Close").as("close"),
          round(col("value_SUM"), 6).as("value_sum"))
        .orderBy("epoch")
    }),
    "q_multi_symbol_candles" -> ((s, dir) =>
      Candler.candle(ev(s, dir), CandleDuration.parse("1D"),
        openOf = col("value"), closeOf = col("value"),
        highOf = col("value"), lowOf = col("value"),
        sums = Nil, avgs = Nil, groupCols = Seq("event_type"))
        .select(col("event_type"), col("Epoch").as("epoch"), col("Open").as("open"),
          col("High").as("high"), col("Low").as("low"), col("Close").as("close"))
        .orderBy("event_type", "epoch")),

    // ---- §2.4 trade→bar with condition flags ---------------------------
    "q_trades_to_bars" -> ((s, dir) => {
      // events as a tape: deterministic condition codes by event_id
      // (73='I' odd lot, 87='W' avg price, 52='4' derivatively priced,
      // 57='9' corrected close, 64='@' regular sale)
      val trades = ev(s, dir).select(
        col("event_type").as("symbol"), col("Epoch"), col("Nanoseconds"),
        col("value").as("Price"),
        (col("event_id") % 100 + 1).cast("double").as("Size"),
        array(
          when(col("event_id") % 11 === 0, lit(73))
            .when(col("event_id") % 11 === 1, lit(87))
            .when(col("event_id") % 11 === 2, lit(52))
            .when(col("event_id") % 11 === 3, lit(57))
            .otherwise(lit(64))).as("Conditions"))
      TradeBars.fromTrades(trades, CandleDuration.parse("1Min"))
        .select(col("symbol"), col("Epoch").as("epoch"),
          col("Open").as("open"), col("High").as("high"), col("Low").as("low"),
          col("Close").as("close"), round(col("Volume"), 6).as("volume"))
        .orderBy("symbol", "epoch")
    }),

    // ---- bonus analytics: downstream market workloads ------------------
    // daily VWAP per symbol through the UDA registry surface — one
    // partial-aggregated groupBy on (symbol, day), the candler shuffle
    "q_vwap" -> ((s, dir) => {
      val trades = ev(s, dir).select(
        col("event_type").as("symbol"), col("Epoch"), col("Nanoseconds"),
        col("value").as("Price"),
        (col("event_id") % 100 + 1).cast("double").as("Size"))
      AggRegistry.runGrouped(Seq("vwap('1D', Price, Size)"), trades, Seq("symbol"))
        .select(col("symbol"), col("Epoch").as("epoch"),
          round(col("VWAP"), 6).as("vwap"), round(col("Volume"), 6).as("volume"),
          col("N").as("n_trades"))
        .orderBy("symbol", "epoch")
    }),
    // trailing 5-bar volatility of daily log returns: window ops run
    // on the BAR table (symbols × days), not the tape — the window
    // partition is per symbol, narrow by construction
    "q_rolling_vol" -> ((s, dir) => {
      val daily = Candler.candle(ev(s, dir), CandleDuration.parse("1D"),
        openOf = col("value"), closeOf = col("value"),
        highOf = col("value"), lowOf = col("value"),
        sums = Nil, avgs = Nil, groupCols = Seq("event_type"))
      val rets = graft.operators.Analytics.logReturns(daily, "Close", Seq("event_type"))
      graft.operators.Analytics.rollingVol(rets, 5, Seq("event_type"))
        .select(col("event_type"), col("Epoch").as("epoch"),
          round(col("LogReturn"), 6).as("log_return"),
          round(col("Volatility"), 6).as("volatility"))
        .orderBy("event_type", "epoch")
    }),
    // per-symbol maximum drawdown of the daily close, with the trough
    // epoch (earliest on ties — deterministic, oracle-replayable)
    "q_drawdown" -> ((s, dir) => {
      val daily = Candler.candle(ev(s, dir), CandleDuration.parse("1D"),
        openOf = col("value"), closeOf = col("value"),
        highOf = col("value"), lowOf = col("value"),
        sums = Nil, avgs = Nil, groupCols = Seq("event_type"))
      graft.operators.Analytics.maxDrawdown(daily, "Close", Seq("event_type"))
        .select(col("event_type"),
          round(col("MaxDrawdown"), 6).as("max_drawdown"),
          col("TroughEpoch").as("trough_epoch"))
        .orderBy("event_type")
    }),
    // gap-based sessionization of the event stream per user: a new
    // session after >30 min of silence — all-integer output, so the
    // oracle compare is hash-exact with no float rounding at all
    "q_sessionize" -> ((s, dir) =>
      graft.operators.Analytics.sessionize(ev(s, dir), gapSeconds = 1800,
          keyCols = Seq("user_id"), orderTail = Seq("event_id"))
        .select(col("user_id"), col("SessionId").as("session_id"),
          col("SessionStart").as("session_start"),
          col("SessionEnd").as("session_end"), col("NEvents").as("n_events"))
        .orderBy("user_id", "session_id")),
    // exponential moving average of the daily close via the native
    // EmaWindow AggregateWindowFunction — exact recursion inside the
    // window operator; n = 7 makes α = 0.25 an exact binary fraction
    // so the recursive-CTE oracle replays bit-equal doubles
    "q_ema" -> ((s, dir) => {
      val daily = Candler.candle(ev(s, dir), CandleDuration.parse("1D"),
        openOf = col("value"), closeOf = col("value"),
        highOf = col("value"), lowOf = col("value"),
        sums = Nil, avgs = Nil, groupCols = Seq("event_type"))
      graft.operators.Analytics.ema(daily, "Close", 7, Seq("event_type"))
        .select(col("event_type"), col("Epoch").as("epoch"),
          round(col("Close"), 6).as("close"), round(col("EMA"), 6).as("ema"))
        .orderBy("event_type", "epoch")
    }),
    // Bollinger bands on the daily close (n=5, k=2): trailing frame
    // aggregates, bands null until the window is full
    "q_bollinger" -> ((s, dir) => {
      val daily = Candler.candle(ev(s, dir), CandleDuration.parse("1D"),
        openOf = col("value"), closeOf = col("value"),
        highOf = col("value"), lowOf = col("value"),
        sums = Nil, avgs = Nil, groupCols = Seq("event_type"))
      graft.operators.Analytics.bollinger(daily, "Close", 5, 2.0, Seq("event_type"))
        .select(col("event_type"), col("Epoch").as("epoch"),
          round(col("BollMid"), 6).as("boll_mid"),
          round(col("BollUp"), 6).as("boll_up"),
          round(col("BollDown"), 6).as("boll_down"))
        .orderBy("event_type", "epoch")
    }),
    // Cutler RSI on the daily close (n=5): SMA of gains/losses over
    // per-bar deltas; 100 where the loss average is zero
    "q_rsi" -> ((s, dir) => {
      val daily = Candler.candle(ev(s, dir), CandleDuration.parse("1D"),
        openOf = col("value"), closeOf = col("value"),
        highOf = col("value"), lowOf = col("value"),
        sums = Nil, avgs = Nil, groupCols = Seq("event_type"))
      graft.operators.Analytics.rsi(daily, "Close", 5, Seq("event_type"))
        .select(col("event_type"), col("Epoch").as("epoch"),
          round(col("RSI"), 6).as("rsi"))
        .orderBy("event_type", "epoch")
    }),
    // Wilder RSI (α = 1/4 exact): the EmaWindow recursion over
    // gains/losses, replayed by a two-state recursive CTE; row 1 has
    // no delta and is filtered on both sides
    "q_rsi_wilder" -> ((s, dir) => {
      val daily = Candler.candle(ev(s, dir), CandleDuration.parse("1D"),
        openOf = col("value"), closeOf = col("value"),
        highOf = col("value"), lowOf = col("value"),
        sums = Nil, avgs = Nil, groupCols = Seq("event_type"))
      graft.operators.Analytics.rsiWilder(daily, "Close", 4, Seq("event_type"))
        .filter(col("RSIW").isNotNull)
        .select(col("event_type"), col("Epoch").as("epoch"),
          round(col("RSIW"), 6).as("rsi_w"))
        .orderBy("event_type", "epoch")
    }),
    // MACD(12,26,9): three chained EmaWindow recursions over one
    // per-key sort; αs are 2/(span+1) doubles — the oracle recursion
    // derives them with the same division, so the replay is bit-equal
    "q_macd" -> ((s, dir) => {
      val daily = Candler.candle(ev(s, dir), CandleDuration.parse("1D"),
        openOf = col("value"), closeOf = col("value"),
        highOf = col("value"), lowOf = col("value"),
        sums = Nil, avgs = Nil, groupCols = Seq("event_type"))
      graft.operators.Analytics.macd(daily, "Close", groupCols = Seq("event_type"))
        .select(col("event_type"), col("Epoch").as("epoch"),
          round(col("MACD"), 6).as("macd"),
          round(col("MACDSignal"), 6).as("macd_signal"),
          round(col("MACDHist"), 6).as("macd_hist"))
        .orderBy("event_type", "epoch")
    }),
    // ATR(4): Wilder-smoothed true range over real daily H/L/C bars —
    // α = 0.25 exact, the recursive-CTE oracle replays the smoothing
    // over a lag-dependent input column
    "q_atr" -> ((s, dir) => {
      val daily = Candler.candle(ev(s, dir), CandleDuration.parse("1D"),
        openOf = col("value"), closeOf = col("value"),
        highOf = col("value"), lowOf = col("value"),
        sums = Nil, avgs = Nil, groupCols = Seq("event_type"))
      graft.operators.Analytics.atr(daily, 4, Seq("event_type"))
        .select(col("event_type"), col("Epoch").as("epoch"),
          round(col("ATR"), 6).as("atr"))
        .orderBy("event_type", "epoch")
    }),
    // Donchian(5) channel on the daily bars: trailing extrema frames
    "q_donchian" -> ((s, dir) => {
      val daily = Candler.candle(ev(s, dir), CandleDuration.parse("1D"),
        openOf = col("value"), closeOf = col("value"),
        highOf = col("value"), lowOf = col("value"),
        sums = Nil, avgs = Nil, groupCols = Seq("event_type"))
      graft.operators.Analytics.donchian(daily, 5, Seq("event_type"))
        .select(col("event_type"), col("Epoch").as("epoch"),
          round(col("DonchianUp"), 6).as("don_up"),
          round(col("DonchianDown"), 6).as("don_down"),
          round(col("DonchianMid"), 6).as("don_mid"))
        .orderBy("event_type", "epoch")
    }),
    // pairwise Pearson correlation of daily log returns between every
    // symbol pair sharing a day — epoch-keyed self-join, partial-
    // aggregated corr; Θ(K²) pairs is the matrix itself, not a plan
    // artifact
    "q_pair_corr" -> ((s, dir) => {
      val daily = Candler.candle(ev(s, dir), CandleDuration.parse("1D"),
        openOf = col("value"), closeOf = col("value"),
        highOf = col("value"), lowOf = col("value"),
        sums = Nil, avgs = Nil, groupCols = Seq("event_type"))
      val rets = graft.operators.Analytics.logReturns(daily, "Close", Seq("event_type"))
        .select(col("event_type"), col("Epoch"), col("LogReturn"))
      graft.operators.Analytics.pairCorrelation(rets, "event_type", "LogReturn")
        .select(col("k1"), col("k2"),
          round(col("Correlation"), 6).as("correlation"), col("NObs").as("n_obs"))
        .orderBy("k1", "k2")
    }),

    // ---- §2.3 epoch-keyed union (keep-last) ---------------------------
    "q_union_keeplast" -> ((s, dir) => {
      val e = ev(s, dir).select(col("Epoch"), col("Nanoseconds"), col("event_id"), col("value"))
      val left = e.filter(col("Epoch") < T2)
      val right = e.filter(col("Epoch") >= T1).withColumn("value", col("value") * 2)
      TimeSeries.unionKeepLast(left, right, Seq("Epoch", "Nanoseconds", "event_id"))
        .select(col("Epoch").as("epoch"), col("event_id"), col("value"))
        .orderBy("event_id")
    }),

    // ---- §2.3 as-of join (broadcast, shuffle-free) --------------------
    "q_asof_join" -> ((s, dir) => {
      // the right side (signups) is a dim — broadcast as-of: the
      // purchase stream never shuffles and there is no global window
      val p = purchases(s, dir).select(col("ts_us"), col("event_id"), col("value"))
      val sg = ev(s, dir).filter(col("event_type") === "signup")
        .select(col("ts_us"), col("value").as("signup_value"))
      TimeSeries.asofJoinBroadcast(p, sg, "ts_us", "ts_us", Seq("signup_value"))
        .select(col("event_id"), col("value"), col("signup_value"))
        .orderBy("event_id")
    }),

    // ---- §2.4 adjust (corporate-action as-of application) -------------
    "q_adjust" -> ((s, dir) => {
      val daily = dailyCandles(s, dir)
        .select(col("Epoch"), col("Close"), col("value_SUM").as("Volume"))
      AdjustUda(daily, rateChanges(s, dir),
        priceCols = Seq("Close"), volumeCols = Seq("Volume"))
        .select(col("Epoch").as("epoch"), col("Close").as("close"),
          round(col("Volume"), 6).as("volume"))
        .orderBy("epoch")
    }),

    // ---- §2.3 joins (Spark superset of the reference) ------------------
    "q_join_enrich" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    }),
    "q_join_semi_anti" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"))
      val semi = o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .agg(count(lit(1)).as("with_items"))
      val anti = o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("without_items"))
      semi.crossJoin(anti)
    }),

    // ---- §2.6 top-k ----------------------------------------------------
    "q_topk_orders" -> ((s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // ---- §2.8 SQL layer (backtick TBKs + date literals) ----------------
    "q_sql_select_range" -> ((s, dir) => {
      val svc = new graft.sql.SqlService(s)
      svc.mount("EVENTS/1Sec/RAW", ev(s, dir))
      svc.sql(
        """SELECT Epoch AS epoch, event_id, value FROM `EVENTS/1Sec/RAW`
           WHERE Epoch BETWEEN '2024-01-10' AND '2024-01-19-23:59:59'
             AND event_type = 'purchase'
           ORDER BY event_id;""")
    }),
    "q_sql_agg_count" -> ((s, dir) => {
      val svc = new graft.sql.SqlService(s)
      svc.mount("EVENTS/1Sec/RAW", ev(s, dir))
      svc.sql(
        """SELECT event_type, count(*) AS cnt FROM `EVENTS/1Sec/RAW`
           WHERE Epoch >= '2024-01-15'
           GROUP BY event_type ORDER BY event_type""")
    }),
    "q_sql_tickcandler" -> ((s, dir) => {
      // UDA call as the SQL select list (selectrelation.go:466-584)
      val svc = new graft.sql.SqlService(s)
      svc.mount("EVENTS/1Sec/RAW", ev(s, dir))
      svc.sql(
        """SELECT tickcandler('1D', value, Sum::value) FROM `EVENTS/1Sec/RAW`
           WHERE event_type = 'purchase' AND Epoch < '2024-01-15'""")
        .select(col("Epoch").as("epoch"), col("Open").as("open"),
          col("High").as("high"), col("Low").as("low"), col("Close").as("close"),
          round(col("value_SUM"), 6).as("value_sum"))
        .orderBy("epoch")
    }),
    "q_sql_insert_select" -> ((s, dir) => {
      // INSERT INTO a variable bucket from a SELECT, then read it back
      // through SQL — the reference's insert-into round trip
      // (sqlparser/insertintostatement.go:31-126)
      val root = java.nio.file.Files.createTempDirectory("graft-sqlq").toString
      val cat = new graft.catalog.BucketCatalog(s, root)
      val svc = new graft.sql.SqlService(s, Some(cat))
      svc.mount("EVENTS/1Sec/RAW", ev(s, dir))
      cat.create(graft.core.TimeBucketKey.parse("PURCH/1Sec/VALS"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("Epoch", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("Nanoseconds", org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType))),
        isVariable = true)
      svc.sql(
        """INSERT INTO `PURCH/1Sec/VALS`
           SELECT Epoch, Nanoseconds, value FROM `EVENTS/1Sec/RAW`
           WHERE event_type = 'purchase' AND Epoch < '2024-01-20'""").collect()
      svc.sql(
        """SELECT Epoch AS epoch, Nanoseconds AS nanoseconds, value
           FROM `PURCH/1Sec/VALS` ORDER BY epoch, nanoseconds""")
    }),
    // TBK names as PLAIN Spark SQL table identifiers via the injected
    // resolution rule (TbkSql) — no per-query view registration, full
    // Spark SQL surface (grouping here; joins/subqueries in SqlSpec),
    // storage pruning intact (SqlSpec asserts PushedFilters on the
    // SQL-resolved plan)
    "q_sql_tbk_catalog" -> ((s, dir) => {
      val catRoot = tbkSqlState.computeIfAbsent(dir, _ =>
        java.nio.file.Files.createTempDirectory("graft-tbksql").toString)
      val cat = new graft.catalog.BucketCatalog(s, catRoot)
      // re-enable per invocation: rebinds the dynamic "graft" name to
      // THIS catalog even if another caller (a test suite in the same
      // JVM) bound it in between; the catalog root itself is cached so
      // repeated runs don't leak temp corpora
      val s2 = graft.sql.TbkSql.enable(s, cat)
      cat.write(graft.core.TimeBucketKey.parse("PURCH/1Sec/CAT"),
        purchases(s, dir).select(col("Epoch"), col("Nanoseconds"),
          col("value"), col("event_id")))
      s2.sql(
        s"""SELECT Epoch AS epoch, count(*) AS n_trades,
              round(sum(value), 6) AS value_sum
            FROM graft.`PURCH/1Sec/CAT`
            WHERE Epoch >= $T1 AND Epoch < $T2
            GROUP BY Epoch ORDER BY epoch""")
    }),
    // date-literal predicates over a CATALOG bucket (not a mounted
    // view): the round-8 sargable rewrite — ns-precise compare PLUS a
    // redundant pushable integer-Epoch conjunct, so the pruned scan
    // path itself sits under the hash oracle (PlanSpec separately
    // proves the PushedFilters)
    "q_sql_date_catalog" -> ((s, dir) => {
      val cat = new graft.catalog.BucketCatalog(s,
        java.nio.file.Files.createTempDirectory("graft-dtc").toString)
      cat.write(graft.core.TimeBucketKey.parse("PURCH/1Sec/DTC"),
        purchases(s, dir).select(col("Epoch"), col("Nanoseconds"),
          col("value"), col("event_id")))
      val svc = new graft.sql.SqlService(s, Some(cat))
      svc.sql(
        """SELECT Epoch AS epoch, Nanoseconds AS nanoseconds, value, event_id
           FROM `PURCH/1Sec/DTC`
           WHERE Epoch BETWEEN '2024-01-10' AND '2024-01-19-23:59:59'
           ORDER BY epoch, nanoseconds, event_id""")
    })
  ) ++ roundTripQueries ++ opsQueries

  /** Write-path round trips (write → mutate → read-back), oracle-gated
    * against the equivalent pure-SELECT over the source table — the
    * reference treats these as first-class integ tests
    * (tests/integ/tests/test_coerce_column.py, test_query_limits.py,
    * executor/delete.go semantics).
    */
  private def roundTripQueries: Map[String, (SparkSession, String) => DataFrame] = {
    import graft.catalog.BucketCatalog
    import graft.core.TimeBucketKey
    import org.apache.spark.sql.types._

    def tmpCatalog(s: SparkSession, tag: String): BucketCatalog =
      new BucketCatalog(s, java.nio.file.Files.createTempDirectory(s"graft-$tag").toString)

    def purchCols(s: SparkSession, dir: String): DataFrame =
      purchases(s, dir).select(col("Epoch"), col("Nanoseconds"), col("value"), col("event_id"))

    def readBack(cat: BucketCatalog, tbk: TimeBucketKey): DataFrame =
      cat.read(tbk).select(
        col("Epoch").as("epoch"), col("Nanoseconds").cast("long").as("nanoseconds"),
        col("value"), col("event_id"))
        .orderBy("epoch", "nanoseconds")

    Map[String, (SparkSession, String) => DataFrame](
      // write → ns-range delete → read back (executor/delete.go:15-130)
      "q_roundtrip_delete" -> ((s, dir) => {
        val cat = tmpCatalog(s, "del")
        val tbk = TimeBucketKey.parse("PURCH/1Sec/RT")
        cat.write(tbk, purchCols(s, dir))
        cat.deleteRange(tbk, T1, 0, T2 - 1)
        readBack(cat, tbk)
      }),
      // write → trim-from-date → read back (cmd/connect/session/trim.go)
      "q_roundtrip_trim" -> ((s, dir) => {
        val cat = tmpCatalog(s, "trim")
        val tbk = TimeBucketKey.parse("PURCH/1Sec/RT")
        cat.write(tbk, purchCols(s, dir))
        cat.trim(tbk, T2)
        readBack(cat, tbk)
      }),
      // declared-schema write coercion: double→f4, long→i4, a declared
      // column missing from the batch null-filled
      // (utils/io/coercecolumn.go:19-130, test_coerce_column.py)
      "q_roundtrip_coerce" -> ((s, dir) => {
        val cat = tmpCatalog(s, "co")
        val tbk = TimeBucketKey.parse("PURCH/1Sec/CO")
        cat.create(tbk, StructType(Seq(
          StructField("Epoch", LongType), StructField("Nanoseconds", IntegerType),
          StructField("value", FloatType), StructField("event_id", IntegerType),
          StructField("extra", DoubleType))), isVariable = true)
        cat.write(tbk, purchCols(s, dir))
        cat.read(tbk).select(
          col("Epoch").as("epoch"), col("Nanoseconds").cast("long").as("nanoseconds"),
          col("value").cast("double").as("value"),
          col("event_id").cast("long").as("event_id"), col("extra"))
          .orderBy("epoch", "nanoseconds")
      }),
      // CSV dump → \load → read back (cmd/connect/loader/utils.go)
      "q_roundtrip_csv" -> ((s, dir) => {
        val csvDir = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/data"
        purchCols(s, dir).coalesce(1)
          .write.option("header", "true").mode("overwrite").csv(csvDir)
        val cat = tmpCatalog(s, "csv")
        val tbk = TimeBucketKey.parse("PURCH/1Sec/CSV")
        graft.sources.CsvLoader.load(s, cat, tbk, csvDir)
        readBack(cat, tbk)
      }),
      // the LLM-ops JOB surface under the hash oracle: dedup_exact over
      // the documents table as a server job through a real socket —
      // request in, inline columns+rows out, expanded through group
      // membership exactly as a pymarketstore-style ops client would
      // consume it (round 8; WireSpec separately pins path confinement)
      "q_wire_ops_job" -> ((s, dir) => {
        val cat = tmpCatalog(s, "wireops")
        val srv = new graft.wire.RpcServer(s, cat, port = 0, opsRoot = Some(dir))
        srv.start()
        try {
          val req = Map("jsonrpc" -> "2.0", "method" -> "OpsService.Run",
            "params" -> Seq(Map("op" -> "dedup_exact",
              "input" -> s"$dir/documents.parquet", "limit" -> 1000000L)),
            "id" -> 1L)
          val conn = new java.net.URL(s"http://127.0.0.1:${srv.boundPort}/rpc")
            .openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("POST")
          conn.setRequestProperty("Content-Type", "application/x-msgpack")
          conn.setDoOutput(true)
          conn.getOutputStream.write(graft.wire.MsgPack.encode(req))
          val resp = graft.wire.MsgPack.decode(conn.getInputStream.readAllBytes())
            .asInstanceOf[Map[Any, Any]]
          val result = resp("result").asInstanceOf[Map[Any, Any]]
          import s.implicits._
          result("rows").asInstanceOf[Seq[Seq[Any]]]
            .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))
            .toDF("doc_id", "canonical_id")
            .orderBy("doc_id")
        } finally srv.stop()
      }),
      // the FAISS-style serving contract end-to-end over the wire
      // (round 9): the on-write trigger maintains the persisted
      // (cell, id, embedding) index + quantizer, and a CLIENT asks the
      // server for ANN top-k from that index alone — the base corpus
      // is never read at query time. Full probe ⇒ exact, so the whole
      // socket path sits under the exhaustive cosine oracle
      "q_wire_knn_ivf" -> ((s, dir) => {
        val cat = tmpCatalog(s, "wireivf")
        val opsRoot = java.nio.file.Files.createTempDirectory("graft-wireivf-ops").toString
        val emb = Tables.embeddings(s, dir)
        val base = emb.filter(col("vec_id") % 3 =!= 0)
        val cents = graft.ops.Similarity.sampledCentroids(base, 16)
        val trig = new graft.streaming.IvfIndexTrigger(s, cents, s"$opsRoot/idx")
        trig.fire("V/1Sec/EMB", base)
        trig.fire("V/1Sec/EMB", emb.filter(col("vec_id") % 3 === 0))
        trig.writeCentroids(s"$opsRoot/cents")
        emb.filter(col("vec_id") < 5)
          .write.mode("overwrite").parquet(s"$opsRoot/queries")
        val srv = new graft.wire.RpcServer(s, cat, port = 0, opsRoot = Some(opsRoot))
        srv.start()
        try {
          val req = Map("jsonrpc" -> "2.0", "method" -> "OpsService.Run",
            "params" -> Seq(Map("op" -> "knn_ivf", "input" -> "queries",
              "options" -> Map("index" -> "idx", "centroids" -> "cents",
                "k" -> 10L, "n_probe" -> 16L),
              "limit" -> 1000000L)),
            "id" -> 1L)
          val conn = new java.net.URL(s"http://127.0.0.1:${srv.boundPort}/rpc")
            .openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("POST")
          conn.setRequestProperty("Content-Type", "application/x-msgpack")
          conn.setDoOutput(true)
          conn.getOutputStream.write(graft.wire.MsgPack.encode(req))
          val resp = graft.wire.MsgPack.decode(conn.getInputStream.readAllBytes())
            .asInstanceOf[Map[Any, Any]]
          val result = resp("result").asInstanceOf[Map[Any, Any]]
          import s.implicits._
          result("rows").asInstanceOf[Seq[Seq[Any]]]
            .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long],
              r(2).asInstanceOf[Double]))
            .toDF("query_id", "vec_id", "score")
            .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
            .orderBy("query_id", "vec_id")
        } finally srv.stop()
      }),
      // full wire round trip: write → HTTP JSON-RPC/msgpack Query over
      // a loopback socket → NumpyMultiDataset decode → DataFrame. Puts
      // the wire codecs (msgpack, LE column blobs) under the same
      // hash-level oracle as every operator (frontend/query.go:91-116)
      "q_wire_query" -> ((s, dir) => {
        val cat = tmpCatalog(s, "wire")
        val tbk = TimeBucketKey.parse("PURCH/1Sec/WR")
        cat.write(tbk, purchCols(s, dir))
        val srv = new graft.wire.RpcServer(s, cat, port = 0)
        srv.start()
        try {
          val req = Map("jsonrpc" -> "2.0", "method" -> "DataService.Query",
            "params" -> Seq(Map("requests" -> Seq(Map(
              "destination" -> "PURCH/1Sec/WR",
              "epoch_start" -> T1, "epoch_end" -> (T2 - 1))))), "id" -> 1L)
          val conn = new java.net.URL(s"http://127.0.0.1:${srv.boundPort}/rpc")
            .openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("POST")
          conn.setRequestProperty("Content-Type", "application/x-msgpack")
          conn.setDoOutput(true)
          conn.getOutputStream.write(graft.wire.MsgPack.encode(req))
          val resp = graft.wire.MsgPack.decode(conn.getInputStream.readAllBytes())
            .asInstanceOf[Map[Any, Any]]
          val result = resp("result").asInstanceOf[Map[Any, Any]]("responses")
            .asInstanceOf[Seq[Any]].head.asInstanceOf[Map[Any, Any]]("result")
            .asInstanceOf[Map[Any, Any]]
          val (schema, groups) = graft.wire.NumpyCodec.decode(result)
          import scala.jdk.CollectionConverters._
          s.createDataFrame(groups.flatMap(_._2).asJava, schema)
            .select(col("Epoch").as("epoch"),
              col("Nanoseconds").cast("long").as("nanoseconds"),
              col("value"), col("event_id"))
            .orderBy("epoch", "nanoseconds")
        } finally srv.stop()
      }),
      // multi-symbol wildcard LAST-n through the query API — one
      // isin-pruned scan, per-symbol window limit
      // (frontend/query.go:21-47, test_query_limits.py shapes)
      "q_queryservice_lastn" -> ((s, dir) => {
        val cat = tmpCatalog(s, "qs")
        cat.writeMulti("EV", "1Sec", ev(s, dir).select(
          col("event_type").as("symbol"), col("Epoch"), col("Nanoseconds"),
          col("value"), col("event_id")))
        val qs = new graft.api.QueryService(cat)
        qs.queryMulti(graft.api.QueryRequest("*/1Sec/EV",
            columns = Seq("value", "event_id"),
            limit = Some(10), limitFromStart = false))
          .select(col("symbol"), col("Epoch").as("epoch"),
            col("Nanoseconds").cast("long").as("nanoseconds"),
            col("value"), col("event_id"))
          .orderBy("symbol", "epoch", "nanoseconds")
      }),
      // the on-disk downsample CASCADE under the correctness oracle:
      // deterministic multi-symbol 1Min bars ingested through the
      // trigger path in three OUT-OF-ORDER batches (minutes 4.. of
      // each 5-minute window arrive last, landing in windows whose
      // 5Min/1H candles were already written — the recompute-and-
      // overwrite semantics of contrib/ondiskagg/aggtrigger/
      // aggtrigger.go:110-293), then both destination tables read
      // back and compared to DuckDB's aggregation over ALL bars. A
      // cascade that dropped late rows, kept first-writes, or missed
      // a touched window hash-mismatches.
      "q_cascade_ohlcv" -> ((s, dir) => {
        val cat = tmpCatalog(s, "casc")
        val bars = graft.functions.Candler.candle(
            ev(s, dir).select(col("event_type").as("symbol"), col("Epoch"),
              col("Nanoseconds"), col("value")),
            graft.core.CandleDuration.parse("1Min"),
            openOf = col("value"), closeOf = col("value"),
            highOf = col("value"), lowOf = col("value"),
            sums = Seq("value"), avgs = Nil, groupCols = Seq("symbol"))
          .withColumnRenamed("value_SUM", "Volume")
          .persist() // three batch filters below; Bench clears per query
        val casc = new graft.streaming.DownsampleCascade(
          cat, "CSC", "1Min", destinations = Seq("5Min", "1H"), sums = Seq("Volume"))
        val m = pmod((col("Epoch") / 60).cast("long"), lit(5))
        casc.ingest(bars.filter(m < 2))
        casc.ingest(bars.filter(m >= 2 && m < 4))
        casc.ingest(bars.filter(m >= 4)) // late: re-derives closed windows
        val out = Seq("5Min", "1H").map { tf =>
          cat.readMulti("CSC", tf).drop("timeframe", "year").withColumn("tf", lit(tf))
        }.reduce(_ unionByName _)
        out.select(col("tf"), col("symbol"), col("Epoch").as("epoch"),
            col("Open").as("open"), col("High").as("high"), col("Low").as("low"),
            col("Close").as("close"), round(col("Volume"), 6).as("volume"))
          .orderBy("tf", "symbol", "epoch")
      }),
      // the reference's stated design target is ~16,384 symbols in one
      // catalog (docs/design/file_format_design.txt): prove the
      // wildcard query still answers in ONE job at that key
      // cardinality. symbol = event_id mod 16000 — 10k distinct
      // symbols at sf0.01 (one row each), the full 16k at sf0.1 —
      // written through the same manifest-committed multi-symbol
      // upsert, then LAST-2 per symbol through the query API
      "q_queryservice_wide" -> ((s, dir) => {
        val cat = tmpCatalog(s, "wide")
        cat.writeMulti("WEV", "1Sec", ev(s, dir).select(
          concat(lit("W"), pmod(col("event_id"), lit(16000)).cast("string")).as("symbol"),
          col("Epoch"), col("Nanoseconds"), col("value"), col("event_id")))
        val qs = new graft.api.QueryService(cat)
        qs.queryMulti(graft.api.QueryRequest("*/1Sec/WEV",
            columns = Seq("value", "event_id"),
            limit = Some(2), limitFromStart = false))
          .select(col("symbol"), col("Epoch").as("epoch"),
            col("Nanoseconds").cast("long").as("nanoseconds"),
            col("value"), col("event_id"))
          .orderBy("symbol", "epoch", "nanoseconds")
      }))
  }

  /** LLM-data-pipeline operators (BASELINE.json north star): text
    * analysis, dedup family, similarity search, multimodal plumbing.
    */
  private def opsQueries: Map[String, (SparkSession, String) => DataFrame] = Map[String, (SparkSession, String) => DataFrame](
    // ---- text analysis -------------------------------------------------
    "q_text_stats" -> ((s, dir) => {
      val d = TextAnalysis.withQuality(
        TextAnalysis.withTokenCounts(Tables.documents(s, dir)))
      d.select(col("doc_id"), col("n_tokens"),
        col("n_regex_tokens").cast("long").as("n_regex_tokens"),
        col("distinct_ratio"), col("stopword_ratio"),
        col("mean_token_len"), col("quality"))
        .orderBy("doc_id")
    }),
    // filter-threshold sweep: per source, docs/tokens surviving the
    // composite quality gate at each candidate threshold — the tuning
    // table a pipeline owner reads before fixing the cut; one scan,
    // a 9× narrow fanout, one (source, threshold)-keyed partial agg
    "q_report_thresholds" -> ((s, dir) => {
      val d = TextAnalysis.withQuality(Tables.documents(s, dir))
        .select(col("source"), col("n_tokens"), col("quality").as("q"))
      d.select(col("source"), col("n_tokens"), col("q"),
          explode(array((1 to 9).map(i => lit(i / 10.0)): _*)).as("threshold"))
        .groupBy("source", "threshold")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("q") >= col("threshold"), 1L).otherwise(0L)).as("n_keep"),
          sum(when(col("q") >= col("threshold"), col("n_tokens"))
            .otherwise(0L)).as("tokens_keep"),
          round(sum(when(col("q") >= col("threshold"), 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 6).as("keep_frac"))
        .orderBy("source", "threshold")
    }),
    "q_text_langid" -> ((s, dir) =>
      TextAnalysis.withLangId(Tables.documents(s, dir))
        .groupBy("lang_pred").agg(count(lit(1)).as("cnt"))
        .orderBy("lang_pred")),
    // rolling-hash fingerprint selection (winnowing): guarantees
    // shared runs >= w+k-1 words surface a shared fingerprint while
    // indexing only ~2/(w+1) of each doc's grams
    "q_text_winnow" -> ((s, dir) =>
      TextAnalysis.winnowingFingerprints(Tables.documents(s, dir))
        .orderBy("doc_id", "fingerprint")),
    // Gopher-style repetition filters: duplicate n-gram fractions and
    // top-word share, with the composite keep flag
    "q_text_gopher" -> ((s, dir) =>
      TextAnalysis.withRepetitionSignals(Tables.documents(s, dir))
        .select(col("doc_id"), col("dup_bigram_frac"), col("dup_trigram_frac"),
          col("top_word_ratio"), col("gopher_keep"))
        .orderBy("doc_id")),
    // redaction over planted deterministic PII (the synthetic corpus
    // has none): every 10th doc gains an email + URL tail
    "q_text_redact" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or visit https://ex.org/p"), col("doc_id").cast("string")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.withRedaction(d)
        .select(col("doc_id"), col("n_redactions"), col("text_redacted"))
        .orderBy("doc_id")
    }),
    // CCNet-style unigram-LM quality score, self-trained with a
    // 512-word vocabulary so the OOV floor path is exercised
    "q_text_lm_quality" -> ((s, dir) =>
      TextAnalysis.withUnigramLogProb(Tables.documents(s, dir), vocabSize = 512)
        .orderBy("doc_id")),
    // TF-IDF top-5 terms per doc (smoothed idf, deterministic ranks)
    "q_text_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), k = 5)
        .orderBy("doc_id", "term_rank")),
    // CCNet composite: per-language LM-perplexity head/middle/tail
    // buckets (exact ntile mode for oracle parity; the approx-
    // threshold production path is OpsSpec-pinned against it)
    "q_pipeline_ccnet" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val scored = TextAnalysis.withUnigramLogProb(d, vocabSize = 512)
      val lang = TextAnalysis.withLangId(d).select(col("doc_id"), col("lang_pred"))
      TextAnalysis.lmQualityBuckets(scored.join(lang, "doc_id"), nBuckets = 3)
        .groupBy("lang_pred", "bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
          round(avg("avg_logprob"), 6).as("mean_logprob"))
        .orderBy("lang_pred", "bucket")
    }),
    // interpolated Kneser–Ney bigram LM, self-trained — the KenLM-
    // shaped step past the unigram entry; every scored bigram is in
    // the model, so the floors stay untriggered and the oracle is
    // exact (n_unseen = 0 by construction)
    "q_text_lm_kn" -> ((s, dir) =>
      TextAnalysis.withKneserNeyBigram(Tables.documents(s, dir))
        .orderBy("doc_id")),
    // interpolated Kneser–Ney TRIGRAM LM with the full recursive
    // backoff chain (middle order on continuation counts) — the
    // KenLM-shaped depth the bigram can't exercise; self-trained, so
    // every scored trigram is in the model and the oracle is exact
    "q_text_lm_kn3" -> ((s, dir) =>
      TextAnalysis.withKneserNeyTrigram(Tables.documents(s, dir))
        .orderBy("doc_id")),
    // BPE subword tokenizer trained IN-ENGINE (Sennrich '16, the
    // tokenizer-fitting step of an LLM data pipeline): the ranked
    // merge table from BpeMergeCount frequency-argmax iterations over
    // the distinct-word relation; the oracle replays every iteration
    // as a chained pair-count → argmax → fold-merge CTE block (the
    // q_quality_classifier unrolled-training pattern)
    "q_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      val (merges, seg) = graft.ops.Bpe.learn(Tables.documents(s, dir), BpeMergeCount)
      seg.unpersist()
      s.createDataset(merges).toDF().orderBy("rank")
    }),
    // the same training run at PRODUCTION merge count through the
    // driver-local exact trainer (Bpe.learnLocal): BPE state is the
    // O(distinct words) frequency table, so after the one corpus
    // aggregation all merges learn locally — no per-merge cluster
    // round-trip, which is what makes a ~32k-merge vocab feasible.
    // The oracle replays every merge independently in DuckDB; on a
    // corpus that exhausts earlier both engines stop at the same rank
    "q_bpe_merges_local" -> ((s, dir) => {
      import s.implicits._
      val (merges, _) =
        graft.ops.Bpe.learnLocal(Tables.documents(s, dir), BpeLocalMergeCount)
      s.createDataset(merges).toDF().orderBy("rank")
    }),
    // BYTE-level training (byte-fallback alphabet): every token
    // trains from its UTF-8 bytes as hex symbols — punctuation and
    // Unicode are first-class, nothing is OOV below the byte level,
    // and fertility is the real bytes-per-word number. Oracle replays
    // the same hex start state per merge
    "q_bpe_merges_bytes" -> ((s, dir) => {
      import s.implicits._
      val (merges, _) = graft.ops.Bpe.learnLocal(
        Tables.documents(s, dir), BpeByteMergeCount, byteLevel = true)
      s.createDataset(merges).toDF().orderBy("rank")
    }),
    // the learned tokenizer applied back over the corpus: per doc the
    // subword count and piece string — sequential rank-order
    // application reproduces training segmentations exactly, so the
    // oracle's final seg relation IS the expected encoding
    "q_tokenize_bpe" -> ((s, dir) => {
      // learnLocal: bit-identical merges/segs to learn (BpePropSpec),
      // without the per-merge driver round-trips
      val (merges, seg) =
        graft.ops.Bpe.learnLocal(Tables.documents(s, dir), BpeMergeCount)
      graft.ops.Bpe.encode(Tables.documents(s, dir), seg, Some(merges)).orderBy("doc_id")
    }),
    // byte-level encode → decode round-trip: the tokenizer-losslessness
    // contract a production pipeline relies on. The engine trains a
    // byte-fallback tokenizer, encodes, and DECODES each document; the
    // oracle computes the expected fixed point independently (the
    // whitespace-normalized text and the seg-relation token count), so
    // any encode/decode defect diverges from it
    "q_bpe_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val (merges, seg) =
        graft.ops.Bpe.learnLocal(docs, BpeByteMergeCount, byteLevel = true)
      graft.ops.Bpe.encode(docs, seg, Some(merges), byteLevel = true)
        .select(col("doc_id"), col("n_tokens_bpe"),
          graft.ops.Bpe.decode(col("bpe_text"), byteLevel = true).as("decoded"))
        .orderBy("doc_id")
    }),
    // tokenizer fertility report: per source, subwords per whitespace
    // word under the learned BPE — the tokenizer-efficiency number a
    // data team reads per domain before committing a vocab size
    "q_bpe_fertility" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val (_, seg) = graft.ops.Bpe.learnLocal(d, BpeMergeCount)
      // encoding the training corpus: the OOV miss set is empty by
      // construction, so the default (None) skips encode's miss scan;
      // output and oracle semantics are identical either way
      val enc = graft.ops.Bpe.encode(d, seg)
        .select(col("doc_id"), col("n_tokens_bpe"))
      d.filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_words"))
        .join(enc, "doc_id")
        .groupBy("source")
        .agg(sum("n_words").as("n_words"), sum("n_tokens_bpe").as("n_tokens_bpe"),
          round(sum("n_tokens_bpe").cast("double") / sum("n_words"), 6).as("fertility"))
        .orderBy("source")
    }),
    // tokenizer-aware packing: the same concat-and-chunk manifest, but
    // budgeted by REAL subword counts from the learned BPE tokenizer
    // instead of the whitespace proxy — the composition a production
    // pretrain pipeline runs (tokenize, then pack to context length)
    "q_pack_bpe" -> ((s, dir) => {
      val (_, seg) = graft.ops.Bpe.learnLocal(Tables.documents(s, dir), BpeMergeCount)
      // self-encoding: default None skips the provably-empty miss scan
      val counts = graft.ops.Bpe.encode(Tables.documents(s, dir), seg)
        .select(col("doc_id"), col("n_tokens_bpe"))
      graft.ops.Packing.manifest(counts, budget = 256,
          tokenCol = Some("n_tokens_bpe"))
        .orderBy("doc_id")
    }),
    // exact-k deterministic uniform sample (reservoir-equivalent):
    // the k smallest md5(seed:id) priorities — fixed OUTPUT size,
    // unlike the Bernoulli rate rules
    "q_sample_exact_k" -> ((s, dir) =>
      Sampling.exactK(Tables.documents(s, dir), k = 100)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")),
    // deterministic multi-epoch training-order shuffle: per epoch an
    // independent md5 permutation into loader shards with in-shard
    // positions — the data-order artifact a Megatron-style loader
    // consumes, reproducible bit-for-bit
    "q_epoch_order" -> ((s, dir) =>
      Sampling.epochOrder(Tables.documents(s, dir), epochs = 2, nShards = 8)
        .orderBy("epoch", "shard", "pos")),
    // exact per-source token-count quantiles (corpus length profile)
    "q_stats_quantiles" -> ((s, dir) =>
      TextAnalysis.withTokenCounts(Tables.documents(s, dir))
        .groupBy("source")
        .agg(round(expr("percentile(n_tokens, 0.5)"), 6).as("p50"),
          round(expr("percentile(n_tokens, 0.9)"), 6).as("p90"),
          max(col("n_tokens")).cast("long").as("max_tokens"))
        .orderBy("source")),
    "q_text_fingerprint" -> ((s, dir) =>
      TextAnalysis.withFingerprint(Tables.documents(s, dir))
        .select(col("doc_id"), col("fingerprint"))
        .orderBy("doc_id")),
    // substring-level dedup: maximal per-doc spans covered by 10-token
    // windows that occur more than once in the corpus (Lee et al. 2022
    // re-expressed as a hashed-window shuffle + gaps-and-islands merge)
    "q_dedup_spans" -> ((s, dir) =>
      Dedup.duplicatedSpans(Tables.documents(s, dir), k = 10)
        .orderBy("doc_id", "span_start")),
    // the EXACT-substring sibling (Lee et al. '22 ExactSubstr): the
    // window key is the content itself, so no hash collision can mark
    // a unique window duplicated — the suffix-array method's answer,
    // computed with a content-keyed shuffle instead of a single-node
    // index
    "q_dedup_spans_exact" -> ((s, dir) =>
      Dedup.duplicatedSpans(Tables.documents(s, dir), k = 10, hash = "exact")
        .orderBy("doc_id", "span_start")),
    // snapshot diff by content hash (dataset versioning report): b is
    // a deterministically-mutated copy of the corpus — %7 ids dropped,
    // %5 ids renumbered (+1e6), %11 contents edited into fresh docs
    // (+2e6) — so every status class is exercised
    "q_corpus_diff" -> ((s, dir) => {
      val d = Tables.documents(s, dir).filter(col("text").isNotNull)
      val b = d.filter(col("doc_id") % 7 =!= 0)
        .select(when(col("doc_id") % 5 === 0, col("doc_id") + 1000000)
          .otherwise(col("doc_id")).as("doc_id"), col("text"))
        .unionByName(d.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"),
            concat(col("text"), lit(" fresh")).as("text")))
      Dedup.corpusDiff(d, b).orderBy("doc_id", "status")
    }),
    // exact cross-corpus delta dedup (the daily-ingest gate): a batch
    // of planted corpus clones (+1e6 ids) plus genuinely-fresh docs
    // (+2e6 ids, ' fresh'-suffixed) against the indexed corpus — the
    // clone slice drops, the fresh slice survives at its min ids
    "q_dedup_exact_delta" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val batch = d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
        .unionByName(d.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"),
            concat(col("text"), lit(" fresh")).as("text")))
      Dedup.exactDeltaSurvivors(batch, d).orderBy("doc_id")
    }),
    // CCNet-style paragraph dedup: 20-token chunks hashed corpus-wide,
    // every repeated chunk keeps only its first (doc_id, pos)
    // occurrence, docs reassembled from their surviving chunks
    "q_dedup_paragraphs" -> ((s, dir) =>
      Dedup.dedupParagraphs(Tables.documents(s, dir), paraTokens = 20)
        .orderBy("doc_id")),
    // benchmark decontamination: train docs sharing any trigram with
    // the held-out eval slice (doc_id % 23 == 0 plays the benchmark
    // suite); the eval gram set broadcasts, the corpus never shuffles
    "q_text_decontaminate" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Dedup.contaminationReport(
        d.filter(col("doc_id") % 23 =!= 0),
        d.filter(col("doc_id") % 23 === 0), n = 3)
        .orderBy("doc_id")
    }),
    // pair-level attribution: WHICH eval doc leaked into which train
    // doc (≥ 2 shared trigrams), the actionable decontamination output
    "q_text_decontaminate_pairs" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Dedup.contaminationPairs(
        d.filter(col("doc_id") % 23 =!= 0),
        d.filter(col("doc_id") % 23 === 0), n = 3, minOverlap = 2)
        .orderBy("doc_id", "eval_id")
    }),

    // ---- dedup family --------------------------------------------------
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(Tables.documents(s, dir))
        .select(col("content_hash"), col("canonical_id"), col("n_docs"))
        .orderBy("content_hash")),
    "q_dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables.documents(s, dir), threshold = 0.4, n = 3)
        .orderBy("id1", "id2")),
    // clone-heavy corpus: every doc gains a whitespace-perturbed exact
    // twin, so the collapse gate's within-group (jaccard 1.0) and
    // cross-group pair expansion are both under the hash-level oracle
    "q_dedup_clone_collapse" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionByName(d.select(
        (col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" ")).as("text")))
      Dedup.jaccardPairs(corpus, threshold = 0.4, n = 3).orderBy("id1", "id2")
    }),
    // propose-cheap/verify-exact near-dup: minhash banding proposes,
    // true shingle sets verify at τ=0.9 — deterministic on fixed data
    // (seed-free xxhash64; per-pair propose probability ≈ 1 − 4e-8 at
    // j = 0.9, and every j ≥ 0.9 pair in the corpus is proposed), so
    // the whole pipeline sits under the exhaustive-Jaccard oracle.
    // The signature-estimate variant stays OpsSpec-pinned.
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashPairsVerified(Tables.documents(s, dir), threshold = 0.9)
        .orderBy("id1", "id2")),
    // incremental ingest dedup: the batch (doc_id % 5 == 0) against the
    // already-indexed corpus — batch-internal + batch-vs-corpus pairs
    // only, the corpus never re-shingled (only candidate-touched docs);
    // same banding recall argument as q_dedup_minhash, so the full
    // exhaustive oracle restricted to batch-touching pairs applies
    "q_dedup_minhash_delta" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val batch = d.filter(col("doc_id") % 5 === 0)
      val corpus = d.filter(col("doc_id") % 5 =!= 0)
      Dedup.minhashDeltaPairsVerified(batch, corpus, threshold = 0.9,
          oldIndex = Some(Dedup.minhashBandIndex(corpus)))
        .orderBy("id1", "id2")
    }),
    // simhash stays Hamming-defined and un-oracled: measured on this
    // corpus, jaccard-0.89..0.96 pairs can sit at Hamming 8-11, so no
    // banding depth gives a principled jaccard-recall guarantee (the
    // tail is a property of simhash, not of the test data); the
    // propose/verify variant is OpsSpec-pinned as precision-1 instead
    "q_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), maxDist = 3)
        .orderBy("id1", "id2")),
    // ...but the FULL simhash pipeline (signature → pigeonhole banding
    // → bucket join → exact verify) does sit under a complete oracle
    // at τ = 1.0 via planted exact twins: normalize-identical twins
    // share the token stream, hence the signature (Hamming 0 —
    // proposed with certainty by lossless banding), the exact-set
    // verify admits exactly jaccard = 1.0, and the fixtures contain no
    // equal-shingle-set pairs besides the twins (checked), so recall's
    // Hamming tail never enters
    "q_dedup_simhash_exact" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionByName(d.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" ")).as("text")))
      Dedup.simhashPairsVerified(corpus, threshold = 1.0)
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id1", "id2")
    }),
    "q_dedup_embedding" -> ((s, dir) =>
      Similarity.cosineDedupPairs(Tables.embeddings(s, dir), threshold = 0.45)
        .select(col("id1"), col("id2"), round(col("score"), 6).as("score"))
        .orderBy("id1", "id2")),
    // sub-quadratic near-dup path: plant an exact twin per vector
    // (found with probability 1 — identical sign bits in every band)
    // and verify candidates with exact cosine; at τ=0.9 on this
    // corpus the output deterministically equals the exact operator's,
    // so the approximate path gets a hash-level oracle too
    "q_dedup_embedding_lsh" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val corpus = e.unionByName(
        e.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Similarity.cosineDedupPairsLsh(corpus, threshold = 0.9)
        .select(col("id1"), col("id2"), round(col("score"), 6).as("score"))
        .orderBy("id1", "id2")
    }),

    // SemDeDup (cluster-then-pair) under a FULL brute-force oracle via
    // the sign-planted construction: vectors become |x| (even ids) or
    // -|x| (odd ids), so cross-cluster cosine ≤ 0 < τ and the injected
    // ±1⃗ quantizer assigns each sign its own cell with certainty —
    // within-cell pairs at τ therefore EQUAL global all-pairs at τ.
    // The trained-quantizer path is OpsSpec's clustered-corpus check.
    "q_dedup_semantic" -> ((s, dir) => {
      val emb = signPlanted(Tables.embeddings(s, dir))
      val quantizer = SignQuantizer
      Similarity.semanticDedupPairs(emb, threshold = 0.45, nCells = 2,
          centroids = Some(quantizer))
        .select(col("id1"), col("id2"), round(col("score"), 6).as("score"))
        .orderBy("id1", "id2")
    }),

    // the BOUNDED-output SemDeDup shape (r9): per-cell top-100 pairs
    // by (score desc, id asc) under the same sign-planted injected
    // quantizer — deterministic cells make the cap replayable in SQL
    // (cell == id parity); output ≤ nCells×cap whatever the clone
    // structure, vs 62k uncapped rows at sf0.01
    "q_dedup_semantic_capped" -> ((s, dir) => {
      val emb = signPlanted(Tables.embeddings(s, dir))
      val quantizer = SignQuantizer
      Similarity.semanticDedupPairsCapped(emb, threshold = 0.45, nCells = 2,
          maxPairsPerCell = 100, centroids = Some(quantizer))
        .select(col("id1"), col("id2"), round(col("score"), 6).as("score"))
        .orderBy("id1", "id2")
    }),

    // ---- similarity search ---------------------------------------------
    "q_knn_brute" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // SQ8 scalar-quantized ANN: corpus compressed to 1 byte/dim
    // (FAISS QT_8bit scheme), asymmetric cosine against exact queries
    // — the oracle replays the floor(q + 0.5) quantization and the
    // dequantized cosine in SQL, so this is score-exact, not a
    // recall-style sibling
    "q_knn_sq8" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val compressed = Similarity.sq8Encode(emb)
      Similarity.sq8TopK(compressed, emb.filter(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // chunk→document mean-pooling: groups of 10 consecutive vec_ids
    // play a long document's chunk embeddings; element-wise mean in
    // one (group, dim)-keyed partial-aggregated shuffle
    "q_vec_pool" -> ((s, dir) =>
      Similarity.meanPoolEmbeddings(
        Tables.embeddings(s, dir).withColumn("group_id", expr("vec_id DIV 10")),
        "group_id")
        .orderBy("group_id", "j")),
    // Johnson–Lindenstrauss random projection 64 → 16 dims (Achlioptas
    // sign matrix, exact ±0.25 floats): the store-less-scan-less
    // first-pass retrieval representation; long form for the oracle
    "q_vec_project" -> ((s, dir) => {
      val planes = Similarity.jlPlanes(16, 64)
      Similarity.projectEmbeddings(Tables.embeddings(s, dir), planes)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "p")))
        .select(col("vec_id"), col("j").cast("long").as("j"),
          round(col("p"), 6).as("proj"))
        .orderBy("vec_id", "j")
    }),
    // margin-based bitext mining (Artetxe & Schwenk '19): the ratio-
    // margin "intersection" strategy across the even/odd vec_id halves
    // — mutual best-margin pairs above threshold, k-NN averages folded
    // in rank order so the oracle's doubles agree bit-for-bit
    "q_mine_bitext" -> ((s, dir) => {
      // the EXACT miner is O(|X|·|Y|·d) by nature (the LSH variant is
      // the scale path), so the entry bounds its probe at 5000 ids —
      // vacuous at the oracle's sf0.01 (500 vectors) and at sf0.1,
      // a cap only on the big scale dirs where exact mining is the
      // wrong tool anyway
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") < 5000)
      Similarity.marginMinePairs(
          emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1),
          k = 4, threshold = 1.0)
        .select(col("id1"), col("id2"),
          round(col("score"), 6).as("score"), round(col("margin"), 6).as("margin"))
        .orderBy("id1")
    }),
    // MMR diversity re-rank (Carbonell-Goldstein '98) over the
    // brute-force top-10 candidates; input scores pre-rounded on BOTH
    // sides so the greedy comparisons see bitwise-identical relevance
    "q_knn_mmr" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cands = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      Similarity.mmrRerank(cands, k = 3, lambda = 0.5)
        .orderBy("query_id", "mmr_rank")
    }),
    // hard-negative mining: top-10 by cosine EXCLUDING the query's
    // near-dup cluster. Planted exact twins (vec_id + 100000) are the
    // only pairs at cosine ≥ 0.9 (base-corpus max non-self cosine is
    // ~0.51), so the real machinery — LSH pair join → connected
    // components → cluster anti-filter → top-k — runs against an
    // analytically-known exclusion set {query, query + 100000}
    "q_knn_hard_negatives" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val corpus = e.unionByName(
        e.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Similarity.hardNegatives(corpus, e.filter(col("vec_id") < 5),
          k = 10, tau = 0.9)
        .select(col("query_id"), col("neg_rank"), col("vec_id"),
          round(col("score"), 6).as("score"))
        .orderBy("query_id", "neg_rank")
    }),
    // contrastive-triplet assembly over the same planted-twin corpus:
    // positive = the query's twin (its only cluster-mate), negatives =
    // the cluster-excluded top-10; pair discovery + CC shared
    "q_pipeline_contrastive" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val corpus = e.unionByName(
        e.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Similarity.contrastiveTriplets(corpus, e.filter(col("vec_id") < 5),
          k = 10, tau = 0.9)
        .select(col("query_id"), col("positive_id"), col("neg_rank"),
          col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "neg_rank")
    }),
    // recall-targeted banding (r9): the parameters are DERIVED from
    // the retrieval contract (don't miss cosine-0.4 neighbors with
    // probability ≥0.9 — lshParamsForRecall's collision model) rather
    // than hand-picked; the bench recall field measures the floor held
    "q_knn_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopKAtRecall(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // oracled LSH path: plant an exact twin per vector — identical
    // sign bits put the twin in every band bucket, so top-1 is the
    // twin with probability 1 (no other pair reaches cosine 1.0: no
    // duplicate vectors in the base corpus) and the LSH machinery
    // (banding → bucket join → dedup → exact re-rank) gets a
    // hash-level oracle against exhaustive top-1
    "q_knn_lsh_twins" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val corpus = e.unionByName(
        e.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Similarity.lshTopK(corpus, e.filter(col("vec_id") < 5), k = 1)
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    "q_knn_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 5)
      // probe depth DERIVED from a 0.85 candidate-recall contract on a
      // bounded calibration sample (r10) — the last approximate tier
      // whose bench parameter was hand-picked rather than derived
      val cents = Similarity.sampledCentroids(emb, 16)
      val nProbe = Similarity.ivfProbeForRecall(
        emb, q, 10, cents, recallFloor = 0.85, nCal = 64)
      Similarity.ivfTopK(emb, q, k = 10, nCells = 16, nProbe = nProbe,
          centroids = Some(cents))
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // full-probe IVF (nProbe = nCells) scores every corpus vector for
    // every query exactly once, so it equals exhaustive top-k by
    // construction — the cell assignment, probe ordering and re-rank
    // machinery all sit under the brute-force oracle; q_knn_ivf above
    // keeps the pruned recall-calibrated configuration for the bench
    "q_knn_ivf_full" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 10, nCells = 16, nProbe = 16)
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // trained coarse quantizer (2 Lloyd iterations as Spark
    // aggregations) at full probe: partitioning the corpus by ANY
    // centroid set and probing every cell scores each vector exactly
    // once, so the whole training + assignment + probe machinery sits
    // under the exhaustive oracle — recall effects of PRUNED probes
    // with trained centroids are OpsSpec's clustered-corpus check
    "q_knn_ivf_trained" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 10,
          nCells = 16, nProbe = 16, trainIters = 2)
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // incremental IVF maintenance: the base corpus is indexed once
    // under a frozen sampled quantizer, a NEW ingest batch assigns
    // against the SAME centroids (O(batch) — the historical corpus is
    // never re-scanned), and the unioned index serves the query. At
    // full probe the answer equals exhaustive search, so the whole
    // delta path (index build, frozen-quantizer batch assignment,
    // union, indexed serving) sits under the brute-force oracle;
    // OpsSpec additionally pins union == full-rebuild row equality
    "q_knn_ivf_delta" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val base = emb.filter(col("vec_id") % 5 =!= 0)
      val batch = emb.filter(col("vec_id") % 5 === 0)
      val cents = Similarity.sampledCentroids(base, 16)
      val index = Similarity.ivfIndex(base, cents)
        .unionByName(Similarity.ivfIndex(batch, cents))
      Similarity.ivfTopKIndexed(index, emb.filter(col("vec_id") < 5), k = 10,
          cents, nProbe = 16)
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // the round-8 serving composition under the same exhaustive oracle:
    // the PERSISTED index is maintained by the on-write trigger (two
    // fire()s — historical corpus, then a delta batch assigned under
    // the frozen quantizer) and queries serve from the index parquet
    // alone; full probe == exhaustive search whatever the quantizer
    "q_knn_ivf_trigger" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val base = emb.filter(col("vec_id") % 3 =!= 0)
      val cents = Similarity.sampledCentroids(base, 16)
      val idxPath = freshEntryDir("q_knn_ivf_trigger", "graft-ivftrig") + "/idx"
      val trig = new graft.streaming.IvfIndexTrigger(s, cents, idxPath)
      trig.fire("V/1Sec/EMB", base)
      trig.fire("V/1Sec/EMB", emb.filter(col("vec_id") % 3 === 0))
      trig.topK(emb.filter(col("vec_id") < 5), k = 10, nProbe = 16)
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // compaction in the serving path (r9): fire → COMPACT (generation
    // rewrite) → delta fire appending into the new generation → serve;
    // full probe == exhaustive whatever the layout, so the compacted
    // index sits under the same hash oracle as the flat one
    "q_knn_ivf_compact" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val base = emb.filter(col("vec_id") % 3 =!= 0)
      val cents = Similarity.sampledCentroids(base, 16)
      val idxPath = freshEntryDir("q_knn_ivf_compact", "graft-ivfcpt") + "/idx"
      val trig = new graft.streaming.IvfIndexTrigger(s, cents, idxPath)
      trig.fire("V/1Sec/EMB", base)
      trig.compact()
      trig.fire("V/1Sec/EMB", emb.filter(col("vec_id") % 3 === 0))
      trig.topK(emb.filter(col("vec_id") < 5), k = 10, nProbe = 16)
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // blue/green quantizer refresh in the serving path (r10): build
    // under a sampled quantizer, REFRESH (retrain + rebuild into the
    // next generation, quantizer persisted inside it), append a
    // post-refresh delta, then serve through a RECONSTRUCTED trigger
    // (the restart path, which must adopt the generation quantizer,
    // not its stale constructor centroids) at full probe — exact
    // under ANY quantizer, so the entire flip sits under the same
    // exhaustive oracle as the other ivf serving entries
    "q_knn_ivf_refresh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val base = emb.filter(col("vec_id") % 3 =!= 0)
      val cents = Similarity.sampledCentroids(base, 16)
      val idxPath = freshEntryDir("q_knn_ivf_refresh", "graft-ivfbg") + "/idx"
      val trig = new graft.streaming.IvfIndexTrigger(s, cents, idxPath)
      trig.fire("V/1Sec/EMB", base)
      trig.refreshQuantizer(trainIters = 1)
      trig.fire("V/1Sec/EMB", emb.filter(col("vec_id") % 3 === 0))
      val served = new graft.streaming.IvfIndexTrigger(s, cents, idxPath)
      served.topK(emb.filter(col("vec_id") < 5), k = 10, nProbe = 16)
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // probe depth from a recall CONTRACT (r10): at floor 1.0 the
    // calibration (whose nCal=64 sample contains all five bench
    // queries) derives a depth whose probed cells provably hold every
    // true top-10 neighbor of these queries, and both paths rank by
    // the same (score desc, id asc) — so the derived-depth serve
    // equals exhaustive search and the DERIVATION ITSELF sits under
    // the hash oracle, not just a recall floor
    "q_knn_ivf_atrecall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 5)
      val cents = Similarity.sampledCentroids(emb, 16)
      val nProbe = Similarity.ivfProbeForRecall(emb, q, 10, cents, recallFloor = 1.0)
      Similarity.ivfTopK(emb, q, k = 10, nCells = 16, nProbe = nProbe,
          centroids = Some(cents))
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // PRUNED probe (nProbe=1 of 2 cells) under a full brute-force
    // oracle, via a planted-cluster construction where pruning is
    // PROVABLY exhaustive: vectors become elementwise |x| (even ids)
    // or -|x| (odd ids) — exact float ops both engines reproduce — so
    // within-cluster cosine > 0 >= cross-cluster cosine, and against
    // the injected ±1⃗ quantizer every vector lands in its sign's cell
    // with certainty. A query's single probed cell therefore contains
    // its entire cluster and with >= k in-cluster candidates no
    // opposite-sign vector (score <= 0) can enter the top-k: pruned
    // IVF == global exhaustive top-k, no sampling or Lloyd
    // nondeterminism anywhere in the path
    "q_knn_ivf_pruned" -> ((s, dir) => {
      val emb = signPlanted(Tables.embeddings(s, dir))
      val quantizer = SignQuantizer
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 10,
          nCells = 2, nProbe = 1, centroids = Some(quantizer))
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // IVF × SQ8 under the exhaustive oracle: the sign-planted corpus
    // makes cell assignment analytic (cross-cell cosine ≪ 0), and the
    // SQ8 replay is deterministic — so single-probe serving over the
    // compressed cells equals the global dequantized-cosine ranking
    "q_knn_ivfsq8" -> ((s, dir) => {
      val emb = signPlanted(Tables.embeddings(s, dir))
      val quantizer = SignQuantizer
      Similarity.ivfSq8TopK(emb, emb.filter(col("vec_id") < 5), k = 10,
          nCells = 2, nProbe = 1, centroids = Some(quantizer))
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // product-quantization ANN, trained codebooks (2 Lloyd iterations
    // of per-subspace L2 k-means) — the production compressed-corpus
    // shape (m-byte codes + ADC scoring). Approximate by design (no
    // oracle); the exactness of the ADC machinery itself is pinned by
    // q_knn_pq_exact below, recall/reconstruction by OpsSpec. 32×16
    // codebooks = 2 bits/dim (r9): the coding rate an isotropic 64-d
    // corpus needs for ≥0.5 recall@10 — 0.5 bits/dim (the old 8×16)
    // measured recall 0.18 in the round-8 bench; finer SUBSPACES beat
    // bigger codebooks at equal rate here (16×32 measured 0.44)
    "q_knn_pq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5), k = 10,
          m = 32, ksub = 16, trainIters = 2)
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // compressed scan + exact re-rank (r9): SQ8 generates 50
    // candidates/query, raw vectors rejoin for exact cosine top-10 —
    // under the EXHAUSTIVE oracle via a planted construction where the
    // candidate tier provably contains the true top-k: each query
    // vector gets 10 exact copies (cosine 1.0 ≫ the ~0.55 isotropic
    // ceiling, far above SQ8's quantization error), so the true top-10
    // is the copy set, certain to survive the 50-candidate cut, and
    // the re-rank's exact scores + id tie-break reproduce the
    // exhaustive ranking row for row
    "q_knn_sq8_rerank" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val qs = e.filter(col("vec_id") < 5)
      val copies = qs.select(col("vec_id"), col("embedding"),
          explode(sequence(lit(0), lit(9))).as("j"))
        .select((lit(100000) + col("vec_id") * 10 + col("j")).as("vec_id"),
          col("embedding"))
      val corpus = e.unionByName(copies)
      Similarity.sq8RerankTopK(corpus, qs, k = 10, kCand = 50)
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // PQ under a FULL exhaustive oracle, via a planted-codeword
    // construction: the codebook is the subvector grid of the 16
    // lowest-id vectors (exact floats both engines read), and corpus
    // vector v is the codeword concatenation selected by the nibbles
    // of a Knuth multiplicative hash of v — injective, so every
    // corpus vector is a distinct combination and scores are distinct
    // (rank-boundary gaps ≥ 3e-4 at sf0.01). Encoding is then
    // LOSSLESS (each subvector sits in the codebook at L2 distance 0,
    // unique argmin), so ADC == dot(query, vector) exactly and
    // encode → LUT → ADC → rank all sit under DuckDB's exhaustive
    // dot-product top-k.
    "q_knn_pq_exact" -> ((s, dir) => {
      // Similarity.plantedPqCorpus holds the construction (and its
      // donor-nibble arithmetic, mirrored verbatim in the oracle SQL)
      val (planted, cb) = Similarity.plantedPqCorpus(Tables.embeddings(s, dir))
      Similarity.pqTopK(planted, planted.filter(col("vec_id") < 5), k = 10,
          m = 8, ksub = 16, codebooks = Some(cb))
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // PQ candidates + exact re-rank (r11) — the sq8_rerank composition
    // applied to the PQ tier, under the SAME planted-codeword
    // exhaustive oracle: encoding is lossless so ADC == dot exactly,
    // the 50-candidate tier provably contains the true dot top-10,
    // and the exact-dot re-rank reproduces the exhaustive ranking row
    // for row. What this pins is the HANDOFF (candidate cut →
    // raw-vector rejoin → re-rank); the composite's recall under
    // trained (lossy) codebooks is the bench recall.q_knn_pq_rerank
    // number (OpsSpec floors it at 0.9 — vs 0.6 for the bare PQ tier)
    "q_knn_pq_rerank" -> ((s, dir) => {
      val (planted, cb) = Similarity.plantedPqCorpus(Tables.embeddings(s, dir))
      Similarity.pqRerankTopK(planted, planted.filter(col("vec_id") < 5),
          k = 10, kCand = 50, m = 8, ksub = 16, codebooks = Some(cb))
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // IVF-PQ (coarse cells routing + per-cell ADC over m-byte codes)
    // under the same planted-codeword oracle: raw (non-residual)
    // encoding is lossless, and probing EVERY cell scores every
    // candidate exactly once whatever the quantizer — so the full
    // assignment → probe → per-cell join → ADC → rank pipeline equals
    // exhaustive dot top-k. Pruned-probe recall and the residual
    // layout are OpsSpec's checks.
    "q_knn_ivfpq_exact" -> ((s, dir) => {
      val (planted, cb) = Similarity.plantedPqCorpus(Tables.embeddings(s, dir))
      Similarity.ivfPqTopK(planted, planted.filter(col("vec_id") < 5), k = 10,
          nCells = 8, nProbe = 8, m = 8, ksub = 16,
          residual = false, codebooks = Some(cb))
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),

    // ---- composite training-data pipeline ------------------------------
    // the ops composed the way a real corpus build chains them:
    // langid → quality gate → exact dedup (keep canonical) → near-dup
    // removal (drop the higher id of each jaccard pair) → corpus stats.
    // One oracled query proving the stages agree end-to-end, not just
    // individually.
    "q_pipeline_corpus" -> ((s, dir) => {
      // persist the FEATURED corpus, then filter from cache. Filtering
      // first looks cheaper but measures 3× worse: Catalyst pushes the
      // gate predicate below the collapsed feature projection, so the
      // lang_pred/quality expression trees evaluate once in the Filter
      // and again in the Project — 58s → 18s for the gate stage at the
      // 50× point. Materializing features once is also the production
      // shape (a corpus build writes the featured table out, it does
      // not recompute regex features per consumer).
      val d = TextAnalysis.withLangId(
        TextAnalysis.withQuality(TextAnalysis.withTokenCounts(Tables.documents(s, dir))))
        .transform(graft.ops.CacheScope.scopedPersist)
      // NOTE on cache lifetime: `d` and `canon` stay persisted after
      // the returned aggregate materializes — an entry returning a
      // lazy DataFrame cannot unpersist without defeating its own
      // cache. Bench calls cacheManager.clearCache() per query; other
      // repeated callers rely on ContextCleaner GC of the dropped
      // plans, or should clearCache between invocations.
      // the gated corpus feeds exactGroups, the canonical semi-join and
      // the final anti-join — each re-filters the cached features (the
      // filter over materialized columns is sub-0.1s)
      val f = d.filter(col("lang_pred") === "en" && col("quality") >= 0.6)
      val canonIds = Dedup.exactGroups(f).select(col("canonical_id").as("doc_id"))
      val canon = f.join(canonIds, Seq("doc_id"), "left_semi")
        .transform(graft.ops.CacheScope.scopedPersist)
      // canon is exact-deduped already — skip jaccardPairs' internal
      // clone-collapse gate, it would be a pure extra pass here
      val losers = Dedup.jaccardPairs(canon, threshold = 0.4, n = 3,
          collapseExact = false)
        .select(col("id2").as("doc_id")).distinct()
      canon.join(losers, Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("quality")), 6).as("avg_quality"),
          sum(col("n_tokens")).as("total_tokens"))
    }),

    // ---- cluster formation / packing / mixing --------------------------
    // near-dup pairs → connected components: the end stage of dedup,
    // where A≈B, B≈C collapses {A,B,C} though A,C were never compared
    "q_dedup_clusters" -> ((s, dir) =>
      Cluster.fromJaccard(Tables.documents(s, dir), threshold = 0.4, n = 3)
        .orderBy("doc_id")),
    // leakage-safe split: every near-dup cluster lands whole in one
    // of train/val/test (salted hash of the CLUSTER id), so eval
    // contamination via duplicate straddle is impossible by
    // construction
    "q_split_leakage" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Cluster.leakageSafeSplit(d, Dedup.jaccardPairs(d, threshold = 0.4, n = 3))
        .orderBy("doc_id")
    }),
    // the survivor set: one canonical doc per near-dup component
    "q_dedup_corpus" -> ((s, dir) =>
      Cluster.dedupedCorpus(Tables.documents(s, dir), threshold = 0.4, n = 3)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")),
    // quality-priority dedup survivors: keep the LONGEST doc of each
    // near-dup component (the C4 policy), not the min-id canonical
    "q_dedup_corpus_best" -> ((s, dir) =>
      Cluster.dedupedCorpusBy(Tables.documents(s, dir), threshold = 0.4,
          n = 3, priority = "n_chars")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")),
    // token-balanced output shards: longest-first round robin over the
    // distributed global rank (LPT bound: shard totals differ by at
    // most one maximal document)
    "q_pack_shards" -> ((s, dir) =>
      Packing.assignShards(Tables.documents(s, dir), nShards = 8)
        .orderBy("doc_id")),
    // concat-and-chunk sequence packing over the id-ordered corpus
    "q_pack_manifest" -> ((s, dir) =>
      Packing.manifest(Tables.documents(s, dir), budget = 256)
        .orderBy("doc_id")),
    "q_pack_chunks" -> ((s, dir) =>
      Packing.chunks(Tables.documents(s, dir), budget = 256)
        .orderBy("chunk_id", "doc_id")),
    // stratified selection: best-5 docs per source by quality score
    "q_select_quality" -> ((s, dir) =>
      Sampling.topKByDomain(
          TextAnalysis.withQuality(Tables.documents(s, dir)), k = 5, score = "quality")
        .select(col("doc_id"), col("source"), col("quality"))
        .orderBy("doc_id")),
    // data-driven mixing: sample each source to a token budget (rates
    // derived from per-source totals, then the same md5 rule)
    "q_sample_budget" -> ((s, dir) =>
      Sampling.toTokenBudget(
          TextAnalysis.withTokenCounts(Tables.documents(s, dir)),
          budgets = Map("src0" -> 1000000L, "src5" -> 600L, "src6" -> 300L))
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")),
    // deterministic per-source mixing: md5(seed:id) prefix vs rate
    // thresholds — reproducible across engines, no corpus shuffle
    "q_sample_weighted" -> ((s, dir) =>
      Sampling.weighted(Tables.documents(s, dir), SampleRates, defaultRate = 0.3)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")),
    // temperature mixing (mT5/XLM-R q_d ∝ p_d^α): α = 0.5 flattens
    // the domain distribution toward the tail; budget 15000 (about
    // half the sf0.01 corpus) keeps every domain on the sampling
    // branch of the rate rule
    "q_sample_temperature" -> ((s, dir) => {
      val d = TextAnalysis.withTokenCounts(Tables.documents(s, dir))
        .withColumn("n_tokens", col("n_tokens").cast("long"))
      Sampling.temperatureMix(d, alpha = 0.5, totalBudget = 15000L)
        .select(col("doc_id"), col("source"), col("n_tokens"))
        .orderBy("doc_id")
    }),
    // diversity balancing: sign-cell LSH over embeddings, every cell
    // capped at 8 rows by md5 priority — dense modes downsampled,
    // sparse cells survive whole
    "q_sample_cellcap" -> ((s, dir) =>
      Sampling.cellCapped(Tables.embeddings(s, dir), bits = 5, cap = 8)
        .select(col("vec_id"), col("cell"), col("label"))
        .orderBy("vec_id")),
    // DSIR importance resampling (Xie et al. 2023): hashed-ngram
    // distributions fit on target = the English slice vs raw = the
    // whole corpus; Gumbel top-100 = deterministic sampling ∝ weight
    "q_sample_dsir" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Sampling.dsirSample(d, d.filter(col("lang") === "en"), k = 100)
        .select(col("doc_id"), col("n_features"),
          round(col("logw"), 6).as("logw"))
        .orderBy("doc_id")
    }),
    // corpus-level boilerplate: the 20 trigrams present in the most
    // documents (distinct per doc), ties broken lexicographically
    "q_text_heavy_ngrams" -> ((s, dir) =>
      TextAnalysis.heavyNgrams(Tables.documents(s, dir), n = 3, k = 20)),
    // fastText-style quality gate trained IN-ENGINE: logistic
    // regression over hashed-ngram buckets, 3 deterministic full-batch
    // GD iterations (pos = the English slice), scored over the corpus;
    // the oracle replays the identical unrolled iterations in SQL
    "q_quality_classifier" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      // null-safe split: a NULL-lang doc is a NEGATIVE (matches the
      // oracle's CASE WHEN lang = 'en' THEN 1 ELSE 0 labeling)
      Classifier.quality(
          d.filter(col("lang") <=> "en"), d.filter(!(col("lang") <=> "en")), d,
          buckets = 1024, iters = 3, lr = 1.0)
        .select(col("doc_id"), col("n_features"),
          round(col("score"), 6).as("score"))
        .orderBy("doc_id")
    }),

    // the round-5 stages composed the way a pretraining corpus build
    // chains them: repetition gate → near-dup cluster dedup (keep
    // canonical) → weighted source mixing → concat-and-chunk packing,
    // proven end-to-end by one aggregate oracle (the q_pipeline_corpus
    // pattern applied to the assembly half of the pipeline)
    "q_pipeline_pretrain" -> ((s, dir) => {
      // persist the PRUNED gated corpus: clustering, membership,
      // sampling and packing each re-scan it (~7 consumers), and
      // without the cache every scan re-runs the repetition-signal
      // tree including its (doc, word) aggregation join — measured
      // 50s → 7s at sf0.1 (the q_pipeline_corpus lesson; same cache-
      // lifetime contract: Bench clears per query)
      val gated = TextAnalysis.withRepetitionSignals(Tables.documents(s, dir))
        .filter(col("gopher_keep"))
        .select(col("doc_id"), col("source"), col("text"))
        .transform(graft.ops.CacheScope.scopedPersist)
      val kept = Cluster.dedupedCorpus(gated, threshold = 0.4, n = 3)
      val mixed = Sampling.weighted(kept, SampleRates, defaultRate = 0.3)
      Packing.manifest(mixed, budget = 256)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          (max(col("chunk_last")) + 1).as("n_chunks"))
    }),

    // JSONL round-trip: the training-data interchange format as a
    // first-class sink + source — write the corpus as JSON lines,
    // read it back under an explicit schema, and hand the driver the
    // FULL row set (hash-level identity against the parquet
    // original: quotes, escapes, nulls, and numeric widths all have
    // to survive)
    "q_io_jsonl_roundtrip" -> ((s, dir) => {
      // per-invocation unique dir with previous-copy reclaim — see
      // freshEntryDir
      val out = freshEntryDir("q_io_jsonl_roundtrip", "graft_jsonl_rt")
      Tables.documents(s, dir).write.mode("overwrite").json(out)
      s.read.schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
        .json(out)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),
    // per-source corpus report card: volume, clone rate, token mass,
    // and language composition in one grouped pass
    "q_report_sources" -> ((s, dir) =>
      TextAnalysis.sourceReport(Tables.documents(s, dir))),
    // rollup report: corpus counts/size at (source, lang), per source,
    // and grand-total in ONE pass — Spark's ROLLUP expands grouping
    // sets inside a single partial-aggregated Expand, no per-level
    // rescan. The reference PARSES grouping sets but never implements
    // them (sqlparser/selectrelation.go SetQuantifier) — this is the
    // engine-superset answer. grouping() disambiguates real nulls
    // from subtotal rows.
    "q_report_rollup" -> ((s, dir) =>
      Tables.documents(s, dir)
        .rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
          grouping(col("source")).cast("long").as("g_source"),
          grouping(col("lang")).cast("long").as("g_lang"))
        .select(col("source"), col("lang"), col("n_docs"), col("n_chars"),
          col("g_source"), col("g_lang"))
        // genuine nulls in source/lang sort NULLS LAST to match the
        // DuckDB default (Spark ascending defaults NULLS FIRST)
        .orderBy(col("g_source"), col("g_lang"),
          col("source").asc_nulls_last, col("lang").asc_nulls_last)),

    // ---- multimodal plumbing -------------------------------------------
    "q_multimodal_features" -> ((s, dir) => {
      val feats = Multimodal.extractFeatures(s, Multimodal.mediaTable(Tables.documents(s, dir)))
      feats.select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
        col("header_sum"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
        .orderBy("doc_id")
    }),
    // decode-DOMAIN similarity through the injectable MediaDecoder
    // seam: payloads decode to pixels via the deterministic synthetic
    // codec, a 16-bin luminance histogram embeds each media row in the
    // same decode+feature partition pass, and exact cosine top-10 runs
    // over the embeddings — the full image-similarity pipeline shape
    // with only the codec binding synthetic, exactly replayed by the
    // oracle from the payload bytes
    "q_multimodal_similarity" -> ((s, dir) => {
      val media = Multimodal.mediaTable(Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(col("text")) > 0))
      val hist = Multimodal.luminanceHistogram(
        s, media, Multimodal.SyntheticCodec(16), bins = 16)
      Similarity.bruteForceTopK(
          hist.select(col("doc_id").as("vec_id"), col("embedding")),
          hist.filter(col("doc_id") < 5)
            .select(col("doc_id").as("vec_id"), col("embedding")),
          k = 10)
        .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "vec_id")
    }),
    // codec-free media dedup: positional chunk hashing over the binary
    // payloads — planted equal-length edited clones (%9 ids re-tagged
    // at +1e6 with the last byte replaced) pair with 7 of 8 chunks;
    // byte-identical payloads pair with 8
    "q_multimodal_dedup" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(col("text")) > 0)
      val edited = d.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(expr("substring(text, 1, length(text) - 1)"), lit("~")).as("text"))
      val media = d.select(col("doc_id"), col("text")).unionByName(edited)
        .select(col("doc_id"), col("text").cast("binary").as("media"))
      Multimodal.chunkDupPairs(media, chunks = 8, minMatch = 6)
        .orderBy("id1", "id2")
    }),
    "q_multimodal_frames" -> ((s, dir) => {
      val feats = Multimodal.extractFeatures(s, Multimodal.mediaTable(Tables.documents(s, dir)))
      Multimodal.sampleFrames(feats, bytesPerFrame = 100)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"), col("frame_sig"))
        .orderBy("doc_id", "frame_idx")
    })
  )

  /** Shared DuckDB fragment for the four connected-component oracles
    * (q_dedup_clusters / q_dedup_corpus / q_dedup_corpus_best /
    * q_split_leakage): trigram-shingle jaccard >= 0.4 pairs with the
    * engine's short-doc whole-text fallback (mirroring
    * [[graft.ops.Dedup.shingles]]), symmetric edges, recursive
    * reachability, and component labels lab(doc_id, cluster_id).
    * ONE source of truth: a clustering-oracle fix lands in all four.
    */
  private val CcLabelCte: String =
    """tok AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
               FROM documents WHERE text IS NOT NULL),
         d AS (SELECT doc_id, CASE WHEN len(ts) >= 3
               THEN list_distinct(list_transform(range(1, len(ts) - 1),
                 i -> array_to_string(ts[i:i+2], ' ')))
               ELSE [array_to_string(ts, ' ')] END AS shs FROM tok),
         sh AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS s FROM d),
         pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2
           HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.4),
         edges AS (SELECT id1 AS u, id2 AS v FROM pairs
                   UNION ALL SELECT id2, id1 FROM pairs),
         reach(a, b) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT r.a, e.v FROM reach r JOIN edges e ON e.u = r.b),
         lab AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)"""

  /** Merge-iteration count shared by the q_bpe_* queries and their
    * generated oracles (each extra merge adds one CTE block below).
    */
  private val BpeMergeCount = 24

  /** Merge count for the learnLocal production-scale entry: past any
    * per-merge-round-trip feasibility (the distributed trainer at 256
    * would be 256 sequential driver syncs), still replayable by the
    * generated DuckDB chain in tens of seconds. Corpora whose
    * trainable vocab fuses completely earlier stop at the same rank
    * in both engines.
    */
  private val BpeLocalMergeCount = 256

  /** Merge count for the byte-level entry: enough to fuse well past
    * the single-byte alphabet into multi-byte pieces, small enough
    * that the DuckDB replay stays seconds.
    */
  private val BpeByteMergeCount = 48

  /** Ranked-merge-table oracle: the n-block training replay plus the
    * rank-stamped union of every argmax row (empty blocks after
    * exhaustion contribute no rows, matching the trainer's early
    * stop).
    */
  private def bpeMergesSql(n: Int, byteLevel: Boolean = false): String =
    bpeChain(n, byteLevel) + ",\n         mg AS (" +
      (1 to n).map(i =>
        s"SELECT $i AS rank, a AS left_sym, b AS right_sym, cnt FROM best$i")
        .mkString("\n           UNION ALL ") +
      ")\n         SELECT rank, left_sym, right_sym, cnt FROM mg ORDER BY rank"

  /** Generated BPE training replay: `n` chained (pairs → best → seg)
    * CTE blocks mirroring [[graft.ops.Bpe.learn]]'s iterations —
    * pair counts weighted by word frequency, argmax with the "a b"
    * string tie-break, and the same append-or-fuse left fold
    * (DuckDB `list_reduce` seeds with the first element, exactly
    * Spark's `aggregate(slice(ts,2,…), ts[0], …)`). seg CTEs are
    * MATERIALIZED so the chain stays linear work in DuckDB.
    */
  private def bpeChain(n: Int, byteLevel: Boolean = false): String = {
    val wFilter =
      if (byteLevel) "tok != ''" else "regexp_full_match(tok, '[a-z0-9]+')"
    val seg0 =
      if (byteLevel) """rtrim(regexp_replace(hex(encode(word)), '(..)', '\1|', 'g'), '|')"""
      else """rtrim(regexp_replace(word, '(.)', '\1|', 'g'), '|')"""
    val head = s"""WITH w AS MATERIALIZED (
           SELECT tok AS word, count(*)::BIGINT AS freq FROM (
             SELECT unnest(string_split(lower(trim(text)), ' ')) AS tok
             FROM documents WHERE text IS NOT NULL)
           WHERE $wFilter GROUP BY tok),
         seg0 AS MATERIALIZED (SELECT word, freq,
           $seg0 AS seg FROM w)"""
    val blocks = (1 to n).map { i =>
      val p = i - 1
      s"""pairs$i AS (SELECT pr, sum(freq)::BIGINT AS cnt FROM (
             SELECT freq, unnest(CASE WHEN len(ts) >= 2
                 THEN list_transform(range(1, len(ts)), j -> array_to_string(ts[j:j+1], ' '))
                 ELSE [] END) AS pr
             FROM (SELECT freq, string_split(seg, '|') AS ts FROM seg$p)) GROUP BY pr),
         best$i AS MATERIALIZED (SELECT string_split(pr, ' ')[1] AS a,
             string_split(pr, ' ')[2] AS b, cnt
           FROM pairs$i ORDER BY cnt DESC, pr LIMIT 1),
         seg$i AS MATERIALIZED (SELECT word, freq,
             CASE WHEN (SELECT count(*) FROM best$i) = 0 THEN seg ELSE
               list_reduce(string_split(seg, '|'),
                 (acc, x) -> CASE WHEN (acc = cj.a OR ends_with(acc, '|' || cj.a)) AND x = cj.b
                                  THEN acc || cj.b ELSE acc || '|' || x END) END AS seg
           FROM seg$p LEFT JOIN best$i cj ON true)"""
    }
    (head +: blocks).mkString(",\n         ")
  }

  def oracleSql: Map[String, String] = Map(
    "q_scan_range_project" ->
      s"""SELECT epoch_us(ts)//1000000 AS epoch,
            (epoch_us(ts)%1000000)*1000 AS nanoseconds,
            event_type, value, event_id
          FROM events
          WHERE epoch_us(ts)//1000000 BETWEEN $T1 AND ${T2 - 1}
          ORDER BY event_id""",

    "q_limit_first" ->
      """SELECT epoch, event_id, value FROM (
           SELECT epoch_us(ts)//1000000 AS epoch, epoch_us(ts) AS tsu, event_id, value
           FROM events ORDER BY tsu, event_id LIMIT 100)
         ORDER BY epoch, event_id""",
    "q_limit_last" ->
      """SELECT epoch, event_id, value FROM (
           SELECT epoch_us(ts)//1000000 AS epoch, epoch_us(ts) AS tsu, event_id, value
           FROM events ORDER BY tsu DESC, event_id DESC LIMIT 100)
         ORDER BY epoch, event_id""",

    "q_agg_count" ->
      "SELECT count(*) AS cnt FROM events WHERE event_type = 'purchase'",
    "q_agg_min_max_avg" ->
      """SELECT min(value) AS vmin, max(value) AS vmax, round(avg(value), 6) AS vavg
         FROM events WHERE event_type = 'purchase'""",

    "q_gap_threshold" ->
      """WITH g AS (
           SELECT event_type, epoch_us(ts)//1000000 AS epoch,
                  lag(epoch_us(ts)//1000000) OVER (
                    PARTITION BY event_type ORDER BY epoch_us(ts), event_id) AS prev
           FROM events)
         SELECT event_type, prev AS epoch, epoch AS gap_end, epoch - prev AS gap_length
         FROM g WHERE prev IS NOT NULL AND epoch - prev > 3600
         ORDER BY event_type, prev""",
    "q_gap_zscore" ->
      """WITH g AS (
           SELECT event_type, epoch_us(ts)//1000000 AS epoch,
                  lag(epoch_us(ts)//1000000) OVER (
                    PARTITION BY event_type ORDER BY epoch_us(ts), event_id) AS prev
           FROM events),
         d AS (SELECT event_type, prev, epoch, epoch - prev AS gap FROM g WHERE prev IS NOT NULL),
         st AS (SELECT event_type, avg(gap) AS m, stddev_pop(gap) AS s FROM d GROUP BY 1)
         SELECT d.event_type, prev AS epoch, epoch AS gap_end, gap AS gap_length
         FROM d JOIN st USING (event_type) WHERE s > 0 AND (gap - m) / s > 3
         ORDER BY d.event_type, prev""",

    "q_tickcandler_1d" ->
      """SELECT (epoch_us(ts)//1000000)//86400*86400 AS epoch,
            arg_min(value, epoch_us(ts)) AS open, max(value) AS high,
            min(value) AS low, arg_max(value, epoch_us(ts)) AS close,
            round(sum(value), 6) AS value_sum
         FROM events WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY 1""",
    "q_candlecandler_1w" ->
      """WITH daily AS (
           SELECT (epoch_us(ts)//1000000)//86400*86400 AS epoch,
              arg_min(value, epoch_us(ts)) AS open, max(value) AS high,
              min(value) AS low, arg_max(value, epoch_us(ts)) AS close,
              sum(value) AS vsum
           FROM events WHERE event_type = 'purchase' GROUP BY 1)
         SELECT epoch - ((epoch + 259200) % 604800) AS epoch,
            arg_min(open, epoch) AS open, max(high) AS high, min(low) AS low,
            arg_max(close, epoch) AS close, round(sum(vsum), 6) AS value_sum
         FROM daily GROUP BY 1 ORDER BY 1""",
    "q_candler_monthly" ->
      """WITH daily AS (
           SELECT (epoch_us(ts)//1000000)//86400*86400 AS epoch,
              arg_min(value, epoch_us(ts)) AS open, max(value) AS high,
              min(value) AS low, arg_max(value, epoch_us(ts)) AS close
           FROM events WHERE event_type = 'purchase' GROUP BY 1)
         SELECT epoch(date_trunc('month', to_timestamp(epoch)))::BIGINT AS epoch,
            arg_min(open, epoch) AS open, max(high) AS high, min(low) AS low,
            arg_max(close, epoch) AS close
         FROM daily GROUP BY 1 ORDER BY 1""",
    // market hours in pure epoch arithmetic (tz-independent):
    // weekday = (day + 4) % 7 with 0=Sunday; 2024-01-15 = day 19737;
    // 09:30 = 34200 s, 16:00 = 57600 s
    "q_candles_market_hours" ->
      """WITH mh AS (
           SELECT epoch_us(ts) AS tsu, epoch_us(ts)//1000000 AS e, value FROM events
           WHERE event_type = 'purchase'
             AND (e//86400 + 4) % 7 NOT IN (0, 6)
             AND e//86400 <> 19737
             AND e % 86400 >= 34200 AND e % 86400 < 57600)
         SELECT e//86400*86400 AS epoch,
            arg_min(value, tsu) AS open, max(value) AS high, min(value) AS low,
            arg_max(value, tsu) AS close, round(sum(value), 6) AS value_sum
         FROM mh GROUP BY 1 ORDER BY 1""",
    "q_multi_symbol_candles" ->
      """SELECT event_type, (epoch_us(ts)//1000000)//86400*86400 AS epoch,
            arg_min(value, epoch_us(ts)) AS open, max(value) AS high,
            min(value) AS low, arg_max(value, epoch_us(ts)) AS close
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_trades_to_bars" ->
      """WITH t AS (
           SELECT event_type AS symbol, epoch_us(ts) AS tsu,
                  epoch_us(ts)//1000000 AS e, value AS price,
                  (event_id % 100 + 1)::DOUBLE AS sz,
                  CASE event_id % 11 WHEN 0 THEN 73 WHEN 1 THEN 87
                       WHEN 2 THEN 52 WHEN 3 THEN 57 ELSE 64 END AS cond
           FROM events),
         f AS (SELECT *, e//60*60 AS epoch,
                  cond NOT IN (73, 87) AS uhl,
                  cond NOT IN (73, 87, 52) AS ul,
                  cond <> 57 AS uv FROM t)
         SELECT symbol, epoch,
            arg_min(price, tsu) FILTER (ul) AS open,
            max(price) FILTER (uhl) AS high,
            min(price) FILTER (uhl) AS low,
            arg_max(price, tsu) FILTER (ul) AS close,
            round(sum(sz) FILTER (uv), 6) AS volume
         FROM f GROUP BY 1, 2
         HAVING open IS NOT NULL AND volume IS NOT NULL AND volume <> 0
         ORDER BY 1, 2""",

    "q_vwap" ->
      """SELECT event_type AS symbol, (epoch_us(ts)//1000000)//86400*86400 AS epoch,
            round(sum(value * (event_id % 100 + 1)) / sum(event_id % 100 + 1), 6) AS vwap,
            round(sum(event_id % 100 + 1)::DOUBLE, 6) AS volume,
            count(*)::BIGINT AS n_trades
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_rolling_vol" ->
      """WITH d AS (SELECT event_type, (epoch_us(ts)//1000000)//86400*86400 AS epoch,
              arg_max(value, epoch_us(ts)) AS close
            FROM events GROUP BY 1, 2),
         r AS (SELECT event_type, epoch,
              ln(close / lag(close) OVER (PARTITION BY event_type ORDER BY epoch)) AS lr
            FROM d)
         SELECT event_type, epoch, round(lr, 6) AS log_return,
           round(stddev_samp(lr) OVER (PARTITION BY event_type ORDER BY epoch
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS volatility
         FROM r ORDER BY 1, 2""",
    "q_drawdown" ->
      """WITH d AS (SELECT event_type, (epoch_us(ts)//1000000)//86400*86400 AS epoch,
              arg_max(value, epoch_us(ts)) AS close
            FROM events GROUP BY 1, 2),
         x AS (SELECT event_type, epoch,
              close / max(close) OVER (PARTITION BY event_type ORDER BY epoch
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS dd
            FROM d),
         m AS (SELECT event_type, min(dd) AS mdd FROM x GROUP BY 1)
         SELECT x.event_type, round(m.mdd, 6) AS max_drawdown,
           min(x.epoch)::BIGINT AS trough_epoch
         FROM x JOIN m ON x.event_type = m.event_type AND x.dd = m.mdd
         GROUP BY x.event_type, m.mdd ORDER BY 1""",
    "q_sessionize" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS tsu,
              epoch_us(ts)//1000000 AS e, event_id FROM events),
         f AS (SELECT *, CASE WHEN lag(e) OVER w IS NULL
                  OR e - lag(e) OVER w > 1800 THEN 1 ELSE 0 END AS brk
           FROM t WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
             ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM f)
         SELECT user_id, sid::BIGINT AS session_id,
           min(e)::BIGINT AS session_start, max(e)::BIGINT AS session_end,
           count(*)::BIGINT AS n_events
         FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_ema" ->
      """WITH RECURSIVE
         d0 AS (SELECT event_type, (epoch_us(ts)//1000000)//86400*86400 AS epoch,
              arg_max(value, epoch_us(ts)) AS close FROM events GROUP BY 1, 2),
         d AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY epoch) AS rn
           FROM d0),
         e AS (SELECT event_type, epoch, rn, close, close AS ema FROM d WHERE rn = 1
           UNION ALL
           SELECT d.event_type, d.epoch, d.rn, d.close,
             0.25 * d.close + 0.75 * e.ema
           FROM d JOIN e ON d.event_type = e.event_type AND d.rn = e.rn + 1)
         SELECT event_type, epoch, round(close, 6) AS close, round(ema, 6) AS ema
         FROM e ORDER BY 1, 2""",
    "q_bollinger" ->
      """WITH d AS (SELECT event_type, (epoch_us(ts)//1000000)//86400*86400 AS epoch,
              arg_max(value, epoch_us(ts)) AS close FROM events GROUP BY 1, 2),
         b AS (SELECT event_type, epoch,
              CASE WHEN count(close) OVER w = 5 THEN avg(close) OVER w END AS mid,
              CASE WHEN count(close) OVER w = 5
                THEN stddev_samp(close) OVER w * 2.0 END AS dev
           FROM d WINDOW w AS (PARTITION BY event_type ORDER BY epoch
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
         SELECT event_type, epoch, round(mid, 6) AS boll_mid,
           round(mid + dev, 6) AS boll_up, round(mid - dev, 6) AS boll_down
         FROM b ORDER BY 1, 2""",
    "q_rsi" ->
      """WITH d AS (SELECT event_type, (epoch_us(ts)//1000000)//86400*86400 AS epoch,
              arg_max(value, epoch_us(ts)) AS close FROM events GROUP BY 1, 2),
         x AS (SELECT event_type, epoch,
              close - lag(close) OVER (PARTITION BY event_type ORDER BY epoch) AS dl
           FROM d),
         g AS (SELECT event_type, epoch,
              CASE WHEN dl > 0 THEN dl WHEN dl IS NOT NULL THEN 0.0 END AS gain,
              CASE WHEN dl < 0 THEN -dl WHEN dl IS NOT NULL THEN 0.0 END AS loss
           FROM x),
         r AS (SELECT event_type, epoch,
              count(gain) OVER w AS nfull,
              avg(gain) OVER w AS ag, avg(loss) OVER w AS al
           FROM g WINDOW w AS (PARTITION BY event_type ORDER BY epoch
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
         SELECT event_type, epoch,
           round(CASE WHEN nfull = 5 AND al = 0.0 THEN 100.0
             WHEN nfull = 5 THEN 100.0 - 100.0 / (1.0 + ag / al) END, 6) AS rsi
         FROM r ORDER BY 1, 2""",
    "q_rsi_wilder" ->
      """WITH RECURSIVE
         d0 AS (SELECT event_type, (epoch_us(ts)//1000000)//86400*86400 AS epoch,
              arg_max(value, epoch_us(ts)) AS close FROM events GROUP BY 1, 2),
         d AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY epoch) AS rn
           FROM d0),
         x AS (SELECT event_type, epoch, rn,
              close - lag(close) OVER (PARTITION BY event_type ORDER BY epoch) AS dl
           FROM d),
         g AS (SELECT event_type, epoch, rn,
              CASE WHEN dl > 0 THEN dl WHEN dl IS NOT NULL THEN 0.0 END AS gain,
              CASE WHEN dl < 0 THEN -dl WHEN dl IS NOT NULL THEN 0.0 END AS loss
           FROM x),
         r AS (SELECT event_type, epoch, rn, gain AS ag, loss AS al
             FROM g WHERE rn = 2
           UNION ALL
           SELECT g.event_type, g.epoch, g.rn,
             (1.0/4.0) * g.gain + (1.0 - 1.0/4.0) * r.ag,
             (1.0/4.0) * g.loss + (1.0 - 1.0/4.0) * r.al
           FROM g JOIN r ON g.event_type = r.event_type AND g.rn = r.rn + 1)
         SELECT event_type, epoch,
           round(CASE WHEN al = 0.0 THEN 100.0
             ELSE 100.0 - 100.0 / (1.0 + ag / al) END, 6) AS rsi_w
         FROM r ORDER BY 1, 2""",
    "q_macd" ->
      """WITH RECURSIVE
         d0 AS (SELECT event_type, (epoch_us(ts)//1000000)//86400*86400 AS epoch,
              arg_max(value, epoch_us(ts)) AS close FROM events GROUP BY 1, 2),
         d AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY epoch) AS rn
           FROM d0),
         m AS (SELECT event_type, epoch, rn, close, close AS ef, close AS es
             FROM d WHERE rn = 1
           UNION ALL
           SELECT d.event_type, d.epoch, d.rn, d.close,
             (2.0/13.0) * d.close + (1.0 - 2.0/13.0) * m.ef,
             (2.0/27.0) * d.close + (1.0 - 2.0/27.0) * m.es
           FROM d JOIN m ON d.event_type = m.event_type AND d.rn = m.rn + 1),
         s AS (SELECT event_type, epoch, rn, ef - es AS macd, ef - es AS sig
             FROM m WHERE rn = 1
           UNION ALL
           SELECT m.event_type, m.epoch, m.rn, m.ef - m.es,
             (2.0/10.0) * (m.ef - m.es) + (1.0 - 2.0/10.0) * s.sig
           FROM m JOIN s ON m.event_type = s.event_type AND m.rn = s.rn + 1)
         SELECT event_type, epoch, round(macd, 6) AS macd,
           round(sig, 6) AS macd_signal, round(macd - sig, 6) AS macd_hist
         FROM s ORDER BY 1, 2""",
    "q_atr" ->
      """WITH RECURSIVE
         d0 AS (SELECT event_type, (epoch_us(ts)//1000000)//86400*86400 AS epoch,
              max(value) AS high, min(value) AS low,
              arg_max(value, epoch_us(ts)) AS close FROM events GROUP BY 1, 2),
         d AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY epoch) AS rn
           FROM d0),
         x AS (SELECT event_type, epoch, rn,
              CASE WHEN lag(close) OVER w IS NULL THEN high - low
                ELSE greatest(high - low,
                  abs(high - lag(close) OVER w), abs(low - lag(close) OVER w)) END AS tr
           FROM d WINDOW w AS (PARTITION BY event_type ORDER BY epoch)),
         r AS (SELECT event_type, epoch, rn, tr AS atr FROM x WHERE rn = 1
           UNION ALL
           SELECT x.event_type, x.epoch, x.rn,
             (1.0/4.0) * x.tr + (1.0 - 1.0/4.0) * r.atr
           FROM x JOIN r ON x.event_type = r.event_type AND x.rn = r.rn + 1)
         SELECT event_type, epoch, round(atr, 6) AS atr
         FROM r ORDER BY 1, 2""",
    "q_donchian" ->
      """WITH d AS (SELECT event_type, (epoch_us(ts)//1000000)//86400*86400 AS epoch,
              max(value) AS high, min(value) AS low FROM events GROUP BY 1, 2)
         SELECT event_type, epoch,
           round(max(high) OVER w, 6) AS don_up,
           round(min(low) OVER w, 6) AS don_down,
           round((max(high) OVER w + min(low) OVER w) / 2.0, 6) AS don_mid
         FROM d WINDOW w AS (PARTITION BY event_type ORDER BY epoch
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         ORDER BY 1, 2""",
    "q_pair_corr" ->
      """WITH d AS (SELECT event_type, (epoch_us(ts)//1000000)//86400*86400 AS epoch,
              arg_max(value, epoch_us(ts)) AS close FROM events GROUP BY 1, 2),
         r AS (SELECT event_type, epoch,
              ln(close / lag(close) OVER (PARTITION BY event_type ORDER BY epoch)) AS lr
           FROM d)
         SELECT a.event_type AS k1, b.event_type AS k2,
           round(corr(a.lr, b.lr), 6) AS correlation,
           count(CASE WHEN a.lr IS NOT NULL AND b.lr IS NOT NULL THEN 1 END)::BIGINT AS n_obs
         FROM r a JOIN r b ON a.epoch = b.epoch AND a.event_type < b.event_type
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_union_keeplast" ->
      s"""WITH e AS (SELECT epoch_us(ts) AS tsu, event_id, value FROM events),
          l AS (SELECT * FROM e WHERE tsu//1000000 < $T2),
          r AS (SELECT tsu, event_id, value*2 AS value FROM e WHERE tsu//1000000 >= $T1)
          SELECT tsu//1000000 AS epoch, event_id, value FROM r
          UNION ALL
          SELECT tsu//1000000, event_id, value FROM l
          WHERE event_id NOT IN (SELECT event_id FROM r)
          ORDER BY event_id""",

    "q_asof_join" ->
      """SELECT e.event_id, e.value,
            (SELECT s.value FROM events s
             WHERE s.event_type = 'signup' AND epoch_us(s.ts) <= epoch_us(e.ts)
             ORDER BY epoch_us(s.ts) DESC LIMIT 1) AS signup_value
         FROM events e WHERE e.event_type = 'purchase'
         ORDER BY e.event_id""",

    "q_adjust" ->
      """WITH daily AS (
           SELECT (epoch_us(ts)//1000000)//86400*86400 AS epoch,
              arg_max(value, epoch_us(ts)) AS close, sum(value) AS volume
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         ca AS (
           SELECT epoch_us(ts)//1000000 AS caepoch,
                  1.0 + (event_id % 7)::DOUBLE / 100.0 AS rate
           FROM events WHERE event_type = 'error' AND event_id % 97 = 0),
         f AS (
           SELECT d.epoch, coalesce(exp(sum(ln(c.rate))), 1.0) AS factor
           FROM daily d LEFT JOIN ca c ON d.epoch < c.caepoch GROUP BY 1)
         SELECT d.epoch, round(d.close * f.factor, 4) AS close,
                round(d.volume / f.factor, 6) AS volume
         FROM daily d JOIN f ON d.epoch = f.epoch
         ORDER BY d.epoch""",

    "q_join_enrich" ->
      """SELECT p_brand, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
            count(*) AS n
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    "q_join_semi_anti" ->
      """SELECT
           (SELECT count(*) FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)) AS with_items,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)) AS without_items""",

    "q_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    // ns-precision bounds: 2024-01-10, 2024-01-19-23:59:59, 2024-01-15,
    // 2024-01-20 as unix nanos — the same values SqlService rewrites
    // the date literals to
    "q_sql_select_range" ->
      """SELECT epoch_us(ts)//1000000 AS epoch, event_id, value FROM events
         WHERE epoch_us(ts)*1000 BETWEEN 1704844800000000000 AND 1705708799000000000
           AND event_type = 'purchase'
         ORDER BY event_id""",
    "q_sql_date_catalog" ->
      """SELECT epoch_us(ts)//1000000 AS epoch, (epoch_us(ts)%1000000)*1000 AS nanoseconds,
            value, event_id
         FROM events
         WHERE event_type = 'purchase'
           AND epoch_us(ts)*1000 BETWEEN 1704844800000000000 AND 1705708799000000000
         ORDER BY epoch, nanoseconds, event_id""",
    "q_sql_agg_count" ->
      """SELECT event_type, count(*) AS cnt FROM events
         WHERE epoch_us(ts)*1000 >= 1705276800000000000
         GROUP BY event_type ORDER BY event_type""",
    "q_sql_tickcandler" ->
      """SELECT (epoch_us(ts)//1000000)//86400*86400 AS epoch,
            arg_min(value, epoch_us(ts)) AS open, max(value) AS high,
            min(value) AS low, arg_max(value, epoch_us(ts)) AS close,
            round(sum(value), 6) AS value_sum
         FROM events
         WHERE event_type = 'purchase' AND epoch_us(ts)*1000 < 1705276800000000000
         GROUP BY 1 ORDER BY 1""",
    "q_sql_insert_select" ->
      """SELECT epoch_us(ts)//1000000 AS epoch, (epoch_us(ts)%1000000)*1000 AS nanoseconds, value
         FROM events
         WHERE event_type = 'purchase' AND epoch_us(ts)*1000 < 1705708800000000000
         ORDER BY epoch, nanoseconds""",

    "q_sql_tbk_catalog" ->
      s"""SELECT epoch, count(*)::BIGINT AS n_trades,
            round(sum(value), 6) AS value_sum
          FROM (SELECT epoch_us(ts)//1000000 AS epoch, value FROM events
                WHERE event_type = 'purchase')
          WHERE epoch >= $T1 AND epoch < $T2
          GROUP BY epoch ORDER BY epoch"""
  ) ++ roundTripOracleSql ++ opsOracleSql

  /** Round-trip oracles: the write→mutate→read-back pipelines above
    * must equal these pure SELECTs over the source events table.
    */
  private def roundTripOracleSql: Map[String, String] = Map(
    "q_roundtrip_delete" ->
      s"""SELECT epoch_us(ts)//1000000 AS epoch, (epoch_us(ts)%1000000)*1000 AS nanoseconds,
            value, event_id
          FROM events
          WHERE event_type = 'purchase'
            AND epoch_us(ts)//1000000 NOT BETWEEN $T1 AND ${T2 - 1}
          ORDER BY epoch, nanoseconds""",
    "q_roundtrip_trim" ->
      s"""SELECT epoch_us(ts)//1000000 AS epoch, (epoch_us(ts)%1000000)*1000 AS nanoseconds,
            value, event_id
          FROM events
          WHERE event_type = 'purchase' AND epoch_us(ts)//1000000 < $T2
          ORDER BY epoch, nanoseconds""",
    "q_roundtrip_coerce" ->
      """SELECT epoch_us(ts)//1000000 AS epoch, (epoch_us(ts)%1000000)*1000 AS nanoseconds,
            CAST(CAST(value AS FLOAT) AS DOUBLE) AS value,
            CAST(event_id AS INTEGER)::BIGINT AS event_id,
            CAST(NULL AS DOUBLE) AS extra
          FROM events WHERE event_type = 'purchase'
          ORDER BY epoch, nanoseconds""",
    "q_roundtrip_csv" ->
      """SELECT epoch_us(ts)//1000000 AS epoch, (epoch_us(ts)%1000000)*1000 AS nanoseconds,
            value, event_id
          FROM events WHERE event_type = 'purchase'
          ORDER BY epoch, nanoseconds""",
    "q_wire_query" ->
      s"""SELECT epoch_us(ts)//1000000 AS epoch, (epoch_us(ts)%1000000)*1000 AS nanoseconds,
            value, event_id
          FROM events
          WHERE event_type = 'purchase'
            AND epoch_us(ts)//1000000 BETWEEN $T1 AND ${T2 - 1}
          ORDER BY epoch, nanoseconds""",
    // ANN from the trigger-maintained index over the wire at full
    // probe == exhaustive — same oracle as q_knn_ivf_trigger
    "q_wire_knn_ivf" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         scored AS (SELECT q.query_id, e.vec_id,
              list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM embeddings e, q WHERE e.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",
    // the ops job's clone mapping: every doc joined to its normalized-
    // text group's min id (null-safe join keeps null-text docs grouped,
    // matching contentHash's md5(NULL) group)
    "q_wire_ops_job" ->
      """SELECT d.doc_id, g.canonical_id
         FROM documents d JOIN (
           SELECT lower(trim(text)) AS k, min(doc_id) AS canonical_id
           FROM documents GROUP BY 1) g
         ON lower(trim(d.text)) IS NOT DISTINCT FROM g.k
         ORDER BY d.doc_id""",
    "q_queryservice_lastn" ->
      """WITH e AS (SELECT event_type AS symbol, epoch_us(ts) AS tsu, value, event_id FROM events),
         r AS (SELECT symbol, tsu, value, event_id,
                 row_number() OVER (PARTITION BY symbol ORDER BY tsu DESC) AS rk
               FROM e)
         SELECT symbol, tsu//1000000 AS epoch, (tsu%1000000)*1000 AS nanoseconds, value, event_id
         FROM r WHERE rk <= 10 ORDER BY symbol, epoch, nanoseconds""",
    "q_queryservice_wide" ->
      """WITH e AS (SELECT 'W' || (event_id % 16000) AS symbol, epoch_us(ts) AS tsu, value, event_id FROM events),
         r AS (SELECT symbol, tsu, value, event_id,
                 row_number() OVER (PARTITION BY symbol ORDER BY tsu DESC) AS rk
               FROM e)
         SELECT symbol, tsu//1000000 AS epoch, (tsu%1000000)*1000 AS nanoseconds, value, event_id
         FROM r WHERE rk <= 2 ORDER BY symbol, epoch, nanoseconds""",
    // the cascade's end state must equal the aggregation over ALL
    // bars regardless of ingest order — the recompute-and-overwrite
    // contract (aggtrigger.go:110-293)
    "q_cascade_ohlcv" ->
      """WITH bars AS (
           SELECT event_type AS symbol, (epoch_us(ts)//1000000)//60*60 AS epoch,
              arg_min(value, epoch_us(ts)) AS open, max(value) AS high,
              min(value) AS low, arg_max(value, epoch_us(ts)) AS close,
              sum(value) AS volume
           FROM events GROUP BY 1, 2),
         c AS (
           SELECT '5Min' AS tf, symbol, epoch//300*300 AS epoch,
              arg_min(open, epoch) AS open, max(high) AS high, min(low) AS low,
              arg_max(close, epoch) AS close, round(sum(volume), 6) AS volume
           FROM bars GROUP BY 2, 3
           UNION ALL
           SELECT '1H', symbol, epoch//3600*3600,
              arg_min(open, epoch), max(high), min(low),
              arg_max(close, epoch), round(sum(volume), 6)
           FROM bars GROUP BY 2, 3)
         SELECT * FROM c ORDER BY tf, symbol, epoch"""
  )

  // q_dedup_simhash / q_knn_lsh / q_knn_ivf / q_knn_pq are
  // intentionally oracle-free (xxhash64 signatures are engine-specific;
  // LSH/IVF/PQ are approximate by design) — driver records a rows-only
  // check; their semantics are machine-checked in
  // src/test/scala/graft/OpsSpec.scala (minhash ⊇ exact-Jaccard pairs,
  // simhash banding == brute XOR popcount, LSH top-k recall >= 0.9 vs
  // brute force, IVF full-probe == brute force, PQ ADC == dot with the
  // codeword reconstruction + training shrinks reconstruction error),
  // and each has a fully-oracled sibling exercising the same machinery
  // (q_dedup_minhash, q_knn_lsh_twins, q_knn_ivf_full/pruned,
  // q_knn_pq_exact).
  private def opsOracleSql: Map[String, String] = Map(
    "q_text_stats" ->
      """WITH t AS (SELECT doc_id, text, string_split(lower(trim(text)), ' ') AS ts FROM documents)
         SELECT doc_id,
           len(ts)::BIGINT AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS n_regex_tokens,
           round(len(list_distinct(ts))::DOUBLE / len(ts), 6) AS distinct_ratio,
           round(len(list_filter(ts, x -> x IN ('the','a','of','and')))::DOUBLE / len(ts), 6) AS stopword_ratio,
           round((length(text)::DOUBLE - (len(ts) - 1)) / len(ts), 6) AS mean_token_len,
           round(least(len(ts) / 100.0, 1.0) * 0.3
             + (len(list_distinct(ts))::DOUBLE / len(ts)) * 0.4
             + (1.0 - len(list_filter(ts, x -> x IN ('the','a','of','and')))::DOUBLE / len(ts)) * 0.3, 6) AS quality
         FROM t ORDER BY doc_id""",

    // quality formula mirrored from the q_text_stats oracle; both
    // engines compare the SAME round-6 score against double-cast
    // thresholds, so boundary docs route identically
    "q_report_thresholds" ->
      """WITH t AS (SELECT source, text, string_split(lower(trim(text)), ' ') AS ts FROM documents),
         s AS (SELECT source, len(ts)::BIGINT AS n_tokens,
             round(least(len(ts) / 100.0, 1.0) * 0.3
               + (len(list_distinct(ts))::DOUBLE / len(ts)) * 0.4
               + (1.0 - len(list_filter(ts, x -> x IN ('the','a','of','and')))::DOUBLE / len(ts)) * 0.3, 6) AS q
           FROM t),
         x AS (SELECT source, n_tokens, q,
             unnest([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]::DOUBLE[]) AS threshold
           FROM s)
         SELECT source, threshold, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN q >= threshold THEN 1 ELSE 0 END)::BIGINT AS n_keep,
           sum(CASE WHEN q >= threshold THEN n_tokens ELSE 0 END)::BIGINT AS tokens_keep,
           round(sum(CASE WHEN q >= threshold THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS keep_frac
         FROM x GROUP BY source, threshold ORDER BY source, threshold""",

    "q_text_langid" ->
      """WITH t AS (SELECT string_split(lower(trim(text)), ' ') AS ts FROM documents),
         s AS (SELECT
             len(list_filter(ts, x -> x IN ('the','a','of','and','is'))) AS s_en,
             len(list_filter(ts, x -> x IN ('el','la','de','que','y'))) AS s_es,
             len(list_filter(ts, x -> x IN ('der','die','das','und','ist'))) AS s_de
           FROM t)
         SELECT CASE WHEN s_de > greatest(s_en, s_es) THEN 'de'
                     WHEN s_es > s_en THEN 'es'
                     WHEN s_en > 0 THEN 'en' ELSE 'und' END AS lang_pred,
                count(*) AS cnt
         FROM s GROUP BY 1 ORDER BY 1""",

    "q_text_redact" ->
      """WITH d AS (SELECT doc_id,
             CASE WHEN doc_id % 10 = 0
               THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or visit https://ex.org/p' || CAST(doc_id AS VARCHAR)
               ELSE text END AS text
           FROM documents)
         SELECT doc_id,
           (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
            + len(regexp_extract_all(text, 'https?://[^\s]+')))::BIGINT AS n_redactions,
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             'https?://[^\s]+', '<URL>', 'g') AS text_redacted
         FROM d ORDER BY doc_id""",

    "q_text_lm_quality" ->
      """WITH d AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
             FROM documents WHERE text IS NOT NULL),
         tok AS (SELECT doc_id, unnest(ts) AS w FROM d),
         cnt AS (SELECT w, count(*)::BIGINT AS c FROM tok GROUP BY w),
         tot AS (SELECT sum(c)::BIGINT AS t FROM cnt),
         vocab AS (SELECT w, ln(c::DOUBLE / (SELECT t FROM tot)) AS logp
           FROM cnt ORDER BY c DESC, w LIMIT 512)
         SELECT tok.doc_id, count(*)::BIGINT AS n_tokens,
           sum(CASE WHEN v.logp IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
           round(avg(coalesce(v.logp, ln(0.5 / (SELECT t FROM tot)))), 6) AS avg_logprob
         FROM tok LEFT JOIN vocab v USING (w)
         GROUP BY tok.doc_id ORDER BY doc_id""",

    // interpolated Kneser–Ney bigram LM: the probability expression
    // mirrors the Spark side operation-for-operation (same
    // parenthesization, so both engines round identically before ln)
    "q_text_lm_kn" ->
      """WITH d AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
             FROM documents WHERE text IS NOT NULL),
         bg AS (SELECT doc_id, unnest(list_transform(range(1, len(ts)),
               i -> struct_pack(u := ts[i], w := ts[i+1]))) AS p FROM d),
         b2 AS (SELECT doc_id, p.u AS u, p.w AS w FROM bg),
         big AS (SELECT u, w, count(*)::BIGINT AS c FROM b2 GROUP BY u, w),
         ctx AS (SELECT u, sum(c)::BIGINT AS cu, count(*)::BIGINT AS n1u
           FROM big GROUP BY u),
         cont AS (SELECT w, count(*)::BIGINT AS n1w FROM big GROUP BY w),
         nb AS (SELECT count(*)::BIGINT AS nb FROM big),
         sc AS (SELECT b2.doc_id,
             ln((greatest(c - 0.75, 0)
                 + 0.75 * n1u * (n1w::DOUBLE / (SELECT nb FROM nb))) / cu) AS logp
           FROM b2 JOIN big USING (u, w) JOIN ctx USING (u) JOIN cont USING (w)),
         agg AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
             round(avg(logp), 6) AS avg_logprob FROM sc GROUP BY doc_id)
         SELECT d.doc_id, coalesce(agg.n_bigrams, 0)::BIGINT AS n_bigrams,
           0::BIGINT AS n_unseen, agg.avg_logprob
         FROM d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""",

    // interpolated Kneser–Ney trigram LM: the three-layer probability
    // chain mirrors the Spark side operation-for-operation (same
    // parenthesization at every level, so both engines round
    // identically before the final ln); every lower order is
    // estimated from continuation-type counts of the order above
    "q_text_lm_kn3" ->
      """WITH d AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
             FROM documents WHERE text IS NOT NULL),
         tg AS (SELECT doc_id, unnest(list_transform(range(1, len(ts) - 1),
               i -> struct_pack(u := ts[i], v := ts[i+1], w := ts[i+2]))) AS p FROM d),
         t3 AS MATERIALIZED (SELECT doc_id, p.u AS u, p.v AS v, p.w AS w FROM tg),
         tri AS MATERIALIZED (SELECT u, v, w, count(*)::BIGINT AS c FROM t3 GROUP BY u, v, w),
         ctx AS (SELECT u, v, sum(c)::BIGINT AS cuv, count(*)::BIGINT AS n1uv
           FROM tri GROUP BY u, v),
         c2 AS MATERIALIZED (SELECT v, w, count(*)::BIGINT AS n1vw FROM tri GROUP BY v, w),
         mid AS (SELECT v, sum(n1vw)::BIGINT AS tv, count(*)::BIGINT AS n2v
           FROM c2 GROUP BY v),
         c1 AS (SELECT w, count(*)::BIGINT AS n1w FROM c2 GROUP BY w),
         nb AS (SELECT count(*)::BIGINT AS nb FROM c2),
         -- nb rides the join tree as a 1-row cross join, and the
         -- shared deep CTEs above are MATERIALIZED: with 7 inlined
         -- copies of the unnest pipeline in one join tree, DuckDB's
         -- planner goes pathological (minutes at sf0.01 vs 0.1 s
         -- this way; measured — the Spark side is unaffected)
         sc AS (SELECT t3.doc_id,
             ln((greatest(c - 0.75, 0)
                 + 0.75 * n1uv * ((greatest(n1vw - 0.75, 0)
                     + 0.75 * n2v * (n1w::DOUBLE / nb.nb)) / tv)) / cuv) AS logp
           FROM t3 JOIN tri USING (u, v, w) JOIN ctx USING (u, v)
                JOIN c2 USING (v, w) JOIN mid USING (v) JOIN c1 USING (w), nb),
         agg AS (SELECT doc_id, count(*)::BIGINT AS n_trigrams,
             round(avg(logp), 6) AS avg_logprob FROM sc GROUP BY doc_id)
         SELECT d.doc_id, coalesce(agg.n_trigrams, 0)::BIGINT AS n_trigrams,
           0::BIGINT AS n_unseen, agg.avg_logprob
         FROM d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""",

    "q_bpe_merges" -> bpeMergesSql(BpeMergeCount),
    "q_bpe_merges_local" -> bpeMergesSql(BpeLocalMergeCount),
    "q_bpe_merges_bytes" -> bpeMergesSql(BpeByteMergeCount, byteLevel = true),

    "q_tokenize_bpe" -> (bpeChain(BpeMergeCount) + s""",
         tok AS (SELECT doc_id, unnest(range(1, len(ts) + 1)) AS ord, unnest(ts) AS tok FROM (
             SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
             FROM documents WHERE text IS NOT NULL)),
         enc AS (SELECT t.doc_id, t.ord, coalesce(s.seg, t.tok) AS piece,
             CASE WHEN s.seg IS NULL THEN 1
                  ELSE len(string_split(s.seg, '|')) END::BIGINT AS n
           FROM tok t LEFT JOIN seg$BpeMergeCount s ON t.tok = s.word)
         SELECT doc_id, sum(n)::BIGINT AS n_tokens_bpe,
           string_agg(piece, ' ' ORDER BY ord) AS bpe_text
         FROM enc GROUP BY doc_id ORDER BY doc_id"""),

    // decode(encode(x)) must be the whitespace-normalized text and the
    // token count must match the seg relation — both computed here
    // WITHOUT running the engine's decode, so the round trip is pinned
    // against an independent fixed point
    "q_bpe_roundtrip" -> (bpeChain(BpeByteMergeCount, byteLevel = true) + s""",
         tok AS (SELECT doc_id, unnest(ts) AS tok FROM (
             SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
             FROM documents WHERE text IS NOT NULL)),
         enc AS (SELECT t.doc_id,
             CASE WHEN s.seg IS NULL THEN 1
                  ELSE len(string_split(s.seg, '|')) END::BIGINT AS n
           FROM tok t LEFT JOIN seg$BpeByteMergeCount s ON t.tok = s.word),
         nt AS (SELECT doc_id, sum(n)::BIGINT AS n_tokens_bpe FROM enc GROUP BY doc_id)
         SELECT d.doc_id, nt.n_tokens_bpe, lower(trim(d.text)) AS decoded
         FROM documents d JOIN nt ON d.doc_id = nt.doc_id
         WHERE d.text IS NOT NULL ORDER BY d.doc_id"""),

    "q_bpe_fertility" -> (bpeChain(BpeMergeCount) + s""",
         tok AS (SELECT doc_id, unnest(ts) AS tok FROM (
             SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
             FROM documents WHERE text IS NOT NULL)),
         enc AS (SELECT t.doc_id,
             CASE WHEN s.seg IS NULL THEN 1
                  ELSE len(string_split(s.seg, '|')) END::BIGINT AS n
           FROM tok t LEFT JOIN seg$BpeMergeCount s ON t.tok = s.word),
         nt AS (SELECT doc_id, sum(n)::BIGINT AS n_tokens_bpe FROM enc GROUP BY doc_id),
         wc AS (SELECT doc_id, source,
             len(string_split(lower(trim(text)), ' '))::BIGINT AS n_words
           FROM documents WHERE text IS NOT NULL)
         SELECT source, sum(n_words)::BIGINT AS n_words,
           sum(n_tokens_bpe)::BIGINT AS n_tokens_bpe,
           round(sum(n_tokens_bpe)::DOUBLE / sum(n_words), 6) AS fertility
         FROM wc JOIN nt USING (doc_id) GROUP BY source ORDER BY source"""),

    "q_pack_bpe" -> (bpeChain(BpeMergeCount) + s""",
         tok AS (SELECT doc_id, unnest(ts) AS tok FROM (
             SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
             FROM documents WHERE text IS NOT NULL)),
         enc AS (SELECT t.doc_id,
             CASE WHEN s.seg IS NULL THEN 1
                  ELSE len(string_split(s.seg, '|')) END::BIGINT AS n
           FROM tok t LEFT JOIN seg$BpeMergeCount s ON t.tok = s.word),
         nt AS (SELECT doc_id, sum(n)::BIGINT AS n_tokens FROM enc GROUP BY doc_id),
         c AS (SELECT doc_id, n_tokens,
             (sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS start_offset
           FROM nt)
         SELECT doc_id, n_tokens, start_offset,
           start_offset // 256 AS chunk_first,
           (start_offset + n_tokens - 1) // 256 AS chunk_last,
           (start_offset + n_tokens - 1) // 256 - start_offset // 256 + 1 AS n_chunks
         FROM c ORDER BY doc_id"""),

    "q_sample_exact_k" ->
      """SELECT doc_id, source FROM (
           SELECT doc_id, source, md5('graft:' || doc_id::VARCHAR) AS pri
           FROM documents ORDER BY pri, doc_id LIMIT 100)
         ORDER BY doc_id""",

    "q_epoch_order" ->
      """WITH e AS (SELECT doc_id, unnest([0, 1]) AS epoch FROM documents),
         p AS (SELECT doc_id, epoch,
             md5('graft:e' || epoch::VARCHAR || ':' || doc_id::VARCHAR) AS pri FROM e),
         s AS (SELECT doc_id, epoch, pri,
             ('0x' || substr(pri, 1, 8))::BIGINT % 8 AS shard FROM p)
         SELECT doc_id, epoch, shard,
           row_number() OVER (PARTITION BY epoch, shard ORDER BY pri, doc_id) AS pos
         FROM s ORDER BY epoch, shard, pos""",

    "q_text_tfidf" ->
      """WITH d AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
             FROM documents WHERE text IS NOT NULL),
         tok AS (SELECT doc_id, unnest(ts) AS term FROM d),
         tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
         dfq AS (SELECT term, count(*)::BIGINT AS dfc FROM tf GROUP BY term),
         n AS (SELECT count(*)::BIGINT AS n FROM d),
         s AS (SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * (ln(((SELECT n FROM n) + 1)::DOUBLE / (dfc + 1)) + 1), 6) AS score
           FROM tf JOIN dfq USING (term)),
         r AS (SELECT s.*, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS term_rank FROM s)
         SELECT doc_id, term_rank, term, tf, score FROM r
         WHERE term_rank <= 5 ORDER BY doc_id, term_rank""",

    "q_pipeline_ccnet" ->
      """WITH d AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
             FROM documents WHERE text IS NOT NULL),
         tok AS (SELECT doc_id, unnest(ts) AS w FROM d),
         cnt AS (SELECT w, count(*)::BIGINT AS c FROM tok GROUP BY w),
         tot AS (SELECT sum(c)::BIGINT AS t FROM cnt),
         vocab AS (SELECT w, ln(c::DOUBLE / (SELECT t FROM tot)) AS logp
           FROM cnt ORDER BY c DESC, w LIMIT 512),
         sc AS (SELECT tok.doc_id, count(*)::BIGINT AS n_tokens,
             round(avg(coalesce(v.logp, ln(0.5 / (SELECT t FROM tot)))), 6) AS avg_logprob
           FROM tok LEFT JOIN vocab v USING (w) GROUP BY tok.doc_id),
         lang AS (SELECT doc_id,
             CASE WHEN s_de > greatest(s_en, s_es) THEN 'de'
                  WHEN s_es > s_en THEN 'es'
                  WHEN s_en > 0 THEN 'en' ELSE 'und' END AS lang_pred
           FROM (SELECT doc_id,
               len(list_filter(ts, x -> x IN ('the','a','of','and','is'))) AS s_en,
               len(list_filter(ts, x -> x IN ('el','la','de','que','y'))) AS s_es,
               len(list_filter(ts, x -> x IN ('der','die','das','und','ist'))) AS s_de
             FROM d)),
         b AS (SELECT sc.doc_id, sc.n_tokens, sc.avg_logprob, lang.lang_pred,
             ntile(3) OVER (PARTITION BY lang_pred
               ORDER BY avg_logprob DESC, sc.doc_id)::BIGINT AS bucket
           FROM sc JOIN lang USING (doc_id))
         SELECT lang_pred, bucket, count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS sum_tokens,
           round(avg(avg_logprob), 6) AS mean_logprob
         FROM b GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_stats_quantiles" ->
      """WITH t AS (SELECT source, len(string_split(lower(trim(text)), ' '))::BIGINT AS n_tokens
           FROM documents)
         SELECT source, round(quantile_cont(n_tokens, 0.5), 6) AS p50,
           round(quantile_cont(n_tokens, 0.9), 6) AS p90,
           max(n_tokens) AS max_tokens
         FROM t GROUP BY source ORDER BY source""",

    "q_text_gopher" ->
      """WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts FROM documents),
         g AS (SELECT doc_id, ts,
             CASE WHEN len(ts) >= 2 THEN list_transform(range(1, len(ts)),
               i -> array_to_string(ts[i:i+1], ' ')) ELSE [] END AS g2,
             CASE WHEN len(ts) >= 3 THEN list_transform(range(1, len(ts) - 1),
               i -> array_to_string(ts[i:i+2], ' ')) ELSE [] END AS g3
           FROM t),
         f AS (SELECT doc_id, max(c) AS topc FROM (
             SELECT doc_id, w, count(*) AS c FROM (
               SELECT doc_id, unnest(ts) AS w FROM t) GROUP BY 1, 2)
           GROUP BY 1),
         sig AS (SELECT g.doc_id,
             CASE WHEN len(g2) > 0
               THEN round((len(g2) - len(list_distinct(g2)))::DOUBLE / len(g2), 6)
               ELSE 0.0 END AS dup_bigram_frac,
             CASE WHEN len(g3) > 0
               THEN round((len(g3) - len(list_distinct(g3)))::DOUBLE / len(g3), 6)
               ELSE 0.0 END AS dup_trigram_frac,
             round(f.topc::DOUBLE / len(ts), 6) AS top_word_ratio
           FROM g JOIN f USING (doc_id))
         SELECT doc_id, dup_bigram_frac, dup_trigram_frac, top_word_ratio,
           (top_word_ratio <= 0.2 AND dup_trigram_frac <= 0.3) AS gopher_keep
         FROM sig ORDER BY doc_id""",

    "q_text_fingerprint" ->
      """SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(lower(trim(text)), ' '))), ' ')) AS fingerprint
         FROM documents ORDER BY doc_id""",

    // duplicated 10-token windows (count over window hash), merged per
    // doc by the standard gaps-and-islands construction
    "q_dedup_spans" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(trim(text)),' ') AS ts FROM documents),
         w AS (SELECT doc_id, r.i AS pos, md5(array_to_string(ts[r.i:r.i+9],' ')) AS h
               FROM tok, LATERAL (SELECT unnest(range(1, len(ts)-8)) AS i) r
               WHERE len(ts) >= 10),
         d AS (SELECT doc_id, pos FROM (
                 SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS c FROM w) t
               WHERE c > 1),
         fl AS (SELECT doc_id, pos,
                 CASE WHEN pos - lag(pos, 1, -1000000) OVER (PARTITION BY doc_id ORDER BY pos) > 10
                      THEN 1 ELSE 0 END AS brk FROM d),
         isl AS (SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g FROM fl)
         SELECT doc_id, min(pos) AS span_start, max(pos) + 9 AS span_end
         FROM isl GROUP BY doc_id, g ORDER BY doc_id, span_start""",

    // identical replay keyed on the raw window text (no digest)
    "q_dedup_spans_exact" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(trim(text)),' ') AS ts FROM documents),
         w AS (SELECT doc_id, r.i AS pos, array_to_string(ts[r.i:r.i+9],' ') AS h
               FROM tok, LATERAL (SELECT unnest(range(1, len(ts)-8)) AS i) r
               WHERE len(ts) >= 10),
         d AS (SELECT doc_id, pos FROM (
                 SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS c FROM w) t
               WHERE c > 1),
         fl AS (SELECT doc_id, pos,
                 CASE WHEN pos - lag(pos, 1, -1000000) OVER (PARTITION BY doc_id ORDER BY pos) > 10
                      THEN 1 ELSE 0 END AS brk FROM d),
         isl AS (SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g FROM fl)
         SELECT doc_id, min(pos) AS span_start, max(pos) + 9 AS span_end
         FROM isl GROUP BY doc_id, g ORDER BY doc_id, span_start""",

    // batch-internal clones collapse to min id; anything whose
    // normalized text the corpus already has is dropped
    "q_corpus_diff" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
         a AS (SELECT doc_id, md5(lower(trim(text))) AS h FROM base),
         b0 AS (SELECT CASE WHEN doc_id % 5 = 0 THEN doc_id + 1000000
                  ELSE doc_id END AS doc_id, text
             FROM base WHERE doc_id % 7 != 0
           UNION ALL
           SELECT doc_id + 2000000, text || ' fresh' FROM base WHERE doc_id % 11 = 0),
         b AS (SELECT doc_id, md5(lower(trim(text))) AS h FROM b0),
         same AS (SELECT b.doc_id, 'same' AS status FROM b
           WHERE EXISTS (SELECT 1 FROM a WHERE a.doc_id = b.doc_id AND a.h = b.h)),
         ns AS (SELECT * FROM b
           WHERE NOT EXISTS (SELECT 1 FROM a WHERE a.doc_id = b.doc_id AND a.h = b.h)),
         moved AS (SELECT doc_id, 'moved' AS status FROM ns
           WHERE EXISTS (SELECT 1 FROM a WHERE a.h = ns.h)),
         newd AS (SELECT doc_id, 'new' AS status FROM ns
           WHERE NOT EXISTS (SELECT 1 FROM a WHERE a.h = ns.h)),
         rem AS (SELECT a.doc_id, 'removed' AS status FROM a
           WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.h = a.h))
         SELECT doc_id, status FROM (
           SELECT * FROM same UNION ALL SELECT * FROM moved
           UNION ALL SELECT * FROM newd UNION ALL SELECT * FROM rem)
         ORDER BY doc_id, status""",

    "q_dedup_exact_delta" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
         batch AS (SELECT doc_id + 1000000 AS doc_id, text FROM d WHERE doc_id % 5 = 0
           UNION ALL
           SELECT doc_id + 2000000, text || ' fresh' FROM d WHERE doc_id % 11 = 0),
         b AS (SELECT doc_id, lower(trim(text)) AS t FROM batch),
         fb AS (SELECT t, min(doc_id) AS doc_id FROM b GROUP BY t),
         seen AS (SELECT DISTINCT lower(trim(text)) AS t FROM d)
         SELECT fb.doc_id FROM fb LEFT JOIN seen USING (t)
         WHERE seen.t IS NULL ORDER BY doc_id""",

    // paragraph-level dedup: 20-token chunks, corpus-wide first
    // occurrence by (doc_id, pos), docs reassembled from survivors
    "q_dedup_paragraphs" ->
      """WITH d AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
             FROM documents WHERE text IS NOT NULL),
         par AS MATERIALIZED (
           SELECT doc_id, pos,
             array_to_string(ts[(pos*20+1):(pos*20+20)], ' ') AS para
           FROM (SELECT doc_id, ts,
               unnest(range(CAST(ceil(len(ts)/20.0) AS BIGINT))) AS pos FROM d)),
         r AS (SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
           FROM par),
         kept AS (SELECT doc_id, pos, para FROM r WHERE rn = 1),
         np AS (SELECT doc_id, count(*)::BIGINT AS n_paras FROM par GROUP BY doc_id),
         ka AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
             string_agg(para, ' ' ORDER BY pos) AS text_dedup
           FROM kept GROUP BY doc_id)
         SELECT np.doc_id, np.n_paras, coalesce(ka.n_kept, 0)::BIGINT AS n_kept,
           coalesce(ka.text_dedup, '') AS text_dedup
         FROM np LEFT JOIN ka USING (doc_id) ORDER BY doc_id""",

    // eval slice = doc_id % 23 == 0; a train doc is contaminated when
    // it shares >= 1 distinct trigram with the eval gram set
    "q_text_decontaminate" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts FROM documents),
         d AS (SELECT doc_id, CASE WHEN len(ts) >= 3
               THEN list_distinct(list_transform(range(1, len(ts) - 1),
                 i -> array_to_string(ts[i:i+2], ' ')))
               ELSE [array_to_string(ts, ' ')] END AS shs FROM tok),
         ev AS (SELECT DISTINCT unnest(shs) AS gram FROM d WHERE doc_id % 23 = 0),
         tr AS (SELECT doc_id, len(shs) AS train_grams, unnest(shs) AS gram FROM d
                WHERE doc_id % 23 <> 0)
         SELECT tr.doc_id, any_value(train_grams) AS train_grams,
           count(*) AS hit_grams,
           round(count(*)::DOUBLE / any_value(train_grams), 6) AS contaminated_frac
         FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id ORDER BY doc_id""",

    "q_text_decontaminate_pairs" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts FROM documents),
         d AS (SELECT doc_id, CASE WHEN len(ts) >= 3
               THEN list_distinct(list_transform(range(1, len(ts) - 1),
                 i -> array_to_string(ts[i:i+2], ' ')))
               ELSE [array_to_string(ts, ' ')] END AS shs FROM tok),
         ev AS (SELECT doc_id AS eval_id, unnest(shs) AS gram FROM d WHERE doc_id % 23 = 0),
         tr AS (SELECT doc_id, unnest(shs) AS gram FROM d WHERE doc_id % 23 <> 0)
         SELECT tr.doc_id, ev.eval_id, count(*) AS shared_grams
         FROM tr JOIN ev USING (gram)
         GROUP BY 1, 2 HAVING count(*) >= 2
         ORDER BY 1, 2""",

    // winnowing (k=3, w=4): md5 each word 3-gram, lexicographic min
    // per 4-gram window, distinct selected hashes; only full windows
    // select (plus the single clipped window of a short doc)
    "q_text_winnow" ->
      """WITH b AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts,
              len(string_split(lower(trim(text)), ' ')) AS n,
              greatest(len(string_split(lower(trim(text)), ' ')) - 2, 1) AS g
           FROM documents),
         grams AS (SELECT doc_id, g, r.i,
              md5(CASE WHEN n >= 3 THEN array_to_string(ts[r.i : r.i + 2], ' ')
                       ELSE array_to_string(ts, ' ') END) AS h
           FROM b, LATERAL (SELECT unnest(range(1, g + 1)) AS i) r),
         sel AS (SELECT doc_id, g, i,
              min(h) OVER (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fingerprint
           FROM grams)
         SELECT DISTINCT doc_id, fingerprint FROM sel
         WHERE i <= greatest(g - 3, 1)
         ORDER BY doc_id, fingerprint""",

    "q_dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS content_hash, min(doc_id) AS canonical_id,
            count(*) AS n_docs
         FROM documents GROUP BY 1 ORDER BY 1""",

    "q_dedup_jaccard" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts FROM documents),
         d AS (SELECT doc_id, CASE WHEN len(ts) >= 3
               THEN list_distinct(list_transform(range(1, len(ts) - 1),
                 i -> array_to_string(ts[i:i+2], ' ')))
               ELSE [array_to_string(ts, ' ')] END AS shs FROM tok),
         sh AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS s FROM d)
         SELECT a.doc_id AS id1, b.doc_id AS id2,
            round(count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)), 6) AS jaccard
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2
         HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.4
         ORDER BY 1, 2""",

    // planted-twin simhash at τ=1.0: the answer is exactly the pairs
    // with equal shingle sets (jaccard == 1.0) — integer-exact, no
    // Hamming tail (see the queries-side note)
    "q_dedup_simhash_exact" ->
      """WITH docs2 AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text || ' ' FROM documents),
         tok AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts FROM docs2),
         d AS (SELECT doc_id, CASE WHEN len(ts) >= 3
               THEN list_distinct(list_transform(range(1, len(ts) - 1),
                 i -> array_to_string(ts[i:i+2], ' ')))
               ELSE [array_to_string(ts, ' ')] END AS shs FROM tok),
         sh AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS s FROM d)
         SELECT a.doc_id AS id1, b.doc_id AS id2,
            round(count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)), 6) AS jaccard
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2
         HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 1.0
         ORDER BY 1, 2""",

    "q_dedup_clone_collapse" ->
      """WITH docs2 AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text || ' ' FROM documents),
         tok AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts FROM docs2),
         d AS (SELECT doc_id, CASE WHEN len(ts) >= 3
               THEN list_distinct(list_transform(range(1, len(ts) - 1),
                 i -> array_to_string(ts[i:i+2], ' ')))
               ELSE [array_to_string(ts, ' ')] END AS shs FROM tok),
         sh AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS s FROM d)
         SELECT a.doc_id AS id1, b.doc_id AS id2,
            round(count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)), 6) AS jaccard
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2
         HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.4
         ORDER BY 1, 2""",

    // verified minhash == exhaustive exact jaccard at τ=0.9 (see the
    // queries-side determinism note); the oracle is the same SQL as
    // q_dedup_jaccard at the higher threshold
    "q_dedup_minhash" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts FROM documents),
         d AS (SELECT doc_id, CASE WHEN len(ts) >= 3
               THEN list_distinct(list_transform(range(1, len(ts) - 1),
                 i -> array_to_string(ts[i:i+2], ' ')))
               ELSE [array_to_string(ts, ' ')] END AS shs FROM tok),
         sh AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS s FROM d)
         SELECT a.doc_id AS id1, b.doc_id AS id2,
            round(count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)), 6) AS jaccard
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2
         HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.9
         ORDER BY 1, 2""",

    // the exhaustive pair oracle restricted to pairs touching the
    // batch slice — exactly the delta operator's contract
    "q_dedup_minhash_delta" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts FROM documents),
         d AS (SELECT doc_id, CASE WHEN len(ts) >= 3
               THEN list_distinct(list_transform(range(1, len(ts) - 1),
                 i -> array_to_string(ts[i:i+2], ' ')))
               ELSE [array_to_string(ts, ' ')] END AS shs FROM tok),
         sh AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS s FROM d)
         SELECT a.doc_id AS id1, b.doc_id AS id2,
            round(count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)), 6) AS jaccard
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0
         GROUP BY 1, 2
         HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.9
         ORDER BY 1, 2""",

    "q_dedup_embedding" ->
      """SELECT id1, id2, round(s, 6) AS score FROM (
           SELECT a.vec_id AS id1, b.vec_id AS id2,
              list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS s
           FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
         WHERE s >= 0.45 ORDER BY id1, id2""",

    "q_dedup_embedding_lsh" ->
      """WITH corpus AS (
           SELECT vec_id, embedding FROM embeddings
           UNION ALL
           SELECT vec_id + 100000, embedding FROM embeddings)
         SELECT id1, id2, round(s, 6) AS score FROM (
           SELECT a.vec_id AS id1, b.vec_id AS id2,
              list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS s
           FROM corpus a, corpus b WHERE a.vec_id < b.vec_id)
         WHERE s >= 0.9 ORDER BY id1, id2""",

    // sign-planted corpus ⇒ SemDeDup's within-cell pairs equal global
    // all-pairs at τ (cross-cell cosine ≤ 0); oracle is exhaustive
    "q_dedup_semantic" ->
      """WITH e AS (SELECT vec_id,
             CASE WHEN vec_id % 2 = 0 THEN list_transform(embedding, x -> abs(x))
                  ELSE list_transform(embedding, x -> -abs(x)) END AS embedding
           FROM embeddings)
         SELECT id1, id2, round(s, 6) AS score FROM (
           SELECT a.vec_id AS id1, b.vec_id AS id2,
              list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS s
           FROM e a, e b WHERE a.vec_id < b.vec_id)
         WHERE s >= 0.45 ORDER BY id1, id2""",

    // capped SemDeDup: the sign-planted quantizer assigns each parity
    // its own cell with certainty, so the per-cell cap replays as a
    // row_number over id1-parity partitions with the same
    // (score desc, id1, id2) priority
    "q_dedup_semantic_capped" ->
      """WITH e AS (SELECT vec_id,
             CASE WHEN vec_id % 2 = 0 THEN list_transform(embedding, x -> abs(x))
                  ELSE list_transform(embedding, x -> -abs(x)) END AS embedding
           FROM embeddings),
         pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
              list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS s
           FROM e a, e b WHERE a.vec_id < b.vec_id),
         ranked AS (SELECT id1, id2, s,
              row_number() OVER (PARTITION BY id1 % 2 ORDER BY s DESC, id1, id2) AS rk
           FROM pairs WHERE s >= 0.45)
         SELECT id1, id2, round(s, 6) AS score FROM ranked WHERE rk <= 100
         ORDER BY id1, id2""",

    // pruned-probe IVF == global brute force on the sign-planted
    // clusters (see the queries-side proof sketch)
    "q_knn_ivf_pruned" ->
      """WITH c AS (SELECT vec_id,
              CASE WHEN vec_id % 2 = 0 THEN list_transform(embedding, x -> abs(x))
                   ELSE list_transform(embedding, x -> -abs(x)) END AS v
            FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qe FROM c WHERE vec_id < 5),
         scored AS (SELECT q.query_id, c.vec_id,
              list_cosine_similarity(c.v::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM c, q WHERE c.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10""",

    "q_knn_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         scored AS (SELECT q.query_id, e.vec_id,
              list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM embeddings e, q WHERE e.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",

    // IVF-SQ8 replay: sign-plant, then the q_knn_sq8 dequantization
    // over the planted corpus; global ranking == single-probe serving
    // because cross-cell dequantized cosines stay far below zero
    "q_knn_ivfsq8" ->
      """WITH c0 AS (SELECT vec_id,
              CASE WHEN vec_id % 2 = 0 THEN list_transform(embedding, x -> abs(x))
                   ELSE list_transform(embedding, x -> -abs(x)) END AS embedding
           FROM embeddings),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM c0),
         p AS (SELECT vec_id, v, list_min(v) AS vmin,
              (list_max(v) - list_min(v)) / 255.0 AS delta FROM c),
         dq AS (SELECT vec_id,
              CASE WHEN delta = 0 THEN list_transform(v, x -> vmin)
                ELSE list_transform(v,
                  x -> vmin + floor((x - vmin) / delta + 0.5) * delta) END AS vq
           FROM p),
         q AS (SELECT vec_id AS query_id, v AS qe FROM c WHERE vec_id < 5),
         scored AS (SELECT q.query_id, dq.vec_id,
              list_cosine_similarity(dq.vq, q.qe) AS s
           FROM dq, q WHERE dq.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",

    // SQ8 replay: per-vector vmin/δ, floor(q + 0.5) codes (the exact
    // arithmetic of Sq8Encode — no ties-mode round), dequantize, then
    // the same asymmetric cosine top-k as q_knn_brute
    "q_knn_sq8" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         p AS (SELECT vec_id, v, list_min(v) AS vmin,
              (list_max(v) - list_min(v)) / 255.0 AS delta FROM c),
         dq AS (SELECT vec_id,
              CASE WHEN delta = 0 THEN list_transform(v, x -> vmin)
                ELSE list_transform(v,
                  x -> vmin + floor((x - vmin) / delta + 0.5) * delta) END AS vq
           FROM p),
         q AS (SELECT vec_id AS query_id, v AS qe FROM c WHERE vec_id < 5),
         scored AS (SELECT q.query_id, dq.vec_id,
              list_cosine_similarity(dq.vq, q.qe) AS s
           FROM dq, q WHERE dq.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",

    // SQ8 candidates + exact re-rank on the planted-copy corpus ==
    // exhaustive cosine top-10 over the same corpus (the 10 copies at
    // cosine 1.0 provably survive the 50-candidate compressed cut)
    "q_knn_sq8_rerank" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id, embedding FROM embeddings
               UNION ALL
               SELECT 100000 + q.query_id * 10 + j.j AS vec_id, q.qe AS embedding
               FROM q, (SELECT unnest(range(10)) AS j) j),
         scored AS (SELECT q.query_id, c.vec_id,
              list_cosine_similarity(c.embedding::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM c, q WHERE c.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",

    // hard negatives under the planted-twin construction: the only
    // cosine-≥-0.9 pairs are (v, v+100000), so the query's near-dup
    // cluster is exactly {query_id, query_id + 100000} and the
    // cluster anti-filter reduces to two id exclusions
    "q_knn_hard_negatives" ->
      """WITH c AS (SELECT vec_id, embedding FROM embeddings
           UNION ALL SELECT vec_id + 100000, embedding FROM embeddings),
         q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         scored AS (SELECT q.query_id, c.vec_id,
              list_cosine_similarity(c.embedding::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM c, q WHERE c.vec_id != q.query_id AND c.vec_id != q.query_id + 100000),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, rk::BIGINT AS neg_rank, vec_id, round(s, 6) AS score
         FROM ranked WHERE rk <= 10 ORDER BY query_id, neg_rank""",

    // triplets: the planted twin IS each query's only cluster-mate,
    // so positive_id = query_id + 100000 analytically; negatives are
    // the q_knn_hard_negatives ranking verbatim
    "q_pipeline_contrastive" ->
      """WITH c AS (SELECT vec_id, embedding FROM embeddings
           UNION ALL SELECT vec_id + 100000, embedding FROM embeddings),
         q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         scored AS (SELECT q.query_id, c.vec_id,
              list_cosine_similarity(c.embedding::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM c, q WHERE c.vec_id != q.query_id AND c.vec_id != q.query_id + 100000),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, query_id + 100000 AS positive_id,
           rk::BIGINT AS neg_rank, vec_id, round(s, 6) AS score
         FROM ranked WHERE rk <= 10 ORDER BY query_id, neg_rank""",

    // the 3 greedy MMR selections unrolled: candidate set = the
    // q_knn_brute top-10 with rounded scores, then per step the
    // (v DESC, score DESC, vec_id) argmax with
    // v = λ·score − (1−λ)·max cos(c, selected), λ = 0.5
    // margin replay: brute cross top-4 both directions, k-NN averages
    // via rank-ordered list_reduce folds (first-element seed == the
    // Spark side's 0.0 seed, IEEE-exact), mutual best-margin join
    "q_mine_bitext" ->
      """WITH x AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id % 2 = 0 AND vec_id < 5000),
         y AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id % 2 = 1 AND vec_id < 5000),
         sc AS (SELECT x.vec_id AS xi, y.vec_id AS yi,
             list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) AS s
           FROM x, y),
         fr AS (SELECT xi, yi, s,
             row_number() OVER (PARTITION BY xi ORDER BY s DESC, yi) AS rk FROM sc),
         fk AS (SELECT * FROM fr WHERE rk <= 4),
         ax AS (SELECT xi, list_reduce(list(s ORDER BY rk), (a, b) -> a + b)
             / count(*) AS avx FROM fk GROUP BY xi),
         br AS (SELECT xi, yi, s,
             row_number() OVER (PARTITION BY yi ORDER BY s DESC, xi) AS rk FROM sc),
         bk AS (SELECT * FROM br WHERE rk <= 4),
         ay AS (SELECT yi, list_reduce(list(s ORDER BY rk), (a, b) -> a + b)
             / count(*) AS avy FROM bk GROUP BY yi),
         cand AS (SELECT DISTINCT xi, yi, s FROM (
             SELECT xi, yi, s FROM fk UNION ALL SELECT xi, yi, s FROM bk)),
         mg AS (SELECT c.xi, c.yi, c.s, c.s / ((ax.avx + ay.avy) / 2) AS m
           FROM cand c JOIN ax USING (xi) JOIN ay USING (yi)),
         bx AS (SELECT xi, yi FROM (SELECT xi, yi,
             row_number() OVER (PARTITION BY xi ORDER BY m DESC, yi) AS r FROM mg)
           WHERE r = 1),
         byy AS (SELECT xi, yi FROM (SELECT xi, yi,
             row_number() OVER (PARTITION BY yi ORDER BY m DESC, xi) AS r FROM mg)
           WHERE r = 1)
         SELECT mg.xi AS id1, mg.yi AS id2,
           round(mg.s, 6) AS score, round(mg.m, 6) AS margin
         FROM mg JOIN bx USING (xi, yi) JOIN byy USING (xi, yi)
         WHERE mg.m >= 1.0 ORDER BY id1""",

    "q_knn_mmr" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         scored AS (SELECT q.query_id, e.vec_id,
              list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS s, e.embedding
           FROM embeddings e, q WHERE e.vec_id != q.query_id),
         cand AS (SELECT query_id, vec_id, round(s, 6) AS score, embedding FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
             FROM scored) WHERE rk <= 10),
         s1 AS (SELECT query_id, vec_id, score, embedding FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS r
             FROM cand) WHERE r = 1),
         c2 AS (SELECT c.query_id, c.vec_id, c.score, c.embedding,
             0.5 * c.score - 0.5 * list_cosine_similarity(c.embedding::DOUBLE[], s1.embedding::DOUBLE[]) AS v
           FROM cand c JOIN s1 USING (query_id) WHERE c.vec_id != s1.vec_id),
         s2 AS (SELECT query_id, vec_id, score, embedding FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY v DESC, score DESC, vec_id) AS r
             FROM c2) WHERE r = 1),
         c3 AS (SELECT c.query_id, c.vec_id, c.score,
             0.5 * c.score - 0.5 * greatest(
               list_cosine_similarity(c.embedding::DOUBLE[], s1.embedding::DOUBLE[]),
               list_cosine_similarity(c.embedding::DOUBLE[], s2.embedding::DOUBLE[])) AS v
           FROM cand c JOIN s1 USING (query_id) JOIN s2 USING (query_id)
           WHERE c.vec_id != s1.vec_id AND c.vec_id != s2.vec_id),
         s3 AS (SELECT query_id, vec_id, score FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY v DESC, score DESC, vec_id) AS r
             FROM c3) WHERE r = 1)
         SELECT query_id, mmr_rank, vec_id, score FROM (
           SELECT query_id, 1 AS mmr_rank, vec_id, score FROM s1
           UNION ALL SELECT query_id, 2, vec_id, score FROM s2
           UNION ALL SELECT query_id, 3, vec_id, score FROM s3)
         ORDER BY query_id, mmr_rank""",

    "q_knn_lsh_twins" ->
      """WITH corpus AS (
           SELECT vec_id, embedding FROM embeddings
           UNION ALL
           SELECT vec_id + 100000, embedding FROM embeddings),
         q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         scored AS (SELECT q.query_id, e.vec_id,
              list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM corpus e, q WHERE e.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 1
         ORDER BY query_id, vec_id""",

    // JL projection: the sign matrix is embedded as SQL literals
    // (±0.25 exact dyadic floats, bit-identical in both engines)
    // lockstep unnest pairs each element with its 0-based dimension;
    // round(avg, 6) absorbs the engines' summation-order ulp
    "q_vec_pool" ->
      """WITH x AS (SELECT vec_id // 10 AS group_id,
             unnest(range(len(embedding)))::BIGINT AS j,
             unnest(embedding)::DOUBLE AS v
           FROM embeddings)
         SELECT group_id, j, round(avg(v), 6) AS mean_v, count(*)::BIGINT AS n_vecs
         FROM x GROUP BY group_id, j ORDER BY group_id, j""",

    "q_vec_project" -> {
      val rows = Similarity.jlPlanes(16, 64).zipWithIndex.map { case (r, j) =>
        s"($j, [${r.mkString(", ")}]::DOUBLE[])"
      }.mkString(", ")
      s"""WITH r(j, rv) AS (VALUES $rows)
         SELECT e.vec_id, j::BIGINT AS j,
           round(list_dot_product(e.embedding::DOUBLE[], rv), 6) AS proj
         FROM embeddings e, r ORDER BY vec_id, j"""
    },

    // full probe == exhaustive: same oracle as q_knn_brute
    "q_knn_ivf_full" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         scored AS (SELECT q.query_id, e.vec_id,
              list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM embeddings e, q WHERE e.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",

    // trigger-maintained persisted index at full probe == exhaustive —
    // same oracle as q_knn_ivf_full
    "q_knn_ivf_trigger" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         scored AS (SELECT q.query_id, e.vec_id,
              list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM embeddings e, q WHERE e.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",

    // refreshed-quantizer index served through a reconstructed
    // trigger at full probe == exhaustive — same oracle as
    // q_knn_ivf_trigger (full probe is exact under ANY quantizer)
    "q_knn_ivf_refresh" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         scored AS (SELECT q.query_id, e.vec_id,
              list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM embeddings e, q WHERE e.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",

    // recall-contract-derived probe depth at floor 1.0 == exhaustive
    // on the calibrated queries — same oracle again
    "q_knn_ivf_atrecall" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         scored AS (SELECT q.query_id, e.vec_id,
              list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM embeddings e, q WHERE e.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",

    // compacted-generation index at full probe == exhaustive —
    // same oracle as q_knn_ivf_trigger
    "q_knn_ivf_compact" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         scored AS (SELECT q.query_id, e.vec_id,
              list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM embeddings e, q WHERE e.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",

    // any quantizer at full probe == exhaustive — same oracle
    "q_knn_ivf_trained" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         scored AS (SELECT q.query_id, e.vec_id,
              list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM embeddings e, q WHERE e.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",

    // base-plus-delta index at full probe == exhaustive — same oracle
    "q_knn_ivf_delta" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         scored AS (SELECT q.query_id, e.vec_id,
              list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM embeddings e, q WHERE e.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
              row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",

    // planted-codeword PQ: reconstruct the same corpus (donor nibble
    // selection is pure integer arithmetic) and rank by exact dot —
    // lossless encoding makes ADC == dot, see the queries-side note
    "q_knn_pq_exact" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
         donors AS (SELECT vec_id AS k, embedding FROM e WHERE vec_id < 16),
         corpus AS (
           SELECT v.vec_id, flatten(list(d.embedding[t.j*8+1 : t.j*8+8] ORDER BY t.j)) AS emb
           FROM e v CROSS JOIN range(0, 8) t(j)
           JOIN donors d ON d.k = (((v.vec_id * 2654435761) % 4294967296) >> (4*t.j)) & 15
           GROUP BY v.vec_id),
         q AS (SELECT vec_id AS query_id, emb AS qe FROM corpus WHERE vec_id < 5),
         scored AS (SELECT q.query_id, c.vec_id,
             list_dot_product(c.emb::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM corpus c, q WHERE c.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
             row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",

    // PQ candidates + exact-dot re-rank on the lossless planted corpus
    // == exhaustive dot top-k (candidate metric == re-rank metric and
    // the lossless 50-cut provably contains the top-10) — identical
    // oracle to q_knn_pq_exact
    "q_knn_pq_rerank" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
         donors AS (SELECT vec_id AS k, embedding FROM e WHERE vec_id < 16),
         corpus AS (
           SELECT v.vec_id, flatten(list(d.embedding[t.j*8+1 : t.j*8+8] ORDER BY t.j)) AS emb
           FROM e v CROSS JOIN range(0, 8) t(j)
           JOIN donors d ON d.k = (((v.vec_id * 2654435761) % 4294967296) >> (4*t.j)) & 15
           GROUP BY v.vec_id),
         q AS (SELECT vec_id AS query_id, emb AS qe FROM corpus WHERE vec_id < 5),
         scored AS (SELECT q.query_id, c.vec_id,
             list_dot_product(c.emb::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM corpus c, q WHERE c.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
             row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",

    // full-probe non-residual IVF-PQ on the lossless planted corpus ==
    // exhaustive dot top-k — identical oracle to q_knn_pq_exact
    "q_knn_ivfpq_exact" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
         donors AS (SELECT vec_id AS k, embedding FROM e WHERE vec_id < 16),
         corpus AS (
           SELECT v.vec_id, flatten(list(d.embedding[t.j*8+1 : t.j*8+8] ORDER BY t.j)) AS emb
           FROM e v CROSS JOIN range(0, 8) t(j)
           JOIN donors d ON d.k = (((v.vec_id * 2654435761) % 4294967296) >> (4*t.j)) & 15
           GROUP BY v.vec_id),
         q AS (SELECT vec_id AS query_id, emb AS qe FROM corpus WHERE vec_id < 5),
         scored AS (SELECT q.query_id, c.vec_id,
             list_dot_product(c.emb::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM corpus c, q WHERE c.vec_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
             row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",

    "q_pipeline_corpus" ->
      """WITH t AS (SELECT doc_id, text, string_split(lower(trim(text)), ' ') AS ts FROM documents),
         s AS (SELECT doc_id, text, ts, len(ts)::BIGINT AS n_tokens,
             round(least(len(ts) / 100.0, 1.0) * 0.3
               + (len(list_distinct(ts))::DOUBLE / len(ts)) * 0.4
               + (1.0 - len(list_filter(ts, x -> x IN ('the','a','of','and')))::DOUBLE / len(ts)) * 0.3, 6) AS quality,
             CASE WHEN len(list_filter(ts, x -> x IN ('der','die','das','und','ist')))
                       > greatest(len(list_filter(ts, x -> x IN ('the','a','of','and','is'))),
                                  len(list_filter(ts, x -> x IN ('el','la','de','que','y')))) THEN 'de'
                  WHEN len(list_filter(ts, x -> x IN ('el','la','de','que','y')))
                       > len(list_filter(ts, x -> x IN ('the','a','of','and','is'))) THEN 'es'
                  WHEN len(list_filter(ts, x -> x IN ('the','a','of','and','is'))) > 0 THEN 'en'
                  ELSE 'und' END AS lang
           FROM t),
         f AS (SELECT * FROM s WHERE lang = 'en' AND quality >= 0.6),
         canon AS (SELECT * FROM f WHERE doc_id IN (
             SELECT min(doc_id) FROM f GROUP BY md5(lower(trim(text))))),
         tok AS (SELECT doc_id, CASE WHEN len(ts) >= 3
                 THEN list_distinct(list_transform(range(1, len(ts) - 1),
                   i -> array_to_string(ts[i:i+2], ' ')))
                 ELSE [array_to_string(ts, ' ')] END AS shs FROM canon),
         sh AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS sng FROM tok),
         pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2
           FROM sh a JOIN sh b ON a.sng = b.sng AND a.doc_id < b.doc_id
           GROUP BY 1, 2
           HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.4),
         survivors AS (SELECT * FROM canon WHERE doc_id NOT IN (SELECT id2 FROM pairs))
         SELECT count(*)::BIGINT AS n_docs, round(avg(quality), 6) AS avg_quality,
           sum(n_tokens)::BIGINT AS total_tokens
         FROM survivors""",

    // connected components over the q_dedup_jaccard edge set: DuckDB
    // walks reachability with a recursive CTE; component id = min
    // reachable doc id (singletons map to themselves)
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE
         $CcLabelCte
         SELECT doc_id, cluster_id FROM lab ORDER BY doc_id""",

    // round-trip is identity, so the oracle is the original table
    "q_io_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
         ORDER BY doc_id""",

    "q_report_sources" ->
      """WITH d AS (SELECT doc_id, source, text,
             string_split(lower(trim(text)), ' ') AS ts FROM documents),
         lang AS (SELECT doc_id,
             CASE WHEN s_de > greatest(s_en, s_es) THEN 'de'
                  WHEN s_es > s_en THEN 'es'
                  WHEN s_en > 0 THEN 'en' ELSE 'und' END AS lang_pred
           FROM (SELECT doc_id,
               len(list_filter(ts, x -> x IN ('the','a','of','and','is'))) AS s_en,
               len(list_filter(ts, x -> x IN ('el','la','de','que','y'))) AS s_es,
               len(list_filter(ts, x -> x IN ('der','die','das','und','ist'))) AS s_de
             FROM d))
         SELECT d.source, count(*)::BIGINT AS n_docs,
           count(DISTINCT md5(lower(trim(text))))::BIGINT AS n_distinct_texts,
           sum(len(ts))::BIGINT AS total_tokens,
           round(avg(len(ts)), 6) AS avg_tokens,
           sum(CASE WHEN lang_pred = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en
         FROM d JOIN lang USING (doc_id)
         GROUP BY d.source ORDER BY d.source""",

    // ROLLUP replay: DuckDB's GROUPING() has the same 0/1 convention
    "q_report_rollup" ->
      """SELECT source, lang, count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS n_chars,
           grouping(source)::BIGINT AS g_source, grouping(lang)::BIGINT AS g_lang
         FROM documents GROUP BY ROLLUP (source, lang)
         ORDER BY g_source, g_lang, source, lang""",

    // survivors = per-component argmax(n_chars), ties lowest id
    "q_dedup_corpus_best" ->
      s"""WITH RECURSIVE
         $CcLabelCte,
         rk AS (SELECT doc.doc_id, doc.source, doc.n_chars,
             row_number() OVER (PARTITION BY lab.cluster_id
               ORDER BY doc.n_chars DESC, doc.doc_id) AS rk
           FROM documents doc JOIN lab USING (doc_id))
         SELECT doc_id, source, n_chars FROM rk WHERE rk = 1
         ORDER BY doc_id""",

    // distributed two-phase global rank == the plain window rank
    "q_pack_shards" ->
      """WITH t AS (SELECT doc_id,
             len(string_split(lower(trim(text)), ' '))::BIGINT AS n_tokens
           FROM documents),
         r AS (SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rank FROM t)
         SELECT doc_id, n_tokens, rank, (rank - 1) % 8 AS shard FROM r
         ORDER BY doc_id""",

    // cluster-level salted-hash split over the same component labels
    "q_split_leakage" ->
      s"""WITH RECURSIVE
         $CcLabelCte
         SELECT doc_id, cluster_id,
           CASE WHEN substring(md5('graft:' || cluster_id), 1, 8)
                  < '${Sampling.hexThreshold(0.8)}' THEN 'train'
                WHEN substring(md5('graft:' || cluster_id), 1, 8)
                  < '${Sampling.hexThreshold(0.9)}' THEN 'val'
                ELSE 'test' END AS split
         FROM lab ORDER BY doc_id""",

    // survivors = docs equal to their component's min reachable id
    "q_dedup_corpus" ->
      s"""WITH RECURSIVE
         $CcLabelCte
         SELECT d.doc_id, d.source, d.n_chars FROM documents d
         JOIN lab ON lab.doc_id = d.doc_id AND lab.cluster_id = d.doc_id
         ORDER BY d.doc_id""",

    "q_pack_manifest" ->
      """WITH t AS (SELECT doc_id, len(string_split(lower(trim(text)), ' '))::BIGINT AS n_tokens
           FROM documents),
         c AS (SELECT doc_id, n_tokens,
             (sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS start_offset
           FROM t)
         SELECT doc_id, n_tokens, start_offset,
           start_offset // 256 AS chunk_first,
           (start_offset + n_tokens - 1) // 256 AS chunk_last,
           (start_offset + n_tokens - 1) // 256 - start_offset // 256 + 1 AS n_chunks
         FROM c ORDER BY doc_id""",

    "q_pack_chunks" ->
      """WITH t AS (SELECT doc_id, len(string_split(lower(trim(text)), ' '))::BIGINT AS n_tokens
           FROM documents),
         c AS (SELECT doc_id, n_tokens,
             (sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS start_offset
           FROM t),
         m AS (SELECT doc_id, n_tokens, start_offset,
             start_offset // 256 AS cf, (start_offset + n_tokens - 1) // 256 AS cl
           FROM c)
         SELECT r.chunk_id, doc_id,
           greatest(r.chunk_id * 256, start_offset) - start_offset AS tok_start,
           least((r.chunk_id + 1) * 256, start_offset + n_tokens) - start_offset AS tok_end
         FROM m, LATERAL (SELECT unnest(range(cf, cl + 1)) AS chunk_id) r
         ORDER BY chunk_id, doc_id""",

    "q_select_quality" ->
      """WITH t AS (SELECT doc_id, source, string_split(lower(trim(text)), ' ') AS ts FROM documents),
         s AS (SELECT doc_id, source,
             round(least(len(ts) / 100.0, 1.0) * 0.3
               + (len(list_distinct(ts))::DOUBLE / len(ts)) * 0.4
               + (1.0 - len(list_filter(ts, x -> x IN ('the','a','of','and')))::DOUBLE / len(ts)) * 0.3, 6) AS quality
           FROM t),
         r AS (SELECT doc_id, source, quality,
             row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rk
           FROM s)
         SELECT doc_id, source, quality FROM r WHERE rk <= 5 ORDER BY doc_id""",

    // the oracle re-derives the rates from the same totals and builds
    // identical hex thresholds (printf '%08x' == the Scala helper; the
    // double arithmetic is the same IEEE divide/min/multiply/floor)
    "q_sample_budget" ->
      """WITH t AS (SELECT doc_id, source, len(string_split(lower(trim(text)), ' '))::BIGINT AS n_tokens
           FROM documents),
         tot AS (SELECT source, sum(n_tokens)::BIGINT AS tt FROM t GROUP BY source),
         b(source, budget) AS (VALUES ('src0', 1000000.0), ('src5', 600.0), ('src6', 300.0)),
         r AS (SELECT b.source,
             CASE WHEN least(1.0, budget / greatest(tt, 1)) >= 1.0 THEN 'g0000000'
                  ELSE printf('%08x', CAST(floor(least(1.0, budget / greatest(tt, 1)) * 4294967296) AS BIGINT)) END AS thr
           FROM b JOIN tot USING (source))
         SELECT t.doc_id, t.source FROM t JOIN r USING (source)
         WHERE substr(md5('graft:' || CAST(t.doc_id AS VARCHAR)), 1, 8) < r.thr
         ORDER BY t.doc_id""",

    // temperature mixing: the α-power/normalization arithmetic is
    // replayed in SQL with the same expression shape (share → pow →
    // normalize → budget rate → hex threshold); the threshold
    // discretization to 2^-32 absorbs sub-ulp engine differences.
    // z is an ORDERED left fold over source-sorted domains (recursive
    // CTE), the exact summation order the engine's driver-side fold
    // uses — an unordered sum(pw) could differ in the last ulp and
    // flip a threshold sitting exactly on a 2^-32 grid boundary
    "q_sample_temperature" ->
      """WITH RECURSIVE t AS (SELECT doc_id, source,
             len(string_split(lower(trim(text)), ' '))::BIGINT AS n_tokens
           FROM documents),
         tot AS (SELECT source, sum(n_tokens)::BIGINT AS tt FROM t
           GROUP BY source HAVING sum(n_tokens) > 0),
         g AS (SELECT sum(tt)::BIGINT AS gt FROM tot),
         p AS (SELECT source, tt,
             sqrt(tt::DOUBLE / (SELECT gt FROM g)) AS pw FROM tot),
         p2 AS (SELECT source, tt, pw, row_number() OVER (ORDER BY source) AS i FROM p),
         zrec AS (
           SELECT 0::BIGINT AS i, 0.0::DOUBLE AS acc
           UNION ALL
           SELECT p2.i, zrec.acc + p2.pw FROM zrec JOIN p2 ON p2.i = zrec.i + 1),
         z AS (SELECT acc AS z FROM zrec ORDER BY i DESC LIMIT 1),
         r AS (SELECT source,
             CASE WHEN least(1.0, pw / (SELECT z FROM z) * 15000.0 / tt) >= 1.0
                  THEN 'g0000000'
                  ELSE printf('%08x', CAST(floor(least(1.0,
                    pw / (SELECT z FROM z) * 15000.0 / tt) * 4294967296) AS BIGINT)) END AS thr
           FROM p)
         SELECT t.doc_id, t.source, t.n_tokens FROM t JOIN r USING (source)
         WHERE substr(md5('graft:' || CAST(t.doc_id AS VARCHAR)), 1, 8) < r.thr
         ORDER BY t.doc_id""",

    "q_sample_weighted" -> {
      val vals = SampleRates.toSeq.sortBy(_._1)
        .map { case (d, r) => s"('$d', '${Sampling.hexThreshold(r)}')" }
        .mkString(", ")
      s"""WITH r(source, thr) AS (VALUES $vals)
         SELECT d.doc_id, d.source FROM documents d LEFT JOIN r USING (source)
         WHERE substr(md5('graft:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
               < coalesce(thr, '${Sampling.hexThreshold(0.3)}')
         ORDER BY d.doc_id"""
    },

    "q_sample_cellcap" -> {
      val cellSql = (0 until 5)
        .map(i => s"(CASE WHEN embedding[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH e AS (SELECT vec_id, label, ($cellSql)::BIGINT AS cell FROM embeddings),
         r AS (SELECT vec_id, cell, label, row_number() OVER (PARTITION BY cell
             ORDER BY substr(md5('graft:' || CAST(vec_id AS VARCHAR)), 1, 16), vec_id) AS rk
           FROM e)
         SELECT vec_id, cell, label FROM r WHERE rk <= 8 ORDER BY vec_id"""
    },

    "q_sample_dsir" ->
      """WITH d AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
             FROM documents WHERE text IS NOT NULL),
         f0 AS (SELECT doc_id, unnest(ts) AS f FROM d
           UNION ALL
           SELECT doc_id, unnest(CASE WHEN len(ts) >= 2 THEN list_transform(range(1, len(ts)),
               i -> array_to_string(ts[i:i+1], ' ')) ELSE [] END) AS f FROM d),
         feat AS (SELECT doc_id, ('0x' || substr(md5(f), 1, 8))::BIGINT % 1024 AS b FROM f0),
         ct AS (SELECT b, count(*)::BIGINT AS c FROM feat JOIN documents USING (doc_id)
           WHERE lang = 'en' GROUP BY b),
         cr AS (SELECT b, count(*)::BIGINT AS c FROM feat GROUP BY b),
         tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM ct) AS tt, (SELECT sum(c) FROM cr) AS tr),
         ratio AS (SELECT cr.b,
             ln((coalesce(ct.c, 0) + 1)::DOUBLE / ((SELECT tt FROM tot) + 1024))
           - ln((cr.c + 1)::DOUBLE / ((SELECT tr FROM tot) + 1024)) AS logr
           FROM cr LEFT JOIN ct USING (b)),
         sc AS (SELECT feat.doc_id, count(*)::BIGINT AS n_features, sum(logr) AS logw
           FROM feat JOIN ratio USING (b) GROUP BY feat.doc_id),
         sel AS (SELECT doc_id, n_features, logw FROM sc
           ORDER BY logw - ln(-ln((('0x' || substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
             / 4294967296.0)) DESC, doc_id LIMIT 100)
         SELECT doc_id, n_features, round(logw, 6) AS logw FROM sel ORDER BY doc_id""",

    // the classifier's 3 GD iterations unrolled: w0 = 0 ⇒ p = 0.5,
    // then two (margin → residual → mean gradient) rounds; identical
    // add-one-free logistic math to Classifier.trainQuality at lr = 1
    "q_quality_classifier" ->
      """WITH d AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
             FROM documents WHERE text IS NOT NULL),
         f0 AS (SELECT doc_id, unnest(ts) AS f FROM d
           UNION ALL
           SELECT doc_id, unnest(CASE WHEN len(ts) >= 2 THEN list_transform(range(1, len(ts)),
               i -> array_to_string(ts[i:i+1], ' ')) ELSE [] END) AS f FROM d),
         feat AS (SELECT doc_id, ('0x' || substr(md5(f), 1, 8))::BIGINT % 1024 AS b FROM f0),
         cnt AS (SELECT doc_id, b, count(*)::DOUBLE AS c FROM feat GROUP BY 1, 2),
         lbl AS (SELECT dd.doc_id, CASE WHEN dd.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
           FROM documents dd JOIN (SELECT DISTINCT doc_id FROM cnt) USING (doc_id)),
         n AS (SELECT count(*)::DOUBLE AS n FROM lbl),
         r1 AS (SELECT doc_id, y - 0.5 AS r FROM lbl),
         w1 AS (SELECT b, sum(c * r) / (SELECT n FROM n) AS w
           FROM cnt JOIN r1 USING (doc_id) GROUP BY b),
         b1 AS (SELECT sum(r) / (SELECT n FROM n) AS bias FROM r1),
         m2 AS (SELECT cnt.doc_id, (SELECT bias FROM b1) + sum(c * w1.w) AS mg
           FROM cnt JOIN w1 USING (b) GROUP BY cnt.doc_id),
         r2 AS (SELECT l.doc_id, l.y - 1 / (1 + exp(-m2.mg)) AS r
           FROM lbl l JOIN m2 USING (doc_id)),
         w2 AS (SELECT w1.b, w1.w + g.g AS w FROM w1 LEFT JOIN (
             SELECT b, sum(c * r) / (SELECT n FROM n) AS g
             FROM cnt JOIN r2 USING (doc_id) GROUP BY b) g USING (b)),
         b2 AS (SELECT (SELECT bias FROM b1)
             + (SELECT sum(r) / (SELECT n FROM n) FROM r2) AS bias),
         m3 AS (SELECT cnt.doc_id, (SELECT bias FROM b2) + sum(c * w2.w) AS mg
           FROM cnt JOIN w2 USING (b) GROUP BY cnt.doc_id),
         r3 AS (SELECT l.doc_id, l.y - 1 / (1 + exp(-m3.mg)) AS r
           FROM lbl l JOIN m3 USING (doc_id)),
         w3 AS (SELECT w2.b, w2.w + g.g AS w FROM w2 LEFT JOIN (
             SELECT b, sum(c * r) / (SELECT n FROM n) AS g
             FROM cnt JOIN r3 USING (doc_id) GROUP BY b) g USING (b)),
         b3 AS (SELECT (SELECT bias FROM b2)
             + (SELECT sum(r) / (SELECT n FROM n) FROM r3) AS bias),
         ms AS (SELECT cnt.doc_id, (SELECT bias FROM b3) + sum(c * w3.w) AS mg
           FROM cnt JOIN w3 USING (b) GROUP BY cnt.doc_id),
         nf AS (SELECT doc_id, count(*)::BIGINT AS n_features FROM feat GROUP BY 1)
         SELECT nf.doc_id, nf.n_features, round(1 / (1 + exp(-ms.mg)), 6) AS score
         FROM ms JOIN nf USING (doc_id) ORDER BY doc_id""",

    "q_text_heavy_ngrams" ->
      """WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ts
             FROM documents WHERE text IS NOT NULL),
         g AS (SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(ts) >= 3 THEN list_transform(range(1, len(ts) - 1),
               i -> array_to_string(ts[i:i+2], ' '))
             ELSE [array_to_string(ts, ' ')] END)) AS gram FROM t)
         SELECT gram, count(*)::BIGINT AS doc_freq FROM g GROUP BY gram
         ORDER BY doc_freq DESC, gram LIMIT 20""",

    "q_pipeline_pretrain" -> {
      val vals = SampleRates.toSeq.sortBy(_._1)
        .map { case (d, r) => s"('$d', '${Sampling.hexThreshold(r)}')" }
        .mkString(", ")
      s"""WITH RECURSIVE
         t0 AS (SELECT doc_id, source, text, string_split(lower(trim(text)), ' ') AS ts FROM documents),
         g AS (SELECT doc_id, source, text, ts,
             CASE WHEN len(ts) >= 3 THEN list_transform(range(1, len(ts) - 1),
               i -> array_to_string(ts[i:i+2], ' ')) ELSE [] END AS g3
           FROM t0),
         topw AS (SELECT doc_id, max(c) AS topc FROM (
             SELECT doc_id, w, count(*) AS c FROM (
               SELECT doc_id, unnest(ts) AS w FROM t0) GROUP BY 1, 2)
           GROUP BY 1),
         f AS (SELECT g.doc_id, g.source, g.text, g.ts FROM g JOIN topw USING (doc_id)
           WHERE round(topw.topc::DOUBLE / len(ts), 6) <= 0.2
             AND (CASE WHEN len(g3) > 0
                  THEN round((len(g3) - len(list_distinct(g3)))::DOUBLE / len(g3), 6)
                  ELSE 0.0 END) <= 0.3),
         d AS (SELECT doc_id, CASE WHEN len(ts) >= 3
               THEN list_distinct(list_transform(range(1, len(ts) - 1),
                 i -> array_to_string(ts[i:i+2], ' ')))
               ELSE [array_to_string(ts, ' ')] END AS shs FROM f),
         sh AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS s FROM d),
         pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2
           HAVING count(*)::DOUBLE / (any_value(a.sz) + any_value(b.sz) - count(*)) >= 0.4),
         edges AS (SELECT id1 AS u, id2 AS v FROM pairs
                   UNION ALL SELECT id2, id1 FROM pairs),
         reach(a, b) AS (
           SELECT doc_id, doc_id FROM f
           UNION
           SELECT r.a, e.v FROM reach r JOIN edges e ON e.u = r.b),
         lab AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
         kept AS (SELECT f.doc_id, f.source, f.ts FROM f
           JOIN lab ON lab.doc_id = f.doc_id AND lab.cluster_id = f.doc_id),
         rates(source, thr) AS (VALUES $vals),
         mixed AS (SELECT kept.doc_id, len(kept.ts)::BIGINT AS n_tokens
           FROM kept LEFT JOIN rates USING (source)
           WHERE substr(md5('graft:' || CAST(kept.doc_id AS VARCHAR)), 1, 8)
                 < coalesce(thr, '${Sampling.hexThreshold(0.3)}')),
         m AS (SELECT doc_id, n_tokens,
             (sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS so
           FROM mixed)
         SELECT count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS total_tokens,
           (max((so + n_tokens - 1) // 256) + 1)::BIGINT AS n_chunks
         FROM m"""
    },

    "q_multimodal_features" ->
      """WITH f AS (SELECT doc_id, length(text)::BIGINT AS n_bytes,
            list_aggregate(list_transform(range(1, least(length(text), 16) + 1),
              i -> ascii(text[i:i])), 'sum')::BIGINT AS header_sum
          FROM documents)
         SELECT doc_id, n_bytes, header_sum,
            64 + header_sum % 512 AS width, 64 + (header_sum // 2) % 512 AS height
         FROM f ORDER BY doc_id""",

    // synthetic-codec replay: pixel k = ascii of byte k (the fixtures
    // are ASCII, so char == byte), 16-bin histogram as DOUBLE-exact
    // small-integer counts, then the q_knn_brute cosine top-k pattern
    "q_multimodal_similarity" ->
      """WITH m AS (SELECT doc_id, text FROM documents
           WHERE text IS NOT NULL AND length(text) > 0),
         h AS (SELECT doc_id,
             list_transform(range(0, 16), b ->
               CAST(len(list_filter(
                 list_transform(range(1, length(text) + 1), i -> ascii(text[i:i])),
                 p -> p // 16 = b)) AS FLOAT)) AS embedding
           FROM m),
         q AS (SELECT doc_id AS query_id, embedding AS qe FROM h WHERE doc_id < 5),
         scored AS (SELECT q.query_id, h.doc_id AS vec_id,
             list_cosine_similarity(h.embedding::DOUBLE[], q.qe::DOUBLE[]) AS s
           FROM h, q WHERE h.doc_id != q.query_id),
         ranked AS (SELECT query_id, vec_id, s,
             row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
           FROM scored)
         SELECT query_id, vec_id, round(s, 6) AS score FROM ranked WHERE rk <= 10
         ORDER BY query_id, vec_id""",

    "q_multimodal_dedup" ->
      """WITH base AS (SELECT doc_id, text FROM documents
           WHERE text IS NOT NULL AND length(text) > 0),
         m AS (SELECT doc_id, text FROM base
           UNION ALL
           SELECT doc_id + 1000000, substring(text, 1, length(text) - 1) || '~'
           FROM base WHERE doc_id % 9 = 0),
         h AS (SELECT doc_id, i AS pos, md5(substring(text, 1 + i * cl, cl)) AS h
           FROM (SELECT doc_id, text, length(text) AS n,
                   CAST(ceil(length(text) / 8.0) AS INT) AS cl FROM m),
                LATERAL (SELECT unnest(range(0, 8)) AS i) r
           WHERE i * cl < n),
         p AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
             count(*)::BIGINT AS matching_chunks
           FROM h a JOIN h b ON a.pos = b.pos AND a.h = b.h AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id1, id2, matching_chunks FROM p
         WHERE matching_chunks >= 6 ORDER BY id1, id2""",

    "q_multimodal_frames" ->
      """WITH f AS (SELECT doc_id, length(text)::BIGINT AS n_bytes,
            list_aggregate(list_transform(range(1, least(length(text), 16) + 1),
              i -> ascii(text[i:i])), 'sum')::BIGINT AS header_sum
          FROM documents)
         SELECT doc_id, unnest(range(0, greatest(n_bytes // 100, 1))) AS frame_idx,
            header_sum + unnest(range(0, greatest(n_bytes // 100, 1))) AS frame_sig
         FROM f ORDER BY doc_id, frame_idx"""
  )
}
