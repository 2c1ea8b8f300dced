package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

private[streaming] case class EmaEv(
    key: String, t: Long, v: Double, ts: java.sql.Timestamp)

/** Running smoothing state + events not yet safe to fold. `ema` is
  * the indicator's whole memory (one double per key — it outlives
  * quiet periods the way a serving system's indicator cache does);
  * `pend` is bounded by the lateness horizon.
  */
private[streaming] case class EmaState(
    ema: Option[Double], pend: Seq[(Long, Double)])

private[streaming] case class EmaOut(key: String, t: Long, v: Double, ema: Double)

private[streaming] case class MacdState(
    ef: Option[Double], es: Option[Double], sig: Option[Double],
    pend: Seq[(Long, Double)])

private[streaming] case class MacdOut(
    key: String, t: Long, v: Double, macd: Double, signal: Double, hist: Double)

private[streaming] case class RsiState(
    lastV: Option[Double], ag: Option[Double], al: Option[Double],
    pend: Seq[(Long, Double)])

private[streaming] case class RsiOut(
    key: String, t: Long, v: Double, rsi: Option[Double])

/** Streaming indicator state — the live pair of the batch
  * [[org.apache.spark.sql.graft.EmaWindow]] recursion (and of the
  * indicators composed from it: Wilder smoothing, MACD).
  *
  * EMA is order-SENSITIVE: a late event changes every smoothed value
  * after it, so rows cannot fold as they arrive. Same discipline as
  * [[StreamingAsOf]]: buffer per key, fold-and-emit only the prefix
  * the watermark has passed STRICTLY (an equal-time event can still
  * arrive at wm == t), in (t, v) order so equal-second ties are
  * deterministic HERE — the batch window orders by epoch alone, so
  * its tie order is plan-dependent and the batch equivalence below is
  * exact only on tie-free series (distinct epochs per key, the bar
  * tables' shape). Late-but-inside-lateness events land in the right
  * position; later than that they are dropped by the watermark (the
  * documented bounded-state trade, as in LiveCandles).
  *
  * Scale shape: one shuffle on the key; the PENDING buffer is
  * lateness-bounded and flushes via event-time timeout even on quiet
  * keys; the running indicator doubles intentionally PERSIST per key
  * (an indicator cache — O(live keys) total, like the as-of join's
  * anchor quote). Under unbounded key churn that cache grows with
  * keys-ever-seen: bound the key domain upstream or restart from a
  * trimmed checkpoint; there is no per-key TTL in this API.
  * StreamingSpec pins equivalence with the batch window function on
  * a shared out-of-order, tie-free fixture.
  */
object LiveIndicators {

  /** Shared event projection: (key, t, v) + watermarked event time. */
  private def events(stream: DataFrame, key: String, timeCol: String,
      valueCol: String, allowedLateness: String) = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col(key).as("key"),
        col(timeCol).cast("long").as("t"),
        col(valueCol).cast("double").as("v"))
      .withColumn("ts", timestamp_seconds(col("t")))
      .withWatermark("ts", allowedLateness)
      .as[EmaEv]
  }

  /** The strict-watermark split: (finalized-in-order, still-pending).
    * One definition so the emission convention can never drift
    * between indicators.
    */
  private def finalized(pend: Seq[(Long, Double)],
      state: GroupState[_]): (Seq[(Long, Double)], Seq[(Long, Double)]) = {
    val wmSec = state.getCurrentWatermarkMs() / 1000L
    val (fin, keep) = pend.partition(_._1 < wmSec)
    (fin.sorted, keep)
  }

  /** Arm the flush timeout for the oldest pending row (strictly above
    * the current watermark by construction, since keep ≥ wm).
    */
  private def armFlush(keep: Seq[(Long, Double)], state: GroupState[_]): Unit =
    if (keep.nonEmpty)
      state.setTimeoutTimestamp((keep.map(_._1).min + 1) * 1000L)

  def ema(
      stream: DataFrame, key: String, timeCol: String, valueCol: String,
      n: Int, allowedLateness: String = "10 minutes"): DataFrame = {
    val alpha = 2.0 / (n + 1)
    val folded = events(stream, key, timeCol, valueCol, allowedLateness)
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[EmaState, EmaOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: String, it: Iterator[EmaEv], state: GroupState[EmaState]) =>
          val st = state.getOption.getOrElse(EmaState(None, Nil))
          val (fin, keep) = finalized(st.pend ++ it.map(e => (e.t, e.v)), state)
          var ema = st.ema
          val out = fin.map { case (t, v) =>
            val next = ema match {
              case Some(prev) => alpha * v + (1.0 - alpha) * prev
              case None => v
            }
            ema = Some(next)
            EmaOut(k, t, v, next)
          }
          state.update(EmaState(ema, keep))
          armFlush(keep, state)
          out.iterator
      }(Encoders.product[EmaState], Encoders.product[EmaOut])

    folded.toDF().select(col("key").as(key), col("t").as(timeCol),
      col("v").as(valueCol), col("ema").as("EMA"))
  }

  /** Live MACD(fast, slow, signal): the batch
    * [[graft.operators.Analytics.macd]] chain as ONE stateful fold —
    * three EMA doubles per key instead of three window passes, same
    * watermark-ordered discipline as [[ema]]. Emits
    * (MACD, MACDSignal, MACDHist) per finalized bar; the αs are the
    * same 2/(span+1) doubles, so values equal the batch chain
    * bit-for-bit on the same rows (StreamingSpec).
    */
  def macd(
      stream: DataFrame, key: String, timeCol: String, valueCol: String,
      fast: Int = 12, slow: Int = 26, signal: Int = 9,
      allowedLateness: String = "10 minutes"): DataFrame = {
    val aF = 2.0 / (fast + 1); val aS = 2.0 / (slow + 1); val aG = 2.0 / (signal + 1)
    val folded = events(stream, key, timeCol, valueCol, allowedLateness)
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[MacdState, MacdOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: String, it: Iterator[EmaEv], state: GroupState[MacdState]) =>
          val st = state.getOption.getOrElse(MacdState(None, None, None, Nil))
          val (fin, keep) = finalized(st.pend ++ it.map(e => (e.t, e.v)), state)
          var ef = st.ef; var es = st.es; var sig = st.sig
          def step(prev: Option[Double], a: Double, x: Double): Double =
            prev.map(p => a * x + (1.0 - a) * p).getOrElse(x)
          val out = fin.map { case (t, v) =>
            val nEf = step(ef, aF, v); val nEs = step(es, aS, v)
            val m = nEf - nEs
            val nSig = step(sig, aG, m)
            ef = Some(nEf); es = Some(nEs); sig = Some(nSig)
            MacdOut(k, t, v, m, nSig, m - nSig)
          }
          state.update(MacdState(ef, es, sig, keep))
          armFlush(keep, state)
          out.iterator
      }(Encoders.product[MacdState], Encoders.product[MacdOut])

    folded.toDF().select(col("key").as(key), col("t").as(timeCol),
      col("v").as(valueCol), col("macd").as("MACD"),
      col("signal").as("MACDSignal"), col("hist").as("MACDHist"))
  }

  /** Live Wilder RSI — the streaming pair of
    * [[graft.operators.Analytics.rsiWilder]]: per-key state carries
    * the previous close (the delta source) plus the two Wilder-
    * smoothed averages; null RSI on each key's first bar, 100 where
    * the loss average is zero, exactly the batch conventions.
    */
  def rsiWilder(
      stream: DataFrame, key: String, timeCol: String, valueCol: String,
      n: Int, allowedLateness: String = "10 minutes"): DataFrame = {
    val alpha = 1.0 / n
    val folded = events(stream, key, timeCol, valueCol, allowedLateness)
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[RsiState, RsiOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: String, it: Iterator[EmaEv], state: GroupState[RsiState]) =>
          val st = state.getOption.getOrElse(RsiState(None, None, None, Nil))
          val (fin, keep) = finalized(st.pend ++ it.map(e => (e.t, e.v)), state)
          var lastV = st.lastV; var ag = st.ag; var al = st.al
          def step(prev: Option[Double], x: Double): Double =
            prev.map(p => alpha * x + (1.0 - alpha) * p).getOrElse(x)
          val out = fin.map { case (t, v) =>
            val rsi = lastV.map { prev =>
              val d = v - prev
              ag = Some(step(ag, math.max(d, 0.0)))
              al = Some(step(al, math.max(-d, 0.0)))
              if (al.get == 0.0) 100.0
              else 100.0 - 100.0 / (1.0 + ag.get / al.get)
            }
            lastV = Some(v)
            RsiOut(k, t, v, rsi)
          }
          state.update(RsiState(lastV, ag, al, keep))
          armFlush(keep, state)
          out.iterator
      }(Encoders.product[RsiState], Encoders.product[RsiOut])

    folded.toDF().select(col("key").as(key), col("t").as(timeCol),
      col("v").as(valueCol), col("rsi").as("RSIW"))
  }
}
