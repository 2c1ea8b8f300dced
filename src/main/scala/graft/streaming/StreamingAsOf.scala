package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One buffered event: event-time second + numeric payload. `ts`
  * carries the watermarked event-time column through the typed
  * boundary — projecting it away would detach the watermark from the
  * flatMapGroupsWithState input and break event-time timeouts.
  */
private[streaming] case class AsOfEv(
    key: String, t: Long, isLeft: Boolean, vals: Seq[Double],
    ts: java.sql.Timestamp)

/** Per-key buffers: right rows still useful as match candidates, left
  * rows not yet safe to emit. Both are pruned by the event-time
  * watermark every firing, and a key that goes quiet gets one
  * compaction timeout, so steady-state state is the single anchor
  * quote per key — O(1) per key, O(live keys) total (the quote cache
  * a serving system holds anyway), never stream-length.
  */
private[streaming] case class AsOfState(
    rights: Seq[(Long, Seq[Double])], lefts: Seq[(Long, Seq[Double])])

private[streaming] case class AsOfOut(
    key: String, t: Long, leftVals: Seq[Double], rightVals: Option[Seq[Double]])

/** Stream-STREAM as-of join: enrich each left event (trade) with the
  * latest right event (quote) at-or-before its time, per key — the
  * streaming pair of [[graft.operators.TimeSeries.asofJoinBroadcast]]
  * / `asofJoinUnion` (reference semantics: uda/adjust walks prices
  * against the latest rate at-or-before, executor as-of pattern).
  *
  * Spark's native stream-stream joins express time-RANGE conditions
  * (every right row in an interval), not "the latest ≤ t", so this is
  * the documented custom-state case: `flatMapGroupsWithState` with
  * event-time timeout. Correctness rule: a left row emits only once
  * the watermark passes its event time STRICTLY — before that, an
  * earlier-or-equal right row could still arrive and change the
  * match (strict emission stays safe whether the runtime's late-row
  * filter is exclusive or inclusive of the watermark instant — the
  * current one drops rows AT it). Ties (right.t == left.t) are
  * visible to the left row, and
  * equal-time right rows resolve to the greatest (t, vals) tuple —
  * both exactly as the batch broadcast variant's sorted-array probe.
  *
  * Scale shape: one shuffle keyed by `key` (the same partitioning the
  * problem statement requires — a key's events must meet to be
  * ordered), per-key state bounded by the lateness window, emission
  * driven by either new data or the event-time timeout so quiet keys
  * still flush. Payloads are numeric (`Seq[Double]`) — dictionary-
  * encode strings upstream; market payloads (prices, sizes, rates)
  * are numeric already.
  */
object StreamingAsOf {

  /** @param left       streaming DataFrame with (`key`, `leftTime`, leftPayload…)
    * @param right      streaming DataFrame with (`key`, `rightTime`, rightPayload…)
    * @param key        shared string key column (symbol)
    * @param allowedLateness watermark delay on both inputs
    * @return streaming DataFrame (key, t, leftPayload…, rightPayload…)
    *         in append mode; right columns null when no quote ≤ t yet
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      leftPayload: Seq[String], rightPayload: Seq[String],
      allowedLateness: String = "10 minutes"): DataFrame = {
    require((leftPayload.toSet & rightPayload.toSet).isEmpty,
      "asofJoin: left/right payload column names must be disjoint — a " +
        s"shared name would silently overwrite (${leftPayload.toSet & rightPayload.toSet})")
    val spark = left.sparkSession
    import spark.implicits._

    def norm(df: DataFrame, t: String, payload: Seq[String], isLeft: Boolean) =
      df.select(col(key).as("key"), col(t).cast("long").as("t"),
          lit(isLeft).as("isLeft"),
          array(payload.map(c => col(c).cast("double")): _*).as("vals"))
        .withColumn("ts", timestamp_seconds(col("t")))
        .withWatermark("ts", allowedLateness)

    val unioned = norm(left, leftTime, leftPayload, isLeft = true)
      .unionByName(norm(right, rightTime, rightPayload, isLeft = false))
      .as[AsOfEv]

    val joined = unioned.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfState, AsOfOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: String, it: Iterator[AsOfEv], state: GroupState[AsOfState]) =>
          val st = state.getOption.getOrElse(AsOfState(Nil, Nil))
          val (newL, newR) = it.toSeq.partition(_.isLeft)
          val rights = st.rights ++ newR.map(e => (e.t, e.vals))
          val lefts = st.lefts ++ newL.map(e => (e.t, e.vals))
          // watermark in event-time seconds; 0 before the first advance
          val wmSec = state.getCurrentWatermarkMs() / 1000L
          // a left row is final only when wm passed it STRICTLY: a
          // right row at exactly t can still arrive at wm == t
          val (emit, pendL) = lefts.partition(_._1 < wmSec)
          val out = emit.sortBy(_._1).map { case (t, lv) =>
            val hits = rights.filter(_._1 <= t)
            val m = if (hits.isEmpty) None
              else Some(hits.maxBy(identity)(
                Ordering.Tuple2(Ordering.Long, Ordering.Implicits.seqOrdering[Seq, Double])))
            AsOfOut(k, t, lv, m.map(_._2))
          }
          // keep every right that could still match a future left
          // (arrivals are ≥ wm): all rights ≥ wm, plus the single best
          // one below it
          val (live, old) = rights.partition(_._1 >= wmSec)
          val anchor = if (old.isEmpty) Nil
            else Seq(old.maxBy(identity)(
              Ordering.Tuple2(Ordering.Long, Ordering.Implicits.seqOrdering[Seq, Double])))
          val next = AsOfState((anchor ++ live).distinct, pendL)
          if (next.rights.isEmpty && next.lefts.isEmpty) state.remove()
          else {
            state.update(next)
            if (pendL.nonEmpty)
              // fire again when the watermark passes the oldest pending
              // left so quiet keys flush without new data
              state.setTimeoutTimestamp((pendL.map(_._1).min + 1) * 1000L)
            else if (next.rights.size > 1)
              // no pending work, but quotes above the watermark: fire
              // once more after the newest one ages out so a key that
              // goes quiet still compacts to its single anchor quote
              state.setTimeoutTimestamp((next.rights.map(_._1).max + 1) * 1000L)
          }
          out.iterator
      }(Encoders.product[AsOfState], Encoders.product[AsOfOut])

    val base = joined.toDF()
    val withL = leftPayload.zipWithIndex.foldLeft(base) { case (d, (c, i)) =>
      d.withColumn(c, element_at(col("leftVals"), i + 1))
    }
    rightPayload.zipWithIndex.foldLeft(withL) { case (d, (c, i)) =>
      d.withColumn(c, element_at(col("rightVals"), i + 1))
    }.select((Seq(col("key").as(key), col("t")) ++
      (leftPayload ++ rightPayload).map(col)): _*)
  }
}
