package graft.streaming

import graft.catalog.BucketCatalog
import graft.core.CandleDuration
import graft.functions.Uda
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import java.util.concurrent.{ScheduledFuture, ScheduledThreadPoolExecutor, TimeUnit}
import scala.collection.mutable

/** TBK glob subscriptions (frontend/stream/stream.go:90-101): `*`
  * and `?` match within one '/'-separated level, like
  * glob.Compile(stream, '/').
  */
final class SubscriptionSet {
  // pattern → compiled regex: matching is the hot path (every push /
  // every fired row consults it), so compile once at subscribe time
  private val patterns = mutable.LinkedHashMap[String, scala.util.matching.Regex]()

  def subscribe(pattern: String): Unit = synchronized {
    patterns(pattern) = SubscriptionSet.globToRegex(pattern)
  }
  def unsubscribe(pattern: String): Unit = synchronized { patterns -= pattern }

  /** Atomically swap the whole set (a websocket subscriber's new
    * SubscribeMessage replaces its previous streams, stream.go:122-136).
    */
  def replaceAll(ps: Seq[String]): Unit = synchronized {
    patterns.clear()
    ps.foreach(p => patterns(p) = SubscriptionSet.globToRegex(p))
  }

  def subscribed(tbk: String): Boolean = synchronized {
    patterns.values.exists(_.matches(tbk))
  }

  /** Immutable snapshot of the compiled patterns — shippable inside a
    * task closure for partition-side delivery (scala Regex is
    * Serializable), no per-row recompilation.
    */
  def snapshot: Seq[scala.util.matching.Regex] = synchronized { patterns.values.toSeq }
}

object SubscriptionSet {
  private[graft] def globToRegex(glob: String): scala.util.matching.Regex = {
    val sb = new StringBuilder("^")
    glob.foreach {
      case '*' => sb.append("[^/]*")
      case '?' => sb.append("[^/]")
      case c if "\\.[]{}()+-^$|".contains(c) => sb.append("\\").append(c)
      case c => sb.append(c)
    }
    sb.append("$").toString.r
  }
}

/** Delivery bus: where pushed payloads go (websocket in the
  * reference, frontend/stream/stream.go:242-281; any sink here —
  * tests use a collecting bus, production would wrap a Kafka producer
  * or socket).
  */
trait PushBus {
  def push(tbk: String, payload: Map[String, Any]): Unit
}

/** Shelf with deadline semantics (contrib/stream/shelf/shelf.go:23-101):
  * stores at most one pending package per TBK; storing with the SAME
  * deadline replaces (cancels) the pending one so only the final
  * update of a window emits; the deadline expiry fires the handler
  * with whatever was last stored. Driver-side wall-clock timers — the
  * shelf is control-plane state, exactly like the reference's
  * per-package goroutines.
  */
final class Shelf(
    handler: (String, Map[String, Any]) => Unit,
    nowMs: () => Long = () => System.currentTimeMillis()) extends AutoCloseable {
  private case class Pkg(deadlineMs: Long, future: ScheduledFuture[_])
  private val timers = new ScheduledThreadPoolExecutor(1)
  timers.setRemoveOnCancelPolicy(true)
  private val pending = mutable.Map[String, Pkg]()

  def store(tbk: String, payload: Map[String, Any], deadlineMs: Long): Unit = synchronized {
    pending.get(tbk).foreach { p =>
      // same deadline = replacement within the same window: cancel so
      // we don't emit duplicates; different deadline = let the old
      // window's package still emit (shelf.go:40-55)
      if (p.deadlineMs == deadlineMs) p.future.cancel(false)
      pending.remove(tbk)
    }
    val delay = math.max(0L, deadlineMs - nowMs())
    val fut = timers.schedule(new Runnable {
      override def run(): Unit = {
        Shelf.this.synchronized { pending.remove(tbk) }
        handler(tbk, payload)
      }
    }, delay, TimeUnit.MILLISECONDS)
    pending(tbk) = Pkg(deadlineMs, fut)
  }

  def pendingKeys: Seq[String] = synchronized { pending.keys.toSeq }

  override def close(): Unit = timers.shutdownNow()
}

/** Stream trigger (contrib/stream/streamtrigger/streamtrigger.go:77-164):
  * after a write to a watched bucket, query the latest bar per touched
  * symbol (LAST 1 with end = batch tail — ONE grouped Spark job for
  * all symbols, not a per-symbol query loop) and
  *  - push immediately for timeframes <= 1Min,
  *  - shelve with deadline = Ceil(tail) (the window boundary) for
  *    coarser timeframes, so incomplete bars emit when their window
  *    closes.
  */
final class StreamTrigger(
    catalog: BucketCatalog,
    attGroup: String,
    bus: PushBus,
    subscriptions: SubscriptionSet,
    nowMs: () => Long = () => System.currentTimeMillis(),
    distributedBus: Option[PushBus with Serializable] = None) extends AutoCloseable {

  private val shelf = new Shelf((tbk, payload) => deliver(tbk, payload), nowMs)

  private def deliver(tbk: String, payload: Map[String, Any]): Unit =
    if (subscriptions.subscribed(tbk)) bus.push(tbk, payload)

  /** Called after a batch lands in (attGroup, timeframe); `touched`
    * carries the batch's (symbol, Epoch) rows.
    *
    * Delivery routing:
    *  - sub-minute timeframes with a `distributedBus`: payload maps
    *    are built and pushed inside `foreachPartition` — the driver
    *    never materializes the rows, and each executor partition
    *    pushes through its own serialized bus copy (the Kafka-producer
    *    / socket-pool shape). Subscription patterns ship as an
    *    immutable snapshot in the closure.
    *  - everything else funnels through a driver collect. This is a
    *    BOUNDED collect by contract: one row per touched symbol
    *    (reference design target ~16k symbols,
    *    docs/design/file_format_design.txt), i.e. control-plane
    *    payload, not data — and the shelf's deadline timers are
    *    one-place state that cannot be distributed without changing
    *    the reference's per-window replacement semantics
    *    (shelf.go:40-55).
    */
  def fire(timeframe: String, touched: DataFrame): Unit = {
    val tf = CandleDuration.parse(timeframe)
    val tails = touched.groupBy("symbol").agg(max(col(Uda.EpochCol)).as("__tail"))
    val base = catalog.readMulti(attGroup, timeframe).drop("timeframe", "year")
    val payloadCols = base.columns.filterNot(c => c == "symbol")
    // latest row per symbol with Epoch <= tail: one max_by struct agg
    val latest = base.join(broadcast(tails), Seq("symbol"))
      .filter(col(Uda.EpochCol) <= col("__tail"))
      .groupBy("symbol")
      .agg(max_by(struct(payloadCols.map(col): _*), Uda.timeKey(base)).as("__row"),
        max(col("__tail")).as("__tail"))
    (distributedBus, tf.approxSeconds <= 60L) match {
      case (Some(dbus), true) =>
        val pats = subscriptions.snapshot // compiled once, shipped compiled
        val cols = payloadCols.toSeq
        val ag = attGroup
        latest.foreachPartition { rows: Iterator[Row] =>
          rows.foreach { r =>
            val tbk = s"${r.getAs[String]("symbol")}/$timeframe/$ag"
            if (pats.exists(_.matches(tbk))) {
              val row = r.getAs[Row]("__row")
              dbus.push(tbk, cols.zipWithIndex.map { case (c, i) => c -> row.get(i) }.toMap)
            }
          }
        }
      case _ =>
        latest.collect().foreach { r =>
          val sym = r.getAs[String]("symbol")
          val row = r.getAs[Row]("__row")
          val tail = r.getAs[Long]("__tail")
          val payload = payloadCols.zipWithIndex.map { case (c, i) => c -> row.get(i) }.toMap
          val tbk = s"$sym/$timeframe/$attGroup"
          if (tf.approxSeconds <= 60L) deliver(tbk, payload)
          else {
            // deadline = window end of the tail bar — real Ceil
            // semantics, so a 1M bar emits at month END, not on the
            // average-month grid (utils/timeframe.go:169-186)
            shelf.store(tbk, payload, tf.ceilEpoch(tail) * 1000L)
          }
        }
    }
  }

  def shelvedKeys: Seq[String] = shelf.pendingKeys

  override def close(): Unit = shelf.close()
}
