package graft.streaming

import graft.catalog.BucketCatalog
import graft.core.{CandleDuration, TimeBucketKey}
import graft.functions.Uda
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.{ScheduledThreadPoolExecutor, TimeUnit}
import scala.collection.mutable
import scala.util.control.NonFatal

/** A concrete background worker: scheduled polling source feeding the
  * trigger pipeline — the reference's bgworker shape
  * (plugins/bgworker/bgworker.go:22-25 `Run()` forever; modeled on
  * contrib/gdaxfeeder/gdaxfeeder.go:169-230):
  *
  *  1. on start, resume from the newest bar already stored per bucket
  *     (gdaxfeeder findLastTimestamp);
  *  2. every `intervalMs`, `fetch(tbk, lastSeen)` asks the source for
  *     bars past the watermark and ingests them through
  *     [[IngestPipeline]] — so each poll drives the full
  *     source → write → trigger → cascade → push loop;
  *  3. a failing poll is logged and retried next tick (the gdax
  *     feeder's wait-a-minute-on-error loop).
  *
  * `fetch` abstracts the transport (an HTTP market-data client in the
  * reference; deterministic [[PollingFeeder.syntheticBars]] in this
  * sandbox, which has no egress). Poll batches are control-plane
  * sized; the ingest itself is the catalog's distributed write.
  */
final class PollingFeeder(
    catalog: BucketCatalog,
    pipeline: IngestPipeline,
    tbks: Seq[TimeBucketKey],
    fetch: (TimeBucketKey, Option[Long]) => Option[DataFrame],
    intervalMs: Long = 60000L) extends AutoCloseable {

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[PollingFeeder])
  private val timers = new ScheduledThreadPoolExecutor(1, (r: Runnable) => {
    val t = new Thread(r, "graft-feeder"); t.setDaemon(true); t
  })
  private val lastSeen = mutable.Map[String, Option[Long]]()

  def start(): Unit = {
    tbks.foreach(tbk => lastSeen(tbk.key) = storedTail(tbk))
    timers.scheduleWithFixedDelay(() => pollOnce(), 0L, intervalMs, TimeUnit.MILLISECONDS)
  }

  /** Newest Epoch already stored for a bucket (resume watermark). */
  private def storedTail(tbk: TimeBucketKey): Option[Long] =
    try {
      val mx = catalog.read(tbk).agg(max(col(Uda.EpochCol))).head()
      if (mx.isNullAt(0)) None else Some(mx.getLong(0))
    } catch { case NonFatal(_) => None } // empty/missing bucket

  /** One poll across all buckets (also callable directly by tests). */
  def pollOnce(): Unit = tbks.foreach { tbk =>
    try {
      fetch(tbk, lastSeen.synchronized(lastSeen.getOrElse(tbk.key, None))).foreach { df =>
        val batch = df.persist()
        try {
          val mx = batch.agg(max(col(Uda.EpochCol))).head()
          if (!mx.isNullAt(0)) {
            pipeline.ingest(tbk, batch)
            lastSeen.synchronized { lastSeen(tbk.key) = Some(mx.getLong(0)) }
          }
        } finally batch.unpersist()
      }
    } catch {
      case NonFatal(e) =>
        log.warn(s"poll of ${tbk.key} failed (retrying next tick): ${e.getMessage}")
    }
  }

  override def close(): Unit = timers.shutdownNow()
}

object PollingFeeder {
  /** Deterministic synthetic bar source: one OHLCV bar per elapsed
    * timeframe step in (lastSeen, now], values a pure function of
    * (symbol, epoch) — the sandbox stand-in for a market-data client,
    * exercising the identical feeder/pipeline path.
    */
  def syntheticBars(
      spark: SparkSession, tf: CandleDuration,
      now: () => Long, backfillSteps: Int = 3): (TimeBucketKey, Option[Long]) => Option[DataFrame] = {
    val step = tf.approxSeconds
    (tbk, last) => {
      val tail = now() - Math.floorMod(now(), step) // last closed window start
      val from = last.map(_ + step).getOrElse(tail - (backfillSteps - 1) * step)
      if (from > tail) None
      else {
        import spark.implicits._
        val rows = (from to tail by step).map { e =>
          val seed = (e / step + tbk.symbol.map(_.toLong).sum) % 1000
          val open = 100.0 + seed / 10.0
          (e, open, open + 0.5, open - 0.5, open + 0.25, (seed % 10 + 1).toDouble)
        }
        Some(rows.toDF(Uda.EpochCol, "Open", "High", "Low", "Close", "Volume"))
      }
    }
  }
}
