package graft.streaming

import graft.catalog.BucketCatalog
import graft.core.TimeBucketKey
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import scala.collection.mutable

/** Trigger contract (plugins/trigger/trigger.go:37-43): invoked after
  * a batch is durably written to a matching bucket, with the written
  * key and the batch rows. SAM trait — register with a lambda.
  */
trait Trigger {
  def fire(tbk: String, batch: DataFrame): Unit
}

/** `on:`-pattern dispatch (trigger.go:46-49, matcher :178-180 +
  * executor/written.go:24-47): each registered trigger fires for
  * every written TBK its glob matches. Patterns use the same
  * per-'/'-level glob as stream subscriptions.
  */
final class TriggerRegistry {
  private val entries = mutable.ArrayBuffer[(scala.util.matching.Regex, Trigger)]()

  def register(onPattern: String, t: Trigger): Unit = synchronized {
    entries += (SubscriptionSet.globToRegex(onPattern) -> t)
  }

  def dispatch(tbk: String, batch: DataFrame): Unit =
    synchronized(entries.toList).foreach { case (re, t) =>
      if (re.matches(tbk)) t.fire(tbk, batch)
    }
}

/** Write path with trigger dispatch — the reference's
  * WAL-flush→trigger hook (executor/written.go) as a batch/stream
  * ingest front: persist the batch into its bucket, then fan out to
  * matching triggers (downsample cascade, stream push, user plugins).
  */
final class IngestPipeline(catalog: BucketCatalog, registry: TriggerRegistry) {

  def ingest(tbk: TimeBucketKey, batch: DataFrame): Unit = {
    catalog.write(tbk, batch)
    registry.dispatch(tbk.key, batch.withColumn("symbol", lit(tbk.symbol)))
  }

  /** Structured Streaming wiring: each micro-batch is written then
    * dispatched (trigger contract as foreachBatch).
    */
  def attach(tbk: TimeBucketKey, stream: DataFrame, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, _: Long) => ingest(tbk, batch))
      .start()
}
