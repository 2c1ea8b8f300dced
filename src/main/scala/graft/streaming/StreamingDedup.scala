package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-duplicate suppression on a DOCUMENT STREAM — the streaming
  * front of the corpus-dedup family in [[graft.ops.Dedup]]: a crawl /
  * feed ingest replays the same page under new ids, and the batch
  * dedup should not be the first place that notices.
  *
  * The key is the same md5 of the normalized text the batch operators
  * group on, so streamed survivors land in exactly the batch
  * operators' clone-group representative role: a later batch pass
  * over the accumulated corpus finds nothing new to collapse.
  *
  * State is WATERMARK-BOUNDED (`dropDuplicatesWithinWatermark`):
  * duplicates arriving within `lateness` of each other are dropped,
  * and hash state is reclaimed once the watermark passes — the
  * bounded-state trade the reference's trigger pipeline makes for
  * late data, applied to dedup. Replays separated by more than the
  * delay pass again by design (unbounded exactness over an infinite
  * stream is unbounded state; the batch pass stays the source of
  * truth, same division of labor as [[LiveCandles]] vs the cascade).
  */
object StreamingDedup {

  /** Suppress streamed documents whose normalized text was already
    * seen within the watermark delay. Adds `content_hash`; keeps every
    * input column.
    *
    * @param eventTimeCol timestamp column the watermark advances on
    * @param lateness     how far apart duplicate arrivals may be and
    *                     still be suppressed (state retention bound)
    */
  def dedupStream(stream: DataFrame, eventTimeCol: String,
                  lateness: String = "10 minutes",
                  text: String = "text"): DataFrame =
    stream
      .withColumn("content_hash", graft.ops.Dedup.contentHash(col(text)))
      .withWatermark(eventTimeCol, lateness)
      .dropDuplicatesWithinWatermark("content_hash")
}
