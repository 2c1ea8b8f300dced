package graft.streaming

import graft.functions.Uda
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked session assembly over an event stream — the streaming
  * pair of [[graft.operators.Analytics.sessionize]], built on Spark's
  * native `session_window` so session state merges and expires inside
  * the streaming aggregation (no custom mapGroupsWithState needed).
  *
  * Boundary note: `session_window` windows are half-open, so a gap of
  * EXACTLY `gap` seconds breaks the session, while the batch operator
  * breaks only on gap > gapSeconds; away from that exact boundary the
  * two agree row-for-row (StreamingSpec pins the equivalence on a
  * shared fixture). Late events inside the allowed lateness MERGE
  * adjacent sessions — the semantics a recompute from storage would
  * produce; later than that, state is reclaimed and the event is
  * dropped (the documented bounded-state trade, as in LiveCandles).
  */
object LiveSessions {

  def sessions(stream: DataFrame, gap: String, keyCols: Seq[String],
      allowedLateness: String = "10 minutes"): DataFrame = {
    val withTs = stream.withColumn("__ts", timestamp_seconds(col(Uda.EpochCol)))
      .withWatermark("__ts", allowedLateness)
    withTs
      .groupBy((keyCols.map(col) :+ session_window(col("__ts"), gap).as("__w")): _*)
      .agg(min(col(Uda.EpochCol)).as("SessionStart"),
        max(col(Uda.EpochCol)).as("SessionEnd"),
        count(lit(1)).as("NEvents"))
      .select(keyCols.map(col) ++
        Seq(col("SessionStart"), col("SessionEnd"), col("NEvents")): _*)
  }
}
