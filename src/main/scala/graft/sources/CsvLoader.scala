package graft.sources

import graft.catalog.BucketCatalog
import graft.core.TimeBucketKey
import graft.functions.Uda
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CSV import into a bucket — the CLI `\load` path
  * (cmd/connect/session/load.go + cmd/connect/loader/utils.go).
  *
  * Columns are matched by header name against the bucket schema and
  * coerced by the catalog's write path. The time column is either raw
  * epoch seconds, or a timestamp string parsed with `timeFormat` in
  * `timezone` (the loader's CSVConfig {timeFormat, timeZone}).
  */
object CsvLoader {
  def load(
      spark: SparkSession,
      catalog: BucketCatalog,
      tbk: TimeBucketKey,
      path: String,
      timeColumn: String = Uda.EpochCol,
      timeFormat: Option[String] = None,
      timezone: String = "UTC"): Long = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)
    val withEpoch = timeFormat match {
      case Some(fmt) =>
        raw.withColumn(Uda.EpochCol,
          unix_timestamp(to_utc_timestamp(
            to_timestamp(col(timeColumn).cast("string"), fmt), timezone)))
          .drop(if (timeColumn == Uda.EpochCol) "__none" else timeColumn)
      case None =>
        raw.withColumn(Uda.EpochCol, col(timeColumn).cast("long"))
    }
    // loaded-row count observed on the write job itself — one
    // execution, no second pass (batch context, so Observation is safe)
    val obs = org.apache.spark.sql.Observation()
    catalog.write(tbk, withEpoch.observe(obs, count(lit(1)).as("rows")))
    obs.get("rows").asInstanceOf[Long]
  }
}
