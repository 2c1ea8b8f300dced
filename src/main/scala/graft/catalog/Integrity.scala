package graft.catalog

import graft.functions.Uda
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.control.NonFatal

/** Store integrity evaluation — the `marketstore tool integrity` role
  * (cmd/tool/integrity/main.go: checksum chunks over every year file,
  * optional year range). Parquet already CRC-checks every page on
  * read, so a full decode IS the checksum pass; on top of that this
  * validates the engine's own invariants per (symbol, timeframe, year)
  * partition:
  *
  *  - decodable: the partition's files read end-to-end;
  *  - unique keys: no duplicate (Epoch[, Nanoseconds]) within a
  *    bucket — the slot-overwrite/dedup contract;
  *  - year consistency: every row's Epoch falls in its partition year
  *    (the partition-pruning correctness precondition).
  *
  * One distributed scan per attribute group (two shuffle stages: key
  * counts, then per-partition rollup); unreadable groups surface as
  * report rows instead of exceptions, so one corrupt file doesn't
  * hide the rest of the report.
  */
object Integrity {

  /** Report columns: attGroup, symbol, timeframe, year, n_rows,
    * n_dup_keys, n_year_mismatch, ok, error.
    */
  def check(
      spark: SparkSession, root: String,
      yearStart: Int = Int.MinValue, yearEnd: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    val cat = new BucketCatalog(spark, root)
    val reports = cat.listAttGroups().map { ag =>
      try {
        val (_, variable) = cat.getInfo(ag)
        val df = spark.read.parquet(s"$root/$ag")
          .filter(col("year") >= yearStart && col("year") <= yearEnd)
        val keys = Seq("symbol", "timeframe", "year", Uda.EpochCol) ++
          (if (variable) Seq(Uda.NanosCol) else Nil)
        val perKey = df
          .withColumn("__ymm",
            when(year(timestamp_seconds(col(Uda.EpochCol))) =!= col("year"), 1L).otherwise(0L))
          .groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("__n"), sum(col("__ymm")).as("__ymm"))
        perKey.groupBy("symbol", "timeframe", "year")
          .agg(
            sum(col("__n")).as("n_rows"),
            sum(when(col("__n") > 1, col("__n") - 1).otherwise(0L)).as("n_dup_keys"),
            sum(col("__ymm")).as("n_year_mismatch"))
          .withColumn("attGroup", lit(ag))
          .withColumn("ok", col("n_dup_keys") === 0 && col("n_year_mismatch") === 0)
          .withColumn("error", lit(null).cast("string"))
          .select("attGroup", "symbol", "timeframe", "year",
            "n_rows", "n_dup_keys", "n_year_mismatch", "ok", "error")
          .collect().toSeq
      } catch {
        case NonFatal(e) =>
          Seq(org.apache.spark.sql.Row(ag, null, null, null, null, null, null,
            false, Option(e.getMessage).getOrElse(e.getClass.getName).take(200)))
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("attGroup", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("symbol", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("timeframe", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("year", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("n_rows", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_dup_keys", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_year_mismatch", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ok", org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("error", org.apache.spark.sql.types.StringType)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(reports.flatten.asJava, schema)
  }
}
