package graft.catalog

import graft.core.TimeBucketKey
import graft.functions.Uda
import graft.operators.TimeSeries
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Bucket storage over partitioned parquet.
  *
  * Replaces the reference's on-disk catalog tree + year-file format
  * (catalog/catalog.go:18-116; file layout docs/design/
  * file_format_design.txt) with one parquet dataset per AttributeGroup,
  * partitioned by `symbol/timeframe/year` (SURVEY §7.1). The TBK
  * resolves to partition predicates, so Catalyst's partition pruning
  * replaces the reference's directory descent, and parquet min/max
  * stats on Epoch replace the O(1) time-offset arithmetic
  * (utils/io/timeindex.go:32-60).
  *
  * Record-type semantics (utils/io/datatypes.go:12-18):
  *  - FIXED  ⇒ at most one row per (symbol, timeframe, epoch): writes
  *    upsert keyed on epoch — the reference's slot overwrite.
  *  - VARIABLE ⇒ many rows per second, keyed (epoch, nanoseconds);
  *    unsorted writes read back time-ordered (executor/sort.go:11-50).
  *
  * At cluster scale the upsert path = dynamic-partition overwrite of
  * only the (symbol, timeframe, year) partitions present in the batch:
  * rewrite cost is bounded by touched partitions, not table size.
  */
class BucketCatalog(spark: SparkSession, root: String) {
  import BucketCatalog._

  private def agPath(attGroup: String) = s"$root/$attGroup"
  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def create(tbk: TimeBucketKey, schema: StructType, isVariable: Boolean): Unit = {
    val meta = new Path(agPath(tbk.attGroup), MetaFile)
    if (!fs.exists(meta)) {
      val out = fs.create(meta, true)
      val kind = if (isVariable) "variable" else "fixed"
      out.write(s"$kind\n${schema.toDDL}\n".getBytes("UTF-8"))
      out.close()
    }
  }

  def isVariable(attGroup: String): Boolean = readMeta(attGroup)._1

  private def readMeta(attGroup: String): (Boolean, StructType) = {
    val meta = new Path(agPath(attGroup), MetaFile)
    val in = fs.open(meta)
    val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    val lines = txt.split("\n")
    (lines(0).trim == "variable", StructType.fromDDL(lines(1)))
  }

  /** Upsert a batch of rows for one bucket. df must carry Epoch (long
    * seconds) + payload columns (+ Nanoseconds for variable buckets —
    * auto-added as 0 otherwise, matching utils/io/rowseries.go:176-181).
    */
  def write(tbk: TimeBucketKey, df: DataFrame): Unit =
    writeMulti(tbk.attGroup, tbk.timeframe, df.withColumn("symbol", lit(tbk.symbol)))

  /** Multi-symbol upsert: df carries a `symbol` column alongside Epoch
    * + payload. One Spark job upserts every symbol's partition — the
    * cascade/trigger path writes all touched symbols at once instead
    * of a per-symbol job fan-out.
    */
  def writeMulti(attGroup: String, timeframe: String, df: DataFrame): Unit = {
    require(df.columns.contains("symbol"), "writeMulti needs a symbol column")
    val variable = isVariable(attGroup)
    val keyed0 = df
      .withColumn("timeframe", lit(timeframe))
      .withColumn("year", year(timestamp_seconds(col(Uda.EpochCol))))
    val keyed =
      if (variable && !df.columns.contains(Uda.NanosCol))
        keyed0.withColumn(Uda.NanosCol, lit(0))
      else keyed0
    val path = agPath(attGroup)
    val dedupKeys =
      Seq("symbol", "timeframe", Uda.EpochCol) ++ (if (variable) Seq(Uda.NanosCol) else Nil)

    val existing = readAg(attGroup)
    val merged = existing match {
      case Some(old) =>
        // only partitions present in the incoming batch are rewritten
        val affected = keyed.select("symbol", "timeframe", "year").distinct()
        val oldAffected = old.join(broadcast(affected), Seq("symbol", "timeframe", "year"), "left_semi")
        TimeSeries.unionKeepLast(
          oldAffected.select(keyed.columns.map(col): _*), keyed, dedupKeys)
      case None => keyed
    }
    merged.write
      .mode(if (existing.isDefined) "overwrite" else "append")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("symbol", "timeframe", "year")
      .parquet(path)
  }

  private def readAg(attGroup: String): Option[DataFrame] = {
    val p = new Path(agPath(attGroup))
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(s => s.getPath.getName.startsWith("symbol="))
    if (hasData) Some(spark.read.parquet(agPath(attGroup))) else None
  }

  /** Partition-pruned scan of ALL symbols of one attGroup/timeframe
    * (symbol column retained) — single scan for wildcard queries and
    * the downsample cascade.
    */
  def readMulti(attGroup: String, timeframe: String): DataFrame =
    spark.read.parquet(agPath(attGroup))
      .filter(col("timeframe") === timeframe)

  /** Partition-pruned scan of one bucket, time-ordered. */
  def read(tbk: TimeBucketKey): DataFrame = {
    val df = spark.read.parquet(agPath(tbk.attGroup))
      .filter(col("symbol") === tbk.symbol && col("timeframe") === tbk.timeframe)
    val ord =
      if (df.columns.contains(Uda.NanosCol)) Seq(col(Uda.EpochCol), col(Uda.NanosCol))
      else Seq(col(Uda.EpochCol))
    df.sortWithinPartitions(ord: _*)
  }

  /** All symbols present for an AttributeGroup
    * (frontend ListSymbols, frontend/query.go:264-288) — resolved from
    * partition directories, no data scan.
    */
  def listSymbols(attGroup: String): Seq[String] = {
    val p = new Path(agPath(attGroup))
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toIndexedSeq.map(_.getPath.getName)
      .filter(_.startsWith("symbol=")).map(_.stripPrefix("symbol=")).sorted
  }

  def listTimeframes(attGroup: String, symbol: String): Seq[String] = {
    val p = new Path(agPath(attGroup), s"symbol=$symbol")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toIndexedSeq.map(_.getPath.getName)
      .filter(_.startsWith("timeframe=")).map(_.stripPrefix("timeframe=")).sorted
  }

  /** Drop one symbol/timeframe from a bucket (frontend Destroy,
    * frontend/write.go:182-210) — partition-level delete.
    */
  def destroy(tbk: TimeBucketKey): Unit = {
    val p = new Path(agPath(tbk.attGroup), s"symbol=${tbk.symbol}/timeframe=${tbk.timeframe}")
    if (fs.exists(p)) fs.delete(p, true)
    val symDir = p.getParent
    if (fs.exists(symDir) && fs.listStatus(symDir).isEmpty) fs.delete(symDir, true)
  }

  /** Schema + record type for a bucket (GetInfo / GetDataShapes,
    * catalog/catalog.go:347).
    */
  def getInfo(attGroup: String): (StructType, Boolean) = {
    val (variable, schema) = readMeta(attGroup)
    (schema, variable)
  }
}

object BucketCatalog {
  val MetaFile = "_graft_meta.txt"
}
