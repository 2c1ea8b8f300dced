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
  *
  * Concurrency contract: SINGLE WRITER per root (readers unlimited) —
  * the same contract as the reference, whose one server process owns
  * the store and its WAL. Commits leave a record in [[CommitLog]];
  * [[recoverOrphanedStaging]] cleans up after a crashed writer;
  * [[ReplicaSync]] builds read replicas from the commit log.
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
      // schema as JSON: unlike DDL it round-trips field metadata
      // (char/varchar length caps for STRING16 enforcement)
      out.write(s"$kind\n${schema.json}\n".getBytes("UTF-8"))
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
    val schema = org.apache.spark.sql.types.DataType.fromJson(lines(1))
      .asInstanceOf[StructType]
    (lines(0).trim == "variable", schema)
  }

  /** Upsert a batch of rows for one bucket. df must carry Epoch (long
    * seconds) + payload columns (+ Nanoseconds for variable buckets —
    * auto-added as 0 otherwise, matching utils/io/rowseries.go:176-181).
    *
    * Callers wanting a written-row count without a second execution
    * attach an `Observation` to `df` BEFORE calling (see
    * SqlService.insert) — the CollectMetrics node rides the write job.
    * The catalog itself stays observation-free: `Observation.get`
    * deadlocks on the stream-execution thread (foreachBatch), which is
    * exactly where the downsample cascade calls [[writeMulti]].
    */
  def write(tbk: TimeBucketKey, df: DataFrame): Unit =
    writeMulti(tbk.attGroup, tbk.timeframe, df.withColumn("symbol", lit(tbk.symbol)))

  /** Write-side type coercion (utils/io/coercecolumn.go:19-130 +
    * GetMissingAndTypeCoercionColumns, columnseries.go:486-542):
    * incoming columns cast to the bucket's declared types, declared
    * columns missing from the batch null-filled, and length-capped
    * strings (STRING16, datatypes.go:78) rejected when too long
    * (mirrors integ test_string16.py "test_too_long_string").
    */
  private def coerce(df: DataFrame, declared: StructType): DataFrame = {
    val byName = df.columns.map(c => c.toLowerCase -> c).toMap
    val cols = declared.fields.toSeq.map { f =>
      val vcLen = org.apache.spark.sql.catalyst.util.CharVarcharUtils
        .getRawType(f.metadata).collect {
          case org.apache.spark.sql.types.VarcharType(n) => n
          case org.apache.spark.sql.types.CharType(n) => n
        }
      byName.get(f.name.toLowerCase) match {
        case Some(src) =>
          val base = if (df.schema(src).dataType == f.dataType) col(src) else col(src).cast(f.dataType)
          vcLen match {
            case Some(n) =>
              when(length(base) > n, raise_error(
                concat(lit(s"string too long for ${f.name} (max $n): "), base)))
                .otherwise(base).as(f.name)
            case None => base.as(f.name)
          }
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(col("symbol") +: cols: _*)
  }

  /** Multi-symbol upsert: df carries a `symbol` column alongside Epoch
    * + payload. One Spark job upserts every symbol's partition — the
    * cascade/trigger path writes all touched symbols at once instead
    * of a per-symbol job fan-out. A bucket that was never create()d is
    * created from the first batch's schema (executor/writer.go:287-320).
    */
  def writeMulti(attGroup: String, timeframe: String, df: DataFrame): Unit = {
    require(df.columns.contains("symbol"), "writeMulti needs a symbol column")
    if (!fs.exists(new Path(agPath(attGroup), MetaFile))) {
      val inferred = StructType(df.schema.fields.filterNot(f =>
        Seq("symbol", "timeframe", "year").contains(f.name)))
      create(TimeBucketKey("__infer", timeframe, attGroup), inferred,
        isVariable = df.columns.contains(Uda.NanosCol))
    }
    val (variable, declared) = readMeta(attGroup)
    val keyed0 = coerce(df, declared)
      .withColumn("timeframe", lit(timeframe))
      .withColumn("year", year(timestamp_seconds(col(Uda.EpochCol))))
    val keyed =
      if (variable && !keyed0.columns.contains(Uda.NanosCol))
        keyed0.withColumn(Uda.NanosCol, lit(0))
      else keyed0
    val path = agPath(attGroup)
    val dedupKeys =
      Seq("symbol", "timeframe", Uda.EpochCol) ++ (if (variable) Seq(Uda.NanosCol) else Nil)

    val existing = readAg(attGroup)
    existing match {
      case Some(old) =>
        val affected = keyed.select("symbol", "timeframe", "year").distinct()
        val oldAffected = old.join(broadcast(affected), Seq("symbol", "timeframe", "year"), "left_semi")
        val merged = TimeSeries.unionKeepLast(
          oldAffected.select(keyed.columns.map(col): _*), keyed, dedupKeys)
        stageSwap(merged, attGroup)
      case None =>
        keyed.write.mode("append")
          .partitionBy("symbol", "timeframe", "year")
          .parquet(path)
        // first write into an empty group: log what landed (directory
        // walk, no data scan) so a replica tailing the commit log sees
        // bootstrap writes too
        logCommit(attGroup, listPartitions(attGroup))
    }
  }

  /** All (symbol, timeframe, year) partition rel-paths of a group. */
  private def listPartitions(attGroup: String): Seq[String] = {
    val p = new Path(agPath(attGroup))
    if (!fs.exists(p)) Nil
    else for {
      symDir <- fs.listStatus(p).toSeq if symDir.getPath.getName.startsWith("symbol=")
      tfDir <- fs.listStatus(symDir.getPath).toSeq if tfDir.getPath.getName.startsWith("timeframe=")
      yearDir <- fs.listStatus(tfDir.getPath).toSeq if yearDir.getPath.getName.startsWith("year=")
    } yield s"${symDir.getPath.getName}/${tfDir.getPath.getName}/${yearDir.getPath.getName}"
  }

  /** Stage-and-swap commit shared by every path that rewrites live
    * partitions it is simultaneously reading (merge upserts, range
    * deletes): materialize `df` fully into a staging directory, then
    * swap each staged (symbol, timeframe, year) partition into the
    * live tree. A dynamic overwrite of the path being read would lose
    * the touched partitions on a mid-write crash — the reference
    * guards this exact window with its WAL (executor/wal.go:29-45);
    * after staging, the only non-atomic window left is the rename
    * loop, each step of which is a single filesystem rename.
    * Partitions in `clearIfUnstaged` that produced no staged output
    * are deleted (a rewrite that emptied them).
    */
  private def stageSwap(df: DataFrame, attGroup: String,
      clearIfUnstaged: Seq[String] = Nil): Unit = {
    val path = agPath(attGroup)
    val staging = new Path(root, s"$StagingPrefix${attGroup}_${System.nanoTime()}")
    df.write.mode("overwrite")
      .partitionBy("symbol", "timeframe", "year")
      .parquet(staging.toString)
    try {
      val staged = scala.collection.mutable.Set[String]()
      for {
        symDir <- fs.listStatus(staging).toSeq if symDir.getPath.getName.startsWith("symbol=")
        tfDir <- fs.listStatus(symDir.getPath).toSeq if tfDir.getPath.getName.startsWith("timeframe=")
        yearDir <- fs.listStatus(tfDir.getPath).toSeq if yearDir.getPath.getName.startsWith("year=")
      } {
        val rel = s"${symDir.getPath.getName}/${tfDir.getPath.getName}/${yearDir.getPath.getName}"
        staged += rel
        val target = new Path(path, rel)
        if (fs.exists(target)) fs.delete(target, true)
        fs.mkdirs(target.getParent)
        fs.rename(yearDir.getPath, target)
      }
      clearIfUnstaged.filterNot(staged).foreach { rel =>
        val p = new Path(path, rel)
        if (fs.exists(p)) fs.delete(p, true)
      }
      logCommit(attGroup, staged.toSeq.sorted ++ clearIfUnstaged.filterNot(staged).map(_ + ":cleared"))
    } finally fs.delete(staging, true)
  }

  /** Append one line per committed swap to the catalog's commit log —
    * the durable trail the reference keeps in its WAL transaction
    * groups (executor/wal.go; replication tails the same records,
    * replication/sender.go:14-48). A replica catalog can tail this
    * file and re-read exactly the partitions each commit names.
    * Best-effort: a commit-log write failure never fails the data
    * commit (the data swap already happened atomically).
    */
  private def logCommit(attGroup: String, partitions: Seq[String]): Unit =
    try {
      val line = s"""{"ts":${System.currentTimeMillis()},"attGroup":"$attGroup","partitions":[${
        partitions.map(p => "\"" + p + "\"").mkString(",")}]}"""
      // one immutable file per commit: the local Hadoop FS has no
      // append, and write-once files are exactly the shape an object
      // store replays best. Name = wall-clock millis (ordered across
      // restarts, unlike nanoTime whose origin is per-boot) + a
      // process-local counter for sub-ms ties. Written to a dotfile
      // then renamed so readers NEVER see a torn record (rename is the
      // atomicity primitive here, same as the partition swaps).
      val dir = new Path(root, CommitLog)
      fs.mkdirs(dir)
      val name = f"${System.currentTimeMillis()}%015d_${
        BucketCatalog.commitCounter.getAndIncrement()}%06d.json"
      val tmp = new Path(dir, s".tmp_$name")
      val out = fs.create(tmp, false)
      out.write(line.getBytes("UTF-8"))
      out.close()
      fs.rename(tmp, new Path(dir, name))
    } catch { case scala.util.control.NonFatal(_) => }

  /** Commit records, oldest first (empty if no swaps committed). */
  def commitHistory(): Seq[String] = {
    val dir = new Path(root, CommitLog)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toIndexedSeq
      .map(_.getPath).filter(p => !p.getName.startsWith(".")).sortBy(_.getName)
      .map { p =>
        val in = fs.open(p)
        val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
        in.close()
        txt
      }
  }

  /** Delete orphaned staging directories left by a crashed writer.
    * Safe ONLY under the catalog's single-writer contract (the
    * reference has the same: one server process owns the store and
    * replays/cleans its WAL on startup, executor/wal.go:29-45): an
    * orphan is any staging dir present when no write is in flight,
    * because a completed stageSwap always removes its own dir.
    * Returns the number of directories removed.
    */
  def recoverOrphanedStaging(): Int = {
    val p = new Path(root)
    if (!fs.exists(p)) return 0
    val orphans = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(StagingPrefix))
    orphans.foreach(s => fs.delete(s.getPath, true))
    orphans.size
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

  /** Attribute groups present under the catalog root (directory walk,
    * no data scan) — the wire front's ListSymbols/GetInfo enumerate
    * across groups like the reference's catalog descent
    * (catalog/catalog.go:18-116).
    */
  def listAttGroups(): Seq[String] = {
    val p = new Path(root)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toIndexedSeq
      .filter(s => s.isDirectory && fs.exists(new Path(s.getPath, MetaFile)))
      .map(_.getPath.getName).sorted
  }

  /** Most recent year partition of one bucket (GetInfo's LatestYear). */
  def latestYear(tbk: TimeBucketKey): Option[Int] = {
    val p = new Path(agPath(tbk.attGroup),
      s"symbol=${tbk.symbol}/timeframe=${tbk.timeframe}")
    if (!fs.exists(p)) None
    else fs.listStatus(p).toIndexedSeq.map(_.getPath.getName)
      .filter(_.startsWith("year=")).map(_.stripPrefix("year=").toInt).maxOption
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
    // replicas must apply destroys too or they diverge forever
    logCommit(tbk.attGroup,
      Seq(s"symbol=${tbk.symbol}/timeframe=${tbk.timeframe}:cleared"))
  }

  /** Schema + record type for a bucket (GetInfo / GetDataShapes,
    * catalog/catalog.go:347).
    */
  def getInfo(attGroup: String): (StructType, Boolean) = {
    val (variable, schema) = readMeta(attGroup)
    (schema, variable)
  }

  /** Delete rows of one bucket inside an inclusive ns-precision epoch
    * range (reference range delete, executor/delete.go:15-130). Only
    * the year partitions the range touches are rewritten, through the
    * same [[stageSwap]] commit as the upsert path (no self-overwrite
    * crash window); partitions left empty are removed.
    */
  def deleteRange(
      tbk: TimeBucketKey,
      startEpoch: Long, startNanos: Int = 0,
      endEpoch: Long = Long.MaxValue, endNanos: Int = 999999999): Unit = {
    val existing = readAg(tbk.attGroup).getOrElse(return)
    val mine = existing.filter(
      col("symbol") === tbk.symbol && col("timeframe") === tbk.timeframe)
    val e = col(Uda.EpochCol)
    val n = if (existing.columns.contains(Uda.NanosCol)) col(Uda.NanosCol) else lit(0)
    val inRange = e >= startEpoch && e <= endEpoch &&
      !(e === startEpoch && n < startNanos) && !(e === endEpoch && n > endNanos)
    val touchedYears = mine.filter(inRange)
      .select("year").distinct().collect().map(_.getInt(0))
    if (touchedYears.isEmpty) return
    val keep = mine.filter(col("year").isin(touchedYears.toSeq: _*)).filter(!inRange)
    stageSwap(keep, tbk.attGroup,
      clearIfUnstaged = touchedYears.toSeq.map(y =>
        s"symbol=${tbk.symbol}/timeframe=${tbk.timeframe}/year=$y"))
  }

  /** Zero all data on/after a date (CLI trim,
    * cmd/connect/session/trim.go:15-65).
    */
  def trim(tbk: TimeBucketKey, fromEpoch: Long): Unit =
    deleteRange(tbk, fromEpoch)
}

object BucketCatalog {
  val MetaFile = "_graft_meta.txt"
  val CommitLog = "_graft_commits.jsonl"
  val StagingPrefix = ".staging_"
  private[catalog] val commitCounter = new java.util.concurrent.atomic.AtomicLong(0L)
}
