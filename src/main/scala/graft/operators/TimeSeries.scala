package graft.operators

import graft.functions.Uda
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core time-series operators over (Epoch, Nanoseconds)-keyed frames.
  * Each reproduces one reference operator's semantics declaratively so
  * Catalyst can push filters/limits into the parquet scan.
  */
object TimeSeries {

  /** Nanosecond-precision range predicate: [start, end] inclusive, as
    * in the reference's DateRange (planner/planner.go:57-66;
    * ns-precision comparisons sqlparser/selectrelation.go:223-459).
    * Two-column compare — never epoch*1e9+nanos (overflow, SURVEY §7.4).
    * The epoch bounds alone are sargable, so parquet min/max pruning on
    * Epoch still applies; the nanos refinement only bites on boundary
    * seconds.
    */
  def rangeFilter(
      df: DataFrame,
      startEpoch: Long, startNanos: Int = 0,
      endEpoch: Long = Long.MaxValue, endNanos: Int = 999999999): DataFrame = {
    val e = col(Uda.EpochCol)
    val n = if (df.columns.contains(Uda.NanosCol)) col(Uda.NanosCol) else lit(0)
    df.filter(e >= startEpoch && e <= endEpoch)
      .filter(!(e === startEpoch && n < startNanos))
      .filter(!(e === endEpoch && n > endNanos))
  }

  /** FIRST-n / LAST-n row limit (reference RowLimit,
    * planner/planner.go:57-66; backward scan executor/scanner.go:525-614).
    * LAST is orderBy(desc).limit(n) — Catalyst turns this into a
    * per-partition top-k (TakeOrderedAndProject), no global sort — then
    * re-sorted ascending as the reference returns rows in time order.
    */
  def limit(df: DataFrame, n: Int, fromStart: Boolean, tieBreak: Seq[String] = Nil): DataFrame = {
    val key = sortKey(df) ++ tieBreak.map(col)
    if (fromStart) df.orderBy(key.map(_.asc): _*).limit(n)
    else df.orderBy(key.map(_.desc): _*).limit(n).orderBy(key.map(_.asc): _*)
  }

  private def sortKey(df: DataFrame): Seq[Column] =
    if (df.columns.contains(Uda.NanosCol)) Seq(col(Uda.EpochCol), col(Uda.NanosCol))
    else Seq(col(Uda.EpochCol))

  /** Per-key FIRST-n / LAST-n: one keyed window (distributed by key),
    * so a multi-symbol limited query is a single job — no per-symbol
    * scan fan-out (reference runs one backward scan per bucket).
    */
  def limitPerKey(df: DataFrame, n: Int, fromStart: Boolean, keys: Seq[String]): DataFrame = {
    val key = sortKey(df)
    val ordered =
      if (fromStart) key.map(_.asc) else key.map(_.desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordered: _*)
    // rows return time-ascending like the reference's backward scan;
    // after the keyed window every key sits in one partition, so a
    // partition-local sort suffices — no global sort
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
      .sortWithinPartitions((keys.map(col) ++ key).map(_.asc): _*)
  }

  /** Column projection that always keeps Epoch (+Nanoseconds), matching
    * the reference (utils/io/columnseries.go:196-212 Project).
    */
  def project(df: DataFrame, cols: Seq[String]): DataFrame = {
    val keep = (Seq(Uda.EpochCol, Uda.NanosCol).filter(df.columns.contains) ++
      cols.filterNot(c => c == Uda.EpochCol || c == Uda.NanosCol)).distinct
    df.select(keep.map(col): _*)
  }

  /** Column rename/alias surface (utils/io/columnseries.go:131-169
    * Rename): unknown source columns error; Epoch may be renamed only
    * via an explicit mapping, mirroring the reference's guarded remap.
    */
  def rename(df: DataFrame, mapping: Map[String, String]): DataFrame = {
    val missing = mapping.keySet -- df.columns.toSet
    require(missing.isEmpty, s"rename of unknown columns: $missing")
    mapping.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
  }

  /** Epoch-keyed union where `right` overwrites `left` on duplicate
    * keys, output time-ordered (ColumnSeriesUnion,
    * utils/io/columnseries.go:343-396). keep-last via max_by over a
    * (source-priority, input-position) tag: one shuffle on the key, no
    * window sort. Ties INSIDE one input are broken by input position —
    * the later row wins, matching the reference's sequential overwrite
    * — so the result is deterministic even when an input itself
    * carries duplicate keys.
    */
  def unionKeepLast(left: DataFrame, right: DataFrame, keyCols: Seq[String]): DataFrame = {
    val cols = left.columns.toSeq
    // monotonically_increasing_id orders (partition, row-in-partition),
    // i.e. input order for an ordered source — the within-source
    // tie-break. __src dominates via struct lexicographic compare.
    val tagged = left
      .withColumn("__ord", struct(lit(0).as("s"), monotonically_increasing_id().as("i")))
      .unionByName(right.select(cols.map(col): _*)
        .withColumn("__ord", struct(lit(1).as("s"), monotonically_increasing_id().as("i"))))
    val payload = cols.filterNot(keyCols.contains)
    tagged.groupBy(keyCols.map(col): _*)
      .agg(
        max_by(struct(payload.map(col): _*), col("__ord")).as("__p"))
      .select((keyCols.map(col) ++ payload.map(c => col(s"__p.$c").as(c))): _*)
  }

  /** As-of (backward) join against a SMALL right side: for each left
    * row, the most recent right row with rightTime <= leftTime.
    *
    * The right side is collapsed to one broadcast sorted array and
    * probed with higher-order functions — zero shuffle, zero extra
    * join, the big side streams through whole-stage codegen untouched.
    * Right side must fit in a broadcast (corporate actions, calendars,
    * rate tables — the reference's as-of cases are all dims).
    */
  def asofJoinBroadcast(
      left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val entry = struct((col(rightTime).as("__t") +: payload.map(col)): _*)
    val arrDf = right.agg(sort_array(collect_list(entry)).as("__arr"))
    val probed = left.crossJoin(broadcast(arrDf))
    val hits = filter(col("__arr"), x => x("__t") <= col(leftTime))
    val m = try_element_at(hits, lit(-1))
    payload.foldLeft(probed)((d, c) => d.withColumn(c, m(c))).drop("__arr")
  }

  /** General as-of join for large right sides: union both sides,
    * per-key window `last(value, ignoreNulls)` ordered by time. One
    * shuffle on the key columns; sort is per key group.
    */
  def asofJoinUnion(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val lcols = left.columns.toSeq
    val l = left.withColumn("__t", col(leftTime)).withColumn("__isL", lit(1))
    val r0 = right.select((keys.map(col) :+ col(rightTime).as("__t")) ++ payload.map(c => col(c).as(s"__r_$c")): _*)
      .withColumn("__isL", lit(0))
    val unioned = l.unionByName(r0, allowMissingColumns = true)
    // keys may be empty (single-series as-of): the window is then a
    // single sorted partition — fine for one bucket's rows; per-symbol
    // callers pass the symbol key and keep the sort distributed.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__isL").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payload.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"__f_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__isL") === 1)
      .select((lcols.map(col) ++ payload.map(c => col(s"__f_$c").as(c))): _*)
  }
}
