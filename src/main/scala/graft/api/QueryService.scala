package graft.api

import graft.catalog.BucketCatalog
import graft.core.{CandleDuration, TimeBucketKey}
import graft.functions.AggRegistry
import graft.operators.TimeSeries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Engine-level query API mirroring the reference's QueryRequest
  * (frontend/query.go:21-47): destination TBK (comma list + `*`
  * wildcard), epoch range (+nanos), column list, row limit
  * (first/last), and a chained functions pipeline.
  *
  * Pipeline shape (reference lifecycle, SURVEY §3.1):
  *   catalog resolve → partition-pruned scan → range filter →
  *   projection → limit (scaled for timeframe substitution) →
  *   functions pipeline.
  * All steps are declarative, so Catalyst pushes the range filter and
  * projection into the parquet scan.
  */
final case class QueryRequest(
    destination: String, // "SYM1,SYM2/1Min/OHLCV" or "*/1Min/OHLCV"
    epochStart: Long = 0L,
    startNanos: Int = 0,
    epochEnd: Long = Long.MaxValue,
    endNanos: Int = 999999999,
    columns: Seq[String] = Nil,
    limit: Option[Int] = None,
    limitFromStart: Boolean = false,
    functions: Seq[String] = Nil)

class QueryService(catalog: BucketCatalog) {

  /** ONE isin-pruned scan answering the whole request, keyed by the
    * `symbol` column (≅ NumpyMultiDataset as a single grouped frame).
    * The reference's design target is ~16k symbols
    * (docs/design/file_format_design.txt); a per-symbol scan fan-out
    * would be 16k driver-launched jobs, so every stage here — range
    * filter, projection, per-symbol FIRST/LAST window, grouped
    * function pipeline — stays in one job.
    */
  def queryMulti(req: QueryRequest): DataFrame = {
    val proto = TimeBucketKey.parse(req.destination)
    val symbols: Seq[String] =
      if (proto.symbol == "*") catalog.listSymbols(proto.attGroup)
      else proto.symbol.split(",").toIndexedSeq.map(_.trim)

    // Timeframe substitution: serve a non-stored TF from the widest
    // stored TF that divides it, scaling LIMIT by the width ratio
    // (frontend/query.go:313-334 + utils/timeframe.go:189-208).
    // The substitution must be valid for EVERY requested symbol, so
    // intersect the symbols' stored-TF lists (heterogeneous buckets
    // would otherwise substitute a TF some symbols don't store). One
    // bulk catalog pass: per-symbol listTimeframes calls are O(S²) on
    // the driver at the 16k-symbol design point.
    val storedBySym = catalog.listTimeframesBySymbol(proto.attGroup)
    val stored = symbols.map(s => storedBySym.getOrElse(s, Set.empty[String]))
      .reduceOption(_ intersect _).getOrElse(Set.empty[String]).toSeq
    val want = CandleDuration.parse(proto.timeframe)
    val (scanTf, scaledLimit) =
      if (stored.contains(proto.timeframe)) (proto.timeframe, req.limit)
      else {
        val storedTfs = stored.flatMap(s => scala.util.Try(CandleDuration.parse(s)).toOption)
        CandleDuration.queryable(want, storedTfs) match {
          case Some(src) =>
            (src.string, req.limit.map(n => CandleDuration.scaleLimit(want, src, n)))
          case None => (proto.timeframe, req.limit)
        }
      }

    // wildcard: one unfiltered scan (the manifest-live files ARE the
    // symbol universe — a 16k-element In predicate would only cost).
    // Explicit lists go through the doubly-pruned read: sbucket
    // partition pruning down to ≤ |symbols| of the N physical buckets,
    // then the pushed symbol predicate skips row groups inside them.
    var df = (if (proto.symbol == "*") catalog.readMulti(proto.attGroup, scanTf)
              else catalog.readMulti(proto.attGroup, scanTf, symbols))
      .drop("timeframe", "year")
    df = TimeSeries.rangeFilter(df, req.epochStart, req.startNanos, req.epochEnd, req.endNanos)
    if (req.columns.nonEmpty)
      df = TimeSeries.project(df, "symbol" +: req.columns)
    df = scaledLimit match {
      case Some(n) => TimeSeries.limitPerKey(df, n, req.limitFromStart, Seq("symbol"))
      case None => df
    }
    AggRegistry.runGrouped(req.functions, df, Seq("symbol"),
      AggRegistry.forCatalog(catalog))
  }

  /** Compatibility shape: one DataFrame per resolved bucket, keyed by
    * TBK string (≅ the reference's ColumnSeriesMap). All entries are
    * filters over the SAME single-scan plan from [[queryMulti]];
    * collecting every entry still runs one job per entry, so callers
    * wanting one job should use [[queryMulti]] directly.
    */
  def query(req: QueryRequest): Map[String, DataFrame] = {
    val proto = TimeBucketKey.parse(req.destination)
    val symbols: Seq[String] =
      if (proto.symbol == "*") catalog.listSymbols(proto.attGroup)
      else proto.symbol.split(",").toIndexedSeq.map(_.trim)
    val grouped = queryMulti(req)
    symbols.map { s =>
      proto.copy(symbol = s).key ->
        grouped.filter(col("symbol") === s).drop("symbol")
    }.toMap
  }
}
