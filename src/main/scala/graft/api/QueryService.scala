package graft.api

import graft.catalog.BucketCatalog
import graft.core.{CandleDuration, TimeBucketKey}
import graft.functions.AggRegistry
import graft.operators.TimeSeries
import org.apache.spark.sql.DataFrame

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

  /** Execute one request; returns a result per resolved bucket, keyed
    * by TBK string (≅ the reference's ColumnSeriesMap / NumpyMultiDataset).
    */
  def query(req: QueryRequest): Map[String, DataFrame] = {
    val proto = TimeBucketKey.parse(req.destination)
    val keys: Seq[TimeBucketKey] =
      if (proto.symbol == "*")
        catalog.listSymbols(proto.attGroup).map(s => proto.copy(symbol = s))
      else TimeBucketKey.expand(req.destination)
    keys.map(k => k.key -> queryOne(k, req)).toMap
  }

  private def queryOne(tbk: TimeBucketKey, req: QueryRequest): DataFrame = {
    // Timeframe substitution: serve a non-stored TF from the widest
    // stored TF that divides it, scaling LIMIT by the width ratio
    // (frontend/query.go:313-334 + utils/timeframe.go:189-208).
    val want = CandleDuration.parse(tbk.timeframe)
    val stored = catalog.listTimeframes(tbk.attGroup, tbk.symbol)
    val (scanTbk, scaledLimit) =
      if (stored.contains(tbk.timeframe)) (tbk, req.limit)
      else {
        val storedTfs = stored.flatMap(s => scala.util.Try(CandleDuration.parse(s)).toOption)
        CandleDuration.queryable(want, storedTfs) match {
          case Some(src) =>
            (tbk.copy(timeframe = src.string),
             req.limit.map(n => CandleDuration.scaleLimit(want, src, n)))
          case None => (tbk, req.limit)
        }
      }

    var df = catalog.read(scanTbk)
    df = TimeSeries.rangeFilter(df, req.epochStart, req.startNanos, req.epochEnd, req.endNanos)
    if (req.columns.nonEmpty) df = TimeSeries.project(df, req.columns)
    df = scaledLimit match {
      case Some(n) => TimeSeries.limit(df, n, req.limitFromStart)
      case None => df
    }
    // Chained UDA pipeline: output of function N feeds function N+1
    // (sqlparser/registry.go:51-113).
    AggRegistry.run(req.functions, df.drop("symbol", "timeframe", "year"))
  }
}
