package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Market calendar: timezone, regular open/close, early-close time,
  * and explicit non-trading / early-close dates (reference:
  * contrib/calendar/calendar.go — Calendar struct + nasdaq.go JSON).
  */
final case class MarketCalendar(
    timezone: String,
    openTime: String, // "09:30:00"
    closeTime: String, // "16:00:00"
    earlyCloseTime: String = "13:00:00",
    nonTradingDays: Seq[String] = Nil, // "yyyy-MM-dd"
    earlyCloses: Seq[String] = Nil) {
  private[operators] def secondsOf(t: String): Int = {
    val p = t.split(":"); p(0).toInt * 3600 + p(1).toInt * 60 + p(2).toInt
  }
}

/** Time-domain qualifiers applied inside the scan — the reference's
  * TimeQual hook (planner/planner.go:14,199-201; applied in
  * executor/scanner.go:638-647; columnar ApplyTimeQual
  * utils/io/columnseries.go:264-291). The predicate is a pure Column
  * expression (no UDF): date/second-of-day arithmetic plus literal IN
  * lists, so it stays in whole-stage codegen and pushes into the scan
  * where Catalyst can.
  */
object TimeQual {

  /** Market-open predicate over an epoch-seconds column, matching
    * calendar.IsMarketOpen (calendar.go:107-137): weekends closed,
    * listed dates closed, early-close dates use the early time, and
    * open <= t < close.
    */
  def isMarketOpen(epoch: Column, cal: MarketCalendar): Column = {
    val ts = from_utc_timestamp(timestamp_seconds(epoch), cal.timezone)
    val d = to_date(ts).cast("string")
    val secOfDay = hour(ts) * 3600 + minute(ts) * 60 + second(ts)
    val weekend = dayofweek(ts).isin(1, 7) // 1=Sunday, 7=Saturday
    val closedDay =
      if (cal.nonTradingDays.nonEmpty) d.isin(cal.nonTradingDays: _*) else lit(false)
    val earlyDay =
      if (cal.earlyCloses.nonEmpty) d.isin(cal.earlyCloses: _*) else lit(false)
    val closeSec = when(earlyDay, lit(cal.secondsOf(cal.earlyCloseTime)))
      .otherwise(lit(cal.secondsOf(cal.closeTime)))
    !weekend && !closedDay &&
      secOfDay >= lit(cal.secondsOf(cal.openTime)) && secOfDay < closeSec
  }
}
