package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Timeframe / tumbling-window algebra.
  *
  * Re-expresses the reference's CandleDuration
  * (reference: utils/timeframe.go:105-232 — Truncate :155-166,
  * IsWithin :112-151, Ceil :169-186, QueryableTimeframe :189-197,
  * QueryableNrecords :200-208) as *Column expressions over an epoch
  * long*, so window assignment stays inside whole-stage codegen and is
  * identical on every executor. Calendar units (W/M/Y) go through
  * `date_trunc` in the session timezone (the engine pins UTC); fixed
  * units are pure integer arithmetic on the epoch — no timestamp
  * round-trip, no timezone hazard.
  */
sealed trait CandleUnit
object CandleUnit {
  case object Sec extends CandleUnit
  case object Min extends CandleUnit
  case object Hour extends CandleUnit
  case object Day extends CandleUnit
  case object Week extends CandleUnit
  case object Month extends CandleUnit
  case object Year extends CandleUnit
}

final case class CandleDuration(n: Int, unit: CandleUnit) {
  import CandleUnit._
  require(n > 0, s"timeframe multiplier must be positive: $n")

  /** Fixed width in seconds for units where a window is a constant span.
    * Weeks are fixed 7-day spans in the reference too (ISO week start).
    */
  val fixedSeconds: Option[Long] = unit match {
    case Sec  => Some(n.toLong)
    case Min  => Some(n * 60L)
    case Hour => Some(n * 3600L)
    case Day  => Some(n * 86400L)
    case Week => Some(n * 7L * 86400L)
    case Month | Year => None
  }

  def string: String = {
    val suffix = unit match {
      case Sec => "Sec"; case Min => "Min"; case Hour => "H"; case Day => "D"
      case Week => "W"; case Month => "M"; case Year => "Y"
    }
    s"$n$suffix"
  }

  /** Window-start epoch (seconds) for a given epoch column — the
    * reference's Truncate (utils/timeframe.go:155-166). Fixed units
    * truncate on the Unix epoch grid (Go's ts.Truncate semantics);
    * weeks truncate to ISO Monday; months/years are calendar-aware.
    */
  def truncate(epoch: Column): Column = unit match {
    case Sec | Min | Hour | Day =>
      val w = fixedSeconds.get
      epoch - pmod(epoch, lit(w))
    case Week =>
      // ISO week: Unix epoch day 0 (1970-01-01) was a Thursday; Monday
      // grid is offset by 3 days. Multi-week uses the same Monday grid.
      val w = fixedSeconds.get
      val off = lit(3L * 86400L)
      epoch - pmod(epoch + off, lit(w))
    case Month =>
      val ts = timestamp_seconds(epoch)
      val monthsSinceEpoch = (year(ts) - lit(1970)) * lit(12) + month(ts) - lit(1)
      val bucketStart = monthsSinceEpoch - pmod(monthsSinceEpoch, lit(n))
      unix_timestamp(add_months(to_timestamp(lit("1970-01-01")), bucketStart))
    case Year =>
      val ts = timestamp_seconds(epoch)
      val y = year(ts) - pmod(year(ts) - lit(1970), lit(n))
      unix_timestamp(make_date(y, lit(1), lit(1)).cast("timestamp"))
  }

  /** Window-end epoch (exclusive) — the reference's Ceil
    * (utils/timeframe.go:169-186).
    */
  def ceil(epoch: Column): Column = unit match {
    case Month =>
      val start = truncate(epoch)
      unix_timestamp(add_months(timestamp_seconds(start).cast("date"), n).cast("timestamp"))
    case Year =>
      val start = truncate(epoch)
      unix_timestamp(add_months(timestamp_seconds(start).cast("date"), 12 * n).cast("timestamp"))
    case _ => truncate(epoch) + lit(fixedSeconds.get)
  }

  /** Driver-side window-end (exclusive) for a scalar epoch — the same
    * Ceil semantics as [[ceil]] but off the Column path, for
    * control-plane deadlines (shelf timers). Calendar units use real
    * java.time month arithmetic (utils/timeframe.go:169-186): a `1M`
    * bar's deadline is month END, not a 2,629,746-second grid point.
    */
  def ceilEpoch(epoch: Long): Long = unit match {
    case CandleUnit.Month | CandleUnit.Year =>
      val months = if (unit == CandleUnit.Month) n else 12 * n
      val d = java.time.Instant.ofEpochSecond(epoch)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      val mse = (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
      val end = mse - Math.floorMod(mse, months) + months
      java.time.LocalDate.of(1970 + Math.floorDiv(end, 12), Math.floorMod(end, 12) + 1, 1)
        .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    case CandleUnit.Week =>
      val w = fixedSeconds.get
      epoch - Math.floorMod(epoch + 3L * 86400L, w) + w
    case _ =>
      val w = fixedSeconds.get
      epoch - Math.floorMod(epoch, w) + w
  }

  /** Driver-side window-start for a scalar epoch — the same grid as
    * [[truncate]] but off the Column path, for control-plane bounds
    * (e.g. the downsample cascade's literal recompute window).
    */
  def truncateEpoch(epoch: Long): Long = unit match {
    case CandleUnit.Month | CandleUnit.Year =>
      val months = if (unit == CandleUnit.Month) n else 12 * n
      val d = java.time.Instant.ofEpochSecond(epoch)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      val mse = (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
      val start = mse - Math.floorMod(mse, months)
      java.time.LocalDate.of(1970 + Math.floorDiv(start, 12), Math.floorMod(start, 12) + 1, 1)
        .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    case CandleUnit.Week =>
      val w = fixedSeconds.get
      epoch - Math.floorMod(epoch + 3L * 86400L, w)
    case _ =>
      val w = fixedSeconds.get
      epoch - Math.floorMod(epoch, w)
  }

  /** Average seconds per window — used only for LIMIT scaling
    * (QueryableNrecords, utils/timeframe.go:200-208).
    */
  def approxSeconds: Long = unit match {
    case CandleUnit.Month => n * 2629746L
    case CandleUnit.Year  => n * 31556952L
    case _                => fixedSeconds.get
  }

  /** True iff a candle of `this` width can be built exactly from
    * candles of `src` width (src divides this on the window grid).
    */
  def divisibleBy(src: CandleDuration): Boolean = (unit, src.unit) match {
    case (Month, Month) => n % src.n == 0
    case (Year, Year)   => n % src.n == 0
    case (Year, Month)  => (n * 12) % src.n == 0
    case (Month, _) | (Year, _) =>
      // calendar windows start on day boundaries; any fixed unit that
      // divides a day can serve them
      src.fixedSeconds.exists(s => 86400L % s == 0)
    case _ => (fixedSeconds, src.fixedSeconds) match {
      case (Some(a), Some(b)) => a % b == 0
      case _ => false
    }
  }
}

object CandleDuration {
  private val Pattern = "^([0-9]+)\\s*(Sec|Min|H|D|W|M|Y)$".r

  /** Parse the reference's timeframe strings: 1Sec 5Min 1H 4H 1D 1W 1M 1Y
    * (utils/timeframe.go:34-60 suffix table).
    */
  def parse(s: String): CandleDuration = s.trim match {
    case Pattern(n, u) =>
      val unit = u match {
        case "Sec" => CandleUnit.Sec
        case "Min" => CandleUnit.Min
        case "H" => CandleUnit.Hour
        case "D" => CandleUnit.Day
        case "W" => CandleUnit.Week
        case "M" => CandleUnit.Month
        case "Y" => CandleUnit.Year
      }
      CandleDuration(n.toInt, unit)
    case other => throw new IllegalArgumentException(s"bad timeframe: '$other'")
  }

  /** Pick the best stored timeframe that can serve a query for `want`:
    * the widest stored TF that divides it (reference QueryableTimeframe,
    * utils/timeframe.go:189-197). Returns None if nothing divides.
    */
  def queryable(want: CandleDuration, stored: Seq[CandleDuration]): Option[CandleDuration] =
    stored.filter(want.divisibleBy).sortBy(-_.approxSeconds).headOption

  /** LIMIT scaling when serving `want` from `src`: how many src rows
    * cover n want-windows (QueryableNrecords, utils/timeframe.go:200-208).
    */
  def scaleLimit(want: CandleDuration, src: CandleDuration, n: Int): Int = {
    val factor = math.max(1L, want.approxSeconds / math.max(1L, src.approxSeconds))
    math.toIntExact(math.min(Int.MaxValue.toLong, n.toLong * factor))
  }
}
