package graft

import graft.core.{CandleDuration, CandleUnit}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property checks on the window algebra every candler builds on
  * (utils/timeframe.go Truncate/Ceil semantics): for ANY epoch and ANY
  * timeframe, truncate/ceil must bracket the epoch, be idempotent on
  * window starts, and align to their calendar grid.
  */
class CandlePropSpec extends SparkSpec {
  import spark.implicits._

  private val tfGen: Gen[CandleDuration] = for {
    unit <- Gen.oneOf[CandleUnit](CandleUnit.Sec, CandleUnit.Min, CandleUnit.Hour,
      CandleUnit.Day, CandleUnit.Week, CandleUnit.Month, CandleUnit.Year)
    n <- unit match {
      case CandleUnit.Sec => Gen.oneOf(1, 5, 30)
      case CandleUnit.Min => Gen.oneOf(1, 5, 15)
      case CandleUnit.Hour => Gen.oneOf(1, 4)
      case CandleUnit.Day => Gen.oneOf(1, 7)
      case CandleUnit.Week => Gen.oneOf(1, 2)
      case CandleUnit.Month => Gen.oneOf(1, 3, 12)
      case CandleUnit.Year => Gen.oneOf(1, 5)
    }
  } yield CandleDuration(n, unit)

  // 1970..2100, plus second-boundary epochs around DST/leap edges
  private val epochGen: Gen[Long] = Gen.frequency(
    8 -> Gen.chooseNum(0L, 4102444800L),
    1 -> Gen.oneOf(0L, 951782399L, 951782400L /* 2000-02-29 */,
      1709251199L, 1709251200L /* 2024-03-01 */, 4102444799L))

  private def eval(tf: CandleDuration, epochs: Seq[Long]): Seq[(Long, Long, Long)] =
    epochs.toDF("e")
      .select(col("e"), tf.truncate(col("e")).as("t"), tf.ceil(col("e")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("truncate/ceil bracket the epoch, are idempotent, and align to their grid") {
    val prop = Prop.forAll(tfGen, Gen.listOfN(8, epochGen)) { (tf, epochs) =>
      val rows = eval(tf, epochs)
      val bracket = rows.forall { case (e, t, c) => t <= e && e < c }
      // the scalar (driver-side) ceil/truncate agree with the Column
      // versions — shelf deadlines, the cascade's literal recompute
      // bounds, and query plans share one window algebra
      val scalarOk = rows.forall { case (e, _, c) => tf.ceilEpoch(e) == c }
      assert(scalarOk, s"ceilEpoch diverges from Column ceil for ${tf.string}")
      val scalarTruncOk = rows.forall { case (e, t, _) => tf.truncateEpoch(e) == t }
      assert(scalarTruncOk, s"truncateEpoch diverges from Column truncate for ${tf.string}")
      // a window start truncates to itself; ceil(start-of-window) = next window
      val starts = rows.map(_._2)
      val again = eval(tf, starts)
      val idem = again.forall { case (s, t2, _) => t2 == s }
      val gridOk = tf.unit match {
        case CandleUnit.Week =>
          // ISO Monday: (epochDay + 3) % 7 == 0 and multi-week spans are exact
          rows.forall { case (_, t, c) =>
            (t / 86400L + 3) % (7L * tf.n) == 0 && c - t == tf.fixedSeconds.get }
        case CandleUnit.Month | CandleUnit.Year =>
          // calendar starts: midnight on the 1st (of an aligned month/year)
          rows.forall { case (_, t, c) =>
            val zdt = java.time.Instant.ofEpochSecond(t).atZone(java.time.ZoneOffset.UTC)
            val cz = java.time.Instant.ofEpochSecond(c).atZone(java.time.ZoneOffset.UTC)
            val monthsOk =
              if (tf.unit == CandleUnit.Month)
                ((zdt.getYear - 1970) * 12 + zdt.getMonthValue - 1) % tf.n == 0 &&
                  java.time.temporal.ChronoUnit.MONTHS.between(zdt, cz) == tf.n
              else (zdt.getYear - 1970) % tf.n == 0 &&
                cz.getYear - zdt.getYear == tf.n && cz.getDayOfYear == 1
            zdt.getDayOfMonth == 1 && zdt.getHour == 0 && zdt.getMinute == 0 && monthsOk
          }
        case _ =>
          rows.forall { case (_, t, c) =>
            t % tf.fixedSeconds.get == 0 && c - t == tf.fixedSeconds.get }
      }
      bracket && idem && gridOk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("queryable substitution picks the widest divisor and scales limits exactly") {
    val stored = Seq("1Min", "5Min", "1H", "1D").map(CandleDuration.parse)
    assert(CandleDuration.queryable(CandleDuration.parse("15Min"), stored)
      .map(_.string).contains("5Min"))
    assert(CandleDuration.queryable(CandleDuration.parse("1W"), stored)
      .map(_.string).contains("1D"))
    assert(CandleDuration.queryable(CandleDuration.parse("7Sec"), stored).isEmpty)
    assert(CandleDuration.scaleLimit(
      CandleDuration.parse("15Min"), CandleDuration.parse("5Min"), 4) == 12)
  }
}
