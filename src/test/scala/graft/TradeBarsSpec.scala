package graft

import graft.core.CandleDuration
import graft.functions.{TradeBars, TradeConditions}
import org.apache.spark.sql.functions._

/** Goldens mirroring the reference's models/bar_test.go:
  * field excludes (odd lot / corrected close / derivatively priced)
  * and the 1D official open/close rollup.
  */
class TradeBarsSpec extends SparkSpec {
  import spark.implicits._

  private def C(cs: Char*): Seq[Int] = cs.map(_.toInt)

  // 2020-11-20 10:03:00 UTC
  private val t = 1605866580L

  test("condition excludes per flag (TestFromTradesFieldExcludes)") {
    val trades = Seq(
      ("TEST", t, 0, 100.1, 10.0, C('@')), // regular sale
      ("TEST", t + 1, 0, 111.2, 11.0, C('I')), // odd lot: volume only
      ("TEST", t + 62, 0, 100.2, 12.0, C('@', '9')), // corrected close: no volume
      ("TEST", t + 63, 0, 99.6, 13.0, C('4')) // derivatively priced: no last
    ).toDF("symbol", "Epoch", "Nanoseconds", "Price", "Size", "Conditions")
    val bars = TradeBars.fromTrades(trades, CandleDuration.parse("1Min"))
      .orderBy("Epoch").collect()
    assert(bars.length == 2)
    val b0 = bars(0)
    assert(b0.getAs[Double]("Open") == 100.1)
    assert(b0.getAs[Double]("Close") == 100.1)
    assert(b0.getAs[Double]("High") == 100.1)
    assert(b0.getAs[Double]("Low") == 100.1)
    assert(b0.getAs[Double]("Volume") == 21.0) // odd lot still counts volume
    val b1 = bars(1)
    assert(b1.getAs[Double]("Open") == 100.2)
    assert(b1.getAs[Double]("Close") == 100.2) // deriv-priced doesn't update last
    assert(b1.getAs[Double]("High") == 100.2) // deriv-priced DOES update high/low
    assert(b1.getAs[Double]("Low") == 99.6)
    assert(b1.getAs[Double]("Volume") == 13.0) // corrected close excluded from volume
  }

  test("1D official close wins close AND replaces volume (TestFromTradesDailyRollup)") {
    val trades = Seq(
      ("TEST", t, 0, 100.1, 10.0, C('@')),
      ("TEST", t + 1, 0, 111.2, 11.0, C()), // no condition: all updates
      ("TEST", t + 62, 0, 100.2, 12.0, C('@')),
      ("TEST", t + 63, 0, 105.6, 130.0, C('M')), // official close
      ("TEST", t + 63, 1, 105.8, 31.0, C('T')) // after-hours: volume only
    ).toDF("symbol", "Epoch", "Nanoseconds", "Price", "Size", "Conditions")
    val bars = TradeBars.fromTrades(trades, CandleDuration.parse("1D")).collect()
    assert(bars.length == 1)
    val b = bars.head
    assert(b.getAs[Long]("Epoch") == 1605830400L) // 2020-11-20 00:00 UTC
    assert(b.getAs[Double]("Open") == 100.1)
    assert(b.getAs[Double]("Close") == 105.6) // official close price
    assert(b.getAs[Double]("High") == 111.2) // official close excluded from extrema
    assert(b.getAs[Double]("Low") == 100.1)
    assert(b.getAs[Double]("Volume") == 130.0) // official close REPLACES volume
  }

  test("1D official open overrides first trade's open") {
    val trades = Seq(
      ("TEST", t, 0, 100.0, 10.0, C('@')),
      ("TEST", t + 5, 0, 101.5, 0.0, C('Q')), // official open (no other updates)
      ("TEST", t + 9, 0, 102.0, 20.0, C('@'))
    ).toDF("symbol", "Epoch", "Nanoseconds", "Price", "Size", "Conditions")
    val bars = TradeBars.fromTrades(trades, CandleDuration.parse("1D")).collect()
    assert(bars.length == 1)
    assert(bars.head.getAs[Double]("Open") == 101.5)
    assert(bars.head.getAs[Double]("Close") == 102.0)
    assert(bars.head.getAs[Double]("Volume") == 30.0)
  }

  test("window with only excluded opens/volumes is dropped (bar.go:233-236)") {
    val trades = Seq(
      ("TEST", t, 0, 100.0, 10.0, C('I')), // odd lot only: open never set
      ("TEST", t + 60, 0, 100.0, 10.0, C('9')) // corrected close only: no volume
    ).toDF("symbol", "Epoch", "Nanoseconds", "Price", "Size", "Conditions")
    val bars = TradeBars.fromTrades(trades, CandleDuration.parse("1Min")).collect()
    assert(bars.isEmpty)
  }

  test("multi-condition trades AND their flags (conditionToUpdateInfo)") {
    val df = Seq(
      (C('@', 'I'), false, false, true), // regular+odd-lot → odd-lot wins
      (C('4', '9'), true, false, false), // deriv(HL ok, no last) + corrected(no vol)
      (C('Z'), true, false, true),
      (Seq.empty[Int], true, true, true)
    ).toDF("conds", "ehl", "el", "ev")
    val got = df.select(
      TradeConditions.updateHighLow(col("conds")).as("hl"),
      TradeConditions.updateLast(col("conds")).as("l"),
      TradeConditions.updateVolume(col("conds")).as("v"),
      col("ehl"), col("el"), col("ev")).collect()
    got.foreach { r =>
      assert(r.getBoolean(0) == r.getBoolean(3))
      assert(r.getBoolean(1) == r.getBoolean(4))
      assert(r.getBoolean(2) == r.getBoolean(5))
    }
  }
}
