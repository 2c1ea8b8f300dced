package graft

import graft.catalog.BucketCatalog
import graft.core.TimeBucketKey
import graft.streaming.{PushBus, Shelf, StreamTrigger, SubscriptionSet}
import org.apache.spark.sql.types._
import java.nio.file.Files
import scala.collection.mutable

/** Stream push + shelf semantics, mirroring the reference's
  * streamtrigger/shelf behavior (contrib/stream): 1Min bars push
  * immediately, coarser bars shelve until their window deadline,
  * same-window replacements don't double-emit, and TBK glob
  * subscriptions gate delivery.
  */
class PushSpec extends SparkSpec {
  import spark.implicits._

  private class CollectingBus extends PushBus {
    val got = mutable.ArrayBuffer[(String, Map[String, Any])]()
    def push(tbk: String, payload: Map[String, Any]): Unit =
      synchronized { got += (tbk -> payload) }
  }

  private val ohlcv = StructType(Seq(
    StructField("Epoch", LongType), StructField("Open", DoubleType),
    StructField("Close", DoubleType)))

  test("glob subscriptions match per '/'-level (stream.go:90-101)") {
    val s = new SubscriptionSet
    s.subscribe("*/1Min/OHLCV")
    assert(s.subscribed("AAPL/1Min/OHLCV"))
    assert(s.subscribed("MSFT/1Min/OHLCV"))
    assert(!s.subscribed("AAPL/5Min/OHLCV"))
    assert(!s.subscribed("AAPL/X/1Min/OHLCV")) // * doesn't cross '/'
    s.subscribe("AAPL/*/*")
    assert(s.subscribed("AAPL/5Min/OHLCV"))
  }

  test("1Min writes push the latest bar immediately; unsubscribed keys are dropped") {
    val root = Files.createTempDirectory("graft-push").toString
    val cat = new BucketCatalog(spark, root)
    cat.create(TimeBucketKey.parse("AAPL/1Min/OHLCV"), ohlcv, isVariable = false)
    cat.write(TimeBucketKey.parse("AAPL/1Min/OHLCV"),
      Seq((60L, 1.0, 1.5), (120L, 2.0, 2.5)).toDF("Epoch", "Open", "Close"))
    cat.write(TimeBucketKey.parse("MSFT/1Min/OHLCV"),
      Seq((60L, 9.0, 9.5)).toDF("Epoch", "Open", "Close"))
    val bus = new CollectingBus
    val subs = new SubscriptionSet
    subs.subscribe("AAPL/1Min/*")
    val trig = new StreamTrigger(cat, "OHLCV", bus, subs)
    try {
      trig.fire("1Min", Seq(("AAPL", 120L), ("MSFT", 60L)).toDF("symbol", "Epoch"))
      assert(bus.got.map(_._1) == Seq("AAPL/1Min/OHLCV")) // MSFT not subscribed
      assert(bus.got.head._2("Open") == 2.0) // the LATEST bar, not the batch row
    } finally trig.close()
  }

  test("distributed bus pushes sub-minute bars partition-side, no driver collect") {
    val root = Files.createTempDirectory("graft-push-dist").toString
    val cat = new BucketCatalog(spark, root)
    cat.create(TimeBucketKey.parse("AAPL/1Min/OHLCV"), ohlcv, isVariable = false)
    cat.write(TimeBucketKey.parse("AAPL/1Min/OHLCV"),
      Seq((60L, 1.0, 1.5), (120L, 2.0, 2.5)).toDF("Epoch", "Open", "Close"))
    cat.write(TimeBucketKey.parse("MSFT/1Min/OHLCV"),
      Seq((60L, 9.0, 9.5)).toDF("Epoch", "Open", "Close"))
    val subs = new SubscriptionSet
    subs.subscribe("AAPL/1Min/*")
    PushSpec.staticGot.clear()
    // serialized bus copies on the executors write into JVM-static
    // state (local mode shares the JVM) — proves the push happened in
    // the tasks, not on the driver
    val trig = new StreamTrigger(cat, "OHLCV", new CollectingBus, subs,
      distributedBus = Some(new PushSpec.StaticBus))
    try {
      trig.fire("1Min", Seq(("AAPL", 120L), ("MSFT", 60L)).toDF("symbol", "Epoch"))
      assert(PushSpec.staticGot.map(_._1).toSeq == Seq("AAPL/1Min/OHLCV"))
      assert(PushSpec.staticGot.head._2("Open") == 2.0)
    } finally trig.close()
  }

  test("coarse timeframes shelve until the window deadline (shelf.go deadline)") {
    val root = Files.createTempDirectory("graft-shelf").toString
    val cat = new BucketCatalog(spark, root)
    cat.create(TimeBucketKey.parse("AAPL/5Min/OHLCV"), ohlcv, isVariable = false)
    cat.write(TimeBucketKey.parse("AAPL/5Min/OHLCV"),
      Seq((600L, 1.0, 1.5)).toDF("Epoch", "Open", "Close"))
    val bus = new CollectingBus
    val subs = new SubscriptionSet
    subs.subscribe("*/*/*")
    // bar at epoch 600 in a 5Min window → deadline epoch 900; pin the
    // trigger clock 150 ms before it so the shelf emits on expiry
    val trig = new StreamTrigger(cat, "OHLCV", bus, subs,
      nowMs = () => 900L * 1000 - 150)
    try {
      trig.fire("5Min", Seq(("AAPL", 600L)).toDF("symbol", "Epoch"))
      assert(bus.got.isEmpty) // not yet — shelved
      assert(trig.shelvedKeys == Seq("AAPL/5Min/OHLCV"))
      Thread.sleep(400)
      assert(bus.got.map(_._1) == Seq("AAPL/5Min/OHLCV"))
    } finally trig.close()
  }

  test("calendar timeframes shelve to real month end, not the average-month grid") {
    val root = Files.createTempDirectory("graft-shelf-1m").toString
    val cat = new BucketCatalog(spark, root)
    cat.create(TimeBucketKey.parse("AAPL/1M/OHLCV"), ohlcv, isVariable = false)
    // bar at 2021-01-01; its window closes at 2021-02-01 00:00 UTC.
    // The old approxSeconds grid put the deadline BEFORE the bar's own
    // epoch (611×2629746+2629746 < 1609459200) → instant bogus emit.
    val jan1 = 1609459200L
    val feb1 = 1612137600L
    cat.write(TimeBucketKey.parse("AAPL/1M/OHLCV"),
      Seq((jan1, 1.0, 1.5)).toDF("Epoch", "Open", "Close"))
    val bus = new CollectingBus
    val subs = new SubscriptionSet
    subs.subscribe("*/*/*")
    val trig = new StreamTrigger(cat, "OHLCV", bus, subs,
      nowMs = () => feb1 * 1000 - 150) // pin clock 150 ms before month end
    try {
      trig.fire("1M", Seq(("AAPL", jan1)).toDF("symbol", "Epoch"))
      assert(bus.got.isEmpty, "1M bar must shelve until month end")
      assert(trig.shelvedKeys == Seq("AAPL/1M/OHLCV"))
      Thread.sleep(400)
      assert(bus.got.map(_._1) == Seq("AAPL/1M/OHLCV"))
    } finally trig.close()
  }

  test("same-deadline replacement cancels the previous package (shelf.go:40-55)") {
    val emitted = mutable.ArrayBuffer[(String, Map[String, Any])]()
    val base = System.currentTimeMillis()
    val shelf = new Shelf((k, p) => emitted.synchronized { emitted += (k -> p) },
      nowMs = () => System.currentTimeMillis())
    try {
      val deadline = base + 250
      shelf.store("K/5Min/X", Map("v" -> 1), deadline)
      shelf.store("K/5Min/X", Map("v" -> 2), deadline) // replaces, cancels first
      Thread.sleep(500)
      assert(emitted.toSeq == Seq("K/5Min/X" -> Map("v" -> 2)))
      // different deadlines: both emit (old window still completes)
      val d1 = System.currentTimeMillis() + 150
      shelf.store("K/5Min/X", Map("v" -> 3), d1)
      shelf.store("K/5Min/X", Map("v" -> 4), d1 + 300)
      Thread.sleep(700)
      assert(emitted.drop(1).map(_._2("v")).toSeq == Seq(3, 4))
    } finally shelf.close()
  }
}

object PushSpec {
  val staticGot = new scala.collection.mutable.ArrayBuffer[(String, Map[String, Any])]()

  final class StaticBus extends PushBus with Serializable {
    def push(tbk: String, payload: Map[String, Any]): Unit =
      staticGot.synchronized { staticGot += (tbk -> payload) }
  }
}
