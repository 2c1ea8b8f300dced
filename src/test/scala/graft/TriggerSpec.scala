package graft

import graft.catalog.BucketCatalog
import graft.core.TimeBucketKey
import graft.streaming.{DownsampleCascade, IngestPipeline, Trigger, TriggerRegistry}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import scala.collection.mutable

/** Trigger registry + ingest pipeline: glob-matched dispatch after the
  * write (plugins/trigger/trigger.go + executor/written.go), with the
  * downsample cascade registered as an ordinary trigger.
  */
class TriggerSpec extends SparkSpec {
  import spark.implicits._

  private val ohlcv = StructType(Seq(
    StructField("Epoch", LongType), StructField("Open", DoubleType),
    StructField("High", DoubleType), StructField("Low", DoubleType),
    StructField("Close", DoubleType), StructField("Volume", DoubleType)))

  test("triggers fire only for matching TBK patterns, after the write") {
    val root = Files.createTempDirectory("graft-trig").toString
    val cat = new BucketCatalog(spark, root)
    cat.create(TimeBucketKey.parse("X/1Min/OHLCV"), ohlcv, isVariable = false)
    val registry = new TriggerRegistry
    val fired = mutable.ArrayBuffer[String]()
    registry.register("*/1Min/OHLCV", new Trigger {
      def fire(tbk: String, batch: DataFrame): Unit = synchronized {
        // write already durable when the trigger observes it
        assert(cat.read(TimeBucketKey.parse(tbk)).count() > 0)
        fired += tbk
      }
    })
    registry.register("*/5Min/*", (tbk: String, _: DataFrame) => fired += s"WRONG:$tbk")
    // downsample cascade as a registered trigger
    val cascade = new DownsampleCascade(cat, "OHLCV", "1Min", Seq("5Min"))
    registry.register("*/1Min/OHLCV",
      (_: String, batch: DataFrame) => cascade.cascade(batch.select("symbol", "Epoch")))

    val pipe = new IngestPipeline(cat, registry)
    val t0 = 1704708000L
    pipe.ingest(TimeBucketKey.parse("AAPL/1Min/OHLCV"),
      Seq((t0, 10.0, 10.5, 9.5, 10.2, 1.0), (t0 + 60, 11.0, 11.5, 10.5, 11.2, 2.0))
        .toDF("Epoch", "Open", "High", "Low", "Close", "Volume"))

    assert(fired.toSeq == Seq("AAPL/1Min/OHLCV"))
    val fiveMin = cat.read(TimeBucketKey.parse("AAPL/5Min/OHLCV")).collect()
    assert(fiveMin.length == 1 && fiveMin.head.getAs[Double]("Volume") == 3.0)
  }
}
