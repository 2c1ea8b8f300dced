package graft

import graft.catalog.BucketCatalog
import graft.cli.Session
import java.nio.file.Files
import scala.collection.mutable

/** CLI session command goldens
  * (cmd/connect/session/client.go:67-82 command table;
  * help.go:27-36 \create syntax).
  */
class CliSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): (BucketCatalog, Session, mutable.ArrayBuffer[String]) = {
    val root = Files.createTempDirectory("graft-cli").toString
    val cat = new BucketCatalog(spark, root)
    val lines = mutable.ArrayBuffer[String]()
    (cat, new Session(spark, cat, lines += _), lines)
  }

  test("create / getinfo / destroy cycle with reference type names") {
    val (cat, s, lines) = fresh()
    s.exec("""\create TSLA/1Min/OHLCV:Symbol/Timeframe/AttributeGroup Open,High,Low,Close/float32:Volume/int32 fixed""")
    assert(lines.exists(_.contains("created")))
    s.exec("""\getinfo TSLA/1Min/OHLCV""")
    val info = lines.mkString("\n")
    assert(info.contains("RecordType: FIXED") && info.contains("TF: 1Min"))
    assert(info.contains("Open:float32") && info.contains("Volume:int32"))
    s.exec("""\destroy TSLA/1Min/OHLCV""")
    assert(cat.listSymbols("OHLCV").isEmpty)
  }

  test("load / show / trim round trip") {
    val (cat, s, lines) = fresh()
    // CSV with epoch seconds at 2020-01-02 + offsets
    val csvDir = Files.createTempDirectory("graft-cli-csv").toString + "/d"
    Seq((1577923200L, 1.5), (1577923260L, 2.5), (1578009600L, 3.5))
      .toDF("Epoch", "Price").coalesce(1)
      .write.option("header", "true").csv(csvDir)
    s.exec(s"""\\load TSLA/1Min/TICK $csvDir""")
    assert(lines.exists(_.contains("loaded 3 rows")))

    val shown = s.exec("""\show TSLA/1Min/TICK 2020-01-02 2020-01-02-23:59:59""").get
    assert(shown.count() == 2) // third row is on Jan 3
    assert(lines.exists(_.contains("Price")))

    s.exec("""\trim TSLA/1Min/TICK 2020-01-03""")
    val after = s.exec("""\show TSLA/1Min/TICK 2020-01-01""").get
    assert(after.count() == 2)
    assert(after.select("Epoch").as[Long].collect().forall(_ < 1578009600L))
  }

  test("show csv writes the reference's output file (show.go:80-81)") {
    val root = Files.createTempDirectory("graft-cli2").toString
    val cat = new BucketCatalog(spark, root)
    val lines = mutable.ArrayBuffer[String]()
    val target = Files.createTempDirectory("graft-cli-out").toString + "/mstore-csv-output.csv"
    val s = new Session(spark, cat, lines += _, csvTarget = target)
    cat.write(graft.core.TimeBucketKey.parse("TSLA/1Min/TICK"),
      Seq((1577923200L, 1.5), (1577923260L, 2.5)).toDF("Epoch", "Price"))
    s.exec("""\show TSLA/1Min/TICK 2020-01-02 csv""")
    assert(lines.exists(_.contains(s"wrote 2 rows to $target")))
    val got = scala.io.Source.fromFile(target).getLines().toSeq
    assert(got.head == "Epoch,Price,symbol")
    assert(got.tail.toSet == Set("1577923200,1.5,TSLA", "1577923260,2.5,TSLA"))
    // rows went to the file, not the console
    assert(!lines.exists(_.startsWith("Epoch")))
  }

  test("anything else runs as SQL; string16 create enforces the cap") {
    val (cat, s, _) = fresh()
    s.exec("""\create X/1Sec/NOTES:Symbol/Timeframe/AttributeGroup Note/string16 variable""")
    val (schema, variable) = cat.getInfo("NOTES")
    assert(variable)
    import org.apache.spark.sql.functions.col
    cat.write(graft.core.TimeBucketKey.parse("X/1Sec/NOTES"),
      Seq((1L, 0, "ok")).toDF("Epoch", "Nanoseconds", "Note"))
    intercept[Exception] {
      cat.write(graft.core.TimeBucketKey.parse("X/1Sec/NOTES"),
        Seq((2L, 0, "x" * 17)).toDF("Epoch", "Nanoseconds", "Note"))
    }
    val rows = s.exec("SELECT Note FROM `X/1Sec/NOTES`").get.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("ok"))
  }
}
