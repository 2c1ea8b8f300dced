package graft

import graft.catalog.BucketCatalog
import graft.core.TimeBucketKey
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Symbol / column naming edge cases (test_symbols_name.py: dashed,
  * underscored, case-variant column names survive the round trip
  * unchanged; dotted symbols like BRK.A file and list correctly).
  */
class NamesSpec extends SparkSpec {
  import spark.implicits._

  test("column-name variants round-trip unchanged") {
    val root = Files.createTempDirectory("graft-names").toString
    val cat = new BucketCatalog(spark, root)
    val names = Seq("Ask", "_ask", "_Ask", "L1Ask", "l1ask", "L1-Ask", "l1_ask")
    names.zipWithIndex.foreach { case (cn, i) =>
      val tbk = TimeBucketKey.parse(s"SYM$i/1Min/T$i")
      cat.create(tbk, StructType(Seq(
        StructField("Epoch", LongType), StructField(cn, FloatType))), isVariable = false)
      cat.write(tbk, Seq((1483228800L, 10.0)).toDF("Epoch", cn))
      val got = cat.read(tbk).select("Epoch", cn).collect()
      assert(got.length == 1 && got.head.getLong(0) == 1483228800L)
      assert(got.head.getFloat(1) == 10.0f)
      assert(cat.getInfo(s"T$i")._1.fieldNames.contains(cn))
    }
  }

  test("dotted and dashed symbols file, list, query and destroy correctly") {
    val root = Files.createTempDirectory("graft-names2").toString
    val cat = new BucketCatalog(spark, root)
    val symbols = Seq("BRK.A", "BF-B", "RDS_A")
    symbols.foreach { s =>
      cat.write(TimeBucketKey.parse(s"$s/1Min/TICK"),
        Seq((60L, 1.0)).toDF("Epoch", "Price"))
    }
    assert(cat.listSymbols("TICK") == symbols.sorted)
    symbols.foreach { s =>
      assert(cat.listTimeframes("TICK", s) == Seq("1Min"))
      assert(cat.latestYear(TimeBucketKey.parse(s"$s/1Min/TICK")).contains(1970))
      assert(cat.read(TimeBucketKey.parse(s"$s/1Min/TICK")).count() == 1)
    }
    // wildcard query service sees them all in one scan
    val qs = new graft.api.QueryService(cat)
    val all = qs.queryMulti(graft.api.QueryRequest("*/1Min/TICK"))
    assert(all.select("symbol").distinct().collect().map(_.getString(0)).sorted.toSeq
      == symbols.sorted)
    // range delete + destroy on a dotted symbol leave the others alone
    cat.deleteRange(TimeBucketKey.parse("BRK.A/1Min/TICK"), 0L)
    assert(cat.read(TimeBucketKey.parse("BRK.A/1Min/TICK")).count() == 0)
    cat.destroy(TimeBucketKey.parse("BF-B/1Min/TICK"))
    assert(cat.listSymbols("TICK") == Seq("BRK.A", "RDS_A"))
  }
}
