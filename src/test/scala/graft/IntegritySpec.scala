package graft

import graft.catalog.{BucketCatalog, Integrity}
import graft.core.TimeBucketKey
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Integrity evaluation goldens (cmd/tool/integrity role): healthy
  * partitions pass; injected duplicate keys, year-misfiled rows, and
  * a corrupted file each surface as report rows.
  */
class IntegritySpec extends SparkSpec {
  import spark.implicits._

  private val ohlcv = StructType(Seq(
    StructField("Epoch", LongType), StructField("Open", DoubleType)))

  test("append-path partitions (multi-file, then compacted) stay integral") {
    val root = Files.createTempDirectory("graft-integrity-app").toString
    val cat = new BucketCatalog(spark, root)
    // forward ingest: creation merge + two appends + one late merge
    cat.writeMulti("OHLCV", "1Min",
      Seq(("A", 1609459260L, 1.0), ("B", 1609459260L, 2.0)).toDF("symbol", "Epoch", "Open"))
    cat.writeMulti("OHLCV", "1Min",
      Seq(("A", 1609459320L, 3.0), ("B", 1609459320L, 4.0)).toDF("symbol", "Epoch", "Open"))
    cat.writeMulti("OHLCV", "1Min",
      Seq(("A", 1609459380L, 5.0)).toDF("symbol", "Epoch", "Open"))
    cat.writeMulti("OHLCV", "1Min",
      Seq(("A", 1609459320L, 9.0)).toDF("symbol", "Epoch", "Open")) // late: merge path
    val report = Integrity.check(spark, root).collect()
    assert(report.nonEmpty)
    assert(report.forall(_.getAs[Boolean]("ok")),
      s"append-path store must be integral: ${report.mkString("; ")}")
    assert(report.map(_.getAs[Long]("n_dup_keys")).sum == 0L,
      "append path must never land duplicate keys")
    assert(report.map(_.getAs[Long]("n_rows")).sum == 5L)
  }

  test("healthy catalog reports ok; injected violations are caught") {
    val root = Files.createTempDirectory("graft-integrity").toString
    val cat = new BucketCatalog(spark, root)
    val tbk = TimeBucketKey.parse("AAPL/1Min/OHLCV")
    cat.create(tbk, ohlcv, isVariable = false)
    // healthy rows in 2021
    cat.write(tbk, Seq((1609459260L, 1.0), (1609459320L, 2.0)).toDF("Epoch", "Open"))
    val healthy = Integrity.check(spark, root)
    assert(healthy.count() == 1)
    assert(healthy.head.getAs[Boolean]("ok"))
    assert(healthy.head.getAs[Long]("n_rows") == 2L)

    // inject: a duplicate key + a row misfiled into year=1999, written
    // straight into the partition tree (bypassing the catalog's dedup).
    // Bucketed layout: symbol is a data column; the paths name the
    // (timeframe, year, sbucket) slice the out-of-band writer hit.
    val sb = BucketCatalog.symbolBucket("AAPL", BucketCatalog.DefaultSymbolBuckets)
    Seq(("AAPL", 1609459260L, 9.0)).toDF("symbol", "Epoch", "Open")
      .write.mode("append")
      .parquet(s"$root/OHLCV/timeframe=1Min/year=2021/sbucket=$sb")
    Seq(("AAPL", 1609459500L, 3.0)).toDF("symbol", "Epoch", "Open")
      .write.mode("append")
      .parquet(s"$root/OHLCV/timeframe=1Min/year=1999/sbucket=$sb")
    // bucketed layout: data violations report under the symbol, the
    // foreign FILES under "*" (shared files carry no symbol path)
    val report = Integrity.check(spark, root).collect()
      .map(r => ((r.getAs[String]("symbol"), r.getAs[Int]("year")), r)).toMap
    assert(!report(("AAPL", 2021)).getAs[Boolean]("ok"))
    assert(report(("AAPL", 2021)).getAs[Long]("n_dup_keys") == 1L)
    assert(!report(("AAPL", 1999)).getAs[Boolean]("ok"))
    assert(report(("AAPL", 1999)).getAs[Long]("n_year_mismatch") == 1L)
    assert(report(("*", 2021)).getAs[Long]("n_foreign_files") == 1L)
    assert(!report(("*", 2021)).getAs[Boolean]("ok"))
    // year-range restriction skips the misfiled partition
    val scoped = Integrity.check(spark, root, yearStart = 2020, yearEnd = 2022).collect()
    assert(scoped.map(_.getAs[Int]("year")).toSet == Set(2021))

    // corrupt a data file: the group surfaces an error row, not a crash
    val part = Paths.get(s"$root/OHLCV/timeframe=1Min/year=2021/sbucket=$sb")
    val dataFile = Files.list(part).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.write(dataFile, Array.fill(32)(0x7f.toByte))
    val broken = Integrity.check(spark, root).collect()
    assert(broken.exists(r => !r.getAs[Boolean]("ok") && r.getAs[String]("error") != null))
  }
}
