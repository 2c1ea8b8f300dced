package graft

// Temporary diagnostic main (not part of the library surface):
// sustained-ingest shape — N successive writeMulti commits against one
// symbol-bucketed group, the 1-minute-bar cadence the reference serves
// with in-place year-file writes. Records per-commit wall time, commit
// file count, and manifest bytes written, to evidence that commit cost
// is bounded by touched partitions + O(delta) metadata and stays FLAT
// as the commit history grows (manifest fold depth is capped by the
// snapshot checkpoint cadence; vacuum keeps dead files bounded by the
// grace window).
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val symbols = sys.env.getOrElse("SPARK_GRAFT_PROBE_SYMBOLS", "2000").toInt
    val commits = sys.env.getOrElse("SPARK_GRAFT_PROBE_COMMITS", "30").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val cat = new graft.catalog.BucketCatalog(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def manifestBytes(): Long = {
      val dir = new org.apache.hadoop.fs.Path(s"$root/BARS/_graft_manifest")
      if (!fs.exists(dir)) 0L
      else fs.listStatus(dir).map(_.getLen).sum
    }
    println(s"[ingest] $symbols symbols x $commits commits -> $root")
    var prevManifest = 0L
    val times = (1 to commits).map { c =>
      // one minute of bars for every symbol, epochs advancing per commit
      val batch = (1 to symbols).map { i =>
        (s"S$i", 1609459200L + c * 60L, i * 1.0 + c, i * 1.0 + c + 0.5)
      }.toDF("symbol", "Epoch", "Open", "Close")
      val t0 = System.nanoTime()
      cat.writeMulti("BARS", "1Min", batch)
      val dt = (System.nanoTime() - t0) / 1e9
      val live = cat.liveFiles("BARS").map(_.size).getOrElse(0)
      val mb = manifestBytes()
      println(f"[ingest] commit $c%3d  ${dt}%6.2f s  live files $live%5d  " +
        f"manifest +${mb - prevManifest}%7d B (total ${mb}%8d)")
      prevManifest = mb
      dt
    }
    val h = times.take(commits / 3); val t = times.takeRight(commits / 3)
    println(f"[ingest] first-third mean ${h.sum / h.size}%6.2f s, " +
      f"last-third mean ${t.sum / t.size}%6.2f s  " +
      f"(flat if the ratio stays ~1; history depth ${commits})")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
