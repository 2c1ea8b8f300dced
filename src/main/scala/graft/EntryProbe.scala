package graft

// Diagnostic main (not part of the library surface): three consecutive
// single-process draws of arbitrary SparkEntry entries — the drift
// attribution discipline (a stage regression reproduces across draws;
// ambient shared-box variance shows up as draw spread). Entries come
// from args (or SPARK_GRAFT_PROBE, comma-separated); the corpus dir
// from SPARK_GRAFT_SF_DIR.
object EntryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args.toSeq
      else sys.env.getOrElse("SPARK_GRAFT_PROBE", "q_pipeline_corpus")
        .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (known, unknown) = names.partition(SparkEntry.queries.contains)
    unknown.foreach(n => println(
      s"[probe] SKIP unknown entry '$n' (valid names: SparkEntry.queries keys, " +
        s"e.g. ${SparkEntry.queries.keys.toSeq.sorted.take(5).mkString(", ")}, ...)"))
    // one failing draw must not abort the sweep — the partial evidence
    // (which entries/draws failed, which held) IS the attribution
    for (name <- known; draw <- 1 to 3) {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[probe] draw $name #$draw ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n rows)")
      } catch {
        case e: Throwable => println(
          f"[probe] draw $name #$draw FAILED after ${(System.nanoTime() - t0) / 1e9}%8.2f s: " +
            Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n').take(200))
      }
    }
    spark.stop()
  }
}
