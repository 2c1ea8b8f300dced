package graft

/** Diagnostic main (not part of the library surface): dump
  * `.explain("formatted")` for SparkEntry entries to files — the plan
  * evidence the optimization rounds commit under plans/rNN/.
  *
  * Args: an output directory followed by entry names (or
  * SPARK_GRAFT_PROBE); a `_before`/`_after` suffix for the file names
  * comes from SPARK_GRAFT_PLAN_TAG (default "after"). Corpus dir from
  * SPARK_GRAFT_SF_DIR. NOTE: entries that mutate on-disk state
  * (catalog writes, index builds) explain only their final read —
  * the plan of record for those is the per-phase profile, not this
  * dump.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/plans")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "after")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else sys.env.getOrElse("SPARK_GRAFT_PROBE", "")
        .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for (name <- names; fn <- SparkEntry.queries.get(name)) {
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name.stripPrefix("q_")}_$tag.txt"), plan)
        println(s"[explain] wrote $name ($tag)")
      } catch {
        case e: Throwable => println(s"[explain] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
