package graft

// Temporary diagnostic main (not part of the library surface): phase
// timing of the q_queryservice_wide shape — 16k-symbol writeMulti then
// a wildcard LAST-2 — to locate the local-FS constant.
object WideProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val rawFs = sys.env.get("SPARK_GRAFT_RAW_FS").contains("1")
    // BucketCatalog defaults the committer to v2 (set-if-null); this
    // toggle forces v1 so the merge-rename cost is actually measurable.
    val v1 = sys.env.get("SPARK_GRAFT_COMMITTER_V1").contains("1")
    var bb = b
    if (rawFs)
      bb = bb.config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    if (v1)
      bb = bb.config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "1")
    val spark = bb.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // persisted so the phases are additive — without it writeMulti
    // would silently re-pay the events read inside the write timing
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(concat(lit("W"), pmod(col("event_id"), lit(16000)).cast("string")).as("symbol"),
        col("Epoch"), col("Nanoseconds"), col("value"), col("event_id"))
      .persist()
    phase("events materialize")(ev.count())

    val root = java.nio.file.Files.createTempDirectory("graft-wideprobe").toString
    val cat = new graft.catalog.BucketCatalog(spark, root)
    phase("writeMulti 16k")(cat.writeMulti("WEV", "1Sec", ev))

    val qs = new graft.api.QueryService(cat)
    val res = phase("queryMulti plan+exec") {
      qs.queryMulti(graft.api.QueryRequest("*/1Sec/WEV",
        columns = Seq("value", "event_id"),
        limit = Some(2), limitFromStart = false)).count()
    }
    println(s"[probe] rows $res  rawFs=$rawFs forceCommitterV1=$v1")
    spark.stop()
  }
}
