package graft

// Temporary diagnostic main (not part of the library surface):
// quantify the SQ8 serving claim — memory footprint and scan time of
// the compressed (vmin, δ, 1 byte/dim) corpus vs the raw float32
// corpus on a deterministic synthetic corpus far larger than the
// bench fixtures. Both representations are persisted and counted
// before timing so the phases measure the SCAN, not the generate.
object Sq8Probe {
  def main(args: Array[String]): Unit = {
    val nRows = sys.env.getOrElse("SPARK_GRAFT_SQ8_ROWS", "1000000").toLong
    val dim = sys.env.getOrElse("SPARK_GRAFT_SQ8_DIM", "64").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.VectorFunctions

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def footprint(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.optimizedPlan.stats.sizeInBytes.toLong

    // deterministic pseudo-random floats from (id, j) hashes
    val raw = spark.range(nRows).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)),
          j => (pmod(xxhash64(col("id"), j), lit(1000)).cast("double") / 500.0 - 1.0)
            .cast("float"))
          .as("embedding"))
      .persist()
    phase("materialize raw")(raw.count())

    val sq8 = graft.ops.Similarity.sq8Encode(raw).persist()
    phase("encode + materialize sq8")(sq8.count())

    val queries = raw.filter(col("vec_id") < 8)
    phase("brute scan (float32)")(
      graft.ops.Similarity.bruteForceTopK(raw, queries, k = 10).count())
    phase("sq8 scan (1 byte/dim)")(
      graft.ops.Similarity.sq8TopK(sq8, queries, k = 10).count())
    // second draws, JIT warm
    phase("brute scan, warm")(
      graft.ops.Similarity.bruteForceTopK(raw, queries, k = 10).count())
    phase("sq8 scan, warm")(
      graft.ops.Similarity.sq8TopK(sq8, queries, k = 10).count())

    println(f"[probe] rows=$nRows dim=$dim " +
      f"raw_cached=${footprint(raw)}%d B sq8_cached=${footprint(sq8)}%d B")
    spark.stop()
  }
}
