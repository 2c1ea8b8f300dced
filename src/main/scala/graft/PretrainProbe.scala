package graft

// Temporary diagnostic main (not part of the library surface): phase
// decomposition of q_pipeline_pretrain — locates which stage of the
// composite dominates (gate materialize, CC dedup, mixing, packing).
object PretrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"[probe] ---- round $round ----")
      spark.sharedState.cacheManager.clearCache()
      val gated = graft.ops.TextAnalysis
        .withRepetitionSignals(graft.sources.Tables.documents(spark, sfDir))
        .filter(col("gopher_keep"))
        .select(col("doc_id"), col("source"), col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      phase("gate materialize")(gated.count())
      val kept = phase("dedupedCorpus plan+exec")(
        graft.ops.Cluster.dedupedCorpus(gated, threshold = 0.4, n = 3))
      val keptP = kept.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      phase("kept materialize")(keptP.count())
      val rates = Map(
        "src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25, "src4" -> 0.1)
      val mixed = graft.ops.Sampling.weighted(keptP, rates, defaultRate = 0.3)
      phase("mix+pack+agg")(
        graft.ops.Packing.manifest(mixed, budget = 256)
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"),
            (max(col("chunk_last")) + 1).as("n_chunks")).collect())
      keptP.unpersist()
      gated.unpersist()
    }
    spark.stop()
  }
}
