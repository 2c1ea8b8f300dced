package graft

// Temporary diagnostic main (not part of the library surface): phase
// decomposition of q_pipeline_corpus plus three consecutive
// single-process draws of q_pipeline_corpus and q_text_winnow — the
// attribution discipline for the r8->r9 bench drift (5.02->8.07 s and
// 1.07->1.62 s respectively): a stage regression shows up in the
// phase table, ambient variance shows up as draw spread.
object CorpusProbe {
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

    // ---- phase decomposition (2 rounds: warm JVM vs cold) ----
    for (rnd <- 1 to 2) {
      println(s"[probe] ---- corpus phases, round $rnd ----")
      spark.sharedState.cacheManager.clearCache()
      val d = graft.ops.TextAnalysis.withLangId(
        graft.ops.TextAnalysis.withQuality(
          graft.ops.TextAnalysis.withTokenCounts(
            graft.sources.Tables.documents(spark, sfDir))))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      phase("featured materialize")(d.count())
      val f = d.filter(col("lang_pred") === "en" && col("quality") >= 0.6)
      val canonIds = phase("exactGroups plan")(
        graft.ops.Dedup.exactGroups(f).select(col("canonical_id").as("doc_id")))
      val canon = f.join(canonIds, Seq("doc_id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      phase("canon materialize")(canon.count())
      val losers = phase("jaccardPairs losers")(
        graft.ops.Dedup.jaccardPairs(canon, threshold = 0.4, n = 3,
            collapseExact = false)
          .select(col("id2").as("doc_id")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      phase("losers materialize")(losers.count())
      phase("anti-join agg")(
        canon.join(losers, Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("n_docs"),
            round(avg(col("quality")), 6).as("avg_quality"),
            sum(col("n_tokens")).as("total_tokens")).collect())
      losers.unpersist(); canon.unpersist(); d.unpersist()
    }

    // ---- three consecutive full-entry draws, bench-identical shape ----
    for (name <- Seq("q_pipeline_corpus", "q_text_winnow"); draw <- 1 to 3) {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[probe] draw $name #$draw ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n rows)")
    }
    spark.stop()
  }
}
