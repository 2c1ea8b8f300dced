package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine fastText-style quality classifier (Joulin et al. 2016,
  * "Bag of Tricks for Efficient Text Classification" — the linear
  * bag-of-hashed-ngrams model CCNet and the LLaMA data pipeline use as
  * their web-quality gate): logistic regression over hashed
  * unigram+bigram bucket counts, trained by deterministic FULL-BATCH
  * gradient descent entirely inside the engine.
  *
  * Why this shape at 100 TB: each GD iteration is two
  * partial-aggregated shuffles (per-doc margins, then per-bucket
  * gradients) and one ≤ `buckets`-row collect — the Lloyd's-k-means
  * pattern already used by the IVF quantizer training. No sampling, no
  * row order dependence, no randomness: the same corpus always trains
  * the same model (and any SQL engine reproduces it term-for-term,
  * which is how the DuckDB oracle checks the unrolled iterations).
  *
  * The feature space is [[Sampling.hashedNgramBuckets]] — the same
  * md5-bucket convention as DSIR, so a pipeline can fit both from one
  * feature pass.
  */
object Classifier {

  /** Per-doc bucket COUNTS (id, __b, c): the sufficient statistics of
    * the linear model — duplicate features collapse into c, so the
    * iteration joins touch ~distinct (doc, bucket) rows, not the raw
    * token stream.
    */
  private def bucketCounts(df: DataFrame, buckets: Int,
                           id: String, text: String): DataFrame =
    Sampling.hashedNgramBuckets(df, buckets, id, text)
      .groupBy(col(id), col("__b"))
      .agg(count(lit(1)).cast("double").as("__c"))

  /** Trained model: bucket weights (size = buckets) and bias. */
  final case class Model(weights: Array[Double], bias: Double)

  /** Train on positive vs negative example corpora. Mean-gradient
    * full-batch GD from a zero init: per iteration,
    *   margin_d = bias + Σ_b c_db·w_b,  p_d = σ(margin_d),
    *   r_d = y_d − p_d,
    *   w_b += lr · Σ_d m_d·c_db·r_d / N,  bias += lr · Σ_d m_d·r_d / N
    * with m_d the clone multiplicity when the collapse gate fires
    * (each side collapses independently — labels are uniform per side
    * — making the fit bit-identical while iterations run over distinct
    * texts; the LM/TF-IDF/DSIR weighted-collapse argument).
    *
    * Documents with no tokens contribute nothing (their margin would
    * be pure bias; they are dropped by the feature pass on both the
    * train and score sides — the DSIR convention).
    */
  def trainQuality(pos: DataFrame, neg: DataFrame, buckets: Int = 1024,
                   iters: Int = 3, lr: Double = 1.0,
                   id: String = "doc_id", text: String = "text",
                   collapseExact: Boolean = true): Model = {
    require(buckets >= 2 && iters >= 1)
    val key = lower(trim(col(text)))
    // ONE probe job for both training sides (they are probed
    // unconditionally, so there is no short-circuit to lose)
    val (posHeavy, negHeavy) =
      if (collapseExact) Dedup.cloneHeavyBoth(pos, key, neg, key)
      else (false, false)
    def sideCounts(df: DataFrame, y: Double, heavy: Boolean): DataFrame =
      if (collapseExact && heavy) {
        val g = Dedup.cloneGroups(df, id, text)
        bucketCounts(g.select(col("__rep").as(id), col(text)), buckets, id, text)
          .join(g.select(col("__rep").as(id),
            size(col("__ids")).cast("double").as("__m")), id)
          .withColumn("__y", lit(y))
      } else
        bucketCounts(df, buckets, id, text)
          .withColumn("__m", lit(1.0)).withColumn("__y", lit(y))
    // one persisted sufficient-statistics relation feeds every
    // iteration (same cache-lifetime contract as the pair ops).
    // Two plan-level changes vs the naive loop (optimization guide
    // §1.2/§2.4; arithmetic identical, oracle-checked):
    //  - a PSEUDO-FEATURE row (__b = buckets, __c = 1) per document
    //    rides the relation. Its weight slot is pinned to 0.0 (wExt
    //    below), so margins are unchanged (+1·0.0), while the gradient
    //    aggregation's `buckets` group computes Σ m·1·r — the bias
    //    gradient — in the SAME job as the bucket gradients: one
    //    collect per iteration instead of two, and the margin relation
    //    is computed once per iteration instead of twice. A real
    //    feature can never collide with the slot (md5 % buckets
    //    ∈ [0, buckets)).
    //  - the relation is hash-partitioned on the doc id before the
    //    persist: the per-iteration margin aggregation (grouping keys
    //    ⊇ id) and the gradient join's counts side then reuse the
    //    cached partitioning instead of re-exchanging the relation
    //    every iteration (2 exchanges × iters removed; only the tiny
    //    per-doc margin relation still shuffles).
    val base = sideCounts(pos, 1.0, posHeavy)
      .unionByName(sideCounts(neg, 0.0, negHeavy))
    val pseudo = base.groupBy(col(id), col("__y"), col("__m"))
      .agg(count(lit(1)).as("__nf"))
      .select(col(id), lit(buckets.toLong).as("__b"), lit(1.0).as("__c"),
        col("__m"), col("__y"))
    val counts = base.unionByName(pseudo)
      .repartition(col(id))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // N = weighted doc count (one bounded agg off the pseudo rows —
    // exactly one per document with ≥ 1 token; null-guarded so an
    // empty/token-free training set fails the require below instead
    // of NPE-ing in the driver)
    val docs = counts.filter(col("__b") === buckets.toLong)
      .agg(coalesce(sum("__m"), lit(0.0))).collect()(0).getDouble(0)
    require(docs > 0, "trainQuality needs at least one document with tokens")
    var w = Array.fill(buckets)(0.0)
    var bias = 0.0
    for (_ <- 0 until iters) {
      // wExt: the pseudo slot scores 0.0, so Σ c·w over the extended
      // vector equals the real-feature margin exactly
      val wCol = typedLit(w.toSeq :+ 0.0)
      val margins = counts
        .groupBy(col(id), col("__y"), col("__m"))
        .agg((lit(bias) + sum(col("__c") * element_at(wCol, (col("__b") + 1).cast("int"))))
          .as("__mg"))
        .withColumn("__r", col("__y") - lit(1.0) / (lit(1.0) + exp(-col("__mg"))))
        .select(col(id), col("__m"), col("__r"))
      val grads = counts.select(col(id), col("__b"), col("__c")).join(margins, id)
        .groupBy("__b")
        .agg(sum(col("__m") * col("__c") * col("__r")).as("__g"))
        .collect()
      val nw = w.clone()
      var biasGrad = 0.0
      grads.foreach { r =>
        val b = r.getLong(0).toInt
        if (b == buckets) biasGrad = r.getDouble(1)
        else nw(b) += lr * r.getDouble(1) / docs
      }
      w = nw
      bias += lr * biasGrad / docs
    }
    counts.unpersist()
    Model(w, bias)
  }

  /** Score a corpus with a trained model: (id, n_features, score) with
    * score = σ(bias + Σ c_b·w_b) ∈ (0,1), one row per doc with ≥ 1
    * token. One feature pass + one per-doc aggregation; the weight
    * vector rides the plan as a literal array (≤ `buckets` doubles —
    * the IVF centroid-tensor pattern). Clone-collapse gated: score
    * each distinct text once, fan out to ids.
    */
  def scoreQuality(df: DataFrame, model: Model,
                   id: String = "doc_id", text: String = "text",
                   collapseExact: Boolean = true): DataFrame = {
    val buckets = model.weights.length
    val key = lower(trim(col(text)))
    def scoreOf(d: DataFrame): DataFrame = {
      val wCol = typedLit(model.weights.toSeq)
      Sampling.hashedNgramBuckets(d, buckets, id, text)
        .groupBy(col(id))
        .agg(count(lit(1)).as("n_features"),
          (lit(model.bias) + sum(element_at(wCol, (col("__b") + 1).cast("int"))))
            .as("__mg"))
        .withColumn("score", lit(1.0) / (lit(1.0) + exp(-col("__mg"))))
        .select(col(id), col("n_features"), col("score"))
    }
    if (collapseExact && Dedup.cloneHeavy(df, key)) {
      val g = Dedup.cloneGroups(df, id, text)
      scoreOf(g.select(col("__rep").as(id), col(text)))
        .join(g.select(col("__rep").as(id), explode(col("__ids")).as("__xid")), id)
        .select(col("__xid").as(id), col("n_features"), col("score"))
    } else scoreOf(df)
  }

  /** Train on (pos, neg) and score `df` — the one-call corpus gate. */
  def quality(pos: DataFrame, neg: DataFrame, df: DataFrame,
              buckets: Int = 1024, iters: Int = 3, lr: Double = 1.0,
              id: String = "doc_id", text: String = "text"): DataFrame =
    scoreQuality(df, trainQuality(pos, neg, buckets, iters, lr, id, text),
      id, text)
}
