package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling for training-data mixing: keep each
  * document with a per-domain probability (e.g. up-weight curated
  * sources, down-weight crawl), decided by a content-independent hash
  * of (seed, id) — so the sample is reproducible across runs and
  * engines, composable with any upstream filter, and re-seedable for
  * disjoint epochs.
  *
  * Keep rule: the first 8 hex chars of md5("seed:id") compared
  * lexicographically against a per-domain threshold. md5's hex is
  * uniform, so P(prefix < thr(r)) ≈ r within 2⁻³² — and the same rule
  * is expressible verbatim in any SQL engine (the DuckDB oracle uses
  * the identical strings), unlike engine-native hash functions.
  *
  * Scale design: one broadcast join against the (tiny, config-sized)
  * rate table plus a codegen'd per-row hash — no shuffle of the
  * corpus at all.
  */
object Sampling {

  /** Hex threshold for a keep-rate: first-8-hex-chars(md5) < thr keeps
    * ≈ `rate` of rows. Rates ≥ 1 map to the sentinel "g0000000" which
    * sorts above every hex string (keep all); rates ≤ 0 to "00000000"
    * (keep none).
    */
  private[graft] def hexThreshold(rate: Double): String =
    if (rate >= 1.0) "g0000000"
    else f"${math.max(0L, math.floor(rate * 4294967296.0).toLong)}%08x"

  /** Sample `df` keeping ≈ rates(domain) of each domain's rows
    * (`defaultRate` for domains not in the map). Deterministic in
    * (seed, id): the same row is kept or dropped on every run.
    */
  def weighted(df: DataFrame, rates: Map[String, Double],
               defaultRate: Double = 0.0, seed: String = "graft",
               id: String = "doc_id", domain: String = "source"): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val rateTable = rates.toSeq.sortBy(_._1)
      .map { case (d, r) => (d, hexThreshold(r)) }.toDF(domain, "__thr")
    df.join(broadcast(rateTable), Seq(domain), "left")
      .where(substring(
          md5(concat(lit(seed), lit(":"), col(id).cast("string"))), 1, 8)
        < coalesce(col("__thr"), lit(hexThreshold(defaultRate))))
      .drop("__thr")
  }

  /** Sample each domain down to ≈ a TOKEN budget — the mixing shape a
    * corpus build actually runs ("2B tokens of crawl, everything from
    * curated"): keep-rate per domain = budget / total-domain-tokens
    * (capped at 1), then the same deterministic md5-threshold rule as
    * [[weighted]]. Rate derivation is one bounded aggregation
    * (≤ #domains rows collected); domains without a budget are
    * dropped. Expected token yield per domain is the budget within
    * sampling noise (the hash is content-independent, so long and
    * short documents are kept at the same rate).
    */
  def toTokenBudget(df: DataFrame, budgets: Map[String, Long],
                    tokens: String = "n_tokens", seed: String = "graft",
                    id: String = "doc_id", domain: String = "source"): DataFrame = {
    val totals = df.groupBy(domain).agg(sum(col(tokens)).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = budgets.map { case (d, b) =>
      d -> math.min(1.0, b.toDouble / math.max(1L, totals.getOrElse(d, 0L)).toDouble)
    }
    weighted(df, rates, defaultRate = 0.0, seed = seed, id = id, domain = domain)
  }

  /** Temperature-scaled domain mixing — the multilingual/multi-domain
    * sampling rule of mT5 (Xue et al. 2021 §3.3) and XLM-R (Conneau
    * et al. 2020 §3): mixture weight q_d ∝ p_d^α, where p_d is the
    * domain's token share and α ∈ [0, 1] the temperature — α = 1
    * keeps natural proportions, α = 0 is uniform across domains, and
    * values between up-sample the tail without flattening the head.
    * Each domain's keep-rate is min(1, q_d·budget / tokens_d), then
    * the same deterministic md5-threshold rule as [[weighted]].
    *
    * Scale shape: one bounded (≤ #domains rows) aggregation collect
    * for the totals — the [[toTokenBudget]] precedent — then a
    * broadcast rate table and a codegen'd per-row hash; the corpus
    * itself never shuffles. The α-power/normalization arithmetic runs
    * driver-side over the DOMAIN-SORTED totals (deterministic fold
    * order), mirrored expression-for-expression by the SQL oracle.
    */
  def temperatureMix(df: DataFrame, alpha: Double, totalBudget: Long,
                     tokens: String = "n_tokens", seed: String = "graft",
                     id: String = "doc_id", domain: String = "source"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1], got $alpha")
    require(totalBudget > 0, s"totalBudget must be positive, got $totalBudget")
    // null-guarded: a domain whose token column aggregates to NULL
    // (all-null inputs) is dropped like a zero-token one, not an NPE
    val totals = df.groupBy(domain).agg(sum(col(tokens)).as("__t"))
      .collect()
      .flatMap(r =>
        if (r.isNullAt(1) || r.getLong(1) <= 0) None
        else Some(r.getString(0) -> r.getLong(1)))
      .sortBy(_._1)
    val grand = totals.map(_._2).sum
    require(grand > 0, "temperatureMix corpus has no tokens")
    // α = 0.5 (the common mT5/XLM-R setting) goes through sqrt, which
    // IEEE 754 requires to be correctly rounded — so the whole rate
    // pipeline (integer totals → sqrt → ordered sum → mul/div → floor)
    // is bit-identical across engines and the md5-vs-threshold
    // comparison can never ulp-flip against a SQL oracle. General α
    // uses pow, whose last ulp is libm-dependent.
    val powf: Double => Double =
      if (alpha == 0.5) math.sqrt else x => math.pow(x, alpha)
    val pows = totals.map { case (d, t) =>
      (d, t, powf(t.toDouble / grand.toDouble))
    }
    val z = pows.foldLeft(0.0)(_ + _._3)
    val rates = pows.map { case (d, t, pw) =>
      d -> math.min(1.0, pw / z * totalBudget.toDouble / t.toDouble)
    }.toMap
    weighted(df, rates, defaultRate = 0.0, seed = seed, id = id, domain = domain)
  }

  /** Stratified selection: the top `k` rows of each domain by `score`
    * (ties broken by ascending id — deterministic). One window shuffle
    * partitioned by domain; the rank filter prunes before anything
    * downstream, so the selected corpus, not the scored corpus, flows
    * on.
    */
  def topKByDomain(df: DataFrame, k: Int, score: String,
                   domain: String = "source", id: String = "doc_id"): DataFrame =
    df.withColumn("__rk", row_number().over(
        Window.partitionBy(domain).orderBy(col(score).desc, col(id))))
      .where(col("__rk") <= k)
      .drop("__rk")

  /** Diversity-balancing subsample over an embedding column: assign
    * each vector to a deterministic sign cell (bit i set iff dimension
    * i+1 is ≥ 0 — a fixed axis-aligned LSH, no trained state), then
    * cap every cell at `cap` rows, keeping the rows with the smallest
    * content-independent md5(seed:id) priority. Dense regions of the
    * embedding space are downsampled toward the cap while sparse cells
    * survive whole — the cheap curation pass that stops one dominant
    * mode (boilerplate, one language, one template) from flooding a
    * training mix, without any pairwise similarity work.
    *
    * Scale: one shuffle on the cell key for the per-cell rank; the
    * priority is a per-row hash, so re-runs and engines agree
    * bit-for-bit. 2^bits cells bound the parallel width — keep `bits`
    * ≥ log2(cluster cores) at scale; a skewed mega-cell costs one
    * straggler sort of its rows, still O(cell · log cell).
    */
  def cellCapped(df: DataFrame, bits: Int = 5, cap: Int = 8,
                 seed: String = "graft", id: String = "vec_id",
                 vec: String = "embedding"): DataFrame = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1,62], got $bits")
    val cell = (0 until bits).map(i =>
        when(element_at(col(vec), i + 1) >= 0f, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val pri = substring(
      md5(concat(lit(seed), lit(":"), col(id).cast("string"))), 1, 16)
    df.withColumn("cell", cell)
      .withColumn("__rk", row_number().over(
        Window.partitionBy("cell").orderBy(pri.asc, col(id).asc)))
      .where(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Exact-size uniform sample without replacement: the `k` rows with
    * the smallest md5(seed:id) priority — a deterministic reservoir
    * draw (every id's priority is an iid uniform hash, so the k
    * smallest are a uniform k-subset). Unlike [[weighted]]'s Bernoulli
    * rule the output size is EXACT — the shape eval sets and fixed-
    * budget probes need. One TakeOrdered(k) (per-partition top-k then
    * driver merge of numPartitions·k rows): no global sort, no
    * shuffle; keep k ≲ 10⁶ at cluster scale or the driver merge
    * becomes the bottleneck.
    */
  def exactK(df: DataFrame, k: Int, seed: String = "graft",
             id: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    df.withColumn("__pri",
        md5(concat(lit(seed), lit(":"), col(id).cast("string"))))
      .orderBy(col("__pri"), col(id))
      .limit(k)
      .drop("__pri")
  }

  /** Deterministic multi-epoch training-order shuffle (the data-order
    * step Megatron-style loaders consume): every epoch gets an
    * independent seeded permutation — a document's priority is
    * md5(seed:e{epoch}:{id}), its loader shard the first 8 hex chars
    * mod `nShards`, its position the priority rank WITHIN that shard.
    * Same reshuffled-each-epoch guarantee as an in-memory Fisher–Yates
    * pass, but reproducible bit-for-bit across engines and runs, and
    * with no global sort: the only shuffle is the (epoch, shard)
    * window, whose partitions are corpus/nShards-sized by hash
    * uniformity. Keep nShards ≥ cluster cores at 100 TB so no single
    * shard sort dominates.
    *
    * Output: (doc_id, epoch, shard, pos) — one row per doc per epoch.
    */
  def epochOrder(df: DataFrame, epochs: Int, nShards: Int,
                 seed: String = "graft", id: String = "doc_id"): DataFrame = {
    require(epochs >= 1, s"epochs must be positive, got $epochs")
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    val pri = md5(concat(lit(seed), lit(":e"), col("epoch").cast("string"),
      lit(":"), col(id).cast("string")))
    df.select(col(id), explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("__pri", pri)
      .withColumn("shard",
        conv(substring(col("__pri"), 1, 8), 16, 10).cast("long") % nShards)
      .withColumn("pos", row_number().over(
        Window.partitionBy("epoch", "shard").orderBy(col("__pri"), col(id))).cast("long"))
      .drop("__pri")
  }

  // ---- DSIR importance resampling -----------------------------------

  /** (id, bucket) rows: each unigram and bigram of the text (WITH
    * multiplicity — bag-of-ngrams) hashed into `buckets` buckets via
    * the first 8 md5 hex chars — the engine-portable hash (any SQL
    * engine reproduces it), matching the md5 convention of [[weighted]]
    * and the winnowing default.
    *
    * Built as one position explode + scalar element_at (the
    * codegen-friendly shape of Dedup.shingleRows): position i ≤ n is
    * unigram i, position i > n is the bigram starting at i − n — a
    * higher-order transform() lambda here runs INTERPRETED and
    * measured ~2× slower over the scale corpus.
    */
  private[ops] def hashedNgramBuckets(df: DataFrame, buckets: Int,
                                      id: String, text: String,
                                      carry: Seq[String] = Nil): DataFrame = {
    val keep = col(id) +: carry.map(col)
    // widen before the feature explode (CPU-multiplying; no-op at scale)
    val base = CacheScope.widen(df.filter(col(text).isNotNull))
      .select(keep :+ split(lower(trim(col(text))), " ").as("__ts"): _*)
      .withColumn("__n", size(col("__ts")))
    val idx = base.withColumn("__i",
      explode(sequence(lit(1), greatest(col("__n") * 2 - 1, lit(1)))))
    val f = when(col("__i") <= col("__n"), element_at(col("__ts"), col("__i")))
      .otherwise(concat_ws(" ",
        element_at(col("__ts"), col("__i") - col("__n")),
        element_at(col("__ts"), col("__i") - col("__n") + 1)))
    idx.select(keep :+
      (conv(substring(md5(f), 1, 8), 16, 10).cast("long") % buckets).as("__b"): _*)
  }

  /** DSIR importance scores (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): fit two
    * bag-of-hashed-ngrams categorical distributions — over the TARGET
    * corpus (the distribution you want more of, e.g. curated text) and
    * the RAW corpus (what you have) — and score every raw document by
    * its log importance weight Σ_f [ln p_target(bucket(f)) −
    * ln p_raw(bucket(f))] over the doc's unigram+bigram features,
    * add-one smoothed. High scores = looks like the target.
    *
    * Scale design: the two distributions are bounded aggregations
    * (≤ `buckets` rows each — the paper uses 10⁴); their log-ratio
    * table broadcasts back onto the feature stream, so the corpus
    * pays one explode + one per-doc sum shuffle and nothing pairwise.
    * Output: (id, n_features, logw), one row per raw doc with ≥ 1
    * token.
    */
  def dsirScores(raw: DataFrame, target: DataFrame, buckets: Int = 1024,
                 id: String = "doc_id", text: String = "text",
                 collapseExact: Boolean = true): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    import graft.ops.Dedup
    val key = lower(trim(col(text)))
    // multiplicity-weighted clone collapse (the LM/TF-IDF pattern):
    // distributions count each DISTINCT text weighted by its clone
    // count — bit-identical to the uncollapsed fit — and scoring runs
    // once per distinct text, then fans out to ids. Gated on the cheap
    // distinct-ratio probe; clone-free corpora skip both probes' cost
    // only when collapseExact = false.
    if (collapseExact &&
        (Dedup.cloneHeavy(raw, key) || Dedup.cloneHeavy(target, key))) {
      val rg = Dedup.cloneGroups(raw, id, text)
        .withColumn("__w", size(col("__ids")).cast("long"))
      val tg = Dedup.cloneGroups(target, id, text)
        .withColumn("__w", size(col("__ids")).cast("long"))
      val repScores = dsirCore(
        rg.select(col("__rep").as(id), col(text), col("__w")),
        tg.select(col("__rep").as(id), col(text), col("__w")), buckets, id, text)
      repScores
        .join(rg.select(col("__rep").as(id), explode(col("__ids")).as("__xid")), id)
        .select(col("__xid").as(id), col("n_features"), col("logw"))
    } else
      dsirCore(raw.withColumn("__w", lit(1L)),
        target.withColumn("__w", lit(1L)), buckets, id, text)
  }

  private def dsirCore(raw: DataFrame, target: DataFrame, buckets: Int,
                       id: String, text: String): DataFrame = {
    val fr = hashedNgramBuckets(raw, buckets, id, text, carry = Seq("__w"))
    val ft = hashedNgramBuckets(target, buckets, id, text, carry = Seq("__w"))
    // the two distributions are ≤ `buckets` rows — persist them so the
    // totals, the ratio table and nothing else re-runs the corpus
    // explode (unpersisted, the raw corpus was scanned 3× and the
    // target 3×: measured 19 s → 3 s at sf0.1). The corpus-sized
    // feature stream itself is NOT persisted: caching tokens×2 rows
    // trades a re-scan for far more memory than the counts are worth
    // at 100 TB — so raw pays exactly two scans (fit + score), target
    // one.
    val cr = fr.groupBy("__b").agg(sum("__w").as("__cr"))
      .transform(graft.ops.CacheScope.scopedPersist)
    val ct = ft.groupBy("__b").agg(sum("__w").as("__ct"))
      .transform(graft.ops.CacheScope.scopedPersist)
    // two scalar totals off the persisted counts (≤ buckets rows each;
    // both null-guarded — an empty side must yield 0, not a driver NPE)
    val tr = cr.agg(coalesce(sum("__cr"), lit(0L))).collect()(0).getLong(0)
    val tt = ct.agg(coalesce(sum("__ct"), lit(0L))).collect()(0).getLong(0)
    // every bucket reachable from a raw doc has cr ≥ 1, so the ratio
    // table built FROM cr covers all raw features; target-only buckets
    // can never be probed
    val ratio = cr.join(ct, Seq("__b"), "left").select(col("__b"),
      (log((coalesce(col("__ct"), lit(0L)) + 1).cast("double") / (tt + buckets).toDouble)
        - log((col("__cr") + 1).cast("double") / (tr + buckets).toDouble)).as("__logr"))
    fr.join(broadcast(ratio), Seq("__b"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_features"), sum("__logr").as("logw"))
  }

  /** DSIR selection: sample `k` raw documents without replacement with
    * probability ∝ their importance weight, via Gumbel top-k over the
    * [[dsirScores]] log weights (Xie et al. 2023 §2; the Gumbel-max
    * trick makes top-k keys equivalent to weighted sampling). The
    * Gumbel noise derives from md5(seed:id) — the same run, any
    * engine, any cluster size picks the identical sample, and a new
    * `seed` draws a fresh epoch.
    *
    * Scale: scoring as in [[dsirScores]], then one TakeOrdered top-k
    * (per-partition heaps, no global sort).
    */
  def dsirSample(raw: DataFrame, target: DataFrame, k: Int,
                 buckets: Int = 1024, seed: String = "graft",
                 id: String = "doc_id", text: String = "text",
                 collapseExact: Boolean = true): DataFrame = {
    val u = (conv(substring(
        md5(concat(lit(seed), lit(":"), col(id).cast("string"))), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    dsirScores(raw, target, buckets, id, text, collapseExact)
      .withColumn("__key", col("logw") - log(-log(u)))
      .orderBy(col("__key").desc, col(id).asc)
      .limit(k)
      .drop("__key")
  }
}
