package graft.ops

import org.apache.spark.sql.graft.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (Array[Float]). Two tiers:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is
  *    broadcast; the corpus streams through a codegen'd cosine loop —
  *    O(N·Q·d) flops, no shuffle of the corpus, per-query top-k via
  *    window. This is the correctness baseline and is the right plan
  *    whenever Q is small (the common "probe a handful of queries"
  *    case), at any corpus size.
  *
  *  - [[lshTopK]]: random-hyperplane LSH. Corpus and queries get
  *    B band signatures (r hyperplane bits each); candidates = pairs
  *    sharing any band bucket; exact cosine re-ranks candidates. At
  *    100 TB the bucket join shuffles only (id, band, bucket) pairs
  *    and the candidate set, never the full cross product.
  */
object Similarity {

  /** Exact cosine top-k of `corpus` for each row of `queries`.
    * Output: (query_id, id, score) — k rows per query.
    *
    * Scale shape: the corpus hashes into ≤[[MaxRowsPerBlock]]-row
    * blocks (one collect_list row each — the [[crossTopK]] pattern
    * with the query side broadcast instead of exploded); inside a
    * (block × query) pair each query keeps only its LOCAL top-k via a
    * bounded array sort, so the per-query ranking window receives
    * ≤ blocks·k candidate rows instead of the full |corpus| — the
    * pre-reduce that keeps the exact tier's one shuffle O(B·k·|Q|)
    * at any corpus size. Scores are per-pair cosines (double
    * accumulation, bit-stable across engines), identical to the
    * unblocked plan's.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val nb = autoBlocks(corpus.select(col(id)).count())
    val c = corpus.select(col(id), col(emb))
      .withColumn("__blk", pmod(xxhash64(col(id)), lit(nb)).cast("int"))
      .groupBy("__blk")
      .agg(collect_list(struct(col(id).as("i"), col(emb).as("v"))).as("__C"))
    val q = queries.select(col(id).as("query_id"), col(emb).as("__qv"))
    topKFromBlocks(c, q, k, id,
      b => -VectorFunctions.cosineSim(b("v"), col("__qv")))
  }

  /** Scalar-quantize the corpus' embedding column to the SQ8 layout
    * (per-vector vmin/δ + one byte per dimension — 4× smaller than
    * float32; the FAISS IndexScalarQuantizer QT_8bit scheme). The
    * struct column is persistable: encode once, serve many query
    * batches against the compressed corpus.
    */
  def sq8Encode(corpus: DataFrame, emb: String = "embedding"): DataFrame =
    corpus.withColumn("sq8", VectorFunctions.sq8Encode(col(emb))).drop(emb)

  /** Asymmetric SQ8 cosine top-k: corpus rows carry the compressed
    * `sq8` struct from [[sq8Encode]], queries keep exact vectors and
    * broadcast. Same plan shape as [[bruteForceTopK]] — the corpus
    * never shuffles, the scan reads 1 byte/dim instead of 4 — with
    * quantization error in the scores instead of candidate recall
    * loss (every corpus row is still scored). Compose with an exact
    * re-rank of the top-k' (k' > k) when exact ordering matters.
    */
  def sq8TopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    // same blocked pre-reduce as [[bruteForceTopK]] — the window ranks
    // ≤ blocks·k rows per query, not the corpus
    val nb = autoBlocks(corpus.select(col(id)).count())
    val c = corpus.select(col(id), col("sq8"))
      .withColumn("__blk", pmod(xxhash64(col(id)), lit(nb)).cast("int"))
      .groupBy("__blk")
      .agg(collect_list(struct(col(id).as("i"), col("sq8").as("v"))).as("__C"))
    val q = queries.select(col(id).as("query_id"), col(emb).as("__qv"))
    topKFromBlocks(c, q, k, id,
      b => -VectorFunctions.sq8AsymCosine(b("v"), col("__qv")))
  }

  /** Compressed scan + exact re-rank — the composition [[sq8TopK]]'s
    * doc prescribes when exact ORDERING matters: the 1-byte/dim SQ8
    * scan generates `kCand` candidates per query (the only pass that
    * touches the whole corpus), then ONLY those ≤ queries·kCand rows
    * rejoin the raw vectors for an exact cosine re-rank to top-k.
    * Scores come from the SAME double-accumulated expression as
    * [[bruteForceTopK]], so whenever the candidate set contains the
    * true top-k the output is row-identical to the exact operator —
    * at 100 TB the full-precision vectors are read for ~kCand rows
    * per query instead of riding the scan. kCand/k is the recall
    * knob: the candidate tier's job is inclusion, not ordering.
    */
  def sq8RerankTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, kCand: Int,
      id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    require(kCand >= k, s"kCand ($kCand) must be >= k ($k)")
    val cand = sq8TopK(sq8Encode(corpus, emb), queries, kCand, id, emb)
      .select(col("query_id"), col(id))
    exactRerank(cand, corpus, queries, k, id, emb, VectorFunctions.cosineSim)
  }

  /** PQ candidates + exact re-rank — the [[sq8RerankTopK]] composition
    * applied to the PQ tier, lifting its serving recall without paying
    * the raw scan: ADC over the m-byte codes proposes `kCand`
    * candidates per query (the only corpus-wide pass, over a relation
    * carrying 4·d/m× less data than the raw vectors), then ONLY those
    * ≤ queries·kCand rows rejoin the raw vectors for an exact
    * DOT-product top-k. The re-rank metric is deliberately the one ADC
    * approximates — candidate and final scores are directly
    * comparable, and on unit-normalized corpora dot ≅ cosine — so the
    * output is row-identical to the exhaustive dot top-k whenever the
    * candidate tier contains the true top-k. With a LOSSLESS codebook
    * (the planted-codeword construction) that containment is certain,
    * which puts the whole composite under the exhaustive DuckDB oracle
    * (`q_knn_pq_rerank`); with trained codebooks kCand/k is the recall
    * knob (bench measures the composite's recall, OpsSpec floors it).
    */
  def pqRerankTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, kCand: Int,
      m: Int = 8, ksub: Int = 16, trainIters: Int = 0,
      codebooks: Option[Array[Array[Array[Float]]]] = None,
      id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    require(kCand >= k, s"kCand ($kCand) must be >= k ($k)")
    val cand = pqTopK(corpus, queries, kCand, m, ksub, trainIters, codebooks,
        id, emb)
      .select(col("query_id"), col("vec_id").as(id))
    exactRerank(cand, corpus, queries, k, id, emb, VectorFunctions.dotF)
  }

  /** Exact re-rank tail shared by the compressed candidate tiers
    * ([[sq8RerankTopK]], [[pqRerankTopK]]): ONLY the ≤ queries·kCand
    * candidate rows rejoin the raw corpus vectors (an equi-join on id
    * — at 100 TB this reads full-precision vectors for a bounded row
    * set instead of riding the scan), queries broadcast, and the
    * exact score ranks top-k under the same (score desc, id asc)
    * order every exact operator uses. Self-hits were already excluded
    * by the candidate tier.
    */
  private def exactRerank(
      cand: DataFrame, corpus: DataFrame, queries: DataFrame, k: Int,
      id: String, emb: String,
      exact: (Column, Column) => Column): DataFrame = {
    val scored = cand
      .join(corpus.select(col(id), col(emb).as("__cv")), id)
      .join(broadcast(queries.select(col(id).as("query_id"), col(emb).as("__qv"))),
        "query_id")
      .withColumn("score", exact(col("__cv"), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(id).asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col("query_id"), col(id), col("score"))
  }

  /** Shared tail of the blocked exact scans: broadcast the query rows
    * against the corpus block rows, keep each query's LOCAL top-k per
    * block (self-hits excluded, ties by id asc — the same order the
    * final window uses), then rank the ≤ blocks·k survivors per query.
    */
  private def topKFromBlocks(
      blocks: DataFrame, q: DataFrame, k: Int, id: String,
      negScore: Column => Column): DataFrame = {
    val part = blocks.crossJoin(broadcast(q))
      .select(col("query_id"),
        slice(array_sort(transform(
          filter(col("__C"), b => b("i") =!= col("query_id")),
          b => struct(negScore(b).as("negs"), b("i").as("cid")))), 1, k).as("__cands"))
      .select(col("query_id"), explode(col("__cands")).as("c"))
      .select(col("query_id"), col("c.cid").as(id), (-col("c.negs")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(id).asc)
    part.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col("query_id"), col(id), col("score"))
  }

  /** Exact cross-corpus cosine top-k where BOTH sides are corpus-scale
    * (neither fits a broadcast): for every x in `xs`, its `k`
    * highest-cosine neighbors in `ys`. Output: (query_id, `id`,
    * score, rank).
    *
    * Scale shape: both sides hash into payload blocks and every
    * (x-block, y-block) pair meets through the explode + merge-hinted
    * equi-join of [[cosineDedupPairs]] — nothing broadcasts. Inside a
    * block pair each x keeps only its LOCAL top-k against that
    * y-block (an array sort over ≤[[MaxRowsPerBlock]] scored structs),
    * so the global window ranks |X|·B_y·k partial candidates, never
    * the |X|·|Y| cross product. The flops are inherently O(|X|·|Y|·d)
    * — use [[lshTopK]]/[[ivfTopK]] when approximate recall is
    * acceptable.
    */
  def crossTopK(
      xs: DataFrame, ys: DataFrame, k: Int,
      id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val bx = autoBlocks(xs.select(col(id)).count())
    val by = autoBlocks(ys.select(col(id)).count())
    def blocked(df: DataFrame, nb: Int, payload: String) = df
      .select(col(id), col(emb))
      .withColumn("__blk", pmod(xxhash64(col(id)), lit(nb)).cast("int"))
      .groupBy("__blk")
      .agg(collect_list(struct(col(id).as("i"), col(emb).as("v"))).as(payload))
    val L = blocked(xs, bx, "__X").select(
      col("__blk").as("__bl"),
      explode(sequence(lit(0), lit(by - 1))).as("__br"),
      col("__X"))
    val R = blocked(ys, by, "__Y").select(
      explode(sequence(lit(0), lit(bx - 1))).as("__bl"),
      col("__blk").as("__br"),
      col("__Y"))
    val part = L.hint("merge").join(R.hint("merge"), Seq("__bl", "__br"))
      .select(explode(transform(col("__X"), a =>
        struct(a("i").as("qid"),
          slice(array_sort(transform(col("__Y"), b =>
            struct((-VectorFunctions.cosineSim(a("v"), b("v"))).as("negs"),
              b("i").as("cid")))), 1, k).as("cands")))).as("p"))
      .select(col("p.qid").as("query_id"),
        explode(col("p.cands")).as("c"))
      .select(col("query_id"), col("c.cid").as(id), (-col("c.negs")).as("score"))
    part.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col(id).asc)))
      .filter(col("rank") <= k)
  }

  /** Margin-based parallel-pair mining (Artetxe & Schwenk 2019,
    * "Margin-based Parallel Corpus Mining with Multilingual Sentence
    * Embeddings" — the CCMatrix/LASER bitext gate): a candidate pair
    * (x, y) across the two corpora scores
    * `margin = cos(x,y) / ((avgk(x) + avgk(y)) / 2)` where avgk(v) is
    * the mean cosine of v to its k nearest cross-corpus neighbors —
    * the ratio margin that normalizes away hubness. Kept pairs have
    * margin ≥ `threshold` and, with `mutual = true` (the
    * "intersection" strategy), are each other's best-margin match in
    * both directions.
    *
    * Determinism: the k-NN averages fold in rank order (seeded at
    * 0.0, which is IEEE-exact against a first-element seed), so the
    * margins an engine replays are bit-identical; argmax ties break
    * by partner id.
    *
    * Scale shape: two [[crossTopK]] passes (blocked, nothing
    * broadcast), then everything downstream is keyed on single ids —
    * the candidate set is ≤ (|X| + |Y|)·k rows.
    *
    * Output: (id1 = x, id2 = y, score, margin).
    */
  def marginMinePairs(
      xs: DataFrame, ys: DataFrame, k: Int, threshold: Double,
      mutual: Boolean = true,
      id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    // each crossTopK pass reads its inputs twice (block-count sizing +
    // the blocked aggregation) and this runs two passes — persist both
    // corpora once so uncached inputs aren't recomputed ~6×. Same
    // cache-lifetime contract as the pipeline entries: scopedPersist
    // is released by CacheScope/clearCache, not by this lazy plan.
    val xsP = CacheScope.scopedPersist(xs.select(col(id), col(emb)))
    val ysP = CacheScope.scopedPersist(ys.select(col(id), col(emb)))
    marginFromTopK(
      crossTopK(xsP, ysP, k, id, emb)
        .select(col("query_id").as("x"), col(id).as("y"), col("score"), col("rank")),
      crossTopK(ysP, xsP, k, id, emb)
        .select(col(id).as("x"), col("query_id").as("y"), col("score"), col("rank")),
      threshold, mutual)
  }

  /** [[marginMinePairs]] with LSH-bucketed candidate discovery — the
    * 100 TB path: both corpora band into (id, band, bucket) rows and
    * candidates are bucket collisions (the [[crossTopKLsh]] join;
    * nothing broadcasts, no |X|·|Y| flops). Margins are computed over
    * the LSH top-k, so avgk is taken over a candidate subset —
    * approximate-by-design (high-cosine true pairs collide with
    * near-1 probability; sparse-collision vectors simply mine
    * nothing), pinned against the exact path by OpsSpec.
    */
  def marginMinePairsLsh(
      xs: DataFrame, ys: DataFrame, k: Int, threshold: Double,
      mutual: Boolean = true, bands: Int = 16, rowsPerBand: Int = 8,
      dim: Int = 64, id: String = "vec_id", emb: String = "embedding",
      seed: Long = 42L): DataFrame =
    marginFromTopK(
      crossTopKLsh(xs, ys, k, bands, rowsPerBand, dim, id, emb, seed)
        .select(col("query_id").as("x"), col(id).as("y"), col("score"), col("rank")),
      crossTopKLsh(ys, xs, k, bands, rowsPerBand, dim, id, emb, seed)
        .select(col(id).as("x"), col("query_id").as("y"), col("score"), col("rank")),
      threshold, mutual)

  /** Cross-corpus LSH top-k with NEITHER side broadcast (unlike
    * [[lshTopK]]'s bounded-query contract): candidates are (band,
    * bucket) collisions between the two banded relations — an
    * equi-join shipping only (id, band, bucket) — and the exact
    * cosine re-rank joins each side's vectors back per surviving
    * candidate. Output: (query_id, `id`, score, rank).
    */
  def crossTopKLsh(
      xs: DataFrame, ys: DataFrame, k: Int,
      bands: Int = 16, rowsPerBand: Int = 8, dim: Int = 64,
      id: String = "vec_id", emb: String = "embedding",
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(bands, rowsPerBand, dim, seed)
    val qb = bandedRows(xs, id, "query_id", emb, planes)
    val cb = bandedRows(ys, id, "cand_id", emb, planes)
    val candidates = qb.join(cb, Seq("band", "bucket"))
      .select(col("query_id"), col("cand_id"))
      .dropDuplicates("query_id", "cand_id")
    val scored = candidates
      .join(ys.select(col(id).as("cand_id"), col(emb).as("__cv")), "cand_id")
      .join(xs.select(col(id).as("query_id"), col(emb).as("__qv")), "query_id")
      .withColumn("score", VectorFunctions.cosineSim(col("__cv"), col("__qv")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("cand_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id").as(id), col("score"), col("rank"))
  }

  /** Shared margin scoring of [[marginMinePairs]]/[[marginMinePairsLsh]]:
    * `fwd`/`bwd` carry (x, y, score, rank) top-k rows per x / per y.
    */
  private def marginFromTopK(
      fwd: DataFrame, bwd: DataFrame,
      threshold: Double, mutual: Boolean): DataFrame = {
    def rankedAvg(df: DataFrame, key: String) = df
      .groupBy(key)
      .agg((aggregate(
        transform(array_sort(collect_list(struct(col("rank"), col("score")))),
          s => s.getField("score")),
        lit(0.0), (acc, s) => acc + s) / count(lit(1))).as(s"__avg_$key"))
    val ax = rankedAvg(fwd, "x")
    val ay = rankedAvg(bwd, "y")
    val cand = fwd.select("x", "y", "score")
      .union(bwd.select("x", "y", "score"))
      .distinct()
    val margins = cand
      .join(ax, "x").join(ay, "y")
      .withColumn("margin",
        col("score") / ((col("__avg_x") + col("__avg_y")) / 2))
      .select(col("x"), col("y"), col("score"), col("margin"))
    val bestX = margins.withColumn("__r", row_number().over(
        Window.partitionBy("x").orderBy(col("margin").desc, col("y"))))
      .filter(col("__r") === 1).drop("__r")
    val kept =
      if (!mutual) bestX
      else {
        val bestY = margins.withColumn("__r", row_number().over(
            Window.partitionBy("y").orderBy(col("margin").desc, col("x"))))
          .filter(col("__r") === 1)
          .select(col("x"), col("y"))
        bestX.join(bestY, Seq("x", "y"), "left_semi")
      }
    kept.filter(col("margin") >= threshold)
      .select(col("x").as("id1"), col("y").as("id2"), col("score"), col("margin"))
  }

  /** Hard-negative mining for retrieval / contrastive training: per
    * query, the top-k most similar corpus vectors EXCLUDING the
    * query's own near-duplicate CLUSTER — the standard guard against
    * false negatives (a near-duplicate of the query scored as a
    * "negative" poisons the contrastive loss; cf. the dedup-filtered
    * negative sampling of DPR/Contriever-style pipelines). Positives
    * are transitive: the exclusion set is the query's connected
    * component over cosine-≥-tau pairs, not just its direct
    * neighbors, so chains of near-dups (A≈B≈C with cos(A,C) < tau)
    * are excluded whole — the same leakage argument as
    * [[graft.ops.Cluster.leakageSafeSplit]].
    *
    * Scale shape: the pair discovery is the LSH-banded near-dup join
    * (never all-pairs), clustering is the skew-immune groupBy-min CC
    * loop, and scoring is the bruteForceTopK broadcast pattern — the
    * bounded query batch broadcasts, the corpus is scanned once, and
    * the per-query top-k window partitions on query_id. Exclusion is
    * a cluster-equality filter BEFORE ranking, so the returned k are
    * exactly the best k true negatives (no post-hoc holes).
    */
  def hardNegatives(
      corpus: DataFrame, queries: DataFrame, k: Int, tau: Double,
      bands: Int = 16, rowsPerBand: Int = 0, dim: Int = 64,
      id: String = "vec_id", emb: String = "embedding",
      seed: Long = 42L,
      precomputedClusters: Option[DataFrame] = None): DataFrame = {
    val asg = precomputedClusters.getOrElse(
      nearDupClusters(corpus, tau, bands, rowsPerBand, dim, id, emb, seed))
    val c = corpus.select(col(id), col(emb).as("__cv"))
      .join(asg.select(col("doc_id").as(id), col("cluster_id").as("__ccl")), id)
    // left join: a query OUTSIDE the corpus has no cluster and
    // excludes nothing (the sentinel never equals a real cluster id,
    // which is always an existing vertex id)
    val q = queries.select(col(id).as("query_id"), col(emb).as("__qv"))
      .join(asg.select(col("doc_id").as("query_id"),
        col("cluster_id").as("__qcl")), Seq("query_id"), "left")
      .withColumn("__qcl", coalesce(col("__qcl"), lit(Long.MinValue)))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("__ccl") =!= col("__qcl"))
      .withColumn("score", VectorFunctions.cosineSim(col("__cv"), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(id).asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col("query_id"), col("__rank").cast("long").as("neg_rank"),
        col(id), col("score"))
  }

  /** Contrastive-training triplet assembly — the retrieval-family
    * composite: per query, ONE positive (its smallest near-dup
    * cluster-mate — the deterministic pick among the query's
    * semantic duplicates) and the top-k cluster-excluded hard
    * negatives from [[hardNegatives]]. Queries with no cluster-mate
    * produce no rows (a contrastive pair needs a positive); the
    * pair discovery + connected components run ONCE and are shared
    * between the positive lookup and the negative exclusion.
    *
    * Output: (query_id, positive_id, neg_rank, id, score) — k rows
    * per trainable query, ready to feed an InfoNCE-style loss.
    */
  /** Shared pair-discovery + connected-components block of
    * [[hardNegatives]] and [[contrastiveTriplets]] — one definition so
    * the two ops' cluster semantics cannot diverge.
    */
  private def nearDupClusters(
      corpus: DataFrame, tau: Double, bands: Int, rowsPerBand: Int,
      dim: Int, id: String, emb: String, seed: Long): DataFrame = {
    val pairs = cosineDedupPairsLsh(corpus, tau, bands, rowsPerBand, dim,
        id, emb, seed)
      .select(col("id1"), col("id2"))
    graft.ops.Cluster.assignments(pairs, corpus.select(col(id)), id)
  }

  def contrastiveTriplets(
      corpus: DataFrame, queries: DataFrame, k: Int, tau: Double,
      bands: Int = 16, rowsPerBand: Int = 0, dim: Int = 64,
      id: String = "vec_id", emb: String = "embedding",
      seed: Long = 42L): DataFrame = {
    val asg = nearDupClusters(corpus, tau, bands, rowsPerBand, dim, id, emb, seed)
      .transform(graft.ops.CacheScope.scopedPersist) // positives + negative exclusion
    val q = queries.select(col(id).as("query_id"))
      .join(asg.select(col("doc_id").as("query_id"), col("cluster_id")),
        Seq("query_id"))
    val positives = q
      .join(asg.select(col("cluster_id"), col("doc_id").as("__mate")),
        Seq("cluster_id"))
      .filter(col("__mate") =!= col("query_id"))
      .groupBy(col("query_id")).agg(min(col("__mate")).as("positive_id"))
      .transform(graft.ops.CacheScope.scopedPersist) // filters the scoring + final join
    // only TRAINABLE queries (those with a positive) reach the
    // broadcast scoring pass — singleton queries' negatives would be
    // ranked and then discarded by the final inner join
    val trainable = queries.join(
      positives.select(col("query_id").as(id)), Seq(id), "left_semi")
    positives
      .join(hardNegatives(corpus, trainable, k, tau, bands, rowsPerBand, dim,
        id, emb, seed, precomputedClusters = Some(asg)), Seq("query_id"))
      .select(col("query_id"), col("positive_id"), col("neg_rank"),
        col(id), col("score"))
  }

  /** Element-wise mean-pooling of chunk embeddings into group
    * (document) embeddings — the standard long-document retrieval
    * representation: a document too long for one encoder pass is
    * embedded per chunk and pooled, and downstream ANN/dedup runs on
    * the pooled vectors. Long-form output (group, dimension j,
    * mean_v rounded 1e-6, n_vecs) so the result is directly
    * hash-comparable; callers wanting the array shape regroup with
    * sort_array(collect_list(struct(j, mean_v))).
    *
    * Scale shape: one posexplode + ONE (group, dimension)-keyed
    * partial-aggregated shuffle — sums combine map-side, nothing is
    * collected, skew-immune (a group's rows spread over dimensions).
    */
  def meanPoolEmbeddings(df: DataFrame, groupCol: String,
      emb: String = "embedding"): DataFrame =
    df.select(col(groupCol), posexplode(col(emb)).as(Seq("__j", "__x")))
      .groupBy(col(groupCol), col("__j"))
      .agg(avg(col("__x")).as("__m"), count(lit(1)).as("n_vecs"))
      .select(col(groupCol), col("__j").cast("long").as("j"),
        round(col("__m"), 6).as("mean_v"), col("n_vecs"))

  /** Deterministic random hyperplanes: bands × rows × dim, seeded. */
  def hyperplanes(bands: Int, rowsPerBand: Int, dim: Int, seed: Long = 42L): Array[Array[Array[Float]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bands, rowsPerBand, dim)((rnd.nextGaussian()).toFloat)
  }

  /** (band, bucket) rows of a vector column — one LshBandBuckets call
    * (all bands in a single codegen'd loop, planes as one float[]
    * reference) + posexplode. The composed per-band form (bands×rows
    * dot_f against typedlit planes) exceeded codegen size limits at
    * default banding and fell back to interpreted eval — ~700 µs/row,
    * 68 s for a 100k-vector corpus at the 50× bench point.
    */
  private def bandedRows(
      df: DataFrame, idFrom: String, idAs: String, emb: String,
      planes: Array[Array[Array[Float]]]): DataFrame =
    df.select(col(idFrom).as(idAs),
        posexplode(VectorFunctions.lshBandBuckets(col(emb), planes)).as(Seq("band", "bucket")))

  /** LSH-bucketed ANN: same output shape as bruteForceTopK but only
    * scores candidates sharing ≥1 band bucket with the query.
    *
    * Default banding (16 bands × 8 bits) targets the near-dup regime
    * LSH is for — neighbors at cosine ≥ ~0.8, where the per-band
    * collision probability p^r (p = 1 − θ/π) stays high while random
    * pairs (p ≈ 0.5) collide in ≥1 band with probability only
    * 1−(1−2⁻⁸)¹⁶ ≈ 6%, so the candidate join prunes hard. Low-bit
    * banding (e.g. 32×4) trades that pruning for recall on corpora
    * whose "neighbors" are weak (cosine ≈ 0.35, isotropic random
    * embeddings): there random pairs collide at ~87% and the
    * candidate set degenerates toward all-pairs — pass it explicitly
    * when that regime is really wanted (OpsSpec's isotropic recall
    * check does).
    */
  /** Smallest sign-LSH banding meeting a recall contract: under the
    * random-hyperplane collision model (Charikar, STOC 2002) a pair at
    * cosine s collides per bit with p = 1 − arccos(s)/π, per band with
    * p^r, in ≥1 of b bands with 1 − (1−p^r)^b. This picks the LONGEST
    * band signature r (longest = fewest random collisions = smallest
    * candidate set) that can still reach `recallFloor` at `targetSim`
    * within `maxBands` bands, then the smallest such b — i.e. the
    * cheapest banding that honors the floor. Pick `targetSim` at the
    * similarity you must not miss: ~0.8+ for near-dup dedup (the
    * [[lshTopK]] default regime), ~0.4 for top-k retrieval over
    * ISOTROPIC 64-d embeddings, where the true top-10 of a 10k corpus
    * sit near cosine ≈ 3.3/√d ≈ 0.42 (Gaussian order statistics).
    * Recall guarantees cost candidates in that weak-neighbor regime —
    * the returned banding makes the trade explicit instead of silently
    * missing (the round-8 bench measured recall 0.2 with the near-dup
    * default applied to isotropic retrieval).
    */
  def lshParamsForRecall(
      targetSim: Double, recallFloor: Double,
      maxBands: Int = 64): (Int, Int) = {
    require(targetSim > 0 && targetSim < 1 && recallFloor > 0 && recallFloor < 1)
    val p = 1.0 - math.acos(targetSim) / math.Pi
    val need = math.log1p(-recallFloor) // ln(1 - floor), negative
    (16 to 1 by -1).iterator.flatMap { r =>
      val pr = math.pow(p, r)
      if (pr >= 1.0) Some((1, r))
      else {
        val b = math.ceil(need / math.log1p(-pr)).toInt
        if (b <= maxBands) Some((b, r)) else None
      }
    }.nextOption().getOrElse(throw new IllegalArgumentException(
      s"no hyperplane banding within $maxBands bands reaches recall " +
        s"$recallFloor at similarity $targetSim — lower the floor, raise " +
        "the target similarity (higher-similarity pairs collide more, so " +
        "the contract gets cheaper), or raise maxBands"))
  }

  /** [[lshTopK]] with the banding DERIVED from a recall contract via
    * [[lshParamsForRecall]] — the parameters a user should reach for
    * when they know the similarity they must not miss rather than a
    * band geometry.
    */
  def lshTopKAtRecall(
      corpus: DataFrame, queries: DataFrame, k: Int,
      targetSim: Double = 0.4, recallFloor: Double = 0.9,
      dim: Int = 64, id: String = "vec_id", emb: String = "embedding",
      seed: Long = 42L): DataFrame = {
    val (bands, rows) = lshParamsForRecall(targetSim, recallFloor)
    lshTopK(corpus, queries, k, bands, rows, dim, id, emb, seed)
  }

  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      bands: Int = 16, rowsPerBand: Int = 8, dim: Int = 64,
      id: String = "vec_id", emb: String = "embedding", seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(bands, rowsPerBand, dim, seed)
    // banding ships ONLY (id, band, bucket): a vector must not ride
    // the bucket self-join — bands× replication of the embedding
    // array inflates the shuffle ~an order of magnitude (the same
    // failure the minhash banding hit at the 50× scale point).
    // Vectors rejoin per candidate side AFTER the pair dedup, when
    // each id survives exactly once per side. Sign bits are
    // scale-invariant, so raw vectors band identically to unit ones.
    val cs = bandedRows(corpus, id, "cand_id", emb, planes)
    // explicit broadcast: queries are the bounded side (same contract
    // as bruteForceTopK), and the explode defeats Catalyst's size
    // estimate so it would SMJ otherwise — shuffling + sorting the
    // corpus's N×bands banded rows against Q×bands query rows
    val qs = broadcast(bandedRows(queries, id, "query_id", emb, planes))
    val candidates = cs.join(qs, Seq("band", "bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"))
      .dropDuplicates("query_id", "cand_id")
    // exact cosine re-rank with the SAME double-accumulated expression
    // as bruteForceTopK, so LSH and brute scores are bit-comparable
    val scored = candidates
      .join(corpus.select(col(id).as("cand_id"), col(emb).as("__cv")), "cand_id")
      .join(broadcast(queries.select(col(id).as("query_id"), col(emb).as("__qv"))), "query_id")
      .withColumn("score", VectorFunctions.cosineSim(col("__cv"), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id").asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col("query_id"), col("cand_id").as("vec_id"), col("score"))
  }

  /** IVF (inverted-file) ANN — the other standard scale path beside
    * LSH: corpus vectors are assigned to their nearest of `nCells`
    * coarse centroids; each query probes its `nProbe` nearest cells
    * and re-ranks exactly (cosine) inside them. The shuffle is keyed
    * by cell id, so at scale each query touches ~nProbe/nCells of the
    * corpus instead of all of it.
    *
    * Centroid init is a deterministic corpus sample (lowest
    * xxhash64(id) rows — the classic k-means init); `trainIters > 0`
    * refines it with that many Lloyd iterations
    * ([[trainedCentroids]]) — the production IVF shape (a trained
    * coarse quantizer). The default 0 keeps the sampled quantizer. On
    * isotropic random corpora cell pruning is weak (same caveat as
    * LSH); on clustered real embeddings it's the workhorse.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      id: String = "vec_id", emb: String = "embedding",
      trainIters: Int = 0,
      centroids: Option[Array[Seq[Float]]] = None): DataFrame = {
    // an explicit `centroids` injects a PRETRAINED coarse quantizer —
    // the production serving shape (train offline/elsewhere, assign +
    // probe online); nCells then just caps nProbe and the quantizer is
    // used as given
    val cents = centroids.getOrElse(
      if (trainIters <= 0) sampledCentroids(corpus, nCells, id, emb)
      else trainedCentroids(corpus, nCells, trainIters, id, emb))
    ivfTopKIndexed(ivfIndex(corpus, cents, id, emb), queries, k, cents, nProbe, id, emb)
  }

  /** Smallest IVF probe depth meeting a recall contract — the probe
    * analog of [[lshParamsForRecall]], closing the last hand-picked
    * approximate tier. No closed form exists (cell mass depends on
    * the data's cluster structure), so the depth is CALIBRATED on a
    * bounded sample: take `nCal` deterministic queries, compute their
    * exact top-k once (one blocked ranking pass over the corpus for
    * ≤ nCal queries — the calibration budget, amortized over every
    * serve at the returned depth), find the probe rank of each true
    * neighbor's home cell in its query's cell ordering, and return
    * the smallest depth whose cumulative hit fraction clears
    * `recallFloor`. Candidate recall (true neighbor lands in a probed
    * cell) is exactly what probe depth controls, so the calibrated
    * depth transfers to the full query set up to sampling noise.
    * Always satisfiable: depth = nCells probes every cell (exact).
    * Driver-side state is ≤ nCal·k rank rows — bounded by contract.
    */
  def ivfProbeForRecall(
      corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Array[Seq[Float]], recallFloor: Double,
      nCal: Int = 64,
      id: String = "vec_id", emb: String = "embedding"): Int = {
    require(recallFloor > 0 && recallFloor <= 1,
      s"recallFloor must be in (0, 1], got $recallFloor")
    val nCells = centroids.length
    if (nCells <= 1) return math.max(1, nCells)
    val cal = queries.select(col(id), col(emb))
      .orderBy(xxhash64(col(id)), col(id)).limit(nCal)
    val truth = bruteForceTopK(corpus, cal, k, id, emb)
    // probe rank (1-based) of each true neighbor's home cell in its
    // query's best-cell-first ordering; one corpus pass assigns home
    // cells, the ≤ nCal·k truth rows broadcast into it
    val ranks = corpus
      .select(col(id).as("vec_id"),
        array_max(cellScores(col(emb), centroids)).getField("cell").as("__home"))
      .join(broadcast(truth.select(col("query_id"), col("vec_id"))), "vec_id")
      .join(broadcast(cal.select(col(id).as("query_id"),
        transform(reverse(array_sort(cellScores(col(emb), centroids))),
          s => s.getField("cell")).as("__order"))), "query_id")
      .select(array_position(col("__order"), col("__home")).as("__rank"))
      .collect().map(_.getLong(0))
    if (ranks.isEmpty) return 1
    val total = ranks.length.toDouble
    (1 to nCells).find(p => ranks.count(_ <= p) / total >= recallFloor)
      .getOrElse(nCells)
  }

  /** Persistable IVF index rows for `corpus` under a FROZEN quantizer:
    * (cell, vec_id, embedding), each vector assigned to its
    * best-cosine cell. This is the incremental-maintenance seam — the
    * ANN analog of [[graft.ops.Dedup]]'s persisted minhash band index:
    * write the index once, then index each NEW ingest batch with the
    * SAME centroids and append; assignment touches only the batch
    * (one codegen'd map, no shuffle), the historical corpus is never
    * re-scanned, and because assignment under a frozen quantizer is
    * deterministic the unioned index is row-identical to a full
    * rebuild (OpsSpec pins it). Retraining the quantizer is the one
    * operation that invalidates the index — by design, as in any IVF
    * system (e.g. the FAISS serving contract).
    */
  def ivfIndex(corpus: DataFrame, centroids: Array[Seq[Float]],
      id: String = "vec_id", emb: String = "embedding"): DataFrame =
    corpus
      .withColumn("cell",
        array_max(cellScores(col(emb), centroids)).getField("cell"))
      .select(col("cell"), col(id), col(emb))

  /** ANN top-k over a prebuilt [[ivfIndex]] — the serving shape:
    * queries probe their `nProbe` best cells and re-rank exactly
    * inside them. Same output contract as [[ivfTopK]] (which
    * delegates here after assigning inline).
    */
  def ivfTopKIndexed(index: DataFrame, queries: DataFrame, k: Int,
      centroids: Array[Seq[Float]], nProbe: Int,
      id: String = "vec_id", emb: String = "embedding"): DataFrame =
    probeTopK(
      index.select(col("cell"), col(id).as("cand_id"), col(emb).as("__cv")),
      queries, k, centroids, nProbe, id, emb,
      payloadCol = "__cv", score = VectorFunctions.cosineSim)

  /** The one definition of IVF probing, shared by every cell-indexed
    * serving variant (exact vectors, SQ8 codes) so probe selection and
    * tie-breaking can never drift between them: queries probe their
    * `nProbe` best cells, the (query, cell) probe rows broadcast into
    * the cell-keyed index — the explode hides the bounded query side
    * from Catalyst, which would otherwise shuffle the whole corpus for
    * a handful of probe rows — and `score` ranks candidates per query.
    */
  private def probeTopK(index: DataFrame, queries: DataFrame, k: Int,
      centroids: Array[Seq[Float]], nProbe: Int, id: String, emb: String,
      payloadCol: String, score: (Column, Column) => Column): DataFrame = {
    val probes = queries
      .withColumn("__cells",
        slice(reverse(array_sort(cellScores(col(emb), centroids))), 1, nProbe))
      .select(col(id).as("query_id"), col(emb).as("__qv"),
        explode(col("__cells").getField("cell")).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id").asc)
    index.join(broadcast(probes), Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("score", score(col(payloadCol), col("__qv")))
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col("query_id"), col("cand_id").as("vec_id"), col("score"))
  }

  /** IVF × SQ8 composite: inverted cells over scalar-quantized codes
    * — IVF-PQ's train-free sibling (4× compression instead of 32×,
    * no codebook training, and because SQ8 replay is deterministic
    * the whole composite sits under an exact oracle rather than a
    * recall bound). The stored relation is
    * (cell, cand_id, (vmin, δ, codes)) — one byte per dimension plus
    * two doubles rides the probe join; probing is the
    * [[ivfTopKIndexed]] shape (probes broadcast into the cell-keyed
    * index, corpus never shuffles) with [[VectorFunctions
    * .sq8AsymCosine]] as the scorer.
    */
  def ivfSq8TopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      centroids: Option[Array[Seq[Float]]] = None,
      id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    val cents = centroids.getOrElse(sampledCentroids(corpus, nCells, id, emb))
    ivfSq8TopKIndexed(ivfSq8Index(corpus, cents, id, emb), queries, k,
      cents, nProbe, id, emb)
  }

  /** Persistable IVF-SQ8 index rows under a FROZEN quantizer:
    * (cell, id, (vmin, δ, codes)) — the compressed sibling of
    * [[ivfIndex]], with the same incremental-maintenance contract
    * (encode+assign new batches only, append; deterministic under the
    * frozen quantizer, so the union is row-identical to a rebuild).
    */
  def ivfSq8Index(corpus: DataFrame, centroids: Array[Seq[Float]],
      id: String = "vec_id", emb: String = "embedding"): DataFrame =
    corpus
      .withColumn("cell",
        array_max(cellScores(col(emb), centroids)).getField("cell"))
      .select(col("cell"), col(id),
        VectorFunctions.sq8Encode(col(emb)).as("sq8"))

  /** Serving over a prebuilt [[ivfSq8Index]] — encode once, serve
    * many query batches against the compressed cells.
    */
  def ivfSq8TopKIndexed(index: DataFrame, queries: DataFrame, k: Int,
      centroids: Array[Seq[Float]], nProbe: Int,
      id: String = "vec_id", emb: String = "embedding"): DataFrame =
    probeTopK(
      index.select(col("cell"), col(id).as("cand_id"), col("sq8")),
      queries, k, centroids, nProbe, id, emb,
      payloadCol = "sq8", score = VectorFunctions.sq8AsymCosine)

  /** Per-row scored cells against a fixed centroid set: array of
    * (cosine-to-centroid, cellId) structs, via the fused
    * CentroidStructScores expression — the composed per-centroid
    * cosineSim form generates O(nCells·dim) source and falls out of
    * codegen at production cell counts (the LshBandBuckets lesson).
    * Cosine is scale-invariant in the centroid, so unnormalized Lloyd
    * means score identically to spherical-k-means normalized ones.
    */
  private def cellScores(v: Column, centroids: Array[Seq[Float]]): Column =
    VectorFunctions.centroidStructScores(v, centroids)

  /** The frozen coarse quantizer as a (cell, embedding) relation — the
    * persisted sibling of the in-memory centroid array, so an index
    * built in one process (the on-write trigger) can be SERVED from
    * another (the RPC `knn_ivf` job): index parquet + centroids parquet
    * together are the complete serving state.
    */
  def centroidsDF(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Seq[Float]]): DataFrame = {
    import spark.implicits._
    centroids.toIndexedSeq.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cell", "embedding")
  }

  /** Inverse of [[centroidsDF]]: cell-ordered centroid array. Cells
    * must be exactly 0..n-1 (the array index IS the cell id in every
    * probing path) — a gap means the relation is not a quantizer dump.
    */
  def loadCentroids(df: DataFrame): Array[Seq[Float]] = {
    val rows = df.select(col("cell").cast("int"), col("embedding"))
      .orderBy("cell").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i, s"centroid relation has cell gap at $i (got ${r.getInt(0)})")
    }
    rows.map(_.getSeq[Float](1))
  }

  /** Deterministic nCells-row corpus sample (lowest xxhash64(id)) —
    * the k-means init, and the default IVF quantizer.
    */
  def sampledCentroids(
      corpus: DataFrame, nCells: Int,
      id: String = "vec_id", emb: String = "embedding"): Array[Seq[Float]] =
    corpus.select(col(id), col(emb))
      .orderBy(xxhash64(col(id)), col(id))
      .limit(nCells)
      .collect()
      .map(_.getSeq[Float](1))

  /** Coarse-quantizer training: `iters` Lloyd iterations of spherical
    * k-means (cosine assignment, per-cell mean update), entirely as
    * Spark aggregations — per iteration one assignment map over the
    * corpus and one (cell, dim)-keyed mean shuffle of corpusRows × dim
    * value rows, the standard distributed k-means shape. The init is
    * a deterministic hash sample, assignment ties break
    * deterministically (array_max picks the highest (score, cell)
    * struct), and a cell emptied by an iteration keeps its previous
    * centroid. The per-cell float means themselves can vary in the
    * last bits run to run (partial-sum combine order follows task
    * scheduling) — cell-level structure is stable, and exact-oracle
    * consumers must not depend on centroid bits (full-probe ivfTopK
    * doesn't: it scores every vector against the original embeddings
    * whatever the partition).
    */
  def trainedCentroids(
      corpus: DataFrame, nCells: Int, iters: Int = 3,
      id: String = "vec_id", emb: String = "embedding"): Array[Seq[Float]] = {
    val base = corpus.select(col(emb))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = sampledCentroids(corpus, nCells, id, emb)
    try {
      (0 until iters).foreach { _ =>
        val means = base
          .withColumn("cell", array_max(cellScores(col(emb), cents)).getField("cell"))
          .select(col("cell"), posexplode(col(emb)).as(Seq("pos", "v")))
          .groupBy("cell", "pos").agg(avg(col("v")).as("m"))
          .groupBy("cell")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m").cast("float")).as("c"))
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
        cents = cents.zipWithIndex.map { case (old, i) => means.getOrElse(i, old) }
      }
      cents
    } finally { base.unpersist(); () }
  }

  /** Collapse exact-duplicate vectors (grouped on the embedding array
    * itself — byte-equality, no hashing approximation) to one
    * representative before a pairwise similarity join, then expand the
    * representative pairs back through group membership — the vector
    * analog of the text-side clone-collapse gate in
    * [[graft.ops.Dedup]]. Bit-identical to the uncollapsed operator:
    * cross-group pairs reuse the representatives' score (same input
    * bytes → same codegen'd cosine), and within-group pairs compute
    * cosineSim(v, v) through the same expression and threshold filter
    * the uncollapsed self-join would apply to the identical twin pair.
    * Clone groups otherwise inflate the candidate stage quadratically
    * in the group size (g twins share EVERY band bucket / land in the
    * same blocks).
    *
    * Gated on the same cheap distinct-ratio probe as the text side
    * ([[graft.ops.Dedup.cloneHeavy]]): a clone-free corpus skips the
    * group pass entirely — identical output, cheaper plan.
    */
  private def collapsedVecPairs(
      df: DataFrame, threshold: Double, id: String, emb: String)(
      pairFn: DataFrame => DataFrame): DataFrame = {
    if (!Dedup.cloneHeavy(df, col(emb))) return pairFn(df)
    val groups = df.select(col(id), col(emb))
      .groupBy(col(emb))
      .agg(min(col(id)).as("__rep"), sort_array(collect_list(col(id))).as("__ids"))
      .transform(graft.ops.CacheScope.scopedPersist)
    val repPairs = pairFn(groups.select(col("__rep").as(id), col(emb)))
    val m1 = groups.select(col("__rep").as("id1"), col("__ids").as("__ids1"))
    val m2 = groups.select(col("__rep").as("id2"), col("__ids").as("__ids2"))
    val cross = repPairs.join(m1, "id1").join(m2, "id2")
      .withColumn("__a", explode(col("__ids1")))
      .withColumn("__b", explode(col("__ids2")))
      .select(least(col("__a"), col("__b")).as("id1"),
        greatest(col("__a"), col("__b")).as("id2"), col("score"))
    val within = groups.filter(size(col("__ids")) >= 2)
      .withColumn("score", VectorFunctions.cosineSim(col(emb), col(emb)))
      .filter(col("score") >= lit(threshold))
      .withColumn("__a", explode(col("__ids")))
      .withColumn("__b", explode(col("__ids")))
      .filter(col("__a") < col("__b"))
      .select(col("__a").as("id1"), col("__b").as("id2"), col("score"))
    cross.unionByName(within)
  }

  /** Near-duplicate pairs by embedding cosine ≥ threshold — EXACT,
    * via a blocked self-join (no CartesianProduct in the plan).
    *
    * Exact threshold-cosine over dense vectors is inherently O(N²)
    * flops, but it need not be an O(N²)-row shuffle: hash the ids
    * into `numBlocks` blocks, collect each block's vectors into one
    * array row, join the ~B²/2 ordered block PAIRS (B small), and run
    * the dense pair loop inside each block pair with higher-order
    * functions + the codegen'd cosine expression. Shuffle volume is
    * O(N·B) vector bytes instead of O(N²) row pairs, and every task
    * is a tight flop-bound loop — the standard distributed exact
    * all-pairs layout. Tune numBlocks ≈ √(N²/targetPairsPerTask).
    *
    * When the score threshold sits in the bulk of the similarity
    * distribution (as in random-embedding corpora) NO exact method
    * beats O(N²) flops; for true near-dup thresholds (≥ ~0.8) prefer
    * the LSH candidates + exact-verify path ([[lshTopK]] machinery),
    * which is sub-quadratic but approximate.
    *
    * `numBlocks <= 0` (the default) auto-sizes from one cheap corpus
    * count: blocks are chosen so a block's collect_list row stays
    * ~[[Similarity.MaxRowsPerBlock]] vectors (≈1 MB at d=64 f4) —
    * far from Spark's single-row limits at any corpus size.
    */
  def cosineDedupPairs(
      df: DataFrame, threshold: Double,
      id: String = "vec_id", emb: String = "embedding",
      numBlocks: Int = 0,
      collapseExact: Boolean = true): DataFrame =
    if (collapseExact)
      collapsedVecPairs(df, threshold, id, emb)(reps =>
        cosineDedupPairs(reps, threshold, id, emb, numBlocks,
          collapseExact = false))
    else cosineDedupPairsDistinct(df, threshold, id, emb, numBlocks)

  private def cosineDedupPairsDistinct(
      df: DataFrame, threshold: Double,
      id: String, emb: String, numBlocks: Int): DataFrame = {
    val nb =
      if (numBlocks > 0) numBlocks
      else autoBlocks(df.select(col(id)).count())
    val blocks = df
      .select(col(id), col(emb))
      .withColumn("__blk", pmod(xxhash64(col(id)), lit(nb)).cast("int"))
      .groupBy("__blk")
      .agg(collect_list(struct(col(id).as("i"), col(emb).as("v"))).as("__items"))
    // Each block's payload reaches its ordered block pairs by
    // EXPLODING the partner id range (L emits (bl, br) for br ≥ bl,
    // R emits (bl, br) for bl ≤ br) and equi-joining on (bl, br).
    // The previous `__bl <= __br` NON-equi join planned as
    // BroadcastNestedLoopJoin — broadcasting the entire blocked
    // corpus (~2.5 GB at 10M 64-d vectors), which dies at the
    // broadcast long before the (inherent, documented) flops. The
    // explode+equi-join shape shuffles the documented O(N·B) vector
    // bytes and broadcasts nothing; the merge hint pins SortMergeJoin
    // so post-aggregate size underestimates can never re-introduce a
    // payload broadcast.
    val L = blocks.select(col("__blk").as("__bl"),
      explode(sequence(col("__blk"), lit(nb - 1))).as("__br"),
      col("__items").as("__L"))
    val R = blocks.select(
      explode(sequence(lit(0), col("__blk"))).as("__bl"),
      col("__blk").as("__br"),
      col("__items").as("__R"))
    val blockPairs = L.hint("merge").join(R.hint("merge"), Seq("__bl", "__br"))
    val pairs = blockPairs.select(
      explode(flatten(transform(col("__L"), a =>
        filter(
          transform(col("__R"), b =>
            struct(
              least(a("i"), b("i")).as("id1"),
              greatest(a("i"), b("i")).as("id2"),
              // skip the cosine flops for the half we discard
              when(col("__bl") < col("__br") || a("i") < b("i"),
                VectorFunctions.cosineSim(a("v"), b("v"))).as("score"))),
          s => s("score").isNotNull && s("score") >= lit(threshold))))).as("p"))
    pairs.select(col("p.id1").as("id1"), col("p.id2").as("id2"), col("p.score").as("score"))
  }

  /** SemDeDup-style semantic dedup (Abbas, Tirumala, Simig, Ganguli,
    * Morcos — "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication", arXiv:2303.09540): partition the corpus
    * with a coarse k-means quantizer (Lloyd-trained here, or injected
    * pretrained), then emit cosine pairs ≥ threshold WITHIN cells
    * only. The quadratic pair cost is bounded per cell — the
    * algorithm's point: Σ|cell|² ≪ N² when the quantizer spreads the
    * corpus — and cross-cell near-dups are the accepted recall loss.
    *
    * Scale design: cell pair enumeration reuses the blocked
    * explode+equi-join shape of [[cosineDedupPairs]], keyed on
    * (cell, blockL, blockR): the shuffle ships each vector O(B) times,
    * nothing is broadcast, and a skewed giant cell fans out across its
    * B² block pairs instead of serializing in one task.
    */
  def semanticDedupPairs(
      df: DataFrame, threshold: Double, nCells: Int,
      trainIters: Int = 2,
      centroids: Option[Array[Seq[Float]]] = None,
      id: String = "vec_id", emb: String = "embedding",
      blocksPerCell: Int = 0,
      collapseExact: Boolean = true): DataFrame =
    // identical vectors land in the same cell with the same scores, so
    // the clone-collapse gate composes exactly as for the flat cosine
    // op — without it a clone-heavy corpus (g copies each) inflates
    // every cell quadratically in g (measured: OOM at the 50×-clone
    // bench point; collapsed, the cells see distinct vectors only)
    if (collapseExact)
      collapsedVecPairs(df, threshold, id, emb)(reps =>
        semanticDedupPairs(reps, threshold, nCells, trainIters, centroids,
          id, emb, blocksPerCell, collapseExact = false))
    else
      semanticDedupPairsDistinct(df, threshold, nCells, trainIters, centroids,
        id, emb, blocksPerCell)

  /** [[semanticDedupPairs]] with a BOUNDED output: at most
    * `maxPairsPerCell` pairs per quantizer cell, kept by deterministic
    * priority (score desc, then (id1, id2) asc). The uncapped operator
    * is output-quadratic under adversarial clone mass (a cell holding
    * g copies of one vector owes g²/2 pairs — measured 133 s at the
    * 100× clone-planted bench point, inherent to the all-pairs
    * contract); this is the 100 TB-safe shape: total output ≤
    * nCells × cap whatever the clone structure, and under clone mass
    * the score-desc priority keeps exactly the highest-similarity
    * (clone) pairs a pruning pass acts on first.
    *
    * Scale design — the cap bounds every STAGE, not just the output:
    *  - clone-heavy corpora (probe-gated, as everywhere in the pair
    *    family) collapse to distinct representatives first, so the
    *    expensive scoring pass runs on distinct vectors only;
    *  - each (cell, blockL, blockR) join task locally sorts and keeps
    *    its own top-cap (safe: a locally dropped pair is dominated by
    *    ≥ cap same-task pairs under the same total order);
    *  - clone-group re-expansion is LAZY and cap-bounded: member id
    *    lists are sliced to cap+1 before the cross product (the
    *    lexicographically-first cap expanded pairs of a rep pair use
    *    only each group's cap+1 smallest ids — any deeper pair is
    *    dominated within its own expansion), so no stage ever holds
    *    more than (cap+1)² candidates per rep pair;
    *  - one per-cell window ranks the bounded survivors.
    */
  def semanticDedupPairsCapped(
      df: DataFrame, threshold: Double, nCells: Int, maxPairsPerCell: Int,
      trainIters: Int = 2,
      centroids: Option[Array[Seq[Float]]] = None,
      id: String = "vec_id", emb: String = "embedding",
      blocksPerCell: Int = 0): DataFrame = {
    require(maxPairsPerCell >= 1, s"maxPairsPerCell must be positive, got $maxPairsPerCell")
    val cap = maxPairsPerCell
    val keyed = df.select(col(id), col(emb))
    def rank(local: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("__cell"))
        .orderBy(col("score").desc, col("id1").asc, col("id2").asc)
      local.withColumn("__rank", row_number().over(w))
        .filter(col("__rank") <= cap)
        .select(col("id1"), col("id2"), col("score"))
    }
    if (!Dedup.cloneHeavy(keyed, col(emb)))
      return rank(cappedCellPairsLocal(keyed, threshold, nCells, cap,
        trainIters, centroids, id, emb, blocksPerCell))
    // clone-heavy: score DISTINCT vectors only, then re-expand each
    // surviving rep pair lazily under the cap
    val groups = keyed.groupBy(col(emb))
      .agg(min(col(id)).as("__rep"), sort_array(collect_list(col(id))).as("__ids"))
      .transform(graft.ops.CacheScope.scopedPersist)
    val reps = groups.select(col("__rep").as(id), col(emb))
    val cents = centroids.getOrElse(trainedCentroids(reps, nCells, trainIters, id, emb))
    val repLocal = cappedCellPairsLocal(reps, threshold, nCells, cap,
      trainIters, Some(cents), id, emb, blocksPerCell)
    // cross-group expansion: sliced sorted id lists -> ≤ (cap+1)²
    // candidates per rep pair -> local top-cap by (id1, id2) (scores
    // are equal across one rep pair's expansion)
    val m1 = groups.select(col("__rep").as("id1"),
      slice(col("__ids"), 1, cap + 1).as("__ids1"))
    val m2 = groups.select(col("__rep").as("id2"),
      slice(col("__ids"), 1, cap + 1).as("__ids2"))
    val cross = repLocal.join(m1, "id1").join(m2, "id2")
      .select(col("__cell"), col("score"),
        explode(slice(array_sort(flatten(transform(col("__ids1"), a =>
          transform(col("__ids2"), b =>
            struct(least(a, b).as("id1"), greatest(a, b).as("id2")))))),
          1, cap)).as("p"))
      .select(col("__cell"), col("p.id1").as("id1"), col("p.id2").as("id2"),
        col("score"))
    // within-group pairs (identical vectors): same score convention as
    // the uncapped collapse (computed self-cosine, not a literal), the
    // group's own cell, and the lexicographically-first cap pairs of
    // the sliced sorted id list
    val idsCut = slice(col("__ids"), 1, cap + 1)
    val within = groups.filter(size(col("__ids")) >= 2)
      .withColumn("score", VectorFunctions.cosineSim(col(emb), col(emb)))
      .filter(col("score") >= lit(threshold))
      .withColumn("__cell", array_max(cellScores(col(emb), cents)).getField("cell"))
      .select(col("__cell"), col("score"),
        explode(slice(array_sort(flatten(transform(idsCut, a =>
          filter(transform(idsCut, b =>
            struct(a.as("id1"), b.as("id2"))),
            p => p("id1") < p("id2"))))), 1, cap)).as("p"))
      .select(col("__cell"), col("p.id1").as("id1"), col("p.id2").as("id2"),
        col("score"))
    rank(cross.unionByName(within))
  }

  /** The distinct-corpus core of [[semanticDedupPairsCapped]]: cell
    * assignment, blocked in-cell pair scoring, and the per-task local
    * top-cap — returns the UNranked (cell, id1, id2, score) survivors
    * (≤ B²·cap per cell) for the caller's window. The negated score
    * leads the sort struct: array_sort ascending == score desc, then
    * (id1, id2) asc — the same priority the final window applies, so
    * the local cut can never drop a global keeper.
    */
  private def cappedCellPairsLocal(
      df: DataFrame, threshold: Double, nCells: Int, cap: Int,
      trainIters: Int, centroids: Option[Array[Seq[Float]]],
      id: String, emb: String, blocksPerCell: Int): DataFrame = {
    val cents = centroids.getOrElse(trainedCentroids(df, nCells, trainIters, id, emb))
    val assigned = df
      .select(col(id), col(emb))
      .withColumn("__cell", array_max(cellScores(col(emb), cents)).getField("cell"))
      .transform(graft.ops.CacheScope.scopedPersist)
    val nb =
      if (blocksPerCell > 0) blocksPerCell
      else autoBlocks(math.max(1L, {
        val r = assigned.groupBy("__cell").count().agg(max("count")).head()
        if (r.isNullAt(0)) 1L else r.getLong(0)
      }))
    val blocks = assigned
      .withColumn("__blk", pmod(xxhash64(col(id)), lit(nb)).cast("int"))
      .groupBy("__cell", "__blk")
      .agg(collect_list(struct(col(id).as("i"), col(emb).as("v"))).as("__items"))
    val L = blocks.select(col("__cell"), col("__blk").as("__bl"),
      explode(sequence(col("__blk"), lit(nb - 1))).as("__br"),
      col("__items").as("__L"))
    val R = blocks.select(col("__cell"),
      explode(sequence(lit(0), col("__blk"))).as("__bl"),
      col("__blk").as("__br"),
      col("__items").as("__R"))
    val pairsArr = flatten(transform(col("__L"), a =>
      filter(
        transform(col("__R"), b =>
          struct(
            (-when(col("__bl") < col("__br") || a("i") < b("i"),
              VectorFunctions.cosineSim(a("v"), b("v")))).as("negs"),
            least(a("i"), b("i")).as("id1"),
            greatest(a("i"), b("i")).as("id2"))),
        s => s("negs").isNotNull && s("negs") <= lit(-threshold))))
    L.hint("merge").join(R.hint("merge"), Seq("__cell", "__bl", "__br"))
      .select(col("__cell"),
        explode(slice(array_sort(pairsArr), 1, cap)).as("p"))
      .select(col("__cell"), col("p.id1").as("id1"), col("p.id2").as("id2"),
        (-col("p.negs")).as("score"))
  }

  private def semanticDedupPairsDistinct(
      df: DataFrame, threshold: Double, nCells: Int,
      trainIters: Int,
      centroids: Option[Array[Seq[Float]]],
      id: String, emb: String,
      blocksPerCell: Int): DataFrame = {
    val cents = centroids.getOrElse(trainedCentroids(df, nCells, trainIters, id, emb))
    val assigned = df
      .select(col(id), col(emb))
      .withColumn("__cell", array_max(cellScores(col(emb), cents)).getField("cell"))
      .transform(graft.ops.CacheScope.scopedPersist)
    // block count sized from the LARGEST cell, not the average:
    // autoBlocks bounds the per-block collect_list row width, and a
    // skewed quantizer (half the corpus in one cell) would overrun an
    // average-based bound by the skew factor. One extra bounded agg
    // (nCells rows) over the persisted assignment, which also feeds
    // the lazy block build below — the operator cannot unpersist a
    // relation under a frame it returns (same cache-lifetime contract
    // as the pipeline entry: Bench clears caches per query, other
    // repeated callers rely on ContextCleaner).
    val nb =
      if (blocksPerCell > 0) blocksPerCell
      else autoBlocks(math.max(1L, {
        val r = assigned.groupBy("__cell").count().agg(max("count")).head()
        if (r.isNullAt(0)) 1L else r.getLong(0)
      }))
    val blocks = assigned
      .withColumn("__blk", pmod(xxhash64(col(id)), lit(nb)).cast("int"))
      .groupBy("__cell", "__blk")
      .agg(collect_list(struct(col(id).as("i"), col(emb).as("v"))).as("__items"))
    val L = blocks.select(col("__cell"), col("__blk").as("__bl"),
      explode(sequence(col("__blk"), lit(nb - 1))).as("__br"),
      col("__items").as("__L"))
    val R = blocks.select(col("__cell"),
      explode(sequence(lit(0), col("__blk"))).as("__bl"),
      col("__blk").as("__br"),
      col("__items").as("__R"))
    L.hint("merge").join(R.hint("merge"), Seq("__cell", "__bl", "__br"))
      .select(
        explode(flatten(transform(col("__L"), a =>
          filter(
            transform(col("__R"), b =>
              struct(
                least(a("i"), b("i")).as("id1"),
                greatest(a("i"), b("i")).as("id2"),
                when(col("__bl") < col("__br") || a("i") < b("i"),
                  VectorFunctions.cosineSim(a("v"), b("v"))).as("score"))),
            s => s("score").isNotNull && s("score") >= lit(threshold))))).as("p"))
      .select(col("p.id1").as("id1"), col("p.id2").as("id2"),
        col("p.score").as("score"))
  }

  /** Near-duplicate pairs by embedding cosine ≥ threshold —
    * APPROXIMATE sub-quadratic path, the scale alternative to
    * [[cosineDedupPairs]] for true near-dup thresholds (≥ ~0.8):
    * random-hyperplane banding proposes candidate pairs (the bucket
    * self-join shuffles only (id, band, bucket), mirroring the
    * minhash/simhash shape), then EXACT cosine verifies each
    * surviving candidate once, so false positives never reach the
    * output — only recall is approximate. Identical vectors agree on
    * every sign bit, so exact duplicates are found with probability 1
    * at any banding; the default 16×8 banding keeps random isotropic
    * pairs colliding in ≥1 band at only ~6% (see [[lshTopK]]).
    * Scores are the same double-accumulated cosine as the exact
    * operator, so outputs are directly comparable.
    */
  def cosineDedupPairsLsh(
      df: DataFrame, threshold: Double,
      bands: Int = 16, rowsPerBand: Int = 0, dim: Int = 64,
      id: String = "vec_id", emb: String = "embedding", seed: Long = 42L,
      collapseExact: Boolean = true): DataFrame =
    if (collapseExact)
      collapsedVecPairs(df, threshold, id, emb)(reps =>
        cosineDedupPairsLsh(reps, threshold, bands, rowsPerBand, dim, id,
          emb, seed, collapseExact = false))
    else cosineDedupPairsLshDistinct(df, threshold, bands, rowsPerBand,
      dim, id, emb, seed)

  private def cosineDedupPairsLshDistinct(
      df: DataFrame, threshold: Double,
      bands: Int, rowsPerBand: Int, dim: Int,
      id: String, emb: String, seed: Long): DataFrame = {
    val base = df.select(col(id), col(emb))
    // bucket count must track corpus size: r sign bits give 2^r
    // buckets per band, and isotropic bucket occupancy N/2^r drives
    // candidate volume ~bands·N²/2^r — so auto-size r ≈ log2(N/4)
    // (floor 8 keeps the small-corpus behavior, cap 24 bounds codegen)
    val r =
      if (rowsPerBand > 0) rowsPerBand
      else math.min(24, math.max(8,
        math.ceil(math.log(math.max(base.count(), 2L) / 4.0) / math.log(2)).toInt))
    val planes = hyperplanes(bands, r, dim, seed)
    // sign bits are scale-invariant, so raw vectors band identically
    // to unit vectors; the vector itself stays out of the self-join
    // and rejoins per candidate side after pair dedup
    val banded = bandedRows(base, id, id, emb, planes)
    val cands = banded.select(col(id).as("id1"), col("band"), col("bucket"))
      .join(banded.select(col(id).as("id2"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2")
      .dropDuplicates("id1", "id2")
    cands
      .join(base.select(col(id).as("id1"), col(emb).as("__v1")), "id1")
      .join(base.select(col(id).as("id2"), col(emb).as("__v2")), "id2")
      .withColumn("score", VectorFunctions.cosineSim(col("__v1"), col("__v2")))
      .filter(col("score") >= threshold)
      .select("id1", "id2", "score")
  }

  /** Deterministic PQ codebook init: subspace j's codewords are the
    * j-th subvectors of the `ksub` lowest-xxhash64(id) corpus rows —
    * the per-subspace analog of [[sampledCentroids]].
    */
  def sampledPqCodebooks(
      corpus: DataFrame, m: Int, ksub: Int,
      id: String = "vec_id", emb: String = "embedding"): Array[Array[Array[Float]]] = {
    val rows = corpus.select(col(id), col(emb))
      .orderBy(xxhash64(col(id)), col(id))
      .limit(ksub)
      .collect()
      .map(_.getSeq[Float](1))
    require(rows.length == ksub, s"corpus has ${rows.length} rows < ksub $ksub")
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    Array.tabulate(m, ksub)((j, k) => rows(k).slice(j * dsub, (j + 1) * dsub).toArray)
  }

  /** PQ codebook training: `iters` Lloyd iterations of per-subspace
    * L2 k-means, all m subspaces in one distributed pass per
    * iteration — assignment is a single fused [[VectorFunctions.pqEncode]]
    * projection over the corpus, the update one (subspace, code, dim)
    * mean shuffle of corpusRows × d value rows, and the collect is
    * m·ksub·dsub rows (the codebook itself), never corpus-sized. A
    * codeword left empty by an iteration keeps its previous value.
    * Same float-mean caveat as [[trainedCentroids]]: cell structure is
    * stable run to run, the mean's last bits are not — exact-oracle
    * consumers must not depend on trained codebook bits.
    */
  def trainedPqCodebooks(
      corpus: DataFrame, m: Int, ksub: Int, iters: Int = 2,
      id: String = "vec_id", emb: String = "embedding"): Array[Array[Array[Float]]] = {
    var cb = sampledPqCodebooks(corpus, m, ksub, id, emb)
    if (iters <= 0) return cb
    val dsub = cb.head.head.length
    val base = corpus.select(col(emb))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      (0 until iters).foreach { _ =>
        val means = base
          .select(col(emb),
            posexplode(VectorFunctions.pqEncode(col(emb), cb, bytes = false))
              .as(Seq("j", "code")))
          .select(col("j"), col("code"),
            posexplode(slice(col(emb), col("j") * lit(dsub) + lit(1), lit(dsub)))
              .as(Seq("t", "v")))
          .groupBy("j", "code", "t").agg(avg(col("v")).as("mv"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
          .toMap
        cb = Array.tabulate(m, ksub) { (j, k) =>
          if (means.contains((j, k, 0)))
            Array.tabulate(dsub)(t => means((j, k, t)).toFloat)
          else cb(j)(k)
        }
      }
      cb
    } finally { base.unpersist(); () }
  }

  /** Product-quantization ANN (Jégou et al., TPAMI 2011): encode the
    * corpus to m-byte codes, score queries by asymmetric distance
    * (dot with the codeword reconstruction) and take top-k. Same
    * output shape as [[bruteForceTopK]], but the corpus side of the
    * scan carries 4·d/m× less data (8 B vs 256 B at d=64, m=8) and
    * each pair costs m table adds instead of a d-element dot — the
    * memory-bound regime PQ exists for. At 100 TB the encoded corpus
    * is what you'd persist; `codebooks` injects a pretrained
    * quantizer (the serving shape), `trainIters` > 0 Lloyd-trains one
    * here ([[trainedPqCodebooks]]), and the default is the sampled
    * init. Scores are dot products (on unit-normalized corpora ≅
    * cosine); approximate unless encoding is lossless — recall is
    * OpsSpec's check, the exactness identity ADC == dot(q,
    * reconstruction) is pinned by the planted-codeword oracle entry.
    */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 16, trainIters: Int = 0,
      codebooks: Option[Array[Array[Array[Float]]]] = None,
      id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    val cb = codebooks.getOrElse(
      if (trainIters <= 0) sampledPqCodebooks(corpus, m, ksub, id, emb)
      else trainedPqCodebooks(corpus, m, ksub, trainIters, id, emb))
    // the compressed corpus: (id, m-byte code) — at scale this is the
    // stored/scanned relation, vectors never ride the scoring scan
    val encoded = corpus.select(col(id).as("cand_id"),
      VectorFunctions.pqEncode(col(emb), cb).as("__code"))
    // queries are the bounded broadcast side (bruteForceTopK's
    // contract); each carries its ADC table, computed once per query
    val q = broadcast(queries.select(col(id).as("query_id"),
      VectorFunctions.pqLut(col(emb), cb).as("__lut")))
    val ksubN = cb.head.length
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id").asc)
    encoded.crossJoin(q)
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("score", VectorFunctions.pqAdcScore(col("__code"), col("__lut"), m, ksubN))
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col("query_id"), col("cand_id").as("vec_id"), col("score"))
  }

  /** IVF-PQ — the standard billion-scale ANN layout (Jégou et al.,
    * TPAMI 2011 §V; the serving shape of FAISS-style indexes): a
    * coarse quantizer routes each vector to a cell, PQ codes compress
    * what's stored per cell, and a query probes its `nProbe` best
    * cells scoring m-byte codes by ADC. Composition of the two
    * shipped primitives: the cell-keyed shuffle of [[ivfTopK]] (each
    * query touches ~nProbe/nCells of the corpus) over the compressed
    * codes of [[pqTopK]] (8 B instead of 256 B per stored vector at
    * d=64, m=8) — at 100 TB the per-cell code relation is ~1/32 the
    * raw corpus and the probe scan is ADC table adds.
    *
    * `residual = true` (the paper's §V layout) encodes v − c(v): the
    * score is dot(q, c) + ADC(code, LUT(q)) — reconstruction error
    * drops because residuals concentrate near 0. `false` encodes raw
    * vectors (score = ADC alone), which makes full-probe search on a
    * lossless-codebook corpus EXACTLY exhaustive — the oracle
    * configuration (`q_knn_ivfpq_exact`). Scores are dot products,
    * directly comparable to [[pqTopK]]/[[bruteForceTopK]]-on-dots.
    */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      m: Int = 8, ksub: Int = 16,
      trainIters: Int = 0, residual: Boolean = true,
      centroids: Option[Array[Seq[Float]]] = None,
      codebooks: Option[Array[Array[Array[Float]]]] = None,
      id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    val cents = centroids.getOrElse(
      if (trainIters <= 0) sampledCentroids(corpus, nCells, id, emb)
      else trainedCentroids(corpus, nCells, trainIters, id, emb))
    val centsLit = typedlit(cents.map(_.toSeq).toSeq)
    def centOf(cell: Column): Column = element_at(centsLit, cell + 1)
    def resid(v: Column, cell: Column): Column =
      zip_with(v, centOf(cell), (x, c) => x - c)
    val assigned = corpus
      .withColumn("cell", array_max(cellScores(col(emb), cents)).getField("cell"))
      .withColumn("__enc",
        if (residual) resid(col(emb), col("cell")) else col(emb))
    val cb = codebooks.getOrElse(trainedPqCodebooks(
      assigned.select(col(id), col("__enc").as(emb)), m, ksub,
      math.max(trainIters, 1), id, emb))
    // the stored relation: (cell, id, m-byte code) — nothing else
    // rides the probe join
    val encoded = assigned.select(col("cell"), col(id).as("cand_id"),
      VectorFunctions.pqEncode(col("__enc"), cb).as("__code"))
    // per query: nProbe probe rows; the ADC table is built from the
    // FULL query vector (dot(q, c + r̂) = dot(q,c) + dot(q, r̂)), the
    // centroid dot is the per-cell scalar correction
    val probes = queries
      // LUT ABOVE the probe explode: below it, the m·ksub·dsub-flop
      // table would recompute once per probe row and broadcast nProbe
      // copies per query
      .withColumn("__lut", VectorFunctions.pqLut(col(emb), cb))
      .withColumn("__cells",
        slice(reverse(array_sort(cellScores(col(emb), cents))), 1, nProbe))
      .select(col(id).as("query_id"), col(emb).as("__q"), col("__lut"),
        explode(col("__cells").getField("cell")).as("cell"))
      .withColumn("__cdot",
        if (residual) VectorFunctions.dotF(col("__q"), centOf(col("cell")))
        else lit(0.0))
      .select(col("query_id"), col("cell"), col("__lut"), col("__cdot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id").asc)
    encoded.join(broadcast(probes), Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("score", col("__cdot") +
        VectorFunctions.pqAdcScore(col("__code"), col("__lut"), m, cb.head.length))
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col("query_id"), col("cand_id").as("vec_id"), col("score"))
  }

  /** Planted-codeword PQ oracle fixture: the codebook is the subvector
    * grid of the `ksub` lowest-id vectors of `e` (exact floats both
    * engines read), and corpus vector v is the codeword concatenation
    * selected per subspace by the nibbles of a Knuth multiplicative
    * hash of v — injective, so every corpus vector is a distinct
    * combination and encoding is LOSSLESS (each subvector sits in the
    * codebook at L2 distance 0). ADC then equals the exact dot
    * product, putting the whole PQ/IVF-PQ pipeline under an
    * exhaustive DuckDB oracle. ONE definition shared by the
    * `q_knn_pq_exact` / `q_knn_ivfpq_exact` entries and the OpsSpec
    * anchors: the construction must stay bit-identical to the oracle
    * SQL that mirrors it (donor join on
    * `((vec_id * 2654435761) % 2^32 >> 4j) & 15`), and three drifting
    * copies were how that guarantee would die.
    */
  def plantedPqCorpus(
      e: DataFrame, m: Int = 8, ksub: Int = 16,
      id: String = "vec_id", emb: String = "embedding"): (DataFrame, Array[Array[Array[Float]]]) = {
    val base = e.select(col(id), col(emb))
    val donors = base.filter(col(id) < ksub).orderBy(id).collect()
      .map(_.getSeq[Float](1))
    require(donors.length == ksub, s"need $ksub donor rows, got ${donors.length}")
    val dim = donors.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val cb = Array.tabulate(m, ksub)((j, k) =>
      donors(k).slice(j * dsub, (j + 1) * dsub).toArray)
    val h = pmod(col(id) * lit(2654435761L), lit(4294967296L))
    val planted = base.select(col(id),
      concat((0 until m).map(j =>
        element_at(typedlit((0 until ksub).map(k => cb(j)(k).toSeq)),
          (shiftright(h, 4 * j).bitwiseAND(lit(15)) + 1).cast("int"))): _*)
        .as(emb))
    (planted, cb)
  }

  /** Deterministic Johnson–Lindenstrauss projection matrix — the
    * Achlioptas sign construction ("Database-friendly random
    * projections", PODS 2001): k rows of dim entries, each ±1/√k with
    * equal probability, seeded. With k = 16 the scale 1/√16 = 0.25 is
    * an exact dyadic float, so the matrix round-trips bit-exactly
    * through decimal literals (the oracle embeds it as SQL VALUES).
    */
  def jlPlanes(k: Int, dim: Int, seed: Long = 42L): Array[Array[Float]] = {
    require(k > 0 && dim > 0, s"k and dim must be positive: $k, $dim")
    // bit-exact-oracle precondition: only when k is a power of 4 is
    // 1/√k an exact dyadic float, so the matrix survives a decimal
    // SQL-literal round trip (q_vec_project embeds it as VALUES).
    // Other k are mathematically fine but would drift sub-ulp between
    // engines behind the oracle's round(…, 6) guard — refuse loudly
    // rather than flake silently.
    require((java.lang.Integer.bitCount(k) == 1) && (java.lang.Integer.numberOfTrailingZeros(k) % 2 == 0),
      s"k must be a power of 4 (1/sqrt(k) exactly representable), got $k")
    val s = (1.0 / math.sqrt(k.toDouble)).toFloat
    val rnd = new scala.util.Random(seed)
    Array.fill(k, dim)(if (rnd.nextBoolean()) s else -s)
  }

  /** Random-projection dimensionality reduction: maps each embedding
    * to `planes.length` coordinates, proj_j = ⟨v, planes_j⟩ — the
    * Johnson–Lindenstrauss lemma guarantees pairwise distances are
    * preserved within ε with k = O(ln n / ε²) rows, independent of
    * the source dimension. The 100 TB role: shrink the stored/scanned
    * vector bytes (and every downstream dot product) by dim/k before
    * brute-force or LSH search — the projected corpus is what you'd
    * persist for first-pass retrieval, re-ranking survivors on the
    * original vectors.
    *
    * Per-row map, no shuffle; each output coordinate is one codegen'd
    * [[VectorFunctions.dotF]] against a literal plane (k reference
    * objects — small enough to stay in whole-stage codegen at the
    * default k=16, unlike the bands×rows LSH tensor that needed
    * fusing). Double accumulation, so scores are bit-comparable
    * across engines the same way the cosine operators are.
    */
  def projectEmbeddings(
      df: DataFrame, planes: Array[Array[Float]],
      id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    require(planes.nonEmpty, "projection needs at least one plane")
    df.select(col(id),
      array(planes.map(row =>
        VectorFunctions.dotF(col(emb), typedlit(row.toSeq))): _*).as("proj"))
  }

  /** Cap on vectors collected into one block row of
    * [[cosineDedupPairs]] (~1 MB of f4 at d=64).
    */
  val MaxRowsPerBlock = 4096

  /** Auto block count: enough blocks to keep each collect_list row
    * under [[MaxRowsPerBlock]] vectors, floor of 8 so small corpora
    * still parallelize across block pairs.
    */
  private[graft] def autoBlocks(corpusRows: Long): Int =
    math.max(8L, (corpusRows + MaxRowsPerBlock - 1) / MaxRowsPerBlock)
      .min(Int.MaxValue).toInt

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein, SIGIR
    * 1998): from a per-query candidate set with relevance scores,
    * greedily select k results maximizing
    * λ·rel(d) − (1−λ)·max_{s ∈ selected} cos(d, s) — the standard
    * diversity re-rank that stops near-duplicate hits from filling
    * the top-k. The first pick is the pure-relevance argmax; ties
    * break by (relevance desc, id asc).
    *
    * Scale shape: the greedy loop is inherently sequential in k but
    * runs PER QUERY over a candidate set bounded by the upstream ANN
    * fetch (contract: ≤ ~1k candidates/query); queries spread over
    * the cluster as flatMapGroups groups — one shuffle on query_id,
    * no driver involvement, O(fetch²·k·d) flops per query. All
    * arithmetic is double IEEE over candidate-row order, so a SQL
    * engine replaying the same unrolled selections agrees (the
    * oracle does, with pre-rounded input scores).
    *
    * Input columns: (query_id, `id`, score, `emb`); output k rows per
    * query: (query_id, mmr_rank, `id`, score).
    */
  def mmrRerank(candidates: DataFrame, k: Int, lambda: Double = 0.5,
                id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.Encoders
    require(k >= 1 && lambda >= 0.0 && lambda <= 1.0)
    val ds = candidates.select(col("query_id").cast("long").as("query_id"),
        col(id).cast("long").as("vec_id"), col("score").cast("double").as("score"),
        col(emb).as("embedding"))
      .as(Encoders.product[MmrCand])
    ds.groupByKey(_.query_id)(Encoders.scalaLong)
      .flatMapGroups { (q: Long, it: Iterator[MmrCand]) =>
        val cands = it.toArray.sortBy(c => (-c.score, c.vec_id))
        val vecs = cands.map(_.embedding.toArray.map(_.toDouble))
        val norms = vecs.map { v =>
          var s = 0.0; var x = 0
          while (x < v.length) { s += v(x) * v(x); x += 1 }
          math.sqrt(s)
        }
        def cos(i: Int, j: Int): Double = {
          val a = vecs(i); val b = vecs(j)
          var s = 0.0; var x = 0; val n = math.min(a.length, b.length)
          while (x < n) { s += a(x) * b(x); x += 1 }
          if (norms(i) == 0.0 || norms(j) == 0.0) 0.0 else s / (norms(i) * norms(j))
        }
        val n = cands.length
        val picked = new Array[Boolean](n)
        // running max_{s ∈ selected} cos(i, s), updated only against
        // the NEWEST pick each round — identical maxima to rescanning
        // all picks, O(n·k·d) instead of O(n·k²·d)
        val maxSim = Array.fill(n)(Double.NegativeInfinity)
        val out = new scala.collection.mutable.ArrayBuffer[MmrRanked](math.min(k, n))
        var r = 1
        while (r <= math.min(k, n)) {
          var best = -1; var bestV = Double.NegativeInfinity
          var i = 0
          while (i < n) {
            if (!picked(i)) {
              // strict > keeps the first (score desc, id asc) candidate
              // on exact value ties — the deterministic tie rule
              val v = if (r == 1) cands(i).score
                      else lambda * cands(i).score - (1 - lambda) * maxSim(i)
              if (v > bestV) { bestV = v; best = i }
            }
            i += 1
          }
          picked(best) = true
          out += MmrRanked(q, r, cands(best).vec_id, cands(best).score)
          var j = 0
          while (j < n) {
            if (!picked(j)) { val cv = cos(j, best); if (cv > maxSim(j)) maxSim(j) = cv }
            j += 1
          }
          r += 1
        }
        out.iterator
      }(Encoders.product[MmrRanked])
      .toDF()
  }
}

private[ops] case class MmrCand(
  query_id: Long, vec_id: Long, score: Double, embedding: Seq[Float])
private[ops] case class MmrRanked(
  query_id: Long, mmr_rank: Int, vec_id: Long, score: Double)
