package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster formation: groups near-duplicate PAIRS (from any
  * pair operator in [[Dedup]] / [[Similarity]]) into connected
  * components and assigns every document its component's minimum id —
  * the end stage of a dedup pipeline, where "A≈B, B≈C" must collapse
  * {A, B, C} to one canonical document even though A and C were never
  * directly compared. The reference has no equivalent; this is part of
  * the LLM-training-pipeline extension surface.
  *
  * Algorithm: the alternating large-star / small-star method of
  * Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected
  * Components in MapReduce and Beyond" (ACM SoCC 2014). Each round is
  * a constant number of hash-shuffles keyed on node id and converges
  * in O(log² n) rounds (O(log n) observed); dedup graphs (clone
  * cliques, banding stars) converge in 2-3.
  *
  * Scale design:
  *  - No step materializes a neighborhood in one row: the per-node
  *    min-neighbor is a groupBy aggregate (map-side partial combine
  *    makes the million-member component's root skew-immune) joined
  *    back on the grouping key — co-partitioned with the aggregation's
  *    own exchange, and AQE broadcasts the min table when it is tiny.
  *  - Edge relations are checkpointed every round, truncating the
  *    iterative lineage so the plan does not grow with rounds. The
  *    default is `localCheckpoint` (right for local mode and fast on a
  *    cluster, but non-replicated: an executor loss mid-fixpoint kills
  *    the job); pass `checkpointDir` for RELIABLE checkpoints to
  *    shared storage on deployments where that matters.
  *  - Convergence is detected structurally: the fixpoint edge set is a
  *    star forest (every edge points larger→smaller and no node is
  *    both a source and a target), whose roots are provably the
  *    component minima — one semi-join emptiness probe per round, one
  *    round EARLIER than waiting for the edge set to reproduce itself,
  *    and no driver-side edge collection either way.
  */
object Cluster {

  /** Both orientations of an undirected edge list. */
  private def symmetrize(e: DataFrame): DataFrame =
    e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))

  /** Per-node minimum over v (neighbors as listed in `e`), joined back
    * onto `e` as `__mn`. groupBy-then-join rather than a window: the
    * partial aggregation absorbs high-degree skew map-side, where a
    * window would sort the whole component inside one partition.
    */
  private def withNbrMin(e: DataFrame): DataFrame =
    e.join(e.groupBy("u").agg(min("v").as("__mn")), "u")

  /** Large-star round: every neighbor v > u re-points to
    * m = min(Γ(u) ∪ {u}). Processes each undirected edge from its
    * smaller endpoint's side (the symmetrized view guarantees it).
    */
  private def largeStar(e: DataFrame): DataFrame =
    withNbrMin(symmetrize(e))
      .where(col("v") > col("u"))
      .select(col("v").as("u"), least(col("__mn"), col("u")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** Small-star round: orient edges (hi → lo); every smaller neighbor
    * of hi, and hi itself, re-points to hi's minimum neighbor.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val m = withNbrMin(oriented)
    m.select(col("v").as("u"), col("__mn").as("v"))
      .union(m.select(col("u"), col("__mn").as("v")).distinct())
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Cluster assignment for every vertex: (doc_id, cluster_id) where
    * cluster_id = the minimum doc id reachable through `pairs`;
    * documents in no pair form singleton clusters of themselves.
    *
    * @param pairs    near-dup edges with `id1`/`id2` columns (any
    *                 [[Dedup]]/[[Similarity]] pair output)
    * @param vertices the full document set (so singletons appear)
    */
  def assignments(pairs: DataFrame, vertices: DataFrame,
                  id: String = "doc_id", maxIter: Int = 25,
                  checkpointDir: Option[String] = None): DataFrame = {
    val ckpt: DataFrame => DataFrame =
      CacheScope.checkpointer(pairs.sparkSession, checkpointDir)
    var e = ckpt(pairs
      .select(col("id1").cast("long").as("u"), col("id2").cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .distinct())
    var it = 0
    var converged = e.isEmpty
    while (!converged && it < maxIter) {
      val next = ckpt(smallStar(largeStar(e)))
      // star-forest probe: the edge set is a star forest iff every
      // source has exactly ONE target (out-degree 1) and no source
      // is also a target. Both conditions are required: an
      // intermediate state can have disjoint sources/targets while a
      // node still points at two roots of a not-yet-merged component
      // (e.g. {(3,1),(3,2)} — regression-pinned in OpsSpec), and
      // stopping there splits the component. Once both hold, each
      // connected component is exactly one star (the ops preserve
      // connectivity, and a star forest with a component split
      // across stars would be disconnected), and the root is the
      // component minimum (every emitted edge points larger →
      // smaller, so the root undercuts all members). Detected
      // without the extra self-reproducing round a signature
      // comparison needs; edges are distinct, so count(*) per
      // source equals its distinct target count.
      // Both convergence conditions from ONE degree aggregation
      // (r13, guide §1.2): a node violates the star-forest property
      // iff its out-degree exceeds 1 (edges are distinct, so count per
      // source = distinct targets) OR it appears as BOTH a source and
      // a target. Tagging each endpoint occurrence and grouping by
      // node answers both in a single job with one exchange of 2|E|
      // tag rows — the previous shape paid a groupBy-probe job plus a
      // separate semi-join probe job (3 exchanges) per round. (A
      // union-of-the-two-probe-RELATIONS variant measured slower:
      // AQE materializes both subtrees before take(1); this is one
      // aggregation, not two fused probes.)
      val endpoints = next
        .select(col("u").as("__n"), lit(1L).as("__s"), lit(0L).as("__t"))
        .unionByName(next
          .select(col("v").as("__n"), lit(0L).as("__s"), lit(1L).as("__t")))
      converged = endpoints.groupBy("__n")
        .agg(sum("__s").as("__sc"), sum("__t").as("__tc"))
        .where(col("__sc") > 1 || (col("__sc") > 0 && col("__tc") > 0))
        .isEmpty
      e = next
      it += 1
    }
    // at the fixpoint the edge set is a star forest (member → root);
    // the min is a no-op there and a safety net on maxIter cutoffs
    val stars = e.groupBy("u").agg(min("v").as("cluster_id"))
      .withColumnRenamed("u", "doc_id")
    vertices.select(col(id).cast("long").as("doc_id"))
      .join(stars, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** End-to-end near-dup clustering: n-gram Jaccard pairs at
    * `threshold` → connected components → (doc_id, cluster_id).
    *
    * Exact clones (identical normalized text) share a cluster by
    * construction — their pairwise jaccard is 1 — so CC runs on the
    * clone-group REPRESENTATIVES only and labels propagate through
    * membership. Label-identical to clustering the expanded pair set:
    * clones share the token stream, so representative edges carry
    * exactly the content-level connectivity, and every member id is
    * ≥ its group's canonical id, so the component min over reps IS
    * the component min over documents. What it buys: a clone-heavy
    * corpus expands candidate pairs quadratically in group size
    * (Σ C(g,2) within groups alone); none of that expansion is built
    * at all — membership is one md5 groupBy + join, and the iterative
    * loop sees distinct content only.
    */
  def fromJaccard(df: DataFrame, threshold: Double, n: Int,
                  id: String = "doc_id", text: String = "text"): DataFrame = {
    // null-text docs carry no comparable content: they are SINGLETON
    // clusters (the pair ops drop them, and the clone membership must
    // not glue them through their shared null content hash — the SQL
    // oracle's NULL keys never join, so singletons are the agreed
    // semantics on both engines)
    val hashed = df.filter(col(text).isNotNull)
      .select(col(id).cast("long").as("__doc"),
        Dedup.contentHash(col(text)).as("__ch"))
    val membership = hashed.join(
      hashed.groupBy("__ch").agg(min("__doc").as("__rep")), "__ch")
    val reps = df.withColumn(id, col(id).cast("long"))
      .join(membership.select(col("__rep").as(id)).distinct(), Seq(id), "left_semi")
    // reps are distinct content: jaccardPairs' collapse probe will
    // skip its (now redundant) internal clone gate
    val repClusters = assignments(
      Dedup.jaccardPairs(reps, threshold = threshold, n = n, id = id, text = text),
      reps, id = id).withColumnRenamed("doc_id", "__rep")
    membership.join(repClusters, Seq("__rep"))
      .select(col("__doc").as("doc_id"), col("cluster_id"))
      .unionByName(df.filter(col(text).isNull)
        .select(col(id).cast("long").as("doc_id"),
          col(id).cast("long").as("cluster_id")))
  }

  /** The deduplicated corpus: every input column of the documents that
    * are their own cluster's canonical (minimum id) under
    * [[fromJaccard]] clustering — one survivor per near-dup component,
    * singletons untouched. The join is a broadcast-unfriendly but
    * id-keyed semi-join: one shuffle on the id, no row blowup.
    */
  def dedupedCorpus(df: DataFrame, threshold: Double, n: Int,
                    id: String = "doc_id", text: String = "text"): DataFrame = {
    val keep = fromJaccard(df, threshold, n, id, text)
      .where(col("doc_id") === col("cluster_id"))
      .select(col("doc_id").as(id))
    df.withColumn(id, col(id).cast("long")).join(keep, Seq(id), "left_semi")
  }

  /** The deduplicated corpus under a QUALITY priority: one survivor
    * per near-dup component as in [[dedupedCorpus]], but the survivor
    * maximizes `priority` (ties → lowest id) instead of being the
    * minimum id — the production policy ("keep the longest / highest-
    * quality duplicate", as C4 and most crawl pipelines do) rather
    * than the arbitrary canonical. One extra cluster-keyed window
    * over the labeled corpus; cluster sizes are near-dup components,
    * so the window partitions are small by construction.
    */
  def dedupedCorpusBy(df: DataFrame, threshold: Double, n: Int,
                      priority: String,
                      id: String = "doc_id", text: String = "text"): DataFrame = {
    val labels = fromJaccard(df, threshold, n, id, text)
      .withColumnRenamed("doc_id", id)
    df.withColumn(id, col(id).cast("long"))
      .join(labels, Seq(id))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
          .orderBy(col(priority).desc, col(id))))
      .where(col("__rk") === 1)
      .drop("__rk", "cluster_id")
  }

  /** Leakage-safe train/val/test split: each document receives the
    * split of its near-duplicate CLUSTER — a salted hash of the
    * cluster id against cumulative fraction boundaries — so two
    * near-duplicates can never straddle a split boundary (the classic
    * eval-contamination failure of splitting on the document id:
    * train/test "generalization" that is really memorized dup leak).
    * Deterministic in (seed, cluster structure): the same corpus
    * splits identically on every run and every engine (md5 prefix
    * compare, the [[Sampling.weighted]] mechanism one level up).
    *
    * Scale shape: cluster labels come from [[assignments]] (the
    * large-star/small-star loop — hash shuffles only); the split
    * itself is a codegen'd per-row hash against ≤ |fractions|
    * boundary literals, no extra shuffle and nothing collected.
    *
    * Output: (doc_id, cluster_id, split). `fractions` must sum to 1
    * (±1e-9); boundaries are cumulative, so a doc's split is the
    * first label whose boundary exceeds its cluster hash.
    */
  def leakageSafeSplit(
      df: DataFrame, pairs: DataFrame,
      fractions: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      seed: String = "graft", id: String = "doc_id"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0.0),
      s"fractions must be non-negative: $fractions")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1: $fractions")
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val bounds = fractions.map(_._1).zip(cum.map(Sampling.hexThreshold))
    val h = substring(
      md5(concat(lit(seed), lit(":"), col("cluster_id").cast("string"))), 1, 8)
    // the last boundary is hexThreshold(1.0) = the above-all-hex
    // sentinel, so the chain is total without an otherwise-null edge
    val split = bounds.init.foldRight(lit(bounds.last._1)) {
      case ((label, b), rest) => when(h < lit(b), lit(label)).otherwise(rest)
    }
    assignments(pairs, df, id = id)
      .select(col("doc_id"), col("cluster_id"), split.as("split"))
  }
}
