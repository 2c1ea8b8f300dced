package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * sophistication: exact hash, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: every variant reduces to (1) a per-document map
  * (tokenize/shingle/hash — embarrassingly parallel, codegen'd), then
  * (2) a key-grouped shuffle whose keys are hashes/buckets — never an
  * all-pairs product. The exact-Jaccard verify step only touches
  * candidate pairs emitted by the bucket join.
  */
object Dedup {

  private def toks(text: Column): Column = split(lower(trim(text)), " ")

  /** Normalized content hash — THE clone identity every exact-dup
    * consumer keys on (batch groups, collapse gates, cluster
    * membership propagation, streaming suppression). One definition so
    * the batch/stream division of labor cannot silently diverge.
    */
  def contentHash(text: Column): Column = md5(lower(trim(text)))

  /** Word n-gram shingles (distinct) of a text column. */
  def shingles(text: Column, n: Int): Column = {
    val ts = toks(text)
    array_distinct(
      when(size(ts) >= n,
        transform(sequence(lit(1), size(ts) - (n - 1)),
          i => concat_ws(" ", slice(ts, i, lit(n)))))
      .otherwise(array(concat_ws(" ", ts))))
  }

  /** Exact duplicates: group identical normalized texts; keep the
    * smallest id as canonical. One hash-shuffle on md5(text).
    */
  def exactGroups(df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    df.select(col(id), contentHash(col(text)).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col(id)).as("canonical_id"), count(lit(1)).as("n_docs"),
        sort_array(collect_list(col(id))).as("ids"))

  /** Collapse exact duplicates (identical normalized text) to one
    * representative per content hash BEFORE a pairwise similarity
    * join, then expand the representative pairs back through group
    * membership. Exact-output-preserving for every op in this file:
    * clones share the normalized token stream, hence identical
    * shingle sets, minhash signatures and simhash bits, so
    *  - a cross-group doc pair has exactly its representatives'
    *    similarity, and
    *  - a within-group pair is maximally similar (jaccard/est 1.0,
    *    hamming 0), emitted directly as `selfExtras` literals.
    *
    * Why: clone-heavy corpora (the common case in web crawls) blow
    * up a candidate join quadratically in the clone-group size — g
    * copies of a doc put g identical prefixes/buckets in every band,
    * so candidates grow Σg² while distinct content is flat. Collapse
    * makes the expensive join run on DISTINCT texts only (one extra
    * md5 hash-shuffle, same cost as [[exactGroups]]); measured at the
    * 50×-clone bench point this turns an OOM into seconds. The
    * within-group expansion is inherently C(g,2) in the OUTPUT —
    * when clone groups are huge, [[exactGroups]] is the right tool
    * instead of pair enumeration.
    *
    * The collapse has a CONSTANT cost on clone-FREE corpora (an md5
    * group pass plus two joins that change nothing — measured ~0.5 s
    * on the sf0.1 bench corpus), so it is gated on a cheap probe: one
    * (count, approx_count_distinct) scan of the normalized text. At a
    * distinct ratio ≥ [[Dedup.CollapseDistinctRatio]] the corpus has
    * too few clones for the collapse to pay and the pair op runs
    * directly — the output is identical either way, only the plan
    * changes. `collapseExact = false` at the call sites skips probe
    * and collapse both (for inputs KNOWN deduplicated).
    */
  private[ops] val CollapseDistinctRatio = 0.9

  private[ops] def cloneHeavy(df: DataFrame, key: Column): Boolean =
    cloneStats(df, key)._2

  /** Both sides' clone-heaviness in ONE probe job (a side-tagged union
    * into one grouped aggregation) — for callers that unconditionally
    * probe two relations (classifier train sides). Callers whose
    * second probe short-circuits on the first (the delta/DSIR `||`
    * gates) keep their sequential probes: at the clone-heavy scale
    * points the short-circuit skips a whole corpus scan, which is
    * worth more than the saved job.
    */
  private[ops] def cloneHeavyBoth(
      a: DataFrame, keyA: Column, b: DataFrame, keyB: Column): (Boolean, Boolean) = {
    val rows = a.select(lit(0).as("__side"), keyA.as("__k"))
      .unionByName(b.select(lit(1).as("__side"), keyB.as("__k")))
      .groupBy("__side")
      .agg(count(lit(1)).as("__n"), approx_count_distinct(col("__k")).as("__d"))
      .collect()
    def heavy(side: Int): Boolean = rows.find(_.getInt(0) == side)
      .exists(r => r.getLong(1) > 0 &&
        r.getLong(2).toDouble / r.getLong(1) < CollapseDistinctRatio)
    (heavy(0), heavy(1))
  }

  /** The probe's (row count, clone-heavy) in ONE scan, for callers
    * that need the count anyway (tfidf's N) — a separate count()
    * would be a second full pass over the corpus.
    */
  private[ops] def cloneStats(df: DataFrame, key: Column): (Long, Boolean) = {
    val r = df.agg(count(lit(1)), approx_count_distinct(key)).head()
    val n = r.getLong(0)
    (n, n > 0 && r.getLong(1).toDouble / n < CollapseDistinctRatio)
  }

  private def collapsedPairs(
      df: DataFrame, id: String, text: String,
      selfExtras: Seq[(String, Column)], selfQualifies: Boolean,
      precomputedGroups: Option[DataFrame] = None)(
      pairFn: DataFrame => DataFrame): DataFrame = {
    // null-text docs never pair: they have no shingle content, and the
    // SQL oracles' NULL join keys can never match — without this
    // filter the Spark side's otherwise-branch shingle ("") would pair
    // null docs with each other, a divergence on general data (the
    // shipped fixtures carry no null text). Applied HERE so every pair
    // family inherits it ahead of both the probe and the clone gate
    // (whose null content-hash group would otherwise glue null docs).
    val df0 = df.filter(col(text).isNotNull)
    // a caller that already probed AND grouped (the delta op shares
    // one cloneGroups between its within and cross halves) passes the
    // groups in; the probe is skipped — collapse is output-preserving
    // regardless of clone structure, the probe only gates its cost
    if (precomputedGroups.isEmpty && !cloneHeavy(df0, lower(trim(col(text)))))
      return pairFn(df0)
    val groups = precomputedGroups.getOrElse(df0
      .select(col(id), col(text), contentHash(col(text)).as("__ch"))
      .groupBy("__ch")
      // any member's raw text works: all normalize identically
      .agg(min(col(id)).as("__rep"), first(col(text)).as("__txt"),
        sort_array(collect_list(col(id))).as("__ids"))
      .transform(graft.ops.CacheScope.scopedPersist))
    val repPairs = pairFn(
      groups.select(col("__rep").as(id), col("__txt").as(text)))
    val extraCols = repPairs.columns.filterNot(c => c == "id1" || c == "id2")
    // cross-group: each unordered doc pair appears under exactly one
    // representative pair; members of different groups can interleave
    // in id order, so re-derive id1 < id2 per expanded pair
    val m1 = groups.select(col("__rep").as("id1"), col("__ids").as("__ids1"))
    val m2 = groups.select(col("__rep").as("id2"), col("__ids").as("__ids2"))
    val cross = repPairs.join(m1, "id1").join(m2, "id2")
      .withColumn("__a", explode(col("__ids1")))
      .withColumn("__b", explode(col("__ids2")))
      .select(least(col("__a"), col("__b")).as("id1") +:
        greatest(col("__a"), col("__b")).as("id2") +: extraCols.map(col): _*)
    if (!selfQualifies) cross
    else cross.unionByName(
      groups.filter(size(col("__ids")) >= 2)
        .withColumn("__a", explode(col("__ids")))
        .withColumn("__b", explode(col("__ids")))
        .filter(col("__a") < col("__b"))
        .select(col("__a").as("id1") +: col("__b").as("id2") +:
          selfExtras.map { case (n, c) => c.as(n) }: _*))
  }

  /** Document → DISTINCT (id, __sh) shingle rows.
    *
    * Codegen-friendly shape: explode the positions first, then build
    * each shingle with scalar element_at/concat_ws — higher-order
    * transform/slice lambdas fall out of whole-stage codegen and
    * measured ~8× slower on the same data. The trailing
    * dropDuplicates pins an Exchange on (id, __sh): every consumer
    * branch (freq, prefix, sets) sits on the SAME exchange, so Spark
    * computes the scan+shingle once and reuses it (ReusedExchange).
    */
  private[ops] def shingleRows(
      df: DataFrame, id: String, text: String, n: Int,
      distinct: Boolean = true): DataFrame = {
    // (r13: a widen() here measured slower for the pair ops — their
    // shingle streams feed aggregations whose exchanges already
    // spread the work, and the extra round-robin stage was pure cost)
    val base = df.select(col(id), toks(col(text)).as("__ts"))
      .withColumn("__n", size(col("__ts")))
    val idx = base.withColumn("__i",
      explode(sequence(lit(1), greatest(col("__n") - (n - 1), lit(1)))))
    val sh = when(col("__n") >= n,
        concat_ws(" ", (0 until n).map(j => element_at(col("__ts"), col("__i") + j)): _*))
      .otherwise(concat_ws(" ", col("__ts")))
    val raw = idx.select(col(id), sh.as("__sh"))
    if (distinct) raw.dropDuplicates(id, "__sh") else raw
  }

  /** Distinct (id, 64-bit shingle hash) rows. The string shingle dies
    * at the scan: every downstream stage (frequency counts, prefix
    * ranks, the candidate join, set intersection) shuffles and
    * compares fixed-width longs instead of ~20-byte UTF8 strings —
    * measured ~3× less stage CPU on the similarity join. Exact modulo
    * xxhash64 collisions (~n²/2⁶⁴ ≈ 1e-10 at a million distinct
    * shingles).
    */
  private def hashedShingleRows(
      df: DataFrame, id: String, text: String, n: Int,
      distinct: Boolean = true): DataFrame = {
    val raw = shingleRows(df, id, text, n, distinct = false)
      .select(col(id), xxhash64(col("__sh")).as("__h"))
    if (distinct) raw.dropDuplicates(id, "__h") else raw
  }

  /** Exact n-gram Jaccard near-dup pairs (id1 < id2, jaccard ≥ τ).
    *
    * Prefix-filtered similarity self-join (the SSJoin/PPJoin shape),
    * exact AND skew-safe:
    *
    *  1. Rank each doc's shingles by GLOBAL document frequency
    *     (rarest first). Only the first `|d| − ⌈τ·|d|⌉ + 1` shingles
    *     per doc are indexed: two sets with jaccard ≥ τ must share an
    *     element inside both prefixes under any consistent total
    *     order, so the candidate join is LOSSLESS — and the
    *     ubiquitous stopword shingles that blow up a naive inverted
    *     index (f docs → f² pair fragments) land at the END of the
    *     order and almost never get indexed. This replaces the
    *     round-1 uncapped join (13.2 s of the 39.7 s bench at sf0.1).
    *  2. Lossless length filter on candidates: jaccard ≥ τ ⇒
    *     min(|A|,|B|) ≥ τ·max(|A|,|B|).
    *  3. Exact verify via array_intersect on the candidate pairs
    *     only — the full n² never materializes.
    *
    * `maxDocFreq`, when set, additionally drops shingles in > f docs
    * from the index — a lossy knob for adversarial corpora; the
    * default (None) is exact.
    *
    * `collapseExact` (default on) pre-collapses identical texts via
    * [[collapsedPairs]] so the join cost tracks DISTINCT content, not
    * clone counts; the output is identical either way.
    */
  def jaccardPairs(
      df: DataFrame, threshold: Double, n: Int = 3,
      id: String = "doc_id", text: String = "text",
      maxDocFreq: Option[Int] = None,
      collapseExact: Boolean = true): DataFrame =
    if (collapseExact)
      collapsedPairs(df, id, text,
        Seq("jaccard" -> lit(1.0)), selfQualifies = threshold <= 1.0)(
        reps => jaccardPairs(reps, threshold, n, id, text, maxDocFreq,
          collapseExact = false))
    else jaccardPairsDistinct(df, threshold, n, id, text, maxDocFreq)

  private def jaccardPairsDistinct(
      df: DataFrame, threshold: Double, n: Int,
      id: String, text: String,
      maxDocFreq: Option[Int]): DataFrame = {
    // the shingle relation feeds 2 consumers (the frequency count and
    // the per-doc aggregation) and Catalyst's per-branch column pruning
    // defeats exchange reuse — persist it once (Spark's ContextCleaner
    // drops the cache when the plan is garbage-collected, same pattern
    // as MLlib LSH)
    val rows = hashedShingleRows(df, id, text, n)
      .transform(graft.ops.CacheScope.scopedPersist)
    val freq = rows.groupBy("__h").agg(count(lit(1)).as("__df"))
    // ONE per-doc aggregation replaces the r13 shape's exchange + two
    // window sorts (count-over-doc + row_number over a per-partition
    // (id, __df, __h) sort) AND the verify path's separate
    // collect_list relation (guide §2.4 — operations keyed the same
    // way share one exchange): group by id once, sort each doc's
    // (df, h) pairs in-place — rarest first, the exact order the
    // rank window used — and derive BOTH the prefix index (posexplode
    // of the head slice) and the exact-verify sets from this single
    // cached relation. The per-partition sort becomes per-doc
    // sort_array work inside the aggregation; no full-partition sort
    // remains anywhere in the pair path.
    val docs = rows.join(freq, "__h")
      .groupBy(col(id))
      .agg(sort_array(collect_list(struct(col("__df"), col("__h")))).as("__lst"))
      .transform(graft.ops.CacheScope.scopedPersist)
    // index-eligible shingles (df ≤ maxDocFreq) sort to the FRONT of
    // __lst, so eligibility is a prefix and the indexed prefix of the
    // prefix-filter is a slice; with the default (None, exact) every
    // shingle is eligible
    val eligible = maxDocFreq
      .map(f => size(filter(col("__lst"), x => x("__df") <= lit(f.toLong))))
      .getOrElse(size(col("__lst")))
    // ⌈τ·|d|⌉ with an epsilon so float noise can't shorten the prefix;
    // the when() guards the eligible=0 corner (all shingles over
    // maxDocFreq ⇒ nothing indexed), where the arithmetic would slice 1
    val prefLen = when(eligible > 0,
      eligible - ceil(eligible * lit(threshold) - lit(1e-9)) + 1)
      .otherwise(0).cast("int")
    val prefix = docs
      .select(col(id), eligible.as("__size"),
        posexplode(slice(col("__lst"), lit(1), prefLen)))
      .select(col(id), col("__size"), (col("pos") + 1).as("__rn"),
        col("col.__h").as("__h"))
    val a = prefix.select(col(id).as("id1"), col("__size").as("__s1"), col("__rn").as("__p1"), col("__h"))
    val b = prefix.select(col(id).as("id2"), col("__size").as("__s2"), col("__rn").as("__p2"), col("__h"))
    val cands = a.join(b, Seq("__h"))
      .filter(col("id1") < col("id2"))
      .filter(least(col("__s1"), col("__s2")).cast("double") >=
        greatest(col("__s1"), col("__s2")) * lit(threshold) - lit(1e-9))
      // PPJoin positional bound: past rank p, a doc has size − p
      // shingles left, so overlap ≤ min(s1−p1, s2−p2) + 1; jaccard ≥ τ
      // needs overlap ≥ τ·(s1+s2)/(1+τ) — prune fragments that can't
      // reach it before the expensive verify
      .filter((least(col("__s1") - col("__p1"), col("__s2") - col("__p2")) + 1).cast("double") >=
        (col("__s1") + col("__s2")) * lit(threshold / (1.0 + threshold)) - lit(1e-9))
      .select("id1", "id2")
      .dropDuplicates("id1", "id2")
    // verify sets = the SAME cached per-doc relation (full arrays:
    // maxDocFreq only restricts the index, never the exact verify —
    // unchanged from the r13 semantics where sets came from `rows`)
    val sets = docs.select(col(id),
      transform(col("__lst"), x => x("__h")).as("__shs"),
      size(col("__lst")).as("__sz"))
    verifyJaccardSets(cands, sets, id, threshold)
  }

  /** Exact-Jaccard verify on candidate (id1, id2) pairs: set sizes and
    * intersection re-assembled from the hashed-shingle relation (long
    * arrays intersect far cheaper than string arrays), filter ≥ τ.
    * Shared by the exact PPJoin and the verified minhash/simhash
    * paths — the full n² never materializes; only candidates pay.
    */
  private def verifyJaccard(
      cands: DataFrame, rows: DataFrame, id: String,
      threshold: Double): DataFrame = {
    // NOTE (r13): restricting the sets to candidate-touched docs via a
    // semi-join (plus persisting the candidate plan) measured SLOWER
    // at every τ tried — the extra join/exchange/cache stages cost
    // more than the skipped collect_list buys, even at τ=0.9 where
    // candidates are sparse. The inner verify joins already drop
    // untouched docs' sets.
    verifyJaccardSets(cands,
      rows.groupBy(col(id))
        .agg(collect_list(col("__h")).as("__shs"), count(lit(1)).as("__sz")),
      id, threshold)
  }

  /** Same exact verify over a PREBUILT (id, __shs, __sz) set relation —
    * callers that already aggregate per doc (the PPJoin's sorted-array
    * relation, the fused minhash signature+set aggregation) pass their
    * cached relation instead of paying a second full groupBy(id).
    */
  private def verifyJaccardSets(
      cands: DataFrame, sets: DataFrame, id: String,
      threshold: Double): DataFrame = {
    val setsA = sets.select(col(id).as("id1"), col("__shs").as("__A"), col("__sz").as("__szA"))
    val setsB = sets.select(col(id).as("id2"), col("__shs").as("__B"), col("__sz").as("__szB"))
    cands.join(setsA, "id1").join(setsB, "id2")
      .withColumn("__common", size(array_intersect(col("__A"), col("__B"))))
      .withColumn("jaccard",
        col("__common").cast("double") /
          (col("__szA") + col("__szB") - col("__common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signature: k minima over shingles. ONE string xxhash per
    * shingle; the k hash functions re-hash that 8-byte base with the
    * function index (xxhash64 over (long, int) — a few multiplies vs
    * a variable-length string walk), cutting the per-shingle hashing
    * cost ~k× against k seeded string hashes. One groupBy(id) with k
    * partial-aggregated long mins.
    */
  def minhashSignatures(
      df: DataFrame, k: Int = 64, n: Int = 3,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    // distinct=false: duplicate shingle rows can't change a min, so
    // the dedup shuffle is pure cost here
    val rows = hashedShingleRows(df, id, text, n, distinct = false)
    val mins = (0 until k).map(i => min(xxhash64(col("__h"), lit(i))).as(s"mh_$i"))
    rows.groupBy(col(id)).agg(mins.head, mins.tail: _*)
  }

  /** Smallest MinHash banding meeting a recall contract, mirroring
    * [[graft.ops.Similarity.lshParamsForRecall]] for the Jaccard
    * S-curve: a pair at Jaccard s shares a band with probability s^r
    * (r = k/bands rows per band) and ≥1 of b bands with 1−(1−s^r)^b.
    * Picks the LONGEST band signature r whose minimal band count fits
    * the signature budget `maxK` (longer signatures collide less at
    * random, so candidates stay sparse), then the smallest such b;
    * returns (k = b·r, bands = b) — pass both straight into
    * [[minhashPairs]]/[[minhashBandIndex]]. The shipped default
    * (k=64, bands=16, r=4) sits in this derivation's near-dup regime
    * (s=0.8, floor≈0.999 derives 14×4); derive explicitly when
    * the similarity you must not miss is lower. NOTE a persisted band
    * index is keyed by (k, bands, hash) — rederiving parameters
    * means rebuilding the index.
    */
  def minhashParamsForRecall(
      targetJaccard: Double, recallFloor: Double,
      maxK: Int = 256): (Int, Int) = {
    require(targetJaccard > 0 && targetJaccard < 1 &&
      recallFloor > 0 && recallFloor < 1)
    val need = math.log1p(-recallFloor)
    (16 to 1 by -1).iterator.flatMap { r =>
      val pr = math.pow(targetJaccard, r)
      val b = math.ceil(need / math.log1p(-pr)).toInt
      if (b * r <= maxK) Some((b * r, b)) else None
    }.nextOption().getOrElse(throw new IllegalArgumentException(
      s"no minhash banding within $maxK hashes reaches recall " +
        s"$recallFloor at Jaccard $targetJaccard — lower the floor, raise " +
        "the target Jaccard (higher-similarity pairs collide more, so the " +
        "contract gets cheaper), or raise maxK"))
  }

  /** MinHash + LSH banding: candidates share ≥1 of `bands` band
    * buckets; candidates are verified with exact Jaccard estimated
    * from the full signature (fraction of matching minima).
    * Output: (id1, id2, est_jaccard ≥ τ).
    */
  def minhashPairs(
      df: DataFrame, threshold: Double,
      k: Int = 64, bands: Int = 16, n: Int = 3,
      id: String = "doc_id", text: String = "text",
      collapseExact: Boolean = true): DataFrame =
    if (collapseExact)
      collapsedPairs(df, id, text,
        // clones share the signature exactly, so est is exactly 1.0
        Seq("est_jaccard" -> lit(1.0)), selfQualifies = threshold <= 1.0)(
        reps => minhashPairs(reps, threshold, k, bands, n, id, text,
          collapseExact = false))
    else minhashPairsDistinct(df, threshold, k, bands, n, id, text)

  /** (id, band, bucket) rows from a signature relation with mh_0..mh_{k-1}
    * columns — ONE banding definition shared by the estimate path, the
    * verified path and the persistable index, so an index written by
    * one release is joinable by the others (same k/bands/hash ⇒ same
    * buckets).
    */
  private def bandBuckets(sigs: DataFrame, k: Int, bands: Int,
                          id: String): DataFrame = {
    val r = k / bands
    val sigArr = array((0 until k).map(i => col(s"mh_$i")): _*)
    sigs.select(col(id),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), hash(slice(sigArr, b * r + 1, r)).as("bucket"))): _*)).as("bb"))
      .select(col(id), col("bb.band"), col("bb.bucket"))
  }

  /** The persistable LSH index of a corpus: (id, band, bucket), `bands`
    * rows per document. A production pipeline materializes this once
    * (e.g. parquet partitioned by band) and joins each day's batch
    * against it via [[minhashDeltaPairsVerified]] — the whole corpus is
    * never re-shingled, only the batch and the candidate-touched docs.
    */
  def minhashBandIndex(
      df: DataFrame, k: Int = 64, bands: Int = 16, n: Int = 3,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    bandBuckets(minhashSignatures(df, k, n, id, text), k, bands, id)
  }

  private def minhashPairsDistinct(
      df: DataFrame, threshold: Double,
      k: Int, bands: Int, n: Int,
      id: String, text: String): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    // the signature relation feeds the banding AND the post-candidate
    // verify; persist so the shingle scan + k-min aggregation runs once
    val sigs = minhashSignatures(df, k, n, id, text)
      .transform(graft.ops.CacheScope.scopedPersist)
    val sigArr = array((0 until k).map(i => col(s"mh_$i")): _*)
    val withSig = sigs.select(col(id), sigArr.as("__sig"))
    // banding ships ONLY (id, band, bucket) — a doc's 64-long signature
    // must not ride the bucket self-join (bands× replication of a
    // ~520-byte array blows the shuffle ~30× and, at a few hundred
    // thousand docs, OOMs the candidate stage; measured at the 50×
    // scale point). Signatures rejoin per-candidate AFTER the pair
    // dedup, when each survives exactly once per side.
    val banded = bandBuckets(sigs, k, bands, id)
    val a = banded.select(col(id).as("id1"), col("band"), col("bucket"))
    val b = banded.select(col(id).as("id2"), col("band"), col("bucket"))
    val cands = a.join(b, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2")
      .dropDuplicates("id1", "id2")
      .join(withSig.select(col(id).as("id1"), col("__sig").as("__sig1")), "id1")
      .join(withSig.select(col(id).as("id2"), col("__sig").as("__sig2")), "id2")
    // matching-minima count as a folded sum of scalar element_at
    // comparisons: higher-order zip_with/filter lambdas run
    // INTERPRETED, this stays in whole-stage codegen
    val matching = (0 until k).map(i =>
      when(element_at(col("__sig1"), i + 1) === element_at(col("__sig2"), i + 1), 1)
        .otherwise(0)).reduce[Column](_ + _)
    cands
      .withColumn("est_jaccard", matching.cast("double") / k)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  /** MinHash banding + EXACT-Jaccard verify: candidates come from the
    * same band-bucket self-join as [[minhashPairs]], but each surviving
    * pair is verified against the true shingle sets instead of the
    * signature estimate, so false positives never reach the output —
    * only recall is probabilistic, and it is DETERMINISTIC for fixed
    * data (xxhash64 signatures are seed-free): a pair at jaccard j is
    * proposed with probability 1 − (1 − j^(k/bands))^bands — at the
    * default 16 bands × 4 rows, ≈ 1 − 4·10⁻⁸ for j = 0.9 — and exact
    * clones share every band bucket, so they are proposed with
    * probability 1. This is the production near-dup shape (propose
    * cheap, verify exact) and is oracle-checkable: at high τ the
    * output equals the exhaustive exact operator's on corpora where
    * the banding catches every qualifying pair.
    */
  def minhashPairsVerified(
      df: DataFrame, threshold: Double,
      k: Int = 64, bands: Int = 16, n: Int = 3,
      id: String = "doc_id", text: String = "text",
      collapseExact: Boolean = true): DataFrame =
    if (collapseExact)
      collapsedPairs(df, id, text,
        Seq("jaccard" -> lit(1.0)), selfQualifies = threshold <= 1.0)(
        reps => minhashPairsVerified(reps, threshold, k, bands, n, id, text,
          collapseExact = false))
    else {
      require(k % bands == 0, "bands must divide k")
      // ONE per-doc aggregation computes the k signature minima AND
      // the exact-verify set (collect_list + count ride the same
      // groupBy(id) buffers) — r13 ran a SECOND full aggregation over
      // a persisted shingle relation just for the sets; fusing them
      // drops that relation's cache fill and the extra
      // exchange+aggregation pass (guide §2.4 — operations keyed the
      // same way share one exchange). The shingle stream now has a
      // single consumer, so it no longer needs a persist at all.
      // (An r13 experiment derived signatures from the raw multiset
      // stream to drop the dedup exchange and re-shingled only
      // candidate-touched docs for the verify; it measured 2× SLOWER —
      // the candidate subtree then rides inside both verify set
      // branches and the plan tree balloons.)
      val rows = hashedShingleRows(df, id, text, n)
      val mins = (0 until k).map(i => min(xxhash64(col("__h"), lit(i))).as(s"mh_$i"))
      val aggs = mins ++ Seq(collect_list(col("__h")).as("__shs"),
        count(lit(1)).as("__sz"))
      // the fused relation feeds the banding (both self-join sides),
      // the estimate pre-filter (both pair sides) and the verify sets
      // — persist or the aggregation recomputes once per consumer
      val sigs = rows.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
        .transform(graft.ops.CacheScope.scopedPersist)
      val sigArr = array((0 until k).map(i => col(s"mh_$i")): _*)
      // banding ships only (id, band, bucket) — see minhashPairsDistinct
      val banded = bandBuckets(sigs, k, bands, id)
      val cands = banded.select(col(id).as("id1"), col("band"), col("bucket"))
        .join(banded.select(col(id).as("id2"), col("band"), col("bucket")),
          Seq("band", "bucket"))
        .filter(col("id1") < col("id2"))
        .select("id1", "id2")
        .dropDuplicates("id1", "id2")
      // signature-estimate pre-filter before the exact-set verify: the
      // banding proposes every bucket collision (random ~j^r pairs leak
      // through), and the set-intersect verify is the expensive step —
      // the estimate is a codegen'd fold over signature columns the
      // aggregation already computed. τ − 0.2 is ≥ 5σ below a true
      // pair's estimate mean at k = 64 (σ = √(j(1−j)/k) ≤ 0.0375 for
      // j ≥ 0.9 ⇒ per-true-pair false-drop ≲ 1e-7, deterministic for
      // fixed data), while random collisions (est ≈ their j ≪ τ) drop.
      val sigArrOnly = sigs.select(col(id), sigArr.as("__sig"))
      val matching = (0 until k).map(i =>
        when(element_at(col("__sig1"), i + 1) === element_at(col("__sig2"), i + 1), 1)
          .otherwise(0)).reduce[Column](_ + _)
      val prefiltered = cands
        .join(sigArrOnly.select(col(id).as("id1"), col("__sig").as("__sig1")), "id1")
        .join(sigArrOnly.select(col(id).as("id2"), col("__sig").as("__sig2")), "id2")
        .filter(matching.cast("double") / k >= lit(threshold - 0.2))
        .select("id1", "id2")
      verifyJaccardSets(prefiltered,
        sigs.select(col(id), col("__shs"), col("__sz")), id, threshold)
    }

  /** Incremental verified near-dup: every pair (jaccard ≥ τ) that
    * TOUCHES a new batch — batch-internal pairs plus batch-vs-corpus
    * pairs — without re-processing the corpus. This is the shape a
    * growing 100 TB corpus actually runs daily: the full self-join
    * re-shingles and re-bands everything on every run, while here
    *
    *  - the batch pays the full [[minhashPairsVerified]] machinery
    *    (collapse gate, banding, estimate pre-filter, exact verify);
    *  - the corpus side joins only its persisted (id, band, bucket)
    *    index — pass `oldIndex` with a materialized
    *    [[minhashBandIndex]]; omitted, it is computed from `oldDf`
    *    (corpus cost returns, correctness unchanged);
    *  - only the candidate-TOUCHED corpus docs are re-shingled for the
    *    exact verify (one semi-join, then grams over those docs only).
    *
    * Id spaces must be disjoint (same-id rows would self-pair; they
    * are filtered defensively). Output matches the full operator
    * restricted to pairs with ≥ 1 batch side — recall is the same
    * banding guarantee (a j ≥ τ pair shares a band bucket with
    * probability 1 − (1 − j^(k/bands))^bands; exact clones always),
    * precision 1 via the exact-set verify.
    */
  def minhashDeltaPairsVerified(
      newDf0: DataFrame, oldDf0: DataFrame, threshold: Double,
      k: Int = 64, bands: Int = 16, n: Int = 3,
      id: String = "doc_id", text: String = "text",
      oldIndex: Option[DataFrame] = None,
      collapseExact: Boolean = true): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    // pair semantics: null-text docs never pair (see collapsedPairs) —
    // filtered here too because the cross half bands newDf/oldDf
    // directly, outside collapsedPairs' own guard
    val newDf = newDf0.filter(col(text).isNotNull)
    val oldDf = oldDf0.filter(col(text).isNotNull)
    // clone collapse on the CROSS side: g batch clones × h corpus
    // clones of near-identical content propose g·h candidates and pay
    // g·h verifies without it (measured 46 s vs the full op's ~7 s at
    // the 50×-clone point). Rep-level propose/verify + membership
    // expansion makes the verify count track DISTINCT content while
    // the OUTPUT (inherently g·h pairs) is produced by a cheap explode
    // — the collapsedPairs argument, two-sided. The probes are one
    // (count, approx distinct) scan per side — cheap against regrams;
    // production batches against a pre-deduplicated corpus index pass
    // collapseExact = false and skip both probes.
    val key = lower(trim(col(text)))
    if (!(collapseExact && (cloneHeavy(newDf, key) || cloneHeavy(oldDf, key)))) {
      // forward collapseExact = false: either the caller opted out, or
      // our probes just said clone-light — the inner op's own probe
      // would only repeat the same scan and reach the same answer
      val within = minhashPairsVerified(newDf, threshold, k, bands, n, id, text,
        collapseExact = false)
      val cross = deltaCrossVerified(newDf, oldDf, threshold, k, bands, n, id, text,
          oldIndex, oldIdToRep = None)
        .select(least(col("id1"), col("id2")).as("id1"),
          greatest(col("id1"), col("id2")).as("id2"), col("jaccard"))
      within.unionByName(cross)
    } else {
      // ONE cloneGroups per side, shared by the within-batch collapse
      // (via collapsedPairs' precomputed-groups path) and the cross
      // expansion — no double probe, no double md5 group pass
      val ng = cloneGroups(newDf, id, text)
      val og = cloneGroups(oldDf, id, text)
      val within = collapsedPairs(newDf, id, text,
        Seq("jaccard" -> lit(1.0)), selfQualifies = threshold <= 1.0,
        precomputedGroups = Some(ng.select(col("__ch"), col("__rep"),
          col(text).as("__txt"), col("__ids"))))(
        reps => minhashPairsVerified(reps, threshold, k, bands, n, id, text,
          collapseExact = false))
      // a clone's band buckets equal its rep's, so a persisted
      // PER-DOC index still serves: candidates map old id → old rep
      // before the dedup; without a persisted index the rep-level
      // corpus is banded directly (cheaper)
      val mapping = oldIndex.map(_ =>
        og.select(explode(col("__ids")).as("__xid"), col("__rep")))
      val repPairs = deltaCrossVerified(
        ng.select(col("__rep").as(id), col(text)),
        og.select(col("__rep").as(id), col(text)),
        threshold, k, bands, n, id, text, oldIndex, mapping)
      val cross = repPairs
        .join(ng.select(col("__rep").as("id1"), col("__ids").as("__ids1")), "id1")
        .join(og.select(col("__rep").as("id2"), col("__ids").as("__ids2")), "id2")
        .withColumn("__a", explode(col("__ids1")))
        .withColumn("__b", explode(col("__ids2")))
        .select(least(col("__a"), col("__b")).as("id1"),
          greatest(col("__a"), col("__b")).as("id2"), col("jaccard"))
      within.unionByName(cross)
    }
  }

  /** Verified batch-vs-corpus pairs, ORIENTED: id1 = batch doc,
    * id2 = corpus doc (callers normalize or expand). `oldIdToRep`,
    * when set, maps index ids to collapse representatives between the
    * bucket join and the candidate dedup.
    */
  private def deltaCrossVerified(
      newDf: DataFrame, oldDf: DataFrame, threshold: Double,
      k: Int, bands: Int, n: Int, id: String, text: String,
      oldIndex: Option[DataFrame],
      oldIdToRep: Option[DataFrame]): DataFrame = {
    // ONE per-doc aggregation over the batch's shingles yields its
    // signatures AND its verify sets (same fuse as
    // minhashPairsVerified — guide §2.4); the shingle stream then has
    // a single consumer and needs no persist, and the union-then-
    // re-aggregate pass over the batch rows is gone
    val mins = (0 until k).map(i => min(xxhash64(col("__h"), lit(i))).as(s"mh_$i"))
    val aggs = mins ++ Seq(collect_list(col("__h")).as("__shs"),
      count(lit(1)).as("__sz"))
    val newSigs = hashedShingleRows(newDf, id, text, n)
      .groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
      .transform(graft.ops.CacheScope.scopedPersist)
    val newBanded = bandBuckets(newSigs, k, bands, id)
    val idx = oldIndex.getOrElse(minhashBandIndex(oldDf, k, bands, n, id, text))
    val raw = newBanded
      .select(col(id).as("__nid"), col("band"), col("bucket"))
      .join(idx.select(col(id).as("__oid"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .select("__nid", "__oid")
    val mapped = oldIdToRep match {
      case Some(m) => raw.join(m, raw("__oid") === m("__xid"))
        .select(col("__nid"), col("__rep").as("__oid"))
      case None => raw
    }
    // candidate pairs feed the touched-docs semi-join AND the verify
    val crossCands = mapped
      .filter(col("__nid") =!= col("__oid"))
      .dropDuplicates("__nid", "__oid")
      .transform(graft.ops.CacheScope.scopedPersist)
    val touchedOld = oldDf.join(
      crossCands.select(col("__oid").as(id)).dropDuplicates(id), Seq(id), "leftsemi")
    // verify sets: the batch side reuses the fused signature relation;
    // only the candidate-touched corpus docs pay a shingle+aggregate
    // pass (id spaces are disjoint by contract, so the union is a
    // partition of the docs, exactly as the unioned-rows groupBy was)
    val oldSets = hashedShingleRows(touchedOld, id, text, n)
      .groupBy(col(id))
      .agg(collect_list(col("__h")).as("__shs"), count(lit(1)).as("__sz"))
    val sets = newSigs.select(col(id), col("__shs"), col("__sz"))
      .unionByName(oldSets)
    verifyJaccardSets(
      crossCands.select(col("__nid").as("id1"), col("__oid").as("id2")),
      sets, id, threshold)
  }

  /** 64-bit SimHash from token hashes (frequency-weighted sign sums
    * per bit). One explode + one groupBy(id) with 64 sums.
    */
  def simhashSignatures(
      df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    // one fused compiled pass per document (see
    // org.apache.spark.sql.graft.Simhash64) — bit-identical to the
    // previous explode → groupBy(id) 64-sum form (pinned in
    // VectorSpec) but shuffle-free: the composed form shuffled every
    // token of the corpus for a per-document statistic. The
    // isNotNull filter preserves the explode form's inner semantics
    // (null-text docs produced no token rows and dropped).
    df.filter(col(text).isNotNull)
      .select(col(id),
        org.apache.spark.sql.graft.TextFunctions.simhash64(toks(col(text)))
          .as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist.
    * Banding on `chunks` equal bit slices of the 64-bit signature:
    * by pigeonhole, distance ≤ chunks − 1 implies ≥1 equal chunk, so
    * the bucket join is LOSSLESS for maxDist < chunks and only
    * compares docs agreeing on a chunk. More chunks widen the sound
    * distance range but coarsen the buckets (64/chunks bits each):
    * the default 4×16-bit is the tight-near-dup setting (dist ≤ 3);
    * 8×8-bit covers dist ≤ 7 at ~256 buckets per band.
    */
  def simhashPairs(
      df: DataFrame, maxDist: Int = 3, chunks: Int = 4,
      id: String = "doc_id", text: String = "text",
      collapseExact: Boolean = true): DataFrame =
    if (collapseExact)
      collapsedPairs(df, id, text,
        Seq("hamming" -> lit(0)), selfQualifies = maxDist >= 0)(
        reps => simhashPairs(reps, maxDist, chunks, id, text, collapseExact = false))
    else simhashCandidates(df, maxDist, chunks, id, text)
      .select(col("id1"), col("id2"), col("hamming"))

  /** Banded simhash candidate pairs with exact Hamming ≤ maxDist. */
  private def simhashCandidates(
      df: DataFrame, maxDist: Int, chunks: Int,
      id: String, text: String): DataFrame = {
    require(64 % chunks == 0, "chunks must divide 64")
    require(maxDist < chunks,
      s"banding on $chunks chunks is only lossless for maxDist <= ${chunks - 1}")
    val bits = 64 / chunks
    val mask = if (bits == 64) -1L else (1L << bits) - 1L
    val sigs = simhashSignatures(df, id, text)
    val slices = (0 until chunks).map(c =>
      struct(lit(c).as("band"),
        shiftright(col("simhash"), c * bits).bitwiseAND(lit(mask)).as("bucket")))
    val banded = sigs.select(col(id), col("simhash"), explode(array(slices: _*)).as("bb"))
      .select(col(id), col("simhash"), col("bb.band"), col("bb.bucket"))
    val a = banded.select(col(id).as("id1"), col("simhash").as("__h1"), col("band"), col("bucket"))
    val b = banded.select(col(id).as("id2"), col("simhash").as("__h2"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .dropDuplicates("id1", "id2")
      .withColumn("hamming", bit_count(col("__h1").bitwiseXOR(col("__h2"))))
      .filter(col("hamming") <= maxDist)
  }

  /** SimHash banding + EXACT-Jaccard verify: candidates are pairs
    * within simhash Hamming distance maxDist (lossless banding, see
    * [[simhashPairs]]), each verified against the true shingle sets at
    * jaccard ≥ τ — the propose-cheap/verify-exact shape of
    * [[minhashPairsVerified]] with simhash as the proposer. PRECISION
    * is exactly 1 (every emitted pair truly has jaccard ≥ τ) but
    * RECALL carries simhash's tail: single-token edits can flip many
    * marginal signature bits at once, and measured on realistic
    * corpora pairs at jaccard 0.89-0.96 sit at Hamming 8-11 — beyond
    * any banding depth with useful bucket widths. Prefer
    * [[minhashPairsVerified]] when the dedup criterion is
    * jaccard-defined (its per-pair recall is 1 − (1 − j^r)^bands,
    * uniformly high at τ ≥ 0.9); use this operator when Hamming
    * proximity itself is the criterion. Exact clones are at distance
    * 0, found with certainty.
    */
  def simhashPairsVerified(
      df: DataFrame, threshold: Double,
      maxDist: Int = 7, chunks: Int = 8, n: Int = 3,
      id: String = "doc_id", text: String = "text",
      collapseExact: Boolean = true): DataFrame =
    if (collapseExact)
      collapsedPairs(df, id, text,
        Seq("jaccard" -> lit(1.0)), selfQualifies = threshold <= 1.0)(
        reps => simhashPairsVerified(reps, threshold, maxDist, chunks, n, id, text,
          collapseExact = false))
    else {
      val cands = simhashCandidates(df, maxDist, chunks, id, text)
        .select("id1", "id2")
      val rows = hashedShingleRows(df, id, text, n)
      verifyJaccard(cands, rows, id, threshold)
    }

  /** Benchmark decontamination (the GPT-3 appendix-C / PaLM shape):
    * report every training document sharing at least one word n-gram
    * with an evaluation set, so a corpus build can drop or flag them
    * before pretraining. Output per contaminated doc: its distinct
    * gram count, the number of grams colliding with the eval set, and
    * the contaminated fraction.
    *
    * Scale design — the asymmetry is the whole point: `evalSet` is a
    * bounded benchmark suite (≤ millions of grams), so its distinct
    * grams BROADCAST; the 100 TB training side is one linear
    * projection whose exploded grams are consumed map-side by the
    * broadcast hash join — the corpus's grams never shuffle. Only the
    * surviving hits (corpus-tiny by construction) reach the per-doc
    * aggregation, and that shuffle is keyed by doc_id with a map-side
    * partial count. Raw gram strings (not hashes) are compared, so a
    * reported collision is a real one.
    */
  def contaminationReport(
      train0: DataFrame, evalSet0: DataFrame, n: Int = 3,
      id: String = "doc_id", text: String = "text",
      collapseExact: Boolean = true): DataFrame = {
    // null-text rows shingle to nothing on both engines (the pair-op
    // convention at collapsedPairs): without this, Spark's
    // otherwise-branch [""] shingle would let null docs collide while
    // a SQL oracle's NULL split yields no grams — latent divergence
    val train = train0.filter(col(text).isNotNull)
    val evalSet = evalSet0.filter(col(text).isNotNull)
    // identical normalized texts have identical reports, so the clone
    // gate applies here exactly as in the pair ops: the gram explosion
    // and eval join run once per DISTINCT text, reports fan back out
    // through membership. Measured: the 50× clone-scaled bench point
    // fell 163 s → ~4 s while clone-free corpora skip the probe.
    if (collapseExact && cloneHeavy(train, lower(trim(col(text))))) {
      val groups = cloneGroups(train, id, text)
      val reps = contaminationDistinct(
        groups.select(col("__rep").as(id), col(text)), evalSet, n, id, text)
      reps.join(groups.select(col("__rep").as(id), col("__ids")), id)
        .select(explode(col("__ids")).as(id), col("train_grams"),
          col("hit_grams"), col("contaminated_frac"))
    } else contaminationDistinct(train, evalSet, n, id, text)
  }

  /** Shared clone-group relation for the corpus-wide text gates
    * (contamination, spans): one row per normalized-identical text
    * with its representative, a member-id list, and a raw text any
    * member's computation can run on (all normalize identically).
    * Persisted because every caller references it twice (rep-side
    * compute + membership fan-out) — same cache-lifetime contract as
    * [[collapsedPairs]]. Probe the gate with lower(trim(text)), the
    * normalization [[contentHash]] groups on — a raw-text probe misses
    * case/whitespace clones entirely.
    */
  private[ops] def cloneGroups(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), col(text))
      .groupBy(contentHash(col(text)).as("__ch"))
      .agg(min(col(id)).as("__rep"), first(col(text)).as(text),
        sort_array(collect_list(col(id))).as("__ids"))
      .transform(graft.ops.CacheScope.scopedPersist)

  /** Pair-level contamination attribution: (train doc, eval doc,
    * shared distinct n-grams) for every pair sharing ≥ `minOverlap`
    * grams — the actionable form of [[contaminationReport]] (which
    * eval item leaked, not just that something did). Same asymmetric
    * scale shape: the eval side broadcasts as (gram, eval_id) rows,
    * the corpus-side gram stream never shuffles, and only matched
    * (train, eval, gram) hits reach the pair aggregation.
    */
  def contaminationPairs(
      train0: DataFrame, evalSet0: DataFrame, n: Int = 3,
      minOverlap: Long = 2,
      id: String = "doc_id", text: String = "text",
      collapseExact: Boolean = true): DataFrame = {
    // same null-text convention as contaminationReport
    val train = train0.filter(col(text).isNotNull)
    val evalSet = evalSet0.filter(col(text).isNotNull)
    if (collapseExact && cloneHeavy(train, lower(trim(col(text))))) {
      val groups = cloneGroups(train, id, text)
      val reps = contaminationPairsDistinct(
        groups.select(col("__rep").as(id), col(text)), evalSet, n, minOverlap, id, text)
      reps.join(groups.select(col("__rep").as(id), col("__ids")), id)
        .select(explode(col("__ids")).as(id), col("eval_id"), col("shared_grams"))
    } else contaminationPairsDistinct(train, evalSet, n, minOverlap, id, text)
  }

  /** (id, __g = distinct-gram array) with the array provably built
    * ONCE per row. The naive `select(shingles(...))` gets torn apart
    * by two optimizer rules acting together: InferFiltersFromGenerate
    * adds `size(g) > 0 ∧ isnotnull(g)` below the explode, and
    * predicate pushdown substitutes the alias through the projection —
    * so the interpreted higher-order shingle transform was evaluated
    * TWICE in a Filter below the widen exchange (single-task!) and a
    * third time in the Project (guide §4.4's duplication, observed in
    * the formatted plan; a bare non-deterministic side column gets
    * column-pruned away before it can block the pushdown). The shape
    * that holds: build the array + a non-deterministic id in one
    * projection, then re-alias the array through a when() that
    * references the ND column — the inferred filter lands on the
    * aliased ATTRIBUTE above the barrier and every consumer reads the
    * array built exactly once.
    */
  private def ndGuardedGrams(df: DataFrame, id: String, text: String,
      n: Int): DataFrame =
    df.select(col(id), shingles(col(text), n).as("__g0"),
        monotonically_increasing_id().as("__nd"))
      .select(col(id),
        when(col("__nd") >= Long.MinValue, col("__g0")).as("__g"))

  private def contaminationPairsDistinct(
      train: DataFrame, evalSet: DataFrame, n: Int, minOverlap: Long,
      id: String, text: String): DataFrame = {
    // widen before the gram explode: the corpus side of the broadcast
    // join is a CPU-multiplying map over a possibly-narrow input
    // (measured: the whole report ran as ONE 4.7 s-CPU task at bench
    // scale); no-op at scale, and the grams still never shuffle
    val t = ndGuardedGrams(CacheScope.widen(train), id, text, n)
      .select(col(id), explode(col("__g")).as("gram"))
    val eg = evalSet
      .select(col(id).as("eval_id"), explode(shingles(col(text), n)).as("gram"))
    t.join(broadcast(eg), Seq("gram"))
      .groupBy(col(id), col("eval_id"))
      .agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= minOverlap)
  }

  private def contaminationDistinct(
      train: DataFrame, evalSet: DataFrame, n: Int,
      id: String, text: String): DataFrame = {
    // widen before the gram explode — see contaminationPairsDistinct
    val t = ndGuardedGrams(CacheScope.widen(train), id, text, n)
      .select(col(id), size(col("__g")).cast("long").as("train_grams"),
        explode(col("__g")).as("gram"))
    val eg = evalSet.select(explode(shingles(col(text), n)).as("gram")).distinct()
    t.join(broadcast(eg), Seq("gram"))
      .groupBy(col(id))
      .agg(max(col("train_grams")).as("train_grams"),
        count(lit(1)).as("hit_grams"))
      .withColumn("contaminated_frac",
        round(col("hit_grams").cast("double") / col("train_grams"), 6))
  }

  /** Duplicated-passage spans (the substring-level dedup of Lee,
    * Ippolito, Nystrom, Zhang, Eck, Callison-Burch, Carlini —
    * "Deduplicating Training Data Makes Language Models Better", ACL
    * 2022): every k-token window occurring at more than one (doc,
    * position) in the corpus marks its tokens duplicated; per doc,
    * overlapping or touching duplicated windows merge into maximal
    * spans (1-based token indices, inclusive). The reference
    * implementation builds a single-machine suffix array; the
    * distributed shape is a hashed-window equality join — one
    * full-corpus shuffle keyed by window hash (the honest cost), then
    * a doc-keyed sort of only the DUPLICATED windows for the
    * gaps-and-islands merge.
    *
    * Clone-heavy corpora hit the same quadratic the pair ops did — g
    * exact copies of a doc inflate every one of its windows g× through
    * the hash shuffle — so the collapse gate applies here too: windows
    * are computed once per distinct text with the group size as a
    * weight (a window is duplicated iff Σ weight > 1 across its
    * occurrences, which equals the uncollapsed count), and spans
    * propagate to members through group membership (clones share the
    * normalized token stream, hence identical spans).
    */
  def duplicatedSpans(
      df: DataFrame, k: Int = 10,
      id: String = "doc_id", text: String = "text",
      collapseExact: Boolean = true,
      hash: String = "md5"): DataFrame = {
    if (collapseExact && cloneHeavy(df, lower(trim(col(text))))) {
      // any member's text gives the group's spans (all normalize
      // identically); the weight is the group size
      val groups = cloneGroups(df, id, text)
      val repSpans = spansOf(groups.select(col("__rep").as(id), col(text),
        size(col("__ids")).cast("long").as("__w")), k, id, text, hash)
      repSpans.join(groups.select(col("__rep").as(id), col("__ids")), id)
        .select(explode(col("__ids")).as(id), col("span_start"), col("span_end"))
    } else
      spansOf(df.select(col(id), col(text), lit(1L).as("__w")), k, id, text, hash)
  }

  /** Span computation over (id, text, __w[eight]) rows — see
    * [[duplicatedSpans]] for semantics and the weight's role. `hash`
    * picks the window key for the op's one full-corpus shuffle:
    *  - "md5": the DuckDB-reproducible default, 32-hex strings;
    *  - "xxhash64": 8-byte longs — the cheap production knob, same
    *    selection semantics since only key equality matters (the
    *    [[graft.ops.TextAnalysis.winnowingFingerprints]] trade);
    *  - "exact": the window CONTENT itself is the key — zero collision
    *    probability, making the result EXACT in the Lee et al. 2022
    *    §4.1 ("Deduplicating Training Data Makes Language Models
    *    Better", ExactSubstr) sense. Their suffix array is the
    *    single-node index answering "which length-k windows occur
    *    twice"; a content-keyed group-by is the cluster-native way to
    *    answer the identical question, at the cost of k-token strings
    *    (not 16-byte digests) through the one shuffle — the collapse
    *    gate still bounds it by distinct content.
    */
  private def spansOf(df: DataFrame, k: Int, id: String, text: String,
      hash: String): DataFrame = {
    def hashOf(c: Column): Column = hash match {
      case "md5" => md5(c)
      case "xxhash64" => xxhash64(c)
      case "exact" => c
      case other => throw new IllegalArgumentException(s"unknown hash: $other")
    }
    val ts = toks(col(text))
    // widen before the window explode (CPU-multiplying; no-op at scale)
    val windows = CacheScope.widen(df)
      .filter(size(ts) >= k)
      .select(col(id), col("__w"),
        explode(transform(sequence(lit(1), size(ts) - (k - 1)),
          i => struct(i.cast("long").as("pos"),
            hashOf(concat_ws(" ", slice(ts, i, lit(k)))).as("h")))).as("__win"))
      .select(col(id), col("__w"), col("__win.pos").as("pos"), col("__win.h").as("h"))
    // Σ weight over identical windows == the uncollapsed occurrence
    // count; boilerplate mega-windows are the skew case — they sort in
    // one hash partition, which the clone collapse bounds for the
    // dominant (exact-duplicate-doc) source of such windows
    val dup = windows
      .withColumn("__c", sum(col("__w")).over(Window.partitionBy("h")))
      .filter(col("__c") > 1)
      .select(col(id), col("pos"))
    val byDoc = Window.partitionBy(col(id)).orderBy(col("pos"))
    // gaps-and-islands: windows at pos and pos' ≤ pos + k overlap or
    // touch (cover contiguous duplicated text), so a gap > k breaks
    dup
      .withColumn("__brk",
        when(col("pos") - lag(col("pos"), 1, -1000000L).over(byDoc) > k, 1)
          .otherwise(0))
      .withColumn("__g", sum(col("__brk")).over(byDoc))
      .groupBy(col(id), col("__g"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k.toLong) - 1L).as("span_end"))
      .select(col(id), col("span_start"), col("span_end"))
  }

  /** Exact CROSS-corpus dedup — the daily-ingest gate: drop batch
    * docs whose normalized content already exists in the indexed
    * corpus, and collapse batch-internal clones to their smallest id
    * in the same pass. The near-dup sibling is
    * [[minhashDeltaPairsVerified]]; this is the cheap first stage a
    * pipeline runs before it. Scale shape: the corpus side reduces to
    * a DISTINCT content-hash relation (at 100 TB that relation is the
    * persisted dedup index — O(distinct docs) hashes, built once and
    * appended to, never re-derived from text), the batch side is one
    * hash groupBy; survivors come from a single anti-join keyed on
    * the hash. Nothing pairwise, no text through the shuffle.
    *
    * Output: the surviving batch ids (one per novel content).
    */
  def exactDeltaSurvivors(
      batch: DataFrame, corpus: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val firstInBatch = batch.filter(col(text).isNotNull)
      .withColumn("__ch", contentHash(col(text)))
      .groupBy(col("__ch")).agg(min(col(id)).as(id))
    val seen = corpus.filter(col(text).isNotNull)
      .select(contentHash(col(text)).as("__ch")).distinct()
    firstInBatch.join(seen, Seq("__ch"), "left_anti").select(col(id))
  }

  /** Snapshot diff by normalized content hash — the dataset-versioning
    * report an ops team reads before promoting corpus `b` over corpus
    * `a`: every doc of `b` is classified `same` (its (id, content)
    * pair exists in `a`), `moved` (content exists in `a` under a
    * different id only), or `new` (content unseen in `a`); docs of
    * `a` whose content vanished from `b` report as `removed`. One row
    * per doc, duplicate-content-safe: every classification is a
    * semi/anti equi-join on (id, hash) or hash alone, so repeated
    * hashes never multiply rows.
    *
    * Scale: four hash-keyed semi/anti joins over the two (id, md5)
    * projections — no text past the hash, no pairwise work, AQE-sized
    * shuffles. Output: (doc_id, status).
    */
  def corpusDiff(
      a: DataFrame, b: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    def hashed(df: DataFrame) = df.filter(col(text).isNotNull)
      .select(col(id), contentHash(col(text)).as("__ch"))
    val ha = hashed(a)
    val hb = hashed(b)
    val same = hb.join(ha, Seq(id, "__ch"), "left_semi")
      .select(col(id), lit("same").as("status"))
    val notSame = hb.join(ha, Seq(id, "__ch"), "left_anti")
    val moved = notSame.join(ha.select("__ch"), Seq("__ch"), "left_semi")
      .select(col(id), lit("moved").as("status"))
    val fresh = notSame.join(ha.select("__ch"), Seq("__ch"), "left_anti")
      .select(col(id), lit("new").as("status"))
    val removed = ha.join(hb.select("__ch"), Seq("__ch"), "left_anti")
      .select(col(id), lit("removed").as("status"))
    same.unionByName(moved).unionByName(fresh).unionByName(removed)
  }

  /** CCNet-style PARAGRAPH-level exact dedup (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", 2019 §3: paragraphs are hashed corpus-wide and every
    * repeated paragraph keeps only its FIRST occurrence — boilerplate
    * headers/footers/navigation repeat across pages and vanish, while
    * each page's unique prose survives). The synthetic corpus has no
    * newline structure, so a "paragraph" here is a fixed
    * `paraTokens`-token chunk of the normalized token stream — the
    * corpus-wide hash → first-occurrence → reassemble machinery is
    * the real thing. First = smallest (id, position), a total order
    * both engines reproduce.
    *
    * Output: (id, n_paras, n_kept, text_dedup) — one row per non-null
    * doc; a doc whose every paragraph appeared earlier reassembles to
    * the empty string (CCNet then drops it — that filter is the
    * caller's `n_kept > 0`).
    *
    * Scale shape: one explode over the corpus, one paragraph-keyed
    * shuffle whose min(struct(id, pos)) winner is PARTIAL-aggregated
    * map-side (clone-skewed hash groups combine before the shuffle),
    * one equi-join back, one doc-keyed reassembly — never pairwise.
    * Clone-heavy corpora collapse first (same gate as everywhere):
    * an exact clone's paragraphs all lose to the group rep's at every
    * position, so members reassemble to "" without touching the
    * shuffle; OpsSpec pins collapsed == direct.
    */
  def dedupParagraphs(
      df: DataFrame, paraTokens: Int = 20,
      id: String = "doc_id", text: String = "text",
      collapseExact: Boolean = true): DataFrame = {
    require(paraTokens > 0, s"paraTokens must be > 0, got $paraTokens")
    val base = df.filter(col(text).isNotNull)
    if (collapseExact && cloneHeavy(base, lower(trim(col(text))))) {
      // reps are the group-min ids, so the rep relation's winners are
      // exactly the full corpus's winners (members only add strictly
      // later occurrences of the same paragraphs at the same
      // positions); members keep nothing by construction
      val groups = cloneGroups(base, id, text)
      val repOut = paragraphsDeduped(
        groups.select(col("__rep").as(id), col(text)), paraTokens, id, text)
      repOut.join(groups.select(col("__rep").as(id), col("__ids")), id)
        .select(col(id).as("__rep"), col("n_paras"), col("n_kept"),
          col("text_dedup"), explode(col("__ids")).as(id))
        .select(col(id), col("n_paras"),
          when(col(id) === col("__rep"), col("n_kept"))
            .otherwise(lit(0L)).as("n_kept"),
          when(col(id) === col("__rep"), col("text_dedup"))
            .otherwise(lit("")).as("text_dedup"))
    } else paragraphsDeduped(base, paraTokens, id, text)
  }

  private def paragraphsDeduped(
      d: DataFrame, n: Int, id: String, text: String): DataFrame = {
    val paras = d.select(col(id), toks(col(text)).as("__ts"))
      .select(col(id), col("__ts"),
        explode(sequence(lit(0),
          ceil(size(col("__ts")).cast("double") / n).cast("int") - 1)).as("__pos"))
      .select(col(id), col("__pos"),
        concat_ws(" ", slice(col("__ts"), col("__pos") * n + 1, lit(n))).as("__para"))
      .withColumn("__h", md5(col("__para")))
      .transform(graft.ops.CacheScope.scopedPersist) // feeds winners, the join, and n_paras
    val win = paras.groupBy(col("__h"))
      .agg(min(struct(col(id).as("__wid"), col("__pos").as("__wpos"))).as("__w"))
    val kept = paras.join(win, Seq("__h"))
      .filter(col(id) === col("__w.__wid") && col("__pos") === col("__w.__wpos"))
    val np = paras.groupBy(col(id)).agg(count(lit(1)).as("n_paras"))
    val ka = kept.groupBy(col(id)).agg(count(lit(1)).as("n_kept"),
      concat_ws(" ", transform(
        sort_array(collect_list(struct(col("__pos"), col("__para")))),
        x => x.getField("__para"))).as("text_dedup"))
    np.join(ka, Seq(id), "left")
      .select(col(id), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }
}
