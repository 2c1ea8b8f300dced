package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines ("concat-and-chunk"):
  * documents are concatenated in deterministic id order and the token
  * stream is cut into fixed-`budget` chunks. [[manifest]] maps each
  * document to its global token offset and chunk span; [[chunks]]
  * inverts that into the per-chunk (doc, token-slice) fetch list a
  * training loader consumes. Token counting matches
  * [[TextAnalysis.withTokenCounts]]'s whitespace tokenizer so the two
  * stages compose.
  *
  * Scale design: the global prefix sum is the textbook two-phase scan.
  * Documents are range-sharded on id; each shard computes its local
  * cumulative sum in parallel (window partitioned BY SHARD — never a
  * global single-partition window); the per-shard totals (≤ numShards
  * rows, the bounded-collect precedent set by the IVF centroids) are
  * prefix-summed on the driver and broadcast-joined back. Shuffle
  * volume is one window sort per shard plus a broadcast of numShards
  * rows — no stage depends on total corpus size in one task.
  */
object Packing {

  private def tokenCount(text: Column): Column =
    size(TextAnalysis.tokens(text)).cast("long")

  /** Effective shard count for the two-phase prefix scans: adaptive in
    * the INPUT SIZE instead of a constant. `numShards` is a ceiling
    * (the value callers pass / the legacy default), and the floor is
    * the session's default parallelism; between them the shard count
    * tracks the scan's own partition count — ~one range shard per
    * input split. Rationale (optimization guide §2): a constant 1024
    * was tuned for the cluster and costs 3×1024 near-empty tasks per
    * call at bench scale (measured 2.4 s of q_pack_manifest's 2.96 s),
    * while a constant 32 would serialize a 100 TB corpus into 32
    * window sorts. The OUTPUT is shard-independent (offsets/ranks
    * derive from the global order alone — see the method docs), so
    * this changes plan shape only.
    */
  private def effectiveShards(df: DataFrame, numShards: Int): Int = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    // Scan width DERIVED from the optimized logical plan's size stats
    // (the CacheScope.widen pattern) — never df.rdd.getNumPartitions,
    // which under AQE finalizes the plan and EXECUTES every upstream
    // shuffle stage at plan time; live callers pass derived relations
    // (q_pack_bpe: Bpe.encode output; q_pipeline_pretrain: the
    // dedup+mix chain), so at scale the upstream plan would run twice.
    // ~one range shard per would-be input split; `numShards` stays the
    // ceiling, so a wildly inflated join-size estimate cannot explode
    // the shard count.
    val maxSplit = math.max(1L,
      df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
    val statParts = (df.queryExecution.optimizedPlan.stats.sizeInBytes /
      BigInt(maxSplit)).min(BigInt(numShards)).toInt + 1
    math.max(1, math.min(numShards, math.max(par, statParts)))
  }

  /** Per-document packing manifest: (doc_id, n_tokens, start_offset,
    * chunk_first, chunk_last, n_chunks) under fixed-size chunks of
    * `budget` tokens over the id-ordered concatenated token stream.
    * Documents spanning a chunk boundary are split across chunks
    * (GPT-style pretraining packing), so every chunk except the last
    * is exactly full — no padding waste, no bin-packing heuristics.
    */
  def manifest(df: DataFrame, budget: Int,
               id: String = "doc_id", text: String = "text",
               numShards: Int = 1024,
               tokenCol: Option[String] = None): DataFrame = {
    require(budget > 0, s"chunk budget must be positive, got $budget")
    val sp = df.sparkSession
    import sp.implicits._
    // tokenCol: pack by a PRECOMPUTED per-doc token count (e.g.
    // Bpe.encode's n_tokens_bpe — real tokenizer budgets, the way a
    // production pretrain pipeline packs) instead of the whitespace
    // proxy derived from `text`.
    val cnt = tokenCol.map(c => col(c).cast("long"))
      .getOrElse(tokenCount(col(text)))
    val toks = df.select(col(id).cast("long").as("doc_id"), cnt.as("n_tokens"))
    // contiguous-in-ORDER shards by rank, not by id value: range
    // repartitioning samples split points, so sparse or outlier id
    // spaces still spread evenly (value-width shards would collapse a
    // corpus with one far-out id into a single shard — exactly the
    // global one-partition window this design exists to avoid). The
    // output is shard-independent — offsets derive from the global
    // order alone — so sampled boundaries cannot affect determinism.
    // The persist pins ONE materialization feeding both the
    // shard-total collect and the windowed cumsum below (halving the
    // corpus scan, and guaranteeing both jobs see identical shards);
    // an operator returning a lazy frame cannot unpersist it — Bench
    // clears caches per query, repeated callers rely on
    // ContextCleaner.
    val sharded = toks.repartitionByRange(effectiveShards(df, numShards), col("doc_id"))
      .withColumn("__shard", spark_partition_id())
      .transform(graft.ops.CacheScope.scopedPersist)
    val local = sharded.withColumn("__cum",
      sum("n_tokens").over(Window.partitionBy("__shard").orderBy("doc_id")))
    val shardTotals = sharded.groupBy("__shard").agg(sum("n_tokens").as("__tot"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).sortBy(_._1)
    val offsets = shardTotals
      .scanLeft((-1L, 0L, 0L)) { case ((_, acc, tot), (sh, t)) => (sh, acc + tot, t) }
      .drop(1).map { case (sh, off, _) => (sh, off) }
    local.join(broadcast(offsets.toSeq.toDF("__shard", "__off")), "__shard")
      .withColumn("start_offset", col("__off") + col("__cum") - col("n_tokens"))
      .withColumn("chunk_first", floor(col("start_offset") / budget))
      .withColumn("chunk_last",
        floor((col("start_offset") + col("n_tokens") - lit(1)) / budget))
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        col("chunk_first"), col("chunk_last"),
        (col("chunk_last") - col("chunk_first") + lit(1)).as("n_chunks"))
  }

  /** Deterministic token-balanced shard assignment — round-robin LPT:
    * documents ranked by token count descending (ties by id), and a
    * document's output shard is (rank − 1) mod `nShards`. Longest-
    * first round robin places each "round" of the nShards next-largest
    * documents one per shard, so shard token totals differ by at most
    * one maximal document — the classic LPT balance bound without the
    * sequential greedy loop, and deterministic in any engine.
    *
    * Scale shape: the global rank is the same two-phase scan as
    * [[manifest]] — range repartition on the (tokens desc, id) sort
    * key, a per-range local row_number, per-range COUNTS (≤ numShards
    * rows, driver prefix-summed) broadcast back as offsets. No global
    * single-partition window at any size.
    *
    * Output: (doc_id, n_tokens, rank, shard).
    */
  def assignShards(df: DataFrame, nShards: Int,
                   id: String = "doc_id", text: String = "text",
                   numShards: Int = 1024): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val sp = df.sparkSession
    import sp.implicits._
    val toks = df.select(
      col(id).cast("long").as("doc_id"), tokenCount(col(text)).as("n_tokens"))
    // same persist contract as manifest: one materialization feeds the
    // count collect and the windowed rank, and both jobs must see
    // identical range shards (sampled split points are not replayable)
    val sharded = toks
      .repartitionByRange(effectiveShards(df, numShards),
        col("n_tokens").desc, col("doc_id"))
      .withColumn("__shard", spark_partition_id())
      .transform(graft.ops.CacheScope.scopedPersist)
    val local = sharded.withColumn("__rk",
      row_number().over(Window.partitionBy("__shard")
        .orderBy(col("n_tokens").desc, col("doc_id"))))
    val counts = sharded.groupBy("__shard").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).sortBy(_._1)
    val offsets = counts
      .scanLeft((-1L, 0L, 0L)) { case ((_, acc, n), (sh, c)) => (sh, acc + n, c) }
      .drop(1).map { case (sh, off, _) => (sh, off) }
    local.join(broadcast(offsets.toSeq.toDF("__shard", "__off")), "__shard")
      .withColumn("rank", col("__off") + col("__rk"))
      .withColumn("shard", ((col("rank") - 1) % nShards).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("rank"), col("shard"))
  }

  /** Chunk fetch list: one row per (chunk_id, doc) overlap with the
    * doc-relative token slice [tok_start, tok_end) the chunk needs.
    * Pure explode of the manifest — each doc expands to exactly the
    * chunks it overlaps, so output size is N + (number of boundary
    * crossings), never a blowup.
    */
  def chunks(df: DataFrame, budget: Int,
             id: String = "doc_id", text: String = "text",
             numShards: Int = 1024): DataFrame =
    manifest(df, budget, id, text, numShards)
      .select(col("doc_id"), col("start_offset"), col("n_tokens"),
        explode(sequence(col("chunk_first"), col("chunk_last"))).as("chunk_id"))
      .select(col("chunk_id"), col("doc_id"),
        (greatest(col("chunk_id") * budget, col("start_offset")) -
          col("start_offset")).as("tok_start"),
        (least((col("chunk_id") + lit(1)) * budget,
          col("start_offset") + col("n_tokens")) -
          col("start_offset")).as("tok_end"))
}
