package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenization, trained IN-ENGINE
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
  * with Subword Units"): the canonical LLM-pipeline tokenizer-fitting
  * step, expressed the Lloyd/`Classifier` way — the corpus collapses
  * ONCE into a distinct-word frequency relation (the only
  * corpus-scale shuffle), and each merge iteration is one tiny
  * vocabulary-bounded aggregation plus a 1-row argmax collect.
  *
  * Merge semantics (deterministic, oracle-replayable):
  *  - a word's segmentation is its character sequence; one merge
  *    step rewrites every leftmost-greedy non-overlapping adjacent
  *    occurrence of the chosen pair (a,b) into the fused symbol a+b.
  *    A single left fold implements exactly that: `acc` ends with
  *    symbol `a` and the next symbol is `b` ⇒ fuse, else append —
  *    so "a a a a" under (a,a) folds to "aa aa", never "aa a a".
  *  - the chosen pair maximizes frequency-weighted occurrence count,
  *    ties broken by the lexicographically least "a b" string (space
  *    sorts below every trainable symbol char, so string order ==
  *    (a, b) order).
  *  - encoding applies merges SEQUENTIALLY in rank order (one greedy
  *    pass per merge). For every word seen at training time this
  *    reproduces the training segmentation exactly — the property
  *    the oracle pins end-to-end.
  *
  * Only [a-z0-9]+ whitespace tokens are trainable (keeps the '|'
  * segment delimiter and the cross-engine regex semantics trivially
  * safe); any other token passes through encoding as a single opaque
  * piece, the way production tokenizers byte-fallback.
  *
  * Scale: training state is O(distinct words), never corpus-sized —
  * at 100 TB that is a ~10⁷-row relation. Each iteration
  * `localCheckpoint`s the updated segmentation (the
  * [[Cluster.assignments]] pattern, same reliable-`checkpointDir`
  * knob for multi-executor durability). Encoding joins the bounded
  * (word → segmentation) relation against corpus tokens — broadcast
  * by default; pass `broadcastVocab = false` past ~1 GB of vocab and
  * AQE plans the shuffle join.
  */
object Bpe {

  /** Tokens eligible for merge training. */
  private val TrainableWord = "^[a-z0-9]+$"

  /** One learned merge: at `rank`, adjacent (`left_sym`, `right_sym`)
    * fuse; `cnt` is the frequency-weighted occurrence count that won
    * the argmax.
    */
  final case class LearnedMerge(rank: Int, left_sym: String, right_sym: String, cnt: Long)

  /** Frequency-weighted distinct trainable words — the single
    * corpus-scale aggregation of the whole training run.
    */
  def wordFrequencies(df: DataFrame, textCol: String = "text"): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike(TrainableWord))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Character-level start state, '|'-delimited ("bank" → "b|a|n|k"). */
  private def initialSeg(word: Column): Column =
    rtrim(regexp_replace(word, "(.)", "$1|"), "|")

  /** Adjacent symbol pairs of a segmentation as "a b" strings (with
    * multiplicity) — empty for single-symbol words.
    */
  private def adjacentPairs(seg: Column): Column = {
    val ts = split(seg, "\\|")
    when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1), j => concat_ws(" ", slice(ts, j, lit(2)))))
      .otherwise(array().cast("array<string>"))
  }

  /** One greedy left-to-right merge pass of (a, b) over a
    * segmentation, as a single fold (see object doc for why the fold
    * IS the leftmost-greedy semantics).
    */
  private[ops] def mergeFold(seg: Column, a: String, b: String): Column = {
    val ts = split(seg, "\\|")
    when(size(ts) <= 1, seg).otherwise(
      aggregate(
        slice(ts, lit(2), size(ts) - 1),
        ts.getItem(0),
        (acc, x) =>
          when((acc === lit(a) || acc.endsWith(lit("|" + a))) && (x === lit(b)),
            concat(acc, lit(b)))
            .otherwise(concat(acc, lit("|"), x))))
  }

  /** Learn `nMerges` merges. Returns the ranked merge table (driver
    * side, bounded by `nMerges`) and the final (word, freq, seg)
    * relation — checkpointed, ready for [[encode]]. Stops early when
    * every word is fully fused.
    */
  def learn(df: DataFrame, nMerges: Int, textCol: String = "text",
            checkpointDir: Option[String] = None): (Seq[LearnedMerge], DataFrame) = {
    require(nMerges >= 1, s"nMerges must be positive, got $nMerges")
    val ckpt = CacheScope.checkpointer(df.sparkSession, checkpointDir)
    var cur = ckpt(wordFrequencies(df, textCol)
      .withColumn("seg", initialSeg(col("word"))))
    val merges = Seq.newBuilder[LearnedMerge]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val best = cur
        .select(col("freq"), explode(adjacentPairs(col("seg"))).as("pr"))
        .groupBy("pr").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pr"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val Array(a, b) = best(0).getString(0).split(" ", 2)
        merges += LearnedMerge(rank, a, b, best(0).getLong(1))
        val next = ckpt(cur.withColumn("seg", mergeFold(col("seg"), a, b)))
        cur.unpersist()
        cur = next
        rank += 1
      }
    }
    (merges.result(), cur)
  }

  /** Apply an ordered merge list to a (word) relation → (word, seg):
    * the same sequential rank-order fold as training, MATERIALIZED
    * per merge — nesting the folds into one expression multiplies the
    * tree ~4× per level (the `seg` subtree is referenced from the
    * guard, the slice, and the seed), which is exponential in the
    * merge count.
    */
  private def segmentWords(words: DataFrame, merges: Seq[LearnedMerge],
                           ckpt: DataFrame => DataFrame): DataFrame = {
    var cur = ckpt(words.withColumn("seg", initialSeg(col("word"))))
    merges.sortBy(_.rank).foreach { m =>
      val next = ckpt(cur.withColumn("seg",
        mergeFold(col("seg"), m.left_sym, m.right_sym)))
      cur.unpersist()
      cur = next
    }
    cur
  }

  /** Tokenize each document with a learned tokenizer: `segRel` is the
    * (word, seg) relation and `merges` the ranked merge table —
    * [[learn]]'s two returns. Per doc the total subword count and the
    * space-joined piece string (each trainable word as its
    * '|'-delimited pieces, other tokens verbatim).
    *
    * Trainable words ABSENT from `segRel` (encoding a different
    * corpus than the training one — the production case) are
    * segmented by applying `merges` in rank order starting from the
    * character split, exactly as training would have — a zero-merge
    * tokenizer therefore char-splits them, same as its trained
    * words. The extra fold loop runs only on the vocabulary-bounded
    * miss set and is skipped entirely when the encode corpus
    * introduces no new words. With `merges = None` (the streaming
    * contract, which cannot run the fold per micro-batch) unseen
    * words pass through as single opaque pieces instead.
    */
  def encode(df: DataFrame, segRel: DataFrame,
             merges: Option[Seq[LearnedMerge]] = None, textCol: String = "text",
             idCol: String = "doc_id", broadcastVocab: Boolean = true): DataFrame = {
    val trained = segRel.select(col("word"), col("seg"))
    val vocab = merges match {
      case None => trained
      case Some(ms) =>
        val misses = df.filter(col(textCol).isNotNull)
          .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
          .filter(col("word").rlike(TrainableWord))
          .distinct()
          .join(trained.select("word"), Seq("word"), "left_anti")
        if (misses.isEmpty) trained
        else trained.unionByName(
          segmentWords(misses, ms, _.localCheckpoint())
            .select(col("word"), col("seg")))
    }
    val tok = df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("ord", "tok")))
    val enc = tok
      .join(if (broadcastVocab) broadcast(vocab) else vocab,
        col("tok") === col("word"), "left")
      .select(col(idCol), col("ord"),
        coalesce(col("seg"), col("tok")).as("piece"),
        when(col("seg").isNull, lit(1L))
          .otherwise(size(split(col("seg"), "\\|")).cast("long")).as("n"))
    enc.groupBy(idCol).agg(
      sum("n").as("n_tokens_bpe"),
      concat_ws(" ",
        transform(array_sort(collect_list(struct(col("ord"), col("piece")))),
          s => s.getField("piece"))).as("bpe_text"))
  }
}
