package graft.ops

import scala.collection.mutable

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
  * Two alphabets:
  *  - default: only [a-z0-9]+ whitespace tokens are trainable (keeps
  *    the '|' segment delimiter and the cross-engine regex semantics
  *    trivially safe); any other token passes through encoding as a
  *    single opaque piece;
  *  - `byteLevel = true`: the GPT-2-style byte-fallback — EVERY
  *    non-empty token trains, starting from its UTF-8 bytes as
  *    uppercase two-hex symbols ("é" → "C3|A9"). Hex symbols can
  *    never collide with the delimiter or regex metacharacters, so
  *    punctuation/Unicode/emoji are first-class and nothing is OOV
  *    below the byte level; fertility numbers are the real
  *    bytes-per-word ones a production tokenizer reports.
  *
  * Scale: training state is O(distinct words), never corpus-sized —
  * at 100 TB that is a ~10⁷-row relation. TWO trainers share that
  * state shape and produce bit-identical merge tables
  * (BpePropSpec pins the equivalence on random corpora):
  *
  *  - [[learn]] keeps the relation distributed. Each merge is one
  *    vocabulary-bounded aggregation + a 1-row argmax `collect()` +
  *    a `localCheckpoint` of the rewritten segmentation — i.e. ONE
  *    DRIVER ROUND-TRIP PER MERGE. That synchronization bound, not
  *    data volume, is the operator's ceiling: fine for the tens of
  *    merges an oracle replays, hours of pure scheduling latency at
  *    a production ~32k-merge vocab regardless of cluster size. Use
  *    it when the distinct-word relation genuinely cannot fit one
  *    machine.
  *  - [[learnLocal]] is the production shape: BPE training state IS
  *    the word-frequency table, so after the one corpus-scale
  *    aggregation the table collects to the driver and a classic
  *    incremental trainer (delta-maintained pair counts + a lazy
  *    max-heap, the Sennrich reference algorithm) learns all merges
  *    with zero further cluster work — 32k merges in seconds.
  *    Driver memory is O(total characters across distinct words)
  *    (~a few GB at a 10⁷-word vocab), guarded by
  *    `maxDistinctWords`.
  *
  * Encoding joins the bounded (word → segmentation) relation against
  * corpus tokens — broadcast by default; pass `broadcastVocab =
  * false` past ~1 GB of vocab and AQE plans the shuffle join.
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
    * corpus-scale aggregation of the whole training run. With
    * `byteLevel` every non-empty whitespace token is trainable (the
    * GPT-2-style byte-fallback: nothing is ever OOV at the character
    * level); without it only [a-z0-9]+ tokens train and the rest pass
    * through encoding opaque.
    */
  def wordFrequencies(df: DataFrame, textCol: String = "text",
                      byteLevel: Boolean = false): DataFrame = {
    val toks = df.filter(col(textCol).isNotNull)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
    (if (byteLevel) toks.filter(length(col("word")) > 0)
     else toks.filter(col("word").rlike(TrainableWord)))
      .groupBy("word").agg(count(lit(1)).as("freq"))
  }

  /** Character-level start state, '|'-delimited ("bank" → "b|a|n|k"). */
  private def initialSeg(word: Column): Column =
    rtrim(regexp_replace(word, "(.)", "$1|"), "|")

  /** BYTE-level start state: each UTF-8 byte as an uppercase two-hex
    * symbol ("é" → "C3|A9") — the byte-fallback alphabet. Hex symbols
    * never contain the '|' delimiter or regex metacharacters, so ANY
    * token (punctuation, Unicode, emoji) trains safely, and the
    * representation replays exactly in SQL (hex(encode(word))).
    */
  private def initialSegBytes(word: Column): Column =
    rtrim(regexp_replace(
      hex(org.apache.spark.sql.functions.encode(word, "UTF-8")),
      "(..)", "$1|"), "|")

  /** Driver-side mirror of the start states, for [[trainLocal]]. */
  private def startSymbols(word: String, byteLevel: Boolean): Array[String] =
    if (byteLevel)
      word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => f"${b & 0xFF}%02X")
    else word.map(_.toString).toArray

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
            checkpointDir: Option[String] = None,
            byteLevel: Boolean = false): (Seq[LearnedMerge], DataFrame) = {
    require(nMerges >= 1, s"nMerges must be positive, got $nMerges")
    val ckpt = CacheScope.checkpointer(df.sparkSession, checkpointDir)
    var cur = ckpt(wordFrequencies(df, textCol, byteLevel)
      .withColumn("seg",
        if (byteLevel) initialSegBytes(col("word")) else initialSeg(col("word"))))
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

  /** Learn `nMerges` merges with the driver-local exact trainer (see
    * object doc): one corpus-scale aggregation, then the collected
    * O(distinct words) table trains locally. Returns are contract-
    * identical to [[learn]] — the ranked merge table and a (word,
    * freq, seg) relation ready for [[encode]] — and bit-identical on
    * the same corpus (BpePropSpec). Refuses corpora past
    * `maxDistinctWords` distinct trainable words rather than
    * silently truncating; fall back to [[learn]] there.
    */
  def learnLocal(df: DataFrame, nMerges: Int, textCol: String = "text",
                 maxDistinctWords: Int = 50000000,
                 byteLevel: Boolean = false): (Seq[LearnedMerge], DataFrame) = {
    require(nMerges >= 1, s"nMerges must be positive, got $nMerges")
    val spark = df.sparkSession
    val rows = wordFrequencies(df, textCol, byteLevel)
      .limit(maxDistinctWords + 1).collect()
    require(rows.length <= maxDistinctWords,
      s"more than $maxDistinctWords distinct trainable words; use Bpe.learn " +
        "(distributed) or raise maxDistinctWords")
    val words = rows.map(_.getString(0))
    val freqs = rows.map(_.getLong(1))
    val (merges, segs) = trainLocal(words, freqs, nMerges, byteLevel)
    import spark.implicits._
    val segRel = words.indices
      .map(i => (words(i), freqs(i), segs(i)))
      .toDF("word", "freq", "seg")
    (merges, segRel)
  }

  /** Incremental in-memory BPE trainer (Sennrich '16 reference
    * algorithm): pair counts are delta-maintained per rewritten word
    * and the argmax comes from a lazy max-heap (stale entries are
    * re-validated against the live count on pop — every count change
    * pushes a fresh entry, so the live value of every pair is always
    * present). Per merge the work is O(affected words × word length),
    * independent of vocab size and corpus size. Returns the ranked
    * merges and each word's final '|'-joined segmentation, exactly
    * [[learn]]'s semantics (same argmax tie-break, same
    * leftmost-greedy fold).
    */
  private[graft] def trainLocal(words: Array[String], freqs: Array[Long],
                                nMerges: Int, byteLevel: Boolean = false)
      : (Seq[LearnedMerge], Array[String]) = {
    type Pair = (String, String)
    val segs: Array[Array[String]] = words.map(startSymbols(_, byteLevel))
    val counts = mutable.HashMap.empty[Pair, Long]
    val where = mutable.HashMap.empty[Pair, mutable.HashSet[Int]]
    // (count desc, "a b" string asc) — identical to learn's argmax
    val ord: Ordering[(Long, Pair)] = (x, y) => {
      val c = java.lang.Long.compare(x._1, y._1)
      if (c != 0) c
      else (y._2._1 + " " + y._2._2).compareTo(x._2._1 + " " + x._2._2)
    }
    val heap = mutable.PriorityQueue.empty[(Long, Pair)](ord)

    def pairsOf(seg: Array[String]): Iterator[Pair] =
      if (seg.length < 2) Iterator.empty
      else (0 until seg.length - 1).iterator.map(j => (seg(j), seg(j + 1)))

    for (i <- words.indices; p <- pairsOf(segs(i))) {
      counts.updateWith(p)(c => Some(c.getOrElse(0L) + freqs(i)))
      where.getOrElseUpdate(p, mutable.HashSet.empty) += i
    }
    counts.foreach { case (p, c) => heap.enqueue((c, p)) }

    def mergeOnce(s: Array[String], a: String, b: String): Array[String] = {
      val out = Array.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += a + b; i += 2 }
        else { out += s(i); i += 1 }
      }
      out.result()
    }

    val merges = Seq.newBuilder[LearnedMerge]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      // drop stale heap entries until the top reflects a live count
      while (heap.nonEmpty && !counts.get(heap.head._2).contains(heap.head._1))
        heap.dequeue()
      if (heap.isEmpty) exhausted = true
      else {
        val (cnt, best @ (a, b)) = heap.dequeue()
        merges += LearnedMerge(rank, a, b, cnt)
        val affected = where.getOrElse(best, mutable.HashSet.empty).toArray
        for (i <- affected) {
          val before = segs(i)
          val after = mergeOnce(before, a, b)
          segs(i) = after
          val delta = mutable.HashMap.empty[Pair, Long]
          pairsOf(before).foreach(p =>
            delta.updateWith(p)(c => Some(c.getOrElse(0L) - freqs(i))))
          pairsOf(after).foreach(p =>
            delta.updateWith(p)(c => Some(c.getOrElse(0L) + freqs(i))))
          val beforeSet = pairsOf(before).toSet
          val afterSet = pairsOf(after).toSet
          (beforeSet diff afterSet).foreach(p => where.get(p).foreach(_ -= i))
          (afterSet diff beforeSet).foreach(p =>
            where.getOrElseUpdate(p, mutable.HashSet.empty) += i)
          delta.foreach { case (p, d) =>
            if (d != 0L) {
              val nc = counts.getOrElse(p, 0L) + d
              if (nc <= 0L) counts.remove(p)
              else { counts(p) = nc; heap.enqueue((nc, p)) }
            }
          }
        }
        where.remove(best)
        rank += 1
      }
    }
    (merges.result(), segs.map(_.mkString("|")))
  }

  /** Apply an ordered merge list to a (word) relation → (word, seg):
    * the same sequential rank-order fold as training, MATERIALIZED
    * per merge — nesting the folds into one expression multiplies the
    * tree ~4× per level (the `seg` subtree is referenced from the
    * guard, the slice, and the seed), which is exponential in the
    * merge count.
    */
  private def segmentWords(words: DataFrame, merges: Seq[LearnedMerge],
                           ckpt: DataFrame => DataFrame,
                           byteLevel: Boolean): DataFrame = {
    var cur = ckpt(words.withColumn("seg",
      if (byteLevel) initialSegBytes(col("word")) else initialSeg(col("word"))))
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
             idCol: String = "doc_id", broadcastVocab: Boolean = true,
             byteLevel: Boolean = false): DataFrame = {
    val trained = segRel.select(col("word"), col("seg"))
    val vocab = merges match {
      case None => trained
      case Some(ms) =>
        val allToks = df.filter(col(textCol).isNotNull)
          .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
        val misses =
          (if (byteLevel) allToks.filter(length(col("word")) > 0)
           else allToks.filter(col("word").rlike(TrainableWord)))
            .distinct()
            .join(trained.select("word"), Seq("word"), "left_anti")
        if (misses.isEmpty) trained
        else trained.unionByName(
          segmentWords(misses, ms, _.localCheckpoint(), byteLevel)
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

  /** Inverse of [[encode]]'s `bpe_text`: each space-separated element
    * is one token's '|'-delimited pieces — strip the delimiters (for
    * `byteLevel`, then unhex the fused symbols back to UTF-8 bytes)
    * and re-join with single spaces. Against the whitespace-normalized
    * token stream (`concat_ws(" ", tokens(text))`) this is lossless by
    * construction in byte mode, where every non-empty token segments
    * into hex pieces. In char mode an untrainable token that itself
    * contains a literal '|' does not survive (opaque tokens pass
    * through encode verbatim, so the delimiter strip would eat payload
    * characters) — byte mode is the round-trip-safe alphabet. Pure
    * column expression: codegen'd, no shuffle, no UDF.
    */
  def decode(pieces: Column, byteLevel: Boolean = false): Column = {
    val words = transform(split(pieces, " "), w => {
      val bare = regexp_replace(w, "\\|", "")
      if (byteLevel)
        org.apache.spark.sql.functions.decode(unhex(bare), "UTF-8")
      else bare
    })
    concat_ws(" ", words)
  }
}
