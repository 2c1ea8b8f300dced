package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** In-JVM reference BPE shared by [[BpePropSpec]] and OpsSpec's
  * hand-value case: same argmax (count desc, then "a b" string asc)
  * and the same leftmost-greedy non-overlapping merge as
  * [[graft.ops.Bpe]] — independently implemented over plain
  * collections.
  */
object BpeReference {
  def mergeOnce(s: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += a + b; i += 2 }
      else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** Ranked merges from a word-frequency map. */
  def learn(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var segs = words.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = Seq.newBuilder[(String, String, Long)]
    var stop = false
    for (_ <- 1 to n if !stop) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((s, f) <- segs; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), cc) => (-cc, x + " " + y) }
        out += ((a, b, c))
        segs = segs.map { case (s, f) => (mergeOnce(s, a, b), f) }
      }
    }
    out.result()
  }

  /** Sequential rank-order application (the engine's encode contract). */
  def apply(word: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector) { case (s, (a, b)) =>
      mergeOnce(s, a, b)
    }
}

/** Property checks for the in-engine BPE against [[BpeReference]]:
  * for ANY small corpus over a 3-letter alphabet, the distributed
  * trainer must reproduce the reference merge table exactly, every
  * training segmentation must be the rank-order application of those
  * merges, segment concatenation must reconstruct the word, and the
  * OOV fold must equal the reference on unseen words.
  */
class BpePropSpec extends SparkSpec {
  import spark.implicits._

  private val wordGen: Gen[String] = for {
    len <- Gen.chooseNum(1, 6)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val corpusGen: Gen[List[String]] = for {
    nWords <- Gen.chooseNum(3, 9)
    words <- Gen.listOfN(nWords, wordGen)
    reps <- Gen.listOfN(nWords, Gen.chooseNum(1, 4))
  } yield words.zip(reps).flatMap { case (w, r) => List.fill(r)(w) }

  test("engine BPE == reference on random corpora (merges, segs, OOV fold, reconstruction)") {
    val prop = Prop.forAllNoShrink(corpusGen, wordGen) { (corpus, probe) =>
      val df = corpus.grouped(3).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toSeq.toDF("doc_id", "text")
      val (merges, seg) = graft.ops.Bpe.learn(df, nMerges = 4)
      val wf = corpus.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val expMerges = BpeReference.learn(wf, 4)
      val segMap = seg.collect().map(r => r.getString(0) -> r.getString(2)).toMap
      seg.unpersist()
      // the driver-local trainer must be bit-identical to both
      val (locMerges, locSeg) = graft.ops.Bpe.learnLocal(df, nMerges = 4)
      val locSegMap = locSeg.collect().map(r => r.getString(0) -> r.getString(2)).toMap
      val localOk = locMerges == merges && locSegMap == segMap
      val pairList = merges.map(m => (m.left_sym, m.right_sym))
      val mergesOk = merges.map(m => (m.left_sym, m.right_sym, m.cnt)) == expMerges
      // every trained word's seg = rank-order application of the merges
      val segsOk = segMap.forall { case (w, s) =>
        s.split("\\|").toVector == BpeReference.apply(w, pairList)
      }
      // pieces always reconstruct the word
      val reconOk = segMap.forall { case (w, s) => s.replace("|", "") == w }
      // the engine's OOV fold (via encode) equals the reference
      val probeDf = Seq((999L, probe)).toDF("doc_id", "text")
      val enc = graft.ops.Bpe.encode(probeDf, seg, Some(merges)).collect()
      val encPieces = enc.head.getString(2).split(" ").head.split("\\|").toVector
      val oovOk = encPieces == BpeReference.apply(probe, pairList)
      Prop.all(
        Prop(mergesOk) :| s"merges $merges != $expMerges for $wf",
        Prop(localOk) :| s"learnLocal diverges: $locMerges vs $merges / $locSegMap vs $segMap",
        Prop(segsOk) :| s"segs diverge for $wf: $segMap",
        Prop(reconOk) :| s"reconstruction broken: $segMap",
        Prop(oovOk) :| s"OOV '$probe' -> $encPieces != ${BpeReference.apply(probe, pairList)}")
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  test("byte-level BPE: distributed == local trainer on Unicode/punctuation corpora; segs reconstruct the bytes") {
    // two independent implementations (Spark aggregation loop vs the
    // incremental heap trainer) over the hex-byte start state must
    // agree on corpora the default alphabet can't even train
    val byteWordGen: Gen[String] = for {
      len <- Gen.chooseNum(1, 5)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'é', 'ñ', '中', '!', '.', '7'))
    } yield cs.mkString
    val byteCorpusGen: Gen[List[String]] = for {
      nWords <- Gen.chooseNum(3, 8)
      words <- Gen.listOfN(nWords, byteWordGen)
      reps <- Gen.listOfN(nWords, Gen.chooseNum(1, 3))
    } yield words.zip(reps).flatMap { case (w, r) => List.fill(r)(w) }
    val prop = Prop.forAllNoShrink(byteCorpusGen) { corpus =>
      val df = corpus.grouped(3).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toSeq.toDF("doc_id", "text")
      val (dm, dseg) = graft.ops.Bpe.learn(df, nMerges = 4, byteLevel = true)
      val dSegMap = dseg.collect().map(r => r.getString(0) -> r.getString(2)).toMap
      dseg.unpersist()
      val (lm, lseg) = graft.ops.Bpe.learnLocal(df, nMerges = 4, byteLevel = true)
      val lSegMap = lseg.collect().map(r => r.getString(0) -> r.getString(2)).toMap
      // hex symbols always reconstruct the word's exact UTF-8 bytes
      val reconOk = lSegMap.forall { case (w, s) =>
        s.replace("|", "") ==
          w.getBytes("UTF-8").map(b => f"${b & 0xFF}%02X").mkString
      }
      Prop.all(
        Prop(dm == lm) :| s"byte-level merges diverge: $dm vs $lm",
        Prop(dSegMap == lSegMap) :| s"byte-level segs diverge: $dSegMap vs $lSegMap",
        Prop(reconOk) :| s"hex reconstruction broken: $lSegMap")
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  test("byte-level decode(encode(x)) == whitespace-normalized text on Unicode corpora") {
    // the losslessness contract: encode to hex pieces, decode back —
    // the fixed point is lower(trim(text)) re-joined on single spaces,
    // for any Unicode/punctuation corpus (and any doc whose words the
    // tokenizer never saw: train on doc 0 only, encode everything)
    val byteWordGen: Gen[String] = for {
      len <- Gen.chooseNum(1, 5)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'é', 'ñ', '中', '!', '.', '7'))
    } yield cs.mkString
    val corpusGen: Gen[List[String]] = for {
      nDocs <- Gen.chooseNum(2, 4)
      docs <- Gen.listOfN(nDocs,
        Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, byteWordGen)))
    } yield docs.map(_.mkString(" "))
    val prop = Prop.forAllNoShrink(corpusGen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val (merges, seg) =
        graft.ops.Bpe.learnLocal(df.filter(col("doc_id") === 0), 4, byteLevel = true)
      val out = graft.ops.Bpe.encode(df, seg, Some(merges), byteLevel = true)
        .select(col("doc_id"),
          graft.ops.Bpe.decode(col("bpe_text"), byteLevel = true).as("decoded"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expect = docs.zipWithIndex
        .map { case (t, i) => i.toLong -> t.toLowerCase.trim }.toMap
      Prop(out == expect) :| s"round trip diverged: $out vs $expect"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  test("trainLocal == reference at production-scale merge counts (incl. exhaustion)") {
    // the incremental heap trainer vs the quadratic recount reference
    // at a merge count far past what the distributed trainer can
    // replay — a deterministic 300-word vocab, 512 requested merges
    // (the corpus exhausts first, so early-stop parity is covered too)
    val rng = new scala.util.Random(7)
    val words = (1 to 300).map(_ =>
      (1 to (3 + rng.nextInt(8))).map(_ => ('a' + rng.nextInt(5)).toChar).mkString)
      .distinct.toArray
    val freqs = words.map(_ => 1L + rng.nextInt(50).toLong)
    val wf = words.zip(freqs).toMap
    val exp = BpeReference.learn(wf, 512)
    val (got, segs) = graft.ops.Bpe.trainLocal(words, freqs, 512)
    assert(got.map(m => (m.left_sym, m.right_sym, m.cnt)) == exp,
      s"first divergence at rank ${got.map(m => (m.left_sym, m.right_sym, m.cnt)).zip(exp).indexWhere(p => p._1 != p._2)}")
    // final segmentations are the rank-order application of the merges
    val pairList = got.map(m => (m.left_sym, m.right_sym))
    words.indices.foreach { i =>
      assert(segs(i).split("\\|").toVector == BpeReference.apply(words(i), pairList))
    }
  }

  // ---- blocked cross top-k ------------------------------------------

  private val vecsGen: Gen[List[(Long, Seq[Float])]] = for {
    n <- Gen.chooseNum(5, 40)
    ids <- Gen.listOfN(n, Gen.chooseNum(0L, 1000000L)).map(_.distinct)
    vs <- Gen.listOfN(ids.size,
      Gen.listOfN(4, Gen.chooseNum(-3, 3).map(_.toFloat)).map(_.toSeq))
    // a zero vector has no cosine; keep the generator in-domain
    fixed = vs.map(v => if (v.forall(_ == 0f)) Seq(1f, 0f, 0f, 0f) else v)
  } yield ids.zip(fixed)

  test("crossTopK == broadcast brute top-k on random corpora (block pairing completeness)") {
    // the blocked explode+equi-join path must agree with the simple
    // broadcast path bit-for-bit — same cosine expression, so any
    // divergence is a block-pairing or partial-top-k-merge bug
    val prop = Prop.forAllNoShrink(vecsGen, vecsGen, Gen.chooseNum(1, 4)) { (xs0, ys0, k) =>
      val xs = xs0.toDF("vec_id", "embedding")
      // disjoint id spaces so bruteForceTopK's self-id filter is vacuous
      val ys = ys0.map { case (i, v) => (i + 2000000L, v) }.toDF("vec_id", "embedding")
      val blocked = graft.ops.Similarity.crossTopK(xs, ys, k).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val brute = graft.ops.Similarity.bruteForceTopK(ys, xs, k).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      Prop(blocked == brute) :|
        s"diverge: extra=${(blocked.toSet -- brute.toSet).take(3)} missing=${(brute.toSet -- blocked.toSet).take(3)}"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }
}
