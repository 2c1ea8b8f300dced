package graft

// Temporary diagnostic main (not part of the library surface):
// evidence for the learnLocal scale claim — a production-sized BPE
// training run (hundreds of thousands of distinct words, 32k merges)
// through the incremental heap trainer, wall-clocked. The distributed
// trainer's bound is one driver round-trip PER MERGE (~0.1 s each ⇒
// hours at 32k); the local trainer's bound is the in-memory pair-count
// maintenance measured here.
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val nWords = sys.env.getOrElse("SPARK_GRAFT_PROBE_WORDS", "200000").toInt
    val nMerges = sys.env.getOrElse("SPARK_GRAFT_PROBE_MERGES", "32768").toInt
    // synthetic Zipf-ish vocabulary: word lengths 3-12 over 26 letters,
    // frequency ~ 1/rank — the shape of a real corpus's word table
    val rng = new scala.util.Random(42)
    val words = scala.collection.mutable.LinkedHashSet[String]()
    while (words.size < nWords)
      words += (1 to (3 + rng.nextInt(10)))
        .map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val wArr = words.toArray
    val fArr = wArr.indices.map(i => math.max(1L, (nWords.toLong * 10) / (i + 1))).toArray
    println(s"[bpe] $nWords distinct words, ${wArr.map(_.length).sum} chars, $nMerges merges")
    val t0 = System.nanoTime()
    val (merges, segs) = graft.ops.Bpe.trainLocal(wArr, fArr, nMerges)
    val dt = (System.nanoTime() - t0) / 1e9
    val vocabPieces = segs.iterator.flatMap(_.split("\\|")).toSet.size
    println(f"[bpe] trained ${merges.size} merges in $dt%.1f s " +
      f"(${merges.size / dt}%.0f merges/s); final piece vocab $vocabPieces; " +
      s"last merge ${merges.lastOption}")
  }
}
