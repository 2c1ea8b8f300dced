package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    df.select(col(id), md5(lower(trim(col(text)))).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col(id)).as("canonical_id"), count(lit(1)).as("n_docs"),
        sort_array(collect_list(col(id))).as("ids"))

  /** Document → distinct shingle rows with per-doc shingle counts. */
  private def shingleRows(df: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val sh = df.select(col(id), shingles(col(text), n).as("__shs"))
      .withColumn("__size", size(col("__shs")))
    sh.select(col(id), col("__size"), explode(col("__shs")).as("__sh"))
  }

  /** Exact n-gram Jaccard near-dup pairs (id1 < id2, jaccard ≥ τ).
    *
    * Inverted-index join: pairs only materialize for docs sharing ≥1
    * shingle. `maxDocFreq` drops ubiquitous shingles (stopword
    * n-grams) — the standard skew guard: a shingle in f docs emits
    * f² pair fragments, so frequency capping bounds the blow-up.
    */
  def jaccardPairs(
      df: DataFrame, threshold: Double, n: Int = 3,
      id: String = "doc_id", text: String = "text",
      maxDocFreq: Option[Int] = None): DataFrame = {
    val rows = shingleRows(df, id, text, n)
    val filtered = maxDocFreq match {
      case Some(f) =>
        val freq = rows.groupBy("__sh").agg(count(lit(1)).as("__df")).filter(col("__df") <= f)
        rows.join(freq.select("__sh"), "__sh")
      case None => rows
    }
    val a = filtered.select(col(id).as("id1"), col("__size").as("__s1"), col("__sh"))
    val b = filtered.select(col(id).as("id2"), col("__size").as("__s2"), col("__sh"))
    a.join(b, Seq("__sh"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2", "__s1", "__s2")
      .agg(count(lit(1)).as("__common"))
      .withColumn("jaccard",
        col("__common").cast("double") /
          (col("__s1") + col("__s2") - col("__common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signature: k minima of seeded xxhash64 over shingles.
    * One groupBy(id) with k partial-aggregated mins.
    */
  def minhashSignatures(
      df: DataFrame, k: Int = 64, n: Int = 3,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val rows = shingleRows(df, id, text, n)
    val mins = (0 until k).map(i => min(xxhash64(col("__sh"), lit(i))).as(s"mh_$i"))
    rows.groupBy(col(id), col("__size")).agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding: candidates share ≥1 of `bands` band
    * buckets; candidates are verified with exact Jaccard estimated
    * from the full signature (fraction of matching minima).
    * Output: (id1, id2, est_jaccard ≥ τ).
    */
  def minhashPairs(
      df: DataFrame, threshold: Double,
      k: Int = 64, bands: Int = 16, n: Int = 3,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sigs = minhashSignatures(df, k, n, id, text)
    val sigArr = array((0 until k).map(i => col(s"mh_$i")): _*)
    val withSig = sigs.select(col(id), sigArr.as("__sig"))
    val banded = withSig.select(col(id), col("__sig"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), hash(slice(col("__sig"), b * r + 1, r)).as("bucket"))): _*)).as("bb"))
      .select(col(id), col("__sig"), col("bb.band"), col("bb.bucket"))
    val a = banded.select(col(id).as("id1"), col("__sig").as("__sig1"), col("band"), col("bucket"))
    val b = banded.select(col(id).as("id2"), col("__sig").as("__sig2"), col("band"), col("bucket"))
    val cands = a.join(b, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2", "__sig1", "__sig2")
      .dropDuplicates("id1", "id2")
    cands
      .withColumn("est_jaccard",
        size(filter(zip_with(col("__sig1"), col("__sig2"), (x, y) => x === y), b0 => b0))
          .cast("double") / k)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  /** 64-bit SimHash from token hashes (frequency-weighted sign sums
    * per bit). One explode + one groupBy(id) with 64 sums.
    */
  def simhashSignatures(
      df: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val tokRows = df.select(col(id), explode(toks(col(text))).as("__tok"))
      .withColumn("__h", xxhash64(col("__tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(col("__h").bitwiseAND(lit(1L << j)) =!= 0L, 1).otherwise(-1)).as(s"b_$j")
    }
    val summed = tokRows.groupBy(col(id)).agg(bitSums.head, bitSums.tail: _*)
    val packed = (0 until 64).map { j =>
      when(col(s"b_$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce[Column](_.bitwiseOR(_))
    summed.select(col(id), packed.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist (< 16).
    * Banding on four 16-bit chunks: distance ≤ 3 implies ≥1 equal
    * chunk, so the bucket join only compares docs agreeing on a chunk.
    */
  def simhashPairs(
      df: DataFrame, maxDist: Int = 3,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val sigs = simhashSignatures(df, id, text)
    val chunks = (0 until 4).map(c =>
      struct(lit(c).as("band"),
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)).as("bucket")))
    val banded = sigs.select(col(id), col("simhash"), explode(array(chunks: _*)).as("bb"))
      .select(col(id), col("simhash"), col("bb.band"), col("bb.bucket"))
    val a = banded.select(col(id).as("id1"), col("simhash").as("__h1"), col("band"), col("bucket"))
    val b = banded.select(col(id).as("id2"), col("simhash").as("__h2"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .dropDuplicates("id1", "id2")
      .withColumn("hamming", bit_count(col("__h1").bitwiseXOR(col("__h2"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id1"), col("id2"), col("hamming"))
  }
}
