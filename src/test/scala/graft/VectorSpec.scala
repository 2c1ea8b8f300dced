package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorFunctions

/** Codegen health of the custom vector expressions.
  *
  * Round-1 regression: fixed Java local names collided when several
  * vector expressions landed in one whole-stage-codegen scope, and
  * Spark silently fell back to interpreted eval. With
  * spark.sql.codegen.fallback=false a compile failure throws instead,
  * so these tests fail loudly if the generated code stops compiling.
  */
class VectorSpec extends SparkSpec {

  private def withStrictCodegen[T](body: => T): T = {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  private def vecs = {
    // two deterministic float vectors per row
    spark.range(1, 50).select(
      col("id"),
      transform(sequence(lit(1), lit(8)), i => (i * col("id") % 7).cast("float")).as("a"),
      transform(sequence(lit(1), lit(8)), i => (i + col("id") % 5).cast("float")).as("b"))
  }

  test("multiple vector expressions in one codegen scope compile and agree with interpreted eval") {
    val out = withStrictCodegen {
      vecs.select(
        col("id"),
        VectorFunctions.cosineSim(col("a"), col("b")).as("c1"),
        VectorFunctions.cosineSim(col("b"), col("a")).as("c2"),
        VectorFunctions.dotF(col("a"), col("b")).as("d1"),
        VectorFunctions.dotF(col("a"), col("a")).as("d2"),
        VectorFunctions.l2Norm(col("a")).as("n1"),
        VectorFunctions.l2Norm(col("b")).as("n2")
      ).collect()
    }
    assert(out.length == 49)
    out.foreach { r =>
      val c1 = r.getAs[Double]("c1"); val c2 = r.getAs[Double]("c2")
      val d1 = r.getAs[Double]("d1")
      val n1 = r.getAs[Double]("n1"); val n2 = r.getAs[Double]("n2")
      assert(math.abs(c1 - c2) < 1e-12)
      // cosine == dot / (|a||b|) when norms nonzero
      if (n1 > 0 && n2 > 0) assert(math.abs(c1 - d1 / (n1 * n2)) < 1e-9)
      assert(c1 >= -1.0 - 1e-9 && c1 <= 1.0 + 1e-9)
    }
  }

  test("cosine of identical vectors is 1; zero vector yields 0") {
    val out = withStrictCodegen {
      spark.range(1, 5).select(
        transform(sequence(lit(1), lit(4)), i => (i * col("id")).cast("float")).as("v"),
        transform(sequence(lit(1), lit(4)), _ => lit(0.0f)).as("z"))
        .select(
          VectorFunctions.cosineSim(col("v"), col("v")).as("self"),
          VectorFunctions.cosineSim(col("v"), col("z")).as("vszero"))
        .collect()
    }
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("self") - 1.0) < 1e-12)
      assert(r.getAs[Double]("vszero") == 0.0)
    }
  }

  test("lsh_band_buckets compiles strictly and equals the composed per-band construction") {
    // the fused expression exists because the composed form (bands x
    // rows dot_f against typedlit planes) exceeded codegen limits and
    // fell back to interpreted eval (~700us/row at the 50x scale
    // point) — pin bit-for-bit agreement on every band
    val bands = 16; val rows = 8; val dim = 8
    val planes = graft.ops.Similarity.hyperplanes(bands, rows, dim)
    val composed = (0 until bands).map { b =>
      planes(b).zipWithIndex.map { case (plane, j) =>
        when(VectorFunctions.dotF(col("a"), typedlit(plane.toSeq)) >= 0, lit(1 << j))
          .otherwise(lit(0))
      }.reduce(_ + _).as(s"c_$b")
    }
    val out = withStrictCodegen {
      vecs.select(
        VectorFunctions.lshBandBuckets(col("a"), planes).as("fused") +: composed: _*)
        .collect()
    }
    out.foreach { r =>
      val fused = r.getSeq[Int](r.fieldIndex("fused"))
      assert(fused.length == bands)
      (0 until bands).foreach(b => assert(fused(b) == r.getAs[Int](s"c_$b"),
        s"band $b disagrees"))
    }
  }

  test("fused expressions throw on wrong-dimension vectors instead of clamping") {
    // a truncated/zero-padded dot yields valid-looking buckets and
    // scores that mask bad data — the expressions must surface it
    val planes = graft.ops.Similarity.hyperplanes(4, 4, 16)
    val cents: Array[Seq[Float]] = Array(Seq.fill(16)(1.0f))
    for ((expr, name) <- Seq(
        (VectorFunctions.lshBandBuckets(col("a"), planes), "lsh_band_buckets"),
        (VectorFunctions.centroidStructScores(col("a"), cents), "centroid_struct_scores"))) {
      val e = intercept[Exception] {
        vecs.select(expr).collect() // vectors are 8-wide, dim is 16
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(m => m.contains(name) && m.contains("!= dim")),
        s"$name did not surface the dimension mismatch: $e")
    }
  }

  test("centroid_struct_scores compiles strictly and is bit-identical to composed cosines") {
    val nCells = 5; val dim = 8
    val rnd = new scala.util.Random(7)
    val cents: Array[Seq[Float]] =
      Array.fill(nCells)(Seq.fill(dim)(rnd.nextGaussian().toFloat))
    val composed = cents.zipWithIndex.map { case (c, i) =>
      VectorFunctions.cosineSim(col("a"), typedlit(c)).as(s"c_$i")
    }
    val out = withStrictCodegen {
      vecs.select(
        VectorFunctions.centroidStructScores(col("a"), cents).as("fused") +:
          composed.toSeq: _*)
        .collect()
    }
    out.foreach { r =>
      val fused = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("fused"))
      assert(fused.length == nCells)
      fused.zipWithIndex.foreach { case (s, i) =>
        assert(s.getInt(1) == i)
        // bit-identical, not just close: same sequential accumulation
        assert(java.lang.Double.doubleToLongBits(s.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getAs[Double](s"c_$i")),
          s"cell $i: ${s.getDouble(0)} != ${r.getAs[Double](s"c_$i")}")
      }
    }
  }

  test("pq encode/lut/adc compile strictly; adc equals dot with the reconstruction") {
    // m=2 subspaces of 4 dims, ksub=3 codewords — small enough to
    // recompute everything independently in Scala
    val m = 2; val ksub = 3; val dsub = 4
    val rnd = new scala.util.Random(11)
    val cb: Array[Array[Array[Float]]] =
      Array.fill(m, ksub, dsub)(rnd.nextGaussian().toFloat)
    val out = withStrictCodegen {
      vecs.select(
        col("a"), col("b"),
        VectorFunctions.pqEncode(col("a"), cb).as("code"),
        VectorFunctions.pqEncode(col("a"), cb, bytes = false).as("codeInts"),
        VectorFunctions.pqLut(col("b"), cb).as("lut"),
        VectorFunctions.pqAdcScore(
          VectorFunctions.pqEncode(col("a"), cb),
          VectorFunctions.pqLut(col("b"), cb), m, ksub).as("adc")
      ).collect()
    }
    assert(out.length == 49)
    out.foreach { r =>
      val a = r.getSeq[Float](r.fieldIndex("a"))
      val b = r.getSeq[Float](r.fieldIndex("b"))
      val code = r.getAs[Array[Byte]]("code")
      val codeInts = r.getSeq[Int](r.fieldIndex("codeInts"))
      // byte and int encodes agree
      assert(code.toSeq.map(_ & 0xFF) == codeInts)
      // each code is the argmin-L2 codeword (lowest index on ties)
      (0 until m).foreach { j =>
        val sub = a.slice(j * dsub, (j + 1) * dsub)
        val dists = (0 until ksub).map { k =>
          sub.zip(cb(j)(k)).map { case (x, c) =>
            val d = x.toDouble - c.toDouble; d * d }.sum
        }
        assert(dists(codeInts(j)) == dists.min,
          s"subspace $j: code ${codeInts(j)} is not the L2 argmin")
      }
      // ADC == dot(b, reconstruction(code(a))), the identity the
      // planted-codeword oracle relies on
      val recon = (0 until m).flatMap(j => cb(j)(codeInts(j)))
      val expected = (0 until m).map { j =>
        var dot = 0.0; var t = 0
        while (t < dsub) {
          dot += b(j * dsub + t).toDouble * recon(j * dsub + t).toDouble; t += 1 }
        dot
      }.sum
      assert(math.abs(r.getAs[Double]("adc") - expected) < 1e-12,
        s"adc ${r.getAs[Double]("adc")} != reconstruction dot $expected")
    }
  }

  test("pq expressions throw on wrong-dimension vectors and codes") {
    val cb: Array[Array[Array[Float]]] = Array.fill(2, 3, 16)(1.0f)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    for ((c, name) <- Seq(
        (VectorFunctions.pqEncode(col("a"), cb), "pq_encode"),
        (VectorFunctions.pqLut(col("a"), cb), "pq_lut"))) {
      val e = intercept[Exception] { vecs.select(c).collect() } // 8-wide vs 32
      assert(messages(e).exists(m => m.contains(name)),
        s"$name did not surface the dimension mismatch: $e")
    }
    // a code of the wrong width must throw, not index garbage
    val cb8: Array[Array[Array[Float]]] = Array.fill(2, 3, 4)(1.0f)
    val e = intercept[Exception] {
      vecs.select(VectorFunctions.pqAdcScore(
        VectorFunctions.pqEncode(col("a"), cb8),
        VectorFunctions.pqLut(col("b"), cb8), 3, 3)).collect()
    }
    assert(messages(e).exists(_.contains("pq_adc_score")),
      s"pq_adc_score did not surface the code-length mismatch: $e")
    // an undersized LUT must throw too — UnsafeArrayData.getDouble is
    // UNCHECKED past the end, so without the guard a wrong ksub reads
    // garbage scores instead of failing
    val cbL: Array[Array[Array[Float]]] = Array.fill(2, 2, 4)(1.0f)
    val e2 = intercept[Exception] {
      vecs.select(VectorFunctions.pqAdcScore(
        VectorFunctions.pqEncode(col("a"), cbL),
        VectorFunctions.pqLut(col("b"), cbL), 2, 3)).collect()
    }
    assert(messages(e2).exists(_.contains("lut length")),
      s"pq_adc_score did not surface the lut-length mismatch: $e2")
  }

  test("token_repetition_stats compiles strictly and equals the composed gram construction") {
    import org.apache.spark.sql.graft.TextFunctions
    import spark.implicits._
    // randomized corpus over a small vocabulary so gram repeats are
    // common, plus degenerate shapes (empty, one- and two-token docs)
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff")
    val docs = (1L to 200L).map { i =>
      val n = rnd.nextInt(12)
      (i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")

    val ts = graft.ops.TextAnalysis.tokens(col("text"))
    def grams(n: Int) =
      when(size(ts) >= n,
        transform(sequence(lit(1), size(ts) - (n - 1)),
          i => concat_ws(" ", slice(ts, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
    val composed = docs.select(
      col("doc_id"), size(ts).as("n_tokens"),
      size(grams(2)).as("bi_total"), size(array_distinct(grams(2))).as("bi_distinct"),
      size(grams(3)).as("tri_total"), size(array_distinct(grams(3))).as("tri_distinct"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap

    val fused = withStrictCodegen {
      docs.select(col("doc_id"),
          TextFunctions.tokenRepetitionStats(ts).as("rs"))
        .select(col("doc_id"), col("rs.n_tokens"),
          col("rs.bi_total"), col("rs.bi_distinct"),
          col("rs.tri_total"), col("rs.tri_distinct"), col("rs.top_count"))
        .collect()
    }
    assert(fused.length == 200)
    fused.foreach { r =>
      val k = r.getLong(0)
      // grams(n) yields max(0, len-n+1) entries (empty array below n)
      assert(r.toSeq.slice(1, 6) == composed(k),
        s"doc $k: fused ${r.toSeq.slice(1, 6)} != composed ${composed(k)}")
      assert(r.getInt(6) >= 1 || r.getInt(1) == 0, s"doc $k: top_count sanity")
    }
  }

  test("simhash64 compiles strictly and is bit-identical to the composed explode/groupBy form") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "bb", "c", "dddd", "ee", "foxtrot", "g", "hh")
    val docs = (1L to 150L).map { i =>
      val n = 1 + rnd.nextInt(20) // ≥1 token: empty text still yields [""]
      (i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")

    // the pre-fusion formulation, verbatim: explode → 64 conditional
    // sums per doc → bit-pack
    val tokRows = docs.select(col("doc_id"), explode(split(lower(trim(col("text"))), " ")).as("__tok"))
      .withColumn("__h", xxhash64(col("__tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(col("__h").bitwiseAND(lit(1L << j)) =!= 0L, 1).otherwise(-1)).as(s"b_$j")
    }
    val packed = (0 until 64).map { j =>
      when(col(s"b_$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce[org.apache.spark.sql.Column](_.bitwiseOR(_))
    val composed = tokRows.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val fused = withStrictCodegen {
      graft.ops.Dedup.simhashSignatures(docs).collect()
    }
    assert(fused.length == 150)
    fused.foreach { r =>
      assert(r.getLong(1) == composed(r.getLong(0)),
        s"doc ${r.getLong(0)}: fused ${r.getLong(1)} != composed ${composed(r.getLong(0))}")
    }
  }

  test("JL projection (16 literal-plane dots in one scope) compiles strictly") {
    // k=16 composed dotF columns must stay inside whole-stage codegen
    // — the bands×rows=128 LSH tensor needed fusing, 16 must not
    val planes = graft.ops.Similarity.jlPlanes(16, 8)
    val out = withStrictCodegen {
      graft.ops.Similarity.projectEmbeddings(vecs.select(col("id"),
        col("a").as("embedding")), planes, id = "id").collect()
    }
    assert(out.length == 49)
    out.foreach { r =>
      val id = r.getLong(0)
      // vecs fixture: a_i = (i · id) mod 7, i = 1..8
      val v = (1 to 8).map(i => ((i * id) % 7).toDouble)
      val p = r.getSeq[Double](r.fieldIndex("proj"))
      assert(p.length == 16)
      val exp = v.zip(planes(0).map(_.toDouble)).map { case (x, y) => x * y }.sum
      assert(math.abs(p.head - exp) < 1e-9, s"id $id: ${p.head} vs $exp")
    }
  }

  test("sq8 encode/cosine compile strictly; reconstruction within δ/2, cosine near exact") {
    val out = withStrictCodegen {
      vecs.select(
          col("id"), col("a"),
          VectorFunctions.sq8Encode(col("a")).as("sq8"))
        .select(
          VectorFunctions.sq8AsymCosine(col("sq8"), col("a")).as("qc"),
          VectorFunctions.cosineSim(col("a"), col("a")).as("xc"),
          col("sq8.vmin").as("vmin"), col("sq8.delta").as("delta"),
          col("sq8.codes").as("codes"), col("a"))
        .collect()
    }
    assert(out.length == 49)
    out.foreach { r =>
      val vmin = r.getAs[Double]("vmin"); val delta = r.getAs[Double]("delta")
      val codes = r.getAs[Array[Byte]]("codes")
      val a = r.getAs[scala.collection.Seq[Float]]("a")
      // scalar quantization's contract: each element reconstructs to
      // within half a step; the extremes hit codes 0 / 255
      codes.zip(a).foreach { case (c, x) =>
        val rec = vmin + (c & 0xFF).toDouble * delta
        assert(math.abs(rec - x.toDouble) <= delta / 2 + 1e-9, s"dequant $rec vs $x")
      }
      val amin = a.map(_.toDouble).min; val amax = a.map(_.toDouble).max
      assert(vmin == amin)
      if (delta > 0) {
        assert((codes(a.indexOf(amin.toFloat)) & 0xFF) == 0)
        assert((codes(a.indexOf(amax.toFloat)) & 0xFF) == 255)
      }
      // self-cosine through the codes stays near the exact 1.0
      assert(math.abs(r.getAs[Double]("qc") - r.getAs[Double]("xc")) < 1e-3)
    }
  }

  test("sq8 encode throws on non-finite elements instead of silently coding vmin") {
    val err = intercept[org.apache.spark.SparkException] {
      spark.range(1, 2).select(
          transform(sequence(lit(1), lit(4)),
            i => when(i === 2, lit(Float.NaN)).otherwise(lit(1.0f))).as("v"))
        .select(VectorFunctions.sq8Encode(col("v"))).collect()
    }
    assert(err.getMessage.contains("non-finite") ||
      Option(err.getCause).exists(_.getMessage.contains("non-finite")), err.getMessage)
  }

  test("sq8 on a constant vector: delta 0, all-zero codes, dequantizes to vmin") {
    val out = withStrictCodegen {
      spark.range(1, 4).select(
          transform(sequence(lit(1), lit(6)), _ => lit(2.5f)).as("v"))
        .select(VectorFunctions.sq8Encode(col("v")).as("s"))
        .select(col("s.vmin"), col("s.delta"), col("s.codes")).collect()
    }
    out.foreach { r =>
      assert(r.getAs[Double]("vmin") == 2.5 && r.getAs[Double]("delta") == 0.0)
      assert(r.getAs[Array[Byte]]("codes").forall(_ == 0))
    }
  }
}
