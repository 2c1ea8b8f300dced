package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData

import org.apache.spark.sql.types._
import org.apache.spark.sql.types.AbstractDataType

/** Native Catalyst expressions for embedding math.
  *
  * A Scala UDF would box every float; these loop over the raw
  * ArrayData inside whole-stage codegen — the hot path of
  * similarity-search / embedding-dedup stays JIT-compiled primitive
  * arithmetic. (SURVEY north star: similarity ops are first-class at
  * 100 TB, so they get the custom-Expression treatment.)
  *
  * All generated locals come from ctx.freshName: several of these
  * expressions routinely land in ONE whole-stage-codegen scope (e.g. a
  * projection computing two cosines), and fixed names collide there —
  * Janino "Redefinition of local variable" → silent interpreted
  * fallback.
  */
abstract class FloatVecBinary extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  /** Java source computing the double result from ArrayData a, b. */
  protected def genBody(ctx: CodegenContext, a: String, b: String, out: String): String
  protected def evalVec(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(l: Any, r: Any): Any =
    evalVec(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => genBody(ctx, a, b, ev.value))
}

/** cosine(a, b) with double accumulation; 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression) extends FloatVecBinary {
  override def prettyName: String = "cosine_sim"

  protected def genBody(ctx: CodegenContext, a: String, b: String, out: String): String = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    val denom = ctx.freshName("denom")
    s"""
       |int $n = $a.numElements();
       |double $dot = 0.0, $na = 0.0, $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  float $x = $a.getFloat($i); float $y = $b.getFloat($i);
       |  $dot += (double) $x * (double) $y;
       |  $na += (double) $x * (double) $x;
       |  $nb += (double) $y * (double) $y;
       |}
       |double $denom = Math.sqrt($na) * Math.sqrt($nb);
       |$out = $denom == 0.0 ? 0.0 : $dot / $denom;
     """.stripMargin
  }

  protected def evalVec(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Plain dot product (use on pre-normalized vectors: dot == cosine,
  * saving the norms in the inner loop of a k-NN scan).
  */
case class DotProduct(left: Expression, right: Expression) extends FloatVecBinary {
  override def prettyName: String = "dot_f"

  protected def genBody(ctx: CodegenContext, a: String, b: String, out: String): String = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
    s"""
       |int $n = $a.numElements();
       |double $dot = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
       |}
       |$out = $dot;
     """.stripMargin
  }

  protected def evalVec(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm of a float vector. */
case class L2Norm(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "l2_norm"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { double $x = (double) $a.getFloat($i); $s += $x * $x; }
         |${ev.value} = Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All random-hyperplane LSH band buckets of one vector in a single
  * pass: element b of the result is band b's bucket — bit j set when
  * dot(v, plane(b,j)) >= 0.
  *
  * Exists because the composed form (bands × rowsPerBand `dot_f`
  * calls against `typedlit` planes, summed into buckets and packed
  * into a struct array) generates code past the JVM/Janino limits at
  * production banding widths — whole-stage codegen falls back to
  * INTERPRETED eval of a 128-subexpression tree with boxed array
  * literals, measured ~700 µs/row (68 s for a 100k-vector corpus) vs
  * sub-µs compiled. Here the planes ride along as ONE flattened
  * float[] reference object and the generated code is three short
  * loops — O(1) source size in bands/rows/dim, always inside codegen.
  */
case class LshBandBuckets(
    child: Expression,
    planes: IndexedSeq[Float],
    bands: Int, rowsPerBand: Int, dim: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(planes.length == bands * rowsPerBand * dim,
    s"planes length ${planes.length} != $bands*$rowsPerBand*$dim")

  override def prettyName: String = "lsh_band_buckets"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val planeArr: Array[Float] = planes.toArray

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    // a wrong-dimension embedding is a data problem — surface it
    // instead of silently truncating/zero-padding into valid-looking
    // buckets
    if (a.numElements() != dim)
      throw new IllegalArgumentException(
        s"lsh_band_buckets: vector length ${a.numElements()} != dim $dim")
    val n = dim
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0
      var j = 0
      while (j < rowsPerBand) {
        var dot = 0.0
        val off = (b * rowsPerBand + j) * dim
        var k = 0
        while (k < n) { dot += planeArr(off + k).toDouble * a.getFloat(k).toDouble; k += 1 }
        if (dot >= 0.0) bucket |= 1 << j
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("planes", planeArr, "float[]")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val b = ctx.freshName("b"); val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val dot = ctx.freshName("dot"); val off = ctx.freshName("off")
      val bucket = ctx.freshName("bucket")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "lsh_band_buckets: vector length " + $a.numElements() + " != dim $dim");
         |}
         |int $n = $dim;
         |int[] $out = new int[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  int $bucket = 0;
         |  for (int $j = 0; $j < $rowsPerBand; $j++) {
         |    double $dot = 0.0;
         |    int $off = ($b * $rowsPerBand + $j) * $dim;
         |    for (int $k = 0; $k < $n; $k++) {
         |      $dot += (double) $p[$off + $k] * (double) $a.getFloat($k);
         |    }
         |    if ($dot >= 0.0) $bucket |= 1 << $j;
         |  }
         |  $out[$b] = $bucket;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Cosine of one vector against every row of a centroid matrix, as an
  * array of (s: double, cell: int) structs — the IVF cell-scoring
  * primitive ([[graft.ops.Similarity.ivfTopK]] feeds it to
  * array_max / array_sort for assignment and probe selection).
  *
  * Exists for the same reason as [[LshBandBuckets]]: composing nCells
  * separate [[CosineSimilarity]] calls against `typedlit` centroids
  * generates O(nCells·dim) source and falls out of codegen at
  * production cell counts (hundreds to thousands). Here the matrix is
  * ONE flattened float[] reference and the work happens in this
  * class's compiled [[core]] method, which the generated code calls
  * directly — no Janino size limits, no interpreted tree walking, and
  * the input vector's norm is computed once instead of nCells times.
  * Scores are bit-identical to the composed form (same sequential
  * double accumulation per centroid).
  */
case class CentroidStructScores(
    child: Expression, centroids: IndexedSeq[Float], nCells: Int, dim: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(centroids.length == nCells * dim,
    s"centroid matrix length ${centroids.length} != $nCells*$dim")

  override def prettyName: String = "centroid_struct_scores"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("s", DoubleType, nullable = false),
      StructField("cell", IntegerType, nullable = false))), containsNull = false)

  @transient private lazy val flat: Array[Float] = centroids.toArray
  // per-centroid squared norms, same sequential accumulation the
  // composed CosineSimilarity would use on the same floats
  @transient private lazy val centNorm2: Array[Double] = {
    val out = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      var s = 0.0; var k = 0
      while (k < dim) { val x = flat(c * dim + k).toDouble; s += x * x; k += 1 }
      out(c) = s; c += 1
    }
    out
  }

  /** The whole per-row computation, compiled Scala — called from both
    * eval and the generated code.
    */
  def core(v: ArrayData): ArrayData = {
    // throw on dimension mismatch rather than clamp — a truncated dot
    // product yields valid-looking scores that mask bad data
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"centroid_struct_scores: vector length ${v.numElements()} != dim $dim")
    val n = dim
    var na = 0.0
    var k = 0
    while (k < n) { val x = v.getFloat(k).toDouble; na += x * x; k += 1 }
    val rows = new Array[Any](nCells)
    var c = 0
    while (c < nCells) {
      var dot = 0.0
      val off = c * dim
      k = 0
      while (k < n) { dot += flat(off + k).toDouble * v.getFloat(k).toDouble; k += 1 }
      val denom = math.sqrt(na) * math.sqrt(centNorm2(c))
      val s = if (denom == 0.0) 0.0 else dot / denom
      rows(c) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](s, c))
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def nullSafeEval(v: Any): Any = core(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("cs", this,
        classOf[CentroidStructScores].getName)
      s"${ev.value} = $ref.core($a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Product-quantization encode (Jégou, Douze, Schmid — "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI 2011): split
  * the vector into `m` subvectors of `dsub` dims, replace each with
  * the index of its nearest (L2) codeword among `ksub` per-subspace
  * centroids. Output is the m-byte code — the compressed corpus
  * representation: at d=64 f4 a vector shrinks 32× (256 B → 8 B), so
  * the ANN scan/cache/shuffle at 100 TB carries codes, not vectors.
  *
  * `bytes = false` emits array<int> instead (the training path needs
  * posexplode over the assignments; binary has no generator).
  *
  * Same fused-expression rationale as [[CentroidStructScores]]: the
  * codebook tensor rides along as ONE flattened float[] reference and
  * the argmin loops live in this class's compiled [[core]], called
  * from the generated code — O(1) codegen source in m·ksub·dsub.
  * Ties break to the lowest codeword index; a wrong-dimension vector
  * throws (never clamps).
  */
case class PqEncode(
    child: Expression, codebooks: IndexedSeq[Float],
    m: Int, ksub: Int, dsub: Int, bytes: Boolean = true)
  extends UnaryExpression with ExpectsInputTypes {
  require(codebooks.length == m * ksub * dsub,
    s"codebook tensor length ${codebooks.length} != $m*$ksub*$dsub")
  require(ksub >= 1 && ksub <= 256, s"ksub $ksub outside byte-code range 1..256")

  override def prettyName: String = "pq_encode"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType =
    if (bytes) BinaryType else ArrayType(IntegerType, containsNull = false)

  @transient private lazy val flat: Array[Float] = codebooks.toArray

  /** Compiled per-row argmin; called from eval and generated code. */
  def core(v: ArrayData): Any = {
    if (v.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: vector length ${v.numElements()} != $m*$dsub")
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < ksub) {
        var d2 = 0.0
        val off = (j * ksub + k) * dsub
        var t = 0
        while (t < dsub) {
          val diff = v.getFloat(j * dsub + t).toDouble - flat(off + t).toDouble
          d2 += diff * diff
          t += 1
        }
        if (d2 < bestD) { bestD = d2; best = k }
        k += 1
      }
      codes(j) = best
      j += 1
    }
    if (bytes) {
      val out = new Array[Byte](m)
      var i = 0
      while (i < m) { out(i) = codes(i).toByte; i += 1 }
      out
    } else new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override def nullSafeEval(v: Any): Any = core(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("pqe", this, classOf[PqEncode].getName)
      val jt = if (bytes) "byte[]"
        else "org.apache.spark.sql.catalyst.util.ArrayData"
      s"${ev.value} = ($jt) $ref.core($a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-query ADC lookup table: element j·ksub + k is the
  * double-accumulated dot of the query's j-th subvector with codeword
  * k of subspace j. Computed ONCE per query row (the bounded side);
  * scoring a code is then m table adds ([[PqAdcScore]]) instead of a
  * d-element dot — the asymmetric-distance trick that makes PQ scans
  * d/m× cheaper in flops on top of the 4·d/m× smaller corpus.
  */
case class PqLut(
    child: Expression, codebooks: IndexedSeq[Float],
    m: Int, ksub: Int, dsub: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(codebooks.length == m * ksub * dsub,
    s"codebook tensor length ${codebooks.length} != $m*$ksub*$dsub")

  override def prettyName: String = "pq_lut"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val flat: Array[Float] = codebooks.toArray

  def core(v: ArrayData): ArrayData = {
    if (v.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_lut: vector length ${v.numElements()} != $m*$dsub")
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var k = 0
      while (k < ksub) {
        var dot = 0.0
        val off = (j * ksub + k) * dsub
        var t = 0
        while (t < dsub) {
          dot += v.getFloat(j * dsub + t).toDouble * flat(off + t).toDouble
          t += 1
        }
        out(j * ksub + k) = dot
        k += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = core(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("pql", this, classOf[PqLut].getName)
      s"${ev.value} = $ref.core($a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Asymmetric-distance score of an m-byte PQ code against a query's
  * [[PqLut]] table: Σ_j lut[j·ksub + code[j]]. Equals the exact dot
  * product of the query with the code's RECONSTRUCTION (the codeword
  * concatenation) — lossless-encoding corpora therefore score
  * exactly, which is what the planted-codeword oracle pins. The loop
  * is m adds per pair, inlined into whole-stage codegen.
  */
case class PqAdcScore(left: Expression, right: Expression, m: Int, ksub: Int)
  extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "pq_adc_score"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[Array[Byte]]
    val lut = r.asInstanceOf[ArrayData]
    if (codes.length != m)
      throw new IllegalArgumentException(
        s"pq_adc_score: code length ${codes.length} != m $m")
    // an undersized LUT would read past the array end UNCHECKED on
    // UnsafeArrayData (garbage scores, not an exception) — validate
    // like the code side
    if (lut.numElements() != m * ksub)
      throw new IllegalArgumentException(
        s"pq_adc_score: lut length ${lut.numElements()} != $m*$ksub")
    var s = 0.0
    var j = 0
    while (j < m) { s += lut.getDouble(j * ksub + (codes(j) & 0xFF)); j += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s"); val j = ctx.freshName("j")
      s"""
         |if ($a.length != $m) {
         |  throw new IllegalArgumentException(
         |    "pq_adc_score: code length " + $a.length + " != m $m");
         |}
         |if ($b.numElements() != $m * $ksub) {
         |  throw new IllegalArgumentException(
         |    "pq_adc_score: lut length " + $b.numElements() + " != $m*$ksub");
         |}
         |double $s = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $s += $b.getDouble($j * $ksub + ($a[$j] & 0xFF));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Per-vector 8-bit scalar quantization (the SQ8 scheme of FAISS's
  * IndexScalarQuantizer): code_i = floor((x_i − vmin)/δ + 0.5) with
  * δ = (vmax − vmin)/255, stored as (vmin, δ, 1 byte per dim) — the
  * corpus shrinks 4× (plus two doubles a row) and the k-NN scan reads
  * one byte per dimension. floor(q + 0.5) instead of a ties-mode
  * round so a SQL oracle can replay the exact same double arithmetic.
  * A constant vector (δ = 0) encodes to all-zero codes and
  * dequantizes back to vmin.
  */
case class Sq8Encode(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "sq8_encode"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("vmin", DoubleType, nullable = false),
    StructField("delta", DoubleType, nullable = false),
    StructField("codes", BinaryType, nullable = false)))

  def core(v: ArrayData): Any = {
    val n = v.numElements()
    var vmin = Double.MaxValue; var vmax = Double.MinValue
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      // quantizing a non-finite element is undefined — NaN would
      // silently encode as code 0 (= vmin) while a SQL replay
      // propagates NaN; fail loudly instead
      if (x.isNaN || x.isInfinite)
        throw new IllegalArgumentException(
          s"sq8_encode: non-finite element $x at dim $i")
      if (x < vmin) vmin = x
      if (x > vmax) vmax = x
      i += 1
    }
    if (n == 0) { vmin = 0.0; vmax = 0.0 }
    val delta = (vmax - vmin) / 255.0
    val codes = new Array[Byte](n)
    if (delta != 0.0) {
      i = 0
      while (i < n) {
        val q = math.floor((v.getFloat(i).toDouble - vmin) / delta + 0.5)
        // the quotient is ≤ 255(1+ε) by construction; clamp guards the
        // pathological-ε case so the byte can never wrap
        val c = if (q > 255.0) 255 else if (q < 0.0) 0 else q.toInt
        codes(i) = c.toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](vmin, delta, codes))
  }

  override def nullSafeEval(v: Any): Any = core(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("sq8e", this, classOf[Sq8Encode].getName)
      s"${ev.value} = (InternalRow) $ref.core($a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Asymmetric SQ8 cosine: left = the (vmin, δ, codes) struct from
  * [[Sq8Encode]] (corpus side, 1 byte/dim), right = the exact float
  * query vector. Dequantizes on the fly — x̂_i = vmin + c_i·δ, all
  * double — so a SQL oracle replaying the same dequantization gets
  * bit-equal inputs to the cosine.
  */
case class Sq8AsymCosine(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "sq8_asym_cosine"
  override def inputTypes: Seq[AbstractDataType] = Seq(
    StructType(Seq(
      StructField("vmin", DoubleType, nullable = false),
      StructField("delta", DoubleType, nullable = false),
      StructField("codes", BinaryType, nullable = false))),
    ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  def core(s: InternalRow, q: ArrayData): Double = {
    val vmin = s.getDouble(0); val delta = s.getDouble(1)
    val codes = s.getBinary(2)
    val n = codes.length
    require(q.numElements() == n,
      s"sq8_asym_cosine: query dim ${q.numElements()} != corpus dim $n")
    var dot = 0.0; var nx = 0.0; var nq = 0.0
    var i = 0
    while (i < n) {
      val x = vmin + (codes(i) & 0xFF).toDouble * delta
      val y = q.getFloat(i).toDouble
      dot += x * y; nx += x * x; nq += y * y
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(nq)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    core(l.asInstanceOf[InternalRow], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("sq8c", this, classOf[Sq8AsymCosine].getName)
      s"${ev.value} = $ref.core($a, $b);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  def cosineSim(a: Column, b: Column): Column =
    GraftColumns.column(CosineSimilarity(GraftColumns.expr(a), GraftColumns.expr(b)))
  def dotF(a: Column, b: Column): Column =
    GraftColumns.column(DotProduct(GraftColumns.expr(a), GraftColumns.expr(b)))
  def l2Norm(a: Column): Column =
    GraftColumns.column(L2Norm(GraftColumns.expr(a)))
  /** (vmin, δ, codes) SQ8 struct of a float vector — see [[Sq8Encode]]. */
  def sq8Encode(v: Column): Column =
    GraftColumns.column(Sq8Encode(GraftColumns.expr(v)))
  /** Asymmetric cosine of an SQ8 struct against an exact query — see
    * [[Sq8AsymCosine]].
    */
  def sq8AsymCosine(s: Column, q: Column): Column =
    GraftColumns.column(Sq8AsymCosine(GraftColumns.expr(s), GraftColumns.expr(q)))
  /** Array of all band buckets for a (bands)(rowsPerBand)(dim) plane
    * tensor — see [[LshBandBuckets]].
    */
  def lshBandBuckets(v: Column, planes: Array[Array[Array[Float]]]): Column = {
    val bands = planes.length
    val rows = planes.head.length
    val dim = planes.head.head.length
    GraftColumns.column(LshBandBuckets(GraftColumns.expr(v),
      planes.flatten.flatten.toIndexedSeq, bands, rows, dim))
  }
  /** (s, cell) struct array of cosines against a centroid matrix —
    * see [[CentroidStructScores]].
    */
  def centroidStructScores(v: Column, centroids: Array[Seq[Float]]): Column = {
    val nCells = centroids.length
    val dim = centroids.head.length
    GraftColumns.column(CentroidStructScores(GraftColumns.expr(v),
      centroids.flatten.toIndexedSeq, nCells, dim))
  }

  /** m-byte PQ code of a vector against a (m)(ksub)(dsub) codebook
    * tensor — see [[PqEncode]]; `bytes = false` gives array<int> for
    * the training path's posexplode.
    */
  def pqEncode(v: Column, codebooks: Array[Array[Array[Float]]],
      bytes: Boolean = true): Column = {
    val m = codebooks.length
    val ksub = codebooks.head.length
    val dsub = codebooks.head.head.length
    GraftColumns.column(PqEncode(GraftColumns.expr(v),
      codebooks.flatten.flatten.toIndexedSeq, m, ksub, dsub, bytes))
  }
  /** Per-query ADC lookup table (m·ksub dots) — see [[PqLut]]. */
  def pqLut(v: Column, codebooks: Array[Array[Array[Float]]]): Column = {
    val m = codebooks.length
    val ksub = codebooks.head.length
    val dsub = codebooks.head.head.length
    GraftColumns.column(PqLut(GraftColumns.expr(v),
      codebooks.flatten.flatten.toIndexedSeq, m, ksub, dsub))
  }
  /** ADC score of a code column against a LUT column — see
    * [[PqAdcScore]].
    */
  def pqAdcScore(codes: Column, lut: Column, m: Int, ksub: Int): Column =
    GraftColumns.column(PqAdcScore(GraftColumns.expr(codes),
      GraftColumns.expr(lut), m, ksub))

  /** Register cosine_sim/dot_f/l2_norm for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftColumns.registerFunction(spark, "cosine_sim", es => CosineSimilarity(es(0), es(1)))
    GraftColumns.registerFunction(spark, "dot_f", es => DotProduct(es(0), es(1)))
    GraftColumns.registerFunction(spark, "l2_norm", es => L2Norm(es.head))
  }
}
