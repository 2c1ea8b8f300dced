package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for per-document text statistics.
  *
  * [[TokenRepetitionStats]] exists for the same reason as the fused
  * vector expressions ([[LshBandBuckets]] et al.): the composed
  * built-in form of the Gopher repetition signals —
  * `transform(sequence(...), i -> concat_ws(" ", slice(tokens, i, n)))`
  * with `size`/`array_distinct` over it — keeps the FULL
  * `split(lower(trim(text)))` subtree inside the lambda body. In a
  * Project, whole-stage codegen's subexpression elimination hoists the
  * split and the tree is evaluated once per row; but the moment the
  * signals are used in a FILTER (the whole point of a quality gate),
  * predicate pushdown clones the tree once per field reference, filters
  * get no subexpression elimination, and higher-order functions are
  * CodegenFallback — interpreted evaluation re-runs the regex split at
  * EVERY gram position: O(tokens²) splits per row per clone. Measured
  * ~1.5 ms/row (341 s for a 250k-doc corpus at the 50× scale point) vs
  * 29 µs/row for the identical math without the filter.
  *
  * This expression takes the token array ONCE (the split stays a
  * codegen'd Spark built-in outside the lambda problem entirely) and
  * counts everything a repetition gate needs in a single compiled
  * O(tokens) pass. It returns pure integer counts — all fraction /
  * rounding arithmetic stays in Spark built-ins so results are
  * bit-identical to the composed form and to the DuckDB oracle.
  *
  * It also subsumes the top-word aggregation: the reference-shaped
  * composed form computed max-token-frequency via
  * explode → groupBy(doc, word) → groupBy(doc) → join — two shuffles
  * of every token in the corpus plus a join, for a statistic that is
  * per-document. Fusing it here makes the whole Gopher gate a narrow
  * shuffle-free projection: at 100 TB that removes a full-corpus
  * token explode from the pipeline's critical path.
  */
case class TokenRepetitionStats(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "token_repetition_stats"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("top_count", IntegerType, nullable = false),
    StructField("bi_total", IntegerType, nullable = false),
    StructField("bi_distinct", IntegerType, nullable = false),
    StructField("tri_total", IntegerType, nullable = false),
    StructField("tri_distinct", IntegerType, nullable = false)))

  /** One pass over the token array, compiled Scala — called from both
    * eval and the generated code. Gram identity is the token TUPLE,
    * which equals the concat_ws(" ") string identity of the composed
    * form because split-on-space tokens cannot contain the separator.
    * Tokens are assumed non-null (the contract of `split` output).
    */
  def core(v: ArrayData): InternalRow = {
    val n = v.numElements()
    val freq = new java.util.HashMap[UTF8String, Integer](math.max(16, n * 2))
    var top = 0
    var i = 0
    while (i < n) {
      val t = v.getUTF8String(i)
      val c0 = freq.get(t)
      val c = if (c0 == null) 1 else c0.intValue() + 1
      freq.put(t, Integer.valueOf(c))
      if (c > top) top = c
      i += 1
    }
    var biDistinct = 0
    var triDistinct = 0
    if (n >= 2) {
      val bi = new java.util.HashSet[(UTF8String, UTF8String)](n * 2)
      i = 0
      while (i < n - 1) {
        bi.add((v.getUTF8String(i), v.getUTF8String(i + 1)))
        i += 1
      }
      biDistinct = bi.size()
    }
    if (n >= 3) {
      val tri = new java.util.HashSet[(UTF8String, UTF8String, UTF8String)](n * 2)
      i = 0
      while (i < n - 2) {
        tri.add((v.getUTF8String(i), v.getUTF8String(i + 1), v.getUTF8String(i + 2)))
        i += 1
      }
      triDistinct = tri.size()
    }
    new GenericInternalRow(Array[Any](
      n, top,
      if (n >= 2) n - 1 else 0, biDistinct,
      if (n >= 3) n - 2 else 0, triDistinct))
  }

  override def nullSafeEval(v: Any): Any = core(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("trs", this, classOf[TokenRepetitionStats].getName)
      s"${ev.value} = $ref.core($a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash (Charikar 2002) of a token array in one compiled
  * pass — the per-document form of the frequency-weighted sign-sum:
  * each token occurrence votes ±1 on every bit of its 64-bit hash;
  * bit j of the output is set iff the sum is positive.
  *
  * Token hashes are `XXH64.hashUTF8String(tok, 42L)` — byte-identical
  * to Spark's `xxhash64(col)` built-in on a string — so this equals
  * the composed batch form (`explode → groupBy(id) with 64
  * conditional sums → bit-pack`, [[graft.ops.Dedup.simhashSignatures]]'
  * original shape) bit for bit. The composed form shuffles EVERY
  * token of the corpus to compute a statistic that is per-document;
  * fusing it makes the signature a narrow shuffle-free projection —
  * and, because a projection (unlike an aggregation) is a valid
  * streaming transform, the same expression powers
  * [[graft.streaming.StreamingNearDedup]].
  */
case class Simhash64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "simhash64"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  /** One pass; ±1 votes accumulated in a 64-int array. Tokens are
    * assumed non-null (the contract of `split` output).
    */
  def core(v: ArrayData): Long = {
    val n = v.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(v.getUTF8String(i), 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) != 0L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var packed = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) packed |= (1L << j)
      j += 1
    }
    packed
  }

  override def nullSafeEval(v: Any): Any = core(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("sh", this, classOf[Simhash64].getName)
      s"${ev.value} = $ref.core($a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextFunctions {
  /** Struct of repetition counts over a token array — see
    * [[TokenRepetitionStats]].
    */
  def tokenRepetitionStats(tokens: Column): Column =
    GraftColumns.column(TokenRepetitionStats(GraftColumns.expr(tokens)))

  /** 64-bit SimHash of a token array — see [[Simhash64]]. */
  def simhash64(tokens: Column): Column =
    GraftColumns.column(Simhash64(GraftColumns.expr(tokens)))
}
