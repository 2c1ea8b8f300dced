package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{
  Add, AggregateWindowFunction, Ascending, AttributeReference, Cast, Expression,
  If, IsNull, Literal, Multiply, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exponential moving average as a native window function.
  *
  * EMA is the one smoothing the reference's downstream users compute
  * everywhere and Spark has no builtin for: the recurrence
  * `ema_t = α·x_t + (1−α)·ema_{t−1}` (seeded with the first non-null
  * value) is not expressible as a frame aggregate because every row
  * depends on the previous OUTPUT, not the previous inputs. A
  * closed-form window sum (`Σ x_j·(1−α)^{−j}` rescaled) overflows
  * double for long series, and a per-key `mapPartitions` would leave
  * codegen. An [[AggregateWindowFunction]] is the Spark-native shape:
  * the running frame (UNBOUNDED PRECEDING..CURRENT ROW) evaluates
  * `updateExpressions` once per row in epoch order, so the recursion
  * is exact, the state is one double, and the update stays inside the
  * window operator's generated projection.
  *
  * Execution shape at scale is identical to `lag`/`row_number`: one
  * sort within the key partition, O(1) state per key, no extra pass.
  * Null inputs carry the previous state (the series skips them).
  *
  * Oracle replay: per-key recursive CTE — the same IEEE double ops in
  * the same per-row order, so results agree bit-for-bit when α and
  * 1−α are exact binary fractions (α = 2/(n+1) with n = 7 gives 0.25;
  * callers wanting hash-stable oracles should pick such n).
  */
case class EmaWindow(child: Expression, alpha: Double)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = DoubleType

  private lazy val ema = AttributeReference("ema", DoubleType)()
  override def aggBufferAttributes: Seq[AttributeReference] = Seq(ema)
  override val initialValues: Seq[Expression] = Seq(Literal(null, DoubleType))

  private def x: Expression = Cast(child, DoubleType)
  override lazy val updateExpressions: Seq[Expression] = {
    val next = Add(Multiply(Literal(alpha), x), Multiply(Literal(1.0 - alpha), ema))
    Seq(If(IsNull(x), ema, If(IsNull(ema), x, next)))
  }
  override lazy val evaluateExpression: Expression = ema

  override def prettyName: String = "ema"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object WindowFunctions {
  /** `ema(x, n)` with the standard span convention α = 2/(n+1) over
    * the running per-key frame, ordered ascending by `orderBy`. The
    * WindowExpression is built directly with the function's required
    * ROW frame — the Column-API `.over` path materializes a default
    * RANGE frame that an [[AggregateWindowFunction]] rejects.
    */
  def ema(x: Column, n: Int, partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
    emaAlpha(x, 2.0 / (n + 1), partitionBy, orderBy)

  def emaAlpha(x: Column, alpha: Double,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val f = EmaWindow(GraftColumns.expr(x), alpha)
    val spec = WindowSpecDefinition(
      partitionBy.map(GraftColumns.expr),
      orderBy.map(c => SortOrder(GraftColumns.expr(c), Ascending)),
      f.frame)
    GraftColumns.column(WindowExpression(f, spec))
  }

  /** Register `ema_w(x, alpha) OVER (...)` for raw Spark SQL. The SQL
    * analyzer resolves an OVER clause without an explicit frame to
    * UnspecifiedFrame, which ResolveWindowFrame fills with the
    * function's own running ROW frame — so plain SQL needs none of the
    * Column-API frame workaround above.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftColumns.registerFunction(spark, "ema_w", es => {
      if (es.length != 2)
        throw new IllegalArgumentException(
          s"ema_w expects (value, alpha), got ${es.length} argument(s)")
      // SQL parses a bare 0.5 as DECIMAL(1,1): accept any foldable
      // numeric by folding it through a double cast
      val alpha = (if (es(1).foldable) Cast(es(1), DoubleType).eval() else null) match {
        case d: java.lang.Double => d.doubleValue
        case _ => throw new IllegalArgumentException(
          s"ema_w: alpha must be a numeric literal, got ${es(1)}")
      }
      EmaWindow(es.head, alpha)
    })
}
