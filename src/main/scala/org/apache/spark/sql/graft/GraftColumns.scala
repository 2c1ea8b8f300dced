package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] surface: wrap a Catalyst
  * Expression as a user-facing Column and register SQL functions.
  * Lives in the org.apache.spark.sql namespace on purpose — the
  * standard technique for Spark extension libraries.
  */
object GraftColumns {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expr(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  def registerFunction(
      spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** The session's extensions object (private[sql] on SparkSession):
    * rules injected here are read each time an analyzer is BUILT, so
    * they apply to sessions whose SessionState materializes after the
    * injection — [[cloneWithFreshState]] for an already-running one.
    */
  def extensions(spark: SparkSession): org.apache.spark.sql.SparkSessionExtensions =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].extensions

  /** `cloneSession()` (private[sql]): a new session CARRYING the
    * caller's runtime conf, temp views and UDFs, whose analyzer is
    * rebuilt lazily — so freshly injected extension rules take effect
    * without silently resetting session state the way `newSession()`
    * would.
    */
  def cloneWithFreshState(spark: SparkSession): SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
}
