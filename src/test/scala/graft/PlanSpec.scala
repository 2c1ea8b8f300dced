package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan guardrails for every shipped query (round-1 lesson:
  * correctness-green plans hid cartesian products and empty-key
  * windows that die at 100× scale).
  *
  *  - no CartesianProductExec anywhere (broadcast NL joins are fine:
  *    the big side streams, nothing shuffles n×m);
  *  - no WindowExec with an empty partitionSpec (a global window
  *    funnels the whole table through ONE task).
  */
class PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name: no cartesian product, no empty-key window") {
      val plan = fn(spark, sf).queryExecution.sparkPlan
      val cartesians = plan.collect { case c: CartesianProductExec => c }
      assert(cartesians.isEmpty,
        s"CartesianProductExec in $name:\n${cartesians.mkString("\n")}")
      val globalWindows = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.isEmpty,
        s"empty-partitionBy Window in $name:\n${globalWindows.mkString("\n")}")
    }
  }
}
