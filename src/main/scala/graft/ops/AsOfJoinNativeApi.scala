package graft.ops

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Attribute
import graft.plans.AsOfJoinPlan

/** DataFrame-level entry point for the native as-of join operator
  * (graft.plans.AsOfJoinNative — LogicalPlan + Strategy + SparkPlan).
  * Requires a session built with `graft.plans.GraftExtensions` (the
  * strategy must be injected for the planner to place AsOfJoinExec).
  *
  * Output = left columns ++ right columns (right side null when no
  * right row at-or-before the left row's time exists for the key).
  */
object AsOfJoinNative {

  def backward(left: DataFrame, right: DataFrame, by: Seq[String],
               leftTime: String, rightTime: String,
               tieBreak: String): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    GraftBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan,
        by.map(attr(lPlan, _)), by.map(attr(rPlan, _)),
        attr(lPlan, leftTime), attr(rPlan, rightTime), attr(rPlan, tieBreak)))
  }
}
