package graft.ops

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression}
import org.apache.spark.sql.types._
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
    // Self-join safety: when both sides derive from the SAME relation
    // (the common case — purchases vs clicks of one events table), the
    // two analyzed plans share attribute exprIds. DeduplicateRelations
    // will re-id the right subtree during analysis of the new plan, but
    // it cannot know which occurrences inside OUR key/time/tie
    // expression lists belong to the right child — they'd silently keep
    // the left ids and the exec would bind against the wrong side (or
    // fail after pruning). Re-aliasing every right column mints fresh,
    // unambiguous exprIds for the attributes we capture here.
    val rightFresh = right.select(
      right.columns.map(c => org.apache.spark.sql.functions.col(c).as(c)): _*)
    val rPlan = rightFresh.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    // AsOfJoinExec reads time values with UnsafeRow.getLong, which is
    // only valid for 8-byte-backed types. Narrower integral/date types
    // get an explicit Cast to LongType; anything else (string, double,
    // decimal…) is rejected up front instead of silently reading
    // garbage. Null time values are defined by the exec as
    // never-matching (left row with null time → unmatched output row;
    // right row with null time → skipped).
    def timeExpr(a: Attribute): Expression = a.dataType match {
      case LongType | TimestampType | TimestampNTZType => a
      case ByteType | ShortType | IntegerType | DateType => Cast(a, LongType)
      case dt => throw new IllegalArgumentException(
        s"as-of time column ${a.name} has unsupported type $dt " +
          "(need an integral, date, or timestamp type)")
    }
    GraftBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan,
        by.map(attr(lPlan, _)), by.map(attr(rPlan, _)),
        timeExpr(attr(lPlan, leftTime)), timeExpr(attr(rPlan, rightTime)),
        attr(rPlan, tieBreak)))
  }
}
