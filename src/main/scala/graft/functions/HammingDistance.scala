package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Hamming distance between two long fingerprints (popcount of XOR) —
  * the pair-search kernel for SimHash dedup (SURVEY.md §2.10): docs
  * whose 16/64-bit SimHash fingerprints differ in ≤ k bits are
  * near-duplicates. Codegen'd to a single `Long.bitCount` intrinsic
  * (one POPCNT instruction on x86) inside WholeStageCodegen, so a
  * banded pair scan stays memory-bound, not compute-bound. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_distance"

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.bitCount(l.asInstanceOf[Long] ^ r.asInstanceOf[Long]).toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (long) java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  def hamming(s: SparkSession)(a: Column, b: Column): Column = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming_distance", exprs => HammingDistance(exprs(0), exprs(1)), "scala_udf")
    call_function("hamming_distance", a, b)
  }
}
