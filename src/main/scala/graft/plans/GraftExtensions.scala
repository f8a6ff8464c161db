package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, If, IsNull, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}
import graft.functions.CosineSimilarity

/** Custom optimizer surface (SURVEY.md §2.9 preference ladder, rung c:
  * `Rule[LogicalPlan]` + `SparkSessionExtensions`).
  *
  * `SimplifySelfCosine` strength-reduces `cosine_sim(x, x)` — which a
  * query generator emits freely (self-joins, reused CTEs) — from an
  * O(d) fused loop to a constant-guarded O(d) zero-check with no
  * multiplies: cos(x,x) = 1 for any nonzero x, and our kernel defines
  * 0 for the zero vector, so the rewrite `If(anyNonZero(x), 1.0, 0.0)`
  * is exactly semantics-preserving (including nulls — both child
  * expressions are null-intolerant on the same input).
  */
case class ArrayAnyNonZero(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "array_any_nonzero"
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var i = 0
    while (i < a.numElements()) {
      if (a.getFloat(i) != 0f) return true
      i += 1
    }
    false
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = false;
         |for (int i = 0; i < $a.numElements(); i++) {
         |  if ($a.getFloat(i) != 0f) { ${ev.value} = true; break; }
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // Non-nullable input: the bare If is exact.
      case CosineSimilarity(a, b)
          if a.deterministic && a.semanticEquals(b) && !a.nullable =>
        If(ArrayAnyNonZero(a), Literal(1.0), Literal(0.0))
      // Nullable input: cosine_sim(NULL, NULL) is NULL, but If treats a
      // null predicate as false (would yield 0.0 and flip nullability),
      // so guard with an explicit IsNull branch.
      case CosineSimilarity(a, b) if a.deterministic && a.semanticEquals(b) =>
        If(IsNull(a), Literal(null, DoubleType),
          If(ArrayAnyNonZero(a), Literal(1.0), Literal(0.0)))
    }
}

/** Register with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SimplifySelfCosine)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
