package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator extension ladder, rung (c) (SURVEY.md §2.9 / the
  * build mandate's preference order): a first-class as-of join as
  * `LogicalPlan` node + planner `Strategy` + `SparkPlan` with a
  * streaming merge implementation.
  *
  * Semantics match `graft.ops.AsOfJoin.backward` (most recent right
  * row with rightTime ≤ leftTime per key; ties on rightTime resolve to
  * the greatest tie-break): left-outer, no row multiplication. The
  * physical operator declares clustered distribution + (key, time)
  * ordering requirements, so EnsureRequirements plans exactly one hash
  * shuffle + sort per side, and execution is a single zipPartitions
  * merge pass holding ONE buffered right row — O(1) memory per
  * partition vs the window variant's state, and no union materialization.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, rightTie: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, rightTie: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime :+ rightTie).map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), rOut)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val outProj = UnsafeProjection.create(allOut, allOut)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // one-row lookahead into the right side; right rows with a NULL
        // time never match anything (merge_asof semantics) — skip them
        // here rather than letting getLong read an undefined value.
        var rHead: InternalRow = _
        var rHeadKey: UnsafeRow = _
        var rHeadTime: Long = 0L
        def advanceRight(): Unit = {
          rHead = null; rHeadKey = null
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            val tRow = rTimeProj(r)
            if (!tRow.isNullAt(0)) {
              rHeadTime = tRow.getLong(0)
              rHead = r.copy()
              rHeadKey = rKeyProj(r).copy()
            }
          }
        }
        advanceRight()

        // most recent right row consumed for the current key
        var lastMatch: InternalRow = _
        var lastMatchKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lKeyProj(l)
          val tRow = lTimeProj(l)
          // a left row with NULL time matches nothing, but is still
          // emitted (left-outer) with a null right side
          if (tRow.isNullAt(0)) {
            outProj(joined(l, nullRight))
          } else {
            val t = tRow.getLong(0)
            var advancing = true
            while (advancing && rHead != null) {
              val cmp = keyOrd.compare(rHeadKey, k)
              if (cmp < 0) advanceRight() // right side behind on key
              else if (cmp == 0 && rHeadTime <= t) {
                lastMatch = rHead; lastMatchKey = rHeadKey
                advanceRight()
              } else advancing = false
            }
            val matched = lastMatchKey != null && keyOrd.compare(lastMatchKey, k) == 0
            outProj(joined(l, if (matched) lastMatch else nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}
