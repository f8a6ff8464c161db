package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join ("most recent right row at-or-before each left
  * row's time, per key") — an operator Spark lacks natively
  * (SURVEY.md §2.3).
  *
  * Implementation is the scalable union-sort-window construction, NOT a
  * range join: tag both sides, union, and run one window pass
  * partitioned by key, ordered by (time, side, tie-break), carrying the
  * latest-seen right payload forward with `last(ignoreNulls)`. Cost is
  * a single hash shuffle of |L|+|R| rows + a per-partition sort — no
  * row multiplication, no skew amplification, no driver loops — which
  * is why it survives 100 TB where the naive
  * `join(cond) → groupBy → max` would shuffle |L|×avg-matches rows.
  *
  * Right rows sort before left rows at equal times, so the match is
  * inclusive (right.time <= left.time); equal-time right rows resolve
  * to the greatest tie-break value (deterministic).
  */
object AsOfJoin {

  /** @param by       equi-key columns present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param tieBreak  right column resolving equal-time ties (max wins)
    * @param payload   (rightCol → outputName) columns carried to matches
    * @return `left`'s rows (all of them — left-outer semantics) with
    *         the matched right payload columns appended (null when no
    *         right row precedes).
    */
  def backward(left: DataFrame, right: DataFrame, by: Seq[String],
               leftTime: String, rightTime: String, tieBreak: String,
               payload: Seq[(String, String)]): DataFrame = {
    val leftPayload = left.columns.filterNot(by.contains).toSeq
    val tieType = right.schema(tieBreak).dataType

    val lSide = left.select(
      by.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__isL"),
          lit(null).cast(tieType).as("__tie")) ++
        payload.map { case (rc, out) =>
          lit(null).cast(right.schema(rc).dataType).as(s"__m_$out") } ++
        leftPayload.map(col): _*)

    val rSide = right.select(
      by.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__isL"),
          col(tieBreak).cast(tieType).as("__tie")) ++
        payload.map { case (rc, out) => col(rc).as(s"__m_$out") } ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__t").asc, col("__isL").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = payload.foldLeft(lSide.unionByName(rSide)) {
      case (df, (_, out)) =>
        df.withColumn(s"__m_$out", last(col(s"__m_$out"), ignoreNulls = true).over(w))
    }

    matched.filter(col("__isL") === 1)
      .select(by.map(col) ++ leftPayload.map(col) ++
        payload.map { case (_, out) => col(s"__m_$out").as(out) }: _*)
  }
}
