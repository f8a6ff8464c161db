package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{StructField, StructType}

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

    // All payload columns ride in ONE struct: the struct is non-null for
    // every right row (even when all its fields are null), so
    // last(ignoreNulls) lands on the most recent right ROW — nulls
    // inside that row are preserved, and every payload column is
    // guaranteed to come from the same right row. Carrying columns
    // individually would let last() skip a matched row's null value and
    // splice in an older row's value (merge_asof divergence).
    val payloadType = StructType(payload.map { case (rc, out) =>
      StructField(out, right.schema(rc).dataType, nullable = true) })

    val lSide = left.select(
      by.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__isL"),
          lit(null).cast(tieType).as("__tie"),
          lit(null).cast(payloadType).as("__m")) ++
        leftPayload.map(col): _*)

    val rSide = right.select(
      by.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__isL"),
          col(tieBreak).cast(tieType).as("__tie"),
          struct(payload.map { case (rc, out) => col(rc).as(out) }: _*).as("__m")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__t").asc, col("__isL").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lSide.unionByName(rSide)
      .withColumn("__m", last(col("__m"), ignoreNulls = true).over(w))

    matched.filter(col("__isL") === 1)
      .select(by.map(col) ++ leftPayload.map(col) ++
        payload.map { case (_, out) => col("__m")(out).as(out) }: _*)
  }
}
