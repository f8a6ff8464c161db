package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — equi-key + time-range pairing without the
  * cartesian blowup (SURVEY.md §2.3's "range" join type).
  *
  * Spark plans a bare non-equi condition as BroadcastNestedLoopJoin
  * (O(|L|·|R|), driver-memory bound) — unusable at scale. The standard
  * fix is bucketing: quantize time into buckets of the window width, so
  * a right row at-or-after a left row within `windowUs` can only live
  * in the left row's bucket or the next one. Exploding each left row to
  * those 2 candidate buckets turns the range join into an equi-join on
  * (key, bucket) + a residual filter — one hash shuffle, linear in
  * input + true-match count, skew-safe under AQE.
  */
object RangeJoin {

  /** Pairs (l, r) sharing `by` where
    * `l.leftTime < r.rightTime <= l.leftTime + windowUs` (strictly
    * after, within the window). Time columns must be TimestampType. */
  def following(left: DataFrame, right: DataFrame, by: Seq[String],
                leftTime: String, rightTime: String,
                windowUs: Long): DataFrame = {
    val l = left.withColumn("__lt", unix_micros(col(leftTime)))
      .withColumn("__bucket",
        explode(array((unix_micros(col(leftTime)) / windowUs).cast("long"),
          (unix_micros(col(leftTime)) / windowUs).cast("long") + 1)))
    val r = right.withColumn("__rt", unix_micros(col(rightTime)))
      .withColumn("__bucket", (unix_micros(col(rightTime)) / windowUs).cast("long"))
    l.join(r, by :+ "__bucket")
      .filter(col("__rt") > col("__lt") && col("__rt") <= col("__lt") + windowUs)
      .drop("__bucket", "__lt", "__rt")
  }
}
