package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization via the classic lag-flag-cumsum window
  * construction (SURVEY.md §2.8, §7.3 item 3): a new session starts
  * when the gap to the previous event of the same key exceeds
  * `gapUs`. One shuffle (hash by key) + per-partition sort; identical
  * semantics to Structured Streaming's `session_window`, but runnable
  * in batch and expressible in ANSI SQL for the oracle.
  */
object Sessionize {

  /** Adds a `session_seq` column (0-based per-key session index).
    * Ordering within a key is (timeCol, tieBreak) — total given a
    * unique tie-break. */
  def withSessionSeq(df: DataFrame, key: String, timeCol: String,
                     tieBreak: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(timeCol), col(tieBreak))
    val prevUs = lag(unix_micros(col(timeCol)), 1).over(w)
    val newSession = when(prevUs.isNull, 0L)
      .when(unix_micros(col(timeCol)) - prevUs > gapUs, 1L)
      .otherwise(0L)
    df.withColumn("session_seq",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
