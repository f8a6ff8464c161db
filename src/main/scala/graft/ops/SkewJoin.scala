package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md/BASELINE north star:
  * "salting for skew").
  *
  * When one join key carries a disproportionate share of the large
  * side's rows, a plain hash join lands that key in one task. Salting
  * splits it: the large side derives a deterministic salt in
  * [0, salts) from its full row content, the small side replicates
  * each row to every salt, and the join key becomes (key, salt) — the
  * hot key now spreads across `salts` tasks. Replication cost is
  * |small| × salts, which is why this composes with (not replaces)
  * AQE's skew-split: use salting when skew is *known and extreme*
  * (power-law user IDs, null-heavy FKs), AQE for the long tail.
  */
object SkewJoin {

  /** Inner equi-join `large ⋈ small` on `key`, spreading each key of
    * the large side across `salts` partitions. Result equals
    * `large.join(small, key)` exactly (only physical distribution
    * changes). */
  def salted(large: DataFrame, small: DataFrame, key: String,
             salts: Int): DataFrame = {
    val lCols = large.columns.map(col).toSeq
    val l = large.withColumn("__salt",
      pmod(hash(lCols: _*), lit(salts)))
    val r = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
