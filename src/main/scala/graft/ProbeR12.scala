package graft
import org.apache.spark.sql.SparkSession

/** Throwaway round-12 plan-capture probe (dev tool; never part of the
  * declared surface): prints the recursive-CTE physical plan for a
  * given join hint so plans/r12/ can carry the q67 gate's two paths. */
object ProbeR12 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val hint = sys.env.getOrElse("PROBE_HINT", "BROADCAST")
    val width = sys.env.getOrElse("PROBE_WIDTH", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    spark.conf.set("spark.sql.cteRecursionRowLimit", "2000000000")
    spark.sql(
      s"""WITH RECURSIVE
         |edges AS (SELECT c_custkey AS referred, CAST(floor(c_custkey/2) AS BIGINT) AS referrer
         |          FROM customer WHERE c_custkey >= 1),
         |anc(descendant, ancestor, lvl) AS (
         |  SELECT referred, referrer, CAST(1 AS BIGINT) FROM edges
         |  UNION ALL
         |  SELECT /*+ $hint(e) */ a.descendant, e.referrer, a.lvl + 1
         |  FROM anc a JOIN edges e ON e.referred = a.ancestor
         |  WHERE a.lvl < 10)
         |SELECT lvl AS level, count(*) AS n_pairs,
         |  count(DISTINCT ancestor) AS n_ancestors
         |FROM anc GROUP BY lvl ORDER BY lvl""".stripMargin)
      .explain("formatted")
    // The UnionLoop explain keeps the recursive member's join LOGICAL
    // (strategy is picked per iteration at execution time), so also
    // plan ONE iteration's join with the same hint — this is the
    // physical shape each of the 10 iterations executes.
    println("== One-iteration physical equivalent ==")
    spark.sql(
      s"""WITH edges AS (SELECT c_custkey AS referred,
         |  CAST(floor(c_custkey/2) AS BIGINT) AS referrer
         |  FROM customer WHERE c_custkey >= 1)
         |SELECT /*+ $hint(e) */ a.referred AS descendant,
         |  e.referrer AS ancestor
         |FROM edges a JOIN edges e ON e.referred = a.referrer""".stripMargin)
      .explain("formatted")
    spark.stop()
  }
}
