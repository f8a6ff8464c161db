package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries over the custom DataSource V2 connector
  * ([[SeqSource]]). The data is generated, not read, so the query is
  * sf-independent; the oracle replays the identical deterministic
  * column arithmetic over DuckDB's `range()` table function — engine
  * parity proves the connector's planning (filter pushdown, slice
  * pruning, column pruning) changes WHERE work happens, never the
  * result. */
object SourceQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Scan the generator through a pushed id-range (the source clamps
    // its slices to [50000, 100000) at PLAN time — 16 of 32 slices are
    // never created) and a pruned projection (tag is never built), then
    // aggregate per bucket. The whole read side is expressed against
    // the connector API exactly as a parquet scan would be — Catalyst
    // sees an ordinary v2 relation.
    "q140_dsv2_source" -> ((s, dir) => {
      import s.implicits._
      s.read.format("graft.sources.SeqSource")
        .option("start", "0").option("end", "200000")
        .option("partitions", "32").load()
        .filter($"id" >= 50000L && $"id" < 100000L)
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          sum($"val").as("sum_val"),
          min($"id").as("min_id"),
          max($"id").as("max_id"))
        .orderBy($"bucket")
    }))

  val oracle: Map[String, String] = Map(
    // Same modular arithmetic as SeqSource.valOf/bucketOf,
    // token-for-token, over DuckDB's range() rows.
    "q140_dsv2_source" ->
      """WITH t AS (SELECT range AS id FROM range(50000, 100000))
        |SELECT id % 32 AS bucket,
        |  count(*) AS n,
        |  CAST(sum(((id % 100003) * 31 + 7) % 100003) AS BIGINT) AS sum_val,
        |  min(id) AS min_id,
        |  max(id) AS max_id
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin)
}
