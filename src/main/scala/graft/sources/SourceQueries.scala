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
    }),

    // JSON-lines sink/source ROUNDTRIP proven lossless by checksum:
    // write the documents table as JSON, read it back through an
    // explicit schema, and emit the order-invariant bucketed multiset
    // checksum (q116's machinery) of the READ-BACK rows — while the
    // oracle checksums the ORIGINAL parquet rows. Hash equality
    // across the write→read loop is the interchange guarantee a lake
    // needs before trusting a format conversion (escaping, unicode,
    // null handling, numeric width all live inside this hash). Scale
    // shape: the write and read are partition-parallel; the checksum
    // is the O(buckets) reconciliation summary.
    "q209_json_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val out = s"/tmp/graft_json_rt_${math.abs(dir.hashCode)}"
      graft.engine.Tables.documents(s, dir)
        .select($"doc_id", $"lang", $"source", $"n_chars", $"text")
        .write.mode("overwrite").json(out)
      val back = s.read
        .schema("doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT, text STRING")
        .json(out)
      graft.engine.Maintenance.tableChecksum(back, buckets = 64)
        .orderBy($"bucket")
    }))

  val oracle: Map[String, String] = Map(
    // Checksum of the ORIGINAL rows (the identical chr(1)/chr(2)
    // canonicalization) — equality proves the JSON loop lossless.
    "q209_json_roundtrip" ->
      """WITH h AS (SELECT md5(concat(
        |    COALESCE(CAST(doc_id AS VARCHAR), chr(2)||'NULL'), chr(1),
        |    COALESCE(CAST(lang AS VARCHAR), chr(2)||'NULL'), chr(1),
        |    COALESCE(CAST(n_chars AS VARCHAR), chr(2)||'NULL'), chr(1),
        |    COALESCE(CAST(source AS VARCHAR), chr(2)||'NULL'), chr(1),
        |    COALESCE(CAST(text AS VARCHAR), chr(2)||'NULL'))) AS h
        |  FROM documents)
        |SELECT CAST(('0x'||substr(h,1,4)) AS BIGINT) % 64 AS bucket,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(('0x'||substr(h,5,13)) AS BIGINT)) AS BIGINT) AS checksum
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,

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
