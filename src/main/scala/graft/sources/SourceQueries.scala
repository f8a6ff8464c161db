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
      val out = graft.engine.Scratch.dir(s, "json_rt", dir)
      graft.engine.Tables.documents(s, dir)
        .select($"doc_id", $"lang", $"source", $"n_chars", $"text")
        .write.mode("overwrite").json(out)
      val back = s.read
        .schema("doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT, text STRING")
        .json(out)
      graft.engine.Maintenance.tableChecksum(back, buckets = 64)
        .orderBy($"bucket")
    }),

    // CSV sink/source ROUNDTRIP with the same checksum discipline as
    // q209: write the CSV-safe (integer + single-char string) slice of
    // lineitem with a header, read it back through an explicit schema,
    // checksum the read-back rows vs the oracle's checksum of the
    // ORIGINAL parquet rows. CSV is the interchange format most
    // exposed to quoting/type-inference bugs — the explicit read
    // schema (never inferSchema, which would scan the data twice and
    // guess) and the hash equality are the production contract.
    // Doubles are deliberately excluded: CSV renders them as decimal
    // strings and the render is not part of this roundtrip's claim
    // (q18/q80 own numeric formatting).
    "q235_csv_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val out = graft.engine.Scratch.dir(s, "csv_rt", dir)
      graft.engine.Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_partkey", $"l_suppkey",
          $"l_linenumber".cast("long").as("l_linenumber"),
          $"l_quantity".cast("long").as("l_quantity"),
          $"l_returnflag", $"l_linestatus")
        .write.mode("overwrite").option("header", "true").csv(out)
      val back = s.read.option("header", "true")
        .schema("l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, l_linenumber BIGINT, l_quantity BIGINT, l_returnflag STRING, l_linestatus STRING")
        .csv(out)
      graft.engine.Maintenance.tableChecksum(back, buckets = 64)
        .orderBy($"bucket")
    }),

    // Parquet SCHEMA EVOLUTION: two writer generations land in the
    // same logical table — v1 wrote (doc_id, lang), v2 added n_chars —
    // and `mergeSchema=true` reconciles the footers at read time,
    // null-filling the missing column for v1 files. The aggregate
    // exercises exactly the contract a lakehouse needs: counts see
    // every generation, the evolved column aggregates over only the
    // files that carry it. Scale shape: schema merge is a FOOTER
    // operation (one per file, driver-side union), the scan itself
    // stays columnar and pruned — evolution costs nothing per row.
    "q236_schema_evolution" -> ((s, dir) => {
      import s.implicits._
      val base = graft.engine.Scratch.dir(s, "schevo", dir)
      val docs = graft.engine.Tables.documents(s, dir)
      docs.filter($"doc_id" % 2 === 0).select($"doc_id", $"lang")
        .write.mode("overwrite").parquet(s"$base/v1")
      docs.filter($"doc_id" % 2 === 1).select($"doc_id", $"lang", $"n_chars")
        .write.mode("overwrite").parquet(s"$base/v2")
      s.read.option("mergeSchema", "true").parquet(s"$base/v1", s"$base/v2")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          count($"n_chars").as("n_with_chars"),
          sum($"n_chars").as("sum_chars"))
        .orderBy($"lang")
    }),

    // ORC sink/source ROUNDTRIP — the third interchange format (after
    // JSON q209 and CSV q235), same lossless-by-checksum proof over
    // the identical documents projection so the three formats are
    // directly comparable. ORC shares parquet's columnar posture
    // (stripe statistics, predicate pushdown) so it is the drop-in
    // alternative when an existing warehouse is ORC-resident.
    "q237_orc_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val out = graft.engine.Scratch.dir(s, "orc_rt", dir)
      graft.engine.Tables.documents(s, dir)
        .select($"doc_id", $"lang", $"source", $"n_chars", $"text")
        .write.mode("overwrite").orc(out)
      val back = s.read
        .schema("doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT, text STRING")
        .orc(out)
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
        |  CAST(((sum(CAST(('0x'||substr(h,5,13)) AS BIGINT) // 67108864) % 67108864)
        |      * 67108864
        |      + sum(CAST(('0x'||substr(h,5,13)) AS BIGINT) % 67108864))
        |    % 4503599627370496 AS BIGINT) AS checksum
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,

    // Checksum of the ORIGINAL lineitem slice (sorted-name column
    // order, chr(1) separators, chr(2)-marked nulls — q116's
    // machinery): equality proves the CSV write→read loop lossless.
    "q235_csv_roundtrip" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_partkey, l_suppkey,
        |    CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |    CAST(l_quantity AS BIGINT) AS l_quantity,
        |    l_returnflag, l_linestatus
        |  FROM lineitem),
        |h AS (SELECT md5(concat(
        |    COALESCE(CAST(l_linenumber AS VARCHAR), chr(2)||'NULL'), chr(1),
        |    COALESCE(CAST(l_linestatus AS VARCHAR), chr(2)||'NULL'), chr(1),
        |    COALESCE(CAST(l_orderkey AS VARCHAR), chr(2)||'NULL'), chr(1),
        |    COALESCE(CAST(l_partkey AS VARCHAR), chr(2)||'NULL'), chr(1),
        |    COALESCE(CAST(l_quantity AS VARCHAR), chr(2)||'NULL'), chr(1),
        |    COALESCE(CAST(l_returnflag AS VARCHAR), chr(2)||'NULL'), chr(1),
        |    COALESCE(CAST(l_suppkey AS VARCHAR), chr(2)||'NULL'))) AS h
        |  FROM src)
        |SELECT CAST(('0x'||substr(h,1,4)) AS BIGINT) % 64 AS bucket,
        |  count(*) AS n_rows,
        |  CAST(((sum(CAST(('0x'||substr(h,5,13)) AS BIGINT) // 67108864) % 67108864)
        |      * 67108864
        |      + sum(CAST(('0x'||substr(h,5,13)) AS BIGINT) % 67108864))
        |    % 4503599627370496 AS BIGINT) AS checksum
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,

    // Replays the generation split (doc_id parity) over the one
    // original table: v1 rows (even) carry no n_chars, so the evolved
    // column aggregates under a parity guard.
    "q236_schema_evolution" ->
      """SELECT lang, count(*) AS n_docs,
        |  count(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS n_with_chars,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // Identical claim and arithmetic as q209, over the ORC loop.
    "q237_orc_roundtrip" ->
      """WITH h AS (SELECT md5(concat(
        |    COALESCE(CAST(doc_id AS VARCHAR), chr(2)||'NULL'), chr(1),
        |    COALESCE(CAST(lang AS VARCHAR), chr(2)||'NULL'), chr(1),
        |    COALESCE(CAST(n_chars AS VARCHAR), chr(2)||'NULL'), chr(1),
        |    COALESCE(CAST(source AS VARCHAR), chr(2)||'NULL'), chr(1),
        |    COALESCE(CAST(text AS VARCHAR), chr(2)||'NULL'))) AS h
        |  FROM documents)
        |SELECT CAST(('0x'||substr(h,1,4)) AS BIGINT) % 64 AS bucket,
        |  count(*) AS n_rows,
        |  CAST(((sum(CAST(('0x'||substr(h,5,13)) AS BIGINT) // 67108864) % 67108864)
        |      * 67108864
        |      + sum(CAST(('0x'||substr(h,5,13)) AS BIGINT) % 67108864))
        |    % 4503599627370496 AS BIGINT) AS checksum
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
