package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Tables => T}
import graft.engine.Exact._

/** Scalar-function and subquery surface — the reference's complete F1-F15
  * function list (SURVEY.md §2.7: parseFloat/parseInt casts, toFixed
  * formatting, capitalization, template-string concat, date arithmetic,
  * Math.max clamps, JSON-in-text reads) plus the subquery shapes the
  * engine must support beyond it.
  *
  * All functions are Spark built-ins (`org.apache.spark.sql.functions`),
  * i.e. codegen'd expressions inside WholeStageCodegen — no UDFs in
  * scalar paths, which is the 100 TB-safe default.
  */
object Scalar {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // String functions: capitalization (F7, render-complete-deploy.js:741),
    // concat (F8 :237), regex extraction (F2 :190-191), casts (F4/F6).
    "q18_string_funcs" -> ((s, dir) => {
      import s.implicits._
      T.part(s, dir)
        .select(
          $"p_partkey",
          upper($"p_name").as("upper_name"),
          // single-token capitalization, the reference's charAt(0).toUpperCase + slice(1)
          concat(upper(substring($"p_name", 1, 1)), substring($"p_name", 2, 1000)).as("cap_name"),
          concat_ws("-", $"p_brand", $"p_type").as("brand_type"),
          length($"p_name").cast("long").as("name_len"),
          regexp_extract($"p_name", "([a-z]+)$", 1).as("last_word"),
          element_at(split($"p_name", " "), 1).as("first_word"),
          regexp_extract($"p_brand", "#([0-9]+)", 1).cast("long").as("brand_num"),
          format_string("$%.2f", $"p_retailprice").as("price_label"),
          $"p_size".cast("string").as("size_str"))
        .orderBy($"p_partkey")
    }),

    // Math / conditional scalars: clamp (F13 :307), floor/ceil, abs,
    // greatest/least, arithmetic (AG3 :216 price × rate).
    "q19_math_funcs" -> ((s, dir) => {
      import s.implicits._
      T.part(s, dir)
        .select(
          $"p_partkey",
          ($"p_retailprice" * 0.10).as("direct_commission"),
          ($"p_retailprice" * 0.05).as("passive_commission"),
          greatest(lit(0.0), $"p_retailprice" - lit(1000.0)).as("clamped_margin"),
          least($"p_retailprice", lit(950.0)).as("capped"),
          floor($"p_retailprice").cast("long").as("floor_price"),
          ceil($"p_retailprice").cast("long").as("ceil_price"),
          abs($"p_size" - 20).cast("long").as("size_dist"),
          pmod($"p_partkey", lit(7L)).as("bucket"),
          sqrt($"p_retailprice").as("sqrt_price"))
        .orderBy($"p_partkey")
    }),

    // DecimalType money mode — the reference schema's decimal(10,2)/
    // (5,4)/(3,2) money columns (render-complete-deploy.js:34-36) as
    // faithful DECIMAL arithmetic. The engine default is double for
    // oracle parity with the testdata (SURVEY.md §1.3); this query
    // demonstrates the production-money alternative: decimal sums are
    // exact and order-independent by construction (no scaled-integer
    // trick needed), and every intermediate is pinned to an explicit
    // (precision, scale) on BOTH engines so Spark's and DuckDB's
    // decimal type-widening rules can't diverge. The only rounding
    // anywhere is the input double→decimal(…,2) cast, which is exact
    // for 2-decimal money values.
    //
    // The FINAL projection casts each decimal aggregate to its
    // canonical string ("253942.00" — scale-many fractional digits,
    // identical text in Spark and DuckDB). The arithmetic stays
    // DECIMAL end-to-end (that is the demo); only the output column
    // is a string, because downstream hashers differ on DECIMAL
    // *representation* (INT128 vs fixed-len-byte-array physical
    // encodings) even when every value is bit-exact.
    "q80_decimal_money" -> ((s, dir) => {
      import s.implicits._
      val qty = $"l_quantity".cast("decimal(12,2)")
      val px = $"l_extendedprice".cast("decimal(12,2)")
      val disc = $"l_discount".cast("decimal(4,2)")
      T.lineitem(s, dir)
        .select($"l_returnflag", $"l_linestatus", qty.as("qty"), px.as("px"),
          (px * (lit(java.math.BigDecimal.valueOf(100L, 2)).cast("decimal(4,2)") - disc))
            .cast("decimal(18,4)").as("disc_px"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"qty").cast("decimal(38,2)").as("sum_qty_dec"),
          sum($"px").cast("decimal(38,2)").as("sum_base_dec"),
          sum($"disc_px").cast("decimal(38,4)").as("sum_disc_dec"),
          count(lit(1)).as("n"))
        .select($"l_returnflag", $"l_linestatus",
          $"sum_qty_dec".cast("string").as("sum_qty"),
          $"sum_base_dec".cast("string").as("sum_base"),
          $"sum_disc_dec".cast("string").as("sum_disc"),
          $"n")
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // Date/time functions: current-ts stamping analog (F9), +1 month
    // subscription expiry (F10 :786-787), display formatting (F11),
    // extraction and day arithmetic.
    "q20_date_funcs" -> ((s, dir) => {
      import s.implicits._
      T.orders(s, dir)
        .select(
          $"o_orderkey",
          year($"o_orderdate").cast("long").as("yr"),
          month($"o_orderdate").cast("long").as("mo"),
          dayofmonth($"o_orderdate").cast("long").as("dom"),
          (dayofweek($"o_orderdate") - 1).cast("long").as("dow"), // 0=Sunday, DuckDB convention
          date_trunc("month", $"o_orderdate").as("month_start"),
          add_months($"o_orderdate", 1).as("expires_at"),          // F10
          last_day($"o_orderdate").as("month_end"),
          datediff(lit("2002-01-01").cast("date"), $"o_orderdate").cast("long").as("days_to_2002"),
          date_format($"o_orderdate", "MM/dd/yyyy").as("display_date")) // F11
        .orderBy($"o_orderkey")
    }),

    // CASE/WHEN, null handling, JSON-in-text extraction (F12/§1.3:
    // payment_details stringified JSON, render-complete-deploy.js:552).
    "q21_case_json" -> ((s, dir) => {
      import s.implicits._
      T.events(s, dir)
        .select(
          $"event_id",
          $"event_type",
          when($"event_type".isin("click", "view"), "engagement")
            .when($"event_type" === "purchase", "revenue")
            .otherwise("other").as("category"),
          coalesce(nullif($"event_type", lit("error")), lit("unknown")).as("safe_type"),
          get_json_object($"props", "$.k").cast("long").as("prop_k"),
          when($"value" < 5.0, "low").when($"value" < 20.0, "mid")
            .otherwise("high").as("value_bucket"))
        .orderBy($"event_id")
    }),

    // Scalar subquery: rows above the (exactly computed) global average —
    // broadcast of a 1-row aggregate against the fact scan.
    "q22_scalar_subquery" -> ((s, dir) => {
      import s.implicits._
      val o = T.orders(s, dir)
      val thresh = o.agg(mavg($"o_totalprice").as("avg_price"))
      o.join(broadcast(thresh))
        .filter($"o_totalprice" > $"avg_price")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),

    // S8: JSON codec round-trip — struct → to_json → from_json → fields.
    // The intermediate JSON string never surfaces (formatting is
    // engine-specific); losslessness is what's verified.
    "q37_json_roundtrip" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      T.events(s, dir)
        .withColumn("js", to_json(struct($"user_id", $"event_type", $"value")))
        .withColumn("rt", from_json($"js", schema))
        .select($"event_id", $"rt.user_id".as("rt_user_id"),
          $"rt.event_type".as("rt_event_type"), $"rt.value".as("rt_value"))
        .orderBy($"event_id")
    }),

    // Semi-structured VARIANT path (Spark 4's shredded binary JSON —
    // the modern form of the reference's stringified-JSON columns,
    // `payment_details`, render-complete-deploy.js:99,:552): parse
    // once into VariantType, then typed path extraction
    // (`variant_get`) instead of per-access string re-parsing. At
    // 100 TB the parse happens at ingest and the binary variant
    // column is columnar-shredded, so `$.k` extraction is a
    // codegen'd byte-offset read, not a JSON tokenizer pass.
    "q96_variant_extract" -> ((s, dir) => {
      import s.implicits._
      T.events(s, dir)
        .select($"event_type",
          variant_get(parse_json($"props"), "$.k", "bigint").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"),
          count(when($"k" > 50L, 1)).as("n_high"))
        .orderBy($"event_type")
    }),

    // P4: timestamp-vs-reference predicate (the reference's
    // `subscription_expires_at > now` check, render-complete-deploy.js:598-599,
    // with a fixed as-of instant for determinism).
    "q38_active_window" -> ((s, dir) => {
      import s.implicits._
      val asOf = lit("2024-01-15 00:00:00").cast("timestamp")
      T.events(s, dir)
        .filter($"ts" > asOf && $"ts" <= lit("2024-01-16 00:00:00").cast("timestamp"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), min($"ts").as("first_ts"), max($"ts").as("last_ts"))
        .orderBy($"event_type")
    }),

    // Correlated EXISTS with extra predicate (beyond q07's plain semi).
    "q23_correlated_exists" -> ((s, dir) => {
      import s.implicits._
      val o = T.orders(s, dir)
      // the >=49 filter keeps ~4% of lineitem; its distinct keys fit a
      // broadcast at bench scale (at true 100 TB this reverts to the
      // default shuffled semi join — drop the hint, AQE decides)
      val big = T.lineitem(s, dir).filter($"l_quantity" >= 49.0)
        .select($"l_orderkey").distinct()
      o.join(broadcast(big), $"o_orderkey" === $"l_orderkey", "left_semi")
        .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
        .orderBy($"o_orderkey")
    }))

  val oracle: Map[String, String] = Map(
    "q96_variant_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(props::JSON->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(props::JSON->>'k' AS BIGINT)) AS min_k,
        |  max(CAST(props::JSON->>'k' AS BIGINT)) AS max_k,
        |  CAST(count(CASE WHEN CAST(props::JSON->>'k' AS BIGINT) > 50
        |    THEN 1 END) AS BIGINT) AS n_high
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q80_decimal_money" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_base,
        |  CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |      AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_disc,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q18_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS upper_name,
        |  concat(upper(substr(p_name,1,1)), substr(p_name,2,1000)) AS cap_name,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  CAST(regexp_extract(p_brand, '#([0-9]+)', 1) AS BIGINT) AS brand_num,
        |  printf('$%.2f', p_retailprice) AS price_label,
        |  CAST(p_size AS VARCHAR) AS size_str
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q19_math_funcs" ->
      """SELECT p_partkey,
        |  p_retailprice * 0.10 AS direct_commission,
        |  p_retailprice * 0.05 AS passive_commission,
        |  greatest(0.0, p_retailprice - 1000.0) AS clamped_margin,
        |  least(p_retailprice, 950.0) AS capped,
        |  CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
        |  CAST(abs(p_size - 20) AS BIGINT) AS size_dist,
        |  p_partkey % 7 AS bucket,
        |  sqrt(p_retailprice) AS sqrt_price
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q20_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
        |  CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS dom,
        |  CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS expires_at,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
        |  strftime(o_orderdate, '%m/%d/%Y') AS display_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q21_case_json" ->
      """SELECT event_id, event_type,
        |  CASE WHEN event_type IN ('click','view') THEN 'engagement'
        |       WHEN event_type = 'purchase' THEN 'revenue'
        |       ELSE 'other' END AS category,
        |  coalesce(nullif(event_type, 'error'), 'unknown') AS safe_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
        |  CASE WHEN value < 5.0 THEN 'low' WHEN value < 20.0 THEN 'mid'
        |       ELSE 'high' END AS value_bucket
        |FROM events ORDER BY event_id""".stripMargin,

    "q22_scalar_subquery" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         |WHERE o_totalprice > (SELECT ${mavgSql("o_totalprice")} FROM orders)
         |ORDER BY o_orderkey""".stripMargin,

    "q37_json_roundtrip" ->
      """SELECT event_id, user_id AS rt_user_id, event_type AS rt_event_type,
        |  value AS rt_value
        |FROM events ORDER BY event_id""".stripMargin,

    "q38_active_window" ->
      """SELECT event_type, count(*) AS n, min(ts) AS first_ts, max(ts) AS last_ts
        |FROM events
        |WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
        |  AND ts <= TIMESTAMP '2024-01-16 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q23_correlated_exists" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
        |ORDER BY o_orderkey""".stripMargin)
}
