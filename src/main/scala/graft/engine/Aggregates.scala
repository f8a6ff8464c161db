package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Aggregator, Window}
import graft.engine.{Tables => T}
import graft.engine.Exact._

/** Aggregation / window / set-op operator surface (SURVEY.md §2.4, §2.8).
  *
  * The reference never issues GROUP BY — it aggregates by mutation
  * (`balance += amount`, render-complete-deploy.js:226-230,:285-289).
  * Here every such mutable accumulation is recomputed as a pure,
  * scalable aggregation: hash agg with map-side partials, window
  * functions for running state, rollup/cube/grouping-sets for the
  * intended-but-unbuilt reporting surface (the reference imports
  * drizzle `sum`/`count` and never calls them, render-complete-deploy.js:16).
  *
  * Scale posture: groupBy keys here are low-cardinality → partial agg
  * collapses almost everything map-side; windows partition by user/
  * customer keys (hash-shuffled once, sorted within partitions — the
  * canonical distributed sessionization layout).
  */
object Aggregates {
  type Q = (SparkSession, String) => DataFrame

  /** Exact weighted average as a typed Aggregator (UDAF surface,
    * SURVEY.md §2.9). Buffer is a pair of exact scaled longs so the
    * merge is associative/commutative — safe under any partitioning. */
  class WeightedAvg extends Aggregator[(Double, Double), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) =
      (b._1 + math.round(in._1 * in._2 * 10000), b._2 + math.round(in._2))
    def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Long, Long)): Double = b._1.toDouble / 10000.0 / b._2.toDouble
    def bufferEncoder = org.apache.spark.sql.Encoders.product[(Long, Long)]
    def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
  }

  val queries: Map[String, Q] = Map(
    // Full scalar-aggregate battery incl. DISTINCT aggregation.
    "q10_multi_agg" -> ((s, dir) => {
      import s.implicits._
      T.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct($"l_orderkey").as("n_orders"),
          min($"l_quantity").as("min_qty"),
          max($"l_extendedprice").as("max_price"),
          avg($"l_quantity").as("avg_qty"), // integer-valued doubles: exact
          msum($"l_extendedprice").as("sum_price"))
        .orderBy($"l_returnflag")
    }),

    // LISTAGG / string_agg — ordered string aggregation (the report
    // column every BI surface asks for). Determinism rule: collect →
    // sort → slice → join, so the string is identical at any
    // parallelism; an unordered string_agg is nondeterministic under
    // shuffle and can never hash-verify. Bounded to the first 5 names
    // per group — at 100 TB an unbounded listagg is an OOM, a bounded
    // one is a grouped top-k.
    "q109_listagg" -> ((s, dir) => {
      import s.implicits._
      T.customer(s, dir)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"),
          concat_ws(",", slice(sort_array(collect_list($"c_name")), 1, 5))
            .as("first_names"))
        .orderBy($"c_mktsegment")
    }),

    // ROLLUP — hierarchical subtotals (region > nation > grand total).
    "q11_rollup" -> ((s, dir) => {
      import s.implicits._
      val c = T.customer(s, dir)
      val n = T.nation(s, dir)
      val r = T.region(s, dir)
      c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_cust"), msum($"c_acctbal").as("total_bal"))
        .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
    }),

    // CUBE — all grouping combinations.
    "q12_cube" -> ((s, dir) => {
      import s.implicits._
      T.orders(s, dir)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), msum($"o_totalprice").as("total"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }),

    // GROUPING SETS + grouping() marker — SQL-only surface in Spark,
    // issued through the engine's SQL entry point.
    "q13_grouping_sets" -> ((s, dir) => {
      T.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
               count(1) AS n, sum(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_flag, g_status, l_returnflag, l_linestatus""")
    }),

    // Ranking windows: row_number (total-ordered), rank/dense_rank
    // (gap semantics on value ties) — top-3 orders per customer.
    "q14_window_rank" -> ((s, dir) => {
      import s.implicits._
      val byPrice = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      val tiesOk = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc)
      T.orders(s, dir)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
          row_number().over(byPrice).cast("long").as("rn"),
          rank().over(tiesOk).cast("long").as("rnk"),
          dense_rank().over(tiesOk).cast("long").as("drnk"))
        .filter($"rn" <= 3)
        .orderBy($"o_custkey", $"rn")
    }),

    // Running balance per user — the pure-dataflow version of the
    // reference's mutable commission_balance (render-complete-deploy.js:228).
    // Exact scaled-long window sum → deterministic at any parallelism.
    "q15_window_running" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events(s, dir)
        .select($"user_id", $"event_id", $"ts", $"value",
          (sum(scaled($"value")).over(w).cast("double") / 10000.0).as("running_balance"))
        .orderBy($"user_id", $"ts", $"event_id")
    }),

    // lag/lead/first_value frame navigation per customer order history.
    "q16_window_lag" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      T.orders(s, dir)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice",
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"),
          first($"o_totalprice").over(w).as("first_price"),
          ($"o_totalprice" - lag($"o_totalprice", 1).over(w)).as("delta"))
        .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
    }),

    // Set operations: INTERSECT / EXCEPT (distinct semantics) + UNION ALL.
    "q17_setops" -> ((s, dir) => {
      import s.implicits._
      val o = T.orders(s, dir)
      val f = o.filter($"o_orderstatus" === "F").select($"o_custkey".as("k")).distinct()
      val p = o.filter($"o_orderstatus" === "O").select($"o_custkey".as("k")).distinct()
      val both  = f.intersect(p).withColumn("tag", lit("both"))
      val fOnly = f.except(p).withColumn("tag", lit("f_only"))
      val pOnly = p.except(f).withColumn("tag", lit("o_only"))
      both.unionByName(fOnly).unionByName(pOnly)
        .select($"tag", $"k")
        .orderBy($"tag", $"k")
    }),

    // UDAF: exact weighted average via typed Aggregator.
    "q25_weighted_avg" -> ((s, dir) => {
      import s.implicits._
      val wavg = udaf(new WeightedAvg)
      T.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(wavg($"l_extendedprice", $"l_quantity").as("wavg_price"))
        .orderBy($"l_returnflag")
    }),

    // Generator/UDTF surface: explode word tokens → top-20 counts.
    "q26_explode_tokens" -> ((s, dir) => {
      import s.implicits._
      T.documents(s, dir)
        .select(explode(split($"text", " ")).as("word"))
        .filter($"word" =!= "")
        .groupBy($"word")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"word")
        .limit(20)
    }),

    // Statistical aggregates: exact interpolated percentiles, stddev,
    // correlation (rounded — co-moment merges are order-sensitive in
    // the last ulps; the round absorbs them).
    "q39_stats" -> ((s, dir) => {
      import s.implicits._
      T.orders(s, dir)
        .groupBy($"o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"),
          round(stddev_samp($"o_totalprice"), 4).as("sd_price"),
          round(corr($"o_totalprice", $"o_custkey"), 6).as("corr_price_cust"))
        .orderBy($"o_orderstatus")
    }),

    // Grouped ordinary-least-squares battery: slope / intercept / R² /
    // means / count per group in ONE aggregation pass — the built-in
    // regr_* functions compute from co-moments exactly like corr (q39),
    // so the same discipline applies: partial-aggregating, scan-speed,
    // and rounded to 6 decimals because co-moment merges reassociate
    // float adds in the last ulps.
    "q120_regression" -> ((s, dir) => {
      import s.implicits._
      T.orders(s, dir)
        .groupBy($"o_orderstatus")
        .agg(
          round(regr_slope($"o_totalprice", $"o_custkey".cast("double")), 6).as("slope"),
          round(regr_intercept($"o_totalprice", $"o_custkey".cast("double")), 6).as("icept"),
          round(regr_r2($"o_totalprice", $"o_custkey".cast("double")), 6).as("r2"),
          round(regr_avgx($"o_totalprice", $"o_custkey".cast("double")), 6).as("ax"),
          round(regr_avgy($"o_totalprice", $"o_custkey".cast("double")), 6).as("ay"),
          regr_count($"o_totalprice", $"o_custkey".cast("double")).as("n"))
        .orderBy($"o_orderstatus")
    }),

    // arg-extremum battery: max_by/min_by — "the row attribute AT the
    // group's extremum" without a join-back or a window sort, the
    // single-pass partial-aggregating form (shuffle carries one
    // candidate per group per partition, not the group's rows).
    // Engines break extremum ties arbitrarily, so the ordering value
    // is a FIXED-WIDTH sortable string (zero-padded scaled price +
    // orderkey) — unique per row, making the winner well-defined and
    // identical in both engines. Scaled-integer `round(p*100)` is
    // exact for 2-decimal money (the Exact discipline).
    "q113_arg_extremum" -> ((s, dir) => {
      import s.implicits._
      val key = format_string("%015d:%012d",
        round($"o_totalprice" * 100).cast("long"), $"o_orderkey")
      T.orders(s, dir)
        .groupBy($"o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          max_by($"o_orderkey", key).as("top_order"),
          max_by($"o_custkey", key).as("top_customer"),
          round(max_by($"o_totalprice", key), 4).as("top_price"),
          min_by($"o_orderkey", key).as("bottom_order"),
          round(min_by($"o_totalprice", key), 4).as("bottom_price"))
        .orderBy($"o_orderpriority")
    }),

    // Conditional-aggregate battery: count_if / bool_or / bool_and /
    // FILTER-style extremum — predicate aggregation WITHOUT a
    // pre-filter scan per predicate (one pass computes all of them;
    // the reference's per-status count endpoints would be N scans).
    // Every aggregate here is order-independent (counts, bools, max),
    // so no float-sum exactness machinery is needed.
    "q115_conditional_aggs" -> ((s, dir) => {
      import s.implicits._
      T.events(s, dir)
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          count_if($"value" > 90.0).as("n_high"),
          bool_or($"value" > 99.5).as("any_crit"),
          bool_and($"value" >= 0.0).as("all_nonneg"),
          max(when($"value" < 10.0, $"value")).as("max_low"),
          min(when($"value" > 100.0, $"value")).as("min_over_100"))
        .orderBy($"event_type")
    }),

    // TPC-H Q3 shape: segment-filtered star join, grouped revenue,
    // top-10 — the canonical "scan big, shuffle small" analytics query.
    "q64_tpch_q3" -> ((s, dir) => {
      import s.implicits._
      val cutoff = lit("1998-01-01 00:00:00").cast("timestamp")
      val c = T.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
      val o = T.orders(s, dir).filter($"o_orderdate" < cutoff)
      val l = T.lineitem(s, dir).filter($"l_shipdate" > cutoff)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(msum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),

    // DISTINCT projection (dropDuplicates surface).
    "q27_distinct_pairs" -> ((s, dir) => {
      import s.implicits._
      T.events(s, dir)
        .select($"user_id", $"event_type")
        .distinct()
        .orderBy($"user_id", $"event_type")
    }))

  val oracle: Map[String, String] = Map(
    "q109_listagg" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  array_to_string(
        |    list_slice(list(c_name ORDER BY c_name), 1, 5), ',') AS first_names
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q10_multi_agg" ->
      s"""SELECT l_returnflag,
         |  count(*) AS n_rows,
         |  count(DISTINCT l_orderkey) AS n_orders,
         |  min(l_quantity) AS min_qty,
         |  max(l_extendedprice) AS max_price,
         |  avg(l_quantity) AS avg_qty,
         |  ${msumSql("l_extendedprice")} AS sum_price
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q11_rollup" ->
      s"""SELECT r_name, n_name, count(*) AS n_cust,
         |  ${msumSql("c_acctbal")} AS total_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name)
         |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q12_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         |  ${msumSql("o_totalprice")} AS total
         |FROM orders
         |GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q13_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        |  count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin,

    "q14_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn,
        |    CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT) AS rnk,
        |    CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT) AS drnk
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q15_window_running" ->
      s"""SELECT user_id, event_id, ts, value,
         |  CAST(sum(${scaledSql("value")}) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/10000.0
         |    AS running_balance
         |FROM events ORDER BY user_id, ts, event_id""".stripMargin,

    "q16_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  o_totalprice - lag(o_totalprice, 1) OVER w AS delta
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q17_setops" ->
      """WITH f AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
        |     p AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
        |SELECT 'both' AS tag, k FROM (SELECT k FROM f INTERSECT SELECT k FROM p) t1
        |UNION ALL
        |SELECT 'f_only' AS tag, k FROM (SELECT k FROM f EXCEPT SELECT k FROM p) t2
        |UNION ALL
        |SELECT 'o_only' AS tag, k FROM (SELECT k FROM p EXCEPT SELECT k FROM f) t3
        |ORDER BY tag, k""".stripMargin,

    "q25_weighted_avg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(round(l_extendedprice*l_quantity*10000) AS BIGINT)) AS DOUBLE)
        |    /10000.0/CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q26_explode_tokens" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |WHERE word <> ''
        |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin,

    "q27_distinct_pairs" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "q39_stats" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
        |  round(stddev_samp(o_totalprice), 4) AS sd_price,
        |  round(corr(o_totalprice, o_custkey), 6) AS corr_price_cust
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q120_regression" ->
      """SELECT o_orderstatus,
        |  round(regr_slope(o_totalprice, CAST(o_custkey AS DOUBLE)), 6) AS slope,
        |  round(regr_intercept(o_totalprice, CAST(o_custkey AS DOUBLE)), 6) AS icept,
        |  round(regr_r2(o_totalprice, CAST(o_custkey AS DOUBLE)), 6) AS r2,
        |  round(regr_avgx(o_totalprice, CAST(o_custkey AS DOUBLE)), 6) AS ax,
        |  round(regr_avgy(o_totalprice, CAST(o_custkey AS DOUBLE)), 6) AS ay,
        |  CAST(regr_count(o_totalprice, CAST(o_custkey AS DOUBLE)) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q113_arg_extremum" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  arg_max(o_orderkey,
        |    printf('%015d:%012d', CAST(round(o_totalprice*100) AS BIGINT), o_orderkey)) AS top_order,
        |  arg_max(o_custkey,
        |    printf('%015d:%012d', CAST(round(o_totalprice*100) AS BIGINT), o_orderkey)) AS top_customer,
        |  round(arg_max(o_totalprice,
        |    printf('%015d:%012d', CAST(round(o_totalprice*100) AS BIGINT), o_orderkey)), 4) AS top_price,
        |  arg_min(o_orderkey,
        |    printf('%015d:%012d', CAST(round(o_totalprice*100) AS BIGINT), o_orderkey)) AS bottom_order,
        |  round(arg_min(o_totalprice,
        |    printf('%015d:%012d', CAST(round(o_totalprice*100) AS BIGINT), o_orderkey)), 4) AS bottom_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q115_conditional_aggs" ->
      """SELECT event_type, count(*) AS n,
        |  count(*) FILTER (WHERE value > 90.0) AS n_high,
        |  bool_or(value > 99.5) AS any_crit,
        |  bool_and(value >= 0.0) AS all_nonneg,
        |  max(value) FILTER (WHERE value < 10.0) AS max_low,
        |  min(value) FILTER (WHERE value > 100.0) AS min_over_100
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q64_tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  ${msumSql("l_extendedprice*(1.0-l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)
}
