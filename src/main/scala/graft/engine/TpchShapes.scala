package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Tables => T}
import graft.engine.Exact._

/** The remaining classic TPC-H query shapes (Q4, Q7, Q13, Q15, Q19,
  * Q22, plus partsupp-free adaptations of Q2 and Q11), each
  * decorrelated Spark-first and oracle-verified bit-exact.
  *
  * Together with q01 (Q1), q64 (Q3), q05 (Q5 shape), q242 (Q17),
  * q65 (Q18), q244 (Q20) and q243 (Q21) this closes out the TPC-H
  * shape family the reference's admin reporting surface implies
  * (render-complete-deploy.js:693-696 status rollups are Q4/Q13-class
  * EXISTS/outer-join-histogram shapes; the commission "top earner"
  * views are Q15-class argmax reports).
  *
  * Schema notes: the synthetic star schema carries no partsupp,
  * commit/receipt dates, phone, or container columns, so
  *  - Q4's "receipt later than commit" becomes "shipped >90 days
  *    after the order date" (identical EXISTS-semi shape),
  *  - Q2/Q11's partsupp is replaced by the OBSERVED supply table
  *    (distinct (part, supplier) pairs from lineitem with min/total
  *    observed line price) — the same nested-min / global-threshold
  *    shapes over a derived two-key rollup,
  *  - Q22's country-code prefix becomes the market segment.
  * All money math rides the [[Exact]] scaled-integer discipline; the
  * share/threshold compares (Q11, Q22, Q17-class) are pure integer
  * predicates with no float boundary at any scale.
  */
object TpchShapes {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // TPC-H Q4 (order priority checking): orders in one year with at
    // least one late line, counted by priority. The EXISTS subquery
    // is a left-semi join whose non-equi part (ship > order + 90 d)
    // rides along with the orderkey equi-key, so it stays a hash
    // join, never a nested loop; the date filter prunes orders
    // before the join (at 100 TB that is the partition-pruning
    // column) and only (orderkey, shipdate) is read from lineitem.
    "q249_tpch_q4" -> ((s, dir) => {
      import s.implicits._
      val o = T.orders(s, dir)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      val l = T.lineitem(s, dir).select($"l_orderkey", $"l_shipdate")
      o.join(l, $"o_orderkey" === $"l_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    }),

    // TPC-H Q7 (volume shipping between two nations): revenue flowing
    // supplier-nation → customer-nation for one nation pair, by ship
    // year. Both endpoint dimensions are FILTERED to the pair before
    // touching lineitem (2/25 selectivity reaches the fact scan via
    // the broadcast hash join's runtime side), nation is broadcast,
    // and the pair predicate is applied on the two small joined
    // dimensions — lineitem is scanned once, three narrow columns.
    "q250_tpch_q7" -> ((s, dir) => {
      import s.implicits._
      val nat = T.nation(s, dir)
        .filter($"n_name".isin("NATION_18", "NATION_19"))
        .select($"n_nationkey", $"n_name")
      val cust = T.customer(s, dir)
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"n_name".as("cust_nation"))
      val supp = T.supplier(s, dir)
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("supp_nation"))
      val l = T.lineitem(s, dir).select($"l_orderkey", $"l_suppkey",
        scaled($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev_s"),
        year($"l_shipdate").cast("long").as("l_year"))
      l.join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
        .join(T.orders(s, dir).select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .filter(($"supp_nation" === "NATION_18" && $"cust_nation" === "NATION_19") ||
          ($"supp_nation" === "NATION_19" && $"cust_nation" === "NATION_18"))
        .groupBy($"supp_nation", $"cust_nation", $"l_year")
        .agg((sum($"rev_s").cast("double") / lit(10000.0)).as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    }),

    // TPC-H Q13 (customer order-count distribution): the outer-join-
    // then-histogram shape — every customer keeps a row (count = 0
    // for the order-less), the ON-clause filter excludes urgent
    // orders WITHOUT dropping customers, and the second rollup is
    // over the tiny count domain. Two shuffles (custkey, then
    // c_count); both keys grow with data / stay bounded respectively.
    "q251_tpch_q13" -> ((s, dir) => {
      import s.implicits._
      val o = T.orders(s, dir)
        .filter($"o_orderpriority" =!= "1-URGENT")
        .select($"o_custkey")
      T.customer(s, dir).select($"c_custkey")
        .join(o, $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_custkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    }),

    // TPC-H Q15 (top supplier): per-supplier quarter revenue, then
    // the suppliers achieving the GLOBAL max. The max is a 1-row
    // aggregate broadcast back (never an unpartitioned window over
    // the rollup), and the equality compare runs on exact revenue
    // cents (BIGINT), so "equals the max" has no float boundary.
    "q252_tpch_q15" -> ((s, dir) => {
      import s.implicits._
      val rev = T.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
        .groupBy($"l_suppkey")
        .agg(sum(scaled($"l_extendedprice" * (lit(1.0) - $"l_discount")))
          .as("rev_s"))
      val top = rev.agg(max($"rev_s").as("max_s"))
      rev.crossJoin(broadcast(top))
        .filter($"rev_s" === $"max_s")
        .join(broadcast(T.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name",
          ($"rev_s".cast("double") / lit(10000.0)).as("total_revenue"))
        .orderBy($"s_suppkey")
    }),

    // TPC-H Q19 (disjunctive predicate revenue): three OR'd
    // brand/size/quantity conjunctions. The part-side conjuncts
    // (brand, size) prune the broadcast dimension; the residual OR
    // evaluates post-join as codegen'd predicates. The point of the
    // shape: a disjunction over join-partitioned attributes stays ONE
    // scan + ONE broadcast join, not a UNION of three plans.
    "q253_tpch_q19" -> ((s, dir) => {
      import s.implicits._
      val p = T.part(s, dir)
        .filter(($"p_brand" === "Brand#12" && $"p_size".between(1, 5)) ||
          ($"p_brand" === "Brand#23" && $"p_size".between(1, 10)) ||
          ($"p_brand" === "Brand#34" && $"p_size".between(1, 15)))
        .select($"p_partkey", $"p_brand", $"p_size")
      val l = T.lineitem(s, dir).select($"l_partkey",
        $"l_quantity".cast("long").as("qty"),
        scaled($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev_s"))
      l.join(broadcast(p), $"l_partkey" === $"p_partkey")
        .filter(($"p_brand" === "Brand#12" && $"qty".between(1L, 11L)) ||
          ($"p_brand" === "Brand#23" && $"qty".between(10L, 20L)) ||
          ($"p_brand" === "Brand#34" && $"qty".between(20L, 30L)))
        .agg((sum($"rev_s").cast("double") / lit(10000.0)).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q22 (global-average threshold + anti-join): customers
    // richer than the average POSITIVE balance with no RECENT order
    // (the generator gives every customer at least one order ever, so
    // the classic "never ordered" is vacuous on this data — "inactive
    // since 2000" keeps the identical anti-join shape non-empty),
    // rolled up by segment (the schema's stand-in for the phone
    // country code). The threshold compare is exact integers
    // (bal_cents · n > Σcents — the q242 device), the 1-row
    // aggregate is broadcast, and the inactivity is a left-anti hash
    // join on the customer key over the date-pruned orders scan.
    "q254_tpch_q22" -> ((s, dir) => {
      import s.implicits._
      val c = T.customer(s, dir).select($"c_custkey", $"c_mktsegment",
        scaled($"c_acctbal").as("bal_s"))
      val thr = c.filter($"bal_s" > 0L)
        .agg(sum($"bal_s").as("tot"), count(lit(1)).as("n"))
      // bal_cents · n is a count-scaled product: widen BEFORE the
      // multiply (the q232/ADVICE rule) so it can't wrap at any sf.
      c.crossJoin(broadcast(thr))
        .filter($"bal_s".cast("decimal(38,0)") * $"n" >
          $"tot".cast("decimal(38,0)"))
        .join(T.orders(s, dir)
            .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
            .select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("numcust"),
          (sum($"bal_s").cast("double") / lit(10000.0)).as("totacctbal"))
        .orderBy($"c_mktsegment")
    }),

    // TPC-H Q2 shape (min-cost supplier per part) over the OBSERVED
    // supply table: cheapest line price each EUROPE supplier ever
    // quoted per part, then per part the argmin supplier. The
    // correlated MIN subquery decorrelates to one (part, supplier)
    // rollup + one per-part min(struct(cost, suppkey)) — a single
    // extra shuffle on the part key, no window sort, deterministic
    // tie-break by supplier key baked into the struct ordering. The
    // eligible-supplier filter (region) reduces lineitem via a
    // broadcast semi before any rollup; the part filter (size = 15)
    // prunes before the argmin, mirroring Q2's "for each qualifying
    // part".
    "q255_tpch_q2" -> ((s, dir) => {
      import s.implicits._
      val eur = T.supplier(s, dir)
        .join(broadcast(T.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(T.region(s, dir)), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "EUROPE")
        .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
      val pts = T.part(s, dir).filter($"p_size" === 15)
        .select($"p_partkey", $"p_type")
      val supply = T.lineitem(s, dir)
        .join(broadcast(pts.select($"p_partkey".as("pk"))),
          $"l_partkey" === $"pk")
        .join(broadcast(eur.select($"s_suppkey".as("sk"))),
          $"l_suppkey" === $"sk")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(min(scaled($"l_extendedprice")).as("cost_s"))
      val best = supply.groupBy($"l_partkey")
        .agg(min(struct($"cost_s", $"l_suppkey")).as("m"))
        .select($"l_partkey", $"m.cost_s".as("cost_s"),
          $"m.l_suppkey".as("best_supp"))
      best.join(broadcast(eur), $"best_supp" === $"s_suppkey")
        .join(broadcast(pts), $"l_partkey" === $"p_partkey")
        .select($"s_acctbal", $"s_name", $"n_name",
          $"l_partkey".as("p_partkey"), $"p_type",
          ($"cost_s".cast("double") / lit(10000.0)).as("min_cost"))
        .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
        .limit(100)
    }),

    // TPC-H Q11 shape (important stock) over the observed supply:
    // per-part total line value from ONE nation's suppliers, keeping
    // parts whose value exceeds 1/10000 of that nation's total — the
    // nested global-threshold aggregate. The global total is a 1-row
    // broadcast, and the share predicate is pure integers
    // (value_cents · 10000 > total_cents): no float at any scale.
    "q256_tpch_q11" -> ((s, dir) => {
      import s.implicits._
      val supp = T.supplier(s, dir)
        .join(broadcast(T.nation(s, dir).filter($"n_name" === "NATION_3")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey")
      val value = T.lineitem(s, dir)
        .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
        .groupBy($"l_partkey")
        .agg(sum(scaled($"l_extendedprice")).as("value_s"))
      val tot = value.agg(sum($"value_s").as("tot_s"))
      value.crossJoin(broadcast(tot))
        .filter($"value_s" * lit(10000L) > $"tot_s")
        .select($"l_partkey",
          ($"value_s".cast("double") / lit(10000.0)).as("value"))
        .orderBy($"value".desc, $"l_partkey")
    }))

  val oracle: Map[String, String] = Map(
    "q249_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q250_tpch_q7" ->
      s"""WITH l AS (
         |  SELECT l_orderkey, l_suppkey,
         |    ${scaledSql("l_extendedprice*(1.0-l_discount)")} AS rev_s,
         |    CAST(year(l_shipdate) AS BIGINT) AS l_year
         |  FROM lineitem)
         |SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, l_year,
         |  CAST(sum(rev_s) AS DOUBLE)/10000.0 AS revenue
         |FROM l
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |WHERE (sn.n_name = 'NATION_18' AND cn.n_name = 'NATION_19')
         |   OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_18')
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q251_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_custkey) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q252_tpch_q15" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    CAST(sum(${scaledSql("l_extendedprice*(1.0-l_discount)")})
         |      AS BIGINT) AS rev_s
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name,
         |  CAST(rev_s AS DOUBLE)/10000.0 AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE rev_s = (SELECT max(rev_s) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q253_tpch_q19" ->
      s"""SELECT CAST(sum(rev_s) AS DOUBLE)/10000.0 AS revenue,
         |  count(*) AS n_lines
         |FROM (
         |  SELECT ${scaledSql("l_extendedprice*(1.0-l_discount)")} AS rev_s
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |         AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 11)
         |     OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |         AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20)
         |     OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
         |         AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 30))""".stripMargin,

    "q254_tpch_q22" ->
      s"""WITH c AS (
         |  SELECT c_custkey, c_mktsegment,
         |    ${scaledSql("c_acctbal")} AS bal_s
         |  FROM customer),
         |thr AS (SELECT CAST(sum(bal_s) AS BIGINT) AS tot,
         |               count(*) AS n FROM c WHERE bal_s > 0)
         |SELECT c_mktsegment, count(*) AS numcust,
         |  CAST(sum(bal_s) AS DOUBLE)/10000.0 AS totacctbal
         |FROM c, thr
         |WHERE CAST(bal_s AS HUGEINT) * n > CAST(tot AS HUGEINT)
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q255_tpch_q2" ->
      s"""WITH eur AS (
         |  SELECT s_suppkey, s_name, s_acctbal, n_name
         |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'EUROPE'),
         |pts AS (SELECT p_partkey, p_type FROM part WHERE p_size = 15),
         |supply AS (
         |  SELECT l_partkey, l_suppkey,
         |    min(${scaledSql("l_extendedprice")}) AS cost_s
         |  FROM lineitem
         |  JOIN pts ON l_partkey = p_partkey
         |  JOIN eur ON l_suppkey = s_suppkey
         |  GROUP BY 1, 2),
         |best AS (
         |  SELECT l_partkey, cost_s, l_suppkey AS best_supp
         |  FROM supply
         |  QUALIFY row_number() OVER (PARTITION BY l_partkey
         |                             ORDER BY cost_s, l_suppkey) = 1)
         |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, p_type,
         |  CAST(cost_s AS DOUBLE)/10000.0 AS min_cost
         |FROM best JOIN eur ON best_supp = s_suppkey
         |JOIN pts ON l_partkey = p_partkey
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin,

    "q256_tpch_q11" ->
      s"""WITH v AS (
         |  SELECT l_partkey,
         |    CAST(sum(${scaledSql("l_extendedprice")}) AS BIGINT) AS value_s
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_3'
         |  GROUP BY 1)
         |SELECT l_partkey, CAST(value_s AS DOUBLE)/10000.0 AS value
         |FROM v
         |WHERE value_s * 10000 > (SELECT CAST(sum(value_s) AS BIGINT) FROM v)
         |ORDER BY value DESC, l_partkey""".stripMargin)
}
