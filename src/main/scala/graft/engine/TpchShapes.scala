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
    // (value_cents · 10000 > total_cents) widened to decimal(38,0)
    // BEFORE the multiply (q232/q226 rule: an unwidened Long product
    // wraps silently in Spark but errors in DuckDB at large sf):
    // no float and no overflow at any scale.
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
        .filter($"value_s".cast("decimal(38,0)") * lit(10000L) >
          $"tot_s".cast("decimal(38,0)"))
        .select($"l_partkey",
          ($"value_s".cast("double") / lit(10000.0)).as("value"))
        .orderBy($"value".desc, $"l_partkey")
    }),

    // TPC-H Q6 (forecast revenue change): the pure scan-filter-agg —
    // a year of shipments, a discount band, small quantities, ONE
    // aggregate row. The whole query is a single parquet scan with
    // every predicate pushed/codegen'd and a map-side-combined sum:
    // the cheapest possible shape at any scale, and the canonical
    // "did the filters reach the scan" probe.
    "q258_tpch_q6" -> ((s, dir) => {
      import s.implicits._
      T.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          $"l_discount" >= lit(0.04) && $"l_discount" <= lit(0.06) &&
          $"l_quantity" < lit(24.0))
        .agg(msum($"l_extendedprice" * $"l_discount").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q14 (promotion effect): the conditional-share aggregate —
    // promo revenue over total revenue for one month, both sums in
    // exact cents from ONE joined pass, the share as an integer
    // micro-unit floor division with decimal-widened factors (the
    // q226 device — no float boundary, no overflow at any sf).
    "q259_tpch_q14" -> ((s, dir) => {
      import s.implicits._
      T.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1996-09-01").cast("timestamp") &&
          $"l_shipdate" < lit("1996-10-01").cast("timestamp"))
        .join(broadcast(T.part(s, dir).select($"p_partkey", $"p_type")),
          $"l_partkey" === $"p_partkey")
        .select(scaled($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .as("rev_s"), ($"p_type" === "PROMO").as("promo"))
        .agg(sum(when($"promo", $"rev_s").otherwise(0L)).as("pr"),
          sum($"rev_s").as("tr"))
        .select(($"pr".cast("double") / lit(10000.0)).as("promo_rev"),
          ($"tr".cast("double") / lit(10000.0)).as("total_rev"),
          expr("(CAST(pr AS DECIMAL(38,0)) * 1000000) div tr")
            .as("promo_share_micro"))
    }),

    // TPC-H Q10 (returned-item reporting): top 20 customers by
    // revenue lost to returns in one quarter. The rollup key is the
    // customer key (grows with data), nation is broadcast, and the
    // top-k orders on EXACT revenue cents (BIGINT — deterministic
    // ties) planning as TakeOrderedAndProject, never a global sort.
    "q260_tpch_q10" -> ((s, dir) => {
      import s.implicits._
      val rev = T.lineitem(s, dir)
        .filter($"l_returnflag" === "R" &&
          $"l_shipdate" >= lit("1996-07-01").cast("timestamp") &&
          $"l_shipdate" < lit("1996-10-01").cast("timestamp"))
        .join(T.orders(s, dir).select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_custkey")
        .agg(sum(scaled($"l_extendedprice" * (lit(1.0) - $"l_discount")))
          .as("rev_s"))
      rev.join(T.customer(s, dir), $"o_custkey" === $"c_custkey")
        .join(broadcast(T.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"c_name", $"n_name", $"c_acctbal",
          $"rev_s", ($"rev_s".cast("double") / lit(10000.0)).as("revenue"))
        .orderBy($"rev_s".desc, $"c_custkey")
        .limit(20)
    }),

    // TPC-H Q8 (national market share): of the revenue ASIA customers
    // spent, the fraction supplied by one nation, by order year —
    // BOTH sums come from the same grouped pass (a conditional sum,
    // not a second scan), and the share is the decimal-widened
    // integer micro division. The selective dimensions (region-
    // filtered customers, the supplier→nation map) reduce before the
    // fact join; nation/region/supplier sides broadcast.
    "q261_tpch_q8" -> ((s, dir) => {
      import s.implicits._
      val asiaCust = T.customer(s, dir)
        .join(broadcast(T.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(T.region(s, dir)), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "ASIA")
        .select($"c_custkey")
      val suppNat = T.supplier(s, dir)
        .join(broadcast(T.nation(s, dir)
            .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))),
          $"s_nationkey" === $"sn_key")
        .select($"s_suppkey", $"supp_nation")
      T.lineitem(s, dir)
        .join(T.orders(s, dir).select($"o_orderkey", $"o_custkey",
          year($"o_orderdate").cast("long").as("o_year")),
          $"l_orderkey" === $"o_orderkey")
        .join(asiaCust, $"o_custkey" === $"c_custkey", "left_semi")
        .join(broadcast(suppNat), $"l_suppkey" === $"s_suppkey")
        .select($"o_year", $"supp_nation",
          scaled($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev_s"))
        .groupBy($"o_year")
        .agg(sum(when($"supp_nation" === "NATION_5", $"rev_s").otherwise(0L))
          .as("nat_s"), sum($"rev_s").as("tot_s"))
        .select($"o_year",
          ($"nat_s".cast("double") / lit(10000.0)).as("nation_rev"),
          ($"tot_s".cast("double") / lit(10000.0)).as("total_rev"),
          expr("(CAST(nat_s AS DECIMAL(38,0)) * 1000000) div tot_s")
            .as("mkt_share_micro"))
        .orderBy($"o_year")
    }),

    // TPC-H Q9 (product-type profit): profit per supplier nation per
    // order year over one part family. The schema has no partsupp
    // supply cost, so cost = 0.8 · retail price · quantity (≤4
    // decimals — the scaled-integer sum stays exact, including
    // negative-profit lines). Part and supplier→nation dimensions
    // broadcast; the rollup key (nation × year) is tiny, the work is
    // the one fact scan.
    "q262_tpch_q9" -> ((s, dir) => {
      import s.implicits._
      val widget = T.part(s, dir)
        .filter($"p_name".contains("widget"))
        .select($"p_partkey", $"p_retailprice")
      val suppNat = T.supplier(s, dir)
        .join(broadcast(T.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name")
      T.lineitem(s, dir)
        .join(broadcast(widget), $"l_partkey" === $"p_partkey")
        .join(broadcast(suppNat), $"l_suppkey" === $"s_suppkey")
        .join(T.orders(s, dir).select($"o_orderkey",
          year($"o_orderdate").cast("long").as("o_year")),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"n_name", $"o_year")
        .agg(msum($"l_extendedprice" * (lit(1.0) - $"l_discount") -
          lit(0.8) * $"p_retailprice" * $"l_quantity").as("profit"),
          count(lit(1)).as("n_lines"))
        .orderBy($"n_name", $"o_year".desc)
    }),

    // TPC-H Q12 (shipping-delay priority audit): the CASE-sum shape —
    // per lateness bucket (shipped ≤/> 90 days after ordering), how
    // many lines carried urgent priorities vs not. One fact join, one
    // 2-row rollup, both counts conditional sums in the same pass.
    // (The schema has no ship mode; lateness is the derived dimension.)
    "q263_tpch_q12" -> ((s, dir) => {
      import s.implicits._
      T.lineitem(s, dir).select($"l_orderkey", $"l_shipdate")
        .join(T.orders(s, dir)
            .select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
          $"l_orderkey" === $"o_orderkey")
        .select(when($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"),
          lit("LATE")).otherwise(lit("ONTIME")).as("bucket"),
          $"o_orderpriority".isin("1-URGENT", "2-HIGH").as("high"))
        .groupBy($"bucket")
        .agg(sum(when($"high", 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!$"high", 1L).otherwise(0L)).as("low_line_count"))
        .orderBy($"bucket")
    }),

    // TPC-H Q16 (supplier relationship count) over the observed
    // supply: distinct suppliers per (brand, type, size) for parts
    // outside one brand and inside a size set, excluding a
    // deterministic complaint blacklist (suppkey ≡ 0 mod 7 — the
    // schema carries no comment text) via a broadcast anti-join. The
    // count-distinct shuffles on the (brand, type, size) rollup key;
    // the supply pairs come from the fact scan, deduplicated by the
    // rollup itself.
    "q264_tpch_q16" -> ((s, dir) => {
      import s.implicits._
      val pts = T.part(s, dir)
        .filter($"p_brand" =!= "Brand#23" &&
          $"p_size".isin(1, 5, 10, 15, 20, 25))
        .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
      val blacklist = T.supplier(s, dir)
        .filter($"s_suppkey" % 7 === 0).select($"s_suppkey")
      T.lineitem(s, dir).select($"l_partkey", $"l_suppkey")
        .join(broadcast(pts), $"l_partkey" === $"p_partkey")
        .join(broadcast(blacklist), $"l_suppkey" === $"s_suppkey",
          "left_anti")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
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
         |WHERE CAST(value_s AS HUGEINT) * 10000
         |      > (SELECT CAST(sum(value_s) AS HUGEINT) FROM v)
         |ORDER BY value DESC, l_partkey""".stripMargin,

    "q258_tpch_q6" ->
      s"""SELECT ${msumSql("l_extendedprice*l_discount")} AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount >= 0.04 AND l_discount <= 0.06
         |  AND l_quantity < 24.0""".stripMargin,

    "q259_tpch_q14" ->
      s"""WITH l AS (
         |  SELECT ${scaledSql("l_extendedprice*(1.0-l_discount)")} AS rev_s,
         |    p_type = 'PROMO' AS promo
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
         |    AND l_shipdate < TIMESTAMP '1996-10-01'),
         |a AS (
         |  SELECT CAST(sum(CASE WHEN promo THEN rev_s ELSE 0 END) AS BIGINT)
         |      AS pr,
         |    CAST(sum(rev_s) AS BIGINT) AS tr
         |  FROM l)
         |SELECT CAST(pr AS DOUBLE)/10000.0 AS promo_rev,
         |  CAST(tr AS DOUBLE)/10000.0 AS total_rev,
         |  CAST((CAST(pr AS HUGEINT) * 1000000) // tr AS BIGINT)
         |    AS promo_share_micro
         |FROM a""".stripMargin,

    "q260_tpch_q10" ->
      s"""WITH rev AS (
         |  SELECT o_custkey,
         |    CAST(sum(${scaledSql("l_extendedprice*(1.0-l_discount)")})
         |      AS BIGINT) AS rev_s
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE l_returnflag = 'R'
         |    AND l_shipdate >= TIMESTAMP '1996-07-01'
         |    AND l_shipdate < TIMESTAMP '1996-10-01'
         |  GROUP BY 1)
         |SELECT c_custkey, c_name, n_name, c_acctbal, rev_s,
         |  CAST(rev_s AS DOUBLE)/10000.0 AS revenue
         |FROM rev JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |ORDER BY rev_s DESC, c_custkey LIMIT 20""".stripMargin,

    "q261_tpch_q8" ->
      s"""WITH j AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    sn.n_name AS supp_nation,
         |    ${scaledSql("l_extendedprice*(1.0-l_discount)")} AS rev_s
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation sn ON s_nationkey = sn.n_nationkey
         |  WHERE EXISTS (
         |    SELECT 1 FROM customer
         |    JOIN nation cn ON c_nationkey = cn.n_nationkey
         |    JOIN region ON cn.n_regionkey = r_regionkey
         |    WHERE c_custkey = o_custkey AND r_name = 'ASIA')),
         |a AS (
         |  SELECT o_year,
         |    CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev_s
         |             ELSE 0 END) AS BIGINT) AS nat_s,
         |    CAST(sum(rev_s) AS BIGINT) AS tot_s
         |  FROM j GROUP BY 1)
         |SELECT o_year,
         |  CAST(nat_s AS DOUBLE)/10000.0 AS nation_rev,
         |  CAST(tot_s AS DOUBLE)/10000.0 AS total_rev,
         |  CAST((CAST(nat_s AS HUGEINT) * 1000000) // tot_s AS BIGINT)
         |    AS mkt_share_micro
         |FROM a ORDER BY o_year""".stripMargin,

    "q262_tpch_q9" ->
      s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  ${msumSql("l_extendedprice*(1.0-l_discount) - 0.8*p_retailprice*l_quantity")}
         |    AS profit,
         |  count(*) AS n_lines
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%widget%'
         |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin,

    "q263_tpch_q12" ->
      """SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |       THEN 'LATE' ELSE 'ONTIME' END AS bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q264_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#23'
        |  AND p_size IN (1, 5, 10, 15, 20, 25)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
}
