package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Tables => T}

/** Remaining reference-specific shapes (SURVEY.md §2.1/§2.7):
  * deterministic code generation (F1), upload-filename synthesis +
  * extension split (F2), merge-style update views (S5), and the
  * nested eager-load projection (J1's `with: {package}` shape).
  */
object RefShapes {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // F1: the reference generates random 8-char [A-Z0-9] gift codes
    // (render-complete-deploy.js:198-205). Engine version is
    // deterministic — keyed sha2 — so codes are reproducible, unique
    // w.h.p., and oracle-checkable. F2: multer's unique filename
    // (field + timestamp + random + original extension, :190-191)
    // becomes a keyed hash + regex extension split.
    "q34_code_gen" -> ((s, dir) => {
      import s.implicits._
      val fname = concat($"c_name", lit(".png"))
      T.customer(s, dir)
        .select($"c_custkey",
          upper(substring(sha2(concat($"c_custkey".cast("string"), lit("-REHIVE")), 256),
            1, 8)).as("gift_code"),
          concat_ws("-", $"c_custkey".cast("string"),
            substring(sha2(fname, 256), 1, 9)).as("upload_name"),
          regexp_extract(fname, "\\.([^.]+)$", 1).as("ext"))
        .orderBy($"c_custkey")
    }),

    // S5: point updates as a merge view — decisions derived from the
    // data (approve withdrawals over a threshold), applied with
    // left-join + coalesce instead of mutation. At 100 TB this becomes
    // a Delta/Iceberg MERGE; the plan shape (broadcast updates onto the
    // base scan) is identical.
    "q35_merge_update" -> ((s, dir) => {
      import s.implicits._
      val o = T.orders(s, dir)
      val updates = o.filter($"o_orderstatus" === "P" && $"o_totalprice" > 200000.0)
        .select($"o_orderkey".as("u_key"), lit("A").as("u_status"))
      o.join(broadcast(updates), $"o_orderkey" === $"u_key", "left")
        .select($"o_orderkey",
          coalesce($"u_status", $"o_orderstatus").as("status"),
          $"u_status".isNotNull.as("was_updated"))
        .orderBy($"o_orderkey")
    }),

    // J1/J2 eager-load: parent row with the joined dimension nested as
    // a struct, two levels deep (Drizzle's `with: {referred: {package}}`
    // nested-object result, render-complete-deploy.js:386-394). The
    // verified output serializes the nested struct with to_json — the
    // driver's pandas compare can't sort raw struct (dict) columns —
    // while the struct construction itself stays the operator under test.
    "q36_nested_eager_load" -> ((s, dir) => {
      import s.implicits._
      val c = T.customer(s, dir)
      val n = T.nation(s, dir)
      val r = T.region(s, dir)
      c.join(broadcast(n), $"c_nationkey" === $"n_nationkey", "left")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey", "left")
        .select($"c_custkey", $"c_name",
          to_json(struct($"n_name".as("name"),
            struct($"r_name".as("name")).as("region"))).as("nation"))
        .orderBy($"c_custkey")
    }),

    // J3: two parallel FK joins hanging off one row (gift_codes →
    // package AND → redeemer, render-complete-deploy.js:440-447) —
    // lineitem → part AND → supplier.
    "q66_parallel_fk_joins" -> ((s, dir) => {
      import s.implicits._
      val l = T.lineitem(s, dir).filter($"l_orderkey" < 100L)
      l.join(broadcast(T.part(s, dir)), $"l_partkey" === $"p_partkey", "left")
        .join(broadcast(T.supplier(s, dir)), $"l_suppkey" === $"s_suppkey", "left")
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"p_name",
          $"s_name", $"l_quantity")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
    }))

  val oracle: Map[String, String] = Map(
    "q34_code_gen" ->
      """SELECT c_custkey,
        |  upper(substr(sha256(CAST(c_custkey AS VARCHAR) || '-REHIVE'), 1, 8)) AS gift_code,
        |  CAST(c_custkey AS VARCHAR) || '-' || substr(sha256(c_name || '.png'), 1, 9) AS upload_name,
        |  regexp_extract(c_name || '.png', '\.([^.]+)$', 1) AS ext
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q35_merge_update" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'P' AND o_totalprice > 200000.0
        |       THEN 'A' ELSE o_orderstatus END AS status,
        |  (o_orderstatus = 'P' AND o_totalprice > 200000.0) AS was_updated
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q36_nested_eager_load" ->
      """SELECT c_custkey, c_name,
        |  CAST(to_json(struct_pack(name := n_name,
        |                           region := struct_pack(name := r_name))) AS VARCHAR) AS nation
        |FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,

    "q66_parallel_fk_joins" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, p_name, s_name, l_quantity
        |FROM lineitem
        |LEFT JOIN part ON l_partkey = p_partkey
        |LEFT JOIN supplier ON l_suppkey = s_suppkey
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin)
}
