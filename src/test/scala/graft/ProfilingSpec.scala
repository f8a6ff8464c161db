package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the data-quality family (q148-q152) beyond the
  * oracle's hash-equality: BPE greedy-merge semantics replayed
  * independently in JVM string ops, profiler metric invariants,
  * constraint-suite red/green split, and winsorization bounds. */
class ProfilingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.01"

  test("q148's first merge is the true most-frequent adjacent char pair") {
    import spark.implicits._
    // independent recount: raw adjacent char pairs weighted by word
    // frequency, computed with a completely different formulation
    // (flatMap over collected words — fixture vocab is tiny)
    val words = graft.engine.Tables.documents(spark, dir)
      .select(explode(split(trim($"text"), "\\s+")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect()
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((w, cnt) <- words; i <- 0 until w.length - 1) {
      val k = (w(i).toString, w(i + 1).toString)
      pairCounts(k) = pairCounts.getOrElse(k, 0L) + cnt
    }
    val expected = pairCounts.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.head
    val got = SparkEntry.queries("q148_bpe_train")(spark, dir)
      .filter($"merge_rank" === 1L)
      .select($"left_sym", $"right_sym", $"pair_count")
      .as[(String, String, Long)].head()
    assert((got._1, got._2) === expected._1)
    assert(got._3 === expected._2)
  }

  test("q149 subword counts replay via JVM greedy replace on the merge table") {
    import spark.implicits._
    val merges = SparkEntry.queries("q148_bpe_train")(spark, dir)
      .orderBy($"merge_rank")
      .select($"left_sym", $"right_sym").as[(String, String)].collect()
    val docs = graft.engine.Tables.documents(spark, dir)
      .filter($"doc_id" < 10L).select($"doc_id", $"text")
      .as[(Long, String)].collect()
    val q149 = SparkEntry.queries("q149_bpe_apply")(spark, dir)
      .filter($"doc_id" < 10L)
      .select($"doc_id", $"n_subwords").as[(Long, Long)].collect().toMap
    for ((id, text) <- docs) {
      val subwords = text.trim.split("\\s+").filter(_.nonEmpty).map { w =>
        var seq = w.map(c => s"[$c]").mkString
        for ((a, b) <- merges) // String.replace = non-overlapping L-to-R
          seq = seq.replace(s"[$a][$b]", s"[$a$b]")
        seq.count(_ == '[').toLong
      }.sum
      assert(q149(id) === subwords, s"doc $id")
    }
  }

  test("BPE apply never increases symbol count and compression is consistent") {
    import spark.implicits._
    val rows = SparkEntry.queries("q149_bpe_apply")(spark, dir)
      .select($"n_chars_sym", $"n_subwords", $"compression")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (chars, sub, comp) =>
      assert(sub <= chars && sub > 0)
      assert(math.abs(comp - math.round(sub.toDouble / chars * 1e6) / 1e6) < 1e-9)
    }
  }

  test("profiler metrics satisfy the structural invariants") {
    import spark.implicits._
    val rows = SparkEntry.queries("q150_table_profile")(spark, dir).collect()
    assert(rows.length === 6)
    val n = rows.head.getAs[Long]("n_rows")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") === n)
      assert(r.getAs[Long]("null_count") >= 0 && r.getAs[Long]("null_count") <= n)
      assert(r.getAs[Long]("distinct_count") <= n)
    }
    val byCol = rows.map(r => r.getAs[String]("col_name") -> r).toMap
    // PK column: all distinct, no nulls
    assert(byCol("o_orderkey").getAs[Long]("distinct_count") === n)
    assert(byCol("o_orderkey").getAs[Long]("null_count") === 0L)
    assert(byCol("o_orderkey").getAs[Double]("min_num") <=
      byCol("o_orderkey").getAs[Double]("max_num"))
    assert(byCol("o_orderstatus").getAs[Long]("distinct_count") === 3L)
  }

  test("constraint suite: the deliberate range check fails, the rest pass") {
    import spark.implicits._
    val rows = SparkEntry.queries("q151_constraint_checks")(spark, dir)
      .select($"check_name", $"violations", $"passed")
      .as[(String, Long, Boolean)].collect().toSeq
    val byName = rows.map(r => r._1 -> r).toMap
    assert(rows.length === 6)
    assert(!byName("range_l_discount_le_008")._3 &&
      byName("range_l_discount_le_008")._2 > 0L)
    rows.filterNot(_._1 == "range_l_discount_le_008").foreach { case (nm, v, p) =>
      assert(p && v === 0L, s"$nm expected green")
    }
  }

  test("incremental profile (stored partials + delta) equals a direct one-shot profile") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udaf
    val direct = {
      val hll = udaf(new graft.engine.Sketches.Hll)
      graft.engine.Tables.orders(spark, dir)
        .select($"o_custkey",
          round($"o_totalprice" * 100.0).cast("long").as("cents"))
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count($"o_custkey")).as("null_custkey"),
          (sum($"cents").cast("double") / 100.0).as("sum_price"),
          (min($"cents").cast("double") / 100.0).as("min_price"),
          (max($"cents").cast("double") / 100.0).as("max_price"),
          hll(md5($"o_custkey".cast("string"))).as("st"))
        .select($"n_rows", $"null_custkey", $"sum_price", $"min_price",
          $"max_price", element_at($"st", 1).as("cust_zero_regs"),
          element_at($"st", 2).as("cust_sum_scaled"))
        .head()
    }
    val inc = SparkEntry.queries("q156_incremental_profile")(spark, dir)
      .drop("cust_raw_est").head()
    assert(inc === direct)
  }

  test("BFS layers: source at 0, every deeper node has a parent witness one layer up") {
    import spark.implicits._
    val bfs = SparkEntry.queries("q153_bfs_layers")(spark, dir)
      .select($"id", $"dist").as[(Long, Long)].collect().toMap
    assert(bfs(1L) === 0L)
    assert(bfs.values.max <= 10L && bfs.size > 100)
    // independent adjacency recomputation for the witness check
    def nbrs(u: Long): Seq[Long] = {
      val parents = Seq(u / 2, u / 3).filter(p => p >= 1 && p != u)
      val children = bfs.keys.filter(c => c / 2 == u || c / 3 == u).toSeq
      (parents ++ children).distinct
    }
    bfs.foreach { case (id, d) =>
      if (d > 0)
        assert(nbrs(id).exists(nb => bfs.get(nb).contains(d - 1)),
          s"node $id at layer $d has no neighbor at ${d - 1}")
    }
  }

  test("kNN vote counts are within k and `correct` is consistent") {
    import spark.implicits._
    val rows = SparkEntry.queries("q154_knn_classify")(spark, dir)
      .select($"true_label", $"pred_label", $"votes", $"correct")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(rows.length === 20)
    rows.foreach { case (t, p, v, c) =>
      assert(v >= 1L && v <= 5L)
      assert(c === (t == p))
    }
  }

  test("equi-depth buckets: equal depths (±1), ordered non-overlapping ranges") {
    import spark.implicits._
    val rows = SparkEntry.queries("q155_equidepth_hist")(spark, dir)
      .select($"bucket", $"n_rows", $"lo", $"hi", $"ndv")
      .as[(Long, Long, Double, Double, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1L to 8L))
    val n = rows.map(_._2).sum
    assert(n === graft.engine.Tables.orders(spark, dir).count())
    rows.foreach { case (_, rn, lo, hi, ndv) =>
      assert(rn == n / 8 || rn == n / 8 + 1)
      assert(lo <= hi && ndv >= 1L && ndv <= rn)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"bucket ${a._1} hi ${a._4} > bucket ${b._1} lo ${b._3}")
    }
  }

  test("winsorized mean sits inside [p05, p95] and differs from the raw mean") {
    import spark.implicits._
    val rows = SparkEntry.queries("q152_winsorized_stats")(spark, dir)
      .select($"n_items", $"p05", $"p95", $"mean_price", $"winsorized_mean")
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(rows.length === 3)
    val total = rows.map(_._1).sum
    val liCount = graft.engine.Tables.lineitem(spark, dir).count()
    assert(total === liCount)
    rows.foreach { case (_, p05, p95, mean, wmean) =>
      assert(p05 <= p95)
      assert(wmean >= p05 - 1e-9 && wmean <= p95 + 1e-9)
      assert(math.abs(wmean - mean) > 1e-9) // the tail trim did something
    }
  }
}
