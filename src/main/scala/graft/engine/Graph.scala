package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.{Tables => T}

/** Iterative graph analytics over the referral graph (SURVEY.md §2.6's
  * edge table, render-complete-deploy.js:86-91): PageRank as the
  * canonical rank-propagation dataflow — join ranks to edges,
  * aggregate contributions per target, damp, repeat. The reference
  * walks this graph only upward for commissions; rank centrality is
  * the analytics question the same table supports ("which referrers
  * anchor the network").
  *
  * Determinism discipline: ranks are integer micro-units and every
  * step is integer arithmetic (`div`), so the fixpoint iteration is
  * bit-identical under ANY partitioning/merge order — float PageRank
  * can't make that promise (order-dependent sums), which is why this
  * is the verified form.
  *
  * Scale posture: per iteration, one equi-join of edges⋈ranks on the
  * source key and one combine-able integer groupBy on the target key.
  * At 100 TB both sides pre-partition by node id once (bucketed edge
  * table), making every iteration shuffle-free on the edge side —
  * the standard Pregel-on-SQL layout. Frontier size is |nodes|, not
  * |edges|, and lineage is truncated per iteration via persist.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  /** Damping 0.85 / base 0.15 in 1e6 micro-units; 5 fixed iterations. */
  val Iters = 5

  /** Integer-exact PageRank. `edges` columns: (referred, referrer) —
    * rank flows referrer → referred. Dangling leaves simply don't
    * propagate (no redistribution term), the usual sparse-graph
    * simplification. */
  def pagerank(edges0: DataFrame, iters: Int = Iters): DataFrame =
    pagerankImpl(edges0, iters, sourceId = None)

  /** Personalized PageRank: all restart mass concentrates on one
    * source node, so ranks measure proximity TO that node's
    * neighborhood instead of global centrality — the recommendation /
    * influence-radius primitive over the same referral edges. Same
    * integer arithmetic, same per-iteration join shape. */
  def personalizedPagerank(edges0: DataFrame, sourceId: Long,
                           iters: Int = Iters): DataFrame =
    pagerankImpl(edges0, iters, Some(sourceId))

  private def pagerankImpl(edges0: DataFrame, iters: Int,
                           sourceId: Option[Long]): DataFrame = {
    val s = edges0.sparkSession
    import s.implicits._
    // edges/nodes/outdeg are read every iteration — persist once. The
    // rank frontier itself chains LAZILY: for a bounded iteration count
    // one action executes the whole chain (each stage's shuffle output
    // is its own materialization), which saves an eager job per
    // iteration. Past ~15 iterations, checkpoint the frontier
    // periodically to bound lineage/analysis cost.
    val edges = edges0.select($"referred", $"referrer").persist()
    val nodes = edges.select($"referred".as("id"))
      .union(edges.select($"referrer".as("id"))).distinct().persist()
    val outdeg = edges.groupBy($"referrer").agg(count(lit(1)).as("od")).persist()
    // global PR: uniform init + uniform restart; personalized PR: all
    // initial and restart mass on the source node
    val init = sourceId
      .map(sid => when($"id" === sid, lit(1000000L)).otherwise(lit(0L)))
      .getOrElse(lit(1000000L))
    val base = sourceId
      .map(sid => when($"id" === sid, lit(150000L)).otherwise(lit(0L)))
      .getOrElse(lit(150000L))
    var ranks = nodes.select($"id", init.as("r"))
    for (_ <- 1 to iters) {
      val inc = edges
        .join(ranks.withColumnRenamed("id", "referrer"), "referrer")
        .join(outdeg, "referrer")
        .select($"referred".as("id"), expr("r div od").as("c"))
        .groupBy($"id").agg(sum($"c").as("inc"))
      ranks = nodes.join(inc, Seq("id"), "left")
        .select($"id",
          (base + expr("CAST((85 * coalesce(inc, 0)) div 100 AS BIGINT)")).as("r"))
    }
    ranks.select($"id", $"r".as("rank_micro"),
      ($"r".cast("double") / 1000000.0).as("rank"))
  }

  /** One synchronous rank update: r' = base + 0.85·(in-contributions),
    * all integer. Shared by the fixed-iteration, fixpoint, and
    * incremental forms so every variant runs the SAME map. */
  private def step(edges: DataFrame, nodes: DataFrame, outdeg: DataFrame,
                   ranks: DataFrame): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val inc = edges
      .join(ranks.withColumnRenamed("id", "referrer"), "referrer")
      .join(outdeg, "referrer")
      .select($"referred".as("id"), expr("r div od").as("c"))
      .groupBy($"id").agg(sum($"c").as("inc"))
    nodes.join(inc, Seq("id"), "left")
      .select($"id",
        (lit(150000L) + expr("CAST((85 * coalesce(inc, 0)) div 100 AS BIGINT)")).as("r"))
  }

  /** Iterate the integer map to its EXACT fixpoint (no rank changes at
    * all — detectable precisely because the arithmetic is integral; a
    * float PageRank can only stop at a tolerance). Returns the rank
    * vector and the number of rounds taken. The integer map contracts
    * differences by ~0.85 per round and truncation floors tiny
    * residuals to zero, so the fixpoint lands in O(log range) rounds. */
  def pagerankFixpoint(edges0: DataFrame, maxRounds: Int = 200): (DataFrame, Int) = {
    val s = edges0.sparkSession
    import s.implicits._
    val edges = edges0.select($"referred", $"referrer").persist()
    val nodes = edges.select($"referred".as("id"))
      .union(edges.select($"referrer".as("id"))).distinct().persist()
    val outdeg = edges.groupBy($"referrer").agg(count(lit(1)).as("od")).persist()
    var ranks = nodes.select($"id", lit(1000000L).as("r")).localCheckpoint()
    var rounds = 0
    var changed = 1L
    while (changed > 0 && rounds < maxRounds) {
      val next = step(edges, nodes, outdeg, ranks).localCheckpoint()
      changed = next.alias("n").join(ranks.alias("p"), "id")
        .filter(col("n.r") =!= col("p.r")).count()
      ranks = next
      rounds += 1
    }
    (ranks.select($"id", $"r".as("rank_micro"),
      ($"r".cast("double") / 1000000.0).as("rank")), rounds)
  }

  /** Incremental PageRank over an edge-delta batch: converge from the
    * PREVIOUS fixpoint instead of restarting, touching only the nodes
    * a change can actually reach — rank maintenance ∝ delta, not ∝
    * graph (STATUS.md round-4 item; IncrementalPagerankSpec asserts
    * the result is integer-identical to a full recompute).
    *
    * Residual propagation: the initially-dirty set is every node whose
    * in-contributions changed structurally (receivers of added/removed
    * edges, plus ALL targets of a referrer whose out-degree changed —
    * its per-edge contribution r div od changed for every one). Each
    * round recomputes ONLY the frontier from its full in-edge set,
    * then advances the frontier to the out-targets of nodes whose rank
    * actually changed. Work per round ∝ frontier in-edges; on a
    * bucketed edge table the frontier join is partition-pruned too.
    *
    * @param prevRanks previous (id, rank_micro) fixpoint vector
    * @return (ranks, rounds, recompute-count across all rounds)
    */
  def pagerankIncremental(edgesNew0: DataFrame, prevRanks: DataFrame,
                          added: DataFrame, removed: DataFrame,
                          maxRounds: Int = 200): (DataFrame, Int, Long) = {
    val s = edgesNew0.sparkSession
    import s.implicits._
    val edges = edgesNew0.select($"referred", $"referrer").persist()
    val nodes = edges.select($"referred".as("id"))
      .union(edges.select($"referrer".as("id"))).distinct().persist()
    val outdeg = edges.groupBy($"referrer").agg(count(lit(1)).as("od")).persist()
    // seed: previous fixpoint restricted to surviving nodes; brand-new
    // nodes start at the restart mass (corrected in round 1 — they are
    // in the initial dirty set by construction)
    var ranks = nodes
      .join(prevRanks.select($"id", $"rank_micro".as("pr")), Seq("id"), "left")
      .select($"id", coalesce($"pr", lit(150000L)).as("r")).localCheckpoint()
    val delta = added.select($"referred", $"referrer")
      .unionByName(removed.select($"referred", $"referrer")).persist()
    val dirtyRefs = delta.select($"referrer").distinct()
    var frontier = delta.select($"referred".as("id"))
      .union(edges.join(dirtyRefs, "referrer").select($"referred".as("id")))
      .union(nodes.join(prevRanks.select($"id"), Seq("id"), "left_anti")) // new nodes
      .distinct().localCheckpoint()
    var rounds = 0
    var work = 0L
    var fsize = frontier.count()
    while (fsize > 0 && rounds < maxRounds) {
      work += fsize
      val tgt = frontier.withColumnRenamed("id", "referred")
      val inc = edges.join(tgt, "referred")
        .join(ranks.withColumnRenamed("id", "referrer"), "referrer")
        .join(outdeg, "referrer")
        .select($"referred".as("id"), expr("r div od").as("c"))
        .groupBy($"id").agg(sum($"c").as("inc"))
      val newr = frontier.join(inc, Seq("id"), "left")
        .select($"id",
          (lit(150000L) + expr("CAST((85 * coalesce(inc, 0)) div 100 AS BIGINT)")).as("nr"))
      val changed = newr.join(ranks, "id").filter($"nr" =!= $"r")
        .select($"id", $"nr").localCheckpoint()
      ranks = ranks.join(changed.withColumnRenamed("nr", "r2")
          .withColumnRenamed("id", "cid"), $"id" === $"cid", "left")
        .select($"id", coalesce($"r2", $"r").as("r")).localCheckpoint()
      frontier = edges
        .join(changed.select($"id".as("referrer")), "referrer")
        .select($"referred".as("id")).distinct().localCheckpoint()
      fsize = frontier.count()
      rounds += 1
    }
    (ranks.select($"id", $"r".as("rank_micro"),
      ($"r".cast("double") / 1000000.0).as("rank")), rounds, work)
  }

  /** Unnormalized integer HITS (Kleinberg): for `rounds` iterations,
    * a_t(i) = Σ_{j→i} h_{t-1}(j), then h_t(i) = Σ_{i→j} a_t(j) — the
    * authority update reads the PREVIOUS hubs, the hub update reads
    * the CURRENT authorities, h_0 = 1 everywhere. Skipping the norm
    * step keeps every score an exact alternating-path count (BIGINT),
    * so the oracle can replay the identical rounds as unrolled SQL —
    * the same integer-exactness trick as [[pagerank]]. Each round is
    * two bucketable equi-join + groupBy passes over the edge list
    * (in-neighbors then out-neighbors); nothing is ever collected.
    *
    * @param edges0 (src, dst) directed edges
    */
  def hits(edges0: DataFrame, rounds: Int = 3): DataFrame = {
    val s = edges0.sparkSession
    import s.implicits._
    val edges = edges0.select($"src", $"dst").persist()
    val nodes = edges.select($"src".as("id"))
      .union(edges.select($"dst".as("id"))).distinct().persist()
    var h = nodes.select($"id", lit(1L).as("h"))
    var a = nodes.select($"id", lit(1L).as("a"))
    // bounded-round chains stay fully LAZY (the [[pagerank]] rule):
    // one action runs the whole 2·rounds-join plan, each shuffle its
    // own materialization — measured 4× faster than per-round
    // localCheckpoint at bench scale (scheduling, not data, dominates
    // a round). Past ~15 rounds, checkpoint periodically.
    for (_ <- 1 to rounds) {
      val aSum = edges.join(h.withColumnRenamed("id", "src"), "src")
        .groupBy($"dst".as("id")).agg(sum($"h").as("s"))
      a = nodes.join(aSum, Seq("id"), "left")
        .select($"id", coalesce($"s", lit(0L)).as("a"))
      val hSum = edges.join(a.withColumnRenamed("id", "dst"), "dst")
        .groupBy($"src".as("id")).agg(sum($"a").as("s"))
      h = nodes.join(hSum, Seq("id"), "left")
        .select($"id", coalesce($"s", lit(0L)).as("h"))
    }
    nodes.join(a, "id").join(h, "id")
      .select($"id", $"a".as("authority"), $"h".as("hub"))
  }

  /** [[hits]] plus the per-round history an incremental update needs:
    * returns (h_0 … h_rounds, a_1 … a_rounds), each materialized.
    * At scale this history is what a maintained HITS view persists
    * alongside the final scores (R small vectors of |V| rows). */
  def hitsHistory(edges0: DataFrame,
                  rounds: Int = 3): (Seq[DataFrame], Seq[DataFrame]) = {
    val s = edges0.sparkSession
    import s.implicits._
    val edges = edges0.select($"src", $"dst").persist()
    val nodes = edges.select($"src".as("id"))
      .union(edges.select($"dst".as("id"))).distinct().persist()
    var h = nodes.select($"id", lit(1L).as("h")).localCheckpoint()
    var hs = List(h); var as = List.empty[DataFrame]
    for (_ <- 1 to rounds) {
      val aSum = edges.join(h.withColumnRenamed("id", "src"), "src")
        .groupBy($"dst".as("id")).agg(sum($"h").as("s"))
      val a = nodes.join(aSum, Seq("id"), "left")
        .select($"id", coalesce($"s", lit(0L)).as("a")).localCheckpoint()
      val hSum = edges.join(a.withColumnRenamed("id", "dst"), "dst")
        .groupBy($"src".as("id")).agg(sum($"a").as("s"))
      h = nodes.join(hSum, Seq("id"), "left")
        .select($"id", coalesce($"s", lit(0L)).as("h")).localCheckpoint()
      hs :+= h; as :+= a
    }
    (hs, as)
  }

  /** Incremental HITS over an edge-delta batch: patch the stored
    * per-round history ([[hitsHistory]]) instead of recomputing every
    * node — the same residual-propagation pattern as
    * [[pagerankIncremental]], generalized to a two-phase round.
    *
    * Dirty-set recurrence (exact, because each score depends only on
    * direct neighbors one half-round back): a_t is dirty for receivers
    * of changed edges and for nodes with an in-neighbor whose h_{t-1}
    * is dirty; h_t is dirty for sources of changed edges and for nodes
    * with an out-neighbor whose a_t is dirty. Each dirty set is
    * recomputed from its full in/out-edge slice against the PATCHED
    * previous vector (stored ∪ recomputed overrides); everything
    * outside the delta's ≤2·rounds-hop influence cone keeps its stored
    * score untouched. Work ∝ cone size, not |V|·rounds
    * (IncrementalPagerankSpec's sibling assertion in
    * IncrementalHitsSpec: integer-identical to a full recompute,
    * dirty-slots < |V|).
    *
    * @return (scores, total dirty slots recomputed)
    */
  def hitsIncremental(edgesNew0: DataFrame, added: DataFrame,
                      removed: DataFrame, hHist: Seq[DataFrame],
                      aHist: Seq[DataFrame]): (DataFrame, Long) = {
    val s = edgesNew0.sparkSession
    import s.implicits._
    val rounds = aHist.size
    val edges = edgesNew0.select($"src", $"dst").persist()
    val nodes = edges.select($"src".as("id"))
      .union(edges.select($"dst".as("id"))).distinct().persist()
    val delta = added.select($"src", $"dst")
      .unionByName(removed.select($"src", $"dst")).persist()
    val deltaDst = delta.select($"dst".as("id")).distinct().persist()
    val deltaSrc = delta.select($"src".as("id")).distinct().persist()

    /** stored vector patched with recomputed rows on the dirty set,
      * restricted to the CURRENT node set (drops vanished nodes). */
    def patch(stored: DataFrame, recomputed: DataFrame,
              dirty: DataFrame, valueCol: String): DataFrame =
      nodes.join(stored, Seq("id"), "left")
        .join(dirty.withColumn("__d", lit(true)), Seq("id"), "left")
        .join(recomputed.withColumnRenamed(valueCol, "__v"), Seq("id"), "left")
        // a current node absent from history is brand-new ⇒ always in
        // the dirty set by construction, so __v covers it
        .select($"id", when($"__d", coalesce($"__v", lit(0L)))
          .otherwise(col(valueCol)).as(valueCol))

    var hPrev = nodes.join(hHist.head, Seq("id"), "left")
      .select($"id", coalesce($"h", lit(1L)).as("h")) // h_0 ≡ 1, new nodes included
    var dirtyH = s.emptyDataFrame.select(lit(0L).as("id")).limit(0).localCheckpoint()
    var aPatched: DataFrame = null
    var work = 0L
    for (t <- 1 to rounds) {
      val dirtyA = deltaDst
        .union(edges.join(dirtyH.withColumnRenamed("id", "src"), "src")
          .select($"dst".as("id")))
        .union(nodes.join(hHist.head, Seq("id"), "left_anti")) // brand-new nodes
        .distinct().localCheckpoint()
      work += dirtyA.count()
      val aRec = dirtyA.withColumnRenamed("id", "dst")
        .join(edges, Seq("dst"), "left")
        .join(hPrev.withColumnRenamed("id", "src"), Seq("src"), "left")
        .groupBy($"dst".as("id")).agg(sum($"h").as("a"))
        .select($"id", coalesce($"a", lit(0L)).as("a"))
      aPatched = patch(aHist(t - 1), aRec, dirtyA, "a").localCheckpoint()
      dirtyH = deltaSrc
        .union(edges.join(dirtyA.withColumnRenamed("id", "dst"), "dst")
          .select($"src".as("id")))
        .union(nodes.join(hHist.head, Seq("id"), "left_anti"))
        .distinct().localCheckpoint()
      work += dirtyH.count()
      val hRec = dirtyH.withColumnRenamed("id", "src")
        .join(edges, Seq("src"), "left")
        .join(aPatched.withColumnRenamed("id", "dst")
          .withColumnRenamed("a", "av"), Seq("dst"), "left")
        .groupBy($"src".as("id")).agg(sum($"av").as("h"))
        .select($"id", coalesce($"h", lit(0L)).as("h"))
      hPrev = patch(hHist(t), hRec, dirtyH, "h").localCheckpoint()
    }
    (nodes.join(aPatched, "id").join(hPrev, "id")
      .select($"id", $"a".as("authority"), $"h".as("hub")), work)
  }

  /** q135's persisted seed state (see the q122 precedent in Dedup):
    * the previous fixpoint is the stored artifact the delta advances. */
  private val seedPrCache = new SessionMemo[String]

  /** q138's persisted seed state: the per-round HITS score history,
    * one memo key per frame. */
  private val seedHitsCache = new SessionMemo[String]

  val queries: Map[String, Q] = Map(
    // Triangle counting + local clustering coefficient via
    // DEGREE-ORDERED ORIENTATION (Schank & Wagner 2005; the
    // MapReduce form is Suri & Vassilvitskii, WWW 2011): orient each
    // undirected edge from its (degree, id)-smaller endpoint to the
    // larger, enumerate wedges at the smaller endpoint only, and close
    // them with a hash join back to the edge set. Out-degree after
    // orientation is O(√m), so wedge volume is O(m^1.5) worst-case
    // instead of Σ deg² — the difference between feasible and not on a
    // power-law 100 TB graph (a celebrity node of degree 10⁷ generates
    // zero wedges as a wedge apex it isn't). All joins are keyed
    // equi-joins; no node ever materializes its full neighborhood.
    // Graph: the referral tree ∪ a second "mentor" parent floor(u/3) —
    // a deterministic sparse multi-parent DAG that actually contains
    // triangles (e.g. {4,2,1}: 4→2, 4→1, 2→1). The oracle counts the
    // SAME triangles with the naive three-way self-join (no
    // orientation), so parity independently proves the oriented
    // enumeration is lossless, not just self-consistent.
    "q143_triangles" -> ((s, dir) => {
      import s.implicits._
      val cust = T.customer(s, dir).select($"c_custkey".as("u"))
      // canonical undirected edges (lo < hi), both parents, dedup'd
      // (floor(u/2) = floor(u/3) for u ∈ {2,3} never happens with
      // lo ≥ 1 guard: u=2 → parents 1,0; u=3 → 1,1 — distinct() folds)
      val rawE = cust.select($"u", expr("CAST(floor(u/2) AS BIGINT)").as("p"))
        .union(cust.select($"u", expr("CAST(floor(u/3) AS BIGINT)").as("p")))
        .filter($"p" >= 1L && $"p" =!= $"u")
      val edges = rawE.select(least($"u", $"p").as("lo"),
        greatest($"u", $"p").as("hi")).distinct()
      val deg = edges.select($"lo".as("id")).union(edges.select($"hi".as("id")))
        .groupBy($"id").agg(count(lit(1)).as("deg"))
      // orient lo/hi by (deg, id): src = smaller endpoint in that order
      val dl = deg.select($"id".as("lo"), $"deg".as("dlo"))
      val dh = deg.select($"id".as("hi"), $"deg".as("dhi"))
      val oriented = edges.join(dl, "lo").join(dh, "hi")
        .select(
          when($"dlo" < $"dhi" || ($"dlo" === $"dhi" && $"lo" < $"hi"), $"lo")
            .otherwise($"hi").as("src"),
          when($"dlo" < $"dhi" || ($"dlo" === $"dhi" && $"lo" < $"hi"), $"hi")
            .otherwise($"lo").as("dst"))
      val o1 = oriented.select($"src", $"dst".as("b"))
      val o2 = oriented.select($"src", $"dst".as("c"))
      val wedges = o1.join(o2, "src").filter($"b" < $"c")
      val tris = wedges.join(edges,
        least($"b", $"c") === $"lo" && greatest($"b", $"c") === $"hi")
        .select($"src".as("x"), $"b".as("y"), $"c".as("z"))
      val perNode = tris.select(explode(array($"x", $"y", $"z")).as("id"))
        .groupBy($"id").agg(count(lit(1)).as("tri"))
      deg.join(perNode, Seq("id"), "left")
        .select($"id", $"deg", coalesce($"tri", lit(0L)).as("tri"))
        .withColumn("clustering",
          when($"deg" >= 2L,
            (lit(2.0) * $"tri".cast("double")) /
              ($"deg" * ($"deg" - 1L)).cast("double"))
            .otherwise(lit(0.0)))
        .orderBy($"id")
    }),

    // Single-source BFS hop layers — the traversal primitive the graph
    // family still lacked (PR/HITS/CC measure structure; BFS answers
    // "how far"). Undirected mentor graph (q143's edge set), source =
    // node 1, depth capped at 10 — the same bounded-radius contract as
    // the reference's 10-level upline walk (render-complete-deploy.js
    // :259). Classic frontier iteration: per round ONE equi-join of
    // the (thin) frontier against the adjacency list, a distinct, and
    // an anti-join against the visited set — first touch = minimal
    // hop count, so no per-node min bookkeeping is needed. Work per
    // round ∝ frontier edge fan-out, never |V|; the visited union
    // chains over per-round localCheckpoints so lineage stays flat.
    // At 100 TB the adjacency list is bucketed by id once and every
    // round's join is co-partitioned (the Pregel-on-SQL layout, same
    // as pagerank's). Oracle: recursive CTE enumerating all ≤10-hop
    // walks with UNION dedup, then min(dist) per node — a different
    // formulation whose agreement proves first-touch ≡ min-dist.
    "q153_bfs_layers" -> ((s, dir) => {
      import s.implicits._
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val cust = T.customer(s, dir).select($"c_custkey".as("u"))
        val rawE = cust.select($"u", expr("CAST(floor(u/2) AS BIGINT)").as("p"))
          .union(cust.select($"u", expr("CAST(floor(u/3) AS BIGINT)").as("p")))
          .filter($"p" >= 1L && $"p" =!= $"u")
        val edges = rawE.select(least($"u", $"p").as("lo"),
          greatest($"u", $"p").as("hi")).distinct()
        val nbrs = edges.select($"lo".as("id"), $"hi".as("nb"))
          .union(edges.select($"hi".as("id"), $"lo".as("nb")))
          .persist()
        var frontier = s.createDataFrame(Seq((1L, 0L)))
          .toDF("id", "dist").localCheckpoint()
        var visited = frontier
        for (d <- 1 to 10) {
          val next = frontier.join(nbrs, "id")
            .select($"nb".as("id")).distinct()
            .join(visited, Seq("id"), "left_anti")
            .select($"id", lit(d.toLong).as("dist"))
            .localCheckpoint()
          visited = visited.unionByName(next)
          frontier = next
        }
        nbrs.unpersist(blocking = false)
        visited.orderBy($"id")
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),

    // Weighted single-source shortest paths — the cost-aware sibling
    // of q153's BFS (hops answer "how far", SSSP answers "how cheap").
    // Same undirected mentor graph; integer edge weights derived
    // deterministically from the endpoints (1 + (lo+hi) mod 7), source
    // node 1, path length capped at 10 edges (the reference's
    // bounded-radius contract again). Frontier Bellman-Ford: each
    // round relaxes ONLY the nodes improved last round — one thin
    // equi-join against the adjacency list, a min-combine per target,
    // and a compare-against-best; work per round ∝ frontier fan-out.
    // All distances are integer micro-exact (no float accumulation),
    // so the fixpoint is bit-identical under any partitioning. At
    // 100 TB the adjacency is bucketed by id once (the Pregel-on-SQL
    // layout shared with pagerank/BFS). Oracle: recursive CTE over all
    // ≤10-edge walks with UNION-dedup'd (node, cost, depth) states,
    // then min(cost) — a different formulation whose agreement proves
    // the frontier relaxation reaches the true bounded-hop optimum.
    "q157_sssp_weighted" -> ((s, dir) => {
      import s.implicits._
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val cust = T.customer(s, dir).select($"c_custkey".as("u"))
        val rawE = cust.select($"u", expr("CAST(floor(u/2) AS BIGINT)").as("p"))
          .union(cust.select($"u", expr("CAST(floor(u/3) AS BIGINT)").as("p")))
          .filter($"p" >= 1L && $"p" =!= $"u")
        val edges = rawE.select(least($"u", $"p").as("lo"),
          greatest($"u", $"p").as("hi")).distinct()
          .withColumn("w", lit(1L) + ($"lo" + $"hi") % 7L)
        val adj = edges.select($"lo".as("id"), $"hi".as("nb"), $"w")
          .union(edges.select($"hi".as("id"), $"lo".as("nb"), $"w"))
          .persist()
        var best = s.createDataFrame(Seq((1L, 0L)))
          .toDF("id", "dist").localCheckpoint()
        var frontier = best
        for (_ <- 1 to 10) {
          val cand = frontier.join(adj, "id")
            .select($"nb".as("id"), ($"dist" + $"w").as("nd"))
            .groupBy($"id").agg(min($"nd").as("nd"))
          val improved = cand.join(best, Seq("id"), "left")
            .filter($"dist".isNull || $"nd" < $"dist")
            .select($"id", $"nd".as("dist"))
            .localCheckpoint()
          best = best.join(improved, Seq("id"), "left_anti")
            .unionByName(improved).localCheckpoint()
          frontier = improved
        }
        adj.unpersist(blocking = false)
        best.orderBy($"id")
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),

    // Onion-layer (k-core peeling) decomposition: synchronously drop
    // every node whose CURRENT degree is below k = 4, remove its
    // edges, repeat — a node's LAYER is the round that removed it (99
    // = survived all 12 rounds, i.e. sits in the 4-core). The layer
    // number is the standard "how deep in the dense part" centrality
    // (graph peeling / degeneracy ordering), and unlike a single
    // k-core membership bit it is non-degenerate on any graph —
    // removal CASCADES, so layers expose structure even when the
    // final core is empty. Denser mentor graph (three parent types
    // u/2, u/3, u/5) so interior nodes genuinely outlast leaves; the
    // fixture yields a clean geometric layer spectrum at every sf.
    // Per round: one combine-able degree count, one anti-join (the
    // newly peeled = previous keep-set minus current), two semi-joins
    // to shrink the edge set. At 100 TB edges stay bucketed by
    // endpoint so every round is co-partitioned, and per-round work
    // shrinks with the surviving edge set. Both engines run the
    // identical 12-round schedule — deterministic whether or not the
    // peel converged. Oracle: the rounds unrolled as chained
    // MATERIALIZED CTEs (generated, not hand-typed).
    "q158_onion_layers" -> ((s, dir) => {
      import s.implicits._
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val cust = T.customer(s, dir).select($"c_custkey".as("u"))
        val rawE = cust.select($"u", expr("CAST(floor(u/2) AS BIGINT)").as("p"))
          .union(cust.select($"u", expr("CAST(floor(u/3) AS BIGINT)").as("p")))
          .union(cust.select($"u", expr("CAST(floor(u/5) AS BIGINT)").as("p")))
          .filter($"p" >= 1L && $"p" =!= $"u")
        var e = rawE.select(least($"u", $"p").as("lo"),
          greatest($"u", $"p").as("hi")).distinct().localCheckpoint()
        val deg0 = e.select($"lo".as("id")).union(e.select($"hi".as("id")))
          .groupBy($"id").agg(count(lit(1)).as("deg0")).localCheckpoint()
        var prevKeep = deg0.select($"id")
        var layers = s.emptyDataset[(Long, Long)].toDF("id", "layer")
        for (i <- 1 to 12) {
          val keep = e.select($"lo".as("id")).union(e.select($"hi".as("id")))
            .groupBy($"id").agg(count(lit(1)).as("deg"))
            .filter($"deg" >= 4L).select($"id").localCheckpoint()
          layers = layers.unionByName(
            prevKeep.join(keep, Seq("id"), "left_anti")
              .select($"id", lit(i.toLong).as("layer")))
          e = e.join(keep.select($"id".as("lo")), Seq("lo"), "left_semi")
            .join(keep.select($"id".as("hi")), Seq("hi"), "left_semi")
            .select($"lo", $"hi").localCheckpoint()
          prevKeep = keep
        }
        layers
          .unionByName(prevKeep.select($"id", lit(99L).as("layer")))
          .join(deg0, "id")
          .select($"id", $"layer", $"deg0")
          .orderBy($"id")
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),

    // PageRank over the derived referral tree (same edge derivation as
    // q30's upline closure: referred = c_custkey, referrer =
    // floor(c_custkey/2)). 5 iterations, integer-exact.
    "q97_pagerank" -> ((s, dir) => {
      import s.implicits._
      val edges = T.customer(s, dir).filter($"c_custkey" >= 1L)
        .select($"c_custkey".as("referred"),
          expr("CAST(floor(c_custkey/2) AS BIGINT)").as("referrer"))
      // iterative materialization over sub-MB frontiers: pay scheduling
      // for a narrow width, not the full CPU-count width (the same
      // sizing rule as q67's recursion — width follows frontier size)
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try pagerank(edges).orderBy($"id")
      finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),

    // Personalized PageRank from node 10: rank mass diffuses down
    // node 10's referral subtree only — everyone outside it scores 0,
    // descendants score by proximity. Same plan as q97.
    "q104_ppr" -> ((s, dir) => {
      import s.implicits._
      val edges = T.customer(s, dir).filter($"c_custkey" >= 1L)
        .select($"c_custkey".as("referred"),
          expr("CAST(floor(c_custkey/2) AS BIGINT)").as("referrer"))
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try personalizedPagerank(edges, sourceId = 10L).orderBy($"id")
      finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),

    // Incremental PageRank AS A VERIFIED QUERY (the q122 pattern
    // applied to graph maintenance): the stored fixpoint of the seed
    // graph (oldest ~80% of the referral tree, memoized — it is
    // PERSISTED state in production, the rank vector the nightly job
    // maintains) is advanced by [[pagerankIncremental]] over the newest
    // ~20% of edges as the delta batch. The oracle replays the FULL
    // graph's integer fixpoint (q97's recursive CTE run to
    // convergence), so the driver independently proves
    // delta-convergence ≡ full recompute — at 100 TB the difference
    // between touching the delta's reach and re-ranking the graph per
    // crawl cycle. IncrementalPagerankSpec pins the same equivalence
    // plus the work ∝ delta bound on adversarial deltas.
    "q135_incremental_pagerank" -> ((s, dir) => {
      import s.implicits._
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val edges = T.customer(s, dir).filter($"c_custkey" >= 1L)
          .select($"c_custkey".as("referred"),
            expr("CAST(floor(c_custkey/2) AS BIGINT)").as("referrer"))
        val maxKey = edges.agg(max($"referred")).head().getLong(0)
        val cut = maxKey - maxKey / 5 // newest ~20% of nodes are the delta
        val prev = seedPrCache.getOrElseUpdate(s, dir)(
          pagerankFixpoint(edges.filter($"referred" <= cut))._1
            .select($"id", $"rank_micro").localCheckpoint())
        val delta = edges.filter($"referred" > cut)
        val (ranks, _, _) =
          pagerankIncremental(edges, prev, delta, delta.limit(0))
        ranks.orderBy($"id")
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),

    // Incremental HITS AS A VERIFIED QUERY (q135's sibling for the
    // two-phase round): the stored per-round score history of the seed
    // graph (memoized frame by frame — the persisted artifact
    // [[hitsIncremental]] patches) absorbs the newest ~20% of edges as
    // the delta; only the delta's ≤2·rounds-hop influence cone is
    // recomputed. The oracle replays the FULL graph's 3 rounds
    // (q114's unrolled SQL), so the driver proves patched-history ≡
    // full recompute, integer for integer.
    "q138_incremental_hits" -> ((s, dir) => {
      import s.implicits._
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val edges = T.customer(s, dir).filter($"c_custkey" >= 1L)
          .select(expr("CAST(floor(c_custkey/2) AS BIGINT)").as("src"),
            $"c_custkey".as("dst"))
        val maxKey = edges.agg(max($"dst")).head().getLong(0)
        val cut = maxKey - maxKey / 5
        val seed = edges.filter($"dst" <= cut)
        // lazily built ONCE per (session, dataset); each history frame
        // is memoized under its own key, so later calls never rebuild
        lazy val hist = hitsHistory(seed)
        val hh = (0 to 3).map(i =>
          seedHitsCache.getOrElseUpdate(s, s"$dir#h$i")(hist._1(i)))
        val ah = (1 to 3).map(i =>
          seedHitsCache.getOrElseUpdate(s, s"$dir#a$i")(hist._2(i - 1)))
        val delta = edges.filter($"dst" > cut)
        val (scores, _) =
          hitsIncremental(edges, delta, delta.limit(0), hh, ah)
        scores.orderBy($"id")
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),

    // HITS hubs/authorities over the referral tree (edges parent →
    // child): 3 integer-exact rounds. On a tree, authority(i) counts
    // alternating walks ending at i's parent-side, hub(i) weighs i's
    // subtree breadth — the two-sided centrality PageRank's single
    // score can't express. Same narrow-width sizing rule as q97.
    "q114_hits" -> ((s, dir) => {
      import s.implicits._
      val edges = T.customer(s, dir).filter($"c_custkey" >= 1L)
        .select(expr("CAST(floor(c_custkey/2) AS BIGINT)").as("src"),
          $"c_custkey".as("dst"))
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try hits(edges).orderBy($"id")
      finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),

    // Label-propagation community detection (Raghavan et al. 2007) on
    // the undirected two-parent referral graph (q143's edge set):
    // every node starts in its own community, then synchronously takes
    // the most frequent label among its neighbors, ties toward the
    // smaller label — 3 fixed rounds. Deterministic by construction
    // (counts + total (cnt desc, label) tie-break), which is what
    // makes it verifiable: async/random-order LPA can't be oracled.
    // Per round: one edges⋈labels equi-join, one (node, label) count,
    // one per-node argmax window over ≤deg rows — the Pregel-on-SQL
    // shape (same posture as pagerank above). At 100 TB the edge
    // table is bucketed by node id so the per-round join is
    // shuffle-free on the edge side; the window partitions by node,
    // never globally.
    "q171_label_prop" -> ((s, dir) => {
      import s.implicits._
      val cust = T.customer(s, dir).select($"c_custkey".as("u"))
      val rawE = cust.select($"u", expr("CAST(floor(u/2) AS BIGINT)").as("p"))
        .union(cust.select($"u", expr("CAST(floor(u/3) AS BIGINT)").as("p")))
        .filter($"p" >= 1L && $"p" =!= $"u")
      val und = rawE.select(least($"u", $"p").as("lo"),
        greatest($"u", $"p").as("hi")).distinct()
      val nbr = und.select($"lo".as("id"), $"hi".as("nb"))
        .union(und.select($"hi".as("id"), $"lo".as("nb"))).persist()
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        var labels = nbr.select($"id").distinct()
          .select($"id", $"id".as("lab")).localCheckpoint()
        for (_ <- 1 to 3) {
          val w = Window.partitionBy($"id").orderBy($"cnt".desc, $"nlab")
          labels = nbr
            .join(labels.select($"id".as("nb"), $"lab".as("nlab")), "nb")
            .groupBy($"id", $"nlab").agg(count(lit(1)).as("cnt"))
            .withColumn("rn", row_number().over(w))
            .filter($"rn" === 1)
            .select($"id", $"nlab".as("lab"))
            .localCheckpoint()
        }
        val csize = labels.groupBy($"lab")
          .agg(count(lit(1)).as("community_size"))
        labels.join(csize, "lab")
          .select($"id", $"lab".as("label"), $"community_size")
          .orderBy($"id")
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),

    // Bill-of-materials rollup over the referral tree: each node's
    // rolled-up cost = own cost + Σ over descendants of (descendant
    // cost × the PRODUCT of per-edge quantities along the path) — the
    // parts-explosion aggregate (TPC-style BOM; qty of the edge out of
    // v is 1 + v mod 3, cost is u mod 100 + 1, both derived so the
    // oracle replays them). The classic formulation iterates bottom-up
    // once per tree LEVEL; this one does NO iteration at all: because
    // the parent function is arithmetic (⌊v/2⌋), every node enumerates
    // its ≤24 ancestors MAP-SIDE with the cumulative quantity product
    // built in the same higher-order fold (the q137 bounded-fold
    // device), and one groupBy sums contributions per ancestor — the
    // Commission.ancestors closure trick upgraded with multiplicative
    // path weights. One shuffle total, depth never schedules a round.
    // Integer envelope: Π qty ≤ 3^24 ≈ 2.8e11, × cost ≤ 100, summed
    // over |subtree| — inside i64 through sf10 (documented vs the
    // 6^depth bound).
    "q188_bom_rollup" -> ((s, dir) => {
      import s.implicits._
      val nodes = T.customer(s, dir).select($"c_custkey".as("u"))
        .withColumn("cost", ($"u" % 100L) + 1L)
      val walks = nodes.select($"cost", explode(expr(
        """aggregate(
          |  sequence(1, 24),
          |  named_struct('v', u, 'p', CAST(1 AS BIGINT),
          |    'out', CAST(array() AS ARRAY<STRUCT<a: BIGINT, p: BIGINT>>)),
          |  (st, i) -> CASE WHEN st.v <= 1 THEN st ELSE named_struct(
          |    'v', st.v div 2,
          |    'p', st.p * (1 + st.v % 3),
          |    'out', array_append(st.out, named_struct(
          |      'a', st.v div 2, 'p', st.p * (1 + st.v % 3)))) END,
          |  st -> st.out)""".stripMargin)).as("w"))
        .select($"w.a".as("a"), ($"cost" * $"w.p").as("contrib"))
      val sub = walks.groupBy($"a")
        .agg(count(lit(1)).as("nd"), sum($"contrib").as("dc"))
      nodes.join(sub, nodes("u") === sub("a"), "left")
        .select($"u".as("node"), $"cost".as("own_cost"),
          coalesce($"nd", lit(0L)).as("n_desc"),
          ($"cost" + coalesce($"dc", lit(0L))).as("rollup_cost"))
        .orderBy($"node")
    }),

    // SEMI-SYNCHRONOUS label propagation over the same graph: each
    // round updates only one parity class (odd ids, then even, ×2 =
    // 4 half-rounds), reading the labels the OTHER half just wrote.
    // This is the standard fix for synchronous LPA's failure mode —
    // on near-bipartite structure the all-at-once update oscillates
    // between two colorings and never converges, while alternating
    // halves give every update a stable frozen neighborhood (the
    // graph-coloring scheduling of Pregel-style LPA). Still fully
    // deterministic — same (cnt desc, label) argmax as q171, so the
    // oracle unrolls the 4 half-rounds exactly; per half-round cost
    // is HALF the edge join of q171 (only the updating parity's
    // adjacency rows join), same bucketed-by-node 100 TB posture.
    "q181_label_prop_semi" -> ((s, dir) => {
      import s.implicits._
      val cust = T.customer(s, dir).select($"c_custkey".as("u"))
      val rawE = cust.select($"u", expr("CAST(floor(u/2) AS BIGINT)").as("p"))
        .union(cust.select($"u", expr("CAST(floor(u/3) AS BIGINT)").as("p")))
        .filter($"p" >= 1L && $"p" =!= $"u")
      val und = rawE.select(least($"u", $"p").as("lo"),
        greatest($"u", $"p").as("hi")).distinct()
      val nbr = und.select($"lo".as("id"), $"hi".as("nb"))
        .union(und.select($"hi".as("id"), $"lo".as("nb"))).persist()
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        var labels = nbr.select($"id").distinct()
          .select($"id", $"id".as("lab")).localCheckpoint()
        for (r <- 1 to 4) {
          val par = r % 2
          val w = Window.partitionBy($"id").orderBy($"cnt".desc, $"nlab")
          val upd = nbr.filter($"id" % 2 === par)
            .join(labels.select($"id".as("nb"), $"lab".as("nlab")), "nb")
            .groupBy($"id", $"nlab").agg(count(lit(1)).as("cnt"))
            .withColumn("rn", row_number().over(w))
            .filter($"rn" === 1)
            .select($"id", $"nlab".as("lab"))
          labels = labels.filter($"id" % 2 =!= par).unionByName(upd)
            .localCheckpoint()
        }
        val csize = labels.groupBy($"lab")
          .agg(count(lit(1)).as("community_size"))
        labels.join(csize, "lab")
          .select($"id", $"lab".as("label"), $"community_size")
          .orderBy($"id")
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),

    // Pointer doubling (path doubling) over the referral tree: every
    // node finds its ROOT and exact DEPTH in O(log depth) rounds
    // instead of the one-round-per-level walk of q30's upline join.
    // State per node: (ancestor reached so far, edges walked); each
    // round joins the state table WITH ITSELF on anc = id, composing
    // two jumps into one (1→2→4→8→16→32 edges) — the root's
    // self-loop fixpoint row (anc = itself, 0 edges) absorbs finished
    // chains, so 5 rounds close any depth ≤ 32 (sf10's deepest chain
    // is 21). Node 0 (⌊0/2⌋ = 0) is its own isolated root — the walk
    // terminates wherever parent(v) = v, not at a hardcoded node.
    // This is the general-graph device: unlike q188's
    // map-side ancestor fold it never exploits the parent function's
    // arithmetic form — the parent table is DATA, touched only by
    // equi-joins, so the same 5 rounds run when parents come from a
    // 100 TB edge table bucketed by id (each round co-partitioned,
    // the Pregel-on-SQL layout). Depth arithmetic is pure integer —
    // bit-identical at any parallelism. Oracle: recursive CTE walking
    // the parent chain one edge at a time — the O(depth) formulation
    // whose agreement proves the doubling composition exact.
    "q191_pointer_doubling" -> ((s, dir) => {
      import s.implicits._
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val cust = T.customer(s, dir).select($"c_custkey".as("u"))
        var st = cust.select($"u".as("id"),
          when($"u" > 1L, expr("CAST(u div 2 AS BIGINT)")).otherwise($"u").as("anc"),
          when($"u" > 1L, lit(1L)).otherwise(lit(0L)).as("d"))
          .localCheckpoint()
        for (_ <- 1 to 5) {
          val jump = st.select($"id".as("anc"), $"anc".as("anc2"), $"d".as("d2"))
          st = st.join(jump, "anc")
            .select($"id", $"anc2".as("anc"), ($"d" + $"d2").as("d"))
            .localCheckpoint()
        }
        st.select($"id", $"anc".as("root"), $"d".as("depth")).orderBy($"id")
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),

    // Degree assortativity (Newman's r): the Pearson correlation of
    // endpoint degrees across edges — do hubs attach to hubs (r > 0,
    // social networks) or to leaves (r < 0, hierarchies)? One number
    // that separates graph SHAPES q97's ranks and q143's triangles
    // can't. Standard construction: every undirected edge contributes
    // BOTH orientations, correlating the degree pairs. Determinism:
    // degrees are exact integer counts, the six correlation moments
    // are exact integer sums (products via DECIMAL(38)/HUGEINT), and
    // r is q172's fixed IEEE tail with the √a·√b split. Scale shape:
    // one combine-able degree count, two broadcast-able equi-joins of
    // edges to degrees, one map-side moment aggregation — no windows,
    // no iteration.
    "q214_assortativity" -> ((s, dir) => {
      import s.implicits._
      val cust = T.customer(s, dir).select($"c_custkey".as("u"))
      val rawE = cust.select($"u", expr("CAST(floor(u/2) AS BIGINT)").as("p"))
        .union(cust.select($"u", expr("CAST(floor(u/3) AS BIGINT)").as("p")))
        .filter($"p" >= 1L && $"p" =!= $"u")
      val edges = rawE.select(least($"u", $"p").as("lo"),
        greatest($"u", $"p").as("hi")).distinct()
      val deg = edges.select($"lo".as("id")).union(edges.select($"hi".as("id")))
        .groupBy($"id").agg(count(lit(1)).as("deg"))
      val dd = edges
        .join(deg.select($"id".as("lo"), $"deg".as("dlo")), "lo")
        .join(deg.select($"id".as("hi"), $"deg".as("dhi")), "hi")
      val pairs = dd.select($"dlo".as("x"), $"dhi".as("y"))
        .unionByName(dd.select($"dhi".as("x"), $"dlo".as("y")))
      val m = pairs.agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"),
        sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"),
        sum(($"y" * $"y").cast("decimal(38,0)")).as("syy"))
      val nd = $"n".cast("double")
      val sxd = $"sx".cast("double"); val syd = $"sy".cast("double")
      val r = (nd * $"sxy".cast("double") - sxd * syd) /
        (sqrt(nd * $"sxx".cast("double") - sxd * sxd) *
          sqrt(nd * $"syy".cast("double") - syd * syd))
      m.select($"n".as("n_pairs"), Exact.trunc6(r).as("assortativity"))
    }),

    // TEMPORAL reachability (earliest-arrival paths): edges carry
    // activation times (day 1 + child % 28, derived so the oracle
    // replays them) and a path is valid only if edge times are
    // NON-DECREASING — the contact-network/money-flow semantics where
    // static reachability overclaims (an edge that activated before
    // you arrived is useless). Greedy invariant: propagating the
    // MINIMAL arrival time per node dominates every other schedule,
    // so a frontier of improved-arrival nodes converges exactly like
    // Bellman-Ford (≤ 6 hops here, the bounded-radius contract).
    // All-integer state ⇒ bit-stable at any parallelism; per round
    // one equi-join frontier⋈edges + a min-combine — the q157 shape
    // with a time guard. Oracle: recursive CTE over all ≤6-hop
    // time-respecting walks, min arrival — cross-formulation.
    "q219_temporal_reach" -> ((s, dir) => {
      import s.implicits._
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val cust = T.customer(s, dir).select($"c_custkey".as("u"))
        val edges = cust.filter($"u" >= 2L)
          .select(expr("CAST(u div 2 AS BIGINT)").as("src"), $"u".as("dst"),
            (lit(1L) + $"u" % 28L).as("t"))
          .persist()
        var best = s.createDataFrame(Seq((1L, 0L)))
          .toDF("id", "arr").localCheckpoint()
        var frontier = best
        for (_ <- 1 to 6) {
          val cand = frontier.join(edges, $"id" === $"src")
            .filter($"t" >= $"arr")
            .select($"dst".as("id"), $"t".as("na"))
            .groupBy($"id").agg(min($"na").as("na"))
          val improved = cand.join(best, Seq("id"), "left")
            .filter($"arr".isNull || $"na" < $"arr")
            .select($"id", $"na".as("arr"))
            .localCheckpoint()
          best = best.join(improved, Seq("id"), "left_anti")
            .unionByName(improved).localCheckpoint()
          frontier = improved
        }
        edges.unpersist(blocking = false)
        best.orderBy($"id")
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }))

  /** The oracle replays the identical integer iteration as a recursive
    * CTE. The recursive member may reference the working table only
    * once, so it exploits the tree's arithmetic parent (id // 2) to
    * look up each node's single rank source; node 0 (the root, no
    * incoming edge) joins its own previous row and contributes 0. */
  val oracle: Map[String, String] = Map(
    // One-edge-at-a-time parent-chain walk; depth = steps until the
    // root. The O(depth) sequential formulation whose agreement
    // proves the engine's O(log depth) doubling composition exact.
    "q191_pointer_doubling" ->
      """WITH RECURSIVE cust AS (SELECT c_custkey AS u FROM customer),
        |walk AS (
        |  SELECT u AS id, u AS cur, CAST(0 AS BIGINT) AS d FROM cust
        |  UNION ALL
        |  SELECT id, CAST(floor(cur/2) AS BIGINT), d + 1
        |  FROM walk WHERE cur > 1)
        |SELECT id, cur AS root, d AS depth FROM walk
        |QUALIFY row_number() OVER (PARTITION BY id ORDER BY d DESC) = 1
        |ORDER BY id""".stripMargin,

    // All ≤6-hop TIME-RESPECTING walks (each edge no earlier than the
    // arrival before it) with recursive-UNION dedup; min arrival per
    // node — the cross-formulation proof of the frontier relaxation.
    "q219_temporal_reach" ->
      """WITH RECURSIVE cust AS (SELECT c_custkey AS u FROM customer),
        |edges AS (
        |  SELECT CAST(floor(u/2) AS BIGINT) AS src, u AS dst,
        |    1 + u % 28 AS t
        |  FROM cust WHERE u >= 2),
        |walk AS (
        |  SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS arr, 0 AS depth
        |  UNION
        |  SELECT e.dst, CAST(e.t AS BIGINT), walk.depth + 1
        |  FROM walk JOIN edges e ON e.src = walk.id
        |  WHERE walk.depth < 6 AND e.t >= walk.arr)
        |SELECT id, min(arr) AS arr FROM walk GROUP BY id ORDER BY id"""
        .stripMargin,

    // Identical edge set, degree counts, both-orientation pairs, and
    // the identical √a·√b Pearson tail (HUGEINT moments → one double
    // conversion each).
    "q214_assortativity" ->
      """WITH cust AS (SELECT c_custkey AS u FROM customer),
        |raw_e AS (
        |  SELECT u, CAST(floor(u/2) AS BIGINT) AS p FROM cust
        |  UNION ALL
        |  SELECT u, CAST(floor(u/3) AS BIGINT) AS p FROM cust),
        |edges AS (
        |  SELECT DISTINCT least(u, p) AS lo, greatest(u, p) AS hi
        |  FROM raw_e WHERE p >= 1 AND p <> u),
        |deg AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT lo AS id FROM edges
        |    UNION ALL SELECT hi AS id FROM edges) t
        |  GROUP BY id),
        |dd AS (
        |  SELECT dl.deg AS dlo, dh.deg AS dhi
        |  FROM edges e
        |  JOIN deg dl ON dl.id = e.lo
        |  JOIN deg dh ON dh.id = e.hi),
        |pairs AS (
        |  SELECT dlo AS x, dhi AS y FROM dd
        |  UNION ALL SELECT dhi AS x, dlo AS y FROM dd),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(y * y) AS DOUBLE) AS syy
        |  FROM pairs)
        |SELECT n AS n_pairs,
        |  floor(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |       * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
        |    * 1000000.0) / 1000000.0 AS assortativity
        |FROM m""".stripMargin,

    // All ≤10-hop walks from node 1 with recursive-UNION dedup;
    // min(dist) per node = BFS layer. Different formulation from the
    // engine's first-touch frontier — agreement proves them equal.
    "q153_bfs_layers" ->
      """WITH RECURSIVE cust AS (SELECT c_custkey AS u FROM customer),
        |raw_e AS (
        |  SELECT u, CAST(floor(u/2) AS BIGINT) AS p FROM cust
        |  UNION ALL
        |  SELECT u, CAST(floor(u/3) AS BIGINT) AS p FROM cust),
        |edges AS (
        |  SELECT DISTINCT least(u, p) AS lo, greatest(u, p) AS hi
        |  FROM raw_e WHERE p >= 1 AND p <> u),
        |nbrs AS (
        |  SELECT lo AS id, hi AS nb FROM edges
        |  UNION ALL SELECT hi AS id, lo AS nb FROM edges),
        |walk AS (
        |  SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist
        |  UNION
        |  SELECT n.nb AS id, walk.dist + 1 AS dist
        |  FROM walk JOIN nbrs n ON n.id = walk.id
        |  WHERE walk.dist < 10)
        |SELECT id, min(dist) AS dist FROM walk
        |GROUP BY id ORDER BY id""".stripMargin,

    "q157_sssp_weighted" ->
      """WITH RECURSIVE cust AS (SELECT c_custkey AS u FROM customer),
        |raw_e AS (
        |  SELECT u, CAST(floor(u/2) AS BIGINT) AS p FROM cust
        |  UNION ALL
        |  SELECT u, CAST(floor(u/3) AS BIGINT) AS p FROM cust),
        |edges AS (
        |  SELECT DISTINCT least(u, p) AS lo, greatest(u, p) AS hi
        |  FROM raw_e WHERE p >= 1 AND p <> u),
        |wedges AS (
        |  SELECT lo, hi, 1 + (lo + hi) % 7 AS w FROM edges),
        |nbrs AS (
        |  SELECT lo AS id, hi AS nb, w FROM wedges
        |  UNION ALL SELECT hi AS id, lo AS nb, w FROM wedges),
        |walk AS (
        |  SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS cost,
        |    0 AS depth
        |  UNION
        |  SELECT n.nb AS id, walk.cost + n.w AS cost, walk.depth + 1
        |  FROM walk JOIN nbrs n ON n.id = walk.id
        |  WHERE walk.depth < 10)
        |SELECT id, min(cost) AS dist FROM walk
        |GROUP BY id ORDER BY id""".stripMargin,

    "q158_onion_layers" -> {
      // each peel CTE is MATERIALIZED — inlined, the chain re-expands
      // e_{i-1} four times per round (4^12 scans)
      val peels = (1 to 12).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT id, count(*) AS deg FROM (
           |    SELECT lo AS id FROM e${i - 1}
           |    UNION ALL SELECT hi AS id FROM e${i - 1}) t
           |  GROUP BY id),
           |k$i AS MATERIALIZED (SELECT id FROM d$i WHERE deg >= 4),
           |e$i AS MATERIALIZED (
           |  SELECT lo, hi FROM e${i - 1}
           |  WHERE lo IN (SELECT id FROM k$i)
           |    AND hi IN (SELECT id FROM k$i))""".stripMargin
      }.mkString(",\n")
      val layerArms = (2 to 12).map { i =>
        s"""UNION ALL SELECT id, CAST($i AS BIGINT) FROM k${i - 1}
           |  WHERE id NOT IN (SELECT id FROM k$i)""".stripMargin
      }.mkString("\n")
      s"""WITH cust AS (SELECT c_custkey AS u FROM customer),
         |raw_e AS (
         |  SELECT u, CAST(floor(u/2) AS BIGINT) AS p FROM cust
         |  UNION ALL
         |  SELECT u, CAST(floor(u/3) AS BIGINT) AS p FROM cust
         |  UNION ALL
         |  SELECT u, CAST(floor(u/5) AS BIGINT) AS p FROM cust),
         |e0 AS MATERIALIZED (
         |  SELECT DISTINCT least(u, p) AS lo, greatest(u, p) AS hi
         |  FROM raw_e WHERE p >= 1 AND p <> u),
         |d0 AS MATERIALIZED (
         |  SELECT id, CAST(count(*) AS BIGINT) AS deg0 FROM (
         |    SELECT lo AS id FROM e0
         |    UNION ALL SELECT hi AS id FROM e0) t
         |  GROUP BY id),
         |$peels,
         |layers AS (
         |  SELECT id, CAST(1 AS BIGINT) AS layer FROM d0
         |    WHERE id NOT IN (SELECT id FROM k1)
         |  $layerArms
         |  UNION ALL SELECT id, CAST(99 AS BIGINT) FROM k12)
         |SELECT layers.id, layers.layer, d0.deg0
         |FROM layers JOIN d0 ON d0.id = layers.id
         |ORDER BY layers.id""".stripMargin
    },

    // Naive three-way self-join over the canonical (lo < hi) edge set —
    // deliberately NOT the oriented enumeration, so agreement proves
    // the orientation trick lossless. Triangle {a<b<c} ⇔ edges (a,b),
    // (b,c), (a,c); each counted once. The clustering coefficient is
    // exact-int→double casts + one multiply + one divide (single IEEE
    // ops, engine-identical).
    "q143_triangles" ->
      """WITH cust AS (SELECT c_custkey AS u FROM customer),
        |raw_e AS (
        |  SELECT u, CAST(floor(u/2) AS BIGINT) AS p FROM cust
        |  UNION ALL
        |  SELECT u, CAST(floor(u/3) AS BIGINT) AS p FROM cust),
        |edges AS (
        |  SELECT DISTINCT least(u, p) AS lo, greatest(u, p) AS hi
        |  FROM raw_e WHERE p >= 1 AND p <> u),
        |deg AS (
        |  SELECT id, count(*) AS deg FROM (
        |    SELECT lo AS id FROM edges
        |    UNION ALL SELECT hi AS id FROM edges) t GROUP BY id),
        |tris AS (
        |  SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
        |  FROM edges e1
        |  JOIN edges e2 ON e2.lo = e1.hi
        |  JOIN edges e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
        |pern AS (
        |  SELECT id, count(*) AS tri FROM (
        |    SELECT x AS id FROM tris
        |    UNION ALL SELECT y AS id FROM tris
        |    UNION ALL SELECT z AS id FROM tris) t GROUP BY id)
        |SELECT deg.id, deg.deg, CAST(coalesce(pern.tri, 0) AS BIGINT) AS tri,
        |  CASE WHEN deg.deg >= 2
        |    THEN CAST(2 AS DOUBLE) * CAST(coalesce(pern.tri, 0) AS DOUBLE)
        |         / CAST(deg.deg * (deg.deg - 1) AS DOUBLE)
        |    ELSE 0.0 END AS clustering
        |FROM deg LEFT JOIN pern ON pern.id = deg.id
        |ORDER BY deg.id""".stripMargin,

    "q97_pagerank" ->
      s"""WITH RECURSIVE
         |edges AS (
         |  SELECT c_custkey AS referred,
         |         CAST(floor(c_custkey/2) AS BIGINT) AS referrer
         |  FROM customer WHERE c_custkey >= 1),
         |nodes AS (
         |  -- explicit DISTINCT: under WITH RECURSIVE, a bare UNION in
         |  -- a helper CTE parses as an anchor/recursive split and
         |  -- skips dedup
         |  SELECT DISTINCT id FROM (
         |    SELECT referred AS id FROM edges
         |    UNION ALL SELECT referrer FROM edges) u),
         |outdeg AS (SELECT referrer AS id, count(*) AS od
         |           FROM edges GROUP BY referrer),
         |pr(iter, id, r) AS (
         |  SELECT 0, id, CAST(1000000 AS BIGINT) FROM nodes
         |  UNION ALL
         |  SELECT p.iter + 1, n.id,
         |    CAST(150000 + (85 * (CASE WHEN n.id >= 1 THEN p.r // o.od
         |                              ELSE 0 END)) // 100 AS BIGINT)
         |  FROM nodes n
         |  JOIN pr p ON p.id = n.id // 2
         |  JOIN outdeg o ON o.id = p.id
         |  WHERE p.iter < $Iters)
         |SELECT id, r AS rank_micro, CAST(r AS DOUBLE)/1000000.0 AS rank
         |FROM pr WHERE iter = $Iters ORDER BY id""".stripMargin,

    // q135's oracle is the FULL-graph fixpoint: the same integer map as
    // q97 iterated to convergence (depth ≤ ⌈log2 max_key⌉ levels; each
    // level stabilizes one round after its parent, and the root is
    // already fixed at the uniform init — 60 rounds is far past
    // convergence at every sf). Matching it hash-exactly proves the
    // Spark side's delta-convergence from the stored seed fixpoint
    // lands on the full recompute's answer, bit for bit.
    "q135_incremental_pagerank" ->
      """WITH RECURSIVE
        |edges AS (
        |  SELECT c_custkey AS referred,
        |         CAST(floor(c_custkey/2) AS BIGINT) AS referrer
        |  FROM customer WHERE c_custkey >= 1),
        |nodes AS (
        |  SELECT DISTINCT id FROM (
        |    SELECT referred AS id FROM edges
        |    UNION ALL SELECT referrer FROM edges) u),
        |outdeg AS (SELECT referrer AS id, count(*) AS od
        |           FROM edges GROUP BY referrer),
        |pr(iter, id, r) AS (
        |  SELECT 0, id, CAST(1000000 AS BIGINT) FROM nodes
        |  UNION ALL
        |  SELECT p.iter + 1, n.id,
        |    CAST(150000 + (85 * (CASE WHEN n.id >= 1 THEN p.r // o.od
        |                              ELSE 0 END)) // 100 AS BIGINT)
        |  FROM nodes n
        |  JOIN pr p ON p.id = n.id // 2
        |  JOIN outdeg o ON o.id = p.id
        |  WHERE p.iter < 60)
        |SELECT id, r AS rank_micro, CAST(r AS DOUBLE)/1000000.0 AS rank
        |FROM pr WHERE iter = 60 ORDER BY id""".stripMargin,

    "q104_ppr" ->
      s"""WITH RECURSIVE
         |edges AS (
         |  SELECT c_custkey AS referred,
         |         CAST(floor(c_custkey/2) AS BIGINT) AS referrer
         |  FROM customer WHERE c_custkey >= 1),
         |nodes AS (
         |  SELECT DISTINCT id FROM (
         |    SELECT referred AS id FROM edges
         |    UNION ALL SELECT referrer FROM edges) u),
         |outdeg AS (SELECT referrer AS id, count(*) AS od
         |           FROM edges GROUP BY referrer),
         |pr(iter, id, r) AS (
         |  SELECT 0, id,
         |    CAST(CASE WHEN id = 10 THEN 1000000 ELSE 0 END AS BIGINT)
         |  FROM nodes
         |  UNION ALL
         |  SELECT p.iter + 1, n.id,
         |    CAST(CASE WHEN n.id = 10 THEN 150000 ELSE 0 END
         |         + (85 * (CASE WHEN n.id >= 1 THEN p.r // o.od
         |                       ELSE 0 END)) // 100 AS BIGINT)
         |  FROM nodes n
         |  JOIN pr p ON p.id = n.id // 2
         |  JOIN outdeg o ON o.id = p.id
         |  WHERE p.iter < $Iters)
         |SELECT id, r AS rank_micro, CAST(r AS DOUBLE)/1000000.0 AS rank
         |FROM pr WHERE iter = $Iters ORDER BY id""".stripMargin,

    // Unrolled 3-round integer HITS — each round is the same
    // (LEFT JOIN edges, aggregate, coalesce-to-0) pair the DataFrame
    // loop runs; sums CAST back to BIGINT because DuckDB widens
    // sum(BIGINT) to HUGEINT.
    // q138's oracle = q114's full-graph 3-round replay: matching it
    // proves the patched-history incremental path lands on the full
    // recompute exactly.
    "q138_incremental_hits" ->
      """WITH edges AS (
        |  SELECT CAST(floor(c_custkey/2) AS BIGINT) AS src,
        |         c_custkey AS dst
        |  FROM customer WHERE c_custkey >= 1),
        |nodes AS (
        |  SELECT DISTINCT id FROM (
        |    SELECT src AS id FROM edges
        |    UNION ALL SELECT dst FROM edges) u),
        |h0 AS (SELECT id, CAST(1 AS BIGINT) AS h FROM nodes),
        |a1 AS (SELECT n.id, CAST(coalesce(sum(h0.h), 0) AS BIGINT) AS a
        |       FROM nodes n LEFT JOIN edges e ON e.dst = n.id
        |       LEFT JOIN h0 ON h0.id = e.src GROUP BY n.id),
        |h1 AS (SELECT n.id, CAST(coalesce(sum(a1.a), 0) AS BIGINT) AS h
        |       FROM nodes n LEFT JOIN edges e ON e.src = n.id
        |       LEFT JOIN a1 ON a1.id = e.dst GROUP BY n.id),
        |a2 AS (SELECT n.id, CAST(coalesce(sum(h1.h), 0) AS BIGINT) AS a
        |       FROM nodes n LEFT JOIN edges e ON e.dst = n.id
        |       LEFT JOIN h1 ON h1.id = e.src GROUP BY n.id),
        |h2 AS (SELECT n.id, CAST(coalesce(sum(a2.a), 0) AS BIGINT) AS h
        |       FROM nodes n LEFT JOIN edges e ON e.src = n.id
        |       LEFT JOIN a2 ON a2.id = e.dst GROUP BY n.id),
        |a3 AS (SELECT n.id, CAST(coalesce(sum(h2.h), 0) AS BIGINT) AS a
        |       FROM nodes n LEFT JOIN edges e ON e.dst = n.id
        |       LEFT JOIN h2 ON h2.id = e.src GROUP BY n.id),
        |h3 AS (SELECT n.id, CAST(coalesce(sum(a3.a), 0) AS BIGINT) AS h
        |       FROM nodes n LEFT JOIN edges e ON e.src = n.id
        |       LEFT JOIN a3 ON a3.id = e.dst GROUP BY n.id)
        |SELECT n.id, a3.a AS authority, h3.h AS hub
        |FROM nodes n JOIN a3 ON a3.id = n.id JOIN h3 ON h3.id = n.id
        |ORDER BY n.id""".stripMargin,

    "q114_hits" ->
      """WITH edges AS (
        |  SELECT CAST(floor(c_custkey/2) AS BIGINT) AS src,
        |         c_custkey AS dst
        |  FROM customer WHERE c_custkey >= 1),
        |nodes AS (
        |  SELECT DISTINCT id FROM (
        |    SELECT src AS id FROM edges
        |    UNION ALL SELECT dst FROM edges) u),
        |h0 AS (SELECT id, CAST(1 AS BIGINT) AS h FROM nodes),
        |a1 AS (SELECT n.id, CAST(coalesce(sum(h0.h), 0) AS BIGINT) AS a
        |       FROM nodes n LEFT JOIN edges e ON e.dst = n.id
        |       LEFT JOIN h0 ON h0.id = e.src GROUP BY n.id),
        |h1 AS (SELECT n.id, CAST(coalesce(sum(a1.a), 0) AS BIGINT) AS h
        |       FROM nodes n LEFT JOIN edges e ON e.src = n.id
        |       LEFT JOIN a1 ON a1.id = e.dst GROUP BY n.id),
        |a2 AS (SELECT n.id, CAST(coalesce(sum(h1.h), 0) AS BIGINT) AS a
        |       FROM nodes n LEFT JOIN edges e ON e.dst = n.id
        |       LEFT JOIN h1 ON h1.id = e.src GROUP BY n.id),
        |h2 AS (SELECT n.id, CAST(coalesce(sum(a2.a), 0) AS BIGINT) AS h
        |       FROM nodes n LEFT JOIN edges e ON e.src = n.id
        |       LEFT JOIN a2 ON a2.id = e.dst GROUP BY n.id),
        |a3 AS (SELECT n.id, CAST(coalesce(sum(h2.h), 0) AS BIGINT) AS a
        |       FROM nodes n LEFT JOIN edges e ON e.dst = n.id
        |       LEFT JOIN h2 ON h2.id = e.src GROUP BY n.id),
        |h3 AS (SELECT n.id, CAST(coalesce(sum(a3.a), 0) AS BIGINT) AS h
        |       FROM nodes n LEFT JOIN edges e ON e.src = n.id
        |       LEFT JOIN a3 ON a3.id = e.dst GROUP BY n.id)
        |SELECT n.id, a3.a AS authority, h3.h AS hub
        |FROM nodes n JOIN a3 ON a3.id = n.id JOIN h3 ON h3.id = n.id
        |ORDER BY n.id""".stripMargin,

    // Three synchronous LPA rounds unrolled as chained CTEs, identical
    // (count DESC, label) argmax tie-break per round.
    "q171_label_prop" ->
      """WITH cust AS (SELECT c_custkey AS u FROM customer),
        |raw_e AS (
        |  SELECT u, CAST(floor(u/2) AS BIGINT) AS p FROM cust
        |  UNION ALL
        |  SELECT u, CAST(floor(u/3) AS BIGINT) AS p FROM cust),
        |und AS (
        |  SELECT DISTINCT least(u, p) AS lo, greatest(u, p) AS hi
        |  FROM raw_e WHERE p >= 1 AND p <> u),
        |nbr AS (
        |  SELECT lo AS id, hi AS nb FROM und
        |  UNION ALL
        |  SELECT hi AS id, lo AS nb FROM und),
        |l0 AS (SELECT DISTINCT id, id AS lab FROM nbr),
        |l1 AS (
        |  SELECT id, nlab AS lab FROM (
        |    SELECT n.id AS id, l.lab AS nlab, count(*) AS cnt
        |    FROM nbr n JOIN l0 l ON l.id = n.nb GROUP BY n.id, l.lab) t
        |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY cnt DESC, nlab) = 1),
        |l2 AS (
        |  SELECT id, nlab AS lab FROM (
        |    SELECT n.id AS id, l.lab AS nlab, count(*) AS cnt
        |    FROM nbr n JOIN l1 l ON l.id = n.nb GROUP BY n.id, l.lab) t
        |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY cnt DESC, nlab) = 1),
        |l3 AS (
        |  SELECT id, nlab AS lab FROM (
        |    SELECT n.id AS id, l.lab AS nlab, count(*) AS cnt
        |    FROM nbr n JOIN l2 l ON l.id = n.nb GROUP BY n.id, l.lab) t
        |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY cnt DESC, nlab) = 1),
        |cs AS (
        |  SELECT lab, CAST(count(*) AS BIGINT) AS community_size
        |  FROM l3 GROUP BY lab)
        |SELECT l3.id, l3.lab AS label, cs.community_size
        |FROM l3 JOIN cs ON cs.lab = l3.lab
        |ORDER BY l3.id""".stripMargin,

    // The recursive walk IS the ancestor enumeration: each step halves
    // v and multiplies in that edge's quantity — cross-formulation
    // proof of the map-side fold.
    "q188_bom_rollup" ->
      """WITH RECURSIVE cust AS (SELECT c_custkey AS u FROM customer),
        |nodes AS (SELECT u, (u % 100) + 1 AS cost FROM cust),
        |walk AS (
        |  SELECT u AS d, cost, u AS v, CAST(1 AS BIGINT) AS p,
        |    0 AS step
        |  FROM nodes
        |  UNION ALL
        |  SELECT d, cost, v // 2, p * (1 + v % 3), step + 1
        |  FROM walk WHERE v > 1),
        |contrib AS (
        |  SELECT v AS a, CAST(count(*) AS BIGINT) AS n_desc,
        |    CAST(sum(cost * p) AS BIGINT) AS desc_cost
        |  FROM walk WHERE step >= 1 GROUP BY v)
        |SELECT n.u AS node, CAST(n.cost AS BIGINT) AS own_cost,
        |  coalesce(c.n_desc, 0) AS n_desc,
        |  CAST(n.cost + coalesce(c.desc_cost, 0) AS BIGINT) AS rollup_cost
        |FROM nodes n LEFT JOIN contrib c ON c.a = n.u
        |ORDER BY node""".stripMargin,

    // The 4 half-rounds unrolled: uK computes the updating parity's
    // argmax from l(K-1); lK carries the other parity forward.
    "q181_label_prop_semi" ->
      """WITH cust AS (SELECT c_custkey AS u FROM customer),
        |raw_e AS (
        |  SELECT u, CAST(floor(u/2) AS BIGINT) AS p FROM cust
        |  UNION ALL
        |  SELECT u, CAST(floor(u/3) AS BIGINT) AS p FROM cust),
        |und AS (
        |  SELECT DISTINCT least(u, p) AS lo, greatest(u, p) AS hi
        |  FROM raw_e WHERE p >= 1 AND p <> u),
        |nbr AS (
        |  SELECT lo AS id, hi AS nb FROM und
        |  UNION ALL
        |  SELECT hi AS id, lo AS nb FROM und),
        |l0 AS (SELECT DISTINCT id, id AS lab FROM nbr),
        |u1 AS (
        |  SELECT id, nlab AS lab FROM (
        |    SELECT n.id AS id, l.lab AS nlab, count(*) AS cnt
        |    FROM nbr n JOIN l0 l ON l.id = n.nb
        |    WHERE n.id % 2 = 1 GROUP BY n.id, l.lab) t
        |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY cnt DESC, nlab) = 1),
        |l1 AS (SELECT id, lab FROM l0 WHERE id % 2 = 0
        |       UNION ALL SELECT id, lab FROM u1),
        |u2 AS (
        |  SELECT id, nlab AS lab FROM (
        |    SELECT n.id AS id, l.lab AS nlab, count(*) AS cnt
        |    FROM nbr n JOIN l1 l ON l.id = n.nb
        |    WHERE n.id % 2 = 0 GROUP BY n.id, l.lab) t
        |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY cnt DESC, nlab) = 1),
        |l2 AS (SELECT id, lab FROM l1 WHERE id % 2 = 1
        |       UNION ALL SELECT id, lab FROM u2),
        |u3 AS (
        |  SELECT id, nlab AS lab FROM (
        |    SELECT n.id AS id, l.lab AS nlab, count(*) AS cnt
        |    FROM nbr n JOIN l2 l ON l.id = n.nb
        |    WHERE n.id % 2 = 1 GROUP BY n.id, l.lab) t
        |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY cnt DESC, nlab) = 1),
        |l3 AS (SELECT id, lab FROM l2 WHERE id % 2 = 0
        |       UNION ALL SELECT id, lab FROM u3),
        |u4 AS (
        |  SELECT id, nlab AS lab FROM (
        |    SELECT n.id AS id, l.lab AS nlab, count(*) AS cnt
        |    FROM nbr n JOIN l3 l ON l.id = n.nb
        |    WHERE n.id % 2 = 0 GROUP BY n.id, l.lab) t
        |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY cnt DESC, nlab) = 1),
        |l4 AS (SELECT id, lab FROM l3 WHERE id % 2 = 1
        |       UNION ALL SELECT id, lab FROM u4),
        |cs AS (
        |  SELECT lab, CAST(count(*) AS BIGINT) AS community_size
        |  FROM l4 GROUP BY lab)
        |SELECT l4.id, l4.lab AS label, cs.community_size
        |FROM l4 JOIN cs ON cs.lab = l4.lab
        |ORDER BY l4.id""".stripMargin)
}
