package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Tables => T}

/** The flagship multi-stage corpus refinery — the full training-data
  * preparation funnel composed from the individually-verified stages:
  *
  *   raw training docs (doc_id >= 25; 0-24 are the held-out eval set)
  *     → quality filter        (TextOps.qualitySignals, q58)
  *     → exact dedup           (fingerprint min-doc election, q56/q50)
  *     → near-dup dedup        (LSH → connected components → canonical
  *                              doc per cluster, q51/q57)
  *     → decontamination       (benchmark shingle overlap, q74)
  *     → per-(lang, source) funnel census with surviving token mass.
  *
  * Every stage decision is a boolean on one row of the per-doc spine,
  * so the whole funnel is ONE wide per-doc table aggregated once at
  * the end — stages don't re-scan the corpus. At 100 TB: the corpus is
  * touched by the signal passes (token counts, fingerprints, shingle
  * minhashes — each a scan + combine-able aggregation); the cross-doc
  * work (cluster propagation, dedup election) runs on the thin
  * per-doc/per-pair tables that came out of those scans.
  *
  * The whole funnel is DuckDB-oracle-exact end-to-end (q75): integer
  * counts all the way down, so composition preserves bit-exactness.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  /** Per-document stage flags: (doc_id, lang, source, n_tokens,
    * q_keep, e_keep, n_keep, c_keep) — each flag implies the previous. */
  def stageFlags(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = T.documents(s, dir).filter($"doc_id" >= 25)
      .select($"doc_id", $"lang", $"source",
        md5(lower(trim(regexp_replace($"text", "\\s+", " ")))).as("fp"))
    val sig = TextOps.qualitySignals(s, dir)
      .select($"doc_id", $"n_tokens", $"keep".as("q_keep"))
    // exact dedup election: the min doc_id per fingerprint AMONG
    // quality survivors is the exact-stage canonical
    val spine = docs.join(sig, "doc_id")
    val exactMin = spine.filter($"q_keep")
      .groupBy($"fp").agg(min($"doc_id").as("e_min"))
    // near-dup election: the min doc_id per LSH component AMONG
    // exact-stage survivors
    val comp = Dedup.components(s, dir)
    val withExact = spine
      .join(broadcast(exactMin), Seq("fp"), "left")
      .withColumn("e_keep", $"q_keep" && $"doc_id" === $"e_min")
      .join(comp, "doc_id")
    val nearMin = withExact.filter($"e_keep")
      .groupBy($"cluster_id").agg(min($"doc_id").as("n_min"))
    withExact
      .join(broadcast(nearMin), Seq("cluster_id"), "left")
      .withColumn("n_keep", $"e_keep" && $"doc_id" === $"n_min")
      .join(Dedup.contaminationCounts(s, dir), Seq("doc_id"), "left")
      .withColumn("c_keep", $"n_keep" && coalesce($"n_overlap", lit(0L)) === 0L)
      .select($"doc_id", $"lang", $"source", $"n_tokens",
        $"q_keep", $"e_keep", $"n_keep", $"c_keep")
  }

  /** The funnel census: per (lang, source), how many docs survive each
    * stage and how much token mass reaches the end. */
  def refinery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def n(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    stageFlags(s, dir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        n($"q_keep").as("n_quality"),
        n($"e_keep").as("n_exact"),
        n($"n_keep").as("n_neardup"),
        n($"c_keep").as("n_clean"),
        sum(when($"c_keep", $"n_tokens").otherwise(0L)).as("clean_tokens"))
      .orderBy($"lang", $"source")
  }

  /** Refinery v2: the q75 funnel extended with the round-4 fluency
    * gate — after decontamination, documents must also clear the
    * corpus-trained bigram LM score (q118's spine, mean conditional
    * log-prob ≥ −3.42; the gate compares the UNROUNDED mean, which is
    * identical in both engines because the numerator is an exact
    * integer micro-nat sum). Same single per-doc spine discipline:
    * fluency is one more boolean column, the census one more rollup. */
  def refineryV2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fl = TextOps.fluencySpine(s, dir)
      .select($"doc_id",
        ($"s".cast("double") / 1e6 / $"n_bigrams".cast("double")).as("mean_lp"))
    def n(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    stageFlags(s, dir)
      .join(fl, Seq("doc_id"), "left")
      .withColumn("f_keep",
        $"c_keep" && coalesce($"mean_lp" >= -3.42, lit(false)))
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        n($"q_keep").as("n_quality"),
        n($"e_keep").as("n_exact"),
        n($"n_keep").as("n_neardup"),
        n($"c_keep").as("n_clean"),
        n($"f_keep").as("n_fluent"),
        sum(when($"f_keep", $"n_tokens").otherwise(0L)).as("fluent_tokens"))
      .orderBy($"lang", $"source")
  }

  val queries: Map[String, Q] = Map(
    "q75_corpus_refinery" -> ((s, dir) => refinery(s, dir)),
    "q119_refinery_fluency" -> ((s, dir) => refineryV2(s, dir)))

  /** Shared oracle CTE prefix (through the near-dup election):
    * quality CTEs from q58, fingerprint election from q56/q50,
    * recursive-reachability components from q57, contamination probe
    * from q74. q75 and q119 append their own flags/census on top. */
  private val OracleCtes =
    """WITH RECURSIVE
        |tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |tc AS (SELECT doc_id, w, count(*) AS cnt FROM tok GROUP BY doc_id, w),
        |sig0 AS (SELECT doc_id,
        |    CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    count(*) AS n_distinct,
        |    max(cnt) AS top_cnt,
        |    CAST(sum(length(w) * cnt) AS BIGINT) AS tok_chars
        |  FROM tc GROUP BY doc_id),
        |sig AS (SELECT doc_id, n_tokens,
        |    (n_tokens BETWEEN 20 AND 80)
        |      AND CAST(tok_chars AS DOUBLE)/CAST(n_tokens AS DOUBLE) >= 4.0
        |      AND CAST(tok_chars AS DOUBLE)/CAST(n_tokens AS DOUBLE) <= 5.0
        |      AND 1.0 - CAST(n_distinct AS DOUBLE)/CAST(n_tokens AS DOUBLE) < 0.6
        |      AND CAST(top_cnt AS DOUBLE)/CAST(n_tokens AS DOUBLE) < 0.15 AS q_keep
        |  FROM sig0),
        |spine AS (
        |  SELECT d.doc_id, d.lang, d.source, s.n_tokens, s.q_keep,
        |    md5(lower(trim(regexp_replace(d.text, '\s+', ' ', 'g')))) AS fp
        |  FROM documents d JOIN sig s ON s.doc_id = d.doc_id
        |  WHERE d.doc_id >= 25),
        |toks2 AS (
        |  SELECT doc_id, w, ord,
        |    lead(w,1) OVER (PARTITION BY doc_id ORDER BY ord) AS w1,
        |    lead(w,2) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
        |  FROM (SELECT doc_id,
        |          unnest(string_split_regex(trim(text), '\s+')) AS w,
        |          generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS ord
        |        FROM documents) raw),
        |shingles AS (
        |  SELECT DISTINCT doc_id, w || ' ' || w1 || ' ' || w2 AS sh
        |  FROM toks2 WHERE w1 IS NOT NULL AND w2 IS NOT NULL),
        |sigs AS (
        |  SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || sh)) AS mh
        |  FROM shingles CROSS JOIN (SELECT unnest(range(8)) AS seed) s
        |  GROUP BY doc_id, seed),
        |bands AS (
        |  SELECT doc_id, CAST(floor(seed/2) AS BIGINT) AS band,
        |    max(CASE WHEN seed % 2 = 0 THEN mh END) || '|' ||
        |    max(CASE WHEN seed % 2 = 1 THEN mh END) AS bandkey
        |  FROM sigs GROUP BY doc_id, CAST(floor(seed/2) AS BIGINT)),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bandkey = b.bandkey AND a.doc_id < b.doc_id),
        |edges AS (
        |  SELECT doc1 AS a, doc2 AS b FROM pairs
        |  UNION ALL SELECT doc2, doc1 FROM pairs),
        |reach(src, dst) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
        |comp AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
        |bench AS (SELECT DISTINCT sh FROM shingles WHERE doc_id < 25),
        |hits AS (
        |  SELECT s.doc_id, count(*) AS n_overlap
        |  FROM shingles s JOIN bench b ON s.sh = b.sh
        |  WHERE s.doc_id >= 25 GROUP BY s.doc_id),
        |emin AS (
        |  SELECT fp, min(doc_id) AS e_min FROM spine WHERE q_keep GROUP BY fp),
        |withe AS (
        |  SELECT sp.*, c.cluster_id,
        |    sp.q_keep AND sp.doc_id = e.e_min AS e_keep
        |  FROM spine sp
        |  LEFT JOIN emin e ON e.fp = sp.fp
        |  JOIN comp c ON c.doc_id = sp.doc_id),
        |nmin AS (
        |  SELECT cluster_id, min(doc_id) AS n_min FROM withe WHERE e_keep
        |  GROUP BY cluster_id)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q75_corpus_refinery" -> (OracleCtes +
      """,
        |flags AS (
        |  SELECT w.lang, w.source, w.n_tokens, w.q_keep, w.e_keep,
        |    w.e_keep AND w.doc_id = n.n_min AS n_keep,
        |    w.e_keep AND w.doc_id = n.n_min
        |      AND coalesce(h.n_overlap, 0) = 0 AS c_keep
        |  FROM withe w
        |  LEFT JOIN nmin n ON n.cluster_id = w.cluster_id
        |  LEFT JOIN hits h ON h.doc_id = w.doc_id)
        |SELECT lang, source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN q_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
        |  CAST(sum(CASE WHEN e_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |  CAST(sum(CASE WHEN n_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
        |  CAST(sum(CASE WHEN c_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
        |  CAST(sum(CASE WHEN c_keep THEN n_tokens ELSE 0 END) AS BIGINT) AS clean_tokens
        |FROM flags GROUP BY lang, source ORDER BY lang, source""".stripMargin),

    // v2: the same funnel + the q118 fluency gate (mean bigram
    // conditional log-prob over the corpus LM, exact micro-nat sums).
    "q119_refinery_fluency" -> (OracleCtes +
      """,
        |bi2 AS (
        |  SELECT doc_id, w AS a, w1 AS b FROM toks2 WHERE w1 IS NOT NULL),
        |c_bi AS (SELECT a, b, count(*) AS c_ab FROM bi2 GROUP BY a, b),
        |c_uni AS (SELECT w AS a, count(*) AS c_a FROM tok GROUP BY w),
        |fl AS (
        |  SELECT bi2.doc_id,
        |    CAST(sum(CAST(round(ln(CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE))
        |      * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
        |      / CAST(count(*) AS DOUBLE) AS mean_lp
        |  FROM bi2 JOIN c_bi USING (a, b) JOIN c_uni USING (a)
        |  GROUP BY bi2.doc_id),
        |flags AS (
        |  SELECT w.lang, w.source, w.n_tokens, w.q_keep, w.e_keep,
        |    w.e_keep AND w.doc_id = n.n_min AS n_keep,
        |    w.e_keep AND w.doc_id = n.n_min
        |      AND coalesce(h.n_overlap, 0) = 0 AS c_keep,
        |    w.e_keep AND w.doc_id = n.n_min
        |      AND coalesce(h.n_overlap, 0) = 0
        |      AND coalesce(f.mean_lp >= -3.42, false) AS f_keep
        |  FROM withe w
        |  LEFT JOIN nmin n ON n.cluster_id = w.cluster_id
        |  LEFT JOIN hits h ON h.doc_id = w.doc_id
        |  LEFT JOIN fl f ON f.doc_id = w.doc_id)
        |SELECT lang, source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN q_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
        |  CAST(sum(CASE WHEN e_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |  CAST(sum(CASE WHEN n_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
        |  CAST(sum(CASE WHEN c_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
        |  CAST(sum(CASE WHEN f_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_fluent,
        |  CAST(sum(CASE WHEN f_keep THEN n_tokens ELSE 0 END) AS BIGINT) AS fluent_tokens
        |FROM flags GROUP BY lang, source ORDER BY lang, source""".stripMargin))
}
