package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.{Tables => T}

/** Text-analysis operators over the documents table (SURVEY.md §2.10):
  * exact dedup, token statistics, quality scoring + language-ID
  * heuristics, and document fingerprinting — the per-document stages of
  * a training-data pipeline. All pure `functions._` expressions
  * (codegen'd, shuffle-free per-row work except the final ordering), so
  * the shapes stream over 100 TB of text without skew concerns.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Exact dedup idiom: keep the first row per key via
    // row_number()=1 (partition-local, deterministic tie-break).
    "q50_exact_dedup" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"lang", $"source").orderBy($"doc_id")
      T.documents(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("n_docs", count(lit(1)).over(Window.partitionBy($"lang", $"source")))
        .filter($"rn" === 1)
        .select($"lang", $"source", $"doc_id".as("keep_id"), $"n_docs")
        .orderBy($"lang", $"source")
    }),

    // Token counting (whitespace tokenizer) + length statistics.
    "q54_token_stats" -> ((s, dir) => {
      import s.implicits._
      val toks = size(split(trim($"text"), "\\s+")).cast("long")
      val nonSpace = length(regexp_replace($"text", "\\s", "")).cast("long")
      T.documents(s, dir)
        .select($"doc_id", $"lang", $"source",
          length($"text").cast("long").as("n_chars_actual"),
          toks.as("n_tokens"),
          nonSpace.as("n_nonspace"),
          (nonSpace.cast("double") / toks.cast("double")).as("avg_token_len"))
        .orderBy($"doc_id")
    }),

    // Quality scoring + n-gram-free language-ID heuristic (stopword
    // hit counting via the replace trick — pure scalar, no explode).
    "q55_text_quality" -> ((s, dir) => {
      import s.implicits._
      val padded = concat(lit(" "), $"text", lit(" "))
      def hits(wrd: String) =
        ((length(padded) - length(regexp_replace(padded, s" $wrd ", " "))) /
          lit(wrd.length + 1)).cast("long")
      val nTok = size(split(trim($"text"), "\\s+")).cast("long")
      val digitRatio = length(regexp_replace($"text", "[^0-9]", "")).cast("double") /
        length($"text").cast("double")
      val stopHits = hits("the") + hits("a") + hits("of")
      T.documents(s, dir)
        .select($"doc_id", $"lang",
          nTok.as("n_tokens"),
          stopHits.as("stopword_hits"),
          digitRatio.as("digit_ratio"),
          (least(lit(1.0), nTok.cast("double") / 50.0) * (lit(1.0) - digitRatio))
            .as("quality_score"),
          when(stopHits > 0, "en").otherwise("unknown").as("lang_guess"))
        .orderBy($"doc_id")
    }),

    // Document fingerprint: whitespace-normalized md5 + 4-hex-char
    // prefix bucket (the shard key a 100 TB dedup would partition by).
    "q56_fingerprint" -> ((s, dir) => {
      import s.implicits._
      val fp = md5(lower(trim(regexp_replace($"text", "\\s+", " "))))
      T.documents(s, dir)
        .select($"doc_id", fp.as("fingerprint"),
          substring(fp, 1, 4).as("bucket"))
        .orderBy($"doc_id")
    }))

  val oracle: Map[String, String] = Map(
    "q50_exact_dedup" ->
      """SELECT lang, source, keep_id, n_docs FROM (
        |  SELECT lang, source, doc_id AS keep_id,
        |    row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang, source) AS n_docs
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY lang, source""".stripMargin,

    "q54_token_stats" ->
      """SELECT doc_id, lang, source,
        |  CAST(length(text) AS BIGINT) AS n_chars_actual,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_nonspace,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |    / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q55_text_quality" ->
      """WITH q AS (
        |  SELECT doc_id, lang, text, ' ' || text || ' ' AS padded,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS digit_ratio
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, lang, n_tokens, digit_ratio,
        |    CAST((length(padded) - length(regexp_replace(padded, ' the ', ' ', 'g'))) / 4 AS BIGINT)
        |    + CAST((length(padded) - length(regexp_replace(padded, ' a ', ' ', 'g'))) / 2 AS BIGINT)
        |    + CAST((length(padded) - length(regexp_replace(padded, ' of ', ' ', 'g'))) / 3 AS BIGINT)
        |      AS stopword_hits
        |  FROM q)
        |SELECT doc_id, lang, n_tokens, stopword_hits, digit_ratio,
        |  least(1.0, CAST(n_tokens AS DOUBLE)/50.0) * (1.0 - digit_ratio) AS quality_score,
        |  CASE WHEN stopword_hits > 0 THEN 'en' ELSE 'unknown' END AS lang_guess
        |FROM h ORDER BY doc_id""".stripMargin,

    "q56_fingerprint" ->
      """SELECT doc_id,
        |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
        |  substr(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), 1, 4) AS bucket
        |FROM documents ORDER BY doc_id""".stripMargin)
}
