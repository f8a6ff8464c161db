package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.{Tables => T}

/** Document chunking + context-window sequence packing — the two
  * operators that sit between a cleaned corpus and a trainer's data
  * loader. Neither exists in the reference (it stores raw text URLs,
  * render-complete-deploy.js:111); both are table stakes for an
  * LLM-data pipeline over 100 TB.
  *
  * Scale posture: chunking is pure map-side array work (explode of a
  * per-row sequence — no shuffle except the verification ordering);
  * packing partitions by source shard so the running-offset window is
  * per-shard parallel, never a global single-reducer sort.
  */
object Chunking {
  type Q = (SparkSession, String) => DataFrame

  /** Chunk length / stride in whitespace tokens (10-token overlap). */
  val ChunkLen = 50
  val Stride   = 40
  /** Packing context window in whitespace tokens. */
  val Ctx = 256L

  val queries: Map[String, Q] = Map(
    // Overlapping sliding-window chunking for embedding / retrieval
    // pipelines: each document yields ceil(n/stride) chunks of up to
    // ChunkLen tokens starting every Stride tokens. All work is
    // per-row higher-order array functions (split → sequence →
    // slice → join) inside whole-stage codegen; output rows carry
    // their provenance (doc_id, chunk_id, start token) so a 100 TB
    // run can join chunk-level scores back to documents without
    // re-tokenizing.
    "q90_doc_chunks" -> ((s, dir) => {
      import s.implicits._
      T.documents(s, dir)
        .select($"doc_id", split(trim($"text"), "\\s+").as("ws"))
        .select($"doc_id", $"ws",
          explode(sequence(lit(1), size($"ws"), lit(Stride))).as("start"))
        .select($"doc_id",
          (($"start" - 1) / Stride).cast("long").as("chunk_id"),
          $"start".cast("long").as("start_tok"),
          size(slice($"ws", $"start", lit(ChunkLen))).cast("long").as("n_chunk_tokens"),
          array_join(slice($"ws", $"start", lit(ChunkLen)), " ").as("chunk_text"))
        .orderBy($"doc_id", $"start_tok")
    }),

    // Concat-and-split sequence packing: within each source shard,
    // documents are laid end-to-end in doc_id order and cut into
    // Ctx-token context windows; a document belongs to the bin where
    // its first token lands. The running offset is a window sum
    // PARTITIONED BY source — each shard packs independently and in
    // parallel (the trainer reads one shard per worker), so there is
    // no global ordering bottleneck at any corpus size. Output is the
    // per-bin manifest a loader needs: how many docs, how many
    // tokens, and the doc_id span to fetch.
    "q91_sequence_pack" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      T.documents(s, dir)
        .select($"source", $"doc_id",
          size(split(trim($"text"), "\\s+")).cast("long").as("n_toks"))
        .withColumn("cum", sum($"n_toks").over(w))
        .withColumn("bin", (($"cum" - $"n_toks") / Ctx).cast("long"))
        .groupBy($"source", $"bin")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_toks").as("n_tokens"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy($"source", $"bin")
    }))

  val oracle: Map[String, String] = Map(
    "q90_doc_chunks" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, ws,
         |    unnest(generate_series(1, len(ws), $Stride)) AS start
         |  FROM t)
         |SELECT doc_id,
         |  CAST((start - 1) // $Stride AS BIGINT) AS chunk_id,
         |  CAST(start AS BIGINT) AS start_tok,
         |  CAST(len(list_slice(ws, start, start + ${ChunkLen - 1})) AS BIGINT)
         |    AS n_chunk_tokens,
         |  array_to_string(list_slice(ws, start, start + ${ChunkLen - 1}), ' ')
         |    AS chunk_text
         |FROM c ORDER BY doc_id, start_tok""".stripMargin,

    "q91_sequence_pack" ->
      s"""WITH t AS (
         |  SELECT source, doc_id,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_toks
         |  FROM documents),
         |b AS (
         |  SELECT source, doc_id, n_toks,
         |    CAST((sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks)
         |         // $Ctx AS BIGINT) AS bin
         |  FROM t)
         |SELECT source, bin, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM b GROUP BY source, bin ORDER BY source, bin""".stripMargin)
}
