package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All operators live in `graft.engine.*`; this object only assembles
  * the per-operator query map and its DuckDB oracle SQL. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The full multi-stage corpus refinery (quality filter →
    * exact dedup → near-dup clustering → decontamination → funnel
    * census) — every stage individually oracle-verified (q50-q58,
    * q74) and the composition oracle-verified end-to-end (q75). */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.refinery(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Aggregates.queries ++ Scalar.queries ++ Commission.queries ++ Windows.queries ++ TextOps.queries ++ Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++ RefShapes.queries ++ Extended.queries ++ Pipeline.queries ++ graft.api.Rehive.queries ++ Chunking.queries ++ Sketches.queries ++ TimeSeries.queries ++ Graph.queries ++ graft.sources.SourceQueries.queries ++ Profiling.queries ++ Retrieval.queries ++ TpchShapes.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Aggregates.oracle ++ Scalar.oracle ++ Commission.oracle ++ Windows.oracle ++ TextOps.oracle ++ Dedup.oracle ++ Similarity.oracle ++ Multimodal.oracle ++ RefShapes.oracle ++ Extended.oracle ++ Pipeline.oracle ++ graft.api.Rehive.oracle ++ Chunking.oracle ++ Sketches.oracle ++ TimeSeries.oracle ++ Graph.oracle ++ graft.sources.SourceQueries.oracle ++ Profiling.oracle ++ Retrieval.oracle ++ TpchShapes.oracle
}
