package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CosineSimilarity
import graft.plans.GraftExtensions

/** Optimizer-rule injection via SparkSessionExtensions: the
  * self-cosine strength reduction (graft.plans.SimplifySelfCosine).
  * Plans must be file-backed — literal LocalRelations constant-fold
  * entirely before the assertion could see the expression. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  val dir = "/root/testdata/sf0.001"

  test("cosine_sim(x, x) is rewritten away and stays correct") {
    import spark.implicits._
    val cos = CosineSimilarity.cosineSim(spark) _
    val df = graft.engine.Tables.embeddings(spark, dir)
      .select($"vec_id", cos($"embedding", $"embedding").as("self_cos"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("cosine_sim"), s"rule did not fire:\n$optimized")
    assert(optimized.contains("array_any_nonzero"))
    // every embedding is nonzero → self-cosine exactly 1.0
    assert(df.filter($"self_cos" =!= 1.0).count() == 0)
    assert(df.count() == 500)
  }

  test("cosine_sim(x, y) with distinct inputs is NOT rewritten") {
    import spark.implicits._
    val cos = CosineSimilarity.cosineSim(spark) _
    val df = graft.engine.Tables.embeddings(spark, dir)
      .select(cos($"embedding", org.apache.spark.sql.functions.slice($"embedding", 1, 32))
        .as("c"))
    assert(df.queryExecution.optimizedPlan.toString.contains("cosine_sim"))
    df.count() // still executes
  }
}
