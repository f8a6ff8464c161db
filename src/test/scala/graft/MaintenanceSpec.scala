package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.engine.Maintenance

/** MERGE-style write paths and compaction (SURVEY.md §2.1 S5's
  * at-scale answer). The merged *view* is oracle-verified as
  * q71_merge_upsert; this spec pins the physical write path and the
  * delete/compaction behaviors the oracle can't see. */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  def tmp(prefix: String): String = Files.createTempDirectory(prefix).toString

  test("upsert written to parquet round-trips: updates replace, inserts add") {
    import spark.implicits._
    val base = graft.engine.Tables.nation(spark, dir)
    val updates = base.filter($"n_nationkey" < 5)
      .withColumn("n_name", lit("patched"))
    val inserts = base.filter($"n_nationkey" === 7)
      .withColumn("n_nationkey", lit(999).cast("int"))
    val out = tmp("graft_merge")
    Maintenance.upsert(base, updates.unionByName(inserts), Seq("n_nationkey"))
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == base.count() + 1)
    assert(back.filter($"n_name" === "patched").count() == 5)
    assert(back.filter($"n_nationkey" === 999).count() == 1)
    // untouched rows are byte-identical to the base
    assert(back.filter($"n_nationkey" >= 5 && $"n_nationkey" =!= 999)
      .orderBy("n_nationkey").collect().toSeq ==
      base.filter($"n_nationkey" >= 5).orderBy("n_nationkey").collect().toSeq)
  }

  test("deleteMatching drops exactly the tombstoned keys") {
    import spark.implicits._
    val base = graft.engine.Tables.customer(spark, dir)
    val tombstones = base.filter($"c_custkey" % 7 === 0)
    val after = Maintenance.deleteMatching(base, tombstones, Seq("c_custkey"))
    assert(after.count() == base.count() - tombstones.count())
    assert(after.filter($"c_custkey" % 7 === 0).count() == 0)
  }

  test("compact folds many small files into few, preserving the data") {
    import spark.implicits._
    val in = tmp("graft_small")
    val out = tmp("graft_compacted")
    graft.engine.Tables.events(spark, dir).repartition(32)
      .write.mode("overwrite").parquet(in)
    val (before, after) = Maintenance.compact(spark, in, out)
    assert(before >= 32)
    assert(after < before)
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
