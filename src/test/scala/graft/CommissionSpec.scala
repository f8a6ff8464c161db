package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Commission

/** Unit tests for the commission dataflow against the reference's exact
  * semantics (FIXTURES.md §B canonical scenario; reference behavior at
  * render-complete-deploy.js:246-316). */
class CommissionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import org.apache.spark.sql.functions._

  /** Chain u0←u1←…←u11: referrals row (referrer=u_i, referred=u_{i+1}). */
  def chainEdges() = {
    import spark.implicits._
    (0 until 11).map(i => (s"u${i + 1}", s"u$i"))
      .toDF("referred_id", "referrer_id")
  }

  test("10-level depth cutoff: u11's ancestors are u10..u1, never u0") {
    import spark.implicits._
    val anc = Commission.ancestors(chainEdges(), 10)
      .filter($"descendant" === "u11")
      .collect().map(r => (r.getString(1), r.getLong(2))).sortBy(_._2)
    assert(anc.map(_._1).toSeq == (10 to 1 by -1).map(i => s"u$i"))
    assert(anc.map(_._2).toSeq == (1L to 10L))
    assert(!anc.map(_._1).contains("u0")) // root beyond maxLevels (ref :259)
  }

  test("root user with no inbound edge has no ancestors (ref :267)") {
    import spark.implicits._
    val anc = Commission.ancestors(chainEdges(), 10)
    assert(anc.filter($"descendant" === "u0").count() == 0)
  }

  test("canonical redemption: direct 10 to creator, passive 5x10, profit 40") {
    import spark.implicits._
    // package price 100.00, direct 0.10, passive 0.05; code created by uC
    // (outside the chain), redeemed by u11 (FIXTURES.md §B).
    val redemption = Seq((1L, "u11", "uC", 100.0))
      .toDF("redemption_id", "redeemer_id", "creator_id", "price")
    val comm = Commission.attribute(chainEdges(), redemption, 0.10, 0.05)
    val rows = comm.collect().map(r =>
      (r.getString(1), r.getDouble(2), r.getString(3))).toSeq

    assert(rows.count(_._3 == "direct") == 1)
    assert(rows.find(_._3 == "direct").get == (("uC", 10.0, "direct")))
    val passive = rows.filter(_._3 == "passive")
    assert(passive.size == 10) // exactly levels 1..10
    assert(passive.forall(_._2 == 5.0)) // flat per level, not decayed (ref :275)
    assert(passive.map(_._1).toSet == (1 to 10).map(i => s"u$i").toSet)

    val profit = Commission.companyProfit(redemption, comm)
      .collect().head
    assert(profit.getDouble(1) == 40.0) // 100 - (10 + 10*5)
    assert(profit.getDouble(2) == 60.0)
  }

  test("profit clamps at zero when commissions exceed price (ref :307)") {
    import spark.implicits._
    val redemption = Seq((1L, "u11", "uC", 100.0))
      .toDF("redemption_id", "redeemer_id", "creator_id", "price")
    val comm = Commission.attribute(chainEdges(), redemption, 0.10, 0.12)
    val profit = Commission.companyProfit(redemption, comm).collect().head
    assert(profit.getDouble(1) == 0.0) // max(0, 100 - (10 + 10*12)) = 0
  }

  test("redemption by mid-chain user only credits its own upline") {
    import spark.implicits._
    val redemption = Seq((1L, "u3", "uC", 100.0))
      .toDF("redemption_id", "redeemer_id", "creator_id", "price")
    val comm = Commission.attribute(chainEdges(), redemption, 0.10, 0.05)
    val passive = comm.filter($"ctype" === "passive")
      .collect().map(_.getString(1)).toSet
    assert(passive == Set("u2", "u1", "u0")) // only 3 ancestors exist
  }
}
