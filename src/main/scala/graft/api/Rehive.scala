package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Commission

/** Facade: every data-bearing API route of the reference mapped to its
  * engine dataflow over the reference-domain tables (schemas:
  * FIXTURES.md §B, DDL render-complete-deploy.js:31-136). A user of the
  * reference switches by loading their tables into `RehiveData` and
  * calling the matching method; auth/session/static-file routes are
  * access control and serving, out of engine scope (SURVEY.md §7.4).
  *
  * Batch semantics: read routes are pure queries; write routes return
  * the derived row-sets the reference would have inserted/updated
  * (recompute-from-events, SURVEY.md §1.4) — at 100 TB these become
  * MERGE targets.
  */
case class RehiveData(
    users: DataFrame, packages: DataFrame, giftCodes: DataFrame,
    commissions: DataFrame, referrals: DataFrame,
    withdrawals: DataFrame, subscriptionPayments: DataFrame,
    notifications: DataFrame)

object Rehive {

  /** GET /api/users/:id, /api/auth/me (:343-382) — point lookup with
    * the package eager-loaded as a struct (J1). */
  def userWithPackage(d: RehiveData, userId: String): DataFrame =
    d.users.filter(col("id") === userId)
      .join(broadcast(d.packages).withColumnRenamed("id", "pkg_id"),
        col("package_id") === col("pkg_id"), "left")
      .select(d.users.columns.map(col) :+
        struct(col("name").as("name"), col("price").as("price"),
          col("passive_commission_rate"), col("direct_commission_rate"))
          .as("package"): _*)

  /** GET /api/referrals (:384-399) — direct referrals of a user with
    * the referred user nested (J2), newest first (O1). */
  def referralsOf(d: RehiveData, userId: String): DataFrame =
    d.referrals.filter(col("referrer_id") === userId)
      .join(d.users.select(col("id").as("ru_id"), col("full_name"),
        col("email"), col("package_id")),
        col("referred_id") === col("ru_id"), "left")
      .select(col("referred_id"), col("full_name"), col("email"),
        col("package_id"), col("created_at"))
      .orderBy(col("created_at").desc, col("referred_id"))

  /** GET /api/packages (:401-409) — catalog ordered by price (O2). */
  def listPackages(d: RehiveData): DataFrame =
    d.packages.orderBy(col("price").asc, col("id"))

  /** GET /api/gift-codes (:436-450) — codes created by a user with
    * package and redeemer both eager-loaded (J3: two parallel FKs). */
  def giftCodesOf(d: RehiveData, userId: String): DataFrame =
    d.giftCodes.filter(col("created_by") === userId)
      .join(broadcast(d.packages.select(col("id").as("p_id"), col("name").as("package_name"),
        col("price"))), col("package_id") === col("p_id"), "left")
      .join(d.users.select(col("id").as("r_id"), col("full_name").as("redeemer_name")),
        col("redeemed_by") === col("r_id"), "left")
      .select(col("code"), col("package_name"), col("price"),
        col("is_redeemed"), col("redeemer_name"), col("created_at"))
      .orderBy(col("created_at").desc, col("code"))

  /** POST /api/redeem-gift-code (:456-508) — the flagship write path as
    * one batch dataflow over all unredeemed-code redemption events:
    * guards (self-redeem ban :472, already-redeemed :465), then the
    * commission cascade (:208-316) via Commission.attribute.
    *
    * @param redemptions (code, redeemer_id) events
    * @return commission rows (redemption_id = gift code id) for every
    *         valid redemption — direct to creator, passive to ≤10
    *         ancestors.
    */
  def redeem(d: RehiveData, redemptions: DataFrame): DataFrame = {
    val guarded = redemptions
      .join(d.giftCodes.filter(!col("is_redeemed"))
        .select(col("id").as("gift_code_id"), col("code"),
          col("package_id"), col("created_by")), Seq("code"))
      .filter(col("created_by") =!= col("redeemer_id")) // self-redeem ban :472-474
    // First-wins per code: the reference marks the code redeemed right
    // after the first redemption (:476-482), so a second attempt in the
    // same batch must hit the !is_redeemed guard and pay nothing.
    // Batch equivalent: keep exactly one redemption per gift_code_id
    // (deterministic tie-break on redeemer_id — sequential arrival
    // order doesn't exist in a batch).
    val firstWins = Window.partitionBy(col("gift_code_id"))
      .orderBy(col("redeemer_id"))
    val valid = guarded
      .withColumn("__rn", row_number().over(firstWins))
      .filter(col("__rn") === 1).drop("__rn")
      .join(broadcast(d.packages.select(col("id").as("pk_id"), col("price"),
        col("direct_commission_rate"), col("passive_commission_rate"))),
        col("package_id") === col("pk_id"))
    val events = valid.select(
      col("gift_code_id").as("redemption_id"),
      col("redeemer_id"), col("created_by").as("creator_id"), col("price"),
      col("direct_commission_rate"), col("passive_commission_rate"))
    // rates ride per-row (packages differ) — inline attribute() with
    // per-row rates rather than constants
    val anc = Commission.ancestors(d.referrals, 10)
    val direct = events.select(col("redemption_id"),
      col("creator_id").as("user_id"),
      (col("price") * col("direct_commission_rate")).as("amount"),
      lit("direct").as("ctype"), lit(0L).as("level"))
    val passive = events
      .join(anc, events("redeemer_id") === anc("descendant"))
      .select(col("redemption_id"), col("ancestor").as("user_id"),
        (col("price") * col("passive_commission_rate")).as("amount"),
        lit("passive").as("ctype"), col("level"))
    direct.unionByName(passive)
  }

  /** GET /api/commissions (:510-517) — newest 100 for a user (AG7). */
  def commissionFeed(d: RehiveData, userId: String): DataFrame =
    d.commissions.filter(col("user_id") === userId)
      .orderBy(col("created_at").desc, col("id").desc).limit(100)

  /** Commission balance as a pure recomputation (AG1/AG2; replaces the
    * mutable counter at :228,:287,:725): earned − approved withdrawals. */
  def balances(d: RehiveData): DataFrame = {
    val earned = d.commissions.groupBy(col("user_id"))
      .agg(sum(col("amount")).as("earned"))
    val out = d.withdrawals.filter(col("status") === "approved")
      .groupBy(col("user_id")).agg(sum(col("amount")).as("withdrawn"))
    earned.join(out, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("earned"), lit(0.0)) - coalesce(col("withdrawn"), lit(0.0)))
          .as("balance"))
  }

  /** POST /api/commission-withdrawals (:520-557) — requests validated
    * against the recomputed balance (P8 :541-545): returns each request
    * tagged accepted/rejected. */
  def requestWithdrawals(d: RehiveData, requests: DataFrame): DataFrame =
    requests.join(balances(d), Seq("user_id"), "left")
      .select(col("user_id"), col("amount"),
        when(col("amount") <= coalesce(col("balance"), lit(0.0)), "pending")
          .otherwise("rejected_insufficient_balance").as("status"))

  /** PATCH /api/admin/commission-withdrawals/:id (:705-751) — decisions
    * applied as a merge view: status whitelist (P6 :710), balance
    * decrement only on approval (:722-728), notification rows (:739-744). */
  def processWithdrawals(d: RehiveData, decisions: DataFrame): DataFrame = {
    val valid = decisions
      .filter(col("decision").isin("approved", "rejected")) // :710
    d.withdrawals.join(valid.select(col("id").as("d_id"), col("decision"),
        col("admin_notes").as("decision_notes")), col("id") === col("d_id"), "left")
      .select(col("id"), col("user_id"), col("amount"),
        coalesce(col("decision"), col("status")).as("status"),
        coalesce(col("decision_notes"), col("admin_notes")).as("admin_notes"),
        concat(lit("Withdrawal "),
          upper(substring(coalesce(col("decision"), col("status")), 1, 1)),
          substring(coalesce(col("decision"), col("status")), 2, 100)) // F7 :741
          .as("notification_title"))
  }

  /** POST /api/admin/subscription-payments approve (:765-805) — expiry
    * = approval time + 1 month (F10 :786-787, add_months clamping). */
  def activateSubscriptions(d: RehiveData, approvals: DataFrame): DataFrame =
    d.subscriptionPayments
      .join(approvals.select(col("id").as("a_id"), col("approved_at")),
        col("id") === col("a_id"))
      .select(col("user_id"), lit("active").as("subscription_status"),
        add_months(col("approved_at"), 1).as("subscription_expires_at"))

  /** GET /api/notifications (:650-668) — newest 50 (O1+O3). */
  def notificationFeed(d: RehiveData, userId: String): DataFrame =
    d.notifications.filter(col("user_id") === userId)
      .orderBy(col("created_at").desc, col("id").desc).limit(50)

  /** Company profit per redemption (:303-311) — exposed for the admin
    * stats routes. */
  def companyProfits(redemptions: DataFrame, commissions: DataFrame): DataFrame =
    Commission.companyProfit(redemptions, commissions)
}
