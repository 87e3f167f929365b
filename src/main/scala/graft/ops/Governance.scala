package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-governance policies applied AT READ TIME — the masking-policy /
  * row-access-policy surface warehouses attach to tables so consumers
  * never see what their role forbids.
  *
  * Spark-first shape: a policy is a pure `Column` rewrite (masking) or
  * a semi-join against a policy relation (row access), composed onto
  * the scan before anything downstream — both are plain Catalyst
  * expressions, fully codegen'd, pushdown-friendly (the row-policy
  * semi-join broadcasts its dimension-sized policy table), and cost
  * nothing at rest. At 100 TB this read-time form is what scales:
  * re-writing masked COPIES of a table per role would multiply storage
  * by |roles| and stale instantly.
  *
  * Policy semantics (the usual warehouse defaults):
  *  - masking `c_name`: all but the last 4 characters replaced by `*`
  *    for non-admin roles (the card-number convention);
  *  - masking `c_acctbal`: bucketed to the 1000 below (aggregate-safe
  *    blur — analysts can still trend, not identify);
  *  - row access: a role sees only the market segments its policy rows
  *    grant.
  */
object Governance {

  /** Mask all but the last 4 chars unless the role is privileged. */
  def maskTail(name: String, role: String): Column =
    if (role == "admin") col(name)
    else concat(expr(s"repeat('*', greatest(length($name) - 4, 0))"),
      substring(col(name), -4, 4))

  /** Bucket a sensitive numeric to the 1000 below for non-admins. */
  def maskBucket(c: Column, role: String): Column =
    if (role == "admin") c else floor(c / 1000) * 1000

  /** The row-access policy RELATION (role → granted segment). In
    * production this is a governed table; the engine shape — broadcast
    * semi-join on the scan — is identical. */
  def segmentPolicy(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("analyst", "AUTOMOBILE"), ("analyst", "BUILDING"),
      ("admin", "AUTOMOBILE"), ("admin", "BUILDING"),
      ("admin", "FURNITURE"), ("admin", "HOUSEHOLD"), ("admin", "MACHINERY"))
      .toDF("role", "segment")
  }

  /** customer as `role` sees it: rows filtered by the role's policy
    * grants, sensitive columns masked per policy. */
  def policedCustomer(s: SparkSession, dir: String, role: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val grants = segmentPolicy(s).filter(col("role") === role)
      .select(col("segment").as("c_mktsegment"))
    c.join(broadcast(grants), Seq("c_mktsegment"), "left_semi")
      .select(
        col("c_custkey"),
        maskTail("c_name", role).as("c_name"),
        maskBucket(col("c_acctbal"), role).cast("double").as("c_acctbal"),
        col("c_mktsegment"))
  }

  val queries: Seq[Q] = Seq(

    // ----- The analyst read: row policy (2 of 5 segments) + both
    //       masking policies, all applied before anything downstream.
    //       The oracle recomputes mask and filter independently in
    //       DuckDB SQL — any drift in the mask expression, the bucket
    //       arithmetic, or the policy join breaks the hash. (The
    //       policy table is an INPUT here, so its literals in the
    //       oracle are fixture, not golden output.) -----
    Q("q188_policy_read",
      Some("""SELECT c_custkey,
             |  repeat('*', length(c_name) - 4) ||
             |    substr(c_name, length(c_name) - 3) AS c_name,
             |  CAST(floor(c_acctbal / 1000) * 1000 AS DOUBLE) AS c_acctbal,
             |  c_mktsegment
             |FROM customer
             |WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => policedCustomer(s, dir, "analyst").orderBy("c_custkey"))
  )
}
