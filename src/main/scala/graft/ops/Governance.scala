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
      (s, dir) => policedCustomer(s, dir, "analyst").orderBy("c_custkey")),

    // ----- Governance DDL (q283): q188's rewrites become REGISTERED
    //       METADATA — CREATE MASKING/ROW ACCESS POLICY + ALTER TABLE
    //       SET/ADD persist the policies as claim-sidecar markers, and
    //       the SAME verbatim SELECT returns different results per
    //       `SET ROLE`: the analyst sees two granted segments with
    //       both masks applied, the admin sees the table byte-
    //       identical (the policy body's own role check folds away).
    //       The oracle recomputes both role views independently, so
    //       drift in the mask arithmetic, the row filter, OR the role
    //       plumbing breaks the hash. -----
    Q("q283_policy_ddl_roles",
      Some("""SELECT * FROM (
             |  SELECT 'admin' AS role, c_custkey, c_name,
             |    CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
             |  FROM customer
             |  UNION ALL
             |  SELECT 'analyst', c_custkey,
             |    repeat('*', greatest(length(c_name) - 4, 0)) ||
             |      substr(c_name, length(c_name) - 3),
             |    CAST(floor(c_acctbal / 1000) * 1000 AS DOUBLE),
             |    c_mktsegment
             |  FROM customer
             |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING'))
             |ORDER BY role, c_custkey""".stripMargin),
      (s, dir) => {
        import graft.sources.ManifestSql
        val root = java.nio.file.Files
          .createTempDirectory("graft-gov-ddl").toString
        Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"),
            col("c_acctbal").cast("double").as("c_acctbal"),
            col("c_mktsegment"))
          .createOrReplaceTempView("gov_cust_src")
        ManifestSql.runDml(s, root,
          """CREATE TABLE cust AS SELECT * FROM gov_cust_src;
            |CREATE MASKING POLICY mask_name AS (val STRING) RETURNS STRING ->
            |  CASE WHEN current_role() = 'admin' THEN val
            |       ELSE concat(repeat('*', greatest(length(val) - 4, 0)),
            |                   substring(val, -4, 4)) END;
            |CREATE MASKING POLICY mask_bal AS (v DOUBLE) RETURNS DOUBLE ->
            |  CASE WHEN current_role() = 'admin' THEN v
            |       ELSE CAST(floor(v / 1000) * 1000 AS DOUBLE) END;
            |CREATE ROW ACCESS POLICY seg_access AS (seg STRING) RETURNS BOOLEAN ->
            |  current_role() = 'admin' OR seg IN ('AUTOMOBILE', 'BUILDING');
            |ALTER TABLE cust MODIFY COLUMN c_name SET MASKING POLICY mask_name;
            |ALTER TABLE cust MODIFY COLUMN c_acctbal SET MASKING POLICY mask_bal;
            |ALTER TABLE cust ADD ROW ACCESS POLICY seg_access ON (c_mktsegment)"""
            .stripMargin)
        def asRole(role: String): DataFrame = {
          ManifestSql.runDml(s, root, s"SET ROLE $role")
          ManifestSql.register(s, root, "cust", "gov_cust_v")
          val out = ManifestSql.runDml(s, root,
            s"""SELECT '$role' AS role, c_custkey, c_name, c_acctbal,
               |  c_mktsegment
               |FROM gov_cust_v ORDER BY c_custkey""".stripMargin)
            .localCheckpoint(true)
          s.catalog.dropTempView("gov_cust_v")
          out
        }
        val out =
          try asRole("admin").unionByName(asRole("analyst"))
            .orderBy("role", "c_custkey")
          finally {
            s.conf.set("graft.sql.role", "admin") // restore session default
            s.catalog.dropTempView("gov_cust_src")
            graft.ops.Staging.deleteRecursively(
              java.nio.file.Paths.get(root))
          }
        out
      })
  )
}
