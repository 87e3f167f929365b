package graft

import graft.ops.Governance
import org.apache.spark.sql.functions._

/** Policy semantics q188's gate can't see alone: the ADMIN role must
  * get the unmasked, unfiltered table (policies are per-role rewrites,
  * not table mutations), and the mask must be value-correct.
  */
class GovernanceSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("admin sees every row unmasked; analyst sees granted segments masked") {
    val base = Tables.load(spark, sfDir, "customer")
    val admin = Governance.policedCustomer(spark, sfDir, "admin")
    assert(admin.count() == base.count())
    // admin values are byte-identical to the base table
    val joined = admin.alias("a").join(base.alias("b"), "c_custkey")
    assert(joined.filter(col("a.c_name") =!= col("b.c_name") ||
      col("a.c_acctbal") =!= col("b.c_acctbal")).isEmpty)

    val analyst = Governance.policedCustomer(spark, sfDir, "analyst")
    val segs = analyst.select("c_mktsegment").distinct()
      .collect().map(_.getString(0)).toSet
    assert(segs.subsetOf(Set("AUTOMOBILE", "BUILDING")))
    assert(analyst.count() ==
      base.filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")).count())
    // every analyst-visible name is starred except its 4-char tail
    assert(analyst.filter(!col("c_name").rlike("^\\*+[0-9]{4}$")).isEmpty)
  }

  test("mask expressions are value-correct on controlled input") {
    import spark.implicits._
    val df = Seq(("Customer#000000042", 2547.4), ("abcd", -10.0))
      .toDF("c_name", "c_acctbal")
      .select(Governance.maskTail("c_name", "analyst").as("m"),
        Governance.maskBucket(col("c_acctbal"), "analyst").as("b"))
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("**************0042", 2000L), ("abcd", -1000L)))
  }

  test("registered policies: DDL persists, roles switch, admin byte-identical, UNSET restores") {
    import graft.ops.Manifest
    import graft.sources.ManifestSql
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-gov-spec").toString
    Seq((1L, "Customer#000000001", 2547.4, "AUTOMOBILE"),
        (2L, "Customer#000000002", -10.0, "FURNITURE"))
      .toDF("k", "name", "bal", "seg").createOrReplaceTempView("gov_spec_src")
    ManifestSql.runDml(spark, root,
      """CREATE TABLE t AS SELECT * FROM gov_spec_src;
        |CREATE MASKING POLICY m AS (val STRING) RETURNS STRING ->
        |  CASE WHEN current_role() = 'admin' THEN val
        |       ELSE concat(repeat('*', greatest(length(val) - 4, 0)),
        |                   substring(val, -4, 4)) END;
        |CREATE ROW ACCESS POLICY r AS (seg STRING) RETURNS BOOLEAN ->
        |  current_role() = 'admin' OR seg = 'AUTOMOBILE';
        |ALTER TABLE t MODIFY COLUMN name SET MASKING POLICY m;
        |ALTER TABLE t ADD ROW ACCESS POLICY r ON (seg)""".stripMargin)
    try {
      // the registry is METADATA: definitions + attachments listable
      val pol = ManifestSql.runDml(spark, root, "SHOW POLICIES t")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(pol.toSet == Set(("MASKING", "name", "m"), ("ROW ACCESS", "seg", "r")))
      // analyst: one granted row, masked
      ManifestSql.runDml(spark, root, "SET ROLE analyst")
      ManifestSql.register(spark, root, "t", "gov_t")
      val a = spark.sql("SELECT k, name FROM gov_t ORDER BY k").collect()
      assert(a.length == 1 && a(0).getLong(0) == 1L &&
        a(0).getString(1) == "**************0001")
      // admin: byte-identical to the raw table through the same text
      ManifestSql.runDml(spark, root, "SET ROLE admin")
      ManifestSql.register(spark, root, "t", "gov_t")
      assert(spark.sql("SELECT * FROM gov_t").collect().toSet ==
        Manifest.readTable(spark, root, "t").collect().toSet)
      // one row policy per table (Snowflake semantics)
      intercept[IllegalArgumentException] {
        ManifestSql.runDml(spark, root,
          "ALTER TABLE t ADD ROW ACCESS POLICY r ON (seg)")
      }
      // UNSET + DROP restore the raw read for any role
      ManifestSql.runDml(spark, root,
        """SET ROLE analyst;
          |ALTER TABLE t MODIFY COLUMN name UNSET MASKING POLICY;
          |ALTER TABLE t DROP ROW ACCESS POLICY r""".stripMargin)
      ManifestSql.register(spark, root, "t", "gov_t")
      assert(spark.sql("SELECT count(*) AS n FROM gov_t").head().getLong(0) == 2L)
    } finally {
      spark.conf.set("graft.sql.role", "admin")
      spark.catalog.dropTempView("gov_t")
      spark.catalog.dropTempView("gov_spec_src")
    }
  }
}
