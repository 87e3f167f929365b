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
}
