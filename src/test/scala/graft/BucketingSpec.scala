package graft

import graft.ops.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSuite {

  test("co-bucketed join plans with zero exchanges") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val lineitem = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    Bucketing.writeBucketed(spark, orders, "b_orders", "o_orderkey")
    Bucketing.writeBucketed(spark,
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey")

    // at fixture size the planner (correctly) prefers broadcast, which
    // ignores bucketing — force the sort-merge path to observe the
    // bucketed layout the way a 100 TB join would use it
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.cobucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")
      assert(plan.contains("SortMergeJoin"))

      // and it is still correct
      val expected = orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
