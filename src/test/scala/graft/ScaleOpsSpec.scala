package graft

import graft.functions.TopKAggregator
import graft.ops.ScaleOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equivalence + plan-shape checks for the scale-structure operators
  * (q107–q112). Oracle-exactness is the driver's job; here we assert
  * the STRUCTURE that makes each op viable at 100 TB.
  */
class ScaleOpsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    ScaleOps.queries.find(_.name == name).get.fn(spark, sf)

  test("q110 grouped top-k equals the window row_number form") {
    val topk = q("q110_grouped_topk").collect().toSeq
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val windowed = Tables.load(spark, sf, "customer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("c_nationkey").cast("int"), col("rn").cast("int"),
        col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy("c_nationkey", "rn")
      .collect().toSeq
    assert(topk == windowed)
  }

  test("TopKAggregator keeps ties deterministic and buffer bounded") {
    val agg = new TopKAggregator(3)
    // ties on value → lower id ranks first; buffer never exceeds k
    val rows = Seq((10L, 5.0), (2L, 5.0), (7L, 9.0), (4L, 1.0), (1L, 5.0))
    val buf = rows.foldLeft(agg.zero)(agg.reduce)
    assert(buf.size == 3)
    assert(agg.finish(buf) == Seq((9.0, 7L), (5.0, 1L), (5.0, 2L)))
    // merge is order-insensitive
    val (l, r) = rows.splitAt(2)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == buf)
  }

  test("q110 plans as partial+final object hash aggregate (no window sort)") {
    val plan = q("q110_grouped_topk").queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no object hash agg:\n$plan")
    assert(!plan.contains("Window"), s"top-k fell back to a window sort:\n$plan")
  }

  test("q109 binned range join is an equi-join, not a nested loop") {
    val plan = q("q109_binned_range_join").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to BNLJ:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"expected hash join on bin:\n$plan")
  }

  test("q109 equals the direct theta-join form") {
    import spark.implicits._
    val binned = q("q109_binned_range_join").collect().toSeq
    val bands = Seq((1, 0d, 50000d), (2, 25000d, 100000d),
      (3, 75000d, 200000d), (4, 150000d, 600000d)).toDF("band_id", "lo", "hi")
    val theta = Tables.load(spark, sf, "orders")
      .join(bands, col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band_id")
      .agg(count(lit(1)).as("n_orders"),
        round(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy("band_id").collect().toSeq
    assert(binned == theta)
  }

  test("q111 bloom prefilter never drops a true match (result = plain semi-join)") {
    val bloomed = q("q111_bloom_semi_join").collect().toSeq
    val urgent = Tables.load(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val plain = Tables.load(spark, sf, "customer")
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name").orderBy("c_custkey").collect().toSeq
    assert(bloomed == plain)
  }

  test("q111 prefilter is the codegen'd bloom expression, not a closure UDF") {
    val plan = q("q111_bloom_semi_join").queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected might_contain filter in physical plan:\n$plan")
    assert(!plan.contains("ScalaUDF"), "bloom prefilter must not be a Scala UDF")
  }

  test("q112 incremental partial-merge equals the single-pass aggregate") {
    val incremental = q("q112_incremental_agg").collect().toSeq
    val direct = Tables.load(spark, sf, "lineitem")
      .groupBy(to_date(date_trunc("month", col("l_shipdate"))).as("month"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("rev"),
        round(min(col("l_quantity")), 2).as("minq"),
        round(max(col("l_quantity")), 2).as("maxq"))
      .orderBy("month").collect().toSeq
    assert(incremental == direct)
  }

  test("q107 bucketed join plans with zero exchanges below the join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = {
        ops.Bucketing.writeBucketed(spark,
          Tables.load(spark, sf, "orders"), "g_orders_by_cust", "o_custkey", 8)
        ops.Bucketing.writeBucketed(spark,
          Tables.load(spark, sf, "customer"), "g_customer_by_key", "c_custkey", 8)
        ops.Bucketing.cobucketedJoin(spark, "g_orders_by_cust", "o_custkey",
          "g_customer_by_key", "c_custkey")
      }
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q113 sketch-pruned heavy hitters equal the exact full groupBy") {
    val pruned = q("q113_heavy_hitters").collect().toSeq
    val ev = Tables.load(spark, sf, "events")
    val cutoff = 0.006 * ev.count()
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") > cutoff)
      .orderBy("user_id").collect().toSeq
    assert(pruned == exact && pruned.nonEmpty)
    // the sketch's state bound holds: ≤ 1/support candidates survive
    // (at this tiny SF every user may legitimately clear the bar)
    assert(pruned.size <= (1 / 0.006).toInt)
  }

  test("snapshotDiff classifies insert / update / delete and drops unchanged") {
    import spark.implicits._
    val oldSnap = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val newSnap = Seq((1L, 10.0), (2L, 25.0), (4L, 40.0)).toDF("k", "v")
    val diff = ops.Cdc.snapshotDiff(oldSnap, newSnap, "k", Seq("v"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // k=1 unchanged → absent; k=2 update; k=3 delete; k=4 insert
    assert(diff == Seq(("update", 2L), ("delete", 3L), ("insert", 4L)))
  }

  test("q114 diff joins once: full-outer co-shuffle, no second exchange") {
    val plan = ops.Cdc.queries.head.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"expected full-outer join:\n$plan")
  }

  test("q108 salted join equals the plain join result") {
    val salted = q("q108_salted_join").collect().toSeq
    val plain = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"), round(sum(col("l_quantity")), 2).as("qty"))
      .orderBy("p_brand").collect().toSeq
    assert(salted == plain)
  }
}
