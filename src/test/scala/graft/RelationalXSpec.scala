package graft

import graft.ops.RelationalX
import org.apache.spark.sql.functions._

/** Edge semantics of the extended SQL-surface operators that the
  * DuckDB oracle gate can't probe (tiny inline frames, partitioning
  * invariance, NULL buckets).
  */
class RelationalXSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("unpivot melts to (id, metric, val) with one row per value column") {
    val wide = q("q66_unpivot")
    assert(wide.columns.toSeq == Seq("o_orderkey", "metric", "val"))
    val perKey = wide.groupBy("o_orderkey").count().select("count").distinct().as[Long].collect()
    assert(perKey.toSeq == Seq(2L)) // exactly the two unpivoted metrics
  }

  test("null-safe join matches the NULL bucket instead of dropping it") {
    val out = q("q67_nullsafe_join").select("label").as[String].collect()
    assert(out.toSet == Set("open", "finished", "pending")) // 'open' row = NULL <=> NULL match
  }

  test("merge upsert tags keep/update/insert with disjoint key ranges") {
    val acts = q("q73_merge_upsert")
      .groupBy("action").agg(min("k").as("lo"), max("k").as("hi"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(acts("keep") == (0L, 50L))     // base-only keys (fixture keys start at 0)
    assert(acts("update") == (51L, 100L)) // overlap
    assert(acts("insert") == (101L, 150L)) // update-only keys
  }

  test("hash sample is invariant under repartitioning") {
    val base = q("q75_hash_sample").collect().toSeq
    val reparted = Tables.load(spark, sf, "orders").repartition(13)
    reparted.createOrReplaceTempView("orders_reparted")
    val again = reparted
      .filter(expr("conv(substring(md5(cast(o_orderkey as string)), 1, 14), 16, 10) % 20 = 0"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("total"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(base == again)
  }

  test("date spine emits exactly 4 consecutive dates per key") {
    val spine = q("q74_date_spine")
    val offsets = spine.groupBy("o_orderkey")
      .agg(count(lit(1)).as("n"), min("day_offset").as("lo"), max("day_offset").as("hi"))
      .select("n", "lo", "hi").distinct().as[(Long, Int, Int)].collect()
    assert(offsets.toSeq == Seq((4L, 0, 3)))
  }

  test("sessionize splits on gaps strictly greater than 30 minutes") {
    val e = Seq(
      (1L, 10L, "2024-01-01 00:00:00"),
      (2L, 10L, "2024-01-01 00:30:00"), // exactly 30m later: same session
      (3L, 10L, "2024-01-01 01:00:01"), // 30m01s later: new session
      (4L, 11L, "2024-01-01 00:00:00")
    ).toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    e.select("event_id", "ts", "user_id")
      .withColumn("event_type", lit("x")).withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q76_sessionize_batch")(spark, dir)
      .as[(Long, Int, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(out(10L) == 2) // two sessions for user 10
    assert(out(11L) == 1)
  }

  test("q161 rolling 7-day sketch union stays in band and dominates any single day") {
    val fx = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q161_sliding_hll")(spark, fx).cache()
    assert(out.filter(col("approx_ok") =!= 1).count() == 0)
    // window distinct must be ≥ the end day's own distinct users
    val daily = Tables.load(spark, fx, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("d1"))
    assert(out.join(daily, "day").filter(col("exact_users7") < col("d1")).count() == 0)
    out.unpersist()
  }
}
