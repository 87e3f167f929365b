package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Adaptive Query Execution evidence: the runtime re-planning SURVEY.md
  * §4 leans on for the cases the engine does NOT structurally handle
  * (unknown skew → AQE splits; over-partitioned shuffles → AQE
  * coalesces). Thresholds are scaled down so a local[4] test exercises
  * the same code paths a 1000-executor cluster does.
  */
class AqeSpec extends SparkSuite {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
    }.getOrElse(df.queryExecution.executedPlan.toString)
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    import spark.implicits._
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB") {
      // one pathologically hot key; everything else tiny
      val fact = spark.range(60000)
        .select(when(col("id") % 100 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
          concat(lit("payload-payload-payload-"), col("id")).as(("v")))
      val dim = spark.range(60000).select(col("id").as("k"), (col("id") * 2).as("w"))
      // keep the payload column live through the join so the shuffled
      // partitions carry real bytes (column pruning would reduce the hot
      // partition to bare longs below the skew threshold), and aggregate
      // GLOBALLY: a groupBy on the join key would forbid the split (AQE
      // won't break the hash-partition guarantee a downstream keyed
      // operator needs)
      val joined = fact.join(dim, "k").agg(sum(length(col("v"))).as("bytes"))
      val plan = finalPlan(joined)
      assert(plan.contains("skew=true"), s"AQE did not split the hot partition:\n$plan")
    }
  }

  test("AQE coalesces over-partitioned shuffle output") {
    withConf("spark.sql.shuffle.partitions" -> "64") {
      val tiny = Tables.load(spark, "/root/testdata/sf0.001", "nation")
        .groupBy("n_regionkey").agg(count(lit(1)).as("n"))
      val plan = finalPlan(tiny)
      assert(plan.contains("coalesced"),
        s"AQE did not coalesce the 64-partition shuffle of 25 rows:\n$plan")
    }
  }
}
