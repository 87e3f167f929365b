package graft

import org.apache.spark.sql.functions._

/** Physical-layout tests: partition pruning on date-partitioned data
  * (the layout the backfill sink writes — SURVEY.md §2.7/§4). */
class LayoutSpec extends SparkSuite {

  test("date-partitioned write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)

    val all = spark.read.parquet(dir)
    val nDays = all.select("day").distinct().count()
    assert(nDays > 3)

    val pruned = all.filter(col("day") === "2024-01-02")
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the day predicate must be a PartitionFilter (directory pruning),
    // not a post-scan data filter
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"day filter not pushed to partition pruning:\n$plan")
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles")
    pruned.count()
    assert(scanned.exists(_.value < nDays), "scan did not prune partition dirs")
  }

  test("dynamic partition pruning fires on a filtered-dim star join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim restricts to one event_type AFTER the join key — only a
    // runtime (dynamic) filter can prune the fact's partitions
    // the dim must be a file relation: an inline LocalRelation gets its
    // filter constant-folded away, leaving no selective predicate for
    // the pruning rule to key on
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("click", 1), ("view", 2), ("buy", 3)).toDF("etype", "w")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("w") === 1)
    // at fixture scale the stats-based benefit estimate (correctly)
    // says pruning isn't worth a subquery — disable it so the test
    // exercises the rule's mechanics, as a 100 TB fact table would
    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val joined = fact.join(dim, fact("event_type") === dim("etype"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning in plan:\n${plan.take(4000)}\n=== optimized ===\n" +
          joined.queryExecution.optimizedPlan.toString.take(3000))
    } finally
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", prev)
  }
}
