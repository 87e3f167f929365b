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
}
