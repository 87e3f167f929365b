package graft

import graft.ops.{Ingest, Pipeline, Sql}
import org.apache.spark.sql.functions._

import scala.concurrent.ExecutionContext

/** End-to-end pipeline tests mirroring the reference DAGs
  * (SURVEY.md §5.4). */
class E2ESpec extends SparkSuite {

  test("dev_db fan-out: DDL then 4 concurrent branches, 21+1 rows land") {
    implicit val ec: ExecutionContext = ExecutionContext.global
    // Root task: DDL. Catalog/table mutations must not race on ONE
    // table (SURVEY §7.3 — concurrent appends share the commit
    // protocol's _temporary dir), so each concurrent branch owns its
    // table and the fan-in unions them — reads stay truly parallel.
    val tables = Seq("e2e_params", "e2e_list", "e2e_multi")
    (tables :+ "e2e_dev_test").foreach(Sql.dropTable(spark, _))
    tables.foreach(t => spark.sql(s"CREATE TABLE $t (name STRING, id INT) USING parquet"))
    spark.sql("CREATE TABLE e2e_dev_test (name STRING, id INT, load_utc_ts TIMESTAMP) USING parquet")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val branches = Seq(
      Future { spark.sql("INSERT INTO e2e_params VALUES ('name', :id)", Map("id" -> 5)) },
      Future { (0 until 10).foreach(i => spark.sql(s"INSERT INTO e2e_list VALUES ('name', $i)")) },
      Future { Sql.runScript(spark, (0 until 10)
        .map(i => s"INSERT INTO e2e_multi VALUES ('name', $i)").mkString("; ")) },
      Future { Sql.runScript(spark, Sql.translateDialect(
        "INSERT INTO e2e_dev_test VALUES ('name', 5, sysdate())")) })
    Await.result(Future.sequence(branches), Duration.Inf)

    // fan-in: union of the branch tables
    val at = tables.map(t => spark.table(t).withColumn("branch", lit(t)))
      .reduce(_.unionByName(_))
    assert(at.count() == 21)
    assert(at.groupBy("branch").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("e2e_params" -> 1L, "e2e_list" -> 10L, "e2e_multi" -> 10L))
    val dt = spark.table("e2e_dev_test").collect()
    assert(dt.length == 1 && dt.head.getInt(1) == 5 && !dt.head.isNullAt(2))
  }

  test("backfill COPY is idempotent per date (overwrite-by-partition)") {
    val stage = Ingest.writeStageFixtures()
    val out = java.nio.file.Files.createTempDirectory("graft-copy").toString
    def runCopy(): Unit =
      Ingest.backfill(spark, stage, Ingest.backfillStart, Ingest.backfillEnd)
        .write.mode("overwrite").partitionBy("load_date")
        .option("partitionOverwriteMode", "dynamic").parquet(out)
    runCopy()
    runCopy() // re-run of the same logical dates must not duplicate
    val re = spark.read.parquet(out)
    assert(re.count() == 24)
    assert(re.select("load_date").distinct().count() == 3)
  }

  test("COPY load-log: re-running the same files is a no-op, new files load") {
    val stage = Ingest.writeStageFixtures()
    Sql.dropTable(spark, "e2e_prestg")
    Sql.dropTable(spark, "e2e_load_log")
    val d1 = Ingest.stagedFileName(Ingest.backfillStart)
    val d2 = Ingest.stagedFileName(Ingest.backfillStart.plusDays(1))

    assert(Ingest.copyIntoLogged(spark, stage, Seq(d1), "e2e_prestg", "e2e_load_log") == Seq(d1))
    assert(spark.table("e2e_prestg").count() == 8)
    // same file again → skipped, no duplicate rows (Snowflake load history)
    assert(Ingest.copyIntoLogged(spark, stage, Seq(d1), "e2e_prestg", "e2e_load_log").isEmpty)
    assert(spark.table("e2e_prestg").count() == 8)
    // a mixed request loads only the new file
    assert(Ingest.copyIntoLogged(spark, stage, Seq(d1, d2), "e2e_prestg", "e2e_load_log") == Seq(d2))
    assert(spark.table("e2e_prestg").count() == 16)
    assert(spark.table("e2e_load_log").count() == 2)
  }

  test("diamond pipeline via stages: start >> {a,b} >> merge >> end") {
    implicit val ec: ExecutionContext = ExecutionContext.global
    import spark.implicits._
    val start = Seq((1, "x"), (2, "y"), (3, "x")).toDF("id", "tag")
    val merged = Pipeline.fanOutFanIn(start,
      Seq(_.filter(col("tag") === "x"), _.filter(col("tag") === "y")),
      dfs => dfs.reduce(_.unionByName(_)))
    val end = Pipeline.sequence(merged, Seq(
      Pipeline.empty, Pipeline.Stage("count-tag",
        _.groupBy("tag").agg(count(lit(1)).as("n")))))
    assert(end.orderBy("tag").collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("x", 2L), ("y", 1L)))
  }
}
