package graft

import graft.ops.Stats
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.{ExpandExec, FileSourceScanExec, SparkPlan}

/** q183's ANALYZE relation: exact stat values on a controlled frame,
  * and the one-scan plan contract (all per-column aggregates ride a
  * single Expand over a single file scan — never one scan per column).
  */
class StatsSpec extends SparkSuite {

  test("both stat shapes compute nulls, exact NDV, decimal-rendered min/max") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (2L, null), (null, "a"))
      .toDF("k", "s")
    val expect = Seq(
      Row("k", 4L, 1L, 2L, "1.00", "2.00"),
      Row("s", 4L, 1L, 2L, "a", "b"))
    assert(Stats.columnStatsUnion(df, Seq("k", "s"))
      .orderBy("column_name").collect().toSeq == expect)
    assert(Stats.columnStats(df, Seq("k", "s"))
      .orderBy("column_name").collect().toSeq == expect)
  }

  test("persisted ANALYZE stats are exact, fresh until the table changes, and survive unrelated commits") {
    import graft.ops.Manifest
    import graft.sources.ManifestSql
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-analyze-spec").toString
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("k", "s").coalesce(1))
    val rep = ManifestSql.runDml(spark, root,
      "ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS k, s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    assert(rep.toSet == Set(("k", 3L, 0L, 2L, "1", "2"),
      ("s", 3L, 0L, 2L, "a", "b")))
    assert(Manifest.freshStats(spark, root, "t").exists(_.nRows == 3L))
    // an UNRELATED commit (another table) does not stale the stats
    Manifest.commitAppend(spark, root, "u",
      Seq((9L, "z")).toDF("k", "s").coalesce(1))
    assert(Manifest.freshStats(spark, root, "t").isDefined)
    // a DATA change does — the registry stops feeding fast paths, SHOW
    // STATS still shows what was recorded
    Manifest.commitAppend(spark, root, "t",
      Seq((3L, "c")).toDF("k", "s").coalesce(1))
    assert(Manifest.freshStats(spark, root, "t").isEmpty)
    assert(ManifestSql.runDml(spark, root, "SHOW STATS FOR t").count() == 2L)
    // no stats at all refuses loudly
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "SHOW STATS FOR u")
    }
  }

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: QueryStageExec        => flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  test("default shape: one column-pruned scan per column, no Expand") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val all = flatten(Stats.columnStatsUnion(li, Stats.profiled)
      .queryExecution.executedPlan)
    val scans = all.collect { case f: FileSourceScanExec => f }
    assert(scans.size == Stats.profiled.size)
    // each scan reads exactly its one profiled column
    assert(scans.forall(_.requiredSchema.fields.length == 1))
    assert(all.count(_.isInstanceOf[ExpandExec]) == 0)
  }

  test("alternative single-scan shape really is one scan through one Expand") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val all = flatten(Stats.columnStats(li, Stats.profiled)
      .queryExecution.executedPlan)
    assert(all.count(_.isInstanceOf[FileSourceScanExec]) == 1)
    assert(all.count(_.isInstanceOf[ExpandExec]) == 1)
  }
}
