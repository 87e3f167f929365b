package graft

import graft.ops.Manifest
import graft.sources.ManifestSql
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** SQL DML over manifest tables (q219): verbatim DELETE/UPDATE text
  * routes to the merge-on-read commit path; the statement splits
  * (WHERE, comma, `=`) are quote- and paren-aware; everything else
  * falls through to `spark.sql`.
  */
class DmlSpec extends SparkSuite {

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-dml-spec").toString

  test("DELETE and UPDATE text commit merge-on-read with SQL semantics") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, Some(1.0)), (2L, Some(2.0)), (3L, None), (4L, Some(4.0)))
        .toDF("k", "v").coalesce(1))
    ManifestSql.runDml(spark, root,
      "DELETE FROM t WHERE k = 4; UPDATE t SET v = v * 10 WHERE v >= 2.0")
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    // k=4 deleted; k=2 matched the update; k=3 NULL predicate kept
    assert(got == Map(1L -> Some(1.0), 2L -> Some(20.0), 3L -> None))
  }

  test("keywords and separators inside string literals do not split") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1))
    ManifestSql.runDml(spark, root,
      "UPDATE t SET s = 'where x, = (1' WHERE k = 1")
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "where x, = (1", 2L -> "b"))
  }

  test("multi-assignment SET evaluates against the old row (swap)") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 10.0, 100.0), (2L, 20.0, 200.0)).toDF("k", "v", "w").coalesce(1))
    ManifestSql.runDml(spark, root, "UPDATE t SET v = w, w = v WHERE k = 2")
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 10.0, 100.0), (2L, 200.0, 20.0)))
  }

  test("unqualified forms hit every row; SELECT passes through") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").coalesce(1))
    ManifestSql.runDml(spark, root, "UPDATE t SET v = v + 1")
    assert(Manifest.readTable(spark, root, "t")
      .agg(sum("v")).head().getDouble(0) == 5.0)
    val out = ManifestSql.runDml(spark, root,
      "UPDATE t SET v = 0 WHERE k = 1; SELECT 7 AS x")
    assert(out.head().getInt(0) == 7)
    ManifestSql.runDml(spark, root, "DELETE FROM t")
    assert(Manifest.readTable(spark, root, "t").count() == 0L)
  }

  test("malformed SET is rejected loudly") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "UPDATE t SET v WHERE k = 1")
    }
  }

  test("q219 staged root survives with its original files intact") {
    val sfDir = "/root/testdata/sf0.001"
    val root = ManifestSql.dmlRoot(spark, sfDir)
    val raw = Tables.load(spark, sfDir, "events")
    val lo = lit("2024-01-10 00:00:00").cast("timestamp")
    val hi = lit("2024-01-13 00:00:00").cast("timestamp")
    val expect = raw.filter(!(col("ts") >= lo && col("ts") < hi)).count()
    assert(Manifest.readTable(spark, root, "events_log").count() == expect)
  }

  test("MERGE INTO text upserts via a subquery or a view-name source") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").coalesce(1))
    Seq((2L, 200.0), (3L, 300.0)).toDF("k", "v")
      .createOrReplaceTempView("merge_src_view")
    ManifestSql.runDml(spark, root,
      """MERGE INTO t USING merge_src_view AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == Map(1L -> 10.0, 2L -> 200.0, 3L -> 300.0))
    // subquery source, string literal containing ' on ' and ' when '
    ManifestSql.runDml(spark, root,
      """MERGE INTO t USING (
        |  SELECT k, v * 2 AS v FROM merge_src_view
        |  WHERE 'x on y when z' = 'x on y when z' AND k = 3) AS s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(Manifest.readTable(spark, root, "t")
      .filter(col("k") === 3L).head().getDouble(1) == 600.0)
  }

  test("MERGE rejects conditional WHEN clauses and non-equi ON shapes") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    Seq((1L, 2.0)).toDF("k", "v").createOrReplaceTempView("merge_bad_src")
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """MERGE INTO t USING merge_bad_src AS s ON t.k = s.k
          |WHEN MATCHED AND s.v > 1 THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """MERGE INTO t USING merge_bad_src AS s ON t.k >= s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    // neither rejected statement committed anything
    assert(Manifest.readTable(spark, root, "t").head().getDouble(1) == 1.0)
  }

  test("INSERT INTO and CTAS route to manifest commits; VALUES form works; re-CTAS refuses") {
    val root = freshRoot()
    ManifestSql.runDml(spark, root,
      "CREATE TABLE t AS SELECT 1L AS k, 10.0D AS v")
    ManifestSql.runDml(spark, root, "INSERT INTO t VALUES (2L, 20.0D)")
    ManifestSql.runDml(spark, root,
      "INSERT INTO t SELECT 3L AS k, 30.0D AS v")
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // re-CTAS refuses and commits nothing
    val v = Manifest.snapshotVersion(root)
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "CREATE TABLE t AS SELECT 9L AS k, 0.0D AS v")
    }
    assert(Manifest.snapshotVersion(root) == v)
    // INSERTs respect CHECK constraints like any append
    Manifest.addCheckConstraint(spark, root, "t", "pos", "v >= 0")
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "INSERT INTO t VALUES (4L, -1.0D)")
    }
    assert(Manifest.readTable(spark, root, "t").count() == 3L)
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT as SQL text") {
    val root = freshRoot()
    ManifestSql.runDml(spark, root,
      "CREATE TABLE t AS SELECT 1L AS k, 5.0D AS v")
    ManifestSql.runDml(spark, root,
      "ALTER TABLE t ADD CONSTRAINT pos CHECK (v >= 0)")
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "INSERT INTO t VALUES (2L, -1.0D)")
    }
    // registration scans existing data: an impossible predicate refuses
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "ALTER TABLE t ADD CONSTRAINT impossible CHECK (v > 100)")
    }
    ManifestSql.runDml(spark, root, "ALTER TABLE t DROP CONSTRAINT pos")
    ManifestSql.runDml(spark, root, "INSERT INTO t VALUES (2L, -1.0D)")
    assert(Manifest.readTable(spark, root, "t").count() == 2L)
  }
}
