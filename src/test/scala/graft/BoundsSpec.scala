package graft

import graft.ops.Manifest
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Metadata-only MIN/MAX (q265): bounds from per-file stats alone —
  * zero data I/O on the exact path (proved by deleting the files), a
  * DV-masked scan where a deletion vector could have removed the
  * extreme row, and SQL NULL semantics throughout.
  */
class BoundsSpec extends SparkSuite {

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-bounds-spec").toString

  test("stats-covered bounds answer with the data files DELETED") {
    val root = freshRoot()
    Manifest.commitAppendStats(spark, root, "t",
      (1L to 100L).toDF("k").withColumn("v", col("k").cast("double")),
      Seq("k", "v"), "k", 4)
    // remove every data file: metadata must be the only source
    Manifest.manifestRows(spark, root, Manifest.snapshotVersion(root))
      .foreach { case (_, f, _) => Files.delete(Paths.get(root, f)) }
    assert(Manifest.columnBounds(spark, root, "t", "k", "bigint")
      .contains(("1", "100")))
    assert(Manifest.columnBounds(spark, root, "t", "v", "double")
      .map { case (a, b) => (a.toDouble, b.toDouble) }
      .contains((1.0, 100.0)))
  }

  test("a DV'd file falls back to the masked scan — deleted extremes drop out") {
    val root = freshRoot()
    Manifest.commitAppendStats(spark, root, "t",
      (1L to 10L).toDF("k"), Seq("k"), "k", 1)
    Manifest.commitDeleteVectors(spark, root, "t", col("k") === 10L)
    // the recorded stat still says max=10; the DV masked scan must win
    assert(Manifest.columnBounds(spark, root, "t", "k", "bigint")
      .contains(("1", "9")))
  }

  test("metadata COUNT(col): exact from __nc stats; DV'd files scan") {
    val root = freshRoot()
    Manifest.commitAppendStats(spark, root, "t",
      (1L to 100L).toDF("k").withColumn("v",
        when(col("k") % 5 === 0, lit(null).cast("double"))
          .otherwise(col("k").cast("double"))),
      Seq("k", "v"), "k", 4)
    assert(Manifest.columnNonNullCount(spark, root, "t", "v") == 80L)
    assert(Manifest.columnNonNullCount(spark, root, "t", "k") == 100L)
    // a DV may remove null and non-null rows in any mix — masked scan
    Manifest.commitDeleteVectors(spark, root, "t", col("k") <= 10L)
    assert(Manifest.columnNonNullCount(spark, root, "t", "v") == 72L)
  }

  test("SQL metadata aggregates answer with the data files DELETED") {
    import graft.sources.ManifestSql
    val root = freshRoot()
    val df = (1L to 100L).toDF("k").withColumn("v",
      when(col("k") % 5 === 0, lit(null).cast("double"))
        .otherwise(col("k").cast("double")))
    Manifest.commitAppendStats(spark, root, "t", df, Seq("k", "v"), "k", 4)
    // register the schema (a metadata marker; the 0-partition empty
    // frame publishes no files), then delete every data file: the
    // statement must answer without opening anything
    Manifest.commitAppendEvolve(spark, root, "t",
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), df.schema))
    Manifest.manifestRows(spark, root, Manifest.snapshotVersion(root))
      .foreach { case (_, f, _) => Files.delete(Paths.get(root, f)) }
    val r = ManifestSql.runDml(spark, root,
      """SELECT count(*) AS n, count(v) AS nv, min(k) AS mn,
        |  max(v) AS mx FROM t""".stripMargin).head()
    assert(r.getLong(0) == 100L && r.getLong(1) == 80L, r.toString)
    assert(r.getLong(2) == 1L, r.toString)
    assert(r.getDouble(3) == 99.0, r.toString)
    // shape discipline: a WHERE clause is NOT metadata-answerable —
    // it must fall through to the ordinary plan (and here fail: no
    // such temp view, and the files are gone)
    intercept[Exception] {
      ManifestSql.runDml(spark, root, "SELECT count(*) FROM t WHERE k > 0")
        .collect()
    }
  }

  test("a same-named temp view wins over the metadata answer") {
    import graft.sources.ManifestSql
    val root = freshRoot()
    Manifest.commitAppendStats(spark, root, "tv",
      (1L to 50L).toDF("k"), Seq("k"), "k", 2)
    Seq(7L).toDF("k").createOrReplaceTempView("tv")
    try {
      val n = ManifestSql.runDml(spark, root, "SELECT count(*) AS n FROM tv")
        .head().getLong(0)
      assert(n == 1L, s"view semantics must win, got $n")
    } finally spark.catalog.dropTempView("tv")
  }

  test("stat-less vintages scan; all-NULL columns yield None") {
    val root = freshRoot()
    // plain append: no stats recorded at all
    Manifest.commitAppend(spark, root, "t",
      Seq((5L, Option.empty[Double]), (7L, Option.empty[Double]))
        .toDF("k", "v").coalesce(1))
    assert(Manifest.columnBounds(spark, root, "t", "k", "bigint")
      .contains(("5", "7")))
    assert(Manifest.columnBounds(spark, root, "t", "v", "double").isEmpty)
  }
}
