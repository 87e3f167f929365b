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
