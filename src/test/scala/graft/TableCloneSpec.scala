package graft

import graft.ops.Manifest
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}

/** Zero-copy CLONE (q259), selective overwrite REPLACE WHERE (q260),
  * and the full-sync MERGE with `WHEN NOT MATCHED BY SOURCE` (q261):
  * the three round-11 table-format verbs. Pins the metadata-only cost
  * of a clone, divergence independence (both directions, including
  * through deletion vectors), vacuum liveness of shared files, the
  * replaceWhere contract validation, and sync-merge delete
  * conditions.
  */
class TableCloneSpec extends SparkSuite {

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-clone-spec").toString

  private def dataFiles(root: String): Set[String] = {
    val d = Paths.get(root, "data")
    if (!Files.isDirectory(d)) Set.empty
    else {
      val s = Files.walk(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet")).map(_.toString).toSet
      } finally s.close()
    }
  }

  test("clone is metadata-only and both tables read the same content") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      (1L to 100L).toDF("k").withColumn("v", col("k") * 2.0).coalesce(4))
    val before = dataFiles(root)
    Manifest.commitClone(spark, root, "t", "t2")
    // zero-copy: the clone commit wrote NO data files
    assert(dataFiles(root) == before)
    assert(Manifest.readTable(spark, root, "t2").count() == 100L)
    assert(Manifest.readTable(spark, root, "t2").agg(sum("v")).head().getDouble(0)
      == Manifest.readTable(spark, root, "t").agg(sum("v")).head().getDouble(0))
  }

  test("clone diverges independently in both directions (DV + append)") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      (1L to 10L).toDF("k").withColumn("v", col("k") * 1.0).coalesce(1))
    Manifest.commitClone(spark, root, "t", "dev")
    // DV delete on the CLONE: source untouched
    Manifest.commitDeleteVectors(spark, root, "dev", col("k") <= 5)
    assert(Manifest.readTable(spark, root, "dev").count() == 5L)
    assert(Manifest.readTable(spark, root, "t").count() == 10L)
    // append to the SOURCE: clone untouched
    Manifest.commitAppend(spark, root, "t",
      Seq((11L, 11.0)).toDF("k", "v").coalesce(1))
    assert(Manifest.readTable(spark, root, "t").count() == 11L)
    assert(Manifest.readTable(spark, root, "dev").count() == 5L)
  }

  test("clone pins a time-travel version; refuses unknown source and existing dest") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      (1L to 4L).toDF("k").coalesce(1))               // v1
    Manifest.commitAppend(spark, root, "t",
      (5L to 8L).toDF("k").coalesce(1))               // v2
    Manifest.commitClone(spark, root, "t", "old", version = 1L)
    assert(Manifest.readTable(spark, root, "old").count() == 4L)
    assert(Manifest.readTable(spark, root, "t").count() == 8L)
    intercept[IllegalArgumentException] {
      Manifest.commitClone(spark, root, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      Manifest.commitClone(spark, root, "t", "old")   // dest exists
    }
  }

  test("vacuum keeps shared files while either table references them") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      (1L to 20L).toDF("k").coalesce(2))
    Manifest.commitClone(spark, root, "t", "keeper")
    // drop the SOURCE table entirely, then vacuum hard: the clone
    // still references the shared files — they must survive
    graft.sources.ManifestSql.runDml(spark, root, "DROP TABLE t")
    Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(Manifest.readTable(spark, root, "keeper").count() == 20L)
  }

  test("clone copies the registered schema and CHECK constraints") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    Manifest.addCheckConstraint(spark, root, "t", "nonneg", "v >= 0")
    Manifest.commitClone(spark, root, "t", "c")
    assert(Manifest.checkConstraints(root, "c") == Map("nonneg" -> "v >= 0"))
    // the copied constraint ENFORCES on the clone
    intercept[Exception] {
      Manifest.commitAppend(spark, root, "c",
        Seq((2L, -1.0)).toDF("k", "v").coalesce(1))
    }
    assert(Manifest.readTable(spark, root, "c").count() == 1L)
  }

  test("replaceWhere swaps exactly the matching slice, atomically") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      (1L to 10L).toDF("k").withColumn("v", lit(1.0)).coalesce(2))
    val v0 = Manifest.snapshotVersion(root)
    Manifest.commitReplaceWhere(spark, root, "t", col("k") <= 3,
      Seq((1L, 100.0), (2L, 100.0)).toDF("k", "v").coalesce(1))
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // k=1,2 re-landed at 100; k=3 deleted (matched, not re-inserted);
    // k>3 untouched
    assert(got.size == 9 && got(1L) == 100.0 && got(2L) == 100.0
      && !got.contains(3L) && got(4L) == 1.0, got.toString)
    // pre-replace content time-travels
    assert(Manifest.readTable(spark, root, "t", v0).count() == 10L)
  }

  test("replaceWhere refuses batch rows outside the predicate") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      (1L to 5L).toDF("k").withColumn("v", lit(1.0)).coalesce(1))
    intercept[IllegalArgumentException] {
      Manifest.commitReplaceWhere(spark, root, "t", col("k") <= 3,
        Seq((9L, 9.0)).toDF("k", "v"))   // 9 is outside k <= 3
    }
    // nothing changed
    assert(Manifest.readTable(spark, root, "t").count() == 5L)
  }

  test("replaceWhere with no current matches is a pure insert") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    Manifest.commitReplaceWhere(spark, root, "t", col("k") >= 100,
      Seq((100L, 5.0)).toDF("k", "v").coalesce(1))
    assert(Manifest.readTable(spark, root, "t").count() == 2L)
  }

  test("full-sync merge: unconditional NOT MATCHED BY SOURCE DELETE mirrors the source") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v").coalesce(1))
    Manifest.commitMergeFull(spark, root, "t",
      Seq((2L, 20.0), (9L, 9.0)).toDF("k", "v"), "k")
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 2 updated, 9 inserted, 1 and 3 deleted (absent from source)
    assert(got == Map(2L -> 20.0, 9L -> 9.0), got.toString)
  }

  test("full-sync merge: conditional delete keeps unmatched rows failing the condition") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
        .toDF("k", "v").coalesce(1))
    Manifest.commitMergeFull(spark, root, "t",
      Seq((2L, 20.0)).toDF("k", "v"), "k",
      deleteFilter = col("v") < 3.0)
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 2 updated; 1 deleted (unmatched, v<3); 3 and 4 kept (fail cond)
    assert(got == Map(2L -> 20.0, 3L -> 3.0, 4L -> 4.0), got.toString)
  }

  test("full-sync merge refuses duplicate source keys") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    intercept[IllegalArgumentException] {
      Manifest.commitMergeFull(spark, root, "t",
        Seq((1L, 1.0), (1L, 2.0)).toDF("k", "v"), "k")
    }
  }
}
