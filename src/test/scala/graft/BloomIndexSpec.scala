package graft

import graft.ops.Manifest
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Per-file bloom point index (q212): sidecar filters prune a point
  * lookup over hash-scattered files where range stats cannot, with
  * zero false negatives, conservative keeps for bloom-less files, and
  * sidecars collected by vacuum alongside their data files.
  */
class BloomIndexSpec extends SparkSuite {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def freshRoot(): String =
    Files.createTempDirectory("graft-bloom-spec").toString

  test("point lookup prunes files and loses no rows") {
    val root = Manifest.bloomRoot(spark, sfDir)
    val keys = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 7 === 0)
      .orderBy("o_orderkey").limit(5)
      .select(col("o_orderkey").cast("long")).as[Long].collect().toSeq
    assert(keys.size == 5)
    val (hit, kept, total) = Manifest.readTablePoint(
      spark, root, "orders_idx", "o_orderkey", keys)
    assert(total == 16)
    // 5 keys live in ≤5 true files; a 1% fpp adds at most a few more
    assert(kept < total, s"bloom pruned nothing: $kept of $total")
    val expected = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey").isin(keys: _*))
      .select(col("o_orderkey").cast("long")).as[Long].collect().toSet
    val got = hit.select(col("o_orderkey").cast("long")).as[Long].collect().toSet
    assert(got == expected)
  }

  test("all keys look up exactly (no false negatives at any key)") {
    val root = freshRoot()
    val df = (1L to 500L).map(k => (k, k * 2.0)).toDF("k", "v")
      .repartition(8, col("k"))
    Manifest.commitAppendBloom(spark, root, "t", df, "k",
      expectedPerFile = 1024L, fpp = 0.01)
    val (hit, _, total) = Manifest.readTablePoint(
      spark, root, "t", "k", (1L to 500L))
    assert(total == 8)
    assert(hit.count() == 500L)
  }

  test("files without a sidecar are kept conservatively") {
    val root = freshRoot()
    Manifest.commitAppendBloom(spark, root, "t",
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").repartition(2, col("k")),
      "k", expectedPerFile = 64L, fpp = 0.01)
    // a PLAIN append adds bloom-less files; lookups must still see them
    Manifest.commitAppend(spark, root, "t", Seq((99L, 9.0)).toDF("k", "v"))
    val (hit, kept, total) = Manifest.readTablePoint(
      spark, root, "t", "k", Seq(99L))
    assert(hit.select("k").as[Long].collect().toSet == Set(99L))
    assert(kept < total) // the bloomed files still pruned
  }

  test("vacuum collects a dead file's bloom sidecar with it") {
    val root = freshRoot()
    Manifest.commitAppendBloom(spark, root, "t",
      (1L to 100L).map(k => (k, k * 1.0)).toDF("k", "v").repartition(4, col("k")),
      "k", expectedPerFile = 256L, fpp = 0.01)
    def sidecars(): Long = {
      val w = Files.walk(Paths.get(root, "data"))
      try w.filter(_.getFileName.toString.endsWith(".bloom")).count()
      finally w.close()
    }
    assert(sidecars() == 4L)
    // rewrite the table: old files (and their sidecars) become dead
    Manifest.commitReplace(spark, root, "t",
      (1L to 100L).map(k => (k, k * 1.0)).toDF("k", "v").coalesce(1))
    val _ = Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(sidecars() == 0L)
  }
}
