package graft

import graft.ops.Manifest
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** SCD TYPE 2 APPLY CHANGES (q264): validity-interval history derived
  * from the change feed — open/close algebra, update-in-place
  * replacement, delete closure, exactly-once ledger, and the
  * as-of-version read the history table exists for.
  */
class Scd2Spec extends SparkSuite {

  import spark.implicits._

  private def freshRoots(): (String, String) = {
    val t = Files.createTempDirectory("graft-scd2-spec").toString
    (s"$t/src", s"$t/dst")
  }

  private def hist(dst: String) =
    Manifest.readTable(spark, dst, "h")
      .select("k", "v", "__start_v", "__end_v")

  test("insert → update → delete yields the full interval history") {
    val (src, dst) = freshRoots()
    Manifest.commitAppendStats(spark, src, "t",
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), Seq("k"), "k", 1)   // v1
    assert(Manifest.applyChangesScd2(spark, src, "t", dst, "h", "k")
      .contains((2L, 0L)))
    Manifest.commitMergeUpsert(spark, src, "t",
      Seq((1L, 11.0), (3L, 30.0)).toDF("k", "v"), "k")                // v2
    Manifest.commitDeleteVectors(spark, src, "t", col("k") === 2L)    // v3
    assert(Manifest.applyChangesScd2(spark, src, "t", dst, "h", "k")
      .contains((2L, 2L))) // opened: k1@v2, k3@v2; closed: k1@v1, k2@v1
    val rows = hist(dst).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toSet
    assert(rows == Set(
      (1L, 10.0, 1L, Some(2L)),   // k1 first image, closed by the update
      (1L, 11.0, 2L, None),       // k1 current
      (2L, 20.0, 1L, Some(3L)),   // k2 closed by the delete, no successor
      (3L, 30.0, 2L, None)        // k3 inserted at v2, open
    ), rows.toString)
    // exactly one open row per live key; none for the deleted key
    val open = hist(dst).filter(col("__end_v").isNull)
      .select("k").as[Long].collect().toSet
    assert(open == Set(1L, 3L))
  }

  test("as-of-version reads reconstruct any past state from the history") {
    val (src, dst) = freshRoots()
    Manifest.commitAppendStats(spark, src, "t",
      Seq((1L, 10.0)).toDF("k", "v"), Seq("k"), "k", 1)               // v1
    Manifest.applyChangesScd2(spark, src, "t", dst, "h", "k")
    Manifest.commitMergeUpsert(spark, src, "t",
      Seq((1L, 11.0)).toDF("k", "v"), "k")                            // v2
    Manifest.commitMergeUpsert(spark, src, "t",
      Seq((1L, 12.0)).toDF("k", "v"), "k")                            // v3
    Manifest.applyChangesScd2(spark, src, "t", dst, "h", "k")
    def asOf(v: Long): Set[Double] = hist(dst)
      .filter(col("__start_v") <= v &&
        (col("__end_v").isNull || col("__end_v") > v))
      .select("v").as[Double].collect().toSet
    assert(asOf(1L) == Set(10.0) && asOf(2L) == Set(11.0)
      && asOf(3L) == Set(12.0))
  }

  test("unchanged rows emit no spurious intervals; re-drive is a no-op") {
    val (src, dst) = freshRoots()
    Manifest.commitAppendStats(spark, src, "t",
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), Seq("k"), "k", 1)
    Manifest.applyChangesScd2(spark, src, "t", dst, "h", "k")
    // a merge that REPLACES k=1 with an identical row: the feed diff
    // cancels, no history churn
    Manifest.commitMergeUpsert(spark, src, "t",
      Seq((1L, 1.0)).toDF("k", "v"), "k")
    val v0 = Manifest.snapshotVersion(dst)
    assert(Manifest.applyChangesScd2(spark, src, "t", dst, "h", "k")
      .contains((0L, 0L)))
    assert(hist(dst).count() == 2L)
    // zero-change intervals are PURE no-ops: no commit, no version
    // minted, and every further re-drive keeps reporting (0, 0)
    // without touching the destination (the statement-re-drive
    // quiesce contract — the next REAL change still applies, because
    // the unadvanced ledger just widens that sync's interval)
    assert(Manifest.snapshotVersion(dst) == v0)
    assert(Manifest.applyChangesScd2(spark, src, "t", dst, "h", "k")
      .contains((0L, 0L)))
    assert(Manifest.snapshotVersion(dst) == v0)
    // ...and the widened interval applies exactly once
    Manifest.commitMergeUpsert(spark, src, "t",
      Seq((2L, 9.0)).toDF("k", "v"), "k")
    assert(Manifest.applyChangesScd2(spark, src, "t", dst, "h", "k")
      .contains((1L, 1L)))
    assert(Manifest.applyChangesScd2(spark, src, "t", dst, "h", "k").isEmpty)
    // k=1 open, k=2's first interval closed in place, k=2's new open
    assert(hist(dst).count() == 3L)
  }

  test("delete then re-insert opens a NEW interval, history preserved") {
    val (src, dst) = freshRoots()
    Manifest.commitAppendStats(spark, src, "t",
      Seq((1L, 1.0)).toDF("k", "v"), Seq("k"), "k", 1)                // v1
    Manifest.applyChangesScd2(spark, src, "t", dst, "h", "k")
    Manifest.commitDeleteVectors(spark, src, "t", col("k") === 1L)    // v2
    Manifest.applyChangesScd2(spark, src, "t", dst, "h", "k")
    Manifest.commitMergeUpsert(spark, src, "t",
      Seq((1L, 5.0)).toDF("k", "v"), "k")                             // v3
    Manifest.applyChangesScd2(spark, src, "t", dst, "h", "k")
    val rows = hist(dst).collect()
      .map(r => (r.getDouble(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toSet
    assert(rows == Set((1.0, 1L, Some(2L)), (5.0, 3L, None)), rows.toString)
  }

  test("composite keys: sibling pairs independent; single-key output bit-unchanged") {
    // --- composite: (a, b) is the key; a=1 appears under two b values
    val (src, dst) = freshRoots()
    Manifest.commitAppendStats(spark, src, "t",
      Seq((1L, "x", 10.0), (1L, "y", 20.0), (2L, "x", 30.0))
        .toDF("a", "b", "v"), Seq("a"), "a", 1)                        // v1
    assert(Manifest.applyChangesScd2(spark, src, "t", dst, "h",
      Seq("a", "b")).contains((3L, 0L)))
    // update ONLY (1, x); delete ONLY (2, x): the sibling (1, y) must
    // keep its ORIGINAL open interval — a single-column keying bug
    // would close or rewrite it
    Manifest.commitMergeUpsert(spark, src, "t",
      Seq((1L, "x", 11.0)).toDF("a", "b", "v"), Seq("a", "b"),
      maxRetries = 5, txn = None, allowEvolution = false)              // v2
    Manifest.commitDeleteVectors(spark, src, "t",
      col("a") === 2L && col("b") === "x")                             // v3
    assert(Manifest.applyChangesScd2(spark, src, "t", dst, "h",
      Seq("a", "b")).contains((1L, 2L)))
    val rows = Manifest.readTable(spark, dst, "h")
      .select("a", "b", "v", "__start_v", "__end_v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long])))
      .toSet
    assert(rows == Set(
      (1L, "x", 10.0, 1L, Some(2L)), // updated pair: first image closed
      (1L, "x", 11.0, 2L, None),     // ...and its new open interval
      (1L, "y", 20.0, 1L, None),     // SIBLING pair untouched, still open
      (2L, "x", 30.0, 1L, Some(3L))  // deleted pair closed, no successor
    ), rows.toString)
    // __hkey carries every key part (human-readable row identity)
    val hkeys = Manifest.readTable(spark, dst, "h")
      .select("__hkey").as[String].collect().toSet
    assert(hkeys == Set("1:x:1", "1:x:2", "1:y:1", "2:x:1"), hkeys.toString)
    // re-drive quiesces
    assert(Manifest.applyChangesScd2(spark, src, "t", dst, "h",
      Seq("a", "b")).isEmpty)
    // --- single-key path is the one-element delegate: same __hkey
    // format, same history rows as the q264 pipeline always produced
    val (src2, dst2) = freshRoots()
    Manifest.commitAppendStats(spark, src2, "t",
      Seq((1L, 1.0)).toDF("k", "v"), Seq("k"), "k", 1)
    Manifest.applyChangesScd2(spark, src2, "t", dst2, "h", Seq("k"))
    val hk = Manifest.readTable(spark, dst2, "h")
      .select("__hkey").as[String].collect().toSeq
    assert(hk == Seq("1:1"), hk.toString)
  }
}
