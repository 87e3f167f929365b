package graft

import graft.ops.Manifest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Merge-on-read DELETE via deletion vectors (q214): matching row
  * positions land in sidecars instead of rewriting files; every read
  * path applies them; compaction purges them; the change feed flags
  * them impure; vacuum collects superseded sidecars.
  */
class DeletionVectorSpec extends SparkSuite {

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-dv-spec").toString

  private def kv(rows: (Long, java.lang.Double)*): DataFrame =
    rows.toDF("k", "v")

  private def keysOf(df: DataFrame): Set[Long] =
    df.select("k").as[Long].collect().toSet

  private def dataFiles(root: String): Map[String, Long] = {
    val w = Files.walk(Paths.get(root, "data"))
    try w.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p.toString -> Files.size(p)).toMap
    finally w.close()
  }

  test("DV delete hides rows without rewriting; NULL predicate keeps") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      kv(1L -> 1.0, 2L -> 2.0, 3L -> null, 4L -> 4.0).repartition(2, col("k")))
    val before = dataFiles(root)
    Manifest.commitDeleteVectors(spark, root, "t", col("v") >= 2.0)
    assert(dataFiles(root) == before, "DV delete must not touch data files")
    // v=2.0 and v=4.0 deleted; v=null KEPT (SQL DELETE semantics)
    assert(keysOf(Manifest.readTable(spark, root, "t")) == Set(1L, 3L))
  }

  test("a second DV delete on the same files composes") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      kv(1L -> 1.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0).coalesce(1))
    Manifest.commitDeleteVectors(spark, root, "t", col("k") === 2L)
    Manifest.commitDeleteVectors(spark, root, "t", col("k") === 4L)
    assert(keysOf(Manifest.readTable(spark, root, "t")) == Set(1L, 3L))
  }

  test("the pre-delete version time-travels with all rows") {
    val root = freshRoot()
    val v1 = Manifest.commitAppend(spark, root, "t", kv(1L -> 1.0, 2L -> 2.0))
    Manifest.commitDeleteVectors(spark, root, "t", col("k") === 2L)
    assert(keysOf(Manifest.readTable(spark, root, "t", v1)) == Set(1L, 2L))
    assert(keysOf(Manifest.readTable(spark, root, "t")) == Set(1L))
  }

  test("compaction purges DVs; vacuum then collects the sidecars") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      (1L to 40L).map(k => (k, k * 1.0)).toDF("k", "v").repartition(4, col("k")))
    Manifest.commitDeleteVectors(spark, root, "t", col("k") % 2 === 0)
    Manifest.compactTable(spark, root, "t", targetBytes = 1L << 20)
    val got = keysOf(Manifest.readTable(spark, root, "t"))
    assert(got == (1L to 40L).filter(_ % 2 == 1).toSet)
    // rewritten files carry no DV reference
    val rows = Manifest.manifestRows(spark, root, Manifest.snapshotVersion(root))
    assert(!rows.exists(r => r._3 != null && r._3.contains("__dv")))
    val _ = Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    val w = Files.walk(Paths.get(root, "data"))
    val dvLeft =
      try w.iterator().asScala.count(_.getFileName.toString.contains(".dv-"))
      finally w.close()
    assert(dvLeft == 0, "superseded DV sidecars must be collected")
  }

  test("live DV sidecars survive vacuum") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t", kv(1L -> 1.0, 2L -> 2.0).coalesce(1))
    Manifest.commitDeleteVectors(spark, root, "t", col("k") === 2L)
    val _ = Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(keysOf(Manifest.readTable(spark, root, "t")) == Set(1L))
  }

  test("the change feed flags a DV interval impure; consumers refresh") {
    val root = freshRoot()
    val t = Files.createTempDirectory("graft-dv-consume").toString
    Manifest.commitAppend(spark, root, "t", kv(1L -> 1.0, 2L -> 2.0).coalesce(1))
    val synced = Manifest.consumeInto(spark, root, "t", t, "m", "app")(identity)
    assert(synced.isDefined)
    val v1 = Manifest.snapshotVersion(root)
    Manifest.commitDeleteVectors(spark, root, "t", col("k") === 2L)
    val (_, pure) = Manifest.tableChanges(spark, root, "t", v1)
    assert(!pure, "a DV commit must not read as pure append")
    val s2 = Manifest.consumeInto(spark, root, "t", t, "m", "app")(identity)
    assert(s2.exists(!_._3))
    assert(keysOf(Manifest.readTable(spark, t, "m")) == Set(1L))
  }

  test("MERGE on a DV'd table does not resurrect deleted rows") {
    val root = freshRoot()
    Manifest.commitAppendStats(spark, root, "t",
      kv(1L -> 1.0, 2L -> 2.0, 3L -> 3.0), Seq("k"), "k", 1)
    Manifest.commitDeleteVectors(spark, root, "t", col("k") === 2L)
    Manifest.commitMergeUpsert(spark, root, "t",
      kv(3L -> 30.0, 9L -> 9.0), "k")
    val got = Manifest.readTable(spark, root, "t")
      .select("k", "v").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.0, 3L -> 30.0, 9L -> 9.0))
  }

  test("the SQL FileIndex refuses a DV'd table instead of resurrecting") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t", kv(1L -> 1.0, 2L -> 2.0).coalesce(1))
    Manifest.commitDeleteVectors(spark, root, "t", col("k") === 2L)
    intercept[IllegalArgumentException] {
      graft.sources.ManifestSql.tableDF(spark, root, "t")._1.count()
    }
    // after compaction the DVs are gone and the SQL surface works again
    Manifest.compactTable(spark, root, "t", targetBytes = 1L << 20)
    assert(keysOf(graft.sources.ManifestSql.tableDF(spark, root, "t")._1) == Set(1L))
  }

  test("DV update: no rewrite, old image masked, new image appended") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      kv(1L -> 1.0, 2L -> 2.0, 3L -> null, 4L -> 4.0).repartition(2, col("k")))
    val before = dataFiles(root)
    val v1 = Manifest.snapshotVersion(root)
    Manifest.commitUpdateVectors(spark, root, "t",
      col("v") >= 2.0, Map("v" -> (col("v") * 10)))
    // original files untouched; new image files appended
    val after = dataFiles(root)
    assert(before.forall { case (p, n) => after.get(p).contains(n) },
      "DV update must not touch original data files")
    assert(after.size > before.size, "updated images must land as new files")
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    // k=2,4 matched (×10); k=1 not matched; k=3 NULL predicate kept
    assert(got == Map(1L -> Some(1.0), 2L -> Some(20.0),
      3L -> None, 4L -> Some(40.0)))
    // pre-update version time-travels with original values
    assert(Manifest.readTable(spark, root, "t", v1)
      .filter(col("v") === 2.0).count() == 1L)
  }

  test("DV update after DV delete cannot resurrect deleted rows") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      kv(1L -> 1.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0).coalesce(1))
    Manifest.commitDeleteVectors(spark, root, "t", col("k") === 2L)
    // k=2 is deleted AND would match the update predicate: it must
    // stay invisible, not come back as an updated copy
    Manifest.commitUpdateVectors(spark, root, "t",
      col("v") >= 2.0, Map("v" -> (col("v") + 100)))
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == Map(1L -> 1.0, 3L -> 103.0, 4L -> 104.0))
    // compaction purges both the delete and update vectors
    Manifest.compactTable(spark, root, "t", targetBytes = 1L << 20)
    val compacted = Manifest.readTable(spark, root, "t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(compacted == got)
    val rows = Manifest.manifestRows(spark, root, Manifest.snapshotVersion(root))
    assert(!rows.exists(r => r._3 != null && r._3.contains("__dv")))
  }

  test("DV commits replicate: sidecars ship, stats-only changes mirror") {
    val tmp = Files.createTempDirectory("graft-dv-replica-spec")
    val src = s"$tmp/src"; val dst = s"$tmp/dst"; val exp = s"$tmp/exp"
    Manifest.commitAppend(spark, src, "t",
      kv(1L -> 1.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0).repartition(2, col("k")))
    Manifest.replicateSnapshot(spark, src, dst) // bootstrap
    // a DV delete re-adds the SAME paths with changed stats — the sync
    // must mirror it (pair-based diffs would silently skip the commit)
    Manifest.commitDeleteVectors(spark, src, "t", col("k") === 2L)
    val (copied, bytes) = Manifest.replicateSnapshot(spark, src, dst)
    assert(copied >= 1 && bytes > 0L, "the DV sidecar must ship")
    assert(keysOf(Manifest.readTable(spark, dst, "t")) == Set(1L, 3L, 4L))
    // re-driven sync: ledger no-op
    assert(Manifest.replicateSnapshot(spark, src, dst) == ((0, 0L)))
    // a second DV delete merges positions into a fresh sidecar; the
    // replica follows (remove+re-add of the same manifest row)
    Manifest.commitDeleteVectors(spark, src, "t", col("k") === 4L)
    Manifest.replicateSnapshot(spark, src, dst)
    assert(keysOf(Manifest.readTable(spark, dst, "t")) == Set(1L, 3L))
    // export of a DV-bearing snapshot is self-contained: the masked
    // read at the fresh root opens the shipped sidecars
    Manifest.exportSnapshot(spark, src, exp)
    assert(keysOf(Manifest.readTable(spark, exp, "t")) == Set(1L, 3L))
  }

  test("dedup vectors keep the min-order row per key; no rewrite; idempotent") {
    import spark.implicits._
    val root = freshRoot()
    // key "a" appears in both files; key "b" twice in one file
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, "a"), (3L, "b"), (4L, "b")).toDF("id", "key").coalesce(1))
    Manifest.commitAppend(spark, root, "t",
      Seq((2L, "a"), (5L, "c")).toDF("id", "key").coalesce(1))
    val before = dataFiles(root)
    Manifest.commitDedupVectors(spark, root, "t", col("key"), "id")
    assert(dataFiles(root).keySet.filter(_.endsWith(".parquet")) ==
      before.keySet.filter(_.endsWith(".parquet")))
    val got = Manifest.readTable(spark, root, "t")
      .select("id").as[Long].collect().sorted.toSeq
    // a → min id 1 survives; b → 3; c → 5
    assert(got == Seq(1L, 3L, 5L))
    // re-driven dedup: already duplicate-free, version unchanged
    val v = Manifest.snapshotVersion(root)
    Manifest.commitDedupVectors(spark, root, "t", col("key"), "id")
    assert(Manifest.snapshotVersion(root) == v)
    // compaction materializes the survivors and purges the DVs
    Manifest.compactTable(spark, root, "t", targetBytes = 1L << 20)
    assert(Manifest.readTable(spark, root, "t")
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 5L))
  }

  test("REORG APPLY PURGE rewrites only DV'd files; clean files inherit") {
    import graft.sources.ManifestSql
    val root = freshRoot()
    Manifest.commitAppendStats(spark, root, "t",
      (1L to 100L).toDF("k"), Seq("k"), "k", 4)
    ManifestSql.runDml(spark, root, "DELETE FROM t WHERE k <= 10")
    val preV = Manifest.snapshotVersion(root)
    val before = Manifest.manifestRows(spark, root, preV)
      .collect { case ("t", f, _) => f }.toSet
    val rep = ManifestSql.runDml(spark, root,
      "REORG TABLE t APPLY (PURGE)").head()
    assert(rep.getLong(1) == 1L, s"expected exactly the k<=25 file: $rep")
    val afterV = Manifest.snapshotVersion(root)
    val after = Manifest.manifestRows(spark, root, afterV)
      .collect { case ("t", f, _) => f }.toSet
    // the three clean files keep their exact paths; one file replaced
    assert((before intersect after).size == 3, s"$before vs $after")
    assert(after.size == 4)
    // DVs are gone; content and counts preserved; pre-purge state
    // stays time-travelable (still DV-masked there)
    assert(Manifest.describeDetail(spark, root, "t").head().getLong(5) == 0L)
    assert(Manifest.readTable(spark, root, "t").count() == 90L)
    assert(Manifest.readTable(spark, root, "t", preV).count() == 90L)
    // the rewritten file re-records stats: bounds answer pure-metadata
    assert(Manifest.columnBounds(spark, root, "t", "k", "bigint")
      .contains(("11", "100")))
    // idempotent: a DV-free table is a no-op, no commit
    val (v2, n2) = Manifest.compactPurgeDv(spark, root, "t")
    assert(v2 == afterV && n2 == 0)
  }

  test("q214 staged root matches a copy-on-write recompute") {
    val sfDir = "/root/testdata/sf0.001"
    val root = Manifest.dvRoot(spark, sfDir)
    val got = Manifest.readTable(spark, root, "events_log").count()
    val raw = Tables.load(spark, sfDir, "events")
    val expected = raw.filter(
      !(col("ts") >= lit("2024-01-12 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-14 00:00:00").cast("timestamp"))).count()
    assert(got == expected)
    assert(got < raw.count(), "fixture purge window must be non-empty")
  }
}
