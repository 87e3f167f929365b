package graft

import graft.ops.Manifest
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The snapshot-manifest commit contract (q187): readers resolve
  * pointer → manifest → explicit files, so orphans and crashed commits
  * are invisible, old versions stay readable, and a multi-table
  * snapshot is version-consistent.
  */
class ManifestSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("planted orphan data file is invisible to manifest reads") {
    val root = Manifest.snapshotRoot(spark, sfDir)
    // the orphan IS physically in the live data prefix...
    assert(Files.exists(
      Paths.get(s"$root/data/v2/user_totals/part-99999-orphan.parquet")))
    // ...but a directory read sees it and the manifest read does not
    val dirRows = spark.read.parquet(s"$root/data/v2/user_totals").count()
    val manifestRows = Manifest.readTable(spark, root, "user_totals").count()
    assert(dirRows > manifestRows)
  }

  test("crashed commit (data written, pointer not swapped) stays invisible") {
    val root = Files.createTempDirectory("graft-manifest-spec").toString
    import spark.implicits._
    val t1 = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val v1 = Manifest.commit(spark, root, Map("t" -> t1))
    assert(v1 == 1L && Manifest.snapshotVersion(root) == 1L)
    // simulate a writer that died after staging data but before the swap
    Seq((9L, 99.0)).toDF("k", "v")
      .write.parquet(s"$root/data/v2/t")
    assert(Manifest.snapshotVersion(root) == 1L)
    assert(Manifest.readTable(spark, root, "t").count() == 2L)
  }

  test("old versions stay readable and reflect their own window") {
    val root = Manifest.snapshotRoot(spark, sfDir)
    val cut = lit(graft.ops.Cdc.versionCut).cast("timestamp")
    val ev = Tables.load(spark, sfDir, "events")
    val v1Users = Manifest.readTable(spark, root, "user_totals", version = 1L)
    val v2Users = Manifest.readTable(spark, root, "user_totals", version = 2L)
    assert(v1Users.count() ==
      ev.filter(col("ts") < cut).select("user_id").distinct().count())
    assert(v2Users.count() == ev.select("user_id").distinct().count())
    // v1's totals really are the pre-cut window, not a stale copy of v2
    assert(v1Users.agg(sum("n_u")).head().getLong(0) ==
      ev.filter(col("ts") < cut).count())
    assert(v2Users.agg(sum("n_u")).head().getLong(0) == ev.count())
  }

  test("append commit carries v1 files by path, untouched, into v2") {
    val root = Manifest.evolutionRoot(spark, sfDir)
    def manifestFiles(v: Long): Set[String] =
      Manifest.manifestRows(spark, root, v).map(_._2).toSet
    val v1 = manifestFiles(1L)
    val v2 = manifestFiles(2L)
    assert(v1.subsetOf(v2) && v2.size > v1.size)
    // every v1 file still physically present under its original path
    assert(v1.forall(rel => Files.exists(Paths.get(s"$root/$rel"))))
    // v1 files all live under the v1 prefix — the append wrote nothing there
    assert(v1.forall(_.startsWith("data/v1/")))
    assert((v2 -- v1).forall(_.startsWith("data/v2/")))
    // the stitched read covers exactly the source row count
    assert(Manifest.readTable(spark, root, "events_log").count() ==
      Tables.load(spark, sfDir, "events").count())
  }

  test("file stats prune the read set; pruned result equals unpruned") {
    val root = Manifest.statsRoot(spark, sfDir)
    val (pruned, read, total) = Manifest.readTableRange(spark, root,
      "events_log", "2024-01-08 00:00:00", "2024-01-15 00:00:00")
    assert(total == 16)
    assert(read < total / 2, s"expected <8 of $total files, read $read")
    val lo = lit("2024-01-08 00:00:00").cast("timestamp")
    val hi = lit("2024-01-15 00:00:00").cast("timestamp")
    val prunedCount = pruned
      .filter(col("ts") >= lo && col("ts") < hi).count()
    val fullCount = Manifest.readTable(spark, root, "events_log")
      .filter(col("ts") >= lo && col("ts") < hi).count()
    assert(prunedCount == fullCount && fullCount > 0)
  }

  test("vacuum keeps exactly the retained manifest's references") {
    // assertions are root-internal: the fixed-path fixture may have
    // been seeded by any sfDir, but plan-vs-reality must hold for all
    val root = Manifest.vacuumedRoot(spark, sfDir)
    assert(Manifest.snapshotVersion(root) == 2L)
    assert(!Files.isDirectory(Paths.get(s"$root/manifest/v1"))) // expired
    assert(!Files.exists(
      Paths.get(s"$root/data/v2/user_totals/part-99999-orphan.parquet")))
    val live = Manifest.manifestRows(spark, root, 2L).map(_._2).toSet
    // every live file exists; no parquet on disk outside the live set
    assert(live.forall(rel => Files.exists(Paths.get(s"$root/$rel"))))
    val walk = Files.walk(Paths.get(s"$root/data"))
    val onDisk =
      try walk.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => Paths.get(root).relativize(p).toString.replace('\\', '/'))
        .toSet
      finally walk.close()
    assert(onDisk == live)
    // reads through the retained manifest still work
    assert(Manifest.readTable(spark, root, "user_totals").count() > 0)
  }

  test("compaction commit: file count drops, fragmented version time-travels") {
    val root = Manifest.compactedRoot(spark, sfDir)
    val v = Manifest.snapshotVersion(root)
    assert(v == 7L) // six fragmented appends + one compaction commit
    def nFiles(ver: Long): Long =
      Manifest.manifestRows(spark, root, ver).count(_._1 == "events_log").toLong
    assert(nFiles(6L) == 24L) // 6 commits x repartition(4)
    assert(nFiles(7L) < 6L)   // bin-pack bound at fixture scale
    // the atomic flip lost nothing
    val before = Manifest.readTable(spark, root, "events_log", version = 6L)
    val after = Manifest.readTable(spark, root, "events_log", version = 7L)
    assert(after.count() == before.count())
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
    // fragmented files survive (time travel) until a vacuum collects them
    val liveV6 = Manifest.manifestRows(spark, root, 6L).map(_._2)
    assert(liveV6.forall(rel => Files.exists(Paths.get(s"$root/$rel"))))
  }

  test("commitCas: crashed claimer is skipped; committed data never clobbered") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cas-spec").toString
    val v1 = Manifest.commitCas(spark, root,
      Map("t" -> Seq((1L, 10.0)).toDF("k", "v")))
    assert(v1 == 1L)
    // a claimer that died after claiming v2 but before the pointer swap
    Files.createDirectories(Paths.get(s"$root/manifest/v2"))
    // readers still serve v1 (the pointer never advanced)
    assert(Manifest.snapshotVersion(root) == 1L)
    assert(Manifest.readTable(spark, root, "t").count() == 1L)
    // the next committer skips the dead claim instead of deadlocking
    val v3 = Manifest.commitCas(spark, root,
      Map("t" -> Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")))
    assert(v3 == 3L)
    assert(Manifest.snapshotVersion(root) == 3L)
    assert(Manifest.readTable(spark, root, "t").count() == 2L)
    // v1's committed files are untouched by the later commit
    assert(Manifest.readTable(spark, root, "t", version = 1L).count() == 1L)
  }

  test("a relocated root serves identical reads (root-relative paths)") {
    // the DR-restore / bucket-migration contract: copy the whole root
    // anywhere and every snapshot read must work unchanged
    val root = Manifest.snapshotRoot(spark, sfDir)
    val moved = Files.createTempDirectory("graft-relocate-spec").toString
    val walk = Files.walk(Paths.get(root))
    try walk.iterator().asScala.foreach { p =>
      val dest = Paths.get(moved).resolve(Paths.get(root).relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(dest)
      else Files.copy(p, dest)
    } finally walk.close()
    val orig = Manifest.readTable(spark, root, "user_totals").orderBy("user_id")
    val reloc = Manifest.readTable(spark, moved, "user_totals").orderBy("user_id")
    assert(reloc.exceptAll(orig).isEmpty && orig.exceptAll(reloc).isEmpty)
    assert(Manifest.snapshotVersion(moved) == Manifest.snapshotVersion(root))
  }

  test("schema enforcement: drift refuses to commit, evolution registers") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-schema-spec").toString
    Manifest.commitAppendEvolve(spark, root,
      "t", Seq((1L, "a")).toDF("k", "s"))
    // dropped column
    intercept[IllegalArgumentException] {
      Manifest.commitAppendEvolve(spark, root, "t", Seq(Tuple1(2L)).toDF("k"))
    }
    // type drift
    intercept[IllegalArgumentException] {
      Manifest.commitAppendEvolve(spark, root, "t",
        Seq((3, "c")).toDF("k", "s")) // k is Int here, table has Long
    }
    // silent add without the evolution flag
    intercept[IllegalArgumentException] {
      Manifest.commitAppendEvolve(spark, root, "t",
        Seq((4L, "d", 1.0)).toDF("k", "s", "x"))
    }
    // none of the rejected attempts advanced the table
    assert(Manifest.snapshotVersion(root) == 1L)
    assert(Manifest.readTableEvolved(spark, root, "t").count() == 1L)
    // sanctioned evolution: union schema registers, old rows NULL-fill
    Manifest.commitAppendEvolve(spark, root, "t",
      Seq((5L, "e", 9.5)).toDF("k", "s", "x"), allowEvolution = true)
    val evolved = Manifest.readTableEvolved(spark, root, "t").orderBy("k")
    assert(evolved.schema.fieldNames.toSeq == Seq("k", "s", "x"))
    val rows = evolved.collect()
    assert(rows.length == 2 && rows(0).isNullAt(2) && rows(1).getDouble(2) == 9.5)
  }

  test("delta chain: O(delta) manifests, automatic fold, lossless resolution") {
    val root = Manifest.deltaChainRoot(spark, sfDir)
    assert(Manifest.snapshotVersion(root) == 10L)
    def isDelta(v: Long): Boolean =
      Files.exists(Paths.get(s"$root/manifest/v$v/_base"))
    def rawRows(v: Long): Long =
      spark.read.parquet(s"$root/manifest/v$v").count()
    // shape: v1 full, v2..v8 deltas, v9 the automatic fold, v10 delta
    assert(!isDelta(1L))
    (2L to 8L).foreach(v => assert(isDelta(v), s"v$v should be a delta"))
    assert(!isDelta(9L), "v9 should be the automatic fold (full)")
    assert(isDelta(10L))
    // a delta claim stores ONLY its added files (2 per append), while
    // the RESOLVED snapshot keeps growing — the O(delta) contract
    assert(rawRows(8L) <= 2L)
    assert(Manifest.manifestRows(spark, root, 8L).size >= 14)
    // the fold materializes the full list; the next delta is small again
    assert(rawRows(9L) == Manifest.manifestRows(spark, root, 9L).size.toLong)
    assert(rawRows(10L) <= 2L)
    // resolution is lossless: the stitched read equals the source table
    assert(Manifest.readTable(spark, root, "events_log").count() ==
      Tables.load(spark, sfDir, "events").count())
    // time travel through the chain still works mid-chain
    assert(Manifest.manifestRows(spark, root, 5L).size <
      Manifest.manifestRows(spark, root, 10L).size)
  }

  test("multi-column stats prune strictly under a conjunctive predicate") {
    val root = Manifest.multiStatsRoot(spark, sfDir)
    val preds = Seq(
      Manifest.Pred("ts", "2024-01-08 00:00:00", "2024-01-15 00:00:00", "timestamp"),
      Manifest.Pred("user_id", "2", "5", "bigint"))
    val (pruned, read, total) =
      Manifest.readTablePruned(spark, root, "events_log", preds)
    assert(total == 16)
    // ts kills one epoch (8 files), the user band kills most of the rest
    assert(read < total / 2, s"expected the conjunction to prune, read $read/$total")
    // the single-column ts prune alone keeps MORE files than the conjunction
    val (_, readTsOnly, _) =
      Manifest.readTablePruned(spark, root, "events_log", preds.take(1))
    assert(read < readTsOnly, s"user_id stats pruned nothing ($read vs $readTsOnly)")
    // prune is a bound, not a filter: pruned+predicate == full+predicate
    val rowPred = col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
      col("ts") < lit("2024-01-15 00:00:00").cast("timestamp") &&
      col("user_id").between(2, 5)
    val prunedCount = pruned.filter(rowPred).count()
    val fullCount = Manifest.readTable(spark, root, "events_log")
      .filter(rowPred).count()
    assert(prunedCount == fullCount && fullCount > 0)
    // a window overlapping NO file is a valid empty answer, not a crash
    val (none, readNone, _) = Manifest.readTablePruned(spark, root, "events_log",
      Seq(Manifest.Pred("ts", "2031-01-01 00:00:00", "2031-01-02 00:00:00", "timestamp")))
    assert(readNone == 0 && none.count() == 0)
    assert(none.schema.fieldNames.contains("user_id")) // schema preserved
  }

  test("delete-where rewrites only overlapping files; pre-delete time-travels") {
    val root = Manifest.deleteWhereRoot(spark, sfDir)
    assert(Manifest.snapshotVersion(root) == 3L) // 2 appends + 1 delete
    val before = Manifest.manifestRows(spark, root, 2L).map(_._2).toSet
    val after = Manifest.manifestRows(spark, root, 3L).map(_._2).toSet
    // untouched files inherited BY REFERENCE (same rel paths); some
    // files removed, survivors re-added under the delete version
    val untouched = before.intersect(after)
    assert(untouched.nonEmpty && (before -- after).nonEmpty)
    assert((after -- before).forall(_.startsWith("data/v3")))
    // O(affected) delta metadata: the delete claim logs only the
    // removed + re-added files, far fewer than the 16-file table
    val deltaRows = spark.read.parquet(s"$root/manifest/v3").count()
    assert(deltaRows < 16, s"delete claim logged $deltaRows ops")
    // content: post-delete == raw complement; pre-delete time-travels
    val lo = lit("2024-01-10 00:00:00").cast("timestamp")
    val hi = lit("2024-01-13 00:00:00").cast("timestamp")
    val ev = Tables.load(spark, sfDir, "events")
    val expectDeleted = ev.filter(col("ts") >= lo && col("ts") < hi).count()
    assert(expectDeleted > 0)
    assert(Manifest.readTable(spark, root, "events_log").count() ==
      ev.count() - expectDeleted)
    assert(Manifest.readTable(spark, root, "events_log", version = 2L).count() ==
      ev.count())
    // nothing survives inside the deleted window
    assert(Manifest.readTable(spark, root, "events_log")
      .filter(col("ts") >= lo && col("ts") < hi).count() == 0)
  }

  test("merge upsert rewrites only key-overlapping files; keys replaced exactly once") {
    val root = Manifest.mergeRoot(spark, sfDir)
    assert(Manifest.snapshotVersion(root) == 2L) // 1 append + 1 merge
    val before = Manifest.manifestRows(spark, root, 1L).map(_._2).toSet
    val after = Manifest.manifestRows(spark, root, 2L).map(_._2).toSet
    // untouched user-range files inherited by reference
    assert(before.intersect(after).nonEmpty && (before -- after).nonEmpty)
    // merged state: band keys carry FULL-window totals, others pre-cut
    val ev = Tables.load(spark, sfDir, "events")
    val cut = lit(graft.ops.Cdc.versionCut).cast("timestamp")
    val merged = Manifest.readTable(spark, root, "user_totals")
    val bandExpected = ev.filter(col("user_id").between(2, 5)).count()
    val bandGot = merged.filter(col("user_id").between(2, 5))
      .agg(sum("n_u")).head().getLong(0)
    assert(bandGot == bandExpected, s"band rows $bandGot != $bandExpected")
    val restExpected = ev.filter(!col("user_id").between(2, 5) && col("ts") < cut).count()
    val restGot = merged.filter(!col("user_id").between(2, 5))
      .agg(sum("n_u")).head().getLong(0)
    assert(restGot == restExpected)
    // each key exactly once (no duplicate from a double-applied update)
    assert(merged.count() == merged.select("user_id").distinct().count())
    // pre-merge snapshot time-travels
    assert(Manifest.readTable(spark, root, "user_totals", version = 1L)
      .agg(sum("n_u")).head().getLong(0) == ev.filter(col("ts") < cut).count())
  }

  test("z-order layout gives BOTH dimensions pruning power") {
    val root = Manifest.zorderRoot(spark, sfDir)
    val tsPred = Manifest.Pred("ts",
      "2024-01-08 00:00:00", "2024-01-15 00:00:00", "timestamp")
    val uidPred = Manifest.Pred("user_id", "2", "5", "bigint")
    val (_, readTs, total) =
      Manifest.readTablePruned(spark, root, "events_log", Seq(tsPred))
    val (_, readUid, _) =
      Manifest.readTablePruned(spark, root, "events_log", Seq(uidPred))
    val (pruned, readBoth, _) =
      Manifest.readTablePruned(spark, root, "events_log", Seq(tsPred, uidPred))
    assert(total == 16)
    // the Z-curve's whole point: EACH dimension prunes ALONE — a range
    // layout gives this only to its leading column
    assert(readTs < total, s"ts prune had no power ($readTs/$total)")
    assert(readUid < total, s"user_id prune had no power ($readUid/$total)")
    assert(readBoth <= math.min(readTs, readUid))
    // bound, not filter: pruned+predicate == full+predicate
    val rowPred = col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
      col("ts") < lit("2024-01-15 00:00:00").cast("timestamp") &&
      col("user_id").between(2, 5)
    val prunedCount = pruned.filter(rowPred).count()
    val fullCount = Manifest.readTable(spark, root, "events_log")
      .filter(rowPred).count()
    assert(prunedCount == fullCount && fullCount > 0)
  }

  test("export ships exactly the snapshot: checksummed, orphan-free, source-independent") {
    val src = Manifest.snapshotRoot(spark, sfDir)
    val dest = Files.createTempDirectory("graft-export-spec").toString
    val refs = Manifest
      .manifestRows(spark, src, Manifest.snapshotVersion(src)).map(_._2).toSet
    val (nFiles, nBytes) = Manifest.exportSnapshot(spark, src, dest)
    assert(nFiles == refs.size && nBytes > 0)
    // dest is v1 of its own log and serves the identical relation
    assert(Manifest.snapshotVersion(dest) == 1L)
    val orig = Manifest.readTable(spark, src, "user_totals")
    val copy = Manifest.readTable(spark, dest, "user_totals")
    assert(copy.exceptAll(orig).isEmpty && orig.exceptAll(copy).isEmpty)
    // only referenced files traveled: the planted orphan stayed behind
    val walk = Files.walk(Paths.get(dest))
    val shipped =
      try walk.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet") &&
          !Paths.get(dest).relativize(p).toString.startsWith("manifest"))
        .map(p => Paths.get(dest).relativize(p).toString.replace('\\', '/'))
        .toSet
      finally walk.close()
    assert(shipped == refs)
    assert(!shipped.exists(_.contains("orphan")))
    // a second export into the same root must refuse (v1 already claimed)
    intercept[IllegalStateException] {
      Manifest.exportSnapshot(spark, src, dest)
    }
  }

  test("schema registry is per-table; non-evolve commits don't strand readers") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-schema2-spec").toString
    // two tables evolving in ONE root must not clobber each other
    Manifest.commitAppendEvolve(spark, root, "a", Seq((1L, "x")).toDF("k", "s"))
    Manifest.commitAppendEvolve(spark, root, "b", Seq((9.5, 7L)).toDF("f", "n"))
    assert(Manifest.readTableEvolved(spark, root, "a")
      .schema.fieldNames.toSeq == Seq("k", "s"))
    assert(Manifest.readTableEvolved(spark, root, "b")
      .schema.fieldNames.toSeq == Seq("f", "n"))
    // a NON-evolve commit (plain append) advances the version without a
    // registration; resolution falls back to the newest one at-or-below
    Manifest.commitAppend(spark, root, "a", Seq((2L, "y")).toDF("k", "s"))
    assert(Manifest.readTableEvolved(spark, root, "a").count() == 2L)
    // evolving one table leaves the other's registration untouched
    Manifest.commitAppendEvolve(spark, root, "a",
      Seq((3L, "z", true)).toDF("k", "s", "ok"), allowEvolution = true)
    assert(Manifest.readTableEvolved(spark, root, "a")
      .schema.fieldNames.toSeq == Seq("k", "s", "ok"))
    assert(Manifest.readTableEvolved(spark, root, "b")
      .schema.fieldNames.toSeq == Seq("f", "n"))
  }

  test("commitDeleteKeys: join-driven DV delete, no driver-side key list") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-delkeys-spec").toString
    Manifest.commitAppend(spark, root, "t",
      (1L to 100L).toDF("k").withColumn("v", col("k") * 2).repartition(4))
    // duplicate and absent keys are harmless; the delete is a semi-join
    val doomed = Seq(3L, 7L, 7L, 999L).toDF("k")
    Manifest.commitDeleteKeys(spark, root, "t", doomed, "k")
    assert(Manifest.readTable(spark, root, "t").count() == 98L)
    assert(Manifest.readTable(spark, root, "t")
      .filter(col("k").isin(3L, 7L)).count() == 0L)
    // NULL keys match nothing (semi-join null semantics = SQL IN)
    Manifest.commitDeleteKeys(spark, root, "t",
      Seq[Option[Long]](None).toDF("k"), "k")
    assert(Manifest.readTable(spark, root, "t").count() == 98L)
    // merge-on-read: the original files survive; pre-delete time-travels
    assert(Manifest.readTable(spark, root, "t", 1L).count() == 100L)
    // the DV commit stacks with a second keyed delete (position merge)
    Manifest.commitDeleteKeys(spark, root, "t", Seq(8L).toDF("k"), "k")
    assert(Manifest.readTable(spark, root, "t").count() == 97L)
  }

  test("commitBatchToManifest: version guard makes redelivery a no-op") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cbm-spec").toString
    val b0 = Seq((1L, 10.0, "2024-01-02 00:00:00"))
      .toDF("k", "v", "s").withColumn("ts", col("s").cast("timestamp")).drop("s")
    val b1 = Seq((2L, 20.0, "2024-01-20 00:00:00"))
      .toDF("k", "v", "s").withColumn("ts", col("s").cast("timestamp")).drop("s")
    graft.streaming.Streams.commitBatchToManifest(b0, root, 0L)
    // genuine batch-0 redelivery (ledger at exactly 1: first batch
    // committed, checkpoint never recorded it, restart re-runs it) —
    // the crash-recovery case, MUST stay a silent no-op
    graft.streaming.Streams.commitBatchToManifest(b0, root, 0L)
    assert(Manifest.snapshotVersion(root) == 1L)
    graft.streaming.Streams.commitBatchToManifest(b1, root, 1L)
    assert(Manifest.snapshotVersion(root) == 2L)
    // redeliver the LAST batch (what Spark actually replays after a
    // crash-before-checkpoint-commit); it may not commit again
    graft.streaming.Streams.commitBatchToManifest(b1, root, 1L)
    assert(Manifest.snapshotVersion(root) == 2L)
    // batch 0 against a ledger already past 1 is NOT a redelivery —
    // it is a FRESH checkpoint whose batch 0 spans all available
    // input; a no-op here would silently drop the unseen versions,
    // so it must fail loudly instead
    intercept[IllegalStateException] {
      graft.streaming.Streams.commitBatchToManifest(b0, root, 0L)
    }
    assert(Manifest.snapshotVersion(root) == 2L)
    assert(Manifest.readTable(spark, root, "events_log").count() == 2L)
    // a batch-id GAP (batch 2 missing) must fail loudly, not no-op:
    // appending batch 3 over the hole would misalign the ledger forever
    intercept[IllegalStateException] {
      graft.streaming.Streams.commitBatchToManifest(b1, root, 3L)
    }
    assert(Manifest.snapshotVersion(root) == 2L)
    // event-time batches carry ts stats: the STREAMING table is
    // range-prunable like a batch-written one
    val (pruned, read, total) = Manifest.readTableRange(spark, root,
      "events_log", "2024-01-01 00:00:00", "2024-01-05 00:00:00")
    assert(total == 2 && read == 1, s"expected 1 of $total files, read $read")
    assert(pruned.count() == 1L)
  }

  test("commitBatchToManifest: interleaved maintenance commit drops no batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cbm-maint-spec").toString
    def b(k: Long, day: Int) = Seq((k, k * 10.0, f"2024-01-$day%02d 00:00:00"))
      .toDF("k", "v", "s").withColumn("ts", col("s").cast("timestamp")).drop("s")
    graft.streaming.Streams.commitBatchToManifest(b(1, 2), root, 0L)
    graft.streaming.Streams.commitBatchToManifest(b(2, 10), root, 1L)
    // a MAINTENANCE commit (compaction) advances the version past the
    // next batch id — the exact interleaving a version-equality gate
    // silently drops a batch on; the per-app txn ledger must not
    Manifest.compactTable(spark, root, "events_log", 8L << 20)
    assert(Manifest.snapshotVersion(root) > 2L)
    graft.streaming.Streams.commitBatchToManifest(b(3, 20), root, 2L)
    assert(Manifest.readTable(spark, root, "events_log").count() == 3L,
      "batch 2 must commit after an interleaved compaction")
    // redelivery of batch 2 is still a no-op, and the gap guard holds
    graft.streaming.Streams.commitBatchToManifest(b(3, 20), root, 2L)
    assert(Manifest.readTable(spark, root, "events_log").count() == 3L)
    intercept[IllegalStateException] {
      graft.streaming.Streams.commitBatchToManifest(b(9, 21), root, 4L)
    }
    // the ledger survives vacuum: markers are carried past the floor
    Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(Manifest.lastCommittedTxn(root, "stream-events_log").contains(2L))
    graft.streaming.Streams.commitBatchToManifest(b(3, 20), root, 2L) // no-op
    assert(Manifest.readTable(spark, root, "events_log").count() == 3L)
  }

  test("delete-where keeps rows whose predicate is NULL (SQL DELETE semantics)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-delnull-spec").toString
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(50.0)), (4L, None))
      .toDF("k", "v")
    Manifest.commitAppendRanged(spark, root, "t", df, "k", 2)
    Manifest.commitDeleteWhere(spark, root, "t",
      Seq(Manifest.Pred("k", "1", "4", "bigint")), col("v") > 10.0)
    val left = Manifest.readTable(spark, root, "t")
      .select("k").as[Long].collect().sorted.toSeq
    // only k=3 (v=50 > 10) deletes; NULL-predicate rows k=2, k=4 survive
    assert(left == Seq(1L, 2L, 4L))
  }

  test("merge upsert rejects duplicate-key update batches") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-mergedup-spec").toString
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), "k", 1)
    intercept[IllegalArgumentException] {
      Manifest.commitMergeUpsert(spark, root, "t",
        Seq((2L, 20.0), (2L, 21.0)).toDF("k", "v"), "k")
    }
    // the rejected merge must not have committed anything
    assert(Manifest.readTable(spark, root, "t").count() == 2L)
    // NULL keys are NOT duplicates of each other: a null key matches no
    // target row (plain inserts), so this batch must commit
    Manifest.commitMergeUpsert(spark, root, "t",
      Seq((Some(2L), 20.0), (None, 30.0), (None, 31.0)).toDF("k", "v"), "k")
    val t = Manifest.readTable(spark, root, "t")
    assert(t.count() == 4L) // 1,2(updated) + two null-key inserts
    assert(t.filter(col("k").isNull).count() == 2L)
    assert(t.filter(col("k") === 2L).select("v").head().getDouble(0) == 20.0)
  }

  test("vacuum grace window protects in-flight (unreferenced, young) files") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-vacgrace-spec").toString
    Manifest.commit(spark, root, Map("t" -> Seq((1L, 1.0)).toDF("k", "v")))
    Manifest.commit(spark, root, Map("t" -> Seq((2L, 2.0)).toDF("k", "v")))
    // a concurrent writer mid-commit: data published, claim not yet won
    val inflight = Paths.get(root, "data", "v9", "t")
    Files.createDirectories(inflight)
    Seq((9L, 9.0)).toDF("k", "v").write.mode("overwrite")
      .parquet(inflight.toString)
    // default grace: the young unreferenced file SURVIVES (v1's dead
    // files are also young here, so only expired manifests go)
    Manifest.vacuum(spark, root, keep = 1)
    assert(Files.list(inflight).iterator().asScala
      .exists(_.getFileName.toString.endsWith(".parquet")),
      "in-flight file must survive a default-grace vacuum")
    // grace 0 (explicit single-writer opt-in) collects it
    Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(!Files.isDirectory(inflight) || !Files.list(inflight).iterator().asScala
      .exists(_.getFileName.toString.endsWith(".parquet")))
    assert(Manifest.readTable(spark, root, "t").count() == 1L)
  }

  test("tableChanges: append interval = exactly the delta; rewrite interval flags impure") {
    val root = Manifest.deltaChainRoot(spark, sfDir)
    // (3, 6] of the ten-append chain = slices 4..6 and nothing else
    val (delta, pure) = Manifest.tableChanges(spark, root, "events_log", 3L, 6L)
    assert(pure)
    val v3 = Manifest.readTable(spark, root, "events_log", version = 3L).count()
    val v6 = Manifest.readTable(spark, root, "events_log", version = 6L).count()
    assert(delta.count() == v6 - v3)
    // empty interval: zero rows, schema intact
    val (none, pure2) = Manifest.tableChanges(spark, root, "events_log", 6L, 6L)
    assert(pure2 && none.count() == 0L &&
      none.columns.contains("value"))
    // an interval crossing a REWRITE (compaction) must flag impure —
    // its file delta would double-count surviving rows
    val croot = Manifest.compactedRoot(spark, sfDir)
    val cv = Manifest.snapshotVersion(croot)
    val (_, pure3) = Manifest.tableChanges(spark, croot, "events_log", cv - 1, cv)
    assert(!pure3)
    // explicit toVersion=0 is a caller bug, not "current snapshot"
    intercept[IllegalArgumentException] {
      Manifest.tableChanges(spark, root, "events_log", 0L, 0L)
    }
    // an interval spanning an evolving append pins the registered
    // schema: the delta carries the evolved column
    val eroot = Manifest.evolvedSchemaRoot(spark, sfDir)
    val (edelta, epure) = Manifest.tableChanges(spark, eroot, "events_log", 1L, 2L)
    assert(epure && edelta.columns.contains("quality"))
    assert(edelta.filter(col("quality").isNull).count() == 0L)
  }

  test("JVM prune evaluation matches the Spark-cast evaluation") {
    val root = Manifest.multiStatsRoot(spark, sfDir)
    val v = Manifest.snapshotVersion(root)
    val predSets = Seq(
      Seq(Manifest.Pred("ts", "2024-01-08 00:00:00", "2024-01-15 00:00:00", "timestamp")),
      Seq(Manifest.Pred("user_id", "2", "5", "bigint")),
      Seq(Manifest.Pred("ts", "2024-01-08 00:00:00", "2024-01-15 00:00:00", "timestamp"),
        Manifest.Pred("user_id", "2", "5", "bigint")),
      Seq(Manifest.Pred("ts", "2030-01-01 00:00:00", "2030-01-02 00:00:00", "timestamp")))
    predSets.foreach { preds =>
      val jvm = Manifest.readTablePruned(spark, root, "events_log", preds, v)
      val spk = Manifest.overlappingRowsSpark(spark, root, "events_log", preds, v)
      assert(jvm._2 == spk._1.size,
        s"JVM kept ${jvm._2} files, Spark kept ${spk._1.size} for $preds")
    }
  }

  test("replicateSnapshot: bootstrap, delta sync, idempotence, divergence guard") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-replica-spec")
    val src = s"$tmp/src"; val dst = s"$tmp/dst"
    Manifest.commitAppendRanged(spark, src, "t",
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("k", "v"), "k", 2)
    // bootstrap = full export with the replica ledger in v1
    val (f1, b1) = Manifest.replicateSnapshot(spark, src, dst)
    assert(f1 == 2 && b1 > 0L)
    assert(Manifest.readTable(spark, dst, "t").count() == 4L)
    assert(Manifest.lastCommittedTxn(dst, "replica").contains(1L))
    // incremental: one append at the source ships exactly its files —
    // committed with a stream-style txn marker, which the sync must
    // carry so a writer failing over to the replica resumes correctly
    Manifest.commitAppend(spark, src, "t",
      Seq((5L, 5.0), (6L, 6.0)).toDF("k", "v").coalesce(1),
      txn = Some("stream-x" -> 7L))
    val (f2, _) = Manifest.replicateSnapshot(spark, src, dst)
    assert(f2 == 1, s"expected only the appended file to ship, got $f2")
    assert(Manifest.readTable(spark, dst, "t").count() == 6L)
    assert(Manifest.lastCommittedTxn(dst, "stream-x").contains(7L),
      "the source's txn ledger must replicate with the data")
    // re-driven sync: ledger makes it a no-op
    assert(Manifest.replicateSnapshot(spark, src, dst) == ((0, 0L)))
    // a rewrite (delete) mirrors as its remove+add footprint
    Manifest.commitDeleteWhere(spark, src, "t",
      Seq(Manifest.Pred("k", "5", "6", "bigint")), col("k") >= 5L)
    val (f3, _) = Manifest.replicateSnapshot(spark, src, dst)
    assert(Manifest.readTable(spark, dst, "t").count() == 4L)
    assert(f3 <= 1) // at most the survivor rewrite ships, never a re-copy
    // out-of-band write on the replica: the next sync must fail loudly
    Manifest.commitAppend(spark, dst, "t", Seq((99L, 9.9)).toDF("k", "v"))
    Manifest.commitAppend(spark, src, "t", Seq((7L, 7.0)).toDF("k", "v"))
    intercept[Manifest.CommitConflict] {
      Manifest.replicateSnapshot(spark, src, dst, maxRetries = 2)
    }
  }

  test("registry markers replicate: properties, grants, ACL closure, policies") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-replica-registry")
    val src = s"$tmp/src"; val dst = s"$tmp/dst"
    Manifest.commitAppend(spark, src, "t",
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").coalesce(1))
    Manifest.setTableProperties(spark, src, "t",
      Map("owner" -> "alice", "doomed" -> "yes"))
    Manifest.grantSelect(spark, src, "t", "analyst")
    Manifest.createPolicy(spark, src, "maskv", "mask", "x",
      "CASE WHEN current_role() = 'admin' THEN x ELSE NULL END")
    Manifest.attachMaskingPolicy(spark, src, "t", "v", "maskv")
    // bootstrap carries the whole registry, not just rows + schema
    val _ = Manifest.replicateSnapshot(spark, src, dst)
    assert(Manifest.tableProperties(dst, "t") ==
      Map("owner" -> "alice", "doomed" -> "yes"))
    assert(Manifest.tableGrants(dst, "t") == Set("analyst"))
    assert(Manifest.tablePolicies(dst, "t")._1 == Map("v" -> "maskv"))
    assert(Manifest.policyOf(dst, "maskv").isDefined)
    intercept[IllegalStateException] {
      Manifest.requireSelect(dst, "t", "rando")
    }
    // a registry CHANGE rides the next sync as delta + tombstones
    Manifest.unsetTableProperties(spark, src, "t", Seq("doomed"))
    Manifest.revokeSelect(spark, src, "t", "analyst")
    Manifest.commitAppend(spark, src, "t",
      Seq((3L, 3.0)).toDF("k", "v").coalesce(1))
    val _2 = Manifest.replicateSnapshot(spark, src, dst)
    assert(Manifest.tableProperties(dst, "t") == Map("owner" -> "alice"))
    assert(Manifest.tableGrants(dst, "t").isEmpty)
    // closure is sticky on the replica too: empty ACL stays admin-only
    intercept[IllegalStateException] {
      Manifest.requireSelect(dst, "t", "analyst")
    }
  }

  test("registry markers survive a vacuum past the fold boundary") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-vac-registry").toString
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    Manifest.setTableProperties(spark, root, "t", Map("tier" -> "gold"))
    Manifest.grantSelect(spark, root, "t", "analyst")
    // cross the delta-chain fold boundary (foldEvery = 8): after the
    // fold, the marker-bearing claims are no longer protected chain
    // ancestors, so vacuum to the floor exercises the marker CARRY —
    // before the fix, _prop_/_grant_/_aclon_ were not in the carry
    // list and the table silently REOPENED (or lost its properties)
    (1 to 10).foreach { i =>
      Manifest.commitAppend(spark, root, "t",
        Seq((i + 10L, i.toDouble)).toDF("k", "v").coalesce(1))
    }
    val _ = Manifest.vacuum(spark, root, 1, 0L)
    assert(Manifest.tableProperties(root, "t") == Map("tier" -> "gold"))
    assert(Manifest.tableGrants(root, "t") == Set("analyst"))
    intercept[IllegalStateException] { // still CLOSED, not reopened
      Manifest.requireSelect(root, "t", "rando")
    }
  }

  test("live SQL view tracks commits; pinned view stays frozen") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-liveview-spec").toString
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), "k", 1)
    graft.sources.ManifestSql.register(spark, root, "t", "lv_live")
    graft.sources.ManifestSql.register(spark, root, "t", "lv_pinned", version = 1L)
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((3L, 3.0), (4L, 4.0), (5L, 5.0)).toDF("k", "v"), "k", 1)
    assert(spark.sql("SELECT count(*) FROM lv_live").head().getLong(0) == 5L)
    assert(spark.sql("SELECT count(*) FROM lv_pinned").head().getLong(0) == 2L)
    // and the live view still PRUNES after re-resolution
    val idx = graft.sources.ManifestSql.register(spark, root, "t", "lv_live2")
    spark.sql("SELECT count(*) FROM lv_live2 WHERE k >= 4").collect()
    assert(idx.lastPrune._2 == 2 && idx.lastPrune._1 < 2)
  }

  test("evolving append registers schema atomically and survives vacuum") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-schemavac-spec").toString
    Manifest.commitAppendEvolve(spark, root, "t", Seq((1L, "a")).toDF("k", "s"))
    Manifest.commitAppendEvolve(spark, root, "t",
      Seq((2L, "b", 7.0)).toDF("k", "s", "q"), allowEvolution = true)
    // the registration lives INSIDE the registering claim (atomic with
    // the rows — no commit-then-register window)
    assert(Files.exists(Paths.get(root, "manifest", "v2", "_schema_t.json")))
    // enough non-evolving commits to cross a FOLD (v9 is a full
    // manifest with no chain ancestors), then vacuum keep=1: the
    // registering claim v2 is doomed and the registration must be
    // CARRIED into the retained claim, not lost with it
    (3 to 9).foreach(i =>
      Manifest.commitAppend(spark, root, "t", Seq((i.toLong, "x", 1.0)).toDF("k", "s", "q")))
    Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(!Files.exists(Paths.get(root, "manifest", "v2", "_schema_t.json")))
    val sch = Manifest.readTableEvolved(spark, root, "t").schema.fieldNames.toSeq
    assert(sch == Seq("k", "s", "q"))
    assert(Manifest.readTableEvolved(spark, root, "t").count() == 9L)
  }

  test("update-where rewrites only overlapping files; pre-update time-travels") {
    val root = Manifest.updateWhereRoot(spark, sfDir)
    assert(Manifest.snapshotVersion(root) == 3L) // 2 appends + 1 update
    val before = Manifest.manifestRows(spark, root, 2L).map(_._2).toSet
    val after = Manifest.manifestRows(spark, root, 3L).map(_._2).toSet
    assert(before.intersect(after).nonEmpty && (before -- after).nonEmpty)
    assert((after -- before).forall(_.startsWith("data/v3")))
    val lo = lit("2024-01-10 00:00:00").cast("timestamp")
    val hi = lit("2024-01-13 00:00:00").cast("timestamp")
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("value").cast("decimal(18,4)").as("value"), col("ts"))
    // row count unchanged (UPDATE, not DELETE); windowed sum doubled
    assert(Manifest.readTable(spark, root, "events_log").count() == ev.count())
    val inWin = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("ts") >= lo && col("ts") < hi)
        .agg(sum(col("value")).cast("double")).head().getDouble(0)
    assert(math.abs(inWin(Manifest.readTable(spark, root, "events_log")) -
      2.0 * inWin(ev)) < 1e-6)
    // pre-update version still serves the original values
    assert(math.abs(inWin(Manifest.readTable(spark, root, "events_log", 2L)) -
      inWin(ev)) < 1e-6)
  }

  test("update-where: NULL predicate keeps, SET expressions see the OLD row") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-updnull-spec").toString
    val df = Seq((1L, Some(5.0), 100.0), (2L, None, 200.0), (3L, Some(50.0), 300.0))
      .toDF("k", "v", "w")
    Manifest.commitAppendRanged(spark, root, "t", df, "k", 1)
    // swap semantics: SET v = w, w = v must evaluate against old row
    Manifest.commitUpdateWhere(spark, root, "t",
      Seq(Manifest.Pred("k", "1", "3", "bigint")), col("v") > 10.0,
      Map("v" -> col("w"), "w" -> coalesce(col("v"), lit(-1.0))))
    val rows = Manifest.readTable(spark, root, "t")
      .orderBy("k").select("k", "v", "w")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2)))
    // k=1: v=5 not >10 → untouched; k=2: NULL predicate → untouched;
    // k=3: v↔w swapped (v=300 from old w, w=50 from old v)
    assert(rows(0) == ((1L, Some(5.0), 100.0)))
    assert(rows(1) == ((2L, None, 200.0)))
    assert(rows(2) == ((3L, Some(300.0), 50.0)))
  }

  test("refreshAggInto: folds equal a full rebuild; ledger makes re-drives no-ops") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-mvlog-spec")
    val src = s"$tmp/src"; val dst = s"$tmp/dst"
    def refresh() = graft.ops.Views.refreshAggInto(
      spark, src, "t", dst, "mv", "spec-mv")(
      _.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("n_v")))(
      (mv, p) => mv.unionByName(p).groupBy("k")
        .agg(sum("sum_v").as("sum_v"), sum("n_v").as("n_v")))
    Manifest.commitAppendRanged(spark, src, "t",
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), "k", 1)
    assert(refresh().exists(!_._3)) // bootstrap: full build
    // fold: same key lands again → sums merge, no duplicate key rows
    Manifest.commitAppendRanged(spark, src, "t",
      Seq((1L, 1.0), (3L, 3.0)).toDF("k", "v"), "k", 1)
    assert(refresh().exists(_._3))
    val mv = Manifest.readTable(spark, dst, "mv")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(mv == Set((1L, 11.0, 2L), (2L, 20.0, 1L), (3L, 3.0, 1L)))
    // re-driven refresh: ledger no-op, MV version unchanged
    val vBefore = Manifest.snapshotVersion(dst)
    assert(refresh().isEmpty)
    assert(Manifest.snapshotVersion(dst) == vBefore)
  }

  test("commitAppendMulti: one claim per batch set, cross-table consistency at every version") {
    val root = Manifest.multiRoot(spark, sfDir)
    // three multi-commits → exactly three versions, no intermediate
    // single-table states anywhere in the timeline
    assert(Manifest.snapshotVersion(root) == 3L)
    (1L to 3L).foreach { v =>
      val f = Manifest.readTable(spark, root, "events_log", v).count()
      val a = Manifest.readTable(spark, root, "batch_audit", v)
        .agg(sum("n_rows")).head().getLong(0)
      assert(f == a, s"audit count diverges from facts at v$v")
      // audit rows are exactly the commits visible at v
      assert(Manifest.readTable(spark, root, "batch_audit", v).count() == v)
    }
    // duplicate table names in one batch set must be rejected
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Manifest.commitAppendMulti(spark, root, Seq(
        ("x", Seq((1L, 1.0)).toDF("k", "v"), Seq.empty),
        ("x", Seq((2L, 2.0)).toDF("k", "v"), Seq.empty)))
    }
  }

  test("commitRestore: roll-forward to a prior snapshot, no-op, vacuum refusal") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-restore-spec").toString
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), "k", 2)          // v1
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((3L, 3.0), (4L, 4.0)).toDF("k", "v"), "k", 2)          // v2
    Manifest.commitDeleteWhere(spark, root, "t",
      Seq(Manifest.Pred("k", "3", "4", "bigint")), col("k") >= 3L) // v3: bad
    assert(Manifest.readTable(spark, root, "t").count() == 2L)
    // restore rolls FORWARD: a new version whose file set is v2's
    val v4 = Manifest.commitRestore(spark, root, "t", toVersion = 2L)
    assert(v4 == 4L)
    assert(Manifest.readTable(spark, root, "t")
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // history preserved: the deleted state still time-travels at v3
    assert(Manifest.readTable(spark, root, "t", 3L).count() == 2L)
    // re-restoring the current state is a version no-op
    assert(Manifest.commitRestore(spark, root, "t", toVersion = 2L) == 4L)
    assert(Manifest.snapshotVersion(root) == 4L)
    // a snapshot whose files were vacuumed is not restorable: make the
    // v3 rewrite the only reference to its files, vacuum it away, then
    // restoring to v3 must refuse loudly (not 404 later at read time)
    Manifest.commitDeleteWhere(spark, root, "t",
      Seq(Manifest.Pred("k", "1", "4", "bigint")), col("k") >= 2L) // v5
    Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    val e = intercept[IllegalArgumentException] {
      Manifest.commitRestore(spark, root, "t", toVersion = 3L)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("countRows answers from metadata alone (data files may be gone); hybrid covers stat-less files") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-count-spec").toString
    Manifest.commitAppendRanged(spark, root, "t",
      (1L to 100L).map(k => (k, k * 1.5)).toDF("k", "v"), "k", 4)  // v1
    Manifest.commitDeleteVectors(spark, root, "t", col("k") <= 10L) // v2
    assert(Manifest.countRows(spark, root, "t", version = 1L) == 100L)
    assert(Manifest.countRows(spark, root, "t") == 90L)
    // metadata-only proof: remove every data file — the count still
    // answers, because nothing reads them
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(java.nio.file.Paths.get(root, "data"))
    try walk.iterator().asScala.toSeq.filter(p =>
      Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .foreach(Files.delete)
    finally walk.close()
    assert(Manifest.countRows(spark, root, "t") == 90L)
    // stat-less vintage (plain commitAppend records no __nrows):
    // the hybrid counts those files by scanning — slower, never wrong
    val root2 = Files.createTempDirectory("graft-count2-spec").toString
    Manifest.commitAppend(spark, root2, "t",
      (1L to 7L).map(k => (k, k.toDouble)).toDF("k", "v").coalesce(1))
    assert(Manifest.countRows(spark, root2, "t") == 7L)
  }

  test("snapshot tags: immutable named refs that pin files past vacuum retention") {
    import spark.implicits._
    def build(): String = {
      val root = Files.createTempDirectory("graft-tag-spec").toString
      Manifest.commitAppendRanged(spark, root, "t",
        Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), "k", 2)            // v1
      Manifest.commitAppendRanged(spark, root, "t",
        Seq((3L, 3.0), (4L, 4.0)).toDF("k", "v"), "k", 2)            // v2
      root
    }
    // negative control FIRST: without a tag, vacuum(keep=1) collects
    // the files only v2 references once v3 rewrites them away
    val bare = build()
    Manifest.commitDeleteWhere(spark, bare, "t",
      Seq(Manifest.Pred("k", "1", "4", "bigint")), col("k") >= 2L)   // v3
    Manifest.vacuum(spark, bare, keep = 1, graceMs = 0L)
    intercept[Exception] {
      Manifest.readTable(spark, bare, "t", 2L).count()
    }
    // tagged: the same sweep keeps v2 whole
    val root = build()
    assert(Manifest.createTag(root, "audit") == 2L)
    intercept[IllegalStateException] { Manifest.createTag(root, "audit", 1L) }
    Manifest.commitDeleteWhere(spark, root, "t",
      Seq(Manifest.Pred("k", "1", "4", "bigint")), col("k") >= 2L)   // v3
    Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(Manifest.readTableTag(spark, root, "t", "audit")
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(Manifest.tags(root) == Map("audit" -> 2L))
    // dropping the tag demotes the snapshot to ordinary history: the
    // next vacuum collects it
    Manifest.dropTag(root, "audit")
    Manifest.dropTag(root, "audit") // idempotent
    Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    intercept[Exception] {
      Manifest.readTable(spark, root, "t", 2L).count()
    }
    assert(Manifest.readTable(spark, root, "t").select("k")
      .as[Long].collect().toSeq == Seq(1L)) // current state intact
  }

  test("readChangeFeed: row-level insert/delete classes per commit type; compaction nets zero") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cdf-spec").toString
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)).toDF("k", "v"),
      "k", 2)                                                        // v1
    Manifest.commitDeleteVectors(spark, root, "t", col("k") === 2L)  // v2
    Manifest.commitUpdateVectors(spark, root, "t",
      col("k") === 3L, Map("v" -> (col("v") + 5.0)))                 // v3
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((5L, 50.0)).toDF("k", "v"), "k", 1)                        // v4
    val feed = readFeed(root, 0L)
    assert(feed == Set(
      (1L, "insert", 1L, 10.0), (1L, "insert", 2L, 20.0),
      (1L, "insert", 3L, 30.0), (1L, "insert", 4L, 40.0),
      (2L, "delete", 2L, 20.0),
      (3L, "delete", 3L, 30.0), (3L, "insert", 3L, 35.0),
      (4L, "insert", 5L, 50.0)))
    // a mid-interval start sees only later steps
    assert(readFeed(root, 3L) == Set((4L, "insert", 5L, 50.0)))
    // compaction repacks rows without changing content: zero change rows
    Manifest.compactTable(spark, root, "t", targetBytes = 1L << 20)  // v5
    assert(readFeed(root, 4L).isEmpty)
    // an empty interval yields an empty, correctly-shaped frame
    val cur = Manifest.snapshotVersion(root)
    assert(Manifest.readChangeFeed(spark, root, "t", cur).count() == 0L)
  }

  private def readFeed(root: String, from: Long): Set[(Long, String, Long, Double)] =
    Manifest.readChangeFeed(spark, root, "t", from)
      .select(col("_commit_version"), col("_change_type"), col("k"), col("v"))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

  test("CHECK constraints guard every write path; registration scans existing data") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-check-spec").toString
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((1L, 5.0), (2L, 7.0)).toDF("k", "v"), "k", 1)
    // registration refuses when existing data violates
    intercept[IllegalArgumentException] {
      Manifest.addCheckConstraint(spark, root, "t", "impossible", "v > 100")
    }
    Manifest.addCheckConstraint(spark, root, "t", "pos", "v >= 0")
    intercept[IllegalStateException] {
      Manifest.addCheckConstraint(spark, root, "t", "pos", "v >= 1") // immutable name
    }
    // plain append: violation rejected, version unchanged, files invisible
    val before = Manifest.snapshotVersion(root)
    intercept[IllegalArgumentException] {
      Manifest.commitAppend(spark, root, "t", Seq((3L, -1.0)).toDF("k", "v"))
    }
    assert(Manifest.snapshotVersion(root) == before)
    assert(Manifest.readTable(spark, root, "t").count() == 2L)
    // NULL predicate PASSES (ANSI CHECK)
    Manifest.commitAppend(spark, root, "t",
      Seq((4L, Option.empty[Double])).toDF("k", "v"))
    assert(Manifest.readTable(spark, root, "t").count() == 3L)
    // UPDATE rewrite paths are guarded too (post-images validate)
    intercept[IllegalArgumentException] {
      Manifest.commitUpdateVectors(spark, root, "t",
        col("k") === 1L, Map("v" -> (col("v") - 100.0)))
    }
    assert(Manifest.readTable(spark, root, "t")
      .filter(col("k") === 1L).head().getDouble(1) == 5.0)
    // dropping the constraint re-opens the path
    Manifest.dropCheckConstraint(root, "t", "pos")
    Manifest.commitAppend(spark, root, "t", Seq((5L, -2.0)).toDF("k", "v"))
    assert(Manifest.readTable(spark, root, "t").count() == 4L) // {1,2,4,5}
  }

  test("CHECK registration rebases over a racing append (validate-then-claim is CAS-serialized)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-check-race").toString
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((1L, 5.0)).toDF("k", "v"), "k", 1)
    // arm: between the registration's existing-data scan (clean at its
    // base) and its claim, a VIOLATING append claims the contended
    // version — the registration must lose the CAS, re-validate at the
    // new base, and refuse loudly; it must never register beside rows
    // it did not scan
    var fired = false
    Manifest.preClaimTestHook = () => {
      Manifest.preClaimTestHook = () => () // disarm before the nested commit
      fired = true
      Manifest.commitAppend(spark, root, "t", Seq((2L, -9.0)).toDF("k", "v"))
    }
    try {
      val e = intercept[IllegalArgumentException] {
        Manifest.addCheckConstraint(spark, root, "t", "pos", "v >= 0")
      }
      assert(e.getMessage.contains("violate"))
    } finally Manifest.preClaimTestHook = () => ()
    assert(fired)
    // the registration never became visible; the racing append (which
    // legitimately won) is committed
    assert(Manifest.checkConstraints(root, "t").isEmpty)
    assert(Manifest.readTable(spark, root, "t").count() == 2L)
  }

  test("a write whose publish predates a registration re-validates at claim time") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-check-race2").toString
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((1L, 5.0)).toDF("k", "v"), "k", 1)
    // arm: a constraint registers between the append's publish (which
    // validated under the EMPTY registry) and its claim — the claim
    // loop must notice the registry fingerprint moved, re-validate the
    // published files, and fail loudly instead of committing rows the
    // new constraint never saw
    var fired = false
    Manifest.preClaimTestHook = () => {
      Manifest.preClaimTestHook = () => ()
      fired = true
      Manifest.addCheckConstraint(spark, root, "t", "pos", "v >= 0")
    }
    try {
      val e = intercept[IllegalArgumentException] {
        Manifest.commitAppend(spark, root, "t", Seq((2L, -9.0)).toDF("k", "v"))
      }
      assert(e.getMessage.contains("CHECK"))
    } finally Manifest.preClaimTestHook = () => ()
    assert(fired)
    // no unvalidated row is visible, the registration is live, and the
    // rejected batch's files were cleaned up (nothing for vacuum)
    assert(Manifest.readTable(spark, root, "t").count() == 1L)
    assert(Manifest.checkConstraints(root, "t") == Map("pos" -> "v >= 0"))
    Manifest.commitAppend(spark, root, "t", Seq((3L, 4.0)).toDF("k", "v"))
    assert(Manifest.readTable(spark, root, "t").count() == 2L)
  }

  test("legacy loose check markers ('=' and pre-r11 '--' separators) are honored and droppable") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-check-legacy").toString
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((1L, 5.0)).toDF("k", "v"), "k", 1)
    val dir = Paths.get(root, "manifest")
    Files.write(dir.resolve("check-t=pos"), "v >= 0".getBytes("UTF-8"))
    Files.write(dir.resolve("check-t--cap"), "v <= 100".getBytes("UTF-8"))
    assert(Manifest.checkConstraints(root, "t") ==
      Map("pos" -> "v >= 0", "cap" -> "v <= 100"))
    // enforcement sees BOTH legacy registrations
    intercept[IllegalArgumentException] {
      Manifest.commitAppend(spark, root, "t", Seq((2L, -1.0)).toDF("k", "v"))
    }
    intercept[IllegalArgumentException] {
      Manifest.commitAppend(spark, root, "t", Seq((2L, 101.0)).toDF("k", "v"))
    }
    // drop removes the legacy marker (either separator)
    Manifest.dropCheckConstraint(root, "t", "cap")
    assert(Manifest.checkConstraints(root, "t") == Map("pos" -> "v >= 0"))
    Manifest.commitAppend(spark, root, "t", Seq((3L, 101.0)).toDF("k", "v"))
    assert(Manifest.readTable(spark, root, "t").count() == 2L)
  }

  test("timestamp time travel resolves monotonic commit times; vacuum dryRun touches nothing") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-asof-spec").toString
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v"), "k", 1)                 // v1
    Thread.sleep(30)
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((2L, 2.0)).toDF("k", "v"), "k", 1)                 // v2
    Thread.sleep(30)
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((3L, 3.0)).toDF("k", "v"), "k", 1)                 // v3
    val t2 = Manifest.commitTimeMs(root, 2L)
    assert(Manifest.versionAsOf(root, t2) == 2L)
    assert(Manifest.readTableAsOf(spark, root, "t", t2).count() == 2L)
    assert(Manifest.versionAsOf(root, System.currentTimeMillis() + 60000L) == 3L)
    intercept[IllegalArgumentException] {
      Manifest.versionAsOf(root, Manifest.commitTimeMs(root, 1L) - 10000L)
    }
    // dryRun reports the sweep without performing it
    Manifest.commitDeleteWhere(spark, root, "t",
      Seq(Manifest.Pred("k", "1", "3", "bigint")), col("k") === 2L) // v4 rewrite
    val (would, _) = Manifest.vacuum(spark, root, keep = 1, graceMs = 0L,
      dryRun = true)
    assert(would > 0)
    // nothing was touched: every version still reads
    (1L to 4L).foreach(v =>
      assert(Manifest.readTable(spark, root, "t", v).count() > 0))
    val (did, _) = Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(did == would) // the report was exact
  }

  test("tableHistory records the outermost operation per commit, surviving vacuum") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-hist-spec").toString
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), "k", 1)             // v1
    Manifest.commitDeleteWhere(spark, root, "t",
      Seq(Manifest.Pred("k", "1", "2", "bigint")), col("k") === 1L) // v2
    Manifest.compactTable(spark, root, "t", targetBytes = 1L << 20) // v3
    graft.streaming.Streams.commitBatchToManifest(
      Seq((9L, 9.0)).toDF("k", "v"), root, 0L, "app-x", "t")        // v4
    val ops = Manifest.tableHistory(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(ops == Map(
      1L -> "commitAppendRanged", 2L -> "commitDeleteWhere",
      3L -> "compactTable", 4L -> "commitBatchToManifest"))
    // vacuum keeps delta-chain ancestors (v4 resolves through them),
    // so history stays complete here; markers ride the claims
    Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    val after = Manifest.tableHistory(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(after == ops)
  }

  test("applyChangesInto: delete-only interval advances the ledger; deleted keys cannot resurrect") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-apply-spec")
    val src = s"$tmp/src"; val dst = s"$tmp/dst"
    Manifest.commitAppendRanged(spark, src, "t",
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v"), "k", 1)
    assert(Manifest.applyChangesInto(spark, src, "t", dst, "t", "k")
      .contains((3L, 0L)))
    // delete-only interval
    Manifest.commitDeleteVectors(spark, src, "t", col("k") === 2L)
    assert(Manifest.applyChangesInto(spark, src, "t", dst, "t", "k")
      .contains((0L, 1L)))
    assert(Manifest.readTable(spark, dst, "t")
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // the ledger advanced on the empty-upsert path: re-drive is None
    assert(Manifest.applyChangesInto(spark, src, "t", dst, "t", "k").isEmpty)
    // a later update of a LIVE key mirrors; the dead key stays dead
    Manifest.commitUpdateVectors(spark, src, "t",
      col("k") === 3L, Map("v" -> (col("v") + 1.0)))
    assert(Manifest.applyChangesInto(spark, src, "t", dst, "t", "k")
      .contains((1L, 0L)))
    val got = Manifest.readTable(spark, dst, "t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == Map(1L -> 10.0, 3L -> 31.0))
  }

  test("review fixes: WAP claims invisible to feed/history/asOf; vacuum preserves commit times; replicas enforce checks") {
    import spark.implicits._
    // --- open-branch claims must not leak into main-history surfaces
    val root = Files.createTempDirectory("graft-wapvis-spec").toString
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v"), "k", 1)                        // v1 main
    Manifest.commitAppendBranch(spark, root, "t",
      Seq((99L, 99.0)).toDF("k", "v"), "qa")                        // v2 branch
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((2L, 2.0)).toDF("k", "v"), "k", 1)                        // v3 main
    val feed = Manifest.readChangeFeed(spark, root, "t", 0L)
      .select("k").as[Long].collect().toSet
    assert(feed == Set(1L, 2L), s"branch rows leaked into the feed: $feed")
    assert(!Manifest.tableHistory(spark, root)
      .select("version").as[Long].collect().contains(2L))
    assert(Manifest.versionAsOf(root,
      System.currentTimeMillis() + 60000L) == 3L)
    // --- vacuum's marker carry must not clobber commit times
    val r2 = Files.createTempDirectory("graft-vactime-spec").toString
    Manifest.commitAppend(spark, r2, "t",
      Seq((1L, 1.0)).toDF("k", "v"), txn = Some("app" -> 0L))       // v1
    Thread.sleep(30)
    Manifest.commitAppend(spark, r2, "t",
      Seq((2L, 2.0)).toDF("k", "v"), txn = Some("app" -> 1L))       // v2
    val t1 = Manifest.commitTimeMs(r2, 1L)
    Thread.sleep(30)
    Manifest.commitReplace(spark, r2, "t", Seq((9L, 9.0)).toDF("k", "v")) // v3
    Manifest.vacuum(spark, r2, keep = 1, graceMs = 0L) // carries _txn_ markers
    assert(Manifest.commitTimeMs(r2, 3L) > t1,
      "marker carry reset the surviving claim's commit time")
    // --- replicas enforce the source's CHECK constraints
    val pair = Files.createTempDirectory("graft-chkrep-spec")
    val src = s"$pair/src"; val dst = s"$pair/dst"
    Manifest.commitAppend(spark, src, "t", Seq((1L, 1.0)).toDF("k", "v"))
    Manifest.addCheckConstraint(spark, src, "t", "pos", "v >= 0")
    Manifest.replicateSnapshot(spark, src, dst)
    intercept[IllegalArgumentException] {
      Manifest.commitAppend(spark, dst, "t", Seq((2L, -1.0)).toDF("k", "v"))
    }
  }

  test("listTables reports DV-masked row counts per table") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-show-spec").toString
    Manifest.commitAppendRanged(spark, root, "a",
      (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v"), "k", 2)
    Manifest.commitAppendRanged(spark, root, "b",
      (1L to 4L).map(k => (k, k * 1.0)).toDF("k", "v"), "k", 1)
    Manifest.commitDeleteVectors(spark, root, "a", col("k") <= 3L)
    val got = Manifest.listTables(spark, root)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("a" -> ((2L, 7L)), "b" -> ((1L, 4L))))
  }
}
