package graft

import graft.ops.Manifest
import org.scalacheck.{Gen, Prop, Test => SCTest}

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Property test for the commit-log invariants: ANY interleaving of
  * overwrite commits, append commits, replace commits, and vacuums
  * must keep the table consistent —
  *  1. the pointer equals the newest manifest;
  *  2. every file the current manifest references exists on disk;
  *  3. the readable row count equals the model's expected count
  *     (overwrite/replace reset it, appends accumulate);
  *  4. after a vacuum, no data file outside the retained manifests'
  *     reference set survives.
  */
class ManifestPropertySpec extends SparkSuite {

  sealed trait Op
  case object Commit extends Op      // overwrite: table := batch
  case object Append extends Op      // table ++= batch
  case object Replace extends Op     // table := batch (replace-commit path)
  case object Vacuum extends Op      // retain newest manifest only

  private val opGen: Gen[Op] =
    Gen.frequency(3 -> Commit, 4 -> Append, 2 -> Replace, 2 -> Vacuum)

  test("property: random commit/append/replace/vacuum sequences stay consistent") {
    import spark.implicits._
    val p = Prop.forAll(Gen.listOfN(6, Gen.zip(opGen, Gen.chooseNum(1, 5)))) { ops =>
      val root = Files.createTempDirectory("graft-manifest-prop").toString
      var expectedRows = 0L
      var serial = 0L
      ops.foreach { case (op, n) =>
        serial += 1
        def batch = (1L to n.toLong).map(i => (serial * 100 + i, i * 1.5))
          .toDF("k", "v")
        op match {
          case Commit =>
            Manifest.commit(spark, root, Map("t" -> batch))
            expectedRows = n.toLong
          case Append =>
            Manifest.commitAppend(spark, root, "t", batch)
            expectedRows += n.toLong
          case Replace =>
            Manifest.commitReplace(spark, root, "t", batch)
            expectedRows = n.toLong
          case Vacuum =>
            if (Manifest.snapshotVersion(root) > 0)
              // the property asserts on-disk state right after the sweep
              // (no concurrent writer in this harness): grace 0 opt-in
              Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
        }
        val v = Manifest.snapshotVersion(root)
        if (v > 0) {
          // 1. pointer is the newest manifest on disk
          val listing = Files.list(Paths.get(root, "manifest"))
          val newest =
            try listing.iterator().asScala
              .map(_.getFileName.toString.drop(1).toLong).max
            finally listing.close()
          assert(newest == v, s"pointer $v != newest manifest $newest")
          // 2. + 3. referenced files exist; rows match the model
          val live = Manifest.manifestRows(spark, root, v).map(_._2).toSet
          assert(live.forall(rel => Files.exists(Paths.get(s"$root/$rel"))))
          assert(Manifest.readTable(spark, root, "t").count() == expectedRows,
            s"rows after $op")
          // 4. vacuum leaves nothing unreferenced
          if (op == Vacuum) {
            val walk = Files.walk(Paths.get(root, "data"))
            val onDisk =
              try walk.iterator().asScala
                .filter(_.getFileName.toString.endsWith(".parquet"))
                .map(q => Paths.get(root).relativize(q).toString.replace('\\', '/'))
                .toSet
              finally walk.close()
            assert(onDisk == live, s"vacuum left ${onDisk -- live}")
          }
        }
      }
      graft.ops.Staging.deleteRecursively(Paths.get(root))
      true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  test("concurrent appends x compactions lose no update") {
    // The steady state of a streaming table: ingest appends racing a
    // maintenance compaction. The version CAS serializes manifests; the
    // replace-validation forces a compaction that read a stale file set
    // to recompute — so every appended row must survive, whichever
    // interleaving the scheduler produces.
    import spark.implicits._
    val root = Files.createTempDirectory("graft-concurrent-spec").toString
    Manifest.commitAppend(spark, root, "t", Seq((0L, 0.0)).toDF("k", "v"))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def thread(body: => Unit): Thread = {
      val t = new Thread(() =>
        try body catch { case e: Throwable => failures.add(e) })
      t.start(); t
    }
    val appender = thread {
      (1 to 5).foreach { i =>
        Manifest.commitAppend(spark, root, "t",
          Seq((i.toLong, i * 1.0)).toDF("k", "v"), maxRetries = 64)
      }
    }
    val compactor = thread {
      (1 to 3).foreach { _ =>
        Manifest.compactTable(spark, root, "t", 8L << 20, maxRetries = 64)
        Thread.sleep(20)
      }
    }
    appender.join(120000); compactor.join(120000)
    assert(failures.isEmpty, s"worker threw: ${failures.asScala.toList}")
    // no lost updates: all six appended rows present exactly once
    val rows = Manifest.readTable(spark, root, "t")
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(rows == (0L to 5L), s"expected keys 0..5, got $rows")
    // the pointer landed on the newest manifest (monotonic advance)
    val listing = Files.list(Paths.get(root, "manifest"))
    val newest =
      try listing.iterator().asScala
        .map(_.getFileName.toString.drop(1).toLong).max
      finally listing.close()
    assert(Manifest.snapshotVersion(root) == newest)
    graft.ops.Staging.deleteRecursively(Paths.get(root))
  }

  // -------------------------------------------------------------- replication

  sealed trait ROp
  case object RAppend extends ROp   // ranged append, 1 file
  case object RDelete extends ROp   // stats-pruned delete of a key band
  case object RCompact extends ROp  // bin-pack replace-commit
  case object RSync extends ROp     // replicate mid-sequence

  private val ropGen: Gen[ROp] =
    Gen.frequency(4 -> RAppend, 2 -> RDelete, 1 -> RCompact, 3 -> RSync)

  test("property: replica mirrors any append/delete/compact/sync interleaving") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val p = Prop.forAll(Gen.listOfN(5, ropGen)) { ops =>
      val tmp = Files.createTempDirectory("graft-replica-prop")
      val src = s"$tmp/src"; val dst = s"$tmp/dst"
      var serial = 0L
      def appendBatch(): Unit = {
        serial += 1
        Manifest.commitAppendRanged(spark, src, "t",
          (1L to 3L).map(i => (serial * 10 + i, i * 1.5)).toDF("k", "v"), "k", 1)
      }
      appendBatch()
      Manifest.replicateSnapshot(spark, src, dst) // bootstrap
      ops.foreach {
        case RAppend => appendBatch()
        case RDelete =>
          // delete the newest batch's band (may be a no-op band)
          val lo = serial * 10; val hi = serial * 10 + 9
          Manifest.commitDeleteWhere(spark, src, "t",
            Seq(Manifest.Pred("k", lo.toString, hi.toString, "bigint")),
            col("k").between(lo, hi))
        case RCompact =>
          Manifest.compactTable(spark, src, "t", 8L << 20)
        case RSync =>
          Manifest.replicateSnapshot(spark, src, dst)
      }
      Manifest.replicateSnapshot(spark, src, dst) // final convergence
      val srcRows = Manifest.readTable(spark, src, "t")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
      val dstRows = Manifest.readTable(spark, dst, "t")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
      val ledgerOk =
        Manifest.lastCommittedTxn(dst, "replica").contains(Manifest.snapshotVersion(src))
      graft.ops.Staging.deleteRecursively(tmp)
      Prop(srcRows == dstRows && ledgerOk) :|
        s"src=$srcRows dst=$dstRows ledgerOk=$ledgerOk ops=$ops"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), p)
    assert(res.passed, res.status.toString)
  }

  // ---------------------------------------------------- change-feed replay

  sealed trait FOp
  case object FAppend extends FOp    // ranged append
  case object FDvDelete extends FOp  // merge-on-read delete of a band
  case object FDvUpdate extends FOp  // merge-on-read update of a band
  case object FCowDelete extends FOp // copy-on-write delete of a band
  case object FCompact extends FOp   // bin-pack rewrite (nets zero)
  case object FCompactSm extends FOp // incremental small-file pack (nets zero)
  case object FRestore extends FOp   // restore to a random earlier version

  private val fopGen: Gen[FOp] =
    Gen.frequency(4 -> FAppend, 2 -> FDvDelete, 2 -> FDvUpdate,
      1 -> FCowDelete, 1 -> FCompact, 1 -> FCompactSm, 1 -> FRestore)

  test("property: change-feed replay reconstructs the final state under any interleaving") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val p = Prop.forAll(Gen.zip(Gen.listOfN(5, fopGen), Gen.chooseNum(0, 1000))) {
      case (ops, seed) =>
        val root = Files.createTempDirectory("graft-cdfprop").toString
        var serial = 0L
        def appendBatch(): Unit = {
          serial += 1
          Manifest.commitAppendRanged(spark, root, "t",
            (1L to 3L).map(i => (serial * 10 + i, i * 1.5)).toDF("k", "v"), "k", 1)
        }
        appendBatch()
        ops.foreach { op =>
          val band = (seed % serial + 1) * 10 // some existing batch's band
          op match {
            case FAppend => appendBatch()
            case FDvDelete =>
              Manifest.commitDeleteVectors(spark, root, "t",
                col("k").between(band, band + 1))
            case FDvUpdate =>
              Manifest.commitUpdateVectors(spark, root, "t",
                col("k").between(band, band + 2), Map("v" -> (col("v") + 0.25)))
            case FCowDelete =>
              Manifest.commitDeleteWhere(spark, root, "t",
                Seq(Manifest.Pred("k", band.toString, (band + 9).toString, "bigint")),
                col("k").between(band, band + 9))
            case FCompact =>
              Manifest.compactTable(spark, root, "t", 8L << 20)
            case FCompactSm =>
              Manifest.compactSmallFiles(spark, root, "t",
                minBytes = 1L << 30, targetBytes = 1L << 30)
            case FRestore =>
              val cur = Manifest.snapshotVersion(root)
              val _ = Manifest.commitRestore(spark, root, "t",
                toVersion = seed % cur + 1)
          }
        }
        val feed = Manifest.readChangeFeed(spark, root, "t", fromVersion = 0L)
        val replayed = feed.filter(col("_change_type") === "insert")
          .select("k", "v")
          .exceptAll(feed.filter(col("_change_type") === "delete").select("k", "v"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
        val actual = Manifest.readTable(spark, root, "t")
          .select("k", "v")
          .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        Prop(replayed == actual) :|
          s"replayed=$replayed actual=$actual ops=$ops seed=$seed"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), p)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------ tag/vacuum safety

  sealed trait TOp
  case object TAppend extends TOp
  case object TDelete extends TOp   // CoW rewrite (drops old files)
  case object TTag extends TOp      // tag the current snapshot
  case object TDropTag extends TOp  // drop the oldest live tag
  case object TVacuum extends TOp   // keep=1, grace=0

  private val topGen: Gen[TOp] =
    Gen.frequency(4 -> TAppend, 2 -> TDelete, 2 -> TTag,
      1 -> TDropTag, 2 -> TVacuum)

  test("property: tagged snapshots and the head stay readable under any vacuum interleaving") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val p = Prop.forAll(Gen.listOfN(6, topGen)) { ops =>
      val root = Files.createTempDirectory("graft-tagprop").toString
      var serial = 0L
      var tagN = 0
      var live = List.empty[(String, Long, Long)] // (tag, version, expected count)
      def append(): Unit = {
        serial += 1
        Manifest.commitAppendRanged(spark, root, "t",
          (1L to 2L).map(i => (serial * 10 + i, i * 1.5)).toDF("k", "v"), "k", 1)
      }
      append()
      ops.foreach {
        case TAppend => append()
        case TDelete =>
          val lo = serial * 10
          Manifest.commitDeleteWhere(spark, root, "t",
            Seq(Manifest.Pred("k", lo.toString, (lo + 9).toString, "bigint")),
            col("k").between(lo, lo + 9))
        case TTag =>
          tagN += 1
          val name = s"t$tagN"
          val v = Manifest.createTag(root, name)
          live ::= ((name, v,
            Manifest.readTable(spark, root, "t", v).count()))
        case TDropTag =>
          live.reverse.headOption.foreach { case (name, _, _) =>
            Manifest.dropTag(root, name)
            live = live.filterNot(_._1 == name)
          }
        case TVacuum =>
          Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
      }
      Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
      // the head always reads; every LIVE tag reads its frozen count
      val headOk = Manifest.readTable(spark, root, "t").count() >= 0
      val tagsOk = live.forall { case (name, _, n) =>
        Manifest.readTableTag(spark, root, "t", name).count() == n
      }
      graft.ops.Staging.deleteRecursively(Paths.get(root))
      Prop(headOk && tagsOk) :| s"ops=$ops live=$live"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), p)
    assert(res.passed, res.status.toString)
  }
}
