package graft

import graft.ops.Manifest
import org.apache.spark.sql.DataFrame

import java.nio.file.Files

/** Write-audit-publish branches on the commit log (q211): staged
  * branch commits are invisible to main until an atomic CAS-claimed
  * publish; failed audits drop without touching main; racing main
  * commits force a loud rebase instead of a silent merge; vacuum
  * retains open branches and collects dropped ones.
  */
class WapSpec extends SparkSuite {

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-wap-spec").toString

  private def kv(rows: (Long, Double)*): DataFrame = rows.toDF("k", "v")

  private def keys(df: DataFrame): Set[Long] =
    df.select("k").as[Long].collect().toSet

  test("open branch is invisible to main readers and main committers") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t", kv(1L -> 1.0))
    Manifest.commitAppendBranch(spark, root, "t", kv(2L -> 2.0), "qa")
    // main read: branch rows absent
    assert(keys(Manifest.readTable(spark, root, "t")) == Set(1L))
    // branch read: base + staged rows
    assert(keys(Manifest.readTableBranch(spark, root, "t", "qa")) == Set(1L, 2L))
    // a main append rebases on MAIN head, not the branch claim
    Manifest.commitAppend(spark, root, "t", kv(3L -> 3.0))
    assert(keys(Manifest.readTable(spark, root, "t")) == Set(1L, 3L))
    // ...and the branch still resolves (its chain is untouched)
    assert(keys(Manifest.readTableBranch(spark, root, "t", "qa")) == Set(1L, 2L))
  }

  test("publish splices the branch chain into main atomically") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t", kv(1L -> 1.0))
    Manifest.commitAppendBranch(spark, root, "t", kv(2L -> 2.0), "qa")
    Manifest.commitAppendBranch(spark, root, "t", kv(3L -> 3.0), "qa")
    val before = Manifest.snapshotVersion(root)
    val published = Manifest.publishBranch(spark, root, "qa")
    assert(published > before)
    assert(keys(Manifest.readTable(spark, root, "t")) == Set(1L, 2L, 3L))
    // resolved: the branch is closed, its name single-use
    assert(Manifest.branchHead(root, "qa").isEmpty)
    intercept[IllegalArgumentException] {
      Manifest.commitAppendBranch(spark, root, "t", kv(9L -> 9.0), "qa")
    }
    // main history continues normally on top of the published chain
    Manifest.commitAppend(spark, root, "t", kv(4L -> 4.0))
    assert(keys(Manifest.readTable(spark, root, "t")) == Set(1L, 2L, 3L, 4L))
  }

  test("failed audit drops the branch; main is untouched") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t", kv(1L -> 1.0))
    Manifest.commitAppendBranch(spark, root, "t", kv(2L -> -2.0), "qa")
    val out = Manifest.auditThenPublish(spark, root, "t", "qa") { df =>
      if (df.filter($"v" < 0).limit(1).count() > 0) Some("negative v") else None
    }
    assert(out == Left("negative v"))
    assert(Manifest.branchHead(root, "qa").isEmpty)
    assert(keys(Manifest.readTable(spark, root, "t")) == Set(1L))
    // a dropped branch's view falls back to main
    assert(keys(Manifest.readTableBranch(spark, root, "t", "qa")) == Set(1L))
  }

  test("main advancing past the fork makes publish a loud conflict") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t", kv(1L -> 1.0))
    Manifest.commitAppendBranch(spark, root, "t", kv(2L -> 2.0), "qa")
    Manifest.commitAppend(spark, root, "t", kv(3L -> 3.0)) // main moves on
    intercept[Manifest.CommitConflict] {
      Manifest.publishBranch(spark, root, "qa")
    }
    // nothing merged silently
    assert(keys(Manifest.readTable(spark, root, "t")) == Set(1L, 3L))
  }

  test("vacuum retains open branches and collects dropped ones") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t", kv(1L -> 1.0))
    Manifest.commitAppendBranch(spark, root, "t", kv(2L -> 2.0), "keepme")
    Manifest.commitAppendBranch(spark, root, "t", kv(3L -> 3.0), "dropme")
    Manifest.dropBranch(root, "dropme")
    val (removedFiles, _) = Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    // the dropped branch's data file died; the open branch survived
    assert(removedFiles >= 1)
    assert(keys(Manifest.readTableBranch(spark, root, "t", "keepme")) == Set(1L, 2L))
    assert(keys(Manifest.readTable(spark, root, "t")) == Set(1L))
    assert(Manifest.branchHead(root, "dropme").isEmpty)
  }

  test("published branch survives vacuum as ordinary history") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t", kv(1L -> 1.0))
    Manifest.commitAppendBranch(spark, root, "t", kv(2L -> 2.0), "qa")
    Manifest.publishBranch(spark, root, "qa")
    val _ = Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(keys(Manifest.readTable(spark, root, "t")) == Set(1L, 2L))
  }

  test("q211 staged root: final main equals the raw window union") {
    val sfDir = "/root/testdata/sf0.001"
    val root = Manifest.wapRoot(spark, sfDir)
    val got = Manifest.readTable(spark, root, "events_log")
    val raw = Tables.load(spark, sfDir, "events")
    assert(got.count() == raw.count())
    // the corrupted batch (NULL event_type) never leaked
    assert(got.filter($"event_type".isNull).count() == 0L)
  }
}
