package graft

import graft.ops.Compaction
import org.apache.spark.sql.functions._

/** Small-file compaction (q177): bin-pack bound, content identity,
  * in-place dynamic-partition-overwrite commit, within-file sortedness. */
class CompactionSpec extends SparkSuite {

  private def fragmented(nFilesPerTask: Int = 8): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-spec").toString
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .repartition(nFilesPerTask)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    dir
  }

  test("binPack drops file count to the bin-pack bound, content-identically") {
    val src = fragmented()
    val dest = src + "-packed"
    val r = Compaction.binPack(spark, src, dest,
      Seq("event_type"), Seq("user_id", "ts"), targetBytes = 64L << 20)
    // one giant target ⇒ 1 bin ⇒ exactly one file per partition
    assert(r.bins === 1)
    assert(r.filesAfter === r.partitionsAfter,
      s"expected one file per partition, got $r")
    assert(r.filesAfter < r.filesBefore && r.packed, s"not packed: $r")
    // content identity: same multiset of rows (props map dropped —
    // map columns don't support except; covered by column count below)
    val cols = Seq("event_id", "user_id", "event_type", "ts", "value")
    val before = spark.read.parquet(src).select(cols.map(col): _*)
    val after = spark.read.parquet(dest).select(cols.map(col): _*)
    assert(before.count() === after.count())
    assert(before.exceptAll(after).isEmpty && after.exceptAll(before).isEmpty)
    assert(spark.read.parquet(src).columns.sorted
      === spark.read.parquet(dest).columns.sorted)
  }

  test("multi-bin binPack stays within bins + partitions files") {
    val src = fragmented()
    val dest = src + "-packed-multi"
    val r = Compaction.binPack(spark, src, dest,
      Seq("event_type"), Seq("user_id", "ts"), targetBytes = 16L << 10)
    assert(r.bins > 1, s"fixture too small to force multiple bins: $r")
    assert(r.filesAfter <= r.bins + r.partitionsAfter, s"bound violated: $r")
    assert(r.packed, s"not packed: $r")
  }

  test("compactInPlace swaps partitions in place and preserves content") {
    val dir = fragmented()
    val beforeRows = spark.read.parquet(dir)
      .select("event_id", "user_id", "event_type", "value")
      .collect().map(_.toSeq).sortBy(_.toString)
    val nBefore = Compaction.dataFiles(spark, dir).size
    val r = Compaction.compactInPlace(spark, dir,
      Seq("event_type"), Seq("user_id", "ts"), targetBytes = 64L << 20)
    val nAfter = Compaction.dataFiles(spark, dir).size
    assert(nAfter.toLong === r.filesAfter && nAfter < nBefore)
    // no staging/trash residue next to the table
    val parent = new java.io.File(dir).getParentFile
    val base = new java.io.File(dir).getName
    assert(!parent.listFiles().exists(f =>
      f.getName.startsWith(base + ".compact-")), "staging residue left behind")
    val afterRows = spark.read.parquet(dir)
      .select("event_id", "user_id", "event_type", "value")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(afterRows.toSeq === beforeRows.toSeq)
  }

  test("unpartitioned compactInPlace whole-dir swap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-flat").toString
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .repartition(12).write.mode("overwrite").parquet(dir)
    val n = spark.read.parquet(dir).count()
    val r = Compaction.compactInPlace(spark, dir, Nil, Seq("event_id"),
      targetBytes = 64L << 20)
    assert(r.filesAfter === 1L && r.filesBefore === 12L)
    assert(spark.read.parquet(dir).count() === n)
  }

  test("compacted files are sorted within by the sort key") {
    val src = fragmented()
    val dest = src + "-packed-sorted"
    Compaction.binPack(spark, src, dest,
      Seq("event_type"), Seq("user_id", "ts"), targetBytes = 64L << 20)
    Compaction.dataFiles(spark, dest).foreach { case (path, _) =>
      val ids = spark.read.parquet(path).select("user_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids === ids.sorted, s"file not sorted by user_id: $path")
    }
  }
}
