package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** q179's apply-protocol pins: the versioned CDC merge must be replay-
  * idempotent BY PROTOCOL (not by value), and deletes must drop keys. */
class CdcStreamSpec extends SparkSuite {

  import spark.implicits._

  // event_id % 10 == 0 → D, else U (same op derivation as q179)
  private def batchDf(rows: Seq[(Long, Long, String, Double)]) =
    rows.toDF("event_id", "user_id", "ts_s", "value")
      .select(col("event_id"), col("user_id"),
        col("ts_s").cast("timestamp").as("ts"), col("value"))

  private def state(dir: String, v: Long) =
    spark.read.parquet(s"$dir/v=$v").orderBy("user_id")
      .collect().map(_.toSeq).toSeq

  test("replaying a batch rewrites an identical version (no double-increment)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-spec").toString
    Streams.cdcApplyBatch(batchDf(Seq(
      (1L, 7L, "2024-01-01 10:00:00", 5.0),
      (2L, 7L, "2024-01-01 11:00:00", 3.0))), dir, 0L)
    Streams.cdcApplyBatch(batchDf(Seq(
      (11L, 7L, "2024-01-02 10:00:00", 2.0))), dir, 1L)
    val once = state(dir, 1L)
    assert(once === Seq(Seq(7L, 10.0, 3L)))
    // at-least-once redelivery: increments must NOT apply twice
    Streams.cdcApplyBatch(batchDf(Seq(
      (11L, 7L, "2024-01-02 10:00:00", 2.0))), dir, 1L)
    assert(state(dir, 1L) === once)
  }

  test("a delete with no later upsert drops the key; a later upsert resets it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-spec2").toString
    Streams.cdcApplyBatch(batchDf(Seq(
      (1L, 1L, "2024-01-01 10:00:00", 5.0),
      (2L, 2L, "2024-01-01 10:00:00", 7.0))), dir, 0L)
    Streams.cdcApplyBatch(batchDf(Seq(
      (10L, 1L, "2024-01-02 10:00:00", 0.0),   // D: key 1 deleted
      (20L, 2L, "2024-01-02 10:00:00", 0.0),   // D: key 2 reset...
      (21L, 2L, "2024-01-02 11:00:00", 4.0))), // ...then re-inserted
      dir, 1L)
    assert(state(dir, 1L) === Seq(Seq(2L, 4.0, 1L)))
  }

  test("same-timestamp ties order by event_id (D at higher id wins)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-spec3").toString
    Streams.cdcApplyBatch(batchDf(Seq(
      (5L, 3L, "2024-01-01 10:00:00", 9.0),    // U, id 5
      (10L, 3L, "2024-01-01 10:00:00", 0.0))), // D, id 10 > 5 → deletes
      dir, 0L)
    assert(state(dir, 0L) === Seq.empty)
  }

  test("time travel: v=0 stays immutable under v=1, and v=0 + batch1 = v=1") {
    val sfDir = "/root/testdata/sf0.001"
    val built = graft.ops.Cdc.versionedState(spark, sfDir)
    val v0Before = state(built, 0L)
    val v1 = state(built, 1L)
    // reading the historical version does not disturb it or the head
    assert(SparkEntry.queries("q186_time_travel")(spark, sfDir).count() ==
      v0Before.size)
    assert(state(built, 0L) === v0Before && state(built, 1L) === v1)
    // lineage: re-deriving head from (v=0, batch 1 deltas) reproduces it
    val scratch = java.nio.file.Files.createTempDirectory("graft-tt-spec").toString
    val copyWalk = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$built/v=0"))
    try copyWalk.iterator().asScala.foreach { p =>
      val rel = java.nio.file.Paths.get(s"$built/v=0").relativize(p).toString
      val dest = java.nio.file.Paths.get(s"$scratch/v=0").resolve(rel)
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dest)
      else java.nio.file.Files.copy(p, dest)
    } finally copyWalk.close()
    val batch1 = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "ts", "value")
      .filter(col("ts") >= lit(graft.ops.Cdc.versionCut).cast("timestamp"))
    Streams.cdcApplyBatch(batch1, scratch, 1L)
    assert(state(scratch, 1L) === v1)
  }
}
