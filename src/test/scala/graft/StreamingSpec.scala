package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream ≡ batch: the streaming wrappers run the same transforms as
  * the oracle-checked batch queries; feeding the same rows through a
  * file stream must reproduce the batch result exactly. */
class StreamingSpec extends SparkSuite {

  private def writeEvents(dir: String, rows: (Long, String, Long, String, Double)*): Unit = {
    import spark.implicits._
    rows.toSeq
      .map(r => (r._1, Timestamp.valueOf(r._2), r._3, r._4, r._5, """{"k": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(dir)
  }

  test("streamed tumbling counts equal the batch result") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    writeEvents(dir,
      (1L, "2024-01-01 00:10:00", 1L, "click", 1.0),
      (2L, "2024-01-01 00:20:00", 1L, "click", 2.5),
      (3L, "2024-01-01 01:10:00", 2L, "view", 4.0))
    val batchDf = spark.read.parquet(dir)
    val expected = Streams.tumblingCounts(batchDf).orderBy("window_start", "event_type").collect()

    val sdf = Streams.tumblingCounts(
      Streams.fileStream(spark, dir, batchDf.schema))
    val q = Streams.runToMemory(sdf, "t_tumbling")
    try {
      val got = spark.table("t_tumbling").orderBy("window_start", "event_type").collect()
      assert(got.toSeq == expected.toSeq)
      assert(got.length == 2)
    } finally q.stop()
  }

  test("foreachBatch sink is idempotent under batch replay") {
    val in = java.nio.file.Files.createTempDirectory("graft-fb-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-fb-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fb-ckpt").toString
    writeEvents(in,
      (1L, "2024-01-01 00:10:00", 1L, "click", 1.0),
      (2L, "2024-01-01 00:20:00", 1L, "view", 2.0))
    val schema = spark.read.parquet(in).schema
    val q = Streams.foreachBatchSink(Streams.fileStream(spark, in, schema), out, ckpt)
    try q.processAllAvailable() finally q.stop()
    val once = spark.read.parquet(out)
    assert(once.count() == 2)
    // simulate the at-least-once replay: re-run batch 0 with the same id
    Streams.writeBatchIdempotent(
      spark.read.parquet(in).where(col("event_id").isNotNull), out, 0L)
    val replayed = spark.read.parquet(out)
    assert(replayed.count() == 2, "replayed batch must overwrite, not append")
    assert(replayed.select("event_id").distinct().count() == 2)
  }

  test("dropDuplicatesWithinWatermark removes stream duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream2").toString
    writeEvents(dir,
      (1L, "2024-01-01 00:10:00", 1L, "click", 1.0),
      (1L, "2024-01-01 00:10:00", 1L, "click", 1.0), // exact dup
      (2L, "2024-01-01 00:20:00", 1L, "click", 2.0))
    val schema = spark.read.parquet(dir).schema
    val sdf = Streams.dedupWithinWatermark(
      Streams.fileStream(spark, dir, schema), Seq("event_id"))
    val q = sdf.writeStream.format("memory").queryName("t_dedup").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("t_dedup").count() == 2)
    } finally q.stop()
  }
}
