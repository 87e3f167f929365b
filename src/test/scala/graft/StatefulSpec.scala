package graft

import graft.streaming.Streams

import java.sql.Timestamp

/** flatMapGroupsWithState: per-user state must persist ACROSS
  * micro-batches (the defining property vs. per-batch aggregation). */
class StatefulSpec extends SparkSuite {

  private def write(dir: String, rows: (Long, String, Long, String)*): Unit = {
    import spark.implicits._
    rows.toSeq
      .map(r => (r._1, Timestamp.valueOf(r._2), r._3, r._4, 1.0, """{"k": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(dir)
  }

  test("running per-user counts continue across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-state").toString
    write(dir, (1L, "2024-01-01 00:00:00", 7L, "click"))
    val schema = spark.read.parquet(dir).schema
    val sdf = Streams.statefulUserCounts(Streams.fileStream(spark, dir, schema))
    val q = sdf.writeStream.format("memory").queryName("t_state").outputMode("append").start()
    try {
      q.processAllAvailable()
      // second micro-batch: two more events for the same user
      write(dir, (2L, "2024-01-01 00:01:00", 7L, "view"),
        (3L, "2024-01-01 00:02:00", 7L, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("t_state").orderBy("count").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      // counts 1,2,3 — batch 2 resumed from persisted state count=1
      assert(rows.toSeq == Seq((7L, 1L, "click"), (7L, 2L, "view"), (7L, 3L, "purchase")))
    } finally q.stop()
  }

  test("transformWithState runs the same counter on the v2 API (RocksDB store)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tws").toString
    write(dir, (1L, "2024-01-01 00:00:00", 9L, "click"))
    val schema = spark.read.parquet(dir).schema
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val sdf = Streams.statefulUserCountsTws(Streams.fileStream(spark, dir, schema))
    val q = sdf.writeStream.format("memory").queryName("t_tws").outputMode("append").start()
    try {
      q.processAllAvailable()
      write(dir, (2L, "2024-01-01 00:01:00", 9L, "view"))
      q.processAllAvailable()
      val rows = spark.table("t_tws").orderBy("count").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(rows.toSeq == Seq((9L, 1L, "click"), (9L, 2L, "view")))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
