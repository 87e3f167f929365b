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

  test("stateful aggregation resumes from checkpoint: restart neither loses nor recounts") {
    import org.apache.spark.sql.functions._
    // phase 1: one file visible, run to completion against a checkpoint,
    // stop. phase 2: second file arrives, RESTART from the same
    // checkpoint with a fresh query. The final counts must equal the
    // all-data batch result: state was restored (nothing lost) and the
    // already-committed file was not re-read (nothing double-counted).
    val src = java.nio.file.Files.createTempDirectory("graft-ckpt-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    writeEvents(src, (1L, "2024-01-01 00:10:00", 1L, "click", 1.0),
      (2L, "2024-01-01 00:20:00", 1L, "click", 2.0))
    val schema = spark.read.parquet(src).schema
    def runOnce(name: String): Unit = {
      val counts = Streams.fileStream(spark, src, schema)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      val q = counts.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt).outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce("t_ckpt_a")
    assert(spark.table("t_ckpt_a").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 2L)))
    writeEvents(src, (3L, "2024-01-01 00:30:00", 1L, "click", 4.0),
      (4L, "2024-01-01 00:40:00", 2L, "view", 8.0))
    runOnce("t_ckpt_b")
    val got = spark.table("t_ckpt_b").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map(1L -> (3L, 7.0), 2L -> (1L, 8.0)),
      s"restart must resume exactly (restored state + only-new files), got $got")
    Seq("t_ckpt_a", "t_ckpt_b").foreach(spark.catalog.dropTempView(_))
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

  test("stream-stream time-range join matches the batch join") {
    val lDir = java.nio.file.Files.createTempDirectory("graft-ss-l").toString
    val rDir = java.nio.file.Files.createTempDirectory("graft-ss-r").toString
    writeEvents(lDir,
      (1L, "2024-01-01 00:10:00", 1L, "click", 1.0),
      (2L, "2024-01-01 00:40:00", 2L, "click", 2.0),
      (3L, "2024-01-01 01:00:00", 1L, "click", 3.0))
    writeEvents(rDir,
      (11L, "2024-01-01 00:15:00", 1L, "buy", 9.0), // within 10m of event 1
      (12L, "2024-01-01 00:55:00", 2L, "buy", 8.0), // 15m after event 2 -> no match
      (13L, "2024-01-01 01:05:00", 1L, "buy", 7.0)) // within 10m of event 3
    val lSchema = spark.read.parquet(lDir).schema
    def prep(df: org.apache.spark.sql.DataFrame, side: String) =
      df.select(col("event_id").as(s"${side}_id"), col("ts").as(s"${side}_ts"),
        col("user_id").as(s"${side}_user"))
    val expected = Streams.streamStreamJoin(
        prep(spark.read.parquet(lDir), "l"), prep(spark.read.parquet(rDir), "r"),
        "l_user", "r_user", "l_ts", "r_ts")
      .select("l_id", "r_id").orderBy("l_id").collect()
    assert(expected.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 11L), (3L, 13L)))

    val sdf = Streams.streamStreamJoin(
      prep(Streams.fileStream(spark, lDir, lSchema), "l"),
      prep(Streams.fileStream(spark, rDir, lSchema), "r"),
      "l_user", "r_user", "l_ts", "r_ts")
    val q = sdf.select("l_id", "r_id").writeStream
      .format("memory").queryName("t_ssjoin").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("t_ssjoin").orderBy("l_id").collect()
      assert(got.toSeq == expected.toSeq)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join null-pads once the watermark passes") {
    val lDir = java.nio.file.Files.createTempDirectory("graft-sso-l").toString
    val rDir = java.nio.file.Files.createTempDirectory("graft-sso-r").toString
    writeEvents(lDir,
      (1L, "2024-01-01 00:10:00", 1L, "click", 1.0), // will match
      (2L, "2024-01-01 00:20:00", 5L, "click", 2.0)) // user 5: no right event
    writeEvents(rDir,
      (11L, "2024-01-01 00:15:00", 1L, "buy", 9.0))
    val schema = spark.read.parquet(lDir).schema
    def prep(df: org.apache.spark.sql.DataFrame, side: String) =
      df.select(col("event_id").as(s"${side}_id"), col("ts").as(s"${side}_ts"),
        col("user_id").as(s"${side}_user"))
    val sdf = Streams.streamStreamJoin(
      prep(Streams.fileStream(spark, lDir, schema), "l"),
      prep(Streams.fileStream(spark, rDir, schema), "r"),
      "l_user", "r_user", "l_ts", "r_ts", joinType = "left_outer")
    val q = sdf.select("l_id", "r_id").writeStream
      .format("memory").queryName("t_ssouter").outputMode("append").start()
    try {
      q.processAllAvailable()
      // unmatched left row is still BUFFERED: watermark hasn't passed
      // its horizon, so only the inner match has emitted
      val firstPass = spark.table("t_ssouter").collect()
      assert(firstPass.map(r => (r.getLong(0), r.get(1))).toSet == Set((1L, 11L)))
      // a later batch on BOTH sides (global watermark = min over inputs)
      // advances the watermark past 00:20 + within + watermark → flush
      writeEvents(lDir, (90L, "2024-01-01 12:00:00", 99L, "click", 0.0))
      writeEvents(rDir, (91L, "2024-01-01 12:00:00", 99L, "buy", 0.0))
      q.processAllAvailable()
      val got = spark.table("t_ssouter").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(got.contains((2L, None)), s"outer row never flushed: $got")
      assert(got.contains((1L, Some(11L))))
    } finally q.stop()
  }

  test("stream-static broadcast enrichment matches the batch join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-enrich").toString
    writeEvents(dir,
      (1L, "2024-01-01 00:10:00", 1L, "click", 1.0),
      (2L, "2024-01-01 00:20:00", 2L, "view", 2.0),
      (3L, "2024-01-01 00:30:00", 9L, "view", 3.0)) // user 9 not in dim
    val dim = Seq((1L, "alice"), (2L, "bob")).toDF("u_id", "u_name")
    val batch = spark.read.parquet(dir)
    val expected = Streams.enrichWithDim(batch, dim, "user_id", "u_id")
      .select("event_id", "u_name").orderBy("event_id").collect()
    assert(expected.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "alice"), (2L, "bob"), (3L, null)))

    val sdf = Streams.enrichWithDim(
      Streams.fileStream(spark, dir, batch.schema), dim, "user_id", "u_id")
    val q = sdf.select("event_id", "u_name").writeStream
      .format("memory").queryName("t_enrich").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("t_enrich").orderBy("event_id").collect().toSeq == expected.toSeq)
    } finally q.stop()
  }

  test("stream-stream join rejects colliding column names") {
    import spark.implicits._
    val l = Seq((1L, Timestamp.valueOf("2024-01-01 00:10:00"))).toDF("k", "ts")
    val r = Seq((1L, Timestamp.valueOf("2024-01-01 00:15:00"))).toDF("k2", "r_ts")
    // same key name on both sides would silently become a trivial k = k
    intercept[IllegalArgumentException] {
      Streams.streamStreamJoin(l, l, "k", "k", "ts", "ts")
    }
    // overlapping (non-key) schemas are ambiguous downstream
    intercept[IllegalArgumentException] {
      Streams.streamStreamJoin(l, r.withColumn("ts", col("r_ts")), "k", "k2", "ts", "r_ts")
    }
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

  test("manifest streaming source: per-version micro-batches, checkpoint restart, rewrite refusal") {
    import graft.ops.Manifest
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("gms-spec").toString
    Manifest.commitAppendRanged(spark, root, "t",
      (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v"), "k", 2)   // v1
    Manifest.commitAppendRanged(spark, root, "t",
      (11L to 20L).map(k => (k, k * 1.0)).toDF("k", "v"), "k", 2)  // v2
    val out = java.nio.file.Files.createTempDirectory("gms-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gms-ck").toString
    def start() = spark.readStream.format("graft-manifest")
      .option("root", root).option("table", "t").load()
      .writeStream.option("checkpointLocation", ckpt).outputMode("append")
      .foreachBatch((b: DataFrame, id: Long) =>
        b.withColumn("batch", lit(id)).write.mode("append").parquet(out))
      .start()
    val q = start()
    q.processAllAvailable()                                         // batch 0 = (0, v2]
    Manifest.commitAppendRanged(spark, root, "t",
      (21L to 25L).map(k => (k, k * 1.0)).toDF("k", "v"), "k", 1)  // v3
    q.processAllAvailable(); q.stop()                               // batch 1 = (v2, v3]
    // restart from checkpoint: nothing new pending -> no re-serve
    val q2 = start(); q2.processAllAvailable()
    Manifest.commitAppendRanged(spark, root, "t",
      (26L to 28L).map(k => (k, k * 1.0)).toDF("k", "v"), "k", 1)  // v4
    q2.processAllAvailable(); q2.stop()                             // batch 2 = (v3, v4]
    val res = spark.read.parquet(out).cache()
    // exactly-once across the restart: 28 distinct keys, 28 rows total
    assert(res.count() == 28L)
    assert(res.select("k").distinct().count() == 28L)
    // batch boundaries follow version intervals
    val byBatch = res.groupBy("batch")
      .agg(min("k").as("lo"), max("k").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    res.unpersist()
    assert(byBatch(0L) == ((1L, 20L, 20L)))
    assert(byBatch(1L) == ((21L, 25L, 5L)))
    assert(byBatch(2L) == ((26L, 28L, 3L)))
    // a rewrite interval (DV delete) refuses loudly without ignoreChanges
    Manifest.commitDeleteVectors(spark, root, "t", col("k") <= 2L)  // v5
    val q3 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable()
    }
    q3.stop()
    assert(e.getMessage.contains("rewrite") || Option(e.getCause).exists(
      c => String.valueOf(c.getMessage).contains("rewrite")))
    // ignoreChanges opts in: the interval's added files serve (none
    // here -- a DV commit adds no data files, so the batch is empty)
    val ckpt2 = java.nio.file.Files.createTempDirectory("gms-ck2").toString
    val out2 = java.nio.file.Files.createTempDirectory("gms-out2").toString
    val q4 = spark.readStream.format("graft-manifest")
      .option("root", root).option("table", "t")
      .option("ignoreChanges", "true").load()
      .writeStream.option("checkpointLocation", ckpt2).outputMode("append")
      .foreachBatch((b: DataFrame, id: Long) =>
        b.write.mode("append").parquet(out2))
      .start()
    q4.processAllAvailable(); q4.stop()
    // fresh checkpoint: one bootstrap batch of the CURRENT file set
    assert(spark.read.parquet(out2).count() == 28L)
  }

  test("manifest sink + rate limit: bounded backfill batches, ledgered exactly-once restart") {
    import graft.ops.Manifest
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("gmsink-src").toString
    val dst = java.nio.file.Files.createTempDirectory("gmsink-dst").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gmsink-ck").toString
    (1 to 4).foreach { i =>
      Manifest.commitAppendRanged(spark, src, "t",
        Seq((i.toLong, i * 1.0)).toDF("k", "v"), "k", 1)
    }
    def start() = spark.readStream.format("graft-manifest")
      .option("root", src).option("table", "t")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream.format("graft-manifest")
      .option("root", dst).option("table", "t")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q = start(); q.processAllAvailable(); q.stop()
    // four source versions -> four bounded batches -> four dst commits
    assert(Manifest.snapshotVersion(dst) == 4L)
    assert(Manifest.readTable(spark, dst, "t").count() == 4L)
    // restart: nothing new, the ledger makes replays no-ops
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(Manifest.snapshotVersion(dst) == 4L)
    assert(Manifest.readTable(spark, dst, "t")
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("rate-limited source survives restart with a backlog (anchor persisted past the JVM)") {
    import graft.ops.Manifest
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("gms-rl-src").toString
    val out = java.nio.file.Files.createTempDirectory("gms-rl-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gms-rl-ck").toString
    def commit(k: Long): Unit =
      Manifest.commitAppendRanged(spark, root, "t",
        Seq((k, k * 1.0)).toDF("k", "v"), "k", 1)
    def start() = spark.readStream.format("graft-manifest")
      .option("root", root).option("table", "t")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", ckpt).outputMode("append")
      .foreachBatch((b: DataFrame, id: Long) =>
        b.withColumn("batch", lit(id)).write.mode("append").parquet(out))
      .start()
    commit(1L); commit(2L)
    val q = start(); q.processAllAvailable(); q.stop() // caught up at v2
    // backlog accumulates while the query is DOWN; the restarted
    // source's first getOffset must not cap below the checkpointed
    // start (the inverted-interval hazard the persisted anchor closes)
    commit(3L); commit(4L); commit(5L)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val res = spark.read.parquet(out)
    assert(res.count() == 5L)
    assert(res.select("k").distinct().count() == 5L)
    // the backlog was still rate-limited: one version per batch
    assert(res.groupBy("batch").count().collect().forall(_.getLong(1) == 1L))
  }

  test("rate-limited source jumps to a table appearing above its cap") {
    import graft.ops.Manifest
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("gms-jump").toString
    // versions 1..3 belong to ANOTHER table; 't' first appears at v4
    (1 to 3).foreach(i => Manifest.commitAppendRanged(spark, root, "other",
      Seq((i.toLong, 1.0)).toDF("k", "v"), "k", 1))
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((10L, 10.0)).toDF("k", "v"), "k", 1)                      // v4
    val out = java.nio.file.Files.createTempDirectory("gms-jump-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gms-jump-ck").toString
    val q = spark.readStream.format("graft-manifest")
      .option("root", root).option("table", "t")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", ckpt).outputMode("append")
      .foreachBatch((b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(out))
      .start()
    try q.processAllAvailable() finally q.stop()
    // without the forward jump the cap sat at v1 forever and nothing
    // was ever served
    assert(spark.read.parquet(out).count() == 1L)
  }
}
