package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery, TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY.md §2.8). The reference is
  * batch-only; these wrap the SAME DataFrame transforms used by the
  * batch queries (`graft.ops.Windows`) in `readStream` sources with
  * watermarks — batch-first design: correctness is oracle-checked on
  * the batch path, and StreamingSpec asserts stream ≡ batch on
  * identical input.
  */
object Streams {

  /** Incremental file-source ingestion — the streaming analogue of the
    * reference's per-date COPY backfill (new files appear in the stage
    * directory and are picked up per micro-batch). */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
                 format: String = "parquet"): DataFrame =
    spark.readStream.schema(schema).format(format).load(dir)

  /** Tumbling 1h event-time aggregation with a 2h watermark (bounds
    * state: windows older than watermark are finalized and evicted). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** Sliding-window variant (1h / 15m), same watermark bound. */
  def slidingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** Session windows (30m gap) per user on a stream. */
  def sessionCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  /** Streaming dedup bounded by the watermark (exact within the
    * watermark horizon, state evicted beyond it). */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String]): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-static enrichment: join each micro-batch against a static
    * dimension, explicitly broadcast — the stream side never shuffles
    * and carries no join state (unlike stream-stream joins, the static
    * side is re-resolvable per batch). This is the streaming analogue
    * of every starjoin in the batch queries: at 100 TB/day the stream
    * stays partition-local and only the (small) dim ships. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    streamKey: String, dimKey: String,
                    joinType: String = "left"): DataFrame =
    stream.join(broadcast(dim), stream(streamKey) === dim(dimKey), joinType)

  /** Event row shape of the `events` fixture (typed for groupByKey). */
  final case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                            event_type: String, value: Double, props: String)
  final case class UserState(count: Long, lastType: String)
  final case class UserUpdate(user_id: Long, count: Long, last_type: String)

  /** Arbitrary stateful processing (§2.8): per-user running event
    * counter via `flatMapGroupsWithState` — state persists across
    * micro-batches (the thing windowed aggs can't express: unbounded
    * per-key counters, custom session logic, decorated emissions).
    * State is partitioned by key; at scale this shuffles once by
    * user_id and the store is RocksDB-backed per partition.
    */
  def statefulUserCounts(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventRow], state: GroupState[UserState]) =>
          var st = state.getOption.getOrElse(UserState(0L, ""))
          val out = it.toSeq.sortBy(_.ts.getTime).map { e =>
            st = UserState(st.count + 1, e.event_type)
            UserUpdate(uid, st.count, st.lastType)
          }
          state.update(st)
          out.iterator
      }.toDF()
  }

  /** transformWithState (Spark 4 arbitrary-state v2) variant of
    * [[statefulUserCounts]]: explicit named `ValueState` through a
    * `StatefulProcessor` — the API that adds state TTL, timers, and
    * independent state variables over the v1 single-state-object model.
    * Requires the RocksDB state store provider (the scale-grade store:
    * incremental checkpointing, changelog, bounded memory). */
  class RunningCountProcessor extends StatefulProcessor[Long, EventRow, UserUpdate] {
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
                                 timerValues: TimerValues): Iterator[UserUpdate] = {
      var c = if (count.exists()) count.get() else 0L
      val out = rows.toSeq.sortBy(_.ts.getTime).map { e =>
        c += 1; UserUpdate(key, c, e.event_type)
      }
      count.update(c)
      out.iterator
    }
  }

  def statefulUserCountsTws(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.as[EventRow]
      .groupByKey(_.user_id)
      .transformWithState(new RunningCountProcessor, TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  /** Stream-stream inner join with a time-range condition: each side is
    * watermarked, and the join requires the right event to land within
    * `[left.ts, left.ts + within]` — the bound that lets Spark EVICT
    * join state (an unbounded stream-stream join would buffer both
    * streams forever; the watermark + range condition caps state to the
    * horizon). Column names must be disjoint (enforced); `leftTs`/
    * `rightTs` name each side's event-time column. At scale both
    * streams co-shuffle on the key once and state lives in the
    * per-partition store. */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTs: String, rightTs: String,
                       watermark: String = "1 hour",
                       within: String = "10 minutes",
                       joinType: String = "inner"): DataFrame = {
    require(Set(leftKey, rightKey, leftTs, rightTs).size == 4,
      s"streamStreamJoin needs four distinct column names, got " +
        s"($leftKey, $rightKey, $leftTs, $rightTs)")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right schemas must be disjoint; shared columns: ${overlap.mkString(", ")}")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    // Outer variants are legal ONLY because the watermark + time bound
    // make "no match will ever arrive" decidable: a buffered row is
    // null-padded and emitted when the watermark passes its horizon —
    // so outer results trail the inner ones by up to watermark+within,
    // and a stream with no further input never flushes its tail.
    l.join(r,
      l(leftKey) === r(rightKey) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"interval $within"),
      joinType)
  }

  /** Idempotent micro-batch write: the batch lands in its own
    * `_batch_id` partition under dynamic partition overwrite, so a
    * REPLAYED batch (restart after a failure between the sink write and
    * the checkpoint commit — the at-least-once window of foreachBatch)
    * overwrites its own partition instead of appending duplicates.
    * Same idempotency contract as `Ingest.copyIntoLogged`, keyed by
    * batch id instead of file name. */
  def writeBatchIdempotent(batch: DataFrame, outDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try batch.withColumn("_batch_id", lit(batchId))
      .write.mode("overwrite").partitionBy("_batch_id").parquet(outDir)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  /** Streaming CDC apply (the Snowflake streams+tasks idiom): each
    * micro-batch of keyed change events MERGEs into a versioned state
    * table. Ops derive from the event: `D` (delete/reset) drops the
    * key's accumulated state; `U` increments it — an INCREMENTAL merge
    * (`SET total = total + delta`), deliberately not re-applicable, so
    * replay correctness must come from the commit protocol, not value
    * idempotence.
    *
    * That protocol is versioned state: batch N reads `v=N-1` and
    * OVERWRITES `v=N`. foreachBatch is at-least-once (a crash between
    * sink write and checkpoint commit redelivers the batch), and a
    * replayed batch N re-reads the untouched `v=N-1` and rewrites an
    * identical `v=N` — increments can never double-apply. This is the
    * same MVCC shape a lakehouse table format commits (Delta/Iceberg
    * snapshot per txn), expressed directly on parquet. At scale the
    * merge is one keyed shuffle join per batch over state partitioned
    * the same way — and old versions are pruned after commit.
    *
    * Batch semantics (composes to global event order because batches
    * partition time): per key, the state after a batch is the sum and
    * count of `U` values AFTER the key's last `D` (events strictly
    * ordered by (ts, event_id)); a key whose last op is `D` with no
    * later `U` is deleted. */
  def cdcApplyBatch(batch: DataFrame, stateDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val stateSchema = StructType.fromDDL(
      "user_id BIGINT, total_value DOUBLE, n_ups BIGINT")
    val prev =
      if (batchId == 0L)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
      else spark.read.parquet(s"$stateDir/v=${batchId - 1}")
    val d = batch.withColumn("op",
      when(pmod(col("event_id"), lit(10)) === 0, "D").otherwise("U"))
    // last delete per key, ordered by (ts, event_id) — struct max is
    // lexicographic, one map-side-combined agg, no window shuffle
    val lastD = d.filter(col("op") === "D").groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"))).as("ld"))
    val upserts = d.filter(col("op") === "U")
      .join(lastD, Seq("user_id"), "left")
      .filter(col("ld").isNull || struct(col("ts"), col("event_id")) > col("ld"))
      .groupBy("user_id")
      .agg(sum(col("value")).as("incr"), count(lit(1)).as("n_incr"))
    val summary = upserts
      .join(lastD.select(col("user_id"), lit(true).as("has_d")), Seq("user_id"), "full_outer")
    val merged = prev.join(summary, Seq("user_id"), "full_outer")
      .withColumn("has_d", coalesce(col("has_d"), lit(false)))
      // MERGE ... WHEN MATCHED AND deleted THEN DELETE
      .filter(!(col("has_d") && col("n_incr").isNull))
      .select(col("user_id"),
        when(col("has_d"), coalesce(col("incr"), lit(0.0)))              // reset
          .otherwise(coalesce(col("total_value"), lit(0.0))
            + coalesce(col("incr"), lit(0.0))).as("total_value"),       // increment
        when(col("has_d"), coalesce(col("n_incr"), lit(0L)))
          .otherwise(coalesce(col("n_ups"), lit(0L))
            + coalesce(col("n_incr"), lit(0L))).as("n_ups"))
    merged.write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
  }

  /** Micro-batch → snapshot-manifest commit (q190): the batch's id is
    * recorded as a `_txn_<appId>` marker INSIDE the claim (atomic with
    * the manifest rows — the Delta txn appId/version action), and
    * redelivery is gated on that per-app ledger, NOT on the table's
    * global version counter. The distinction matters the moment any
    * other committer touches the table: a compaction, vacuum-then-
    * append, or manual maintenance commit advances the version but not
    * the ledger, so the next micro-batch still commits (a version-
    * equality gate would misread it as a redelivery and silently drop
    * the batch). The guard is three-way: ledger >= batchId is an
    * at-least-once REDELIVERY (no-op by design — including the racer-
    * won-the-claim case, which surfaces as TxnAlreadyCommitted at
    * claim time); batchId > ledger+1 is a batch-id GAP — an earlier
    * batch never committed (e.g. a no-data batch when
    * `withoutNoDataBatches` wasn't applied, or a failed prior commit)
    * — and appending over it would silently misalign the ledger
    * forever, so it fails loudly instead. */
  def commitBatchToManifest(batch: DataFrame, root: String, batchId: Long,
                            appId: String = "stream-events_log",
                            table: String = "events_log"): Unit = {
    val expected = graft.ops.Manifest.lastCommittedTxn(root, appId)
      .map(_ + 1).getOrElse(0L)
    // batch 0 against a ledger already past batch 1 is NOT a
    // redelivery — it is a restart from a FRESH checkpoint (batch ids
    // restart at 0), and its batch spans ALL currently-available
    // input including versions the ledger never saw. Treating it as a
    // redelivery no-op would silently drop that data forever, so it
    // fails loudly instead: resume the original checkpoint, or start
    // a new appId (new ledger) for a genuinely new pipeline. The one
    // ambiguous point — batch 0 arriving with the ledger at exactly 1
    // — stays a no-op: that is the at-least-once redelivery crash
    // recovery depends on (first batch committed to the ledger, crash
    // before the checkpoint recorded it, restart re-runs batch 0).
    if (batchId == 0L && expected > 1L)
      throw new IllegalStateException(
        s"commitBatchToManifest: batch 0 arrived but the $appId ledger " +
          s"already expects batch $expected — a fresh checkpoint against an " +
          "existing ledger would silently drop data; resume the original " +
          "checkpoint or use a new appId")
    if (batchId < expected) return // redelivery of a committed batch: no-op
    if (batchId > expected)
      throw new IllegalStateException(
        s"commitBatchToManifest: batch $batchId arrived but the $appId ledger " +
          s"expects batch $expected next (id gap / failed prior commit); " +
          "refusing to append over the hole")
    try {
      // event-time batches land as ONE sorted file with [min, max] ts
      // recorded in the manifest — the streaming table is then
      // range-prunable like any batch-written one (q193's contract),
      // and the per-batch file is the compaction unit q196 bin-packs
      if (batch.columns.contains("ts"))
        graft.ops.Manifest.commitAppendStats(
          batch.sparkSession, root, table, batch, Seq("ts"), "ts", 1,
          txn = Some(appId -> batchId))
      else
        graft.ops.Manifest.commitAppend(
          batch.sparkSession, root, table, batch,
          txn = Some(appId -> batchId))
    } catch {
      // a concurrent instance of the same app committed this batch
      // between the ledger read and the claim: redelivery, not failure
      case _: graft.ops.Manifest.TxnAlreadyCommitted => ()
    }
  }

  /** Exactly-once-style parquet sink via foreachBatch — the canonical
    * production sink for stores without native streaming commit. */
  def foreachBatchSink(sdf: DataFrame, outDir: String, checkpoint: String): StreamingQuery =
    sdf.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch((batch: DataFrame, id: Long) => writeBatchIdempotent(batch, outDir, id))
      .start()

  /** Run a streaming DataFrame to a named in-memory table until all
    * currently-available input is processed (test/dev harness). */
  def runToMemory(sdf: DataFrame, name: String, outputMode: String = "complete"): StreamingQuery = {
    val q = sdf.writeStream.format("memory").queryName(name).outputMode(outputMode).start()
    q.processAllAvailable()
    q
  }
}
