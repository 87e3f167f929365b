package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, StandardCopyOption}
import java.nio.file.attribute.FileTime
import scala.jdk.CollectionConverters._

/** Oracle-checked STREAMING EXECUTION queries (VERDICT r4 #4): unlike
  * q51–q54, which check the batch-equivalent plans, these actually run
  * the streaming engine — file-source micro-batches, watermark state,
  * stateful dedup, stream-stream outer join, foreachBatch sink — and
  * hand the driver a batch-readable result to hash against a plain SQL
  * oracle over the same fixture.
  *
  * Determinism engineering (a streaming run must still be
  * value-reproducible for the oracle):
  *  - the fixture is staged as TIME-ORDERED parquet files with fixed
  *    modification times, and `maxFilesPerTrigger=1` makes each file
  *    its own micro-batch in a deterministic order — state genuinely
  *    crosses batch boundaries;
  *  - dedup keys embed the hour bucket, so "exact within the watermark
  *    horizon" coincides with global DISTINCT (every occurrence of a
  *    key is < 2h apart — eviction can never re-admit a key);
  *  - outer-join null padding only flushes when the watermark passes a
  *    row's horizon, so each side gets ONE far-future SENTINEL row,
  *    folded into the LAST data file (the watermark is computed from a
  *    batch's max event time at batch END either way, so a separate
  *    sentinel file would only add a micro-batch, not semantics); the
  *    engine then schedules its own no-data micro-batch for the
  *    eviction/emission pass (spark.sql.streaming.noDataMicroBatches
  *    .enabled, default on), and `processAllAvailable` waits for it —
  *    verified: the unmatched rows are in the sink before it returns.
  *    Sentinels are filtered from the result;
  *  - only set-valued output (keys, join pairs, aggregates) is
  *    emitted — never "which physical row arrived first".
  */
object StreamQueries {

  private val ctr = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Write `df` as ONE parquet file at `target` with a pinned mtime
    * (FileStreamSource orders files by modification time — pinned
    * constants make batch order reproducible across runs). */
  private def writeOneFile(df: DataFrame, target: Path, mtimeMs: Long): Unit = {
    val tmp = Files.createTempDirectory("graft-stage-part")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    val part =
      try listing.iterator().asScala.find(_.getFileName.toString.startsWith("part-")).get
      finally listing.close()
    Files.createDirectories(target.getParent)
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(target, FileTime.fromMillis(mtimeMs))
  }

  /** Mid-fixture split point (events span 2024-01-01 .. 2024-01-30). */
  private val cut = "2024-01-16 00:00:00"

  /** Stage `df` as two time-split files (rows before / after `cut`);
    * optional sentinel frames are UNIONED INTO the second file — the
    * watermark advances from a batch's max event time at batch end, so
    * a sentinel-only file would cost one more micro-batch (planning +
    * state commit round) for the same watermark progression. The staged
    * layout is a pure function of (fixture dir, tag), so it is built
    * ONCE under a deterministic path and reused by later runs — the
    * bench then times the streaming execution, not the harness's
    * fixture-splitting (same amortization argument as the q107
    * bucketed layout). */
  private def stageSplit(df: DataFrame, tsCol: String, tag: String, srcDir: String,
                         sentinels: Seq[DataFrame] = Nil): String = {
    // Path key = fixture fingerprint × staged schema × cut × sentinel
    // CONTENT: regenerating the fixture, a loader change that alters
    // the staged types (the round-9 NTZ fixture regeneration), or an
    // edited sentinel row all re-key the layout instead of serving
    // stale bytes; ops.Staging.ensure adds the atomic publish and the
    // Verify gate's unconditional rebuild. Sentinels are one-row
    // literal frames, so collecting them for the key is driver-cheap.
    val key = graft.ops.Staging.contentKey(
      (Seq(graft.ops.Staging.fingerprintOf(srcDir, Seq("events")),
        df.schema.json, cut) ++
        sentinels.map(sd => sd.schema.json + sd.collect().mkString("|"))): _*)
    graft.ops.Staging.ensure(s"target/stream-stage/$tag-$key") { tmp =>
      val cutTs = lit(cut).cast("timestamp")
      writeOneFile(df.filter(col(tsCol) < cutTs),
        java.nio.file.Paths.get(tmp).resolve("00.parquet"), 1700000000000L)
      writeOneFile(sentinels.foldLeft(df.filter(col(tsCol) >= cutTs))(_.unionByName(_)),
        java.nio.file.Paths.get(tmp).resolve("01.parquet"), 1700000001000L)
    }
  }

  private def fileStream(s: SparkSession, staged: String): DataFrame =
    s.readStream.schema(s.read.parquet(staged).schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)

  /** Remove a per-invocation scratch dir (sink output, checkpoints) —
    * repeated gate/bench runs must not accumulate unbounded /tmp data. */
  private def deleteRecursively(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  /** Run `body` with the shuffle-partition count (= the state-store
    * partition count fixed at stream start) sized for the workload.
    * Stateful micro-batches pay per-partition state commit I/O every
    * trigger, so partitions should track key cardinality / throughput,
    * not the batch default — 32 state partitions on a 4-trigger
    * fixture run is pure commit overhead (measured: 32→8 dropped the
    * stream-stream outer join ~17.7s → ~4s; 8→2 a further ~25% — the
    * fixture keyspace is ≤10k keys, so 2 stores hold it trivially). At
    * production scale the same knob goes UP with executor count; the
    * point is that it is sized, not inherited. */
  private def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    val valKey = "spark.sql.streaming.stateStore.formatValidation.enabled"
    val prevVal = s.conf.get(valKey)
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    // State-format validation re-checks every state row read against the
    // stored schema — a guard for restarting a query against state an
    // OLDER binary wrote. These runs create their checkpoint and state
    // fresh every invocation, so the check can never fire; it is a
    // measurable per-row tax on every stateful trigger (q136/q154:
    // ~10-15% of trigger wall). A long-lived production query that
    // upgrades binaries mid-checkpoint should leave it on.
    s.conf.set(valKey, "false")
    try body finally {
      s.conf.set("spark.sql.shuffle.partitions", prev)
      s.conf.set(valKey, prevVal)
    }
  }

  /** Disable the engine's trailing no-data micro-batch for streams whose
    * OUTPUT doesn't depend on a watermark-triggered flush (append-on-
    * arrival dedup, aggregate sinks): the extra batch only evicts state,
    * costs a full state-commit round, and changes no emitted row.
    * Streams that DO flush on watermark (outer join, session close) must
    * keep it on — they run outside this wrapper. */
  private def withoutNoDataBatches[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = s.conf.get(key)
    s.conf.set(key, "false")
    try body finally s.conf.set(key, prev)
  }

  /** Per-run streaming checkpoint root: RAM-backed (/dev/shm) when the
    * box has it, else java.io.tmpdir. Every micro-batch writes the
    * offset WAL, commit log, and per-partition state deltas under this
    * root, so disk fsync otherwise taxes every trigger of every gate
    * run. Production checkpoints belong on durable shared storage —
    * recovery is their job; the bench rig's checkpoints are
    * per-invocation scratch (fresh dir in, deleted after), so tmpfs
    * measures the engine instead of the local disk. */
  private def newCkptDir(): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base = if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
               else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    Files.createDirectories(base.resolve("graft-stream-ckpt"))
    Files.createTempDirectory(base.resolve("graft-stream-ckpt"), "q").toString
  }

  /** Run a streaming frame to a uniquely-named memory table until all
    * staged input is consumed; return the materialized result. The
    * memory-sink table is localCheckpoint'ed and DROPPED before
    * returning — otherwise every invocation (two bench passes × five
    * streaming queries) pins its full result set in driver memory for
    * the session lifetime, exactly the cross-query pressure the
    * round-4 phantom regressions traced to. */
  private def runAppend(s: SparkSession, sdf: DataFrame, tag: String): DataFrame =
    runToSink(s, sdf, tag, "append")

  /** Complete-mode variant: for streaming AGGREGATES, where the sink
    * holds the (small) aggregate state, not the event stream. */
  private def runComplete(s: SparkSession, sdf: DataFrame, tag: String): DataFrame =
    runToSink(s, sdf, tag, "complete")

  private def runToSink(s: SparkSession, sdf: DataFrame, tag: String,
                        mode: String): DataFrame = {
    val name = s"g_stream_${tag}_${ctr.incrementAndGet()}"
    val ckpt = newCkptDir()
    val q = sdf.writeStream.format("memory").queryName(name).outputMode(mode)
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val out = s.table(name).localCheckpoint(true)
    s.catalog.dropTempView(name)
    deleteRecursively(ckpt)
    out
  }

  val queries: Seq[Q] = Seq(

    // ----- streaming dedup through dropDuplicatesWithinWatermark,
    //       executed across two real micro-batches: the key embeds the
    //       hour bucket, so watermark-horizon dedup ≡ global DISTINCT
    //       (see header) and the oracle is exact. -----
    Q("q135_stream_dedup_watermark",
      Some("""SELECT user_id, event_type,
             |  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ts_hour
             |FROM events GROUP BY ALL
             |ORDER BY user_id, event_type, ts_hour""".stripMargin),
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        val staged = stageSplit(ev, "ts", "dedup3col", dir)
        val keyed = fileStream(s, staged).withColumn("ts_hour", date_trunc("hour", col("ts")))
        val deduped = Streams.dedupWithinWatermark(keyed, Seq("user_id", "event_type", "ts_hour"))
        // dedup emits on first arrival; the trailing eviction-only batch
        // changes no output row
        withStatePartitions(s, 2)(withoutNoDataBatches(s)(runAppend(s, deduped, "dedup")))
          .select("user_id", "event_type", "ts_hour")
          .orderBy("user_id", "event_type", "ts_hour")
      }),

    // ----- stream-stream LEFT OUTER time-range join (views ⟕ purchases
    //       within 10 minutes), run through real watermark state: inner
    //       matches emit as both sides arrive; unmatched views emit
    //       null-padded only once the (sentinel-advanced) watermark
    //       proves no match can still arrive. -----
    Q("q136_stream_stream_outer_join",
      Some("""SELECT l.user_id AS l_user, l.event_id AS l_event, r.event_id AS r_event
             |FROM (SELECT * FROM events WHERE event_type = 'view') l
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
             |  ON l.user_id = r.user_id AND r.ts >= l.ts
             |  AND r.ts <= l.ts + INTERVAL 10 MINUTE
             |ORDER BY l_event, r_event""".stripMargin),
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        def sentinel(u: String, e: String, t: String, ts: String) =
          s.sql(s"SELECT CAST(-1 AS BIGINT) AS $u, CAST(-1 AS BIGINT) AS $e, " +
            s"CAST('$ts' AS TIMESTAMP) AS $t")
        val lv = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("l_user"), col("event_id").as("l_event"), col("ts").as("l_ts"))
        val rv = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("r_user"), col("event_id").as("r_event"), col("ts").as("r_ts"))
        val lStaged = stageSplit(lv, "l_ts", "ssjoin_l2", dir, Seq(
          sentinel("l_user", "l_event", "l_ts", "2024-03-01 00:00:00")))
        val rStaged = stageSplit(rv, "r_ts", "ssjoin_r2", dir, Seq(
          sentinel("r_user", "r_event", "r_ts", "2024-03-01 00:00:00")))
        val joined = Streams.streamStreamJoin(
          fileStream(s, lStaged), fileStream(s, rStaged),
          "l_user", "r_user", "l_ts", "r_ts", joinType = "left_outer")
        withStatePartitions(s, 2)(runAppend(s, joined, "ssjoin"))
          .filter(col("l_user") >= 0)
          .select("l_user", "l_event", "r_event")
          .orderBy("l_event", "r_event")
      }),

    // ----- foreachBatch idempotent parquet sink, with the at-least-once
    //       REPLAY window actually exercised: after the stream commits
    //       both micro-batches, the second batch is re-delivered under
    //       its original batch id. Dynamic partition overwrite rewrites
    //       `_batch_id=1` in place; an appending sink would double that
    //       batch's rows and fail the oracle's counts. -----
    Q("q137_foreachbatch_sink",
      Some("""SELECT event_type, count(*) AS n, round(sum(value), 4) AS total
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val staged = stageSplit(Tables.load(s, dir, "events"), "ts", "events_full", dir)
        val outDir = Files.createTempDirectory("graft-fbsink-out").toString
        val ckpt = newCkptDir()
        withStatePartitions(s, 2) {
          val q = Streams.foreachBatchSink(fileStream(s, staged), outDir, ckpt)
          try q.processAllAvailable() finally q.stop()
        }
        Streams.writeBatchIdempotent(s.read.parquet(s"$staged/01.parquet"), outDir, 1L)
        val result = s.read.parquet(outDir)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
          .orderBy("event_type")
          .localCheckpoint(true) // materialize so the dirs can be deleted now
        Seq(outDir, ckpt).foreach(deleteRecursively)
        result
      }),

    // ----- arbitrary-state v1 (flatMapGroupsWithState) through real
    //       micro-batches: the per-user running counter RESUMES from
    //       persisted state in batch 2, so the max emitted count per
    //       user equals that user's total events iff cross-batch state
    //       actually worked — which is exactly what the oracle checks. -----
    Q("q141_stream_stateful_counts",
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val staged = stageSplit(Tables.load(s, dir, "events"), "ts", "events_full", dir)
        val counted = Streams.statefulUserCounts(fileStream(s, staged))
        withStatePartitions(s, 2)(runAppend(s, counted, "fmgws"))
          .groupBy("user_id").agg(max(col("count")).as("n_events"))
          .orderBy("user_id")
      }),

    // ----- session windows through REAL streaming execution: gap-based
    //       sessions merge across micro-batch boundaries (a user active
    //       on both sides of the file split lands in ONE session iff
    //       cross-batch session state works), and append-mode emission
    //       only fires when the watermark passes a session's close —
    //       the far-future sentinel forces that flush, exactly the
    //       q136 device. Oracle is the q53 batch sessionization SQL:
    //       streaming and batch must agree on every (start, end, count). -----
    Q("q154_stream_session_exec",
      Some(graft.ops.Windows.duckSessionOracle),
      (s, dir) => {
        val ev = Tables.load(s, dir, "events").select(col("user_id"), col("ts"))
        def sentinel(ts: String) = s.sql(
          s"SELECT CAST(-1 AS BIGINT) AS user_id, CAST('$ts' AS TIMESTAMP) AS ts")
        val staged = stageSplit(ev, "ts", "sessw2", dir, Seq(
          sentinel("2024-03-01 00:00:00")))
        val sess = fileStream(s, staged)
          .withWatermark("ts", "1 hour")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"), col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"), col("n_events"))
        withStatePartitions(s, 2)(runAppend(s, sess, "sessw"))
          .filter(col("user_id") >= 0)
          .orderBy("user_id", "session_start")
      }),

    // ----- stream-static enrichment through real micro-batches: each
    //       batch of the event stream broadcast-joins a STATIC user
    //       dimension (derived deterministically from user_id), then
    //       aggregates INSIDE the stream (complete mode) — the
    //       streaming star-join + rollup shape: the stream never
    //       shuffles for the join (only the small dim ships, no join
    //       state between batches), and the sink holds the |tiers|-row
    //       aggregate state, never the event stream itself
    //       (materializing the enriched stream row-by-row into a sink
    //       is the collect-anti-pattern at 100 TB/day). Closes the
    //       last spec-only §2.8 path with an execution-level oracle. -----
    Q("q164_stream_static_enrich",
      Some("""SELECT CAST(user_id % 5 AS BIGINT) AS tier,
             |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
             |FROM events GROUP BY tier ORDER BY tier""".stripMargin),
      (s, dir) => {
        val staged = stageSplit(Tables.load(s, dir, "events"), "ts", "events_full", dir)
        // stream-static joins RE-RESOLVE the static side every trigger —
        // materialize the dim once so each micro-batch joins the
        // checkpointed rows instead of re-running the scan + distinct
        val dim = Tables.load(s, dir, "events")
          .select((col("user_id") % 5).as("tier"), col("user_id").as("d_user"))
          .distinct()
          .localCheckpoint(true)
        val enriched = Streams.enrichWithDim(
          fileStream(s, staged), dim, "user_id", "d_user", joinType = "inner")
        val agged = enriched.groupBy(col("tier"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("raw_total"))
        val out = withStatePartitions(s, 2)(runComplete(s, agged, "enrich"))
          .select(col("tier"), col("n"), round(col("raw_total"), 4).as("total"))
          .orderBy("tier")
        dim.unpersist() // the sink result is checkpointed; release the dim blocks
        out
      }),

    // ----- arbitrary-state v2 (transformWithState on the RocksDB
    //       store — the scale-grade provider: incremental checkpoint,
    //       changelog, bounded memory) running the same counter; same
    //       cross-batch-resume oracle as q141. -----
    Q("q142_stream_stateful_tws",
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val staged = stageSplit(Tables.load(s, dir, "events"), "ts", "events_full", dir)
        val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val out =
          try {
            val counted = Streams.statefulUserCountsTws(fileStream(s, staged))
            withStatePartitions(s, 2)(runAppend(s, counted, "tws"))
          } finally prev match {
            case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
            case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
          }
        out.groupBy("user_id").agg(max(col("count")).as("n_events"))
          .orderBy("user_id")
      }),

    // ----- checkpoint RESTART recovery: the q135 dedup stream run as
    //       TWO SEPARATE QUERIES sharing one checkpoint — the first
    //       consumes file 1 and STOPS; a brand-new query object resumes
    //       from the checkpoint and consumes file 2. The union of both
    //       runs' sinks equals global DISTINCT iff BOTH halves of the
    //       checkpoint survived the restart: the offset log (else run 2
    //       re-reads file 1 → duplicated rows) and the state store
    //       (else run 2 re-emits keys run 1 already emitted). This is
    //       the recovery contract production streaming actually relies
    //       on — planned upgrades and crash restarts both resume from
    //       exactly this checkpoint layout. -----
    Q("q176_stream_restart_recovery",
      Some("""SELECT user_id, event_type,
             |  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ts_hour
             |FROM events GROUP BY ALL
             |ORDER BY user_id, event_type, ts_hour""".stripMargin),
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        val staged = stageSplit(ev, "ts", "dedup3col", dir) // shared with q135
        // a mutable source dir: file 1 visible to run 1, file 2 added
        // before run 2 — the external world moving on while the query
        // is down. The sink is the fault-tolerant FILE sink (the memory
        // sink rightly REFUSES checkpoint recovery): both runs append
        // to one parquet dir whose _spark_metadata commit log is the
        // sink half of the exactly-once contract.
        val src = Files.createTempDirectory("graft-restart-src")
        val sink = Files.createTempDirectory("graft-restart-sink").toString
        val ckpt = newCkptDir()
        def copyIn(name: String): Unit =
          Files.copy(java.nio.file.Paths.get(staged, name), src.resolve(name),
            StandardCopyOption.COPY_ATTRIBUTES)
        def runOnce(): Unit = {
          val keyed = fileStream(s, src.toString)
            .withColumn("ts_hour", date_trunc("hour", col("ts")))
          val deduped = Streams.dedupWithinWatermark(
            keyed, Seq("user_id", "event_type", "ts_hour"))
          val q = deduped.select("user_id", "event_type", "ts_hour")
            .writeStream.format("parquet").outputMode("append")
            .option("path", sink).option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          try q.awaitTermination() finally q.stop()
        }
        withStatePartitions(s, 2)(withoutNoDataBatches(s) {
          copyIn("00.parquet")
          runOnce()
          copyIn("01.parquet") // arrives while the query is down
          runOnce()            // a NEW query object resumes the checkpoint
        })
        // batch read honors the sink's _spark_metadata commit log —
        // only exactly-once-committed files are visible
        val out = s.read.parquet(sink)
          .orderBy("user_id", "event_type", "ts_hour")
          .localCheckpoint(true) // materialize so the dirs can be deleted now
        Seq(ckpt, src.toString, sink).foreach(deleteRecursively)
        out
      }),

    // ----- continuous COPY (auto-ingest): the reference's staged-CSV
    //       load as a STREAM — the same file_format option block and
    //       NULL_IF/cast pipeline as batch q35, but each staged file is
    //       its own micro-batch, appended exactly once (the source's
    //       checkpointed file log is the load history). The oracle is a
    //       per-load-date audit over ALL three backfill files, computed
    //       DIFFERENTIALLY: DuckDB read_csv re-parses the same staged
    //       files, so any parse drift (quote, NULL_IF, cast) or
    //       double-delivery breaks the compare. Delivery mode must be
    //       invisible: streaming COPY ≡ batch COPY of the same files. -----
    Q("q173_copy_stream",
      Some(s"""SELECT CAST(trans_ts AS DATE) AS load_date,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(trans_id) AS BIGINT) AS sum_trans_id,
             |  CAST(sum(quantity) AS BIGINT) AS sum_qty,
             |  CAST(round(sum(unit_price), 4) AS DOUBLE) AS sum_price,
             |  CAST(count(CASE WHEN quantity IS NULL THEN 1 END) AS BIGINT) AS null_qty,
             |  CAST(count(CASE WHEN currency IS NULL THEN 1 END) AS BIGINT) AS null_ccy,
             |  CAST(count(CASE WHEN product_id IS NULL THEN 1 END) AS BIGINT) AS null_product
             |FROM ${graft.ops.Ingest.duckReadCsv(
               Iterator.iterate(graft.ops.Ingest.backfillStart)(_.plusDays(1))
                 .takeWhile(_.isBefore(graft.ops.Ingest.backfillEnd))
                 .map(graft.ops.Ingest.stagedFileName).toSeq)}
             |GROUP BY load_date
             |ORDER BY load_date""".stripMargin),
      (s, _) => {
        val stage = graft.ops.Ingest.writeStageFixtures()
        // subscription glob: the three dated backfill files only — the
        // shared stage prefix also holds dirty/pattern fixtures that
        // belong to other COPY gates
        val src = graft.ops.Ingest.copyStreamSource(
          s, stage, "product_order_trans_07??2022.csv")
        runAppend(s, src, "copystream")
          .groupBy(to_date(col("trans_ts")).as("load_date"))
          .agg(count(lit(1)).as("n_rows"),
            sum("trans_id").as("sum_trans_id"),
            sum("quantity").as("sum_qty"),
            round(sum("unit_price"), 4).as("sum_price"),
            count(when(col("quantity").isNull, 1)).as("null_qty"),
            count(when(col("currency").isNull, 1)).as("null_ccy"),
            count(when(col("product_id").isNull, 1)).as("null_product"))
          .orderBy("load_date")
      }),

    // ----- streaming CDC upsert (continuous keyed MERGE — the
    //       streams+tasks idiom): each micro-batch of change events
    //       merges into a versioned keyed table via foreachBatch —
    //       increments on U, delete/reset on D (see
    //       Streams.cdcApplyBatch for the MVCC commit protocol). After
    //       the stream drains, the LAST batch is deliberately REPLAYED
    //       through the same apply path — foreachBatch's at-least-once
    //       redelivery window — and because the increment merge is NOT
    //       value-idempotent, any append-or-read-latest bug
    //       double-applies and breaks the hash. Oracle: the same CDC
    //       semantics computed globally by DuckDB (sum/count of U
    //       events after each key's last D). -----
    Q("q179_stream_cdc_upsert",
      Some("""WITH d AS (
             |  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
             |    CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op
             |  FROM events),
             |lastd AS (
             |  SELECT user_id, ts AS d_ts, event_id AS d_id FROM (
             |    SELECT user_id, ts, event_id,
             |      row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |    FROM d WHERE op = 'D') WHERE rn = 1)
             |SELECT u.user_id, round(sum(u.value), 4) AS total_value,
             |  CAST(count(*) AS BIGINT) AS n_ups
             |FROM d u LEFT JOIN lastd l USING (user_id)
             |WHERE u.op = 'U' AND (l.d_ts IS NULL OR (u.ts, u.event_id) > (l.d_ts, l.d_id))
             |GROUP BY u.user_id
             |ORDER BY u.user_id""".stripMargin),
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select("event_id", "user_id", "ts", "value")
        val staged = stageSplit(ev, "ts", "cdc", dir)
        val state = Files.createTempDirectory("graft-cdc-state").toString
        val ckpt = newCkptDir()
        withStatePartitions(s, 2)(withoutNoDataBatches(s) {
          val q = fileStream(s, staged).writeStream
            .option("checkpointLocation", ckpt).outputMode("append")
            .foreachBatch((b: DataFrame, id: Long) =>
              Streams.cdcApplyBatch(b, state, id))
            .start()
          try q.processAllAvailable() finally q.stop()
        })
        // at-least-once replay of the final batch (file 01 = batch 1):
        // must rewrite an IDENTICAL v=1 from the untouched v=0
        Streams.cdcApplyBatch(s.read.parquet(s"$staged/01.parquet"), state, 1L)
        val out = s.read.parquet(s"$state/v=1")
          .select(col("user_id"), round(col("total_value"), 4).as("total_value"),
            col("n_ups"))
          .orderBy("user_id")
          .localCheckpoint(true)
        Seq(state, ckpt).foreach(deleteRecursively)
        out
      }),

    // ----- Streaming table via manifest commits: every micro-batch
    //       becomes an atomic snapshot (Streams.commitBatchToManifest),
    //       so a concurrent reader sees only whole batches and a crash
    //       between data-write and pointer-swap surfaces as "batch not
    //       committed", never a partial table. The manifest VERSION is
    //       the idempotency ledger: after the stream drains, the last
    //       batch is replayed through the same path and the version
    //       guard must turn it into a no-op — a double-append breaks
    //       both n_events and total_v against the oracle. -----
    Q("q190_stream_manifest_commit",
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select("event_id", "user_id", "ts", "value")
        val staged = stageSplit(ev, "ts", "mfc", dir)
        val root = Files.createTempDirectory("graft-stream-manifest").toString
        val ckpt = newCkptDir()
        withStatePartitions(s, 2)(withoutNoDataBatches(s) {
          val q = fileStream(s, staged).writeStream
            .option("checkpointLocation", ckpt).outputMode("append")
            .foreachBatch((b: DataFrame, id: Long) =>
              Streams.commitBatchToManifest(b, root, id))
            .start()
          try q.processAllAvailable() finally q.stop()
        })
        // at-least-once replay of the final batch: the version guard
        // must make this a no-op
        Streams.commitBatchToManifest(
          s.read.parquet(s"$staged/01.parquet"), root, 1L)
        val out = graft.ops.Manifest.readTable(s, root, "events_log")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,4)")).cast("double").as("total_v"))
          .orderBy("user_id")
          .localCheckpoint(true)
        Seq(root, ckpt).foreach(deleteRecursively)
        out
      }),

    // ----- the commit log as a STREAMING SOURCE (q226): the inverse
    //       of q190 — `readStream.format("graft-manifest")` serves
    //       each committed version interval as a micro-batch,
    //       O(delta) planning and I/O, exactly once. Two pre-stream
    //       appends bootstrap as batch 0; a third append committed
    //       WHILE the query runs arrives as batch 1 containing only
    //       the delta. The oracle recomputes both windows from the
    //       raw table keyed by the batch boundary: a re-served file
    //       (double rows), a missed delta, or bootstrap/incremental
    //       misassignment all shift the per-batch aggregates — hash
    //       breaks. -----
    Q("q226_stream_manifest_source",
      Some("""SELECT CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |  THEN 0 ELSE 1 END AS batch_id,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cut1 = lit("2024-01-08 00:00:00").cast("timestamp")
        val cut2 = lit("2024-01-16 00:00:00").cast("timestamp")
        val root = Files.createTempDirectory("graft-stream-src").toString
        val sink = Files.createTempDirectory("graft-stream-src-out").toString
        val ckpt = newCkptDir()
        graft.ops.Manifest.commitAppendRanged(s, root, "events_log",
          ev.filter(col("ts") < cut1), "ts", 4)                      // v1
        graft.ops.Manifest.commitAppendRanged(s, root, "events_log",
          ev.filter(col("ts") >= cut1 && col("ts") < cut2), "ts", 4) // v2
        val q = s.readStream.format("graft-manifest")
          .option("root", root).option("table", "events_log").load()
          .writeStream.option("checkpointLocation", ckpt).outputMode("append")
          .foreachBatch((b: DataFrame, id: Long) =>
            b.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(sink))
          .start()
        try {
          q.processAllAvailable() // batch 0: bootstrap (0, v2]
          graft.ops.Manifest.commitAppendRanged(s, root, "events_log",
            ev.filter(col("ts") >= cut2), "ts", 4)                   // v3
          q.processAllAvailable() // batch 1: the (v2, v3] delta only
        } finally q.stop()
        val out = s.read.parquet(sink)
          .groupBy(col("batch_id").cast("int").as("batch_id"))
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("batch_id")
          .localCheckpoint(true)
        Seq(root, sink, ckpt).foreach(deleteRecursively)
        out
      }),

    // ----- commit-log → commit-log pipeline (q231): the source and
    //       sink halves of `format("graft-manifest")` composed with
    //       NO foreachBatch user code — `maxVersionsPerTrigger=1`
    //       makes the two pre-existing source versions arrive as two
    //       bounded micro-batches (the backfill rate limit), a third
    //       commits mid-stream, and each batch lands in the
    //       destination log through the exactly-once ledger. The
    //       result carries the destination VERSION COUNT beside the
    //       content aggregate: a rate limit that collapsed the
    //       backfill into one batch, a re-served version, or a lost
    //       ledger commit all shift n_versions or the totals — hash
    //       breaks. -----
    Q("q231_stream_log_pipeline",
      Some("""SELECT CAST(3 AS BIGINT) AS n_versions,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events""".stripMargin),
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cut1 = lit("2024-01-08 00:00:00").cast("timestamp")
        val cut2 = lit("2024-01-16 00:00:00").cast("timestamp")
        val src = Files.createTempDirectory("graft-pipe-src").toString
        val dst = Files.createTempDirectory("graft-pipe-dst").toString
        val ckpt = newCkptDir()
        graft.ops.Manifest.commitAppendRanged(s, src, "events_log",
          ev.filter(col("ts") < cut1), "ts", 4)                      // v1
        graft.ops.Manifest.commitAppendRanged(s, src, "events_log",
          ev.filter(col("ts") >= cut1 && col("ts") < cut2), "ts", 4) // v2
        val q = s.readStream.format("graft-manifest")
          .option("root", src).option("table", "events_log")
          .option("maxVersionsPerTrigger", "1").load()
          .writeStream.format("graft-manifest")
          .option("root", dst).option("table", "events_log")
          .option("checkpointLocation", ckpt).outputMode("append")
          .start()
        try {
          q.processAllAvailable() // backfill: v1, v2 as SEPARATE batches
          graft.ops.Manifest.commitAppendRanged(s, src, "events_log",
            ev.filter(col("ts") >= cut2), "ts", 4)                   // v3
          q.processAllAvailable() // live tail
        } finally q.stop()
        val nVersions = graft.ops.Manifest.snapshotVersion(dst)
        val out = graft.ops.Manifest.readTable(s, dst, "events_log")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .withColumn("n_versions", lit(nVersions))
          .select("n_versions", "n_events", "total_v")
          .localCheckpoint(true)
        Seq(src, dst, ckpt).foreach(deleteRecursively)
        out
      }),

    // ----- streaming CDF (q235): the q228 change classes consumed
    //       THROUGH the streaming source in CDF mode — rewrites
    //       stream as row-level delete/insert pairs instead of
    //       refusing, `maxVersionsPerTrigger=1` forces one micro-
    //       batch per commit so each version's feed slice is computed
    //       and served independently. Same oracle as q228: if any
    //       per-interval slice differs from the all-at-once feed (a
    //       boundary row double-served or dropped between batches),
    //       the per-class sums shift — hash breaks. -----
    Q("q235_stream_change_feed",
      Some("""WITH ev AS (SELECT user_id, CAST(value AS DECIMAL(18,4)) AS value,
             |    CAST(ts AS TIMESTAMP) AS ts FROM events),
             |del2 AS (SELECT * FROM ev
             |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
             |    AND ts >= TIMESTAMP '2024-01-10 00:00:00'
             |    AND ts < TIMESTAMP '2024-01-12 00:00:00'),
             |upd3 AS (SELECT * FROM ev
             |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00' AND user_id = 3
             |    AND NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
             |      AND ts < TIMESTAMP '2024-01-12 00:00:00')),
             |classes AS (
             |  SELECT 1 AS v, 'insert' AS change, count(*) AS n, sum(value) AS sv
             |  FROM ev WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
             |  UNION ALL SELECT 2, 'delete', count(*), sum(value) FROM del2
             |  UNION ALL SELECT 3, 'delete', count(*), sum(value) FROM upd3
             |  UNION ALL SELECT 3, 'insert', count(*), sum(value * 2) FROM upd3
             |  UNION ALL SELECT 4, 'insert', count(*), sum(value)
             |  FROM ev WHERE ts >= TIMESTAMP '2024-01-16 00:00:00')
             |SELECT CAST(v AS BIGINT) AS v, change,
             |  CAST(n AS BIGINT) AS n, CAST(sv AS DOUBLE) AS sv
             |FROM classes ORDER BY v, change""".stripMargin),
      (s, dir) => {
        val root = graft.ops.Manifest.changeFeedRoot(s, dir)
        val sink = Files.createTempDirectory("graft-cdf-stream-out").toString
        val ckpt = newCkptDir()
        val q = s.readStream.format("graft-manifest")
          .option("root", root).option("table", "events_log")
          .option("readChangeFeed", "true")
          .option("maxVersionsPerTrigger", "1").load()
          .writeStream.option("checkpointLocation", ckpt).outputMode("append")
          .foreachBatch((b: DataFrame, _: Long) =>
            b.write.mode("append").parquet(sink))
          .start()
        try q.processAllAvailable() finally q.stop()
        val out = s.read.parquet(sink)
          .groupBy(col("_commit_version").as("v"),
            col("_change_type").as("change"))
          .agg(count(lit(1)).as("n"), sum("value").cast("double").as("sv"))
          .orderBy("v", "change")
          .localCheckpoint(true)
        Seq(sink, ckpt).foreach(deleteRecursively)
        out
      }),

    // ----- streaming maintenance of the committed ANN index (q334):
    //       embeddings ARRIVE as a stream — each micro-batch lands on
    //       the corpus table under a batch-id txn marker (exactly-once:
    //       a replayed batch dies at the ledger) and the committed
    //       IVF-PQ index advances O(batch) in the same foreachBatch
    //       (the maintenance quiesces when the replayed append
    //       no-opped). This is the production shape: the index is
    //       never rebuilt, never lags more than one trigger, and the
    //       at-least-once replay is asserted by RE-DRIVING the last
    //       batch body verbatim. Oracle recomputes the full-corpus
    //       IVF-PQ independently — a double-indexed batch or a missed
    //       one shifts some query's top-3. -----
    Q("q334_stream_ann_maintain",
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding, ${graft.ops.Similarity.duckNorm} AS nrm FROM embeddings
              |), c AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM e WHERE vec_id < 8),
              |asg AS (
              |  SELECT e.vec_id, c.c_id,
              |    round(list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[])
              |          / (e.nrm * c.c_nrm), 4) AS rcos
              |  FROM e CROSS JOIN c),
              |ranked AS (
              |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY rcos DESC, c_id) AS rn FROM asg),
              |cells AS (SELECT vec_id, c_id AS cell FROM ranked WHERE rn = 1),
              |probes AS (SELECT vec_id AS q_id, c_id AS cell FROM ranked WHERE rn <= 2 AND vec_id < 5),
              |cand AS (
              |  SELECT p.q_id, t.vec_id AS cand_id
              |  FROM probes p JOIN cells t ON t.cell = p.cell AND t.vec_id <> p.q_id),
              |sub AS (
              |  SELECT vec_id, m, (embedding::DOUBLE[])[m*16+1 : m*16+16] AS s
              |  FROM e, (VALUES (0),(1),(2),(3)) AS mm(m)),
              |pcent AS (SELECT vec_id AS pc, m, s AS cs FROM sub WHERE vec_id < 8),
              |enc AS (
              |  SELECT vec_id, m, pc FROM (
              |    SELECT sub.vec_id, sub.m, p.pc,
              |      row_number() OVER (PARTITION BY sub.vec_id, sub.m
              |        ORDER BY list_dot_product(sub.s, p.cs) DESC, p.pc) AS prn
              |    FROM sub JOIN pcent p ON p.m = sub.m) WHERE prn = 1),
              |dtab AS (
              |  SELECT q.vec_id AS q_id, p.m, p.pc,
              |    CAST(floor(list_dot_product(q.s, p.cs) * 10000 + 0.5) AS BIGINT) AS d_e4
              |  FROM sub q JOIN pcent p ON p.m = q.m WHERE q.vec_id < 5),
              |sc AS (
              |  SELECT cand.q_id, cand.cand_id,
              |    CAST(SUM(d.d_e4) AS BIGINT) AS score_e4
              |  FROM cand
              |  JOIN enc ON enc.vec_id = cand.cand_id
              |  JOIN dtab d ON d.q_id = cand.q_id AND d.m = enc.m AND d.pc = enc.pc
              |  GROUP BY cand.q_id, cand.cand_id)
              |SELECT q_id, cand_id, score_e4, CAST(rn AS INT) AS rn FROM (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY q_id ORDER BY score_e4 DESC, cand_id) AS rn FROM sc)
              |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin),
      (s, dir) => {
        import graft.ops.{Manifest, Similarity}
        val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val maxId = e.agg(max("vec_id")).head().getLong(0)
        val c1 = maxId / 2
        val c2 = (maxId * 3) / 4
        // stream stage: the two post-bootstrap arrival files
        val key = graft.ops.Staging.contentKey(
          graft.ops.Staging.fingerprintOf(dir, Seq("embeddings")),
          c1.toString, c2.toString)
        val staged = graft.ops.Staging.ensure(
          s"target/stream-stage/annidx-$key") { tmp =>
          writeOneFile(e.filter(col("vec_id") > c1 && col("vec_id") <= c2),
            java.nio.file.Paths.get(tmp).resolve("00.parquet"), 1700000000000L)
          writeOneFile(e.filter(col("vec_id") > c2),
            java.nio.file.Paths.get(tmp).resolve("01.parquet"), 1700000001000L)
        }
        val root = Files.createTempDirectory("graft-stream-ann").toString
        Manifest.commitAppend(s, root, "embeddings",
          e.filter(col("vec_id") <= c1).coalesce(2))
        val _ = Similarity.buildAnnIndex(s, root, "embeddings", "ivfpq")
        def applyBatch(b: DataFrame, id: Long): Unit = {
          try Manifest.commitAppend(s, root, "embeddings", b,
            txn = Some("annstream" -> id))
          catch { case _: Manifest.TxnAlreadyCommitted => () }
          val _ = Similarity.maintainAnnIndex(s, root, "ivfpq")
        }
        val ckpt = newCkptDir()
        withoutNoDataBatches(s) {
          val q = fileStream(s, staged).writeStream
            .option("checkpointLocation", ckpt).outputMode("append")
            .foreachBatch((b: DataFrame, id: Long) => applyBatch(b, id))
            .start()
          try q.processAllAvailable() finally q.stop()
        }
        // at-least-once replay of the LAST batch body, verbatim: the
        // append dies at the txn ledger, the maintenance quiesces —
        // corpus and index byte-identical after
        val vBefore = Manifest.snapshotVersion(root)
        applyBatch(s.read.parquet(s"$staged/01.parquet"), 1L)
        require(Manifest.snapshotVersion(root) == vBefore,
          "replayed batch must be exactly-once (ledger + cursor)")
        val queries = e.filter(col("vec_id") < 5)
        val wTop = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id"))
          .orderBy(col("score_e4").desc, col("cand_id"))
        val out = Similarity.queryAnnIndex(s, root, "ivfpq", queries)
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 3)
          .select(col("q_id"), col("cand_id"), col("score_e4"),
            col("rn").cast("int").as("rn"))
          .orderBy("q_id", "rn").localCheckpoint(true)
        deleteRecursively(ckpt)
        graft.ops.Staging.deleteRecursively(
          java.nio.file.Paths.get(root))
        out
      })
  )
}
