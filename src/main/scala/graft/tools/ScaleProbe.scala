package graft.tools

import graft.Tables
import graft.ops.{Compaction, ScaleOps, Staging}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 scale measurements behind SCALING.md rows that ScaleSmoke's
  * generic 1×-vs-N× wall-clock protocol can't express:
  *
  *  - `dpp30`: DPP pruned-partition RATIO on a 30× orders replica —
  *    proves runtime pruning stays proportional (12/~84 months) when
  *    the per-partition file population grows 30×.
  *  - `mergeschema`: q174's footer-merge cost as a function of file
  *    count — DataFrame CREATION time (schema resolution) for
  *    `mergeSchema=true` vs a catalog-pinned schema over the same
  *    many-file two-epoch table; the data-read pass is timed
  *    separately to show parity.
  *  - `compact10`: q177's file-count bound at 10× — binPack report
  *    (files/bytes before → after, bins) on a 10× fragmented events
  *    table.
  *
  * Usage: runMain graft.tools.ScaleProbe [dpp1|dpp30|mergeschema|compact10 ...]
  * (no args = all). Writes only under target/.
  */
object ScaleProbe {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def dpp(spark: SparkSession, srcDir: String, factor: Int): Unit = {
    // factor× orders-only replica (key-shifted copies, same protocol as
    // ScaleSmoke.buildScaled) — DPP needs no other table
    val scaled =
      if (factor == 1) srcDir
      else Staging.ensure(s"target/graft-probe/orders${factor}x") { tmp =>
        val base = Tables.load(spark, srcDir, "orders")
        val span = 10000000L
        (0 until factor).map(i => base
            .withColumn("o_orderkey", col("o_orderkey") + lit(i * span))
            .withColumn("o_custkey", col("o_custkey") + lit(i * span)))
          .reduce(_.unionByName(_))
          .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
      }
    val (fact, dim) = ScaleOps.dppJoinSides(spark, scaled)
    val joined = fact.join(dim, Seq("o_month"))
      .groupBy("o_month").agg(count(lit(1)).as("n"))
    // collect() (12 rows) drives THIS QueryExecution — a write would plan
    // a fresh one and leave these scan metrics at zero
    val (_, warm) = time(joined.collect())
    val joined2 = fact.join(dim, Seq("o_month"))
      .groupBy("o_month").agg(count(lit(1)).as("n"))
    val (_, wall) = time(joined2.collect())
    val _ = warm
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val factScan = scans(joined.queryExecution.executedPlan)
      .find(_.partitionFilters.nonEmpty).get
    val parts = factScan.metrics("numPartitions").value
    val files = factScan.metrics("numFiles").value
    val total = fact.select("o_month").distinct().count()
    println(s"[probe] dpp${factor}x: wall=${"%.2f".format(wall)}s " +
      s"partitionsRead=$parts of $total, filesRead=$files")
  }

  def mergeSchema(spark: SparkSession, srcDir: String): Unit = {
    // two-epoch events table fragmented to ~nFiles footers (half lack
    // the added column) — the q174 shape at a production file count
    val nFiles = 400
    val dir = Staging.ensure(s"target/graft-probe/evolve$nFiles") { tmp =>
      val ev = Tables.load(spark, srcDir, "events")
        .select("event_id", "user_id", "ts", "value")
      ev.repartition(nFiles / 2).write.mode("overwrite").parquet(s"$tmp/epoch=1")
      ev.withColumn("quality", col("value") * 2)
        .repartition(nFiles / 2).write.mode("overwrite").parquet(s"$tmp/epoch=2")
    }
    val pinned = spark.read.option("mergeSchema", "true").parquet(dir).schema
    def create(merge: Boolean): DataFrame =
      if (merge) spark.read.option("mergeSchema", "true").parquet(dir)
      else spark.read.schema(pinned).parquet(dir)
    def probe(merge: Boolean): (Double, Double) = {
      spark.catalog.clearCache()
      spark.sessionState.catalog.invalidateAllCachedTables()
      val (df, tCreate) = time(create(merge))
      val (_, tAgg) = time(
        df.agg(count(lit(1)), sum("value"), sum("quality"))
          .write.format("noop").mode("overwrite").save())
      (tCreate, tAgg)
    }
    probe(merge = true) // warm FS metadata so both timed passes are warm
    val (mc, ma) = probe(merge = true)
    val (pc, pa) = probe(merge = false)
    println(f"[probe] mergeschema files=$nFiles merged: create=$mc%.2fs agg=$ma%.2fs | " +
      f"pinned: create=$pc%.2fs agg=$pa%.2fs")
  }

  def compact10(spark: SparkSession, srcDir: String): Unit = {
    // 10× events, fragmented like the q173 auto-ingest sink (24 writer
    // tasks per partition), then bin-packed to 4 MiB targets
    val frag = Staging.ensure("target/graft-probe/frag10x") { tmp =>
      val base = Tables.load(spark, srcDir, "events")
      (0 until 10).map(i => base
          .withColumn("event_id", col("event_id") + lit(i * 10000000L))
          .withColumn("user_id", col("user_id") + lit(i * 10000000L)))
        .reduce(_.unionByName(_))
        .repartition(24)
        .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
    }
    val (r, wall) = time(Compaction.binPack(spark, frag,
      "target/graft-probe/packed10x", Seq("event_type"), Seq("user_id", "ts"),
      targetBytes = 4L << 20))
    println(s"[probe] compact10x: wall=${"%.2f".format(wall)}s $r packed=${r.packed}")
  }

  /** q176's restart contract as a function of RESIDENT STATE SIZE: a
    * dedup-state stream (same shape as q176 — file source, watermark
    * dedup, file sink, AvailableNow) checkpoints K distinct keys in run
    * 1; run 2 is a NEW query object resuming the checkpoint to process
    * one small batch. Run 2's wall = query start + offset-log resume +
    * per-partition state RELOAD + one trigger — the part that grows
    * with K is the default HDFS-backed store re-reading its full
    * snapshot, which is the number this probe isolates (both runs pay
    * identical fixed floors). The 100-TB mitigation is q142's
    * transformWithState-on-RocksDB (incremental snapshots, no full
    * reload) plus state partitions sized to keyspace.
    */
  def restart(spark: SparkSession): Unit = {
    import java.nio.file.{Files, Paths}
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevNoData = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      // first element is a JVM/streaming-engine warmup, not printed —
      // the first streaming query in a JVM pays one-time codegen/class
      // load that would otherwise be charged to the smallest K
      Seq(100, 1000, 100000, 1000000).foreach { k =>
        val src = Files.createTempDirectory("graft-probe-restart-src").toString
        val sink = Files.createTempDirectory("graft-probe-restart-sink").toString
        val ckpt = Files.createTempDirectory("graft-probe-restart-ckpt").toString
        def writeBatch(n: Int, keyOffset: Long): Unit =
          spark.range(n).selectExpr(
            s"id + $keyOffset AS user_id",
            "CAST(id % 7 AS STRING) AS event_type",
            "timestamp'2024-06-01 00:00:00' + make_interval(0,0,0,0,0,0,id % 3600) AS ts")
            .coalesce(1).write.mode("append").parquet(src)
        def runOnce(): Double = {
          val in = spark.readStream.schema(spark.read.parquet(src).schema)
            .parquet(src)
            .withWatermark("ts", "2 hours")
            .dropDuplicatesWithinWatermark("user_id", "event_type")
          val (_, w) = time {
            val q = in.writeStream.format("parquet").outputMode("append")
              .option("path", sink).option("checkpointLocation", ckpt)
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            try q.awaitTermination() finally q.stop()
          }
          w
        }
        writeBatch(k, 0L)
        val run1 = runOnce()
        writeBatch(100, k + 1000000L) // arrives while the query is down
        val run2 = runOnce()          // new query object resumes the checkpoint
        val rows = spark.read.parquet(sink).count()
        if (k >= 1000)
          println(f"[probe] restart k=$k run1=$run1%.2fs run2(resume+100rows)=$run2%.2fs rows=$rows")
        Seq(src, sink, ckpt).foreach(d => Staging.deleteRecursively(Paths.get(d)))
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
    }
  }

  /** Per-query coverage price of the streaming block: TRIGGER COUNT
    * (completed micro-batches, no-data passes included — counted by a
    * StreamingQueryListener, the engine's own progress stream) and wall
    * per oracle-checked streaming query, under the exact bench action.
    * SCALING.md's regression gate diffs this table: a query growing
    * >20% wall WITHOUT new triggers is a regression; new triggers are
    * new coverage, priced at the measured floor.
    */
  def streamPrice(spark: SparkSession, srcDir: String): Unit = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val triggers = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val _ = triggers.incrementAndGet()
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    val names = graft.SparkEntry.queries.keys.filter(n =>
      n.contains("_stream") || n.contains("stream_") || n == "q173_copy_stream" ||
        n == "q137_foreachbatch_sink").toSeq.sorted
    spark.streams.addListener(listener)
    try names.foreach { name =>
      // warmup pass: fixture staging + codegen land outside the timed run
      graft.SparkEntry.queries(name)(spark, srcDir)
        .write.format("noop").mode("overwrite").save()
      triggers.set(0)
      val (_, wall) = time(
        graft.SparkEntry.queries(name)(spark, srcDir)
          .write.format("noop").mode("overwrite").save())
      // listener events are async — drain before reading the counter
      Thread.sleep(300)
      println(f"[probe] streamprice $name triggers=${triggers.get()} wall=$wall%.2fs")
    } finally spark.streams.removeListener(listener)
  }

  /** Plan-shape decision for q183: one scan + one k+1-way Expand (all
    * exact NDVs in a single agg) vs k column-pruned single-distinct
    * passes unioned. Columnar scans make the per-column passes read
    * 1/|table| of the bytes each, while the Expand multiplies mapper
    * rows by k+1 before the shuffle — which side wins is an empirical
    * question this probe answers. */
  def statsShape(spark: SparkSession, srcDir: String): Unit = {
    import graft.ops.Stats
    val li = Tables.load(spark, srcDir, "lineitem")
    li.write.format("noop").mode("overwrite").save() // warm FS cache
    def run(label: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val (_, w1) = time(df.write.format("noop").mode("overwrite").save())
      val (_, w2) = time(df.write.format("noop").mode("overwrite").save())
      println(f"[probe] statsshape $label best=${math.min(w1, w2)}%.2fs")
    }
    run("expand-1scan", Stats.columnStats(li, Stats.profiled))
    run("union-percol", Stats.columnStatsUnion(li, Stats.profiled))
  }

  /** Measured BUILD cost of every once-staged maintenance layout whose
    * gate query only times the read (the q107 amortization family):
    * the numbers the "bench charges the read, where's the write?"
    * question is answered with. Each build runs against a scratch copy
    * so published layouts stay untouched. */
  def maintPrice(spark: SparkSession, srcDir: String): Unit = {
    import graft.ops.{Cdc, Lifecycle, Manifest}
    import java.nio.file.Files
    def run(label: String)(body: String => Unit): Unit = {
      val scratch = Files.createTempDirectory("graft-maint-probe").toString
      val (_, w) = time(body(scratch))
      println(f"[probe] maintprice $label build=$w%.2fs")
      Staging.deleteRecursively(java.nio.file.Paths.get(scratch))
    }
    val ev = Tables.load(spark, srcDir, "events")
      .select(col("user_id"), col("event_type"),
        col("value").cast("decimal(18,4)").as("value"), col("ts"))
    run("gdpr_delete(q182)") { d =>
      Lifecycle.gdprDelete(spark, Lifecycle.bucketLayout(spark, srcDir), s"$d/events")
    }
    run("cdc_versions(q186)") { d =>
      val base = Tables.load(spark, srcDir, "events")
        .select("event_id", "user_id", "ts", "value")
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      graft.streaming.Streams.cdcApplyBatch(base.filter(col("ts") < cutTs), d, 0L)
      graft.streaming.Streams.cdcApplyBatch(base.filter(col("ts") >= cutTs), d, 1L)
    }
    run("manifest_commit_2tab(q187)") { d =>
      Manifest.commit(spark, d, Map(
        "user_totals" -> ev.groupBy("user_id")
          .agg(sum("value").as("total_u"), count(lit(1)).as("n_u")),
        "type_totals" -> ev.groupBy("event_type")
          .agg(sum("value").as("total_t"), count(lit(1)).as("n_t"))))
    }
    run("ranged_append_16f(q193)") { d =>
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      Manifest.commitAppendRanged(spark, d, "events_log",
        ev.filter(col("ts") < cutTs), "ts", 8)
      Manifest.commitAppendRanged(spark, d, "events_log",
        ev.filter(col("ts") >= cutTs), "ts", 8)
    }
    run("replicate_price(q209)") { d =>
      // bootstrap vs steady-state sync: the incremental path must pay
      // for the delta, not the table
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      Manifest.commitAppendRanged(spark, s"$d/src", "events_log",
        ev.filter(col("ts") < cutTs), "ts", 8)
      val (full, wFull) = time(Manifest.replicateSnapshot(spark, s"$d/src", s"$d/dst"))
      Manifest.commitAppendRanged(spark, s"$d/src", "events_log",
        ev.filter(col("ts") >= cutTs), "ts", 8)
      val (incr, wIncr) = time(Manifest.replicateSnapshot(spark, s"$d/src", s"$d/dst"))
      val (_, wNoop) = time(Manifest.replicateSnapshot(spark, s"$d/src", s"$d/dst"))
      println(f"[probe] maintprice replicate bootstrap=${full._1}f/$wFull%.2fs " +
        f"incremental=${incr._1}f/$wIncr%.2fs noop=$wNoop%.3fs")
    }
    run("stats_footer_vs_readback") { d =>
      // the round-10 stats-collection swap, measured head-to-head on
      // one published 16-file batch: footer path (what commits pay
      // now) vs the Spark read-back pass it replaced
      val v = Manifest.commitAppendStats(spark, d, "events_log",
        ev, Seq("ts", "user_id"), "ts", 16)
      val files = Manifest.manifestRows(spark, d, v).map(_._2)
      val zone = java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone"))
      val (_, wFooter) = time(graft.ops.FooterStats.tryAll(
        spark.sparkContext.hadoopConfiguration,
        files.map(f => s"$d/$f"), Seq("ts", "user_id"), zone).get)
      val (_, wSpark) = time(Manifest.statsRowsForSpark(
        spark, d, "events_log", files, Seq("ts", "user_id")))
      println(f"[probe] maintprice stats_collect footer=$wFooter%.3fs " +
        f"readback=$wSpark%.3fs files=${files.size}")
    }
    run("mv_build(q191)") { d =>
      Tables.load(spark, srcDir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("sum_v"),
          count(lit(1)).as("n_v"))
        .write.mode("overwrite").parquet(s"$d/mv")
    }
    run("vacuum(q195)") { d =>
      // build the two-version root, then time ONLY the vacuum
      Manifest.commit(spark, d, Map("t" -> ev.limit(1000)))
      Manifest.commit(spark, d, Map("t" -> ev.limit(2000)))
      val (r, w) = time(Manifest.vacuum(spark, d, keep = 1, graceMs = 0L))
      println(f"[probe] maintprice vacuum_only removed=${r._1} live=${r._2} wall=$w%.2fs")
    }
    run("delete_where(q202)") { d =>
      // 16-file ranged table, then time ONLY the stats-pruned delete
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      Manifest.commitAppendRanged(spark, d, "t", ev.filter(col("ts") < cutTs), "ts", 8)
      Manifest.commitAppendRanged(spark, d, "t", ev.filter(col("ts") >= cutTs), "ts", 8)
      val lo = lit("2024-01-10 00:00:00").cast("timestamp")
      val hi = lit("2024-01-13 00:00:00").cast("timestamp")
      val (_, w) = time(Manifest.commitDeleteWhere(spark, d, "t",
        Seq(Manifest.Pred("ts", "2024-01-10 00:00:00", "2024-01-13 00:00:00", "timestamp")),
        col("ts") >= lo && col("ts") < hi))
      println(f"[probe] maintprice delete_where_only wall=$w%.2fs")
    }
    run("merge_upsert(q203)") { d =>
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      def totals(df: org.apache.spark.sql.DataFrame) = df.groupBy("user_id")
        .agg(sum("value").as("total_u"), count(lit(1)).as("n_u"))
      Manifest.commitAppendStats(spark, d, "t",
        totals(ev.filter(col("ts") < cutTs)), Seq("user_id"), "user_id", 8)
      val (_, w) = time(Manifest.commitMergeUpsert(spark, d, "t",
        totals(ev).filter(col("user_id").between(2, 5)), "user_id"))
      println(f"[probe] maintprice merge_upsert_only wall=$w%.2fs")
    }
    run("dv_vs_cow(q214-q216)") { d =>
      // the merge-on-read claim measured head-to-head: DELETE/UPDATE of
      // the same three-day window on identical 16-file tables — the DV
      // path pays O(matched positions)+metadata, the CoW path rewrites
      // the affected files. At 100 TB the gap is the whole point of DVs.
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      def build(sub: String): String = {
        Manifest.commitAppendRanged(spark, s"$d/$sub", "t",
          ev.filter(col("ts") < cutTs), "ts", 8)
        Manifest.commitAppendRanged(spark, s"$d/$sub", "t",
          ev.filter(col("ts") >= cutTs), "ts", 8)
        s"$d/$sub"
      }
      val lo = lit("2024-01-10 00:00:00").cast("timestamp")
      val hi = lit("2024-01-13 00:00:00").cast("timestamp")
      val win = col("ts") >= lo && col("ts") < hi
      val preds = Seq(
        Manifest.Pred("ts", "2024-01-10 00:00:00", "2024-01-13 00:00:00", "timestamp"))
      // At fixture scale wall-clock is all fixed cost; the scale-preserving
      // metric is BYTES WRITTEN by the commit — CoW pays O(affected file
      // bytes), DV pays O(matched-position bitmap). Measure the table dir's
      // data-byte growth across each commit (manifests excluded).
      def dataBytes(root: String): Long = {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(root)
        if (!Files.exists(p)) 0L
        else {
          val s = Files.walk(p)
          try s.iterator().asScala
            .filter(f => Files.isRegularFile(f) &&
              !p.relativize(f).toString.replace('\\', '/').startsWith("manifest/"))
            .map(Files.size).sum
          finally s.close()
        }
      }
      def priced(sub: String)(commit: String => Unit): (Double, Long) = {
        val r = build(sub)
        val before = dataBytes(r)
        val (_, w) = time(commit(r))
        (w, dataBytes(r) - before)
      }
      val (wCowDel, bCowDel) = priced("cowdel")(r =>
        Manifest.commitDeleteWhere(spark, r, "t", preds, win))
      val (wDvDel, bDvDel) = priced("dvdel")(r =>
        Manifest.commitDeleteVectors(spark, r, "t", win))
      val (wCowUpd, bCowUpd) = priced("cowupd")(r =>
        Manifest.commitUpdateWhere(spark, r, "t", preds, win,
          Map("value" -> (col("value") * 2))))
      val (wDvUpd, bDvUpd) = priced("dvupd")(r =>
        Manifest.commitUpdateVectors(spark, r, "t", win,
          Map("value" -> (col("value") * 2))))
      println(f"[probe] maintprice dv_vs_cow delete cow=$wCowDel%.2fs/${bCowDel}B " +
        f"dv=$wDvDel%.2fs/${bDvDel}B update cow=$wCowUpd%.2fs/${bCowUpd}B " +
        f"dv=$wDvUpd%.2fs/${bDvUpd}B")
      // the canonical DV win: a SCATTERED ~0.1%-selectivity delete that
      // no file-level stat can prune — CoW must rewrite every file it
      // touches (≈ the whole table); DV writes a few positions per file
      val rare = pmod(hash(col("user_id"), col("ts"), col("value")), lit(1000)) === 0
      val (wCowSc, bCowSc) = priced("cowscat")(r =>
        Manifest.commitDeleteWhere(spark, r, "t", Seq.empty, rare))
      val (wDvSc, bDvSc) = priced("dvscat")(r =>
        Manifest.commitDeleteVectors(spark, r, "t", rare))
      println(f"[probe] maintprice dv_vs_cow scattered_delete cow=$wCowSc%.2fs/${bCowSc}B " +
        f"dv=$wDvSc%.2fs/${bDvSc}B")
    }
    run("r10ops(q221-q233)") { d =>
      // prices of the session's new table-format ops on one shared
      // 16-file log (+1 DV delete): the metadata ops must be
      // millisecond-class regardless of data volume
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      Manifest.commitAppendRanged(spark, d, "t", ev.filter(col("ts") < cutTs), "ts", 8)
      Manifest.commitAppendRanged(spark, d, "t", ev.filter(col("ts") >= cutTs), "ts", 8)
      Manifest.commitDeleteVectors(spark, d, "t",
        col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-12 00:00:00").cast("timestamp"))
      val (nAll, wCount) = time(Manifest.countRows(spark, d, "t", version = 2L))
      val (_, wTag) = time {
        Manifest.createTag(d, "probe")
        Manifest.readTableTag(spark, d, "t", "probe").count()
      }
      val (_, wRestore) = time(Manifest.commitRestore(spark, d, "t", toVersion = 2L))
      val (nFeed, wFeed) = time(
        Manifest.readChangeFeed(spark, d, "t", fromVersion = 0L).count())
      val (_, wCompact) = time(
        Manifest.compactSmallFiles(spark, d, "t", minBytes = 1L << 30,
          targetBytes = 1L << 30))
      println(f"[probe] maintprice r10ops count=$wCount%.3fs ($nAll rows, " +
        f"metadata-only) tag+read=$wTag%.2fs restore=$wRestore%.2fs " +
        f"feed=$wFeed%.2fs ($nFeed change rows) compact_smalls=$wCompact%.2fs")
    }
    run("dedup_vectors(q220)") { d =>
      val docs = Tables.load(spark, srcDir, "documents")
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      Manifest.commitAppendRanged(spark, d, "documents", corpus, "doc_id", 4)
      val (_, w) = time(Manifest.commitDedupVectors(spark, d, "documents",
        expr("md5(concat_ws(' ', array_sort(split(text, ' '))))"), "doc_id"))
      println(f"[probe] maintprice dedup_vectors_only wall=$w%.2fs")
    }
  }

  /** Contended-commit price of the CAS protocol (round 9): W writer
    * threads race A appends each on ONE root — every manifest claim is
    * a non-replacing rename, losers rebase and retry. Reports total
    * wall, per-commit mean, and proves no lost updates (rows == W*A+1,
    * versions dense). The number to watch at 1000 executors is
    * per-commit METADATA cost (claim + manifest rewrite), which is
    * O(|manifest rows|), not O(data): the data write happens once per
    * commit regardless of contention. */
  def casPrice(spark: SparkSession, writers: Int = 4, appends: Int = 5): Unit = {
    import graft.ops.Manifest
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cas-probe").toString
    Manifest.commitAppend(spark, root, "t", Seq((0L, 0.0)).toDF("k", "v"))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val (_, wall) = time {
      val ts = (1 to writers).map { w =>
        val t = new Thread(() =>
          try (1 to appends).foreach { i =>
            Manifest.commitAppend(spark, root, "t",
              Seq((w * 1000L + i, i * 1.0)).toDF("k", "v"), maxRetries = 256)
          } catch { case e: Throwable => failures.add(e) })
        t.start(); t
      }
      ts.foreach(_.join(300000))
    }
    val n = Manifest.readTable(spark, root, "t").count()
    val v = Manifest.snapshotVersion(root)
    val ok = failures.isEmpty && n == writers * appends + 1 && v == writers * appends + 1
    println(f"[probe] casprice writers=$writers appends=$appends wall=$wall%.2fs " +
      f"per_commit=${wall / (writers * appends)}%.3fs rows=$n version=$v lost_updates=${!ok}")
    Staging.deleteRecursively(java.nio.file.Paths.get(root))
  }

  /** Round-10 guard probe: the LSH candidate stage's wall and pair
    * count as a function of DUPLICATE DENSITY — the axis the round-5
    * probe showed the stage actually pays for (5.7× wall at ~100× true
    * pairs, corpus size flat). A fraction f of docs is rewritten to ONE
    * shared template, so f·N docs share every band bucket; without the
    * [[graft.ops.Text.lshBucketCap]] guard the candidate stage is
    * quadratic in f·N. Reports capped pair count + wall, the audit's
    * skipped counts, and the pair count the UNCAPPED stage would have
    * produced (capped + skipped — exact, since skipped buckets
    * contribute all their pairs). */
  def lshDensity(spark: SparkSession, srcDir: String): Unit = {
    import graft.ops.Text
    val base = Tables.load(spark, srcDir, "documents")
    val template = (1 to 60).map(i => s"boilerplate${i % 17} nav${i % 5}").mkString(" ")
    Seq(0.0, 0.02, 0.2).foreach { f =>
      val docs = base.withColumn("text",
        when(pmod(col("doc_id"), lit(1000)) < lit((f * 1000).toInt), lit(template))
          .otherwise(col("text")))
      val sig = Text.shingleHashSets(docs, "text", Seq("doc_id"))
        .select(col("doc_id") +: Text.mhCols: _*).cache()
      sig.count()
      val (pairs, wall) = time(Text.bandPairs(sig).count())
      val a = Text.lshBucketAudit(sig)
        .agg(sum("n_skipped_buckets"), sum("n_skipped_pairs")).collect()(0)
      // distinct-pair lower bound for the uncapped stage: every skipped
      // bucket's pair set (same docs share ALL bands here, so /3 dedups)
      println(f"[probe] lshdensity dupFrac=$f capped_pairs=$pairs wall=$wall%.2fs " +
        s"skipped_buckets=${a.getLong(0)} skipped_pairs=${a.getLong(1)} " +
        s"uncapped_pairs>=${pairs + a.getLong(1) / 3}")
      sig.unpersist()
    }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/graft-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    val wanted =
      if (args.isEmpty) Seq("dpp1", "dpp30", "mergeschema", "compact10", "restart",
        "streamprice")
      else args.toSeq
    wanted.foreach {
      case "dpp1"        => dpp(spark, srcDir, 1)
      case "dpp30"       => dpp(spark, srcDir, 30)
      case "mergeschema" => mergeSchema(spark, srcDir)
      case "compact10"   => compact10(spark, srcDir)
      case "restart"     => restart(spark)
      case "streamprice" => streamPrice(spark, srcDir)
      case "statsshape"  => statsShape(spark, srcDir)
      case "maintprice"  => maintPrice(spark, srcDir)
      case "casprice"    => casPrice(spark)
      case "lshdensity"  => lshDensity(spark, srcDir)
      case other         => System.err.println(s"[probe] unknown probe: $other")
    }
    spark.stop()
  }
}
