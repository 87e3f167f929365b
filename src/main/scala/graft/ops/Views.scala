package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized-view answering — the summary-table routing every
  * warehouse sells: persist a fine-grained aggregate once, answer
  * coarser rollups from it instead of the raw table.
  *
  * What makes the routing VALID is algebra, not faith: only algebraic
  * aggregates (sum-of-sums, count-of-counts, min-of-mins) re-aggregate
  * correctly, and non-algebraic ones must be decomposed — avg is
  * carried as (sum, count) in the MV and re-derived at query time,
  * never averaged-over-averages. q191's oracle recomputes the monthly
  * rollup from the RAW table, so a wrong decomposition, a stale MV, or
  * a lossy day boundary all break the hash.
  *
  * Scale: the MV is |users × days| rows against |events| raw — at
  * 100 TB that is the difference between scanning a summary in the MBs
  * and rescanning the lake; MV maintenance composes with the
  * incremental re-aggregation shape (q112) and the manifest append
  * commit (q189) for exactly-once daily refresh.
  */
object Views {

  /** The daily MV: exact decimal sums + counts per (user, day) —
    * everything a monthly/weekly/lifetime rollup needs, staged once per
    * fixture version. */
  def dailyUserMv(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-mv/daily_$fp") { tmp =>
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("sum_v"),
          count(lit(1)).as("n_v"))
        .write.mode("overwrite").parquet(s"$tmp/mv")
    } + "/mv"
  }

  /** Incremental MV refresh: fold a DELTA window into an existing MV
    * without touching raw history — union the delta's day-partials with
    * the MV and re-aggregate by key, summing sums and counts (boundary
    * days merge instead of duplicating). Refresh cost is O(delta +
    * |MV|), never O(history); with the manifest append commit this is
    * the exactly-once daily-refresh loop. */
  def refreshDaily(mv: DataFrame, delta: DataFrame): DataFrame =
    mv.unionByName(
        delta.groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(sum(col("value").cast("decimal(18,4)")).as("sum_v"),
            count(lit(1)).as("n_v")))
      .groupBy("user_id", "day")
      .agg(sum("sum_v").as("sum_v"), sum("n_v").as("n_v"))

  /** q194's refresh cut — deliberately MIDDAY, so the boundary day
    * exists in both the MV and the delta and the merge path (sum of
    * partial-day sums) is genuinely exercised, not vacuously green. */
  val refreshCut = "2024-01-16 12:00:00"

  /** The pre-cut daily MV — q194's starting state, staged once. */
  def dailyUserMvPre(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-mv/daily_pre_$fp") { tmp =>
      Tables.load(s, dir, "events")
        .filter(col("ts") < lit(refreshCut).cast("timestamp"))
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("sum_v"),
          count(lit(1)).as("n_v"))
        .write.mode("overwrite").parquet(s"$tmp/mv")
    } + "/mv"
  }

  /** Exactly-once incremental AGGREGATE maintenance over the commit
    * log's change feed: maintain `dstTable` (in `dstRoot`'s log) as
    * the grouped aggregate of `srcTable`, advancing one source-log
    * interval per call. `partial` maps raw rows to key-partial rows
    * (groupBy keys → algebraic partials: sums, counts); `merge`
    * re-aggregates the union of the current MV and the delta's
    * partials by the same keys. A pure-append interval folds in
    * O(delta + |MV|) — history is never rescanned; an interval
    * containing a REWRITE (DELETE / compaction / MERGE) full-refreshes
    * instead, because algebraic partials don't subtract. The applied
    * source version rides the destination's txn ledger, so a
    * re-driven refresh is a no-op and racing drivers resolve to
    * exactly one application — [[Manifest.consumeInto]]'s contract,
    * lifted from row-local transforms to algebraic aggregates.
    * Returns (applied src version, dst version, folded incrementally)
    * or None when the ledger is already current. */
  def refreshAggInto(s: SparkSession, srcRoot: String, srcTable: String,
                     dstRoot: String, dstTable: String, appId: String)(
      partial: DataFrame => DataFrame)(
      merge: (DataFrame, DataFrame) => DataFrame): Option[(Long, Long, Boolean)] = {
    val from = Manifest.lastCommittedTxn(dstRoot, appId).getOrElse(0L)
    val to = Manifest.snapshotVersion(srcRoot)
    require(from <= to,
      s"MV ledger at v$from but source only at v$to: " +
        "the source log was reset under the view — re-bootstrap")
    if (to == from) return None
    val (delta, pure) = Manifest.tableChanges(s, srcRoot, srcTable, from, to)
    try {
      val next =
        if (pure && from > 0)
          merge(Manifest.readTable(s, dstRoot, dstTable), partial(delta))
        else partial(Manifest.readTable(s, srcRoot, srcTable, to)) // pinned:
          // the ledger records `to`; an unpinned read would absorb a
          // concurrent commit and replay it next sync
      val dstV = Manifest.commitReplace(s, dstRoot, dstTable, next,
        txn = Some(appId -> to))
      Some((to, dstV, pure && from > 0))
    } catch {
      case _: Manifest.TxnAlreadyCommitted => None // racing refresh won
    }
  }

  /** ROW-LEVEL incremental view maintenance: fold ANY source interval
    * — appends, DV deletes, updates, even compactions — into a
    * (sum, count) MV through the row-level change feed, O(changed
    * rows + |MV|) always. This is the counting algorithm of classic
    * IVM: an insert weighs +1, a delete −1, an UPDATE is its
    * delete+insert pair (the pre-image cancels, the post-image
    * lands), a compaction's relocate pairs cancel outright, and a
    * group whose count reaches zero drops out of the view. Where
    * [[refreshAggInto]] (file-granular) must FULL-refresh any rewrite
    * interval, this path stays incremental through them — at 100 TB
    * that is the difference between touching the delta and rescanning
    * the lake because one DELETE landed.
    *
    * `prep` receives the signed feed (row columns plus `_w` = ±1) and
    * must return (key columns..., `v`, `_w`); the maintained view is
    * per-key (`sumAlias` = Σ v·w, `cntAlias` = Σ w) — the STORED
    * column names are the caller's declared aliases (a mview's
    * `SUM(v) AS total_v` must serve `total_v`, not an internal name),
    * defaulting to the classic `sum_v`/`n_v`. Exactly-once via the
    * destination txn ledger, like every consumer. Returns
    * (sourceVersion, dstVersion), or None when already current. */
  def refreshAggFromFeed(s: SparkSession, srcRoot: String, srcTable: String,
                         dstRoot: String, dstTable: String, appId: String,
                         keyCols: Seq[String], sumAlias: String = "sum_v",
                         cntAlias: String = "n_v")(
      prep: DataFrame => DataFrame): Option[(Long, Long)] = {
    require(sumAlias != cntAlias && !keyCols.contains(sumAlias) &&
      !keyCols.contains(cntAlias),
      s"refreshAggFromFeed: aliases ($sumAlias, $cntAlias) must be " +
        s"distinct from each other and from the keys (${keyCols.mkString(",")})")
    val from = Manifest.lastCommittedTxn(dstRoot, appId).getOrElse(0L)
    val to = Manifest.snapshotVersion(srcRoot)
    require(from <= to,
      s"MV ledger at v$from but source only at v$to: " +
        "the source log was reset under the view — re-bootstrap")
    if (to == from) return None
    val signed = Manifest.readChangeFeed(s, srcRoot, srcTable, from, to)
      .withColumn("_w",
        when(col("_change_type") === "insert", 1L).otherwise(-1L))
    val keyed = prep(signed)
    val delta = keyed.groupBy(keyCols.map(col): _*)
      .agg(sum(col("v") * col("_w")).as(sumAlias), sum(col("_w")).as(cntAlias))
    val next = (if (from > 0)
        Manifest.readTable(s, dstRoot, dstTable).unionByName(delta)
      else delta)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(sumAlias).as(sumAlias), sum(cntAlias).as(cntAlias))
      .filter(col(cntAlias) > 0)
    try {
      val dstV = Manifest.commitReplace(s, dstRoot, dstTable, next,
        txn = Some(appId -> to))
      Some((to, dstV))
    } catch {
      case _: Manifest.TxnAlreadyCommitted => None // racing refresh won
    }
  }

  /** q217's MV-over-the-log pair: `src/` takes three ranged appends
    * and one stats-pruned DELETE; after each commit one
    * [[refreshAggInto]] advances `dst/`'s per-(user, day) MV — the
    * appends fold incrementally (the staging asserts it), the delete
    * forces the full-refresh path, and a final re-driven refresh is a
    * ledger no-op. */
  def mvLogRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-mv-log/$fp") { tmp =>
      val src = s"$tmp/src"; val dst = s"$tmp/dst"
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("value").cast("decimal(18,4)").as("value"),
          col("ts"))
      def refresh() = refreshAggInto(s, src, "events_log", dst, "mv_user_day",
        "mv-refresh")(
        _.groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(sum("value").cast("decimal(28,4)").as("sum_v"),
            count(lit(1)).as("n_v")))(
        (mv, p) => mv.unionByName(p).groupBy("user_id", "day")
          .agg(sum("sum_v").cast("decimal(28,4)").as("sum_v"),
            sum("n_v").as("n_v")))
      val c1 = lit("2024-01-08 00:00:00").cast("timestamp")
      val c2 = lit("2024-01-16 00:00:00").cast("timestamp")
      Manifest.commitAppendRanged(s, src, "events_log",
        ev.filter(col("ts") < c1), "ts", 4)
      val r1 = refresh() // bootstrap: full build
      require(r1.exists(!_._3), s"staging bug: bootstrap read as a fold: $r1")
      Manifest.commitAppendRanged(s, src, "events_log",
        ev.filter(col("ts") >= c1 && col("ts") < c2), "ts", 4)
      val r2 = refresh()
      require(r2.exists(_._3), s"staging bug: append interval did not fold: $r2")
      Manifest.commitAppendRanged(s, src, "events_log",
        ev.filter(col("ts") >= c2), "ts", 4)
      val r3 = refresh()
      require(r3.exists(_._3), s"staging bug: append interval did not fold: $r3")
      val _ = Manifest.commitDeleteWhere(s, src, "events_log",
        Seq(Manifest.Pred("ts", "2024-01-06 00:00:00", "2024-01-09 00:00:00",
          "timestamp")),
        col("ts") >= lit("2024-01-06 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-09 00:00:00").cast("timestamp"))
      val r4 = refresh() // rewrite interval: full refresh, not a fold
      require(r4.exists(!_._3), s"staging bug: rewrite interval folded: $r4")
      require(refresh().isEmpty, "staging bug: re-driven refresh not a no-op")
    }
  }

  /** q277's row-level IVM pair: `src/` takes a build append, then an
    * append + DV DELETE + DV UPDATE stretch; the MV refreshes through
    * the ROW-LEVEL feed after the build and ONCE across the whole
    * rewrite stretch — the interval a file-granular consumer must
    * full-refresh, folded here as O(changed rows). A third refresh is
    * a ledger no-op (staging asserts all three). */
  def mvFeedRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-mv-feed/$fp-${Manifest.layoutKey}") { tmp =>
      val src = s"$tmp/src"
      val dst = s"$tmp/dst"
      val ev = Tables.load(s, dir, "events").select(col("user_id"),
        col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      def refresh() = refreshAggFromFeed(s, src, "events_log",
        dst, "mv_user_day", "mv-feed", Seq("user_id", "day"))(f =>
        f.select(col("user_id"), to_date(col("ts")).as("day"),
          col("value").as("v"), col("_w")))
      Manifest.commitAppendRanged(s, src, "events_log",
        ev.filter(col("ts") < cut), "ts", 2)
      require(refresh().isDefined, "staging bug: build refresh was a no-op")
      Manifest.commitAppendRanged(s, src, "events_log",
        ev.filter(col("ts") >= cut), "ts", 2)
      Manifest.commitDeleteVectors(s, src, "events_log",
        expr("value < 1.0"))
      Manifest.commitUpdateVectors(s, src, "events_log",
        expr("user_id % 10 = 3"),
        Map("value" -> expr("CAST(value + 7.5 AS DECIMAL(18,4))")))
      require(refresh().isDefined,
        "staging bug: the rewrite-stretch refresh was a no-op")
      require(refresh().isEmpty, "staging bug: ledger should be current")
    }
  }

  val queries: Seq[Q] = Seq(

    Q("q191_mv_rollup",
      Some("""SELECT user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m') AS month,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v,
             |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
             |    / count(*), 4) AS avg_v
             |FROM events GROUP BY 1, 2 ORDER BY user_id, month""".stripMargin),
      (s, dir) => {
        val mv = s.read.parquet(dailyUserMv(s, dir))
        mv.groupBy(col("user_id"),
            date_format(col("day"), "yyyy-MM").as("month"))
          .agg(sum("n_v").as("n_events"),               // count-of-counts
            sum("sum_v").cast("double").as("total_v"))  // sum-of-sums
          .withColumn("avg_v",                          // avg from sums, never avg-of-avgs
            round(col("total_v") / col("n_events"), 4))
          .orderBy("user_id", "month")
      }),

    // ----- Incremental refresh: the staged pre-cut MV plus the
    //       post-cut DELTA must reproduce, key for key, the daily MV a
    //       full rebuild over all history would produce — which is
    //       exactly what the oracle computes from the raw table. A
    //       boundary-day double-count, a missed delta key, or a
    //       non-algebraic merge all break the hash. Refresh reads the
    //       MV and the delta only, never history. -----
    Q("q194_mv_incremental_refresh",
      Some("""SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v,
             |  CAST(count(*) AS BIGINT) AS n_v
             |FROM events GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin),
      (s, dir) => {
        val mv = s.read.parquet(dailyUserMvPre(s, dir))
        val delta = Tables.load(s, dir, "events")
          .filter(col("ts") >= lit(refreshCut).cast("timestamp"))
        refreshDaily(mv, delta)
          .select(col("user_id"), col("day"),
            col("sum_v").cast("double").as("sum_v"), col("n_v"))
          .orderBy("user_id", "day")
      }),

    // ----- MV maintenance over the commit log (q217): the per-(user,
    //       day) MV is advanced by one refreshAggInto per source
    //       commit — three appends fold incrementally (O(delta+|MV|),
    //       history never rescanned; the staging asserts the fold
    //       actually took the incremental path), a DELETE forces the
    //       full-refresh fallback, and the txn ledger makes a
    //       re-driven refresh a no-op. The oracle recomputes the
    //       final per-key aggregate from the raw table minus the
    //       deleted window: a boundary-day double-count, a missed
    //       delta, a stale ledger, or a fold across the rewrite all
    //       break the hash. -----
    Q("q217_mv_log_refresh",
      Some("""SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v,
             |  CAST(count(*) AS BIGINT) AS n_v
             |FROM events
             |WHERE NOT (CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-06 00:00:00'
             |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-09 00:00:00')
             |GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin),
      (s, dir) => {
        val root = mvLogRoot(s, dir)
        Manifest.readTable(s, s"$root/dst", "mv_user_day")
          .select(col("user_id"), col("day"),
            col("sum_v").cast("double").as("sum_v"), col("n_v"))
          .orderBy("user_id", "day")
      }),

    // ----- row-level IVM (q277): the MV maintained through the
    //       CHANGE FEED with counting-algorithm algebra — insert +1,
    //       delete −1, an UPDATE's pair nets to its correction, a
    //       zero-count group vanishes. The maintained interval spans
    //       an append + DV DELETE + DV UPDATE: exactly the rewrite
    //       stretch the file-granular q217 path must full-refresh,
    //       folded here as O(changed rows). Oracle recomputes the
    //       post-everything per-user rollup from raw events — a
    //       pre-image that failed to cancel, a vanished group that
    //       lingers, or a day split error all shift the rollup. -----
    Q("q277_mv_feed_refresh",
      Some("""WITH e AS (SELECT user_id,
             |    CAST(value AS DECIMAL(18,4)) AS v,
             |    CAST(ts AS TIMESTAMP) AS ts FROM events),
             |t AS (SELECT user_id, CAST(ts AS DATE) AS day,
             |    CASE WHEN user_id % 10 = 3 THEN CAST(v + 7.5 AS DECIMAL(18,4))
             |         ELSE v END AS v
             |  FROM e WHERE NOT (v < 1.0))
             |SELECT user_id, CAST(count(DISTINCT day) AS BIGINT) AS n_days,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(v) AS DOUBLE) AS total_v
             |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = mvFeedRoot(s, dir)
        Manifest.readTable(s, s"$root/dst", "mv_user_day")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_days"), sum("n_v").as("n_events"),
            sum("sum_v").cast("double").as("total_v"))
          .orderBy("user_id")
      })
  )
}
