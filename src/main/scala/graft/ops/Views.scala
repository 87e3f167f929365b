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
      })
  )
}
