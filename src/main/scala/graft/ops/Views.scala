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
      })
  )
}
