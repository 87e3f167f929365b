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
      })
  )
}
