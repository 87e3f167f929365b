package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture between table snapshots (SURVEY.md §2.7's
  * idempotency story, extended to the general ETL diff): given an old
  * and a new snapshot keyed by `key`, classify every key as
  * insert / delete / update (any tracked column differs) and drop the
  * unchanged majority.
  *
  * Plan shape: ONE full-outer sort-merge join co-shuffled on the key —
  * the same single-shuffle skeleton as the MERGE upsert (q73) — with
  * the unchanged filter applied before anything downstream, so at
  * 100 TB the diff output is proportional to the CHANGE RATE, not the
  * table size. The usual daily-snapshot diff ships <1% of rows past
  * the join.
  */
object Cdc {

  /** Diff two snapshots on `key`; `tracked` are the columns whose
    * change makes a row an 'update'. Returns one row per changed key:
    * (change_type, key, old/new values of each tracked column). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
                   tracked: Seq[String]): DataFrame = {
    val o = oldSnap.select((key +: tracked).map(col): _*).alias("o")
    val n = newSnap.select((key +: tracked).map(col): _*).alias("n")
    val oKey = col(s"o.$key")
    val nKey = col(s"n.$key")
    val changed: Column = tracked
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduce(_ || _)
    o.join(n, oKey === nKey, "full_outer")
      .filter(oKey.isNull || nKey.isNull || changed)
      .select(
        (when(oKey.isNull, "insert")
          .when(nKey.isNull, "delete")
          .otherwise("update")).as("change_type") +:
        coalesce(oKey, nKey).as(key) +:
        tracked.flatMap(c => Seq(
          col(s"o.$c").as(s"old_$c"), col(s"n.$c").as(s"new_$c"))): _*)
  }

  val queries: Seq[Q] = Seq(

    // ----- snapshot diff over simulated consecutive order snapshots:
    //       old = orders before 1997; new adds 1997-H1 rows (inserts),
    //       reprices urgent orders (+10% → updates), and loses keys
    //       divisible by 97 (deletes). The diff must output exactly the
    //       changed keys with old/new values. -----
    Q("q114_snapshot_diff",
      Some("""WITH old AS (
             |  SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
             |  FROM orders WHERE o_orderdate < '1997-01-01'),
             |new AS (
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderpriority = '1-URGENT'
             |         THEN round(o_totalprice, 2) + 1000
             |         ELSE round(o_totalprice, 2) END AS o_totalprice
             |  FROM orders
             |  WHERE o_orderdate < '1997-07-01' AND o_orderkey % 97 <> 0)
             |SELECT CASE WHEN o.o_orderkey IS NULL THEN 'insert'
             |            WHEN n.o_orderkey IS NULL THEN 'delete'
             |            ELSE 'update' END AS change_type,
             |  coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             |  o.o_totalprice AS old_o_totalprice,
             |  n.o_totalprice AS new_o_totalprice
             |FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
             |WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
             |   OR o.o_totalprice <> n.o_totalprice
             |ORDER BY change_type, o_orderkey""".stripMargin),
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
          .withColumn("o_totalprice", round(col("o_totalprice"), 2))
        val oldSnap = orders.filter(col("o_orderdate") < "1997-01-01")
        val newSnap = orders
          .filter(col("o_orderdate") < "1997-07-01" &&
            col("o_orderkey") % 97 =!= 0)
          // the simulated reprice is +1000, not a multiply: IEEE double
          // addition is bit-identical across engines, while round(x*1.1)
          // can land on a .xx5 tie that Spark and DuckDB break differently
          .withColumn("o_totalprice",
            when(col("o_orderpriority") === "1-URGENT",
              col("o_totalprice") + 1000)
              .otherwise(col("o_totalprice")))
        snapshotDiff(oldSnap, newSnap, "o_orderkey", Seq("o_totalprice"))
          .orderBy("change_type", "o_orderkey")
      }),

    // ----- Time travel (AS OF version) on the versioned CDC table:
    //       the MVCC protocol behind q179 (`Streams.cdcApplyBatch`)
    //       keeps every committed version as an immutable `v=N` dir —
    //       this query reads v=0 AFTER v=1 has been committed, i.e. a
    //       historical read concurrent with newer state. Oracle: the
    //       CDC semantics recomputed by DuckDB over only the
    //       first-batch window (ts before the split cut), fully
    //       independent of the versioned build. At scale this is the
    //       audit/debug/reproducible-training read every lakehouse
    //       format sells; retention here = keep the last K version
    //       dirs, and a version read stays O(that version's files). -----
    Q("q186_time_travel",
      Some("""WITH d AS (
             |  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
             |    CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op
             |  FROM events
             |  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'),
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
        val state = versionedState(s, dir)
        s.read.parquet(s"$state/v=0")
          .select(col("user_id"),
            round(col("total_value"), 4).as("total_value"), col("n_ups"))
          .orderBy("user_id")
      })
  )

  /** Batch split point shared with the streaming fixtures (events span
    * 2024-01-01 .. 2024-01-30). */
  val versionCut = "2024-01-16 00:00:00"

  /** Build the two-version CDC table once per fixture: batch 0 = events
    * before the cut, batch 1 = the rest, committed through the same
    * `cdcApplyBatch` MVCC path q179 streams through. Both `v=0` and
    * `v=1` remain readable — that immutability IS the time-travel
    * contract. */
  def versionedState(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-cdc-versions/$fp") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select("event_id", "user_id", "ts", "value")
      val cutTs = lit(versionCut).cast("timestamp")
      graft.streaming.Streams.cdcApplyBatch(ev.filter(col("ts") < cutTs), tmp, 0L)
      graft.streaming.Streams.cdcApplyBatch(ev.filter(col("ts") >= cutTs), tmp, 1L)
    }
  }
}
