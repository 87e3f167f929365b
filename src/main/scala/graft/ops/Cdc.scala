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
      })
  )
}
