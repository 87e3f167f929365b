package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline data-quality auditing (SURVEY.md §2.7 operational
  * semantics): `observe()` metrics that piggyback on an action the
  * pipeline already runs.
  *
  * At 100 TB the difference between `observe()` and a separate audit
  * query is an entire extra scan of the table: observe attaches
  * aggregate accumulators to the EXISTING pass (here a `noop`-sink
  * write standing in for the real production write), so row counts,
  * null rates, and business-rule violations are collected for free and
  * read on the driver after the action completes.
  */
object Quality {

  /** PUBLIC audited write: run `df`'s write action with the given
    * aggregate metrics observed ON that same pass (no second scan) and
    * return the collected metrics. `sink` defaults to the noop format —
    * substitute the real writer in production. */
  def auditedWrite(df: org.apache.spark.sql.DataFrame,
                   metrics: Seq[org.apache.spark.sql.Column],
                   sink: org.apache.spark.sql.DataFrame => Unit =
                     _.write.format("noop").mode("overwrite").save()): Map[String, Any] = {
    require(metrics.nonEmpty, "auditedWrite needs at least one metric column")
    val obs = Observation()
    sink(df.observe(obs, metrics.head, metrics.tail: _*))
    obs.get
  }

  val queries: Seq[Q] = Seq(

    // ----- observed load-audit metrics: the pipeline writes orders to
    //       its sink (noop format — the Spark-native /dev/null used for
    //       exactly this kind of pass-through measurement) and the
    //       audit metrics ride along on that same single scan. The
    //       returned one-row frame is the driver-side metrics record a
    //       real pipeline would append to its load log. Oracle = the
    //       same aggregates as a plain query — observe must change
    //       WHERE the numbers are computed, never the numbers. -----
    Q("q132_observed_metrics",
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(*) FILTER (WHERE o_totalprice > 300000) AS BIGINT) AS n_big,
             |  CAST(count(*) FILTER (WHERE o_orderpriority IS NULL) AS BIGINT) AS null_priority,
             |  round(sum(o_totalprice), 2) AS total_rev
             |FROM orders""".stripMargin),
      (s, dir) => {
        val m = auditedWrite(Tables.load(s, dir, "orders"), Seq(
          count(lit(1)).as("n_rows"),
          count(when(col("o_totalprice") > 300000, 1)).as("n_big"),
          count(when(col("o_orderpriority").isNull, 1)).as("null_priority"),
          round(sum(col("o_totalprice")), 2).as("total_rev")))
        import s.implicits._
        Seq((m("n_rows").asInstanceOf[Long], m("n_big").asInstanceOf[Long],
          m("null_priority").asInstanceOf[Long], m("total_rev").asInstanceOf[Double]))
          .toDF("n_rows", "n_big", "null_priority", "total_rev")
      }),

    // ----- Constraint validation (the dbt-test / informational-
    //       constraint surface): NOT NULL, composite-key UNIQUE, and
    //       FK containment, each evaluated as a violation COUNT so the
    //       report is a tiny relation a scheduler can gate on. The
    //       fixture makes the report non-vacuous: lineitem's
    //       (l_orderkey, l_linenumber) is genuinely non-unique while
    //       the FK and NOT NULL checks pass — a validator that only
    //       ever sees zeros proves nothing. Plan shapes: NOT NULL =
    //       one scan of the checked columns; UNIQUE = keyed groupBy
    //       with map-side partials, violations = Σ(cnt−1) over
    //       duplicate groups; FK = left-anti join, broadcast when the
    //       parent side is dimension-sized. -----
    Q("q185_constraint_check",
      Some("""SELECT constraint_name, n_violations, passed FROM (
             |  SELECT 'lineitem.l_orderkey.not_null' AS constraint_name,
             |    CAST(count(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT)
             |      AS n_violations,
             |    count(*) FILTER (WHERE l_orderkey IS NULL) = 0 AS passed
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'lineitem.pk.unique',
             |    CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
             |      AS BIGINT),
             |    count(*) = count(DISTINCT (l_orderkey, l_linenumber))
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'lineitem.l_orderkey.fk_orders',
             |    CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT),
             |    count(*) FILTER (WHERE o_orderkey IS NULL) = 0
             |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)
             |ORDER BY constraint_name""".stripMargin),
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val orders = Tables.load(s, dir, "orders")
        val notNull = li.agg(
          lit("lineitem.l_orderkey.not_null").as("constraint_name"),
          sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("n_violations"))
        val unique = li.groupBy("l_orderkey", "l_linenumber")
          .agg(count(lit(1)).as("cnt"))
          .agg(lit("lineitem.pk.unique").as("constraint_name"),
            coalesce(sum(when(col("cnt") > 1, col("cnt") - 1L)), lit(0L))
              .as("n_violations"))
        val fk = li.select("l_orderkey")
          .join(orders.select(col("o_orderkey").as("l_orderkey")),
            Seq("l_orderkey"), "left_anti")
          .agg(lit("lineitem.l_orderkey.fk_orders").as("constraint_name"),
            count(lit(1)).as("n_violations"))
        notNull.unionByName(unique).unionByName(fk)
          .withColumn("passed", col("n_violations") === 0L)
          .orderBy("constraint_name")
      })
  )
}
