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
      }),

    // ----- DLT-style expectations (q273): the data-quality gate with
    //       a POLICY per rule — warn (count, keep), drop (count,
    //       filter out), fail (count, abort the batch) — plus a
    //       quarantine stream carrying each rejected row's failed
    //       rule names. Distinct from CHECK constraints (hard refusal
    //       at commit): expectations let the batch land while routing
    //       bad rows aside, which is how a 100-TB ingest actually
    //       survives dirty data. Metrics are ONE column-pruned agg
    //       pass. Oracle recomputes every violation count and the
    //       kept total with the same NULL-fails-the-rule semantics. -----
    Q("q273_expectations",
      Some("""SELECT expectation, policy, n FROM (
             |  SELECT 'positive_value' AS expectation, 'drop' AS policy,
             |    CAST(count(*) FILTER (WHERE NOT coalesce(value >= 0.5, false)) AS BIGINT) AS n
             |  FROM events
             |  UNION ALL
             |  SELECT 'user_not_banned', 'drop',
             |    CAST(count(*) FILTER (WHERE NOT coalesce(user_id % 50 != 49, false)) AS BIGINT)
             |  FROM events
             |  UNION ALL
             |  SELECT 'value_in_band', 'warn',
             |    CAST(count(*) FILTER (WHERE NOT coalesce(value < 400.0, false)) AS BIGINT)
             |  FROM events
             |  UNION ALL
             |  SELECT '__kept__', 'rows',
             |    CAST(count(*) FILTER (WHERE coalesce(value >= 0.5, false)
             |      AND coalesce(user_id % 50 != 49, false)) AS BIGINT)
             |  FROM events)
             |ORDER BY expectation""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val ev = Tables.load(s, dir, "events")
        val (kept, _, metrics) = expect(ev, Seq(
          Expectation("positive_value", "value >= 0.5", ExpectDrop),
          Expectation("user_not_banned", "user_id % 50 != 49", ExpectDrop),
          Expectation("value_in_band", "value < 400.0", ExpectWarn)))
        metrics
          .union(Seq(("__kept__", "rows")).toDF("expectation", "policy")
            .withColumn("n", lit(kept.count())))
          .orderBy("expectation")
      })
  )

  // ---------------- DLT-style expectations --------------------------

  sealed trait ExpectPolicy { def label: String }
  case object ExpectWarn extends ExpectPolicy { val label = "warn" }
  case object ExpectDrop extends ExpectPolicy { val label = "drop" }
  case object ExpectFail extends ExpectPolicy { val label = "fail" }
  final case class Expectation(name: String, predicate: String,
                               policy: ExpectPolicy)

  /** Evaluate `exps` over a batch — Delta Live Tables' expectation
    * semantics: every rule is COUNTED; `warn` rules never filter,
    * `drop` rules route failing rows to the quarantine stream, and a
    * violated `fail` rule aborts the batch before anything is
    * returned. A NULL predicate FAILS the rule (the conservative
    * reading a quality gate wants — deliberately unlike CHECK's ANSI
    * NULL-passes, which guards writes, not content).
    *
    * Returns (kept, quarantine, metrics): kept = rows passing every
    * drop/fail rule; quarantine = the complement, each row tagged
    * with its `_failed_expectations` names; metrics = one row per
    * rule (expectation, policy, n). The metrics are ONE column-pruned
    * aggregate pass over the batch; kept/quarantine are lazy filters
    * the caller's own writes will scan (cache the input if both sides
    * land). */
  def expect(df: org.apache.spark.sql.DataFrame, exps: Seq[Expectation])
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    require(exps.nonEmpty, "expect: no expectations given")
    require(exps.map(_.name).distinct.size == exps.size,
      s"expect: duplicate expectation name in ${exps.map(_.name).mkString(",")}")
    val spark = df.sparkSession
    import spark.implicits._
    def pass(e: Expectation) = coalesce(expr(e.predicate), lit(false))
    val aggs = exps.map(e =>
      sum(when(pass(e), 0L).otherwise(1L)).as(e.name))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val counts = exps.zipWithIndex.map { case (e, i) =>
      (e, if (row.isNullAt(i)) 0L else row.getLong(i)) }
    val failed = counts.collect {
      case (e, n) if e.policy == ExpectFail && n > 0 => s"${e.name} ($n rows)" }
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"expectation failure aborts the batch: ${failed.mkString("; ")}")
    val metrics = counts.map { case (e, n) => (e.name, e.policy.label, n) }
      .toDF("expectation", "policy", "n")
    val gating = exps.filterNot(_.policy == ExpectWarn)
    val keepCond = gating.map(pass).reduceOption(_ && _).getOrElse(lit(true))
    val kept = df.filter(keepCond)
    val quarantine =
      if (gating.isEmpty) df.filter(lit(false))
        .withColumn("_failed_expectations", array().cast("array<string>"))
      else df.filter(!keepCond).withColumn("_failed_expectations",
        array_compact(array(gating.map(e =>
          when(!pass(e), lit(e.name))): _*)))
    (kept, quarantine, metrics)
  }
}
