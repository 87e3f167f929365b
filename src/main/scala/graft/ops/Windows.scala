package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Event-time windowing over `events` (SURVEY.md §2.8) plus the as-of
  * join (§2.5). All four are written batch-first: the identical
  * DataFrame expressions run under Structured Streaming (`readStream`
  * source + watermark — see `graft.streaming.Streams` and its spec);
  * the batch path is what the DuckDB oracle checks.
  *
  * Oracle parity notes:
  *  - Spark's tumbling windows are epoch-aligned, so `window(ts, '1
  *    hour').start ≡ date_trunc('hour', ts)`;
  *  - sliding windows (1h size, 15m slide) put each event in exactly 4
  *    windows whose starts are the event's 15-minute bucket minus
  *    0..3 slides — expressed in DuckDB with `time_bucket` + unnest;
  *  - session windows: Spark MERGES touching windows — an event at
  *    exactly `prev + gap` extends the session (verified empirically:
  *    events at 00:00 and 00:30 with a 30m gap form ONE session), so
  *    the gaps-and-islands oracle starts a new session only when the
  *    gap is strictly `> INTERVAL 30 MINUTE`; session end = last
  *    event + gap;
  *  - as-of: clicks are deduped per (user_id, ts) keeping the max
  *    event_id so "latest click at or before the purchase" is unique;
  *    DuckDB checks it with a native ASOF LEFT JOIN, Spark computes it
  *    with the union + last(ignoreNulls) running-state trick — one
  *    shuffle by user_id, no range join blowup, streaming-friendly.
  */
object Windows {

  /** THE gap-based sessionization oracle (30m inactivity per user) —
    * shared verbatim by batch q53 and streaming-execution q154 so the
    * two gates can never drift onto different session definitions. */
  private[graft] val duckSessionOracle: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |m AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), g AS (
      |  SELECT user_id, ts,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM m)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM g GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** THE as-of join oracle family (each purchase ↔ the closest click in
    * `ineq`'s direction, per user; click ties at equal ts resolve to
    * max event_id). One builder parameterized by the inequality
    * direction and an optional freshness predicate applied to the
    * matched row — shared by the composed form (q54) and every custom-
    * operator variant (q159 backward, q168 tolerance, q169 forward) so
    * all implementations answer to one definition. */
  private[graft] def duckAsofOracleVariant(ineq: String,
                                           fresh: Option[String]): String = {
    def guard(expr: String): String =
      fresh.fold(expr)(p => s"CASE WHEN $p THEN $expr END")
    s"""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events),
       |c AS (
       |  SELECT user_id, ts, event_id, value FROM (
       |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
       |    FROM e WHERE event_type = 'click') WHERE rn = 1
       |), p AS (SELECT user_id, event_id, ts FROM e WHERE event_type = 'purchase')
       |SELECT p.user_id, p.event_id AS p_event_id, p.ts AS p_ts,
       |  ${guard("c.ts")} AS click_ts, ${guard("c.event_id")} AS click_event_id,
       |  ${guard("round(c.value, 4)")} AS click_value
       |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts $ineq c.ts
       |ORDER BY p.user_id, p_ts, p_event_id""".stripMargin
  }

  private[graft] val duckAsofOracle: String = duckAsofOracleVariant(">=", None)

  /** Shared Spark side of the as-of family: tie-deduped clicks ⋈
    * purchases through the custom operator, with the q54-identical
    * output shape. */
  private def asofCustom(s: org.apache.spark.sql.SparkSession, dir: String,
                         tolerance: Option[java.time.Duration],
                         direction: String): org.apache.spark.sql.DataFrame = {
    // equal-ts clicks resolve inside the operator (tieBreak = max
    // event_id wins) — no pre-dedup window, so the clicks side costs
    // one exchange+sort instead of two exchanges + sort + window
    val clicks = Tables.load(s, dir, "events")
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_event_id"), col("value").as("c_value"))
    val purchases = Tables.load(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"), col("ts").as("p_ts"))
    graft.plans.AsOfJoinApi
      .asofJoin(purchases, clicks, "user_id", "c_user", "p_ts", "c_ts",
        tolerance, direction, tieBreak = Seq("click_event_id"))
      .select(col("user_id"), col("p_event_id"), col("p_ts"),
        col("c_ts").as("click_ts"), col("click_event_id"),
        round(col("c_value"), 4).as("click_value"))
      .orderBy("user_id", "p_ts", "p_event_id")
  }

  val queries: Seq[Q] = Seq(

    // ----- tumbling 1h window agg -----
    Q("q51_tumbling_window",
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
             |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
             |FROM events
             |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
          .select(col("window.start").as("window_start"), col("event_type"),
            col("n"), col("total"))
          .orderBy("window_start", "event_type")),

    // ----- sliding window: 1h size / 15m slide -----
    Q("q52_sliding_window",
      Some("""SELECT ws AS window_start, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
             |FROM (
             |  SELECT time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
             |           - k * INTERVAL 15 MINUTE AS ws, value
             |  FROM events, unnest([0,1,2,3]) AS t(k))
             |GROUP BY ws ORDER BY ws""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "15 minutes"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
          .select(col("window.start").as("window_start"), col("n"), col("total"))
          .orderBy("window_start")),

    // ----- session window: 30m inactivity gap per user -----
    Q("q53_session_window",
      Some(Windows.duckSessionOracle),
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"), col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"), col("n_events"))
          .orderBy("user_id", "session_start")),

    // ----- as-of join: each purchase ↔ latest click at or before it -----
    Q("q54_asof_join",
      Some(Windows.duckAsofOracle),
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), lit(0).as("tag"), col("event_id"),
            struct(col("ts").as("click_ts"), col("event_id").as("click_event_id"),
              col("value").as("click_value")).as("click"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("tag"), col("event_id"),
            lit(null).cast(clicks.schema("click").dataType).as("click"))
        // running latest-click state per user: order clicks before
        // purchases at equal ts (tag), max event_id wins among equal-ts
        // clicks (event_id last in order)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("tag"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        clicks.unionByName(purchases)
          .withColumn("last_click", last(col("click"), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("user_id"), col("event_id").as("p_event_id"), col("ts").as("p_ts"),
            col("last_click.click_ts").as("click_ts"),
            col("last_click.click_event_id").as("click_event_id"),
            round(col("last_click.click_value"), 4).as("click_value"))
          .orderBy("user_id", "p_ts", "p_event_id")
      }),

    // ----- JSON event parsing: from_json on events.props (schema
    //       STRUCT<k INT>, FIXTURES.md §A) → typed field, aggregated.
    //       Row-local parse (codegen'd JacksonParser), then one keyed
    //       agg — the standard semi-structured ingestion shape. -----
    Q("q57_events_json",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
             |  CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
             |  CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k_path
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "events")
          // both JSON access paths: schema-full from_json and
          // path-extraction get_json_object (SURVEY §2.4 JSON row)
          .withColumn("k", from_json(col("props"), lit("STRUCT<k: INT>")).getField("k"))
          .withColumn("k_path", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"),
            sum(col("k_path")).as("sum_k_path"))
          .orderBy("event_type")),

    // ----- VARIANT (Spark 4 semi-structured type): parse_json once into
    //       the binary variant encoding, extract typed fields with
    //       variant_get. At scale this is the schema-flexible ingestion
    //       path — the variant column shreds/prunes without a declared
    //       schema, vs from_json's fixed StructType (q57). Oracle uses
    //       plain JSON extraction: the access path differs, values must
    //       not. -----
    Q("q81_variant_json",
      Some("""SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) % 10 AS INT) AS k_mod,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
             |  round(sum(value), 4) AS total
             |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "events")
          .withColumn("v", parse_json(col("props")))
          .select(expr("variant_get(v, '$.k', 'int')").as("k"), col("value"))
          .groupBy(expr("cast(k % 10 as int)").as("k_mod"))
          .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"),
            round(sum(col("value")), 4).as("total"))
          .orderBy("k_mod")),

    // ----- forward fill (last-observation-carried-forward) via
    //       IGNORE NULLS: sparse readings ('view' rows masked to NULL
    //       here) filled from each user's latest non-null value in
    //       event-time order — the telemetry/feature-store gap-fill
    //       primitive. One per-user window, (ts, event_id) total order
    //       for determinism; leading NULLs (no prior reading) stay
    //       NULL, and the oracle hashes them too. -----
    Q("q156_forward_fill",
      Some("""SELECT event_id, user_id,
             |  round(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS filled
             |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             |        CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
             |      FROM events)
             |ORDER BY event_id""".stripMargin),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Long.MinValue, 0)
        Tables.load(s, dir, "events")
          .withColumn("v", when(col("event_type") === "view", lit(null)).otherwise(col("value")))
          .withColumn("filled", round(last(col("v"), ignoreNulls = true).over(w), 4))
          .select("event_id", "user_id", "filled")
          .orderBy("event_id")
      }),

    // ----- as-of join through the CUSTOM PHYSICAL OPERATOR
    //       (`plans.AsOfJoinExec` — extension tier c: LogicalPlan +
    //       Strategy + SparkPlan): same semantics and SAME oracle as
    //       the composed q54, but executed as one co-partitioned
    //       forward merge per partition — O(|L|+|R|), no range-join
    //       candidate amplification and no tagged-union window state.
    //       The click side pre-dedups ties (one row per (user, ts),
    //       max event_id) so the merge's last-in-order winner is
    //       deterministic; both sides come from independent reads so
    //       the self-join lineages stay distinct. -----
    // ----- as-of join with a STALENESS TOLERANCE (pandas merge_asof
    //       semantics) through the same custom operator: the match is
    //       still the latest click at-or-before the purchase, but a
    //       match older than 10 minutes null-pads — "latest reading,
    //       but only if fresh", the feature-store/risk-check shape.
    //       Oracle: the shared ASOF join with the staleness test
    //       applied to the matched row (NOT a range join — an older
    //       in-window click must NOT be substituted). -----
    Q("q168_asof_tolerance",
      Some(Windows.duckAsofOracleVariant(">=",
        fresh = Some("c.ts >= p.ts - INTERVAL 10 MINUTE"))),
      (s, dir) => Windows.asofCustom(s, dir,
        tolerance = Some(java.time.Duration.ofMinutes(10)), direction = "backward")),

    // ----- FORWARD as-of through the custom operator: each purchase ↔
    //       the EARLIEST click at-or-after it (post-purchase behavior
    //       attribution — "did the user come back?"). Same merge exec,
    //       opposite frontier: the candidate right row is parked, never
    //       consumed, because one click can be the next-event of many
    //       purchases. DuckDB's ASOF follows the inequality direction,
    //       so the oracle is the same shared shape with `<=`. -----
    Q("q169_asof_forward",
      Some(Windows.duckAsofOracleVariant("<=", fresh = None)),
      (s, dir) => Windows.asofCustom(s, dir, tolerance = None, direction = "forward")),

    Q("q159_asof_custom",
      Some(Windows.duckAsofOracle),
      (s, dir) => Windows.asofCustom(s, dir, tolerance = None, direction = "backward"))
  )
}
