package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event analytics over the `events` stream-shaped fixture: ordered
  * funnels and cohort retention — the queries a product-analytics user
  * of the reference's warehouse runs daily.
  *
  * Both are built to hold at 100 TB of events:
  *  - the funnel is ONE shuffle on user_id (three chained conditional
  *    window minima share the same partitioning — no orderBy, so no
  *    sort — then a global conditional count over one row per event);
  *  - retention is a per-user first-touch aggregate broadcast-joined
  *    back, then a keyed distinct count. Nothing materializes pairs,
  *    and no self-join of the raw event table ever happens.
  */
object Analytics {

  val queries: Seq[Q] = Seq(

    // ----- ordered funnel view → click → purchase: each stage's
    //       timestamp is the MIN event time strictly after the prior
    //       stage, per user; the summary counts users surviving each
    //       stage. The strict ordering is the point — an unordered
    //       "did all three" overcounts users who purchased before ever
    //       viewing. -----
    Q("q118_funnel",
      Some("""WITH s1 AS (SELECT user_id, ts, event_type,
             |    min(CASE WHEN event_type = 'view' THEN ts END)
             |      OVER (PARTITION BY user_id) AS v
             |  FROM events),
             |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > v THEN ts END)
             |    OVER (PARTITION BY user_id) AS c FROM s1),
             |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > c THEN ts END)
             |    OVER (PARTITION BY user_id) AS p FROM s2)
             |SELECT CAST(count(DISTINCT CASE WHEN v IS NOT NULL THEN user_id END) AS BIGINT) AS n_view,
             |  CAST(count(DISTINCT CASE WHEN c IS NOT NULL THEN user_id END) AS BIGINT) AS n_click,
             |  CAST(count(DISTINCT CASE WHEN p IS NOT NULL THEN user_id END) AS BIGINT) AS n_purchase
             |FROM s3""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
        Tables.load(s, dir, "events")
          .withColumn("v",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("c",
            min(when(col("event_type") === "click" && col("ts") > col("v"),
              col("ts"))).over(w))
          .withColumn("p",
            min(when(col("event_type") === "purchase" && col("ts") > col("c"),
              col("ts"))).over(w))
          .agg(
            countDistinct(when(col("v").isNotNull, col("user_id"))).as("n_view"),
            countDistinct(when(col("c").isNotNull, col("user_id"))).as("n_click"),
            countDistinct(when(col("p").isNotNull, col("user_id"))).as("n_purchase"))
      }),

    // ----- weekly cohort retention: cohort = the Monday of a user's
    //       first event; k = whole weeks between the cohort week and an
    //       active week (exact — week-trunc differences are multiples
    //       of 7 days). Output is the classic retention triangle. -----
    Q("q119_cohort_retention",
      Some("""WITH first_touch AS (
             |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
             |  FROM events GROUP BY user_id)
             |SELECT cohort_week,
             |  CAST(date_diff('day', cohort_week, CAST(date_trunc('week', ts) AS DATE)) / 7 AS INT) AS k,
             |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
             |FROM events e JOIN first_touch f ON e.user_id = f.user_id
             |GROUP BY 1, 2
             |ORDER BY cohort_week, k""".stripMargin),
      (s, dir) => {
        val events = Tables.load(s, dir, "events")
        val firstTouch = events.groupBy("user_id")
          .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort_week"))
        // NO broadcast hint: firstTouch is one row per USER — entity
        // cardinality that grows with the corpus, not a bounded
        // dimension. AQE broadcasts it at fixture scale on its own
        // and degrades to a shuffle join when users outgrow the
        // threshold (the q41 sizes-frame discipline).
        events.join(firstTouch, "user_id")
          .withColumn("k",
            (datediff(to_date(date_trunc("week", col("ts"))), col("cohort_week")) / 7)
              .cast("int"))
          .groupBy("cohort_week", "k")
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort_week", "k")
      }),

    // ----- winsorization (outlier capping) per group: clip balances to
    //       each nation's exact [p05, p95]. Tiny per-group stats are
    //       broadcast back onto the fact — the standard two-pass
    //       feature-cleaning shape (stats pass + map-side clip, no
    //       row-vs-row work). Percentile bounds are rounded to 6 digits
    //       BEFORE clipping so both engines clip against bit-identical
    //       thresholds. -----
    Q("q120_winsorize",
      Some("""WITH stats AS (
             |  SELECT c_nationkey,
             |    round(quantile_cont(c_acctbal, 0.05), 6) AS lo,
             |    round(quantile_cont(c_acctbal, 0.95), 6) AS hi
             |  FROM customer GROUP BY c_nationkey)
             |SELECT c.c_nationkey,
             |  round(avg(greatest(least(c_acctbal, hi), lo)), 4) AS avg_clipped,
             |  round(min(greatest(least(c_acctbal, hi), lo)), 4) AS min_clipped,
             |  round(max(greatest(least(c_acctbal, hi), lo)), 4) AS max_clipped
             |FROM customer c JOIN stats s ON c.c_nationkey = s.c_nationkey
             |GROUP BY c.c_nationkey
             |ORDER BY c.c_nationkey""".stripMargin),
      (s, dir) => {
        val customer = Tables.load(s, dir, "customer")
        val stats = customer.groupBy("c_nationkey")
          .agg(round(expr("percentile(c_acctbal, 0.05)"), 6).as("lo"),
            round(expr("percentile(c_acctbal, 0.95)"), 6).as("hi"))
        val clipped = greatest(least(col("c_acctbal"), col("hi")), col("lo"))
        customer.join(broadcast(stats), "c_nationkey")
          .groupBy("c_nationkey")
          .agg(round(avg(clipped), 4).as("avg_clipped"),
            round(min(clipped), 4).as("min_clipped"),
            round(max(clipped), 4).as("max_clipped"))
          .orderBy("c_nationkey")
      }),

    // ----- per-group z-score standardization: document length scaled by
    //       its source's mean/stddev — the feature-normalization step of
    //       an ML data pipeline, same broadcast-stats shape as q120.
    //       Mean/stddev rounded to 6 digits before the map-side formula
    //       so both engines standardize with identical constants. -----
    Q("q121_zscore",
      Some("""WITH stats AS (
             |  SELECT source, round(avg(n_chars), 6) AS mu,
             |    round(stddev_samp(n_chars), 6) AS sigma
             |  FROM documents GROUP BY source)
             |SELECT doc_id, d.source,
             |  round((n_chars - mu) / sigma, 4) AS z
             |FROM documents d JOIN stats s ON d.source = s.source
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val stats = docs.groupBy("source")
          .agg(round(avg(col("n_chars")), 6).as("mu"),
            round(stddev_samp(col("n_chars")), 6).as("sigma"))
        docs.join(broadcast(stats), "source")
          .select(col("doc_id"), col("source"),
            round((col("n_chars") - col("mu")) / col("sigma"), 4).as("z"))
          .orderBy("doc_id")
      }),

    // ----- day-over-day distribution drift (pipeline monitoring): the
    //       total-variation distance ½·Σ|p_today − p_yesterday| of the
    //       per-day event-type mix — the standard ingest monitor that
    //       catches an upstream source silently changing shape before
    //       it poisons a training run. Densified over the full
    //       day×type grid (a type absent today still contributes its
    //       yesterday mass), then ONE lag window per type. Scale
    //       shape: the per-day histogram is a keyed agg of the raw
    //       stream; everything after operates on days×types rows —
    //       monitoring cost is independent of event volume. -----
    Q("q140_daily_drift",
      Some("""WITH c AS (
             |  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |grid AS (
             |  SELECT d.day, t.event_type,
             |    coalesce(c.c, 0) AS c
             |  FROM (SELECT DISTINCT day FROM c) d
             |  CROSS JOIN (SELECT DISTINCT event_type FROM c) t
             |  LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type),
             |p AS (
             |  SELECT day, event_type,
             |    CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY day) AS p
             |  FROM grid),
             |l AS (
             |  SELECT day, event_type, p,
             |    lag(p) OVER (PARTITION BY event_type ORDER BY day) AS p_prev,
             |    lag(day) OVER (PARTITION BY event_type ORDER BY day) AS day_prev
             |  FROM p)
             |SELECT day, round(0.5 * sum(abs(p - p_prev)), 4) AS tv_drift
             |FROM l WHERE day_prev = day - 1
             |GROUP BY day ORDER BY day""".stripMargin),
      (s, dir) => {
        val c = Tables.load(s, dir, "events")
          .select(to_date(col("ts")).as("day"), col("event_type"))
          .groupBy("day", "event_type").agg(count(lit(1)).as("c"))
        val grid = c.select("day").distinct()
          .crossJoin(c.select("event_type").distinct())
          .join(c, Seq("day", "event_type"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
        val wDay = Window.partitionBy(col("day"))
        val wType = Window.partitionBy(col("event_type")).orderBy(col("day"))
        grid
          .withColumn("p", col("c").cast("double") / sum(col("c")).over(wDay))
          .withColumn("p_prev", lag(col("p"), 1).over(wType))
          .withColumn("day_prev", lag(col("day"), 1).over(wType))
          .filter(col("day_prev") === date_sub(col("day"), 1))
          .groupBy("day")
          .agg(round(lit(0.5) * sum(abs(col("p") - col("p_prev"))), 4).as("tv_drift"))
          .orderBy("day")
      }),

    // ----- behavioral Markov chain: per-user event streams → global
    //       transition matrix P(next_type | type). ONE window shuffle
    //       keyed by user (lead over ts with event_id tiebreak for
    //       determinism), then a (from,to)-keyed count whose output is
    //       |types|² rows — downstream normalization is volume-
    //       independent. The sequence-model shape behind session
    //       recommendation / anomaly scoring over event logs. -----
    Q("q146_markov_transitions",
      Some("""WITH nx AS (
             |  SELECT event_type, lead(event_type) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
             |  FROM events),
             |c AS (SELECT event_type, next_type, count(*) AS n FROM nx
             |      WHERE next_type IS NOT NULL GROUP BY 1, 2)
             |SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
             |  round(CAST(n AS DOUBLE)
             |        / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE), 4) AS p
             |FROM c ORDER BY event_type, next_type""".stripMargin),
      (s, dir) => {
        val wSeq = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(wSeq))
          .filter(col("next_type").isNotNull)
          .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
          .withColumn("p", round(col("n").cast("double")
            / sum(col("n")).over(Window.partitionBy(col("event_type"))), 4))
          .orderBy("event_type", "next_type")
      }),

    // ----- PageRank over the supplier→customer fulfillment graph,
    //       THREE bounded iterations with dangling-mass redistribution
    //       (customers have no out-edges — all their mass teleports).
    //       The oracle unrolls the identical three steps as chained
    //       CTEs, so every per-round join/agg is hash-checked, not just
    //       the fixed point. Node namespaces are disjoint by an id
    //       offset. Same iterative discipline as q104: one keyed
    //       shuffle per round, O(1) planning via localCheckpoint. -----
    Q("q166_pagerank",
      Some(Analytics.duckPagerank),
      (s, dir) => {
        val edges = Tables.load(s, dir, "lineitem")
          .join(Tables.load(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").cast("long").as("src"),
            (col("o_custkey") + 1000000L).cast("long").as("dst"))
        Graph.pagerank(edges, iters = 3)
          .select(col("node"), round(col("r"), 6).as("rank"))
          .orderBy(col("rank").desc, col("node"))
          .limit(20)
      }),

    // ----- RFM segmentation (q301): the classic customer-value grid —
    //       per user recency (last event time), frequency (events),
    //       monetary (value sum), scored 1–5 against exact population
    //       quintile CUTS and bucketed into named segments. The scale
    //       decision: NO global ntile window (an unpartitioned window
    //       collapses to ONE task — the one shuffle shape this codebase
    //       bans); instead, cuts come from exact `percentile` over the
    //       user frame (one pass, 12 scalars) and scores are pure
    //       comparisons against the broadcast 1-row cuts frame — fully
    //       parallel at any user cardinality. Determinism: all three
    //       metrics are exact BIGINTs (floor-seconds, counts, e4 value
    //       sums), the interpolated cuts compute the same double
    //       formula in both engines from those integers, and an
    //       integer metric can only flip across a cut if the cut
    //       itself crossed an integer — which identical arithmetic
    //       cannot do differently. -----
    Q("q301_rfm_segments",
      Some("""WITH u AS (
             |  SELECT user_id,
             |    CAST(floor(epoch(max(ts))) AS BIGINT) AS r_key,
             |    CAST(count(*) AS BIGINT) AS f,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000
             |      AS BIGINT) AS m_e4
             |  FROM events GROUP BY user_id),
             |c AS (SELECT
             |    quantile_cont(r_key, 0.2) AS r1, quantile_cont(r_key, 0.4) AS r2,
             |    quantile_cont(r_key, 0.6) AS r3, quantile_cont(r_key, 0.8) AS r4,
             |    quantile_cont(f, 0.2) AS f1, quantile_cont(f, 0.4) AS f2,
             |    quantile_cont(f, 0.6) AS f3, quantile_cont(f, 0.8) AS f4,
             |    quantile_cont(m_e4, 0.2) AS m1, quantile_cont(m_e4, 0.4) AS m2,
             |    quantile_cont(m_e4, 0.6) AS m3, quantile_cont(m_e4, 0.8) AS m4
             |  FROM u),
             |sc AS (SELECT user_id,
             |    CAST(1 + CAST(r_key > c.r1 AS INT) + CAST(r_key > c.r2 AS INT)
             |      + CAST(r_key > c.r3 AS INT) + CAST(r_key > c.r4 AS INT)
             |      AS BIGINT) AS r_q,
             |    CAST(1 + CAST(f > c.f1 AS INT) + CAST(f > c.f2 AS INT)
             |      + CAST(f > c.f3 AS INT) + CAST(f > c.f4 AS INT)
             |      AS BIGINT) AS f_q,
             |    CAST(1 + CAST(m_e4 > c.m1 AS INT) + CAST(m_e4 > c.m2 AS INT)
             |      + CAST(m_e4 > c.m3 AS INT) + CAST(m_e4 > c.m4 AS INT)
             |      AS BIGINT) AS m_q
             |  FROM u CROSS JOIN c)
             |SELECT user_id, r_q, f_q, m_q,
             |  CASE WHEN r_q >= 4 AND f_q >= 4 THEN 'champion'
             |       WHEN m_q >= 4 THEN 'big_spender'
             |       WHEN r_q <= 2 AND f_q >= 3 THEN 'at_risk'
             |       ELSE 'regular' END AS segment
             |FROM sc ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val u = Tables.load(s, dir, "events")
          .groupBy("user_id")
          .agg(unix_timestamp(max(col("ts"))).as("r_key"),
            count(lit(1)).as("f"),
            (sum(col("value").cast("decimal(18,4)")) * 10000)
              .cast("long").as("m_e4"))
        val cuts = u.agg(
          expr("percentile(r_key, 0.2)").as("r1"),
          expr("percentile(r_key, 0.4)").as("r2"),
          expr("percentile(r_key, 0.6)").as("r3"),
          expr("percentile(r_key, 0.8)").as("r4"),
          expr("percentile(f, 0.2)").as("f1"),
          expr("percentile(f, 0.4)").as("f2"),
          expr("percentile(f, 0.6)").as("f3"),
          expr("percentile(f, 0.8)").as("f4"),
          expr("percentile(m_e4, 0.2)").as("m1"),
          expr("percentile(m_e4, 0.4)").as("m2"),
          expr("percentile(m_e4, 0.6)").as("m3"),
          expr("percentile(m_e4, 0.8)").as("m4"))
        def score(v: String, c: Seq[String]) =
          (lit(1) + c.map(x => (col(v) > col(x)).cast("int"))
            .reduce(_ + _)).cast("long")
        u.crossJoin(broadcast(cuts))
          .select(col("user_id"),
            score("r_key", Seq("r1", "r2", "r3", "r4")).as("r_q"),
            score("f", Seq("f1", "f2", "f3", "f4")).as("f_q"),
            score("m_e4", Seq("m1", "m2", "m3", "m4")).as("m_q"))
          .withColumn("segment",
            when(col("r_q") >= 4 && col("f_q") >= 4, "champion")
              .when(col("m_q") >= 4, "big_spender")
              .when(col("r_q") <= 2 && col("f_q") >= 3, "at_risk")
              .otherwise("regular"))
          .orderBy("user_id")
      })
  )

  /** DuckDB text of the same three PageRank steps (chained CTEs). */
  private def duckPagerank: String = {
    def step(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT nd.node,
         |    -- DOUBLE subtraction, matching Spark's lit(1.0 - damping):
         |    -- a bare (1 - 0.85) is DuckDB DECIMAL arithmetic = the
         |    -- 0.15 double literal, which is 2 ulp AWAY from 1.0-0.85
         |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
         |      + 0.85 * (coalesce(inc.s, 0) + dg.m / nn.n) AS r
         |  FROM nodes nd
         |  CROSS JOIN nn
         |  CROSS JOIN (SELECT coalesce(sum(p.r), 0) AS m FROM $prev p
         |              LEFT JOIN deg ON p.node = deg.src WHERE deg.src IS NULL) dg
         |  LEFT JOIN (SELECT e.dst AS node, sum(p.r / deg.outdeg) AS s
         |             FROM e JOIN $prev p ON p.node = e.src
         |             JOIN deg ON deg.src = e.src GROUP BY e.dst) inc
         |    ON inc.node = nd.node)""".stripMargin
    s"""WITH e AS (
       |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
       |    CAST(o_custkey + 1000000 AS BIGINT) AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |), nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM e GROUP BY src),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes, nn),
       |${step("r0", "r1")},
       |${step("r1", "r2")},
       |${step("r2", "r3")}
       |SELECT node, round(r, 6) AS rank FROM r3
       |ORDER BY rank DESC, node LIMIT 20""".stripMargin
  }
}
