package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extended SQL-surface operators (SURVEY.md §2.5 — second tranche).
  * Everything here is inside the reference's arbitrary-SQL surface
  * (`dags/dev_db_test.py:41-70` accepts any statement): unpivot,
  * null-safe joins, generators, ordered string aggregation, selective
  * aggregates, statistical/bitwise aggregates, MERGE-style upserts,
  * date spines, and deterministic hash sampling. All are Spark
  * built-ins composed declaratively — Catalyst plans them; no UDFs.
  *
  * Scale notes are per-query; the common rules: aggregates are
  * partial+final (map-side combine), generators explode AFTER
  * projection to the needed columns, and the merge/upsert joins on the
  * upsert key so both sides co-shuffle once.
  */
object RelationalX {

  val queries: Seq[Q] = Seq(

    // ----- unpivot / melt (wide → long). Spark's native `unpivot`
    //       (Spark ≥3.4) — row-local, no shuffle; at scale this is a
    //       free map over the scan. -----
    Q("q66_unpivot",
      Some("""SELECT o_orderkey, metric, round(val, 4) AS val FROM (
             |  SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS val
             |  FROM orders WHERE o_orderkey <= 50
             |  UNION ALL
             |  SELECT o_orderkey, 'totalprice', o_totalprice FROM orders WHERE o_orderkey <= 50
             |) ORDER BY o_orderkey, metric""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") <= 50)
          .select(col("o_orderkey"),
            col("o_custkey").cast("double").as("custkey"),
            col("o_totalprice").as("totalprice"))
          .unpivot(Array(col("o_orderkey")),
            Array(col("custkey"), col("totalprice")), "metric", "val")
          .withColumn("val", round(col("val"), 4))
          .orderBy("o_orderkey", "metric")),

    // ----- null-safe equality join (`<=>` / IS NOT DISTINCT FROM):
    //       NULL keys MATCH each other instead of dropping out. Keys are
    //       synthesized with nullif so the fixture actually exercises the
    //       NULL bucket. Same hash-join machinery as equi-joins (null-safe
    //       equality is still a hashable key), so broadcast applies. -----
    Q("q67_nullsafe_join",
      Some("""WITH a AS (
             |  SELECT nullif(o_orderstatus, 'O') AS st, CAST(count(*) AS BIGINT) AS n,
             |    round(sum(o_totalprice), 4) AS total
             |  FROM orders GROUP BY 1),
             |d AS (SELECT * FROM (VALUES (CAST(NULL AS VARCHAR), 'open'),
             |                            ('F', 'finished'), ('P', 'pending')) AS t(st, label))
             |SELECT d.label, a.n, a.total
             |FROM a JOIN d ON a.st IS NOT DISTINCT FROM d.st
             |ORDER BY d.label""".stripMargin),
      (s, dir) => {
        val a = Tables.load(s, dir, "orders")
          .groupBy(expr("nullif(o_orderstatus, 'O')").as("st"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("total"))
        val d = s.sql(
          "SELECT * FROM VALUES (CAST(NULL AS STRING), 'open'), ('F', 'finished'), ('P', 'pending') AS t(st, label)")
        a.join(broadcast(d), a("st") <=> d("st"))
          .select(col("label"), col("n"), col("total"))
          .orderBy("label")
      }),

    // ----- generator: posexplode (position-preserving explode — LATERAL
    //       VIEW surface). Explodes AFTER pruning to (doc_id, text): the
    //       generator multiplies rows, so nothing else should be carried
    //       through it. -----
    Q("q68_posexplode_tokens",
      Some("""SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS token
             |FROM (SELECT doc_id, string_split(text, ' ') AS toks
             |      FROM documents WHERE doc_id <= 20), UNNEST(range(1, len(toks) + 1)) AS t(i)
             |ORDER BY doc_id, pos""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .filter(col("doc_id") <= 20)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .withColumnRenamed("col", "token")
          .orderBy("doc_id", "pos")),

    // ----- ordered string aggregation (LISTAGG / string_agg): collect +
    //       in-group sort + join. collect_list order is shuffle-dependent,
    //       so the sort INSIDE the aggregate is what makes the result
    //       deterministic and engine-independent. -----
    Q("q69_string_agg",
      Some("""SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
             |  CAST(count(*) AS BIGINT) AS n_nations
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "nation")
          .join(broadcast(Tables.load(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"),
            count(lit(1)).as("n_nations"))
          .orderBy("r_name")),

    // ----- selective aggregates: max_by/min_by (argmax), count_if,
    //       bool_and/bool_or. All partial+final hash aggregates; max_by
    //       ships (arg, value) pairs through the combiner. The fixture has
    //       a unique price max per group (verified), so argmax is
    //       deterministic. -----
    Q("q70_selective_agg",
      Some("""SELECT o_orderstatus,
             |  arg_max(o_orderkey, o_totalprice) AS priciest_order,
             |  arg_min(o_orderkey, o_totalprice) AS cheapest_order,
             |  CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
             |  bool_and(o_totalprice > 0) AS all_positive,
             |  bool_or(o_totalprice > 400000) AS any_huge
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            max_by(col("o_orderkey"), col("o_totalprice")).as("priciest_order"),
            min_by(col("o_orderkey"), col("o_totalprice")).as("cheapest_order"),
            count_if(col("o_totalprice") > 200000).as("n_big"),
            expr("bool_and(o_totalprice > 0)").as("all_positive"),
            expr("bool_or(o_totalprice > 400000)").as("any_huge"))
          .orderBy("o_orderstatus")),

    // ----- statistical aggregates: correlation / covariance / linear
    //       regression. Single-pass moment accumulation in both engines;
    //       round(_, 4) absorbs accumulation-order float noise. -----
    Q("q71_corr_covar",
      Some("""SELECT l_returnflag,
             |  round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
             |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_s,
             |  round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_p,
             |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
             |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_s"),
            round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("covar_p"),
            round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
            round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"))
          .orderBy("l_returnflag")),

    // ----- bitwise aggregates over group keys. -----
    Q("q72_bitwise_agg",
      Some("""SELECT o_orderstatus,
             |  bit_and(o_orderkey) AS key_and, bit_or(o_orderkey) AS key_or,
             |  bit_xor(o_orderkey) AS key_xor
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(bit_and(col("o_orderkey")).as("key_and"),
            bit_or(col("o_orderkey")).as("key_or"),
            bit_xor(col("o_orderkey")).as("key_xor"))
          .orderBy("o_orderstatus")),

    // ----- MERGE-style upsert (Snowflake MERGE is squarely in the
    //       reference's SQL surface): base ⟗ updates on the upsert key,
    //       coalesce updates over base, tag the action. One co-shuffle
    //       on the key; at scale this is the standard SCD-1 shape (with
    //       a format like Delta/Iceberg the same plan runs under MERGE
    //       INTO — the join IS the merge). -----
    Q("q73_merge_upsert",
      Some("""WITH base AS (
             |  SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS status
             |  FROM orders WHERE o_orderkey <= 100),
             |upd AS (
             |  SELECT o_orderkey AS k, round(o_totalprice * 1.1, 2) AS price, 'U' AS status
             |  FROM orders WHERE o_orderkey BETWEEN 51 AND 150)
             |SELECT coalesce(u.k, b.k) AS k,
             |  round(coalesce(u.price, b.price), 4) AS price,
             |  coalesce(u.status, b.status) AS status,
             |  CASE WHEN u.k IS NULL THEN 'keep'
             |       WHEN b.k IS NULL THEN 'insert' ELSE 'update' END AS action
             |FROM base b FULL JOIN upd u ON b.k = u.k
             |ORDER BY k""".stripMargin),
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        val base = orders.filter(col("o_orderkey") <= 100)
          .select(col("o_orderkey").as("bk"), col("o_totalprice").as("bprice"),
            col("o_orderstatus").as("bstatus"))
        val upd = orders.filter(col("o_orderkey").between(51, 150))
          .select(col("o_orderkey").as("uk"),
            round(col("o_totalprice") * 1.1, 2).as("uprice"), lit("U").as("ustatus"))
        base.join(upd, col("bk") === col("uk"), "full_outer")
          .select(
            coalesce(col("uk"), col("bk")).as("k"),
            round(coalesce(col("uprice"), col("bprice")), 4).as("price"),
            coalesce(col("ustatus"), col("bstatus")).as("status"),
            when(col("uk").isNull, "keep")
              .when(col("bk").isNull, "insert").otherwise("update").as("action"))
          .orderBy("k")
      }),

    // ----- date spine: per-key date range materialization (the backbone
    //       of gap-filling / slowly-changing joins in ETL). sequence() +
    //       explode generates row-locally — no shuffle, and the spine
    //       can be joined back partition-aligned. -----
    Q("q74_date_spine",
      Some("""SELECT o_orderkey, CAST(d AS DATE) AS spine_date,
             |  CAST(datediff('day', CAST(o_orderdate AS DATE), CAST(d AS DATE)) AS INT) AS day_offset
             |FROM (SELECT o_orderkey, o_orderdate,
             |        unnest(generate_series(CAST(o_orderdate AS DATE),
             |                               CAST(o_orderdate AS DATE) + 3, INTERVAL 1 DAY)) AS d
             |      FROM orders WHERE o_orderkey <= 20)
             |ORDER BY o_orderkey, spine_date""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") <= 20)
          .select(col("o_orderkey"), col("o_orderdate"),
            explode(expr(
              "sequence(to_date(o_orderdate), date_add(to_date(o_orderdate), 3), interval 1 day)"))
              .as("spine_date"))
          .withColumn("day_offset", datediff(col("spine_date"), to_date(col("o_orderdate"))))
          .select("o_orderkey", "spine_date", "day_offset")
          .orderBy("o_orderkey", "spine_date")),

    // ----- deterministic hash sampling: md5-based 56-bit hash of the key
    //       mod 20 — a reproducible, engine-independent ~5% systematic
    //       sample (training pipelines need sampling that is STABLE
    //       across reruns, engines, and partitionings; seeded
    //       `TABLESAMPLE` is none of those — q31 covers it rows-only).
    //       Pure map-side filter: pushes to the scan, no shuffle. -----
    Q("q75_hash_sample",
      Some("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(o_totalprice), 4) AS total
             |FROM orders
             |WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 14))::BIGINT % 20 = 0
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .filter(expr(
            "conv(substring(md5(cast(o_orderkey as string)), 1, 14), 16, 10) % 20 = 0"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("total"))
          .orderBy("o_orderstatus")),

    // ----- batch sessionization via gaps-and-islands (lag + conditional
    //       + running sum) — the composition form of q53's session_window
    //       builtin, usable where per-session state must stay queryable.
    //       Same strict `>` gap rule as Spark's merge semantics. Per-user
    //       windows: one shuffle by user_id covers all three window
    //       functions. -----
    Q("q76_sessionize_batch",
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
             |m AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |), g AS (
             |  SELECT user_id, ts,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM m),
             |sess AS (SELECT user_id, sid, count(*) AS n FROM g GROUP BY user_id, sid)
             |SELECT user_id, CAST(max(sid) AS INT) AS n_sessions,
             |  CAST(max(n) AS BIGINT) AS max_session_events,
             |  CAST(sum(n) AS BIGINT) AS total_events
             |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val wLag = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wRun = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.load(s, dir, "events")
          .select("user_id", "event_id", "ts")
          .withColumn("prev_ts", lag(col("ts"), 1).over(wLag))
          .withColumn("new_s",
            when(col("prev_ts").isNull ||
              col("ts") > col("prev_ts") + expr("interval 30 minutes"), 1).otherwise(0))
          .withColumn("sid", sum(col("new_s")).over(wRun))
          .groupBy(col("user_id"), col("sid"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("user_id"))
          .agg(max(col("sid")).cast("int").as("n_sessions"),
            max(col("n")).as("max_session_events"),
            sum(col("n")).as("total_events"))
          .orderBy("user_id")
      }),

    // ----- SCD-2 history derivation: per-customer order timeline →
    //       validity intervals (valid_from = this order's date,
    //       valid_to = next order's date, open-ended for the current
    //       row). lead() over one per-key window — the standard
    //       dimension-history build; one shuffle by the business key.
    //       Ties on (date, key) are broken by o_orderkey so the
    //       interval chain is total. -----
    Q("q83_scd2_history",
      Some("""SELECT o_custkey, o_orderkey, o_orderstatus,
             |  CAST(o_orderdate AS DATE) AS valid_from,
             |  CAST(lead(o_orderdate) OVER w AS DATE) AS valid_to,
             |  lead(o_orderdate) OVER w IS NULL AS is_current
             |FROM orders
             |WHERE o_custkey <= 200
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.load(s, dir, "orders")
          .filter(col("o_custkey") <= 200)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
            col("o_orderdate").cast("date").as("valid_from"),
            lead(col("o_orderdate"), 1).over(w).cast("date").as("valid_to"),
            lead(col("o_orderdate"), 1).over(w).isNull.as("is_current"))
          .orderBy("o_custkey", "valid_from", "o_orderkey")
      }),

    // ----- recursive CTE (WITH RECURSIVE, Spark ≥4.0): a 12-row month
    //       ladder built by recursion, LEFT-joined to 1995 orders for a
    //       per-month gap-free rollup. The recursion is driver-cheap
    //       (12 iterations over a 1-row seed); the join and aggregate
    //       stay fully distributed — at scale the spine side is tiny
    //       and broadcast. -----
    Q("q85_recursive_cte",
      Some("""WITH RECURSIVE m(mon) AS (
             |  SELECT 1
             |  UNION ALL
             |  SELECT mon + 1 FROM m WHERE mon < 12)
             |SELECT m.mon, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
             |  round(coalesce(sum(o_totalprice), 0), 4) AS total
             |FROM m LEFT JOIN (SELECT * FROM orders
             |                  WHERE year(CAST(o_orderdate AS DATE)) = 1995) o
             |  ON month(CAST(o.o_orderdate AS DATE)) = m.mon
             |GROUP BY m.mon ORDER BY m.mon""".stripMargin),
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""WITH RECURSIVE m(mon) AS (
                |  SELECT 1
                |  UNION ALL
                |  SELECT mon + 1 FROM m WHERE mon < 12)
                |SELECT m.mon, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
                |  round(coalesce(sum(o_totalprice), 0), 4) AS total
                |FROM m LEFT JOIN (SELECT * FROM orders
                |                  WHERE year(CAST(o_orderdate AS DATE)) = 1995) o
                |  ON month(CAST(o.o_orderdate AS DATE)) = m.mon
                |GROUP BY m.mon ORDER BY m.mon""".stripMargin)
      }),

    // ----- LATERAL correlated subquery (per-row top-k): for each
    //       customer, the 2 priciest orders via a LATERAL subquery with
    //       ORDER BY + LIMIT — the SQL form of per-group top-k. Catalyst
    //       decorrelates this into a ranked window join, so the physical
    //       plan is the same scalable shape as q19's row_number ≤ k. -----
    Q("q86_lateral_topk",
      Some("""SELECT c_custkey, o_orderkey, o_totalprice
             |FROM customer c, LATERAL (
             |  SELECT o_orderkey, o_totalprice FROM orders
             |  WHERE o_custkey = c.c_custkey
             |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
             |WHERE c_custkey <= 50
             |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin),
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT c_custkey, o_orderkey, o_totalprice
                |FROM customer c, LATERAL (
                |  SELECT o_orderkey, o_totalprice FROM orders
                |  WHERE o_custkey = c.c_custkey
                |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
                |WHERE c_custkey <= 50
                |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
      }),

    // ----- GROUPING / grouping_id over ROLLUP: distinguishes "NULL
    //       because subtotal" from "NULL in the data" — required for
    //       correct report layers over rollups. The combined id is
    //       computed as 2*g(status)+g(priority) in both engines (engine-
    //       specific GROUPING_ID bit orders differ; the arithmetic form
    //       is portable). -----
    Q("q87_grouping_id",
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
             |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
             |  CAST(2 * grouping(o_orderstatus) + grouping(o_orderpriority) AS INT) AS gid,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM orders
             |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
             |ORDER BY gid, status, priority""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(grouping(col("o_orderstatus")).cast("int").as("g_status"),
            grouping(col("o_orderpriority")).cast("int").as("g_priority"),
            (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
              .cast("int").as("gid"),
            count(lit(1)).as("n"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("g_status"), col("g_priority"), col("gid"), col("n"))
          .orderBy("gid", "status", "priority")),

    // ----- RANGE window frame over event time: per-user rolling 1-hour
    //       event count/sum — the frame is VALUE-based (all rows within
    //       the preceding hour), not row-count-based, so ties and gaps
    //       are handled by time itself. Expressed on epoch seconds in
    //       both engines to pin identical frame arithmetic. -----
    Q("q84_range_frame",
      Some("""SELECT user_id, event_id,
             |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
             |  round(sum(value) OVER w, 4) AS sum_1h
             |FROM (SELECT user_id, event_id, value,
             |        CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s FROM events)
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
             |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
          .rangeBetween(-3600L, Window.currentRow)
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("value"),
            unix_timestamp(col("ts")).as("ts_s"))
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("sum_1h", round(sum(col("value")).over(w), 4))
          .select("user_id", "event_id", "n_1h", "sum_1h")
          .orderBy("user_id", "event_id")
      }),

    // ----- HLL sketch build + MERGE (Apache DataSketches, Spark ≥3.5):
    //       per-event-type distinct-user sketches, then a union-merged
    //       corpus-wide estimate from the PARTIAL SKETCHES — never
    //       re-scanning the raw data. Mergeability is the 100 TB
    //       property: per-partition/per-day sketches roll up to any
    //       grouping for the cost of a few KB each. The sketch frame is
    //       cached before branching so the per-type estimates and the
    //       union-merge physically share ONE scan+agg of the raw data
    //       (without the cache the two branches are identical logical
    //       subtrees that may or may not be deduped by exchange reuse).
    //       The estimates are library-specific, so the oracle checks a
    //       TOLERANCE BAND: the query carries the exact distinct count
    //       beside each sketch estimate (per type AND through the
    //       union-merge) and emits |approx−exact|/exact ≤ 5% as a flag
    //       (default lgConfigK=12 ⇒ ~1.6% rsd — 5% is ≳3σ); the oracle
    //       asserts exact counts and flag=1, a real hash check. The
    //       exact columns exist only to arm the gate — the sketch path
    //       itself never re-scans raw data to merge. -----
    Q("q90_hll_sketch",
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             |  CAST(1 AS INT) AS approx_ok
             |FROM events GROUP BY event_type
             |UNION ALL
             |SELECT 'ALL' AS event_type, count(DISTINCT user_id), CAST(1 AS INT)
             |FROM events
             |ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val sk = ev.groupBy(col("event_type"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"),
            countDistinct(col("user_id")).as("exact_users"))
          .cache()
        val perType = sk.select(col("event_type"), col("exact_users"),
          hll_sketch_estimate(col("sk")).cast("long").as("approx_users"))
        val overall = ev.agg(countDistinct(col("user_id")).as("exact_users"))
          .crossJoin(sk.agg(
            hll_sketch_estimate(hll_union_agg(col("sk"))).cast("long").as("approx_users")))
          .select(lit("ALL").as("event_type"), col("exact_users"), col("approx_users"))
        perType.unionByName(overall)
          .withColumn("approx_ok",
            (abs(col("approx_users") - col("exact_users")).cast("double")
              / col("exact_users") <= 0.05).cast("int"))
          .select("event_type", "exact_users", "approx_ok")
          .orderBy("event_type")
      }),

    // ----- rolling 7-day distinct users from MERGED DAILY SKETCHES —
    //       the roll-up that makes sketches pay at 100 TB: the raw
    //       events are scanned ONCE into per-day HLL sketches (one tiny
    //       row per day), and every 7-day window is answered by
    //       unioning ≤ 7 sketches instead of re-scanning a week of
    //       events per window (a naive 7-day DAU over N days rescans
    //       each event 7×). The day-spine ⋈ daily-sketch range join is
    //       days × 7 rows — metadata-scale regardless of event volume.
    //       Oracle device as q90/q145: exact window distincts beside a
    //       ≤ 5% tolerance flag (default lgConfigK=12 ⇒ ~1.6% rsd). -----
    Q("q161_sliding_hll",
      Some("""WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
             |SELECT d.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS exact_users7,
             |  CAST(1 AS INT) AS approx_ok
             |FROM d JOIN events e
             |  ON CAST(e.ts AS DATE) BETWEEN d.day - INTERVAL 6 DAY AND d.day
             |GROUP BY d.day ORDER BY d.day""".stripMargin),
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(to_date(col("ts")).as("day"), col("user_id"))
        val daily = ev.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk")).cache()
        val spine = daily.select(col("day").as("d"))
        val approx = spine.join(broadcast(daily),
            col("day").between(date_sub(col("d"), 6), col("d")))
          .groupBy(col("d"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).cast("long").as("approx7"))
        // exact side exists only to arm the tolerance gate (the sketch
        // path never re-touches raw events to answer a window)
        val exact = spine.join(ev,
            col("day").between(date_sub(col("d"), 6), col("d")))
          .groupBy(col("d"))
          .agg(countDistinct(col("user_id")).as("exact_users7"))
        // the daily-sketch cache is released by the harness's per-query
        // clearCache(); no builder-side checkpoint (it would pre-run the
        // query and skew both bench and plan-shape inspection)
        exact.join(approx, "d")
          .withColumn("approx_ok",
            (abs(col("approx7") - col("exact_users7")).cast("double")
              / col("exact_users7") <= 0.05).cast("int"))
          .select(col("d").as("day"), col("exact_users7"), col("approx_ok"))
          .orderBy("day")
      })
  )
}
