package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.5) — one named,
  * oracle-checked query per operator category, over the TPC-H-ish
  * fixtures.
  *
  * Conventions shared with the DuckDB oracle:
  *  - every floating-point aggregate is `round(x, 4)` in BOTH engines
  *    (summation order differs between engines; 4 decimals absorbs the
  *    last-ulp drift while keeping the check tight);
  *  - every query ends in a total ORDER BY over its key columns with
  *    NULLS FIRST (Spark's asc default) so row order is deterministic;
  *  - aggregates / computed columns are aliased identically on both
  *    sides (the driver's comparator matches columns by name).
  *
  * Scale notes (100 TB thinking, verified via .explain on sf0.1):
  *  - dimension tables (region/nation/supplier/customer-filtered) are
  *    explicitly `broadcast()` so fact-table joins never shuffle the
  *    big side;
  *  - aggregations use Spark's partial (map-side) agg for free;
  *  - predicates and projections sit directly on the parquet scan
  *    (PushedFilters / ReadSchema verified);
  *  - the non-equi join keeps an equi prefix (nationkey) so it plans
  *    as a hash join with a range residual, not a nested-loop.
  */
object Relational {

  private def r4(c: Column): Column = round(c, 4)

  val queries: Seq[Q] = Seq(

    // ----- aggregation: grouped agg (sum/avg/count), TPC-H Q1 shape -----
    Q("q01_pricing_summary",
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity),4) AS sum_qty,
             |  round(sum(l_extendedprice),4) AS sum_base_price,
             |  round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
             |  round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),4) AS sum_charge,
             |  round(avg(l_quantity),4) AS avg_qty,
             |  round(avg(l_extendedprice),4) AS avg_price,
             |  round(avg(l_discount),4) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("2001-09-02 00:00:00").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            r4(sum(col("l_quantity"))).as("sum_qty"),
            r4(sum(col("l_extendedprice"))).as("sum_base_price"),
            r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
            r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("sum_charge"),
            r4(avg(col("l_quantity"))).as("avg_qty"),
            r4(avg(col("l_extendedprice"))).as("avg_price"),
            r4(avg(col("l_discount"))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      }),

    // ----- filter: IN / BETWEEN / LIKE / IS NOT NULL + projection -----
    Q("q02_filter_predicates",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
             |FROM orders
             |WHERE o_orderstatus IN ('O','F')
             |  AND o_totalprice BETWEEN 10000 AND 20000
             |  AND o_orderpriority LIKE '1%'
             |  AND o_custkey IS NOT NULL
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .filter(col("o_orderstatus").isin("O", "F")
            && col("o_totalprice").between(10000, 20000)
            && col("o_orderpriority").like("1%")
            && col("o_custkey").isNotNull)
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
          .orderBy("o_orderkey")),

    // ----- join: inner equi, 3-way, broadcast dim, TPC-H Q3 shape -----
    Q("q03_top_revenue_orders",
      Some("""SELECT o_orderkey, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
             |FROM customer, orders, lineitem
             |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
             |GROUP BY o_orderkey
             |ORDER BY revenue DESC, o_orderkey
             |LIMIT 10""".stripMargin),
      (s, dir) => {
        val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.load(s, dir, "orders")
        val l = Tables.load(s, dir, "lineitem")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("o_orderkey"))
          .agg(r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      }),

    // ----- join: left outer (empty groups preserved) -----
    Q("q04_left_join_nation_customers",
      Some("""SELECT n_nationkey, n_name, count(c_custkey) AS n_customers,
             |  round(coalesce(sum(c_acctbal), 0), 4) AS total_bal
             |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
             |GROUP BY n_nationkey, n_name
             |ORDER BY n_nationkey""".stripMargin),
      (s, dir) => {
        val n = Tables.load(s, dir, "nation")
        val c = Tables.load(s, dir, "customer")
        n.join(c, n("n_nationkey") === c("c_nationkey"), "left")
          .groupBy(col("n_nationkey"), col("n_name"))
          .agg(count(col("c_custkey")).as("n_customers"),
            r4(coalesce(sum(col("c_acctbal")), lit(0))).as("total_bal"))
          .orderBy(col("n_nationkey"))
      }),

    // ----- join: left semi (EXISTS) -----
    Q("q05_semi_join_urgent_customers",
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      }),

    // ----- join: left anti (NOT EXISTS) -----
    Q("q06_anti_join_orderless_customers",
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      }),

    // ----- join: full outer -----
    Q("q07_full_outer_nation_balances",
      Some("""SELECT coalesce(s.nationkey, c.nationkey) AS nationkey, s.supp_bal, c.cust_bal
             |FROM (SELECT s_nationkey AS nationkey, round(sum(s_acctbal),4) AS supp_bal
             |      FROM supplier GROUP BY s_nationkey) s
             |FULL JOIN (SELECT c_nationkey AS nationkey, round(sum(c_acctbal),4) AS cust_bal
             |           FROM customer GROUP BY c_nationkey) c
             |USING (nationkey)
             |ORDER BY nationkey NULLS FIRST""".stripMargin),
      (s, dir) => {
        val sb = Tables.load(s, dir, "supplier")
          .groupBy(col("s_nationkey").as("nationkey"))
          .agg(r4(sum(col("s_acctbal"))).as("supp_bal"))
        val cb = Tables.load(s, dir, "customer")
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(r4(sum(col("c_acctbal"))).as("cust_bal"))
        sb.join(cb, Seq("nationkey"), "full_outer")
          .orderBy(col("nationkey").asc_nulls_first)
      }),

    // ----- join: cross -----
    Q("q08_cross_join_region_status",
      Some("""SELECT r_regionkey, r_name, l_linestatus
             |FROM region CROSS JOIN (SELECT DISTINCT l_linestatus FROM lineitem) t
             |ORDER BY r_regionkey, l_linestatus""".stripMargin),
      (s, dir) => {
        val r = Tables.load(s, dir, "region")
        val ls = Tables.load(s, dir, "lineitem").select("l_linestatus").distinct()
        r.crossJoin(ls).orderBy("r_regionkey", "l_linestatus")
      }),

    // ----- join: non-equi range (equi prefix on nationkey keeps it a
    //       hash join with a range residual — no nested loop at scale) -----
    Q("q09_range_join_balance_band",
      Some("""SELECT s_nationkey AS nationkey, count(*) AS n_pairs
             |FROM supplier JOIN customer
             |  ON s_nationkey = c_nationkey
             | AND c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100
             |GROUP BY s_nationkey
             |ORDER BY nationkey""".stripMargin),
      (s, dir) => {
        val sup = Tables.load(s, dir, "supplier")
        val c = Tables.load(s, dir, "customer")
        sup.join(c, sup("s_nationkey") === c("c_nationkey")
            && c("c_acctbal").between(sup("s_acctbal") - 100, sup("s_acctbal") + 100))
          .groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("nationkey")
      }),

    // ----- window: full ranking-function family, per-group top-k -----
    Q("q10_window_rank_top_customers",
      Some("""SELECT * FROM (
             |  SELECT c_nationkey, c_custkey, c_acctbal,
             |    CAST(row_number() OVER w AS INT) AS rn,
             |    CAST(rank() OVER w AS INT) AS rnk,
             |    CAST(dense_rank() OVER w AS INT) AS drnk,
             |    CAST(ntile(4) OVER w AS INT) AS quartile,
             |    round(percent_rank() OVER w, 4) AS prank,
             |    round(cume_dist() OVER w, 4) AS cdist
             |  FROM customer
             |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
             |) WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.load(s, dir, "customer")
          .withColumn("rn", row_number().over(w))
          .withColumn("rnk", rank().over(w))
          .withColumn("drnk", dense_rank().over(w))
          .withColumn("quartile", ntile(4).over(w))
          .withColumn("prank", round(percent_rank().over(w), 4))
          .withColumn("cdist", round(cume_dist().over(w), 4))
          .filter(col("rn") <= 3)
          .select("c_nationkey", "c_custkey", "c_acctbal", "rn", "rnk", "drnk",
            "quartile", "prank", "cdist")
          .orderBy("c_nationkey", "rn")
      }),

    // ----- join: pure theta (no equi component) — plans as
    //       BroadcastNestedLoopJoin; only ever used dim × dim
    //       (fact-side theta joins get an equi prefix like q09) -----
    Q("q64_theta_join",
      Some("""SELECT r_regionkey, n_nationkey FROM region JOIN nation
             |  ON r_regionkey < n_nationkey - 20
             |ORDER BY r_regionkey, n_nationkey""".stripMargin),
      (s, dir) => {
        val r = Tables.load(s, dir, "region")
        val n = Tables.load(s, dir, "nation")
        r.join(n, r("r_regionkey") < n("n_nationkey") - 20)
          .select("r_regionkey", "n_nationkey")
          .orderBy("r_regionkey", "n_nationkey")
      }),

    // ----- window: framed running aggregate -----
    Q("q11_window_running_spend",
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend
             |FROM orders
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.load(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            r4(sum(col("o_totalprice")).over(w)).as("running_spend"))
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      }),

    // ----- window: lag / lead analytics -----
    Q("q12_window_lag_lead",
      Some("""SELECT user_id, event_id, round(value,4) AS value,
             |  round(lag(value, 1) OVER w, 4) AS prev_value,
             |  round(lead(value, 1) OVER w, 4) AS next_value
             |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"), r4(col("value")).as("value"),
            r4(lag(col("value"), 1).over(w)).as("prev_value"),
            r4(lead(col("value"), 1).over(w)).as("next_value"))
          .orderBy("user_id", "event_id")
      }),

    // ----- aggregation: rollup -----
    Q("q13_rollup_orders",
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice),4) AS total
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), r4(sum(col("o_totalprice"))).as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    // ----- aggregation: cube -----
    Q("q14_cube_lineitem",
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),4) AS qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), r4(sum(col("l_quantity"))).as("qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // ----- aggregation: grouping sets (SQL surface, same text both engines) -----
    Q("q15_grouping_sets",
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n
                |FROM lineitem
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
      }),

    // ----- aggregation: exact count distinct -----
    Q("q16_count_distinct",
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts,
             |  count(DISTINCT l_suppkey) AS distinct_supps
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("distinct_parts"),
            countDistinct(col("l_suppkey")).as("distinct_supps"))
          .orderBy("l_returnflag")),

    // ----- aggregation: approx distinct (HLL++). The estimate itself is
    //       engine-specific, so the oracle checks a TOLERANCE BAND
    //       instead of the raw value: the query emits the exact count
    //       and a flag for |approx−exact|/exact ≤ 5% (rsd pinned at
    //       0.01, so the band is ~5σ — deterministic for a given
    //       fixture), and the oracle asserts the exact count and
    //       flag=1. A broken estimator now FAILS the hash check rather
    //       than hiding behind rows-only.
    //       Plan shape: dedup (flag, partkey) FIRST, then count + sketch
    //       the deduped set — HLL is duplicate-insensitive, so the
    //       estimate is bit-identical to sketching the raw rows, while
    //       mixing countDistinct with a regular agg would plan an Expand
    //       whose partial phase keeps one ~16 KB rsd=0.01 sketch per
    //       (flag, partkey) group (~60k sketches at sf0.1; measured 5.3 s
    //       vs 0.8 s for this shape). The exact count exists only for
    //       the oracle band — a production caller drops it and the plan
    //       collapses to a straight sketch agg, the true 100 TB path. -----
    Q("q17_approx_count_distinct",
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
             |  CAST(1 AS INT) AS approx_ok
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .select("l_returnflag", "l_partkey").distinct()
          .groupBy(col("l_returnflag"))
          // count(col), not count(*): a NULL partkey would otherwise be
          // one value per flag, diverging from COUNT(DISTINCT)'s
          // null-ignoring semantics (ADVICE r7)
          .agg(count(col("l_partkey")).as("exact_parts"),
            approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
          .withColumn("approx_ok",
            (abs(col("approx_parts") - col("exact_parts")).cast("double")
              / col("exact_parts") <= 0.05).cast("int"))
          .select("l_returnflag", "exact_parts", "approx_ok")
          .orderBy("l_returnflag")),

    // ----- exact DECIMAL money aggregation: financial columns cast to
    //       DECIMAL(12,2) BEFORE aggregating, so sums are exact integer
    //       arithmetic in cents — the money discipline a revenue
    //       pipeline needs at any scale (a double accumulator drifts in
    //       the low bits and the drift depends on partition/merge
    //       order, i.e. on cluster topology). The oracle is deliberately
    //       UNROUNDED: both engines sum as decimals and only then cast
    //       to double, so the hash matches iff both sums are exact —
    //       float accumulation on either side fails the gate. -----
    Q("q175_decimal_exact",
      Some("""SELECT l_returnflag,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             |  CAST(min(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
             |  CAST(max(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .select(col("l_returnflag"),
            col("l_extendedprice").cast("decimal(12,2)").as("p"))
          .groupBy(col("l_returnflag"))
          .agg(sum(col("p")).cast("double").as("revenue"),
            min(col("p")).cast("double").as("min_price"),
            max(col("p")).cast("double").as("max_price"))
          .orderBy("l_returnflag")),

    // ----- DECIMAL sum OVERFLOW semantics (q175's sequel): Spark gives
    //       a decimal sum 10 extra digits of headroom (sum(DECIMAL(12,2))
    //       → DECIMAL(22,2)), so even 10^11 rows of money cannot
    //       overflow it — but a column already at the 38-digit ceiling
    //       gets NO headroom, and that is where 100-TB row counts make
    //       overflow a real event, not a corner case. The engineered
    //       `big` column (9·10^35 at DECIMAL(38,2)) overflows its sum at
    //       the second row of every group, proving the production
    //       discipline: `try_sum` degrades to NULL (never silent wrap —
    //       the ANSI NUMERIC_VALUE_OUT_OF_RANGE throw is pinned in
    //       DecimalOverflowSpec),
    //       and the recovery is to aggregate at a precision with
    //       headroom — `revenue_widened` sums the same money at
    //       DECIMAL(20,2) (→ DECIMAL(30,2), exact) and must equal the
    //       DECIMAL(12,2) sum DuckDB computes independently. -----
    Q("q178_decimal_overflow",
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(1 AS INT) AS overflow_is_null,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS revenue_widened
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .select(col("l_returnflag"),
            col("l_extendedprice").cast("decimal(12,2)").as("p12"),
            col("l_extendedprice").cast("decimal(20,2)").as("p20"),
            lit("900000000000000000000000000000000000.00")
              .cast("decimal(38,2)").as("big"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
            try_sum(col("big")).isNull.cast("int").as("overflow_is_null"),
            sum(col("p12")).cast("double").as("revenue"),
            sum(col("p20")).cast("double").as("revenue_widened"))
          .orderBy("l_returnflag")),

    // ----- aggregation: percentiles / median (exact, linear interpolation) -----
    Q("q18_percentiles",
      Some("""SELECT o_orderstatus,
             |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
             |  round(median(o_totalprice), 4) AS med
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            r4(percentile(col("o_totalprice"), lit(0.5))).as("p50"),
            r4(percentile(col("o_totalprice"), lit(0.9))).as("p90"),
            r4(median(col("o_totalprice"))).as("med"))
          .orderBy("o_orderstatus")),

    // ----- approximate percentile (GK/t-digest family) under the same
    //       tolerance-band oracle device as q17: the sketch result is
    //       merge-order-dependent, so the query emits the exact median
    //       plus a |approx−exact|/exact ≤ 5% flag (accuracy 10k ⇒ rank
    //       error ~1e-4 — the band is enormous headroom) and the oracle
    //       asserts exact values and flag=1. Covers the last estimator
    //       family (quantile sketches) with a real hash check. -----
    Q("q145_approx_percentile_band",
      Some("""SELECT o_orderstatus,
             |  round(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
             |  CAST(1 AS INT) AS approx_ok
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("approx_p50"),
            percentile(col("o_totalprice"), lit(0.5)).as("exact_raw"))
          .withColumn("approx_ok",
            (abs(col("approx_p50") - col("exact_raw")) / col("exact_raw") <= 0.05).cast("int"))
          .select(col("o_orderstatus"), round(col("exact_raw"), 4).as("exact_p50"),
            col("approx_ok"))
          .orderBy("o_orderstatus")),

    // ----- sort + limit: global top-k with deterministic tiebreak -----
    Q("q19_topk_orders",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)),

    // ----- set op: union all -----
    Q("q20_union_all",
      Some("""SELECT c_custkey AS key, 'building' AS src FROM customer WHERE c_mktsegment = 'BUILDING'
             |UNION ALL
             |SELECT c_custkey AS key, 'rich' AS src FROM customer WHERE c_acctbal > 9000
             |ORDER BY key, src""".stripMargin),
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val a = c.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("key"), lit("building").as("src"))
        val b = c.filter(col("c_acctbal") > 9000)
          .select(col("c_custkey").as("key"), lit("rich").as("src"))
        a.unionByName(b).orderBy("key", "src")
      }),

    // ----- set op: intersect (distinct) -----
    Q("q21_intersect",
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |INTERSECT
             |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .intersect(c.filter(col("c_acctbal") > 5000).select("c_custkey"))
          .orderBy("c_custkey")
      }),

    // ----- set op: except (distinct) -----
    Q("q22_except",
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |EXCEPT
             |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .except(c.filter(col("c_acctbal") > 5000).select("c_custkey"))
          .orderBy("c_custkey")
      }),

    // ----- distinct -----
    Q("q23_distinct",
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .select("o_orderstatus", "o_orderpriority").distinct()
          .orderBy("o_orderstatus", "o_orderpriority")),

    // ----- dedup by key with deterministic keep-rule (dropDuplicates
    //       keeps an arbitrary row, so we use the window form both here
    //       and in the oracle; the fixture has duplicate
    //       (l_orderkey, l_linenumber) pairs, so the tiebreak must
    //       extend over the projected columns to be engine-independent) -----
    Q("q24_dedup_first_line",
      Some("""SELECT l_orderkey, l_partkey, l_suppkey, l_quantity FROM (
             |  SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
             |    row_number() OVER (PARTITION BY l_orderkey
             |      ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity) AS rn
             |  FROM lineitem
             |) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin),
      (s, dir) =>
        // "first row per key" as a hash aggregate: min over the ordering
        // tuple as a struct (struct ordering = field order = the window's
        // ORDER BY). Unlike row_number-over-window this partial-aggregates
        // map-side, so the shuffle carries one row per order, not every
        // lineitem — the only dedup-keep-first shape that survives 100 TB.
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(min(struct(col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_quantity"))).as("f"))
          .select(col("l_orderkey"), col("f.l_partkey").as("l_partkey"),
            col("f.l_suppkey").as("l_suppkey"), col("f.l_quantity").as("l_quantity"))
          .orderBy("l_orderkey")),

    // ----- pivot (explicit value list: single pass, no discovery job) -----
    Q("q25_pivot_linestatus",
      Some("""SELECT l_returnflag,
             |  round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 4) AS F,
             |  round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 4) AS O
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(r4(sum(col("l_quantity"))))
          .orderBy("l_returnflag")),

    // ----- subquery: uncorrelated IN -----
    Q("q26_subquery_in",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders
                |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
                |ORDER BY o_orderkey""".stripMargin)
      }),

    // ----- subquery: correlated EXISTS -----
    Q("q27_subquery_exists",
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT c_custkey, c_name FROM customer c
                |WHERE EXISTS (SELECT 1 FROM orders o
                |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
                |ORDER BY c_custkey""".stripMargin)
      }),

    // ----- subquery: scalar -----
    Q("q28_subquery_scalar",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders
                |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
                |ORDER BY o_orderkey""".stripMargin)
      }),

    // ----- CTE + HAVING -----
    Q("q29_cte_frequent_customers",
      Some("""WITH big AS (
             |  SELECT o_custkey, count(*) AS n FROM orders
             |  GROUP BY o_custkey HAVING count(*) >= 15
             |)
             |SELECT c.c_custkey, c.c_name, b.n AS n_orders
             |FROM customer c JOIN big b ON b.o_custkey = c.c_custkey
             |ORDER BY c.c_custkey""".stripMargin),
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""WITH big AS (
                |  SELECT o_custkey, count(*) AS n FROM orders
                |  GROUP BY o_custkey HAVING count(*) >= 15
                |)
                |SELECT c.c_custkey, c.c_name, b.n AS n_orders
                |FROM customer c JOIN big b ON b.o_custkey = c.c_custkey
                |ORDER BY c.c_custkey""".stripMargin)
      }),

    // ----- inline VALUES relation -----
    Q("q30_values_inline",
      Some("SELECT * FROM (VALUES (1,'one'),(2,'two'),(3,'three')) AS t(id, name) ORDER BY id"),
      (s, _) =>
        s.sql("SELECT * FROM (VALUES (1,'one'),(2,'two'),(3,'three')) AS t(id, name) ORDER BY id")),

    // ----- sampling: seeded Bernoulli sample. Seed semantics are
    //       engine-specific, so the oracle checks the STATISTICAL
    //       contract instead of the row set: per group, the sampled
    //       count must land within ±15% of fraction×N (≫3σ for the
    //       smallest fixture group, and the seed makes the draw
    //       deterministic per fixture — the band is belt-and-braces
    //       against sampler changes, not run-to-run noise). The oracle
    //       asserts the exact group totals and flag=1, so a sampler
    //       that over/under-draws or drops a group fails the hash. -----
    Q("q31_sample",
      Some("""SELECT l_returnflag, count(*) AS n_total, CAST(1 AS INT) AS sample_ok
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val sampled = li.sample(withReplacement = false, fraction = 0.1, seed = 42L)
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_sampled"))
        li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_total"))
          .join(sampled, Seq("l_returnflag"), "left")
          .withColumn("sample_ok",
            (abs(coalesce(col("n_sampled"), lit(0L)).cast("double")
              / (col("n_total") * 0.1) - 1.0) <= 0.15).cast("int"))
          .select("l_returnflag", "n_total", "sample_ok")
          .orderBy("l_returnflag")
      }),

    // ----- multi-way star join over all dims, TPC-H Q5 shape -----
    Q("q32_regional_revenue",
      Some("""SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
             |FROM customer, orders, lineitem, supplier, nation, region
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |  AND r_name = 'ASIA'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin),
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        val l = Tables.load(s, dir, "lineitem")
        val sup = Tables.load(s, dir, "supplier")
        val n = Tables.load(s, dir, "nation")
        val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey")
            && c("c_nationkey") === sup("s_nationkey"))
          .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      }),

    // ----- scalar function sampler: string / conditional / math -----
    Q("q33_scalar_functions",
      Some("""SELECT o_orderkey,
             |  upper(substring(o_orderpriority, 1, 6)) AS pri_upper,
             |  lower(o_orderstatus) AS status_lower,
             |  CAST(length(o_orderpriority) AS INT) AS pri_len,
             |  concat(o_orderstatus, '-', o_orderpriority) AS tag,
             |  replace(o_orderpriority, ' ', '_') AS pri_snake,
             |  trim('  pad  ') AS trimmed,
             |  CASE WHEN o_totalprice > 300000 THEN 'big'
             |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
             |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
             |  round(abs(o_totalprice - 200000), 2) AS dist_from_200k,
             |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k,
             |  CAST(ceil(o_totalprice / 1000) AS BIGINT) AS price_k_up,
             |  mod(o_orderkey, 7) AS key_mod7,
             |  round(power(2, mod(o_orderkey, 5)), 1) AS pow2
             |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderkey,
                |  upper(substring(o_orderpriority, 1, 6)) AS pri_upper,
                |  lower(o_orderstatus) AS status_lower,
                |  CAST(length(o_orderpriority) AS INT) AS pri_len,
                |  concat(o_orderstatus, '-', o_orderpriority) AS tag,
                |  replace(o_orderpriority, ' ', '_') AS pri_snake,
                |  trim('  pad  ') AS trimmed,
                |  CASE WHEN o_totalprice > 300000 THEN 'big'
                |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
                |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
                |  round(abs(o_totalprice - 200000), 2) AS dist_from_200k,
                |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k,
                |  CAST(ceil(o_totalprice / 1000) AS BIGINT) AS price_k_up,
                |  mod(o_orderkey, 7) AS key_mod7,
                |  round(power(2, mod(o_orderkey, 5)), 1) AS pow2
                |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin)
      }),

    // ----- date/time function sampler (oracle text differs: DuckDB uses
    //       date_part/date_diff names) -----
    Q("q34_datetime_functions",
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INT) AS yr,
             |  CAST(month(o_orderdate) AS INT) AS mon,
             |  CAST(day(o_orderdate) AS INT) AS dom,
             |  date_trunc('month', o_orderdate) AS month_start,
             |  CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS plus_30d,
             |  date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_1995,
             |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec,
             |  strftime(o_orderdate, '%Y-%m-%d') AS iso_day
             |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") <= 200)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mon"),
            dayofmonth(col("o_orderdate")).as("dom"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("plus_30d"),
            datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01"))).cast("long").as("days_since_1995"),
            unix_timestamp(col("o_orderdate")).as("epoch_sec"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"))
          .orderBy("o_orderkey")),

    // ----- array / map / higher-order-function / try_cast sampler
    //       (SURVEY.md §2.4 array+map rows; DuckDB map extraction
    //       yields a 1-element list, unwrapped with [1]) -----
    Q("q58_array_map_functions",
      Some("""SELECT o_orderkey,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT), [o_orderkey, o_custkey, o_orderkey + o_custkey]),
             |    (a, x) -> a + x) AS arr_sum,
             |  list_aggregate([o_orderkey, o_custkey, o_orderkey + o_custkey], 'max') AS arr_max,
             |  ([o_orderkey, o_custkey, o_orderkey + o_custkey])[2] AS second_elem,
             |  CAST(len(list_filter([o_orderkey, o_custkey], x -> x % 2 = 0)) > 0 AS BOOLEAN) AS has_even,
             |  list_transform([o_orderkey, o_custkey], x -> x * 2)[1] AS doubled_first,
             |  array_to_string(list_sort(map_keys(map(['status','priority'], [o_orderstatus, o_orderpriority]))), ',') AS mkeys,
             |  map(['status','priority'], [o_orderstatus, o_orderpriority])['status'][1] AS status_via_map,
             |  TRY_CAST(o_orderpriority AS INT) AS bad_cast,
             |  TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS pri_num
             |FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") <= 100)
          .select(col("o_orderkey"),
            expr("aggregate(array(o_orderkey, o_custkey, o_orderkey + o_custkey), cast(0 as bigint), (a, x) -> a + x)").as("arr_sum"),
            expr("array_max(array(o_orderkey, o_custkey, o_orderkey + o_custkey))").as("arr_max"),
            expr("element_at(array(o_orderkey, o_custkey, o_orderkey + o_custkey), 2)").as("second_elem"),
            expr("exists(array(o_orderkey, o_custkey), x -> x % 2 = 0)").as("has_even"),
            expr("element_at(transform(array(o_orderkey, o_custkey), x -> x * 2), 1)").as("doubled_first"),
            expr("array_join(array_sort(map_keys(map_from_arrays(array('status','priority'), array(o_orderstatus, o_orderpriority)))), ',')").as("mkeys"),
            expr("element_at(map_from_arrays(array('status','priority'), array(o_orderstatus, o_orderpriority)), 'status')").as("status_via_map"),
            expr("try_cast(o_orderpriority as int)").as("bad_cast"),
            expr("try_cast(substring(o_orderpriority, 1, 1) as int)").as("pri_num"))
          .orderBy("o_orderkey")),

    // ----- conditional aggregation over a fact ⋈ dim join (TPC-H Q14
    //       shape; exercises the `part` table + LIKE-filtered dim,
    //       broadcast to keep the lineitem side shuffle-free) -----
    Q("q65_promo_revenue",
      Some("""SELECT p_brand,
             |  round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
             |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             |    / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
             |FROM lineitem, part
             |WHERE l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        val p = Tables.load(s, dir, "part")
        val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
        l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            round(lit(100.0) * sum(when(col("p_type").like("PROMO%"), rev).otherwise(0))
              / sum(rev), 4).as("promo_pct"),
            round(sum(rev), 4).as("revenue"))
          .orderBy("p_brand")
      }),

    // ----- aggregation: stddev/variance + collect_list/collect_set
    //       (collected arrays sorted for engine-independent order;
    //       first/last are nondeterministic without a window, so the
    //       deterministic min/max stand in for them per SURVEY §7.3) -----
    Q("q59_stats_collect",
      Some("""SELECT c_nationkey,
             |  round(stddev_samp(c_acctbal), 4) AS sd_bal,
             |  round(var_samp(c_acctbal), 4) AS var_bal,
             |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
             |  CAST(len(list(c_mktsegment)) AS INT) AS n_collected,
             |  min(c_name) AS first_name, max(c_name) AS last_name
             |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "customer")
          .groupBy(col("c_nationkey"))
          .agg(
            round(stddev_samp(col("c_acctbal")), 4).as("sd_bal"),
            round(var_samp(col("c_acctbal")), 4).as("var_bal"),
            array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segments"),
            size(collect_list(col("c_mktsegment"))).as("n_collected"),
            min(col("c_name")).as("first_name"),
            max(col("c_name")).as("last_name"))
          .orderBy("c_nationkey")),

    // ----- skew mitigation: two-phase salted aggregation must equal the
    //       plain GROUP BY (l_returnflag has only 3 values — exactly the
    //       hot-key shape salting exists for; the oracle is the
    //       unsalted query, proving the rewrite is semantics-free) -----
    Q("q60_salted_aggregate",
      Some("""SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) =>
        Skew.saltedAggregate(
            Tables.load(s, dir, "lineitem"),
            keys = Seq("l_returnflag"),
            saltFrom = Seq("l_orderkey", "l_linenumber"),
            partials = Map(
              "sum_qty" -> (sum(col("l_quantity")), (c: Column) => sum(c)),
              "n" -> (count(lit(1)), (c: Column) => sum(c).cast("long"))))
          .select(col("l_returnflag"), round(col("sum_qty"), 4).as("sum_qty"), col("n"))
          .orderBy("l_returnflag"))
  )
}
