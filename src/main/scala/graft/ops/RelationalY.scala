package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQL-surface coverage, batch 3 (SURVEY.md §2.5): the remaining window
  * analytics (ntile/percent_rank/cume_dist, first/last/nth_value),
  * conditional scalar functions, multiset set operations
  * (INTERSECT ALL / EXCEPT ALL), exact interpolated percentiles, linear
  * regression aggregates, edit-distance fuzzy key matching, and
  * fixed-width histograms.
  *
  * Everything here is a Spark built-in (whole-stage codegen, partial
  * aggregation where applicable); the interest is oracle-exact parity
  * with DuckDB and plan shapes that survive 100 TB (notes per query).
  */
object RelationalY {

  val queries: Seq[Q] = Seq(

    // ----- ranking window suite: ntile buckets, percent_rank, cume_dist
    //       per nation over customer balances. One shuffle on the
    //       partition key; all three functions share the same sorted
    //       window pass. -----
    Q("q91_ranking_suite",
      Some("""SELECT c_custkey, c_nationkey,
             |  CAST(ntile(4) OVER w AS INT) AS bal_quartile,
             |  round(percent_rank() OVER w, 4) AS pct_rank,
             |  round(cume_dist() OVER w, 4) AS cume
             |FROM customer
             |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            ntile(4).over(w).as("bal_quartile"),
            round(percent_rank().over(w), 4).as("pct_rank"),
            round(cume_dist().over(w), 4).as("cume"))
          .orderBy("c_custkey")
      }),

    // ----- value-position window functions: first/last/nth order value
    //       per customer over the full partition frame (explicit
    //       UNBOUNDED..UNBOUNDED — last_value under the default frame
    //       would be the running current row, a classic silent bug).
    //       Tie-broken ORDER BY keeps both engines identical. -----
    Q("q92_value_window",
      Some("""SELECT o_orderkey, o_custkey,
             |  round(first_value(o_totalprice) OVER w, 4) AS first_price,
             |  round(last_value(o_totalprice) OVER w, 4) AS last_price,
             |  round(nth_value(o_totalprice, 2) OVER w, 4) AS second_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            round(first(col("o_totalprice")).over(w), 4).as("first_price"),
            round(last(col("o_totalprice")).over(w), 4).as("last_price"),
            round(nth_value(col("o_totalprice"), 2).over(w), 4).as("second_price"))
          .orderBy("o_orderkey")
      }),

    // ----- conditional scalar functions: greatest/least, NULLIF,
    //       COALESCE, CASE — pure row-local projection, stays in one
    //       codegen stage fused with the scan. -----
    Q("q93_conditional_funcs",
      Some("""SELECT o_orderkey,
             |  round(greatest(o_totalprice, 200000.0), 4) AS floor_200k,
             |  round(least(o_totalprice, 200000.0), 4) AS cap_200k,
             |  nullif(o_orderstatus, 'O') AS non_open_status,
             |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
             |  CASE WHEN o_totalprice > 150000 THEN 'big' ELSE 'small' END AS size_class
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey"),
            round(greatest(col("o_totalprice"), lit(200000.0)), 4).as("floor_200k"),
            round(least(col("o_totalprice"), lit(200000.0)), 4).as("cap_200k"),
            nullif(col("o_orderstatus"), lit("O")).as("non_open_status"),
            coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_label"),
            when(col("o_totalprice") > 150000, "big").otherwise("small").as("size_class"))
          .orderBy("o_orderkey")),

    // ----- multiset set operations: INTERSECT ALL keeps min(multiplicity),
    //       EXCEPT ALL subtracts multiplicities — the duplicate-preserving
    //       forms q21/q22 (DISTINCT variants) don't cover. Spark plans
    //       both as aggregations over a tagged union (no join). -----
    Q("q94_setops_all",
      Some("""SELECT 'except_all' AS op, k FROM (
             |  SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 200
             |  EXCEPT ALL SELECT s_nationkey FROM supplier)
             |UNION ALL
             |SELECT 'intersect_all' AS op, k FROM (
             |  SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 200
             |  INTERSECT ALL SELECT s_nationkey FROM supplier)
             |ORDER BY op, k""".stripMargin),
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
          .filter(col("c_custkey") <= 200).select(col("c_nationkey").as("k"))
        val sup = Tables.load(s, dir, "supplier").select(col("s_nationkey").as("k"))
        c.exceptAll(sup).withColumn("op", lit("except_all"))
          .unionByName(c.intersectAll(sup).withColumn("op", lit("intersect_all")))
          .select("op", "k")
          .orderBy("op", "k")
      }),

    // ----- exact interpolated percentiles (vs q18's approx): Spark
    //       `percentile` ≡ DuckDB `quantile_cont` (linear interpolation).
    //       Exact percentile is a sort-based aggregate — at 100 TB prefer
    //       q18's approx_percentile (mergeable sketch); this is the
    //       auditable exact path for bounded groups. -----
    Q("q95_percentile_exact",
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.25), 4) AS q25,
             |  round(quantile_cont(l_quantity, 0.50), 4) AS q50,
             |  round(quantile_cont(l_quantity, 0.75), 4) AS q75,
             |  round(median(l_extendedprice), 4) AS med_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(expr("percentile(l_quantity, 0.25)"), 4).as("q25"),
            round(expr("percentile(l_quantity, 0.50)"), 4).as("q50"),
            round(expr("percentile(l_quantity, 0.75)"), 4).as("q75"),
            round(expr("median(l_extendedprice)"), 4).as("med_price"))
          .orderBy("l_returnflag")),

    // ----- linear-regression aggregates: slope/intercept/R² of price vs
    //       quantity per return flag. Single-pass moment aggregates —
    //       partial+final, shuffle carries one moment tuple per group. -----
    Q("q96_regr_aggregates",
      Some("""SELECT l_returnflag,
             |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
             |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
             |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
             |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
            round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
            round(regr_r2(col("l_extendedprice"), col("l_quantity")), 4).as("r2"),
            regr_count(col("l_extendedprice"), col("l_quantity")).cast("long").as("n"))
          .orderBy("l_returnflag")),

    // ----- edit-distance fuzzy key matching: near-identical part names
    //       by Levenshtein ≤ 4. The key domain is DEDUPLICATED first —
    //       pairing distinct names (vocabulary-sized, grows ~log(data))
    //       instead of rows is what keeps pairwise edit distance viable
    //       at 100 TB; rows join back to matched names by equality. -----
    Q("q97_levenshtein_fuzzy",
      Some("""WITH names AS (SELECT DISTINCT p_name FROM part)
             |SELECT a.p_name AS n1, b.p_name AS n2,
             |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
             |FROM names a JOIN names b ON a.p_name < b.p_name
             |WHERE levenshtein(a.p_name, b.p_name) <= 4
             |ORDER BY n1, n2""".stripMargin),
      (s, dir) => {
        val names = Tables.load(s, dir, "part").select("p_name").distinct()
        names.as("a").join(names.as("b"), col("a.p_name") < col("b.p_name"))
          .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name")))
          .filter(col("dist") <= 4)
          .select(col("a.p_name").as("n1"), col("b.p_name").as("n2"),
            col("dist").cast("int").as("dist"))
          .orderBy("n1", "n2")
      }),

    // ----- calendar arithmetic (complements q34's extraction/diff set):
    //       month-clamped addition, period ends, ISO week/day numbering,
    //       quarter truncation. Row-local; everything normalized to DATE
    //       so both engines compare exactly. -----
    Q("q105_date_arith",
      Some("""SELECT o_orderkey,
             |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus_2mo,
             |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
             |  CAST(quarter(o_orderdate) AS INT) AS qtr,
             |  CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr_start,
             |  CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
             |  CAST(isodow(o_orderdate) AS INT) AS iso_dow
             |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") <= 200)
          .select(col("o_orderkey"),
            add_months(col("o_orderdate"), 2).as("plus_2mo"),
            last_day(col("o_orderdate")).as("month_end"),
            quarter(col("o_orderdate")).as("qtr"),
            date_trunc("quarter", col("o_orderdate")).cast("date").as("qtr_start"),
            weekofyear(col("o_orderdate")).as("iso_week"),
            (weekday(col("o_orderdate")) + 1).as("iso_dow"))
          .orderBy("o_orderkey")),

    // ----- fixed-width histogram: integer bin arithmetic on the scan
    //       (no join against a bin table), partial-aggregated counts —
    //       the O(1)-memory histogram shape for any scale. -----
    Q("q98_histogram_bins",
      Some("""SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
             |  CAST(count(*) AS BIGINT) AS n,
             |  round(min(o_totalprice), 4) AS lo,
             |  round(max(o_totalprice), 4) AS hi,
             |  round(avg(o_totalprice), 4) AS avg_price
             |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bin"))
          .agg(count(lit(1)).as("n"),
            round(min(col("o_totalprice")), 4).as("lo"),
            round(max(col("o_totalprice")), 4).as("hi"),
            round(avg(col("o_totalprice")), 4).as("avg_price"))
          .orderBy("bin")),

    // ----- ANSI-safe error handling (try_* family): the load-don't-die
    //       semantics an ETL edge needs — malformed casts and division
    //       by zero yield NULL instead of failing the job 90 TB in.
    //       Row-local; every try_* stays inside whole-stage codegen.
    //       DuckDB mirrors try_cast natively and try_divide via a
    //       guarded CASE. -----
    Q("q130_try_functions",
      Some("""SELECT o_orderkey,
             |  TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num,
             |  TRY_CAST(o_orderstatus AS INT) AS status_num,
             |  round(CASE WHEN o_orderkey % 3 = 0 THEN NULL
             |        ELSE o_totalprice / (o_orderkey % 3) END, 4) AS price_per,
             |  TRY_CAST('2024-13-40' AS DATE) AS bad_date
             |FROM orders WHERE o_orderkey <= 500
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") <= 500)
          .select(col("o_orderkey"),
            expr("try_cast(substr(o_orderpriority, 1, 1) AS INT)").as("prio_num"),
            expr("try_cast(o_orderstatus AS INT)").as("status_num"),
            round(expr("try_divide(o_totalprice, o_orderkey % 3)"), 4).as("price_per"),
            expr("try_cast('2024-13-40' AS DATE)").as("bad_date"))
          .orderBy("o_orderkey")),

    // ----- GROUP BY ALL / ORDER BY ALL (Snowflake-dialect convenience,
    //       native in Spark 4 AND DuckDB): one SQL text runs verbatim on
    //       both engines — the q117 dialect-parity pattern without even
    //       needing translation. Groups by every non-aggregate
    //       select-list item, orders by the full select list. -----
    Q("q131_group_by_all",
      Some(groupByAllSql),
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql(groupByAllSql)
      })
  )

  /** Shared verbatim by the Spark path and the DuckDB oracle. */
  private lazy val groupByAllSql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(sum(o_totalprice), 2) AS rev
      |FROM orders
      |GROUP BY ALL
      |ORDER BY ALL""".stripMargin
}
