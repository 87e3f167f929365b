package graft.ops

import graft.{Q, Tables}
import graft.functions.TopKAggregator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-structure operators (SURVEY.md §2.5 scale notes + §4): the
  * techniques that keep the SAME logical query viable when the data
  * grows 1000× — amortized bucketing, structural salting, range-join
  * binning, bounded-heap top-k, bloom semi-join reduction, and
  * incremental (algebraic) re-aggregation.
  *
  * Each query here is the oracle-checked demonstration of one
  * technique over the driver fixtures; the technique itself lives in a
  * reusable op ([[Bucketing]], [[Skew]], [[graft.functions.TopKAggregator]])
  * or inline where it is a plan shape rather than a function.
  * Plan-shape assertions live in ScaleOpsSpec.
  */
object ScaleOps {

  val queries: Seq[Q] = Seq(

    // ----- co-bucketed fact ⋈ dim join: both sides pre-shuffled into
    //       the same bucket layout at write time, so the join itself
    //       plans with ZERO exchanges (BucketingSpec asserts it). At
    //       100 TB this amortizes the fact table's shuffle across every
    //       future join on the key — write once, join shuffle-free
    //       forever. The layout is created ONCE per fixture
    //       (ensureBucketed + dir-tagged names): re-runs — and the
    //       bench — time the steady-state exchange-free join, not the
    //       one-time write, which is exactly the amortization claim.
    //       The aggregate after the join is the usual partial+final
    //       hash agg. -----
    Q("q107_bucketed_join",
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin),
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val ordersT = s"g_orders_by_cust_$tag"
        val customerT = s"g_customer_by_key_$tag"
        Bucketing.ensureBucketed(s, Tables.load(s, dir, "orders"),
          ordersT, "o_custkey", buckets = 8)
        Bucketing.ensureBucketed(s, Tables.load(s, dir, "customer"),
          customerT, "c_custkey", buckets = 8)
        Bucketing.cobucketedJoin(s, ordersT, "o_custkey",
            customerT, "c_custkey")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("revenue"))
          .orderBy("c_mktsegment")
      }),

    // ----- structurally salted fact ⋈ dim join (Skew.saltedJoin): the
    //       fact side gets a deterministic hash salt, the broadcast dim
    //       is replicated per salt value, so ONE hot part key spreads
    //       over 8 reducers instead of melting one. Same result as the
    //       plain join — the salt never escapes the op. -----
    Q("q108_salted_join",
      Some("""SELECT p_brand, count(*) AS n_lines,
             |  round(sum(l_quantity), 2) AS qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand
             |ORDER BY p_brand""".stripMargin),
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val dim = Tables.load(s, dir, "part")
          .select(col("p_partkey").as("l_partkey"), col("p_brand"))
        Skew.saltedJoin(li, dim, "l_partkey",
            saltFrom = Seq("l_orderkey", "l_linenumber"), buckets = 8)
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_lines"),
            round(sum(col("l_quantity")), 2).as("qty"))
          .orderBy("p_brand")
      }),

    // ----- binned range join: point-in-interval joins default to
    //       BroadcastNestedLoopJoin (every row × every interval — dies
    //       at scale). Discretize instead: each interval explodes into
    //       the fixed-width bins it covers, each point computes its one
    //       bin, and the join becomes an EQUI-join on bin id + a cheap
    //       residual filter. O(points + intervals×bins/interval) instead
    //       of O(points × intervals); overlapping intervals are fine
    //       (a point meets each interval in exactly one bin — its own).
    //       cf. q09's BNLJ form — this is its 100-TB replacement. -----
    Q("q109_binned_range_join",
      Some("""SELECT band_id, count(*) AS n_orders,
             |  round(avg(o_totalprice), 2) AS avg_price
             |FROM orders JOIN (VALUES (1, 0, 50000), (2, 25000, 100000),
             |    (3, 75000, 200000), (4, 150000, 600000)) AS b(band_id, lo, hi)
             |  ON o_totalprice >= lo AND o_totalprice < hi
             |GROUP BY band_id
             |ORDER BY band_id""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val binW = 25000d
        val bands = Seq((1, 0d, 50000d), (2, 25000d, 100000d),
          (3, 75000d, 200000d), (4, 150000d, 600000d)).toDF("band_id", "lo", "hi")
        val binnedBands = bands.withColumn("bin",
          explode(sequence(floor(col("lo") / binW), floor(col("hi") / binW))))
        Tables.load(s, dir, "orders")
          .withColumn("bin", floor(col("o_totalprice") / binW))
          .join(broadcast(binnedBands), Seq("bin"))
          .filter(col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy("band_id")
          .agg(count(lit(1)).as("n_orders"),
            round(avg(col("o_totalprice")), 2).as("avg_price"))
          .orderBy("band_id")
      }),

    // ----- bounded-heap grouped top-k (TopKAggregator): top-5
    //       customers by balance per nation WITHOUT the
    //       sort-every-row window form. The typed Aggregator keeps a
    //       5-element buffer per group and Catalyst plans it
    //       partial+final, so each map partition ships ≤5 rows per
    //       nation across the exchange — the window equivalent shuffles
    //       and sorts ALL rows. Deterministic (value DESC, id ASC). -----
    Q("q110_grouped_topk",
      Some("""SELECT CAST(c_nationkey AS INT) AS c_nationkey, CAST(rn AS INT) AS rn,
             |  c_custkey, round(c_acctbal, 2) AS acctbal
             |FROM (SELECT c_nationkey, c_custkey, c_acctbal,
             |        row_number() OVER (PARTITION BY c_nationkey
             |          ORDER BY c_acctbal DESC, c_custkey) AS rn
             |      FROM customer) t
             |WHERE rn <= 5
             |ORDER BY c_nationkey, rn""".stripMargin),
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "customer")
          .select(col("c_nationkey").cast("long"), col("c_custkey"),
            col("c_acctbal"))
          .as[(Long, Long, Double)]
          .groupByKey(_._1)
          .mapValues(r => (r._2, r._3))
          .agg(TopKAggregator.topK(5))
          .toDF("nation", "top")
          .select(col("nation"), posexplode(col("top")).as(Seq("pos", "e")))
          .select(col("nation").cast("int").as("c_nationkey"),
            (col("pos") + 1).cast("int").as("rn"),
            col("e._2").as("c_custkey"),
            round(col("e._1"), 2).as("acctbal"))
          .orderBy("c_nationkey", "rn")
      }),

    // ----- bloom-filter semi-join reduction (the manual form of
    //       Spark's runtime row-group filtering): build a compact bloom
    //       sketch of the probe keys ONCE (distributed agg → ~120 KB at
    //       1% fpp for 100k keys), broadcast it, and prefilter the big
    //       side at the scan before the exact semi-join. At 100 TB the
    //       bloom pass drops ~99% of non-matching rows without a
    //       shuffle; the trailing semi-join only certifies the
    //       survivors, so the result stays EXACT despite the sketch. -----
    Q("q111_bloom_semi_join",
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders
             |                    WHERE o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        // Spark's own codegen'd bloom expressions (surfaced via
        // GraftExtensions): the sketch is built by a distributed
        // bloom_filter_agg and delivered to the probe side as a scalar
        // subquery — the same plan shape Spark's runtime row-group
        // filtering injects, so the prefilter stays in whole-stage
        // codegen and scan-eligible (no Scala-closure UDF).
        graft.functions.GraftExtensions.register(s)
        Tables.load(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey"))
          .createOrReplaceTempView("q111_urgent")
        Tables.load(s, dir, "customer").createOrReplaceTempView("q111_customer")
        // ~959k bits ≈ 1% fpp at 100k keys (n·ln(1/p)/ln²2)
        s.sql("""SELECT c_custkey, c_name FROM (
                |  SELECT c_custkey, c_name FROM q111_customer
                |  WHERE bloom_might_contain(
                |    (SELECT bloom_filter_agg(o_custkey, 100000L, 959000L)
                |     FROM q111_urgent),
                |    c_custkey)
                |) pre
                |WHERE c_custkey IN (SELECT o_custkey FROM q111_urgent)
                |ORDER BY c_custkey""".stripMargin)
      }),

    // ----- incremental (algebraic) re-aggregation: monthly revenue
    //       rollup maintained as mergeable partials — the "history"
    //       partial is computed once, each new batch contributes its own
    //       partial, and the final state is a re-aggregation of partials
    //       (sum-of-sums, sum-of-counts, min-of-mins, max-of-maxes).
    //       This is how a 100-TB rollup updates from a 100-GB daily
    //       delta without rescanning history; only works because every
    //       aggregate here is algebraic (avg would be derived
    //       sum/count, never averaged-of-averages). -----
    Q("q112_incremental_agg",
      Some("""SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
             |  count(*) AS n, round(sum(l_extendedprice), 2) AS rev,
             |  round(min(l_quantity), 2) AS minq, round(max(l_quantity), 2) AS maxq
             |FROM lineitem
             |GROUP BY 1
             |ORDER BY month""".stripMargin),
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val splitDate = "1997-01-01"
        def partial(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
          .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"),
            min(col("l_quantity")).as("minq"), max(col("l_quantity")).as("maxq"))
        val history = partial(li.filter(col("l_shipdate") < lit(splitDate)))
        val delta = partial(li.filter(col("l_shipdate") >= lit(splitDate)))
        history.unionByName(delta)
          .groupBy("month")
          .agg(sum(col("n")).as("n"), round(sum(col("rev")), 2).as("rev"),
            round(min(col("minq")), 2).as("minq"),
            round(max(col("maxq")), 2).as("maxq"))
          .select(to_date(col("month")).as("month"), col("n"), col("rev"),
            col("minq"), col("maxq"))
          .orderBy("month")
      }),

    // ----- heavy hitters with sketch-prune + exact certify: freqItems
    //       (Karp/Misra-Gries — superset guarantee: every key with
    //       share > support IS a candidate, false positives possible)
    //       finds candidate hot keys in one pass with O(1/support)
    //       state; the exact count then runs ONLY over candidate rows.
    //       At 100 TB this is how hot keys are detected to drive salting
    //       (q108) without a full groupBy of the key domain: the scan
    //       prunes on `isin(candidates)`, the certify agg is tiny.
    //       Result is EXACT: keys with share strictly > 0.6%. -----
    Q("q113_heavy_hitters",
      Some("""SELECT user_id, count(*) AS n_events FROM events
             |GROUP BY user_id
             |HAVING count(*) > (SELECT 0.006 * count(*) FROM events)
             |ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val support = 0.006
        val events = Tables.load(s, dir, "events")
        val candidates = events.stat.freqItems(Seq("user_id"), support)
          .head().getSeq[Long](0)
        // the exact total rides the certify job as a broadcast scalar
        // (one-row agg subquery) instead of its own count() action —
        // two actions total: the sketch pass and the certify pass
        val total = events.agg(count(lit(1)).as("total"))
        events.filter(col("user_id").isin(candidates: _*))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"))
          .crossJoin(broadcast(total))
          .filter(col("n_events") > lit(support) * col("total"))
          .select("user_id", "n_events")
          .orderBy("user_id")
      }),

    // ----- key-skew profile: the distribution diagnostics that DECIDE
    //       whether a join key needs salting (q108) or AQE skew
    //       handling — max/avg ratio and exact p50/p99 of per-key
    //       counts. Two-level aggregation: per-key partial+final count,
    //       then a single-row global rollup; the second level sees one
    //       row per key, never the raw data. -----
    Q("q116_key_skew_profile",
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_keys,
             |  CAST(max(n) AS BIGINT) AS max_n,
             |  round(avg(n), 4) AS avg_n,
             |  round(max(n) / avg(n), 4) AS skew_ratio,
             |  round(quantile_cont(n, 0.5), 4) AS p50,
             |  round(quantile_cont(n, 0.99), 4) AS p99
             |FROM (SELECT l_partkey, CAST(count(*) AS DOUBLE) AS n
             |      FROM lineitem GROUP BY l_partkey)""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .groupBy("l_partkey").agg(count(lit(1)).cast("double").as("n"))
          .agg(count(lit(1)).as("n_keys"),
            max(col("n")).cast("long").as("max_n"),
            round(avg(col("n")), 4).as("avg_n"),
            round(max(col("n")) / avg(col("n")), 4).as("skew_ratio"),
            round(expr("percentile(n, 0.5)"), 4).as("p50"),
            round(expr("percentile(n, 0.99)"), 4).as("p99"))),

    // ----- dynamic partition pruning: the fact table is laid out
    //       PARTITIONED BY month (the production layout for a
    //       date-partitioned 100 TB fact), the filter lives on a dim
    //       column that is NOT the join key, and only DPP's runtime
    //       subquery — not static predicate pushdown — can translate
    //       "m_year = '1995'" into fact partition pruning. The scan
    //       then touches 12 of the 80 month partitions (plan + pruned
    //       file count asserted in PlanShapeSpec on THIS builder's
    //       layout). Layout is written once per fixture and reused —
    //       the same amortization contract as the q107 buckets. -----
    Q("q172_dpp_partitioned_join",
      Some("""SELECT o_month, CAST(count(*) AS BIGINT) AS n_orders,
             |  round(sum(o_totalprice), 2) AS revenue
             |FROM (SELECT substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS o_month,
             |             o_totalprice FROM orders)
             |WHERE o_month LIKE '1995-%'
             |GROUP BY o_month
             |ORDER BY o_month""".stripMargin),
      (s, dir) => {
        val (fact, dim) = dppJoinSides(s, dir)
        fact.join(dim.select("o_month"), Seq("o_month"))
          .groupBy("o_month")
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("revenue"))
          .orderBy("o_month")
      })
  )

  /** Month-partitioned orders layout + month dim for the DPP gate —
    * staged once per fixture FINGERPRINT via [[Staging.ensure]]
    * (ADVICE r7: a JVM-local marker let two processes race the build
    * and never invalidated on fixture regeneration; the atomic-publish
    * + fingerprint-keyed path closes both). Shared by q172 and the
    * PlanShapeSpec DPP assertions so the asserted plan is exactly the
    * gated query's plan. Returns (fact scan, year-filtered dim). */
  def dppJoinSides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val fp = Staging.fingerprintOf(dir, Seq("orders"))
    val base = Staging.ensure(s"target/graft-dpp/layout_$fp") { tmp =>
      val orders = Tables.load(s, dir, "orders")
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      orders.write.mode("overwrite").partitionBy("o_month")
        .parquet(s"$tmp/orders_by_month")
      orders.select("o_month").distinct()
        .withColumn("m_year", substring(col("o_month"), 1, 4))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/month_dim")
    }
    (s.read.parquet(s"$base/orders_by_month"),
      s.read.parquet(s"$base/month_dim").filter(col("m_year") === "1995"))
  }
}
