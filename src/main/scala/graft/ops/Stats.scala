package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, IntegerType}

/** ANALYZE — table/column statistics collection, the maintenance pass
  * that feeds a cost-based optimizer (row counts for join reordering,
  * NDV for aggregate estimates, min/max for range pruning). Catalog
  * engines run it as `ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS
  * ...`; this operator is the same computation as a relation, so the
  * numbers are inspectable and oracle-checkable rather than buried in
  * catalog metadata.
  *
  * Plan shape — an empirical choice, measured not assumed
  * (`ScaleProbe.statsShape`, sf0.1): one COLUMN-PRUNED pass per
  * profiled column, each a single-distinct aggregate (planned without
  * Expand: map-side partial distinct → tiny exchange), 1-row results
  * unioned. On columnar storage the k passes together read ≈ one
  * table's worth of bytes (each pass scans only its column), and each
  * pass's shuffle carries distinct values only. The textbook
  * alternative — ONE scan with all k exact `count(DISTINCT)`s in a
  * single agg — plans as a k+1-way Expand that multiplies mapper rows
  * by k+1 before aggregating, and measured 9.5× slower (9.3 s vs
  * 1.0 s) on 600k×6 at sf0.1; it survives as [[columnStats]] with the
  * probe as the tiebreaker. Production ANALYZE additionally swaps
  * exact NDV for `approx_count_distinct` (HLL++, mergeable — the q17
  * shape) when estimates suffice.
  *
  * Numeric min/max are surfaced through `DECIMAL(18,2)` so the stat
  * table's VARCHAR rendering is engine-independent (raw double→string
  * formatting differs across engines; decimal does not).
  */
object Stats {

  /** Columns q183 profiles (every lineitem type family: integral key,
    * measure double, low-NDV flag, timestamp). */
  val profiled: Seq[String] = Seq(
    "l_orderkey", "l_quantity", "l_extendedprice",
    "l_returnflag", "l_linestatus", "l_shipdate")

  private def asStr(df: DataFrame, c: String)(agg: Column => Column): Column = {
    val v = agg(col(c))
    df.schema(c).dataType match {
      case DoubleType | LongType | IntegerType =>
        v.cast("decimal(18,2)").cast("string")
      case _ => v.cast("string")
    }
  }

  /** The single-scan shape (one agg, multi-distinct via Expand) — kept
    * as the measured-slower alternative; see the object doc. */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__ndv"),
        asStr(df, c)(min).as(s"${c}__min"),
        asStr(df, c)(max).as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', n_rows, `${c}__nulls`, `${c}__ndv`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    one.select(expr(
      s"stack(${cols.length}, $stackArgs) AS " +
        "(column_name, n_rows, n_nulls, n_distinct, min_v, max_v)"))
  }

  /** The default column-stats relation: one column-pruned pass per
    * column — the measured-faster shape (see the object doc). */
  def columnStatsUnion(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.select(col(c)).agg(
        lit(c).as("column_name"),
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        asStr(df, c)(min).as("min_v"),
        asStr(df, c)(max).as("max_v"))
    }.reduce(_.unionByName(_))

  private def duckColStats(c: String, numeric: Boolean): String = {
    val minV = if (numeric) s"CAST(CAST(min($c) AS DECIMAL(18,2)) AS VARCHAR)"
               else s"CAST(min($c) AS VARCHAR)"
    val maxV = if (numeric) s"CAST(CAST(max($c) AS DECIMAL(18,2)) AS VARCHAR)"
               else s"CAST(max($c) AS VARCHAR)"
    s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
       |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  $minV AS min_v, $maxV AS max_v FROM lineitem""".stripMargin
  }

  val queries: Seq[Q] = Seq(

    Q("q183_analyze_stats",
      Some((Seq(
        duckColStats("l_orderkey", numeric = true),
        duckColStats("l_quantity", numeric = true),
        duckColStats("l_extendedprice", numeric = true),
        duckColStats("l_returnflag", numeric = false),
        duckColStats("l_linestatus", numeric = false),
        duckColStats("l_shipdate", numeric = false))
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name"))),
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        columnStatsUnion(li, profiled).orderBy("column_name")
      }),

    // ----- ANALYZE TABLE as statement text, stats PERSISTED (q284):
    //       q183's computation gains the catalog half — `ANALYZE
    //       TABLE ... FOR COLUMNS` lands exact (nulls, NDV, min, max)
    //       as a claim-sidecar marker, `SHOW STATS` reads it back
    //       metadata-only, and `count(DISTINCT c)` statements answer
    //       from the persisted NDV while the stats stay fresh. The
    //       fixture DELETES the data files after ANALYZE, so every
    //       number in this result can only have come from the
    //       registry — a fast path that silently fell back to the
    //       scan would throw, failing the board. Oracle recomputes
    //       all of it from the raw table. -----
    Q("q284_sql_analyze_stats",
      Some("""WITH e AS (SELECT user_id, event_type,
             |  CAST(value AS DECIMAL(18,4)) AS value FROM events)
             |SELECT * FROM (
             |  SELECT 'event_type' AS column_name,
             |    CAST(count(*) AS BIGINT) AS n_rows,
             |    CAST(count(*) - count(event_type) AS BIGINT) AS n_nulls,
             |    CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct,
             |    CAST(min(event_type) AS VARCHAR) AS min_v,
             |    CAST(max(event_type) AS VARCHAR) AS max_v FROM e
             |  UNION ALL
             |  SELECT 'user_id', CAST(count(*) AS BIGINT),
             |    CAST(count(*) - count(user_id) AS BIGINT),
             |    CAST(count(DISTINCT user_id) AS BIGINT),
             |    CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR) FROM e
             |  UNION ALL
             |  SELECT 'value', CAST(count(*) AS BIGINT),
             |    CAST(count(*) - count(value) AS BIGINT),
             |    CAST(count(DISTINCT value) AS BIGINT),
             |    CAST(min(value) AS VARCHAR), CAST(max(value) AS VARCHAR) FROM e
             |  UNION ALL
             |  SELECT 'sql:ndv_fast_path', CAST(count(*) AS BIGINT),
             |    CAST(0 AS BIGINT), CAST(count(DISTINCT user_id) AS BIGINT),
             |    NULL, NULL FROM e)
             |ORDER BY column_name""".stripMargin),
      (s, dir) => {
        import graft.sources.ManifestSql
        import s.implicits._
        val root = sqlAnalyzeRoot(s, dir)
        val stats = ManifestSql.runDml(s, root, "SHOW STATS FOR events_log")
        // the fixture deleted the data files: this statement can only
        // answer from the persisted registry (count(*) from manifest
        // footer counts, NDV from the ANALYZE marker)
        val fast = ManifestSql.runDml(s, root,
          "SELECT count(*) AS n_rows, count(DISTINCT user_id) AS ndv " +
            "FROM events_log").head()
        val sqlRow = Seq(("sql:ndv_fast_path", fast.getLong(0), 0L,
          fast.getLong(1), Option.empty[String], Option.empty[String]))
          .toDF("column_name", "n_rows", "n_nulls", "n_distinct",
            "min_v", "max_v")
        stats.unionByName(sqlRow).orderBy("column_name")
      }),

    // ----- incremental ANALYZE (q317): stats maintenance at O(delta)
    //       — after the full ANALYZE, an append lands and `ANALYZE
    //       TABLE ... UPDATE STATISTICS` merges it: counts add, min/
    //       max fold, NDV unions the persisted HLL sketch with the
    //       delta's, and the re-persisted marker keeps the
    //       count(DISTINCT) metadata fast path SERVING instead of
    //       going dark until the next full rescan. O(delta) is proved
    //       IN-FIXTURE, not claimed: the era-1 data files are DELETED
    //       before the increment runs (a rescan would throw), and
    //       era-2's are deleted before the final statement (which can
    //       therefore only answer from the merged registry). The
    //       tolerance-band oracle (the q90/q145 estimator idiom):
    //       exact n_rows + exact NDV recomputed from raw events, plus
    //       |merged_est − exact|/exact ≤ 5% as an oracle-pinned flag
    //       (default lgConfigK=12 ⇒ ~1.6% rsd — 5% is ≳3σ). -----
    Q("q317_sql_analyze_incremental",
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_ndv,
             |  CAST(1 AS INT) AS approx_ok
             |FROM events""".stripMargin),
      (s, dir) => {
        import graft.sources.ManifestSql
        import s.implicits._
        val root = sqlIncAnalyzeRoot(s, dir)
        // data files are all gone: metadata-only by construction
        val fast = ManifestSql.runDml(s, root,
          "SELECT count(*) AS n_rows, count(DISTINCT user_id) AS ndv " +
            "FROM events_log").head()
        val exact = Tables.load(s, dir, "events")
          .agg(countDistinct(col("user_id"))).head().getLong(0)
        Seq((fast.getLong(0), exact,
          if (math.abs(fast.getLong(1) - exact).toDouble / exact <= 0.05) 1
          else 0))
          .toDF("n_rows", "exact_ndv", "approx_ok")
      })
  )

  /** q284's root: one ranged commit of `events`, ANALYZE persisted
    * through statement text — then the DATA FILES ARE DELETED, so any
    * read that survives is provably metadata-only. */
  def sqlAnalyzeRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-sql-analyze/$fp-${Manifest.layoutKey}") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      Manifest.commitAppendRanged(s, tmp, "events_log", ev, "ts", 4)
      // register the schema (an empty evolving append): the metadata
      // answer path serves column types from the registration instead
      // of inferring them from file footers — the files are about to
      // be deleted
      val _r = Manifest.commitAppendEvolve(s, tmp, "events_log",
        ev.limit(0), allowEvolution = true)
      val rep = graft.sources.ManifestSql.runDml(s, tmp,
        "ANALYZE TABLE events_log COMPUTE STATISTICS " +
          "FOR COLUMNS event_type, user_id, value")
      require(rep.count() == 3L, "staging bug: ANALYZE reported wrong arity")
      graft.ops.Staging.deleteRecursively(
        java.nio.file.Paths.get(s"$tmp/data"))
    }
  }

  /** q317's root: era-1 commits + full ANALYZE, era-1 data files
    * DELETED, era-2 appends, incremental ANALYZE (which can therefore
    * only have scanned era-2), era-2 files deleted too — every number
    * the final statement serves is provably registry-only, and the
    * increment provably never rescanned the analyzed era. */
  def sqlIncAnalyzeRoot(s: SparkSession, dir: String): String = {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    import scala.jdk.CollectionConverters._
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-sql-inc-analyze/$fp-${Manifest.layoutKey}") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      Manifest.commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") < cut), "ts", 4)
      val _r = Manifest.commitAppendEvolve(s, tmp, "events_log",
        ev.limit(0), allowEvolution = true)
      val rep = graft.sources.ManifestSql.runDml(s, tmp,
        "ANALYZE TABLE events_log COMPUTE STATISTICS " +
          "FOR COLUMNS event_type, user_id")
      require(rep.count() == 2L, "staging bug: ANALYZE reported wrong arity")
      // era-1 files vanish BEFORE the increment: O(delta) by proof
      val dataDir = JPaths.get(s"$tmp/data")
      val era1 = { val l = JFiles.list(dataDir)
        try l.iterator().asScala.toList finally l.close() }
      Manifest.commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") >= cut), "ts", 4)
      era1.foreach(Staging.deleteRecursively)
      val inc = graft.sources.ManifestSql.runDml(s, tmp,
        "ANALYZE TABLE events_log UPDATE STATISTICS")
      require(inc.count() == 2L, "staging bug: increment reported wrong arity")
      Staging.deleteRecursively(dataDir)
    }
  }
}
