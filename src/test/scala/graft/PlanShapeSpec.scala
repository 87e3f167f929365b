package graft

/** Plan-shape regression tests: the scale properties SURVEY.md §4
  * promises (pushdown, pruning, broadcast dims) must survive future
  * edits, not just hold on the day they were checked. */
class PlanShapeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q01: shipdate filter is pushed to the parquet scan") {
    val p = formatted("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("q01: scan reads only the needed lineitem columns") {
    val p = formatted("q01_pricing_summary")
    val read = p.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(!read.contains("l_orderkey") && !read.contains("l_partkey")
      && read.contains("l_quantity") && read.contains("l_returnflag"))
  }

  test("q17: distinct + sketch aggregate plans without Expand") {
    // Mixing countDistinct with a regular agg would plan an Expand whose
    // partial phase keeps one ~16 KB HLL sketch per (flag, partkey)
    // group; the dedup-then-sketch shape must keep the plan Expand-free
    // so sketch buffers stay one-per-final-group.
    val p = formatted("q17_approx_count_distinct")
    assert(!p.contains("Expand"), p)
  }

  test("q03: dimension joins broadcast, fact side streams") {
    val p = formatted("q03_top_revenue_orders")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q32: 5-way star join is all-broadcast (single fact scan pass)") {
    val p = formatted("q32_regional_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 5)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q02: predicate pushdown covers IN / range / LIKE prefix") {
    val p = formatted("q02_filter_predicates")
    assert(p.contains("PushedFilters") && p.contains("In(o_orderstatus")
      && p.contains("GreaterThanOrEqual(o_totalprice"))
  }

  test("q65: part dim is broadcast against the streaming lineitem side") {
    val p = formatted("q65_promo_revenue")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"))
  }

  test("q48: query set broadcasts; only window + final-sort shuffles") {
    val p = formatted("q48_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin")) // pure non-equi pair filter
    // two non-broadcast exchanges: hash by q_id (window), range (orderBy)
    assert("\\bExchange \\(".r.findAllIn(p).size <= 2, p)
  }

  test("q64: pure theta join plans as broadcast nested loop") {
    val p = formatted("q64_theta_join")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("q66: unpivot is shuffle-free up to the final sort") {
    val p = formatted("q66_unpivot")
    // Expand (the unpivot physical op) + scan + one range exchange for orderBy
    assert(p.contains("Expand"))
    assert("\\bExchange \\(".r.findAllIn(p).size <= 1, p)
  }

  test("q67: null-safe join still plans as a broadcast HASH join") {
    val p = formatted("q67_nullsafe_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q73: merge upsert co-shuffles both sides once on the key") {
    val p = formatted("q73_merge_upsert")
    // one exchange per join side + one range exchange for the final sort
    assert("\\bExchange \\(".r.findAllIn(p).size <= 3, p)
  }

  test("q75: hash-sample scan reads only the three needed columns") {
    val read = formatted("q75_hash_sample").linesIterator
      .find(_.startsWith("ReadSchema")).get
    assert(read.contains("o_orderkey") && read.contains("o_orderstatus")
      && read.contains("o_totalprice") && !read.contains("o_orderdate")
      && !read.contains("o_custkey"))
  }

  test("q77: dedup clustering has no join — one hash aggregation chain") {
    val p = formatted("q77_dedup_clusters")
    assert(!p.contains("Join"), p)
  }

  test("q91: all three ranking functions share ONE window sort pass") {
    val p = formatted("q91_ranking_suite")
    assert("\\bWindow \\(".r.findAllIn(p).size == 1, p)
  }

  test("q97: fuzzy matching pairs the deduplicated key domain via broadcast") {
    val p = formatted("q97_levenshtein_fuzzy")
    assert(p.contains("BroadcastNestedLoopJoin")) // non-equi name < name
    assert(!p.contains("SortMergeJoin"))
  }

  test("q98: histogram is scan → partial agg → one shuffle (+ final sort)") {
    val p = formatted("q98_histogram_bins")
    assert(!p.contains("Join"))
    assert("\\bExchange \\(".r.findAllIn(p).size <= 2, p)
  }

  test("q100: sampling decision never reads the text column") {
    val read = formatted("q100_stratified_sample").linesIterator
      .find(_.startsWith("ReadSchema")).get
    assert(read.contains("doc_id") && read.contains("source")
      && !read.contains("text"), read)
  }

  test("q102: packing is one window pass + one aggregation, no join") {
    val p = formatted("q102_sequence_packing")
    assert(!p.contains("Join"))
    assert("\\bWindow \\(".r.findAllIn(p).size == 1, p)
  }

  test("q118: three funnel stages share ONE shuffle below the windows") {
    val p = formatted("q118_funnel")
    assert(!p.contains("Join"), p)
    assert("\\bWindow \\(".r.findAllIn(p).size == 3, p)
    // exactly one exchange sits below the window chain (the other two
    // belong to the distinct-count aggregate above it): the windows
    // share a single user_id shuffle + sort
    val belowWindows = p.linesIterator
      .dropWhile(l => !l.contains("+- Window")).mkString("\n")
    assert("\\+- Exchange".r.findAllIn(belowWindows).size == 1, p)
  }

  test("q119: first-touch side broadcasts; events never self-join by shuffle") {
    val p = formatted("q119_cohort_retention")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q123: PII sweep is row-local — no join anywhere in the plan") {
    val p = formatted("q123_pii_scrub")
    assert(!p.contains("Join"), p)
  }

  test("q124: eval set broadcasts; the corpus side never sort-merge joins") {
    val p = formatted("q124_contamination")
    // one-row eval array × corpus = broadcast nested loop; the overlap
    // math is row-local array_intersect after that
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q126: k-means assignment is corpus × broadcast centroids") {
    val p = formatted("q126_kmeans_step")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q289: the trigram profile broadcasts; the corpus side never sort-merge joins") {
    val p = formatted("q289_lang_id")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q293: BM25 never cartesians; the posting-list agg is map-side partial") {
    val p = formatted("q293_bm25_topk")
    // the query-term set is tiny and every join against it is keyed —
    // a cartesian/nested-loop anywhere means the corpus self-joined
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), p)
  }

  test("q291: the vocab-sized log-ratio table is NOT hint-broadcast") {
    // Heaps'-law vocabularies are corpus-scale frames: the doc-scoring
    // join must stay an honest keyed join that AQE may (at fixture
    // scale) choose to broadcast — a *hint* would force an OOM at
    // 100×. The only permitted hint is the broadcast(tot) on the
    // 1-row totals frame.
    val analyzed = graft.SparkEntry.queries("q291_importance_select")(
      spark, "/root/testdata/sf0.001").queryExecution.analyzed
    val hinted = analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    // the totals frame appears once per plan-tree reuse of the scoring
    // subquery, so assert WHAT is hinted, not how often: every hint
    // must wrap the 1-row totals aggregate (columns nr/v/nt), never
    // the token-keyed lr table (columns t/lr_e4)
    assert(hinted.nonEmpty)
    hinted.foreach { h =>
      val out = h.child.output.map(_.name).toSet
      assert(out.subsetOf(Set("nr", "v", "nt")),
        s"a broadcast hint wraps a non-totals frame with columns $out")
    }
  }

  test("q128: chunk dedup is explode → partial agg → one keyed shuffle") {
    val p = formatted("q128_chunk_dedup")
    assert(!p.contains("Join"), p)
    // count(DISTINCT doc_id) expands to a two-level aggregate: partial
    // by (chunk, doc_id), re-agg by chunk, then the final range sort —
    // three exchanges total, all keyed, none corpus-wide
    assert("\\bExchange \\(".r.findAllIn(p).size <= 3, p)
    assert(p.contains("partial_count"), p)
  }

  test("q138: random projection is row-local — no join, no mid-plan exchange") {
    val p = formatted("q138_random_projection")
    assert(!p.contains("Join"), p)
    // scan → project/explode → one range exchange for the final sort
    assert("\\bExchange \\(".r.findAllIn(p).size <= 1, p)
  }

  test("q139: LM training and scoring are keyed joins — never a cartesian") {
    val p = formatted("q139_bigram_lm_score")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q140: drift monitor scans never read beyond ts and event_type") {
    // the grid branches each prune to their own need (days: ts only;
    // types: event_type only) — no scan may touch the wide columns
    val reads = formatted("q140_daily_drift").linesIterator
      .filter(_.startsWith("ReadSchema")).toSeq
    assert(reads.nonEmpty)
    reads.foreach(r => assert(!r.contains("props") && !r.contains("value")
      && !r.contains("user_id") && !r.contains("event_id"), r))
  }

  test("q144: entropy never reads non-text columns and has no join but the keyed n-join") {
    val p = formatted("q144_char_entropy")
    val read = p.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(read.contains("doc_id") && read.contains("text")
      && !read.contains("source") && !read.contains("lang"), read)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q149: CDC chunking has no join — window + two agg shuffles only") {
    val p = formatted("q149_cdc_chunks")
    assert(!p.contains("Join"), p.linesIterator.filter(_.contains("Join")).mkString("\n"))
    assert("\\bExchange \\(".r.findAllIn(p).size <= 3, p)
  }

  test("q151: vocabulary joins broadcast; totals are 1-row broadcasts") {
    val p = formatted("q151_pmi_collocations")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
    assert(!p.contains("SortMergeJoin"))
    // the only nested-loop joins are the two single-row totals frames
    // (count tree lines, not the repeated detail-section headers)
    assert("BroadcastNestedLoopJoin Cross".r.findAllIn(p).size <= 2)
  }

  test("q153/q155: dedup screens are keyed equi-joins, never cartesian") {
    for (n <- Seq("q153_split_decontamination", "q155_delta_dedup")) {
      val p = formatted(n)
      assert(!p.contains("CartesianProduct"), n)
      assert(!p.contains("BroadcastNestedLoopJoin"), n)
    }
  }

  test("q156/q157: window ops are join-free with one hash + one sort exchange") {
    for (n <- Seq("q156_forward_fill", "q157_token_budget")) {
      val p = formatted(n)
      assert(!p.contains("Join"), n)
      assert("\\bExchange \\(".r.findAllIn(p).size <= 2, n)
    }
  }

  test("q158: datasheet is one scan → grouped agg, no join") {
    val p = formatted("q158_corpus_datasheet")
    assert(!p.contains("Join"))
    assert("\\bExchange \\(".r.findAllIn(p).size <= 2, p)
  }

  test("dynamic partition pruning: dim filter prunes the partitioned fact scan") {
    import org.apache.spark.sql.functions._
    // The q172 layout: orders partitioned by month (the production
    // layout for a date-partitioned 100 TB fact), plus a month dim
    // whose FILTER column is not the join key — so only a runtime DPP
    // subquery, not static constraint propagation, can prune the scan.
    // Asserting on the SHARED builder means the plan checked here is
    // exactly the plan the q172 correctness gate executes.
    val (fact, dim) = graft.ops.ScaleOps.dppJoinSides(spark, dir)
    val nMonths = fact.select("o_month").distinct().count()
    val joined = fact.join(dim, Seq("o_month"))
      .groupBy("o_month").agg(count(lit(1)).as("n"))
    // plan shape: the fact scan's partition filters carry a DPP expression
    val p = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("dynamicpruningexpression"), p)
    // execution: the scan touches only 1995's 12 partitions, not all ~84
    assert(joined.collect().length == 12)
    // AQE wraps materialized stages in QueryStageExec leaves — recurse
    // through them to reach the physical parquet scans
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val factScan = scans(joined.queryExecution.executedPlan)
      .find(_.partitionFilters.nonEmpty).get
    val partsRead = factScan.metrics("numPartitions").value
    assert(partsRead == 12, s"expected 12 pruned partitions, read $partsRead of $nMonths")
    assert(nMonths > 50) // the pruning is real: 12 of ~84
  }

  test("q188: the row-access policy join is a broadcast semi-join") {
    val plan = formatted("q188_policy_read")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"policy join should broadcast, plan:\n${plan.take(800)}")
    // no shuffle before the final sort: policy filtering rides the scan
    assert(!plan.split("Sort").head.contains("Exchange hashpartitioning"))
  }

  test("q182: the erasure rewrite scans only the subjects' buckets") {
    import graft.ops.Lifecycle
    val src = Lifecycle.bucketLayout(spark, dir)
    val scan = spark.read.parquet(src)
      .filter(org.apache.spark.sql.functions.col("u_bucket")
        .isin(Lifecycle.affectedBuckets: _*))
      .queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    assert(scan.partitionFilters.nonEmpty)
    val sel = scan.selectedPartitions.partitionCount
    assert(sel <= Lifecycle.affectedBuckets.size,
      s"read $sel partitions for ${Lifecycle.affectedBuckets.size} affected buckets")
  }

  test("q205: verbatim SQL over a manifest view prunes files inside the plan") {
    import graft.ops.Manifest
    val root = Manifest.statsRoot(spark, dir)
    val index = graft.sources.ManifestSql.register(
      spark, root, "events_log", "events_log_mf_spec")
    val df = spark.sql(
      """SELECT count(*) AS n FROM events_log_mf_spec
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-15 00:00:00'""".stripMargin)
    df.collect()
    // the scan's own metric proves the prune happened in the PLAN, not
    // in user code; the index hook pins the exact (kept, total).
    // (AQE wraps the executed plan: descend through the adaptive root
    // and materialized query stages to reach the scan)
    def findScan(p: org.apache.spark.sql.execution.SparkPlan):
        Option[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Some(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScan(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScan(q.plan)
      case other => other.children.iterator.flatMap(findScan(_)).nextOption()
    }
    val scan = findScan(df.queryExecution.executedPlan).get
    val (kept, total) = index.lastPrune
    assert(total == 16 && kept < total,
      s"expected a strict file prune, kept $kept/$total")
    assert(scan.metrics("numFiles").value == kept)
    // pruned result must equal the unpruned recomputation (stats bound,
    // never filter)
    val direct = Manifest.readTable(spark, root, "events_log")
      .filter(org.apache.spark.sql.functions.col("ts")
        .between("2024-01-08 00:00:00", "2024-01-14 23:59:59.999999"))
      .count()
    assert(df.collect().head.getLong(0) == direct)
  }

  test("q206: a trailing-Z-dimension SQL predicate still prunes; unknowns keep files") {
    import graft.ops.Manifest
    val root = Manifest.zorderRoot(spark, dir)
    val index = graft.sources.ManifestSql.register(
      spark, root, "events_log", "events_zorder_mf_spec")
    spark.sql(
      """SELECT count(*) AS n FROM events_zorder_mf_spec
        |WHERE user_id BETWEEN 2 AND 5""".stripMargin).collect()
    val (kept, total) = index.lastPrune
    assert(kept < total, s"user band should prune the Z layout, kept $kept/$total")
    // a predicate on a column WITHOUT recorded stats keeps every file
    spark.sql(
      "SELECT count(*) AS n FROM events_zorder_mf_spec WHERE value > 1").collect()
    assert(index.lastPrune._1 == total)
  }

  test("q225: IS [NOT] NULL prunes files from recorded null counts") {
    import graft.ops.Manifest
    val root = graft.sources.ManifestSql.nullStatsRoot(spark, dir)
    val index = graft.sources.ManifestSql.register(
      spark, root, "events_nulls", "events_nulls_prune_spec")
    val total = {
      spark.sql("SELECT count(*) FROM events_nulls_prune_spec").collect()
      index.lastPrune._2
    }
    // IS NOT NULL: the two all-null files (days < 10 slice) drop
    spark.sql(
      "SELECT count(*) FROM events_nulls_prune_spec WHERE value IS NOT NULL")
      .collect()
    val keptNotNull = index.lastPrune._1
    assert(keptNotNull < total, s"all-null files should prune, kept $keptNotNull/$total")
    // IS NULL: the null-free middle slice drops
    spark.sql(
      "SELECT count(*) FROM events_nulls_prune_spec WHERE value IS NULL")
      .collect()
    val keptNull = index.lastPrune._1
    assert(keptNull < total, s"null-free files should prune, kept $keptNull/$total")
    // an ordinary value predicate inherits the IsNotNull skip: the
    // all-null files drop out of a plain range WHERE too
    spark.sql(
      "SELECT count(*) FROM events_nulls_prune_spec WHERE value > 1.0")
      .collect()
    assert(index.lastPrune._1 <= keptNotNull)
    // correctness alongside the pruning: counts match an un-pruned read
    val raw = Manifest.readTable(spark, root, "events_nulls")
    val nNull = spark.sql(
      "SELECT count(*) FROM events_nulls_prune_spec WHERE value IS NULL")
      .head().getLong(0)
    assert(nNull == raw.filter(raw("value").isNull).count())
    val nNotNull = spark.sql(
      "SELECT count(*) FROM events_nulls_prune_spec WHERE value IS NOT NULL")
      .head().getLong(0)
    assert(nNotNull == raw.filter(raw("value").isNotNull).count())
  }

  test("q237: a pushed IN-list prunes files through bloom sidecars") {
    import graft.ops.Manifest
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = Manifest.bloomRoot(spark, dir)
    val index = graft.sources.ManifestSql.register(
      spark, root, "orders_idx", "orders_bloom_spec")
    val keys = graft.Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 7 === 0)
      .orderBy("o_orderkey").limit(5)
      .select(col("o_orderkey").cast("long")).as[Long].collect().toSeq
    val hit = spark.sql(
      s"SELECT count(*) FROM orders_bloom_spec WHERE o_orderkey IN (${keys.mkString(", ")})")
      .head().getLong(0)
    val (kept, total) = index.lastPrune
    assert(total == 16 && kept < total,
      s"blooms should prune the hash-scattered layout, kept $kept/$total")
    // zero false negatives: the pruned scan finds every key
    assert(hit == keys.size.toLong)
    // a range predicate cannot use the bloom: every file kept (the
    // hash layout gives min/max no power, and blooms only answer
    // point shapes)
    spark.sql("SELECT count(*) FROM orders_bloom_spec WHERE o_orderkey > 0")
      .collect()
    assert(index.lastPrune._1 == total)
  }

  test("DV-delete scan: the predicate pushes past the metadata projection") {
    import org.apache.spark.sql.functions._
    // mirror Manifest.deleteVectorsBy's scan shape exactly: project
    // data columns + the two computed position columns, THEN the
    // matcher filter. The predicate must still reach the parquet scan
    // as a pushed filter — a wrapper (the old coalesce) or a
    // projection that blocked pushdown would make every DV delete a
    // full-table row scan regardless of selectivity.
    val tdir = java.nio.file.Files.createTempDirectory("graft-dvplan")
      .toString + "/t"
    spark.range(10000).selectExpr("id AS k", "id * 2 AS v")
      .write.parquet(tdir)
    val scanned = spark.read.parquet(tdir)
      .select(col("*"),
        expr("concat('/', regexp_replace(_metadata.file_path, '^[a-z]+:/+', ''))")
          .as("__graft_p"),
        col("_metadata.row_index").as("__graft_ri"))
    val hits = scanned.filter(col("k") > 9990)
      .select(col("__graft_p").as("_p"), col("__graft_ri").as("_ri"))
      .groupBy("_p").agg(count(lit(1)))
    val plan = hits.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters: [IsNotNull(k), GreaterThan(k,9990)]"),
      plan.linesIterator.filter(_.contains("PushedFilters")).mkString("; "))
    graft.ops.Staging.deleteRecursively(java.nio.file.Paths.get(tdir))
  }

  test("committed ANN query plans over the index ONLY — the corpus is never scanned") {
    import graft.ops.{Manifest, Similarity}
    val root = java.nio.file.Files
      .createTempDirectory("graft-annplan").toString
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    Manifest.commitAppend(spark, root, "embeddings", e.coalesce(1))
    Similarity.buildAnnIndex(spark, root, "embeddings", "idx")
    // the query's file scans must read idx_cells/idx_codes paths and
    // NOTHING under the corpus table's data dir — reading even one
    // corpus file would mean the "committed artifact" still pays a
    // corpus-sized cost per query at 100 TB
    val queries = e.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
      .localCheckpoint(true)
    val plan = Similarity.queryAnnIndex(spark, root, "idx", queries)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val scanned = plan.linesIterator
      .filter(_.contains("Location:")).mkString("\n")
    assert(scanned.contains("idx_cells") && scanned.contains("idx_codes"),
      s"expected committed-index scans, got:\n$scanned")
    assert(!scanned.contains("/embeddings"),
      s"committed-index query must not scan the corpus:\n$scanned")
  }
}
