package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the transitive
  * closure a near-dup pipeline needs: MinHash-LSH emits PAIRS, but the
  * keep-one-per-group decision needs whole CLUSTERS (A~B, B~C ⇒ {A,B,C}
  * even though A,C never shared a bucket).
  *
  * Algorithm: iterative min-label propagation. Each node starts labeled
  * with itself; every round each node takes the min of its own label
  * and its neighbors' labels; converged when no label changes. Rounds =
  * graph diameter; near-dup graphs are unions of small dense clusters,
  * so diameter is tiny (2-4) regardless of corpus size. Each round is
  * one shuffle keyed by node id — no driver-side graph state, edges
  * never leave the cluster. (For adversarial long-chain graphs the
  * large-star/small-star variant [Kiveris et al., "Connected Components
  * in MapReduce and Beyond"] converges in O(log n) rounds; the
  * propagation loop below is the same join shape, so it swaps in
  * without changing callers.)
  *
  * Lineage discipline: each round's labels reference the previous
  * round's frame TWICE (once through the neighbor join, once through
  * the union), so a naive loop doubles the logical plan every round —
  * after d rounds Catalyst re-analyzes a 2^d-node tree per action, and
  * planning time (not data) dominates. `localCheckpoint()` truncates
  * the plan to the materialized RDD each round, keeping per-round
  * planning O(1). Executor-local checkpoint blocks are lost if an
  * executor dies; on a long-running cluster job prefer
  * `sparkContext.setCheckpointDir` + `checkpoint()` for the same
  * truncation with reliable storage — the loop shape is unchanged.
  */
object Graph {

  /** Connected components of the undirected graph given by `edges`
    * (two numeric columns `src`, `dst`). Returns (`id`, `component`)
    * where `component` is the minimum node id reachable from `id`.
    * Isolated nodes (absent from `edges`) are absent from the result.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // Materialize the edge list ONCE with truncated lineage: the loop
    // re-reads it every round, and an expensive upstream (e.g. an LSH
    // band self-join) must not be re-planned or re-executed per round.
    // The symmetrized view and the initial labels stay LAZY, narrow
    // derivations of it — each was its own eager checkpoint pass
    // before, which bought nothing (a union is no-shuffle, and round
    // 1's plan dedups the labels-init shuffle via exchange reuse) and
    // cost two extra scheduled actions per call (opt guide §1.2:
    // remove passes before tuning what is left).
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    // symmetrized view: propagation below only follows src -> dst
    val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
    // Convergence check: labels are monotonically non-increasing, so the
    // label SUM strictly decreases every round until fixpoint — one
    // scalar aggregate per round instead of a join against the previous
    // labels (decimal(38,0) so billions of 64-bit ids can't overflow).
    // The aggregate runs over the round's freshly-materialized
    // checkpoint blocks, so it costs one partition-count-sized job,
    // never a recompute.
    var prevSum: java.math.BigDecimal = null
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // neighbor labels flow along edges; keep min(own, incoming)
      val incoming = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.unionByName(incoming)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint() // eager: truncates lineage, materializes once
      val s = next.agg(sum(col("component").cast("decimal(38,0)")).as("s")).head.getDecimal(0)
      converged = prevSum != null && s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      i += 1
    }
    labels
  }

  /** PageRank with a FIXED iteration budget (the bounded-rounds form a
    * production pipeline schedules; convergence-to-epsilon is the same
    * loop with the q104-style scalar check). Per round: one keyed join
    * + one keyed agg for incoming mass, a scalar-sized dangling-mass
    * frame crossed in by broadcast (never a driver collect), and a
    * `localCheckpoint` so planning stays O(1) per round regardless of
    * iteration count — the same iterative-lineage discipline
    * [[connectedComponents]] established.
    *
    * @param edges (src, dst) BIGINT pairs; node ids must be globally
    *              unique across both roles. Dangling nodes (no
    *              out-edges) redistribute their mass uniformly.
    */
  def pagerank(edges: DataFrame, iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val deg = e.groupBy("src")
      .agg(count(lit(1)).cast("double").as("outdeg")).localCheckpoint()
    // Node table with a STATIC dangling flag: whether a node has
    // out-edges never changes across rounds, so deciding it once here
    // replaces the per-round `r anti-join deg` (a whole extra join of
    // rank-table × degree-table per iteration) with a flag filter over
    // the round's own rank frame — guide §1.2, don't recompute
    // round-invariants inside the loop.
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(deg.select(col("src").as("node"), col("outdeg")), Seq("node"), "left")
      .select(col("node"), col("outdeg").isNull.as("dang"))
      .localCheckpoint(true)
    val n = nodes.count().toDouble
    // The big per-round join side, PRE-PARTITIONED by its join key and
    // checkpointed WITH that partitioning (LogicalRDD keeps it): every
    // round's `contrib ⋈ r` then shuffles only the rank table (|nodes|
    // rows) while the edge table (|edges| rows — the heavy side at any
    // scale) is never exchanged again. Before, the join was planned
    // from unkeyed caches, so each of the `iters` rounds re-shuffled
    // the edges (guide §2.4: establish a partitioning once, reuse it).
    val contrib = e.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .repartition(col("src")).localCheckpoint(true)
    var r = nodes.withColumn("r", lit(1.0) / lit(n))
    for (_ <- 1 to iters) {
      // scalar-sized dangling mass, crossed in by broadcast INSIDE the
      // round's single action (never a driver collect)
      val dangling = r.filter(col("dang"))
        .agg(coalesce(sum(col("r")), lit(0.0)).as("m"))
      val incoming = contrib.join(r, contrib("src") === r("node"))
        .groupBy(col("dst").as("inode"))
        .agg(sum(col("r") / col("outdeg")).as("s"))
      r = nodes.join(incoming, nodes("node") === col("inode"), "left")
        .crossJoin(broadcast(dangling))
        .select(nodes("node"), nodes("dang"),
          (lit(1.0 - damping) / lit(n)
            + lit(damping) * (coalesce(col("s"), lit(0.0)) + col("m") / lit(n))).as("r"))
        .localCheckpoint(true)
    }
    r.select(col("node"), col("r"))
  }
}
