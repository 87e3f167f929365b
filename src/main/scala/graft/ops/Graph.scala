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
  */
object Graph {

  /** Connected components of the undirected graph given by `edges`
    * (two numeric columns `src`, `dst`). Returns (`id`, `component`)
    * where `component` is the minimum node id reachable from `id`.
    * Isolated nodes (absent from `edges`) are absent from the result.
    *
    * Each iteration caches its labels and unpersists the previous
    * round's — peak storage is two label sets, not the whole history.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // Cache the edge list BEFORE symmetrizing: the union below references
    // it twice, and the propagation loop re-reads it every round — without
    // this, an expensive upstream (e.g. an LSH band self-join) would be
    // re-executed once per reference.
    val e = edges.select(col("src"), col("dst")).cache()
    // symmetrize once: propagation below only follows src -> dst
    val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .cache()
    // Convergence check: labels are monotonically non-increasing, so the
    // label SUM strictly decreases every round until fixpoint — one
    // scalar aggregate per round instead of a join against the previous
    // labels (decimal(38,0) so billions of 64-bit ids can't overflow).
    var prevSum: java.math.BigDecimal = null
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // neighbor labels flow along edges; keep min(own, incoming)
      val incoming = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.unionByName(incoming)
        .groupBy("id").agg(min("component").as("component"))
        .cache()
      val s = next.agg(sum(col("component").cast("decimal(38,0)")).as("s")).head.getDecimal(0)
      converged = prevSum != null && s.compareTo(prevSum) == 0
      prevSum = s
      labels.unpersist()
      labels = next
      i += 1
    }
    e.unpersist()
    labels
  }
}
