package graft

import graft.ops.Graph

class GraphSpec extends SparkSuite {

  private def cc(edges: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    Graph.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain closes transitively (pairs that never met share a component)") {
    // 1-2, 2-3, 3-4: 1 and 4 are 3 hops apart
    assert(cc((1L, 2L), (2L, 3L), (3L, 4L)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint clusters keep distinct components; min id labels each") {
    val got = cc((10L, 11L), (11L, 12L), (20L, 21L), (5L, 12L))
    assert(got == Map(5L -> 5L, 10L -> 5L, 11L -> 5L, 12L -> 5L, 20L -> 20L, 21L -> 20L))
  }

  test("edge direction does not matter") {
    assert(cc((2L, 1L), (2L, 3L)) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("self-loops and duplicate edges are harmless") {
    assert(cc((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L)) == Map(1L -> 1L, 2L -> 1L))
  }

  test("pagerank conserves mass and ranks the sink of a chain highest") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 1 → 2, 1 → 3, 2 → 3: node 3 receives from both and must rank top;
    // 3 is dangling, so its mass teleports and total mass stays 1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r = graft.ops.Graph.pagerank(edges, iters = 10)
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"mass not conserved: ${r.values.sum}")
    assert(r(3L) > r(2L) && r(2L) > r(1L), s"expected r3 > r2 > r1, got $r")
  }
}
