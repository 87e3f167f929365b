package graft

import graft.ops.Training

/** Property checks for the iterative trainers in `ops.Training`
  * (oracle exactness is the driver's job — these pin the loop
  * invariants the 100-TB story depends on). */
class TrainingSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    Training.queries.find(_.name == name).get.fn(spark, sf)

  test("q288 every round partitions the corpus across clusters") {
    val rows = q("q288_kmeans_train").collect()
    val total = Tables.load(spark, sf, "embeddings").count()
    val byRound = rows.groupBy(_.getAs[Long]("rnd"))
    assert(byRound.keySet == Set(1L, 2L, 3L))
    byRound.foreach { case (rnd, rs) =>
      // assignment is total and exclusive: member counts sum to the
      // corpus at EVERY round (a dropped/duplicated vector would skew it)
      assert(rs.map(_.getAs[Long]("n_members")).sum == total,
        s"round $rnd member counts do not partition the corpus")
      rs.foreach { r =>
        val c = r.getAs[Double]("cohesion")
        assert(c >= -1.0001 && c <= 1.0001, s"cohesion $c out of range")
        assert(r.getAs[Double]("centroid_norm") > 0.0)
      }
    }
  }

  test("q289 accuracy arithmetic is consistent and the split is honored") {
    val rows = q("q289_lang_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val c = r.getAs[Long]("n_correct")
      assert(c >= 0 && c <= n)
      assert(math.abs(r.getAs[Double]("acc") -
        math.round(c * 10000.0 / n) / 10000.0) < 1e-12)
    }
    // the classified set is bounded by the test half (odd doc_ids)
    val testHalf = Tables.load(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.expr(
        "doc_id % 2 = 1 AND length(text) >= 3"))
      .count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum <= testHalf)
  }
}
