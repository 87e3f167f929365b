package graft

import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {

  private def emb(rows: (Long, Seq[Float], Int)*): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    rows.toSeq.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def unit(i: Int): Seq[Float] =
    (0 until 64).map(d => if (d == i) 1f else 0f)

  test("brute-force top-k ranks an identical vector first with cos 1.0") {
    val dir = emb(
      (0L, unit(0), 0),
      (100L, unit(0), 0), // identical to query 0
      (101L, unit(1), 0), // orthogonal
      (102L, (0 until 64).map(d => if (d == 0) 0.5f else if (d == 1) 0.5f else 0f), 0))
    val out = SparkEntry.queries("q48_cosine_topk")(spark, dir)
      .filter(col("q_id") === 0).orderBy("rn").collect()
    assert(out.head.getLong(1) == 100L && out.head.getDouble(2) == 1.0)
    // 45° vector next (cos ≈ 0.7071), orthogonal last (0.0)
    assert(out(1).getLong(1) == 102L && math.abs(out(1).getDouble(2) - 0.7071) < 1e-9)
    assert(out(2).getLong(1) == 101L && out(2).getDouble(2) == 0.0)
  }

  test("LSH buckets identical vectors together (ANN finds exact dup)") {
    val dir = emb((0L, unit(3), 0), (7L, unit(3), 0), (8L, unit(9), 1))
    val out = SparkEntry.queries("q49_ann_lsh_topk")(spark, dir)
      .filter(col("q_id") === 0).collect()
    assert(out.exists(r => r.getLong(2) == 7L && r.getDouble(3) == 1.0))
  }

  test("near-dup pairs are symmetric-free (d1 < d2) and thresholded") {
    val dir = emb((1L, unit(5), 0), (2L, unit(5), 0), (3L, unit(6), 0))
    val out = SparkEntry.queries("q50_embedding_neardup")(spark, dir).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(out.head.getDouble(2) == 1.0)
  }
}
