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

  test("autoPlanes tiers keep expected bucket occupancy <= target") {
    import graft.ops.Similarity.autoPlanes
    assert(autoPlanes(1000) == 4)
    assert(autoPlanes(1024) == 4)  // boundary: 64 * 2^4
    assert(autoPlanes(1025) == 6)
    assert(autoPlanes(2000) == 6)
    assert(autoPlanes(20000) == 10)
    assert(autoPlanes(Long.MaxValue) == 12) // clamped to the matrix width
    for (n <- Seq(100L, 5000L, 60000L, 200000L)) {
      val p = autoPlanes(n)
      assert(n.toDouble / (1 << p) <= 64.0, s"n=$n p=$p")
    }
  }

  test("random projection preserves exact zero and scaling structure") {
    // proj(0) = 0; proj(2x) = 2*proj(x) — linearity of the sign matrix.
    // q138 emits proj_e4 = floor(raw*2500 + 0.5) as BIGINT (the
    // quantized-integer comparator), so a unit ±0.25 projection is ±625.
    val dir = emb(
      (0L, (0 until 64).map(_ => 0f), 0),
      (1L, (0 until 64).map(d => if (d == 2) 1f else 0f), 0),
      (2L, (0 until 64).map(d => if (d == 2) 2f else 0f), 0))
    val rows = SparkEntry.queries("q138_random_projection")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(rows.size == 48)
    (0 until 16).foreach { j =>
      assert(rows((0L, j)) == 0L)
      // floor quantization is sign-asymmetric by at most 1 ulp of the
      // grid: 2*floor(x+.5) vs floor(2x+.5) agree exactly on the ±625
      // lattice used here
      assert(rows((2L, j)) == 2L * rows((1L, j)))
      // raw dot with a ±1 sign row is ±1; the 1/√16 = 0.25 JL scale is
      // folded into the ×10⁴ fixed-point multiplier: 1 × 2500 = 2500
      assert(math.abs(rows((1L, j))) == 2500L)
    }
  }

  test("q160 semantic dedup drops exact copies, keeps canonicals, keeps distinct vectors") {
    // 1 and 2 are identical (cos = 1 ≥ 0.4 with canonical 1 → 2 dropped);
    // 5 is orthogonal to every canonical it could share a bucket with
    val dir = emb(
      (1L, unit(3), 0),
      (2L, unit(3), 0),
      (5L, unit(7), 0))
    val out = SparkEntry.queries("q160_semantic_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    assert(out(1L)._2 == 1) // canonical always kept
    assert(out(2L) == (1L, 0)) // exact copy of its canonical → dropped
    assert(out(5L)._2 == 1) // either own bucket, or cos 0 < 0.4
    // fixture-level invariants: every bucket keeps its canonical
    val fx = SparkEntry.queries("q160_semantic_dedup")(spark, "/root/testdata/sf0.001")
      .cache()
    assert(fx.filter(col("vec_id") === col("canonical_id"))
      .filter(col("keep") =!= 1).count() == 0)
    assert(fx.filter(!col("keep").isin(0, 1)).count() == 0)
    fx.unpersist()
  }

  test("q222 PQ-ADC: exact duplicate of a codebook seed scores 1.0 e4; quantized strangers score 0") {
    // seeds 0..7 = unit(2i), all inside subspace 0; queries are vec_id<5.
    // 100 copies seed 0 -> codes (c0, c0, c0, c0); its ADC score against
    // query 0 is dtable[q0, m0, c0] = 10000 and 0 elsewhere. 101 copies
    // seed 1 -> subspace-0 code c1, whose q0 table entry is 0.
    val dir = emb(
      ((0L until 8L).map(i => (i, unit(2 * i.toInt), 0)) ++
        Seq((100L, unit(0), 0), (101L, unit(2), 0))): _*)
    val out = SparkEntry.queries("q222_pq_adc_topk")(spark, dir).collect()
    assert(out.length == 15) // 5 queries x top-3
    val q0 = out.filter(_.getLong(0) == 0L).sortBy(_.getInt(3))
    assert(q0.head.getLong(1) == 100L && q0.head.getLong(2) == 10000L)
    // definitional invariants: no self-match, rn dense 1..3 per query
    assert(out.forall(r => r.getLong(0) != r.getLong(1)))
    assert(out.groupBy(_.getLong(0)).forall(_._2.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3)))
  }

  test("q238 IVF-PQ: candidates come only from probed cells; exact dup of a seed wins") {
    // seeds 0..7 = unit(2i): each is its own cell AND its own PQ
    // codebook row. 100 copies seed 0 -> same cell as 0, codes c0 ->
    // ADC score 10000 for query 0. 101 copies seed 4 -> a DIFFERENT
    // cell that query 0 does not probe, so 101 is not even a
    // candidate despite sharing the quantized subspaces 1-3.
    val dir = emb(
      ((0L until 8L).map(i => (i, unit(2 * i.toInt), 0)) ++
        Seq((100L, unit(0), 0), (101L, unit(8), 0))): _*)
    val out = SparkEntry.queries("q238_ivfpq_topk")(spark, dir).collect()
    val q0 = out.filter(_.getLong(0) == 0L).sortBy(_.getInt(3))
    assert(q0.head.getLong(1) == 100L && q0.head.getLong(2) == 10000L)
    assert(!q0.map(_.getLong(1)).contains(101L),
      "a vector outside the probed cells must not be a candidate")
    assert(out.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("q290 affinity matrix: unit diagonal, symmetric-half coverage, bounded cosines") {
    val rows = SparkEntry.queries("q290_label_affinity")(
      spark, "/root/testdata/sf0.001").collect()
    val labels = rows.map(_.getAs[Long]("label_a")).distinct.sorted
    // upper-triangular including the diagonal: k*(k+1)/2 rows exactly
    assert(rows.length == labels.length * (labels.length + 1) / 2)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("label_a"), r.getAs[Long]("label_b"))
      assert(a <= b)
      val c = r.getAs[Double]("rcos")
      if (a == b) {
        assert(c == 1.0, s"self-affinity of $a is $c, not 1.0")
        assert(r.getAs[Long]("n_a") == r.getAs[Long]("n_b"))
      } else assert(c >= -1.0001 && c <= 1.0001)
    }
  }

  test("committed ANN index: existing-name, unknown-index, and rewrite-interval refusals") {
    import graft.ops.{Manifest, Similarity}
    val root = java.nio.file.Files
      .createTempDirectory("graft-ann-spec").toString
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    Manifest.commitAppend(spark, root, "embeddings", e.coalesce(1))
    Similarity.buildAnnIndex(spark, root, "embeddings", "idx")
    // an existing name refuses at claim time (never half-overwrites)
    intercept[IllegalArgumentException] {
      Similarity.buildAnnIndex(spark, root, "embeddings", "idx")
    }
    // a caught-up maintenance quiesces; an unknown index refuses
    assert(Similarity.maintainAnnIndex(spark, root, "idx").isEmpty)
    intercept[IllegalArgumentException] {
      Similarity.maintainAnnIndex(spark, root, "nope")
    }
    // a merge-on-read DELETE now MIRRORS (q337): vec 40's committed
    // cells/codes rows DV out in the same claim as the cursor advance,
    // zero new vectors index, and the re-drive quiesces
    Manifest.commitDeleteVectors(spark, root, "embeddings",
      col("vec_id") === 40L)
    val m = Similarity.maintainAnnIndex(spark, root, "idx")
    assert(m.exists(_._1 == 0L))
    assert(Manifest.readTable(spark, root, "idx_cells")
      .filter(col("vec_id") === 40L).count() == 0L)
    assert(Manifest.readTable(spark, root, "idx_codes")
      .filter(col("vec_id") === 40L).count() == 0L)
    assert(Similarity.maintainAnnIndex(spark, root, "idx").isEmpty)
    // a DV UPDATE re-indexes the post-image: the pre-image's index
    // rows DV out and exactly ONE live cells row remains for the key
    Manifest.commitUpdateVectors(spark, root, "embeddings",
      col("vec_id") === 41L,
      Map("embedding" -> expr("transform(embedding, x -> -x)")))
    val mu = Similarity.maintainAnnIndex(spark, root, "idx")
    assert(mu.exists(_._1 == 1L))
    assert(Manifest.readTable(spark, root, "idx_cells")
      .filter(col("vec_id") === 41L).count() == 1L)
    // a COPY-ON-WRITE rewrite (compaction relocates every row) still
    // refuses toward a rebuild — compressed codes cannot be subtracted
    Manifest.compactTable(spark, root, "embeddings", 1L << 30)
    val ex = intercept[IllegalArgumentException] {
      Similarity.maintainAnnIndex(spark, root, "idx")
    }
    assert(ex.getMessage.contains("rebuild"))
  }
}
