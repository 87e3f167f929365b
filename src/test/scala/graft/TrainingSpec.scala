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

  test("q291 selects exactly the top-10% per source, and the selected " +
    "mean beats the source mean") {
    val rows = q("q291_importance_select").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val sel = r.getAs[Long]("n_selected")
      // deterministic rank selection: EXACTLY ceil(n/10) per source —
      // a sampling-style implementation would only hit this in
      // expectation, and the oracle hash depends on exactness
      assert(sel == math.ceil(n / 10.0).toLong,
        s"source ${r.getString(0)}: $sel selected of $n")
      assert(sel >= 1 && sel <= n)
    }
    // selection takes the TOP of the importance ranking, so the mean
    // selected score must dominate the source's overall mean score —
    // a shuffled / bottom-k selection inverts this
    import org.apache.spark.sql.functions._
    val tok = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        explode(split(col("text"), " ")).as("t"))
      .filter(col("t").rlike("^[a-z]{2,}$"))
    val overall = {
      val rc = tok.groupBy("t").agg(count(lit(1)).as("rc"))
      val tc = tok.filter(col("lang") === "en")
        .groupBy("t").agg(count(lit(1)).as("tc"))
      val tot = rc.agg(sum(col("rc")).as("nr"), count(lit(1)).as("v"))
        .crossJoin(tok.filter(col("lang") === "en")
          .agg(count(lit(1)).as("nt")))
      val lr = rc.join(tc, Seq("t"), "left").crossJoin(broadcast(tot))
        .withColumn("lr_e4", round(log(
          ((coalesce(col("tc"), lit(0L)) + 1) * (col("nr") + col("v")))
            .cast("double")
            / ((col("rc") + lit(1.0))
               * (col("nt") + col("v")).cast("double"))) * 10000)
          .cast("long"))
        .select("t", "lr_e4")
      tok.groupBy("doc_id", "source", "t").agg(count(lit(1)).as("n"))
        .join(lr, "t")
        .groupBy("doc_id", "source")
        .agg(sum(col("n") * col("lr_e4")).as("score_e4"))
        .groupBy("source")
        .agg((sum(col("score_e4")) / count(lit(1)) / 10000.0)
          .as("mean_all"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getAs[Double]("mean_sel_score") >= overall(src),
        s"source $src: selected mean below overall mean")
    }
  }
}
