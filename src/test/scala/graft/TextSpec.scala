package graft

import graft.ops.Text
import org.apache.spark.sql.functions._

class TextSpec extends SparkSuite {

  private def docs(rows: (Long, String, String)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("exact dedup groups identical sorted-token bags") {
    val d = docs(
      (1L, "b a c", "s"), (2L, "c b a", "s"), // same bag, different order
      (3L, "a a b", "s"))
    d.createOrReplaceTempView("t_dedup")
    val out = d
      .withColumn("k", expr("md5(concat_ws(' ', array_sort(split(text, ' '))))"))
      .groupBy("k").agg(min("doc_id").as("kept"), count(lit(1)).as("n"))
      .orderBy("kept").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH finds an exact-duplicate pair with jaccard 1.0") {
    val text = "spark shuffles keyed data across partitions during wide transformations"
    val d = docs((10L, text, "s0"), (20L, text, "s0"),
      (30L, "completely different words that share no shingles at all here", "s1"))
    d.createOrReplaceTempView("documents_test")
    // run the same pipeline as q41 on a temp view by name substitution
    val q = graft.SparkEntry.queries("q41_minhash_lsh_pairs")
    // instead of the fixture, drive the internal logic through a direct call:
    // duplicate docs share every band, so the pair (10,20) must surface.
    val pairs = withDocs(d)(dir => q(spark, dir)).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .contains((10L, 20L, 1.0)))
  }

  test("fingerprint is order-sensitive (rolling hash, not a bag hash)") {
    val d1 = docs((1L, "alpha beta gamma", "s"), (2L, "gamma beta alpha", "s"))
    val fps = withDocs(d1)(dir =>
      graft.SparkEntry.queries("q47_fingerprint")(spark, dir)).collect()
    assert(fps.length == 2)
    assert(fps(0).getLong(1) != fps(1).getLong(1))
  }

  test("simhash of identical docs is identical") {
    val text = "one two three four five six seven eight nine ten"
    val d = docs((1L, text, "s"), (2L, text, "s"))
    val sh = withDocs(d)(dir =>
      graft.SparkEntry.queries("q42_simhash")(spark, dir)).collect()
    assert(sh(0).getLong(1) == sh(1).getLong(1))
  }

  test("containment flags a near-superset pair that Jaccard under-scores") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val d = docs(
      (1L, base, "s"),                                  // contained doc
      (2L, base + " nu xi omicron pi rho sigma tau upsilon", "s"), // superset
      (3L, "totally unrelated words nothing shared here at all friend", "s"))
    val out = withDocs(d)(dir =>
      graft.SparkEntry.queries("q143_shingle_containment")(spark, dir)).collect()
    val pair = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(pair.isDefined, out.mkString(", "))
    assert(pair.get.getDouble(2) == 1.0) // every shingle of doc 1 is in doc 2
    assert(!out.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
  }

  test("char entropy: uniform two-symbol doc is 1 bit, one-symbol doc is 0") {
    val d = docs((1L, "abab", "s"), (2L, "aaaa", "s"))
    val out = withDocs(d)(dir =>
      graft.SparkEntry.queries("q144_char_entropy")(spark, dir))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == 0.0)
  }

  test("big-bucket guard: an over-cap band bucket yields no pairs and is audited") {
    import spark.implicits._
    // synthetic signature frame: `big` docs all share one signature
    // (one bucket of cap+6 per band); docs 9001/9002 share a distinct
    // signature (bucket of 2 — under the cap, must survive)
    val big = (1L to (Text.lshBucketCap + 6L)).map(i => (i, 7L, 7L, 7L, 7L, 7L, 7L))
    val small = Seq((9001L, 5L, 5L, 5L, 5L, 5L, 5L), (9002L, 5L, 5L, 5L, 5L, 5L, 5L))
    val sig = (big ++ small).toDF("doc_id", "mh1", "mh2", "mh3", "mh4", "mh5", "mh6")
    val pairs = Text.bandPairs(sig).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((9001L, 9002L)),
      "over-cap bucket must contribute zero pairs; under-cap bucket survives")
    val audit = Text.lshBucketAudit(sig).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = Text.lshBucketCap + 6L
    assert(audit.length == 3)
    audit.foreach { case (_, nBuckets, maxBucket, nSkippedBuckets, nSkippedPairs) =>
      assert(nBuckets == 2L)
      assert(maxBucket == n)
      assert(nSkippedBuckets == 1L, "exactly the over-cap bucket is skipped")
      assert(nSkippedPairs == n * (n - 1) / 2, "skipped pair count is exact")
    }
  }

  test("bucket guard does not perturb pairs on an all-small-bucket corpus") {
    import spark.implicits._
    val sig = Seq(
      (1L, 1L, 1L, 2L, 2L, 3L, 3L), (2L, 1L, 1L, 9L, 9L, 8L, 8L),
      (3L, 4L, 4L, 9L, 9L, 7L, 7L)).toDF("doc_id", "mh1", "mh2", "mh3", "mh4", "mh5", "mh6")
    // band1 bucket {1,2}; band2 bucket {2,3}; no over-cap buckets
    val pairs = Text.bandPairs(sig).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)))
    val audit = Text.lshBucketAudit(sig).collect()
    assert(audit.forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L))
  }

  test("q292 zipf slope: uniform frequencies fit flat, geometric decay fits steep") {
    def q292(dir: String) =
      Text.queries.find(_.name == "q292_zipf_audit").get.fn(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n_top"), r.getAs[Double]("zipf_slope"))).toMap
    // every token appears exactly once → ln(freq) is constant → the
    // least-squares numerator is exactly zero (integer arithmetic, so
    // EXACTLY, not approximately)
    withDocs(docs((1L, "aa bb cc dd", "u"))) { dir =>
      val (nTop, slope) = q292(dir)("u")
      assert(nTop == 4L)
      assert(slope == 0.0, s"uniform corpus must fit slope 0, got $slope")
    }
    // geometric decay 16/8/4/2/1 → steeply negative fit
    val geo = ("aa " * 16) + ("bb " * 8) + ("cc " * 4) + ("dd " * 2) + "ee"
    withDocs(docs((1L, geo.trim, "g"))) { dir =>
      val (nTop, slope) = q292(dir)("g")
      assert(nTop == 5L)
      assert(slope < -1.0, s"geometric corpus must fit a steep slope, got $slope")
    }
  }

  test("span dedup rewrite: shared 5-gram span removed from both docs, rest survives") {
    // the docs differ (whole-doc dedup keeps both) but share the
    // 5-token boilerplate "one two three four five" — overlapping
    // grams: doc 1 carries it at positions 2..6, doc 2 at 0..4
    val d = docs(
      (1L, "alpha beta one two three four five gamma", "s"),
      (2L, "one two three four five delta epsilon", "s"),
      (3L, "zeta eta theta", "s")) // < 5 tokens: passes through whole
    val out = Text.spanDedupRewrite(d.select("doc_id", "text"))
      .select("doc_id", "new_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // exactly the shared span vanishes; order of survivors preserved
    assert(out == Map(
      1L -> "alpha beta gamma",
      2L -> "delta epsilon",
      3L -> "zeta eta theta"))
    // a doc that IS the shared span rebuilds to the empty string
    val d2 = docs(
      (1L, "one two three four five", "s"),
      (2L, "x one two three four five y", "s"))
    val out2 = Text.spanDedupRewrite(d2.select("doc_id", "text"))
      .select("doc_id", "new_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2 == Map(1L -> "", 2L -> "x y"))
  }

  /** Write the docs DataFrame as a parquet fixture dir so queries that
    * take (spark, sfDir) can run against it. */
  private def withDocs[T](d: org.apache.spark.sql.DataFrame)(f: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toString
    d.select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    f(dir)
  }
}
