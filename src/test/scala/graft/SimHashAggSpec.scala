package graft

import graft.functions.SimHashAgg
import org.apache.spark.sql.functions._

/** The vector-state aggregator must produce bit-identical signatures
  * to the 64-sum expression form behind q42 — same ±1-majority rule,
  * different physical shape (65-int partial state, elementwise merge). */
class SimHashAggSpec extends SparkSuite {

  private def withDocs[T](rows: Seq[(Long, String)])(f: String => T): T = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sha").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    f(dir)
  }

  test("aggregator signatures match the q42 expression form bit-for-bit") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark shuffles keyed data across partitions during wide transformations"),
      (3L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (4L, "a b"),
      (5L, "singleword"))
    withDocs(rows) { dir =>
      val expected = SparkEntry.queries("q42_simhash")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val agg = udaf(SimHashAgg)
      val actual = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .withColumn("m", md5(col("token")))
        .withColumn("h", expr("cast(conv(substring(m, 1, 14), 16, 10) as bigint)"))
        .withColumn("h2", expr("cast(conv(substring(m, 15, 2), 16, 10) as bigint)"))
        .withColumn("th", expr("h | shiftleft(h2, 56)"))
        .groupBy("doc_id").agg(agg(col("th")).as("simhash"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(actual == expected)
      assert(actual(1L) == actual(3L)) // identical docs, identical signature
    }
  }

  test("merge is lossless: split-input partials equal whole-input state") {
    val tokens = (1 to 101).map(i => (i % 7).toLong * 0x9E3779B97F4A7CL + i)
    val whole = tokens.foldLeft(SimHashAgg.zero)(SimHashAgg.reduce)
    val (l, r) = tokens.splitAt(40)
    val merged = SimHashAgg.merge(
      l.foldLeft(SimHashAgg.zero)(SimHashAgg.reduce),
      r.foldLeft(SimHashAgg.zero)(SimHashAgg.reduce))
    assert(SimHashAgg.finish(whole) == SimHashAgg.finish(merged))
    assert(whole.toSeq == merged.toSeq)
  }
}
