package graft

import org.apache.spark.sql.functions._

/** The public facade composes end-to-end: ingest → normalize →
  * aggregate, dedup over shingle hashes, and bucket sizing via the
  * hyperplane knob. */
class GraftFacadeSpec extends SparkSuite {
  import spark.implicits._

  test("copyInto -> nullIf -> saltedAggregate pipeline through the facade") {
    val stage = ops.Ingest.writeStageFixtures()
    val df = Graft.copyInto(spark, stage, Seq(ops.Ingest.stagedFileName(ops.Ingest.backfillStart)))
    val agg = Graft.saltedAggregate(df,
      keys = Seq("currency"), saltFrom = Seq("trans_id"),
      partials = Map("n" -> (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c).cast("long"))))
    val byCur = agg.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byCur(Some("USD")) == 5L)
    assert(byCur(None) == 1L) // empty currency normalized to NULL by the COPY path
  }

  test("shingleHashSets + minhashCols cluster identical texts together") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (3L, "a completely different document about spark engines")
    ).toDF("doc_id", "text")
    val sig = Graft.shingleHashSets(docs, "text", Seq("doc_id"))
      .select(col("doc_id") +: Graft.minhashCols: _*)
    val clusters = sig.groupBy((1 to 6).map(i => col(s"mh$i")): _*)
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
      .select("keep", "n").as[(Long, Long)].collect().toMap
    assert(clusters(1L) == 2L) // docs 1 and 2 share the full signature
    assert(clusters(3L) == 1L)
  }

  test("hyperplane count sizes the bucket space") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def maxBucket(planes: Int): Int =
      Graft.withNormAndBucket(emb, "embedding", Graft.hyperplanes(planes, 64))
        .agg(max("bucket")).head().getInt(0)
    assert(maxBucket(4) < 16)
    assert(maxBucket(8) >= 16) // wider code space actually used
  }
}
