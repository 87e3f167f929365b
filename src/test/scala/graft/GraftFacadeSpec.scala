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

  test("connectedComponents + keepBestPerCluster ship one survivor per cluster") {
    // two clusters: {1,2,3} (chained 1-2, 2-3) and {10,11}
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val scored = Seq((1L, 0.2), (2L, 0.9), (3L, 0.9), (10L, 0.5), (11L, 0.4))
      .toDF("doc_id", "score")
    val kept = Graft.keepBestPerCluster(
        Graft.connectedComponents(edges), scored)
      .select("component", "n_members", "kept_doc", "kept_score")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // cluster 1: docs 2 and 3 tie on score — id tiebreak keeps 2
    assert(kept.toSeq == Seq((1L, 3L, 2L, 0.9), (10L, 2L, 10L, 0.5)))
  }

  test("cdcChunks reassembles each doc losslessly and keys chunks by content") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val back = Graft.cdcChunks(docs).orderBy("chunk")
      .select("chunk_text").as[String].collect().mkString(" ")
    assert(back == "alpha beta gamma delta epsilon zeta eta theta")
  }

  test("gramHashes emits distinct 56-bit keys and respects the n floor") {
    val docs = Seq((1L, "a b c d e f g h i"), (2L, "too short")).toDF("doc_id", "text")
    val g = Graft.gramHashes(docs)
    assert(g.filter(col("doc_id") === 2L).count() == 0) // < 8 tokens → no grams
    assert(g.filter(col("doc_id") === 1L).count() == 2) // 9 tokens → 2 8-grams
    assert(g.schema("gram").dataType.typeName == "long")
  }

  test("auditedWrite collects metrics on the write pass itself") {
    val df = Seq((1L, 10.0), (2L, 200.0), (3L, 30.0)).toDF("id", "v")
    val m = Graft.auditedWrite(df, Seq(
      count(lit(1)).as("n"),
      count(when(col("v") > 100, 1)).as("n_big"),
      round(sum(col("v")), 2).as("total")))
    assert(m("n") == 3L && m("n_big") == 1L && m("total") == 240.0)
  }

  test("table-format facade: append, merge, delete, prune, time travel round-trip") {
    val root = java.nio.file.Files.createTempDirectory("graft-facade-table").toString
    val t1 = Seq((1L, 10.0), (2L, 20.0), (5L, 50.0)).toDF("k", "v")
    Graft.tableAppendStats(spark, root, "t", t1, Seq("k"), "k", 2)
    assert(Graft.tableVersion(root) == 1L)
    // merge: replace k=2, insert k=9
    Graft.tableMergeUpsert(spark, root, "t",
      Seq((2L, 22.0), (9L, 90.0)).toDF("k", "v"), "k")
    val merged = Graft.tableRead(spark, root, "t").orderBy("k").collect()
    assert(merged.map(_.getLong(0)).toSeq == Seq(1L, 2L, 5L, 9L))
    assert(merged.find(_.getLong(0) == 2L).get.getDouble(1) == 22.0)
    // stats-pruned read bounds the file set
    val (pruned, read, total) = Graft.tableReadPruned(spark, root, "t",
      Seq(ops.Manifest.Pred("k", "1", "1", "bigint")))
    assert(read <= total && pruned.filter(col("k") === 1L).count() == 1L)
    // delete k>=5; time travel still serves the pre-delete state
    Graft.tableDeleteWhere(spark, root, "t",
      Seq(ops.Manifest.Pred("k", "5", "9", "bigint")), col("k") >= 5L)
    assert(Graft.tableRead(spark, root, "t").count() == 2L)
    assert(Graft.tableRead(spark, root, "t", version = 2L).count() == 4L)
    // vacuum to the newest snapshot; the table still reads
    val (_, live) = Graft.tableVacuum(spark, root, keep = 1)
    assert(live > 0 && Graft.tableRead(spark, root, "t").count() == 2L)
    ops.Staging.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("round-10 facade: restore/tag/count/feed/checks/stream round-trip") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-facade10").toString
    Graft.tableAppendStats(spark, root, "t",
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), Seq("k"), "k", 1)
    Graft.tableAddCheck(spark, root, "t", "pos", "v >= 0")
    intercept[IllegalArgumentException] {
      Graft.tableAppend(spark, root, "t", Seq((3L, -1.0)).toDF("k", "v"))
    }
    Graft.tableDeleteVectors(spark, root, "t", col("k") === 2L)
    assert(Graft.tableCount(spark, root, "t") == 1L)
    val tagV = Graft.tableTag(root, "pin")
    val restored = Graft.tableRestore(spark, root, "t", toVersion = 1L)
    assert(restored > tagV)
    assert(Graft.tableReadTag(spark, root, "t", "pin").count() == 1L)
    assert(Graft.tableCount(spark, root, "t") == 2L)
    val feed = Graft.tableChangeFeed(spark, root, "t", 0L)
    assert(feed.columns.contains("_change_type"))
    // streaming facade: the reader wires root/table/options through
    val sdf = Graft.readStreamTable(spark, root, "t",
      maxVersionsPerTrigger = Some(1L))
    assert(sdf.isStreaming && sdf.columns.sameElements(Array("k", "v")))
    val hist = Graft.runDml(spark, root,
      "INSERT INTO t VALUES (7L, 7.0D); SELECT 1 AS one")
    assert(hist.count() == 1L)
    assert(Graft.tableCount(spark, root, "t") == 3L)
    ops.Staging.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
