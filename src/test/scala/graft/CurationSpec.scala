package graft

import graft.ops.{Corpus, Curation}
import org.apache.spark.sql.functions._

/** Structure checks for the round-5 curation operators (q149–q153).
  * Oracle-exactness is the driver's job; these pin the PROPERTIES each
  * op's 100 TB story depends on.
  */
class CurationSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    Curation.queries.find(_.name == name).get.fn(spark, sf)

  // Crafted-input frames go through the SHIPPED operators — the public
  // cdcChunks/gramHashes take any DataFrame, so the tests must not
  // carry a private re-implementation that could drift.
  private def chunksOf(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    Curation.cdcChunks(docs.toDF("doc_id", "text"))
  }

  test("q149 CDC chunking is shift-robust: a prepended word only perturbs the first chunk") {
    // 200 words with content-defined boundaries; doc 2 = doc 1 with one
    // word prepended. Fixed-offset chunking would misalign every chunk;
    // CDC must re-sync after the boundary containing the edit.
    val words = (1 to 200).map(i => s"w$i").mkString(" ")
    val base = chunksOf(Seq((1L, words))).select("chunk_text")
      .collect().map(_.getString(0)).toSet
    val shifted = chunksOf(Seq((2L, s"extra $words"))).select("chunk_text")
      .collect().map(_.getString(0)).toSet
    val shared = base.intersect(shifted)
    // every base chunk except the one containing the edit point dedups
    assert(shared.size >= base.size - 1,
      s"expected all but one chunk to survive the shift, got ${shared.size}/${base.size}")
    // and chunks reassemble the document losslessly
    val reassembled = chunksOf(Seq((1L, words)))
      .orderBy("chunk").select("chunk_text")
      .collect().map(_.getString(0)).mkString(" ")
    assert(reassembled == words)
  }

  test("q150 split is constant within a signature cluster and matches the hash rule") {
    val out = q("q150_leakage_safe_split").cache()
    // every cluster maps to exactly one split
    assert(out.groupBy("cluster_rep")
      .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1).count() == 0)
    // the split of a cluster is the documented pure hash of its rep
    val bad = out.withColumn("expect", Corpus.splitAssign(col("cluster_rep"), salt = "cls"))
      .filter(col("split") =!= col("expect")).count()
    assert(bad == 0)
    out.unpersist()
  }

  test("q151 PMI is symmetric in marginals and highest for deterministic collocations") {
    import spark.implicits._
    // crafted corpus: "alpha beta" always co-occur (pmi → ln(N·c_ab/(c_a·c_b)) high),
    // "x y" independent-ish filler
    val doc = (("alpha beta " * 10) + ("x y x z y z " * 10)).trim
    val toks = Seq((1L, doc)).toDF("doc_id", "text")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val big = toks.withColumn("w2", lead(col("w"), 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")))
      .filter(col("w2").isNotNull).select(col("w").as("w1"), col("w2"))
    val nTok = toks.count().toDouble
    val nBig = big.count().toDouble
    def cnt(df: org.apache.spark.sql.DataFrame, cond: org.apache.spark.sql.Column) =
      df.filter(cond).count().toDouble
    val pmiAB = math.log((cnt(big, col("w1") === "alpha" && col("w2") === "beta") / nBig) /
      ((cnt(toks, col("w") === "alpha") / nTok) * (cnt(toks, col("w") === "beta") / nTok)))
    val pmiXY = math.log((cnt(big, col("w1") === "x" && col("w2") === "y") / nBig) /
      ((cnt(toks, col("w") === "x") / nTok) * (cnt(toks, col("w") === "y") / nTok)))
    assert(pmiAB > pmiXY, s"deterministic pair must out-score filler: $pmiAB vs $pmiXY")
    // and the fixture query emits rounded, rank-stable output
    val rows = q("q151_pmi_collocations").collect()
    assert(rows.length <= 30)
    val pmis = rows.map(_.getAs[Double]("pmi"))
    assert(pmis.sameElements(pmis.sortBy(-_)), "output must be sorted by pmi desc")
  }

  test("q152 CMS estimates are within the guaranteed band (flag always 1)") {
    val out = q("q152_cms_band")
    assert(out.filter(col("within_band") =!= 1).count() == 0)
    assert(out.count() == 10)
  }

  test("q153 finds planted leakage and ignores sub-8-gram overlap") {
    import spark.implicits._
    // doc ids chosen so the q101 hash rule puts 1 in train and the probe
    // docs out of train is not guaranteed for arbitrary ids — instead
    // assert on the fixture output's invariants: every reported doc is
    // non-train and shares at least one 8-gram with some train doc.
    val out = q("q153_split_decontamination").cache()
    assert(out.filter(col("split") === "train").count() == 0)
    assert(out.filter(col("n_shared") < 1).count() == 0)
    out.unpersist()
    // planted check, through the SHIPPED gramHashes: two docs sharing an
    // exact 8-token run produce a shared gram; a 7-token overlap does not
    def grams(text: String) =
      Curation.gramHashes(Seq((1L, text)).toDF("doc_id", "text"))
        .select("gram").collect().map(_.getLong(0)).toSet
    val run8 = "a b c d e f g h"
    assert(grams(s"$run8 tail1 tail2").intersect(grams(s"lead1 lead2 $run8")).nonEmpty)
    assert(grams("a b c d e f g x1 x2").intersect(grams("y1 a b c d e f g y2")).isEmpty)
  }

  test("cdcChunks reassembles 100 random docs losslessly in one job") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val docs = (1L to 100L).map { i =>
      val n = 1 + rng.nextInt(60)
      (i, Seq.fill(n)("w" + rng.nextInt(50)).mkString(" "))
    }
    val back = Curation.cdcChunks(docs.toDF("doc_id", "text"))
      .groupBy("doc_id")
      .agg(expr("concat_ws(' ', transform(array_sort(collect_list(struct(chunk, chunk_text)))," +
        " x -> x.chunk_text))").as("rebuilt"))
      .as[(Long, String)].collect().toMap
    docs.foreach { case (i, text) => assert(back(i) == text, s"doc $i") }
  }

  test("gramHashes emits exactly max(0, n-7) grams for distinct-token docs") {
    import spark.implicits._
    val docs = (1L to 40L).map { i =>
      (i, (1 to i.toInt).map(j => s"t${i}_$j").mkString(" "))
    }
    val counts = Curation.gramHashes(docs.toDF("doc_id", "text"))
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    docs.foreach { case (i, _) =>
      val expected = math.max(0, i.toInt - 7)
      assert(counts.getOrElse(i, 0L) == expected, s"doc $i")
    }
  }

  test("q155 tags every new-batch doc and exact_dups really have an identical corpus text") {
    val out = q("q155_delta_dedup").cache()
    val docs = Tables.load(spark, sf, "documents")
    assert(out.count() == docs.filter(col("doc_id") % 5 === 4).count())
    assert(out.filter(!col("status").isin("kept", "exact_dup", "near_dup")).count() == 0)
    // each exact_dup must join an identical corpus text
    val exact = out.filter(col("status") === "exact_dup")
      .join(docs, "doc_id").select(col("doc_id"), col("text"))
    val unmatched = exact.as("e")
      .join(docs.filter(col("doc_id") % 5 =!= 4).as("c"), col("e.text") === col("c.text"), "left_anti")
      .count()
    assert(unmatched == 0)
    out.unpersist()
  }

  test("q157 selection is a rank prefix and stops within one doc of the budget") {
    val out = q("q157_token_budget").cache()
    // prefix property: selected ranks are exactly 1..n per source
    val prefixBad = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max(col("rn")).as("max_rn"))
      .filter(col("n") =!= col("max_rn")).count()
    assert(prefixBad == 0)
    // every selected doc started strictly under budget
    assert(out.filter(col("cum_tokens") - col("n_tokens") >= 1000).count() == 0)
    out.unpersist()
  }

  test("curation pipeline composes through the public facade: cluster → split → decontaminate") {
    // the end-to-end shape a training-data pipeline actually runs, built
    // ONLY from Graft facade ops, as one declarative composition:
    // near-dup clusters → cluster-keyed split → cross-split 8-gram
    // decontamination → certified-clean eval set
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val sig = Graft.shingleHashSets(docs, "text", Seq("doc_id"))
      .select(col("doc_id") +: Graft.minhashCols: _*)
    val mh = (1 to 6).map(i => col(s"mh$i"))
    val membership = sig
      .withColumn("rep", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(mh: _*)))
      .select(col("doc_id"), col("rep"))
    val split = membership.withColumn("split", Graft.splitAssign(col("rep"), salt = "e2e"))
    // leakage-safety by construction: a cluster never straddles splits
    assert(split.groupBy("rep").agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count() == 0)
    val grams = Graft.gramHashes(docs).join(split.select("doc_id", "split"), "doc_id")
    val trainGrams = grams.filter(col("split") === "train").select("gram").distinct()
    val evalDocs = split.filter(col("split") =!= "train").select("doc_id")
    val contaminated = grams.filter(col("split") =!= "train")
      .join(trainGrams, "gram").select("doc_id").distinct()
    val clean = evalDocs.join(contaminated, Seq("doc_id"), "left_anti")
    // partition property: clean ⊎ contaminated = eval
    assert(clean.count() + contaminated.count() == evalDocs.count())
    // certification: the clean eval set shares NO 8-gram with train
    val residual = Graft.gramHashes(docs.join(clean, "doc_id"))
      .join(trainGrams, "gram").count()
    assert(residual == 0, s"clean eval set still shares $residual grams with train")
  }

  test("q162 split balance is a valid TV distance for both eval splits") {
    val rows = q("q162_split_balance").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == Set("val", "test"))
    rows.values.foreach(tv => assert(tv >= 0.0 && tv <= 1.0, s"TV out of range: $tv"))
  }

  test("q163 stop-grams are document-frequency-sorted with consistent fractions") {
    val docs = Tables.load(spark, sf, "documents").count().toDouble
    val rows = q("q163_stop_grams").collect()
    assert(rows.nonEmpty)
    val freqs = rows.map(_.getAs[Long]("doc_freq"))
    assert(freqs.sameElements(freqs.sortBy(-_)), "must be sorted by doc_freq desc")
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_freq") >= 2)
      assert(math.abs(r.getAs[Double]("doc_frac")
        - math.round(r.getAs[Long]("doc_freq") / docs * 10000) / 10000.0) < 1e-9)
    }
  }

  test("q165 weighted sampling: key math is exact and weight biases the race") {
    import spark.implicits._
    // crafted corpus in a temp dir so the query runs end-to-end
    val dir = java.nio.file.Files.createTempDirectory("graft-es").toString
    val texts = Seq(
      (1L, (1 to 100).map(i => s"a$i").mkString(" "), "s"), // w = 100
      (2L, "one", "s"),                                     // w = 1
      (3L, "x y z", "s"))                                   // w = 3
    texts.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q165_weighted_sample")(spark, dir).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    // keys equal the manual Efraimidis–Spirakis computation
    def key(id: Long, w: Long): Double = {
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"es$id").substring(0, 14), 16)
      math.round(-math.log((h + 1) / 7.2057594037927936e16) / w * 1e6) / 1e6
    }
    texts.foreach { case (id, _, _) =>
      val (w, k, _) = rows(id)
      assert(k == key(id, w), s"doc $id: got $k, want ${key(id, w)}")
    }
    // the assigned ranks must equal the manually computed race order —
    // this is what pins window direction and partitioning (a reversed
    // ORDER BY or wrong partition key would still produce sorted keys)
    val expectedOrder = texts.map { case (id, _, _) => id }
      .sortBy(id => key(id, rows(id)._1))
    val gotOrder = rows.toSeq.sortBy(_._2._3).map(_._1)
    assert(gotOrder == expectedOrder, s"race order $gotOrder != expected $expectedOrder")
  }

  test("q287 encode agrees with an independent word count and bounds its tokens") {
    val enc = q("q287_bpe_encode").collect()
    assert(enc.nonEmpty)
    // n_words must equal a direct count of the trainer's word filter —
    // a vocab join that drops word types would silently under-count
    val direct = Tables.load(spark, sf, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]{2,}$"))
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    enc.foreach { r =>
      val src = r.getAs[String]("source")
      val words = r.getAs[Long]("n_words")
      val toks = r.getAs[Long]("n_bpe_tokens")
      assert(words == direct(src), s"$src word count drifted")
      // every word is >= 1 token, and 6 merges cannot push fertility
      // below 1: tokens bounded below by instances, above by chars
      assert(toks >= words, s"$src tokens < words")
      assert(r.getAs[Double]("fertility") >= 1.0)
      assert(r.getAs[Long]("n_token_types") > 0)
    }
  }

  test("q158 datasheet is one row with sane ranges") {
    val r = q("q158_corpus_datasheet").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_docs") > 0)
    val dup = row.getAs[Double]("dup_rate")
    assert(dup >= 0.0 && dup <= 1.0)
    val div = row.getAs[Double]("mean_diversity")
    assert(div > 0.0 && div <= 1.0)
  }
}
