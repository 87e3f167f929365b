package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Round-5 corpus-curation additions (SURVEY.md §2.9 extensions): the
  * operators that close the loop between dedup machinery and the
  * train/eval hygiene a production LLM-data pipeline needs —
  * content-defined chunking, leakage-safe splits, collocation mining
  * (PMI), mergeable frequency sketches, and cross-split
  * decontamination.
  *
  * Scale rules carried over from `Text`/`Corpus`:
  *  - every hash decision bottoms out in md5 (engine-portable,
  *    partition-independent, pure function of the value);
  *  - candidate generation is always a keyed equi-join or groupBy,
  *    never an all-pairs product;
  *  - joined hash keys are 56-bit BIGINTs (int shuffles), not hex
  *    strings.
  */
object Curation {

  /** 56-bit integer from the first 14 hex chars of md5 — the engine's
    * standard portable hash key (see Text.duckShingleHashes). */
  private def duckHash56(sqlExpr: String): String =
    s"('0x' || substr(md5($sqlExpr), 1, 14))::BIGINT"

  /** PUBLIC content-defined chunking: split each document into
    * variable-length chunks whose boundaries are a pure function of
    * the CONTENT (a word closes a chunk iff the last md5 nibble is
    * '0' ⇒ geometric chunks, mean ~16 words). Returns
    * (id, chunk, chunk_text). Row-local flags + one per-doc window —
    * documents shard freely across executors. */
  def cdcChunks(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
      .withColumn("b", when(substring(md5(col("word")), 32, 1) === "0", 1).otherwise(0))
      .withColumn("chunk", coalesce(sum(col("b")).over(w), lit(0)))
      .groupBy(col(idCol), col("chunk"))
      // order within the chunk is recovered by sorting the collected
      // (pos, word) structs — collect_list order itself is not
      // deterministic, the sort is what makes this engine-portable
      .agg(expr("concat_ws(' ', transform(array_sort(collect_list(struct(pos, word)))," +
        " x -> x.word))").as("chunk_text"))
  }

  /** PUBLIC n-token shingle TEXT: one row per (id, gram) with the gram
    * as human-readable text (not distinct — callers dedup to their
    * need). The single definition of the gram window (sequence bounds,
    * slice offsets, separator) that both the hashed key path and the
    * auditable blocklist path derive from. */
  def textGrams(docs: DataFrame, n: Int = 8, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    docs
      .withColumn("toks", split(col(textCol), " "))
      .filter(size(col("toks")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, size(toks) - $n), i -> concat_ws(' ', slice(toks, i + 1, $n)))"))
        .as("gram"))

  /** PUBLIC n-token shingle hash set: one row per (id, gram) with the
    * gram as the engine's 56-bit portable hash — the key currency for
    * decontamination screens and overlap joins (int shuffles, never
    * hex strings). Distinct per document. */
  def gramHashes(docs: DataFrame, n: Int = 8, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    textGrams(docs, n, idCol, textCol)
      .select(col(idCol), expr(
        "cast(conv(substring(md5(gram), 1, 14), 16, 10) as bigint)").as("gram"))
      .distinct()

  val queries: Seq[Q] = Seq(

    // ----- content-defined chunking (CDC) dedup: chunk boundaries come
    //       from the CONTENT (a word is a cut point iff the last hex
    //       nibble of its md5 is '0' ⇒ geometric chunks, mean ~16
    //       words), not from fixed offsets — so inserting one word near
    //       the top of a document only perturbs the chunk containing
    //       it, and every later chunk still dedups against the
    //       original. Fixed-window chunking (q128) loses ALL alignment
    //       after an edit; CDC is the rsync/backup-dedup shape applied
    //       to corpus text. Plan: row-local boundary flags, one per-doc
    //       window cumsum (docs shard across executors; the window
    //       never crosses them), then a chunk-keyed groupBy — no
    //       pairwise join anywhere. -----
    Q("q149_cdc_chunks",
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             |         generate_subscripts(string_split(text, ' '), 1) AS pos
             |  FROM documents
             |), f AS (
             |  SELECT doc_id, pos, word,
             |    CASE WHEN substr(md5(word), 32, 1) = '0' THEN 1 ELSE 0 END AS b
             |  FROM t
             |), c AS (
             |  SELECT doc_id, pos, word,
             |    coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
             |  FROM f
             |), ch AS (
             |  SELECT doc_id, chunk, string_agg(word, ' ' ORDER BY pos) AS chunk_text
             |  FROM c GROUP BY doc_id, chunk)
             |SELECT chunk_text, CAST(count(*) AS BIGINT) AS n_occ,
             |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |  min(doc_id) AS first_doc
             |FROM ch GROUP BY chunk_text HAVING count(*) >= 2
             |ORDER BY n_occ DESC, chunk_text""".stripMargin),
      (s, dir) =>
        cdcChunks(Tables.load(s, dir, "documents"))
          .groupBy("chunk_text")
          .agg(count(lit(1)).as("n_occ"),
            countDistinct(col("doc_id")).as("n_docs"),
            min(col("doc_id")).as("first_doc"))
          .filter(col("n_occ") >= 2)
          .orderBy(col("n_occ").desc, col("chunk_text"))),

    // ----- leakage-safe train/val/test split: the q101 hash split
    //       assigns DOCUMENTS independently, so two near-duplicate docs
    //       can straddle train and val — the classic eval-leakage bug.
    //       Here the split key is the doc's near-dup CLUSTER
    //       representative (min doc_id per 64-bit SimHash signature;
    //       for transitive clusters substitute the q104
    //       connected-components label — the split logic is unchanged),
    //       so an entire duplicate cluster lands in ONE split by
    //       construction. One signature groupBy-window + a pure hash of
    //       the representative: no join against a membership table, no
    //       state. -----
    Q("q150_leakage_safe_split",
      Some(s"""WITH sig AS (${Text.duckSimhash}),
              |rep AS (
              |  SELECT doc_id, min(doc_id) OVER (PARTITION BY simhash) AS cluster_rep
              |  FROM sig)
              |SELECT doc_id, cluster_rep,
              |  CASE WHEN ('0x' || substr(md5('cls' || CAST(cluster_rep AS VARCHAR)), 1, 14))::BIGINT % 100 < 90
              |         THEN 'train'
              |       WHEN ('0x' || substr(md5('cls' || CAST(cluster_rep AS VARCHAR)), 1, 14))::BIGINT % 100 < 95
              |         THEN 'val'
              |       ELSE 'test' END AS split
              |FROM rep ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        Text.simhashDF(s, dir)
          .withColumn("cluster_rep",
            min(col("doc_id")).over(Window.partitionBy(col("simhash"))))
          .withColumn("split", Corpus.splitAssign(col("cluster_rep"), salt = "cls"))
          .select("doc_id", "cluster_rep", "split")
          .orderBy("doc_id")),

    // ----- PMI collocations: pointwise mutual information
    //       ln(p(ab) / (p(a)·p(b))) over adjacent token pairs — the
    //       standard collocation / multi-word-expression miner (and the
    //       scoring half of a phrase-merging tokenizer pass). Bigrams
    //       come from one per-doc lead() window; unigram and bigram
    //       counts are keyed aggs; the vocabulary join is broadcast
    //       (vocab ≪ corpus — it grows ~Heaps' law, not linearly).
    //       Ordering and the top-30 cut use the ROUNDED score with a
    //       (w1, w2) tiebreak so the rank is engine-stable. -----
    Q("q151_pmi_collocations",
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             |         generate_subscripts(string_split(text, ' '), 1) AS pos
             |  FROM documents
             |), big AS (
             |  SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
             |  FROM t
             |), bi AS (
             |  SELECT w1, w2, count(*) AS n_ab FROM big
             |  WHERE w2 IS NOT NULL GROUP BY w1, w2
             |), uni AS (SELECT w, count(*) AS n_w FROM t GROUP BY w),
             |tot AS (
             |  SELECT (SELECT count(*) FROM t) AS n_tok,
             |         (SELECT sum(n_ab) FROM bi) AS n_big)
             |SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab,
             |  round(ln((CAST(n_ab AS DOUBLE) / n_big)
             |    / ((CAST(a.n_w AS DOUBLE) / n_tok) * (CAST(b.n_w AS DOUBLE) / n_tok))), 4) AS pmi
             |FROM bi JOIN uni a ON a.w = w1 JOIN uni b ON b.w = w2, tot
             |WHERE n_ab >= 5
             |ORDER BY pmi DESC, w1, w2 LIMIT 30""".stripMargin),
      (s, dir) => {
        // the tokenize+posexplode lineage feeds both count families —
        // cache it once (same discipline as Corpus's shared tokenization).
        // No eager checkpoint here: the caller owns the action, and both
        // harnesses clearCache() per query — checkpointing inside the
        // builder would pre-execute the query and hand bench/plan-shape
        // inspection a materialized-RDD scan instead of the real plan.
        val tok = Tables.load(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
          .cache()
        val big = tok
          .withColumn("w2", lead(col("w"), 1)
            .over(Window.partitionBy("doc_id").orderBy("pos")))
          .filter(col("w2").isNotNull)
          .select(col("w").as("w1"), col("w2"))
        val uni = tok.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
        val bi = big.groupBy("w1", "w2").agg(count(lit(1)).as("n_ab")).cache()
        // totals fold out of the count frames (vocab-sized), so the
        // corpus is never re-scanned just to count rows
        val totals = uni.agg(sum(col("n_w")).as("n_tok"))
          .crossJoin(bi.agg(sum(col("n_ab")).as("n_big")))
        bi.filter(col("n_ab") >= 5)
          .join(broadcast(uni.select(col("w").as("w1"), col("n_w").as("n_a"))), "w1")
          .join(broadcast(uni.select(col("w").as("w2"), col("n_w").as("n_b"))), "w2")
          .crossJoin(broadcast(totals))
          .withColumn("pmi", round(log(
            (col("n_ab").cast("double") / col("n_big"))
              / ((col("n_a").cast("double") / col("n_tok"))
                 * (col("n_b").cast("double") / col("n_tok")))), 4))
          .select(col("w1"), col("w2"), col("n_ab"), col("pmi"))
          .orderBy(col("pmi").desc, col("w1"), col("w2"))
          .limit(30)
      }),

    // ----- count-min sketch frequency band: the mergeable fixed-memory
    //       frequency estimator (the heavy-hitter complement of q90's
    //       HLL cardinality sketch). One pass builds the sketch as a
    //       partial-aggregable state of eps·e × ln(1/δ) counters — at
    //       100 TB each executor sketches its partitions and the merge
    //       is element-wise matrix addition; the corpus never shuffles.
    //       CMS guarantees est ≥ exact always and est ≤ exact + eps·N
    //       w.h.p., so the oracle can hash a DETERMINISTIC band flag
    //       (same device as q90/q145): the query emits exact counts for
    //       the top-10 keys beside `within_band`, and DuckDB asserts
    //       the exact counts and flag = 1. The sketch (a few KB) and
    //       the 10 probe rows are the only driver-side data —
    //       metadata-scale by design. -----
    Q("q152_cms_band",
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt,
             |  CAST(1 AS INT) AS within_band
             |FROM events GROUP BY user_id
             |ORDER BY exact_cnt DESC, user_id LIMIT 10""".stripMargin),
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        // N rides the sketch pass — one scan builds sketch + row count.
        // The sketch stays a ONE-ROW DataFrame broadcast onto the probe
        // rows; nothing is collected and the result frame never leaves
        // the executors. estimateCount has no built-in expression form
        // (unlike bloom's might_contain), so a closure over the
        // broadcast sketch bytes is the legitimate tier here — it
        // deserializes once per probe row on a 10-row frame.
        val sk = ev.agg(
          expr("count_min_sketch(user_id, 0.0001d, 0.99d, 42)").as("sk"),
          count(lit(1)).as("n"))
        val cmsEst = udf((bytes: Array[Byte], uid: Long) =>
          CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
            .estimateCount(uid))
        ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("user_id"))
          .limit(10)
          .crossJoin(broadcast(sk))
          .withColumn("est", cmsEst(col("sk"), col("user_id")))
          .withColumn("within_band", // CMS guarantee: exact ≤ est ≤ exact + eps·N
            (col("est") >= col("exact_cnt") &&
              col("est") <= col("exact_cnt") + ceil(col("n") * 1e-4)).cast("int"))
          .select(col("user_id"), col("exact_cnt"), col("within_band"))
          .orderBy(col("exact_cnt").desc, col("user_id"))
      }),

    // ----- cross-split decontamination: after the q101 hash split, an
    //       8-token shingle shared between a train doc and a val/test
    //       doc is eval leakage (the industry-standard n-gram
    //       decontamination screen, run INTERNALLY between splits
    //       rather than against an external eval suite like q124).
    //       Grams are 56-bit ints; the train-gram set is DISTINCT'd
    //       before the join, so the probe is one int-keyed equi-join —
    //       at 100 TB both sides shard by gram hash and nothing is
    //       broadcast (unlike q124's fixed-size eval suite, the train
    //       side here IS the corpus). -----
    Q("q153_split_decontamination",
      Some(s"""WITH s AS (
              |  SELECT doc_id,
              |    CASE WHEN ('0x' || substr(md5('spl' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 100 < 90
              |           THEN 'train'
              |         WHEN ('0x' || substr(md5('spl' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 100 < 95
              |           THEN 'val'
              |         ELSE 'test' END AS split,
              |    string_split(text, ' ') AS toks
              |  FROM documents
              |), g AS (
              |  SELECT DISTINCT doc_id, split,
              |    ${duckHash56("array_to_string(toks[i:i+7], ' ')")} AS gram
              |  FROM s, unnest(generate_series(1, len(toks) - 7)) AS u(i)
              |  WHERE len(toks) >= 8
              |), tr AS (SELECT DISTINCT gram FROM g WHERE split = 'train')
              |SELECT g.doc_id, g.split, CAST(count(*) AS BIGINT) AS n_shared
              |FROM g JOIN tr ON g.gram = tr.gram
              |WHERE g.split <> 'train'
              |GROUP BY g.doc_id, g.split ORDER BY g.doc_id""".stripMargin),
      (s, dir) => {
        // split is a pure function of doc_id — computed in place on the
        // gram rows, no membership join
        val grams = gramHashes(Tables.load(s, dir, "documents"))
          .withColumn("split", Corpus.splitAssign(col("doc_id")))
        val trainGrams = grams.filter(col("split") === "train").select("gram").distinct()
        grams.filter(col("split") =!= "train")
          .join(trainGrams, "gram")
          .groupBy("doc_id", "split")
          .agg(count(lit(1)).as("n_shared"))
          .orderBy("doc_id")
      }),

    // ----- incremental delta-dedup: screen a NEW ingest batch (here
    //       doc_id % 5 = 4 stands in for "today's crawl") against the
    //       EXISTING corpus — exact content-hash match, then SimHash
    //       band collision with hamming ≤ 3 — and tag every new doc
    //       kept / exact_dup / near_dup. This is the steady-state shape
    //       of corpus ingest at 100 TB: the corpus is never
    //       self-joined; the batch probes corpus band buckets through a
    //       (band, value)-keyed equi-join (both sides shard on the band
    //       key, candidates die on the in-join hamming predicate), and
    //       the exact screen is one hash-keyed semi join. -----
    Q("q155_delta_dedup",
      Some(s"""WITH sig AS (${Text.duckSimhash}),
              |ck AS (SELECT doc_id, md5(text) AS ck FROM documents),
              |exact AS (
              |  SELECT DISTINCT n.doc_id
              |  FROM ck n JOIN ck c ON n.ck = c.ck AND c.doc_id % 5 <> 4
              |  WHERE n.doc_id % 5 = 4),
              |bands AS (
              |  SELECT doc_id, b, (simhash >> (16 * b)) & 65535 AS val, simhash
              |  FROM sig, unnest([0,1,2,3]) AS t(b)),
              |near AS (
              |  SELECT DISTINCT x.doc_id
              |  FROM bands x JOIN bands y ON x.b = y.b AND x.val = y.val
              |    AND y.doc_id % 5 <> 4
              |    AND bit_count(xor(x.simhash, y.simhash)) <= 3
              |  WHERE x.doc_id % 5 = 4)
              |SELECT d.doc_id,
              |  CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
              |       WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
              |       ELSE 'kept' END AS status
              |FROM documents d
              |LEFT JOIN exact e ON d.doc_id = e.doc_id
              |LEFT JOIN near nr ON d.doc_id = nr.doc_id
              |WHERE d.doc_id % 5 = 4
              |ORDER BY d.doc_id""".stripMargin),
      (s, dir) => {
        val isNew = (col("doc_id") % 5) === 4
        val ck = Tables.load(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("ck"))
        val exact = ck.filter(isNew)
          .join(ck.filter(!isNew).select(col("ck")).distinct(), "ck")
          .select(col("doc_id")).distinct()
        val sig = Text.simhashDF(s, dir).cache()
        sig.count() // eager: probed by both sides of the band join
        val bands = sig.select(col("doc_id"),
            explode(expr("sequence(0, 3)")).as("b"), col("simhash"))
          .withColumn("val", expr("(simhash >> (16 * b)) & 65535"))
        val near = bands.filter(isNew).as("x")
          .join(bands.filter(!isNew).as("y"),
            col("x.b") === col("y.b") && col("x.val") === col("y.val")
              && expr("bit_count(x.simhash ^ y.simhash) <= 3"))
          .select(col("x.doc_id")).distinct()
        // base frame is documents (like the oracle), NOT the signature
        // frame — a doc with no tokens has no simhash row and must
        // still be reported as kept
        // caches are released by the harness's per-query clearCache();
        // no builder-side checkpoint (it would pre-run the query)
        Tables.load(s, dir, "documents").filter(isNew).select(col("doc_id"))
          .join(exact.withColumn("is_exact", lit(1)), Seq("doc_id"), "left")
          .join(near.withColumn("is_near", lit(1)), Seq("doc_id"), "left")
          .withColumn("status",
            when(col("is_exact").isNotNull, "exact_dup")
              .when(col("is_near").isNotNull, "near_dup")
              .otherwise("kept"))
          .select("doc_id", "status")
          .orderBy("doc_id")
      }),

    // ----- token-budget selection: greedily fill a fixed per-source
    //       token budget (1,000) in salted-hash-rank order — the
    //       "cut a 1T-token mixture from a 10T-token corpus" stage.
    //       Selection is a pure function of (salt, doc_id): stable
    //       across runs and partitioning, exact (not in-expectation),
    //       and each source fills independently — one per-source window
    //       cumsum, sources shard across executors. The first doc to
    //       cross the budget line is kept (greedy fill semantics), so
    //       every source lands within one doc of its budget. -----
    Q("q157_token_budget",
      Some("""WITH r AS (
             |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY md5('bud' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents
             |), c AS (
             |  SELECT source, doc_id, n_tokens, rn,
             |    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY rn
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
             |  FROM r)
             |SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(rn AS INT) AS rn,
             |  CAST(cum_before + n_tokens AS BIGINT) AS cum_tokens
             |FROM c WHERE cum_before < 1000
             |ORDER BY source, rn""".stripMargin),
      (s, dir) => {
        val wRank = Window.partitionBy(col("source"))
          .orderBy(col("hk"), col("doc_id"))
        val wCum = Window.partitionBy(col("source")).orderBy(col("rn"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.load(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"),
            md5(concat(lit("bud"), col("doc_id").cast("string"))).as("hk"))
          .withColumn("rn", row_number().over(wRank))
          .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(wCum), lit(0L)))
          .filter(col("cum_before") < 1000)
          .select(col("source"), col("doc_id"), col("n_tokens"),
            col("rn"), (col("cum_before") + col("n_tokens")).as("cum_tokens"))
          .orderBy("source", "rn")
      }),

    // ----- split-balance audit: after the q101 hash split, is each
    //       eval split DISTRIBUTED like train? Total-variation distance
    //       between per-source token-share vectors (the q140 drift
    //       device applied to splits): ½ Σ|share_split − share_train|.
    //       A sound hash split should be near 0; a skewed one (e.g.
    //       splitting by doc_id ranges that correlate with source)
    //       shows up immediately. Two keyed aggs + a source-keyed join
    //       of two tiny share vectors — corpus-size-independent after
    //       the first agg. -----
    Q("q162_split_balance",
      Some("""WITH t AS (
             |  SELECT CASE WHEN ('0x' || substr(md5('spl' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 100 < 90
             |           THEN 'train'
             |         WHEN ('0x' || substr(md5('spl' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 100 < 95
             |           THEN 'val'
             |         ELSE 'test' END AS split,
             |    source, len(string_split(text, ' ')) AS n_tokens
             |  FROM documents
             |), s AS (
             |  SELECT split, source, CAST(sum(n_tokens) AS DOUBLE)
             |    / sum(sum(n_tokens)) OVER (PARTITION BY split) AS share
             |  FROM t GROUP BY split, source
             |), grid AS (
             |  SELECT sp.split, src.source
             |  FROM (SELECT DISTINCT split FROM s WHERE split <> 'train') sp
             |  CROSS JOIN (SELECT DISTINCT source FROM t) src
             |), tr AS (SELECT source, share FROM s WHERE split = 'train')
             |SELECT g.split,
             |  round(0.5 * sum(abs(coalesce(s.share, 0) - coalesce(tr.share, 0))), 4) AS tv_vs_train
             |FROM grid g
             |LEFT JOIN s ON s.split = g.split AND s.source = g.source
             |LEFT JOIN tr ON tr.source = g.source
             |GROUP BY g.split ORDER BY g.split""".stripMargin),
      (s, dir) => {
        val tok = Tables.load(s, dir, "documents")
          .select(Corpus.splitAssign(col("doc_id")).as("split"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
        val shares = tok.groupBy("split", "source")
          .agg(sum(col("n_tokens")).as("tk"))
          .withColumn("share", col("tk").cast("double")
            / sum(col("tk")).over(Window.partitionBy(col("split"))))
          .cache()
        // densified (eval split × source) grid: a source present in
        // train but ABSENT from an eval split still contributes its
        // full |0 − train_share| term — dropping it would underestimate
        // TV exactly in the worst-skew case
        val grid = shares.filter(col("split") =!= "train")
          .select("split").distinct()
          .crossJoin(tok.select("source").distinct())
        val train = shares.filter(col("split") === "train")
          .select(col("source"), col("share").as("tr_share"))
        grid
          .join(shares.select(col("split"), col("source"), col("share")),
            Seq("split", "source"), "left")
          .join(broadcast(train), Seq("source"), "left")
          .groupBy("split")
          .agg(round(lit(0.5) * sum(abs(coalesce(col("share"), lit(0))
            - coalesce(col("tr_share"), lit(0)))), 4).as("tv_vs_train"))
          .orderBy("split")
      }),

    // ----- boilerplate stop-gram mining: the most document-frequent
    //       8-token shingles ARE the boilerplate (headers, disclaimers,
    //       navigation junk) — the blocklist a web-scale cleaner feeds
    //       back into filtering. One explode → (gram)-keyed agg with
    //       map-side partials; emitted as TEXT (a blocklist must be
    //       human-auditable), capped to the top 20 by document
    //       frequency with a text tiebreak. -----
    Q("q163_stop_grams",
      Some("""WITH g AS (
             |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+7], ' ') AS gram
             |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |       unnest(generate_series(1, len(toks) - 7)) AS u(i)
             |  WHERE len(toks) >= 8
             |), n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
             |SELECT gram, CAST(count(*) AS BIGINT) AS doc_freq,
             |  round(count(*) / n.n_docs, 4) AS doc_frac
             |FROM g, n GROUP BY gram, n.n_docs
             |HAVING count(*) >= 2
             |ORDER BY doc_freq DESC, gram LIMIT 20""".stripMargin),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
        textGrams(docs)
          .distinct()
          .groupBy("gram")
          .agg(count(lit(1)).as("doc_freq"))
          .filter(col("doc_freq") >= 2)
          .crossJoin(broadcast(nDocs))
          .select(col("gram"), col("doc_freq"),
            round(col("doc_freq") / col("n_docs"), 4).as("doc_frac"))
          .orderBy(col("doc_freq").desc, col("gram"))
          .limit(20)
      }),

    // ----- corpus datasheet: the one-pass observability report a
    //       "datasheets for datasets" workflow pins to every corpus
    //       snapshot — doc/source/language counts, token volume and
    //       median length, exact-dup rate, mean lexical diversity.
    //       Single grouped-agg scan (countDistincts expand map-side);
    //       the mean uses the engine's exact-decimal device so the
    //       report is bit-stable at any parallelism. -----
    Q("q158_corpus_datasheet",
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |  round(quantile_cont(n_tokens, 0.50), 4) AS p50_tokens,
             |  round(1 - CAST(count(DISTINCT ck) AS DOUBLE) / count(*), 4) AS dup_rate,
             |  round(CAST(sum(CAST(score AS DECIMAL(8,4))) * 10000 AS DOUBLE)
             |    / count(*)) / 10000.0 AS mean_diversity
             |FROM (
             |  SELECT source, lang, md5(text) AS ck,
             |    len(string_split(text, ' ')) AS n_tokens,
             |    round(len(list_distinct(string_split(text, ' ')))
             |      / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS score
             |  FROM documents)""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .select(col("source"), col("lang"), md5(col("text")).as("ck"),
            size(col("toks")).cast("long").as("n_tokens"),
            round(size(array_distinct(col("toks"))) / size(col("toks")).cast("double"), 4)
              .as("score"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("source")).as("n_sources"),
            countDistinct(col("lang")).as("n_langs"),
            sum(col("n_tokens")).as("total_tokens"),
            round(expr("percentile(n_tokens, 0.50)"), 4).as("p50_tokens"),
            round(lit(1) - countDistinct(col("ck")).cast("double") / count(lit(1)), 4)
              .as("dup_rate"),
            (round((sum(col("score").cast("decimal(8,4)")) * 10000).cast("double")
              / count(lit(1))) / 10000.0).as("mean_diversity"))),

    // ----- BPE trainer LOOP (q285): q133 counted ONE round's pairs;
    //       this is the actual trainer — N bounded rounds of (count
    //       adjacent symbol pairs → merge the argmax pair everywhere →
    //       recount), producing the ordered merge table a tokenizer
    //       ships. 100-TB shape: the corpus is scanned ONCE into the
    //       word-type vocabulary (types ≪ instances — Heaps' law) with
    //       per-type counts; every round then works on the vocab-sized
    //       frame — one map-side-combinable weighted pair agg, ONE
    //       collected row (the argmax — metadata-sized, like q166's
    //       per-round fixpoint check), one row-local merge rewrite,
    //       and a localCheckpoint so the plan stays O(1) across
    //       rounds. The merge itself is greedy left-to-right
    //       non-overlapping, implemented as delimiter-framed string
    //       replace ('|p1||p2|' → '|p1p2|') — the SAME primitive both
    //       engines ship, so the semantics can't drift. Oracle:
    //       the identical rounds UNROLLED as chained CTEs, each
    //       re-deriving its own argmax — a wrong merge, a wrong
    //       tiebreak, or round state leaking across iterations breaks
    //       the hash at the first divergent round. -----
    Q("q285_bpe_trainer",
      Some(duckBpeRounds(6)),
      (s, dir) => {
        import s.implicits._
        bpeTrainRounds(s, dir, 6)._1
          .toDF("merge_round", "p1", "p2", "n")
          .orderBy("merge_round")
      }),

    // ----- BPE ENCODER (q287): the apply side of q285's trainer — the
    //       op that actually tokenizes the corpus with the learned
    //       merges. 100-TB shape: the trainer's final vocabulary
    //       already holds each word TYPE's token sequence, so encoding
    //       is (a) one corpus pass into per-(source, word) instance
    //       counts (keyed agg, map-side combinable) and (b) one
    //       word-keyed equi-join against the vocab — the text column
    //       is never re-scanned per merge, and the join key is the
    //       word, so both sides shuffle keyed (no broadcast claim: at
    //       100 TB the vocabulary is Heaps'-law millions of types, a
    //       legitimate shuffle join, and AQE may still broadcast it at
    //       small SF). Output = the tokenizer datasheet: per-source
    //       word instances, BPE token count, fertility (tokens/word —
    //       THE tokenizer-quality number), and distinct token types.
    //       Oracle: the same six rounds unrolled (any trainer drift
    //       breaks encode too), then the same join + rollup. -----
    Q("q287_bpe_encode",
      Some(s"""WITH ${duckBpePrefix(6)},
             |sw AS (
             |  SELECT source, t AS w, count(*) AS n FROM (
             |    SELECT source, unnest(string_split(text, ' ')) AS t
             |    FROM documents)
             |  WHERE regexp_matches(t, '^[a-z]{2,}$$') GROUP BY 1, 2),
             |j AS (SELECT sw.source, sw.n, r6.syms
             |      FROM sw JOIN r6 ON sw.w = r6.w),
             |a AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_words,
             |        CAST(sum(n * len(syms)) AS BIGINT) AS n_bpe_tokens
             |      FROM j GROUP BY source),
             |ty AS (SELECT source,
             |        CAST(count(DISTINCT tok) AS BIGINT) AS n_token_types
             |       FROM (SELECT source, unnest(syms) AS tok FROM j)
             |       GROUP BY source)
             |SELECT a.source, n_words, n_bpe_tokens,
             |  round(n_bpe_tokens * 10000.0 / n_words) / 10000.0 AS fertility,
             |  n_token_types
             |FROM a JOIN ty USING (source) ORDER BY source""".stripMargin),
      (s, dir) => {
        val vocab = bpeTrainRounds(s, dir, 6)._2
        val sw = Tables.load(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w").rlike("^[a-z]{2,}$"))
          .groupBy("source", "w").agg(count(lit(1)).as("n"))
        val j = sw.join(vocab.select("w", "syms"), "w")
        // fertility divides two exact-integer doubles, so the rounding
        // tie (if any) is a representable half both engines agree on
        val a = j.groupBy("source")
          .agg(sum(col("n")).cast("long").as("n_words"),
            sum(col("n") * size(col("syms"))).cast("long").as("n_bpe_tokens"))
          .withColumn("fertility",
            round(col("n_bpe_tokens").cast("double") * 10000.0
              / col("n_words").cast("double")) / 10000.0)
        val ty = j.select(col("source"), explode(col("syms")).as("tok"))
          .groupBy("source").agg(countDistinct(col("tok")).as("n_token_types"))
        a.join(ty, "source")
          .select("source", "n_words", "n_bpe_tokens", "fertility",
            "n_token_types")
          .orderBy("source")
      })
  )

  /** Shared q285/q287 trainer: `n` BPE merge rounds over the word-type
    * vocabulary. Returns (ordered merge table rows, final vocabulary
    * frame `(w, cnt, syms)`). The corpus is scanned ONCE into word
    * types (Heaps' law: types ≪ instances); each round is one
    * map-side-combinable weighted pair count, ONE collected argmax row
    * (metadata-sized, the q166 fixpoint-check discipline), a row-local
    * delimiter-framed merge rewrite, and a localCheckpoint so the plan
    * stays O(1) across rounds. */
  private def bpeTrainRounds(s: SparkSession, dir: String, n: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    var vocab = Tables.load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]{2,}$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (r <- 1 to n) {
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> " +
            "struct(element_at(syms, i) AS p1, element_at(syms, i + 1) AS p2))"))
          .as("pr"))
        .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("p1"), col("p2"))
        .limit(1).collect()(0)
      val (p1, p2, nCnt) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((r.toLong, p1, p2, nCnt))
      // merged symbols are letter-runs by construction ([a-z]+
      // tokens), so inlining them in the expression is safe
      vocab = vocab
        .withColumn("s2", expr(
          s"replace(concat('|', array_join(syms, '||'), '|'), " +
            s"'|$p1||$p2|', '|$p1$p2|')"))
        .withColumn("syms",
          split(expr("substring(s2, 2, length(s2) - 2)"), "\\|\\|"))
        .drop("s2")
        .localCheckpoint(true)
    }
    (merges.result(), vocab)
  }

  /** The q285 oracle: `n` BPE rounds unrolled as chained CTEs — every
    * round re-derives its pair counts (weighted by word-type count),
    * its argmax (count DESC, pair ASC), and its merged vocabulary via
    * the same delimiter-framed replace the engine uses. */
  private def duckBpeRounds(n: Int): String = {
    val selects = (1 to n).map(r =>
      s"SELECT CAST($r AS BIGINT) AS merge_round, p1, p2, " +
        s"CAST(n AS BIGINT) AS n FROM t$r")
      .mkString("\nUNION ALL\n")
    s"WITH ${duckBpePrefix(n)}\n$selects\nORDER BY merge_round"
  }

  /** The CTE prefix both BPE oracles share (q285 trainer / q287
    * encoder): word-type vocabulary + `n` unrolled merge rounds, each
    * re-deriving its own argmax and merged vocabulary `r<n>`. */
  private def duckBpePrefix(n: Int): String = {
    val base =
      """w AS (
        |  SELECT t AS w, count(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE regexp_matches(t, '^[a-z]{2,}$') GROUP BY t),
        |r0 AS (SELECT w, cnt,
        |  list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)) AS syms
        |  FROM w)""".stripMargin
    val rounds = (1 to n).map { r =>
      s"""pc$r AS (
         |  SELECT pr[1] AS p1, pr[2] AS p2, SUM(cnt) AS n FROM (
         |    SELECT cnt, unnest(list_transform(range(1, len(syms)),
         |      i -> [syms[i], syms[i + 1]])) AS pr
         |    FROM r${r - 1} WHERE len(syms) >= 2)
         |  GROUP BY 1, 2),
         |t$r AS (SELECT p1, p2, n FROM pc$r ORDER BY n DESC, p1, p2 LIMIT 1),
         |r$r AS (
         |  SELECT w, cnt,
         |    string_split(substr(s2, 2, len(s2) - 2), '||') AS syms
         |  FROM (
         |    SELECT w, cnt,
         |      replace('|' || array_to_string(syms, '||') || '|',
         |        '|' || t$r.p1 || '||' || t$r.p2 || '|',
         |        '|' || t$r.p1 || t$r.p2 || '|') AS s2
         |    FROM r${r - 1}, t$r))""".stripMargin
    }
    s"$base,\n${rounds.mkString(",\n")}"
  }
}
