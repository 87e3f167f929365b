package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-engineering operators over `documents` (SURVEY.md §2.9, the
  * training-data-pipeline extension): term redaction (PII-scrub
  * plumbing), deterministic stratified sampling, hash-based
  * train/val/test splits, contiguous sequence packing into fixed token
  * budgets, and per-source vocabulary statistics.
  *
  * Determinism rule (same as `Text`): every sampling/split decision
  * bottoms out in `md5(salt || doc_id)` reduced to a 56-bit int —
  * identical in Spark and DuckDB, independent of partitioning, cluster
  * size, and row order. That property (not a seeded RNG) is what makes
  * a 100 TB sample reproducible and re-runnable per partition.
  */
object Corpus {

  /** PUBLIC deterministic percent-hash in [0,100): 56-bit salted md5 of
    * the key, reduced mod 100 — a pure function of (salt, key), so every
    * sampling/split decision is stable across runs, machines, and data
    * layout, and the predicate pushes to the scan. DuckDB-identical
    * ([[duckPctHash]]). */
  def hashPercent(keyCol: org.apache.spark.sql.Column, salt: String): org.apache.spark.sql.Column =
    hash56(keyCol, salt) % 100

  /** THE engine's salted 56-bit portable hash (first 14 hex chars of
    * md5 as a BIGINT) — single definition for every Column-level
    * consumer (percent buckets, sampling draws). */
  def hash56(keyCol: org.apache.spark.sql.Column, salt: String): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit(salt), keyCol.cast("string"))), 1, 14), 16, 10)
      .cast("long")

  /** PUBLIC hash-based split assignment: train/val/test by percent-hash
    * bucket (default 90/5/5). */
  def splitAssign(keyCol: org.apache.spark.sql.Column, salt: String = "spl",
                  trainPct: Int = 90, valPct: Int = 5): org.apache.spark.sql.Column = {
    val b = hashPercent(keyCol, salt)
    when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test")
  }

  /** Same hash, DuckDB side. */
  private def duckPctHash(salt: String): String =
    s"('0x' || substr(md5('$salt' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 100"

  /** Redaction pattern: word-boundary alternation over the denylist —
    * RE2 (DuckDB) and java.util.regex (Spark) agree on this subset. */
  private val denyRe = "\\b(customer|query|user)\\b"

  val queries: Seq[Q] = Seq(

    // ----- term redaction (the PII-scrub shape): regexp_replace over a
    //       word-boundary denylist + per-source audit counts. Row-local
    //       scan-stage work; the audit agg is partial+final. In a real
    //       pipeline the denylist regex is compiled once per task —
    //       constant-folded here. -----
    Q("q99_redact_terms",
      Some(s"""SELECT source,
              |  CAST(count(*) FILTER (WHERE n_hits > 0) AS BIGINT) AS docs_affected,
              |  CAST(sum(n_hits) AS BIGINT) AS total_hits,
              |  CAST(sum(len(text) - len(redacted)) AS BIGINT) AS chars_delta
              |FROM (
              |  SELECT source, text,
              |    regexp_replace(text, '$denyRe', '<PII>', 'g') AS redacted,
              |    len(regexp_extract_all(text, '$denyRe')) AS n_hits
              |  FROM documents)
              |GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("source"), col("text"),
            regexp_replace(col("text"), denyRe, "<PII>").as("redacted"),
            // Column-API form: the pattern goes in verbatim (an expr()
            // SQL string would escape-process the \b into a backspace)
            size(regexp_extract_all(col("text"), lit(denyRe), lit(0))).as("n_hits"))
          .groupBy("source")
          .agg(
            count(when(col("n_hits") > 0, 1)).as("docs_affected"),
            sum(col("n_hits")).as("total_hits"),
            sum(length(col("text")) - length(col("redacted"))).cast("long").as("chars_delta"))
          .orderBy("source")),

    // ----- deterministic stratified sampling: per-stratum rates (50%
    //       for the first five sources, 10% for the rest) decided by a
    //       salted doc hash — no RNG, no sampleBy; the predicate pushes
    //       to the scan and the same doc is kept on every re-run at any
    //       parallelism. -----
    Q("q100_stratified_sample",
      Some(s"""SELECT source,
              |  CAST(count(*) AS BIGINT) AS n_total,
              |  CAST(count(*) FILTER (WHERE picked) AS BIGINT) AS n_sampled
              |FROM (
              |  SELECT source,
              |    ${duckPctHash("smp")} <
              |      (CASE WHEN source IN ('src0','src1','src2','src3','src4')
              |            THEN 50 ELSE 10 END) AS picked
              |  FROM documents)
              |GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("source"),
            (hashPercent(col("doc_id"), "smp") <
              when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 50)
                .otherwise(10)).as("picked"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_total"),
            count(when(col("picked"), 1)).as("n_sampled"))
          .orderBy("source")),

    // ----- hash-based train/val/test split (90/5/5): the assignment is
    //       a pure function of doc_id, so the split is stable across
    //       runs, machines, and data layout — the property a training
    //       pipeline needs to never leak val docs into train. -----
    Q("q101_train_val_split",
      Some(s"""SELECT split,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
              |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
              |FROM (
              |  SELECT text, source,
              |    CASE WHEN ${duckPctHash("spl")} < 90 THEN 'train'
              |         WHEN ${duckPctHash("spl")} < 95 THEN 'val'
              |         ELSE 'test' END AS split
              |  FROM documents)
              |GROUP BY split ORDER BY split""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("split", splitAssign(col("doc_id")))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " "))).cast("long").as("total_tokens"),
            countDistinct(col("source")).as("n_sources"))
          .orderBy("split")),

    // ----- contiguous sequence packing: stream docs (per source, in
    //       doc_id order) into 2048-token context windows; a doc's bin is
    //       floor(tokens-before-it / 2048). One window sum per source —
    //       the streaming-pack shape that needs no global coordination
    //       (each source packs independently; at 100 TB sources shard
    //       across executors and the window never crosses them). -----
    Q("q102_sequence_packing",
      Some("""SELECT source, CAST(bin AS BIGINT) AS bin,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
             |  round(sum(n_tokens) / 2048.0, 4) AS fill_ratio
             |FROM (
             |  SELECT source, n_tokens,
             |    floor(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048) AS bin
             |  FROM (SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
             |        FROM documents))
             |GROUP BY source, bin ORDER BY source, bin""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.load(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).as("n_tokens"))
          .withColumn("bin",
            floor(coalesce(sum(col("n_tokens")).over(w), lit(0)) / 2048))
          .groupBy("source", "bin")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("bin_tokens"),
            round(sum(col("n_tokens")) / 2048.0, 4).as("fill_ratio"))
          .orderBy("source", "bin")
      }),

    // ----- explode_outer: null-preserving generator semantics — docs
    //       whose filtered token list is EMPTY survive as a null row
    //       (plain explode would silently drop them; the difference is
    //       exactly the LEFT vs INNER join of a doc against its tokens,
    //       and losing empty docs corrupts per-doc statistics). -----
    Q("q106_explode_outer",
      Some("""SELECT doc_id, tok FROM (
             |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> len(t) > 6)) AS tok
             |  FROM documents
             |  UNION ALL
             |  SELECT doc_id, NULL AS tok FROM documents
             |  WHERE len(list_filter(string_split(text, ' '), t -> len(t) > 6)) = 0)
             |ORDER BY doc_id, tok""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            explode_outer(expr("filter(split(text, ' '), t -> length(t) > 6)")).as("tok"))
          .orderBy("doc_id", "tok")),

    // ----- per-source vocabulary statistics: token total, vocabulary
    //       size, hapax legomena (frequency-1 tokens), type-token ratio.
    //       explode → (source, token) agg (partial combine eats the
    //       explosion) → per-source rollup of counts. -----
    Q("q103_vocab_stats",
      Some("""SELECT source,
             |  CAST(sum(cnt) AS BIGINT) AS total_tokens,
             |  CAST(count(*) AS BIGINT) AS vocab,
             |  CAST(count(*) FILTER (WHERE cnt = 1) AS BIGINT) AS hapax,
             |  round(count(*) / CAST(sum(cnt) AS DOUBLE), 4) AS type_token_ratio
             |FROM (
             |  SELECT source, token, count(*) AS cnt
             |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
             |  GROUP BY source, token)
             |GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("token"))
          .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
          .groupBy("source")
          .agg(sum(col("cnt")).cast("long").as("total_tokens"),
            count(lit(1)).as("vocab"),
            count(when(col("cnt") === 1, 1)).as("hapax"),
            round(count(lit(1)) / sum(col("cnt")).cast("double"), 4).as("type_token_ratio"))
          .orderBy("source")),

    // ----- Gopher-style repetition filter: fraction of duplicate
    //       bigrams per document (high ratio = boilerplate / degenerate
    //       generation — a standard pretraining-corpus gate). Entirely
    //       row-local array arithmetic: no explode, no shuffle except
    //       the final sort; the flag threshold (0.5) mirrors the
    //       published Gopher duplicate-ngram cuts. -----
    Q("q115_bigram_repetition",
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
             |SELECT doc_id,
             |  round(1 - len(list_distinct(list_transform(range(1, len(toks)),
             |      i -> toks[i] || ' ' || toks[i+1]))) / CAST(len(toks) - 1 AS DOUBLE), 4)
             |    AS rep2,
             |  (1 - len(list_distinct(list_transform(range(1, len(toks)),
             |      i -> toks[i] || ' ' || toks[i+1]))) / CAST(len(toks) - 1 AS DOUBLE)) > 0.5
             |    AS flagged
             |FROM t WHERE len(toks) > 1
             |ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) > 1)
          .withColumn("bigrams", expr(
            "transform(sequence(1, size(toks) - 1), " +
              "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
          .withColumn("rep_raw",
            lit(1) - size(array_distinct(col("bigrams"))) /
              (size(col("toks")) - 1).cast("double"))
          .select(col("doc_id"), round(col("rep_raw"), 4).as("rep2"),
            (col("rep_raw") > 0.5).as("flagged"))
          .orderBy("doc_id")),

    // ----- web-corpus cleaning: strip markup, pull the host and a
    //       query parameter out of the crawl URL. The fixture has no
    //       HTML/URLs, so the row builds a deterministic pseudo-crawl
    //       record from its own fields first — the CLEANING is the op
    //       under test: tag-strip via one regexp_replace pass,
    //       host/param extraction via Spark's parse_url (codegen'd;
    //       the oracle uses the equivalent regexes). All row-local. -----
    Q("q122_web_clean",
      Some("""WITH crawl AS (
             |  SELECT doc_id,
             |    'https://' || source || '.example.com/doc/' || doc_id || '?lang=' || lang AS url,
             |    '<html><body class="m">' || text || '<br/></body></html>' AS raw
             |  FROM documents)
             |SELECT doc_id,
             |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
             |  regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
             |  length(regexp_replace(raw, '<[^>]*>', '', 'g')) AS clean_len
             |FROM crawl
             |ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            concat(lit("https://"), col("source"), lit(".example.com/doc/"),
              col("doc_id"), lit("?lang="), col("lang")).as("url"),
            concat(lit("<html><body class=\"m\">"), col("text"),
              lit("<br/></body></html>")).as("raw"))
          .select(col("doc_id"),
            parse_url(col("url"), lit("HOST")).as("host"),
            parse_url(col("url"), lit("QUERY"), lit("lang")).as("lang_param"),
            length(regexp_replace(col("raw"), "<[^>]*>", "")).as("clean_len"))
          .orderBy("doc_id")),

    // ----- perplexity-proxy quality scoring via a corpus-trained
    //       bigram LM (the KenLM-filter shape, e.g. CCNet): pass 1
    //       trains MLE bigram probabilities p(w2|w1) = c(w1w2)/c(w1·)
    //       over the whole corpus; pass 2 scores each doc by its mean
    //       bigram log-probability. Low scores = improbable token
    //       sequences (boilerplate, garbled text) — the standard
    //       quality gate before training. No smoothing needed: every
    //       doc bigram exists in the counts it contributed to. Scale
    //       shape: counts are keyed aggs (partial+final), scoring is
    //       ONE equi-join on the bigram key + a per-doc agg — never
    //       collects the LM; at 100 TB the LM table co-shuffles with
    //       the bigram stream (or top-K + backoff broadcasts). -----
    Q("q139_bigram_lm_score",
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
             |  WHERE len(string_split(text, ' ')) >= 2),
             |bb AS (
             |  SELECT doc_id,
             |    unnest(list_transform(range(2, len(tk) + 1), i -> tk[i-1])) AS w1,
             |    unnest(list_transform(range(2, len(tk) + 1),
             |      i -> tk[i-1] || ' ' || tk[i])) AS bg
             |  FROM t),
             |c12 AS (SELECT w1, bg, count(*) AS c12 FROM bb GROUP BY w1, bg),
             |c1 AS (SELECT w1, count(*) AS c1 FROM bb GROUP BY w1),
             |lm AS (SELECT bg, CAST(c12 AS DOUBLE) / c1 AS p
             |       FROM c12 JOIN c1 USING (w1))
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |  round(avg(ln(p)), 4) AS avg_logp
             |FROM bb JOIN lm USING (bg)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val bb = Tables.load(s, dir, "documents")
          .withColumn("tk", split(col("text"), " "))
          .filter(size(col("tk")) >= 2)
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(1, size(tk) - 1), " +
              "i -> struct(tk[i-1] AS w1, concat(tk[i-1], ' ', tk[i]) AS bg))"))
            .as(Seq("pos", "b")))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.bg").as("bg"))
          // three consumers (c12, c1, scoring join) — one tokenize+
          // explode. Eager localCheckpoint, NOT .cache(): a cached
          // frame re-computes per consumer on block eviction, and
          // under box contention the three consumers thrash the
          // spill path (the r10 driver board charged this query 10×
          // its quiet-box wall). The checkpoint materializes ONCE,
          // truncates lineage, and every consumer reads stored blocks.
          .localCheckpoint(true)
        val c12 = bb.groupBy("w1", "bg").agg(count(lit(1)).as("c12"))
        val c1 = bb.groupBy("w1").agg(count(lit(1)).as("c1"))
        val lm = c12.join(c1, "w1")
          .select(col("bg"), (col("c12").cast("double") / col("c1")).as("p"))
        bb.join(lm, "bg")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), round(avg(log(col("p"))), 4).as("avg_logp"))
          .orderBy("doc_id")
      }),

    // ----- deterministic WEIGHTED sampling (Efraimidis–Spirakis):
    //       top-3 docs per source where doc i wins with probability ∝
    //       its weight (here: distinct-token count, the quality proxy),
    //       via the exponential-race key −ln(u)/w with u drawn from the
    //       engine's salted 56-bit md5 — so the "random" draw is a pure
    //       function of (salt, doc_id): reproducible across runs,
    //       partitioning, and cluster size, and mergeable (the top-k of
    //       a union is the top-k of per-partition top-ks — the
    //       distributed weighted-reservoir property). Complements q100
    //       (uniform stratified) and q148 (exact quotas): this one
    //       BIASES selection toward quality without abandoning
    //       determinism. One per-source window over an (id, key)
    //       projection — the text column feeds only the weight. -----
    Q("q165_weighted_sample",
      Some("""WITH k AS (
             |  SELECT source, doc_id,
             |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS w,
             |    -ln((('0x' || substr(md5('es' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT + 1)
             |        / 72057594037927936.0)
             |      / len(list_distinct(string_split(text, ' '))) AS es_key
             |  FROM documents
             |), r AS (
             |  SELECT source, doc_id, w, es_key,
             |    row_number() OVER (PARTITION BY source ORDER BY es_key, doc_id) AS rn
             |  FROM k)
             |SELECT source, doc_id, w, round(es_key, 6) AS es_key, CAST(rn AS INT) AS rn
             |FROM r WHERE rn <= 3 ORDER BY source, rn""".stripMargin),
      (s, dir) => {
        val wRank = Window.partitionBy(col("source")).orderBy(col("raw_key"), col("doc_id"))
        Tables.load(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(array_distinct(split(col("text"), " "))).cast("long").as("w"),
            // u ∈ (0, 1]: 56-bit hash + 1, scaled by 2^56 — never 0, so
            // ln is defined; the +1 bias is 2^-56, far below rank margins
            ((hash56(col("doc_id"), "es") + 1) / lit(72057594037927936.0)).as("u"))
          .withColumn("raw_key", -log(col("u")) / col("w"))
          .withColumn("rn", row_number().over(wRank))
          .filter(col("rn") <= 3)
          .select(col("source"), col("doc_id"), col("w"),
            round(col("raw_key"), 6).as("es_key"), col("rn"))
          .orderBy("source", "rn")
      }),

    // ----- temperature-scaled language mixture (q336): the
    //       multilingual-LM sampling recipe — per-language budgets
    //       proportional to n_l^T with T = 0.5, flattening the
    //       head so low-resource languages are UP-weighted relative
    //       to their raw share (the en-vs-rest rebalancing every
    //       multilingual corpus ships). All arithmetic is
    //       INTEGERIZED for cross-engine exactness: the weight is
    //       floor(sqrt(n_l) * 1e6) as BIGINT (IEEE sqrt is correctly
    //       rounded, so both engines agree bit-for-bit), quotas are
    //       BIGINT division — a double-sum whose ORDER differs
    //       between engines can never flip a floor boundary.
    //       Selection is deterministic: docs rank by md5(doc_id)
    //       within language (both engines render lowercase hex) and
    //       fill the quota by running char-sum — so the exact doc
    //       set, not just the counts, is oracle-pinned. -----
    Q("q336_temperature_mixture",
      Some("""WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
             |tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS total FROM d),
             |ls AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS n_l
             |  FROM d GROUP BY lang),
             |w AS (SELECT lang, n_l,
             |    CAST(floor(sqrt(CAST(n_l AS DOUBLE)) * 1000000) AS BIGINT) AS s_l
             |  FROM ls),
             |q AS (SELECT lang, n_l,
             |    (((SELECT total FROM tot) // 4) * s_l)
             |      // (SELECT sum(s_l) FROM w) AS quota FROM w),
             |ranked AS (SELECT doc_id, lang, n_chars,
             |    sum(n_chars) OVER (PARTITION BY lang
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             |      ROWS UNBOUNDED PRECEDING) AS run
             |  FROM d),
             |sel AS (SELECT r.lang, r.n_chars FROM ranked r
             |  JOIN q ON q.lang = r.lang WHERE r.run <= q.quota)
             |SELECT q.lang, CAST(q.n_l AS BIGINT) AS n_chars_total,
             |  CAST(q.quota AS BIGINT) AS quota_chars,
             |  CAST(coalesce(count(s.lang), 0) AS BIGINT) AS n_docs_sel,
             |  CAST(coalesce(sum(s.n_chars), 0) AS BIGINT) AS n_chars_sel
             |FROM q LEFT JOIN sel s ON s.lang = q.lang
             |GROUP BY q.lang, q.n_l, q.quota
             |ORDER BY q.lang""".stripMargin),
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
        val total = d.agg(sum("n_chars").cast("long")).head().getLong(0)
        val ls = d.groupBy("lang")
          .agg(sum("n_chars").cast("long").as("n_l"))
          .withColumn("s_l",
            floor(sqrt(col("n_l").cast("double")) * 1000000.0).cast("long"))
        val sSum = ls.agg(sum("s_l")).head().getLong(0)
        val q = ls.withColumn("quota",
          expr(s"(($total div 4) * s_l) div $sSum"))
        val wRun = Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sel = d.withColumn("run", sum("n_chars").over(wRun))
          .join(broadcast(q.select("lang", "quota")), "lang")
          .filter(col("run") <= col("quota"))
        q.join(sel.groupBy("lang")
            .agg(count(lit(1)).as("n_docs_sel"),
              sum("n_chars").cast("long").as("n_chars_sel")),
            Seq("lang"), "left")
          .select(col("lang"), col("n_l").as("n_chars_total"),
            col("quota").as("quota_chars"),
            coalesce(col("n_docs_sel"), lit(0L)).as("n_docs_sel"),
            coalesce(col("n_chars_sel"), lit(0L)).as("n_chars_sel"))
          .orderBy("lang")
      })
  )
}
