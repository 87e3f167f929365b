package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators over `documents` / `embeddings`
  * (SURVEY.md §2.9 extension, second batch): PII detection + masking,
  * benchmark-contamination screening, temperature-weighted source
  * mixing, a k-means Lloyd step over embeddings, int8 embedding
  * quantization, cross-corpus chunk (line-level) dedup, and curriculum
  * difficulty binning.
  *
  * Same determinism discipline as [[Text]] / [[Corpus]]: hashes bottom
  * out in md5, floats are rounded to a fixed scale before any ranking
  * or threshold, and every query ends in a total ORDER BY. Scale notes
  * are per-query; the shared principles: detection/masking/quantization
  * are row-local scan-stage work; contamination screening broadcasts
  * the (small) benchmark set instead of joining the corpus against it;
  * the k-means assignment is corpus × broadcast-centroids, never
  * corpus × corpus.
  */
object Training {

  /** Pseudo-PII synthesis: the fixture corpus is clean word soup, so
    * each row first APPENDS a deterministic email + phone derived from
    * its own key (identical text in both engines); the operator under
    * test is the detection/masking pass that follows. Only the cast
    * keyword differs per dialect (STRING vs VARCHAR). */
  private def synthSqlFor(castType: String) =
    s"text || ' contact user' || doc_id || '@mail-' || source || " +
      s"'.com or call 555-' || lpad(CAST(doc_id % 10000 AS $castType), 4, '0')"
  private val synthSql = synthSqlFor("STRING")        // Spark
  private val synthSqlDuck = synthSqlFor("VARCHAR")   // DuckDB

  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val phoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** DuckDB CTE chain shared by the q294 mixture and the q299 planner:
    * (source, lang) token cells, sqrt-temperature e4 scores, e8 base
    * weights, and the three unrolled cap-and-redistribute rounds
    * (w1/w2/w3) — sharing the text keeps the two oracles' round
    * arithmetic identical by construction. */
  private val duckMixtureCtes: String =
    """cell AS (
      |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n FROM (
      |    SELECT source, lang,
      |      unnest(string_split(text, ' ')) AS t FROM documents)
      |  WHERE regexp_matches(t, '^[a-z]{2,}$') GROUP BY 1, 2),
      |tt AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM cell),
      |s AS (SELECT source, lang,
      |    CAST(round(10000 * sqrt(n / tt.tt)) AS BIGINT) AS s_e4
      |  FROM cell CROSS JOIN tt),
      |ss AS (SELECT CAST(sum(s_e4) AS BIGINT) AS ss FROM s),
      |w0 AS (SELECT source, lang,
      |    CAST(round(100000000.0 * s_e4 / ss.ss) AS BIGINT) AS w
      |  FROM s CROSS JOIN ss),
      |a1 AS (SELECT
      |    CAST(count(*) FILTER (WHERE w > 1500000) AS BIGINT) AS ncap,
      |    CAST(coalesce(sum(w) FILTER (WHERE w <= 1500000), 0)
      |      AS BIGINT) AS su FROM w0),
      |w1 AS (SELECT source, lang,
      |    CASE WHEN w > 1500000 THEN CAST(1500000 AS BIGINT)
      |    ELSE CAST(round(CAST(w * (100000000 - a1.ncap * 1500000)
      |      AS DOUBLE) / a1.su) AS BIGINT) END AS w
      |  FROM w0 CROSS JOIN a1),
      |a2 AS (SELECT
      |    CAST(count(*) FILTER (WHERE w > 1500000) AS BIGINT) AS ncap,
      |    CAST(coalesce(sum(w) FILTER (WHERE w <= 1500000), 0)
      |      AS BIGINT) AS su FROM w1),
      |w2 AS (SELECT source, lang,
      |    CASE WHEN w > 1500000 THEN CAST(1500000 AS BIGINT)
      |    ELSE CAST(round(CAST(w * (100000000 - a2.ncap * 1500000)
      |      AS DOUBLE) / a2.su) AS BIGINT) END AS w
      |  FROM w1 CROSS JOIN a2),
      |a3 AS (SELECT
      |    CAST(count(*) FILTER (WHERE w > 1500000) AS BIGINT) AS ncap,
      |    CAST(coalesce(sum(w) FILTER (WHERE w <= 1500000), 0)
      |      AS BIGINT) AS su FROM w2),
      |w3 AS (SELECT source, lang,
      |    CASE WHEN w > 1500000 THEN CAST(1500000 AS BIGINT)
      |    ELSE CAST(round(CAST(w * (100000000 - a3.ncap * 1500000)
      |      AS DOUBLE) / a3.su) AS BIGINT) END AS w
      |  FROM w2 CROSS JOIN a3)""".stripMargin

  /** (source, lang) token counts — ONE corpus pass, map-side
    * combinable; everything downstream of the mixture is cells-sized. */
  private def mixtureCells(s: org.apache.spark.sql.SparkSession,
                           dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("source"), col("lang"),
        explode(split(col("text"), " ")).as("t"))
      .filter(col("t").rlike("^[a-z]{2,}$"))
      .groupBy("source", "lang").agg(count(lit(1)).as("n"))

  /** The q294 waterfilling loop: sqrt-temperature e8 base weights,
    * then 3 cap-and-redistribute rounds (cap 1.5e6 e8-units), one
    * localCheckpoint per round. Returns the per-round weight frames
    * (source, lang, w) — last is the effective mixture. */
  private def cappedMixtureRounds(cells: DataFrame): Seq[DataFrame] = {
    val capL = 1500000L
    val tt = cells.agg(sum(col("n")).as("tt"))
    val sc = cells.crossJoin(broadcast(tt))
      .withColumn("s_e4",
        round(lit(10000) * sqrt(col("n") / col("tt"))).cast("long"))
    val ss = sc.agg(sum(col("s_e4")).as("ss"))
    var w = sc.crossJoin(broadcast(ss))
      .select(col("source"), col("lang"),
        round(lit(100000000.0) * col("s_e4") / col("ss"))
          .cast("long").as("w"))
      .localCheckpoint(true)
    (1 to 3).map { _ =>
      val a = w.agg(
        sum(when(col("w") > capL, 1L).otherwise(0L)).as("ncap"),
        coalesce(sum(when(col("w") <= capL, col("w"))), lit(0L)).as("su"))
      w = w.crossJoin(broadcast(a))
        .select(col("source"), col("lang"),
          when(col("w") > capL, lit(capL)).otherwise(
            round((col("w") * (lit(100000000L)
                - col("ncap") * lit(capL))).cast("double") / col("su"))
              .cast("long")).as("w"))
        .localCheckpoint(true)
      w
    }
  }

  val queries: Seq[Q] = Seq(

    // ----- PII detection + masking: email/phone regex sweep with a
    //       per-source audit (docs touched, hits per category, masked
    //       char delta). Row-local scan-stage work — the patterns
    //       compile once per task; the audit agg is partial+final. The
    //       RE subset used (char classes, bounded repeats, \b) behaves
    //       identically in java.util.regex and RE2. -----
    Q("q123_pii_scrub",
      Some(s"""SELECT source,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(len(regexp_extract_all(synth, '$emailRe'))) AS BIGINT) AS email_hits,
              |  CAST(sum(len(regexp_extract_all(synth, '$phoneRe'))) AS BIGINT) AS phone_hits,
              |  CAST(sum(len(synth) - len(masked)) AS BIGINT) AS chars_delta
              |FROM (
              |  SELECT source, synth,
              |    regexp_replace(regexp_replace(synth, '$emailRe', '<EMAIL>', 'g'),
              |      '$phoneRe', '<PHONE>', 'g') AS masked
              |  FROM (SELECT source, $synthSqlDuck AS synth FROM documents))
              |GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("source"), expr(synthSql).as("synth"))
          .withColumn("masked",
            regexp_replace(regexp_replace(col("synth"), emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(regexp_extract_all(col("synth"), lit(emailRe), lit(0))))
              .cast("long").as("email_hits"),
            sum(size(regexp_extract_all(col("synth"), lit(phoneRe), lit(0))))
              .cast("long").as("phone_hits"),
            sum(length(col("synth")) - length(col("masked")))
              .cast("long").as("chars_delta"))
          .orderBy("source")),

    // ----- benchmark-contamination screen: fraction of each corpus
    //       doc's 3-shingles that appear in the benchmark shingle set
    //       (docs 0-4 stand in for the eval suite). The benchmark set
    //       is aggregated to ONE array and broadcast — the overlap is
    //       then a row-local array_intersect at the scan, no join
    //       against the corpus. This is the decontamination shape at
    //       100 TB: eval suites are KBs, the corpus is the big side,
    //       and the screen must not shuffle the corpus. -----
    Q("q124_contamination",
      Some(s"""WITH sh AS (
              |  SELECT doc_id, source, $duckHashes AS hs, len($duckHashes) AS n
              |  FROM documents WHERE len(${Text.duckTokens}) >= 3
              |), ev AS (
              |  SELECT list(DISTINCT h) AS evh
              |  FROM (SELECT unnest(hs) AS h FROM sh WHERE doc_id < 5)
              |), scored AS (
              |  SELECT source,
              |    len(list_intersect(hs, evh)) / CAST(n AS DOUBLE) AS ov
              |  FROM sh CROSS JOIN ev WHERE doc_id >= 5)
              |SELECT source,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(count(*) FILTER (WHERE ov >= 0.1) AS BIGINT) AS n_flagged,
              |  round(max(ov), 4) AS max_overlap
              |FROM scored GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) => {
        val sh = Text.shingleHashSets(
          Tables.load(s, dir, "documents"), "text", Seq("doc_id", "source"))
        // no explode here: a Generate would make InferFiltersFromGenerate
        // push `size(hashes) > 0 / isnotnull(hashes)` guards below it,
        // and predicate pushdown re-expands those through the projection
        // into the FULL md5 shingle pipeline inside the Filter — every
        // row then hashes its shingles once for the guard and once for
        // the projection (measured 2.9s vs 0.3s for this 5-doc branch)
        val ev = sh.filter(col("doc_id") < 5)
          .agg(array_distinct(flatten(collect_list(col("hashes")))).as("evh"))
        sh.filter(col("doc_id") >= 5)
          .crossJoin(broadcast(ev))
          .withColumn("ov",
            size(array_intersect(col("hashes"), col("evh"))) / col("n").cast("double"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("ov") >= 0.1, 1)).as("n_flagged"),
            round(max(col("ov")), 4).as("max_overlap"))
          .orderBy("source")
      }),

    // ----- temperature-weighted source mixing (α = 0.5): per-source
    //       sampling weight ∝ tokens^α, the standard flattening of a
    //       fat-tailed source distribution when composing a training
    //       mix. Cross-engine determinism: sqrt is correctly rounded in
    //       IEEE 754 (unlike pow), the rounded weight goes through
    //       DECIMAL(18,4) so the normalizing sum is EXACT and
    //       order-independent in both engines, and shares divide as
    //       doubles from identical inputs. Two-level agg + a one-row
    //       broadcast-window normalization — per-source cardinality,
    //       not corpus cardinality. -----
    Q("q125_source_mix",
      Some("""WITH s AS (
             |  SELECT source, count(*) AS n_docs,
             |    sum(len(string_split(text, ' '))) AS n_tokens
             |  FROM documents GROUP BY source
             |), w AS (
             |  SELECT *, CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 4) AS DECIMAL(18,4)) AS wt
             |  FROM s)
             |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(n_tokens AS BIGINT) AS n_tokens,
             |  round(CAST(wt * 10000 AS DOUBLE) * 1000000
             |    / CAST(sum(wt) OVER () * 10000 AS DOUBLE)) / 1000000.0 AS share,
             |  CAST(round(CAST(wt * 10000 AS DOUBLE) * 10000
             |    / CAST(sum(wt) OVER () * 10000 AS DOUBLE)) AS BIGINT) AS docs_per_10k
             |FROM w ORDER BY source""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy()
        Tables.load(s, dir, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))
          .withColumn("wt",
            round(sqrt(col("n_tokens").cast("double")), 4).cast("decimal(18,4)"))
          // integer-scaled exact division (see q126): numerator and
          // denominator are exact-integer doubles, so rounding ties are
          // representable halves and both engines agree
          .withColumn("share",
            round((col("wt") * 10000).cast("double") * 1000000
              / (sum(col("wt")).over(w) * 10000).cast("double")) / 1000000.0)
          .withColumn("docs_per_10k",
            round((col("wt") * 10000).cast("double") * 10000
              / (sum(col("wt")).over(w) * 10000).cast("double")).cast("long"))
          .select("source", "n_docs", "n_tokens", "share", "docs_per_10k")
          .orderBy("source")
      }),

    // ----- k-means Lloyd step over embeddings: assign every vector to
    //       its nearest seed centroid (vec_id < 8 — rounded cosine,
    //       c_id tiebreak), then recompute each centroid as the per-dim
    //       member mean. The two halves are the scale shapes that
    //       matter: assignment is corpus × BROADCAST centroids (one
    //       scan, no corpus shuffle); the update is a (cluster, dim)
    //       keyed agg whose cardinality is k × dims, independent of
    //       corpus size — partial aggregation eats the posexplode.
    //       Output: member count, mean assignment cosine (cohesion),
    //       and the new centroid's L2 norm. -----
    Q("q126_kmeans_step",
      Some("""WITH e AS (
             |  SELECT vec_id, embedding::DOUBLE[] AS emb,
             |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
             |  FROM embeddings
             |), c AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm FROM e WHERE vec_id < 8),
             |asg AS (
             |  SELECT e.vec_id, c.c_id,
             |    round(list_dot_product(e.emb, c.c_emb) / (e.nrm * c.c_nrm), 4) AS rcos
             |  FROM e CROSS JOIN c),
             |best AS (
             |  SELECT vec_id, c_id AS cluster, rcos FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY rcos DESC, c_id) AS rn
             |    FROM asg) WHERE rn = 1),
             |dims AS (
             |  SELECT b.cluster, generate_subscripts(e.emb, 1) AS pos, unnest(e.emb) AS v
             |  FROM best b JOIN e ON e.vec_id = b.vec_id),
             |cent AS (SELECT cluster, pos, avg(v) AS m FROM dims GROUP BY cluster, pos),
             |norms AS (SELECT cluster, round(sqrt(sum(m * m)), 4) AS centroid_norm
             |          FROM cent GROUP BY cluster),
             |stats AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
             |            round(CAST(sum(CAST(rcos AS DECIMAL(8,4))) * 10000 AS DOUBLE)
             |              / count(*)) / 10000.0 AS cohesion FROM best GROUP BY cluster)
             |SELECT s.cluster, s.n_members, s.cohesion, n.centroid_norm
             |FROM stats s JOIN norms n USING (cluster)
             |ORDER BY cluster""".stripMargin),
      (s, dir) => {
        graft.functions.GraftExtensions.register(s)
        val e = Tables.load(s, dir, "embeddings")
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
        val wAsg = Window.partitionBy(col("vec_id")).orderBy(col("rcos").desc, col("c_id"))
        // narrow cache: assignment is (id, cluster, cos) — embeddings
        // rejoin later only for the members that feed the update step
        val best = e.select("vec_id", "embedding").crossJoin(broadcast(cents))
          .withColumn("rcos", round(expr("cosine_sim(embedding, c_emb)"), 4))
          .withColumn("rn", row_number().over(wAsg))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("c_id").as("cluster"), col("rcos"))
          .cache()
        best.count() // eager: stats and dims both consume it
        // Deterministic cross-engine mean of rounded values: sum as
        // exact DECIMAL (order-independent), scale to an INTEGER, and
        // divide two exact-integer doubles — any rounding tie is then
        // an exactly-representable half, which both engines round away
        // from zero. (A plain round(avg(x), 4) diverges when the true
        // mean is a decimal tie: Spark rounds the shortest decimal repr
        // of the double, DuckDB rounds its binary value.)
        val stats = best.groupBy("cluster")
          .agg(count(lit(1)).as("n_members"),
            (round((sum(col("rcos").cast("decimal(8,4)")) * 10000).cast("double")
              / count(lit(1))) / 10000.0).as("cohesion"))
        val cent = best.join(e, "vec_id")
          .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy("cluster", "pos")
          .agg(avg(col("v").cast("double")).as("m"))
        val norms = cent.groupBy("cluster")
          .agg(round(sqrt(sum(col("m") * col("m"))), 4).as("centroid_norm"))
        stats.join(norms, "cluster")
          .select("cluster", "n_members", "cohesion", "centroid_norm")
          .orderBy("cluster")
      }),

    // ----- int8 embedding quantization: per-vector symmetric scale
    //       (maxabs/127), quantize, reconstruct, report per-label error
    //       stats — the storage-shrink pass before building a vector
    //       index (4× smaller than float32). Entirely row-local array
    //       arithmetic fused into the scan; identical double expression
    //       trees (explicit parens) keep both engines bit-equal before
    //       the final rounding. -----
    Q("q127_quantize_int8",
      Some("""WITH q AS (
             |  SELECT label, emb,
             |    list_max(list_transform(emb, x -> abs(x))) AS maxabs
             |  FROM (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings)
             |), r AS (
             |  SELECT label, maxabs,
             |    list_max(list_transform(emb,
             |      x -> abs(x - ((round((x * 127) / maxabs) * maxabs) / 127)))) AS max_err
             |  FROM q)
             |SELECT CAST(label AS INT) AS label, CAST(count(*) AS BIGINT) AS n_vecs,
             |  round(CAST(sum(CAST(round(maxabs, 6) AS DECIMAL(12,6))) * 1000000 AS DOUBLE)
             |    / (100 * count(*))) / 10000.0 AS avg_maxabs,
             |  round(CAST(sum(CAST(round(max_err, 8) AS DECIMAL(14,8))) * 100000000 AS DOUBLE)
             |    / (100 * count(*))) / 1000000.0 AS avg_max_err,
             |  round(max(max_err), 6) AS worst_err
             |FROM r GROUP BY label ORDER BY label""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "embeddings")
          .select(col("label"),
            expr("transform(embedding, x -> cast(x as double))").as("emb"))
          .withColumn("maxabs", expr("array_max(transform(emb, x -> abs(x)))"))
          .withColumn("max_err", expr(
            "array_max(transform(emb, x -> abs(x - ((round((x * 127) / maxabs) * maxabs) / 127))))"))
          .groupBy(col("label").cast("int").as("label"))
          .agg(count(lit(1)).as("n_vecs"),
            // per-row values are deterministic (no accumulation); the
            // cross-row mean uses the exact-decimal-sum / integer-scaled
            // division pattern (see q126) so no rounding tie can split
            // the engines
            (round((sum(round(col("maxabs"), 6).cast("decimal(12,6)")) * 1000000)
              .cast("double") / (lit(100) * count(lit(1)))) / 10000.0).as("avg_maxabs"),
            (round((sum(round(col("max_err"), 8).cast("decimal(14,8)")) * 100000000L)
              .cast("double") / (lit(100) * count(lit(1)))) / 1000000.0).as("avg_max_err"),
            round(max(col("max_err")), 6).as("worst_err"))
          .orderBy("label")),

    // ----- cross-corpus chunk dedup (the line-level dedup of
    //       CCNet/Falcon, over fixed 8-token chunks): chunk the corpus
    //       row-locally, then ONE high-cardinality groupBy counts every
    //       chunk's occurrences — duplicated boilerplate surfaces as
    //       chunks shared across docs. Map-side partial aggregation
    //       absorbs the explosion; the surviving dup set is tiny. -----
    Q("q128_chunk_dedup",
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |ch AS (
             |  SELECT doc_id, unnest(list_transform(
             |    range(0, CAST(floor(len(toks) / 8) AS INT)),
             |    i -> array_to_string(toks[i*8+1 : i*8+8], ' '))) AS chunk
             |  FROM t)
             |SELECT chunk, CAST(count(*) AS BIGINT) AS n_occ,
             |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |  min(doc_id) AS first_doc
             |FROM ch GROUP BY chunk HAVING count(*) >= 2
             |ORDER BY n_occ DESC, chunk""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, cast(floor(size(toks) / 8) as int) - 1), " +
              "i -> concat_ws(' ', slice(toks, i * 8 + 1, 8)))")).as("chunk"))
          .groupBy("chunk")
          .agg(count(lit(1)).as("n_occ"),
            countDistinct(col("doc_id")).as("n_docs"),
            min(col("doc_id")).as("first_doc"))
          .filter(col("n_occ") >= 2)
          .orderBy(col("n_occ").desc, col("chunk"))),

    // ----- curriculum difficulty binning: per-source quartiles (ntile)
    //       over a rounded lexical-diversity score — the stage that
    //       orders a corpus easy→hard for curriculum schedules.
    //       ntile is deterministic because it orders by the ROUNDED
    //       score with a doc_id tiebreak; the window sorts within each
    //       source only (sources shard across executors at scale). -----
    Q("q129_curriculum_bins",
      Some("""WITH s AS (
             |  SELECT doc_id, source, n_chars,
             |    round(len(list_distinct(string_split(text, ' ')))
             |      / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS score
             |  FROM documents
             |), b AS (
             |  SELECT *, CAST(ntile(4) OVER (PARTITION BY source ORDER BY score, doc_id) AS INT) AS bin
             |  FROM s)
             |SELECT source, bin, CAST(count(*) AS BIGINT) AS n_docs,
             |  round(CAST(sum(CAST(score AS DECIMAL(8,4))) * 10000 AS DOUBLE) / count(*))
             |    / 10000.0 AS avg_score,
             |  CAST(min(n_chars) AS BIGINT) AS min_chars,
             |  CAST(max(n_chars) AS BIGINT) AS max_chars
             |FROM b GROUP BY source, bin ORDER BY source, bin""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("source")).orderBy(col("score"), col("doc_id"))
        Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"), col("source"), col("n_chars"),
            round(size(array_distinct(col("toks"))) / size(col("toks")).cast("double"), 4)
              .as("score"))
          .withColumn("bin", ntile(4).over(w))
          .groupBy("source", "bin")
          .agg(count(lit(1)).as("n_docs"),
            // exact-decimal-sum / integer-scaled division (see q126):
            // this group hit a true decimal tie at sf0.01 (2.1849/6 =
            // 0.36415 exactly), where plain round(avg) splits engines
            (round((sum(col("score").cast("decimal(8,4)")) * 10000).cast("double")
              / count(lit(1))) / 10000.0).as("avg_score"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy("source", "bin")
      }),

    // ----- APPLY the q125 mixing weights: materialize a 100-doc
    //       mixture where each source contributes its temperature-
    //       weighted quota, selected by HASH RANK (order by salted md5,
    //       id tiebreak) — the deterministic stand-in for per-source
    //       random sampling: a pure function of (salt, doc_id), stable
    //       across runs, partitioning, and cluster size, and exactly
    //       quota rows per source (Bernoulli sampling only hits the
    //       quota in expectation). Scale shape: quotas are a tiny
    //       broadcast; the rank is one per-source window over an
    //       (id, hash) projection — the text column is never read. -----
    Q("q148_apply_source_mix",
      Some("""WITH s AS (
             |  SELECT source, sum(len(string_split(text, ' '))) AS n_tokens
             |  FROM documents GROUP BY source
             |), w AS (
             |  SELECT source,
             |    CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 4) AS DECIMAL(18,4)) AS wt
             |  FROM s
             |), q AS (
             |  SELECT source, CAST(round(CAST(round(CAST(wt * 10000 AS DOUBLE) * 10000
             |    / CAST(sum(wt) OVER () * 10000 AS DOUBLE)) AS BIGINT) / 100.0) AS INT) AS quota
             |  FROM w
             |), r AS (
             |  SELECT source, doc_id, row_number() OVER (PARTITION BY source
             |    ORDER BY md5('mix' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents)
             |SELECT r.source, r.doc_id, CAST(rn AS INT) AS rn
             |FROM r JOIN q USING (source) WHERE rn <= quota
             |ORDER BY source, rn""".stripMargin),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val wAll = Window.partitionBy()
        // same exact-decimal share arithmetic as q125 (docs_per_10k),
        // scaled to a 100-doc mixture
        val quotas = docs.groupBy("source")
          .agg(sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))
          .withColumn("wt",
            round(sqrt(col("n_tokens").cast("double")), 4).cast("decimal(18,4)"))
          .withColumn("docs_per_10k",
            round((col("wt") * 10000).cast("double") * 10000
              / (sum(col("wt")).over(wAll) * 10000).cast("double")).cast("long"))
          .select(col("source"),
            round(col("docs_per_10k") / 100.0).cast("int").as("quota"))
        val wSrc = Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))
        docs.select(col("source"), col("doc_id"))
          .withColumn("hk", md5(concat(lit("mix"), col("doc_id").cast("string"))))
          .withColumn("rn", row_number().over(wSrc))
          .join(broadcast(quotas), "source")
          .filter(col("rn") <= col("quota"))
          .select(col("source"), col("doc_id"), col("rn"))
          .orderBy("source", "rn")
      }),

    // ----- k-means TRAINER (q288): q126 ran ONE Lloyd step; this is
    //       the bounded-round loop (3 rounds, k = 8 seeds) under the
    //       q166/q285 iteration discipline — per round: assignment is
    //       corpus x BROADCAST centroids (k x dims is tiny at any
    //       corpus size), the update is a (cluster, dim)-keyed agg
    //       whose cardinality is k x dims (corpus-size-independent,
    //       partial agg eats the posexplode), and both the assignment
    //       and the new centroid frame localCheckpoint so the plan
    //       stays O(1) across rounds (production: persist + unpersist
    //       the previous round). Cross-engine round stability: the
    //       embeddings quantize ONCE to 4-dp doubles, so every later
    //       centroid mean is an exact DECIMAL sum scaled to an integer
    //       divide (order-independent), and each round's centroids are
    //       themselves 4-dp — float drift cannot compound across
    //       rounds. Output = per-round per-cluster (members, cohesion,
    //       centroid norm); the oracle unrolls the SAME three rounds as
    //       chained CTEs, so every round hash-checks, not just the
    //       fixpoint. -----
    Q("q288_kmeans_train",
      Some(duckKmeansRounds(3)),
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"),
            expr("transform(embedding, x -> round(cast(x AS double), 4))")
              .as("emb"))
        var cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("emb").as("c_emb"))
          .localCheckpoint(true)
        // sequential left-to-right folds — the same element order DuckDB's
        // list_dot_product sums in, so the doubles match bit-for-bit
        val dot = "aggregate(zip_with(emb, c_emb, (x, y) -> x * y), " +
          "0D, (acc, x) -> acc + x)"
        val nA = "sqrt(aggregate(transform(emb, x -> x * x), 0D, (acc, x) -> acc + x))"
        val nB = "sqrt(aggregate(transform(c_emb, x -> x * x), 0D, (acc, x) -> acc + x))"
        val rounds = scala.collection.mutable.ArrayBuffer[DataFrame]()
        for (r <- 1 to 3) {
          val wAsg = Window.partitionBy(col("vec_id"))
            .orderBy(col("rcos").desc, col("c_id"))
          val best = e.crossJoin(broadcast(cents))
            .withColumn("rcos", round(expr(s"$dot / ($nA * $nB)"), 4))
            .withColumn("rn", row_number().over(wAsg))
            .filter(col("rn") === 1)
            .select(col("vec_id"), col("c_id").as("cluster"), col("rcos"))
            .localCheckpoint(true)
          val stats = best.groupBy("cluster")
            .agg(count(lit(1)).as("n_members"),
              (round((sum(col("rcos").cast("decimal(8,4)")) * 10000)
                .cast("double") / count(lit(1))) / 10000.0).as("cohesion"))
          val cent = best.join(e, "vec_id")
            .select(col("cluster"), posexplode(col("emb")).as(Seq("pos", "v")))
            .groupBy("cluster", "pos")
            .agg((round((sum(col("v").cast("decimal(18,4)")) * 10000)
              .cast("double") / count(lit(1))) / 10000.0).as("m"))
          // m and m*m are exact 4-/8-dp decimals under the hood, so the
          // decimal casts are lossless and the norm sum order-proof
          val norms = cent.groupBy("cluster")
            .agg(round(sqrt(sum((col("m") * col("m")).cast("decimal(20,8)"))
              .cast("double")), 4).as("centroid_norm"))
          rounds += stats.join(norms, "cluster")
            .select(lit(r).cast("long").as("rnd"), col("cluster"),
              col("n_members"), col("cohesion"), col("centroid_norm"))
          // LAZY on purpose: cents is a k-row aggregate over the
          // round's CHECKPOINTED assignment frame, so the next round's
          // broadcast computes it in one shallow pass — an eager
          // checkpoint here was a whole extra scheduled action per
          // round for a frame that is consumed exactly once (plan
          // depth stays O(1) because `best` truncates each round)
          cents = cent.groupBy("cluster")
            .agg(expr(
              "transform(sort_array(collect_list(struct(pos, m))), s -> s.m)")
              .as("c_emb"))
            .select(col("cluster").as("c_id"), col("c_emb"))
        }
        rounds.reduce(_ unionByName _).orderBy("rnd", "cluster")
      }),

    // ----- language ID by char-trigram profiles (q289): the classic
    //       n-gram language classifier (Cavnar–Trenkle / CLD shape) as
    //       a differential op — train per-lang top-20 trigram profiles
    //       on the even-doc_id half, classify the odd half, report
    //       per-language accuracy. 100-TB shape: the profile is langs
    //       x 20 rows (BROADCAST — genuinely tiny at any corpus size,
    //       unlike entity-cardinality frames), the corpus side is one
    //       explode into (doc, trigram) counts (keyed agg, map-side
    //       combinable), one int-weighted equi-join on the trigram,
    //       and per-doc argmax (one window, the same shuffle class as
    //       a keyed agg). All-integer scores: rank-weight x count —
    //       zero float hazards anywhere. Docs sharing no profile
    //       trigram drop out of the denominator in BOTH engines
    //       (inner-join flow), so n_docs states the classified set
    //       explicitly. -----
    Q("q289_lang_id",
      Some("""WITH d AS (
             |  SELECT doc_id, lang, text FROM documents WHERE len(text) >= 3),
             |tg AS (
             |  SELECT doc_id, lang, unnest(list_transform(range(1, len(text) - 1),
             |    i -> substr(text, i, 3))) AS tri
             |  FROM d),
             |prof AS (
             |  SELECT cand, tri, 21 - rk AS w FROM (
             |    SELECT lang AS cand, tri, count(*) AS cnt,
             |      row_number() OVER (PARTITION BY lang
             |        ORDER BY count(*) DESC, tri) AS rk
             |    FROM tg WHERE doc_id % 2 = 0 GROUP BY lang, tri)
             |  WHERE rk <= 20),
             |dc AS (
             |  SELECT doc_id, lang, tri, count(*) AS n FROM tg
             |  WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3),
             |scored AS (
             |  SELECT dc.doc_id, dc.lang, prof.cand, sum(dc.n * prof.w) AS score
             |  FROM dc JOIN prof ON dc.tri = prof.tri
             |  GROUP BY 1, 2, 3),
             |pred AS (
             |  SELECT * FROM (
             |    SELECT *, row_number() OVER (PARTITION BY doc_id
             |      ORDER BY score DESC, cand) AS rn
             |    FROM scored) WHERE rn = 1)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN cand = lang THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_correct,
             |  round(sum(CASE WHEN cand = lang THEN 1 ELSE 0 END) * 10000.0
             |    / count(*)) / 10000.0 AS acc
             |FROM pred GROUP BY lang ORDER BY lang""".stripMargin),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .filter(length(col("text")) >= 3)
        val tri = docs.select(col("doc_id"), col("lang"),
          explode(expr("transform(sequence(1, length(text) - 2), " +
            "i -> substring(text, i, 3))")).as("tri"))
        val prof = tri.filter(col("doc_id") % 2 === 0)
          .groupBy(col("lang").as("cand"), col("tri"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("cand").orderBy(col("cnt").desc, col("tri"))))
          .filter(col("rk") <= 20)
          .select(col("cand"), col("tri"),
            (lit(21) - col("rk")).cast("long").as("w"))
        val dc = tri.filter(col("doc_id") % 2 === 1)
          .groupBy("doc_id", "lang", "tri").agg(count(lit(1)).as("n"))
        val scored = dc.join(broadcast(prof), "tri")
          .groupBy("doc_id", "lang", "cand")
          .agg(sum(col("n") * col("w")).as("score"))
        val pred = scored.withColumn("rn", row_number().over(
            Window.partitionBy("doc_id").orderBy(col("score").desc, col("cand"))))
          .filter(col("rn") === 1)
        pred.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("cand") === col("lang"), 1L).otherwise(0L))
              .as("n_correct"))
          .withColumn("acc", round(col("n_correct").cast("double") * 10000.0
            / col("n_docs").cast("double")) / 10000.0)
          .select("lang", "n_docs", "n_correct", "acc")
          .orderBy("lang")
      }),

    // ----- DSIR-style importance selection (q291): resample the raw
    //       corpus toward a TARGET domain (here: the lang='en' slice)
    //       by unigram-LM importance ratios — the Xie-et-al data
    //       selection shape, with deterministic per-source top-10%
    //       selection standing in for the sampling step (the same
    //       rank-based materialization discipline as q148/q165).
    //       100-TB shape: token stats are keyed aggs; the per-token
    //       log-ratio table is VOCAB-sized, so the doc-scoring join is
    //       an honest token-keyed equi-join (not broadcast — Heaps'-law
    //       millions of types at corpus scale); selection is one
    //       per-source window (the q275 shuffle class). Cross-engine
    //       determinism: add-one-smoothed ratios of exact integers,
    //       one ln per TOKEN TYPE quantized to an e4 BIGINT, so every
    //       per-doc score and mean is exact integer arithmetic. -----
    Q("q291_importance_select",
      Some("""WITH tok AS (
             |  SELECT doc_id, source, lang, t FROM (
             |    SELECT doc_id, source, lang,
             |      unnest(string_split(text, ' ')) AS t FROM documents)
             |  WHERE regexp_matches(t, '^[a-z]{2,}$')),
             |rc AS (SELECT t, count(*) AS rc FROM tok GROUP BY t),
             |tc AS (SELECT t, count(*) AS tc FROM tok
             |       WHERE lang = 'en' GROUP BY t),
             |tot AS (SELECT (SELECT sum(rc) FROM rc) AS nr,
             |        (SELECT count(*) FROM tok WHERE lang = 'en') AS nt,
             |        (SELECT count(*) FROM rc) AS v),
             |lr AS (SELECT rc.t,
             |    CAST(round(ln(
             |      CAST((coalesce(tc.tc, 0) + 1) * (tot.nr + tot.v) AS DOUBLE)
             |      / ((rc.rc + 1.0) * CAST(tot.nt + tot.v AS DOUBLE)))
             |      * 10000) AS BIGINT) AS lr_e4
             |  FROM rc LEFT JOIN tc ON tc.t = rc.t CROSS JOIN tot),
             |dt AS (SELECT doc_id, source, t, count(*) AS n
             |       FROM tok GROUP BY 1, 2, 3),
             |sc AS (SELECT dt.doc_id, dt.source,
             |         sum(dt.n * lr.lr_e4) AS score_e4
             |       FROM dt JOIN lr ON lr.t = dt.t GROUP BY 1, 2),
             |sel AS (SELECT * FROM (
             |  SELECT source, doc_id, score_e4,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY score_e4 DESC, doc_id) AS rn,
             |    count(*) OVER (PARTITION BY source) AS nsrc
             |  FROM sc) WHERE rn <= ceil(nsrc / 10.0)),
             |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
             |      FROM sc GROUP BY source),
             |b AS (SELECT source, CAST(count(*) AS BIGINT) AS n_selected,
             |        round(CAST(sum(score_e4) AS DOUBLE) / count(*))
             |          / 10000.0 AS mean_sel_score
             |      FROM sel GROUP BY source)
             |SELECT a.source, a.n_docs, b.n_selected, b.mean_sel_score
             |FROM a JOIN b USING (source) ORDER BY source""".stripMargin),
      (s, dir) => {
        val tok = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("lang"),
            explode(split(col("text"), " ")).as("t"))
          .filter(col("t").rlike("^[a-z]{2,}$"))
        val rc = tok.groupBy("t").agg(count(lit(1)).as("rc"))
        val tc = tok.filter(col("lang") === "en")
          .groupBy("t").agg(count(lit(1)).as("tc"))
        val tot = rc.agg(sum(col("rc")).as("nr"), count(lit(1)).as("v"))
          .crossJoin(tok.filter(col("lang") === "en")
            .agg(count(lit(1)).as("nt")))
        val lr = rc.join(tc, Seq("t"), "left")
          .crossJoin(broadcast(tot))
          .withColumn("lr_e4", round(log(
            ((coalesce(col("tc"), lit(0L)) + 1) * (col("nr") + col("v")))
              .cast("double")
              / ((col("rc") + lit(1.0))
                 * (col("nt") + col("v")).cast("double")))
            * 10000).cast("long"))
          .select("t", "lr_e4")
        val dt = tok.groupBy("doc_id", "source", "t")
          .agg(count(lit(1)).as("n"))
        val sc = dt.join(lr, "t")
          .groupBy("doc_id", "source")
          .agg(sum(col("n") * col("lr_e4")).as("score_e4"))
        val wSrc = Window.partitionBy("source")
          .orderBy(col("score_e4").desc, col("doc_id"))
        val sel = sc.withColumn("rn", row_number().over(wSrc))
          .withColumn("nsrc", count(lit(1)).over(Window.partitionBy("source")))
          .filter(col("rn") <= ceil(col("nsrc") / lit(10.0)))
        val a = sc.groupBy("source").agg(count(lit(1)).as("n_docs"))
        val b = sel.groupBy("source")
          .agg(count(lit(1)).as("n_selected"),
            (round(sum(col("score_e4")).cast("double") / count(lit(1)))
              / 10000.0).as("mean_sel_score"))
        a.join(b, "source")
          .select("source", "n_docs", "n_selected", "mean_sel_score")
          .orderBy("source")
      }),

    // ----- temperature-scaled mixture with capacity caps (q294): the
    //       mT5/PaLM sampling-rate design — per-(source, lang) cell
    //       weights ∝ p^α (α = 0.5 flattens toward uniform), then cap
    //       any cell at 1.5e6 e8-units (1.5%) and redistribute the
    //       excess proportionally among uncapped cells, iterating 3
    //       bounded rounds (capping can push a renormalized cell back
    //       over the cap — the classic waterfilling loop). 100-TB
    //       shape: ONE corpus pass into a (source, lang)-keyed token
    //       count (map-side combinable); every round after is
    //       cells-sized (corpus-size-independent) with a broadcast
    //       2-value aggregate, localCheckpoint per round (the q166
    //       discipline). Cross-engine determinism: p^0.5 is IEEE
    //       `sqrt` (correctly rounded — stronger than exp/ln), scores
    //       quantize to e4, weights live as e8 BIGINTs re-quantized
    //       every round, and each round's update is one double
    //       division of exact integers; the oracle unrolls the SAME
    //       three rounds as chained CTEs so every round hash-checks,
    //       not just the fixpoint. -----
    Q("q294_capped_mixture",
      Some(s"""WITH $duckMixtureCtes
             |SELECT * FROM (
             |  SELECT CAST(1 AS BIGINT) AS rnd, source, lang,
             |    w / 100000000.0 AS weight FROM w1
             |  UNION ALL SELECT CAST(2 AS BIGINT), source, lang,
             |    w / 100000000.0 FROM w2
             |  UNION ALL SELECT CAST(3 AS BIGINT), source, lang,
             |    w / 100000000.0 FROM w3)
             |ORDER BY rnd, source, lang""".stripMargin),
      (s, dir) => {
        val rounds = cappedMixtureRounds(mixtureCells(s, dir))
        rounds.zipWithIndex
          .map { case (w, i) => w.withColumn("rnd", lit((i + 1).toLong)) }
          .reduce(_ unionByName _)
          .select(col("rnd"), col("source"), col("lang"),
            (col("w") / 100000000.0).as("weight"))
          .orderBy("rnd", "source", "lang")
      }),

    // ----- token-budget epoch planner (q299): the data-constrained-
    //       scaling audit run BEFORE training (Muennighoff et al.: past
    //       ~4 epochs repeated tokens stop helping) — given the q294
    //       effective mixture and a budget of 2× the corpus's tokens
    //       (scale-invariant: the plan is meaningful at any SF — flat
    //       cells land near 2 epochs, capped-big cells under 1, small
    //       cells the sqrt-temperature pulled UP blow the 4-epoch
    //       wall), how many epochs does each (source, lang) cell run,
    //       which cells exceed 4, and how many tokens are effective?
    //       target = budget × weight; epochs = target / available;
    //       effective = min(target, 4 × available). 100-TB shape: the
    //       corpus pass is q294's cell count (shared helper), the
    //       planner itself is cells-sized arithmetic — exact integers
    //       end to end (e8 weights, e4 epochs), so the board hash-
    //       checks the planning table a mixture designer acts on. -----
    Q("q299_epoch_plan",
      Some(s"""WITH $duckMixtureCtes,
             |plan AS (
             |  SELECT cell.source, cell.lang, cell.n,
             |    CAST(round(2.0 * tt.tt * w3.w / 100000000.0) AS BIGINT)
             |      AS target_tokens
             |  FROM cell JOIN w3 ON w3.source = cell.source
             |    AND w3.lang = cell.lang CROSS JOIN tt)
             |SELECT source, lang, n AS avail_tokens, target_tokens,
             |  round(CAST(target_tokens AS DOUBLE) / n, 4) AS epochs,
             |  target_tokens > 4 * n AS over_4ep,
             |  least(target_tokens, 4 * n) AS effective_tokens
             |FROM plan ORDER BY source, lang""".stripMargin),
      (s, dir) => {
        val cells = mixtureCells(s, dir).localCheckpoint(true)
        val w3 = cappedMixtureRounds(cells).last
        val tt = cells.agg(sum(col("n")).as("tt"))
        cells.join(w3, Seq("source", "lang"))
          .crossJoin(broadcast(tt))
          .withColumn("target_tokens",
            round(lit(2.0) * col("tt") * col("w") / lit(100000000.0))
              .cast("long"))
          .select(col("source"), col("lang"), col("n").as("avail_tokens"),
            col("target_tokens"),
            round(col("target_tokens").cast("double") / col("n"), 4)
              .as("epochs"),
            (col("target_tokens") > lit(4L) * col("n")).as("over_4ep"),
            least(col("target_tokens"), lit(4L) * col("n"))
              .as("effective_tokens"))
          .orderBy("source", "lang")
      })
  )

  /** The q288 oracle: `n` Lloyd rounds unrolled as chained CTEs — each
    * round re-derives its assignment (rounded cosine, c_id tiebreak),
    * its per-cluster stats, and its 4-dp-quantized centroids. */
  private def duckKmeansRounds(n: Int): String = {
    val base =
      """e AS (
        |  SELECT vec_id,
        |    list_transform(embedding::DOUBLE[], x -> round(x, 4)) AS emb
        |  FROM embeddings),
        |en AS (SELECT vec_id, emb,
        |  sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
        |c0 AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 8)""".stripMargin
    val rounds = (1 to n).map { r =>
      s"""asg$r AS (
         |  SELECT en.vec_id, c.c_id,
         |    round(list_dot_product(en.emb, c.c_emb)
         |      / (en.nrm * sqrt(list_dot_product(c.c_emb, c.c_emb))), 4) AS rcos
         |  FROM en CROSS JOIN c${r - 1} c),
         |best$r AS (
         |  SELECT vec_id, c_id AS cluster, rcos FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY rcos DESC, c_id) AS rn FROM asg$r)
         |  WHERE rn = 1),
         |stats$r AS (
         |  SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
         |    round(CAST(sum(CAST(rcos AS DECIMAL(8,4))) * 10000 AS DOUBLE)
         |      / count(*)) / 10000.0 AS cohesion
         |  FROM best$r GROUP BY cluster),
         |dims$r AS (
         |  SELECT b.cluster, generate_subscripts(e.emb, 1) AS pos,
         |    unnest(e.emb) AS v
         |  FROM best$r b JOIN e ON e.vec_id = b.vec_id),
         |cent$r AS (
         |  SELECT cluster, pos,
         |    round(CAST(sum(CAST(v AS DECIMAL(18,4))) * 10000 AS DOUBLE)
         |      / count(*)) / 10000.0 AS m
         |  FROM dims$r GROUP BY cluster, pos),
         |cn$r AS (
         |  SELECT cluster,
         |    round(sqrt(CAST(sum(CAST(m * m AS DECIMAL(20,8))) AS DOUBLE)), 4)
         |      AS centroid_norm
         |  FROM cent$r GROUP BY cluster),
         |c$r AS (
         |  SELECT cluster AS c_id, list(m ORDER BY pos) AS c_emb
         |  FROM cent$r GROUP BY cluster)""".stripMargin
    }
    val selects = (1 to n).map(r =>
      s"SELECT CAST($r AS BIGINT) AS rnd, s.cluster, s.n_members, " +
        s"s.cohesion, n.centroid_norm FROM stats$r s JOIN cn$r n USING (cluster)")
      .mkString("\nUNION ALL\n")
    s"WITH $base,\n${rounds.mkString(",\n")}\n$selects\nORDER BY rnd, cluster"
  }

  /** DuckDB per-doc distinct shingle-hash list (mirrors
    * [[Text.shingleHashSets]]; see Text for the determinism notes). */
  private def duckHashes: String = Text.duckShingleHashes
}
