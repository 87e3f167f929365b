package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LLM-training-data text operators over `documents` (SURVEY.md §2.9):
  * exact + near dedup (MinHash-LSH, SimHash, n-gram Jaccard), language
  * ID, quality scoring, token counting, rolling-hash fingerprinting.
  *
  * Cross-engine determinism: every hash bottoms out in `md5(...)` hex
  * strings (identical in Spark and DuckDB), reduced to integers via
  * base-16 conversion of a 14-hex-digit prefix (56 bits, fits a signed
  * 64-bit long in both engines). MinHash minima compare lexicographic
  * hex strings — also engine-independent.
  *
  * Scale design (100 TB):
  *  - all shingle/token explosion is followed by keyed aggregation —
  *    shuffles are on high-cardinality keys (shingle text, band
  *    bucket), never all-pairs;
  *  - near-dup candidate generation is bounded: MinHash-LSH only pairs
  *    docs sharing a band bucket; the plain Jaccard variant blocks on
  *    `source` — both avoid the quadratic cross join;
  *  - everything is built-in higher-order functions (whole-stage
  *    codegen, no UDFs).
  */
object Text {

  /** 56-bit portable hash: Spark side. DuckDB side is
    * `('0x' || substr(md5(x),1,14))::BIGINT`. */
  private def hash56(e: String): String =
    s"cast(conv(substring(md5($e), 1, 14), 16, 10) as bigint)"

  private val tokens = "split(text, ' ')"

  private[ops] val duckTokens = "string_split(text, ' ')"
  private val duckShingles =
    s"list_transform(range(1, greatest(len($duckTokens) - 1, 1)), i -> array_to_string(($duckTokens)[i:i+2], ' '))"

  /** Per-doc DISTINCT shingle hashes (DuckDB side): each shingle is
    * md5'd ONCE to a 56-bit int; all downstream minhashing works on
    * these ints. */
  private[ops] val duckShingleHashes =
    s"list_distinct(list_transform($duckShingles, x -> ('0x' || substr(md5(x),1,14))::BIGINT))"

  /** MinHash permutation seeds: k=6, banded 2-per-band → 3 LSH bands.
    * Each "permutation" is xor by a 56-bit constant — a bijection on
    * the hash space, so min-over-xored-hashes is a valid minhash; this
    * replaces 6 md5 invocations per shingle with 1 md5 + 6 xors (the
    * md5 was ~5/6 of the near-dup pipeline's map time at sf0.1, and at
    * 100 TB shingle hashing dominates the whole dedup stage). 56 bits
    * keeps every value positive in a signed 64-bit long in BOTH
    * engines. */
  private val mhSeeds: Seq[Long] = Seq(
    0x9E3779B97F4A7CL, 0xC2B2AE3D27D4EBL, 0x165667B19E3779L,
    0x27D4EB2F165667L, 0x85EBCA6B2C2B2AL, 0x5BD1E9955BD1E9L)

  private val stopEn = Seq("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")

  private def inList(words: Seq[String]) = words.map(w => s"'$w'").mkString("(", ",", ")")

  /** Documents with their per-doc DISTINCT 3-shingle HASH set (56-bit
    * ints) and its size. Tokens and shingle strings are hoisted into
    * columns FIRST: referencing `split(...)` inline inside a transform
    * lambda re-tokenizes the text once per shingle (quadratic per row —
    * measured 4s of pure tokenize at sf0.1); a column reference
    * evaluates once per row. Each shingle is md5'd exactly once; dedup
    * via array_distinct is row-local — no shuffle. All downstream
    * near-dup ops (minhash, band join, intersection counting) work on
    * the int hashes: int shuffles instead of string shuffles.
    */
  /** PUBLIC generic form: per-row DISTINCT k-shingle hash sets over any
    * text column. Keeps `keep` columns alongside `hashes` and `n`. */
  def shingleHashSets(docs: org.apache.spark.sql.DataFrame, textCol: String,
                      keep: Seq[String], k: Int = 3): org.apache.spark.sql.DataFrame =
    docs
      .withColumn("toks", split(col(textCol), " "))
      .filter(size(col("toks")) >= k)
      .withColumn("shingles",
        expr(s"transform(sequence(1, size(toks) - ${k - 1}), i -> concat_ws(' ', slice(toks, i, $k)))"))
      .select(keep.map(col) :+
        expr(s"array_distinct(transform(shingles, x -> ${hash56("x")}))").as("hashes"): _*)
      .withColumn("n", size(col("hashes")))

  private def shingleSets(s: SparkSession, dir: String, extra: Seq[String] = Nil) =
    shingleHashSets(Tables.load(s, dir, "documents"), "text", "doc_id" +: extra)

  /** Spark-side minhash signature columns over the hoisted hash set. */
  def mhCols: Seq[org.apache.spark.sql.Column] =
    mhSeeds.zipWithIndex.map { case (seed, i) =>
      expr(s"array_min(transform(hashes, h -> h ^ ${seed}L))").as(s"mh${i + 1}")
    }

  /** DuckDB text of the same signature columns (over a list column `hs`). */
  private def duckMhExprs(hs: String): Seq[String] =
    mhSeeds.zipWithIndex.map { case (seed, i) =>
      s"list_min(list_transform($hs, h -> xor(h, $seed))) AS mh${i + 1}"
    }

  /** PUBLIC canonical selection (the near-dup pipeline's last stage):
    * given cluster labels (`id`, `component`) — e.g. from
    * [[Graph.connectedComponents]] — and per-doc scores (`idCol`,
    * `scoreCol`), keep the best-scoring member of each cluster
    * (score DESC, id tiebreak). The cluster frame holds clustered docs
    * only (tiny vs the corpus) and broadcasts against the scored scan. */
  def keepBestPerCluster(components: org.apache.spark.sql.DataFrame,
                         scored: org.apache.spark.sql.DataFrame,
                         idCol: String = "doc_id",
                         scoreCol: String = "score"): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component")).orderBy(col(scoreCol).desc, col("id"))
    scored.join(org.apache.spark.sql.functions.broadcast(components),
        scored(idCol) === components("id"))
      .select(col("component"), col("id"), col(scoreCol))
      .withColumn("rn", row_number().over(w))
      .groupBy("component")
      .agg(count(lit(1)).as("n_members"),
        min(when(col("rn") === 1, col("id"))).as("kept_doc"),
        min(when(col("rn") === 1, col(scoreCol))).as("kept_score"))
  }

  /** Band-bucket size cap for LSH candidate generation. A bucket with
    * B members yields B·(B−1)/2 candidate pairs, so ONE pathological
    * bucket (every page of a boilerplate-heavy crawl sharing a
    * template) turns the candidate stage quadratic regardless of
    * corpus size — the builder's own probe showed candidate wall
    * tracks duplicate DENSITY, not rows (SCALING.md round 8). Buckets
    * above the cap are dropped entirely (deterministic, mirrorable in
    * the oracle SQL — sampling isn't); what was dropped is never
    * silent: [[lshBucketAudit]] reports skipped bucket/pair counts per
    * band, and q204 puts those counts on the correctness board. At
    * fixture scale the largest bucket is 4, so the cap is invisible to
    * every green oracle; at 100 TB it converts the worst case from
    * O(dups²) to O(corpus · cap). */
  private[graft] val lshBucketCap = 64

  /** The 3-band (v1, v2) bucket layout over a signature frame — the
    * single definition [[bandPairs]] and [[lshBucketAudit]] share. */
  private def bandLayout(sig: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    Seq((1, "mh1", "mh2"), (2, "mh3", "mh4"), (3, "mh5", "mh6"))
      .map { case (b, x, y) =>
        sig.select(col("doc_id"), lit(b).as("band"), col(x).as("v1"), col(y).as("v2"))
      }.reduce(_.unionByName(_))

  /** LSH band-bucket candidate pairs (d1 < d2, distinct) from a
    * signature frame — THE candidate-generation stage every near-dup
    * variant shares (q41 Jaccard, q143 containment, q104/q134 edges).
    * One definition so a banding change (k, band layout) can never
    * make the variants silently diverge.
    *
    * Shape: ONE shuffle (groupBy the band key) collects each bucket's
    * members, the cap filter drops pathological buckets
    * ([[lshBucketCap]]), and pairs explode bucket-locally — vs the
    * former bands⋈bands self-join this halves the shuffled volume and
    * gives the guard a place to cut BEFORE any pair exists. Bucket
    * arrays are bounded by the cap, so collect_list is safe at any
    * corpus size. */
  private[graft] def bandPairs(sig: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    bandLayout(sig)
      .groupBy("band", "v1", "v2")
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, lshBucketCap))
      .select(explode(expr(
        """filter(flatten(transform(ids, x -> transform(ids, y -> named_struct('d1', x, 'd2', y)))),
          |       p -> p.d1 < p.d2)""".stripMargin)).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2")).distinct()

  /** No-silent-caps observability for [[bandPairs]]: per band, how many
    * buckets exist, the largest, and exactly how many buckets/pairs the
    * [[lshBucketCap]] guard dropped. q204 keeps these numbers on the
    * correctness board (differential vs DuckDB), so a corpus dense
    * enough to trip the guard shows up as nonzero skip counts — never
    * as silently-missing near-dup pairs. */
  def lshBucketAudit(sig: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    bandLayout(sig)
      .groupBy("band", "v1", "v2").agg(count(lit(1)).as("bsz"))
      .groupBy("band").agg(
        count(lit(1)).as("n_buckets"),
        max(col("bsz")).as("max_bucket"),
        sum(when(col("bsz") > lshBucketCap, 1L).otherwise(0L)).as("n_skipped_buckets"),
        sum(when(col("bsz") > lshBucketCap,
          expr("bsz * (bsz - 1) DIV 2")).otherwise(0L)).as("n_skipped_pairs"))
      .orderBy("band")

  /** MinHash-LSH candidate edges (q41's generation stage) as an
    * undirected edge list — shared by q104/q134. The signature frame is
    * cached + eager: the three band branches and both self-join sides
    * would otherwise re-run the whole shingle-hash pipeline 6×. */
  private[ops] def lshBandEdges(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val sig = shingleSets(s, dir).select(col("doc_id") +: mhCols: _*).cache()
    sig.count()
    bandPairs(sig).select(col("d1").as("src"), col("d2").as("dst"))
  }

  /** Shared q41/q143 verify-stage relation: band candidates with their
    * shingle-set intersection count and both set sizes — columns
    * (d1, d2, i, n1, n2). The candidate and size frames broadcast; the
    * only big shuffle is the shingle self-match. */
  private def candidateOverlap(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val docs = shingleSets(s, dir).cache()
    docs.count() // eager: concurrent downstream jobs must not race the cache
    val cand = bandPairs(docs.select(col("doc_id") +: mhCols: _*))
    val sh = docs.select(col("doc_id"), explode(col("hashes")).as("h"))
    val sizes = docs.select(col("doc_id"), col("n"))
    // No broadcast hints: cand is data-dependent (dup-density-sized)
    // and sizes is corpus-cardinality — neither is broadcastable at
    // 100 TB. AQE broadcasts whichever side is actually small at
    // runtime, which at fixture scale is all of them.
    cand
      .join(sh.as("x"), col("x.doc_id") === col("d1"))
      .join(sh.as("y"), col("y.doc_id") === col("d2") && col("x.h") === col("y.h"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("i"))
      .join(sizes.as("s1"), col("s1.doc_id") === col("d1"))
      .join(sizes.as("s2"), col("s2.doc_id") === col("d2"))
      .select(col("d1"), col("d2"), col("i"),
        col("s1.n").as("n1"), col("s2.n").as("n2"))
  }

  /** DuckDB copy of the same pipeline (CTE chain ending in `inter` +
    * `sizes`), shared verbatim by the q41/q143 oracles. */
  private def duckLshCtes: String =
    s"""sig AS (
       |  SELECT doc_id, ${duckMhExprs("hs").mkString(", ")}
       |  FROM (SELECT doc_id, $duckShingleHashes AS hs
       |        FROM documents WHERE len($duckTokens) >= 3)
       |), bands AS (
       |  SELECT doc_id, band, v1, v2 FROM (
       |    SELECT doc_id, 1 AS band, mh1 AS v1, mh2 AS v2 FROM sig
       |    UNION ALL SELECT doc_id, 2, mh3, mh4 FROM sig
       |    UNION ALL SELECT doc_id, 3, mh5, mh6 FROM sig)
       |), bsz AS (
       |  SELECT band, v1, v2, count(*) AS c FROM bands GROUP BY band, v1, v2
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.v1 = b.v1 AND a.v2 = b.v2
       |    AND a.doc_id < b.doc_id
       |  JOIN bsz s ON s.band = a.band AND s.v1 = a.v1 AND s.v2 = a.v2
       |    AND s.c <= $lshBucketCap
       |), sh AS (
       |  SELECT doc_id, unnest($duckShingleHashes) AS h
       |  FROM documents WHERE len($duckTokens) >= 3
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
       |), inter AS (
       |  SELECT c.d1, c.d2, count(*) AS i
       |  FROM cand c JOIN sh x ON x.doc_id = c.d1 JOIN sh y ON y.doc_id = c.d2 AND x.h = y.h
       |  GROUP BY c.d1, c.d2
       |)""".stripMargin

  /** DuckDB CTE chain sig → bands → edges → reach → comp (recursive
    * reachability closure), shared verbatim by the q104/q134 oracles so
    * the two can never drift. Use as `WITH RECURSIVE $duckComponentsCtes`. */
  private def duckComponentsCtes: String =
    s"""sig AS (
       |  SELECT doc_id, ${duckMhExprs("hs").mkString(", ")}
       |  FROM (SELECT doc_id, $duckShingleHashes AS hs
       |        FROM documents WHERE len($duckTokens) >= 3)
       |), bands AS (
       |  SELECT doc_id, band, v1, v2 FROM (
       |    SELECT doc_id, 1 AS band, mh1 AS v1, mh2 AS v2 FROM sig
       |    UNION ALL SELECT doc_id, 2, mh3, mh4 FROM sig
       |    UNION ALL SELECT doc_id, 3, mh5, mh6 FROM sig)
       |), bsz AS (
       |  SELECT band, v1, v2, count(*) AS c FROM bands GROUP BY band, v1, v2
       |), edges AS (
       |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.v1 = b.v1 AND a.v2 = b.v2
       |    AND a.doc_id <> b.doc_id
       |  JOIN bsz s ON s.band = a.band AND s.v1 = a.v1 AND s.v2 = a.v2
       |    AND s.c <= $lshBucketCap
       |), reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |), comp AS (
       |  SELECT src AS id, least(src, min(dst)) AS component FROM reach GROUP BY src
       |)""".stripMargin

  /** Shared 64-bit SimHash signature (q42 output, q63 input).
    *
    * Per-token 64-bit hash from two md5 chunks: bits 0–55 from the
    * first 14 hex digits (`h`), bits 56–63 from the next 2 (`h2`) —
    * both chunks portable to DuckDB as `('0x'||substr(md5,..))::BIGINT`.
    * Bit 63's weight is `1L << 63` = Long.MinValue; summing it LAST
    * keeps every partial sum in signed-64 range (positives top out at
    * 2^63−1), so the construction is overflow-free in both engines
    * (verified: DuckDB sums the chain in HUGEINT and the final value
    * always fits the BIGINT cast). 64 bits matter at scale: with 4
    * bands of 16 bits (65,536 values/band) band-bucket occupancy stays
    * ~n/65536 instead of the old 32-bit 4×8-bit layout's n/256 —
    * the within-bucket candidate join stays near-linear at 100×. */
  private[ops] def simhashDF(s: SparkSession, dir: String) = {
    // md5 is evaluated ONCE per token and both chunks slice the hex —
    // md5 dominates the map stage, so folding it into each chunk
    // expression would double the hashing cost for nothing
    val tok = Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .withColumn("m", md5(col("token")))
      .withColumn("h", expr("cast(conv(substring(m, 1, 14), 16, 10) as bigint)"))
      .withColumn("h2", expr("cast(conv(substring(m, 15, 2), 16, 10) as bigint)"))
    val bits = (0 until 64).map { b =>
      val bitSet = if (b < 56) s"(h >> $b) & 1 = 1" else s"(h2 >> ${b - 56}) & 1 = 1"
      when(sum(when(expr(bitSet), 1).otherwise(-1)) > 0, lit(1L << b)).otherwise(lit(0L))
    }
    tok.groupBy("doc_id").agg(bits.reduce(_ + _).cast("long").as("simhash"))
  }

  /** DuckDB text of the same signature (CTE body). */
  private[ops] val duckSimhash: String = {
    val duckH = "('0x' || substr(md5(token),1,14))::BIGINT"
    val duckH2 = "('0x' || substr(md5(token),15,2))::BIGINT"
    val bits = (0 until 64).map { b =>
      val bitSet = if (b < 56) s"(h >> $b) & 1 = 1" else s"(h2 >> ${b - 56}) & 1 = 1"
      s"CASE WHEN sum(CASE WHEN $bitSet THEN 1 ELSE -1 END) > 0 THEN ${1L << b} ELSE 0 END"
    }.mkString(" + ")
    s"""SELECT doc_id, CAST($bits AS BIGINT) AS simhash
       |FROM (SELECT doc_id, $duckH AS h, $duckH2 AS h2
       |      FROM (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents))
       |GROUP BY doc_id""".stripMargin
  }

  /** Exact-substring SPAN REMOVAL (the Lee et al. 2022 dedup as a
    * REWRITE, not just the q257 signal): tokenize each doc, mark every
    * token position covered by a 5-gram that occurs in ≥2 DISTINCT
    * docs of `docs`, drop the marked positions, re-join the
    * survivors. Input needs (doc_id, text); returns it plus `tk`
    * (original tokens), `kept` (surviving tokens, order preserved)
    * and `new_text` (the re-joined doc — empty when boilerplate
    * covered everything). 100-TB shape: one gram-keyed distinct-doc
    * agg + one semi-join back (the q257 costs exactly — at scale the
    * gram string becomes a 64-bit hash before the shuffle), covered
    * positions collapse to ONE per-doc sorted set (row-sized, like
    * the q306 chunker's row-local arrays), and the rewrite itself is
    * a per-row index-filter HOF — zero extra shuffles. Docs under 5
    * tokens have no grams and pass through whole. */
  def spanDedupRewrite(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tt = docs.withColumn("tk", split(col("text"), " "))
    val g = tt.filter(size(col("tk")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(4, size(tk) - 1), i -> struct(i - 4 AS s, " +
          "concat_ws(' ', tk[i-4], tk[i-3], tk[i-2], tk[i-1], tk[i]) AS g))"))
        .as("sg"))
      .select(col("doc_id"), col("sg.s").as("s"), col("sg.g").as("g"))
    val dup = g.groupBy("g")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("g")
    val cov = g.join(dup, Seq("g"), "left_semi")
      .select(col("doc_id"), explode(expr("sequence(s, s + 4)")).as("p"))
      .groupBy("doc_id").agg(sort_array(collect_set(col("p"))).as("cov"))
    tt.join(cov, Seq("doc_id"), "left")
      .withColumn("kept", when(col("cov").isNull, col("tk"))
        .otherwise(expr("filter(tk, (t, i) -> NOT array_contains(cov, i))")))
      .withColumn("new_text", concat_ws(" ", col("kept")))
      .drop("cov")
  }

  val queries: Seq[Q] = Seq(

    // ----- exact dedup via content-normalization hash: key is md5 of the
    //       sorted token bag, keep the smallest doc_id per key. One
    //       hash-shuffle on a high-cardinality key — the canonical exact
    //       dedup at any scale. -----
    Q("q40_dedup_exact",
      Some("""SELECT min(doc_id) AS kept_doc_id, CAST(count(*) AS BIGINT) AS n_dupes
             |FROM (SELECT doc_id, md5(array_to_string(list_sort(string_split(text,' ')), ' ')) AS k
             |      FROM documents)
             |GROUP BY k
             |ORDER BY kept_doc_id""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .withColumn("k", expr(s"md5(concat_ws(' ', array_sort($tokens)))"))
          .groupBy(col("k"))
          .agg(min(col("doc_id")).as("kept_doc_id"), count(lit(1)).as("n_dupes"))
          .select("kept_doc_id", "n_dupes")
          .orderBy("kept_doc_id")),

    // ----- MinHash + LSH near-dup: 6 xor-minhashes over hashed 3-word
    //       shingles, 3 bands of 2 → candidate pairs share a band
    //       bucket; then the true shingle-Jaccard (intersection of hash
    //       sets) filters candidates at 0.4. Candidate generation is a
    //       band-key equi-join (no cross join); the verify join is only
    //       over candidate pairs, and every shuffled key is an int. -----
    Q("q41_minhash_lsh_pairs",
      Some(s"""WITH $duckLshCtes
              |SELECT d1, d2, round(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 4) AS jaccard
              |FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
              |WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.4
              |ORDER BY d1, d2""".stripMargin),
      (s, dir) =>
        candidateOverlap(s, dir)
          .withColumn("jac", col("i").cast("double") / (col("n1") + col("n2") - col("i")))
          .filter(col("jac") >= 0.4)
          .select(col("d1"), col("d2"), round(col("jac"), 4).as("jaccard"))
          .orderBy("d1", "d2")),

    // ----- SimHash: 64-bit signature from per-token 64-bit hashes; bit b
    //       is set iff sum over tokens of ±1 (by bit b of the token hash)
    //       is positive. Pure map + one groupBy(doc_id). -----
    Q("q42_simhash",
      Some(s"""SELECT doc_id, simhash FROM ($duckSimhash) ORDER BY doc_id""".stripMargin),
      (s, dir) => simhashDF(s, dir).orderBy("doc_id")),

    // ----- SimHash near-dup pairs: 4 16-bit bands over the 64-bit
    //       signature (pigeonhole: hamming ≤ 3 ⇒ at least one identical
    //       band), candidates = band-bucket join, verified by
    //       bit_count(xor) ≤ 3. Same blocked-pair shape as MinHash-LSH:
    //       no cross join, shuffles keyed by (band, value). 16-bit
    //       bands give 65,536 buckets per band — expected occupancy
    //       n/65536, so the within-bucket pair enumeration stays
    //       near-linear at 100× (the old 32-bit/8-bit-band layout
    //       capped at 256 buckets/band and went quadratic). Shift-then-
    //       mask band extraction is engine-portable even on negative
    //       signatures: the & 65535 mask makes arithmetic vs logical
    //       shift indistinguishable. -----
    Q("q63_simhash_pairs",
      Some(s"""WITH sig AS ($duckSimhash),
              |bands AS (
              |  SELECT doc_id, b, (simhash >> (16 * b)) & 65535 AS val
              |  FROM sig, unnest([0,1,2,3]) AS t(b)),
              |cand AS (
              |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
              |  FROM bands x JOIN bands y ON x.b = y.b AND x.val = y.val AND x.doc_id < y.doc_id)
              |SELECT d1, d2, CAST(bit_count(xor(s1.simhash, s2.simhash)) AS INT) AS hamming
              |FROM cand JOIN sig s1 ON s1.doc_id = d1 JOIN sig s2 ON s2.doc_id = d2
              |WHERE bit_count(xor(s1.simhash, s2.simhash)) <= 3
              |ORDER BY d1, d2""".stripMargin),
      (s, dir) => {
        val sig = simhashDF(s, dir).cache()
        sig.count() // eager: consumed by both sides of the band self-join
        // Bands CARRY the signature, so the hamming predicate runs inside
        // the band join itself — candidate pairs failing hamming ≤ 3 die
        // before any shuffle. The distinct then dedups only true near-dup
        // pairs (tiny) instead of every bucket collision (quadratic in
        // bucket size — at sf0.1 that ordering was 20M rows through a
        // distinct + two joins; at 100 TB it would be the bottleneck).
        val bands = sig.select(col("doc_id"),
            explode(expr("sequence(0, 3)")).as("b"), col("simhash"))
          .withColumn("val", expr("(simhash >> (16 * b)) & 65535"))
        bands.as("x").join(bands.as("y"),
            col("x.b") === col("y.b") && col("x.val") === col("y.val")
              && col("x.doc_id") < col("y.doc_id")
              && expr("bit_count(x.simhash ^ y.simhash) <= 3"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
            expr("cast(bit_count(x.simhash ^ y.simhash) as int)").as("hamming"))
          .distinct()
          .orderBy("d1", "d2")
      }),

    // ----- n-gram Jaccard near-dup, blocked by `source` (bounded
    //       all-pairs: blocking is what makes pairwise similarity viable
    //       at scale — pairs only form inside a block). -----
    Q("q43_ngram_jaccard",
      Some(s"""WITH sh AS (
              |  SELECT doc_id, source, unnest($duckShingleHashes) AS h
              |  FROM documents WHERE len($duckTokens) >= 3
              |), sizes AS (
              |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
              |), inter AS (
              |  SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS i
              |  FROM sh x JOIN sh y ON x.source = y.source AND x.h = y.h AND x.doc_id < y.doc_id
              |  GROUP BY x.doc_id, y.doc_id
              |)
              |SELECT d1, d2, round(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 4) AS jaccard
              |FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
              |WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
              |ORDER BY d1, d2""".stripMargin),
      (s, dir) => {
        // per-doc distinct shingle-hash sets (row-local, shuffle-free
        // dedup); cached + eagerly materialized so the two explode
        // branches and the broadcast size lookups don't race to
        // recompute. The self-match shuffles (source, int-hash) keys.
        val docs = shingleSets(s, dir, extra = Seq("source")).cache()
        docs.count()
        val sh = docs.select(col("doc_id"), col("source"), explode(col("hashes")).as("h"))
        val sizes = docs.select(col("doc_id"), col("n"))
        val inter = sh.as("x").join(sh.as("y"),
            col("x.source") === col("y.source") && col("x.h") === col("y.h")
              && col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .agg(count(lit(1)).as("i"))
        // NO broadcast hint on `sizes`: it is one row per DOCUMENT —
        // corpus cardinality, not a bounded dimension — so a forced
        // broadcast is an OOM at 100× corpus scale. AQE picks a
        // broadcast join on its own at fixture scale (the frame is
        // under the threshold) and degrades to shuffle join at scale;
        // same discipline as the candidate stage above.
        inter
          .join(sizes.as("s1"), col("s1.doc_id") === col("d1"))
          .join(sizes.as("s2"), col("s2.doc_id") === col("d2"))
          .withColumn("jac", col("i").cast("double") / (col("s1.n") + col("s2.n") - col("i")))
          .filter(col("jac") >= 0.2)
          .select(col("d1"), col("d2"), round(col("jac"), 4).as("jaccard"))
          .orderBy("d1", "d2")
      }),

    // ----- language ID: stopword-ratio heuristic (the fixture is
    //       English word soup; the heuristic still yields a deterministic
    //       ratio + guess per doc). Pure per-row higher-order functions,
    //       no shuffle at all. -----
    Q("q44_langid",
      Some(s"""SELECT doc_id,
              |  round(CAST(len(list_filter($duckTokens, t -> t IN ${inList(stopEn)})) AS DOUBLE)
              |        / len($duckTokens), 4) AS en_ratio,
              |  CASE WHEN len(list_filter($duckTokens, t -> t IN ${inList(stopEn)})) > 0
              |       THEN 'en' ELSE 'unknown' END AS lang_guess
              |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            round(expr(s"cast(size(filter($tokens, t -> t IN ${inList(stopEn)})) as double) / size($tokens)"), 4).as("en_ratio"),
            expr(s"CASE WHEN size(filter($tokens, t -> t IN ${inList(stopEn)})) > 0 THEN 'en' ELSE 'unknown' END").as("lang_guess"))
          .orderBy("doc_id")),

    // ----- quality scoring: token counts, uniqueness, average token
    //       length, regex token parity, composite score. Row-local. -----
    Q("q45_quality_score",
      Some(s"""SELECT doc_id,
              |  CAST(len($duckTokens) AS BIGINT) AS n_tokens,
              |  CAST(len(list_distinct($duckTokens)) AS BIGINT) AS n_uniq,
              |  round(CAST(len(list_distinct($duckTokens)) AS DOUBLE) / len($duckTokens), 4) AS uniq_ratio,
              |  round(CAST(n_chars - len($duckTokens) + 1 AS DOUBLE) / len($duckTokens), 4) AS avg_tok_len,
              |  CAST(len(regexp_extract_all(text, '\\w+')) AS BIGINT) AS n_regex_tokens,
              |  round(0.5 * (CAST(len(list_distinct($duckTokens)) AS DOUBLE) / len($duckTokens))
              |      + 0.5 * least(1.0, len($duckTokens) / 100.0), 4) AS quality
              |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            expr(s"cast(size($tokens) as bigint)").as("n_tokens"),
            expr(s"cast(size(array_distinct($tokens)) as bigint)").as("n_uniq"),
            round(expr(s"cast(size(array_distinct($tokens)) as double) / size($tokens)"), 4).as("uniq_ratio"),
            round(expr(s"cast(n_chars - size($tokens) + 1 as double) / size($tokens)"), 4).as("avg_tok_len"),
            expr("""cast(size(regexp_extract_all(text, '\\w+', 0)) as bigint)""").as("n_regex_tokens"),
            round(expr(s"0.5 * (cast(size(array_distinct($tokens)) as double) / size($tokens))" +
              s" + 0.5 * least(1.0, size($tokens) / 100.0)"), 4).as("quality"))
          .orderBy("doc_id")),

    // ----- filter-threshold sweep (q271): the calibration curve a
    //       100-TB filter run is planned from — docs and tokens
    //       retained at EVERY candidate quality threshold, from ONE
    //       corpus pass: per-doc scores quantize to integer bins
    //       (round(q*10000) — integer compare, no float-boundary
    //       hazard at the cut points), one keyed partial+final agg
    //       over ≤11 bins, then pure arithmetic (an 11-row broadcast
    //       join) answers all 10 thresholds. The naive shape — one
    //       filtered scan per threshold — is 10 corpus passes. Oracle
    //       IS that naive shape, so the histogram must agree with the
    //       direct recomputation at every cut. -----
    Q("q271_filter_sweep",
      Some(s"""WITH d AS (SELECT
              |    round(0.5 * (CAST(len(list_distinct($duckTokens)) AS DOUBLE) / len($duckTokens))
              |      + 0.5 * least(1.0, len($duckTokens) / 100.0), 4) AS q,
              |    CAST(len($duckTokens) AS BIGINT) AS nt
              |  FROM documents),
              |g AS (SELECT * FROM (VALUES (0.0),(0.1),(0.2),(0.3),(0.4),
              |  (0.5),(0.6),(0.7),(0.8),(0.9)) t(thr))
              |SELECT CAST(g.thr AS DOUBLE) AS thr,
              |  CAST(count(d.q) AS BIGINT) AS n_docs,
              |  CAST(coalesce(sum(d.nt), 0) AS BIGINT) AS n_tokens
              |FROM g LEFT JOIN d ON d.q >= g.thr
              |GROUP BY g.thr ORDER BY thr""".stripMargin),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(
            expr(s"cast(size($tokens) as bigint)").as("nt"),
            round(expr(s"0.5 * (cast(size(array_distinct($tokens)) as double) / size($tokens))" +
              s" + 0.5 * least(1.0, size($tokens) / 100.0)"), 4).as("q"))
        val binned = docs
          .withColumn("qi", round(col("q") * 10000).cast("long"))
          .withColumn("bin", expr("qi DIV 1000"))
          .groupBy("bin")
          .agg(count(lit(1)).as("nd"), sum("nt").as("ntok"))
        val grid = s.range(10)
          .select(col("id"), (col("id").cast("double") / 10.0).as("thr"))
        grid.join(broadcast(binned), col("bin") >= col("id"), "left")
          .groupBy("thr")
          .agg(coalesce(sum("nd"), lit(0L)).as("n_docs"),
            coalesce(sum("ntok"), lit(0L)).as("n_tokens"))
          .orderBy("thr")
      }),

    // ----- per-source quality-gate normalization (q275): keep the
    //       top 60% of docs WITHIN each source — an absolute quality
    //       cut lets one clean source drown the mixture; per-source
    //       percent_rank preserves the mix by construction. One
    //       sort-based window per source partition (the same shuffle
    //       class as a keyed agg), then a keyed rollup; retained
    //       quality is carried as an e4-quantized BIGINT sum, so the
    //       result is aggregation-order independent on both engines.
    //       percent_rank gives tied scores identical ranks, so the
    //       60% boundary is engine-order-proof too. -----
    Q("q275_source_quality_gate",
      Some(s"""WITH d AS (SELECT source,
              |    round(0.5 * (CAST(len(list_distinct($duckTokens)) AS DOUBLE) / len($duckTokens))
              |      + 0.5 * least(1.0, len($duckTokens) / 100.0), 4) AS q
              |  FROM documents),
              |r AS (SELECT source, q,
              |    percent_rank() OVER (PARTITION BY source ORDER BY q DESC) AS pr
              |  FROM d)
              |SELECT source, CAST(count(*) AS BIGINT) AS n_total,
              |  CAST(count(*) FILTER (WHERE pr <= 0.6) AS BIGINT) AS n_kept,
              |  CAST(coalesce(sum(CAST(round(q * 10000) AS BIGINT))
              |    FILTER (WHERE pr <= 0.6), 0) AS BIGINT) AS kept_q_sum_e4
              |FROM r GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("q").desc)
        Tables.load(s, dir, "documents")
          .select(col("source"),
            round(expr(s"0.5 * (cast(size(array_distinct($tokens)) as double) / size($tokens))" +
              s" + 0.5 * least(1.0, size($tokens) / 100.0)"), 4).as("q"))
          .withColumn("pr", percent_rank().over(w))
          .groupBy("source")
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("pr") <= 0.6, 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("pr") <= 0.6,
              round(col("q") * 10000).cast("long")).otherwise(0L))
              .as("kept_q_sum_e4"))
          .orderBy("source")
      }),

    // ----- token counting: corpus-level top-20 (explode → keyed agg →
    //       top-k; partial aggregation makes the shuffle tiny). -----
    Q("q46_token_counts",
      Some("""SELECT token, CAST(count(*) AS BIGINT) AS n
             |FROM (SELECT unnest(string_split(text,' ')) AS token FROM documents)
             |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(20)),

    // ----- dedup CLUSTERS: docs sharing the full 6-minhash signature
    //       form a cluster (cluster id = min doc_id). This is the
    //       grouping form of near-dedup — the "keep one per cluster"
    //       decision a training pipeline actually executes, vs q41's
    //       pair list. One groupBy on the signature (high-cardinality
    //       key), no pairwise join at all — the cheapest dedup shape at
    //       100 TB. Fixture has 21 multi-doc clusters at sf0.01. -----
    Q("q77_dedup_clusters",
      Some(s"""WITH sig AS (
              |  SELECT doc_id, ${duckMhExprs("hs").mkString(", ")}
              |  FROM (SELECT doc_id, $duckShingleHashes AS hs
              |        FROM documents WHERE len($duckTokens) >= 3))
              |SELECT min(doc_id) AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
              |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS members
              |FROM sig GROUP BY mh1, mh2, mh3, mh4, mh5, mh6 HAVING count(*) > 1
              |ORDER BY cluster_id""".stripMargin),
      (s, dir) =>
        shingleSets(s, dir)
          .select(col("doc_id") +: mhCols: _*)
          .groupBy((1 to 6).map(i => col(s"mh$i")): _*)
          .agg(min(col("doc_id")).as("cluster_id"), count(lit(1)).as("n_members"),
            array_join(transform(sort_array(collect_list(col("doc_id"))),
              _.cast("string")), ",").as("members"))
          .filter(col("n_members") > 1)
          .select("cluster_id", "n_members", "members")
          .orderBy("cluster_id")),

    // ----- BPE-ish regex tokenization: letter-runs / digit-runs /
    //       single non-alphanumerics (the pre-tokenizer split shape of
    //       byte-pair-encoding vocabularies), corpus-level top-20.
    //       Same explode → keyed agg → top-k pipeline as q46; the regex
    //       runs row-local in the scan stage. -----
    Q("q78_bpe_tokens",
      Some("""SELECT token, CAST(count(*) AS BIGINT) AS n
             |FROM (SELECT unnest(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS token
             |      FROM documents)
             |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(explode(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
            .as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(20)),

    // ----- FLAGSHIP composite: the full training-data cleanse pipeline
    //       as ONE declarative plan — quality score → language gate →
    //       minhash-signature dedup (keep lowest doc_id per cluster) →
    //       per-source corpus stats of the surviving docs. The shapes
    //       compose without materialization: row-local scoring, one
    //       signature groupBy (no pairwise join), one semi-join back,
    //       one final agg. At 100 TB this is the nightly corpus build. -----
    Q("q82_training_data_pipeline",
      Some(s"""WITH scored AS (
              |  SELECT doc_id, source,
              |    len($duckTokens) AS n_tokens,
              |    CAST(len(list_distinct($duckTokens)) AS DOUBLE) / len($duckTokens) AS uniq_ratio,
              |    len(list_filter($duckTokens, t -> t IN ${inList(stopEn)})) > 0 AS is_en,
              |    $duckShingleHashes AS hs
              |  FROM documents WHERE len($duckTokens) >= 3),
              |gated AS (
              |  SELECT * FROM scored WHERE uniq_ratio >= 0.5 AND is_en),
              |sig AS (
              |  SELECT doc_id, ${duckMhExprs("hs").mkString(", ")} FROM gated),
              |kept AS (
              |  SELECT min(doc_id) AS doc_id FROM sig
              |  GROUP BY mh1, mh2, mh3, mh4, mh5, mh6)
              |SELECT g.source, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(g.n_tokens) AS BIGINT) AS total_tokens,
              |  round(avg(g.uniq_ratio), 4) AS avg_uniq
              |FROM gated g JOIN kept k ON g.doc_id = k.doc_id
              |GROUP BY g.source ORDER BY g.source""".stripMargin),
      (s, dir) => {
        val scored = shingleHashSets(
            Tables.load(s, dir, "documents"), "text", Seq("doc_id", "source", "toks"))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("uniq_ratio",
            expr("cast(size(array_distinct(toks)) as double) / size(toks)"))
          .withColumn("is_en", expr(s"size(filter(toks, t -> t IN ${inList(stopEn)})) > 0"))
        val gated = scored.filter(col("uniq_ratio") >= 0.5 && col("is_en")).cache()
        gated.count() // eager: signature groupBy + semi-join both consume it
        val kept = gated.select(col("doc_id") +: mhCols: _*)
          .groupBy((1 to 6).map(i => col(s"mh$i")): _*)
          .agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id")
        gated.join(kept, Seq("doc_id"), "left_semi")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            round(avg(col("uniq_ratio")), 4).as("avg_uniq"))
          .orderBy("source")
      }),

    // ----- TF-IDF: term frequency × inverse document frequency, the
    //       classic relevance weight — top-3 terms per doc. tf and df are
    //       exact integer aggregates; the only float op is tf*ln(N/df),
    //       computed from identical ints in both engines and rounded to
    //       4 before ranking (ranking on the ROUNDED score + token
    //       tiebreak keeps the order engine-independent). Shapes:
    //       explode → two keyed aggs (partial+final) → join on token →
    //       per-doc top-k window. The df relation is vocabulary-sized;
    //       at 100 TB it stays a regular shuffle join (vocab can exceed
    //       broadcast limits), while the doc-count scalar is a 1-row
    //       broadcast. -----
    Q("q88_tfidf",
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
             |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
             |df AS (SELECT token, count(*) AS df
             |       FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token),
             |nd AS (SELECT count(*) AS n FROM documents),
             |scored AS (
             |  SELECT tf.doc_id, tf.token,
             |    round(tf.tf * ln(CAST(nd.n AS DOUBLE) / df.df), 4) AS tfidf
             |  FROM tf JOIN df ON tf.token = df.token CROSS JOIN nd)
             |SELECT doc_id, token, tfidf, CAST(rn AS INT) AS rn FROM (
             |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
             |  FROM scored WHERE doc_id <= 20)
             |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val dfr = tok.distinct().groupBy("token").agg(count(lit(1)).as("df"))
        val nd = docs.agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("token"))
        tf.join(dfr, "token")
          .crossJoin(broadcast(nd))
          .withColumn("tfidf", round(col("tf") * log(col("n").cast("double") / col("df")), 4))
          .filter(col("doc_id") <= 20)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("doc_id", "token", "tfidf", "rn")
          .orderBy("doc_id", "rn")
      }),

    // ----- near-dup CONNECTED COMPONENTS: MinHash-LSH band candidates
    //       (q41's generation stage) closed transitively via iterative
    //       min-label propagation (ops.Graph) — A~B, B~C ⇒ one cluster
    //       {A,B,C} even when A,C never share a bucket. This is the
    //       cluster view q77 (exact-signature grouping) can't produce.
    //       Oracle: recursive-CTE reachability in DuckDB. Rounds =
    //       cluster diameter (2-4 for near-dup graphs); each round one
    //       id-keyed shuffle — no driver-side graph state. -----
    Q("q104_neardup_components",
      Some(s"""WITH RECURSIVE $duckComponentsCtes
              |SELECT component AS component_id, CAST(count(*) AS BIGINT) AS n_members,
              |  string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
              |FROM comp
              |GROUP BY component ORDER BY component""".stripMargin),
      (s, dir) =>
        Graph.connectedComponents(lshBandEdges(s, dir))
          .groupBy("component")
          .agg(count(lit(1)).as("n_members"),
            array_join(transform(sort_array(collect_list(col("id"))),
              _.cast("string")), ",").as("members"))
          .select(col("component").as("component_id"), col("n_members"), col("members"))
          .orderBy("component_id")),

    // ----- document fingerprint: polynomial rolling hash over the token
    //       stream (mod 1e9+7), tokens hashed to 56 bits then reduced
    //       mod 1000003. Left fold in both engines → identical values. -----
    Q("q47_fingerprint",
      Some(s"""SELECT doc_id,
              |  list_reduce(list_prepend(CAST(0 AS BIGINT),
              |    list_transform($duckTokens, t -> ('0x' || substr(md5(t),1,14))::BIGINT % 1000003)),
              |    (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
              |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            expr(s"aggregate(transform($tokens, t -> ${hash56("t")} % 1000003), " +
              "cast(0 as bigint), (a, b) -> (a * 31 + b) % 1000000007)").as("fingerprint"))
          .orderBy("doc_id")),

    // ----- BPE pair counting: adjacent character-pair frequencies
    //       within tokens — the statistic a BPE tokenizer trainer
    //       recomputes every merge round. explode → explode → ONE
    //       high-cardinality keyed agg; map-side partials absorb the
    //       quadratic-looking blowup (pairs per token ≈ token length).
    //       Top-30 by count with a pair tiebreak. -----
    Q("q133_bpe_pair_counts",
      Some(s"""WITH tok AS (SELECT unnest($duckTokens) AS t FROM documents),
              |pairs AS (
              |  SELECT unnest(list_transform(range(1, len(t)), i -> substr(t, i, 2))) AS pair
              |  FROM tok WHERE len(t) >= 2)
              |SELECT pair, CAST(count(*) AS BIGINT) AS n
              |FROM pairs GROUP BY pair
              |ORDER BY n DESC, pair LIMIT 30""".stripMargin),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("t"))
          .filter(length(col("t")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, length(t) - 1), i -> substr(t, i, 2))")).as("pair"))
          .groupBy("pair").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pair"))
          .limit(30)),

    // ----- quality-aware canonical selection: the near-dup pipeline's
    //       LAST stage. q104's clusters + a per-doc quality score →
    //       keep the highest-quality member of each cluster (score
    //       DESC, doc_id tiebreak). The cluster frame (clustered docs
    //       only — tiny vs the corpus) BROADCASTS against the scored
    //       corpus scan, the keep decision is one per-cluster window.
    //       This is what "dedup" actually ships at 100 TB: not the pair
    //       list, the per-cluster survivor. -----
    Q("q134_dedup_keep_best",
      Some(s"""WITH RECURSIVE $duckComponentsCtes,
              |sc AS (
              |  SELECT doc_id,
              |    round(len(list_distinct($duckTokens))
              |      / CAST(len($duckTokens) AS DOUBLE), 4) AS score
              |  FROM documents),
              |ranked AS (
              |  SELECT c.component, c.id, s.score,
              |    row_number() OVER (PARTITION BY c.component
              |      ORDER BY s.score DESC, c.id) AS rn
              |  FROM comp c JOIN sc s ON s.doc_id = c.id)
              |SELECT component AS component_id, CAST(count(*) AS BIGINT) AS n_members,
              |  min(CASE WHEN rn = 1 THEN id END) AS kept_doc,
              |  min(CASE WHEN rn = 1 THEN score END) AS kept_score
              |FROM ranked GROUP BY component
              |ORDER BY component_id""".stripMargin),
      (s, dir) => {
        val comp = Graph.connectedComponents(lshBandEdges(s, dir))
        val sc = Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"),
            round(size(array_distinct(col("toks")))
              / size(col("toks")).cast("double"), 4).as("score"))
        keepBestPerCluster(comp, sc)
          .select(col("component").as("component_id"), col("n_members"),
            col("kept_doc"), col("kept_score"))
          .orderBy("component_id")
      }),

    // ----- shingle CONTAINMENT over LSH candidates: |A∩B|/|A| and
    //       |A∩B|/|B| instead of Jaccard — the asymmetric metric that
    //       catches near-SUPERSET duplication (doc B embeds doc A:
    //       quotes, boilerplate wrappers, concatenated articles),
    //       which symmetric Jaccard under-scores when sizes differ.
    //       Same bounded candidate generation as q41 (band equi-join,
    //       int shuffles); only the verify metric changes. -----
    Q("q143_shingle_containment",
      Some(s"""WITH $duckLshCtes
              |SELECT d1, d2,
              |  round(CAST(i AS DOUBLE) / s1.n, 4) AS cont_in_d1,
              |  round(CAST(i AS DOUBLE) / s2.n, 4) AS cont_in_d2
              |FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
              |WHERE greatest(CAST(i AS DOUBLE) / s1.n, CAST(i AS DOUBLE) / s2.n) >= 0.5
              |ORDER BY d1, d2""".stripMargin),
      (s, dir) =>
        candidateOverlap(s, dir)
          .withColumn("c1", col("i").cast("double") / col("n1"))
          .withColumn("c2", col("i").cast("double") / col("n2"))
          .filter(greatest(col("c1"), col("c2")) >= 0.5)
          .select(col("d1"), col("d2"),
            round(col("c1"), 4).as("cont_in_d1"), round(col("c2"), 4).as("cont_in_d2"))
          .orderBy("d1", "d2")),

    // ----- per-doc character entropy (gibberish / compression-artifact
    //       gate): Shannon entropy in bits over the doc's character
    //       distribution. Natural text sits ~4–4.5 bits; base64 blobs
    //       and repeated-char junk land far outside — a standard
    //       pre-training quality signal. Shuffle is keyed by
    //       (doc_id, char) with map-side partials absorbing the
    //       explode; the per-doc distribution is ≤ alphabet-size rows. -----
    Q("q144_char_entropy",
      Some("""WITH ch AS (
             |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
             |c AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch),
             |n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY doc_id)
             |SELECT c.doc_id, CAST(max(n.n) AS BIGINT) AS n_chars_total,
             |  round(-sum((CAST(c AS DOUBLE) / n.n) * ln(CAST(c AS DOUBLE) / n.n))
             |        / ln(2), 4) AS entropy_bits
             |FROM c JOIN n ON c.doc_id = n.doc_id
             |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin),
      (s, dir) => {
        val chars = Tables.load(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
          .filter(length(col("ch")) === 1) // Spark's regex split keeps a trailing ""
          .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
        val n = chars.groupBy("doc_id").agg(sum(col("c")).as("n"))
        chars.join(n, "doc_id")
          .withColumn("p", col("c").cast("double") / col("n"))
          .groupBy("doc_id")
          .agg(max(col("n")).as("n_chars_total"),
            round(-sum(col("p") * log(col("p"))) / log(lit(2.0)), 4).as("entropy_bits"))
          .orderBy("doc_id")
      }),

    // ----- LSH bucket-cap audit (the no-silent-caps companion to
    //       q41/q143/q104/q134's shared candidate stage): per band, the
    //       bucket count, the LARGEST bucket, and exactly how many
    //       buckets/pairs the lshBucketCap guard dropped — differential
    //       against DuckDB computing the same histogram, so a corpus
    //       dense enough to trip the guard surfaces as nonzero skip
    //       counts on the board rather than as silently-missing
    //       near-dup pairs. At fixture scale max_bucket ≈ 4 and both
    //       skip columns are verified ZERO (i.e. the guard provably
    //       does not perturb the green near-dup oracles). -----
    Q("q204_lsh_bucket_audit",
      Some(s"""WITH sig AS (
              |  SELECT doc_id, ${duckMhExprs("hs").mkString(", ")}
              |  FROM (SELECT doc_id, $duckShingleHashes AS hs
              |        FROM documents WHERE len($duckTokens) >= 3)
              |), bands AS (
              |  SELECT doc_id, band, v1, v2 FROM (
              |    SELECT doc_id, 1 AS band, mh1 AS v1, mh2 AS v2 FROM sig
              |    UNION ALL SELECT doc_id, 2, mh3, mh4 FROM sig
              |    UNION ALL SELECT doc_id, 3, mh5, mh6 FROM sig)
              |), bsz AS (
              |  SELECT band, v1, v2, count(*) AS c FROM bands GROUP BY band, v1, v2)
              |SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
              |  CAST(max(c) AS BIGINT) AS max_bucket,
              |  CAST(sum(CASE WHEN c > $lshBucketCap THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_skipped_buckets,
              |  CAST(sum(CASE WHEN c > $lshBucketCap THEN (c * (c - 1)) // 2 ELSE 0 END)
              |    AS BIGINT) AS n_skipped_pairs
              |FROM bsz GROUP BY band ORDER BY band""".stripMargin),
      (s, dir) =>
        lshBucketAudit(shingleSets(s, dir).select(col("doc_id") +: mhCols: _*))),

    // ----- repetition signals (q255): the Gopher-rule quality
    //       filters n-gram DOMINANCE measures — the fraction of a
    //       document's bigrams/trigrams accounted for by its single
    //       most common one. Complements q45 (distinct-token ratio —
    //       global diversity) and q139 (cross-corpus LM score): a doc
    //       that loops one phrase scores fine on both but spikes
    //       here, which is exactly what the filter exists to catch.
    //       Shape: two keyed two-stage aggregations (count per
    //       (doc, gram) → max/sum per doc) — map-side combinable, no
    //       window, no shuffle beyond the doc_id keys. -----
    Q("q255_repetition_signals",
      Some(s"""WITH tt AS (
              |  SELECT doc_id, $duckTokens AS l FROM documents
              |  WHERE len($duckTokens) >= 3),
              |bg AS (
              |  SELECT doc_id, unnest(list_transform(range(1, len(l)),
              |    i -> array_to_string(l[i:i+1], ' '))) AS g FROM tt),
              |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
              |bgs AS (
              |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
              |    round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_bigram_frac
              |  FROM bgc GROUP BY 1),
              |tg AS (
              |  SELECT doc_id, unnest(list_transform(range(1, len(l) - 1),
              |    i -> array_to_string(l[i:i+2], ' '))) AS g FROM tt),
              |tgc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2),
              |tgs AS (
              |  SELECT doc_id,
              |    round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_trigram_frac
              |  FROM tgc GROUP BY 1)
              |SELECT doc_id, n_bigrams, top_bigram_frac, top_trigram_frac
              |FROM bgs JOIN tgs USING (doc_id) ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val tt = graft.Tables.load(s, dir, "documents")
          .withColumn("tk", split(col("text"), " "))
          .filter(size(col("tk")) >= 3)
        val bg = tt.select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(tk) - 1), " +
            "i -> concat(tk[i-1], ' ', tk[i]))")).as("g"))
        val tg = tt.select(col("doc_id"), explode(expr(
          "transform(sequence(2, size(tk) - 1), " +
            "i -> concat(tk[i-2], ' ', tk[i-1], ' ', tk[i]))")).as("g"))
        val b = bg.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum("c").as("n_bigrams"),
            round(max("c").cast("double") / sum("c"), 4).as("top_bigram_frac"))
        val t3 = tg.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(round(max("c").cast("double") / sum("c"), 4)
            .as("top_trigram_frac"))
        b.join(t3, "doc_id")
          .select(col("doc_id"), col("n_bigrams"),
            col("top_bigram_frac"), col("top_trigram_frac"))
          .orderBy("doc_id")
      }),

    // ----- cross-document duplicated-span fraction (q257): the
    //       exact-substring dedup SIGNAL (Lee et al. 2022,
    //       suffix-array span dedup) approximated by 5-gram
    //       membership — a gram position is "duplicated" when its
    //       5-gram occurs in ≥2 DISTINCT documents, and each doc
    //       reports the fraction of its positions that are. This is
    //       what separates boilerplate-heavy docs (high fraction —
    //       candidates for span REMOVAL, not whole-doc dedup) from
    //       merely similar ones; complements q41 (whole-doc Jaccard)
    //       and q143 (containment). Shape: one (gram)-keyed distinct-
    //       doc agg, one semi-join back on the gram key, two doc-
    //       keyed counts — all map-side combinable; at 100 TB the
    //       gram STRING becomes a 64-bit hash before the shuffle
    //       (same cost class, collision-negligible), and the gram
    //       frame never collects. -----
    Q("q257_dup_span_fraction",
      Some(s"""WITH tt AS (
              |  SELECT doc_id, $duckTokens AS l FROM documents
              |  WHERE len($duckTokens) >= 5),
              |g AS (
              |  SELECT doc_id, unnest(list_transform(range(1, len(l) - 3),
              |    i -> array_to_string(l[i:i+4], ' '))) AS g FROM tt),
              |dup AS (
              |  SELECT g FROM (
              |    SELECT g, count(DISTINCT doc_id) AS nd FROM g GROUP BY g)
              |  WHERE nd >= 2),
              |tot AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
              |dupc AS (
              |  SELECT doc_id, count(*) AS n_dup FROM g
              |  WHERE g IN (SELECT g FROM dup) GROUP BY doc_id)
              |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
              |  round(CAST(coalesce(n_dup, 0) AS DOUBLE) / n_grams, 4) AS dup_frac
              |FROM tot LEFT JOIN dupc USING (doc_id)
              |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val tt = graft.Tables.load(s, dir, "documents")
          .withColumn("tk", split(col("text"), " "))
          .filter(size(col("tk")) >= 5)
        val g = tt.select(col("doc_id"), explode(expr(
          "transform(sequence(4, size(tk) - 1), i -> concat_ws(' ', " +
            "tk[i-4], tk[i-3], tk[i-2], tk[i-1], tk[i]))")).as("g"))
        val dup = g.groupBy("g")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2).select("g")
        val tot = g.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
        val dupc = g.join(dup, Seq("g"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
        tot.join(dupc, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams"),
            round(coalesce(col("n_dup"), lit(0L)).cast("double")
              / col("n_grams"), 4).as("dup_frac"))
          .orderBy("doc_id")
      }),

    // ----- Zipf rank-frequency audit (q292): fit ln(freq) ~ ln(rank)
    //       over each source's top-100 tokens — the classic corpus
    //       sanity check (natural text slopes near -1; template/spam
    //       sources bend the curve). 100-TB shape: one (source, token)
    //       keyed agg (map-side combinable), one per-source top-100
    //       window (the q275 shuffle class), then 100 rows per source
    //       of INTEGER least-squares — logs quantize to e4 BIGINTs so
    //       every sum is exact and order-independent; the slope is one
    //       double division of two exact integers at the end. -----
    Q("q292_zipf_audit",
      Some("""WITH tok AS (
             |  SELECT source, t FROM (
             |    SELECT source, unnest(string_split(text, ' ')) AS t
             |    FROM documents)
             |  WHERE regexp_matches(t, '^[a-z]{2,}$')),
             |cnts AS (SELECT source, t, count(*) AS cnt
             |         FROM tok GROUP BY 1, 2),
             |top AS (SELECT * FROM (
             |  SELECT source, t, cnt, row_number() OVER (
             |    PARTITION BY source ORDER BY cnt DESC, t) AS rk
             |  FROM cnts) WHERE rk <= 100),
             |xy AS (SELECT source,
             |  CAST(round(ln(rk) * 10000) AS BIGINT) AS x,
             |  CAST(round(ln(cnt) * 10000) AS BIGINT) AS y FROM top)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_top,
             |  round(CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
             |    * 10000.0
             |    / CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE))
             |    / 10000.0 AS zipf_slope
             |FROM xy GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) => {
        val cnts = Tables.load(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .filter(col("t").rlike("^[a-z]{2,}$"))
          .groupBy("source", "t").agg(count(lit(1)).as("cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("cnt").desc, col("t"))
        val xy = cnts.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 100)
          .select(col("source"),
            round(log(col("rk").cast("double")) * 10000).cast("long").as("x"),
            round(log(col("cnt").cast("double")) * 10000).cast("long").as("y"))
        xy.groupBy("source")
          .agg(count(lit(1)).as("n_top"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("zipf_slope",
            round((col("n_top") * col("sxy") - col("sx") * col("sy"))
              .cast("double") * 10000.0
              / (col("n_top") * col("sxx") - col("sx") * col("sx"))
              .cast("double")) / 10000.0)
          .select("source", "n_top", "zipf_slope")
          .orderBy("source")
      }),

    // ----- BM25 top-k retrieval (q293): keyword search over the
    //       corpus with the Lucene BM25 variant (idf = ln(1 + (N-df+.5)
    //       /(df+.5)) — always positive, so tiny-vocab corpora where
    //       every doc contains a common term still rank sanely).
    //       k1 = 1.2, b = 0.75. 100-TB shape: the posting list
    //       (doc, term, tf) is ONE corpus pass (keyed agg, map-side
    //       combinable); the tiny fixed query-term set broadcasts, so
    //       only query-term postings survive the join — everything
    //       downstream is O(df of the query terms), and top-k is a
    //       per-query window over that bounded set (never the corpus).
    //       Cross-engine determinism: per-(doc, term) contributions
    //       compute the SAME double expression from exact integer
    //       inputs in both engines, quantize to e4 BIGINTs, and the
    //       per-doc score is an exact integer sum (order-independent);
    //       ties break on doc_id. -----
    Q("q293_bm25_topk",
      Some("""WITH tok AS (
             |  SELECT doc_id, t FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
             |    FROM documents)
             |  WHERE regexp_matches(t, '^[a-z]{2,}$')),
             |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
             |       FROM tok GROUP BY 1, 2),
             |dln AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
             |        FROM tf GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd,
             |               CAST(sum(dl) AS BIGINT) AS tt FROM dln),
             |qs(q_id, qtext) AS (VALUES
             |  (CAST(1 AS BIGINT), 'vector scan join'),
             |  (CAST(2 AS BIGINT), 'window merge'),
             |  (CAST(3 AS BIGINT), 'customer stream filter')),
             |qt AS (SELECT DISTINCT q_id,
             |         unnest(string_split(qtext, ' ')) AS t FROM qs),
             |dfr AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf
             |        WHERE t IN (SELECT DISTINCT t FROM qt) GROUP BY t),
             |c AS (SELECT qt.q_id, tf.doc_id,
             |    CAST(round(
             |      ln(1.0 + (tot.nd - dfr.df + 0.5) / (dfr.df + 0.5))
             |      * ((tf.tf * 2.2)
             |         / (tf.tf + 0.3 + 0.9 * dln.dl * tot.nd / tot.tt))
             |      * 10000) AS BIGINT) AS c_e4
             |  FROM qt JOIN dfr USING (t) JOIN tf USING (t)
             |  JOIN dln ON dln.doc_id = tf.doc_id CROSS JOIN tot),
             |sc AS (SELECT q_id, doc_id, sum(c_e4) AS s_e4
             |       FROM c GROUP BY 1, 2)
             |SELECT q_id, rank, doc_id, s_e4 / 10000.0 AS score
             |FROM (SELECT q_id, doc_id, s_e4, row_number() OVER (
             |        PARTITION BY q_id ORDER BY s_e4 DESC, doc_id)
             |        AS rank FROM sc)
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val tok = Tables.load(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
          .filter(col("t").rlike("^[a-z]{2,}$"))
        val tf = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
        val dln = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
        val tot = dln.agg(count(lit(1)).as("nd"), sum("dl").as("tt"))
        val qs = Seq((1L, "vector scan join"), (2L, "window merge"),
          (3L, "customer stream filter")).toDF("q_id", "qtext")
        val qt = qs.select(col("q_id"),
          explode(split(col("qtext"), " ")).as("t")).distinct()
        val dfr = tf.join(broadcast(qt.select("t").distinct()), "t")
          .groupBy("t").agg(count(lit(1)).as("df"))
        // the query-term set and its df frame are query-sized
        // (broadcast by construction); the posting list never self-joins
        val c = broadcast(qt).join(broadcast(dfr), "t").join(tf, "t")
          .join(dln, "doc_id").crossJoin(broadcast(tot))
          .withColumn("c_e4", round(
            log(lit(1.0) + (col("nd") - col("df") + lit(0.5))
              / (col("df") + lit(0.5)))
            * ((col("tf") * lit(2.2))
               / (col("tf") + lit(0.3)
                  + lit(0.9) * col("dl") * col("nd") / col("tt")))
            * 10000).cast("long"))
        val sc = c.groupBy("q_id", "doc_id").agg(sum("c_e4").as("s_e4"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("s_e4").desc, col("doc_id"))
        sc.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("doc_id"),
            (col("s_e4") / 10000.0).as("score"))
          .orderBy("q_id", "rank")
      }),

    // ----- LSH dedup recall audit (q296): the q286 no-silent-caps
    //       discipline applied to the DEDUP family — how many true
    //       near-dup pairs does the production MinHash-LSH pipeline
    //       (q41's bands + bucket cap + exact-Jaccard verify) actually
    //       surface? Ground truth is the COMPLETE within-source pair
    //       set at J ≥ 0.4 via the shingle inverted index (blocking by
    //       source is what bounds completeness at 100 TB — the audit
    //       states its reference scope instead of pretending global
    //       ground truth is tractable). Both the 3-band×2-row signature
    //       (theoretical pair-hit rate 1-(1-J²)³ ≈ 0.41 at J = 0.4) and
    //       the bucket cap are sources of misses, and both are PRICED
    //       here per source. At fixture scale every true pair is a
    //       near-exact dup (J ≈ 0.97 — identical band rows), so the
    //       audit verifies recall 1.0, proving the pipeline loses
    //       nothing on the pairs the fixture actually has (the q204
    //       zero-skip discipline); a mid-J corpus surfaces the band
    //       misses as sub-1.0 rows. One shared shingle-set pass feeds both
    //       sides; shuffles stay keyed (band bucket / (source, hash));
    //       nothing all-pairs. Oracle recomputes truth AND the LSH
    //       pipeline, so an accidentally-exact LSH path (recall 1.0
    //       everywhere) or a cap regression breaks the hash. -----
    Q("q296_lsh_recall_audit",
      Some(s"""WITH $duckLshCtes,
              |lshp AS (
              |  SELECT d1, d2 FROM inter
              |  JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
              |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.4),
              |shs AS (
              |  SELECT doc_id, source, unnest($duckShingleHashes) AS h
              |  FROM documents WHERE len($duckTokens) >= 3),
              |tint AS (
              |  SELECT x.source AS source, x.doc_id AS d1, y.doc_id AS d2,
              |    count(*) AS i
              |  FROM shs x JOIN shs y ON x.source = y.source AND x.h = y.h
              |    AND x.doc_id < y.doc_id
              |  GROUP BY 1, 2, 3),
              |truth AS (
              |  SELECT source, d1, d2 FROM tint
              |  JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
              |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.4)
              |SELECT t.source, CAST(count(*) AS BIGINT) AS n_true,
              |  CAST(coalesce(sum(CASE WHEN l.d1 IS NOT NULL THEN 1 END), 0)
              |    AS BIGINT) AS n_found,
              |  round(CAST(coalesce(sum(CASE WHEN l.d1 IS NOT NULL THEN 1 END), 0)
              |    AS DOUBLE) / count(*), 4) AS recall
              |FROM truth t LEFT JOIN lshp l ON l.d1 = t.d1 AND l.d2 = t.d2
              |GROUP BY t.source ORDER BY t.source""".stripMargin),
      (s, dir) => {
        val docs = shingleSets(s, dir, extra = Seq("source")).cache()
        docs.count() // eager: both audit sides consume the same sets
        val sh = docs.select(col("doc_id"), col("source"),
          explode(col("hashes")).as("h"))
        val sizes = docs.select(col("doc_id"), col("n"))
        // exact-Jaccard verification shared by both sides (the q41
        // shape: intersect via the doc-keyed hash join, never re-shingle)
        def verified(pairs: org.apache.spark.sql.DataFrame) = pairs
          .join(sh.as("x"), col("x.doc_id") === col("d1"))
          .join(sh.as("y"),
            col("y.doc_id") === col("d2") && col("x.h") === col("y.h"))
          .groupBy("d1", "d2").agg(count(lit(1)).as("i"))
          .join(sizes.as("s1"), col("s1.doc_id") === col("d1"))
          .join(sizes.as("s2"), col("s2.doc_id") === col("d2"))
          .filter(col("i").cast("double")
            / (col("s1.n") + col("s2.n") - col("i")) >= 0.4)
          .select("d1", "d2")
        val lshp =
          verified(bandPairs(docs.select(col("doc_id") +: mhCols: _*)))
        // ground truth: the complete within-source inverted-index pair
        // set — (source, hash)-keyed shuffle, blocked, never all-pairs
        val tint = sh.as("x").join(sh.as("y"),
            col("x.source") === col("y.source") && col("x.h") === col("y.h")
              && col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.source").as("source"), col("x.doc_id").as("d1"),
            col("y.doc_id").as("d2"))
          .agg(count(lit(1)).as("i"))
        val truth = tint
          .join(sizes.as("s1"), col("s1.doc_id") === col("d1"))
          .join(sizes.as("s2"), col("s2.doc_id") === col("d2"))
          .filter(col("i").cast("double")
            / (col("s1.n") + col("s2.n") - col("i")) >= 0.4)
          .select("source", "d1", "d2")
        val out = truth
          .join(lshp.withColumn("hit", lit(1L)), Seq("d1", "d2"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_true"),
            coalesce(sum("hit"), lit(0L)).as("n_found"))
          .withColumn("recall",
            round(col("n_found").cast("double") / col("n_true"), 4))
          .select("source", "n_true", "n_found", "recall")
          .orderBy("source")
          .localCheckpoint(true)
        docs.unpersist() // result is pinned; don't let the corpus cache linger
        out
      }),

    // ----- overlapping-window chunker (q306): the RAG/pretraining
    //       chunk op — 32-token windows at stride 24 (8-token overlap
    //       so no boundary context is lost), a trailing window kept
    //       only when it contributes NEW tokens beyond the overlap
    //       (start + 8 < n), never a fully-redundant tail. Everything
    //       is row-local higher-order functions over the split-token
    //       array (sequence → slice → concat) — whole-stage codegen,
    //       zero shuffles before the final sort, so the op scans at
    //       I/O speed at any corpus size. The board checks the chunk
    //       GEOMETRY (counts, token totals, last-chunk length) and a
    //       first-chunk md5 per doc, so an off-by-one in stride,
    //       overlap, or the tail rule breaks the hash. -----
    Q("q306_chunk_overlap",
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |nn AS (SELECT doc_id, tk, len(tk) AS n FROM d),
             |ch AS (
             |  SELECT doc_id, n, s,
             |    len(tk[s + 1 : s + 32]) AS clen,
             |    md5(array_to_string(tk[s + 1 : s + 32], ' ')) AS cfp
             |  FROM nn, unnest(range(0, n, 24)) AS t(s)
             |  WHERE s = 0 OR s + 8 < n)
             |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
             |  CAST(count(*) AS BIGINT) AS n_chunks,
             |  CAST(sum(clen) AS BIGINT) AS chunk_tokens,
             |  CAST(max(CASE WHEN s = 0 THEN clen END) AS BIGINT)
             |    AS first_chunk_len,
             |  max(CASE WHEN s = 0 THEN cfp END) AS first_chunk_fp
             |FROM ch GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("tk"))
          .withColumn("n", size(col("tk")))
        val ch = d
          .select(col("doc_id"), col("n"), col("tk"),
            explode(expr("sequence(0, greatest(n - 1, 0), 24)")).as("s"))
          .filter(col("s") === 0 || col("s") + 8 < col("n"))
          .select(col("doc_id"), col("n"), col("s"),
            size(expr("slice(tk, s + 1, 32)")).as("clen"),
            md5(concat_ws(" ", expr("slice(tk, s + 1, 32)"))).as("cfp"))
        ch.groupBy("doc_id")
          .agg(max(col("n")).cast("long").as("n_tokens"),
            count(lit(1)).as("n_chunks"),
            sum(col("clen")).cast("long").as("chunk_tokens"),
            max(when(col("s") === 0, col("clen"))).cast("long")
              .as("first_chunk_len"),
            max(when(col("s") === 0, col("cfp"))).as("first_chunk_fp"))
          .orderBy("doc_id")
      }),

    // ----- dedup funnel datasheet (q307): the attrition table every
    //       pipeline publishes — docs and tokens surviving each dedup
    //       tier: raw → exact (one kept per identical text) → near-dup
    //       (one kept per LSH connected component OVER THE EXACT
    //       SURVIVORS) → span dedup (duplicated 5-gram spans REMOVED
    //       from the near-dup survivors, the q318 rewrite — the tier
    //       that shrinks TOKENS, not docs). Stage ORDER is semantic,
    //       not cosmetic: exact
    //       dups share every band, so a >cap group of identical docs
    //       would be SKIPPED by the LSH bucket guard — running exact
    //       first is what keeps the near-dup tier complete. 100-TB
    //       shape: exact = one hash-keyed agg; the band graph is built
    //       on survivors only (strictly fewer nodes), components via
    //       the bounded q104 propagation; every stage count is a keyed
    //       agg. Oracle recomputes the SAME survivor-restricted graph
    //       with a recursive CTE, so a funnel stage that double-counts
    //       (or a near-dup pass that silently re-admits an exact dup)
    //       breaks the hash. -----
    Q("q307_dedup_funnel",
      Some(s"""WITH RECURSIVE
              |ex AS (SELECT min(doc_id) AS doc_id FROM documents
              |       GROUP BY md5(text)),
              |toks AS (SELECT doc_id,
              |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
              |  FROM documents),
              |sig AS (
              |  SELECT doc_id, ${duckMhExprs("hs").mkString(", ")}
              |  FROM (SELECT doc_id, $duckShingleHashes AS hs
              |        FROM documents WHERE len($duckTokens) >= 3
              |          AND doc_id IN (SELECT doc_id FROM ex))
              |), bands AS (
              |  SELECT doc_id, band, v1, v2 FROM (
              |    SELECT doc_id, 1 AS band, mh1 AS v1, mh2 AS v2 FROM sig
              |    UNION ALL SELECT doc_id, 2, mh3, mh4 FROM sig
              |    UNION ALL SELECT doc_id, 3, mh5, mh6 FROM sig)
              |), bsz AS (
              |  SELECT band, v1, v2, count(*) AS c FROM bands
              |  GROUP BY band, v1, v2
              |), edges AS (
              |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
              |  FROM bands a JOIN bands b ON a.band = b.band
              |    AND a.v1 = b.v1 AND a.v2 = b.v2 AND a.doc_id <> b.doc_id
              |  JOIN bsz s ON s.band = a.band AND s.v1 = a.v1
              |    AND s.v2 = a.v2 AND s.c <= $lshBucketCap
              |), reach(src, dst) AS (
              |  SELECT src, dst FROM edges
              |  UNION
              |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
              |), comp AS (
              |  SELECT src AS id, least(src, min(dst)) AS component
              |  FROM reach GROUP BY src
              |), kept2 AS (
              |  SELECT DISTINCT component AS doc_id FROM comp
              |  UNION ALL
              |  SELECT doc_id FROM ex
              |  WHERE doc_id NOT IN (SELECT id FROM comp)
              |), l3 AS (
              |  SELECT d.doc_id, string_split(d.text, ' ') AS l
              |  FROM documents d
              |  WHERE d.doc_id IN (SELECT doc_id FROM kept2)
              |), g3 AS (
              |  SELECT doc_id, unnest(range(1, len(l) - 3)) AS i, l FROM l3
              |), g3g AS (
              |  SELECT doc_id, i, array_to_string(l[i:i+4], ' ') AS g FROM g3
              |), dup3 AS (
              |  SELECT g FROM (
              |    SELECT g, count(DISTINCT doc_id) AS nd FROM g3g GROUP BY g)
              |  WHERE nd >= 2
              |), cov3 AS (
              |  SELECT DISTINCT doc_id, unnest([i, i+1, i+2, i+3, i+4]) AS p
              |  FROM g3g WHERE g IN (SELECT g FROM dup3)
              |), pos3 AS (
              |  SELECT doc_id, unnest(range(1, len(l) + 1)) AS p FROM l3
              |), pd3 AS (
              |  SELECT pos3.doc_id, count(*) AS nk FROM pos3
              |  WHERE NOT EXISTS (SELECT 1 FROM cov3 c
              |    WHERE c.doc_id = pos3.doc_id AND c.p = pos3.p)
              |  GROUP BY pos3.doc_id)
              |SELECT * FROM (
              |  SELECT CAST(0 AS BIGINT) AS stage,
              |    CAST(count(*) AS BIGINT) AS n_docs,
              |    CAST(sum(n_toks) AS BIGINT) AS n_tokens FROM toks
              |  UNION ALL SELECT CAST(1 AS BIGINT),
              |    CAST(count(*) AS BIGINT), CAST(sum(n_toks) AS BIGINT)
              |    FROM toks WHERE doc_id IN (SELECT doc_id FROM ex)
              |  UNION ALL SELECT CAST(2 AS BIGINT),
              |    CAST(count(*) AS BIGINT), CAST(sum(n_toks) AS BIGINT)
              |    FROM toks WHERE doc_id IN (SELECT doc_id FROM kept2)
              |  UNION ALL SELECT CAST(3 AS BIGINT),
              |    CAST(count(*) AS BIGINT),
              |    CAST(coalesce(sum(nk), 0) AS BIGINT) FROM pd3)
              |ORDER BY stage""".stripMargin),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            size(split(col("text"), " ")).cast("long").as("n_toks"))
          .cache()
        docs.count() // eager: four funnel stages share the scan
        // ONE exact-dedup shuffle produces BOTH the survivor ids
        // (stage 1) and the survivor TEXTS — the shingle tier's input.
        // The prune is therefore BELOW the shingle explode: minhash
        // map work (the md5-per-shingle that dominates dedup at crawl
        // scale, where exact-dup fraction is 30-50%) runs over
        // survivors only, and the former corpus-wide shingleSets →
        // semi-join-down pass (shingle everything, then drop the dups'
        // signatures) is gone along with its join shuffle. Texts
        // within a group are identical (same content hash — the
        // grouping key the oracle uses too), so first() is exact.
        val ex2 = docs.groupBy(md5(col("text")).as("k"))
          .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
          .select("doc_id", "text").cache()
        val ex = ex2.select("doc_id")
        val sig = shingleHashSets(ex2, "text", Seq("doc_id"))
          .select(col("doc_id") +: mhCols: _*).cache()
        sig.count()
        val comp = Graph.connectedComponents(
          bandPairs(sig).select(col("d1").as("src"), col("d2").as("dst")))
        val kept2 = comp.select(col("component").as("doc_id")).distinct()
          .unionByName(ex.join(
            comp.select(col("id").as("doc_id")), Seq("doc_id"), "left_anti"))
        def stage(st: Long, ids: Option[org.apache.spark.sql.DataFrame]) =
          ids.map(docs.join(_, "doc_id")).getOrElse(docs)
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_toks")).as("n_tokens"))
            .select(lit(st).as("stage"), col("n_docs"), col("n_tokens"))
        // stage 3 — span dedup over the near-dup SURVIVORS: the
        // doc-level tiers removed whole copies; this tier rewrites
        // the remaining docs, dropping token spans duplicated across
        // ≥2 survivors (a doc survives stage 3 while it has ≥1 token)
        val sd = spanDedupRewrite(
          docs.join(kept2, "doc_id").select("doc_id", "text"))
        val st3 = sd.agg(
          sum(when(size(col("kept")) > 0, 1L).otherwise(0L)).as("n_docs"),
          sum(size(col("kept")).cast("long")).as("n_tokens"))
          .select(lit(3L).as("stage"), col("n_docs"), col("n_tokens"))
        val out = stage(0L, None)
          .unionByName(stage(1L, Some(ex)))
          .unionByName(stage(2L, Some(kept2)))
          .unionByName(st3)
          .orderBy("stage")
          .localCheckpoint(true)
        docs.unpersist() // result is pinned; release the shared caches
        ex2.unpersist()
        sig.unpersist()
        out
      }),

    // ----- exact-substring span dedup as a REWRITE (q318): q257
    //       measures the duplicated-span fraction; the Lee-et-al op
    //       actually REMOVES the spans. Every token position covered
    //       by a 5-gram occurring in ≥2 distinct docs is dropped and
    //       the survivors re-join — whole-doc dedup can't touch this
    //       (the docs differ), yet the shared boilerplate vanishes.
    //       The oracle recomputes the removed-token count per source
    //       AND the rebuilt corpus size in characters (so a rewrite
    //       that dropped the right COUNT of tokens but the wrong ones
    //       still breaks the hash); TextSpec pins a hand-built
    //       two-doc overlap down to the exact rebuilt strings. -----
    Q("q318_span_dedup_rewrite",
      Some("""WITH tt AS (SELECT doc_id, source,
             |    string_split(text, ' ') AS l FROM documents),
             |gidx AS (SELECT doc_id, unnest(range(1, len(l) - 3)) AS i, l
             |         FROM tt),
             |g2 AS (SELECT doc_id, i,
             |    array_to_string(l[i:i+4], ' ') AS g FROM gidx),
             |dup AS (SELECT g FROM (
             |    SELECT g, count(DISTINCT doc_id) AS nd FROM g2 GROUP BY g)
             |  WHERE nd >= 2),
             |covp AS (SELECT DISTINCT doc_id,
             |    unnest([i, i+1, i+2, i+3, i+4]) AS p
             |  FROM g2 WHERE g IN (SELECT g FROM dup)),
             |pos AS (SELECT doc_id, source, unnest(range(1, len(l) + 1)) AS p
             |        FROM tt),
             |kept AS (SELECT pos.doc_id, pos.source, pos.p FROM pos
             |  WHERE NOT EXISTS (SELECT 1 FROM covp c
             |    WHERE c.doc_id = pos.doc_id AND c.p = pos.p)),
             |keptok AS (SELECT k.doc_id, k.source, t.l[k.p] AS tok
             |           FROM kept k JOIN tt t ON t.doc_id = k.doc_id),
             |perdoc AS (SELECT doc_id, source, count(*) AS nk,
             |    sum(length(tok)) AS sc FROM keptok GROUP BY 1, 2),
             |tots AS (SELECT source, count(*) AS n_docs,
             |    sum(len(l)) AS tokens_before FROM tt GROUP BY source),
             |keptagg AS (SELECT source, sum(nk) AS tokens_after,
             |    sum(sc + nk - 1) AS chars_after FROM perdoc GROUP BY source)
             |SELECT t.source, CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(tokens_before AS BIGINT) AS tokens_before,
             |  CAST(tokens_before - coalesce(tokens_after, 0) AS BIGINT)
             |    AS tokens_removed,
             |  CAST(coalesce(tokens_after, 0) AS BIGINT) AS tokens_after,
             |  CAST(coalesce(chars_after, 0) AS BIGINT) AS chars_after
             |FROM tots t LEFT JOIN keptagg USING (source)
             |ORDER BY source""".stripMargin),
      (s, dir) => {
        val sd = spanDedupRewrite(Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text")))
        sd.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(size(col("tk")).cast("long")).as("tokens_before"),
          sum((size(col("tk")) - size(col("kept"))).cast("long"))
            .as("tokens_removed"),
          sum(size(col("kept")).cast("long")).as("tokens_after"),
          sum(length(col("new_text")).cast("long")).as("chars_after"))
          .orderBy("source")
      })
  )
}
