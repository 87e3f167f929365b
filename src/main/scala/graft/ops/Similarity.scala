package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings.embedding: array<float>` (64-dim)
  * — SURVEY.md §2.9.
  *
  * Cross-engine float determinism: both engines compute
  * `sum_i(double(a_i) * double(b_i))` as a sequential left fold in
  * index order (Spark `aggregate(zip_with(...))`, DuckDB
  * `list_dot_product(::DOUBLE[])` — verified equal to an explicit
  * `list_reduce` fold on the fixture), so the doubles are bit-identical
  * and `round(x, 4)` agrees exactly. Ranking and thresholds always use
  * the ROUNDED value with a vec_id tiebreak, never the raw double.
  *
  * Scale design (100 TB):
  *  - brute-force top-k broadcasts the (small) query set and streams
  *    the candidate corpus — one narrow scan, one shuffle keyed by
  *    query id for the final top-k;
  *  - the ANN path buckets rows by random-hyperplane sign bits
  *    (a deterministic literal sign matrix, embedded identically in
  *    the oracle SQL), the plane count auto-sized from the corpus
  *    count so expected bucket occupancy stays bounded as the data
  *    grows — candidate generation is a per-bucket equi-join instead
  *    of the quadratic cross join;
  *  - norms are computed once per row before any join (never inside
  *    the pair loop).
  */
object Similarity {

  private val dims = 64

  /** Widest plane count the embedded literal matrix (and its oracle-SQL
    * copy) carries. 12 planes = 4,096 buckets — enough for fixture
    * scales through ~256k vectors at the 64/bucket target; a true
    * 100 TB deployment regenerates a wider matrix (`hyperplanes(24,…)`
    * ≈ 16M buckets) — the seed is deterministic, so any width agrees
    * across engines and runs. */
  private val maxPlanes = 12

  /** Deterministic ±1 hyperplane matrix (seeded scala.util.Random —
    * embedded as literals in BOTH engines, so cross-engine agreement
    * is by construction). PUBLIC and parameterized: the plane count is
    * the bucket-density scale knob (SCALING.md). `Array.fill` draws
    * row-major, so `hyperplanes(k).take(j)` ≡ `hyperplanes(j)` — a
    * corpus re-bucketed with more planes refines (splits) its old
    * buckets rather than reshuffling them. */
  def hyperplanes(nPlanes: Int, nDims: Int, seed: Long = 42L): Array[Array[Double]] = {
    val r = new scala.util.Random(seed)
    Array.fill(nPlanes, nDims)(if (r.nextBoolean()) 1.0 else -1.0)
  }

  val hpSigns: Array[Array[Double]] = hyperplanes(maxPlanes, dims)

  /** q138's 16×64 ±1 projection matrix (seed distinct from the LSH
    * planes so bucket bits and projected dims are independent). */
  private val projSigns: Array[Array[Double]] = hyperplanes(16, dims, seed = 7L)

  /** Corpus-size-derived plane count: smallest even p with
    * n ≤ target·2^p (= ceil(log2(n/target)) rounded up to even),
    * clamped to [4, maxPlanes]. Even steps keep the tier thresholds
    * exact integers — both engines pick the SAME p by pure integer
    * comparison, no float log2 at the decision boundary. Expected
    * bucket occupancy stays ≤ `target` until n outgrows the embedded
    * matrix width. */
  def autoPlanes(n: Long, target: Long = 64L): Int =
    (4 to maxPlanes by 2).find(p => n <= (target << p)).getOrElse(maxPlanes)

  /** DuckDB copy of the same tier decision (CTE `p`, column `np`). */
  private def duckAutoPlanes(target: Long = 64L): String = {
    val cases = (4 until maxPlanes by 2)
      .map(p => s"WHEN count(*) <= ${target << p} THEN $p").mkString(" ")
    s"(SELECT CASE $cases ELSE $maxPlanes END AS np FROM embeddings)"
  }

  private def sqlArray(a: Array[Double]): String =
    a.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  private def sparkArray(a: Array[Double]): String =
    a.map(v => if (v > 0) "1.0D" else "-1.0D").mkString("array(", ",", ")")

  /** Spark: dot(c, c) in doubles, sequential fold (the FuseDotProduct
    * rule collapses this to one codegen loop). */
  private def normExprOf(c: String) =
    s"sqrt(aggregate(transform($c, x -> cast(x as double) * cast(x as double)), cast(0 as double), (a,v) -> a + v))"
  private val normExpr = normExprOf("embedding")

  /** Spark: n-bit sign-LSH bucket from literal hyperplane signs. */
  private def bucketExprOf(c: String, hp: Array[Array[Double]]): String =
    hp.indices.map { j =>
      val dot = s"aggregate(zip_with($c, ${sparkArray(hp(j))}, (x,h) -> cast(x as double) * h), cast(0 as double), (a,v) -> a + v)"
      s"CASE WHEN $dot > 0 THEN ${1 << j} ELSE 0 END"
    }.mkString("cast(", " + ", " as int)")

  /** PUBLIC generic form: attach per-row L2 norm (`nrm`) and sign-LSH
    * bucket (`bucket`) over any `array<float>` embedding column —
    * computed once per row, before any join touches the data. */
  def withNormAndBucket(df: DataFrame, embCol: String,
                        hp: Array[Array[Double]] = hpSigns): DataFrame =
    df.withColumn("nrm", expr(normExprOf(embCol)))
      .withColumn("bucket", expr(bucketExprOf(embCol, hp)))

  /** DuckDB equivalents (package-visible: the streaming ANN query
    * q334 reuses the norm text in its oracle). */
  private[graft] val duckNorm =
    "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"

  /** DuckDB: full `maxPlanes`-bit bucket, masked down to `np` planes by
    * the caller (`& ((1 << np) - 1)`). Plane j contributes bit j, so
    * masking to the low np bits IS the np-plane bucket — the oracle can
    * stay a static string while the plane count is data-derived. */
  private val duckBucketFull: String = (0 until maxPlanes).map { j =>
    s"CASE WHEN list_dot_product(embedding::DOUBLE[], ${sqlArray(hpSigns(j))}::DOUBLE[]) > 0 THEN ${1 << j} ELSE 0 END"
  }.mkString("CAST(", " + ", " AS INT)")

  /** Corpus size per fixture dir, counted once per JVM: the count job
    * reads no column data (empty-schema parquet scans serve row counts
    * from footers) but is still a scheduled job, and the corpus size
    * of a fixture doesn't change under us — so q49/q50 share one
    * memoized count instead of re-running it per invocation. */
  private val corpusCounts = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Corpus with per-row norm + LSH bucket, the plane count derived
    * from the corpus size (VERDICT r4 #2: the `nPlanes ≈
    * log2(n/targetBucketSize)` sizing as code, not a comment). The
    * Spark side evaluates only the chosen prefix of the plane matrix
    * (the oracle evaluates all 12 and masks — same bits by
    * construction). */
  private def corpus(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val np = autoPlanes(corpusCounts.getOrElseUpdate(dir, emb.count()))
    withNormAndBucket(emb, "embedding", hpSigns.take(np))
  }

  private val pairCos =
    "aggregate(zip_with(q_emb, embedding, (x,y) -> cast(x as double) * cast(y as double)), cast(0 as double), (a,v) -> a + v)"

  val queries: Seq[Q] = Seq(

    // ----- brute-force cosine top-k (the exact baseline): queries are
    //       broadcast against the streamed corpus. -----
    Q("q48_cosine_topk",
      Some(s"""WITH n AS (
              |  SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings
              |), q AS (SELECT * FROM n WHERE vec_id < 5),
              |sc AS (
              |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
              |    round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
              |          / (q.nrm * c.nrm), 4) AS cos
              |  FROM q JOIN n c ON c.vec_id <> q.vec_id)
              |SELECT q_id, cand_id, cos, CAST(rn AS INT) AS rn FROM (
              |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rn
              |  FROM sc)
              |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin),
      (s, dir) => {
        val n = corpus(s, dir)
        val q = n.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand_id"))
        n.join(broadcast(q), col("vec_id") =!= col("q_id"))
          .withColumn("cos", round(expr(pairCos) / (col("q_nrm") * col("nrm")), 4))
          .select(col("q_id"), col("vec_id").as("cand_id"), col("cos"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .orderBy("q_id", "rn")
      }),

    // ----- ANN via LSH sign buckets: same queries, candidates limited
    //       to the query's bucket (the scale path — bucket equi-join,
    //       not cross join). -----
    Q("q49_ann_lsh_topk",
      Some(s"""WITH p AS ${duckAutoPlanes()},
              |n AS (
              |  SELECT vec_id, embedding, $duckNorm AS nrm,
              |    $duckBucketFull & ((1 << p.np) - 1) AS bucket FROM embeddings, p
              |), q AS (SELECT * FROM n WHERE vec_id < 5),
              |sc AS (
              |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id, q.bucket,
              |    round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
              |          / (q.nrm * c.nrm), 4) AS cos
              |  FROM q JOIN n c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id)
              |SELECT q_id, bucket, cand_id, cos, CAST(rn AS INT) AS rn FROM (
              |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rn
              |  FROM sc)
              |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin),
      (s, dir) => {
        // per-pair cosine via the fused codegen expression (bit-identical
        // fold to the HOF composition — q48 keeps the HOF form as the
        // stated baseline; the ANN scale path takes the fast kernel)
        graft.functions.GraftExtensions.register(s)
        val n = corpus(s, dir)
        val q = n.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("bucket").as("q_bucket"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand_id"))
        n.join(broadcast(q), col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
          .withColumn("cos", round(expr("cosine_sim(q_emb, embedding)"), 4))
          .select(col("q_id"), col("bucket"), col("vec_id").as("cand_id"), col("cos"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy("q_id", "rn")
      }),

    // ----- embedding-cosine near-dup: all pairs INSIDE a bucket whose
    //       rounded cosine clears the threshold (bucket = blocking key;
    //       random-vector fixture peaks near cos≈0.5, so 0.3 yields a
    //       small deterministic pair set). -----
    Q("q50_embedding_neardup",
      Some(s"""WITH p AS ${duckAutoPlanes()},
              |n AS (
              |  SELECT vec_id, embedding, $duckNorm AS nrm,
              |    $duckBucketFull & ((1 << p.np) - 1) AS bucket FROM embeddings, p
              |)
              |SELECT a.vec_id AS d1, b.vec_id AS d2,
              |  round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              |        / (a.nrm * b.nrm), 4) AS cos
              |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
              |WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              |            / (a.nrm * b.nrm), 4) >= 0.3
              |ORDER BY d1, d2""".stripMargin),
      (s, dir) => {
        graft.functions.GraftExtensions.register(s)
        val n = corpus(s, dir)
        val a = n.select(col("vec_id").as("d1"), col("embedding").as("q_emb"), col("bucket"))
        val b = n.select(col("vec_id").as("d2"), col("embedding"), col("bucket"))
        a.join(b, Seq("bucket")).filter(col("d1") < col("d2"))
          .withColumn("cos", round(expr("cosine_sim(q_emb, embedding)"), 4))
          .filter(col("cos") >= 0.3)
          .select("d1", "d2", "cos")
          .orderBy("d1", "d2")
      }),

    // ----- brute-force top-k again, through the FUSED custom Catalyst
    //       expression (graft.functions.CosineSimilarity): one codegen
    //       loop for dot+norms instead of three higher-order-function
    //       folds with intermediate arrays. Same oracle as q48 — the
    //       fused loop accumulates in the same order, so the doubles
    //       are bit-identical. -----
    Q("q61_cosine_topk_fused",
      Some(s"""WITH n AS (
              |  SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings
              |), q AS (SELECT * FROM n WHERE vec_id < 5),
              |sc AS (
              |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
              |    round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
              |          / (q.nrm * c.nrm), 4) AS cos
              |  FROM q JOIN n c ON c.vec_id <> q.vec_id)
              |SELECT q_id, cand_id, cos, CAST(rn AS INT) AS rn FROM (
              |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rn
              |  FROM sc)
              |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin),
      (s, dir) => {
        graft.functions.GraftExtensions.register(s)
        val emb = Tables.load(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand_id"))
        emb.join(broadcast(q), col("vec_id") =!= col("q_id"))
          .withColumn("cos", round(expr("cosine_sim(q_emb, embedding)"), 4))
          .select(col("q_id"), col("vec_id").as("cand_id"), col("cos"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .orderBy("q_id", "rn")
      }),

    // ----- L2 (Euclidean) nearest neighbors: distance from the norm
    //       identity ||a-b||² = a·a + b·b − 2·a·b — norms are computed
    //       ONCE per row before the join, so the per-pair work is a
    //       single fused dot product (the same kernel as cosine; metric
    //       choice costs nothing extra). greatest(·, 0) guards the tiny
    //       negative residue float cancellation can leave. Both engines
    //       evaluate sqrt(q² + c² − 2·dot) from bit-identical doubles,
    //       and ranking uses the ROUNDED distance with a cand_id
    //       tiebreak. -----
    Q("q89_l2_topk",
      Some(s"""WITH n AS (
              |  SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings
              |), q AS (SELECT * FROM n WHERE vec_id < 5),
              |sc AS (
              |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
              |    round(sqrt(greatest(q.nrm * q.nrm + c.nrm * c.nrm
              |      - 2 * list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 0)), 4) AS dist
              |  FROM q JOIN n c ON c.vec_id <> q.vec_id)
              |SELECT q_id, cand_id, dist, CAST(rn AS INT) AS rn FROM (
              |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY dist, cand_id) AS rn
              |  FROM sc)
              |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin),
      (s, dir) => {
        graft.functions.GraftExtensions.register(s)
        val n = corpus(s, dir)
        val q = n.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("cand_id"))
        n.join(broadcast(q), col("vec_id") =!= col("q_id"))
          .withColumn("dist", round(sqrt(greatest(
            col("q_nrm") * col("q_nrm") + col("nrm") * col("nrm")
              - lit(2) * expr("dot_product(q_emb, embedding)"), lit(0.0))), 4))
          .select(col("q_id"), col("vec_id").as("cand_id"), col("dist"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .orderBy("q_id", "rn")
      }),

    // ----- IVF-style ANN: coarse quantizer = 8 seed centroids
    //       (vec_id < 8 — a real deployment k-means-trains these; the
    //       cell-assign / nprobe plumbing is identical), every vector
    //       assigned to its nearest cell, queries probe their 2 best
    //       cells. The inverted-file property: search touches only the
    //       probed cells' candidates, an equi-join on cell id. -----
    Q("q62_ivf_topk",
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings
              |), c AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM e WHERE vec_id < 8),
              |asg AS (
              |  SELECT e.vec_id, c.c_id,
              |    round(list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[])
              |          / (e.nrm * c.c_nrm), 4) AS rcos
              |  FROM e CROSS JOIN c),
              |ranked AS (
              |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY rcos DESC, c_id) AS rn FROM asg),
              |cells AS (SELECT vec_id, c_id AS cell FROM ranked WHERE rn = 1),
              |probes AS (SELECT vec_id AS q_id, c_id AS cell FROM ranked WHERE rn <= 2 AND vec_id < 5),
              |cand AS (
              |  SELECT p.q_id, t.vec_id AS cand_id
              |  FROM probes p JOIN cells t ON t.cell = p.cell AND t.vec_id <> p.q_id),
              |sc AS (
              |  SELECT cand.q_id, cand.cand_id,
              |    round(list_dot_product(q.embedding::DOUBLE[], t.embedding::DOUBLE[])
              |          / (q.nrm * t.nrm), 4) AS cos
              |  FROM cand JOIN e q ON q.vec_id = cand.q_id JOIN e t ON t.vec_id = cand.cand_id)
              |SELECT q_id, cand_id, cos, CAST(rn AS INT) AS rn FROM (
              |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rn FROM sc)
              |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin),
      (s, dir) => {
        graft.functions.GraftExtensions.register(s)
        val e = Tables.load(s, dir, "embeddings")
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
        // cell assignment: one pass corpus × 8 broadcast centroids
        val asg = e.select("vec_id", "embedding").crossJoin(broadcast(cents))
          .withColumn("rcos", round(expr("cosine_sim(embedding, c_emb)"), 4))
        val wAsg = Window.partitionBy(col("vec_id")).orderBy(col("rcos").desc, col("c_id"))
        // cache only the NARROW assignment (id, cell, rank) — caching
        // before the projection would materialize both embedding arrays
        // ×8 centroid copies per row (the arrays are 64 floats; the
        // assignment is 3 ints — two orders of magnitude smaller)
        val ranked = asg.withColumn("rn", row_number().over(wAsg))
          .select("vec_id", "c_id", "rn").cache()
        ranked.count() // eager: cells + probes both scan it, one via broadcast
        val cells = ranked.filter(col("rn") === 1).select(col("vec_id"), col("c_id").as("cell"))
        val probes = ranked.filter(col("rn") <= 2 && col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("c_id").as("cell"))
        val cand = broadcast(probes).join(cells, Seq("cell"))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("cand_id"))
        val qEmb = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand_id"))
        cand
          .join(broadcast(qEmb), Seq("q_id"))
          .join(e.select(col("vec_id").as("cand_id"), col("embedding")), Seq("cand_id"))
          .withColumn("cos", round(expr("cosine_sim(q_emb, embedding)"), 4))
          .select(col("q_id"), col("cand_id"), col("cos"))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 3)
          .orderBy("q_id", "rn")
      }),

    // ----- random-projection dimensionality reduction (Johnson–
    //       Lindenstrauss): 64-dim float embeddings → 16-dim via a
    //       seeded ±1 sign matrix scaled by 1/√16 = 0.25 (exact in
    //       binary, so no cross-engine scale drift). The production
    //       pattern at 100 TB: project ONCE at ingest, store the
    //       narrow vector beside the wide one, and run candidate
    //       generation (ANN, clustering, near-dup) on 4× less data —
    //       row-local map work, no shuffle, codegen'd HOF folds. The
    //       matrix is embedded as literals in both engines (same
    //       device as the LSH planes), emitted EXPLODED (vec_id, dim,
    //       proj) so the oracle is a scalar compare. The comparator is
    //       the quantized integer floor(raw·2500 + 0.5) (2500 = the
    //       0.25 JL scale × 10⁴): both engines run the IDENTICAL IEEE
    //       multiply/add/floor on the same double, so the BIGINT is
    //       bit-deterministic — unlike round(,4), whose half-way ties
    //       Spark decides on the exact BigDecimal expansion and DuckDB
    //       in floating point, flipping cells within an ulp of a
    //       .00005 boundary. -----
    Q("q138_random_projection",
      Some {
        val rows = projSigns.zipWithIndex
          .map { case (r, j) => s"($j, ${sqlArray(r)}::DOUBLE[])" }.mkString(", ")
        s"""SELECT vec_id, m.j AS dim,
           |  CAST(floor(list_dot_product(embedding::DOUBLE[], m.v) * 2500.0 + 0.5) AS BIGINT) AS proj_e4
           |FROM embeddings, (VALUES $rows) AS m(j, v)
           |ORDER BY vec_id, dim""".stripMargin
      },
      (s, dir) => {
        val dots = projSigns.map { row =>
          expr(s"aggregate(zip_with(embedding, ${sparkArray(row)}, " +
            "(x,h) -> cast(x as double) * h), cast(0 as double), (a,v) -> a + v)")
        }
        Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), posexplode(array(dots: _*)).as(Seq("dim", "raw")))
          .select(col("vec_id"), col("dim").cast("int").as("dim"),
            floor(col("raw") * 2500.0 + 0.5).as("proj_e4"))
          .orderBy("vec_id", "dim")
      }),

    // ----- SemDeDup-lite semantic dedup: keep one representative per
    //       semantic-duplicate group. Star-shaped approximation of the
    //       SemDeDup recipe (cluster → drop members too similar to the
    //       kept representative): coarse cluster = the corpus-sized
    //       sign-LSH bucket, representative = min vec_id per bucket, a
    //       member is dropped iff cos(member, representative) ≥ 0.4.
    //       One bucket window + one broadcast join of the (tiny)
    //       representative set — the corpus never self-joins, unlike
    //       the all-pairs q50 view of the same neighborhoods. Output
    //       is every vector's disposition, so the survivor set AND the
    //       removal audit are one result. -----
    Q("q160_semantic_dedup",
      Some(s"""WITH p AS ${duckAutoPlanes()},
              |n AS (
              |  SELECT vec_id, embedding, $duckNorm AS nrm,
              |    $duckBucketFull & ((1 << p.np) - 1) AS bucket FROM embeddings, p
              |), r AS (
              |  SELECT vec_id, embedding, nrm, bucket,
              |    min(vec_id) OVER (PARTITION BY bucket) AS canonical_id
              |  FROM n)
              |SELECT r.vec_id, CAST(r.bucket AS BIGINT) AS bucket, r.canonical_id,
              |  CAST(CASE WHEN r.vec_id = r.canonical_id THEN 1
              |       WHEN round(list_dot_product(r.embedding::DOUBLE[], c.embedding::DOUBLE[])
              |                  / (r.nrm * c.nrm), 4) >= 0.4 THEN 0
              |       ELSE 1 END AS INT) AS keep
              |FROM r JOIN n c ON c.vec_id = r.canonical_id
              |ORDER BY r.vec_id""".stripMargin),
      (s, dir) => {
        graft.functions.GraftExtensions.register(s)
        val n = corpus(s, dir)
        val withCanon = n.withColumn("canonical_id",
          min(col("vec_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("bucket"))))
        val canon = withCanon.filter(col("vec_id") === col("canonical_id"))
          .select(col("canonical_id").as("c_id"), col("embedding").as("c_emb"))
        withCanon
          .join(broadcast(canon), col("canonical_id") === col("c_id"))
          .withColumn("keep",
            when(col("vec_id") === col("canonical_id"), 1)
              .when(round(expr("cosine_sim(embedding, c_emb)"), 4) >= 0.4, 0)
              .otherwise(1).cast("int"))
          .select(col("vec_id"), col("bucket").cast("long").as("bucket"),
            col("canonical_id"), col("keep"))
          .orderBy("vec_id")
      }),

    // ----- product-quantization ANN (ADC, inner-product metric): the
    //       64-dim space splits into M=4 contiguous 16-dim subspaces;
    //       each subspace's K=8 codebook entries are the slices of the
    //       first 8 corpus vectors (sampled codebook — the same
    //       seed-vectors-as-centroids device as q62's IVF, so the
    //       oracle needs no k-means); every corpus vector ENCODES as 4
    //       small ints (argmax subspace dot, id tiebreak), and a query
    //       scores a candidate WITHOUT touching its embedding:
    //       approx_IP(q,t) = Σ_m dtable[q, m, code(t,m)] — the
    //       asymmetric-distance trick that makes PQ the 100-TB scan
    //       path (4 bytes/vector instead of 256, the distance table is
    //       M×K per query, and the scan is a broadcast-joined int
    //       lookup, never a float dot against the corpus). Per-
    //       subspace contributions quantize to e4 BIGINTs BEFORE the
    //       Σ_m so the sum is order-independent — a raw double sum
    //       across subspaces would hash-drift on aggregation order.
    //       Codes via one corpus × 32-row broadcast pass; candidate
    //       scoring is codes × (5·32)-row broadcast dtable; the corpus
    //       never self-joins. -----
    Q("q222_pq_adc_topk",
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
             |sub AS (
             |  SELECT vec_id, m, emb[m*16+1 : m*16+16] AS s
             |  FROM e, (VALUES (0),(1),(2),(3)) AS mm(m)),
             |cents AS (SELECT vec_id AS c_id, m, s AS cs FROM sub WHERE vec_id < 8),
             |enc AS (
             |  SELECT vec_id, m, c_id FROM (
             |    SELECT sub.vec_id, sub.m, c.c_id,
             |      row_number() OVER (PARTITION BY sub.vec_id, sub.m
             |        ORDER BY list_dot_product(sub.s, c.cs) DESC, c.c_id) AS rn
             |    FROM sub JOIN cents c ON c.m = sub.m) WHERE rn = 1),
             |dtab AS (
             |  SELECT q.vec_id AS q_id, c.m, c.c_id,
             |    CAST(floor(list_dot_product(q.s, c.cs) * 10000 + 0.5) AS BIGINT) AS d_e4
             |  FROM sub q JOIN cents c ON c.m = q.m WHERE q.vec_id < 5),
             |sc AS (
             |  SELECT d.q_id, enc.vec_id AS cand_id,
             |    CAST(SUM(d.d_e4) AS BIGINT) AS score_e4
             |  FROM enc JOIN dtab d ON d.m = enc.m AND d.c_id = enc.c_id
             |  WHERE enc.vec_id <> d.q_id
             |  GROUP BY d.q_id, enc.vec_id)
             |SELECT q_id, cand_id, score_e4, CAST(rn AS INT) AS rn FROM (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY q_id ORDER BY score_e4 DESC, cand_id) AS rn FROM sc)
             |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin),
      (s, dir) => {
        graft.functions.GraftExtensions.register(s)
        val e = Tables.load(s, dir, "embeddings")
        // (vec_id, m, s): each vector exploded into its 4 subspace slices
        val sub = e.select(col("vec_id"),
            posexplode(array((0 until 4).map(m =>
              slice(col("embedding"), m * 16 + 1, 16)): _*)).as(Seq("m", "s")))
        val cents = sub.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("m").as("cm"), col("s").as("cs"))
        // encode: corpus × 32 broadcast rows, argmax dot per (vec, m)
        val wEnc = Window.partitionBy(col("vec_id"), col("m"))
          .orderBy(expr("dot_product(s, cs)").desc, col("c_id"))
        val codes = sub.join(broadcast(cents), col("m") === col("cm"))
          .withColumn("rn", row_number().over(wEnc))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("m"), col("c_id"))
        // per-query distance table: 5 queries × 32 codebook rows
        val dtab = sub.filter(col("vec_id") < 5)
          .join(broadcast(cents), col("m") === col("cm"))
          .select(col("vec_id").as("q_id"), col("m"), col("c_id"),
            floor(expr("dot_product(s, cs)") * 10000.0 + 0.5).as("d_e4"))
        val wTop = Window.partitionBy(col("q_id"))
          .orderBy(col("score_e4").desc, col("cand_id"))
        codes.join(broadcast(dtab), Seq("m", "c_id"))
          .filter(col("vec_id") =!= col("q_id"))
          .groupBy(col("q_id"), col("vec_id").as("cand_id"))
          .agg(sum("d_e4").as("score_e4"))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 3)
          .select(col("q_id"), col("cand_id"), col("score_e4"),
            col("rn").cast("int").as("rn"))
          .orderBy("q_id", "rn")
      }),

    // ----- IVF-PQ (q238): the production ANN architecture (FAISS's
    //       IVFPQ) — q62's coarse inverted-file cells bound WHICH
    //       vectors a query touches, q222's product codes bound WHAT
    //       is read per touched vector: candidates come from the ≤2
    //       probed cells only, and each scores by ADC table lookup —
    //       never its embedding. At 100 TB both factors multiply:
    //       nprobe/ncells of the corpus × 4 int-bytes per candidate,
    //       the difference between an ANN query touching gigabytes
    //       and touching megabytes. Candidate generation is the cell
    //       equi-join (corpus never self-joins); scoring is a
    //       broadcast int-keyed lookup with order-independent e4
    //       sums. -----
    Q("q238_ivfpq_topk",
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings
              |), c AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM e WHERE vec_id < 8),
              |asg AS (
              |  SELECT e.vec_id, c.c_id,
              |    round(list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[])
              |          / (e.nrm * c.c_nrm), 4) AS rcos
              |  FROM e CROSS JOIN c),
              |ranked AS (
              |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY rcos DESC, c_id) AS rn FROM asg),
              |cells AS (SELECT vec_id, c_id AS cell FROM ranked WHERE rn = 1),
              |probes AS (SELECT vec_id AS q_id, c_id AS cell FROM ranked WHERE rn <= 2 AND vec_id < 5),
              |cand AS (
              |  SELECT p.q_id, t.vec_id AS cand_id
              |  FROM probes p JOIN cells t ON t.cell = p.cell AND t.vec_id <> p.q_id),
              |sub AS (
              |  SELECT vec_id, m, (embedding::DOUBLE[])[m*16+1 : m*16+16] AS s
              |  FROM e, (VALUES (0),(1),(2),(3)) AS mm(m)),
              |pcent AS (SELECT vec_id AS pc, m, s AS cs FROM sub WHERE vec_id < 8),
              |enc AS (
              |  SELECT vec_id, m, pc FROM (
              |    SELECT sub.vec_id, sub.m, p.pc,
              |      row_number() OVER (PARTITION BY sub.vec_id, sub.m
              |        ORDER BY list_dot_product(sub.s, p.cs) DESC, p.pc) AS prn
              |    FROM sub JOIN pcent p ON p.m = sub.m) WHERE prn = 1),
              |dtab AS (
              |  SELECT q.vec_id AS q_id, p.m, p.pc,
              |    CAST(floor(list_dot_product(q.s, p.cs) * 10000 + 0.5) AS BIGINT) AS d_e4
              |  FROM sub q JOIN pcent p ON p.m = q.m WHERE q.vec_id < 5),
              |sc AS (
              |  SELECT cand.q_id, cand.cand_id,
              |    CAST(SUM(d.d_e4) AS BIGINT) AS score_e4
              |  FROM cand
              |  JOIN enc ON enc.vec_id = cand.cand_id
              |  JOIN dtab d ON d.q_id = cand.q_id AND d.m = enc.m AND d.pc = enc.pc
              |  GROUP BY cand.q_id, cand.cand_id)
              |SELECT q_id, cand_id, score_e4, CAST(rn AS INT) AS rn FROM (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY q_id ORDER BY score_e4 DESC, cand_id) AS rn FROM sc)
              |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin),
      (s, dir) => {
        val wTop = Window.partitionBy(col("q_id"))
          .orderBy(col("score_e4").desc, col("cand_id"))
        adcScores(s, Tables.load(s, dir, "embeddings"))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 3)
          .select(col("q_id"), col("cand_id"), col("score_e4"),
            col("rn").cast("int").as("rn"))
          .orderBy("q_id", "rn")
      }),

    // ----- ANN refine (q274): FAISS's IndexRefine composed on q238 —
    //       the compressed index picks a SHORTLIST (top-10 by ADC over
    //       the probed cells), then EXACT cosine re-ranks only those
    //       10 per query. At 100 TB this is the standard
    //       recall-repair step: the exact pass touches O(queries x
    //       shortlist) embeddings — a broadcast join against the
    //       corpus by vec_id, never a corpus self-join — so final
    //       ranks use true distances while the index bounds what is
    //       read. Oracle re-derives shortlist AND re-rank, so an ADC
    //       ordering leaking into the final ranks (or a shortlist
    //       computed on exact scores) breaks the hash. -----
    Q("q274_ann_refine",
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings
              |), c AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM e WHERE vec_id < 8),
              |asg AS (
              |  SELECT e.vec_id, c.c_id,
              |    round(list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[])
              |          / (e.nrm * c.c_nrm), 4) AS rcos
              |  FROM e CROSS JOIN c),
              |ranked AS (
              |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY rcos DESC, c_id) AS rn FROM asg),
              |cells AS (SELECT vec_id, c_id AS cell FROM ranked WHERE rn = 1),
              |probes AS (SELECT vec_id AS q_id, c_id AS cell FROM ranked WHERE rn <= 2 AND vec_id < 5),
              |cand AS (
              |  SELECT p.q_id, t.vec_id AS cand_id
              |  FROM probes p JOIN cells t ON t.cell = p.cell AND t.vec_id <> p.q_id),
              |sub AS (
              |  SELECT vec_id, m, (embedding::DOUBLE[])[m*16+1 : m*16+16] AS s
              |  FROM e, (VALUES (0),(1),(2),(3)) AS mm(m)),
              |pcent AS (SELECT vec_id AS pc, m, s AS cs FROM sub WHERE vec_id < 8),
              |enc AS (
              |  SELECT vec_id, m, pc FROM (
              |    SELECT sub.vec_id, sub.m, p.pc,
              |      row_number() OVER (PARTITION BY sub.vec_id, sub.m
              |        ORDER BY list_dot_product(sub.s, p.cs) DESC, p.pc) AS prn
              |    FROM sub JOIN pcent p ON p.m = sub.m) WHERE prn = 1),
              |dtab AS (
              |  SELECT q.vec_id AS q_id, p.m, p.pc,
              |    CAST(floor(list_dot_product(q.s, p.cs) * 10000 + 0.5) AS BIGINT) AS d_e4
              |  FROM sub q JOIN pcent p ON p.m = q.m WHERE q.vec_id < 5),
              |sc AS (
              |  SELECT cand.q_id, cand.cand_id,
              |    CAST(SUM(d.d_e4) AS BIGINT) AS score_e4
              |  FROM cand
              |  JOIN enc ON enc.vec_id = cand.cand_id
              |  JOIN dtab d ON d.q_id = cand.q_id AND d.m = enc.m AND d.pc = enc.pc
              |  GROUP BY cand.q_id, cand.cand_id),
              |shortlist AS (
              |  SELECT q_id, cand_id FROM (
              |    SELECT *, row_number() OVER (
              |      PARTITION BY q_id ORDER BY score_e4 DESC, cand_id) AS arn FROM sc)
              |  WHERE arn <= 10),
              |ref AS (
              |  SELECT s.q_id, s.cand_id,
              |    round(list_dot_product(eq.embedding::DOUBLE[], ec.embedding::DOUBLE[])
              |          / (eq.nrm * ec.nrm), 4) AS cos_exact
              |  FROM shortlist s
              |  JOIN e eq ON eq.vec_id = s.q_id
              |  JOIN e ec ON ec.vec_id = s.cand_id)
              |SELECT q_id, cand_id, cos_exact, CAST(rn AS INT) AS rn FROM (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY q_id ORDER BY cos_exact DESC, cand_id) AS rn FROM ref)
              |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin),
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val wAdc = Window.partitionBy(col("q_id"))
          .orderBy(col("score_e4").desc, col("cand_id"))
        // ADC shortlist: top-10 per query by compressed score
        val shortlist = adcScores(s, e)
          .withColumn("arn", row_number().over(wAdc))
          .filter(col("arn") <= 10)
          .select("q_id", "cand_id")
        refineExact(s, e, shortlist, 3)
          .select(col("q_id"), col("cand_id"), col("cos_exact"),
            col("rn").cast("int").as("rn"))
          .orderBy("q_id", "rn")
      }),

    // ----- ANN recall audit (q286): the no-silent-caps rule applied
    //       to the ANN stack itself. The board so far proves each
    //       tier's ORDERING is computed right; this op measures what
    //       the compression actually costs — recall@3 of the raw
    //       IVF-PQ shortlist and of the refined (exact re-ranked)
    //       top-3 against the brute-force exact top-3, per query, as
    //       a first-class differential relation (the audit a
    //       production ANN deployment runs before trusting an index).
    //       All three tiers recompute independently in the oracle, so
    //       a recall fraction that drifts — an over-pruned cell, a
    //       mis-encoded code, a refine that leaks ADC order — breaks
    //       the hash. Cost: exact side is queries × corpus (the q48
    //       broadcast shape); at 100 TB this runs on a SAMPLE of
    //       queries by construction (vec_id < 5 here), never the full
    //       query log. -----
    Q("q286_ann_recall_audit",
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings
              |), c AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM e WHERE vec_id < 8),
              |asg AS (
              |  SELECT e.vec_id, c.c_id,
              |    round(list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[])
              |          / (e.nrm * c.c_nrm), 4) AS rcos
              |  FROM e CROSS JOIN c),
              |ranked AS (
              |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY rcos DESC, c_id) AS rn FROM asg),
              |cells AS (SELECT vec_id, c_id AS cell FROM ranked WHERE rn = 1),
              |probes AS (SELECT vec_id AS q_id, c_id AS cell FROM ranked WHERE rn <= 2 AND vec_id < 5),
              |cand AS (
              |  SELECT p.q_id, t.vec_id AS cand_id
              |  FROM probes p JOIN cells t ON t.cell = p.cell AND t.vec_id <> p.q_id),
              |sub AS (
              |  SELECT vec_id, m, (embedding::DOUBLE[])[m*16+1 : m*16+16] AS s
              |  FROM e, (VALUES (0),(1),(2),(3)) AS mm(m)),
              |pcent AS (SELECT vec_id AS pc, m, s AS cs FROM sub WHERE vec_id < 8),
              |enc AS (
              |  SELECT vec_id, m, pc FROM (
              |    SELECT sub.vec_id, sub.m, p.pc,
              |      row_number() OVER (PARTITION BY sub.vec_id, sub.m
              |        ORDER BY list_dot_product(sub.s, p.cs) DESC, p.pc) AS prn
              |    FROM sub JOIN pcent p ON p.m = sub.m) WHERE prn = 1),
              |dtab AS (
              |  SELECT q.vec_id AS q_id, p.m, p.pc,
              |    CAST(floor(list_dot_product(q.s, p.cs) * 10000 + 0.5) AS BIGINT) AS d_e4
              |  FROM sub q JOIN pcent p ON p.m = q.m WHERE q.vec_id < 5),
              |sc AS (
              |  SELECT cand.q_id, cand.cand_id,
              |    CAST(SUM(d.d_e4) AS BIGINT) AS score_e4
              |  FROM cand
              |  JOIN enc ON enc.vec_id = cand.cand_id
              |  JOIN dtab d ON d.q_id = cand.q_id AND d.m = enc.m AND d.pc = enc.pc
              |  GROUP BY cand.q_id, cand.cand_id),
              |adc3 AS (
              |  SELECT q_id, cand_id FROM (
              |    SELECT *, row_number() OVER (
              |      PARTITION BY q_id ORDER BY score_e4 DESC, cand_id) AS rn FROM sc)
              |  WHERE rn <= 3),
              |shortlist AS (
              |  SELECT q_id, cand_id FROM (
              |    SELECT *, row_number() OVER (
              |      PARTITION BY q_id ORDER BY score_e4 DESC, cand_id) AS arn FROM sc)
              |  WHERE arn <= 10),
              |refd AS (
              |  SELECT s.q_id, s.cand_id,
              |    round(list_dot_product(eq.embedding::DOUBLE[], ec.embedding::DOUBLE[])
              |          / (eq.nrm * ec.nrm), 4) AS cos_exact
              |  FROM shortlist s
              |  JOIN e eq ON eq.vec_id = s.q_id
              |  JOIN e ec ON ec.vec_id = s.cand_id),
              |ref3 AS (
              |  SELECT q_id, cand_id FROM (
              |    SELECT *, row_number() OVER (
              |      PARTITION BY q_id ORDER BY cos_exact DESC, cand_id) AS rn FROM refd)
              |  WHERE rn <= 3),
              |ex AS (
              |  SELECT q.vec_id AS q_id, cnd.vec_id AS cand_id,
              |    round(list_dot_product(q.embedding::DOUBLE[], cnd.embedding::DOUBLE[])
              |          / (q.nrm * cnd.nrm), 4) AS cos
              |  FROM e q JOIN e cnd ON cnd.vec_id <> q.vec_id WHERE q.vec_id < 5),
              |ex3 AS (
              |  SELECT q_id, cand_id FROM (
              |    SELECT *, row_number() OVER (
              |      PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rn FROM ex)
              |  WHERE rn <= 3)
              |SELECT e3.q_id,
              |  CAST(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits_adc,
              |  CAST(sum(CASE WHEN r3.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits_refine,
              |  CAST(round(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) / 3.0, 4) AS DOUBLE) AS recall_adc,
              |  CAST(round(sum(CASE WHEN r3.cand_id IS NOT NULL THEN 1 ELSE 0 END) / 3.0, 4) AS DOUBLE) AS recall_refine
              |FROM ex3 e3
              |LEFT JOIN adc3 a ON a.q_id = e3.q_id AND a.cand_id = e3.cand_id
              |LEFT JOIN ref3 r3 ON r3.q_id = e3.q_id AND r3.cand_id = e3.cand_id
              |GROUP BY e3.q_id ORDER BY e3.q_id""".stripMargin),
      (s, dir) => {
        graft.functions.GraftExtensions.register(s)
        val e = Tables.load(s, dir, "embeddings")
        val wAdc = Window.partitionBy(col("q_id"))
          .orderBy(col("score_e4").desc, col("cand_id"))
        val sc = adcScores(s, e)
          .withColumn("arn", row_number().over(wAdc))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val adc3 = sc.filter(col("arn") <= 3).select("q_id", "cand_id")
        val shortlist = sc.filter(col("arn") <= 10).select("q_id", "cand_id")
        val ref3 = refineExact(s, e, shortlist, 3).select("q_id", "cand_id")
        // exact top-3: the q48 brute-force broadcast shape over the
        // audited query sample (cosine_sim folds norms into the one
        // codegen loop — no precomputed nrm column needed)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val wEx = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("cand_id"))
        val ex3 = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
          .withColumn("cos", round(expr("cosine_sim(q_emb, embedding)"), 4))
          .select(col("q_id"), col("vec_id").as("cand_id"), col("cos"))
          .withColumn("rn", row_number().over(wEx))
          .filter(col("rn") <= 3).select("q_id", "cand_id")
        val out = ex3
          .join(adc3.withColumn("a_hit", lit(1)), Seq("q_id", "cand_id"), "left")
          .join(ref3.withColumn("r_hit", lit(1)), Seq("q_id", "cand_id"), "left")
          .groupBy("q_id")
          .agg(sum(coalesce(col("a_hit"), lit(0))).as("hits_adc"),
            sum(coalesce(col("r_hit"), lit(0))).as("hits_refine"))
          .select(col("q_id"), col("hits_adc"), col("hits_refine"),
            round(col("hits_adc") / 3.0, 4).cast("double").as("recall_adc"),
            round(col("hits_refine") / 3.0, 4).cast("double").as("recall_refine"))
          .orderBy("q_id")
          .localCheckpoint(true)
        sc.unpersist()
        out
      }),

    // ----- per-label centroid affinity matrix (q290): the domain-
    //       similarity map a mixture designer reads before setting
    //       source weights — mean embedding per label, then pairwise
    //       cosine between the label centroids. 100-TB shape: ONE
    //       corpus pass into a (label, dim)-keyed agg whose cardinality
    //       is labels x dims (corpus-size-independent, partial agg eats
    //       the posexplode); everything after is labels² rows of
    //       driver-trivial arithmetic. Embeddings quantize to 4-dp
    //       first so each centroid mean is an exact DECIMAL sum scaled
    //       to an integer divide (order-proof); the pairwise cosines
    //       fold sequentially over pos-ordered lists, bit-equal in both
    //       engines. -----
    Q("q290_label_affinity",
      Some("""WITH e AS (
             |  SELECT label,
             |    list_transform(embedding::DOUBLE[], x -> round(x, 4)) AS emb
             |  FROM embeddings),
             |dims AS (SELECT label, generate_subscripts(emb, 1) AS pos,
             |  unnest(emb) AS v FROM e),
             |cent AS (
             |  SELECT label, pos,
             |    round(CAST(sum(CAST(v AS DECIMAL(18,4))) * 10000 AS DOUBLE)
             |      / count(*)) / 10000.0 AS m
             |  FROM dims GROUP BY label, pos),
             |cl AS (SELECT label, list(m ORDER BY pos) AS c
             |       FROM cent GROUP BY label),
             |n AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
             |      FROM e GROUP BY label)
             |SELECT CAST(a.label AS BIGINT) AS label_a,
             |  CAST(b.label AS BIGINT) AS label_b,
             |  na.n_vecs AS n_a, nb.n_vecs AS n_b,
             |  round(list_dot_product(a.c, b.c)
             |    / (sqrt(list_dot_product(a.c, a.c))
             |       * sqrt(list_dot_product(b.c, b.c))), 4) AS rcos
             |FROM cl a JOIN cl b ON a.label <= b.label
             |JOIN n na ON na.label = a.label
             |JOIN n nb ON nb.label = b.label
             |ORDER BY label_a, label_b""".stripMargin),
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
          .select(col("label").cast("long").as("label"),
            expr("transform(embedding, x -> round(cast(x AS double), 4))")
              .as("emb"))
        val cent = e.select(col("label"),
            posexplode(col("emb")).as(Seq("pos", "v")))
          .groupBy("label", "pos")
          .agg((round((sum(col("v").cast("decimal(18,4)")) * 10000)
            .cast("double") / count(lit(1))) / 10000.0).as("m"))
        val cl = cent.groupBy("label")
          .agg(expr(
            "transform(sort_array(collect_list(struct(pos, m))), s -> s.m)")
            .as("c"))
        val n = e.groupBy("label").agg(count(lit(1)).as("n_vecs"))
        val a = cl.select(col("label").as("label_a"), col("c").as("ca"))
          .join(n.select(col("label").as("label_a"), col("n_vecs").as("n_a")),
            "label_a")
        val b = cl.select(col("label").as("label_b"), col("c").as("cb"))
          .join(n.select(col("label").as("label_b"), col("n_vecs").as("n_b")),
            "label_b")
        val dot =
          "aggregate(zip_with(ca, cb, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
        val nrmA =
          "sqrt(aggregate(transform(ca, x -> x * x), 0D, (acc, x) -> acc + x))"
        val nrmB =
          "sqrt(aggregate(transform(cb, x -> x * x), 0D, (acc, x) -> acc + x))"
        a.crossJoin(broadcast(b))
          .filter(col("label_a") <= col("label_b"))
          .withColumn("rcos", round(expr(s"$dot / ($nrmA * $nrmB)"), 4))
          .select("label_a", "label_b", "n_a", "n_b", "rcos")
          .orderBy("label_a", "label_b")
      }),

    // ----- SemDeDup: cluster-bounded semantic dedup (q322): the
    //       Abbas-et-al recipe — cluster the embedding space, then
    //       prune near-duplicate PAIRS within clusters only, which is
    //       what makes semantic dedup affordable at corpus scale
    //       (pair cost = Σ cluster² instead of corpus²; the coarse
    //       assignment is the same broadcast-centroid pass the IVF
    //       tier and q288 use). The fixture plants a deterministic
    //       re-embedded crawl: every vec_id % 5 == 0 gains a +10000
    //       replica — IDENTICAL (a true semantic dup, cos = 1) unless
    //       vec_id % 10 == 0, where the first 32 dims NEGATE (a
    //       look-alike id that is NOT a dup and must survive). The
    //       dominated rule is closure-free by design: v is removed
    //       iff some same-cluster u < v has cos(u,v) ≥ 0.95 — no
    //       transitive component pass, exactly the paper's keep-one-
    //       per-pair pruning. Oracle recomputes assignment, planting,
    //       pairs, and the dominated set; a replica assigned to the
    //       wrong cluster, a flipped copy mistaken for a dup, or a
    //       survivor double-removed shifts a cluster row. -----
    Q("q322_semdedup",
      Some("""WITH b AS (SELECT vec_id,
             |    list_transform(embedding, x -> round(CAST(x AS DOUBLE), 4)) AS emb
             |  FROM embeddings),
             |reps AS (SELECT vec_id + 10000 AS vec_id,
             |    CASE WHEN vec_id % 10 = 0 THEN
             |      list_transform(range(1, len(emb) + 1),
             |        i -> CASE WHEN i <= 32 THEN -emb[i] ELSE emb[i] END)
             |    ELSE emb END AS emb
             |  FROM b WHERE vec_id % 5 = 0),
             |e AS (SELECT * FROM b UNION ALL SELECT * FROM reps),
             |cents AS (SELECT vec_id AS c_id, emb AS c_emb FROM b WHERE vec_id < 8),
             |asg AS (SELECT vec_id, c_id AS cluster FROM (
             |  SELECT e.vec_id, c.c_id,
             |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
             |      round(list_dot_product(e.emb, c.c_emb) /
             |        (sqrt(list_dot_product(e.emb, e.emb)) *
             |         sqrt(list_dot_product(c.c_emb, c.c_emb))), 4) DESC,
             |      c.c_id) AS rn
             |  FROM e CROSS JOIN cents c) t WHERE rn = 1),
             |pairs AS (
             |  SELECT a.vec_id AS u, bb.vec_id AS v
             |  FROM asg a JOIN asg bb
             |    ON a.cluster = bb.cluster AND a.vec_id < bb.vec_id
             |  JOIN e ea ON ea.vec_id = a.vec_id
             |  JOIN e eb ON eb.vec_id = bb.vec_id
             |  WHERE round(list_dot_product(ea.emb, eb.emb) /
             |      (sqrt(list_dot_product(ea.emb, ea.emb)) *
             |       sqrt(list_dot_product(eb.emb, eb.emb))), 4) >= 0.95),
             |removed AS (SELECT DISTINCT v FROM pairs)
             |SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
             |  CAST(sum(CASE WHEN vec_id IN (SELECT v FROM removed)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
             |  CAST(sum(CASE WHEN vec_id IN (SELECT v FROM removed)
             |    THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
             |FROM asg GROUP BY cluster ORDER BY cluster""".stripMargin),
      (s, dir) => {
        val base = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"),
            expr("transform(embedding, x -> round(cast(x AS double), 4))")
              .as("emb"))
        val reps = base.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 10000).as("vec_id"),
            when(col("vec_id") % 10 === 0,
              expr("transform(emb, (x, i) -> " +
                "CASE WHEN i < 32 THEN -x ELSE x END)"))
              .otherwise(col("emb")).as("emb"))
        val e = base.unionByName(reps).localCheckpoint(true)
        // sequential left-to-right folds — DuckDB list_dot_product's
        // summation order, so the 4-dp rounds agree bit-for-bit (the
        // q288 parity discipline)
        def cosOf(x: String, y: String) = {
          val dot = s"aggregate(zip_with($x, $y, (p, q) -> p * q), " +
            "0D, (acc, p) -> acc + p)"
          val nx = s"sqrt(aggregate(transform($x, p -> p * p), 0D, (acc, p) -> acc + p))"
          val ny = s"sqrt(aggregate(transform($y, p -> p * p), 0D, (acc, p) -> acc + p))"
          round(expr(s"$dot / ($nx * $ny)"), 4)
        }
        val wAsg = Window.partitionBy(col("vec_id"))
          .orderBy(col("rcos").desc, col("c_id"))
        val asg = e.crossJoin(
            broadcast(base.filter(col("vec_id") < 8)
              .select(col("vec_id").as("c_id"), col("emb").as("c_emb"))))
          .withColumn("rcos", cosOf("emb", "c_emb"))
          .withColumn("rn", row_number().over(wAsg))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("c_id").as("cluster"))
          .localCheckpoint(true)
        val withEmb = asg.join(e, "vec_id")
        // cluster-bounded pair generation — the SemDeDup cost bound
        val pairs = withEmb.select(col("cluster"), col("vec_id").as("u"),
            col("emb").as("ua"))
          .join(withEmb.select(col("cluster"), col("vec_id").as("v"),
            col("emb").as("vb")), "cluster")
          .filter(col("u") < col("v"))
          .filter(cosOf("ua", "vb") >= 0.95)
        val removed = pairs.select(col("v").as("vec_id")).distinct()
        val flagged = asg.join(removed.withColumn("rm", lit(1L)),
          Seq("vec_id"), "left")
        flagged.groupBy("cluster")
          .agg(count(lit(1)).as("n_members"),
            sum(coalesce(col("rm"), lit(0L))).as("n_removed"),
            sum(when(col("rm").isNull, 1L).otherwise(0L)).as("n_kept"))
          .orderBy("cluster")
      }),

    // ----- committed ANN index (q328): the q238 IVF-PQ stack as a
    //       PERSISTED artifact instead of a per-query rebuild — cells
    //       and codes are manifest TABLES, the codebook a claim-
    //       sidecar MARKER, all landed in ONE atomic claim; appends
    //       maintain it O(delta) BY PROOF (the q317 device: era-1's
    //       data files are deleted from disk before the increment —
    //       a maintenance that rescanned the indexed era would throw)
    //       with the cursor advancing in the same claim as the new
    //       codes, and a re-driven maintenance quiesces. In-plan
    //       asserts pin committed-probe ≡ recompute-from-scratch and
    //       exact-delta indexing; the oracle recomputes the FULL-
    //       corpus IVF-PQ independently, so a code encoded against a
    //       drifted codebook, a lost era, or a double-indexed vector
    //       shifts some query's top-3. -----
    Q("q328_ann_index_committed",
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings
              |), c AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM e WHERE vec_id < 8),
              |asg AS (
              |  SELECT e.vec_id, c.c_id,
              |    round(list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[])
              |          / (e.nrm * c.c_nrm), 4) AS rcos
              |  FROM e CROSS JOIN c),
              |ranked AS (
              |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY rcos DESC, c_id) AS rn FROM asg),
              |cells AS (SELECT vec_id, c_id AS cell FROM ranked WHERE rn = 1),
              |probes AS (SELECT vec_id AS q_id, c_id AS cell FROM ranked WHERE rn <= 2 AND vec_id < 5),
              |cand AS (
              |  SELECT p.q_id, t.vec_id AS cand_id
              |  FROM probes p JOIN cells t ON t.cell = p.cell AND t.vec_id <> p.q_id),
              |sub AS (
              |  SELECT vec_id, m, (embedding::DOUBLE[])[m*16+1 : m*16+16] AS s
              |  FROM e, (VALUES (0),(1),(2),(3)) AS mm(m)),
              |pcent AS (SELECT vec_id AS pc, m, s AS cs FROM sub WHERE vec_id < 8),
              |enc AS (
              |  SELECT vec_id, m, pc FROM (
              |    SELECT sub.vec_id, sub.m, p.pc,
              |      row_number() OVER (PARTITION BY sub.vec_id, sub.m
              |        ORDER BY list_dot_product(sub.s, p.cs) DESC, p.pc) AS prn
              |    FROM sub JOIN pcent p ON p.m = sub.m) WHERE prn = 1),
              |dtab AS (
              |  SELECT q.vec_id AS q_id, p.m, p.pc,
              |    CAST(floor(list_dot_product(q.s, p.cs) * 10000 + 0.5) AS BIGINT) AS d_e4
              |  FROM sub q JOIN pcent p ON p.m = q.m WHERE q.vec_id < 5),
              |sc AS (
              |  SELECT cand.q_id, cand.cand_id,
              |    CAST(SUM(d.d_e4) AS BIGINT) AS score_e4
              |  FROM cand
              |  JOIN enc ON enc.vec_id = cand.cand_id
              |  JOIN dtab d ON d.q_id = cand.q_id AND d.m = enc.m AND d.pc = enc.pc
              |  GROUP BY cand.q_id, cand.cand_id)
              |SELECT q_id, cand_id, score_e4, CAST(rn AS INT) AS rn FROM (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY q_id ORDER BY score_e4 DESC, cand_id) AS rn FROM sc)
              |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin),
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val cutId = e.agg(max("vec_id")).head().getLong(0) / 2
        val root = java.nio.file.Files
          .createTempDirectory("graft-ann-idx").toString
        Manifest.commitAppend(s, root, "embeddings",
          e.filter(col("vec_id") <= cutId).coalesce(2))
        val _ = buildAnnIndex(s, root, "embeddings", "ivfpq")
        val queries = e.filter(col("vec_id") < 5)
        // probe 1: the committed index answers EXACTLY what a
        // recompute-from-scratch answers (every candidate's score,
        // not just the top-3) — asserted in-plan
        val fromIdx = queryAnnIndex(s, root, "ivfpq", queries).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val rebuilt = adcScores(s, e.filter(col("vec_id") <= cutId)).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        require(fromIdx.nonEmpty && fromIdx == rebuilt,
          "committed-index probe must equal the recompute-from-scratch answer")
        // O(delta) BY PROOF: delete era-1's data files from DISK — a
        // maintenance that rescanned the indexed era would throw
        val v1 = Manifest.snapshotVersion(root)
        Manifest.manifestRows(s, root, v1)
          .collect { case ("embeddings", f, _) => f }
          .foreach(f => java.nio.file.Files.delete(
            java.nio.file.Paths.get(root, f)))
        Manifest.commitAppend(s, root, "embeddings",
          e.filter(col("vec_id") > cutId).coalesce(2))
        val n2 = e.filter(col("vec_id") > cutId).count()
        val m = maintainAnnIndex(s, root, "ivfpq")
        require(m.exists(_._1 == n2),
          s"maintenance must index exactly the delta (got $m, want $n2)")
        require(maintainAnnIndex(s, root, "ivfpq").isEmpty,
          "re-driven maintenance must quiesce")
        // final: top-3 per query against the MAINTAINED index — the
        // oracle recomputes the full-corpus IVF-PQ independently
        val wTop = Window.partitionBy(col("q_id"))
          .orderBy(col("score_e4").desc, col("cand_id"))
        val out = queryAnnIndex(s, root, "ivfpq", queries)
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 3)
          .select(col("q_id"), col("cand_id"), col("score_e4"),
            col("rn").cast("int").as("rn"))
          .orderBy("q_id", "rn").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(java.nio.file.Paths.get(root))
        out
      }),

    // ----- committed-index refine (q329): the PRODUCTION ANN query
    //       path end to end — shortlist from the COMMITTED index
    //       (q328's cells/codes/codebook, zero corpus reads), exact
    //       cosine re-rank of only the shortlist (q274's refine tier,
    //       a broadcast keyed join against the corpus by vec_id).
    //       Oracle = q274's: the recompute-from-scratch IVF-PQ
    //       shortlist + exact re-rank — so a committed code that
    //       drifts the shortlist, or an ADC score leaking into the
    //       final ranks, breaks the hash. This is what makes the
    //       persisted index REAL: the query a user actually runs
    //       composes committed-artifact candidate generation with
    //       exact scoring, reading O(index) + O(queries × shortlist)
    //       — never the corpus. -----
    Q("q329_ann_index_refine",
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings
              |), c AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM e WHERE vec_id < 8),
              |asg AS (
              |  SELECT e.vec_id, c.c_id,
              |    round(list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[])
              |          / (e.nrm * c.c_nrm), 4) AS rcos
              |  FROM e CROSS JOIN c),
              |ranked AS (
              |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY rcos DESC, c_id) AS rn FROM asg),
              |cells AS (SELECT vec_id, c_id AS cell FROM ranked WHERE rn = 1),
              |probes AS (SELECT vec_id AS q_id, c_id AS cell FROM ranked WHERE rn <= 2 AND vec_id < 5),
              |cand AS (
              |  SELECT p.q_id, t.vec_id AS cand_id
              |  FROM probes p JOIN cells t ON t.cell = p.cell AND t.vec_id <> p.q_id),
              |sub AS (
              |  SELECT vec_id, m, (embedding::DOUBLE[])[m*16+1 : m*16+16] AS s
              |  FROM e, (VALUES (0),(1),(2),(3)) AS mm(m)),
              |pcent AS (SELECT vec_id AS pc, m, s AS cs FROM sub WHERE vec_id < 8),
              |enc AS (
              |  SELECT vec_id, m, pc FROM (
              |    SELECT sub.vec_id, sub.m, p.pc,
              |      row_number() OVER (PARTITION BY sub.vec_id, sub.m
              |        ORDER BY list_dot_product(sub.s, p.cs) DESC, p.pc) AS prn
              |    FROM sub JOIN pcent p ON p.m = sub.m) WHERE prn = 1),
              |dtab AS (
              |  SELECT q.vec_id AS q_id, p.m, p.pc,
              |    CAST(floor(list_dot_product(q.s, p.cs) * 10000 + 0.5) AS BIGINT) AS d_e4
              |  FROM sub q JOIN pcent p ON p.m = q.m WHERE q.vec_id < 5),
              |sc AS (
              |  SELECT cand.q_id, cand.cand_id,
              |    CAST(SUM(d.d_e4) AS BIGINT) AS score_e4
              |  FROM cand
              |  JOIN enc ON enc.vec_id = cand.cand_id
              |  JOIN dtab d ON d.q_id = cand.q_id AND d.m = enc.m AND d.pc = enc.pc
              |  GROUP BY cand.q_id, cand.cand_id),
              |shortlist AS (
              |  SELECT q_id, cand_id FROM (
              |    SELECT *, row_number() OVER (
              |      PARTITION BY q_id ORDER BY score_e4 DESC, cand_id) AS arn FROM sc)
              |  WHERE arn <= 10),
              |ref AS (
              |  SELECT s.q_id, s.cand_id,
              |    round(list_dot_product(eq.embedding::DOUBLE[], ec.embedding::DOUBLE[])
              |          / (eq.nrm * ec.nrm), 4) AS cos_exact
              |  FROM shortlist s
              |  JOIN e eq ON eq.vec_id = s.q_id
              |  JOIN e ec ON ec.vec_id = s.cand_id)
              |SELECT q_id, cand_id, cos_exact, CAST(rn AS INT) AS rn FROM (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY q_id ORDER BY cos_exact DESC, cand_id) AS rn FROM ref)
              |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin),
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val root = java.nio.file.Files
          .createTempDirectory("graft-ann-refine").toString
        Manifest.commitAppend(s, root, "embeddings", e.coalesce(2))
        val _ = buildAnnIndex(s, root, "embeddings", "ivfpq")
        val queries = e.filter(col("vec_id") < 5)
        val wAdc = Window.partitionBy(col("q_id"))
          .orderBy(col("score_e4").desc, col("cand_id"))
        val shortlist = queryAnnIndex(s, root, "ivfpq", queries)
          .withColumn("arn", row_number().over(wAdc))
          .filter(col("arn") <= 10)
          .select("q_id", "cand_id")
        val out = refineExact(s, e, shortlist, 3)
          .select(col("q_id"), col("cand_id"), col("cos_exact"),
            col("rn").cast("int").as("rn"))
          .orderBy("q_id", "rn").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(java.nio.file.Paths.get(root))
        out
      }),

    // ----- incremental SemDeDup over the committed index (q335): the
    //       q322 recipe at steady state — a NEW batch semantically
    //       dedups against the standing corpus by joining the
    //       committed CELLS table (cluster assignments maintained
    //       O(delta) by the index), so pair cost is
    //       O(new × same-cluster members), never corpus² and never a
    //       re-cluster. The delta plants q322's two classes shifted
    //       into the new era: identical replicas (true dups — every
    //       one dominated by its same-cluster original) and
    //       first-32-dims-negated look-alikes (must survive).
    //       Standing-corpus rows are NEVER re-judged (dedup verdicts
    //       are append-monotone — re-litigating old rows on every
    //       batch is the quadratic trap). Oracle recomputes planting,
    //       assignment, and the new-era dominated set independently.
    //       -----
    Q("q335_semdedup_incremental",
      Some(s"""WITH b AS (SELECT vec_id, embedding FROM embeddings),
              |mx AS (SELECT max(vec_id) AS m FROM b),
              |reps AS (SELECT vec_id + 100000 AS vec_id,
              |    CASE WHEN vec_id % 10 = 0 THEN
              |      list_transform(range(1, len(embedding) + 1),
              |        i -> CASE WHEN i <= 32 THEN -embedding[i]
              |             ELSE embedding[i] END)
              |    ELSE embedding END AS embedding
              |  FROM b WHERE vec_id % 5 = 0),
              |e AS (SELECT * FROM b UNION ALL SELECT * FROM reps),
              |en AS (SELECT vec_id, embedding,
              |    sqrt(list_dot_product(embedding::DOUBLE[],
              |      embedding::DOUBLE[])) AS nrm FROM e),
              |c AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
              |  FROM en WHERE vec_id < 8),
              |asg AS (SELECT vec_id, c_id AS cluster FROM (
              |  SELECT en.vec_id, c.c_id,
              |    row_number() OVER (PARTITION BY en.vec_id ORDER BY
              |      round(list_dot_product(en.embedding::DOUBLE[],
              |        c.c_emb::DOUBLE[]) / (en.nrm * c.c_nrm), 4) DESC,
              |      c.c_id) AS rn
              |  FROM en CROSS JOIN c) t WHERE rn = 1),
              |pairs AS (
              |  SELECT bb.vec_id AS v
              |  FROM asg a JOIN asg bb
              |    ON a.cluster = bb.cluster AND a.vec_id < bb.vec_id
              |  JOIN en ea ON ea.vec_id = a.vec_id
              |  JOIN en eb ON eb.vec_id = bb.vec_id
              |  WHERE bb.vec_id > (SELECT m FROM mx)
              |    AND round(list_dot_product(ea.embedding::DOUBLE[],
              |      eb.embedding::DOUBLE[]) / (ea.nrm * eb.nrm), 4) >= 0.95),
              |removed AS (SELECT DISTINCT v FROM pairs)
              |SELECT cluster, CAST(count(*) AS BIGINT) AS n_new,
              |  CAST(sum(CASE WHEN vec_id IN (SELECT v FROM removed)
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
              |  CAST(sum(CASE WHEN vec_id IN (SELECT v FROM removed)
              |    THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
              |FROM asg WHERE vec_id > (SELECT m FROM mx)
              |GROUP BY cluster ORDER BY cluster""".stripMargin),
      (s, dir) => {
        graft.functions.GraftExtensions.register(s)
        val base = Tables.load(s, dir, "embeddings")
          .select("vec_id", "embedding")
        val maxId = base.agg(max("vec_id")).head().getLong(0)
        val reps = base.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 100000).as("vec_id"),
            when(col("vec_id") % 10 === 0,
              expr("transform(embedding, (x, i) -> " +
                "CASE WHEN i < 32 THEN -x ELSE x END)"))
              .otherwise(col("embedding")).as("embedding"))
        val root = java.nio.file.Files
          .createTempDirectory("graft-semdedup-inc").toString
        Manifest.commitAppend(s, root, "embeddings", base.coalesce(2))
        val _ = buildAnnIndex(s, root, "embeddings", "sd")
        Manifest.commitAppend(s, root, "embeddings", reps.coalesce(2))
        val m = maintainAnnIndex(s, root, "sd")
        require(m.exists(_._1 == reps.count()),
          s"index maintenance must cover exactly the delta (got $m)")
        // committed cluster assignments bound the pair generation:
        // new v × same-cluster members (old and new), never corpus²
        val cells = Manifest.readTable(s, root, s"sd_cells")
          .withColumnRenamed("cell", "cluster")
        val corpus = Manifest.readTable(s, root, "embeddings")
        val withEmb = cells.join(corpus, "vec_id")
        val newSide = withEmb.filter(col("vec_id") > maxId)
          .select(col("cluster"), col("vec_id").as("v"),
            col("embedding").as("vb"))
        val anySide = withEmb.select(col("cluster"),
          col("vec_id").as("u"), col("embedding").as("ua"))
        val removed = anySide.join(newSide, "cluster")
          .filter(col("u") < col("v"))
          .filter(round(expr("cosine_sim(ua, vb)"), 4) >= 0.95)
          .select(col("v").as("vec_id")).distinct()
        val out = withEmb.filter(col("vec_id") > maxId)
          .join(removed.withColumn("rm", lit(1L)), Seq("vec_id"), "left")
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_new"),
            sum(coalesce(col("rm"), lit(0L))).as("n_removed"),
            sum(when(col("rm").isNull, 1L).otherwise(0L)).as("n_kept"))
          .orderBy("cluster").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(java.nio.file.Paths.get(root))
        out
      }),

    // ----- ANN maintenance through DELETEs (q337): the committed
    //       index survives merge-on-read erasure — a DV DELETE on the
    //       source MIRRORS as vec_id semi-join DV-deletes on the
    //       cells/codes tables, the cursor advancing in the SAME
    //       claim, and a following append still folds O(delta).
    //       O(touched) BY PROOF: after the DV lands, era-1's UNTOUCHED
    //       data files leave the DISK — a maintenance that rescanned
    //       the indexed era (or full-rebuilt) would throw. In-plan:
    //       the maintained probe ≡ recompute-from-scratch over the
    //       SURVIVING corpus (every candidate's score); re-drives
    //       quiesce at both steps. Oracle recomputes the full IVF-PQ
    //       over exactly the surviving rows — an undead candidate
    //       (mirror missed the delete) or a lost survivor shifts some
    //       query's top-3. -----
    Q("q337_ann_index_delete_mirror",
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings
              |  WHERE NOT (vec_id >= 8 AND vec_id < 13)
              |), c AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM e WHERE vec_id < 8),
              |asg AS (
              |  SELECT e.vec_id, c.c_id,
              |    round(list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[])
              |          / (e.nrm * c.c_nrm), 4) AS rcos
              |  FROM e CROSS JOIN c),
              |ranked AS (
              |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY rcos DESC, c_id) AS rn FROM asg),
              |cells AS (SELECT vec_id, c_id AS cell FROM ranked WHERE rn = 1),
              |probes AS (SELECT vec_id AS q_id, c_id AS cell FROM ranked WHERE rn <= 2 AND vec_id < 5),
              |cand AS (
              |  SELECT p.q_id, t.vec_id AS cand_id
              |  FROM probes p JOIN cells t ON t.cell = p.cell AND t.vec_id <> p.q_id),
              |sub AS (
              |  SELECT vec_id, m, (embedding::DOUBLE[])[m*16+1 : m*16+16] AS s
              |  FROM e, (VALUES (0),(1),(2),(3)) AS mm(m)),
              |pcent AS (SELECT vec_id AS pc, m, s AS cs FROM sub WHERE vec_id < 8),
              |enc AS (
              |  SELECT vec_id, m, pc FROM (
              |    SELECT sub.vec_id, sub.m, p.pc,
              |      row_number() OVER (PARTITION BY sub.vec_id, sub.m
              |        ORDER BY list_dot_product(sub.s, p.cs) DESC, p.pc) AS prn
              |    FROM sub JOIN pcent p ON p.m = sub.m) WHERE prn = 1),
              |dtab AS (
              |  SELECT q.vec_id AS q_id, p.m, p.pc,
              |    CAST(floor(list_dot_product(q.s, p.cs) * 10000 + 0.5) AS BIGINT) AS d_e4
              |  FROM sub q JOIN pcent p ON p.m = q.m WHERE q.vec_id < 5),
              |sc AS (
              |  SELECT cand.q_id, cand.cand_id,
              |    CAST(SUM(d.d_e4) AS BIGINT) AS score_e4
              |  FROM cand
              |  JOIN enc ON enc.vec_id = cand.cand_id
              |  JOIN dtab d ON d.q_id = cand.q_id AND d.m = enc.m AND d.pc = enc.pc
              |  GROUP BY cand.q_id, cand.cand_id)
              |SELECT q_id, cand_id, score_e4, CAST(rn AS INT) AS rn FROM (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY q_id ORDER BY score_e4 DESC, cand_id) AS rn FROM sc)
              |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin),
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val cutId = e.agg(max("vec_id")).head().getLong(0) / 2
        val slice = col("vec_id") >= 8L && col("vec_id") < 13L
        val root = java.nio.file.Files
          .createTempDirectory("graft-ann-delmirror").toString
        Manifest.commitAppendRanged(s, root, "embeddings",
          e.filter(col("vec_id") <= cutId), "vec_id", 4)
        val _ = buildAnnIndex(s, root, "embeddings", "ivfpq")
        // GDPR slice: a narrow vec_id range inside ONE era-1 file
        // (trainer rows 0..7 survive — the codebook stays meaningful)
        Manifest.commitDeleteVectors(s, root, "embeddings", slice)
        // O(touched) BY PROOF: era-1 files the DV did NOT touch leave
        // the disk — the mirror reads touched files + index tables only
        val vDel = Manifest.snapshotVersion(root)
        Manifest.manifestRows(s, root, vDel)
          .collect { case ("embeddings", f, st)
            if st == null || !st.contains("__dv") => f }
          .foreach(f => java.nio.file.Files.delete(
            java.nio.file.Paths.get(root, f)))
        val m1 = maintainAnnIndex(s, root, "ivfpq")
        require(m1.exists(_._1 == 0L),
          s"delete-mirror must index zero new vectors (got $m1)")
        // a following append still folds O(delta) — the indexed era
        // (partly gone from disk) is never re-read
        Manifest.commitAppend(s, root, "embeddings",
          e.filter(col("vec_id") > cutId).coalesce(2))
        val n2 = e.filter(col("vec_id") > cutId).count()
        val m2 = maintainAnnIndex(s, root, "ivfpq")
        require(m2.exists(_._1 == n2),
          s"post-mirror append must index exactly the delta (got $m2, want $n2)")
        require(maintainAnnIndex(s, root, "ivfpq").isEmpty,
          "re-driven maintenance must quiesce")
        // in-plan: the mirror-maintained index answers EXACTLY what a
        // recompute over the SURVIVING corpus answers. The probe frame
        // materializes ONCE — the proof's collect and the declared
        // output are the same rows, so re-running the whole
        // index-query join tree for the second consumer was a full
        // redundant pass (opt guide §1.2)
        val queries = e.filter(col("vec_id") < 5)
        val qdf = queryAnnIndex(s, root, "ivfpq", queries).localCheckpoint(true)
        val fromIdx = qdf.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val rebuilt = adcScores(s, e.filter(!slice)).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        require(fromIdx.nonEmpty && fromIdx == rebuilt,
          "mirror-maintained probe must equal the surviving-corpus recompute")
        val wTop = Window.partitionBy(col("q_id"))
          .orderBy(col("score_e4").desc, col("cand_id"))
        val out = qdf
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 3)
          .select(col("q_id"), col("cand_id"), col("score_e4"),
            col("rn").cast("int").as("rn"))
          .orderBy("q_id", "rn").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(java.nio.file.Paths.get(root))
        out
      })
  )

  // ------------------------------------------- committed ANN index (q328)

  private val annNSub = 4
  private val annSubDim = 16
  private val annNCoarse = 8

  private def annMarkerName(name: String): String = {
    require(name.matches("[A-Za-z0-9_]+"), s"unsafe index name: $name")
    s"_annidx_$name"
  }

  /** The codebook marker's text rendering — `src=`/`v=`/`fp=` header
    * lines, then one `C|id|f,f,...` line per coarse centroid and one
    * `P|m|pc|f,...` line per PQ sub-centroid. Floats round-trip
    * EXACTLY through Float.toString/toFloat, so a query against the
    * committed codebook scores bit-identically to one against the
    * trainer rows it was extracted from. `v` is the source version
    * the index covers — the maintenance cursor; `fp` fingerprints the
    * source's (file, stats) rows AT that version, so a caught-up
    * index can prove itself caught up even after VACUUM collected the
    * cursor version's claim (the post-retention steady state: most
    * maintenance polls find nothing pending and must not depend on
    * aged-out history to say so). */
  private def renderAnnMarker(srcTable: String, v: Long, fp: String,
                              coarse: Seq[(Long, Array[Float])],
                              pq: Seq[(Int, Long, Array[Float])]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(s"src=$srcTable\n").append(s"v=$v\n").append(s"fp=$fp\n")
    coarse.sortBy(_._1).foreach { case (id, a) =>
      sb.append(s"C|$id|${a.mkString(",")}\n") }
    pq.sortBy(t => (t._1, t._2)).foreach { case (m, pc, a) =>
      sb.append(s"P|$m|$pc|${a.mkString(",")}\n") }
    sb.toString.getBytes("UTF-8")
  }

  /** Order-independent fingerprint of a table's (file, stats) manifest
    * rows — SHA-256 over the sorted `file|stats` lines. */
  private def annRowsFp(rows: Set[(String, String)]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rows.toSeq.map { case (f, st) => s"$f|${String.valueOf(st)}" }.sorted
      .foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  private def parseAnnMarker(bytes: Array[Byte])
      : (String, Long, Option[String],
         Seq[(Long, Array[Float])], Seq[(Int, Long, Array[Float])]) = {
    val lines = new String(bytes, "UTF-8").split("\n").filter(_.nonEmpty)
    val src = lines.find(_.startsWith("src=")).getOrElse(
      throw new IllegalStateException("corrupt ann marker: no src")).substring(4)
    val v = lines.find(_.startsWith("v=")).getOrElse(
      throw new IllegalStateException("corrupt ann marker: no v")).substring(2).toLong
    val fp = lines.find(_.startsWith("fp=")).map(_.substring(3))
    val coarse = lines.filter(_.startsWith("C|")).toSeq.map { l =>
      val p = l.split("\\|")
      (p(1).toLong, p(2).split(",").map(_.toFloat))
    }
    val pq = lines.filter(_.startsWith("P|")).toSeq.map { l =>
      val p = l.split("\\|")
      (p(1).toInt, p(2).toLong, p(3).split(",").map(_.toFloat))
    }
    (src, v, fp, coarse, pq)
  }

  /** Shared encode stage of the committed index: coarse cell per
    * vector (argmax rounded cosine against the broadcast codebook,
    * the q62/q238 assignment verbatim) and one PQ code per (vector,
    * subspace) (argmax subvector dot, the q222 encoding verbatim).
    * Used by BUILD over the whole table and by MAINTAIN over an
    * append delta — same expressions, so an incrementally-indexed
    * vector scores identically to a rebuilt one. */
  private def encodeAnn(s: org.apache.spark.sql.SparkSession, e: DataFrame,
                        cents: DataFrame, pcent: DataFrame)
      : (DataFrame, DataFrame) = {
    graft.functions.GraftExtensions.register(s)
    val wAsg = Window.partitionBy(col("vec_id"))
      .orderBy(col("rcos").desc, col("c_id"))
    val cells = e.select("vec_id", "embedding").crossJoin(broadcast(cents))
      .withColumn("rcos", round(expr("cosine_sim(embedding, c_emb)"), 4))
      .withColumn("rn", row_number().over(wAsg))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cell"))
    val sub = e.select(col("vec_id"),
      posexplode(array((0 until annNSub).map(m =>
        slice(col("embedding"), m * annSubDim + 1, annSubDim)): _*))
        .as(Seq("m", "s")))
    val wEnc = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(expr("dot_product(s, cs)").desc, col("pc"))
    val codes = sub.join(broadcast(pcent), col("m") === col("cm"))
      .withColumn("prn", row_number().over(wEnc))
      .filter(col("prn") === 1)
      .select(col("vec_id"), col("m"), col("pc"))
    (cells, codes)
  }

  /** BUILD the ANN index as a COMMITTED artifact: IVF cell
    * assignments land as manifest table `<name>_cells`, PQ codes as
    * `<name>_codes`, and the codebooks (coarse + PQ centroids,
    * extracted from the trainer rows — the fixture's vec_id < 8; at
    * corpus scale the q288 k-means trainer supplies them) as the
    * `_annidx_<name>` claim-sidecar marker — ALL in ONE atomic claim,
    * so no reader can ever see cells without codes or either without
    * the codebook that decodes them. The marker records the source
    * version the index covers; [[maintainAnnIndex]] advances it
    * O(delta). Refuses an existing name at claim time. */
  def buildAnnIndex(s: org.apache.spark.sql.SparkSession, root: String,
                    srcTable: String, name: String): Long = {
    graft.functions.GraftExtensions.register(s)
    import s.implicits._
    val v = Manifest.snapshotVersion(root)
    val e = Manifest.readTable(s, root, srcTable, v)
      .select("vec_id", "embedding")
    val coarse = e.filter(col("vec_id") < annNCoarse).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq.sortBy(_._1)
    require(coarse.size == annNCoarse,
      s"buildAnnIndex: expected $annNCoarse trainer rows, got ${coarse.size}")
    val pq = for {
      (id, a) <- coarse
      m <- 0 until annNSub
    } yield (m, id, a.slice(m * annSubDim, (m + 1) * annSubDim))
    val (cells, codes) = encodeAnn(s, e,
      coarse.toDF("c_id", "c_emb"), pq.toDF("cm", "pc", "cs"))
    val fp = annRowsFp(Manifest.manifestRows(s, root, v)
      .collect { case (t, f, st) if t == srcTable => (f, st) }.toSet)
    Manifest.commitAppendMulti(s, root,
      Seq((s"${name}_cells", cells, Seq("vec_id")),
        (s"${name}_codes", codes, Seq("vec_id"))),
      maxRetries = 5, txn = None,
      extras = Seq(annMarkerName(name) ->
        renderAnnMarker(srcTable, v, fp, coarse, pq)),
      validate = _ => require(
        Manifest.claimMarker(root, annMarkerName(name)).isEmpty,
        s"ann index $name already exists"))
  }

  /** MAINTAIN the committed index O(delta) on append AND through
    * merge-on-read DELETEs/UPDATEs: the marker's cursor bounds the
    * unindexed interval. A pure-append interval reads EXACTLY the
    * files it added ([[Manifest.tableChanges]]) and appends their
    * codes. An interval with DV drift (GDPR erasure, in-place dedup,
    * DV UPDATE) MIRRORS it: the row-level change feed — O(matched
    * rows), touched files only — yields the doomed `vec_id`s, which
    * DV-delete from `<name>_cells`/`<name>_codes` by semi-join (the
    * [[Manifest.commitDeleteKeys]] shape), while the interval's
    * surviving post-image rows encode against the COMMITTED codebook
    * (never re-trained — codes stay comparable across eras); new
    * codes, index DVs, and the advanced cursor land in ONE claim.
    * Only a COPY-ON-WRITE rewrite (compaction, CoW DELETE/MERGE)
    * still refuses toward a rebuild — there the old files leave the
    * manifest and compressed codes genuinely cannot be subtracted.
    * Claim-time cursor validation makes a racing maintainer fail
    * loudly (never double-indexes); a nothing-pending interval is a
    * PURE no-op. Returns (vectors newly indexed, version), None when
    * caught up. */
  def maintainAnnIndex(s: org.apache.spark.sql.SparkSession, root: String,
                       name: String): Option[(Long, Long)] = {
    import s.implicits._
    val bytes = Manifest.claimMarker(root, annMarkerName(name)).getOrElse(
      throw new IllegalArgumentException(s"unknown ann index $name"))
    val (srcTable, fromV, markerFp, coarse, pq) = parseAnnMarker(bytes)
    val cur = Manifest.snapshotVersion(root)
    if (cur <= fromV) return None
    // metadata-only pending check FIRST: an interval whose commits
    // touched other tables only must quiesce without planning the
    // source at all — tableChanges' empty-delta branch plans the FULL
    // file list for schema preservation, and the indexed era's files
    // need not even exist anymore (the q317/q328 proof device)
    val afterRows = Manifest.manifestRows(s, root, cur)
      .collect { case (t, f, st) if t == srcTable => (f, st) }.toSet
    val afterFp = annRowsFp(afterRows)
    // fingerprint compare FIRST: it proves caught-up without reading
    // the cursor version's claim — which VACUUM may have collected
    // (registrations outlive retention; their cursors must too)
    if (markerFp.contains(afterFp)) return None
    val beforeRows =
      try Manifest.manifestRows(s, root, fromV)
        .collect { case (t, f, st) if t == srcTable => (f, st) }.toSet
      catch {
        case e: Exception if markerFp.isDefined =>
          // drifted source AND the cursor claim aged out of retention:
          // the interval is no longer diffable — refuse toward rebuild
          throw new IllegalArgumentException(
            s"ann index $name: source $srcTable changed but v$fromV was " +
              s"vacuumed — the interval cannot be diffed; rebuild the index",
            e)
      }
    if (beforeRows == afterRows) return None
    // classification is by FILE PATHS: a DV step re-adds the same path
    // with a grown `__dv` entry (mirrorable), a CoW rewrite removes
    // paths (refuse — the codes of relocated rows cannot be subtracted)
    require(beforeRows.map(_._1).subsetOf(afterRows.map(_._1)),
      s"ann index $name: ($fromV, $cur] contains a rewrite of $srcTable " +
        "— compressed codes cannot be subtracted; rebuild the index")
    val cursorGuard: Long => Unit = _ => {
      val now = Manifest.claimMarker(root, annMarkerName(name))
        .map(parseAnnMarker)
      if (!now.exists(_._2 == fromV))
        throw new IllegalStateException(
          s"ann index $name advanced concurrently (cursor " +
            s"${now.map(_._2).getOrElse(-1L)}, this maintenance read " +
            s"from $fromV) — re-drive")
    }
    val marker = Seq(annMarkerName(name) ->
      renderAnnMarker(srcTable, cur, afterFp, coarse, pq))
    if (beforeRows.subsetOf(afterRows)) {
      // pure append: the fast path — encode exactly the added files
      val (delta, pure) = Manifest.tableChanges(s, root, srcTable, fromV, cur)
      require(pure, s"ann index $name: interval drifted during maintenance")
      val newE = delta.select("vec_id", "embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = newE.count()
        if (n == 0L) return None // interval touched other tables only
        val (cells, codes) = encodeAnn(s, newE,
          coarse.toDF("c_id", "c_emb"), pq.toDF("cm", "pc", "cs"))
        val v = Manifest.commitAppendMulti(s, root,
          Seq((s"${name}_cells", cells, Seq("vec_id")),
            (s"${name}_codes", codes, Seq("vec_id"))),
          maxRetries = 5, txn = None, extras = marker,
          validate = cursorGuard)
        Some((n, v))
      } finally newE.unpersist()
    } else {
      // DV-drift interval: mirror it. The feed prices the DV steps
      // O(matched rows) reading TOUCHED files only; per vec_id the
      // newest event wins, an insert beating a same-version delete
      // (an UPDATE's post-image outlives its pre-image)
      val feed = Manifest.readChangeFeed(s, root, srcTable, fromV, cur)
        .select(col("vec_id"), col("embedding"),
          col("_change_type"), col("_commit_version"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var presentRef: Option[DataFrame] = None
      try {
        val dels = feed.filter(col("_change_type") === "delete")
          .select("vec_id").distinct()
        val wFin = Window.partitionBy(col("vec_id")).orderBy(
          col("_commit_version").desc,
          when(col("_change_type") === "insert", 1).otherwise(0).desc)
        val present = feed.withColumn("rn", row_number().over(wFin))
          .filter(col("rn") === 1 && col("_change_type") === "insert")
          .select("vec_id", "embedding")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        presentRef = Some(present)
        val nNew = present.count()
        // any vec_id with a delete event sheds its committed index
        // rows — a semi-join DV on both index tables (doomed keys stay
        // distributed; never-indexed keys match nothing). A re-insert
        // (UPDATE / resurrect) lands again via `present` in this claim.
        def expect(t: String) = Manifest.manifestRows(s, root, cur)
          .collect { case (`t`, f, _) => f }.toSet
        val tables = Seq(s"${name}_cells", s"${name}_codes")
        val expected = tables.map(t => t -> expect(t)).toMap
        val mirrored = tables.flatMap(t =>
          Manifest.dvRowsForKeys(s, root, t, dels, Seq("vec_id"), cur))
        val dvAdds = mirrored.flatMap(_._1)
        val dvRemoves = mirrored.flatMap(_._2)
        if (nNew == 0L && dvAdds.isEmpty) return None
        val batches =
          if (nNew == 0L) Nil
          else {
            val (cells, codes) = encodeAnn(s, present,
              coarse.toDF("c_id", "c_emb"), pq.toDF("cm", "pc", "cs"))
            Seq((s"${name}_cells", cells, Seq("vec_id")),
              (s"${name}_codes", codes, Seq("vec_id")))
          }
        val v = Manifest.commitAppendMulti(s, root, batches,
          maxRetries = 5, txn = None, extras = marker,
          validate = base => {
            cursorGuard(base)
            // the DV rows were rendered at `cur`: a concurrent write
            // to the index tables themselves (compaction, manual DML)
            // would make them stale — fail loudly, re-drive
            tables.foreach { t =>
              val now = Manifest.manifestRows(s, root, base)
                .collect { case (`t`, f, _) => f }.toSet
              if (now != expected(t))
                throw new IllegalStateException(
                  s"ann index $name: $t changed under the delete-mirror " +
                    "— re-drive")
            }
          },
          adds = dvAdds, removes = dvRemoves)
        Some((nNew, v))
      } finally {
        presentRef.foreach(_.unpersist())
        feed.unpersist()
      }
    }
  }

  /** QUERY the committed index: probes come from the marker's
    * codebook (queries × broadcast centroids — the corpus is never
    * read), candidates from the committed `<name>_cells` table,
    * scores from the committed `<name>_codes` table against the
    * per-query broadcast distance table — the [[adcScores]] plan
    * with every per-call rebuild replaced by a committed-table read.
    * Returns (q_id, cand_id, score_e4), identical to the rebuild's
    * by construction (same expressions, float-exact codebook
    * round-trip — q328 asserts it in-plan). */
  def queryAnnIndex(s: org.apache.spark.sql.SparkSession, root: String,
                    name: String, queries: DataFrame): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    import s.implicits._
    val bytes = Manifest.claimMarker(root, annMarkerName(name)).getOrElse(
      throw new IllegalArgumentException(s"unknown ann index $name"))
    val (_, _, _, coarse, pq) = parseAnnMarker(bytes)
    val cents = coarse.toDF("c_id", "c_emb")
    val pcent = pq.toDF("cm", "pc", "cs")
    val cells = Manifest.readTable(s, root, s"${name}_cells")
    val codes = Manifest.readTable(s, root, s"${name}_codes")
    val wQ = Window.partitionBy(col("vec_id"))
      .orderBy(col("rcos").desc, col("c_id"))
    val probes = queries.select("vec_id", "embedding").crossJoin(broadcast(cents))
      .withColumn("rcos", round(expr("cosine_sim(embedding, c_emb)"), 4))
      .withColumn("rn", row_number().over(wQ))
      .filter(col("rn") <= 2)
      .select(col("vec_id").as("q_id"), col("c_id").as("cell"))
    val cand = broadcast(probes).join(cells, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"))
    val qsub = queries.select(col("vec_id"),
      posexplode(array((0 until annNSub).map(m =>
        slice(col("embedding"), m * annSubDim + 1, annSubDim)): _*))
        .as(Seq("m", "s")))
    val dtab = qsub.join(broadcast(pcent), col("m") === col("cm"))
      .select(col("vec_id").as("q_id"), col("m"), col("pc"),
        floor(expr("dot_product(s, cs)") * 10000.0 + 0.5).as("d_e4"))
    cand.join(codes.withColumnRenamed("vec_id", "cand_id"), Seq("cand_id"))
      .join(broadcast(dtab), Seq("q_id", "m", "pc"))
      .groupBy("q_id", "cand_id")
      .agg(sum("d_e4").as("score_e4"))
  }

  /** Shared IVF-coarse + PQ-ADC scoring stage (q238 / q274 / q286):
    * candidates come from the ≤2 probed cells only (the corpus never
    * self-joins), each scored by the broadcast distance-table lookup
    * with order-independent e4 sums — returns (q_id, cand_id,
    * score_e4). */
  private def adcScores(s: org.apache.spark.sql.SparkSession,
                        e: DataFrame): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    // coarse IVF cells + probes (the q62 stage, verbatim)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val asg = e.select("vec_id", "embedding").crossJoin(broadcast(cents))
      .withColumn("rcos", round(expr("cosine_sim(embedding, c_emb)"), 4))
    val wAsg = Window.partitionBy(col("vec_id"))
      .orderBy(col("rcos").desc, col("c_id"))
    val ranked = asg.withColumn("rn", row_number().over(wAsg))
      .select("vec_id", "c_id", "rn").cache()
    ranked.count() // eager: cells + probes both scan it
    val cells = ranked.filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cell"))
    val probes = ranked.filter(col("rn") <= 2 && col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("c_id").as("cell"))
    val cand = broadcast(probes).join(cells, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"))
    // PQ codes + per-query tables (the q222 stage)
    val sub = e.select(col("vec_id"),
      posexplode(array((0 until 4).map(m =>
        slice(col("embedding"), m * 16 + 1, 16)): _*)).as(Seq("m", "s")))
    val pcent = sub.filter(col("vec_id") < 8)
      .select(col("vec_id").as("pc"), col("m").as("cm"), col("s").as("cs"))
    val wEnc = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(expr("dot_product(s, cs)").desc, col("pc"))
    val codes = sub.join(broadcast(pcent), col("m") === col("cm"))
      .withColumn("prn", row_number().over(wEnc))
      .filter(col("prn") === 1)
      .select(col("vec_id").as("cand_id"), col("m"), col("pc"))
    val dtab = sub.filter(col("vec_id") < 5)
      .join(broadcast(pcent), col("m") === col("cm"))
      .select(col("vec_id").as("q_id"), col("m"), col("pc"),
        floor(expr("dot_product(s, cs)") * 10000.0 + 0.5).as("d_e4"))
    // ADC over the cell-bounded candidates only
    cand.join(codes, Seq("cand_id"))
      .join(broadcast(dtab), Seq("q_id", "m", "pc"))
      .groupBy("q_id", "cand_id")
      .agg(sum("d_e4").as("score_e4"))
  }

  /** EXACT cosine re-rank of an ANN shortlist (q274 / q286): a
    * broadcast of O(queries × shortlist) pairs keyed against the
    * corpus — never a corpus self-join. Returns the shortlist with
    * `cos_exact` and the per-query exact rank `rn ≤ k`. */
  private def refineExact(s: org.apache.spark.sql.SparkSession, e: DataFrame,
                          shortlist: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    val qEmb = e.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val cEmb = e.select(col("vec_id").as("cand_id"),
      col("embedding").as("c_emb2"))
    val wRef = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_exact").desc, col("cand_id"))
    broadcast(shortlist)
      .join(qEmb, Seq("q_id")).join(cEmb, Seq("cand_id"))
      .withColumn("cos_exact", round(expr("cosine_sim(q_emb, c_emb2)"), 4))
      .withColumn("rn", row_number().over(wRef))
      .filter(col("rn") <= k)
  }
}
