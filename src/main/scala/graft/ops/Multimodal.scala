package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.9): media as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * distributed batches.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[fakeDecodeFeatures]] — a byte
  * histogram standing in for "run the decoder on this buffer"). What
  * is real and tested: the schema (binary payload + metadata struct),
  * the partition-preserving `mapPartitions` batch shape (exactly how a
  * JNI/FFI decoder is driven: one decoder init per partition, then a
  * streamed iterator of buffers — never one init per row), and the
  * resize / frame-sample plumbing on the extracted features.
  *
  * At 100 TB: payloads stay opaque bytes end-to-end (no shuffle ever
  * moves decoded frames), decode is map-side only, and metadata columns
  * let planners prune (e.g. filter on `meta.byte_len` pushes down
  * before any decode happens).
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class Media(doc_id: Long, payload: Array[Byte], format: String, byte_len: Long)

  /** Ingest a directory of raw media files via Spark's `binaryFile`
    * source — the at-scale path for image/audio corpora: one row per
    * file with (path, modificationTime, length, content), content an
    * opaque binary column, partitions sized by
    * `spark.sql.files.maxPartitionBytes` so huge dirs split across
    * executors without any driver-side listing loop. `glob` prunes at
    * FILE LISTING time (e.g. "*.jpg"), before any byte is read. */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** [[readBinaryDir]] rows → typed [[Media]] (doc id from the file
    * name's digits, format from its extension). */
  def mediaFromFiles(files: DataFrame): Dataset[Media] = {
    import files.sparkSession.implicits._
    files.select(
      regexp_extract(col("path"), "(\\d+)\\.[^.]+$", 1).cast("long").as("doc_id"),
      col("content").as("payload"),
      regexp_extract(col("path"), "\\.([^.]+)$", 1).as("format"),
      col("length").as("byte_len")).as[Media]
  }

  /** Attach a deterministic binary payload to each document (UTF-8
    * bytes of the text — the fixture's stand-in for image bytes) and a
    * typed metadata struct. */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("utf8-text").as("format"),
      length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"))

  /** STUB decoder: a real build links an image/audio codec here; the
    * container has none, so features are a deterministic 16-bin byte
    * histogram (normalized). The mapPartitions batch shape — per-
    * partition "decoder" setup, streamed rows — is the real contract. */
  def fakeDecodeFeatures(media: Dataset[Media]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (JNI handle, model, …)
      rows.map { m =>
        val hist = new Array[Float](16)
        m.payload.foreach(b => hist((b & 0xFF) % 16) += 1f)
        val n = math.max(m.payload.length, 1).toFloat
        (m.doc_id, hist.map(_ / n))
      }
    }.toDF("doc_id", "features")
  }

  /** Resize a feature vector: truncate or zero-pad to `size`. */
  def resizeFeatures(df: DataFrame, size: Int): DataFrame =
    df.withColumn("features",
      expr(s"transform(sequence(1, $size), i -> coalesce(try_element_at(features, i), 0.0F))"))

  /** Frame-sample: view the payload as fixed-size frames, keep every
    * `step`-th frame (video keyframe sampling shape). */
  def frameSample(df: DataFrame, frameBytes: Int, step: Int): DataFrame =
    // Spark's sequence() is bidirectional — sequence(1, 0) yields [1, 0],
    // which would fabricate two frames for an empty payload. Materialize an
    // explicitly-empty index array when n_frames = 0.
    df.withColumn("n_frames", ceil(col("byte_len") / lit(frameBytes.toDouble)).cast("long"))
      .withColumn("frame_idx", expr(
        "CASE WHEN n_frames > 0 THEN sequence(1, cast(n_frames as int)) " +
          "ELSE cast(array() as array<int>) END"))
      .withColumn("frames",
        expr(s"transform(frame_idx, i -> substring(payload, (i-1)*$frameBytes + 1, $frameBytes))"))
      .withColumn("sampled_frames",
        expr(s"filter(frames, (x, i) -> i % $step = 0)"))
      .drop("frames", "frame_idx")

  val queries: Seq[Q] = Seq(

    // ----- binary plumbing, oracle-checkable metadata: payload byte
    //       length must equal n_chars (ASCII fixture), frame count from
    //       byte_len. -----
    Q("q55_multimodal_meta",
      Some("""SELECT doc_id, CAST(n_chars AS BIGINT) AS byte_len, 'utf8-text' AS format,
             |  CAST(ceil(n_chars / 64.0) AS BIGINT) AS n_frames
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        frameSample(attachBinary(Tables.load(s, dir, "documents")), 64, 4)
          .select(col("doc_id"), col("byte_len"), col("format"), col("n_frames"))
          .orderBy("doc_id")),

    // ----- decode → features → resize, oracle-checked through exact
    //       integer bin counts: feature b is count(bytes ≡ b mod 16)/n
    //       as float32, so feature*n rounds back to the exact count
    //       (float eps ≪ 0.5); the fixture text is ASCII, so DuckDB's
    //       per-char codepoints ARE the payload bytes. -----
    Q("q56_multimodal_features",
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(range(1, len(text)+1), i -> ascii(text[i]) % 16 = 1)) AS INT) AS bin1_count,
             |  CAST(len(list_filter(range(1, len(text)+1), i -> ascii(text[i]) % 16 = 2)) AS INT) AS bin2_count,
             |  CAST(8 AS INT) AS n_features
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val media = attachBinary(Tables.load(s, dir, "documents")).as[Media]
        resizeFeatures(fakeDecodeFeatures(media), 8)
          .join(Tables.load(s, dir, "documents").select("doc_id", "n_chars"), "doc_id")
          .select(col("doc_id"),
            round(expr("features[1] * n_chars"), 0).cast("int").as("bin1_count"),
            round(expr("features[2] * n_chars"), 0).cast("int").as("bin2_count"),
            size(col("features")).as("n_features"))
          .orderBy("doc_id")
      }),

    // ----- exact media dedup (q279): the first pass of every
    //       multimodal pipeline — group by payload DIGEST, keep the
    //       min-id copy. The digest is computed map-side, so only
    //       (16-byte hash, id) ever shuffles — the payloads
    //       themselves never move, which is what makes exact image
    //       dedup tractable at 100 TB. Fixture injects known
    //       duplicates (doc_id % 7 re-keyed +100000) on top of the
    //       corpus's own exact-text dups; oracle groups by md5 of the
    //       same bytes. -----
    Q("q279_media_dedup",
      Some("""WITH base AS (SELECT doc_id, text FROM documents),
             |dup AS (SELECT doc_id + 100000 AS doc_id, text FROM base
             |        WHERE doc_id % 7 = 0),
             |m AS (SELECT * FROM base UNION ALL SELECT * FROM dup)
             |SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
             |  CAST(count(*) AS BIGINT) AS n_copies
             |FROM m GROUP BY md5(text) HAVING count(*) > 1
             |ORDER BY keep_id""".stripMargin),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
        val dups = docs.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 100000L)
        attachBinary(docs.union(dups))
          .groupBy(md5(col("payload")).as("h"))
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .filter(col("n_copies") > 1)
          .select("keep_id", "n_copies")
          .orderBy("keep_id")
      })
  )
}
