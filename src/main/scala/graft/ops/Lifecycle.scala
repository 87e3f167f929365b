package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Table-lifecycle operators: targeted erasure (GDPR / right-to-be-
  * forgotten) — the PII operation every 100-TB user-data table must
  * support on a deadline.
  *
  * The scale design is in the LAYOUT, not the delete: a PII table is
  * partitioned by a subject-id bucket (`u_bucket = user_id % 16`), so
  * an erasure request for K subjects touches at most K of the bucket
  * partitions. The delete is then copy-on-write over exactly those
  * partitions:
  *
  *  - **plan**: affected buckets = `subjects.map(_ % nBuckets)` — pure
  *    arithmetic, zero I/O (contrast a date-partitioned layout, where
  *    finding a user's rows scans every partition's history);
  *  - **untouched partitions**: file-level copy — at production scale a
  *    rename/manifest commit, never a data pass;
  *  - **affected partitions**: partition-pruned scan + broadcast
  *    anti-join against the subject list, rewritten via the same
  *    staged-write-then-atomic-publish commit as [[Compaction]];
  *  - **audit**: the erasure evidence regulators ask for — per-bucket
  *    rows before/deleted/after, where `rows_after` is MEASURED from
  *    the post-delete table (a subtraction would hide a rewrite bug;
  *    the oracle recomputing from the source catches any drift).
  *
  * At 100 TB with 4096 buckets, a single-subject erasure rewrites
  * 1/4096th of the table — bounded, partition-parallel, and
  * independent of history depth.
  */
object Lifecycle {

  val nBuckets = 16

  /** The data subjects of q182's erasure request (buckets 5, 6, 7). */
  val subjects: Seq[Long] = Seq(5L, 22L, 55L)

  /** Affected bucket partitions — arithmetic on the request, no scan. */
  def affectedBuckets: Seq[Long] =
    subjects.map(u => ((u % nBuckets) + nBuckets) % nBuckets).distinct.sorted

  /** The PII layout: events bucket-partitioned by subject id, staged
    * once per fixture version (atomic publish, fingerprint-keyed). */
  def bucketLayout(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-gdpr/src_$fp") { tmp =>
      Tables.load(s, dir, "events")
        .withColumn("u_bucket", pmod(col("user_id"), lit(nBuckets.toLong)))
        .write.partitionBy("u_bucket").mode("overwrite").parquet(s"$tmp/events")
    } + "/events"
  }

  private def copyTree(src: Path, tgt: Path): Unit = {
    val walk = Files.walk(src)
    try walk.iterator().asScala.foreach { p =>
      val dest = tgt.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(dest)
      else Files.copy(p, dest, StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
  }

  /** Copy-on-write DELETE WHERE user_id IN subjects, from the bucketed
    * layout at `src` into `tgt`. */
  def gdprDelete(s: SparkSession, src: String, tgt: String): Unit = {
    Files.createDirectories(Paths.get(tgt))
    val listing = Files.list(Paths.get(src))
    val partDirs =
      try listing.iterator().asScala.toList
        .filter(_.getFileName.toString.startsWith("u_bucket="))
      finally listing.close()
    partDirs.foreach { p =>
      val b = p.getFileName.toString.stripPrefix("u_bucket=").toLong
      if (!affectedBuckets.contains(b))
        copyTree(p, Paths.get(tgt).resolve(p.getFileName.toString))
    }
    val subjDf = s.createDataset(subjects)(Encoders.scalaLong).toDF("user_id")
    s.read.parquet(src)
      .filter(col("u_bucket").isin(affectedBuckets: _*)) // partition-pruned scan
      .join(broadcast(subjDf), Seq("user_id"), "left_anti")
      .write.partitionBy("u_bucket").mode("append").parquet(tgt)
  }

  /** Run the erasure once per fixture version and persist the measured
    * audit beside the table (underscore dir — invisible to table
    * scans). Returns the published dir holding `events` + `_audit`. */
  def deletedLayout(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-gdpr/del_$fp") { tmp =>
      gdprDelete(s, bucketLayout(s, dir), s"$tmp/events")
      val before = s.read.parquet(bucketLayout(s, dir))
        .groupBy("u_bucket").agg(count(lit(1)).as("rows_before"))
      val after = s.read.parquet(s"$tmp/events")
        .groupBy("u_bucket").agg(count(lit(1)).as("rows_after"))
      before.join(after, Seq("u_bucket"), "left")
        .select(col("u_bucket").cast("long").as("u_bucket"),
          col("rows_before"),
          (col("rows_before") - coalesce(col("rows_after"), lit(0L))).as("rows_deleted"),
          coalesce(col("rows_after"), lit(0L)).as("rows_after"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/_audit")
    }
  }

  /** q184's fixture plan: (logical date, was-COPY'd) for the four staged
    * files, and the retention cutoff — hashed into the stage path below
    * so editing the plan re-keys the layout. */
  private val removeStagePlan: Seq[(java.time.LocalDate, Boolean)] = Seq(
    (java.time.LocalDate.of(2022, 7, 12), false),
    (java.time.LocalDate.of(2022, 7, 13), true),
    (java.time.LocalDate.of(2022, 7, 14), true),
    (java.time.LocalDate.of(2022, 7, 15), true))
  private val removeCutoff: java.time.LocalDate =
    java.time.LocalDate.of(2022, 7, 15)

  /** q184's scratch stage — content keyed by a hash of (file contents ×
    * plan × cutoff); REMOVE applied during the one-time build so the
    * published dir IS the post-remove state. Initialized before
    * [[queries]]: the oracle SQL interpolates it. */
  val removeStageDir: String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft-remove-" + Staging.contentKey(
        (removeStagePlan.zipWithIndex.map { case ((ds, loaded), i) =>
          s"$ds|$loaded|" + Ingest.stageCsvContent(ds, i * 100)
        } :+ s"cutoff=$removeCutoff"): _*)).toString

  val queries: Seq[Q] = Seq(

    // ----- GDPR erasure with measured audit: the oracle recomputes the
    //       full per-bucket before/deleted/after account from the
    //       SOURCE table, while the returned audit's rows_after was
    //       counted from the post-delete files — any rewrite bug
    //       (lost rows, surviving subjects, clobbered partitions)
    //       breaks the hash. -----
    Q("q182_gdpr_delete",
      Some("""SELECT CAST(user_id % 16 AS BIGINT) AS u_bucket,
             |  CAST(count(*) AS BIGINT) AS rows_before,
             |  CAST(count(CASE WHEN user_id IN (5, 22, 55) THEN 1 END) AS BIGINT)
             |    AS rows_deleted,
             |  CAST(count(*) - count(CASE WHEN user_id IN (5, 22, 55) THEN 1 END)
             |    AS BIGINT) AS rows_after
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val del = deletedLayout(s, dir)
        s.read.parquet(s"$del/_audit").orderBy("u_bucket")
      }),

    // ----- Stage hygiene: REMOVE @stage with a retention policy.
    //       Differential by construction: the ORACLE applies the
    //       retention RULE to the pre-state manifest (remove only files
    //       both recorded-loaded AND older than the cutoff), while the
    //       RETURNED relation re-parses whatever ACTUALLY survived on
    //       disk — if the remove deletes a protected file (never-loaded
    //       data is unrecoverable!) or keeps an eligible one, plan and
    //       reality diverge and the hash breaks. -----
    Q("q184_stage_remove",
      Some(s"""SELECT file_name, n_rows
             |FROM read_parquet('$removeStageDir/_manifest.parquet/*.parquet')
             |WHERE NOT (loaded AND file_date < DATE '2022-07-15')
             |ORDER BY file_name""".stripMargin),
      (s, _) => {
        val stage = ensureRemovedStage(s)
        s.read.format("csv").options(Ingest.csvOptions)
          .schema(org.apache.spark.sql.types.StructType(
            Ingest.transSchema.fields.map(f =>
              org.apache.spark.sql.types.StructField(f.name,
                org.apache.spark.sql.types.StringType))))
          .load(s"$stage/*.csv")
          .groupBy(col("_metadata.file_name").as("file_name"))
          .agg(count(lit(1)).as("n_rows"))
          .orderBy("file_name")
      })
  )

  /** REMOVE @stage: delete files that are recorded-loaded AND whose
    * filename-embedded date is before `cutoff`. Never touches files
    * absent from `loaded` — a staged file that was never COPY'd is the
    * only copy of its data. Listing+delete is driver-side metadata
    * work, O(|stage files|), exactly like the production object-store
    * call. */
  def stageRemove(stageDir: String, loaded: Set[String],
                  cutoff: java.time.LocalDate): Unit = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("MMddyyyy")
    val listing = Files.list(Paths.get(stageDir))
    val files =
      try listing.iterator().asScala.toList
        .filter(_.getFileName.toString.endsWith(".csv"))
      finally listing.close()
    files.foreach { p =>
      val name = p.getFileName.toString
      val date = java.time.LocalDate.parse(
        name.stripPrefix("product_order_trans_").stripSuffix(".csv"), fmt)
      if (loaded.contains(name) && date.isBefore(cutoff))
        Files.delete(p)
    }
  }

  /** Build the q184 stage once: three loaded backfill files (07-13/14/15),
    * one never-loaded straggler (07-12 — old enough to be eligible but
    * protected), a manifest of the PRE-state, then the REMOVE. */
  def ensureRemovedStage(s: SparkSession): String =
    Staging.ensure(removeStageDir) { tmp =>
      import java.nio.charset.StandardCharsets
      val rows = removeStagePlan.zipWithIndex.map { case ((ds, loaded), i) =>
        val name = Ingest.stagedFileName(ds)
        val content = Ingest.stageCsvContent(ds, i * 100)
        Files.write(Paths.get(tmp).resolve(name),
          content.getBytes(StandardCharsets.UTF_8))
        (name, java.sql.Date.valueOf(ds), loaded,
          content.linesIterator.size - 1L) // minus header
      }
      import s.implicits._
      rows.toDF("file_name", "file_date", "loaded", "n_rows")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$tmp/_manifest.parquet")
      stageRemove(tmp,
        loaded = rows.collect { case (n, _, true, _) => n }.toSet,
        cutoff = removeCutoff)
    }
}
