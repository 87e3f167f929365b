package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Snapshot-manifest commit — the minimal table-format commit log this
  * engine's own docs keep referencing: [[Compaction]]'s per-partition
  * rename swap is the strongest commit PLAIN directories offer, and
  * cross-partition / cross-TABLE atomicity is exactly what a manifest
  * pointer adds (the Delta/Iceberg primitive, reduced to its core).
  *
  * Protocol (all on rename-atomic storage):
  *  1. data files for EVERY table in the snapshot land under a fresh
  *     `data/v<N>/<table>/` prefix — invisible to readers, because
  *     readers never list directories;
  *  2. a manifest (one parquet of `(table, file)` rows) is written for
  *     the snapshot;
  *  3. the `_latest` pointer file is swapped with ONE atomic rename.
  *
  * Readers resolve pointer → manifest → explicit file list, so:
  *  - a crashed commit (data written, pointer never swapped) is
  *    invisible — readers keep serving the previous snapshot;
  *  - an orphan file from a failed writer sitting in the data prefix is
  *    invisible — it is in no manifest;
  *  - a multi-table snapshot is READ-consistent: both tables resolve
  *    through the same manifest version, never a mix;
  *  - old versions stay readable (time travel) until retention drops
  *    their manifests.
  *
  * At 100 TB the manifest is metadata-sized (file paths, not data), the
  * pointer swap is one rename regardless of table count, and reads are
  * explicit-path parquet scans — no directory listing on the hot path.
  * What production formats add beyond this core: compare-and-swap on
  * the pointer for concurrent writers (an object-store conditional
  * put), manifest compaction, and column stats per file.
  */
object Manifest {

  private def pointerPath(root: String): Path = Paths.get(root, "_latest")

  /** Currently-committed snapshot version, 0 if none. */
  def snapshotVersion(root: String): Long = {
    val p = pointerPath(root)
    if (Files.exists(p)) new String(Files.readAllBytes(p), "UTF-8").trim.toLong
    else 0L
  }

  /** Commit every (name → DataFrame) as ONE atomic snapshot; returns
    * the new version. */
  def commit(s: SparkSession, root: String, tables: Map[String, DataFrame]): Long = {
    val version = snapshotVersion(root) + 1
    Files.createDirectories(Paths.get(root))
    // manifest paths are ROOT-RELATIVE: the table must survive a move
    // of its root (staging publish, bucket migration, DR restore)
    val fileRows = tables.toSeq.sortBy(_._1).flatMap { case (name, df) =>
      val dataDir = Paths.get(root, "data", s"v$version", name)
      df.write.mode("overwrite").parquet(dataDir.toString)
      val listing = Files.list(dataDir)
      try listing.iterator().asScala.toList
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => (name, s"data/v$version/$name/${p.getFileName}"))
      finally listing.close()
    }
    import s.implicits._
    fileRows.toDF("table_name", "file")
      .coalesce(1).write.mode("overwrite")
      .parquet(Paths.get(root, "manifest", s"v$version").toString)
    val tmp = Files.createTempFile(Paths.get(root), "_latest.tmp-", "")
    Files.write(tmp, version.toString.getBytes("UTF-8"))
    Files.move(tmp, pointerPath(root),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    version
  }

  /** Optimistic-concurrency commit: the VERSION NUMBER is the
    * compare-and-swap. A committer stages its manifest into a tmp dir
    * and claims `manifest/v<N>` with an atomic NON-replacing rename —
    * if another writer claimed N first, the move throws, and the loser
    * re-reads the current version and retries against the new base.
    * No lost updates, no locks, and the pointer file is just a cache
    * of max(version) for readers. (Production object stores expose
    * the same primitive as a conditional put / if-none-match.)
    * Returns the version actually won. */
  def commitCas(s: SparkSession, root: String, tables: Map[String, DataFrame],
                maxRetries: Int = 5): Long = {
    // next version = 1 + max(claimed manifests, pointer): a claimer
    // that crashed before its pointer swap must not deadlock later
    // writers (its claimed number is simply skipped; readers never see
    // it because the pointer was never advanced, and vacuum collects it)
    def nextVersion: Long = {
      val mdir = Paths.get(root, "manifest")
      val claimed =
        if (!Files.isDirectory(mdir)) 0L
        else {
          val l = Files.list(mdir)
          try l.iterator().asScala
            .map(_.getFileName.toString)
            .collect { case n if n.startsWith("v") => n.drop(1).toLong }
            .foldLeft(0L)(math.max)
          finally l.close()
        }
      math.max(claimed, snapshotVersion(root)) + 1
    }
    var attempt = 0
    while (true) {
      val version = nextVersion
      Files.createDirectories(Paths.get(root))
      // data stages under a WRITER-UNIQUE prefix: two racers must never
      // interleave files in one directory — only the manifest claim
      // arbitrates, and readers follow explicit paths anyway
      val token = java.util.UUID.randomUUID().toString.take(8)
      val dataPrefix = s"v$version-$token"
      val fileRows = tables.toSeq.sortBy(_._1).flatMap { case (name, df) =>
        val dataDir = Paths.get(root, "data", dataPrefix, name)
        df.write.mode("overwrite").parquet(dataDir.toString)
        val listing = Files.list(dataDir)
        try listing.iterator().asScala.toList
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(p => (name, s"data/$dataPrefix/$name/${p.getFileName}"))
        finally listing.close()
      }
      import s.implicits._
      val manifestTmp = Files.createTempDirectory(
        Paths.get(root), s"manifest-v$version.tmp-")
      fileRows.toDF("table_name", "file")
        .coalesce(1).write.mode("overwrite")
        .parquet(manifestTmp.resolve("m").toString)
      val target = Paths.get(root, "manifest", s"v$version")
      Files.createDirectories(target.getParent)
      try {
        // the CAS: non-replacing atomic claim of this version number
        Files.move(manifestTmp.resolve("m"), target,
          StandardCopyOption.ATOMIC_MOVE)
        Staging.deleteRecursively(manifestTmp)
        val tmp = Files.createTempFile(Paths.get(root), "_latest.tmp-", "")
        Files.write(tmp, version.toString.getBytes("UTF-8"))
        Files.move(tmp, pointerPath(root),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        return version
      } catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException =>
          // lost the race: abandon this attempt's staging (its unique
          // prefix only — the winner's files are untouched), rebase, retry
          Staging.deleteRecursively(manifestTmp)
          Staging.deleteRecursively(Paths.get(root, "data", dataPrefix))
          attempt += 1
          if (attempt >= maxRetries)
            throw new IllegalStateException(
              s"commitCas: lost the version race $maxRetries times at $root")
      }
    }
    -1L // unreachable
  }

  /** Read `table` at `version` (default: the committed pointer) through
    * its manifest — explicit file paths, never a directory listing. */
  def readTable(s: SparkSession, root: String, table: String,
                version: Long = -1L): DataFrame = {
    val v = if (version > 0) version else snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    val files = s.read
      .parquet(Paths.get(root, "manifest", s"v$v").toString)
      .filter(col("table_name") === table)
      .select("file").collect().map(r => s"$root/${r.getString(0)}") // metadata-sized
    require(files.nonEmpty, s"table $table absent from snapshot v$v")
    s.read.parquet(files.toIndexedSeq: _*)
  }

  /** APPEND commit: a new snapshot whose manifest = the previous
    * version's rows (every table) + the new data files for `table`.
    * Nothing is rewritten — the append is data-write + metadata, which
    * is what makes daily ingest O(day) on a 100-TB table. Because
    * readers resolve explicit files, the new files may be GROUPED by a
    * different key than the old ones (month → week, say): partition-
    * layout evolution is a non-event under a manifest, where a
    * directory-scan engine would need a full rewrite or dual reads. */
  def commitAppend(s: SparkSession, root: String, table: String,
                   df: DataFrame): Long = {
    val version = snapshotVersion(root) + 1
    val dataDir = Paths.get(root, "data", s"v$version", table)
    df.write.mode("overwrite").parquet(dataDir.toString)
    val listing = Files.list(dataDir)
    val newRows =
      try listing.iterator().asScala.toList
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => (table, s"data/v$version/$table/${p.getFileName}"))
      finally listing.close()
    import s.implicits._
    val prev =
      if (version == 1) Seq.empty[(String, String)]
      else s.read.parquet(Paths.get(root, "manifest", s"v${version - 1}").toString)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    (prev ++ newRows).toDF("table_name", "file")
      .coalesce(1).write.mode("overwrite")
      .parquet(Paths.get(root, "manifest", s"v$version").toString)
    val tmp = Files.createTempFile(Paths.get(root), "_latest.tmp-", "")
    Files.write(tmp, version.toString.getBytes("UTF-8"))
    Files.move(tmp, pointerPath(root),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    version
  }

  /** RANGED append commit (q193): data files are range-partitioned and
    * sorted on `rangeCol`, and the manifest records each file's
    * [min, max] of that column — the per-file statistics every modern
    * table format keeps. One extra pass over the just-written files
    * computes the bounds here (production reads them back from the
    * parquet footers the write already produced — zero extra I/O; the
    * contract, not the collection mechanism, is what q193 certifies).
    * A range-partitioned write makes the per-file intervals nearly
    * disjoint, which is what gives stats their pruning power. */
  def commitAppendRanged(s: SparkSession, root: String, table: String,
                         df: DataFrame, rangeCol: String, nFiles: Int): Long = {
    val version = snapshotVersion(root) + 1
    val dataDir = Paths.get(root, "data", s"v$version", table)
    df.repartitionByRange(nFiles, col(rangeCol))
      .sortWithinPartitions(rangeCol)
      .write.mode("overwrite").parquet(dataDir.toString)
    val bounds = s.read.parquet(dataDir.toString)
      .groupBy(col("_metadata.file_name").as("fname"))
      .agg(min(col(rangeCol)).as("min_r"), max(col(rangeCol)).as("max_r"))
      .collect()
      .map(r => r.getString(0) -> (r.getTimestamp(1), r.getTimestamp(2))).toMap
    val newRows = bounds.toSeq.sortBy(_._1).map { case (fname, (lo, hi)) =>
      (table, s"data/v$version/$table/$fname", lo, hi)
    }
    import s.implicits._
    val prev =
      if (version == 1) Seq.empty[(String, String, java.sql.Timestamp, java.sql.Timestamp)]
      else s.read.parquet(Paths.get(root, "manifest", s"v${version - 1}").toString)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getTimestamp(2), r.getTimestamp(3))).toSeq
    (prev ++ newRows).toDF("table_name", "file", "min_r", "max_r")
      .coalesce(1).write.mode("overwrite")
      .parquet(Paths.get(root, "manifest", s"v$version").toString)
    val tmp = Files.createTempFile(Paths.get(root), "_latest.tmp-", "")
    Files.write(tmp, version.toString.getBytes("UTF-8"))
    Files.move(tmp, pointerPath(root),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    version
  }

  /** Stats-pruned read: keep only files whose [min_r, max_r] interval
    * OVERLAPS [lo, hi] — the manifest answers "which files can contain
    * matching rows" from metadata alone, before any data I/O. Returns
    * (pruned DataFrame, files read, files total); the caller still
    * applies the row-level predicate — file stats bound, they don't
    * filter. */
  def readTableRange(s: SparkSession, root: String, table: String,
                     lo: String, hi: String): (DataFrame, Int, Int) = {
    val v = snapshotVersion(root)
    val manifest = s.read
      .parquet(Paths.get(root, "manifest", s"v$v").toString)
      .filter(col("table_name") === table)
    val total = manifest.count().toInt
    val files = manifest
      .filter(col("max_r") >= lit(lo).cast("timestamp") &&
        col("min_r") <= lit(hi).cast("timestamp"))
      .select("file").collect().map(r => s"$root/${r.getString(0)}")
    (s.read.parquet(files.toIndexedSeq: _*), files.length, total)
  }

  /** q193's stats-pruned root: two ranged appends of 8 files each, so
    * a one-week predicate should touch a small fraction of the 16. */
  def statsRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-stats/$fp") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") < cutTs), "ts", 8)
      commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") >= cutTs), "ts", 8)
    }
  }

  /** Schema-enforced append (q197): the manifest layer is also the
    * SCHEMA REGISTRY — each version records the table's current schema,
    * and an append must match it: every existing column present with
    * its exact type, no new columns unless `allowEvolution` (then the
    * union schema becomes the new registered schema and old files
    * NULL-fill the added columns at read). This is write-side
    * enforcement — the q174 lesson ("pin the evolved schema in the
    * catalog, don't footer-merge per query") with the manifest as the
    * catalog: [[readTableEvolved]] reads with the REGISTERED schema,
    * so reads never pay a footer-merge and never depend on file order. */
  def commitAppendEvolve(s: SparkSession, root: String, table: String,
                         df: DataFrame, allowEvolution: Boolean = false): Long = {
    val current = registeredSchema(s, root, table)
    current.foreach { cur =>
      cur.fields.foreach { f =>
        val got = df.schema.fields.find(_.name == f.name).getOrElse(
          throw new IllegalArgumentException(
            s"schema enforcement: append to $table drops column ${f.name}"))
        if (got.dataType != f.dataType)
          throw new IllegalArgumentException(
            s"schema enforcement: column ${f.name} is ${got.dataType}, " +
              s"table has ${f.dataType}")
      }
      val added = df.schema.fieldNames.toSet -- cur.fieldNames.toSet
      if (added.nonEmpty && !allowEvolution)
        throw new IllegalArgumentException(
          s"schema enforcement: append adds ${added.mkString(",")} to $table " +
            "without allowEvolution")
    }
    val version = commitAppend(s, root, table, df)
    val evolved = current match {
      case Some(cur) =>
        org.apache.spark.sql.types.StructType(
          cur.fields ++ df.schema.fields.filterNot(f => cur.fieldNames.contains(f.name)))
      case None => df.schema
    }
    Files.write(Paths.get(root, "manifest", s"schema_v$version.json"),
      evolved.json.getBytes("UTF-8"))
    version
  }

  /** The schema registered at `version` (default current), if any. */
  def registeredSchema(s: SparkSession, root: String, table: String,
                       version: Long = -1L): Option[org.apache.spark.sql.types.StructType] = {
    val v = if (version > 0) version else snapshotVersion(root)
    val p = Paths.get(root, "manifest", s"schema_v$v.json")
    if (!Files.exists(p)) None
    else Some(org.apache.spark.sql.types.DataType
      .fromJson(new String(Files.readAllBytes(p), "UTF-8"))
      .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** Read an evolved table with its REGISTERED schema pinned: files
    * written before a column existed NULL-fill it — no per-query
    * footer merge, no file-order dependence. */
  def readTableEvolved(s: SparkSession, root: String, table: String): DataFrame = {
    val v = snapshotVersion(root)
    val schema = registeredSchema(s, root, table).getOrElse(
      throw new IllegalStateException(s"no registered schema for $table at v$v"))
    val files = s.read
      .parquet(Paths.get(root, "manifest", s"v$v").toString)
      .filter(col("table_name") === table)
      .select("file").collect().map(r => s"$root/${r.getString(0)}")
    s.read.schema(schema).parquet(files.toIndexedSeq: _*)
  }

  /** q197's evolving table: epoch 1 without `quality`, epoch 2 appended
    * WITH it under allowEvolution — staged once per fixture. */
  def evolvedSchemaRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-schema/$fp") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      commitAppendEvolve(s, tmp, "events_log", ev.filter(col("ts") < cutTs))
      commitAppendEvolve(s, tmp, "events_log",
        ev.filter(col("ts") >= cutTs)
          .withColumn("quality", col("value") * 2),
        allowEvolution = true)
    }
  }

  /** REPLACE commit: a new snapshot whose manifest carries every OTHER
    * table's rows forward and swaps `table`'s file set for the new
    * data — the commit primitive behind compaction and any full-table
    * rewrite. The old file set stays on disk (time travel) until
    * retention vacuums it. */
  def commitReplace(s: SparkSession, root: String, table: String,
                    df: DataFrame): Long = {
    val version = snapshotVersion(root) + 1
    val dataDir = Paths.get(root, "data", s"v$version", table)
    df.write.mode("overwrite").parquet(dataDir.toString)
    val listing = Files.list(dataDir)
    val newRows =
      try listing.iterator().asScala.toList
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => (table, s"data/v$version/$table/${p.getFileName}"))
      finally listing.close()
    import s.implicits._
    val carried =
      if (version == 1) Seq.empty[(String, String)]
      else s.read.parquet(Paths.get(root, "manifest", s"v${version - 1}").toString)
        .filter(col("table_name") =!= table)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    (carried ++ newRows).toDF("table_name", "file")
      .coalesce(1).write.mode("overwrite")
      .parquet(Paths.get(root, "manifest", s"v$version").toString)
    val tmp = Files.createTempFile(Paths.get(root), "_latest.tmp-", "")
    Files.write(tmp, version.toString.getBytes("UTF-8"))
    Files.move(tmp, pointerPath(root),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    version
  }

  /** OPTIMIZE through the commit log (q196): bin-pack `table`'s
    * current file set into `ceil(bytes / targetBytes)` files and
    * publish the rewrite as ONE replace-commit. Readers atomically
    * flip from many-small to few-large; the fragmented version remains
    * time-travelable until [[vacuum]]. Planning is metadata-only
    * (manifest rows + file sizes); the rewrite reads exactly the
    * table once — this is q177's bin-pack with the commit-log
    * atomicity its scaladoc deferred to table formats. */
  def compactTable(s: SparkSession, root: String, table: String,
                   targetBytes: Long): Long = {
    val v = snapshotVersion(root)
    val files = s.read
      .parquet(Paths.get(root, "manifest", s"v$v").toString)
      .filter(col("table_name") === table)
      .select("file").collect().map(_.getString(0))
    val bytes = files.map(f => Files.size(Paths.get(root, f))).sum
    val bins = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    commitReplace(s, root, table, readTable(s, root, table).repartition(bins))
  }

  /** q196's fragmented root: six 5-day append commits of 4 files each
    * (the auto-ingest accumulation shape), then one compaction commit. */
  def compactedRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-compact/$fp") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
        .withColumn("month", date_format(col("ts"), "yyyy-MM"))
      (0 until 6).foreach { w =>
        val lo = lit(s"2024-01-${"%02d".format(1 + w * 5)} 00:00:00").cast("timestamp")
        val hi = lit(s"2024-01-${"%02d".format(math.min(31, 6 + w * 5))} 00:00:00").cast("timestamp")
        val slice =
          if (w == 5) ev.filter(col("ts") >= lo) // tail takes the rest
          else ev.filter(col("ts") >= lo && col("ts") < hi)
        commitAppend(s, tmp, "events_log", slice.repartition(4))
      }
      val _ = compactTable(s, tmp, "events_log", 8L << 20)
    }
  }

  /** q189's evolving-layout root: v1 = pre-cut events with files
    * GROUPED BY MONTH, v2 = an append of the post-cut window grouped by
    * WEEK. Grouping keys live as ordinary columns in the files (a
    * manifest engine prunes from per-file metadata, not directory
    * names), so the two layouts coexist under one table. */
  def evolutionRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-evolve/$fp") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
        .withColumn("month", date_format(col("ts"), "yyyy-MM"))
        .withColumn("week", weekofyear(col("ts")))
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      commitAppend(s, tmp, "events_log",
        ev.filter(col("ts") < cutTs).repartition(col("month")))
      commitAppend(s, tmp, "events_log",
        ev.filter(col("ts") >= cutTs).repartition(col("week")))
    }
  }

  /** Shared two-version fixture builder (q187 + q195): v1 = pre-cut
    * summaries, v2 = full-window summaries, plus a planted ORPHAN data
    * file (a failed concurrent writer's leftovers) in the live prefix. */
  private def buildTwoVersionRoot(s: SparkSession, dir: String, tmp: String): Unit = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        col("value").cast("decimal(18,4)").as("value"), col("ts"))
    val cutTs = lit(Cdc.versionCut).cast("timestamp")
    def summaries(df: DataFrame) = Map(
      "user_totals" -> df.groupBy("user_id")
        .agg(sum("value").as("total_u"), count(lit(1)).as("n_u")),
      "type_totals" -> df.groupBy("event_type")
        .agg(sum("value").as("total_t"), count(lit(1)).as("n_t")))
    commit(s, tmp, summaries(ev.filter(col("ts") < cutTs)))
    commit(s, tmp, summaries(ev))
    ev.limit(7).groupBy("user_id").agg(sum("value").as("total_u"),
        count(lit(1)).as("n_u"))
      .write.mode("overwrite")
      .parquet(s"$tmp/data/v2/user_totals_orphan")
    val orphanSrc = Files.list(Paths.get(s"$tmp/data/v2/user_totals_orphan"))
    val part = try orphanSrc.iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
      finally orphanSrc.close()
    Files.move(part, Paths.get(s"$tmp/data/v2/user_totals")
      .resolve("part-99999-orphan.parquet"))
    Staging.deleteRecursively(Paths.get(s"$tmp/data/v2/user_totals_orphan"))
  }

  /** q187's two-table snapshot root, staged once per fixture version —
    * orphan left in place (readers must ignore it). */
  def snapshotRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest/$fp")(buildTwoVersionRoot(s, dir, _))
  }

  /** Reference-counted VACUUM: retain the newest `keep` manifests,
    * delete every expired manifest and every data file no retained
    * manifest references. Liveness comes from the manifests, not from
    * file age or directory position — so dead overwrite versions AND
    * orphans from failed writers are collected by the same rule, and a
    * file carried forward by an append commit stays safe no matter how
    * old its `v` prefix is. Metadata-sized work: |manifest rows| +
    * |data files| driver-side, no data read. */
  def vacuum(s: SparkSession, root: String, keep: Int): (Int, Int) = {
    val latest = snapshotVersion(root)
    val retainedVs = math.max(1L, latest - keep + 1) to latest
    val live = retainedVs.flatMap { v =>
      s.read.parquet(Paths.get(root, "manifest", s"v$v").toString)
        .select("file").collect().map(_.getString(0))
    }.toSet
    val dataRoot = Paths.get(root, "data")
    var removed = 0
    val walk = Files.walk(dataRoot)
    try walk.iterator().asScala.foreach { p =>
      if (p.getFileName.toString.endsWith(".parquet") &&
        !live.contains(Paths.get(root).relativize(p).toString.replace('\\', '/'))) {
        Files.delete(p); removed += 1
      }
    } finally walk.close()
    (1L until retainedVs.head).foreach(v =>
      Staging.deleteRecursively(Paths.get(root, "manifest", s"v$v")))
    (removed, live.size)
  }

  /** q195's root: the q187 shape (two overwrite versions + orphan),
    * then vacuumed to the latest version only — staged once at a FIXED
    * path so the oracle can glob it. The compare is root-internal
    * (retained-manifest plan vs on-disk reality), so whichever fixture
    * seeds the build, both sides see the same root; the path key is the
    * build RECIPE (and the Verify gate rebuilds unconditionally anyway,
    * so even a recipe-key miss cannot serve stale bytes to the gate). */
  val vacuumedRootDir: String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft-manifest-vac-" + Staging.contentKey(
        "two-version-root+orphan", "vacuum-keep=1")).toString

  def vacuumedRoot(s: SparkSession, dir: String): String =
    Staging.ensure(vacuumedRootDir) { tmp =>
      buildTwoVersionRoot(s, dir, tmp)
      val _ = vacuum(s, tmp, keep = 1)
    }

  val queries: Seq[Q] = Seq(

    // ----- Atomic multi-table snapshot read: both summary tables
    //       resolve through the SAME manifest version, and the result
    //       carries a cross-table consistency proof — the grand total
    //       from type_totals rides every user row, so serving the two
    //       tables from different versions (or reading the planted
    //       orphan file) breaks the hash against the oracle's
    //       single-source recomputation. Exact DECIMAL sums make the
    //       cross-check order-independent. -----
    Q("q187_manifest_snapshot",
      Some("""SELECT user_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_u,
             |  CAST((SELECT sum(CAST(value AS DECIMAL(18,4))) FROM events)
             |    AS DOUBLE) AS grand_total
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = snapshotRoot(s, dir)
        val users = readTable(s, root, "user_totals")
        val grand = readTable(s, root, "type_totals")
          .agg(sum("total_t").as("grand_total"))
        users.crossJoin(broadcast(grand))
          .select(col("user_id"), col("total_u").cast("double").as("total_u"),
            col("grand_total").cast("double").as("grand_total"))
          .orderBy("user_id")
      }),

    // ----- Append commit + partition-layout evolution: v2 appends a
    //       week-grouped window onto a month-grouped v1 WITHOUT
    //       touching v1's files (ManifestSpec proves the old files are
    //       byte-identical and carried by path into the v2 manifest).
    //       The read stitches both layouts through one manifest; the
    //       oracle recomputes the monthly account from the source
    //       table, so a lost file, double-listed file, or
    //       window-boundary bug breaks the hash. -----
    Q("q189_manifest_append_evolve",
      Some("""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m') AS month,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val root = evolutionRoot(s, dir)
        readTable(s, root, "events_log")
          .groupBy("month")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("month")
      }),

    // ----- Per-file statistics + scan pruning: the manifest's
    //       [min, max] intervals answer "which files can hold this
    //       window" before any data I/O — a one-week predicate over 16
    //       range-partitioned files reads the few that overlap
    //       (ManifestSpec asserts the count). The row predicate is
    //       still applied after the file bound; the oracle recomputes
    //       the window from the raw table, so over-pruning (lost
    //       rows) or under-filtering (stats treated as a filter) both
    //       break the hash. -----
    Q("q193_manifest_stats_prune",
      Some("""SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-08 00:00:00'
             |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15 00:00:00'
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val root = statsRoot(s, dir)
        val (pruned, _, _) = readTableRange(s, root, "events_log",
          "2024-01-08 00:00:00", "2024-01-15 00:00:00")
        pruned
          .filter(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
            col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("day")
      }),

    // ----- Retention VACUUM, plan vs reality: the returned relation is
    //       the PLAN (file and row counts the retained manifest says
    //       should exist) while the oracle globs the DISK for whatever
    //       actually survived and re-reads it. Vacuum deleting a live
    //       file breaks the Spark side (missing input); keeping a dead
    //       version or the planted orphan breaks the oracle side
    //       (extra files/rows in the glob). Liveness is manifest
    //       references, not file age — the one rule that collects both
    //       dead overwrite versions and failed-writer orphans. -----
    Q("q195_manifest_vacuum",
      Some(s"""SELECT 'type_totals' AS table_name,
             |  CAST((SELECT count(*) FROM glob('$vacuumedRootDir/data/*/type_totals/*.parquet')) AS BIGINT) AS n_files,
             |  CAST((SELECT count(*) FROM read_parquet('$vacuumedRootDir/data/*/type_totals/*.parquet')) AS BIGINT) AS n_rows
             |UNION ALL
             |SELECT 'user_totals',
             |  CAST((SELECT count(*) FROM glob('$vacuumedRootDir/data/*/user_totals/*.parquet')) AS BIGINT),
             |  CAST((SELECT count(*) FROM read_parquet('$vacuumedRootDir/data/*/user_totals/*.parquet')) AS BIGINT)
             |ORDER BY table_name""".stripMargin),
      (s, dir) => {
        val root = vacuumedRoot(s, dir)
        val v = snapshotVersion(root)
        val manifest = s.read
          .parquet(Paths.get(root, "manifest", s"v$v").toString)
        import s.implicits._
        Seq("type_totals", "user_totals").map { t =>
          val nFiles = manifest.filter(col("table_name") === t).count()
          val nRows = readTable(s, root, t).count()
          (t, nFiles, nRows)
        }.toDF("table_name", "n_files", "n_rows").orderBy("table_name")
      }),

    // ----- Compaction as a commit: six fragmented append commits
    //       (24 small files, the auto-ingest accumulation) rewritten
    //       by ONE replace-commit into the bin-pack bound. The oracle
    //       recomputes the monthly account from the raw table, so the
    //       rewrite must be content-lossless across the atomic flip;
    //       ManifestSpec asserts the file-count drop and that the
    //       fragmented version still time-travels until vacuumed. -----
    Q("q196_manifest_compaction",
      Some("""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m') AS month,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val root = compactedRoot(s, dir)
        readTable(s, root, "events_log")
          .groupBy("month")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("month")
      }),

    // ----- Write-side schema contract: epoch 1 lacks `quality`,
    //       epoch 2 appends it under allowEvolution, and the REGISTERED
    //       schema (manifest = catalog) pins every read — old files
    //       NULL-fill the new column with zero footer-merge cost. The
    //       oracle derives the same null structure from the raw table
    //       (pre-cut rows have no quality), so a read that dropped the
    //       column, filled it wrong, or leaked it into old rows breaks
    //       the hash; ManifestSpec pins the REJECTION side (type drift
    //       and silent adds refuse to commit). -----
    Q("q197_schema_enforced_append",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(count(quality) AS BIGINT) AS n_quality,
             |  CAST(sum(quality) AS DOUBLE) AS total_quality
             |FROM (
             |  SELECT event_type,
             |    CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'
             |         THEN CAST(value AS DECIMAL(18,4)) * 2 END AS quality
             |  FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = evolvedSchemaRoot(s, dir)
        readTableEvolved(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            count(col("quality")).as("n_quality"),
            sum("quality").cast("double").as("total_quality"))
          .orderBy("event_type")
      })
  )
}
