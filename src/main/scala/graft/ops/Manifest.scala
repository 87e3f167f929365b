package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, StructField, StructType}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/** Snapshot-manifest commit — the minimal table-format commit log this
  * engine's own docs keep referencing: [[Compaction]]'s per-partition
  * rename swap is the strongest commit PLAIN directories offer, and
  * cross-partition / cross-TABLE atomicity is exactly what a manifest
  * pointer adds (the Delta/Iceberg primitive, reduced to its core).
  *
  * Protocol (all on rename-atomic storage):
  *  1. data files land under a fresh prefix below `data/` — invisible
  *     to readers, because readers never list directories;
  *  2. the manifest (one parquet ops log of `(op, table_name, file,
  *     stats_json)` rows, plus an optional `_base` delta marker) is
  *     staged into a tmp dir and CLAIMS `manifest/v<N>` with one
  *     atomic NON-replacing rename — the claim is the
  *     compare-and-swap, so EVERY commit path (snapshot overwrite,
  *     append, replace, compaction, streaming batch) is safe against
  *     concurrent writers: if another writer claimed N first the move
  *     throws, and the loser rebases on the new latest claim and
  *     retries. A claim is complete by construction (the manifest was
  *     fully written before the rename), so claim == commit. Appends
  *     and replaces write DELTAS (drops + adds over the parent claim)
  *     so daily ingest pays O(delta) metadata, with an automatic FULL
  *     fold every [[foldEvery]]-th commit bounding chain resolution —
  *     the manifest-list design of production formats, reduced to its
  *     core;
  *  3. the `_latest` pointer file is a monotonic CACHE of the newest
  *     claim, advanced with write-then-verify: after writing, the
  *     committer re-reads and rewrites until the pointer is >= its
  *     version — a slower racer can therefore never regress the
  *     pointer past verification, and because new commits rebase on
  *     the newest READABLE CLAIM (not the pointer), a lagging pointer
  *     can never lose an update either.
  *
  * Readers resolve pointer → manifest → explicit file list, so:
  *  - a crashed commit (data written, manifest never claimed) is
  *    invisible — readers keep serving the previous snapshot;
  *  - an orphan file from a failed writer sitting in the data prefix is
  *    invisible — it is in no manifest;
  *  - a multi-table snapshot is READ-consistent: both tables resolve
  *    through the same manifest version, never a mix;
  *  - old versions stay readable (time travel) until retention drops
  *    their manifests.
  *
  * At 100 TB the manifest is metadata-sized (file paths, not data), the
  * claim and pointer swap are one rename each regardless of table
  * count, and reads are explicit-path parquet scans — no directory
  * listing on the hot path. Per-file column stats ride the manifest as
  * a JSON map (`stats_json`), so multi-predicate scans prune files from
  * metadata alone — the micro-partition-pruning contract of the
  * reference's warehouse (Snowflake micro-partition metadata), and of
  * Delta/Iceberg file stats. Production object stores expose the claim
  * primitive as a conditional put / if-none-match.
  */
object Manifest {

  /** The manifest relation every committer writes: an ops log.
    * `op` is "add" (this file joins the snapshot), "drop" (every
    * inherited row of `table_name` leaves it — the replace primitive),
    * or "remove" (ONE inherited (table, file) pair leaves it — the
    * surgical primitive behind stats-pruned DELETE and subset
    * compaction); `file` is root-relative; `stats_json` an optional
    * per-column stats map `{"col":{"min":"…","max":"…"},…}` (values as
    * strings, cast back at prune time). A claim with no `_base` marker
    * is a FULL manifest (its adds ARE the snapshot); one with `_base`
    * is a DELTA over that parent version. */
  private[ops] val manifestDdl =
    "op STRING, table_name STRING, file STRING, stats_json STRING"

  /** Write a full manifest every `foldEvery`-th commit on a chain —
    * bounds delta-chain resolution at `foldEvery - 1` hops and
    * amortizes metadata cost: appends pay O(delta) manifest writes
    * except for the periodic fold, which pays O(live files) and resets
    * the chain. This is manifest compaction made automatic — the piece
    * production formats bolt on as a maintenance job. */
  private val foldEvery = 8

  /** Content key of the manifest layout contract — embedded in every
    * staged fixture root's path, so a layout change re-keys the staged
    * roots instead of serving old-layout bytes to new readers. */
  private[graft] val layoutKey: String =
    Staging.contentKey(manifestDdl, "claim=cas-v-dir", "markers=txn+schema+op-in-claim", "stats=bloomcol",
      "check-marker=claim-sidecar", "evolve-rows=nrows-stats")

  // ---------------------------------------------------------------- pointer

  private def pointerPath(root: String): Path = Paths.get(root, "_latest")

  private def pointerVersion(root: String): Long = {
    val p = pointerPath(root)
    if (Files.exists(p)) new String(Files.readAllBytes(p), "UTF-8").trim.toLong
    else 0L
  }

  /** Currently-committed snapshot version (the reader entry point),
    * 0 if none: max(pointer file, newest READABLE claim). A claim is
    * complete by construction (one atomic rename of a fully-written
    * manifest), so the claims themselves are the source of truth and
    * the pointer file is only a cache — which makes pointer LAG
    * harmless (a writer that crashed between claim and pointer swap
    * still committed) and pointer REGRESSION impossible to observe
    * (no write-ordering interleaving of the cache can hide a readable
    * claim). Cost: one directory listing + up to one tail-claim
    * readability probe — metadata-sized. */
  def snapshotVersion(root: String): Long =
    math.max(pointerVersion(root), latestReadableClaim(root))

  /** Best-effort monotonic advance of the pointer CACHE
    * (write-then-verify). Readers do not trust it alone — see
    * [[snapshotVersion]] — so a racer interleaving that leaves the
    * cache one version behind costs at most the claim-listing
    * fallback, never a stale read. */
  private def advancePointer(root: String, version: Long): Unit = {
    var done = false
    while (!done) {
      if (pointerVersion(root) >= version) done = true
      else {
        val tmp = Files.createTempFile(Paths.get(root), "_latest.tmp-", "")
        Files.write(tmp, version.toString.getBytes("UTF-8"))
        Files.move(tmp, pointerPath(root),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  // ----------------------------------------------------------------- claims

  private val VDir = "^v([0-9]+)$".r

  private def claimedVersions(root: String): Seq[Long] = {
    val mdir = Paths.get(root, "manifest")
    if (!Files.isDirectory(mdir)) Seq.empty
    else {
      val l = Files.list(mdir)
      try l.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case VDir(n) => n.toLong }.toList.sorted
      finally l.close()
    }
  }

  /** A claim is READABLE iff its dir holds a parquet part — true for
    * every real claim (the dir appears via one atomic rename of a
    * fully-written manifest); false only for debris of a writer that
    * died creating a claim by non-atomic means. */
  private def manifestReadable(root: String, v: Long): Boolean = {
    val d = Paths.get(root, "manifest", s"v$v")
    Files.isDirectory(d) && {
      val l = Files.list(d)
      try l.iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
      finally l.close()
    }
  }

  /** The WAP branch a claim belongs to, if its dir carries a
    * `_wap_<branch>` sidecar marker (staged atomically with the
    * manifest rows — see [[commitAppendBranch]]). */
  private def wapBranchOf(root: String, v: Long): Option[String] = {
    val d = Paths.get(root, "manifest", s"v$v")
    if (!Files.isDirectory(d)) None
    else {
      val l = Files.list(d)
      try l.iterator().asScala.map(_.getFileName.toString)
        .collectFirst { case n if n.startsWith("_wap_") => n.stripPrefix("_wap_") }
      finally l.close()
    }
  }

  /** Newest claim whose manifest is readable AND main-visible — the
    * REBASE point for carrying rows forward. Using claims (not the
    * pointer) here is what makes "claimed but pointer not yet
    * advanced" commits impossible to lose. Claims carrying a `_wap_`
    * marker for a branch that is neither published nor dropped are
    * SKIPPED: an open write-audit-publish branch is invisible to main
    * readers and is never a main rebase point — visibility is decided
    * by the branch's root-level resolution markers, never by pointer
    * position, so a later main commit advancing the pointer can
    * neither publish nor orphan an open branch. 0 if none. */
  private def latestReadableClaim(root: String): Long =
    claimedVersions(root).reverseIterator
      .find(v => manifestReadable(root, v) &&
        wapBranchOf(root, v).forall(b => wapIsPublished(root, b)))
      .getOrElse(0L)

  /** Is claim `v` readable MAIN history — not a crashed writer's
    * debris, and not an open/dropped WAP branch claim (staged data
    * must stay invisible to every main-history surface: reads, time
    * travel, history, the change feed)? */
  private def mainVisible(root: String, v: Long): Boolean =
    manifestReadable(root, v) &&
      wapBranchOf(root, v).forall(b => wapIsPublished(root, b))

  /** First MAIN-visible version strictly above `after` whose snapshot
    * contains `table` — the forward jump a rate-limited streaming
    * consumer needs when the table first appears above its cap
    * (earlier versions consumed by other tables' commits). */
  private[graft] def firstVersionWith(s: SparkSession, root: String,
                                      table: String, after: Long): Option[Long] =
    claimedVersions(root)
      .find(v => v > after && mainVisible(root, v) &&
        manifestRows(s, root, v).exists(_._1 == table))

  /** Newest readable MAIN snapshot at or below `v` (0 = none) — the
    * rounding a rate-limited consumer needs when its cap lands on a
    * crashed writer's unreadable claim number. */
  private[graft] def readableAtOrBelow(root: String, v: Long): Long =
    claimedVersions(root).reverseIterator
      .find(x => x <= v && manifestReadable(root, x) &&
        wapBranchOf(root, x).forall(b => wapIsPublished(root, b)))
      .getOrElse(0L)

  /** Next version to attempt: 1 + max(any claim, pointer). A dead
    * unreadable claim still consumes its number (skipped, vacuumed
    * later) so later writers never deadlock on it. */
  private def nextVersion(root: String): Long =
    math.max(claimedVersions(root).lastOption.getOrElse(0L),
      snapshotVersion(root)) + 1

  // ---------------------------------------------------------------- staging

  // Guards the parquet-timestamp-encoding conf flip around manifest
  // data writes (below): read-prev and restore happen under one
  // monitor, so two in-session committers can never interleave a
  // restore into each other's write. This serializes in-JVM manifest
  // DATA writes against each other — a deliberate trade: the
  // alternative, pinning TIMESTAMP_MICROS session-wide, silently
  // flips every OTHER parquet write in the session from naive INT96
  // to tz-annotated int64 (measured: it turned the gate's own result
  // dumps tz-aware and broke the comparator — the q180 hasher class,
  // session-wide). Cross-JVM committers are unaffected; the CAS is
  // the real concurrency boundary.
  private val publishLock = new Object

  /** Cap on the DIRECT (driver-local, no Spark job) publish path: a
    * batch whose optimized plan is already driver-resident (a
    * `LocalRelation` — literal `INSERT ... VALUES` rows, `LIMIT 0`
    * empty-table creation, constant-folded projections) and holds at
    * most this many rows is metadata-sized work, and metadata-sized
    * work must not pay a distributed write job's scheduling + commit
    * protocol (opt guide §5 — the same discipline the ops log got).
    * Anything larger, or any plan that reads real data, keeps the
    * distributed write — that is the path that must scale to 100 TB. */
  private val directPublishMaxRows = 10000

  /** `df`'s rows if they are ALREADY ON THE DRIVER (the optimizer
    * collapsed the plan to a `LocalRelation`) and few — no job runs,
    * this only inspects the optimized plan. None = publish via Spark. */
  private def driverResidentRows(df: DataFrame)
      : Option[(StructType, Seq[org.apache.spark.sql.catalyst.InternalRow])] =
    df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          if l.data.length <= directPublishMaxRows =>
        Some((l.schema, l.data))
      case _ => None
    }

  /** Write `rows` as ONE parquet part file via Spark's own
    * `ParquetWriteSupport` — bit-identical encodings to what
    * `df.write.parquet` produces under [[publishData]]'s conf
    * (INT64-micros timestamps, non-legacy decimals/arrays), because it
    * IS Spark's row writer, minus the job: driver-local, in-process,
    * ~1-5 ms. Footer min/max statistics are written by parquet-mr as
    * usual, so [[FooterStats]] pruning sees the same metadata. */
  private def writeDataDirect(dir: Path, schema: StructType,
      rows: Seq[org.apache.spark.sql.catalyst.InternalRow]): Unit = {
    import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
    Files.createDirectories(dir)
    val conf = new org.apache.hadoop.conf.Configuration()
    ParquetWriteSupport.setSchema(schema, conf)
    // the exact conf surface Spark's prepareWrite seeds for this
    // writer (init() asserts on the first two); values mirror the
    // session defaults publishData's Spark path writes under
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    val target = new org.apache.hadoop.fs.Path(
      dir.resolve("part-00000.parquet").toUri.toString)
    final class B(p: org.apache.hadoop.fs.Path) extends
        org.apache.parquet.hadoop.ParquetWriter.Builder[
          org.apache.spark.sql.catalyst.InternalRow, B](p) {
      override def self(): B = this
      override def getWriteSupport(c: org.apache.hadoop.conf.Configuration) =
        new ParquetWriteSupport
    }
    val writer = new B(target).withConf(conf)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try rows.foreach(writer.write) finally writer.close()
  }

  /** Write `df` as parquet and publish it atomically under `data/`:
    * the deterministic prefix `data/v<hint>/<table>` when free (the
    * single-writer common case — keeps layouts human-readable), else a
    * token-suffixed prefix so concurrent writers never interleave
    * files in one directory. Returns the root-relative file paths.
    * Driver-resident metadata-sized batches take the DIRECT write
    * ([[writeDataDirect]]); everything else goes through Spark. */
  private def publishData(s: SparkSession, root: String, hint: Long,
                          table: String, df: DataFrame): Seq[String] = {
    require(table.matches("[A-Za-z0-9_.-]+") && table.exists(_ != '.'),
      s"unsafe table name: $table") // pure-dot names ("."/"..") escape the prefix
    Files.createDirectories(Paths.get(root))
    val tmp = Files.createTempDirectory(Paths.get(root), "data-stage.tmp-")
    driverResidentRows(df) match {
      case Some((schema, rows)) =>
        writeDataDirect(tmp.resolve("d"), schema, rows)
      case None =>
        // INT64-micros timestamps, not the INT96 legacy default: INT96
        // columns carry no usable footer statistics ([[FooterStats]]).
        // No per-write option exists, hence the locked set-write-restore
        // (see [[publishLock]] for the trade-off analysis).
        publishLock.synchronized {
          val key = "spark.sql.parquet.outputTimestampType"
          val prevTs = s.conf.get(key)
          s.conf.set(key, "TIMESTAMP_MICROS")
          try df.write.mode("overwrite").parquet(tmp.resolve("d").toString)
          finally s.conf.set(key, prevTs)
        }
    }
    val dest = claimDataDir(root, hint, table, tmp.resolve("d"))
    Staging.deleteRecursively(tmp)
    val rel = Paths.get(root).relativize(dest).toString.replace('\\', '/')
    val l = Files.list(dest)
    val files =
      try l.iterator().asScala.toList
        .map(_.getFileName.toString).filter(_.endsWith(".parquet"))
        .sorted.map(f => s"$rel/$f")
      finally l.close()
    // every write path funnels here, so CHECK constraints guard all of
    // them: the files are not yet claimed (invisible), so a violation
    // aborts with nothing to undo but the dir itself
    val fp = enforceChecks(s, root, table, files)
    // record WHAT was enforced (and under WHICH registry state) so the
    // claim loop can re-validate if a constraint registers between this
    // publish and the claim — the writer half of the registration race
    val buf = pendingChecks.get()
    buf.filterInPlace(e => !(e.root == root && e.table == table))
    buf += new PendingChecks(root, table, files, fp)
    if (buf.size > 16) buf.remove(0, buf.size - 16) // abandoned-publish cap
    files
  }

  /** One published-but-unclaimed batch awaiting its claim, with the
    * CHECK-registry fingerprint it was validated under. Thread-local:
    * every committer publishes and claims on one thread. */
  private final class PendingChecks(val root: String, val table: String,
                                    val files: Seq[String], var fp: String)
  private val pendingChecks =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[PendingChecks]] {
      override def initialValue() =
        scala.collection.mutable.ArrayBuffer.empty[PendingChecks]
    }

  /** Test seam: runs between a claim attempt's payload build and its
    * CAS rename — a spec interleaves a racing commit here to prove the
    * registration/write fences. No-op in production. */
  private[graft] var preClaimTestHook: () => Unit = () => ()

  /** Move a fully-staged data dir into its claimed slot under
    * `root/data`. */
  private def claimDataDir(root: String, hint: Long, table: String,
                           staged: Path): Path = {
    val preferred = Paths.get(root, "data", s"v$hint", table)
    Files.createDirectories(preferred.getParent)
    try { Files.move(staged, preferred,
      StandardCopyOption.ATOMIC_MOVE); preferred }
    catch {
      // FileSystemException covers every contended-rename shape the
      // JDK emits (FileAlreadyExists, DirectoryNotEmpty, AccessDenied,
      // and the bare "Directory not empty" variant Linux rename(2)
      // surfaces) — the loser just takes a token-suffixed prefix
      case _: java.nio.file.FileSystemException =>
        val alt = Paths.get(root, "data",
          s"v$hint-${java.util.UUID.randomUUID().toString.take(8)}", table)
        Files.createDirectories(alt.getParent)
        Files.move(staged, alt, StandardCopyOption.ATOMIC_MOVE)
        alt
    }
  }

  /** One claim's content: the ops log plus the delta parent (None =
    * full manifest) plus any SIDECAR MARKER files (`_txn_<appId>`
    * idempotency ledgers, `_schema_<table>.json` registrations) that
    * must become visible ATOMICALLY with the manifest rows. `ops` rows
    * are (op, table_name, file, stats_json); drop rows carry a null
    * file. Marker names must start with `_` so Spark's file listing
    * treats them as hidden next to the manifest parquet. */
  private final case class Payload(
      ops: Seq[(String, String, String, String)], base: Option[Long],
      extras: Seq[(String, Array[Byte])] = Nil)

  // ------------------------------------------- direct ops-log parquet I/O
  // The ops log is METADATA — a handful of string rows per claim — yet
  // it used to ride full Spark jobs: one `coalesce(1).write.parquet`
  // per claim and one `read.parquet(...).collect()` per chain hop.
  // Each such job pays scheduling + commit-protocol overhead
  // (~100-300 ms on a busy scheduler) for a few KB of bytes, and
  // manifest resolution sits on EVERY read and EVERY commit, so the
  // overhead multiplied across the whole DML/streaming surface (the
  // adjudicated 0.8-1.3 s per-claim floor was mostly this). Driver
  // metadata belongs on the driver (opt guide §5): parquet-mr's
  // example API writes/reads the same standard parquet in ~1-5 ms,
  // in-process, with no job. Files stay bit-compatible both ways —
  // Spark can still read claims this writes (optional BINARY/UTF8
  // columns = nullable strings) and this reads claims Spark wrote
  // (older staged layouts on disk), including pre-delta vintages
  // missing the `op`/`stats_json` columns.

  private lazy val opsLogSchema: org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation => L, Types => T}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.BINARY
    T.buildMessage()
      .optional(BINARY).as(L.stringType()).named("op")
      .optional(BINARY).as(L.stringType()).named("table_name")
      .optional(BINARY).as(L.stringType()).named("file")
      .optional(BINARY).as(L.stringType()).named("stats_json")
      .named("spark_schema")
  }

  private lazy val opsLogHadoopConf = {
    val c = new org.apache.hadoop.conf.Configuration()
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(opsLogSchema, c)
    c
  }

  /** Write `ops` as one parquet part file inside `dir` (driver-local,
    * no Spark job). Row order is preserved. */
  private def writeOpsLog(dir: Path,
                          ops: Seq[(String, String, String, String)]): Unit = {
    Files.createDirectories(dir)
    val target = new org.apache.hadoop.fs.Path(
      dir.resolve("part-00000.parquet").toUri.toString)
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(target).withConf(opsLogHadoopConf)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try ops.foreach { case (op, t, f, st) =>
      val g = new org.apache.parquet.example.data.simple.SimpleGroup(opsLogSchema)
      if (op != null) g.add("op", op)
      if (t != null) g.add("table_name", t)
      if (f != null) g.add("file", f)
      if (st != null) g.add("stats_json", st)
      writer.write(g)
    } finally writer.close()
  }

  /** Read every parquet part of claim dir `dir` as ops rows
    * (driver-local, no Spark job). Pre-delta vintages (no `op` column)
    * read as plain full rows (`op = "add"`, null stats). */
  private def readOpsLog(dir: Path): Seq[(String, String, String, String)] = {
    val l = Files.list(dir)
    val parts =
      try l.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet"))
        .toList.sortBy(_.getFileName.toString)
      finally l.close()
    parts.flatMap { p =>
      val reader = org.apache.parquet.hadoop.ParquetReader.builder(
        new org.apache.parquet.hadoop.example.GroupReadSupport(),
        new org.apache.hadoop.fs.Path(p.toUri.toString)).build()
      try Iterator.continually(reader.read()).takeWhile(_ != null).map { g =>
        def str(n: String): String =
          if (g.getType.containsField(n) && g.getFieldRepetitionCount(n) > 0)
            g.getString(n, 0)
          else null
        val op = if (g.getType.containsField("op")) str("op") else "add"
        (op, str("table_name"), str("file"), str("stats_json"))
      }.toList
      finally reader.close()
    }
  }

  /** The CAS itself: stage the ops log (and the `_base` delta marker
    * and any sidecar markers) into a tmp dir and claim
    * `manifest/v<version>` with one atomic non-replacing rename —
    * markers and rows appear together or not at all. True = this
    * writer owns the version. */
  private def tryClaim(s: SparkSession, root: String, version: Long,
                       payload: Payload): Boolean = {
    Files.createDirectories(Paths.get(root, "manifest"))
    val tmp = Files.createTempDirectory(Paths.get(root), s"manifest-v$version.tmp-")
    writeOpsLog(tmp.resolve("m"), payload.ops)
    payload.base.foreach(b =>
      Files.write(tmp.resolve("m").resolve("_base"), b.toString.getBytes("UTF-8")))
    payload.extras.foreach { case (name, bytes) =>
      // NB: '=' must never appear in a marker name — Spark's hidden-
      // file filter exempts `_x=y` names (partition-style), so the
      // manifest read would try to parse the marker as parquet
      require(name.startsWith("_") && name.matches("_[A-Za-z0-9._-]+"),
        s"unsafe claim marker name: $name")
      Files.write(tmp.resolve("m").resolve(name), bytes)
    }
    val target = Paths.get(root, "manifest", s"v$version")
    try {
      Files.move(tmp.resolve("m"), target, StandardCopyOption.ATOMIC_MOVE)
      Staging.deleteRecursively(tmp)
      true
    } catch {
      // any rename failure = another writer owns this version
      case _: java.nio.file.FileSystemException =>
        Staging.deleteRecursively(tmp)
        false
    }
  }

  /** The delta parent of claim `v`, if it is a delta. */
  private def baseOf(root: String, v: Long): Option[Long] = {
    val p = Paths.get(root, "manifest", s"v$v", "_base")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
    else None
  }

  /** Hops from claim `v` to its full base (0 = `v` is full). */
  private def chainDepth(root: String, v: Long): Int = {
    var d = 0
    var cur = baseOf(root, v)
    while (cur.isDefined) { d += 1; cur = baseOf(root, cur.get) }
    d
  }

  /** Session memo of RESOLVED manifests. A claim dir is immutable
    * once its atomic rename lands (nothing ever writes into it), so a
    * resolved (root, version) can be served again without re-walking
    * the delta chain — resolution sits on EVERY read and commit, and
    * a multi-statement script re-resolves the same snapshot dozens of
    * times (the `streamNames` memo precedent, extended to the rows).
    * Entries validate against the claim dir's mtime (one stat syscall
    * vs a chain of parquet opens): a vacuumed claim drops out (the
    * read then refuses exactly like an unmemoized one), and a rebuilt
    * root at the same path can never serve stale rows. Bounded so a
    * long session's temp fixtures cannot grow it without limit. */
  private val resolveMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), (java.nio.file.attribute.FileTime, Seq[(String, String, String)])]()
  private val resolveMemoMax = 4096

  /** Fully-RESOLVED (table, file, stats) rows of snapshot `version`:
    * walk the delta chain to its full base, replaying each claim's
    * drops then adds. Chain length is bounded by [[foldEvery]] and
    * repeat resolutions are memoized, so a read costs at most
    * `foldEvery` metadata-sized parquet opens once and one stat call
    * thereafter — flat in both commit count and call count. */
  def manifestRows(s: SparkSession, root: String,
                   version: Long): Seq[(String, String, String)] = {
    // direct driver-local read (see the ops-log I/O note above): a
    // claim is a few KB of metadata and resolution sits on every read
    // and commit — a Spark job per hop was pure scheduling overhead
    val dir = Paths.get(root, "manifest", s"v$version")
    val key = (root, version)
    val mtime =
      try Files.getLastModifiedTime(dir)
      catch { case _: java.io.IOException => null }
    if (mtime != null) {
      val hit = resolveMemo.get(key)
      if (hit != null && hit._1 == mtime) return hit._2
    }
    val ops = readOpsLog(dir)
    val parent = baseOf(root, version)
      .map(manifestRows(s, root, _)).getOrElse(Seq.empty)
    val dropped = ops.collect { case ("drop", t, _, _) => t }.toSet
    val removed = ops.collect { case ("remove", t, f, _) => (t, f) }.toSet
    val resolved =
      parent.filterNot { case (t, f, _) => dropped(t) || removed((t, f)) } ++
        ops.collect { case ("add", t, f, st) => (t, f, st) }
    if (mtime != null) {
      if (resolveMemo.size >= resolveMemoMax) resolveMemo.clear()
      resolveMemo.put(key, (mtime, resolved))
    }
    resolved
  }

  // ------------------------------------------------------- txn idempotency

  /** Thrown at claim time when a transactional commit's (appId,
    * txnVersion) was already committed by a racer — the caller treats
    * it as a redelivery no-op, never a failure. The published-but-
    * unclaimed data files of the losing attempt are unreferenced and
    * collected by [[vacuum]]'s normal liveness rule. */
  final class TxnAlreadyCommitted(msg: String) extends RuntimeException(msg)

  private def txnMarker(appId: String): String = {
    require(appId.matches("[A-Za-z0-9._-]+"), s"unsafe txn appId: $appId")
    s"_txn_$appId"
  }

  /** Newest committed transaction version for `appId` — the Delta
    * txn-action idea: each transactional commit stages a `_txn_<appId>`
    * marker INSIDE its claim dir (atomic with the manifest rows), and
    * the ledger survives interleaved non-transactional commits
    * (compaction, vacuum-then-append, manual maintenance) because it is
    * keyed by appId, not by the table's global version counter. Scan is
    * newest-claim-first (txn versions are monotone in commit order) and
    * metadata-sized; [[vacuum]] carries the newest marker past the
    * retention floor. */
  /** Newest claim's copy of marker file `name`, if any claim has one. */
  private def newestMarker(root: String, name: String): Option[Array[Byte]] =
    claimedVersions(root).reverseIterator
      .map(v => Paths.get(root, "manifest", s"v$v", name))
      .find(Files.exists(_))
      .map(Files.readAllBytes)

  /** Every distinct `_txn_*` marker name present in any claim. */
  private def allTxnMarkerNames(root: String): Seq[String] =
    claimedVersions(root).flatMap { cv =>
      val d = Paths.get(root, "manifest", s"v$cv")
      val l = Files.list(d)
      try l.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("_txn_")).toList
      finally l.close()
    }.distinct.sorted

  /** The source's newest txn ledger per appId, as claim extras —
    * shipped on every replication commit so a writer FAILING OVER to
    * the replica resumes at the right batch instead of re-committing
    * (duplicate rows) or aborting on a spurious gap. `exclude` keeps a
    * replica-chain's own sync ledger from clobbering the
    * destination's. */
  private def txnLedgerExtras(root: String,
                              exclude: String): Seq[(String, Array[Byte])] =
    allTxnMarkerNames(root)
      .filterNot(_ == exclude)
      .flatMap(name => newestMarker(root, name).map(name -> _))

  def lastCommittedTxn(root: String, appId: String): Option[Long] =
    newestMarker(root, txnMarker(appId))
      .map(b => new String(b, "UTF-8").trim.toLong)

  /** Claim-time idempotency guard + the marker bytes for a payload. */
  private def txnGuard(root: String, txn: Option[(String, Long)]): Unit =
    txn.foreach { case (app, id) =>
      lastCommittedTxn(root, app).filter(_ >= id).foreach(last =>
        throw new TxnAlreadyCommitted(
          s"txn $app#$id already committed at $root (ledger at #$last)"))
    }

  private def txnExtras(txn: Option[(String, Long)]): Seq[(String, Array[Byte])] =
    txn.toSeq.map { case (app, id) =>
      txnMarker(app) -> id.toString.getBytes("UTF-8") }

  /** Thrown by a payload builder when the claim-time base no longer
    * matches the state a rewrite was computed from (compaction racing
    * an append) — the caller recomputes from the new base and retries.
    * This is snapshot-isolation VALIDATION on top of the version CAS:
    * the CAS alone serializes manifests, validation keeps a replace
    * from silently erasing rows a concurrent append added. Note the
    * two retry budgets COMPOSE deliberately: the inner [[casCommit]]
    * budget covers claim races (cheap: re-claim metadata), the outer
    * rewrite loops in compact/delete/merge cover conflicts (expensive:
    * recompute data), so worst case is maxRetries × maxRetries claim
    * attempts — bounded, and each layer's budget matches its cost. */
  final class CommitConflict(msg: String) extends RuntimeException(msg)

  /** Shared CAS commit loop: data files are published ONCE before the
    * loop (retries re-claim metadata, never rewrite data); `attempt`
    * rebuilds the claim payload against the CURRENT newest readable
    * claim on every try. */
  /** The public operation behind the current commit, for the claim's
    * `_op` marker ([[tableHistory]]): the OUTERMOST graft frame whose
    * method is a commit-family entry point — so a
    * `commitAppendRanged → commitAppendStats → casCommit` chain
    * records `commitAppendRanged`, and a streaming batch records
    * `commitBatchToManifest`. Stack inspection is nanoseconds against
    * a commit's I/O. */
  private def currentOpName(): String = {
    val interesting = ("^(commit|compact|replicate|consume|publish|" +
      "auditThenPublish|addCheckConstraint|dropCheckConstraint|" +
      "analyzeTable|createPolicy|attachPolicy|detachPolicy).*").r
    Thread.currentThread().getStackTrace.reverseIterator
      .find(f => f.getClassName.startsWith("graft.") &&
        !f.getMethodName.contains("$") &&
        interesting.pattern.matcher(f.getMethodName).matches())
      .map(_.getMethodName).getOrElse("unknown")
  }

  private def casCommit(s: SparkSession, root: String,
                        attempt: Long => Payload,
                        maxRetries: Int,
                        baseFn: String => Long = latestReadableClaim,
                        advance: Boolean = true): Long = {
    val op = currentOpName()
    var tries = 0
    // the last attempt's published add-set: used ONLY by the terminal
    // failure path below to retire pending-check entries for a batch
    // that will now never claim
    var lastAdds: Set[(String, String)] = Set.empty
    while (tries < maxRetries) {
      val version = nextVersion(root)
      val payload0 = attempt(baseFn(root))
      lastAdds = payload0.ops.collect {
        case ("add", t, f, _) if f != null => (t, f) }.toSet
      preClaimTestHook()
      // Writer half of the CHECK-registration fence: if the registry
      // changed since this thread's publish validated its files (a
      // constraint claimed in the publish→claim window, or this claim
      // lost a race to a registration and is retrying), re-validate the
      // published files under the CURRENT registry before claiming —
      // one column-pruned scan of this commit's own files, only when
      // the fingerprint moved. Entries whose files vanished (a prior
      // aborted attempt cleaned them) are dropped, never re-read.
      locally {
        val buf = pendingChecks.get()
        buf.filterInPlace(e => e.root != root ||
          e.files.forall(f => Files.exists(Paths.get(e.root, f))))
        buf.foreach { e =>
          if (e.root == root) {
            val fpNow = checkFingerprint(e.root, e.table)
            if (fpNow != e.fp) {
              val _ = enforceChecks(s, e.root, e.table, e.files)
              e.fp = fpNow
            }
          }
        }
      }
      // commit wall-time rides INSIDE the claim (`_ts`): dir mtimes do
      // not survive export/replication, and TIMESTAMP AS OF on a
      // promoted replica must resolve the SOURCE's history clock — a
      // caller that carries a foreign clock (replication) supplies its
      // own `_ts` and wins
      val stamped =
        if (payload0.extras.exists(_._1 == "_ts")) payload0.extras
        else payload0.extras :+
          ("_ts" -> System.currentTimeMillis().toString.getBytes("UTF-8"))
      val payload = payload0.copy(extras =
        stamped :+ ("_op" -> op.getBytes("UTF-8")))
      if (tryClaim(s, root, version, payload)) {
        // a pending entry is discharged when ITS files get claimed —
        // never by commit boundaries (a registration claim nested
        // between another commit's publish and claim must not wipe
        // that commit's pending validation)
        val claimed = payload.ops.collect {
          case ("add", t, f, _) if f != null => (t, f) }.toSet
        pendingChecks.get().filterInPlace(e => !(e.root == root &&
          e.files.forall(f => claimed((e.table, f)))))
        // branch (WAP) commits leave the pointer cache alone: they are
        // not main history until published, and the cache must never
        // suggest otherwise
        if (advance) advancePointer(root, version)
        return version
      }
      tries += 1
    }
    // terminal failure: this attempt's published files will never be
    // claimed (vacuum collects them) — retire their pending-check
    // entries NOW, so the claim-time fence never re-validates an
    // abandoned batch against a future registry and fails an
    // unrelated later commit on this thread
    pendingChecks.get().filterInPlace(e => e.root != root ||
      e.files.isEmpty || !e.files.forall(f => lastAdds((e.table, f))))
    throw new IllegalStateException(
      s"commit: lost the version race $maxRetries times at $root")
  }

  /** Retire this thread's pending-check entry for (root, table). The
    * casCommit terminal path above only covers exhaustion INSIDE the
    * claim loop; outer rewrite loops (merge / update / delete /
    * compact) exhaust on CommitConflict thrown from the attempt
    * closure, which propagates out of casCommit BEFORE tryClaim — so
    * their abandoned batch's pending entry would survive and a later
    * unrelated commit on this thread could re-validate (and fail on)
    * it. Each such loop calls this before its terminal throw; the
    * entry is necessarily its own abandoned publish (thread-local,
    * one publish→claim in flight per thread). */
  private def retirePending(root: String, table: String): Unit =
    pendingChecks.get().filterInPlace(e =>
      !(e.root == root && e.table == table))

  /** [[retirePending]] + the terminal IllegalStateException, as one
    * expression so every outer loop's exhaustion path stays a single
    * statement. */
  private def retireAndFail(root: String, table: String,
                            msg: String): Nothing = {
    retirePending(root, table)
    throw new IllegalStateException(msg)
  }

  /** Build an append/replace payload against `base`: a DELTA (drops +
    * adds over the parent) while the chain is short, a FULL fold —
    * resolved parent minus drops, plus adds — every [[foldEvery]]-th
    * commit. Appends therefore pay O(delta) manifest metadata except
    * at the periodic fold; reads never walk more than `foldEvery - 1`
    * hops. */
  private def deltaOrFull(s: SparkSession, root: String, base: Long,
                          drops: Seq[String],
                          adds: Seq[(String, String, String)],
                          removes: Seq[(String, String)] = Nil): Payload = {
    val addOps = adds.map { case (t, f, st) => ("add", t, f, st) }
    if (base == 0)
      Payload(addOps, None)
    else if (chainDepth(root, base) + 1 >= foldEvery) {
      val dropped = drops.toSet
      val removedSet = removes.toSet
      val carried = manifestRows(s, root, base)
        .filterNot { case (t, f, _) => dropped(t) || removedSet((t, f)) }
        .map { case (t, f, st) => ("add", t, f, st) }
      Payload(carried ++ addOps, None)
    } else
      Payload(drops.map(t => ("drop", t, null: String, null: String)) ++
        removes.map { case (t, f) => ("remove", t, f, null: String) } ++ addOps,
        Some(base))
  }

  // -------------------------------------------------------------- committers

  /** Commit every (name → DataFrame) as ONE atomic snapshot (overwrite
    * semantics: the manifest is exactly these tables); returns the new
    * version. Safe under concurrent writers — all committers claim
    * their version via the CAS. */
  def commit(s: SparkSession, root: String, tables: Map[String, DataFrame],
             maxRetries: Int = 5): Long = {
    val hint = nextVersion(root)
    val newRows = tables.toSeq.sortBy(_._1).flatMap { case (name, df) =>
      publishData(s, root, hint, name, df).map(f => (name, f, null: String))
    }
    // overwrite semantics: the snapshot IS these tables — always a
    // full manifest, never a delta
    casCommit(s, root,
      _ => Payload(newRows.map { case (t, f, st) => ("add", t, f, st) }, None),
      maxRetries)
  }

  /** Optimistic-concurrency commit — alias of [[commit]], kept for the
    * original CAS entry point's name: the claim protocol is now the
    * ONLY commit path, so the two are the same operation. */
  def commitCas(s: SparkSession, root: String, tables: Map[String, DataFrame],
                maxRetries: Int = 5): Long =
    commit(s, root, tables, maxRetries)

  /** APPEND commit: a new snapshot whose manifest = the newest readable
    * claim's rows (every table) + the new data files for `table`.
    * Nothing is rewritten — the append is data-write + metadata, which
    * is what makes daily ingest O(day) on a 100-TB table. Because
    * readers resolve explicit files, the new files may be GROUPED by a
    * different key than the old ones (month → week, say): partition-
    * layout evolution is a non-event under a manifest, where a
    * directory-scan engine would need a full rewrite or dual reads. */
  def commitAppend(s: SparkSession, root: String, table: String,
                   df: DataFrame, maxRetries: Int = 5,
                   txn: Option[(String, Long)] = None): Long = {
    val hint = nextVersion(root)
    val newRows = publishData(s, root, hint, table, df)
      .map(f => (table, f, null: String))
    casCommit(s, root, { base =>
      txnGuard(root, txn)
      deltaOrFull(s, root, base, Nil, newRows).copy(extras = txnExtras(txn))
    }, maxRetries)
  }

  /** MULTI-TABLE atomic append: every table's batch lands in ONE
    * claim, so readers either see all of them or none — the
    * cross-table transaction single-table logs (Delta) cannot give
    * and catalog-level ones (Nessie, a multi-table Iceberg commit)
    * sell: a fact batch and its audit/summary row can never be
    * observed apart, at any version, under any crash. Each batch may
    * carry statsCols for per-file pruning stats (empty = no stats).
    * Data publishes per table BEFORE the claim (crashed attempts stay
    * invisible and vacuum collects them); one CAS claim commits the
    * union of all manifest rows, with the usual optional txn marker
    * for exactly-once drivers. */
  def commitAppendMulti(s: SparkSession, root: String,
                        batches: Seq[(String, DataFrame, Seq[String])],
                        maxRetries: Int = 5,
                        txn: Option[(String, Long)] = None,
                        extras: Seq[(String, Array[Byte])] = Nil,
                        validate: Long => Unit = _ => (),
                        adds: Seq[(String, String, String)] = Nil,
                        removes: Seq[(String, String)] = Nil): Long = {
    // `adds`/`removes` fold PRE-RENDERED manifest rows into the same
    // claim — the seam that lets an appends+DV-delete mixture land
    // atomically (the ANN delete-mirror: new codes appended, doomed
    // codes DV'd, cursor advanced — one claim, every reader sees all
    // or none). Callers passing them are responsible for claim-time
    // validation that the rows' tables did not move underneath.
    require(batches.nonEmpty || adds.nonEmpty || removes.nonEmpty,
      "commitAppendMulti: no batches")
    require(batches.map(_._1).distinct.size == batches.size,
      "commitAppendMulti: one batch per table")
    val hint = nextVersion(root)
    val newRows = batches.flatMap { case (table, df, statsCols) =>
      val relFiles = publishData(s, root, hint, table, df)
      statsRowsFor(s, root, table, relFiles, statsCols)
    }
    casCommit(s, root, { base =>
      txnGuard(root, txn)
      // caller-supplied claim-time validation (e.g. the ANN index's
      // cursor check) — runs INSIDE the claim like txnGuard, so a
      // racer that moved the guarded state fails before linking
      validate(base)
      deltaOrFull(s, root, base, Nil, newRows ++ adds, removes)
        .copy(extras = txnExtras(txn) ++ extras)
    }, maxRetries)
  }

  /** The newest live (non-tombstoned) claim marker named exactly
    * `name`, if any — package-private so sibling ops (the ANN index's
    * codebook marker) can read their own registrations. */
  private[ops] def claimMarker(root: String, name: String): Option[Array[Byte]] =
    claimMarkers(root, name).get(name).filter(_.nonEmpty)

  /** REPLACE commit: carry every OTHER table's rows forward and swap
    * `table`'s file set for the new data — the commit primitive behind
    * compaction and any full-table rewrite. The old file set stays on
    * disk (time travel) until retention vacuums it. When
    * `expectedFiles` is given, the commit VALIDATES at claim time that
    * `table`'s current file set is exactly the one the rewrite read —
    * otherwise a concurrent append's rows would be silently erased —
    * and throws [[CommitConflict]] for the caller to recompute. */
  def commitReplace(s: SparkSession, root: String, table: String,
                    df: DataFrame, maxRetries: Int = 5,
                    expectedFiles: Option[Set[String]] = None,
                    txn: Option[(String, Long)] = None): Long = {
    val hint = nextVersion(root)
    val newRows = publishData(s, root, hint, table, df)
      .map(f => (table, f, null: String))
    casCommit(s, root, { base =>
      txnGuard(root, txn)
      expectedFiles.foreach { exp =>
        val cur =
          if (base == 0) Set.empty[String]
          else manifestRows(s, root, base)
            .collect { case (t, f, _) if t == table => f }.toSet
        if (cur != exp)
          throw new CommitConflict(
            s"$table changed under the rewrite: ${cur.size} files at base " +
              s"v$base, rewrite read ${exp.size}")
      }
      deltaOrFull(s, root, base, Seq(table), newRows)
        .copy(extras = txnExtras(txn))
    }, maxRetries)
  }

  /** DROP TABLE: one atomic commit whose manifest carries no rows for
    * `table` — METADATA-only (the data files stay on disk serving
    * time travel; vacuum collects them once every manifest that
    * references them ages out of retention, the same lifecycle as a
    * replace's old file set). Other tables in the root are untouched.
    * An absent table refuses loudly — a typo'd DROP must not
    * "succeed". */
  def commitDropTable(s: SparkSession, root: String, table: String,
                      maxRetries: Int = 5): Long =
    casCommit(s, root, { base =>
      require(base > 0 && manifestRows(s, root, base).exists(_._1 == table),
        s"DROP TABLE: $table absent from snapshot v$base at $root")
      // an EMPTY marker UNREGISTERS the schema atomically with the
      // drop: a later CREATE TABLE of the same name must not inherit
      // the dead table's registration (NULL-filling or alias-mapping
      // the new files against the old shape); UNDROP re-registers
      deltaOrFull(s, root, base, Seq(table), Nil)
        .copy(extras = Seq(schemaMarker(table) ->
          StructType(Nil).json.getBytes("UTF-8")))
    }, maxRetries)

  /** TRUNCATE TABLE: replace `table`'s content with zero rows, SCHEMA
    * PRESERVED — a [[commitReplace]] of an empty frame with the
    * table's own schema, so the table stays registered/queryable and
    * the pre-truncate state time-travels. Metadata + one empty-file
    * write; never a data rewrite. */
  def commitTruncate(s: SparkSession, root: String, table: String,
                     maxRetries: Int = 5): Long =
    commitReplace(s, root, table,
      readTable(s, root, table).limit(0), maxRetries)

  /** RESTORE `table` to its state at snapshot `toVersion`, as a NEW
    * commit — the Delta `RESTORE TABLE ... TO VERSION` / Iceberg
    * rollback analogue, done roll-FORWARD so history is preserved:
    * the bad commits stay time-travelable, readers atomically flip to
    * the old file set, and the operation is metadata-priced (the
    * restored files are re-referenced, never copied — zero data I/O).
    *
    * Two loud failure modes, both fatal by design:
    *  - a restored file (or a DV sidecar its stats reference) was
    *    VACUUMED since `toVersion` — re-adding a missing path would
    *     404 at read time, and a missing DV sidecar would RESURRECT
    *    deleted rows, so both throw with the path named;
    *  - the table changed under the restore (claim-time full-table
    *    read-set validation, same as replace) — the caller decided to
    *    restore based on state that no longer holds.
    *
    * Restoring to the current state is a version no-op. */
  def commitRestore(s: SparkSession, root: String, table: String,
                    toVersion: Long, maxRetries: Int = 5): Long = {
    val target = manifestRows(s, root, toVersion)
      .collect { case (t, f, st) if t == table => (t, f, st) }
    require(target.nonEmpty,
      s"commitRestore: table $table absent from snapshot v$toVersion")
    val absRoot = Paths.get(root).toAbsolutePath.normalize()
    target.foreach { case (_, f, st) =>
      require(Files.exists(absRoot.resolve(f)),
        s"commitRestore: $f of snapshot v$toVersion was vacuumed — " +
          "the snapshot is no longer restorable")
      dvRefOf(st).foreach { case (side, _) =>
        require(Files.exists(absRoot.resolve(side)),
          s"commitRestore: DV sidecar $side of snapshot v$toVersion was " +
            "vacuumed — restoring without it would resurrect deleted rows")
      }
    }
    val targetMap = target.map { case (_, f, st) => (f, st) }.toMap
    try casCommit(s, root, { base =>
      require(base > 0, s"no committed snapshot at $root")
      val cur = manifestRows(s, root, base)
        .collect { case (t, f, st) if t == table => (f, st) }
      if (cur.toMap == targetMap && cur.size == targetMap.size)
        throw new RestoreNoop(base) // already at the target state
      deltaOrFull(s, root, base, Seq(table), target)
    }, maxRetries)
    catch { case n: RestoreNoop => n.version }
  }

  /** Control-flow carrier for [[commitRestore]]'s no-op case. */
  private final class RestoreNoop(val version: Long)
    extends RuntimeException(s"restore no-op at v$version")

  // --------------------------------------------- timestamp time travel

  /** Readable versions with MONOTONIC commit wall-clocks. The raw
    * signal is the `_ts` marker each claim stamps at commit time —
    * in-claim, so export/replication ship it and a promoted replica
    * serves the SOURCE's history clock (dir mtimes, the pre-`_ts`
    * vintage fallback, read "copy o'clock" after any relocation);
    * like Delta's commit-file timestamps these can regress (clock
    * skew), so each version's time is adjusted to `max(own,
    * predecessor)` — resolution below is then well-defined even over
    * a skewed history. */
  private def versionTimes(root: String): Seq[(Long, Long)] = {
    val vs = claimedVersions(root).filter(mainVisible(root, _))
    var prev = Long.MinValue
    vs.map { v =>
      val tsFile = Paths.get(root, "manifest", s"v$v", "_ts")
      val raw =
        if (Files.exists(tsFile))
          new String(Files.readAllBytes(tsFile), "UTF-8").trim.toLong
        else Files.getLastModifiedTime(
          Paths.get(root, "manifest", s"v$v")).toMillis
      prev = math.max(prev, raw)
      (v, prev)
    }
  }

  /** Monotonic-adjusted commit time of version `v`, ms epoch. */
  def commitTimeMs(root: String, v: Long): Long =
    versionTimes(root).collectFirst { case (`v`, t) => t }.getOrElse(
      throw new IllegalArgumentException(s"no readable snapshot v$v at $root"))

  /** `TIMESTAMP AS OF`: the newest version committed at or before
    * `tsMillis` — Delta/Iceberg timestamp travel. Throws when the
    * instant predates the first retained commit (the history a vacuum
    * already collected cannot be resurrected) — same contract as
    * Delta's `timestampAsOf` below the earliest commit. */
  def versionAsOf(root: String, tsMillis: Long): Long = {
    val times = versionTimes(root)
    require(times.nonEmpty, s"no committed snapshot at $root")
    times.takeWhile(_._2 <= tsMillis).lastOption.map(_._1).getOrElse(
      throw new IllegalArgumentException(
        s"timestamp $tsMillis predates the earliest retained commit " +
          s"(v${times.head._1} at ${times.head._2})"))
  }

  /** Read `table` as of a wall-clock instant. */
  def readTableAsOf(s: SparkSession, root: String, table: String,
                    tsMillis: Long): DataFrame =
    readTable(s, root, table, versionAsOf(root, tsMillis))

  /** SHOW TABLES: every table in the snapshot with its file count and
    * row count — metadata arithmetic ([[countRows]] per table: footer
    * counts minus DV positions; stat-less vintages scan only their
    * own files). The catalog-listing surface a root needs once it
    * holds more than one table. */
  def listTables(s: SparkSession, root: String,
                 version: Long = -1L): DataFrame = {
    import s.implicits._
    val v = if (version > 0) version else snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    manifestRows(s, root, v)
      .groupBy(_._1).toSeq
      .map { case (t, rows) =>
        (t, rows.size.toLong, countRows(s, root, t, v)) }
      .sortBy(_._1)
      .toDF("table_name", "n_files", "n_rows")
  }

  /** DESCRIBE HISTORY: one row per readable commit — (version,
    * commit_ts, operation) — from the `_op` marker each claim carries
    * (claims of an older vintage read "unknown"). Driver-side
    * metadata; the operation names are the public commit methods
    * (`commitAppendRanged`, `commitDeleteVectors`, `compactTable`,
    * …), so the log doubles as the audit trail of WHAT maintenance
    * ran when. */
  def tableHistory(s: SparkSession, root: String): DataFrame = {
    import s.implicits._
    versionTimes(root).map { case (v, t) =>
      val opFile = Paths.get(root, "manifest", s"v$v", "_op")
      val op =
        if (Files.exists(opFile))
          new String(Files.readAllBytes(opFile), "UTF-8")
        else "unknown"
      (v, new java.sql.Timestamp(t), op)
    }.toDF("version", "commit_ts", "operation")
  }

  // ------------------------------------------------- CHECK constraints

  private def checkDir(root: String): Path = Paths.get(root, "manifest")
  // '=' separates table from constraint name in the marker filename:
  // it is the one byte EXCLUDED from both identifier charsets below,
  // so the split is unambiguous. A '-'-family separator is not
  // ('check-a--b--c' parses as both table 'a'/constraint 'b--c' and
  // table 'a--b'/constraint 'c', cross-enforcing constraints between
  // the two tables). layoutKey carries this contract.
  private def checkIdents(table: String, name: String): Unit = {
    require(name.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"unsafe constraint name: $name")
    require(table.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"unsafe table name: $table") // the marker filename embeds it
  }

  /** Claim-sidecar marker name of one registered CHECK constraint.
    * `=` — the one byte excluded from both identifier charsets — can't
    * be used here (Spark's hidden-file filter exempts `_x=y` names),
    * so the table/name split is length-prefixed instead:
    * `_check_<len(table)>.<table>.<name>` parses unambiguously for any
    * legal identifiers. */
  private def checkMarkerName(table: String, name: String): String = {
    checkIdents(table, name)
    s"_check_${table.length}.$table.$name"
  }

  /** The marker-name prefix every constraint of `table` shares. */
  private def checkMarkerPrefix(table: String): String =
    s"_check_${table.length}.$table."

  /** Resolve every claim-sidecar marker under `prefix` to its NEWEST
    * bytes — the registry read shared by CHECK constraints (and any
    * later marker-registered metadata): newest claim wins per name, so
    * a re-registration or tombstone in a later claim shadows the
    * original, and [[vacuum]]'s marker carry keeps the resolution
    * intact below the retention floor. Cost: one directory listing per
    * retained claim — metadata-sized, bounded by vacuum. */
  private def claimMarkers(root: String,
                           prefix: String): Map[String, Array[Byte]] = {
    val seen = scala.collection.mutable.HashMap[String, Array[Byte]]()
    claimedVersions(root).reverseIterator.foreach { v =>
      val d = Paths.get(root, "manifest", s"v$v")
      if (Files.isDirectory(d)) {
        val l = Files.list(d)
        try l.iterator().asScala.foreach { p =>
          val n = p.getFileName.toString
          if (n.startsWith(prefix) && !seen.contains(n))
            seen(n) = Files.readAllBytes(p)
        } finally l.close()
      }
    }
    seen.toMap
  }

  /** Order-stable fingerprint of `table`'s effective CHECK registry —
    * what the claim loop compares to decide whether a published batch
    * must re-validate before claiming. */
  private def checkFingerprint(root: String, table: String): String =
    checkConstraints(root, table).toSeq.sorted
      .map { case (n, e) => s"$n=$e" }.mkString("\u0000")

  /** Register a CHECK constraint on `table` (Delta `ALTER TABLE ADD
    * CONSTRAINT`): from this moment EVERY write path — append, multi-
    * table, MERGE, UPDATE rewrite, compaction — validates its published
    * files against the predicate before the claim, so a violating
    * batch can never become visible (the files stay unclaimed and
    * vacuum collects them). ANSI CHECK semantics: a NULL predicate
    * PASSES; a row fails only when the predicate is FALSE. Like
    * Delta, registration scans the CURRENT table once and refuses if
    * existing data already violates. Names are immutable —
    * [[dropCheckConstraint]] first. Enforcement cost is one
    * column-pruned scan of each commit's OWN files (never the
    * table).
    *
    * Registration is a METADATA COMMIT, serialized with every data
    * commit by the version CAS (the `_schema_`/`_txn_` sidecar idiom):
    * the existing-data scan validates the attempt's claim BASE, and
    * winning the claim proves nothing committed between that scan and
    * the registration becoming visible — a racing append forces a
    * retry that re-validates against the new base, so a violating
    * commit can never slip between scan and link. The other direction
    * is fenced in [[casCommit]]: a writer whose publish validated
    * under the OLD registry re-validates its published files at claim
    * time when the registry fingerprint moved. Cost: one commit claim
    * per constraint DDL — the price of never coexisting with an
    * unvalidated row. */
  def addCheckConstraint(s: SparkSession, root: String, table: String,
                         name: String, exprText: String,
                         maxRetries: Int = 5): Unit = {
    val marker = checkMarkerName(table, name)
    require(exprText.trim.nonEmpty, "empty CHECK predicate")
    val pred = expr(exprText) // parse errors surface at registration
    val _ = casCommit(s, root, { base =>
      if (checkConstraints(root, table).contains(name))
        throw new IllegalStateException( // immutable names, as before
          s"CHECK $name already exists on $table (drop it first)")
      if (base > 0 && manifestRows(s, root, base).exists(_._1 == table)) {
        val bad = readTable(s, root, table, base)
          .filter(coalesce(pred, lit(true)) === false).count()
        require(bad == 0L,
          s"cannot add CHECK $name to $table: $bad existing rows violate '$exprText'")
      }
      deltaOrFull(s, root, base, Nil, Nil)
        .copy(extras = Seq(marker -> exprText.getBytes("UTF-8")))
    }, maxRetries)
  }

  /** Remove a CHECK constraint — a tombstone claim (empty marker
    * bytes) that shadows the registration; unknown names are a no-op.
    * Legacy loose-file markers (pre-sidecar roots) are deleted in
    * place. Uses the thread's active session for the tombstone commit
    * (the signature predates the claim-sidecar registry). */
  def dropCheckConstraint(root: String, table: String, name: String): Unit = {
    checkIdents(table, name)
    // legacy loose files: current '=' separator and the pre-r11 '--'
    val _ = Files.deleteIfExists(checkDir(root).resolve(s"check-$table=$name"))
    val _2 = Files.deleteIfExists(checkDir(root).resolve(s"check-$table--$name"))
    val live = claimMarkers(root, checkMarkerPrefix(table))
      .get(checkMarkerName(table, name)).exists(_.nonEmpty)
    if (live) {
      val s = SparkSession.active
      val _3 = casCommit(s, root, { base =>
        deltaOrFull(s, root, base, Nil, Nil)
          .copy(extras = Seq(checkMarkerName(table, name) -> Array.empty[Byte]))
      }, 5)
    }
  }

  /** Registered CHECK constraints of `table`: name → predicate text.
    * Claim-sidecar markers are authoritative (newest wins; empty bytes
    * = dropped); loose `manifest/check-<table>=<name>` files — and the
    * pre-r11 `check-<table>--<name>` form — are honored as LEGACY
    * registrations from older roots (a constraint persisted by an
    * earlier build must not silently stop enforcing), shadowed by any
    * sidecar entry of the same name. */
  def checkConstraints(root: String, table: String): Map[String, String] = {
    val legacy: Map[String, String] = {
      val dir = checkDir(root)
      if (!Files.isDirectory(dir)) Map.empty
      else {
        val eq = s"check-$table="
        val dashes = s"check-$table--"
        val l = Files.list(dir)
        try l.iterator().asScala
          .map(_.getFileName.toString)
          .flatMap { n =>
            // '=' files can't collide ('=' excluded from identifiers);
            // '--' is ambiguous by construction — parse it only when no
            // '=' is present, at the FIRST '--' (the historical writer)
            if (n.startsWith(eq)) Some(n.substring(eq.length) -> n)
            else if (!n.contains("=") && n.startsWith(dashes))
              Some(n.substring(dashes.length) -> n)
            else None
          }
          .map { case (name, n) =>
            name -> new String(Files.readAllBytes(dir.resolve(n)), "UTF-8") }
          .toMap
        finally l.close()
      }
    }
    val prefix = checkMarkerPrefix(table)
    val sidecar = claimMarkers(root, prefix).map { case (n, bytes) =>
      n.substring(prefix.length) ->
        (if (bytes.isEmpty) None else Some(new String(bytes, "UTF-8")))
    }
    val dropped = sidecar.collect { case (n, None) => n }.toSet
    (legacy -- dropped) ++ sidecar.collect { case (n, Some(e)) => n -> e }
  }

  // ------------------------------------------------- named streams (CDC)

  /** Claim-sidecar marker of a named STREAM object (Snowflake
    * `CREATE STREAM s ON TABLE t`): bytes = `{"table":"t","offset":N}`
    * where N is the last CONSUMED source version — `SELECT ... FROM s`
    * serves the change feed over `(N, current]`, and a consuming DML
    * advances N atomically with its own commit. Newest wins; empty
    * bytes = DROP STREAM tombstone. Carried by vacuum and shipped by
    * replication like every other registry marker. */
  private def streamMarkerName(name: String): String = {
    require(name.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"unsafe stream name: $name")
    s"_stream_$name"
  }

  private val streamJsonRe =
    """\{"table":"([A-Za-z0-9_.-]+)","offset":(\d+)(?:,"mode":"(append_only)")?\}""".r

  /** The stream's (source table, last-consumed version), or None if
    * the name was never created or was dropped. */
  def streamDef(root: String, name: String): Option[(String, Long)] =
    streamDefFull(root, name).map { case (t, o, _) => (t, o) }

  /** Full stream definition: (source table, last-consumed version,
    * APPEND_ONLY?). Pre-mode markers parse as full-feed streams. */
  def streamDefFull(root: String, name: String): Option[(String, Long, Boolean)] =
    claimMarkers(root, streamMarkerName(name))
      .get(streamMarkerName(name)).filter(_.nonEmpty)
      .map(b => new String(b, "UTF-8") match {
        case streamJsonRe(t, o, m) => (t, o.toLong, m != null)
        case other => throw new IllegalStateException(
          s"corrupt stream marker for $name: $other")
      })

  private def streamMarkerJson(table: String, offset: Long,
                               appendOnly: Boolean): Array[Byte] =
    (s"""{"table":"$table","offset":$offset""" +
      (if (appendOnly) ""","mode":"append_only"}""" else "}"))
      .getBytes("UTF-8")

  /** All live stream names of `root` (enumeration for the SQL
    * rewrite and SHOW STREAMS). Memoized by (root, version): the SQL
    * surface consults this on EVERY statement (the stream-read
    * rewrite), and the underlying claim-dir walk would otherwise tax
    * multi-statement scripts that never touch a stream; stream state
    * changes only through commits, so the version key invalidates
    * exactly when it can change. */
  def streamNames(root: String): Seq[String] = {
    val key = (root, snapshotVersion(root))
    val got = streamNamesMemo.get(key)
    if (got != null) got
    else {
      val names = claimMarkers(root, "_stream_").collect {
        case (n, b) if b.nonEmpty => n.substring("_stream_".length)
      }.toSeq.sorted
      if (streamNamesMemo.size > 256) streamNamesMemo.clear() // fixture-root cap
      streamNamesMemo.put(key, names)
      names
    }
  }

  private val streamNamesMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Seq[String]]()

  /** `ALTER TABLE a SWAP WITH b` — Snowflake's blue-green publish
    * verb: ONE claim re-keys a's manifest rows to b and b's to a (by
    * reference — zero data read or written, DV/bloom sidecars travel
    * with their files) and swaps the tables' per-table metadata
    * registry — schema registrations, CHECK constraints, properties
    * (incl. comments), grants + ACL closures, policy attachments,
    * ANALYZE stats — emitting tombstones where only one side carried
    * an entry, so nothing leaks across the swap. Readers at any
    * version see both tables swapped or neither; the pre-swap
    * snapshot time-travels. Refuses loudly when a live STREAM or a
    * committed ANN index references either table (their cursors bind
    * the NAME to a commit history the swap rewrites — Snowflake
    * likewise invalidates streams on swap; re-create them on the
    * post-swap name instead of silently mis-feeding). */
  def commitSwapTables(s: SparkSession, root: String, a: String, b: String,
                       maxRetries: Int = 5): Long = {
    require(a != b, s"SWAP WITH: cannot swap $a with itself")
    casCommit(s, root, { base =>
      val rows = manifestRows(s, root, base)
      require(rows.exists(_._1 == a) ||
        registeredSchema(s, root, a, base).isDefined, s"unknown table $a")
      require(rows.exists(_._1 == b) ||
        registeredSchema(s, root, b, base).isDefined, s"unknown table $b")
      streamNames(root).foreach { n =>
        val src = streamDef(root, n).map(_._1)
        require(!src.contains(a) && !src.contains(b),
          s"SWAP WITH: stream $n reads ${src.get} — drop it first and " +
            "re-create on the post-swap name")
      }
      claimMarkers(root, "_annidx_").filter(_._2.nonEmpty).foreach {
        case (n, bytes) =>
          val src = new String(bytes, "UTF-8").linesIterator
            .find(_.startsWith("src=")).map(_.substring(4))
          require(!src.contains(a) && !src.contains(b),
            s"SWAP WITH: ann index ${n.substring("_annidx_".length)} " +
              s"covers ${src.get} — rebuild it on the post-swap name")
      }
      // MATERIALIZED VIEWs bind the same way: the mview's txn ledger
      // cursors the SOURCE name's commit history, and the mview's own
      // CONTENT table is a manifest table the swap would re-key — a
      // refresh after either swap would absorb the whole flip as a
      // delete+insert delta (Snowflake suspends MVs on swap instead)
      claimMarkers(root, "_mview_").filter(_._2.nonEmpty).foreach {
        case (n, bytes) =>
          val mv = n.substring("_mview_".length)
          val src = new String(bytes, "UTF-8").linesIterator
            .find(_.startsWith("src=")).map(_.substring(4))
          require(!src.contains(a) && !src.contains(b),
            s"SWAP WITH: materialized view $mv reads ${src.get} — drop " +
              "it first and re-create on the post-swap name")
          require(mv != a && mv != b,
            s"SWAP WITH: $mv is a materialized view's content table — " +
              "drop the view first")
      }
      val adds = rows.collect {
        case (t, f, st) if t == a => (b, f, st)
        case (t, f, st) if t == b => (a, f, st)
      }
      val removes = rows.collect {
        case (t, f, _) if t == a || t == b => (t, f)
      }
      // length-prefixed families swap by prefix rename; exact-name
      // families swap the single marker — absences TOMBSTONE so a
      // one-sided entry cannot survive on both names
      def prefixSwap(pA: String, pB: String): Seq[(String, Array[Byte])] = {
        val am = claimMarkers(root, pA).filter(_._2.nonEmpty)
        val bm = claimMarkers(root, pB).filter(_._2.nonEmpty)
        val moved = am.toSeq.map { case (n, x) =>
          (pB + n.substring(pA.length)) -> x } ++
          bm.toSeq.map { case (n, x) => (pA + n.substring(pB.length)) -> x }
        val newNames = moved.map(_._1).toSet
        val tombs = (am.keySet ++ bm.keySet).diff(newNames).toSeq.sorted
          .map(_ -> Array.empty[Byte])
        moved.sortBy(_._1) ++ tombs
      }
      def exactSwap(nA: String, nB: String): Seq[(String, Array[Byte])] = {
        val va = claimMarker(root, nA)
        val vb = claimMarker(root, nB)
        Seq(nB -> va.getOrElse(Array.empty[Byte]),
          nA -> vb.getOrElse(Array.empty[Byte]))
          .filter { case (n, x) => x.nonEmpty || claimMarker(root, n).isDefined }
      }
      val extras =
        prefixSwap(checkMarkerPrefix(a), checkMarkerPrefix(b)) ++
          prefixSwap(propMarkerPrefix(a), propMarkerPrefix(b)) ++
          prefixSwap(grantMarkerPrefix(a), grantMarkerPrefix(b)) ++
          exactSwap(schemaMarker(a), schemaMarker(b)) ++
          exactSwap(policiesMarker(a), policiesMarker(b)) ++
          exactSwap(statsMarkerName(a), statsMarkerName(b)) ++
          exactSwap(aclOnMarkerName(a), aclOnMarkerName(b))
      deltaOrFull(s, root, base, Nil, adds, removes)
        .copy(extras = extras.distinctBy(_._1))
    }, maxRetries)
  }

  // --------------------------------------------- materialized views (SQL)

  /** Claim-sidecar marker of a registered MATERIALIZED VIEW: line
    * format `src=<table>`, `keys=<k1,k2,...>`, `val=<expr>`,
    * `sum=<alias>`, `cnt=<alias>`. The view's CONTENT is the manifest
    * table named like the view, maintained by REFRESH through the
    * row-level IVM path ([[Views.refreshAggFromFeed]] — the counting
    * algorithm: O(changed rows + |MV|) through appends, DV deletes,
    * updates, even compactions); the marker is the definition the
    * statement surface parses once and every refresh replays. */
  private def mviewMarkerName(name: String): String = {
    require(name.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"unsafe view name: $name")
    s"_mview_$name"
  }

  def mviewDefs(root: String)
      : Map[String, (String, Seq[String], String, String, String)] =
    claimMarkers(root, "_mview_").collect {
      case (n, b) if b.nonEmpty =>
        val kv = new String(b, "UTF-8").split("\n")
          .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }
          .toMap
        n.substring("_mview_".length) ->
          ((kv("src"), kv("keys").split(",").toSeq, kv("val"),
            kv("sum"), kv("cnt")))
    }

  def createMview(s: SparkSession, root: String, name: String,
                  srcTable: String, keys: Seq[String], valExpr: String,
                  sumAlias: String, cntAlias: String,
                  maxRetries: Int = 5): Long = {
    require(keys.nonEmpty && keys.distinct.size == keys.size,
      s"CREATE MATERIALIZED VIEW $name: keys must be non-empty and distinct")
    // the aliases become the CONTENT table's column names — refuse at
    // DDL time what the refresh could not store (`SELECT total_v FROM
    // user_mv` must work after `SUM(v) AS total_v`)
    require(sumAlias.matches("[A-Za-z_][A-Za-z0-9_]*") &&
      cntAlias.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"CREATE MATERIALIZED VIEW $name: aliases must be plain identifiers")
    require(sumAlias != cntAlias && !keys.contains(sumAlias) &&
      !keys.contains(cntAlias),
      s"CREATE MATERIALIZED VIEW $name: aliases ($sumAlias, $cntAlias) " +
        "must be distinct from each other and from the keys")
    casCommit(s, root, { base =>
      require(!mviewDefs(root).contains(name),
        s"materialized view $name already exists (DROP it first)")
      require(base > 0 && manifestRows(s, root, base).exists(_._1 == srcTable),
        s"CREATE MATERIALIZED VIEW $name: unknown source table $srcTable")
      require(!manifestRows(s, root, base).exists(_._1 == name),
        s"CREATE MATERIALIZED VIEW $name: a table of that name exists")
      deltaOrFull(s, root, base, Nil, Nil).copy(extras = Seq(
        mviewMarkerName(name) ->
          (s"src=$srcTable\nkeys=${keys.mkString(",")}\nval=$valExpr\n" +
            s"sum=$sumAlias\ncnt=$cntAlias").getBytes("UTF-8")))
    }, maxRetries)
  }

  def dropMview(s: SparkSession, root: String, name: String,
                maxRetries: Int = 5): Long =
    casCommit(s, root, { base =>
      require(mviewDefs(root).contains(name),
        s"unknown materialized view $name")
      deltaOrFull(s, root, base, Nil, Nil).copy(extras = Seq(
        mviewMarkerName(name) -> Array.empty[Byte]))
    }, maxRetries)

  // ------------------------------------------------- named tasks (DAGs)

  /** Claim-sidecar marker of a named TASK (Snowflake `CREATE TASK t
    * [SCHEDULE = '<cron>'] [AFTER dep] AS <statement>`): first line
    * `after=<dep or ->`, second line `sched=<cron or ->` (markers of
    * the pre-schedule vintage omit it — the parser treats a line-2
    * without the `sched=` prefix as the body), the rest is the task's
    * single-statement body verbatim. The reference's whole operating
    * model is a cron-driven scheduler submitting statements — tasks
    * are that DAG as warehouse objects: AFTER edges form the graph,
    * SCHEDULE carries the cron text the reference keeps in its DAG
    * files (execution stays driver-side per SURVEY §2.1 O7 — the
    * reference's own split), EXECUTE TASK runs a task and its
    * descendants in dependency order. Newest wins; empty bytes =
    * DROP TASK tombstone; carried by vacuum, shipped by
    * replication. */
  private def taskMarkerName(name: String): String = {
    require(name.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"unsafe task name: $name")
    s"_task_$name"
  }

  /** All live tasks of `root`:
    * name → (AFTER dependency, SCHEDULE cron, body). */
  def taskDefsFull(root: String)
      : Map[String, (Option[String], Option[String], String)] =
    claimMarkers(root, "_task_").collect {
      case (n, b) if b.nonEmpty =>
        val text = new String(b, "UTF-8")
        val nl = text.indexOf('\n')
        require(nl > 0 && text.startsWith("after="),
          s"corrupt task marker $n")
        val dep = text.substring(6, nl).trim match {
          case "-" => None
          case d => Some(d)
        }
        val rest = text.substring(nl + 1)
        val (sched, body) =
          if (rest.startsWith("sched=")) {
            val nl2 = rest.indexOf('\n')
            require(nl2 > 0, s"corrupt task marker $n")
            (rest.substring(6, nl2).trim match {
              case "-" => None
              case c => Some(c)
            }, rest.substring(nl2 + 1))
          } else (None, rest) // pre-schedule vintage
        n.substring("_task_".length) -> ((dep, sched, body))
    }

  /** All live tasks of `root`: name → (AFTER dependency, body). */
  def taskDefs(root: String): Map[String, (Option[String], String)] =
    taskDefsFull(root).map { case (n, (dep, _, body)) => n -> ((dep, body)) }

  /** Shape-validate a 5-field cron expression (minute hour
    * day-of-month month day-of-week; `*`, lists, ranges, steps) —
    * CREATE-time refusal, the q330 discipline: a typo'd schedule must
    * die at registration, not silently never fire in the driver. */
  private def validateCron(name: String, text: String): Unit = {
    val field = "(\\*|[0-9]+(-[0-9]+)?)(/[0-9]+)?" +
      "(,(\\*|[0-9]+(-[0-9]+)?)(/[0-9]+)?)*"
    val fields = text.trim.split("\\s+")
    require(fields.length == 5 && fields.forall(_.matches(field)),
      s"CREATE TASK $name: SCHEDULE must be a 5-field cron " +
        s"(minute hour day-of-month month day-of-week), got '$text'")
  }

  /** `CREATE TASK name [SCHEDULE = '<cron>'] [AFTER dep] AS
    * <statement>` — one metadata claim. Existing names refuse (DROP
    * TASK first); an AFTER dependency must already exist (a dangling
    * edge would silently never run), and the new edge must not close
    * a cycle (walk the AFTER chain — it is acyclic by induction, so
    * the walk terminates). SCHEDULE and AFTER are mutually exclusive
    * (the Snowflake rule: a task fires on its own clock OR on its
    * predecessor's completion, never both); the cron text
    * shape-validates at CREATE. */
  def createTask(s: SparkSession, root: String, name: String,
                 after: Option[String], sql: String,
                 schedule: Option[String] = None,
                 maxRetries: Int = 5): Long = {
    require(sql.trim.nonEmpty, s"CREATE TASK $name: empty body")
    require(!sql.trim.startsWith("sched="),
      s"CREATE TASK $name: body cannot start with the reserved token 'sched='")
    require(after.isEmpty || schedule.isEmpty,
      s"CREATE TASK $name: SCHEDULE and AFTER are mutually exclusive — " +
        "a task fires on its own clock or on its predecessor's completion")
    schedule.foreach(validateCron(name, _))
    casCommit(s, root, { base =>
      val defs = taskDefs(root)
      require(!defs.contains(name),
        s"task $name already exists (DROP TASK first)")
      after.foreach { dep =>
        require(defs.contains(dep),
          s"CREATE TASK $name: unknown AFTER dependency $dep")
        // cycle check: name is new, so a cycle could only close if
        // dep's chain reached name — it cannot (name isn't registered
        // yet), but a SELF-edge must refuse explicitly
        require(dep != name, s"CREATE TASK $name: AFTER itself")
      }
      deltaOrFull(s, root, base, Nil, Nil).copy(extras = Seq(
        taskMarkerName(name) ->
          (s"after=${after.getOrElse("-")}\n" +
            s"sched=${schedule.map(_.trim).getOrElse("-")}\n$sql")
            .getBytes("UTF-8")))
    }, maxRetries)
  }

  /** `DROP TASK name` — tombstone claim; refuses unknown names and
    * names other tasks depend on (dropping mid-graph would silently
    * orphan the descendants). */
  def dropTask(s: SparkSession, root: String, name: String,
               maxRetries: Int = 5): Long =
    casCommit(s, root, { base =>
      val defs = taskDefs(root)
      require(defs.contains(name), s"unknown task $name")
      val dependents = defs.collect {
        case (n, (Some(dep), _)) if dep == name => n }
      require(dependents.isEmpty,
        s"DROP TASK $name: task(s) ${dependents.mkString(", ")} run " +
          "AFTER it — drop them first")
      deltaOrFull(s, root, base, Nil, Nil).copy(extras = Seq(
        taskMarkerName(name) -> Array.empty[Byte]))
    }, maxRetries)

  /** `CREATE STREAM name ON TABLE t [APPEND_ONLY = TRUE]` — one
    * metadata claim registering the cursor at the CURRENT version
    * (the stream starts empty: only commits after creation are
    * changes, the Snowflake contract). APPEND_ONLY marks the
    * ingest-pipeline default mode: reads filter to appended rows and
    * rewrite intervals SKIP (cursor still advances) instead of
    * feeding deletes downstream. Existing names refuse (DROP STREAM
    * first); the table must exist. */
  def createStream(s: SparkSession, root: String, name: String,
                   table: String, appendOnly: Boolean = false,
                   maxRetries: Int = 5): Long =
    casCommit(s, root, { base =>
      require(base > 0 && manifestRows(s, root, base).exists(_._1 == table),
        s"CREATE STREAM: no table $table in $root")
      require(streamDef(root, name).isEmpty,
        s"stream $name already exists (DROP STREAM first)")
      deltaOrFull(s, root, base, Nil, Nil).copy(extras = Seq(
        streamMarkerName(name) -> streamMarkerJson(table, base, appendOnly)))
    }, maxRetries)

  /** `DROP STREAM name` — tombstone claim; unknown names refuse
    * loudly (a typo'd drop silently succeeding hides a live
    * consumer). */
  def dropStream(s: SparkSession, root: String, name: String,
                 maxRetries: Int = 5): Long =
    casCommit(s, root, { base =>
      require(streamDef(root, name).isDefined, s"unknown stream $name")
      deltaOrFull(s, root, base, Nil, Nil).copy(extras = Seq(
        streamMarkerName(name) -> Array.empty[Byte]))
    }, maxRetries)

  /** The consuming append: `batch` lands on `table` AND the stream's
    * offset advances to `toOffset`, in ONE claim — a reader at any
    * version sees both or neither, so a crash (or a re-driven
    * scheduler) can never double-apply an interval. Claim-time
    * validation pins the offset this consumption READ from: a racing
    * consumer that advanced it first wins, and this commit fails
    * LOUDLY instead of applying the same delta twice (the
    * exactly-once rule every ledger commit here follows). */
  def commitConsumeStream(s: SparkSession, root: String, name: String,
                          table: String, batch: DataFrame,
                          fromOffset: Long, toOffset: Long,
                          maxRetries: Int = 5): Long = {
    val hint = nextVersion(root)
    val relFiles = publishData(s, root, hint, table, batch)
    val newRows = relFiles.map(f => (table, f, null: String))
    val (srcTable, _, appendOnly) = streamDefFull(root, name).getOrElse(
      throw new IllegalArgumentException(s"unknown stream $name"))
    casCommit(s, root, { base =>
      val cur = streamDef(root, name)
      if (!cur.exists(_._2 == fromOffset))
        throw new IllegalStateException(
          s"stream $name was consumed concurrently (offset " +
            s"${cur.map(_._2).getOrElse(-1L)}, this consumption read " +
            s"from $fromOffset) — re-read the stream")
      deltaOrFull(s, root, base, Nil, newRows).copy(extras = Seq(
        streamMarkerName(name) ->
          streamMarkerJson(srcTable, toOffset, appendOnly)))
    }, maxRetries)
  }

  // ------------------------------------------------- table properties

  /** Claim-sidecar marker name of one table property — the same
    * length-prefixed scheme as [[checkMarkerName]] (unambiguous for
    * any legal identifiers, immune to Spark's hidden-file `_x=y`
    * exemption). Keys follow Delta's dotted convention
    * (`owner`, `delta.appendOnly`, `quality.tier`, ...). */
  private def propMarkerName(table: String, key: String): String = {
    require(key.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"unsafe property key: $key")
    require(table.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"unsafe table name: $table")
    s"_prop_${table.length}.$table.$key"
  }

  private def propMarkerPrefix(table: String): String =
    s"_prop_${table.length}.$table."

  /** `ALTER TABLE ... SET TBLPROPERTIES`: register (or overwrite)
    * key→value metadata on `table` as ONE claim-sidecar commit —
    * serialized with every data commit by the version CAS, carried
    * by vacuum like any other marker, visible to time travel's
    * history. Values must be non-empty (empty bytes are the tombstone
    * encoding, [[unsetTableProperties]]). Requires the table to exist
    * — properties on a name that was never committed would silently
    * attach to nothing. */
  def setTableProperties(s: SparkSession, root: String, table: String,
                         props: Map[String, String],
                         maxRetries: Int = 5): Unit = {
    require(props.nonEmpty, "SET TBLPROPERTIES: empty property list")
    props.foreach { case (k, v) =>
      val _ = propMarkerName(table, k) // validates the key
      require(v.nonEmpty, s"SET TBLPROPERTIES: empty value for '$k'")
    }
    val _ = casCommit(s, root, { base =>
      require(base > 0 && manifestRows(s, root, base).exists(_._1 == table),
        s"SET TBLPROPERTIES: no table $table in $root")
      deltaOrFull(s, root, base, Nil, Nil).copy(extras =
        props.toSeq.sortBy(_._1).map { case (k, v) =>
          propMarkerName(table, k) -> v.getBytes("UTF-8") })
    }, maxRetries)
  }

  /** `ALTER TABLE ... UNSET TBLPROPERTIES`: tombstone claims (empty
    * marker bytes) shadowing the registrations; unknown keys are a
    * no-op, like Delta's IF EXISTS default. */
  def unsetTableProperties(s: SparkSession, root: String, table: String,
                           keys: Seq[String], maxRetries: Int = 5): Unit = {
    require(keys.nonEmpty, "UNSET TBLPROPERTIES: empty key list")
    val live = tableProperties(root, table)
    val doomed = keys.filter(live.contains)
    if (doomed.isEmpty) return
    val _ = casCommit(s, root, { base =>
      deltaOrFull(s, root, base, Nil, Nil).copy(extras =
        doomed.sorted.map(k => propMarkerName(table, k) -> Array.empty[Byte]))
    }, maxRetries)
  }

  /** Effective properties of `table`: newest claim wins per key,
    * empty bytes = unset. Metadata-only (one directory listing per
    * retained claim, bounded by vacuum). */
  def tableProperties(root: String, table: String): Map[String, String] = {
    val prefix = propMarkerPrefix(table)
    claimMarkers(root, prefix).collect {
      case (n, bytes) if bytes.nonEmpty =>
        n.substring(prefix.length) -> new String(bytes, "UTF-8")
    }
  }

  // --------------------------------------------------- grants (ACL)

  private def grantMarkerName(table: String, role: String): String = {
    require(role.matches("[A-Za-z0-9_]+"), s"unsafe role name: $role")
    require(table.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"unsafe table name: $table")
    s"_grant_${table.length}.$table.$role"
  }

  private def grantMarkerPrefix(table: String): String =
    s"_grant_${table.length}.$table."

  /** Sticky ACL-closure marker: written by the table's FIRST grant and
    * never tombstoned, so revoking the last grant leaves the table
    * CLOSED (admin-only) instead of silently reopening to everyone —
    * the reopen would be a security hole no warehouse ships. */
  private def aclOnMarkerName(table: String): String =
    s"_aclon_${table.length}.$table"

  /** `GRANT SELECT ON table TO role`: register the grant as a claim-
    * sidecar marker (CAS-serialized, vacuum-carried — the same
    * registry discipline as CHECK constraints and TBLPROPERTIES).
    * Access model: a table with NO grant history is open (the
    * single-user default every pre-grant root relies on); the FIRST
    * grant closes it — from then on only `admin` and granted roles
    * read, enforced at view registration and on the metadata-
    * aggregate fast path — and closure is permanent (see
    * [[aclOnMarkerName]]). */
  def grantSelect(s: SparkSession, root: String, table: String,
                  role: String, maxRetries: Int = 5): Unit = {
    val marker = grantMarkerName(table, role)
    val _ = casCommit(s, root, { base =>
      require(base > 0 && manifestRows(s, root, base).exists(_._1 == table),
        s"GRANT: no table $table in $root")
      deltaOrFull(s, root, base, Nil, Nil)
        .copy(extras = Seq(
          marker -> "SELECT".getBytes("UTF-8"),
          aclOnMarkerName(table) -> "1".getBytes("UTF-8")))
    }, maxRetries)
  }

  /** `REVOKE SELECT ON table FROM role`: tombstone claim; revoking a
    * role that was never granted is a no-op. */
  def revokeSelect(s: SparkSession, root: String, table: String,
                   role: String, maxRetries: Int = 5): Unit = {
    if (!tableGrants(root, table).contains(role)) {
      val _ = grantMarkerName(table, role) // still validates identifiers
      return
    }
    val _ = casCommit(s, root, { base =>
      deltaOrFull(s, root, base, Nil, Nil)
        .copy(extras = Seq(grantMarkerName(table, role) -> Array.empty[Byte]))
    }, maxRetries)
  }

  /** Roles holding SELECT on `table` (newest claim wins, empty bytes
    * = revoked). Metadata-only. */
  def tableGrants(root: String, table: String): Set[String] = {
    val prefix = grantMarkerPrefix(table)
    claimMarkers(root, prefix).collect {
      case (n, bytes) if bytes.nonEmpty => n.substring(prefix.length)
    }.toSet
  }

  // ------------------------------------------- schema-level grants (ACL)

  /** The schema a dotted table name lives in: everything before the
    * LAST dot (`sales.daily.facts` → `sales.daily`); an undotted name
    * has none. */
  private def schemaOf(table: String): Option[String] = {
    val i = table.lastIndexOf('.')
    if (i <= 0) None else Some(table.substring(0, i))
  }

  private def schemaGrantMarkerName(schema: String, role: String): String = {
    require(role.matches("[A-Za-z0-9_]+"), s"unsafe role name: $role")
    require(schema.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"unsafe schema name: $schema")
    s"_grantsch_${schema.length}.$schema.$role"
  }

  private def schemaGrantPrefix(schema: String): String =
    s"_grantsch_${schema.length}.$schema."

  /** Sticky closure marker for a SCHEMA — same never-reopen discipline
    * as [[aclOnMarkerName]]. */
  private def schemaAclOnMarkerName(schema: String): String =
    s"_aclonsch_${schema.length}.$schema"

  /** `GRANT SELECT ON SCHEMA s TO role`: one grant covers every table
    * under the `s.` prefix — a multi-table root does not need
    * per-table statements. Resolution PRECEDENCE: a table with its own
    * grant history is governed by its table-level grants EXCLUSIVELY
    * (the table grant overrides the schema grant, both to narrow and
    * to widen); otherwise the schema's grants decide; otherwise open.
    * Closure is sticky at both levels (revoking the last grant leaves
    * the scope admin-only, never silently reopened). The grant refuses
    * on a schema with no tables — a typo'd GRANT must not "succeed"
    * into a silent no-op. */
  def grantSelectSchema(s: SparkSession, root: String, schema: String,
                        role: String, maxRetries: Int = 5): Unit = {
    val marker = schemaGrantMarkerName(schema, role)
    val _ = casCommit(s, root, { base =>
      require(base > 0 && manifestRows(s, root, base)
          .exists(_._1.startsWith(schema + ".")),
        s"GRANT ON SCHEMA: no table under schema $schema in $root")
      deltaOrFull(s, root, base, Nil, Nil)
        .copy(extras = Seq(
          marker -> "SELECT".getBytes("UTF-8"),
          schemaAclOnMarkerName(schema) -> "1".getBytes("UTF-8")))
    }, maxRetries)
  }

  /** `REVOKE SELECT ON SCHEMA s FROM role`: tombstone claim; revoking
    * a never-granted role is a no-op (identifiers still validate). */
  def revokeSelectSchema(s: SparkSession, root: String, schema: String,
                         role: String, maxRetries: Int = 5): Unit = {
    if (!schemaGrants(root, schema).contains(role)) {
      val _ = schemaGrantMarkerName(schema, role)
      return
    }
    val _ = casCommit(s, root, { base =>
      deltaOrFull(s, root, base, Nil, Nil)
        .copy(extras = Seq(
          schemaGrantMarkerName(schema, role) -> Array.empty[Byte]))
    }, maxRetries)
  }

  /** Roles holding SELECT on schema `schema`. Metadata-only. */
  def schemaGrants(root: String, schema: String): Set[String] = {
    val prefix = schemaGrantPrefix(schema)
    claimMarkers(root, prefix).collect {
      case (n, bytes) if bytes.nonEmpty => n.substring(prefix.length)
    }.toSet
  }

  /** `FSCK REPAIR TABLE`: drop manifest entries whose data files are
    * physically MISSING (out-of-band deletion, storage corruption) so
    * reads stop dying on FileNotFound — Databricks' repair verb. The
    * repair is a normal CAS claim, serialized with writers and visible
    * in DESCRIBE HISTORY; the claim closure re-checks existence
    * against ITS base so a racing append's fresh files are never
    * swept. Dry run reports without committing. Returns
    * (missing, live) file counts. Cost: one existence probe per
    * manifest entry of the table — metadata-sized. */
  def commitFsckRepair(s: SparkSession, root: String, table: String,
                       dryRun: Boolean = false,
                       maxRetries: Int = 5): (Long, Long) = {
    def missingOf(v: Long): (Seq[(String, String)], Int) = {
      val rows = manifestRows(s, root, v).filter(_._1 == table)
      require(rows.nonEmpty, s"FSCK: no table $table in $root")
      (rows.collect {
        case (t, f, _) if !Files.exists(Paths.get(root, f)) => (t, f)
      }, rows.size)
    }
    val v = snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    val (missing, total) = missingOf(v)
    if (dryRun || missing.isEmpty)
      return (missing.size.toLong, (total - missing.size).toLong)
    val _ = casCommit(s, root, { base =>
      val (miss, _) = missingOf(base)
      deltaOrFull(s, root, base, Nil, Nil, removes = miss)
    }, maxRetries)
    (missing.size.toLong, (total - missing.size).toLong)
  }

  /** `GENERATE symlink_format_manifest FOR TABLE t` (Delta's external-
    * reader export): write the table's LIVE file list so engines with
    * no manifest machinery (Trino/Presto/DuckDB) read the listed
    * parquet files directly. REFUSES while any file carries a deletion
    * vector — an external reader cannot apply DVs and would resurrect
    * soft-deleted rows (Delta refuses for the same reason); run `REORG
    * TABLE t APPLY (PURGE)` first. Writes one absolute path per line
    * (sorted) to `<root>/_symlink_format_manifest/<table>/manifest`
    * and returns the file count. The export is a point-in-time
    * snapshot — regenerate after commits, like Delta. Metadata-sized
    * at any scale. */
  def generateSymlinkManifest(s: SparkSession, root: String,
                              table: String): Long = {
    val v = snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    // the export IS a read of the raw bytes — ACL-gated like any scan,
    // and a policy-governed table refuses for every non-admin role
    // (external readers apply no masking/row filters; the exported
    // list would leak what the policies exist to hide)
    val role = s.conf.get("graft.sql.role", "admin")
    requireSelect(root, table, role)
    require(role == "admin" || !tableHasPolicies(root, table),
      s"GENERATE: $table carries masking/row-access policies an " +
        "external reader cannot apply; only admin may export it")
    val rows = manifestRows(s, root, v).filter(_._1 == table)
    require(rows.nonEmpty, s"GENERATE: no table $table in $root")
    val dvd = rows.count { case (_, _, st) =>
      st != null && dvRefOf(st).isDefined }
    require(dvd == 0,
      s"GENERATE: $dvd file(s) of $table carry deletion vectors an " +
        s"external reader cannot apply; run REORG TABLE $table APPLY " +
        "(PURGE) first")
    val dir = Paths.get(root, "_symlink_format_manifest", table)
    val _ = Files.createDirectories(dir)
    val lines = rows.map { case (_, f, _) =>
      Paths.get(root, f).toAbsolutePath.toString }.sorted
    val _2 = Files.write(dir.resolve("manifest"),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    lines.size.toLong
  }

  /** Enforce the grant registry for one read: a table with no grant
    * HISTORY is open to anyone; once any grant ever registered, only
    * `admin` and currently-granted roles read — revoking the last
    * grant leaves it admin-only, never reopened. Fails loudly — a
    * silent empty frame would read as "no rows", not "no access". */
  def requireSelect(root: String, table: String, role: String): Unit = {
    if (role == "admin") return
    // table-level grant history governs EXCLUSIVELY when present —
    // the table grant overrides the schema grant in both directions
    if (claimMarkers(root, aclOnMarkerName(table)).nonEmpty) {
      if (!tableGrants(root, table).contains(role))
        throw new IllegalStateException(
          s"role $role lacks SELECT on $table (granted: " +
            s"${tableGrants(root, table).toSeq.sorted.mkString(", ")})")
      return
    }
    schemaOf(table).foreach { sch =>
      if (claimMarkers(root, schemaAclOnMarkerName(sch)).nonEmpty &&
          !schemaGrants(root, sch).contains(role))
        throw new IllegalStateException(
          s"role $role lacks SELECT on $table (schema $sch is closed; " +
            s"schema grants: ${schemaGrants(root, sch).toSeq.sorted.mkString(", ")})")
    }
  }

  /** Validate just-published files against `table`'s CHECK
    * constraints — one scan of THIS commit's files, column-pruned to
    * the predicates' inputs, all constraints in a single agg pass. On
    * violation the published dir is removed (it was never claimed, so
    * it was never visible) and the write fails loudly with per-
    * constraint row counts. */
  private def enforceChecks(s: SparkSession, root: String, table: String,
                            relFiles: Seq[String]): String = {
    val checks = checkConstraints(root, table).toSeq.sortBy(_._1)
    // MUST render identically to [[checkFingerprint]] (same \u0000
    // separator): the claim-time fence compares the two, and a
    // cosmetic mismatch would make every multi-constraint commit
    // re-scan its published files on every claim — a whole
    // redundant read pass per write at scale
    val fp = checks.map { case (n, e) => s"$n=$e" }.mkString("\u0000")
    if (checks.isEmpty || relFiles.isEmpty) return fp
    val df = s.read.parquet(relFiles.map(f => s"$root/$f"): _*)
    val aggs = checks.map { case (_, e) =>
      sum(when(coalesce(expr(e), lit(true)) === false, 1L).otherwise(0L)) }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val bad = checks.zipWithIndex.collect {
      case ((n, e), i) if !row.isNullAt(i) && row.getLong(i) > 0 =>
        s"$n ('$e': ${row.getLong(i)} rows)"
    }
    if (bad.nonEmpty) {
      relFiles.map(f => Paths.get(root, f).getParent).distinct
        .foreach(Staging.deleteRecursively)
      throw new IllegalArgumentException(
        s"CHECK constraint violation writing $table: ${bad.mkString("; ")}")
    }
    fp
  }

  // ------------------------------------- governance policies (registry)
  // Masking and row-access policies as REGISTERED METADATA, the same
  // claim-sidecar registry CHECK constraints use: `CREATE ... POLICY`
  // persists a definition marker, `ALTER TABLE ... SET/ADD ...`
  // persists the per-table attachment marker, and the SQL read path
  // ([[graft.sources.ManifestSql.tableDF]]) applies whatever is
  // registered for the session's role — policies survive vacuum, ride
  // replication, and cost one metadata walk at registration time, not
  // per row (the rewrite itself is a plain Catalyst projection/filter
  // composed onto the scan; see [[Governance]] for the 100-TB
  // rationale of read-time policies over per-role copies).

  private def policyDefMarker(name: String): String = {
    require(name.matches("[A-Za-z0-9_]+"), s"unsafe policy name: $name")
    s"_policydef_$name"
  }

  private def policiesMarker(table: String): String = {
    require(table.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"unsafe table name: $table")
    s"_policies_$table"
  }

  /** Register a policy definition: `kind` is "mask" (a value rewrite)
    * or "row" (a boolean row filter); `body` is a Spark SQL expression
    * over `argName` that may call `current_role()` (substituted with
    * the session role literal at read time). A metadata commit;
    * duplicate live names refuse. */
  def createPolicy(s: SparkSession, root: String, name: String,
                   kind: String, argName: String, body: String,
                   maxRetries: Int = 5): Unit = {
    require(kind == "mask" || kind == "row",
      s"createPolicy: kind must be mask|row, got $kind")
    require(argName.matches("[A-Za-z0-9_]+"),
      s"unsafe policy argument name: $argName")
    require(body.trim.nonEmpty, "empty policy body")
    // parse errors surface at registration (role substituted by probe)
    val _probe = expr(roleSubstituted(body, "admin"))
    val marker = policyDefMarker(name)
    val _ = casCommit(s, root, { base =>
      require(policyOf(root, name).isEmpty,
        s"policy $name already exists at $root")
      deltaOrFull(s, root, base, Nil, Nil)
        .copy(extras = Seq(marker ->
          s"$kind\n$argName\n$body".getBytes("UTF-8")))
    }, maxRetries)
  }

  /** The live definition of policy `name`: (kind, argName, body). */
  def policyOf(root: String, name: String): Option[(String, String, String)] =
    claimMarkers(root, policyDefMarker(name)).get(policyDefMarker(name))
      .filter(_.nonEmpty)
      .map { bytes =>
        val s = new String(bytes, "UTF-8")
        val i = s.indexOf('\n'); val j = s.indexOf('\n', i + 1)
        (s.substring(0, i), s.substring(i + 1, j), s.substring(j + 1))
      }

  /** `current_role()` → the session role as a literal — policies are
    * ordinary expressions after this one substitution. */
  private[graft] def roleSubstituted(body: String, role: String): String = {
    require(role.matches("[A-Za-z0-9_]+"), s"unsafe role name: $role")
    body.replaceAll("(?i)current_role\\s*\\(\\s*\\)", s"'$role'")
  }

  /** `table`'s registered attachments: (column → masking policy,
    * row-access attachments as (policy, column)). */
  def tablePolicies(root: String,
                    table: String): (Map[String, String], Seq[(String, String)]) = {
    val m = claimMarkers(root, policiesMarker(table))
      .get(policiesMarker(table)).filter(_.nonEmpty)
      .map(b => new String(b, "UTF-8")).getOrElse("")
    val lines = m.split('\n').toSeq.filter(_.nonEmpty)
    val masks = lines.collect { case l if l.startsWith("mask:") =>
      val Array(_, c, p) = l.split(":", 3); c -> p }.toMap
    val rows = lines.collect { case l if l.startsWith("row:") =>
      val Array(_, p, c) = l.split(":", 3); (p, c) }
    (masks, rows)
  }

  def tableHasPolicies(root: String, table: String): Boolean = {
    val (m, r) = tablePolicies(root, table)
    m.nonEmpty || r.nonEmpty
  }

  private def renderPolicies(masks: Map[String, String],
                             rows: Seq[(String, String)]): Array[Byte] =
    (masks.toSeq.sorted.map { case (c, p) => s"mask:$c:$p" } ++
      rows.map { case (p, c) => s"row:$p:$c" }).mkString("\n").getBytes("UTF-8")

  /** Common attach machinery: validate against the CURRENT table
    * schema and policy registry inside the claim attempt, then commit
    * the updated attachment marker — attachments serialize with every
    * other commit on the root. */
  private def commitPolicyChange(s: SparkSession, root: String, table: String)(
      change: (Map[String, String], Seq[(String, String)])
        => (Map[String, String], Seq[(String, String)])): Unit = {
    val _ = casCommit(s, root, { base =>
      val (masks, rows) = tablePolicies(root, table)
      val (m2, r2) = change(masks, rows)
      deltaOrFull(s, root, base, Nil, Nil)
        .copy(extras = Seq(policiesMarker(table) -> renderPolicies(m2, r2)))
    }, 5)
  }

  private def tableSchemaOf(s: SparkSession, root: String,
                            table: String): StructType =
    registeredSchema(s, root, table)
      .getOrElse(readTable(s, root, table).schema)

  /** `ALTER TABLE t MODIFY COLUMN c SET MASKING POLICY p` — SET
    * replaces any existing attachment on the column (Snowflake
    * semantics). */
  def attachMaskingPolicy(s: SparkSession, root: String, table: String,
                          column: String, policy: String): Unit = {
    val (kind, arg, _) = policyOf(root, policy).getOrElse(
      throw new IllegalArgumentException(s"unknown policy $policy"))
    require(kind == "mask",
      s"policy $policy is a $kind policy, not a masking policy")
    val sch = tableSchemaOf(s, root, table)
    require(sch.fieldNames.contains(column),
      s"ALTER TABLE $table: unknown column $column")
    require(arg == column || !sch.fieldNames.contains(arg),
      s"policy $policy's argument name '$arg' collides with a column of $table")
    commitPolicyChange(s, root, table)((m, r) => (m + (column -> policy), r))
  }

  def detachMaskingPolicy(s: SparkSession, root: String, table: String,
                          column: String): Unit =
    commitPolicyChange(s, root, table)((m, r) => (m - column, r))

  /** `ALTER TABLE t ADD ROW ACCESS POLICY p ON (c)` — at most one row
    * policy per table (Snowflake semantics); DROP first to replace. */
  def attachRowPolicy(s: SparkSession, root: String, table: String,
                      policy: String, column: String): Unit = {
    val (kind, arg, _) = policyOf(root, policy).getOrElse(
      throw new IllegalArgumentException(s"unknown policy $policy"))
    require(kind == "row",
      s"policy $policy is a $kind policy, not a row access policy")
    val sch = tableSchemaOf(s, root, table)
    require(sch.fieldNames.contains(column),
      s"ALTER TABLE $table: unknown column $column")
    require(arg == column || !sch.fieldNames.contains(arg),
      s"policy $policy's argument name '$arg' collides with a column of $table")
    commitPolicyChange(s, root, table) { (m, r) =>
      require(r.isEmpty,
        s"$table already has row access policy ${r.head._1} (drop it first)")
      (m, Seq((policy, column)))
    }
  }

  def detachRowPolicy(s: SparkSession, root: String, table: String,
                      policy: String): Unit =
    commitPolicyChange(s, root, table)((m, r) => (m, r.filterNot(_._1 == policy)))

  // ------------------------------------ ANALYZE: persisted table stats

  /** One ANALYZE run's persisted result: the snapshot it described,
    * the exact row count, and per profiled column (nulls, exact NDV,
    * min, max as stat strings — None = all-NULL column). */
  final case class ColStats(nNulls: Long, ndv: Long,
                            min: Option[String], max: Option[String])
  final case class TableStats(version: Long, nRows: Long,
                              cols: Map[String, ColStats])

  private def statsMarkerName(table: String): String = {
    require(table.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"unsafe table name: $table")
    s"_stats_$table"
  }

  /** HLL sketch input for column `c`: the sketch aggregate accepts
    * only INT/BIGINT/STRING/BINARY, so every other type sketches its
    * canonical STRING rendering — deterministic per value, so the
    * baseline and every delta pass agree and sketch unions stay
    * cardinality-correct. */
  private def sketchInput(schema: StructType, c: String): org.apache.spark.sql.Column =
    schema(c).dataType match {
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType | StringType |
           org.apache.spark.sql.types.BinaryType => col(c)
      case _ => col(c).cast("string")
    }

  /** `ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS ...]` — compute
    * exact table/column statistics (the [[Stats]] one-pruned-pass-per-
    * column shape: each pass scans ONE column, distinct aggregates
    * map-side; the textbook single-scan multi-distinct Expand plan
    * measured 9.5× slower) and PERSIST them as a claim-sidecar marker,
    * where the metadata-aggregate fast path and `SHOW STATS` read them
    * back with zero data I/O. The marker records the snapshot version
    * analyzed; consumers compare the table's CURRENT file set against
    * that version's to decide freshness (exactness survives unrelated
    * commits — policy DDL, other tables — and dies with the first data
    * change). Returns the stats relation (what SHOW STATS serves). */
  def analyzeTable(s: SparkSession, root: String, table: String,
                   columns: Seq[String], maxRetries: Int = 5): DataFrame = {
    val v = snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    require(manifestRows(s, root, v).exists(_._1 == table),
      s"ANALYZE: unknown table $table at v$v")
    val df = readTable(s, root, table, v)
    columns.foreach(c => require(df.columns.contains(c),
      s"ANALYZE $table: unknown column $c"))
    val nRows = countRows(s, root, table, v) // metadata where possible
    // each pruned pass ALSO folds an HLL sketch of the column — the
    // mergeable partial [[analyzeIncremental]] unions per append so
    // later stats maintenance is O(delta), never a table rescan
    val colStats = columns.map { c =>
      val r = df.select(col(c)).agg(
        sum(when(col(c).isNull, 1L).otherwise(0L)),
        countDistinct(col(c)),
        min(col(c)).cast("string"),
        max(col(c)).cast("string"),
        hll_sketch_agg(sketchInput(df.schema, c))).head()
      (c, ColStats(
        if (r.isNullAt(0)) 0L else r.getLong(0), r.getLong(1),
        Option(r.getString(2)), Option(r.getString(3))),
        r.getAs[Array[Byte]](4))
    }
    val entries =
      Seq("__v" -> (v.toString, null: String),
        "__nrows" -> (nRows.toString, null: String)) ++
        colStats.flatMap { case (c, st, sk) =>
          Seq(c -> (st.min.orNull, st.max.orNull),
            s"__nc_$c" -> (st.nNulls.toString, null: String),
            s"__ndv_$c" -> (st.ndv.toString, null: String),
            s"__hll_$c" -> (Option(sk)
              .map(java.util.Base64.getEncoder.encodeToString).orNull,
              null: String))
        }
    val _ = casCommit(s, root, { base =>
      deltaOrFull(s, root, base, Nil, Nil).copy(extras =
        Seq(statsMarkerName(table) -> statsJsonOf(entries).getBytes("UTF-8")))
    }, maxRetries)
    statsRelation(s,
      TableStats(v, nRows, colStats.map(t => t._1 -> t._2).toMap), columns)
  }

  /** `ANALYZE TABLE t UPDATE STATISTICS` — INCREMENTAL stats
    * maintenance, O(delta): when every commit since the persisted
    * ANALYZE is a pure append, scan ONLY the added files and MERGE
    * into the registry — row/null counts add, min/max fold through
    * typed least/greatest, and NDV unions the persisted HLL sketch
    * with the delta's (the mergeable-partials idiom: the estimate is
    * approximate from then on, recorded per column as an `__approx_`
    * flag, and the merged sketch persists so the NEXT increment stays
    * O(its delta) too). The re-persisted marker records the current
    * version, so [[freshStats]] and the `count(DISTINCT c)` metadata
    * fast path keep serving — within HLL tolerance (~1.6% rsd at the
    * default lgConfigK) instead of going dark until the next full
    * rescan. An interval containing a rewrite (DV drift, compaction,
    * DELETE) REFUSES loudly — partials cannot subtract; run the full
    * ANALYZE (exactly the stale-exact fall-through discipline the
    * fast path already has). At 100 TB this is the difference between
    * stats that die with the first append and stats a nightly
    * append-only feed keeps alive for the optimizer at delta cost. */
  def analyzeIncremental(s: SparkSession, root: String, table: String,
                         maxRetries: Int = 5): DataFrame = {
    val now = snapshotVersion(root)
    require(now > 0, s"no committed snapshot at $root")
    val raw = claimMarkers(root, statsMarkerName(table))
      .get(statsMarkerName(table)).filter(_.nonEmpty)
      .map(b => parseStatsJson(new String(b, "UTF-8")))
      .getOrElse(throw new IllegalArgumentException(
        s"ANALYZE UPDATE: no persisted statistics for $table — run the " +
          "full ANALYZE TABLE first"))
    def sv(k: String): Option[String] = raw.get(k).flatMap(_._1)
    val prevV = sv("__v").fold(0L)(_.toLong)
    val columns = raw.keys.filterNot(_.startsWith("__")).toSeq.sorted
    val sketches = columns.map { c =>
      c -> sv(s"__hll_$c").map(java.util.Base64.getDecoder.decode).getOrElse(
        throw new IllegalArgumentException(
          s"ANALYZE UPDATE: persisted stats for $table carry no HLL " +
            s"sketch for $c (pre-sketch vintage) — re-run the full ANALYZE"))
    }.toMap
    def rowsOf(v: Long) = manifestRows(s, root, v)
      .collect { case (t, f, st) if t == table => (f, st) }
    val prevRows = rowsOf(prevV).toMap
    val curRows = rowsOf(now)
    val removedOrDrifted = prevRows.keySet.diff(curRows.map(_._1).toSet) ++
      curRows.collect { case (f, st) if prevRows.get(f).exists(_ != st) => f }
    require(removedOrDrifted.isEmpty,
      s"ANALYZE UPDATE: the interval v$prevV..v$now contains a rewrite " +
        s"of $table (${removedOrDrifted.size} file(s) changed) — " +
        "partials cannot subtract; run the full ANALYZE TABLE")
    val added = curRows.filterNot { case (f, _) => prevRows.contains(f) }
    val prevStats = persistedStats(root, table).get
    if (added.isEmpty)
      return statsRelation(s, prevStats, columns) // caught up: no-op
    require(!added.exists { case (_, st) =>
      st != null && dvRefOf(st).isDefined },
      s"ANALYZE UPDATE: added files of $table carry deletion vectors — " +
        "run the full ANALYZE TABLE")
    // delta scan: ONLY the added files (registration pinned if present)
    val delta = registeredSchema(s, root, table, now) match {
      case Some(sc) => readPinned(s, sc,
        added.map { case (f, _) => s"$root/$f" }.toIndexedSeq)
      case None => s.read.parquet(
        added.map { case (f, _) => s"$root/$f" }.toIndexedSeq: _*)
    }
    val types = delta.schema
    val nRows = countRows(s, root, table, now)
    val merged = columns.map { c =>
      val r = delta.select(col(c)).agg(
        sum(when(col(c).isNull, 1L).otherwise(0L)),
        min(col(c)).cast("string"),
        max(col(c)).cast("string"),
        hll_sketch_agg(sketchInput(types, c))).head()
      val dNulls = if (r.isNullAt(0)) 0L else r.getLong(0)
      val dSketch = r.getAs[Array[Byte]](3)
      val prev = prevStats.cols(c)
      // typed min/max fold + sketch union in ONE 1-row local plan
      val dt = types(c).dataType
      val m = s.range(1).select(
        least(lit(prev.min.orNull).cast(dt), lit(r.getString(1)).cast(dt))
          .cast("string").as("mn"),
        greatest(lit(prev.max.orNull).cast(dt), lit(r.getString(2)).cast(dt))
          .cast("string").as("mx"),
        (dSketch match {
          case null => lit(sketches(c))
          case d => hll_union(lit(sketches(c)), lit(d))
        }).as("sk")).head()
      val sk = m.getAs[Array[Byte]]("sk")
      val est = s.range(1)
        .select(hll_sketch_estimate(lit(sk)).cast("long")).head().getLong(0)
      (c, ColStats(prev.nNulls + dNulls, est,
        Option(m.getString(0)), Option(m.getString(1))), sk)
    }
    val entries =
      Seq("__v" -> (now.toString, null: String),
        "__nrows" -> (nRows.toString, null: String)) ++
        merged.flatMap { case (c, st, sk) =>
          Seq(c -> (st.min.orNull, st.max.orNull),
            s"__nc_$c" -> (st.nNulls.toString, null: String),
            s"__ndv_$c" -> (st.ndv.toString, null: String),
            s"__hll_$c" ->
              (java.util.Base64.getEncoder.encodeToString(sk), null: String),
            s"__approx_$c" -> ("1", null: String))
        }
    val _ = casCommit(s, root, { base =>
      deltaOrFull(s, root, base, Nil, Nil).copy(extras =
        Seq(statsMarkerName(table) -> statsJsonOf(entries).getBytes("UTF-8")))
    }, maxRetries)
    statsRelation(s,
      TableStats(now, nRows, merged.map(t => t._1 -> t._2).toMap), columns)
  }

  private def statsRelation(s: SparkSession, ts: TableStats,
                            order: Seq[String]): DataFrame = {
    import s.implicits._
    val cols = if (order.nonEmpty) order else ts.cols.keys.toSeq.sorted
    val rows =
      if (cols.isEmpty) Seq(("*", ts.nRows, 0L, -1L,
        Option.empty[String], Option.empty[String]))
      else cols.map { c =>
        val st = ts.cols(c)
        (c, ts.nRows, st.nNulls, st.ndv, st.min, st.max)
      }
    rows.toDF("column_name", "n_rows", "n_nulls", "n_distinct",
      "min_v", "max_v").orderBy("column_name")
  }

  /** The newest persisted ANALYZE result for `table`, if any. */
  def persistedStats(root: String, table: String): Option[TableStats] =
    claimMarkers(root, statsMarkerName(table)).get(statsMarkerName(table))
      .filter(_.nonEmpty)
      .map { bytes =>
        val m = parseStatsJson(new String(bytes, "UTF-8"))
        def lv(k: String): Long = m.get(k).flatMap(_._1).fold(0L)(_.toLong)
        val cols = m.keys.filterNot(_.startsWith("__")).map { c =>
          c -> ColStats(lv(s"__nc_$c"), lv(s"__ndv_$c"),
            m(c)._1, m(c)._2)
        }.toMap
        TableStats(lv("__v"), lv("__nrows"), cols)
      }

  /** Persisted stats IF they still describe the current table content:
    * the table's resolved (file, stats) set is unchanged since the
    * analyzed version — survives unrelated commits, dies with the
    * first data change. Metadata-sized check. */
  def freshStats(s: SparkSession, root: String,
                 table: String): Option[TableStats] =
    persistedStats(root, table).filter { ts =>
      val now = snapshotVersion(root)
      ts.version > 0 && (ts.version == now || {
        def rowsOf(v: Long) = manifestRows(s, root, v)
          .collect { case (t, f, st) if t == table => (f, st) }.toSet
        rowsOf(now) == rowsOf(ts.version)
      })
    }

  /** SHOW STATS — read the persisted registry back, metadata-only. */
  def showStats(s: SparkSession, root: String, table: String): DataFrame = {
    val ts = persistedStats(root, table).getOrElse(
      throw new IllegalArgumentException(
        s"no persisted statistics for $table — run ANALYZE TABLE first"))
    statsRelation(s, ts, Nil)
  }

  // ----------------------------------------------------- snapshot tags

  private def tagPath(root: String, name: String): Path = {
    require(name.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"unsafe tag name: $name")
    Paths.get(root, "manifest", s"tag-$name")
  }

  /** TAG a snapshot with an immutable name (Iceberg tag / Delta
    * named ref): `"audit-2024q1" → v17`. Tagged snapshots are
    * RETENTION ROOTS — [[vacuum]] keeps their files and manifests
    * regardless of the keep-last-N window, so a tag is the durable
    * "this exact state matters" handle (training-data provenance,
    * audit freezes, release pins) that plain time travel loses the
    * moment retention passes it. Tags are immutable and single-use:
    * re-tagging an existing name throws (drop it first); creation is
    * atomic (tmp + ATOMIC_MOVE without replace), so two racers get
    * one winner and one loud failure. Defaults to the current
    * snapshot. Returns the tagged version. */
  def createTag(root: String, name: String, version: Long = -1L): Long = {
    val v = if (version > 0) version else snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    require(manifestReadable(root, v), s"createTag: v$v is not a readable snapshot")
    val p = tagPath(root, name)
    val tmp = Files.createTempFile(p.getParent, s".tag-$name", ".tmp")
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    // createLink is the atomic NON-replacing publish for files —
    // rename(2) (ATOMIC_MOVE) silently replaces an existing target, so
    // a move here would let a re-tag overwrite the immutable ref
    try Files.createLink(p, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new IllegalStateException(
          s"tag $name already exists (tags are immutable; dropTag first)")
    } finally Files.deleteIfExists(tmp)
    v
  }

  /** Remove a tag — its snapshot becomes ordinary history at the next
    * vacuum. Unknown names are a no-op (idempotent cleanup). */
  def dropTag(root: String, name: String): Unit = {
    val _ = Files.deleteIfExists(tagPath(root, name))
  }

  /** The version a tag names, if it exists. */
  def tagVersion(root: String, name: String): Option[Long] = {
    val p = tagPath(root, name)
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
  }

  /** All tags of `root`: name → version. Metadata-sized. */
  def tags(root: String): Map[String, Long] = {
    val mdir = Paths.get(root, "manifest")
    if (!Files.isDirectory(mdir)) Map.empty
    else {
      val l = Files.list(mdir)
      try l.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("tag-") => n.substring(4) }
        .toList
        .flatMap(n => tagVersion(root, n).map(n -> _)).toMap
      finally l.close()
    }
  }

  /** Read `table` at the snapshot a tag names. */
  def readTableTag(s: SparkSession, root: String, table: String,
                   tag: String): DataFrame =
    readTable(s, root, table, tagVersion(root, tag).getOrElse(
      throw new IllegalArgumentException(s"unknown tag: $tag")))

  // --------------------------------------------- write-audit-publish (WAP)

  private def wapMarkerName(branch: String): String = {
    require(branch.matches("[A-Za-z0-9.-]+"),
      s"unsafe branch name: $branch") // no '_': marker names must parse back
    s"_wap_$branch"
  }
  private def wapTombstone(root: String, branch: String): Path =
    Paths.get(root, wapMarkerName(branch) + ".dropped")
  private def wapPublishedMarker(root: String, branch: String): Path =
    Paths.get(root, wapMarkerName(branch) + ".published")
  private def wapIsPublished(root: String, branch: String): Boolean =
    Files.exists(wapPublishedMarker(root, branch))
  private def wapIsDropped(root: String, branch: String): Boolean =
    Files.exists(wapTombstone(root, branch))

  /** Head of an OPEN branch (newest readable claim carrying its
    * `_wap_` marker), None once the branch was published or dropped —
    * branch names are single-use, so resolution markers are final. */
  def branchHead(root: String, branch: String): Option[Long] = {
    val _ = wapMarkerName(branch) // name validation
    if (wapIsPublished(root, branch) || wapIsDropped(root, branch)) None
    else claimedVersions(root).reverseIterator
      .find(v => manifestReadable(root, v) &&
        wapBranchOf(root, v).contains(branch))
  }

  /** APPEND commit onto a WAP branch — the write-audit-publish staging
    * pattern (Iceberg's `stage-only` snapshots / branch writes): data
    * lands and is CAS-committed like any append, but the claim carries
    * a `_wap_<branch>` sidecar (atomic with the rows, so "staged" is a
    * property of the claim itself) and the commit is a DELTA whose
    * parent is the branch head — the current MAIN head on the first
    * branch commit. Main readers and main committers skip open-branch
    * claims entirely ([[latestReadableClaim]]), so a bad batch parked
    * on a branch can never leak into production reads; the version
    * numbers are shared with main (the same CAS serializes everyone).
    * Branch claims are always deltas, never the periodic full fold,
    * so [[publishBranch]] can re-derive the chain's anchor. */
  def commitAppendBranch(s: SparkSession, root: String, table: String,
                         df: DataFrame, branch: String,
                         maxRetries: Int = 5): Long = {
    val marker = wapMarkerName(branch)
    require(!wapIsDropped(root, branch) && !wapIsPublished(root, branch),
      s"branch $branch is resolved; WAP branch names are single-use")
    val hint = nextVersion(root)
    val newRows = publishData(s, root, hint, table, df)
      .map(f => (table, f, null: String))
    casCommit(s, root, { base =>
      require(base > 0,
        "WAP branch on an empty root: commit a main snapshot first")
      Payload(newRows.map { case (t, f, st) => ("add", t, f, st) },
        Some(base), extras = Seq(marker -> Array.emptyByteArray))
    }, maxRetries,
      baseFn = r => branchHead(r, branch).getOrElse(latestReadableClaim(r)),
      advance = false)
  }

  /** Read `table` as the branch's auditor sees it: branch head if the
    * branch is open, else plain main. */
  def readTableBranch(s: SparkSession, root: String, table: String,
                      branch: String): DataFrame =
    branchHead(root, branch) match {
      case Some(v) => readTable(s, root, table, v)
      case None    => readTable(s, root, table)
    }

  /** PUBLISH: fast-forward main onto the branch head — itself a
    * CAS-claimed commit (an EMPTY delta whose parent is the branch
    * head, with no `_wap_` marker), so publication is atomic and
    * serialized against every other committer by the same version CAS.
    * Claim-time validation re-derives the branch's ANCHOR (the
    * main-visible version the chain grew from) and requires it to
    * still BE the main head: a main commit that landed after the fork
    * throws [[CommitConflict]] — the branch was audited against a
    * stale base and must be re-applied and re-audited under a fresh
    * name, never silently merged. The converse race is safe by
    * construction: a main committer that loses the claim to the
    * publish rebases onto the published chain. A publisher that
    * crashed between its claim and the resolution marker is repaired
    * on the retry (the already-spliced head is detected by chain
    * walk). */
  def publishBranch(s: SparkSession, root: String, branch: String,
                    maxRetries: Int = 5): Long = {
    val head = branchHead(root, branch).getOrElse(
      throw new IllegalArgumentException(s"branch $branch has no open claims"))
    // crash repair: if main's chain already passes through the head, a
    // previous publish claimed but died before writing the marker
    val mainHead = latestReadableClaim(root)
    def chainHits(from: Long): Boolean =
      Iterator.iterate(Option(from))(_.flatMap(baseOf(root, _)))
        .takeWhile(_.exists(_ >= head)).exists(_.contains(head))
    if (mainHead > head && chainHits(mainHead)) {
      Files.write(wapPublishedMarker(root, branch), Array.emptyByteArray)
      return mainHead
    }
    // the anchor: the branch chain's first non-branch parent
    var anchor = baseOf(root, head).getOrElse(0L)
    while (wapBranchOf(root, anchor).contains(branch))
      anchor = baseOf(root, anchor).getOrElse(0L)
    val v = casCommit(s, root, { mainBase =>
      if (mainBase != anchor)
        throw new CommitConflict(
          s"publish $branch: main advanced v$anchor -> v$mainBase since the " +
            "branch forked; re-apply and re-audit on the new head")
      Payload(Nil, Some(head))
    }, maxRetries)
    Files.write(wapPublishedMarker(root, branch), Array.emptyByteArray)
    v
  }

  /** DROP: abandon a branch (failed audit). Metadata-only and
    * immediate — the tombstone makes the branch unreadable and its
    * claims and data files collectible by [[vacuum]]; main was never
    * touched. Tombstoned names cannot be re-branched: re-audit runs
    * under a fresh name, so "what happened to batch X" always has one
    * answer. */
  def dropBranch(root: String, branch: String): Unit = {
    Files.createDirectories(Paths.get(root))
    Files.write(wapTombstone(root, branch), Array.emptyByteArray)
  }

  /** The WAP loop in one call: audit the branch's view of `table` with
    * `check` (None = clean), publish on a clean audit, drop on a
    * violation. Returns Right(published main version) or
    * Left(violation). */
  def auditThenPublish(s: SparkSession, root: String, table: String,
                       branch: String)(
      check: DataFrame => Option[String]): Either[String, Long] =
    check(readTableBranch(s, root, table, branch)) match {
      case Some(violation) =>
        dropBranch(root, branch)
        Left(violation)
      case None => Right(publishBranch(s, root, branch))
    }

  // ----------------------------------------------------- bloom point index

  /** APPEND commit that also records a per-file BLOOM FILTER over
    * `keyCol` — point-lookup pruning for high-cardinality scattered
    * keys, where [min, max] range stats are useless (every
    * hash-distributed file spans the whole key range). This is the
    * role parquet footer blooms / Iceberg puffin sidecars play;
    * here each filter lands as a SIDECAR file next to its data file
    * (`<file>.bloom`), so the manifest stays metadata-sized — a bloom
    * is O(keys) bits and inlining a million of them would turn the
    * manifest into data. Sidecars are written BEFORE the claim:
    * readers only ever look for sidecars of manifest-referenced
    * files, so an unclaimed sidecar is as invisible as its data file,
    * and [[vacuum]] collects a sidecar with its file.
    *
    * The filters are built by ONE column-pruned read-back pass over
    * the just-written files, grouped by physical file with map-side
    * OR-merged partials ([[graft.functions.BloomAgg]]) — the same
    * pass parquet's own bloom writer pays at write time. A missing
    * sidecar is a conservative KEEP at read time, so mixing bloom and
    * plain appends on one table stays correct. */
  def commitAppendBloom(s: SparkSession, root: String, table: String,
                        df: DataFrame, keyCol: String,
                        expectedPerFile: Long = 100000L, fpp: Double = 0.01,
                        maxRetries: Int = 5): Long = {
    val hint = nextVersion(root)
    val files = publishData(s, root, hint, table, df)
    import s.implicits._
    val absRoot = Paths.get(root).toAbsolutePath.normalize()
    val blooms = s.read.parquet(files.map(f => s"$root/$f"): _*)
      .select(input_file_name().as("_1"), col(keyCol).cast("long").as("_2"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new graft.functions.BloomAgg(expectedPerFile, fpp).toColumn)
      .collect() // one row per new file: metadata-sized
    blooms.foreach { case (uri, bytes) =>
      val abs = Paths.get(new java.net.URI(uri).getPath).toAbsolutePath.normalize()
      val rel = absRoot.relativize(abs).toString.replace('\\', '/')
      require(files.contains(rel), s"bloom pass read a foreign file: $rel")
      Files.write(absRoot.resolve(rel + ".bloom"), bytes)
    }
    // record WHICH column the bloom indexes, so the SQL FileIndex can
    // consult the sidecar for pushed point predicates on that column
    val st = statsJsonOf(Seq("__bloomcol" -> (keyCol, keyCol)))
    val newRows = files.map(f => (table, f, st))
    casCommit(s, root, base =>
      deltaOrFull(s, root, base, Nil, newRows), maxRetries)
  }

  /** Point-lookup read: keep only the manifest files whose bloom
    * might contain ANY of `keys`, then apply the exact `IN` filter.
    * Planning is |files| sidecar reads, driver-side — the same
    * metadata class as stats pruning; data I/O is O(true files +
    * false positives). Files without a sidecar are kept
    * (blooms bound, never filter). Returns (result, kept, total). */
  def readTablePoint(s: SparkSession, root: String, table: String,
                     keyCol: String, keys: Seq[Long]): (DataFrame, Int, Int) = {
    require(keys.nonEmpty, "readTablePoint: empty key set")
    val v = snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    val all = manifestRows(s, root, v)
      .collect { case (t, f, st) if t == table => (f, st) }
    require(all.nonEmpty, s"table $table absent from snapshot v$v")
    val kept = all.filter { case (f, _) =>
      val bp = Paths.get(root, f + ".bloom")
      !Files.exists(bp) || {
        val bloom = graft.functions.BloomAgg.deserialize(Files.readAllBytes(bp))
        keys.exists(bloom.mightContainLong)
      }
    }
    val base =
      if (kept.nonEmpty) readResolved(s, root, kept)
      else s.read.parquet(all.map { case (f, _) => s"$root/$f" }.toIndexedSeq: _*)
        .filter(lit(false)) // every bloom said no: empty, schema preserved
    (base.filter(col(keyCol).isin(keys: _*)), kept.size, all.size)
  }

  // ------------------------------------------------------------------ stats

  /** The session time zone as a ZoneId, resolving the three-letter
    * aliases Spark itself accepts ("PST" etc. via SHORT_IDS) that a
    * bare ZoneId.of rejects. */
  private[graft] def sessionZone(s: SparkSession): java.time.ZoneId =
    java.time.ZoneId.of(s.conf.get("spark.sql.session.timeZone"),
      java.time.ZoneId.SHORT_IDS)

  // one mapper for every stats parse: construction is the expensive
  // part of Jackson, and this sits on the per-row prune path (readTree
  // is thread-safe)
  private val statsMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Decode a `stats_json` map: column → (min, max), None = recorded
    * null bound. Driver-side (Jackson), metadata-sized. */
  private[graft] def parseStatsJson(json: String): Map[String, (Option[String], Option[String])] =
    if (json == null) Map.empty
    else {
      val node = statsMapper.readTree(json)
      val it = node.fields()
      val out = Map.newBuilder[String, (Option[String], Option[String])]
      while (it.hasNext) {
        val e = it.next()
        def side(k: String): Option[String] = {
          val v = e.getValue.get(k)
          if (v == null || v.isNull) None else Some(v.asText())
        }
        out += e.getKey -> (side("min"), side("max"))
      }
      out.result()
    }

  /** Typed driver-side compare of two stats-rendered strings under a
    * `Pred.castType`; None = type (or value) outside the exactness
    * allowlist — the caller falls back to the Spark-cast evaluation,
    * so this can never change prune semantics, only their cost.
    * `tsOrderExact` must be true only when local rendering preserves
    * instant order — i.e. the session zone is a FIXED OFFSET (UTC, the
    * engine default): across a DST fall-back the local clock repeats
    * an hour, local order diverges from instant order, and a local
    * comparison could prove a false impossibility. Under a DST zone,
    * timestamp compares answer None and the caller keeps its fallback
    * behavior. (TIMESTAMP_NTZ is zone-free: always exact.) */
  private[graft] def cmpStatStrings(a: String, b: String, castType: String,
                                    tsOrderExact: Boolean = true): Option[Int] = {
    val t = castType.trim.toLowerCase
    try {
      if (t == "bigint" || t == "int" || t == "integer" || t == "smallint" || t == "tinyint")
        Some(a.toLong.compareTo(b.toLong))
      else if (t == "double" || t == "float")
        Some(java.lang.Double.compare(a.toDouble, b.toDouble))
      else if (t.startsWith("decimal"))
        Some(new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)))
      else if (t == "timestamp_ntz")
        for (x <- parseTsMicros(a); y <- parseTsMicros(b)) yield x.compareTo(y)
      else if (t == "timestamp") {
        if (!tsOrderExact) None
        else for (x <- parseTsMicros(a); y <- parseTsMicros(b)) yield x.compareTo(y)
      }
      else if (t == "date")
        Some(java.time.LocalDate.parse(a).compareTo(java.time.LocalDate.parse(b)))
      else None
    } catch { case _: Exception => None }
  }

  /** "yyyy-MM-dd HH:mm:ss[.f]" (fraction trimmed) → micros since epoch
    * as a LOCAL datetime — both compared strings render in the same
    * session zone, so the zone cancels in comparisons. (Shared with
    * the SQL FileIndex, which compares in the same local domain: a
    * local→instant conversion would be ambiguous for the DST fall-back
    * hour and could over-prune; local-vs-local matches the Spark-cast
    * evaluation this path is parity-pinned against.) */
  private[graft] def parseTsMicros(s: String): Option[Long] =
    try {
      val ldt = java.time.LocalDateTime.parse(s.substring(0, 19),
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      val frac =
        if (s.length > 20 && s.charAt(19) == '.')
          s.substring(20).padTo(6, '0').take(6).toLong
        else 0L
      Some(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + frac)
    } catch { case _: Exception => None }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def statsJsonOf(stats: Seq[(String, (String, String))]): String =
    stats.map { case (c, (lo, hi)) =>
      def v(x: String) = if (x == null) "null" else "\"" + jsonEscape(x) + "\""
      s""""${jsonEscape(c)}":{"min":${v(lo)},"max":${v(hi)}}"""
    }.mkString("{", ",", "}")

  /** STATS append commit: data files are range-partitioned and sorted
    * on `rangeCol`, and the manifest records each file's per-column
    * [min, max] for every column in `statsCols` — the per-file
    * statistics every modern table format keeps (reference ecosystem:
    * Snowflake micro-partition metadata). One extra pass over the
    * just-published files computes the bounds here (production reads
    * them back from the parquet footers the write already produced —
    * zero extra I/O; the contract, not the collection mechanism, is
    * what q193/q198 certify). A range-partitioned write makes the
    * per-file intervals of `rangeCol` nearly disjoint, which is what
    * gives stats their pruning power; secondary stats columns prune
    * when the data is naturally clustered on them. */
  def commitAppendStats(s: SparkSession, root: String, table: String,
                        df: DataFrame, statsCols: Seq[String],
                        rangeCol: String, nFiles: Int,
                        maxRetries: Int = 5,
                        txn: Option[(String, Long)] = None): Long =
    commitAppendLaidOut(s, root, table,
      df.repartitionByRange(nFiles, col(rangeCol))
        .sortWithinPartitions(rangeCol),
      statsCols, maxRetries, txn)

  /** Z-ORDERED stats append: lay the batch on a 2-D Morton curve over
    * (`aCol`, `bCol`) — [[Layout.zorder2]] over the 16-bit grid, grid
    * bounds from one metadata-sized min/max pass over the batch — and
    * record per-file stats for BOTH columns. Range partitioning gives
    * only its leading column pruning power; the Z-curve keeps every
    * file to a tile of the 2-D space, so EACH dimension's [min, max]
    * is tight and a predicate on EITHER column (or both) prunes files.
    * This is Delta's OPTIMIZE ZORDER composed with micro-partition
    * stats, as one commit. */
  def commitAppendZordered(s: SparkSession, root: String, table: String,
                           df: DataFrame, aCol: String, bCol: String,
                           nFiles: Int, maxRetries: Int = 5): Long = {
    val b = df.agg(
      min(col(aCol).cast("double")), max(col(aCol).cast("double")),
      min(col(bCol).cast("double")), max(col(bCol).cast("double"))).head()
    val laid = df
      .withColumn("__z", Layout.zorder2(
        Layout.grid16(col(aCol).cast("double"), b.getDouble(0), b.getDouble(1)),
        Layout.grid16(col(bCol).cast("double"), b.getDouble(2), b.getDouble(3))))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    commitAppendLaidOut(s, root, table, laid, Seq(aCol, bCol), maxRetries)
  }

  /** OPTIMIZE ... ZORDER BY: rewrite `table`'s CURRENT content onto
    * the 2-D Morton curve with per-file stats on BOTH dimensions —
    * Delta's `OPTIMIZE t ZORDER BY (a, b)` as one atomic replace.
    * This is the maintenance path that turns a range-laid (or
    * unorganized) table into one where a predicate on EITHER
    * dimension prunes files; [[commitAppendZordered]] is the
    * write-time form for fresh batches. The read is DV-aware
    * (merge-on-read deletes purge through the rewrite, like any
    * compaction); claim-time read-set validation refuses if the
    * table changed under the rewrite; the pre-rewrite layout stays
    * time-travelable. */
  def compactZorder(s: SparkSession, root: String, table: String,
                    aCol: String, bCol: String, nFiles: Int,
                    maxRetries: Int = 5): Long =
    compactZorderCols(s, root, table, Seq(aCol, bCol), nFiles, maxRetries)

  /** N-dimension OPTIMIZE ZORDER BY (a, b, c[, d]): the same atomic
    * relayout over a k-dim Morton curve — bit i of dim j lands at
    * i*k + j ([[Layout.zorderN]]) over EQUI-DEPTH per-dim grids
    * ([[Layout.equiDepthGrid]] — rank cells from one
    * approximate-quantile pass, skew-proof where a min-max grid
    * collapses), and per-file stats recorded on EVERY dimension, so a
    * predicate on ANY of them (including the trailing one) prunes
    * files. */
  def compactZorderCols(s: SparkSession, root: String, table: String,
                        cols: Seq[String], nFiles: Int,
                        maxRetries: Int = 5): Long = {
    require(cols.size >= 2 && cols.size <= 4,
      s"OPTIMIZE ZORDER: 2-4 dimensions, got ${cols.size} (${cols.mkString(",")})")
    require(cols.distinct.size == cols.size,
      s"OPTIMIZE ZORDER: duplicate dimension in ${cols.mkString(",")}")
    val v = snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    val expected = manifestRows(s, root, v)
      .collect { case (t, f, _) if t == table => f }.toSet
    require(expected.nonEmpty, s"OPTIMIZE ZORDER: $table absent at v$v")
    val df = readTable(s, root, table, v)
    // EQUI-DEPTH grids (Delta's range-id approach), not min-max: a
    // skewed dimension collapses a linear grid — most mass in a few
    // cells means every Z-tile spans the hot band and predicates
    // inside it stop pruning. One approximate-quantile pass covers
    // all dimensions; 2^8 cells per axis is already far finer than
    // any realistic file count.
    val bits = math.min(8, Layout.bitsFor(cols.size))
    val nb = (1 << bits) - 1
    val probs = (1 to nb).map(_.toDouble / (nb + 1)).toArray
    val casted = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    val bounds = casted.stat.approxQuantile(cols.toArray, probs, 0.001)
    val gridded = cols.zipWithIndex.map { case (c, j) =>
      Layout.equiDepthGrid(col(c).cast("double"), bounds(j).toSeq) }
    val laid = df
      .withColumn("__z", Layout.zorderN(gridded, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    val hint = nextVersion(root)
    val relFiles = publishData(s, root, hint, table, laid)
    val newRows = statsRowsFor(s, root, table, relFiles, cols)
    casCommit(s, root, { base =>
      val cur = manifestRows(s, root, base)
        .collect { case (t, f, _) if t == table => f }.toSet
      if (cur != expected)
        throw new CommitConflict(
          s"$table changed under the ZORDER rewrite (read at v$v, " +
            s"claiming at v$base)")
      deltaOrFull(s, root, base, Seq(table), newRows)
    }, maxRetries)
  }

  /** Per-file stats rows for freshly-published files. Primary path:
    * the PARQUET FOOTERS the write just produced ([[FooterStats]] —
    * zero extra data I/O, driver-side, |files| footer reads). If any
    * column of any file is not footer-answerable EXACTLY (unsupported
    * type, missing stats), the whole batch falls back to the one-pass
    * Spark read-back so the recorded stats stay uniform; parity of the
    * two paths is spec-pinned (FooterStatsSpec). Empty `relFiles` →
    * no rows. */
  private def statsRowsFor(s: SparkSession, root: String, table: String,
                           relFiles: Seq[String],
                           statsCols: Seq[String]): Seq[(String, String, String)] = {
    if (relFiles.isEmpty) return Seq.empty
    val zone = sessionZone(s)
    FooterStats.tryAll(s.sparkContext.hadoopConfiguration,
      relFiles.map(rel => Paths.get(root, rel).toString), statsCols, zone) match {
      case Some(perFile) =>
        relFiles.zip(perFile).map { case (rel, st) => (table, rel, statsJsonOf(st)) }
      case None => statsRowsForSpark(s, root, table, relFiles, statsCols)
    }
  }

  /** Fallback collection mechanism: one Spark pass over the published
    * directory, min/max per `_metadata.file_name`. Kept callable for
    * the footer-parity spec. */
  private[graft] def statsRowsForSpark(s: SparkSession, root: String, table: String,
                                     relFiles: Seq[String],
                                     statsCols: Seq[String]): Seq[(String, String, String)] = {
    if (relFiles.isEmpty) return Seq.empty
    val dataDir = Paths.get(root, relFiles.head).getParent.toString
    val aggs = statsCols.flatMap(c => Seq(
      min(col(c)).cast("string").as(s"min_$c"),
      max(col(c)).cast("string").as(s"max_$c"),
      (count(lit(1)) - count(col(c))).cast("string").as(s"nc_$c"))) :+
      count(lit(1)).cast("string").as("__n")
    val byFile = s.read.parquet(dataDir)
      .groupBy(col("_metadata.file_name").as("fname"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getAs[String]("fname") -> statsJsonOf(
        (statsCols.map(c => c ->
          (r.getAs[String](s"min_$c"), r.getAs[String](s"max_$c"))) ++
          statsCols.map(c => ("__nc_" + c) ->
            (r.getAs[String](s"nc_$c"), r.getAs[String](s"nc_$c")))) :+
          ("__nrows" -> (r.getAs[String]("__n"), r.getAs[String]("__n")))))
      .toMap
    // a zero-row file (empty write partition) has no agg row: record
    // explicit null bounds — the overlap filter then prunes it for any
    // predicate, which is exact (it holds no rows)
    val emptyStats = statsJsonOf((statsCols.map(c =>
      c -> (null: String, null: String)) ++
      statsCols.map(c => ("__nc_" + c) -> ("0", "0"))) :+
      ("__nrows" -> ("0", "0")))
    relFiles.map { rel =>
      (table, rel,
        byFile.getOrElse(rel.substring(rel.lastIndexOf('/') + 1), emptyStats))
    }
  }

  /** Stats-append core: publish `laidOut` exactly as partitioned and
    * record per-file [min, max] for `statsCols` in the manifest. */
  def commitAppendLaidOut(s: SparkSession, root: String, table: String,
                          laidOut: DataFrame, statsCols: Seq[String],
                          maxRetries: Int = 5,
                          txn: Option[(String, Long)] = None): Long = {
    val hint = nextVersion(root)
    val relFiles = publishData(s, root, hint, table, laidOut)
    val newRows = statsRowsFor(s, root, table, relFiles, statsCols)
    casCommit(s, root, { base =>
      txnGuard(root, txn)
      deltaOrFull(s, root, base, Nil, newRows).copy(extras = txnExtras(txn))
    }, maxRetries)
  }

  /** Single-column convenience (q193's original surface). */
  def commitAppendRanged(s: SparkSession, root: String, table: String,
                         df: DataFrame, rangeCol: String, nFiles: Int): Long =
    commitAppendStats(s, root, table, df, Seq(rangeCol), rangeCol, nFiles)

  /** One conjunctive prune predicate: keep files whose recorded
    * [min, max] of `column` (cast to `castType`) OVERLAPS [lo, hi].
    * Files with no stats for the column are always kept — stats bound,
    * they never filter. */
  final case class Pred(column: String, lo: String, hi: String, castType: String)

  private val statsType =
    MapType(StringType, StructType(Seq(
      StructField("min", StringType), StructField("max", StringType))))

  /** Stats-pruned read under a CONJUNCTION of range predicates: a file
    * survives only if every predicate's interval overlaps its recorded
    * per-column [min, max] — multi-predicate scan pruning from
    * metadata alone, before any data I/O. Returns (pruned DataFrame,
    * files read, files total); the caller still applies the row-level
    * predicate. */
  /** Manifest rows of `table` at `v` whose recorded stats OVERLAP every
    * predicate (files with no stats for a column always survive —
    * stats bound, never filter), plus the table's total file count. */
  private def overlappingRows(s: SparkSession, root: String, table: String,
                              preds: Seq[Pred],
                              v: Long): (Seq[(String, String, String)], Int) = {
    val rows = manifestRows(s, root, v).filter(_._1 == table)
    // Primary path: pure driver-side evaluation — parsing a metadata-
    // sized row list beats launching a Spark job per pruned read (the
    // job fixed cost dwarfs the work at any file count that fits a
    // manifest). Falls back to the Spark-cast evaluation when a
    // castType (or a malformed bound) is outside the JVM compare's
    // allowlist — including timestamps under a DST session zone, where
    // local order is not instant order — so semantics can never drift;
    // parity of the two paths is spec-pinned (ManifestSpec).
    val tsExact = sessionZone(s).getRules.isFixedOffset
    val jvmOk =
      preds.forall(p => cmpStatStrings(p.lo, p.hi, p.castType, tsExact).isDefined)
    if (!jvmOk) return overlappingRowsSpark(s, root, table, preds, v)
    val kept = rows.filter { case (_, _, statsJson) =>
      if (statsJson == null) true
      else {
        val st = parseStatsJson(statsJson)
        preds.forall { p =>
          st.get(p.column) match {
            case None => true // no stats for the column: keep
            case Some((Some(mn), Some(mx))) =>
              (cmpStatStrings(mx, p.lo, p.castType, tsExact),
                cmpStatStrings(mn, p.hi, p.castType, tsExact)) match {
                case (Some(cx), Some(cn)) => cx >= 0 && cn <= 0
                // malformed recorded bound: mirror the Spark path,
                // where a null cast fails the conjunct and drops the
                // file (it can hold no value the typed predicate
                // matches)
                case _ => false
              }
            // recorded null bound: no non-null value in the file —
            // a range predicate cannot match (exact, not heuristic)
            case Some(_) => false
          }
        }
      }
    }
    (kept, rows.size)
  }

  /** The Spark-cast evaluation of the overlap conjunction — fallback
    * for castTypes outside [[cmpStatStrings]]' allowlist, and the
    * reference side of the JVM-path parity spec. */
  private[graft] def overlappingRowsSpark(s: SparkSession, root: String, table: String,
                                          preds: Seq[Pred],
                                          v: Long): (Seq[(String, String, String)], Int) = {
    import s.implicits._
    val rows = manifestRows(s, root, v).filter(_._1 == table)
    val withSt = rows.toDF("table_name", "file", "stats_json")
      .withColumn("st", from_json(col("stats_json"), statsType))
    val keep = preds.map { p =>
      val e = element_at(col("st"), p.column)
      e.isNull ||
        (e.getField("max").cast(p.castType) >= lit(p.lo).cast(p.castType) &&
          e.getField("min").cast(p.castType) <= lit(p.hi).cast(p.castType))
    }.reduce(_ && _)
    val kept = withSt.filter(keep)
      .select("table_name", "file", "stats_json").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    (kept, rows.size)
  }

  def readTablePruned(s: SparkSession, root: String, table: String,
                      preds: Seq[Pred], version: Long = -1L): (DataFrame, Int, Int) = {
    val v = if (version > 0) version else snapshotVersion(root)
    val (kept, total) = overlappingRows(s, root, table, preds, v)
    if (kept.isEmpty) {
      // every file pruned: a valid answer (0 rows), not an error — keep
      // the table's schema by planning over the full file list behind a
      // constant-false filter (Catalyst folds it to an empty scan)
      val all = manifestRows(s, root, v)
        .collect { case (t, f, _) if t == table => s"$root/$f" }
      require(all.nonEmpty, s"table $table absent from snapshot v$v")
      return (s.read.parquet(all.toIndexedSeq: _*).filter(lit(false)), 0, total)
    }
    (readResolved(s, root, kept.map { case (_, f, st) => (f, st) }),
      kept.length, total)
  }

  /** Timestamp-window convenience over [[readTablePruned]] (q193). */
  def readTableRange(s: SparkSession, root: String, table: String,
                     lo: String, hi: String): (DataFrame, Int, Int) =
    readTablePruned(s, root, table, Seq(Pred("ts", lo, hi, "timestamp")))

  // ------------------------------------------------- deletion vectors (DV)

  /** A file's deletion vector, recorded in its manifest row's
    * stats_json under the reserved `__dv` key (min = sidecar
    * root-relative path, max = deleted-row count). Reserved keys never
    * collide with column stats because real predicates query their own
    * column names, and the pruner treats unknown keys as
    * "no stats" (conservative keep). */
  private def dvRefOf(statsJson: String): Option[(String, Long)] =
    parseStatsJson(statsJson).get("__dv").collect {
      case (Some(side), n) => (side, n.map(_.toLong).getOrElse(0L))
    }

  private def writeDvSidecar(root: String, rel: String, positions: Array[Long]): Unit = {
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      Files.newOutputStream(Paths.get(root, rel))))
    try positions.foreach(out.writeLong) finally out.close()
  }

  private def readDvSidecar(root: String, rel: String): Array[Long] = {
    val bytes = Files.readAllBytes(Paths.get(root, rel))
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    Array.fill(bytes.length / 8)(in.readLong())
  }

  /** Merge stats_json with a DV reference, preserving existing column
    * stats (sorted keys for deterministic rendering). */
  private def statsWithDv(statsJson: String, sidecar: String, n: Long): String = {
    val kept = parseStatsJson(statsJson).view.filterKeys(_ != "__dv").toMap
      .map { case (c, (lo, hi)) => (c, (lo.orNull, hi.orNull)) }
      .toSeq.sortBy(_._1)
    statsJsonOf(kept :+ ("__dv" -> (sidecar, n.toString)))
  }

  /** Read a resolved (file, stats_json) set MERGE-ON-READ: files
    * carrying a deletion vector anti-join their deleted ROW POSITIONS
    * (`_metadata.row_index`, joined on a scheme-normalized file path);
    * plain files take the untouched fast path. The positions relation
    * is O(deleted rows) and broadcast — at production scale each DV is
    * a roaring bitmap applied inside the scan, but the read contract
    * is the same: no rewrite ever happened, yet deleted rows are
    * invisible. Every manifest read path routes through here, so a DV
    * can never resurrect through a pruned read, a compaction, or a
    * rewrite's survivor scan. */
  private def readResolved(s: SparkSession, root: String,
                           rows: Seq[(String, String)],
                           pin: Option[StructType] = None): DataFrame = {
    val (dvRows, plain) = rows.partition { case (_, st) => dvRefOf(st).isDefined }
    // `pin` = the table's registered schema, when the caller serves a
    // registered table: the read NULL-fills pre-evolution files and
    // coalesces rename aliases (readPinned); unpinned reads keep the
    // plain footer-schema scan, byte-identical to before
    def readPaths(fs: Seq[String], pos: Boolean = false): DataFrame = {
      val paths = fs.map(f => s"$root/$f").toIndexedSeq
      pin match {
        case Some(sc) =>
          readPinned(s, sc, paths, if (pos) Some(("_p", "_ri")) else None)
        case None =>
          val df = s.read.parquet(paths: _*)
          if (!pos) df
          else df.withColumn("_p",
              expr("concat('/', regexp_replace(_metadata.file_path, '^[a-z]+:/+', ''))"))
            .withColumn("_ri", col("_metadata.row_index"))
      }
    }
    if (dvRows.isEmpty) readPaths(rows.map(_._1))
    else {
      import s.implicits._
      val absRoot = Paths.get(root).toAbsolutePath.normalize()
      val positions = dvRows.flatMap { case (f, st) =>
        val (side, _) = dvRefOf(st).get
        val abs = absRoot.resolve(f).normalize().toString
        readDvSidecar(root, side).map(p => (abs, p))
      }
      val posDf = positions.toDF("_p", "_ri")
      val masked = readPaths(dvRows.map(_._1), pos = true)
        .join(broadcast(posDf), Seq("_p", "_ri"), "left_anti")
        .drop("_p", "_ri")
      if (plain.isEmpty) masked
      else masked.unionByName(readPaths(plain.map(_._1)))
    }
  }

  /** DELETE as deletion vectors — merge-on-read, the O(matched rows)
    * alternative to [[commitDeleteWhere]]'s copy-on-write rewrite
    * (Delta DVs / Iceberg v3 position deletes). No data file is
    * rewritten: matching ROW POSITIONS are recorded in one sidecar per
    * touched file, and the commit is a DELTA that re-adds the same
    * file paths with a `__dv` stats entry — so the write cost is
    * O(matched) positions + O(touched) metadata, while a heavy
    * rewrite is deferred to the next compaction (which reads
    * merge-on-read and therefore purges the DVs). A second delete on
    * the same file merges positions into a fresh sidecar (old ones
    * become garbage for [[vacuum]]). NULL predicates KEEP the row
    * (SQL DELETE semantics); the pre-delete version time-travels.
    * Claim-time validation + whole-recompute retry, as in
    * [[commitDeleteWhere]]. */
  def commitDeleteVectors(s: SparkSession, root: String, table: String,
                          deleteFilter: org.apache.spark.sql.Column,
                          maxRetries: Int = 5,
                          txn: Option[(String, Long)] = None): Long =
    deleteVectorsBy(s, root, table,
      // plain .filter, no coalesce wrapper: NULL predicates drop out
      // of the match either way (SQL DELETE keeps the row), and the
      // unwrapped predicate stays PUSHABLE to the parquet row-group
      // filter — a coalesce around the comparison blocks pushdown
      // (PlanShapeSpec pins PushedFilters on this scan shape)
      df => df.filter(deleteFilter), maxRetries, txn)

  /** DELETE-by-keys as deletion vectors: [[commitDeleteVectors]] with
    * the match driven by a SEMI-JOIN against a keys DataFrame instead
    * of a predicate Column. This is the scale path when the doomed
    * keys are themselves the result of a distributed computation (a
    * change feed's net deletes, an anti-join, a dedup verdict): the
    * key set never visits the driver — no collected `isin` list, no
    * million-literal Catalyst `In` expression, no interval-size cap —
    * Spark plans an ordinary join (AQE broadcasts a small key side on
    * its own). Duplicate keys in `keys` are harmless (distinct'd);
    * NULL keys match nothing (semi-join null semantics = SQL `IN`). */
  def commitDeleteKeys(s: SparkSession, root: String, table: String,
                       keys: DataFrame, keyCol: String,
                       maxRetries: Int = 5,
                       txn: Option[(String, Long)] = None): Long =
    commitDeleteKeys(s, root, table, keys, Seq(keyCol), maxRetries, txn)

  /** Composite-key form of [[commitDeleteKeys]]: the semi-join matches
    * on the CONJUNCTION of all key columns (a row deletes only when
    * every key column equals a source row's — SQL multi-column IN
    * semantics: a NULL in ANY key column matches nothing). The
    * single-key path above delegates here with a one-element list, so
    * its behavior is bit-unchanged. */
  def commitDeleteKeys(s: SparkSession, root: String, table: String,
                       keys: DataFrame, keyCols: Seq[String],
                       maxRetries: Int, txn: Option[(String, Long)]): Long = {
    require(keyCols.nonEmpty && keyCols.distinct.size == keyCols.size,
      s"commitDeleteKeys: key columns must be non-empty and distinct ($keyCols)")
    deleteVectorsBy(s, root, table,
      df => df.join(keys.select(keyCols.map(col): _*).distinct(),
        keyCols, "left_semi"),
      maxRetries, txn)
  }

  /** Shared DV-delete core: `matcher` narrows the raw scan (data
    * columns + precomputed `__graft_p`/`__graft_ri` position columns)
    * to the rows to delete — a predicate filter or a keys semi-join;
    * everything after the match is identical. The position columns
    * are projected BEFORE the matcher runs because `_metadata` only
    * resolves on the scan relation itself — a matcher that joins
    * could not recover them afterwards. */
  /** One ATTEMPT's DV rendering at snapshot `base`, no commit: scan
    * `table`'s raw files, apply `matcher`, write the merged sidecars
    * (pre-claim — a crashed attempt's sidecars stay invisible and
    * vacuum collects them), and return the manifest delta ((re-add
    * rows with the new `__dv` entries, removes)), or None when
    * nothing matches. Package-private so a sibling op can fold a DV
    * delete into ITS OWN claim (the ANN index's delete-mirror lands
    * cells/codes DVs atomically with the advanced cursor); such a
    * caller must validate at claim time that the table's file set is
    * still the one scanned here. */
  private[ops] def dvRowsFor(s: SparkSession, root: String, table: String,
                             matcher: DataFrame => DataFrame, base: Long)
      : Option[(Seq[(String, String, String)], Seq[(String, String)])] = {
    val cur = manifestRows(s, root, base)
      .collect { case (t, f, st) if t == table => (f, st) }
    require(cur.nonEmpty, s"table $table absent from snapshot v$base")
    val absRoot = Paths.get(root).toAbsolutePath.normalize()
    // positions of matching rows, per physical file — a RAW scan of
    // the current files (already-deleted positions may re-match; the
    // union below makes that idempotent)
    val scanned = registeredSchema(s, root, table, base) match {
      case Some(sc) => readPinned(s, sc,
        cur.map { case (f, _) => s"$root/$f" }.toIndexedSeq,
        Some(("__graft_p", "__graft_ri")))
      case None => s.read
        .parquet(cur.map { case (f, _) => s"$root/$f" }.toIndexedSeq: _*)
        .select(col("*"),
          expr("concat('/', regexp_replace(_metadata.file_path, '^[a-z]+:/+', ''))")
            .as("__graft_p"),
          col("_metadata.row_index").as("__graft_ri"))
    }
    val hits = matcher(scanned)
      .select(col("__graft_p").as("_p"), col("__graft_ri").as("_ri"))
      .groupBy("_p").agg(sort_array(collect_list(col("_ri"))).as("_ris"))
      .collect() // one row per touched file: O(matched) positions
    if (hits.isEmpty) return None // nothing matches
    val perFile = hits.map { r =>
      val rel = absRoot.relativize(Paths.get(r.getString(0)).normalize())
        .toString.replace('\\', '/')
      rel -> r.getSeq[Long](1).toArray
    }.toMap
    val touched = cur.filter { case (f, _) => perFile.contains(f) }
    val token = java.util.UUID.randomUUID().toString.take(8)
    val newRows = touched.map { case (f, st) =>
      val old = dvRefOf(st).map { case (side, _) => readDvSidecar(root, side) }
        .getOrElse(Array.empty[Long])
      val merged = (old ++ perFile(f)).distinct.sorted
      val side = s"$f.dv-$token"
      writeDvSidecar(root, side, merged)
      (table, f, statsWithDv(st, side, merged.length.toLong))
    }
    Some((newRows, touched.map { case (f, _) => (table, f) }))
  }

  /** Keyed form of [[dvRowsFor]] — the [[commitDeleteKeys]] semi-join
    * matcher, rendered but not committed. */
  private[ops] def dvRowsForKeys(s: SparkSession, root: String, table: String,
                                 keys: DataFrame, keyCols: Seq[String],
                                 base: Long)
      : Option[(Seq[(String, String, String)], Seq[(String, String)])] =
    dvRowsFor(s, root, table,
      df => df.join(keys.select(keyCols.map(col): _*).distinct(),
        keyCols, "left_semi"), base)

  private def deleteVectorsBy(s: SparkSession, root: String, table: String,
                              matcher: DataFrame => DataFrame,
                              maxRetries: Int,
                              txn: Option[(String, Long)]): Long = {
    var tries = 0
    while (true) {
      val base = latestReadableClaim(root)
      require(base > 0, s"no committed snapshot at $root")
      val expected = manifestRows(s, root, base)
        .collect { case (t, f, _) if t == table => f }.toSet
      val (newRows, removes) = dvRowsFor(s, root, table, matcher, base) match {
        case None => return base // nothing matches: no-op
        case Some(d) => d
      }
      try {
        return casCommit(s, root, { b =>
          txnGuard(root, txn)
          val now = manifestRows(s, root, b)
            .collect { case (t, f, _) if t == table => f }.toSet
          if (now != expected)
            throw new CommitConflict(
              s"$table changed under the DV delete (computed at v$base, claiming at v$b)")
          deltaOrFull(s, root, b, Nil, newRows, removes)
            .copy(extras = txnExtras(txn))
        }, maxRetries)
      } catch {
        case _: CommitConflict =>
          tries += 1
          if (tries >= maxRetries)
            retireAndFail(root, table,
              s"commitDeleteVectors: $table kept changing under the delete " +
                s"($maxRetries attempts) at $root")
      }
    }
    -1L // unreachable
  }

  /** UPDATE as deletion vectors — merge-on-read, the O(matched rows)
    * alternative to [[commitUpdateWhere]]'s copy-on-write rewrite: the
    * matched rows' OLD positions land in DV sidecars (no data file
    * rewritten) and their NEW images — `sets` applied against the old
    * row, one projection, SQL UPDATE semantics — are appended as
    * fresh files, both in ONE atomic delta commit. Write cost is
    * O(matched) rows + O(touched) metadata; the heavy rewrite is
    * deferred to the next compaction, which purges the DVs. The match
    * scan applies EXISTING deletion vectors first, so an
    * already-deleted row can never be resurrected as an updated copy.
    * NULL predicates keep rows untouched; the pre-update version
    * time-travels; claim-time validation + whole-recompute retry as
    * in [[commitDeleteVectors]]. */
  def commitUpdateVectors(s: SparkSession, root: String, table: String,
                          updateFilter: org.apache.spark.sql.Column,
                          sets: Map[String, org.apache.spark.sql.Column],
                          maxRetries: Int = 5): Long =
    updateVectorsBy(s, root, table,
      // plain .filter (no coalesce): NULL predicates drop out of the
      // match either way (SQL UPDATE leaves the row untouched), and
      // the unwrapped predicate stays pushable to the parquet scan
      df => df.filter(updateFilter), sets, maxRetries)

  /** UPDATE-by-keys as deletion vectors: [[commitUpdateVectors]] with
    * the match driven by a SEMI-JOIN against a keys DataFrame — the
    * corrections-list form (apply `sets` to every row whose key
    * appears in a distributed key set) mirroring
    * [[commitDeleteKeys]]: no driver-side key list, no Catalyst `In`
    * literal, unbounded key-set size. Duplicate keys are distinct'd;
    * NULL keys match nothing. */
  def commitUpdateKeys(s: SparkSession, root: String, table: String,
                       keys: DataFrame, keyCol: String,
                       sets: Map[String, org.apache.spark.sql.Column],
                       maxRetries: Int = 5): Long =
    updateVectorsBy(s, root, table,
      df => df.join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi"),
      sets, maxRetries)

  private def updateVectorsBy(s: SparkSession, root: String, table: String,
                              matcher: DataFrame => DataFrame,
                              sets: Map[String, org.apache.spark.sql.Column],
                              maxRetries: Int): Long = {
    require(sets.nonEmpty, "commitUpdateVectors: empty SET list")
    var tries = 0
    while (true) {
      val base = latestReadableClaim(root)
      require(base > 0, s"no committed snapshot at $root")
      val cur = manifestRows(s, root, base)
        .collect { case (t, f, st) if t == table => (f, st) }
      require(cur.nonEmpty, s"table $table absent from snapshot v$base")
      val expected = cur.map(_._1).toSet
      val absRoot = Paths.get(root).toAbsolutePath.normalize()
      import s.implicits._
      // raw scan with positions, then EXISTING DVs applied by hand (the
      // plain masked read drops the position columns): deleted rows
      // must neither re-match nor resurrect as updated copies
      val raw = registeredSchema(s, root, table, base) match {
        case Some(sc) => readPinned(s, sc,
          cur.map { case (f, _) => s"$root/$f" }.toIndexedSeq,
          Some(("_p", "_ri")))
        case None => s.read
          .parquet(cur.map { case (f, _) => s"$root/$f" }.toIndexedSeq: _*)
          .withColumn("_p",
            expr("concat('/', regexp_replace(_metadata.file_path, '^[a-z]+:/+', ''))"))
          .withColumn("_ri", col("_metadata.row_index"))
      }
      val existingPos = cur.flatMap { case (f, st) =>
        dvRefOf(st).toSeq.flatMap { case (side, _) =>
          val abs = absRoot.resolve(f).normalize().toString
          readDvSidecar(root, side).map(p => (abs, p))
        }
      }
      val masked =
        if (existingPos.isEmpty) raw
        else raw.join(broadcast(existingPos.toDF("_p", "_ri")),
          Seq("_p", "_ri"), "left_anti")
      val hits = matcher(masked)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val posRows = hits.select(col("_p"), col("_ri"))
          .groupBy("_p").agg(sort_array(collect_list(col("_ri"))).as("_ris"))
          .collect() // one row per touched file: O(matched) positions
        if (posRows.isEmpty) return base // nothing matches: no-op
        val perFile = posRows.map { r =>
          val rel = absRoot.relativize(Paths.get(r.getString(0)).normalize())
            .toString.replace('\\', '/')
          rel -> r.getSeq[Long](1).toArray
        }.toMap
        val touched = cur.filter { case (f, _) => perFile.contains(f) }
        val token = java.util.UUID.randomUUID().toString.take(8)
        val dvRows = touched.map { case (f, st) =>
          val old = dvRefOf(st).map { case (side, _) => readDvSidecar(root, side) }
            .getOrElse(Array.empty[Long])
          val merged = (old ++ perFile(f)).distinct.sorted
          val side = s"$f.dv-$token"
          writeDvSidecar(root, side, merged)
          (table, f, statsWithDv(st, side, merged.length.toLong))
        }
        // new images: every set expression sees the OLD row (one
        // SELECT). Column order comes from the PRE-matcher scan — a
        // semi-join matcher moves its join key first, and the new
        // files must keep the table's column order
        val dataCols = masked.columns.filterNot(c => c == "_p" || c == "_ri")
        val updated = hits.select(dataCols.toIndexedSeq.map { c =>
          sets.get(c).map(_.cast(hits.schema(c).dataType).as(c)).getOrElse(col(c))
        }: _*)
        val unknown = sets.keySet.diff(dataCols.toSet)
        require(unknown.isEmpty, s"commitUpdateVectors: SET of unknown columns $unknown")
        val hint = nextVersion(root)
        val relFiles = publishData(s, root, hint, table, updated)
        val addRows = statsRowsFor(s, root, table, relFiles, Seq.empty)
        val removes = touched.map { case (f, _) => (table, f) }
        try {
          return casCommit(s, root, { b =>
            val now = manifestRows(s, root, b)
              .collect { case (t, f, _) if t == table => f }.toSet
            if (now != expected)
              throw new CommitConflict(
                s"$table changed under the DV update (computed at v$base, claiming at v$b)")
            deltaOrFull(s, root, b, Nil, dvRows ++ addRows, removes)
          }, maxRetries)
        } catch {
          case _: CommitConflict =>
            tries += 1
            if (tries >= maxRetries)
              retireAndFail(root, table,
                s"commitUpdateVectors: $table kept changing under the update " +
                  s"($maxRetries attempts) at $root")
        }
      } finally hits.unpersist()
    }
    -1L // unreachable
  }

  /** One statement of a multi-verb BEGIN...COMMIT span
    * ([[commitSpan]]): its effect is computed against the span's
    * pinned base snapshot and FOLDED into the one claim. */
  sealed trait SpanAction { def table: String }
  /** `INSERT INTO table <query>` — batch already cast to the table's
    * registered column order. */
  final case class SpanInsert(table: String, batch: DataFrame) extends SpanAction
  /** `DELETE FROM table WHERE pred` — merge-on-read, DV sidecars. */
  final case class SpanDelete(table: String,
                              pred: org.apache.spark.sql.Column) extends SpanAction
  /** `UPDATE table SET ... WHERE pred` — merge-on-read: old images DV,
    * new images append. */
  final case class SpanUpdate(table: String, pred: org.apache.spark.sql.Column,
                              sets: Map[String, org.apache.spark.sql.Column])
    extends SpanAction
  /** Clause-form `MERGE INTO table` as a span verb — merge-on-read:
    * every matched row whose first-passing clause is an UPDATE or
    * DELETE lands its OLD position in the table's DV sidecars; UPDATE
    * hits append new images (old row + source namespace, the
    * [[commitMergeClauses]] projection); NOT MATCHED clauses append
    * inserts. Counts as the table's one DV verb in the span. Clause
    * grammar, condition semantics (NULL does not pass, first match
    * wins), composite keys, and the duplicate-complete-key refusal
    * are exactly [[commitMergeClauses]]'; BY SOURCE clauses and
    * schema evolution stay single-statement-only (a span reads the
    * pre-transaction snapshot — a whole-table rewrite verb does not
    * fold into DV sidecars). */
  final case class SpanMerge(table: String, source: DataFrame,
                             keyCols: Seq[String],
                             tAlias: String, sAlias: String,
                             matched: Seq[MergeWhen],
                             notMatched: Seq[MergeInsert]) extends SpanAction

  /** Multi-VERB atomic transaction — the BEGIN...COMMIT span widened
    * past INSERT: DELETE and UPDATE effects stage as unclaimed DV
    * sidecars + new-image files, INSERT batches as unclaimed data
    * files, and everything folds into ONE CAS claim. Readers at any
    * version see the whole span or none of it; a failure anywhere
    * (analysis error, CHECK violation, claim conflict exhaustion)
    * leaves NOTHING visible — staged files stay unclaimed and vacuum
    * collects them — so the classic restate-a-day
    * `BEGIN; DELETE day; INSERT day'; COMMIT` can never be observed
    * half-done, the transaction a single-statement engine forces users
    * to fake with a temp-table swap.
    *
    * Isolation is SNAPSHOT-AT-BEGIN: every statement reads the
    * pre-transaction state (effects defer to COMMIT — a span is a
    * write-set, not an interactive session). The two orderings that
    * would contradict that are refused loudly rather than silently
    * surprising: a DELETE/UPDATE of a table an earlier in-span INSERT
    * touched (it would not see the inserted rows), and a second
    * DELETE/UPDATE of the same table (its scan would not see the
    * first's vectors). DELETE/UPDATE semantics are exactly the
    * merge-on-read paths' ([[commitDeleteVectors]] /
    * [[commitUpdateVectors]]: O(matched rows) write cost, NULL
    * predicates keep rows, existing DVs applied first so deleted rows
    * never re-match or resurrect); a table's UPDATE images and INSERT
    * batches union into ONE publish per table (the publish→claim
    * CHECK-validation window stays per-table single, as every other
    * committer keeps it). Claim-time read-set validation per
    * DV-touched table + whole-recompute retry vs racers; at 100 TB
    * the span costs its verbs' own deltas — nothing here rescans an
    * untouched file. */
  def commitSpan(s: SparkSession, root: String, actions: Seq[SpanAction],
                 maxRetries: Int = 5): Long = {
    require(actions.nonEmpty, "empty transaction: nothing to commit")
    val seenInsert = scala.collection.mutable.Set[String]()
    val seenDv = scala.collection.mutable.Set[String]()
    actions.foreach {
      case SpanInsert(t, _) => seenInsert += t
      case a =>
        require(!seenInsert.contains(a.table),
          s"span: DELETE/UPDATE of ${a.table} after an in-span INSERT " +
            "into it — span statements read the pre-transaction " +
            "snapshot; put the DELETE/UPDATE first")
        require(!seenDv.contains(a.table),
          s"span: at most one DELETE/UPDATE per table per span (${a.table})")
        seenDv += a.table
    }
    actions.collect { case u: SpanUpdate => u }.foreach(u =>
      require(u.sets.nonEmpty, s"span UPDATE ${u.table}: empty SET list"))
    actions.collect { case m: SpanMerge => m }.foreach { m =>
      require(m.matched.nonEmpty || m.notMatched.nonEmpty,
        s"span MERGE ${m.table}: no WHEN clauses")
      require(m.matched.forall(!_.isInstanceOf[MergeInsert]),
        s"span MERGE ${m.table}: INSERT is not a MATCHED action")
      require(m.keyCols.nonEmpty && m.keyCols.distinct.size == m.keyCols.size,
        s"span MERGE ${m.table}: key columns must be non-empty and distinct")
      require(m.tAlias != m.sAlias,
        s"span MERGE ${m.table}: target and source aliases collide (${m.tAlias})")
    }
    var tries = 0
    while (true) {
      val base = latestReadableClaim(root)
      require(base > 0, s"no committed snapshot at $root")
      val absRoot = Paths.get(root).toAbsolutePath.normalize()
      val hint = nextVersion(root)
      val newRows = Seq.newBuilder[(String, String, String)]
      val removes = Seq.newBuilder[(String, String)]
      val expects = Seq.newBuilder[(String, Set[String])]
      // per-table append payloads (UPDATE new images + INSERT batches)
      // accumulate here and publish ONCE per table, in first-touch
      // order; hits frames stay persisted until their images publish
      val appends = scala.collection.mutable.LinkedHashMap[String, Vector[DataFrame]]()
      val pinned = Seq.newBuilder[DataFrame]
      import s.implicits._
      // stage `posRows` (one row per touched file: path + sorted
      // matched positions) as merged DV sidecars for `table` — the
      // shared tail of every DV-producing span verb
      def stageDv(table: String, cur: Seq[(String, String)],
                  posRows: Array[org.apache.spark.sql.Row]): Unit = {
        if (posRows.isEmpty) return
        val perFile = posRows.map { r =>
          val rel = absRoot.relativize(Paths.get(r.getString(0)).normalize())
            .toString.replace('\\', '/')
          rel -> r.getSeq[Long](1).toArray
        }.toMap
        val touched = cur.filter { case (f, _) => perFile.contains(f) }
        val token = java.util.UUID.randomUUID().toString.take(8)
        touched.foreach { case (f, st) =>
          val old = dvRefOf(st).map { case (side, _) => readDvSidecar(root, side) }
            .getOrElse(Array.empty[Long])
          val merged = (old ++ perFile(f)).distinct.sorted
          val side = s"$f.dv-$token"
          writeDvSidecar(root, side, merged)
          newRows += ((table, f, statsWithDv(st, side, merged.length.toLong)))
          removes += ((table, f))
        }
      }
      try {
        actions.foreach {
          case SpanInsert(table, batch) =>
            appends(table) = appends.getOrElse(table, Vector.empty) :+ batch
          case action =>
            val table = action.table
            val cur = manifestRows(s, root, base)
              .collect { case (t, f, st) if t == table => (f, st) }
            require(cur.nonEmpty, s"table $table absent from snapshot v$base")
            expects += (table -> cur.map(_._1).toSet)
            val raw = registeredSchema(s, root, table, base) match {
              case Some(sc) => readPinned(s, sc,
                cur.map { case (f, _) => s"$root/$f" }.toIndexedSeq,
                Some(("_p", "_ri")))
              case None => s.read
                .parquet(cur.map { case (f, _) => s"$root/$f" }.toIndexedSeq: _*)
                .withColumn("_p",
                  expr("concat('/', regexp_replace(_metadata.file_path, '^[a-z]+:/+', ''))"))
                .withColumn("_ri", col("_metadata.row_index"))
            }
            val existingPos = cur.flatMap { case (f, st) =>
              dvRefOf(st).toSeq.flatMap { case (side, _) =>
                val abs = absRoot.resolve(f).normalize().toString
                readDvSidecar(root, side).map(p => (abs, p))
              }
            }
            val masked =
              if (existingPos.isEmpty) raw
              else raw.join(broadcast(existingPos.toDF("_p", "_ri")),
                Seq("_p", "_ri"), "left_anti")
            val dataCols = masked.columns.filterNot(c => c == "_p" || c == "_ri")
            action match {
              case SpanMerge(_, source, keyCols, tA, sA, matchedCl, notMatchedCl) =>
                // clause/key validation BEFORE anything is read — the
                // commitMergeClauses refuse-loudly discipline
                keyCols.foreach(k => require(dataCols.contains(k),
                  s"span MERGE $table: unknown key column $k"))
                matchedCl.foreach {
                  case MergeUpdate(_, sets) =>
                    val bad = sets.map(_._1).filterNot(dataCols.contains)
                    require(bad.isEmpty,
                      s"span MERGE $table: SET of unknown columns $bad")
                  case _ =>
                }
                notMatchedCl.foreach { ins =>
                  require(ins.cols.size == ins.vals.size,
                    s"span MERGE $table: INSERT lists ${ins.cols.size} " +
                      s"columns but ${ins.vals.size} values")
                  val bad = ins.cols.filterNot(dataCols.contains)
                  require(bad.isEmpty,
                    s"span MERGE $table: INSERT of unknown columns $bad")
                }
                // pin the source: dup check, join, and anti-join must
                // see ONE batch (the commitMergeClauses pin rationale)
                val src = source.persist(
                  org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
                pinned += src
                val kb = src.agg(
                  count(when(keyCols.map(col(_).isNotNull).reduce(_ && _), lit(1))),
                  count_distinct(keyCols.map(col).head,
                    keyCols.map(col).tail: _*)).head()
                if (kb.getLong(0) != kb.getLong(1))
                  throw new IllegalArgumentException(
                    s"span MERGE $table: source carries duplicate " +
                      s"(${keyCols.mkString(", ")}) values — MERGE requires " +
                      "at most one source row per key")
                def passes(c: Option[String]): org.apache.spark.sql.Column =
                  c.map(t => coalesce(expr(t), lit(false))).getOrElse(lit(true))
                // matched rows whose FIRST passing clause is UPDATE or
                // DELETE: old position → DV; no clause passes → the row
                // stays in its file untouched (no DV, no image)
                val mIdx = matchedCl.zipWithIndex.reverse
                  .foldLeft(lit(-1): org.apache.spark.sql.Column) {
                    case (acc, (cl, i)) => when(passes(cl.cond), lit(i)).otherwise(acc)
                  }
                val hits = masked.alias(tA).join(src.alias(sA),
                  keyCols.map(k => col(s"$tA.$k") === col(s"$sA.$k"))
                    .reduce(_ && _), "inner")
                  .withColumn("_mi", mIdx).filter(col("_mi") =!= -1)
                  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
                pinned += hits
                stageDv(table, cur, hits
                  .select(col(s"$tA._p").as("_p"), col(s"$tA._ri").as("_ri"))
                  .groupBy("_p")
                  .agg(sort_array(collect_list(col("_ri"))).as("_ris"))
                  .collect())
                // UPDATE-hit rows append new images: one projection per
                // column over the OLD row joined to its source row
                val updIdx = matchedCl.zipWithIndex
                  .collect { case (_: MergeUpdate, i) => i }
                if (updIdx.nonEmpty) {
                  val updated = hits
                    .filter(updIdx.map(i => col("_mi") === i).reduce(_ || _))
                    .select(dataCols.toIndexedSeq.map { c =>
                      matchedCl.zipWithIndex.foldLeft(col(s"$tA.$c")) {
                        case (acc, (MergeUpdate(_, sets), i)) =>
                          val set =
                            if (sets.isEmpty) Some(col(s"$sA.$c")) // SET *
                            else sets.find(_._1 == c).map(kv => expr(kv._2))
                          set.map(e => when(col("_mi") === i, e).otherwise(acc))
                            .getOrElse(acc)
                        case (acc, _) => acc
                      }.cast(masked.schema(c).dataType).as(c)
                    }: _*)
                  if (updated.count() > 0) // persisted hits: cheap count
                    appends(table) = appends.getOrElse(table, Vector.empty) :+ updated
                }
                // unmatched source rows: first passing insert clause
                // fires; none → the row lands nowhere
                if (notMatchedCl.nonEmpty) {
                  val nmIdx = notMatchedCl.zipWithIndex.reverse
                    .foldLeft(lit(-1): org.apache.spark.sql.Column) {
                      case (acc, (cl, i)) => when(passes(cl.cond), lit(i)).otherwise(acc)
                    }
                  val nmTagged = src.alias(sA).join(
                    masked.select(keyCols.zipWithIndex.map {
                      case (k, i) => col(k).as(s"__tk$i") }: _*),
                    keyCols.zipWithIndex.map { case (k, i) =>
                      col(s"$sA.$k") === col(s"__tk$i") }.reduce(_ && _),
                    "left_anti")
                    .withColumn("_mi", nmIdx).filter(col("_mi") =!= -1)
                    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
                  pinned += nmTagged
                  val inserts = notMatchedCl.zipWithIndex.map { case (ins, i) =>
                    nmTagged.filter(col("_mi") === i)
                      .select(dataCols.toIndexedSeq.map { c =>
                        val v =
                          if (ins.cols.isEmpty) col(s"$sA.$c") // INSERT *
                          else ins.cols.indexOf(c) match {
                            case -1 => lit(null)
                            case p => expr(ins.vals(p))
                          }
                        v.cast(masked.schema(c).dataType).as(c)
                      }: _*)
                  }.reduce(_ unionByName _)
                  if (nmTagged.count() > 0)
                    appends(table) = appends.getOrElse(table, Vector.empty) :+ inserts
                }
              case _ =>
                val pred = action match {
                  case SpanDelete(_, p) => p
                  case SpanUpdate(_, p, _) => p
                  case _ => lit(false) // unreachable
                }
                // SET-column validation BEFORE the match runs: an UPDATE
                // with a typo'd SET column refuses even when its predicate
                // matches zero rows — same refuse-loudly discipline as
                // commitMergeClauses/commitUpdateVectors
                action match {
                  case SpanUpdate(_, _, sets) =>
                    val unknown = sets.keySet.diff(dataCols.toSet)
                    require(unknown.isEmpty,
                      s"span UPDATE $table: SET of unknown columns $unknown")
                  case _ =>
                }
                val hits = masked.filter(pred)
                  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
                pinned += hits
                val posRows = hits.select(col("_p"), col("_ri"))
                  .groupBy("_p").agg(sort_array(collect_list(col("_ri"))).as("_ris"))
                  .collect() // one row per touched file: O(matched) positions
                stageDv(table, cur, posRows)
                if (posRows.nonEmpty) {
                  action match {
                    case SpanUpdate(_, _, sets) =>
                      val updated = hits.select(dataCols.toIndexedSeq.map { c =>
                        sets.get(c).map(_.cast(hits.schema(c).dataType).as(c))
                          .getOrElse(col(c))
                      }: _*)
                      appends(table) = appends.getOrElse(table, Vector.empty) :+ updated
                    case _ =>
                  }
                }
            }
        }
        appends.foreach { case (table, batches) =>
          val relFiles = publishData(s, root, hint,
            table, batches.reduce(_ unionByName _))
          newRows ++= statsRowsFor(s, root, table, relFiles, Seq.empty)
        }
      } finally pinned.result().foreach(_.unpersist())
      val adds = newRows.result()
      val rms = removes.result()
      val exps = expects.result()
      try {
        return casCommit(s, root, { b =>
          exps.foreach { case (t, exp) =>
            val now = manifestRows(s, root, b)
              .collect { case (tt, f, _) if tt == t => f }.toSet
            if (now != exp)
              throw new CommitConflict(
                s"$t changed under the span (computed at v$base, claiming at v$b)")
          }
          deltaOrFull(s, root, b, Nil, adds, rms)
        }, maxRetries)
      } catch {
        case _: CommitConflict =>
          tries += 1
          if (tries >= maxRetries) {
            // retire EVERY span table's pending entry — the abandoned
            // publishes are this thread's own (the ADVICE-hardened
            // outer-loop discipline, span-wide)
            (seenDv ++ seenInsert).foreach(retirePending(root, _))
            throw new IllegalStateException(
              s"commitSpan: tables kept changing under the span " +
                s"($maxRetries attempts) at $root")
          }
      }
    }
    -1L // unreachable
  }

  /** Exact DEDUP as deletion vectors: keep, per `key` group, the row
    * with the smallest `orderCol` (file path + position break residual
    * ties, so the survivor is deterministic) and mask every other copy
    * via DV sidecars — deduplicating a corpus WITHOUT rewriting a byte
    * of it. This fuses the curation tier's exact-dedup shape (q40's
    * content-hash key) with the commit log: one key-shuffled window
    * pass finds duplicate positions (the same price any dedup pays),
    * the write is O(duplicate rows) sidecar bytes + O(touched files)
    * metadata, the pre-dedup corpus time-travels, and the next
    * compaction materializes the survivors. NULL keys group together
    * (SQL GROUP BY convention — q40's md5 key is never null). Existing
    * DVs are applied before grouping, so a masked row neither survives
    * nor drags a live duplicate down. Claim-time validation +
    * whole-recompute retry as in [[commitDeleteVectors]]. */
  def commitDedupVectors(s: SparkSession, root: String, table: String,
                         key: org.apache.spark.sql.Column, orderCol: String,
                         maxRetries: Int = 5): Long = {
    var tries = 0
    while (true) {
      val base = latestReadableClaim(root)
      require(base > 0, s"no committed snapshot at $root")
      val cur = manifestRows(s, root, base)
        .collect { case (t, f, st) if t == table => (f, st) }
      require(cur.nonEmpty, s"table $table absent from snapshot v$base")
      val expected = cur.map(_._1).toSet
      val absRoot = Paths.get(root).toAbsolutePath.normalize()
      import s.implicits._
      val raw = registeredSchema(s, root, table, base) match {
        case Some(sc) => readPinned(s, sc,
          cur.map { case (f, _) => s"$root/$f" }.toIndexedSeq,
          Some(("_p", "_ri")))
        case None => s.read
          .parquet(cur.map { case (f, _) => s"$root/$f" }.toIndexedSeq: _*)
          .withColumn("_p",
            expr("concat('/', regexp_replace(_metadata.file_path, '^[a-z]+:/+', ''))"))
          .withColumn("_ri", col("_metadata.row_index"))
      }
      val existingPos = cur.flatMap { case (f, st) =>
        dvRefOf(st).toSeq.flatMap { case (side, _) =>
          val abs = absRoot.resolve(f).normalize().toString
          readDvSidecar(root, side).map(p => (abs, p))
        }
      }
      val masked =
        if (existingPos.isEmpty) raw
        else raw.join(broadcast(existingPos.toDF("_p", "_ri")),
          Seq("_p", "_ri"), "left_anti")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(key)
        .orderBy(col(orderCol).asc, col("_p").asc, col("_ri").asc)
      val posRows = masked
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") > 1)
        .groupBy("_p").agg(sort_array(collect_list(col("_ri"))).as("_ris"))
        .collect() // one row per touched file: O(duplicate) positions
      if (posRows.isEmpty) return base // already duplicate-free: no-op
      val perFile = posRows.map { r =>
        val rel = absRoot.relativize(Paths.get(r.getString(0)).normalize())
          .toString.replace('\\', '/')
        rel -> r.getSeq[Long](1).toArray
      }.toMap
      val touched = cur.filter { case (f, _) => perFile.contains(f) }
      val token = java.util.UUID.randomUUID().toString.take(8)
      val newRows = touched.map { case (f, st) =>
        val old = dvRefOf(st).map { case (side, _) => readDvSidecar(root, side) }
          .getOrElse(Array.empty[Long])
        val merged = (old ++ perFile(f)).distinct.sorted
        val side = s"$f.dv-$token"
        writeDvSidecar(root, side, merged)
        (table, f, statsWithDv(st, side, merged.length.toLong))
      }
      val removes = touched.map { case (f, _) => (table, f) }
      try {
        return casCommit(s, root, { b =>
          val now = manifestRows(s, root, b)
            .collect { case (t, f, _) if t == table => f }.toSet
          if (now != expected)
            throw new CommitConflict(
              s"$table changed under the dedup (computed at v$base, claiming at v$b)")
          deltaOrFull(s, root, b, Nil, newRows, removes)
        }, maxRetries)
      } catch {
        case _: CommitConflict =>
          tries += 1
          if (tries >= maxRetries)
            retireAndFail(root, table,
              s"commitDedupVectors: $table kept changing under the dedup " +
                s"($maxRetries attempts) at $root")
      }
    }
    -1L // unreachable
  }

  // ----------------------------------------------------------------- readers

  /** Read `table` at `version` (default: the committed pointer) through
    * its manifest — explicit file paths, never a directory listing;
    * merge-on-read when any file carries a deletion vector. */
  def readTable(s: SparkSession, root: String, table: String,
                version: Long = -1L): DataFrame = {
    val v = if (version > 0) version else snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    val rows = manifestRows(s, root, v) // metadata-sized
      .collect { case (t, f, st) if t == table => (f, st) }
    require(rows.nonEmpty, s"table $table absent from snapshot v$v")
    // registered tables read through their registration AT v: evolved
    // columns NULL-fill, renamed columns resolve through aliases
    readResolved(s, root, rows, registeredSchema(s, root, table, v))
  }

  /** Metadata-only COUNT(*): answer `SELECT count(*)` for `table` at
    * `version` from the manifest alone — Σ per-file `__nrows` (the
    * exact footer row count every stats commit records) minus each
    * file's DV'd position count. The aggregate-pushdown shortcut
    * every production format serves (Delta/Iceberg snapshot row
    * counts; parquet footer counts): at 100 TB the count is driver-
    * side metadata arithmetic, zero data I/O, zero Spark jobs. Files
    * committed WITHOUT a recorded count (plain `commitAppend` vintage)
    * are counted by scanning exactly those files, DV-aware — the
    * hybrid can be slower, never wrong. */
  def countRows(s: SparkSession, root: String, table: String,
                version: Long = -1L): Long = {
    val v = if (version > 0) version else snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    val rows = manifestRows(s, root, v)
      .collect { case (t, f, st) if t == table => (f, st) }
    require(rows.nonEmpty, s"table $table absent from snapshot v$v")
    var total = 0L
    val unknown = Seq.newBuilder[(String, String)]
    rows.foreach { case (f, st) =>
      parseStatsJson(st).get("__nrows").flatMap(_._1) match {
        case Some(n) => total += n.toLong - dvRefOf(st).map(_._2).getOrElse(0L)
        case None => unknown += ((f, st))
      }
    }
    val unk = unknown.result()
    if (unk.nonEmpty) total += readResolved(s, root, unk).count()
    total
  }

  /** Metadata-only COUNT(column) — the non-null count answered from
    * the manifest's per-file stats (`__nrows - __nc_<col>`), the
    * third member of the aggregate-pushdown family ([[countRows]],
    * [[columnBounds]]). EXACT from metadata only for a stat-covered
    * file with NO deletion vector — a DV may have deleted null and
    * non-null rows in any mix, so DV'd files take the masked scan, as
    * do stat-less vintages; the hybrid can be slower, never wrong. */
  def columnNonNullCount(s: SparkSession, root: String, table: String,
                         column: String, version: Long = -1L): Long = {
    val v = if (version > 0) version else snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    val rows = manifestRows(s, root, v)
      .collect { case (t, f, st) if t == table => (f, st) }
    require(rows.nonEmpty, s"table $table absent from snapshot v$v")
    var total = 0L
    val unknown = Seq.newBuilder[(String, String)]
    rows.foreach { case (f, st) =>
      val m = parseStatsJson(st)
      (m.get("__nrows").flatMap(_._1), m.get("__nc_" + column).flatMap(_._1)) match {
        case (Some("0"), _) => // zero-row file: nothing to count
        case (Some(n), Some(nc)) if dvRefOf(st).isEmpty =>
          total += n.toLong - nc.toLong
        case _ => unknown += ((f, st))
      }
    }
    val unk = unknown.result()
    if (unk.nonEmpty)
      total += readResolved(s, root, unk, registeredSchema(s, root, table, v))
        .agg(count(col(column))).head().getLong(0)
    total
  }

  /** Metadata-only MIN/MAX — `SELECT min(c), max(c)` answered from the
    * manifest's per-file stats (the aggregate pushdown every
    * production format serves; at 100 TB: driver-side arithmetic over
    * a metadata-sized row list, zero data I/O). EXACT from metadata
    * only for a file with recorded stats for `column` and NO deletion
    * vector — a DV may have deleted precisely the extreme row, so
    * DV'd files are scanned (merge-on-read-masked) instead, as are
    * stat-less vintages; the hybrid can be slower, never wrong. Files
    * with a recorded NULL bound (no non-null values) contribute
    * nothing, exactly like SQL MIN/MAX. Comparison is the pruner's
    * typed stat-string compare (`castType` as in [[Pred]]). Returns
    * None for an empty or all-NULL column. */
  def columnBounds(s: SparkSession, root: String, table: String,
                   column: String, castType: String,
                   version: Long = -1L): Option[(String, String)] = {
    val v = if (version > 0) version else snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    val rows = manifestRows(s, root, v)
      .collect { case (t, f, st) if t == table => (f, st) }
    require(rows.nonEmpty, s"table $table absent from snapshot v$v")
    val tsExact = sessionZone(s).getRules.isFixedOffset
    // Can this (castType, zone) compare stat strings at all? Under a
    // DST zone, timestamp stat ordering is undefined (cmpStatStrings
    // returns None) — DEGRADE to the scan branch for every file, like
    // overlappingRows does, instead of throwing: the hybrid is slower,
    // never wrong, and `SELECT min(ts)` keeps working in any zone.
    val cmpDefined =
      cmpStatStrings("1970-01-02 00:00:00", "1970-01-02 00:00:00",
        castType, tsExact).isDefined ||
        cmpStatStrings("1970-01-02", "1970-01-02", castType, tsExact).isDefined ||
        cmpStatStrings("1", "1", castType, tsExact).isDefined
    def cmp(a: String, b: String): Int =
      cmpStatStrings(a, b, castType, tsExact).getOrElse(
        throw new IllegalArgumentException(
          s"columnBounds: cannot compare $castType stat strings ('$a', '$b')"))
    // a recorded zero-row file contributes nothing to any aggregate
    // (exact: it holds no rows — and a DV on zero rows cannot exist)
    val nonEmpty = rows.filterNot { case (_, st) =>
      st != null &&
        parseStatsJson(st).get("__nrows").flatMap(_._1).contains("0") }
    val (statted, scan) = nonEmpty.partition { case (_, st) =>
      cmpDefined &&
        st != null && dvRefOf(st).isEmpty && parseStatsJson(st).contains(column) }
    val metaBounds = statted.flatMap { case (_, st) =>
      parseStatsJson(st)(column) match {
        case (Some(mn), Some(mx)) => Some((mn, mx))
        case _ => None // recorded null bound: file holds no non-null value
      }
    }
    val scanBounds: Option[(String, String)] =
      if (scan.isEmpty) None
      else {
        val r = readResolved(s, root, scan, registeredSchema(s, root, table, v))
          .agg(min(col(column)).cast("string"),
            max(col(column)).cast("string")).head()
        if (r.isNullAt(0)) None else Some((r.getString(0), r.getString(1)))
      }
    val all = metaBounds ++ scanBounds
    if (all.isEmpty) None
    else Some((
      all.map(_._1).reduce((a, b) => if (cmp(a, b) <= 0) a else b),
      all.map(_._2).reduce((a, b) => if (cmp(a, b) >= 0) a else b)))
  }

  /** Incremental consumption (Delta CDF-lite at FILE granularity): the
    * rows ADDED to `table` in versions (fromVersion, toVersion]. A
    * downstream job that processed the table at `fromVersion` reads
    * exactly the new data — O(delta) I/O, the metadata complement of
    * the streaming source's per-batch commits. Exactness holds only
    * for append-only intervals: if any interval commit REWROTE
    * inherited files (replace / compaction / delete / merge), the
    * added files double-count surviving rows, so `pureAppend` is
    * false and the consumer must full-refresh instead (the same
    * contract Delta's CDC surfaces as a version-gap error). Returns
    * (added-rows DataFrame, pureAppend). Metadata-sized planning:
    * two manifest resolutions, a set difference, no listing. */
  def tableChanges(s: SparkSession, root: String, table: String,
                   fromVersion: Long, toVersion: Long = -1L): (DataFrame, Boolean) = {
    // -1 is the only "current snapshot" sentinel; an explicit 0 is a
    // caller bug (0 means "empty start" on the FROM side only) and
    // must not silently widen to the whole table
    require(toVersion == -1L || toVersion > 0,
      s"tableChanges: toVersion must be a committed version or -1, got $toVersion")
    val to = if (toVersion > 0) toVersion else snapshotVersion(root)
    require(fromVersion >= 0 && fromVersion <= to,
      s"tableChanges: bad interval ($fromVersion, $to]")
    val beforeRows =
      if (fromVersion == 0) Seq.empty[(String, String)]
      else manifestRows(s, root, fromVersion)
        .collect { case (t, f, st) if t == table => (f, st) }
    val afterRows = manifestRows(s, root, to)
      .collect { case (t, f, st) if t == table => (f, st) }
    val beforePaths = beforeRows.map(_._1).toSet
    val after = afterRows.map(_._1)
    val added = after.filterNot(beforePaths)
    // purity compares (file, stats) PAIRS, not paths: a deletion-vector
    // commit re-adds the same path with a changed `__dv` entry, and a
    // consumer that read the interval as pure-append would keep rows
    // the DV deleted — pair drift forces the full-refresh contract
    val pureAppend = beforeRows.toSet.subsetOf(afterRows.toSet)
    // pin the REGISTERED schema when the table evolved: an interval
    // spanning an evolving append mixes old- and new-schema files, and
    // plain inference from one footer would drop (or nondeterministically
    // include) the evolved column while still honestly reporting
    // pureAppend=true
    val reader = registeredSchema(s, root, table, to)
      .map(s.read.schema(_)).getOrElse(s.read)
    val df =
      if (added.nonEmpty)
        reader.parquet(added.map(f => s"$root/$f").toIndexedSeq: _*)
      else {
        require(after.nonEmpty, s"table $table absent from snapshot v$to")
        reader.parquet(after.map(f => s"$root/$f").toIndexedSeq: _*)
          .filter(lit(false)) // empty delta, schema preserved
      }
    (df, pureAppend)
  }

  /** ROW-LEVEL change feed (the Delta CDF analogue, derived post-hoc
    * from the commit log): every row the interval's commits inserted
    * or deleted, tagged `_change_type` ('insert' | 'delete') and
    * `_commit_version` — an UPDATE surfaces as its delete(pre-image) +
    * insert(post-image) pair, the classic CDC rendering. Unlike
    * [[tableChanges]] (file granularity, refuses rewrite intervals),
    * this walks every version STEP and prices each by its commit type:
    *
    *  - pure append → inserts are the added files' rows (DV-resolved
    *    at that version) — O(delta);
    *  - DV drift (merge-on-read DELETE/UPDATE/dedup) → deletes are
    *    exactly the positions the step ADDED to each sidecar, read
    *    back by position join — O(matched rows);
    *  - CoW rewrite (replace/compaction/copy-on-write DELETE/MERGE) →
    *    a row-level `exceptAll` diff bounded to the REMOVED and added
    *    files only (inherited files cancel by construction) — a
    *    compaction that merely repacks rows therefore yields zero
    *    change rows, O(affected files) cost, never a table rescan.
    *
    * At 100 TB the steady-state (append/DV) steps cost exactly their
    * delta bytes — the feed a downstream CDC consumer, audit trail, or
    * incremental MV derives row-level semantics from without the
    * writer cooperating (no change files needed at commit time). */
  def readChangeFeed(s: SparkSession, root: String, table: String,
                     fromVersion: Long, toVersion: Long = -1L): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast => bcast}
    val to = if (toVersion > 0) toVersion else snapshotVersion(root)
    require(fromVersion >= 0 && fromVersion <= to,
      s"readChangeFeed: bad interval ($fromVersion, $to]")
    // MAIN-visible steps only: open/dropped WAP branch claims must not
    // leak staged (never-published) rows into the feed as phantom
    // insert/delete pairs
    val steps = claimedVersions(root)
      .filter(v => v > fromVersion && v <= to && mainVisible(root, v))
    // ONE schema for the whole feed — the to-version registration:
    // rows from before a RENAME project through the aliases, so every
    // emitted frame carries the current column names and the
    // cross-version unions/diffs stay coherent
    val pin = registeredSchema(s, root, table, to)
    val absRoot = Paths.get(root).toAbsolutePath.normalize()
    // STALENESS, not a raw path error: a consumer whose cursor
    // predates the retention floor cannot have its interval
    // reconstructed (the from-version's manifest was vacuumed) — the
    // Snowflake stream-staleness contract, surfaced loudly so the
    // caller re-creates the consumer instead of mis-reading
    def rowsAt(v: Long): Seq[(String, String)] =
      if (v == 0) Seq.empty
      else if (!manifestReadable(root, v))
        throw new IllegalStateException(
          s"change feed for $table from v$v: that version's manifest " +
            "was vacuumed — the feed is STALE; re-create the consumer " +
            "on the surviving history")
      else manifestRows(s, root, v).collect { case (t, f, st) if t == table => (f, st) }
    def dvPositions(st: String): Map[String, Array[Long]] = // file → positions
      dvRefOf(st).map { case (side, _) => side -> readDvSidecar(root, side) }.toMap
    /** Rows of `files` at the given positions — the DV read pattern. */
    def rowsAtPositions(perFile: Seq[(String, Array[Long])]): DataFrame = {
      import s.implicits._
      val pos = perFile.flatMap { case (f, ps) =>
        val abs = absRoot.resolve(f).normalize().toString
        ps.map(p => (abs, p))
      }
      val paths = perFile.map { case (f, _) => s"$root/$f" }.toIndexedSeq
      val scan = pin match {
        case Some(sc) => readPinned(s, sc, paths, Some(("_p", "_ri")))
        case None => s.read.parquet(paths: _*)
          .withColumn("_p",
            expr("concat('/', regexp_replace(_metadata.file_path, '^[a-z]+:/+', ''))"))
          .withColumn("_ri", col("_metadata.row_index"))
      }
      scan.join(bcast(pos.toDF("_p", "_ri")), Seq("_p", "_ri"), "left_semi")
        .drop("_p", "_ri")
    }
    var prev = rowsAt(fromVersion)
    var out: Option[DataFrame] = None
    def emit(df: DataFrame, change: String, v: Long): Unit = {
      val tagged = df
        .withColumn("_change_type", lit(change))
        .withColumn("_commit_version", lit(v))
      out = Some(out.fold(tagged)(_.unionByName(tagged)))
    }
    steps.foreach { v =>
      val cur = rowsAt(v)
      if (cur != prev) {
        val prevByPath = prev.toMap
        val curByPath = cur.toMap
        val addedFiles = cur.filterNot { case (f, _) => prevByPath.contains(f) }
        val removedFiles = prev.filterNot { case (f, _) => curByPath.contains(f) }
        val drifted = cur.filter { case (f, st) =>
          prevByPath.get(f).exists(_ != st) }
        // Fast path — the common merge-on-read step: no file left, and
        // every stats drift only ADDS DV positions. Then inserts are
        // exactly the added files' rows and deletes exactly the new
        // positions, O(delta + matched). A RESTORE (or any step that
        // REMOVES positions — resurrected rows!) fails this test and
        // takes the general diff below; the replay property pins both.
        val additiveDv = removedFiles.isEmpty && drifted.forall {
          case (f, st) =>
            val oldPos = dvPositions(prevByPath(f)).values.flatten.toSet
            oldPos.subsetOf(dvPositions(st).values.flatten.toSet)
        }
        if (additiveDv) {
          if (addedFiles.nonEmpty)
            emit(readResolved(s, root, addedFiles, pin), "insert", v)
          val drift = drifted.flatMap { case (f, st) =>
            val oldPos = dvPositions(prevByPath(f)).values.flatten.toSet
            val newPos = dvPositions(st).values.flatten.toArray
              .filterNot(oldPos)
            if (newPos.isEmpty) None else Some(f -> newPos)
          }
          if (drift.nonEmpty) emit(rowsAtPositions(drift), "delete", v)
        } else {
          // General step (CoW rewrite, restore, position removal): row
          // diff bounded to the files that left, arrived, or drifted —
          // inherited untouched files cancel by construction
          val affPrev = prev.filter { case (f, st) =>
            !curByPath.contains(f) || curByPath(f) != st }
          val affCur = cur.filter { case (f, st) =>
            !prevByPath.contains(f) || prevByPath(f) != st }
          def readOrEmpty(rows: Seq[(String, String)], like: Seq[(String, String)]) =
            if (rows.nonEmpty) readResolved(s, root, rows, pin)
            else readResolved(s, root, like, pin).filter(lit(false))
          val before = readOrEmpty(affPrev, affCur)
          val after = readOrEmpty(affCur, affPrev)
          emit(before.exceptAll(after), "delete", v)
          emit(after.exceptAll(before), "insert", v)
        }
      }
      prev = cur
    }
    out.getOrElse {
      readTable(s, root, table, to).filter(lit(false))
        .withColumn("_change_type", lit(""))
        .withColumn("_commit_version", lit(0L))
    }
  }

  /** APPEND-ONLY change feed — the Snowflake APPEND_ONLY stream mode,
    * the ingest-pipeline default: ONLY rows appended by pure-append
    * commits are emitted (tagged `_change_type = 'insert'`); a step
    * with any removal or stats drift (DV DELETE/UPDATE, CoW rewrite,
    * compaction) contributes NOTHING and is SKIPPED rather than
    * erroring or feeding deletes downstream — update post-images are
    * deliberately NOT emitted (they are not appends; Snowflake's
    * contract). Costs O(appended files in the interval); rewrite
    * steps cost the metadata compare only. Same staleness rule as
    * [[readChangeFeed]]: a vacuumed from-version refuses loudly. */
  def readAppendFeed(s: SparkSession, root: String, table: String,
                     fromVersion: Long, toVersion: Long = -1L): DataFrame = {
    val to = if (toVersion > 0) toVersion else snapshotVersion(root)
    require(fromVersion >= 0 && fromVersion <= to,
      s"readAppendFeed: bad interval ($fromVersion, $to]")
    val steps = claimedVersions(root)
      .filter(v => v > fromVersion && v <= to && mainVisible(root, v))
    val pin = registeredSchema(s, root, table, to)
    def rowsAt(v: Long): Seq[(String, String)] =
      if (v == 0) Seq.empty
      else if (!manifestReadable(root, v))
        throw new IllegalStateException(
          s"append feed for $table from v$v: that version's manifest " +
            "was vacuumed — the feed is STALE; re-create the consumer " +
            "on the surviving history")
      else manifestRows(s, root, v).collect { case (t, f, st) if t == table => (f, st) }
    var prev = rowsAt(fromVersion)
    var out: Option[DataFrame] = None
    steps.foreach { v =>
      val cur = rowsAt(v)
      if (cur != prev) {
        val prevByPath = prev.toMap
        val curByPath = cur.toMap
        val added = cur.filterNot { case (f, _) => prevByPath.contains(f) }
        val pureAppend = prev.forall { case (f, st) =>
          curByPath.get(f).contains(st) }
        if (pureAppend && added.nonEmpty) {
          val tagged = readResolved(s, root, added, pin)
            .withColumn("_change_type", lit("insert"))
            .withColumn("_commit_version", lit(v))
          out = Some(out.fold(tagged)(_.unionByName(tagged)))
        } // else: rewrite interval — skip, nothing was APPENDED
      }
      prev = cur
    }
    out.getOrElse {
      readTable(s, root, table, to).filter(lit(false))
        .withColumn("_change_type", lit(""))
        .withColumn("_commit_version", lit(0L))
    }
  }

  /** APPLY CHANGES INTO (the Delta Live Tables CDC-apply pattern):
    * maintain `dstTable` as the KEY-WISE MIRROR of `srcTable`, driven
    * by the row-level change feed — the consumer half of CDC that
    * [[readChangeFeed]] produces and [[consumeInto]] (append-only)
    * cannot serve. Each sync:
    *
    *  1. reads its progress from the destination txn ledger (the
    *     source version last applied);
    *  2. nets the interval's feed PER KEY — newest `_commit_version`
    *     wins; within it an insert image (an UPDATE emits its
    *     delete+insert pair at one version) beats a delete;
    *  3. applies net deletes as ONE merge-on-read DV commit
    *     (`appId-del` ledger) and net upserts as ONE stats-bounded
    *     MERGE (`appId` ledger, the progress marker) — deletes FIRST,
    *     so a crash between the two replays the delete (no-op via its
    *     own ledger) and then completes the merge: exactly-once
    *     without a cross-commit transaction.
    *
    * O(interval feed) read cost; the destination write cost is the
    * merge/DV cost of the NET changes only. Returns (upserts,
    * deletes) applied, or None when the source has nothing new. */
  def applyChangesInto(s: SparkSession, srcRoot: String, srcTable: String,
                       dstRoot: String, dstTable: String,
                       keyCol: String): Option[(Long, Long)] =
    applyChangesInto(s, srcRoot, srcTable, dstRoot, dstTable, Seq(keyCol))

  /** Composite-key form of [[applyChangesInto]]: the net-change window
    * partitions by ALL key columns, the delete semi-join and the merge
    * match on their conjunction, and the destination's per-file stats
    * record every key column (conjunctive pruning on later syncs). The
    * single-key signature delegates here, bit-unchanged. */
  def applyChangesInto(s: SparkSession, srcRoot: String, srcTable: String,
                       dstRoot: String, dstTable: String,
                       keyCols: Seq[String]): Option[(Long, Long)] = {
    require(keyCols.nonEmpty && keyCols.distinct.size == keyCols.size,
      s"applyChangesInto: key columns must be non-empty and distinct ($keyCols)")
    val appId = s"applychanges-$dstTable"
    val fromV = lastCommittedTxn(dstRoot, appId).getOrElse(0L)
    val to = snapshotVersion(srcRoot)
    if (to <= fromV) return None
    val feed = readChangeFeed(s, srcRoot, srcTable, fromV, to)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_commit_version").desc,
        when(col("_change_type") === "insert", 1).otherwise(0).desc)
    val net = feed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val upserts = net.filter(col("_change_type") === "insert")
        .drop("_change_type", "_commit_version", "_rn")
      val nUp = upserts.count()
      // net deletes stay a DATAFRAME end to end: the delete lands via
      // a semi-join ([[commitDeleteKeys]]) against the destination
      // scan, so an interval's delete volume is unbounded — no
      // driver-side key list, no giant Catalyst `In` literal (a
      // 1M-literal In is a planner hazard far below any collect guard)
      val dels = net.filter(col("_change_type") === "delete")
        .select(keyCols.map(col): _*)
      val nDel = dels.count()
      val dstV = snapshotVersion(dstRoot)
      val dstExists = dstV > 0 &&
        manifestRows(s, dstRoot, dstV).exists(_._1 == dstTable)
      // an interval that nets NO changes for the source table (other
      // tables committed, or src and dst share one root and the
      // interval holds only this mirror's own commits) applies as a
      // PURE no-op: no empty commit, ledger untouched — the next sync
      // rescans the same (cheap, metadata-sized) interval. This is
      // what makes a re-driven statement quiesce instead of minting
      // one empty version per drive. Retention interaction (shared
      // with every CDC consumer, incl. Delta's CDF): a ledger that
      // stays at `fromV` while the table is quiet depends on the
      // SOURCE retaining v(fromV) — a vacuum that collects it forces a
      // re-bootstrap, exactly like a changelog consumer outliving the
      // changelog's retention. Source retention must cover the longest
      // expected quiet period; the failure is loud (the interval read
      // errors), never a silent skip.
      if (dstExists && nUp == 0L && nDel == 0L) return Some((0L, 0L))
      if (!dstExists) {
        // bootstrap: net state IS the table (net-deleted keys never land)
        commitAppendStats(s, dstRoot, dstTable, upserts, keyCols,
          keyCols.head, 1, txn = Some(appId -> to))
      } else {
        if (nDel > 0)
          try commitDeleteKeys(s, dstRoot, dstTable, dels, keyCols,
            maxRetries = 5, txn = Some(s"$appId-del" -> to))
          catch { case _: TxnAlreadyCommitted => () } // crash-replay half
        try {
          if (nUp > 0)
            commitMergeUpsert(s, dstRoot, dstTable, upserts, keyCols,
              maxRetries = 5, txn = Some(appId -> to),
              allowEvolution = false)
          else // advance the progress ledger even on a delete-only interval
            commitAppend(s, dstRoot, dstTable, upserts,
              txn = Some(appId -> to))
        } catch { case _: TxnAlreadyCommitted => () }
      }
      Some((nUp, nDel))
    } finally net.unpersist()
  }

  /** SCD TYPE 2 APPLY CHANGES — maintain `dstTable` as the FULL
    * HISTORY of `srcTable`'s keyed rows: one row per (key, validity
    * interval), the source columns plus `__start_v` / `__end_v`
    * (source commit versions; `__end_v` NULL = currently open) and
    * the surrogate `__hkey = key:start_v` (each history row's
    * identity). The `apply_changes(..., stored_as_scd_type = 2)`
    * shape, derived from the row-level change feed without writer
    * cooperation.
    *
    * Incremental + exactly-once like [[applyChangesInto]]: each call
    * advances one source interval; the applied source version rides
    * the destination txn ledger atomically with the derived rows, so
    * re-drives and crash replays are no-ops.
    *
    * Per interval: events collapse to one per (key, version) (an
    * UPDATE's delete+insert pair nets to its insert image, a pure
    * delete keeps its tombstone); each insert OPENS an interval that
    * the key's next event CLOSES (`lead` over the key's timeline);
    * and the destination's currently-open rows of AFFECTED keys close
    * at their key's first event version. Open-row closes and new
    * intervals land as ONE merge keyed by `__hkey` — O(interval
    * delta) feed work plus a merge whose dst I/O is bounded by the
    * affected keys' files via the key-stats bound. Returns (intervals
    * opened, rows closed). */
  def applyChangesScd2(s: SparkSession, srcRoot: String, srcTable: String,
                       dstRoot: String, dstTable: String,
                       keyCol: String): Option[(Long, Long)] =
    applyChangesScd2(s, srcRoot, srcTable, dstRoot, dstTable, Seq(keyCol))

  /** Composite-key form of [[applyChangesScd2]]: netting, the per-key
    * timeline (`lead`), open-row closes, and the merge identity all
    * run per COMPLETE key tuple — sibling keys sharing a column value
    * never interfere (the q323/q324 `keyCols` discipline raised to
    * the history-keeping tier). The single-key delegate above keeps
    * its output bit-unchanged: same `__hkey = key:start_v` surrogate,
    * same merge key. Composite histories merge on the REAL columns
    * `(keys..., __start_v)` — a separator-string surrogate could
    * alias two tuples whose values contain the separator — while
    * `__hkey` (concat_ws of key parts + start_v) stays as the
    * human-readable row identity. */
  def applyChangesScd2(s: SparkSession, srcRoot: String, srcTable: String,
                       dstRoot: String, dstTable: String,
                       keyCols: Seq[String]): Option[(Long, Long)] = {
    require(keyCols.nonEmpty && keyCols.distinct.size == keyCols.size,
      s"applyChangesScd2: key columns must be non-empty and distinct ($keyCols)")
    val appId = s"applyscd2-$dstTable"
    val fromV = lastCommittedTxn(dstRoot, appId).getOrElse(0L)
    val to = snapshotVersion(srcRoot)
    if (to <= fromV) return None
    val keyC = keyCols.map(col)
    val feed = readChangeFeed(s, srcRoot, srcTable, fromV, to)
    val wKV = org.apache.spark.sql.expressions.Window
      .partitionBy(keyC :+ col("_commit_version"): _*)
      .orderBy(when(col("_change_type") === "insert", 1).otherwise(0).desc)
    val kv = feed.withColumn("_rn", row_number().over(wKV))
      .filter(col("_rn") === 1).drop("_rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dataCols = kv.columns
        .filterNot(c => c == "_change_type" || c == "_commit_version")
      val wK = org.apache.spark.sql.expressions.Window
        .partitionBy(keyC: _*).orderBy(col("_commit_version"))
      val timeline = kv
        .withColumn("__end_v", lead(col("_commit_version"), 1).over(wK))
        .withColumn("_firstv", min(col("_commit_version")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(keyC: _*)))
      val hkey = // single-key form kept literally bit-unchanged (concat
        // nulls out on a NULL key where concat_ws would skip it)
        if (keyCols.size == 1)
          concat(keyC.head.cast("string"), lit(":"),
            col("__start_v").cast("string"))
        else concat_ws(":",
          keyC.map(_.cast("string")) :+ col("__start_v").cast("string"): _*)
      val newRows = timeline.filter(col("_change_type") === "insert")
        .select(dataCols.toIndexedSeq.map(col) :+
          col("_commit_version").as("__start_v") :+ col("__end_v"): _*)
        .withColumn("__hkey", hkey)
      val firstPerKey = timeline.select(keyC :+ col("_firstv"): _*).distinct()
      val dstV = snapshotVersion(dstRoot)
      val dstExists = dstV > 0 &&
        manifestRows(s, dstRoot, dstV).exists(_._1 == dstTable)
      // merge identity: the surrogate for single keys (bit-unchanged
      // legacy), the real (keys..., __start_v) tuple for composites
      val mergeKeys =
        if (keyCols.size == 1) Seq("__hkey") else keyCols :+ "__start_v"
      // empty-feed interval → pure no-op (see applyChangesInto): no
      // empty commit, ledger untouched, statement re-drives quiesce
      if (dstExists && kv.isEmpty) return Some((0L, 0L))
      if (!dstExists) {
        val nNew = newRows.count()
        try commitAppendStats(s, dstRoot, dstTable, newRows,
          Seq("__hkey") ++ keyCols, "__hkey", 1, txn = Some(appId -> to))
        catch { case _: TxnAlreadyCommitted => () }
        Some((nNew, 0L))
      } else {
        // close the open rows of affected keys at their first event
        // version; the closed images REPLACE the open rows (same
        // merge identity) in the same merge that lands the new intervals
        val closed = readTable(s, dstRoot, dstTable)
          .filter(col("__end_v").isNull)
          .join(firstPerKey, keyCols, "inner")
          .withColumn("__end_v", col("_firstv")).drop("_firstv")
        // the (opened, closed) report rides OBSERVE metrics on the
        // merge's own first pass (its key-bounds aggregate pins the
        // batch and scans it fully) — zero extra actions per sync
        // (previously two count() passes), the q251 unload-report
        // device. An all-empty batch merges as an early no-op (no
        // claim, ledger untouched — the statement-re-drive quiesce
        // contract), and the metrics still fire on that same pass.
        val obs = org.apache.spark.sql.Observation()
        val batch = closed.withColumn("__cl", lit(1L))
          .unionByName(newRows.withColumn("__cl", lit(0L)))
          .observe(obs, count(lit(1)).as("n_total"),
            sum(col("__cl")).as("n_closed"))
          .drop("__cl")
        try commitMergeUpsert(s, dstRoot, dstTable, batch, mergeKeys,
          maxRetries = 5, txn = Some(appId -> to), allowEvolution = false)
        catch { case _: TxnAlreadyCommitted => () }
        val m = obs.get
        val nTotal = m("n_total").asInstanceOf[Long]
        val nClosed = // sum over zero rows observes as null
          Option(m("n_closed")).fold(0L)(_.asInstanceOf[Long])
        Some((nTotal - nClosed, nClosed))
      }
    } finally kv.unpersist()
  }

  /** Exactly-once incremental consumption: maintain `dstTable` (in its
    * own manifest root) as `transform` of `srcTable`, advancing one
    * source-log interval per call — the BATCH form of the streaming
    * sink's ledger loop, and the missing half of [[tableChanges]]
    * (which discovers the delta but leaves progress tracking to the
    * caller).
    *
    * Progress IS the destination's txn ledger: the applied source
    * version rides a `_txn_<appId>` marker inside the destination
    * commit's claim, atomic with the derived rows — so a re-driven
    * sync is a no-op (claim-time [[TxnAlreadyCommitted]]) and two
    * racing drivers resolve to exactly one application. Append-only
    * intervals apply as transform(added rows) appended — O(delta);
    * an interval containing a REWRITE (compaction / DELETE / MERGE)
    * applies as transform(full snapshot) replacing the destination
    * table — the consumer's full-refresh contract, taken
    * automatically instead of double-counting. `transform` must be
    * row-local (filter/project) for the append path to be sound;
    * aggregation consumers belong to [[Views.refreshDaily]].
    *
    * Returns (applied source version, destination version, pureAppend)
    * or None when the ledger is already current. */
  def consumeInto(s: SparkSession, srcRoot: String, srcTable: String,
                  dstRoot: String, dstTable: String, appId: String)(
      transform: DataFrame => DataFrame): Option[(Long, Long, Boolean)] = {
    val from = lastCommittedTxn(dstRoot, appId).getOrElse(0L)
    val to = snapshotVersion(srcRoot)
    require(from <= to,
      s"consumer ledger at v$from but source only at v$to: " +
        "the source log was reset under the consumer — re-bootstrap")
    if (to == from) return None
    val (delta, pure) = tableChanges(s, srcRoot, srcTable, from, to)
    try {
      val dstV =
        if (pure && from > 0)
          commitAppend(s, dstRoot, dstTable, transform(delta),
            txn = Some(appId -> to))
        else // bootstrap, or an interval with a rewrite: full refresh
          commitReplace(s, dstRoot, dstTable,
            // PINNED at `to`: the ledger records `to`, so absorbing a
            // concurrent commit past it here would replay that commit
            // on the next sync (double-apply)
            transform(readTable(s, srcRoot, srcTable, to)),
            txn = Some(appId -> to))
      Some((to, dstV, pure))
    } catch {
      // a racing driver applied this interval first: exactly-once no-op
      case _: TxnAlreadyCommitted => None
    }
  }

  // --------------------------------------------------------- schema registry

  private def schemaMarker(table: String) = s"_schema_$table.json"

  /** Schema-enforced append (q197): the manifest layer is also the
    * SCHEMA REGISTRY — each registration is a `_schema_<table>.json`
    * marker STAGED INSIDE the registering commit's claim dir, so rows
    * and registration appear in one atomic rename (a crash can never
    * commit evolved data files without their registration, which would
    * silently drop the new column at read). Registrations are per
    * TABLE, and resolution takes the newest registration at or below
    * the requested version — a non-evolving commit (append, replace,
    * compaction) between evolutions therefore never strands readers.
    * An append must match the registered schema: every existing column
    * present with its exact type, no new columns unless
    * `allowEvolution` (then the union schema becomes the new
    * registration and old files NULL-fill the added columns at read).
    * Claim-time VALIDATION re-reads the registration: if a concurrent
    * evolving append registered first, this commit rebases — re-reads
    * the new registration, re-enforces, and re-registers the union —
    * so two concurrent evolutions can never lose each other's columns.
    * This is write-side enforcement — the q174 lesson ("pin the
    * evolved schema in the catalog, don't footer-merge per query")
    * with the manifest as the catalog: [[readTableEvolved]] reads with
    * the REGISTERED schema, so reads never pay a footer-merge and
    * never depend on file order. */
  def commitAppendEvolve(s: SparkSession, root: String, table: String,
                         df: DataFrame, allowEvolution: Boolean = false,
                         maxRetries: Int = 5): Long = {
    def enforceAndUnion(current: Option[StructType]): StructType = {
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
        // a name DROPPED or RENAMED AWAY is reserved: old files still
        // physically store it, and a schema-pinned read maps by name —
        // re-adding would resurrect their values under the new column
        val resurrected = added.intersect(reservedNames(root, table))
        if (resurrected.nonEmpty)
          throw new IllegalArgumentException(
            s"schema evolution: ${resurrected.mkString(",")} previously " +
              s"existed on $table — old files still store the name; " +
              "re-adding would resurrect their values")
      }
      current match {
        case Some(cur) =>
          // added columns register NULLABLE regardless of the batch's
          // nullability: pre-evolution files have no value for them,
          // and a non-nullable registration would NPE codegen on the
          // first NULL-filled read
          StructType(cur.fields ++
            df.schema.fields.filterNot(f => cur.fieldNames.contains(f.name))
              .map(_.copy(nullable = true)))
        case None => df.schema
      }
    }
    // enforce against the registration read NOW; data publishes once —
    // a registration conflict retries metadata only, never the write
    var current = registeredSchema(s, root, table)
    var evolved = enforceAndUnion(current)
    val hint = nextVersion(root)
    // footer stats with no stat columns still record `__nrows`, so
    // evolve appends stay metadata-countable (and a zero-row
    // registration-only append never forces a scan)
    val newRows = statsRowsFor(s, root, table,
      publishData(s, root, hint, table, df), Nil)
    var tries = 0
    while (true) {
      try {
        return casCommit(s, root, { base =>
          if (registeredSchema(s, root, table, base) != current)
            throw new CommitConflict(
              s"$table's registered schema changed under the evolving append")
          deltaOrFull(s, root, base, Nil, newRows)
            .copy(extras = Seq(schemaMarker(table) -> evolved.json.getBytes("UTF-8")))
        }, maxRetries)
      } catch {
        case _: CommitConflict =>
          tries += 1
          if (tries >= maxRetries)
            retireAndFail(root, table,
              s"commitAppendEvolve: $table's registration kept changing " +
                s"($maxRetries attempts) at $root")
          current = registeredSchema(s, root, table)
          evolved = enforceAndUnion(current) // may rightly REJECT now
      }
    }
    -1L // unreachable
  }

  /** The schema registered for `table` at `version` (default current):
    * the newest claim at or below the version carrying the table's
    * registration marker, if any. Claim dirs are the registry —
    * [[vacuum]] carries the newest marker past the retention floor. */
  def registeredSchema(s: SparkSession, root: String, table: String,
                       version: Long = -1L): Option[StructType] = {
    val v = if (version >= 0) version else snapshotVersion(root)
    claimedVersions(root).reverseIterator
      .filter(_ <= v)
      .map(cv => Paths.get(root, "manifest", s"v$cv", schemaMarker(table)))
      .find(Files.exists(_))
      .map(p => org.apache.spark.sql.types.DataType
        .fromJson(new String(Files.readAllBytes(p), "UTF-8"))
        .asInstanceOf[StructType])
      // an EMPTY marker is DROP TABLE's unregistration sentinel: the
      // NEWEST marker wins outright (no fallback to an older one)
      .filter(_.fields.nonEmpty)
  }

  /** Read an evolved table with its REGISTERED schema pinned: files
    * written before a column existed NULL-fill it — no per-query
    * footer merge, no file-order dependence. */
  def readTableEvolved(s: SparkSession, root: String, table: String): DataFrame = {
    val v = snapshotVersion(root)
    val schema = registeredSchema(s, root, table).getOrElse(
      throw new IllegalStateException(s"no registered schema for $table at v$v"))
    val rows = manifestRows(s, root, v)
      .collect { case (t, f, st) if t == table => (f, st) }
    // the pinned-schema read below is a plain file scan: refuse DV'd
    // files rather than resurrect their deleted rows (compact first)
    require(!rows.exists(r => dvRefOf(r._2).isDefined),
      s"table $table@v$v carries deletion vectors: compact before an " +
        "evolved-schema read")
    readPinned(s, schema,
      rows.map { case (f, _) => s"$root/$f" }.toIndexedSeq)
  }

  // ---------------------------------------------------- schema DDL (metadata)

  /** Field-metadata key carrying a renamed column's FORMER physical
    * names, oldest first — files written before a rename still store
    * the old name, and the alias-aware read coalesces across the
    * chain. */
  private val aliasKey = "graft.aliases"

  private[graft] def aliasesOf(f: StructField): Seq[String] =
    if (f.metadata.contains(aliasKey)) f.metadata.getStringArray(aliasKey).toSeq
    else Nil

  /** Field-metadata key carrying an ADD COLUMN DEFAULT's literal SQL
    * text — served by pinned reads for files that predate the column
    * and applied by positional INSERT for the missing trailing
    * column. */
  private val defaultKey = "graft.default"

  private[graft] def defaultOf(f: StructField): Option[String] =
    if (f.metadata.contains(defaultKey)) Some(f.metadata.getString(defaultKey))
    else None

  /** Field-metadata key carrying the table's DROPPED-name tombstones
    * (rides the first field — StructType has no table-level metadata
    * slot). The NEWEST registration is self-contained: the guard
    * survives vacuum, which always carries the newest marker. */
  private val droppedKey = "graft.dropped"

  private def droppedOf(schema: StructType): Seq[String] =
    schema.fields.toSeq.flatMap(f =>
      if (f.metadata.contains(droppedKey)) f.metadata.getStringArray(droppedKey).toSeq
      else Nil)

  /** Every name ever registered for `table` across the RETAINED claim
    * history (current fields, renamed-away physical names, dropped
    * columns): the RESERVED set. A once-stored name cannot be
    * (re)introduced — files written before the drop/rename physically
    * carry it, and a schema-pinned read maps by name, so a
    * re-registration would RESURRECT the old files' values under the
    * new column. Metadata-sized (one small JSON per retained marker);
    * tombstones live exactly as long as the markers — [[vacuum]]
    * carries the newest marker, so the guard holds while any file
    * predating the drop can still be referenced. */
  private def reservedNames(root: String, table: String): Set[String] =
    claimedVersions(root).flatMap { cv =>
      val p = Paths.get(root, "manifest", s"v$cv", schemaMarker(table))
      if (!Files.exists(p)) Nil
      else {
        val sc = org.apache.spark.sql.types.DataType
          .fromJson(new String(Files.readAllBytes(p), "UTF-8"))
          .asInstanceOf[StructType]
        sc.fields.toSeq.flatMap(f => f.name +: aliasesOf(f)) ++ droppedOf(sc)
      }
    }.toSet

  /** Refuse a schema DDL whose column is referenced by a registered
    * CHECK constraint (word-bounded text match — conservative: a
    * literal containing the name also refuses). */
  private def guardConstraintRefs(root: String, table: String,
                                  colName: String, verb: String): Unit = {
    val re = ("(?i)(?<![A-Za-z0-9_])" +
      java.util.regex.Pattern.quote(colName) + "(?![A-Za-z0-9_])").r
    val hits = checkConstraints(root, table)
      .filter { case (_, ex) => re.findFirstIn(ex).isDefined }
    require(hits.isEmpty,
      s"$verb $colName on $table: CHECK constraint(s) " +
        s"${hits.keys.mkString(", ")} reference it — drop them first")
  }

  /** Shared metadata-only schema-DDL commit: claim a no-op delta
    * whose schema extra registers `xform(current)`; the registration
    * serializes with every other commit through the CAS (a racing
    * evolve retries, as in [[commitAppendEvolve]]). */
  private def commitSchemaChange(s: SparkSession, root: String, table: String,
                                 maxRetries: Int)
                                (xform: StructType => StructType): Long = {
    var tries = 0
    while (true) {
      val reg = registeredSchema(s, root, table)
      val v = snapshotVersion(root)
      require(v > 0 && (reg.isDefined ||
          manifestRows(s, root, v).exists(_._1 == table)),
        s"unknown table $table at $root")
      val current = reg.getOrElse(readTable(s, root, table).schema)
      val next = xform(current)
      try {
        return casCommit(s, root, { base =>
          if (registeredSchema(s, root, table, base) != reg)
            throw new CommitConflict(
              s"$table's registered schema changed under the DDL")
          deltaOrFull(s, root, base, Nil, Nil)
            .copy(extras = Seq(schemaMarker(table) -> next.json.getBytes("UTF-8")))
        }, maxRetries)
      } catch {
        case _: CommitConflict =>
          tries += 1
          if (tries >= maxRetries)
            retireAndFail(root, table,
              s"schema DDL: $table's registration kept changing " +
                s"($maxRetries attempts) at $root")
      }
    }
    -1L // unreachable
  }

  /** DROP COLUMN as metadata DDL — registers the narrowed schema,
    * touches no data: every registered-schema read (the evolved API
    * read, the SQL view, INSERT's positional target) stops serving
    * the column NOW; old files keep the bytes until a rewrite
    * retires them (invisible — reads project the registration). The
    * name becomes RESERVED ([[reservedNames]]): re-adding it would
    * resurrect the old files' values. Refuses while a CHECK
    * constraint references the column. */
  def commitDropColumn(s: SparkSession, root: String, table: String,
                       colName: String, maxRetries: Int = 5): Long = {
    guardConstraintRefs(root, table, colName, "DROP COLUMN")
    commitSchemaChange(s, root, table, maxRetries) { cur =>
      require(cur.fieldNames.contains(colName),
        s"DROP COLUMN: no column $colName on $table " +
          s"(has ${cur.fieldNames.mkString(", ")})")
      require(cur.length > 1,
        s"DROP COLUMN: cannot drop $table's only column")
      val victim = cur.fields.find(_.name == colName).get
      // the tombstone list: prior drops + this name + its rename
      // aliases (files may store any of them), re-attached to the
      // narrowed schema's first field so the NEWEST marker alone
      // carries the full guard
      val dropped = (droppedOf(cur) ++ aliasesOf(victim) :+ colName).distinct
      val remaining = cur.fields.filterNot(_.name == colName).map { f =>
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
        mb.remove(droppedKey)
        StructField(f.name, f.dataType, f.nullable, mb.build())
      }
      val mb0 = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(remaining.head.metadata)
        .putStringArray(droppedKey, dropped.toArray)
      StructType(remaining.head.copy(metadata = mb0.build()) +: remaining.tail)
    }
  }

  /** RENAME COLUMN as metadata DDL — registers the renamed schema
    * with the former name carried as a read ALIAS in field metadata:
    * no data moves; alias-aware reads coalesce (new name, …former
    * names) per file, so files from before the rename serve their
    * values under the new name. Writes always use the CURRENT name,
    * so rewrites normalize opportunistically. The old name stays
    * RESERVED. Refuses while a CHECK constraint references the
    * column, and refuses a target name that was ever registered. */
  def commitRenameColumn(s: SparkSession, root: String, table: String,
                         from: String, to: String,
                         maxRetries: Int = 5): Long = {
    require(from != to, s"RENAME COLUMN: $from to itself")
    require(to.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"RENAME COLUMN: unsafe target name $to")
    guardConstraintRefs(root, table, from, "RENAME COLUMN")
    val reserved = reservedNames(root, table)
    commitSchemaChange(s, root, table, maxRetries) { cur =>
      require(cur.fieldNames.contains(from),
        s"RENAME COLUMN: no column $from on $table")
      require(!cur.fieldNames.contains(to),
        s"RENAME COLUMN: $table already has a column $to")
      require(!reserved.contains(to) || cur.fieldNames.contains(to),
        s"RENAME COLUMN: $to was previously a column of $table — old " +
          "files still store it; a re-registration would resurrect them")
      StructType(cur.fields.map { f =>
        if (f.name != from) f
        else {
          val mb = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putStringArray(aliasKey, (aliasesOf(f) :+ from).toArray)
          StructField(to, f.dataType, f.nullable, mb.build())
        }
      })
    }
  }

  /** ALTER COLUMN TYPE — WIDENING only, as metadata DDL: one commit
    * registers the widened schema, ZERO data moves. Files written
    * before the widening serve through the pinned-schema read's
    * parquet type PROMOTION (Spark's reader serves INT32 as LongType,
    * FLOAT as DoubleType, and DECIMAL precision growth directly —
    * SchemaDdlSpec pins the read-back against literally-pre-widen
    * files); post-widen appends land in the widened type, and
    * INSERT's positional cast follows the registration automatically.
    * Narrowing and lossy changes refuse LOUDLY — they would truncate
    * silently at read, the one failure mode a schema registry exists
    * to prevent. Legal widenings: byte→short/int/long, short→int/long,
    * int→long, float→double, decimal(p,s)→decimal(P,s) with P>p (a
    * scale change relocates the point — refused). Rename aliases
    * widen with the field: old files storing the former name promote
    * the same way. At 100 TB this is the schema evolution a
    * long-lived fact table eventually needs — an id column outgrowing
    * INT — priced as one metadata commit instead of a full rewrite. */
  def commitAlterColumnType(s: SparkSession, root: String, table: String,
                            colName: String,
                            newType: org.apache.spark.sql.types.DataType,
                            maxRetries: Int = 5): Long = {
    import org.apache.spark.sql.types._
    def widens(from: DataType, to: DataType): Boolean = (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (d1: DecimalType, d2: DecimalType) =>
        d2.scale == d1.scale && d2.precision > d1.precision
      case _ => false
    }
    commitSchemaChange(s, root, table, maxRetries) { cur =>
      val f = cur.fields.find(_.name == colName).getOrElse(
        throw new IllegalArgumentException(
          s"ALTER COLUMN: no column $colName on $table " +
            s"(has ${cur.fieldNames.mkString(", ")})"))
      require(f.dataType != newType,
        s"ALTER COLUMN: $colName is already ${f.dataType.sql}")
      require(widens(f.dataType, newType),
        s"ALTER COLUMN: ${f.dataType.sql} -> ${newType.sql} is not a " +
          "widening (narrowing/lossy changes would truncate silently " +
          "at read) — refused")
      StructType(cur.fields.map(x =>
        if (x.name == colName) x.copy(dataType = newType) else x))
    }
  }

  /** `ALTER TABLE t ADD COLUMN c <type> DEFAULT <literal>` — metadata
    * DDL: registers the widened schema with the default's SQL text in
    * the new field's metadata. Pre-evolution rows SERVE the default on
    * every pinned read (per-file footer branching in [[readPinned]] —
    * a post-evolution row that stored NULL stays NULL, the distinction
    * `coalesce` alone would erase), and positional INSERT fills the
    * missing trailing column with it. Only LITERAL defaults register
    * (a bare literal or a cast of one): a column reference has nothing
    * to bind, and a function call (`current_date()`, `rand()`) would
    * re-evaluate per read, silently drifting the values pre-evolution
    * rows serve — both refuse loudly at DDL time, as does a default
    * that does not cast to the declared type. */
  def commitAddColumnDefault(s: SparkSession, root: String, table: String,
                             colName: String, dt: org.apache.spark.sql.types.DataType,
                             defaultSql: String, maxRetries: Int = 5): Long = {
    val parsed = s.sessionState.sqlParser.parseExpression(defaultSql)
    def literalTree(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      e match {
        case _: org.apache.spark.sql.catalyst.expressions.Literal => true
        case c: org.apache.spark.sql.catalyst.expressions.Cast => literalTree(c.child)
        case _ => false
      }
    require(literalTree(parsed),
      s"ADD COLUMN DEFAULT: '$defaultSql' is not a literal — column " +
        "references and function calls (current_date(), rand(), ...) " +
        "would drift per read; register a constant")
    // the default must cast to the declared type NOW, not at first
    // read (ANSI mode throws on a bad cast; non-ANSI yields NULL —
    // both surface as the same loud DDL-time refusal)
    // a typed NULL (`CAST(NULL AS STRING)`) is as legal a default as a
    // bare NULL — recurse through the casts to the literal's value
    // (a cast chain over null folds to null in every SQL dialect)
    def foldsToNull(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      e match {
        case l: org.apache.spark.sql.catalyst.expressions.Literal => l.value == null
        case c: org.apache.spark.sql.catalyst.expressions.Cast => foldsToNull(c.child)
        case _ => false
      }
    val isNullLit = foldsToNull(parsed)
    val castOk =
      try !s.range(1).select(expr(defaultSql).cast(dt).as("d")).head().isNullAt(0)
      catch { case _: Exception => false }
    require(castOk || isNullLit,
      s"ADD COLUMN DEFAULT: '$defaultSql' does not cast to ${dt.sql}")
    commitSchemaChange(s, root, table, maxRetries) { cur =>
      require(!cur.fieldNames.contains(colName),
        s"ALTER TABLE $table: column $colName already exists")
      val resurrected = Set(colName).intersect(reservedNames(root, table))
      require(resurrected.isEmpty,
        s"ALTER TABLE $table: $colName previously existed — old files " +
          "still store the name; re-adding would resurrect their values")
      StructType(cur.fields :+ StructField(colName, dt, nullable = true,
        metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .putString(defaultKey, defaultSql).build()))
    }
  }

  /** Alias-aware schema-pinned read: files are scanned with the
    * PHYSICAL union schema (current names + every rename alias, each
    * NULL-filled where absent) and projected back to the logical
    * schema by per-field `coalesce(current, …aliases)` — exactly one
    * physical column is present per file, so the coalesce picks the
    * stored values regardless of which side of a rename the file was
    * written on. Alias-free schemas take the plain pinned read
    * (byte-identical behavior).
    *
    * Columns registered with a DEFAULT ([[commitAddColumnDefault]])
    * branch PER FILE by footer schema: a file written BEFORE the
    * column existed serves the registered default expression, a file
    * carrying the physical column serves its stored values — including
    * stored NULLs, which a naive `coalesce(col, default)` would
    * silently rewrite (the default-vs-NULL distinction warehouses
    * keep). The branching costs one footer open per file at PLANNING
    * time, only for schemas that register a default; default-free
    * schemas take the existing paths untouched. */
  private def readPinned(s: SparkSession, schema: StructType,
                         paths: Seq[String],
                         posNames: Option[(String, String)] = None): DataFrame = {
    // position columns ride the SCAN relation (hidden `_metadata` only
    // resolves there, never after a projection)
    def posCols = posNames.toSeq.flatMap { case (p, ri) => Seq(
      expr("concat('/', regexp_replace(_metadata.file_path, '^[a-z]+:/+', ''))")
        .as(p),
      col("_metadata.row_index").as(ri))
    }
    def readGroup(ps: Seq[String], absent: Set[String]): DataFrame = {
      def serve(f: StructField): org.apache.spark.sql.Column =
        if (absent.contains(f.name))
          expr(defaultOf(f).get).cast(f.dataType).as(f.name)
        else {
          val alts = aliasesOf(f)
          if (alts.isEmpty) col(f.name)
          else coalesce((f.name +: alts.reverse).map(col): _*).as(f.name)
        }
      val aliased = schema.fields.exists(f => aliasesOf(f).nonEmpty)
      if (!aliased && absent.isEmpty) {
        val df = s.read.schema(schema).parquet(ps: _*)
        if (posNames.isEmpty) df
        else df.select(schema.fieldNames.toIndexedSeq.map(col) ++ posCols: _*)
      } else {
        val phys = StructType(schema.fields.flatMap { f =>
          StructField(f.name, f.dataType, nullable = true) +:
            aliasesOf(f).map(a => StructField(a, f.dataType, nullable = true))
        })
        s.read.schema(phys).parquet(ps: _*)
          .select(schema.fields.toIndexedSeq.map(serve) ++ posCols: _*)
      }
    }
    val defCols = schema.fields.filter(f => defaultOf(f).isDefined).map(_.name)
    // empty file list: groupBy/reduce below would throw on reduce —
    // serve the empty schema'd frame the default-free branch always did
    if (defCols.isEmpty || paths.isEmpty) readGroup(paths, Set.empty)
    else {
      val conf = s.sparkContext.hadoopConfiguration
      paths.groupBy(p => defCols.toSeq
          .filterNot(FooterStats.physicalColumns(conf, p).contains))
        .map { case (absent, ps) => readGroup(ps, absent.toSet) }
        .reduce(_ unionByName _)
    }
  }

  // ------------------------------------------------------------- maintenance

  /** OPTIMIZE through the commit log (q196): bin-pack `table`'s
    * current file set into `ceil(bytes / targetBytes)` files and
    * publish the rewrite as ONE replace-commit. Readers atomically
    * flip from many-small to few-large; the fragmented version remains
    * time-travelable until [[vacuum]]. Planning is metadata-only
    * (manifest rows + file sizes); the rewrite reads exactly the table
    * once. The replace VALIDATES that the file set it read is still
    * the table's file set at claim time and retries the whole rewrite
    * otherwise — compaction racing an ingest append (the steady state
    * of q190's streaming table) can therefore never erase the
    * append. */
  /** INCREMENTAL compaction: bin-pack only the files smaller than
    * `minBytes`, inheriting every right-sized file by reference — the
    * production OPTIMIZE shape. [[compactTable]] rewrites the whole
    * table (right after a streaming backfill that IS the small-file
    * set, so it's fine there), but a 100-TB table with a daily trickle
    * of small batch files must pay O(small files), not O(table):
    * here the rewrite reads and writes only the smalls, the commit is
    * a delta of (remove smalls, add packed), and a second run is a
    * version NO-OP because nothing is left under the threshold.
    * DV-masked smalls resolve through the merge-on-read scan, so
    * their sidecars purge with them. Returns the new version (or the
    * current one when no file qualifies). */
  def compactSmallFiles(s: SparkSession, root: String, table: String,
                        minBytes: Long, targetBytes: Long,
                        maxRetries: Int = 5): Long = {
    var attempt = 0
    while (true) {
      val base = latestReadableClaim(root)
      require(base > 0, s"no committed snapshot at $root")
      val rows = manifestRows(s, root, base)
        .collect { case (t, f, st) if t == table => (f, st) }
      require(rows.nonEmpty, s"table $table absent from snapshot v$base")
      val smalls = rows.filter { case (f, _) =>
        Files.size(Paths.get(root, f)) < minBytes }
      if (smalls.size < 2) return base // nothing worth packing
      val bytes = smalls.map { case (f, _) => Files.size(Paths.get(root, f)) }.sum
      val bins = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      val packed = readResolved(s, root, smalls,
        registeredSchema(s, root, table, base)).repartition(bins)
      val hint = nextVersion(root)
      val newRows = publishData(s, root, hint, table, packed)
        .map(f => (table, f, null: String))
      val expected = rows.map(_._1).toSet
      try {
        return casCommit(s, root, { b =>
          val cur = manifestRows(s, root, b)
            .collect { case (t, f, _) if t == table => f }.toSet
          if (cur != expected)
            throw new CommitConflict(
              s"$table changed under the compaction: ${cur.size} files at " +
                s"v$b, compaction read ${expected.size}")
          deltaOrFull(s, root, b, Nil, newRows,
            removes = smalls.map { case (f, _) => (table, f) })
        }, maxRetries) // benign claim races retry inside; CommitConflict escapes
      } catch {
        case _: CommitConflict =>
          attempt += 1
          if (attempt >= maxRetries)
            retireAndFail(root, table,
              s"compactSmallFiles: lost $maxRetries races at $root")
      }
    }
    0L // unreachable
  }

  /** `OPTIMIZE ... WHERE` — Delta's predicate-scoped compaction: only
    * files whose recorded stats OVERLAP the predicate bin-pack;
    * everything else inherits by reference. The maintenance verb for
    * "yesterday's partition fragmented" — at 100 TB a full-table
    * OPTIMIZE rewrites everything, this rewrites O(scope). The packed
    * files re-record stats for the predicate columns, so the rewrite
    * never costs the table its pruning power. Same conflict discipline
    * as [[compactSmallFiles]] (full-table read set, whole-rewrite
    * retry). Returns (version, files in scope, files packed). */
  def compactTableWhere(s: SparkSession, root: String, table: String,
                        preds: Seq[Pred], targetBytes: Long = 128L << 20,
                        maxRetries: Int = 5): (Long, Int, Int) = {
    require(preds.nonEmpty, "OPTIMIZE WHERE: empty predicate")
    var attempt = 0
    while (true) {
      val base = latestReadableClaim(root)
      require(base > 0, s"no committed snapshot at $root")
      val rows = manifestRows(s, root, base)
        .collect { case (t, f, st) if t == table => (f, st) }
      require(rows.nonEmpty, s"table $table absent from snapshot v$base")
      val (affected, _) = overlappingRows(s, root, table, preds, base)
      // nothing worth packing: no rewrite happened and no commit was
      // claimed, so files_packed reports 0 — not the in-scope count
      if (affected.size < 2) return (base, affected.size, 0)
      val files = affected.map { case (_, f, st) => (f, st) }
      val bytes = files.map { case (f, _) => Files.size(Paths.get(root, f)) }.sum
      val bins = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      val packed = readResolved(s, root, files,
        registeredSchema(s, root, table, base)).repartition(bins)
      val hint = nextVersion(root)
      val newRows = statsRowsFor(s, root, table,
        publishData(s, root, hint, table, packed),
        preds.map(_.column).distinct)
      val expected = rows.map(_._1).toSet
      try {
        return (casCommit(s, root, { b =>
          val cur = manifestRows(s, root, b)
            .collect { case (t, f, _) if t == table => f }.toSet
          if (cur != expected)
            throw new CommitConflict(
              s"$table changed under the scoped compaction at v$b")
          deltaOrFull(s, root, b, Nil, newRows,
            removes = affected.map { case (t, f, _) => (t, f) })
        }, maxRetries), affected.size, newRows.size)
      } catch {
        case _: CommitConflict =>
          attempt += 1
          if (attempt >= maxRetries)
            retireAndFail(root, table,
              s"compactTableWhere: lost $maxRetries races at $root")
      }
    }
    (0L, 0, 0) // unreachable
  }

  /** REORG TABLE ... APPLY (PURGE) — Delta's deletion-vector
    * hardening pass: rewrite ONLY the files that carry a DV,
    * physicalizing their soft deletes, and inherit every clean file
    * by reference. Merge-on-read keeps deletes O(matched files) at
    * write time; this is the matching maintenance verb that bounds
    * read-time DV masking — rewrite cost is O(DV'd files), never the
    * table. Returns (newVersion, nPurgedFiles); no commit at all when
    * no file carries a DV. Claim-time read-set validation refuses if
    * the table changed under the rewrite; the pre-purge state stays
    * time-travelable. */
  def compactPurgeDv(s: SparkSession, root: String, table: String,
                     maxRetries: Int = 5): (Long, Int) = {
    var attempt = 0
    while (true) {
      val base = latestReadableClaim(root)
      require(base > 0, s"no committed snapshot at $root")
      val rows = manifestRows(s, root, base)
        .collect { case (t, f, st) if t == table => (f, st) }
      require(rows.nonEmpty, s"table $table absent from snapshot v$base")
      val dvd = rows.filter { case (_, st) => dvRefOf(st).isDefined }
      if (dvd.isEmpty) return (base, 0) // nothing to harden
      // stats parity: re-record whatever prune columns the doomed
      // files carried (schema fields only — reserved __ keys regrow
      // from the footers)
      val statsCols = {
        val sch = registeredSchema(s, root, table, base)
          .getOrElse(readTable(s, root, table, base).schema).fieldNames.toSet
        dvd.flatMap { case (_, st) =>
          parseStatsJson(st).keys.filter(sch) }.distinct
      }
      val packed = readResolved(s, root, dvd,
        registeredSchema(s, root, table, base))
        .repartition(dvd.size)
      val hint = nextVersion(root)
      val newRows = statsRowsFor(s, root, table,
        publishData(s, root, hint, table, packed), statsCols)
      val expected = rows.map(_._1).toSet
      try {
        return (casCommit(s, root, { b =>
          val cur = manifestRows(s, root, b)
            .collect { case (t, f, _) if t == table => f }.toSet
          if (cur != expected)
            throw new CommitConflict(
              s"$table changed under the DV purge: ${cur.size} files at " +
                s"v$b, purge read ${expected.size}")
          deltaOrFull(s, root, b, Nil, newRows,
            removes = dvd.map { case (f, _) => (table, f) })
        }, maxRetries), dvd.size)
      } catch {
        case _: CommitConflict =>
          attempt += 1
          if (attempt >= maxRetries)
            retireAndFail(root, table,
              s"compactPurgeDv: lost $maxRetries races at $root")
      }
    }
    (0L, 0) // unreachable
  }

  def compactTable(s: SparkSession, root: String, table: String,
                   targetBytes: Long, maxRetries: Int = 5): Long = {
    var attempt = 0
    while (true) {
      val base = latestReadableClaim(root)
      require(base > 0, s"no committed snapshot at $root")
      val rows = manifestRows(s, root, base)
        .collect { case (t, f, st) if t == table => (f, st) }
      val files = rows.map(_._1)
      val bytes = files.map(f => Files.size(Paths.get(root, f))).sum
      val bins = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      // merge-on-read: compaction purges deletion vectors naturally
      // (and, pinned, rewrites renamed columns under their CURRENT
      // name — the opportunistic normalization pass)
      val compacted = readResolved(s, root, rows,
        registeredSchema(s, root, table, base)).repartition(bins)
      try {
        return commitReplace(s, root, table, compacted, maxRetries,
          expectedFiles = Some(files.toSet))
      } catch {
        case _: CommitConflict =>
          attempt += 1
          if (attempt >= maxRetries)
            retireAndFail(root, table,
              s"compactTable: $table kept changing under the rewrite " +
                s"($maxRetries attempts) at $root")
      }
    }
    -1L // unreachable
  }

  /** Stats-pruned DELETE through the commit log: rewrite ONLY the
    * files whose recorded stats overlap `preds` (the bound on where
    * matches can live), dropping rows matching `deleteFilter`;
    * untouched files are inherited by reference, and the commit is a
    * DELTA of (remove affected, add survivors) — O(affected) data I/O
    * AND O(affected) metadata, the "DELETE touches only matching
    * micro-partitions" contract of production formats (here composed
    * from stats pruning + the ops-log remove primitive). The previous
    * version still serves the pre-delete state (time travel / audit)
    * until vacuumed — same copy-on-write story as [[Lifecycle]]'s GDPR
    * erasure, lifted onto the commit log. Validates at claim time that
    * every affected file is still current (a racing replace/delete
    * forces a recompute), and retries the whole rewrite on conflict. */
  def commitDeleteWhere(s: SparkSession, root: String, table: String,
                        preds: Seq[Pred], deleteFilter: org.apache.spark.sql.Column,
                        maxRetries: Int = 5): Long = {
    var tries = 0
    while (true) {
      val base = latestReadableClaim(root)
      require(base > 0, s"no committed snapshot at $root")
      // snapshot-isolation read set: the ENTIRE table file set, not
      // just the affected files — a concurrent append could land
      // matching rows in a NEW file the predicate bound would have
      // selected, so any change to the table forces a recompute
      val expected = manifestRows(s, root, base)
        .collect { case (t, f, _) if t == table => f }.toSet
      val (affected, _) = overlappingRows(s, root, table, preds, base)
      if (affected.isEmpty) return base // no file can hold a match: no-op
      // SQL DELETE semantics: a row is deleted only when the predicate
      // is TRUE — a NULL predicate (null in the filter column) must
      // KEEP the row, so negate coalesce(pred, false), not the bare
      // predicate (!NULL = NULL would silently delete those rows)
      val survivors =
        readResolved(s, root, affected.map { case (_, f, st) => (f, st) },
          registeredSchema(s, root, table, base))
          .filter(!coalesce(deleteFilter, lit(false)))
      val hint = nextVersion(root)
      val relFiles = publishData(s, root, hint, table, survivors)
      val newRows = statsRowsFor(s, root, table, relFiles, preds.map(_.column))
      val removes = affected.map { case (t, f, _) => (t, f) }
      try {
        return casCommit(s, root, { b =>
          val cur = manifestRows(s, root, b)
            .collect { case (t, f, _) if t == table => f }.toSet
          if (cur != expected)
            throw new CommitConflict(
              s"$table changed under the delete (computed at v$base, claiming at v$b)")
          deltaOrFull(s, root, b, Nil, newRows, removes)
        }, maxRetries)
      } catch {
        case _: CommitConflict =>
          tries += 1
          if (tries >= maxRetries)
            retireAndFail(root, table,
              s"commitDeleteWhere: $table kept changing under the rewrite " +
                s"($maxRetries attempts) at $root")
      }
    }
    -1L // unreachable
  }

  /** Stats-pruned UPDATE through the commit log: rewrite ONLY the
    * files whose recorded stats overlap `preds` (the bound on where
    * matches can live), applying `sets` to rows where `updateFilter`
    * is TRUE and carrying every other row of those files unchanged;
    * untouched files are inherited by reference — O(affected) data
    * I/O and O(affected) delta metadata, the UPDATE twin of
    * [[commitDeleteWhere]]. SQL UPDATE semantics throughout: a NULL
    * predicate keeps the original values, and ALL set expressions
    * evaluate against the OLD row (one projection — `SET a = b,
    * b = a` swaps, it does not chain). The pre-update version
    * time-travels until vacuumed; claim-time validation over the
    * full-table read set + whole-rewrite retry, as in
    * [[commitDeleteWhere]] (a concurrent append could land matching
    * rows in a file the bound would have selected). */
  def commitUpdateWhere(s: SparkSession, root: String, table: String,
                        preds: Seq[Pred],
                        updateFilter: org.apache.spark.sql.Column,
                        sets: Map[String, org.apache.spark.sql.Column],
                        maxRetries: Int = 5): Long = {
    require(sets.nonEmpty, "commitUpdateWhere: empty SET list")
    var tries = 0
    while (true) {
      val base = latestReadableClaim(root)
      require(base > 0, s"no committed snapshot at $root")
      val expected = manifestRows(s, root, base)
        .collect { case (t, f, _) if t == table => f }.toSet
      val (affected, _) = overlappingRows(s, root, table, preds, base)
      if (affected.isEmpty) return base // no file can hold a match: no-op
      val current = readResolved(s, root,
        affected.map { case (_, f, st) => (f, st) },
        registeredSchema(s, root, table, base))
      val unknown = sets.keySet.diff(current.columns.toSet)
      require(unknown.isEmpty, s"commitUpdateWhere: SET of unknown columns $unknown")
      val hit = coalesce(updateFilter, lit(false))
      // one SELECT so every set expression sees the pre-update row
      val rewritten = current.select(current.columns.toIndexedSeq.map { c =>
        sets.get(c).map(e => when(hit, e).otherwise(col(c)).cast(
          current.schema(c).dataType).as(c)).getOrElse(col(c))
      }: _*)
      val hint = nextVersion(root)
      val relFiles = publishData(s, root, hint, table, rewritten)
      val newRows = statsRowsFor(s, root, table, relFiles, preds.map(_.column))
      val removes = affected.map { case (t, f, _) => (t, f) }
      try {
        return casCommit(s, root, { b =>
          val cur = manifestRows(s, root, b)
            .collect { case (t, f, _) if t == table => f }.toSet
          if (cur != expected)
            throw new CommitConflict(
              s"$table changed under the update (computed at v$base, claiming at v$b)")
          deltaOrFull(s, root, b, Nil, newRows, removes)
        }, maxRetries)
      } catch {
        case _: CommitConflict =>
          tries += 1
          if (tries >= maxRetries)
            retireAndFail(root, table,
              s"commitUpdateWhere: $table kept changing under the rewrite " +
                s"($maxRetries attempts) at $root")
      }
    }
    -1L // unreachable
  }

  /** MERGE upsert through the commit log: rows of `updates` REPLACE
    * same-key rows and INSERT new keys, in ONE atomic delta commit.
    * The updates' [min, max] of `keyCol` bounds the affected file set
    * via per-file stats (a file that could hold a matching key always
    * overlaps that interval; files without key stats are kept
    * conservatively), so the rewrite touches O(affected) files: each
    * is re-written minus the matched keys (left_anti on the update
    * keys), the update batch lands as fresh files with key stats, and
    * untouched files are inherited by reference. This is "MERGE INTO
    * touches only matching micro-partitions", composed from stats
    * pruning + the ops-log remove primitive; the pre-merge snapshot
    * time-travels until vacuumed. Claim-time validation + whole-
    * rewrite retry guard against racing writers, as in
    * [[commitDeleteWhere]]. */
  def commitMergeUpsert(s: SparkSession, root: String, table: String,
                        updates: DataFrame, keyCol: String,
                        maxRetries: Int = 5,
                        txn: Option[(String, Long)] = None,
                        allowEvolution: Boolean = false): Long =
    commitMergeUpsert(s, root, table, updates, Seq(keyCol), maxRetries,
      txn, allowEvolution)

  /** Composite-key form of [[commitMergeUpsert]]: a target row matches
    * a source row when EVERY key column is equal (a NULL in any key
    * column matches nothing — that source row is a plain insert, as in
    * the single-key path). File pruning is the CONJUNCTION of
    * per-column key bounds through the multi-column per-file stats
    * (q198's machinery): a file survives only if every key column's
    * recorded [min, max] overlaps the source's — at (tenant_id, id)
    * cardinality that conjunction prunes multiplicatively where either
    * bound alone would keep the file. The single-key signature above
    * delegates here with a one-element list, bit-unchanged. */
  def commitMergeUpsert(s: SparkSession, root: String, table: String,
                        updates: DataFrame, keyCols: Seq[String],
                        maxRetries: Int, txn: Option[(String, Long)],
                        allowEvolution: Boolean): Long = {
    require(keyCols.nonEmpty && keyCols.distinct.size == keyCols.size,
      s"commitMergeUpsert: key columns must be non-empty and distinct ($keyCols)")
    // Pin the source batch: a non-deterministic `updates` (sample, rand,
    // now()) re-evaluated on a conflict retry could drift outside the
    // key bounds computed here, desyncing the affected-file set from the
    // rows actually written — cache once, so bounds, dup check, rewrite,
    // and every retry all see ONE consistent batch.
    val pinned = updates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val keyTypes = keyCols.map(k => pinned.schema(k).dataType.sql)
      val kbAggs = Seq(count(lit(1)),
        count(when(keyCols.map(col(_).isNotNull).reduce(_ && _), lit(1))),
        count_distinct(keyCols.map(col).head, keyCols.map(col).tail: _*)) ++
        keyCols.flatMap(k => Seq(min(col(k)).cast("string"),
          max(col(k)).cast("string")))
      val kb = pinned.agg(kbAggs.head, kbAggs.tail: _*).head()
      if (kb.getLong(0) == 0L) return snapshotVersion(root)
      // MERGE rejects multi-match sources: two update rows with one key
      // would both land, breaking per-key-exactly-once — fail loudly
      // (ANSI MERGE's "duplicate row in source" error), don't pick one.
      // The check is over COMPLETE keys (every column non-null): a key
      // with any NULL column matches no target row, so such rows are
      // plain inserts, not duplicates of each other
      if (kb.getLong(1) != kb.getLong(2))
        throw new IllegalArgumentException(
          s"commitMergeUpsert: updates carry duplicate (${keyCols.mkString(", ")}) " +
            s"values (${kb.getLong(1)} complete keys, ${kb.getLong(2)} distinct) — " +
            "MERGE requires at most one source row per key")
      // MERGE WITH SCHEMA EVOLUTION: the source must carry every target
      // column (type-identical — same enforcement as the evolving
      // append) plus the new ones; the evolved schema registers in the
      // SAME claim as the merged data, and old files NULL-fill the new
      // columns on read. Matched rows are replaced by full source rows
      // (this merge's existing full-row contract, now over the wider
      // schema).
      val evolve: Option[(Option[StructType], StructType)] =
        if (!allowEvolution) None
        else {
          val reg = registeredSchema(s, root, table)
          val cur = reg.getOrElse(readTable(s, root, table).schema)
          cur.fields.foreach { f =>
            val got = pinned.schema.fields.find(_.name == f.name).getOrElse(
              throw new IllegalArgumentException(
                s"MERGE WITH SCHEMA EVOLUTION: source drops column ${f.name}"))
            if (got.dataType != f.dataType)
              throw new IllegalArgumentException(
                s"MERGE WITH SCHEMA EVOLUTION: column ${f.name} is " +
                  s"${got.dataType}, table has ${f.dataType}")
          }
          val added = pinned.schema.fieldNames.toSet -- cur.fieldNames.toSet
          val resurrected = added.intersect(reservedNames(root, table))
          if (resurrected.nonEmpty)
            throw new IllegalArgumentException(
              s"schema evolution: ${resurrected.mkString(",")} previously " +
                s"existed on $table — old files still store the name; " +
                "re-adding would resurrect their values")
          // added columns register NULLABLE regardless of the source
          // expression's nullability: every pre-evolution file (and
          // every survivor row the rewrite NULL-fills) has no value
          // for them — a non-nullable registration would NPE codegen
          // on the first such read
          Some((reg, StructType(cur.fields ++
            pinned.schema.fields.filterNot(f => cur.fieldNames.contains(f.name))
              .map(_.copy(nullable = true)))))
        }
      val keyPreds = keyCols.indices.map(i => Pred(keyCols(i),
        kb.getString(3 + 2 * i), kb.getString(4 + 2 * i), keyTypes(i)))
      commitMergeUpsertPinned(s, root, table, pinned, keyCols, keyPreds,
        maxRetries, txn, evolve)
    } finally pinned.unpersist()
  }

  private def commitMergeUpsertPinned(s: SparkSession, root: String,
                                      table: String, updates: DataFrame,
                                      keyCols: Seq[String], keyPreds: Seq[Pred],
                                      maxRetries: Int,
                                      txn: Option[(String, Long)] = None,
                                      evolve: Option[(Option[StructType], StructType)] = None): Long = {
    var tries = 0
    while (true) {
      val base = latestReadableClaim(root)
      require(base > 0, s"no committed snapshot at $root")
      // full-table read set for the conflict check: MERGE reads the
      // table (via the key-stats bound), so a concurrent append that
      // lands a matching key in a new file must force a recompute —
      // otherwise that key would survive beside the update (the
      // duplicate-key hazard Delta's ConcurrentAppendException exists
      // for)
      val expected = manifestRows(s, root, base)
        .collect { case (t, f, _) if t == table => f }.toSet
      val (affected, _) = overlappingRows(s, root, table, keyPreds, base)
      // Non-evolving merge schema enforcement when NOTHING overlaps:
      // with affected files the unionByName below rejects a drifted
      // source, but when the key bounds miss every file there is no
      // union — a widened/narrowed source would publish AS-IS, landing
      // mixed-schema files silently beside the table's. Same refusal,
      // made explicit.
      if (affected.isEmpty && evolve.isEmpty) {
        val cur = registeredSchema(s, root, table, base)
          .getOrElse(readTable(s, root, table, base).schema)
          .fieldNames.toSet
        val got = updates.schema.fieldNames.toSet
        if (got != cur)
          throw new IllegalArgumentException(
            s"commitMergeUpsert: source columns " +
              s"{${got.toSeq.sorted.mkString(",")}} do not match $table " +
              s"{${cur.toSeq.sorted.mkString(",")}} — use MERGE WITH " +
              "SCHEMA EVOLUTION for new columns")
      }
      val survivors0 =
        if (affected.isEmpty) updates
        else readResolved(s, root, affected.map { case (_, f, st) => (f, st) },
            registeredSchema(s, root, table, base))
          .join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
          // evolving merge: survivor rows NULL-fill the source's new
          // columns (old files keep doing so on read, via the
          // registered schema)
          .unionByName(updates, allowMissingColumns = evolve.isDefined)
      // pin the evolved column ORDER so published files agree with the
      // registered schema regardless of union branch order
      val survivors = evolve match {
        case Some((_, evolved)) =>
          survivors0.select(evolved.fieldNames.toIndexedSeq.map(col): _*)
        case None => survivors0
      }
      val hint = nextVersion(root)
      val relFiles = publishData(s, root, hint, table, survivors)
      val newRows = statsRowsFor(s, root, table, relFiles, keyCols)
      val removes = affected.map { case (t, f, _) => (t, f) }
      try {
        return casCommit(s, root, { b =>
          txnGuard(root, txn)
          val cur = manifestRows(s, root, b)
            .collect { case (t, f, _) if t == table => f }.toSet
          if (cur != expected)
            throw new CommitConflict(
              s"$table changed under the merge (computed at v$base, claiming at v$b)")
          // evolving merge: the schema registration rides the SAME
          // claim as the data (atomic, like the evolving append), and
          // a registration that moved underneath forces a recompute
          evolve.foreach { case (regAtPlan, _) =>
            if (registeredSchema(s, root, table, b) != regAtPlan)
              throw new CommitConflict(
                s"$table's registered schema changed under the evolving merge")
          }
          deltaOrFull(s, root, b, Nil, newRows, removes)
            .copy(extras = txnExtras(txn) ++ evolve.map { case (_, ev) =>
              schemaMarker(table) -> ev.json.getBytes("UTF-8") }.toSeq)
        }, maxRetries)
      } catch {
        case _: CommitConflict =>
          tries += 1
          if (tries >= maxRetries)
            retireAndFail(root, table,
              s"commitMergeUpsert: $table kept changing under the rewrite " +
                s"($maxRetries attempts) at $root")
      }
    }
    -1L // unreachable
  }

  /** One WHEN clause of a clause-form MERGE ([[commitMergeClauses]]).
    * Condition and expression operands are VERBATIM SQL text resolved
    * against the statement's own target/source aliases — parse-time
    * strings, not pre-bound Columns, because they must resolve inside
    * the merge's internal join where both relations are in scope. */
  sealed trait MergeWhen { def cond: Option[String] }
  /** `WHEN MATCHED [AND cond] THEN UPDATE SET c1 = e1, ...` — empty
    * `sets` means the full-row `SET *` shorthand (every target column
    * takes the source's value). */
  final case class MergeUpdate(cond: Option[String],
                               sets: Seq[(String, String)]) extends MergeWhen
  /** `WHEN MATCHED [AND cond] THEN DELETE`. */
  final case class MergeDelete(cond: Option[String]) extends MergeWhen
  /** `WHEN NOT MATCHED [AND cond] THEN INSERT (cols) VALUES (exprs)`
    * — empty `cols` means the full-row `INSERT *` shorthand. */
  final case class MergeInsert(cond: Option[String], cols: Seq[String],
                               vals: Seq[String]) extends MergeWhen

  /** `WHEN NOT MATCHED BY SOURCE [AND cond] THEN ...` clause of a
    * clause-form MERGE: applies to TARGET rows whose key has no
    * source match — there is no source row, so conditions and SET
    * expressions reference target columns only (unqualified or
    * target-aliased). */
  sealed trait MergeBySource { def cond: Option[String] }
  final case class BySourceDelete(cond: Option[String]) extends MergeBySource
  final case class BySourceUpdate(cond: Option[String],
                                  sets: Seq[(String, String)]) extends MergeBySource

  /** Clause-form MERGE — the full ANSI/Delta grammar the full-row
    * shorthand ([[commitMergeUpsert]]) is a special case of:
    * ordered `WHEN MATCHED [AND c] THEN UPDATE SET col = expr, ... |
    * DELETE` clauses and `WHEN NOT MATCHED [AND c] THEN INSERT
    * (cols) VALUES (exprs)` clauses, with ANSI semantics throughout —
    * per matched row the FIRST clause whose condition passes applies
    * (none ⇒ the row is kept unchanged); per unmatched source row the
    * first passing insert clause fires (none ⇒ the row is not
    * inserted); a NULL condition does not pass; every SET / VALUES
    * expression is evaluated against the OLD target row joined to its
    * source row (one projection — `SET a = t.b, b = t.a` swaps), the
    * [[commitUpdateWhere]] old-row discipline extended across the
    * merge join; insert columns not listed NULL-fill.
    *
    * 100-TB shape is [[commitMergeUpsert]]'s, unchanged: the source's
    * key bounds select the affected file set through per-file stats,
    * matched evaluation is ONE keyed join of affected rows × source,
    * unmatched inserts are one anti-join of the source against the
    * same affected rows (complete, because every target row a source
    * key could match lives in a bounds-overlapping file), untouched
    * files inherit by reference, and the whole outcome lands as one
    * atomic delta commit with fresh key stats. Multi-match sources are
    * rejected loudly (ANSI's duplicate-source-row error); claim-time
    * read-set validation + whole-rewrite retry as in the shorthand
    * path. `tAlias`/`sAlias` are the statement's relation aliases —
    * clause text resolves `t.x`/`s.x` against them. */
  def commitMergeClauses(s: SparkSession, root: String, table: String,
                         source: DataFrame, keyCol: String,
                         tAlias: String, sAlias: String,
                         matched: Seq[MergeWhen],
                         notMatched: Seq[MergeInsert],
                         bySource: Seq[MergeBySource] = Nil,
                         maxRetries: Int = 5): Long =
    commitMergeClauses(s, root, table, source, Seq(keyCol), tAlias, sAlias,
      matched, notMatched, bySource, maxRetries)

  /** Composite-key form of [[commitMergeClauses]]: `ON t.a = s.a AND
    * t.b = s.b ...` — a target row matches a source row when EVERY
    * key column is equal (a NULL in any key column matches nothing,
    * so that source row is an insert candidate, as in the single-key
    * path), the duplicate-source check is per COMPLETE composite key,
    * and file pruning is the CONJUNCTION of per-column key bounds
    * through the multi-column per-file stats. The single-key
    * signature above delegates here, bit-unchanged. */
  def commitMergeClauses(s: SparkSession, root: String, table: String,
                         source: DataFrame, keyCols: Seq[String],
                         tAlias: String, sAlias: String,
                         matched: Seq[MergeWhen],
                         notMatched: Seq[MergeInsert],
                         bySource: Seq[MergeBySource],
                         maxRetries: Int): Long = {
    require(keyCols.nonEmpty && keyCols.distinct.size == keyCols.size,
      s"MERGE: key columns must be non-empty and distinct ($keyCols)")
    require(matched.forall(!_.isInstanceOf[MergeInsert]),
      "commitMergeClauses: INSERT is not a MATCHED action")
    require(tAlias != sAlias,
      s"MERGE: target and source aliases collide ($tAlias)")
    // pin the source batch (same rationale as commitMergeUpsert: key
    // bounds, dup check, rewrite, and every retry see ONE batch)
    val pinned = source.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val keyTypes = keyCols.map(k => pinned.schema(k).dataType.sql)
      val kbAggs = Seq(count(lit(1)),
        count(when(keyCols.map(col(_).isNotNull).reduce(_ && _), lit(1))),
        count_distinct(keyCols.map(col).head, keyCols.map(col).tail: _*)) ++
        keyCols.flatMap(k => Seq(min(col(k)).cast("string"),
          max(col(k)).cast("string")))
      val kb = pinned.agg(kbAggs.head, kbAggs.tail: _*).head()
      // an empty source is a no-op ONLY without BY SOURCE clauses —
      // with them it is the full-sync degenerate case (every target
      // row is unmatched; an unconditional delete truncates)
      if (kb.getLong(0) == 0L && bySource.isEmpty)
        return snapshotVersion(root)
      if (kb.getLong(1) != kb.getLong(2))
        throw new IllegalArgumentException(
          s"MERGE: updates carry duplicate (${keyCols.mkString(", ")}) values " +
            s"(${kb.getLong(1)} complete keys, ${kb.getLong(2)} distinct) — " +
            "MERGE requires at most one source row per key")
      val keyPreds = keyCols.indices.map(i => Pred(keyCols(i),
        kb.getString(3 + 2 * i), kb.getString(4 + 2 * i), keyTypes(i)))
      // ANSI condition semantics: NULL does not pass
      def passes(c: Option[String]): org.apache.spark.sql.Column =
        c.map(t => coalesce(expr(t), lit(false))).getOrElse(lit(true))
      var tries = 0
      while (true) {
        val base = latestReadableClaim(root)
        require(base > 0, s"no committed snapshot at $root")
        val expected = manifestRows(s, root, base)
          .collect { case (t, f, _) if t == table => f }.toSet
        val tgtSchema = registeredSchema(s, root, table, base)
          .getOrElse(readTable(s, root, table, base).schema)
        val tgtCols = tgtSchema.fieldNames.toIndexedSeq
        // clause validation against the CURRENT registration — unknown
        // SET / INSERT columns refuse before anything is read
        matched.foreach {
          case MergeUpdate(_, sets) =>
            val bad = sets.map(_._1).filterNot(tgtCols.contains)
            require(bad.isEmpty, s"MERGE: SET of unknown columns $bad")
          case _ =>
        }
        notMatched.foreach { ins =>
          require(ins.cols.size == ins.vals.size,
            s"MERGE: INSERT lists ${ins.cols.size} columns but " +
              s"${ins.vals.size} values")
          val bad = ins.cols.filterNot(tgtCols.contains)
          require(bad.isEmpty, s"MERGE: INSERT of unknown columns $bad")
        }
        bySource.foreach {
          case BySourceUpdate(_, sets) =>
            val bad = sets.map(_._1).filterNot(tgtCols.contains)
            require(bad.isEmpty,
              s"MERGE: BY SOURCE SET of unknown columns $bad")
          case _ =>
        }
        // BY SOURCE clauses see EVERY unmatched target row, so the
        // rewrite scope is the whole table (the full-sync cost —
        // exactly what the semantics mean; the shorthand path's
        // condition-bound pruning is an optimization this general
        // form does not attempt); without them, key-stats pruning
        val affected =
          if (bySource.isEmpty)
            overlappingRows(s, root, table, keyPreds, base)._1
          else manifestRows(s, root, base).collect {
            case (t, f, st) if t == table => (t, f, st) }
        val current =
          if (affected.isEmpty)
            s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
              tgtSchema)
          else readResolved(s, root,
            affected.map { case (_, f, st) => (f, st) },
            registeredSchema(s, root, table, base))
        val joined = current.alias(tAlias).join(pinned.alias(sAlias),
          keyCols.map(k => col(s"$tAlias.$k") === col(s"$sAlias.$k"))
            .reduce(_ && _), "inner")
        // first-match-wins clause index: outermost WHEN is clause 0
        val mIdx = matched.zipWithIndex.reverse
          .foldLeft(lit(-1): org.apache.spark.sql.Column) {
            case (acc, (cl, i)) => when(passes(cl.cond), lit(i)).otherwise(acc)
          }
        val keep = matched.zipWithIndex
          .foldLeft(col("_mi") === -1) {
            case (acc, (_: MergeUpdate, i)) => acc || col("_mi") === i
            case (acc, _) => acc
          }
        // one projection per target column: the clause that hit picks
        // its SET expression (OLD-row + source namespace), everything
        // else keeps the target value
        val matchedOut = joined.withColumn("_mi", mIdx).filter(keep)
          .select(tgtCols.map { c =>
            matched.zipWithIndex.foldLeft(col(s"$tAlias.$c")) {
              case (acc, (MergeUpdate(_, sets), i)) =>
                val set =
                  if (sets.isEmpty) Some(col(s"$sAlias.$c")) // SET *
                  else sets.find(_._1 == c).map(kv => expr(kv._2))
                set.map(e => when(col("_mi") === i, e).otherwise(acc))
                  .getOrElse(acc)
              case (acc, _) => acc
            }.cast(tgtSchema(c).dataType).as(c)
          }: _*)
        val unmatchedBase = current
          .join(pinned.select(keyCols.map(col): _*), keyCols, "left_anti")
        val unmatchedTgt =
          if (bySource.isEmpty) unmatchedBase.select(tgtCols.map(col): _*)
          else {
            // first-match-wins over the BY SOURCE chain: a DELETE hit
            // drops the row, an UPDATE hit projects its SET against
            // the old row, no hit keeps the row unchanged (there is
            // no source row — expressions bind target columns only)
            val bIdx = bySource.zipWithIndex.reverse
              .foldLeft(lit(-1): org.apache.spark.sql.Column) {
                case (acc, (cl, i)) => when(passes(cl.cond), lit(i)).otherwise(acc)
              }
            val keepB = bySource.zipWithIndex
              .foldLeft(col("_bi") === -1) {
                case (acc, (_: BySourceUpdate, i)) => acc || col("_bi") === i
                case (acc, _) => acc
              }
            unmatchedBase.alias(tAlias).withColumn("_bi", bIdx).filter(keepB)
              .select(tgtCols.map { c =>
                bySource.zipWithIndex.foldLeft(col(s"$tAlias.$c")) {
                  case (acc, (BySourceUpdate(_, sets), i)) =>
                    sets.find(_._1 == c).map(kv =>
                      when(col("_bi") === i, expr(kv._2)).otherwise(acc))
                      .getOrElse(acc)
                  case (acc, _) => acc
                }.cast(tgtSchema(c).dataType).as(c)
              }: _*)
          }
        // unmatched source rows: anti-join against the affected rows'
        // keys is complete — any target row a source key could match
        // lives in a bounds-overlapping file (NULL-key source rows
        // match nothing, so they land here, as in the shorthand path)
        val nm = pinned.alias(sAlias).join(
          current.select(keyCols.zipWithIndex.map {
            case (k, i) => col(k).as(s"__tk$i") }: _*),
          keyCols.zipWithIndex.map { case (k, i) =>
            col(s"$sAlias.$k") === col(s"__tk$i") }.reduce(_ && _),
          "left_anti")
        val nmIdx = notMatched.zipWithIndex.reverse
          .foldLeft(lit(-1): org.apache.spark.sql.Column) {
            case (acc, (cl, i)) => when(passes(cl.cond), lit(i)).otherwise(acc)
          }
        val nmTagged = nm.withColumn("_mi", nmIdx)
        val inserts = notMatched.zipWithIndex.map { case (ins, i) =>
          nmTagged.filter(col("_mi") === i).select(tgtCols.map { c =>
            val v =
              if (ins.cols.isEmpty) col(s"$sAlias.$c") // INSERT *
              else ins.cols.indexOf(c) match {
                case -1 => lit(null)
                case p => expr(ins.vals(p))
              }
            v.cast(tgtSchema(c).dataType).as(c)
          }: _*)
        }
        val rewritten = inserts.foldLeft(
          unmatchedTgt.unionByName(matchedOut))(_ unionByName _)
        val hint = nextVersion(root)
        val relFiles = publishData(s, root, hint, table, rewritten)
        val newRows = statsRowsFor(s, root, table, relFiles, keyCols)
        val removes = affected.map { case (t, f, _) => (t, f) }
        try {
          return casCommit(s, root, { b =>
            val cur = manifestRows(s, root, b)
              .collect { case (t, f, _) if t == table => f }.toSet
            if (cur != expected)
              throw new CommitConflict(
                s"$table changed under the merge (computed at v$base, " +
                  s"claiming at v$b)")
            deltaOrFull(s, root, b, Nil, newRows, removes)
          }, maxRetries)
        } catch {
          case _: CommitConflict =>
            tries += 1
            if (tries >= maxRetries)
              retireAndFail(root, table,
                s"commitMergeClauses: $table kept changing under the " +
                  s"rewrite ($maxRetries attempts) at $root")
        }
      }
      -1L // unreachable
    } finally pinned.unpersist()
  }

  /** Selective overwrite — Delta's `replaceWhere` / the partition-
    * overwrite idiom generalized to any predicate: atomically DELETE
    * every current row matching `replaceFilter` and INSERT `batch`,
    * as ONE commit. The restatement-of-a-slice operation (re-land one
    * day after an upstream correction, swap out one source's shard):
    * readers flip from old-slice to new-slice with no window where
    * both or neither are visible.
    *
    * Merge-on-read deletes: matched rows land in deletion-vector
    * sidecars (no survivor rewrite — O(matched files) sidecar writes,
    * the [[commitDeleteVectors]] cost model), the batch lands as
    * fresh stat-carrying files, both under one claim. The overwrite
    * CONTRACT is validated: every batch row must satisfy
    * `replaceFilter` (else "replace where" silently widens into
    * "insert anywhere" — Delta rejects this too; fail loudly before
    * touching anything). The pre-replace version time-travels until
    * vacuumed. Claim-time validation over the full-table read set +
    * whole-rewrite retry, as in [[commitDeleteWhere]]. */
  def commitReplaceWhere(s: SparkSession, root: String, table: String,
                         replaceFilter: org.apache.spark.sql.Column,
                         batch: DataFrame, maxRetries: Int = 5): Long = {
    // pin the batch: bounds, contract check, publish, and every retry
    // must see ONE consistent frame (same rationale as MERGE's pin)
    val pinned = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bad = pinned.filter(!coalesce(replaceFilter, lit(false))).count()
      require(bad == 0L,
        s"commitReplaceWhere: $bad batch rows violate the replace " +
          s"predicate — every inserted row must satisfy it")
      // stat columns for the new files: the predicate's inputs, so the
      // slice this commit lands stays prunable by the same predicate
      val statCols = pinned.select(replaceFilter.as("__replace_pred"))
        .queryExecution.analyzed.expressions
        .flatMap(_.collect {
          case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => a.name
        })
        .distinct.filter(c => pinned.columns.contains(c))
      var tries = 0
      while (true) {
        val base = latestReadableClaim(root)
        require(base > 0, s"no committed snapshot at $root")
        val cur = manifestRows(s, root, base)
          .collect { case (t, f, st) if t == table => (f, st) }
        require(cur.nonEmpty, s"table $table absent from snapshot v$base")
        val expected = cur.map(_._1).toSet
        val absRoot = Paths.get(root).toAbsolutePath.normalize()
        // positions of doomed rows, per physical file (raw scan — the
        // unwrapped predicate stays pushable to the parquet filter)
        val scanned = registeredSchema(s, root, table, base) match {
          case Some(sc) => readPinned(s, sc,
            cur.map { case (f, _) => s"$root/$f" }.toIndexedSeq,
            Some(("__graft_p", "__graft_ri")))
          case None => s.read
            .parquet(cur.map { case (f, _) => s"$root/$f" }.toIndexedSeq: _*)
            .select(col("*"),
              expr("concat('/', regexp_replace(_metadata.file_path, '^[a-z]+:/+', ''))")
                .as("__graft_p"),
              col("_metadata.row_index").as("__graft_ri"))
        }
        val hits = scanned.filter(replaceFilter)
          .select(col("__graft_p").as("_p"), col("__graft_ri").as("_ri"))
          .groupBy("_p").agg(sort_array(collect_list(col("_ri"))).as("_ris"))
          .collect() // one row per touched file: O(matched) positions
        val perFile = hits.map { r =>
          val rel = absRoot.relativize(Paths.get(r.getString(0)).normalize())
            .toString.replace('\\', '/')
          rel -> r.getSeq[Long](1).toArray
        }.toMap
        val touched = cur.filter { case (f, _) => perFile.contains(f) }
        val token = java.util.UUID.randomUUID().toString.take(8)
        val dvRows = touched.map { case (f, st) =>
          val old = dvRefOf(st).map { case (side, _) => readDvSidecar(root, side) }
            .getOrElse(Array.empty[Long])
          val merged = (old ++ perFile(f)).distinct.sorted
          val side = s"$f.dv-$token"
          writeDvSidecar(root, side, merged)
          (table, f, statsWithDv(st, side, merged.length.toLong))
        }
        val removes = touched.map { case (f, _) => (table, f) }
        val hint = nextVersion(root)
        val relFiles = publishData(s, root, hint, table, pinned)
        val addRows = statsRowsFor(s, root, table, relFiles, statCols)
        try {
          return casCommit(s, root, { b =>
            val now = manifestRows(s, root, b)
              .collect { case (t, f, _) if t == table => f }.toSet
            if (now != expected)
              throw new CommitConflict(
                s"$table changed under the replace (computed at v$base, claiming at v$b)")
            deltaOrFull(s, root, b, Nil, dvRows ++ addRows, removes)
          }, maxRetries)
        } catch {
          case _: CommitConflict =>
            tries += 1
            if (tries >= maxRetries)
              retireAndFail(root, table,
                s"commitReplaceWhere: $table kept changing under the replace " +
                  s"($maxRetries attempts) at $root")
        }
      }
      -1L // unreachable
    } finally pinned.unpersist()
  }

  /** FULL-SYNC MERGE — [[commitMergeUpsert]] plus the `WHEN NOT
    * MATCHED BY SOURCE` clause: matched keys are replaced by their
    * source row, unmatched source keys insert, and target rows whose
    * key is ABSENT from the source are DELETED when `deleteFilter`
    * passes (`lit(true)` = unconditional — the mirror-a-snapshot
    * sync; a condition = the retention-boundary sync, e.g. "drop
    * unmatched rows older than the sync horizon", Delta's
    * `whenNotMatchedBySourceDelete(condition)`). One atomic commit.
    *
    * Pruning: a file can need rewriting only if it may hold a source
    * key (the source's [min, max] key bound) OR a row passing the
    * delete condition (`deletePreds` — the caller's bound on where
    * the condition can match; pass Nil when the condition is
    * unbounded, which rewrites the whole table, exactly what an
    * unconditional sync must do). Files overlapping neither are
    * inherited by reference: their rows have no matching key and
    * cannot satisfy the delete condition, so they survive verbatim.
    * Duplicate source keys are rejected as in [[commitMergeUpsert]];
    * NULL-predicate rows are KEPT (SQL DELETE semantics). */
  def commitMergeFull(s: SparkSession, root: String, table: String,
                      updates: DataFrame, keyCol: String,
                      deleteFilter: org.apache.spark.sql.Column = lit(true),
                      deletePreds: Seq[Pred] = Nil,
                      maxRetries: Int = 5): Long =
    commitMergeFull(s, root, table, updates, Seq(keyCol), deleteFilter,
      deletePreds, maxRetries)

  /** Composite-key form of [[commitMergeFull]] — equality over every
    * key column, conjunctive key-bound pruning, per-complete-key
    * duplicate refusal; the single-key signature delegates here. */
  def commitMergeFull(s: SparkSession, root: String, table: String,
                      updates: DataFrame, keyCols: Seq[String],
                      deleteFilter: org.apache.spark.sql.Column,
                      deletePreds: Seq[Pred],
                      maxRetries: Int): Long = {
    require(keyCols.nonEmpty && keyCols.distinct.size == keyCols.size,
      s"commitMergeFull: key columns must be non-empty and distinct ($keyCols)")
    val pinned = updates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val keyTypes = keyCols.map(k => pinned.schema(k).dataType.sql)
      val kbAggs = Seq(count(lit(1)),
        count(when(keyCols.map(col(_).isNotNull).reduce(_ && _), lit(1))),
        count_distinct(keyCols.map(col).head, keyCols.map(col).tail: _*)) ++
        keyCols.flatMap(k => Seq(min(col(k)).cast("string"),
          max(col(k)).cast("string")))
      val kb = pinned.agg(kbAggs.head, kbAggs.tail: _*).head()
      if (kb.getLong(1) != kb.getLong(2))
        throw new IllegalArgumentException(
          s"commitMergeFull: updates carry duplicate (${keyCols.mkString(", ")}) " +
            s"values (${kb.getLong(1)} complete keys, ${kb.getLong(2)} distinct) — " +
            "MERGE requires at most one source row per key")
      val keyPreds =
        if (kb.getLong(1) == 0L) Nil
        else keyCols.indices.map(i => Pred(keyCols(i),
          kb.getString(3 + 2 * i), kb.getString(4 + 2 * i), keyTypes(i)))
      var tries = 0
      while (true) {
        val base = latestReadableClaim(root)
        require(base > 0, s"no committed snapshot at $root")
        val expected = manifestRows(s, root, base)
          .collect { case (t, f, _) if t == table => f }.toSet
        require(expected.nonEmpty, s"table $table absent from snapshot v$base")
        val byKey =
          if (keyPreds.isEmpty) Nil
          else overlappingRows(s, root, table, keyPreds, base)._1
        val byDel = overlappingRows(s, root, table, deletePreds, base)._1
        val affected = (byKey ++ byDel).distinctBy(_._2)
        val survivors =
          if (affected.isEmpty) pinned
          else {
            val current = readResolved(s, root,
              affected.map { case (_, f, st) => (f, st) },
              registeredSchema(s, root, table, base))
            val order = current.columns
            current
              .join(pinned.select(keyCols.map(col): _*), keyCols, "left_anti")
              .filter(!coalesce(deleteFilter, lit(false)))
              .select(order.toIndexedSeq.map(col): _*)
              .unionByName(pinned)
          }
        val hint = nextVersion(root)
        val relFiles = publishData(s, root, hint, table, survivors)
        val newRows = statsRowsFor(s, root, table, relFiles,
          (keyCols ++ deletePreds.map(_.column)).distinct)
        val removes = affected.map { case (t, f, _) => (t, f) }
        try {
          return casCommit(s, root, { b =>
            val cur = manifestRows(s, root, b)
              .collect { case (t, f, _) if t == table => f }.toSet
            if (cur != expected)
              throw new CommitConflict(
                s"$table changed under the sync merge (computed at v$base, claiming at v$b)")
            deltaOrFull(s, root, b, Nil, newRows, removes)
          }, maxRetries)
        } catch {
          case _: CommitConflict =>
            tries += 1
            if (tries >= maxRetries)
              retireAndFail(root, table,
                s"commitMergeFull: $table kept changing under the rewrite " +
                  s"($maxRetries attempts) at $root")
        }
      }
      -1L // unreachable
    } finally pinned.unpersist()
  }

  /** ZERO-COPY CLONE: register `dstTable` as a new table whose
    * content is `srcTable`'s snapshot at `version` (default: current)
    * — ONE metadata commit, no data read, no data written. The
    * manifest rows are re-keyed to the new table name but point at
    * the SAME files (stats, deletion-vector refs, bloom sidecars ride
    * along by reference), so a 100 TB clone costs what a commit
    * costs. Divergence is free-by-construction: every write path
    * publishes fresh files and removes by (table, file), so writes to
    * either table never touch the other's rows, and [[vacuum]]'s
    * liveness rule (a file lives while ANY retained manifest
    * references it) keeps shared files until BOTH tables drop them.
    * The dev-branch / experiment / pre-migration-backup verb
    * (Snowflake zero-copy clone, Delta shallow clone — except files
    * live inside the root, so there is no external-file fragility).
    *
    * The source's registered schema and CHECK constraints are copied
    * (constraint registration is outside the claim CAS — the
    * [[addCheckConstraint]] window applies). Cloning a WAP-invisible
    * or vacuumed version is refused. `dstTable` must not exist. */
  def commitClone(s: SparkSession, root: String, srcTable: String,
                  dstTable: String, version: Long = -1L,
                  maxRetries: Int = 5): Long = {
    require(srcTable != dstTable,
      s"commitClone: source and destination are both $srcTable")
    val v =
      if (version >= 0L) {
        require(manifestReadable(root, version) && mainVisible(root, version),
          s"commitClone: version $version is not a readable main-visible " +
            s"snapshot at $root")
        version
      } else snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    val srcRows = manifestRows(s, root, v)
      .collect { case (t, f, st) if t == srcTable => (dstTable, f, st) }
    val srcSchema = registeredSchema(s, root, srcTable, v)
    require(srcRows.nonEmpty || srcSchema.isDefined,
      s"commitClone: unknown source table $srcTable at v$v")
    val schemaExtras = srcSchema.toSeq.map(sch =>
      schemaMarker(dstTable) -> sch.json.getBytes("UTF-8"))
    // the source's constraints ride the clone claim itself — atomic
    // with the rows (no scan needed: the data was validated on the
    // source), and no post-claim window where the clone exists
    // unguarded
    val checkExtras = checkConstraints(root, srcTable).toSeq.sorted
      .map { case (n, ex) =>
        checkMarkerName(dstTable, n) -> ex.getBytes("UTF-8") }
    casCommit(s, root, { b =>
      // existence check INSIDE the claim: two racing clones to the
      // same name serialize through the CAS, exactly one wins
      if (manifestRows(s, root, b).exists(_._1 == dstTable) ||
          registeredSchema(s, root, dstTable, b).isDefined)
        throw new IllegalArgumentException(
          s"commitClone: $dstTable already exists at $root")
      deltaOrFull(s, root, b, Nil, srcRows, Nil)
        .copy(extras = schemaExtras ++ checkExtras)
    }, maxRetries)
  }

  /** UNDROP TABLE — Snowflake's recovery verb: restore `table` to its
    * state at the newest main-visible version where it existed, as
    * ONE metadata commit re-adding that snapshot's rows (DROP is
    * metadata, so the files are still on disk until [[vacuum]]
    * collects them — every referenced file is existence-checked and a
    * vacuumed table refuses loudly rather than resurrecting a hole).
    * The registered schema at that version rides the claim. Refuses
    * while the table currently exists. */
  def commitUndropTable(s: SparkSession, root: String, table: String,
                        maxRetries: Int = 5): Long = {
    val vs = claimedVersions(root)
      .filter(v => manifestReadable(root, v) && mainVisible(root, v))
      .sorted.reverse
    require(vs.nonEmpty, s"no committed snapshot at $root")
    val lastWith = vs.find(v =>
      manifestRows(s, root, v).exists(_._1 == table)).getOrElse(
      throw new IllegalArgumentException(
        s"UNDROP $table: no retained version of $root ever held it"))
    val rows = manifestRows(s, root, lastWith)
      .collect { case (t, f, st) if t == table => (t, f, st) }
    val gone = rows.collect { case (_, f, _)
      if !Files.exists(Paths.get(root, f)) => f }
    require(gone.isEmpty,
      s"UNDROP $table: ${gone.size} data files of v$lastWith were " +
        s"vacuumed (${gone.take(3).mkString(", ")}…) — beyond recovery")
    val schemaExtras = registeredSchema(s, root, table, lastWith).toSeq
      .map(sch => schemaMarker(table) -> sch.json.getBytes("UTF-8"))
    casCommit(s, root, { b =>
      if (manifestRows(s, root, b).exists(_._1 == table))
        throw new IllegalArgumentException(
          s"UNDROP $table: the table currently exists at $root")
      deltaOrFull(s, root, b, Nil, rows, Nil).copy(extras = schemaExtras)
    }, maxRetries)
  }

  /** DESCRIBE DETAIL — the one-row operational summary every format
    * serves: current (or pinned) version, file count, exact row count
    * ([[countRows]]: footer counts minus DV positions), on-disk bytes,
    * DV'd file count, and whether a schema registration governs reads.
    * Metadata arithmetic + one `stat` per file; no data I/O. */
  def describeDetail(s: SparkSession, root: String, table: String,
                     version: Long = -1L): DataFrame = {
    import s.implicits._
    val v = if (version > 0) version else snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    val rows = manifestRows(s, root, v)
      .collect { case (t, f, st) if t == table => (f, st) }
    require(rows.nonEmpty, s"table $table absent from snapshot v$v")
    val bytes = rows.map { case (f, _) => Files.size(Paths.get(root, f)) }.sum
    val nDv = rows.count { case (_, st) => dvRefOf(st).isDefined }
    Seq((table, v, rows.size.toLong, countRows(s, root, table, v), bytes,
      nDv.toLong, registeredSchema(s, root, table, v).isDefined))
      .toDF("table_name", "version", "n_files", "n_rows", "size_bytes",
        "n_dv_files", "schema_registered")
  }

  /** CONVERT TO — register an EXISTING parquet directory as a
    * manifest table with ZERO data movement (Delta's `CONVERT TO
    * DELTA`, Iceberg's `add_files`): each source file is HARDLINKED
    * under the table root (same inode — not one data byte is copied
    * or rewritten; a cross-filesystem source refuses loudly rather
    * than silently degrading to a 100-TB copy), per-file
    * [min, max] / null-count / row-count stats for `statsCols` come
    * from the parquet FOOTERS (one footer read per file — the import
    * is metadata work at any scale; files whose footers can't answer
    * fall back to the one-pass Spark read like every stats append),
    * and the whole file set becomes ONE atomic commit. CREATE
    * semantics: refuses if the table already exists (append-import =
    * CONVERT into a fresh name + MERGE/INSERT). The source dir stays
    * untouched and readable — hardlinks mean vacuum later unlinks
    * only the table's name for the bytes, never the source's. */
  def commitImportDir(s: SparkSession, root: String, table: String,
                      srcDir: String, statsCols: Seq[String] = Nil,
                      maxRetries: Int = 5): Long = {
    require(table.matches("[A-Za-z0-9_.-]+") && table.exists(_ != '.'),
      s"unsafe table name: $table")
    val src = Paths.get(srcDir)
    require(Files.isDirectory(src), s"CONVERT: $srcDir is not a directory")
    val l = Files.list(src)
    val srcFiles =
      try l.iterator().asScala.toList
        .filter(p => p.getFileName.toString.endsWith(".parquet") &&
          !p.getFileName.toString.startsWith("_") &&
          !p.getFileName.toString.startsWith("."))
        .sortBy(_.getFileName.toString)
      finally l.close()
    require(srcFiles.nonEmpty, s"CONVERT: no parquet files under $srcDir")
    Files.createDirectories(Paths.get(root))
    val hint = nextVersion(root)
    val tmp = Files.createTempDirectory(Paths.get(root), "import-stage.tmp-")
    val dest = try {
      val d = tmp.resolve("d")
      Files.createDirectories(d)
      srcFiles.foreach { f =>
        try Files.createLink(d.resolve(f.getFileName.toString), f)
        catch {
          case e: java.nio.file.FileSystemException =>
            throw new IllegalArgumentException(
              s"CONVERT: cannot hardlink $f under $root (cross-filesystem " +
                s"source?) — stage the files onto the table's filesystem " +
                s"first; refusing to silently copy data", e)
        }
      }
      claimDataDir(root, hint, table, d)
    } finally Staging.deleteRecursively(tmp)
    val rel = Paths.get(root).relativize(dest).toString.replace('\\', '/')
    val relFiles = srcFiles.map(f => s"$rel/${f.getFileName.toString}")
    enforceChecks(s, root, table, relFiles)
    val newRows = statsRowsFor(s, root, table, relFiles, statsCols)
    casCommit(s, root, { base =>
      if (base > 0 && manifestRows(s, root, base).exists(_._1 == table))
        throw new IllegalArgumentException(
          s"CONVERT: $table already exists at $root")
      deltaOrFull(s, root, base, Nil, newRows)
    }, maxRetries)
  }

  /** Reference-counted VACUUM: retain the newest `keep` READABLE
    * claims, delete every older manifest (readable or debris) and
    * every data file no retained manifest references. Liveness comes
    * from the manifests, not from file age or directory position — so
    * dead overwrite versions AND orphans from failed writers are
    * collected by the same rule, and a file carried forward by an
    * append commit stays safe no matter how old its prefix is. Schema
    * registrations are kept (metadata-sized; retained versions may
    * resolve through a registration older than the retention floor).
    * Metadata-sized work: |manifest rows| + |data files| driver-side,
    * no data read. `dryRun = true` reports the (would-remove,
    * live-file) counts without touching anything — the operational
    * preflight every destructive sweep deserves. */
  /** Default in-flight-commit grace window: unreferenced data files
    * younger than this survive a vacuum, because a concurrent writer
    * publishes data BEFORE claiming its manifest and a vacuum in that
    * window would corrupt the winning commit. 10 minutes covers any
    * realistic publish→claim latency at this engine's commit sizes
    * (production formats default far higher — Delta: 7 days); callers
    * that KNOW there are no concurrent writers (tests, single-writer
    * maintenance windows) opt in to `graceMs = 0` explicitly. */
  val defaultVacuumGraceMs: Long = 10L * 60L * 1000L

  def vacuum(s: SparkSession, root: String, keep: Int,
             graceMs: Long = defaultVacuumGraceMs,
             dryRun: Boolean = false): (Int, Int) = {
    val readable = claimedVersions(root).filter(manifestReadable(root, _))
    require(readable.nonEmpty, s"no committed snapshot at $root")
    // WAP claims are classified by their branch's resolution markers:
    // open-branch claims are IN-FLIGHT state, not history — they never
    // count against the retention window and are retained outright (a
    // long-lived audit branch must survive any grace window);
    // dropped-branch claims are collectible at any version; published
    // ones are ordinary history (protected below as chain ancestors of
    // the publish claim while it is retained).
    val (openWap, mainline) = readable.partition(v =>
      wapBranchOf(root, v).exists(b =>
        !wapIsPublished(root, b) && !wapIsDropped(root, b)))
    val droppedWap = mainline.filter(v =>
      wapBranchOf(root, v).exists(wapIsDropped(root, _))).toSet
    val history = mainline.filterNot(droppedWap)
    require(history.nonEmpty, s"no committed snapshot at $root")
    // tagged snapshots are retention roots: their files and manifests
    // survive any keep-last-N window until the tag is dropped
    val tagged = tags(root).values.toSeq.distinct.filter(readable.contains)
    val retained = (history.takeRight(keep) ++ openWap ++ tagged).distinct
    val retainedRows = retained.flatMap(manifestRows(s, root, _))
    val live = retainedRows.map(_._2).toSet
    // deletion-vector sidecars are live while any retained manifest row
    // references them; superseded DVs (a later delete merged them into
    // a fresh sidecar) fall dead by the same rule
    val liveDv = retainedRows.flatMap(r => dvRefOf(r._3).map(_._1)).toSet
    val dataRoot = Paths.get(root, "data")
    // In-flight-commit guard: a concurrent writer publishes data files
    // BEFORE claiming its manifest, and those files are referenced
    // nowhere until the claim lands — deleting them would corrupt the
    // winning commit. `graceMs` skips unreferenced files younger than
    // the window; production sets it above the longest publish→claim
    // latency (the same age-based guard Delta's VACUUM defaults to
    // 7 days for). 0 is only safe with no concurrent writers.
    val cutoffMs = System.currentTimeMillis() - graceMs
    val dead = (p: Path) =>
      !live.contains(Paths.get(root).relativize(p).toString.replace('\\', '/')) &&
        (graceMs <= 0L || Files.getLastModifiedTime(p).toMillis < cutoffMs)
    var removed = 0
    if (Files.isDirectory(dataRoot)) {
      // materialize BEFORE deleting: removing a sidecar under a live
      // Files.walk iterator throws NoSuchFile from the tree traversal
      val deadDv = (p: Path) => {
        val rel = Paths.get(root).relativize(p).toString.replace('\\', '/')
        !liveDv.contains(rel) &&
          (graceMs <= 0L || Files.getLastModifiedTime(p).toMillis < cutoffMs)
      }
      val walk = Files.walk(dataRoot)
      val (doomedFiles, doomedDvs) =
        try {
          val all = walk.iterator().asScala.toList
          (all.filter(p => p.getFileName.toString.endsWith(".parquet") && dead(p)),
            all.filter(p => p.getFileName.toString.contains(".dv-") && deadDv(p)))
        } finally walk.close()
      if (dryRun) removed = doomedFiles.size
      else {
        doomedFiles.foreach { p =>
          Files.delete(p); removed += 1
          // a bloom sidecar lives and dies with its data file
          val _ = Files.deleteIfExists(
            p.resolveSibling(p.getFileName.toString + ".bloom"))
        }
        doomedDvs.foreach(p => Files.deleteIfExists(p))
      }
    }
    // a retained DELTA still resolves through its chain: its ancestors
    // must survive the manifest sweep even when they sit below the
    // retention floor (they are metadata-sized; the periodic fold keeps
    // chains short, so at most foldEvery-1 extra claims survive)
    val ancestors = retained.flatMap { v =>
      Iterator.iterate(baseOf(root, v))(_.flatMap(baseOf(root, _)))
        .takeWhile(_.isDefined).map(_.get).toSeq
    }.toSet
    val retainedSet = retained.toSet
    val floor = (history.takeRight(keep)).head
    val doomed = claimedVersions(root)
      .filter(v => !retainedSet(v) && !ancestors(v) &&
        (v < floor || droppedWap(v)))
    // claim MARKERS outlive their claims: the newest `_txn_<appId>`
    // ledger and `_schema_<table>.json` registration below the floor
    // are copied into the OLDEST surviving claim (copy BEFORE delete,
    // so a concurrent reader never observes a markerless window) —
    // every retained version resolves at or above that claim, so the
    // newest-at-or-below lookup still finds them. A surviving claim's
    // own marker always shadows the carried copy (it is newer).
    if (dryRun) return (removed, live.size) // report only: nothing moved
    val survivors = claimedVersions(root).filterNot(doomed.toSet)
    survivors.headOption.foreach { oldest =>
      val dest = Paths.get(root, "manifest", s"v$oldest")
      // marker copies touch the surviving claim DIR's mtime, which is
      // the commit-time signal versionTimes/tableHistory/TIMESTAMP AS
      // OF read — capture and restore it, or every later version's
      // monotonic-adjusted time becomes "vacuum o'clock"
      val destMtime = Files.getLastModifiedTime(dest)
      doomed.sortBy(-_).foreach { v => // newest doomed first: it wins the copy
        val d = Paths.get(root, "manifest", s"v$v")
        val l = Files.list(d)
        val markers =
          try l.iterator().asScala.map(_.getFileName.toString)
            .filter(n => n.startsWith("_txn_") || n.startsWith("_schema_") ||
              n.startsWith("_check_") || n.startsWith("_policy") ||
              n.startsWith("_stats_") || n.startsWith("_prop_") ||
              n.startsWith("_grant_") || n.startsWith("_aclon_") ||
              n.startsWith("_grantsch_") || n.startsWith("_aclonsch_") ||
              n.startsWith("_stream_") || n.startsWith("_task_") ||
              n.startsWith("_mview_") || n.startsWith("_annidx_")).toList
          finally l.close()
        markers.foreach { name =>
          if (!Files.exists(dest.resolve(name)))
            Files.copy(d.resolve(name), dest.resolve(name),
              StandardCopyOption.REPLACE_EXISTING)
        }
      }
      Files.setLastModifiedTime(dest, destMtime)
    }
    doomed.foreach(v =>
      Staging.deleteRecursively(Paths.get(root, "manifest", s"v$v")))
    (removed, live.size)
  }

  // ---------------------------------------------------------- export/import

  /** Copy one root-relative file between roots, checksum-verified;
    * returns its byte size. Shared by bootstrap export and
    * incremental replication. */
  private def copyVerified(root: String, destRoot: String, rel: String): Long = {
    val src = Paths.get(root, rel)
    val dst = Paths.get(destRoot, rel)
    Files.createDirectories(dst.getParent)
    Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    val (a, b) = (md5Of(src), md5Of(dst))
    if (a != b)
      throw new IllegalStateException(
        s"snapshot copy: checksum mismatch for $rel ($a != $b)")
    Files.size(dst)
  }

  private def md5Of(p: Path): String = {
    val md = MessageDigest.getInstance("MD5")
    val in = Files.newInputStream(p)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Export the CURRENT snapshot to `destRoot` and commit it there as
    * v1 — the DR / environment-promotion path the manifest's
    * root-relative file paths were designed for (spec'd by the
    * relocated-root test; this is the operator that SHIPS a snapshot
    * instead of assuming the whole root was copied). Copies exactly
    * the files the current manifest references — orphans and expired
    * versions are excluded by construction — verifying each file's
    * MD5 after the copy, then claims the manifest at the destination
    * through the same CAS path (so the destination must be an
    * uninitialized root) and carries the tables' current schema
    * registrations. Returns (files copied, bytes copied). Work is
    * metadata-driven: |files| copies, no data interpretation. */
  /** Marker families beyond schema/check that make up a root's
    * governance + catalog registry: policy definitions and
    * attachments, table properties (incl. comments), grants with the
    * sticky ACL closure, and persisted ANALYZE stats. Shared by export
    * (bootstrap) and incremental replication so a PROMOTED replica
    * governs exactly like its source — a replica that lost its masking
    * policies or ACL closure would serve raw data to every role. */
  private val registryPrefixes = Seq(
    "_policydef_", "_policies_", "_prop_", "_grant_", "_aclon_",
    "_grantsch_", "_aclonsch_", "_stats_", "_stream_", "_task_", "_mview_",
    "_annidx_")

  /** Effective (newest, non-tombstoned) registry markers of `root`. */
  private def registryMarkers(root: String): Seq[(String, Array[Byte])] =
    registryPrefixes.flatMap(p => claimMarkers(root, p).toSeq)
      .filter(_._2.nonEmpty).sortBy(_._1)

  /** Registry delta in the checkDelta shape: source values (new or
    * changed) ride as markers, destination entries the source no
    * longer holds ride as tombstones — applied INSIDE the sync claim,
    * atomic with the rows. */
  private def registryDelta(root: String,
                            destRoot: String): Seq[(String, Array[Byte])] =
    registryPrefixes.flatMap { p =>
      val src = claimMarkers(root, p).filter(_._2.nonEmpty)
      val dst = claimMarkers(destRoot, p).filter(_._2.nonEmpty)
      val adds = src.toSeq.sortBy(_._1).filter { case (n, b) =>
        !dst.get(n).exists(_.sameElements(b)) }
      val drops = (dst.keySet -- src.keySet).toSeq.sorted
        .map(n => n -> Array.empty[Byte])
      adds ++ drops
    }

  def exportSnapshot(s: SparkSession, root: String, destRoot: String): (Int, Long) =
    exportSnapshotTxn(s, root, destRoot, None)

  /** `txnApp`: record the EXPORTED source version under this app id in
    * the destination's v1 claim — the marker value is the version this
    * call actually resolved and copied (re-reading the pointer for the
    * marker would race a concurrent source commit and desync the
    * replica ledger from the shipped bytes). */
  private def exportSnapshotTxn(s: SparkSession, root: String, destRoot: String,
                                txnApp: Option[String]): (Int, Long) = {
    val v = snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    val rows = manifestRows(s, root, v) // resolved: the chain flattens here
    Files.createDirectories(Paths.get(destRoot))
    var bytes = 0L
    val files = rows.map(_._2).distinct
    files.foreach(rel => bytes += copyVerified(root, destRoot, rel))
    // deletion-vector sidecars are referenced from stats_json (`__dv`),
    // not as manifest rows — a merge-on-read snapshot is UNREADABLE
    // without them (the masked read opens the sidecar), so they ship
    // with the files they mask. Bloom sidecars ride along when present:
    // a missing bloom is only a conservative keep at the destination,
    // but re-deriving it would cost a data pass the copy avoids.
    val dvSidecars = rows.flatMap(r => dvRefOf(r._3).map(_._1)).distinct
    dvSidecars.foreach(rel => bytes += copyVerified(root, destRoot, rel))
    val bloomSidecars = files.map(_ + ".bloom")
      .filter(rel => Files.exists(Paths.get(root, rel)))
    bloomSidecars.foreach(rel => bytes += copyVerified(root, destRoot, rel))
    // the destination's v1 is always a FULL manifest — the export is
    // self-contained no matter how deep the source's delta chain was —
    // and it carries the tables' current schema registrations plus the
    // newest txn ledger per appId as claim markers (atomic with the
    // rows, so a promoted environment resumes streams without replays)
    val schemaExtras = rows.map(_._1).distinct.sorted.flatMap { t =>
      registeredSchema(s, root, t, v).map(sch =>
        schemaMarker(t) -> sch.json.getBytes("UTF-8"))
    }
    // the source's effective CHECK registry rides the v1 claim itself —
    // a promoted environment enforces from its first visible instant
    val checkExtrasOut = rows.map(_._1).distinct.sorted.flatMap { t =>
      checkConstraints(root, t).toSeq.sorted.map { case (n, ex) =>
        checkMarkerName(t, n) -> ex.getBytes("UTF-8") }
    }
    val txnExtrasOut =
      txnLedgerExtras(root, exclude = txnApp.map(txnMarker).getOrElse(""))
    // the destination v1 carries the SOURCE snapshot's commit clock —
    // TIMESTAMP AS OF on the promoted environment resolves the history
    // instant the data actually represents, not "export o'clock"
    val tsExtra = Seq("_ts" -> commitTimeMs(root, v).toString.getBytes("UTF-8"))
    if (!tryClaim(s, destRoot, 1L,
      Payload(rows.map { case (t, f, st) => ("add", t, f, st) }, None,
        schemaExtras ++ checkExtrasOut ++ registryMarkers(root) ++
          txnExtrasOut ++ txnExtras(txnApp.map(_ -> v)) ++ tsExtra)))
      throw new IllegalStateException(
        s"exportSnapshot: $destRoot already has a v1 claim")
    advancePointer(destRoot, 1L)
    (files.size, bytes)
  }

  /** INCREMENTAL snapshot replication: bring `destRoot` up to the
    * source's CURRENT snapshot, shipping only what the replica lacks.
    * [[exportSnapshot]] is the full-copy bootstrap; this is the
    * steady-state path a DR site actually runs — per sync it copies
    * the file-set DIFFERENCE between the source snapshot the replica
    * last applied and the current one (checksummed, stats carried by
    * reference from the source manifest), and commits ONE delta at
    * the destination: removes for files that left the source snapshot,
    * adds for the new ones. Rewrite commits (compaction, DELETE,
    * MERGE) therefore replicate as exactly their remove+add footprint,
    * not a full re-copy.
    *
    * Exactly-once via the txn ledger: the applied source version rides
    * the `_replica` marker inside each destination claim, so a
    * re-driven sync is a no-op ((0, 0)), a racing duplicate dies at
    * claim time, and the ledger survives destination vacuums. The
    * destination must be sync-owned: claim-time validation checks the
    * replica's resolved state still equals the source snapshot it last
    * applied, so an out-of-band write to the replica fails the sync
    * loudly instead of silently diverging the mirror.
    *
    * Work: O(changed files) copy I/O + metadata; nothing is decoded.
    * Returns (files copied, bytes copied). */
  def replicateSnapshot(s: SparkSession, root: String, destRoot: String,
                        maxRetries: Int = 5): (Int, Long) = {
    val appId = "replica"
    val srcV = snapshotVersion(root)
    require(srcV > 0, s"no committed snapshot at $root")
    lastCommittedTxn(destRoot, appId) match {
      case None =>
        exportSnapshotTxn(s, root, destRoot, Some(appId))
      case Some(last) if last >= srcV =>
        (0, 0L) // replica already at (or past) the source snapshot
      case Some(last) =>
        // the replica fell behind source retention: the diff base is
        // gone, so an exact delta is impossible — demand a re-bootstrap
        // rather than guessing (same failure mode as a CDC consumer
        // outliving the changelog retention)
        if (!manifestReadable(root, last))
          throw new IllegalStateException(
            s"replicateSnapshot: source no longer retains v$last (the " +
              s"replica's last applied snapshot) — re-bootstrap to a fresh root")
        val before = manifestRows(s, root, last)
        val after = manifestRows(s, root, srcV)
        val beforeTriples = before.toSet
        val beforePairs = before.map(r => (r._1, r._2)).toSet
        val afterPairs = after.map(r => (r._1, r._2)).toSet
        // diff on full (table, file, stats) TRIPLES, not (table, file)
        // pairs: a deletion-vector commit re-adds the SAME path with a
        // changed `__dv` stats entry, and a pair-based diff would skip
        // it entirely — the mirror would silently keep rows the source
        // deleted, the exact divergence this sync exists to prevent.
        val changed = after.filterNot(beforeTriples)
        val removed = before.collect {
          case (t, f, _) if !afterPairs((t, f)) => (t, f) }
        // a stats-only change REPLACES its manifest row at the
        // destination: remove the stale row, re-add the fresh one (the
        // same remove+re-add shape commitDeleteVectors itself writes)
        val readds = changed.collect {
          case (t, f, _) if beforePairs((t, f)) => (t, f) }
        var bytes = 0L
        var copied = 0
        def ship(rel: String): Unit = {
          bytes += copyVerified(root, destRoot, rel); copied += 1 }
        changed.foreach { case (t, rel, st) =>
          if (!beforePairs((t, rel))) {
            ship(rel)
            // bloom sidecars ride along when present (missing bloom =
            // conservative keep at the replica — opportunistic copy)
            if (Files.exists(Paths.get(root, rel + ".bloom")))
              ship(rel + ".bloom")
          }
          // the DV sidecar this row's masked read will open; sidecar
          // names are token-unique, so existence means already shipped
          dvRefOf(st).foreach { case (side, _) =>
            if (!Files.exists(Paths.get(destRoot, side))) ship(side) }
        }
        val schemaExtras = after.map(_._1).distinct.sorted.flatMap { t =>
          registeredSchema(s, root, t, srcV).map(sch =>
            schemaMarker(t) -> sch.json.getBytes("UTF-8"))
        }
        // carry the SOURCE's txn ledgers too (not just _replica): a
        // writer failing over to the replica must resume at the batch
        // the replicated data actually contains
        val srcLedger = txnLedgerExtras(root, exclude = txnMarker(appId))
        // the CHECK registry mirrors INSIDE the sync claim: additions
        // ride as sidecar markers, source-side drops as tombstones —
        // a promoted replica enforces exactly what the source enforces,
        // atomically with the rows of the sync that made it so
        val checkDelta = after.map(_._1).distinct.sorted.flatMap { t =>
          val srcChecks = checkConstraints(root, t)
          val dstChecks = checkConstraints(destRoot, t)
          val adds = srcChecks.toSeq.sorted
            .filter { case (n, ex) => !dstChecks.get(n).contains(ex) }
            .map { case (n, ex) => checkMarkerName(t, n) -> ex.getBytes("UTF-8") }
          val drops = (dstChecks.keySet -- srcChecks.keySet).toSeq.sorted
            .map(n => checkMarkerName(t, n) -> Array.empty[Byte])
          adds ++ drops
        }
        casCommit(s, destRoot, { base =>
          txnGuard(destRoot, Some(appId -> srcV))
          // triple compare: an out-of-band DV write on the replica
          // changes stats only — pairs would miss it
          val destNow = manifestRows(s, destRoot, base).toSet
          if (destNow != beforeTriples)
            throw new CommitConflict(
              s"replicateSnapshot: $destRoot diverged from the source snapshot " +
                s"it last applied (v$last) — out-of-band writes on a replica")
          deltaOrFull(s, destRoot, base, Nil, changed, removed ++ readds)
            .copy(extras = schemaExtras ++ checkDelta ++
              registryDelta(root, destRoot) ++ srcLedger ++
              txnExtras(Some(appId -> srcV)) ++
              // the sync claim carries the SOURCE snapshot's commit
              // clock: TIMESTAMP AS OF on the replica resolves the
              // history instant the shipped rows represent
              Seq("_ts" -> commitTimeMs(root, srcV).toString
                .getBytes("UTF-8")))
        }, maxRetries)
        (copied, bytes)
    }
  }

  // ---------------------------------------------------------------- fixtures

  /** q193's stats-pruned root: two ranged appends of 8 files each, so
    * a one-week predicate should touch a small fraction of the 16. */
  def statsRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-stats/$fp-$layoutKey") { tmp =>
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

  /** q198's multi-stats root: the same two ts epochs, but each epoch's
    * files are range-partitioned by USER, with per-file stats recorded
    * for BOTH `ts` and `user_id` — so `ts` prunes across epochs while
    * `user_id` prunes within one, and a conjunctive predicate
    * multiplies the two prunes. */
  def multiStatsRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-stats2/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      commitAppendStats(s, tmp, "events_log",
        ev.filter(col("ts") < cutTs), Seq("ts", "user_id"), "user_id", 8)
      commitAppendStats(s, tmp, "events_log",
        ev.filter(col("ts") >= cutTs), Seq("ts", "user_id"), "user_id", 8)
    }
  }

  /** q197's evolving table: epoch 1 without `quality`, epoch 2 appended
    * WITH it under allowEvolution — staged once per fixture. */
  def evolvedSchemaRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-schema/$fp-$layoutKey") { tmp =>
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

  /** q196's fragmented root: six 5-day append commits of 4 files each
    * (the auto-ingest accumulation shape), then one compaction commit. */
  def compactedRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-compact/$fp-$layoutKey") { tmp =>
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
    Staging.ensure(s"target/graft-manifest-evolve/$fp-$layoutKey") { tmp =>
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

  /** q203's merge root: per-user totals of the PRE-CUT window, 8
    * user-ranged files with key stats, then one MERGE of the users
    * 2–5 band recomputed over the FULL window — replaced keys
    * rewritten, untouched user-range files inherited by reference. */
  def mergeRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-merge/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("value").cast("decimal(18,4)").as("value"),
          col("ts"))
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      def totals(df: DataFrame) = df.groupBy("user_id")
        .agg(sum("value").as("total_u"), count(lit(1)).as("n_u"))
      commitAppendStats(s, tmp, "user_totals",
        totals(ev.filter(col("ts") < cutTs)), Seq("user_id"), "user_id", 8)
      val _ = commitMergeUpsert(s, tmp, "user_totals",
        totals(ev).filter(col("user_id").between(2, 5)), "user_id")
    }
  }

  /** q202's delete-where root: the q193 shape (two ranged appends,
    * 16 ts-ranged files with stats), then one stats-pruned DELETE of
    * the [Jan 10, Jan 13) window — only the overlapping files are
    * rewritten; the pre-delete snapshot remains time-travelable. */
  def deleteWhereRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-delete/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") < cutTs), "ts", 8)
      commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") >= cutTs), "ts", 8)
      val _ = commitDeleteWhere(s, tmp, "events_log",
        Seq(Pred("ts", "2024-01-10 00:00:00", "2024-01-13 00:00:00", "timestamp")),
        col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-13 00:00:00").cast("timestamp"))
    }
  }

  /** q221's restore root: the q202 shape (two ranged appends, then a
    * stats-pruned DELETE of the [Jan 10, 13) window — the "bad
    * commit"), then `commitRestore` back to the pre-delete snapshot
    * v2. Metadata-only: the restored files are re-referenced, never
    * copied, and the delete remains time-travelable at v3. */
  def restoreRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-restore/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") < cutTs), "ts", 8)
      commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") >= cutTs), "ts", 8)
      val _ = commitDeleteWhere(s, tmp, "events_log",
        Seq(Pred("ts", "2024-01-10 00:00:00", "2024-01-13 00:00:00", "timestamp")),
        col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-13 00:00:00").cast("timestamp"))
      val _2 = commitRestore(s, tmp, "events_log", toVersion = 2L)
    }
  }

  /** q227's tag root: two ranged appends (v1, v2), tag `pre-delete`
    * at v2, a stats-pruned DELETE (v3), then vacuum(keep = 1) — the
    * sweep that WOULD collect v2's exclusive files if the tag were
    * not a retention root. */
  def tagRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-tag/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") < cutTs), "ts", 8)
      commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") >= cutTs), "ts", 8)
      val _ = createTag(tmp, "pre-delete")
      val _2 = commitDeleteWhere(s, tmp, "events_log",
        Seq(Pred("ts", "2024-01-10 00:00:00", "2024-01-13 00:00:00", "timestamp")),
        col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-13 00:00:00").cast("timestamp"))
      val _3 = vacuum(s, tmp, keep = 1, graceMs = 0L)
    }
  }

  /** q228's change-feed root: append (v1) → DV DELETE of the
    * [Jan 10, 12) window (v2) → DV UPDATE doubling user 3's value
    * (v3) → post-cut append (v4). All four commit types the row-level
    * feed prices differently, under one log. */
  def changeFeedRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-cdf/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("value").cast("decimal(18,4)").as("value"),
          col("ts"))
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") < cutTs), "ts", 8)
      val _ = commitDeleteVectors(s, tmp, "events_log",
        col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-12 00:00:00").cast("timestamp"))
      val _2 = commitUpdateVectors(s, tmp, "events_log",
        col("user_id") === 3L, Map("value" -> (col("value") * 2)))
      commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") >= cutTs), "ts", 8)
    }
  }

  /** q229's constraint root: v1 lands, two CHECKs register (scanning
    * existing data), a good append lands (v2), and a VIOLATING batch
    * is rejected — the staging asserts it left no version and no
    * visible rows. */
  def checksRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-checks/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") < cutTs), "ts", 8)
      addCheckConstraint(s, tmp, "events_log", "nonneg", "value >= 0")
      addCheckConstraint(s, tmp, "events_log", "known-user", "user_id <= 100000")
      commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") >= cutTs), "ts", 8)
      val before = snapshotVersion(tmp)
      val thrown =
        try { commitAppend(s, tmp, "events_log",
          ev.limit(5).withColumn("value",
            lit(-1).cast("decimal(18,4)"))); false }
        catch { case e: IllegalArgumentException =>
          require(e.getMessage.contains("CHECK"), e.getMessage); true }
      require(thrown, "staging bug: violating batch was accepted")
      require(snapshotVersion(tmp) == before,
        "staging bug: violating batch advanced the version")
    }
  }

  /** q230's timestamp-travel root: three window appends with real
    * wall-clock separation (50 ms sleeps — commit times are ms-
    * granular dir mtimes, and two commits in the same ms would make
    * "as of t(v2)" resolve to v3). */
  def asOfRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-asof/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val c1 = lit("2024-01-08 00:00:00").cast("timestamp")
      val c2 = lit("2024-01-16 00:00:00").cast("timestamp")
      commitAppendRanged(s, tmp, "events_log", ev.filter(col("ts") < c1), "ts", 4)
      Thread.sleep(50)
      commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") >= c1 && col("ts") < c2), "ts", 4)
      Thread.sleep(50)
      commitAppendRanged(s, tmp, "events_log", ev.filter(col("ts") >= c2), "ts", 4)
    }
  }

  /** q232's incremental-compaction root: one 8-file right-sized
    * append plus SIX single-file daily trickle commits, then
    * `compactSmallFiles` with the threshold measured between the two
    * size populations — exactly the six smalls pack into one file,
    * the eight big files are inherited by reference, and a second
    * run is a version no-op. */
  def smallFilesRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-smallfiles/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      commitAppendRanged(s, tmp, "events_log", ev.filter(col("ts") < cutTs), "ts", 2)
      val days = 16 to 29
      days.foreach { d =>
        val lo = lit(f"2024-01-$d%02d 00:00:00").cast("timestamp")
        val slice =
          if (d == days.last) ev.filter(col("ts") >= lo)
          else ev.filter(col("ts") >= lo &&
            col("ts") < lit(f"2024-01-${d + 1}%02d 00:00:00").cast("timestamp"))
        commitAppendRanged(s, tmp, "events_log", slice, "ts", 1)
      }
      def sizes: Map[String, Long] =
        manifestRows(s, tmp, snapshotVersion(tmp))
          .collect { case (_, f, _) => f -> Files.size(Paths.get(tmp, f)) }.toMap
      val byCommit = sizes.keys.groupBy(f => f.split('/')(1)) // data/vN/...
      require(sizes.size == 16, s"staging bug: expected 16 files, got ${sizes.size}")
      val bigs = byCommit("v1").map(sizes)
      val smalls = (sizes.keySet -- byCommit("v1")).map(sizes)
      require(smalls.max < bigs.min,
        s"staging bug: size populations overlap (${smalls.max} vs ${bigs.min})")
      val _ = compactSmallFiles(s, tmp, "events_log",
        minBytes = bigs.min, targetBytes = 1L << 30)
      require(sizes.size == 3, s"staging bug: expected 3 files after, got ${sizes.size}")
      val v = snapshotVersion(tmp)
      require(compactSmallFiles(s, tmp, "events_log",
        minBytes = bigs.min, targetBytes = 1L << 30) == v,
        "staging bug: second compaction was not a no-op")
    }
  }

  /** q236's CDC-mirror pair: `src/` takes pre-cut per-user totals
    * (v1), a MERGE rewrite of users 2–5 (v2, CoW step), and a DV
    * delete of users 7–9 (v3); the mirror bootstraps after v1 and
    * syncs once over (1, 3] — the builder asserts the incremental
    * sync reported net changes and a re-drive is a no-op. */
  def applyChangesRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-apply/$fp-$layoutKey") { tmp =>
      val src = s"$tmp/src"
      val dst = s"$tmp/dst"
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("value").cast("decimal(18,4)").as("value"),
          col("ts"))
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      def totals(df: DataFrame) = df.groupBy("user_id")
        .agg(sum("value").as("total_u"), count(lit(1)).as("n_u"))
      commitAppendStats(s, src, "user_totals",
        totals(ev.filter(col("ts") < cutTs)), Seq("user_id"), "user_id", 4)
      require(applyChangesInto(s, src, "user_totals",
        dst, "user_totals", "user_id").nonEmpty, "bootstrap applied nothing")
      val _ = commitMergeUpsert(s, src, "user_totals",
        totals(ev).filter(col("user_id").between(2, 5)), "user_id")
      val _2 = commitDeleteVectors(s, src, "user_totals",
        col("user_id").between(7, 9))
      val r2 = applyChangesInto(s, src, "user_totals",
        dst, "user_totals", "user_id")
      require(r2.exists { case (u, d) => u > 0 && d > 0 },
        s"incremental sync should net upserts AND deletes, got $r2")
      require(applyChangesInto(s, src, "user_totals",
        dst, "user_totals", "user_id").isEmpty,
        "re-driven sync must be a no-op")
    }
  }

  /** q264's SCD2 root: src `acct` evolves over three commits — full
    * per-user state (v1), a restatement of `user_id % 3 = 0` with
    * their [A, B) window state (v2, CoW merge), a DV erasure of
    * `user_id % 5 = 0` (v3) — mirrored into `acct_hist` by TWO
    * [[applyChangesScd2]] calls (bootstrap, then one interval covering
    * v2+v3), with the re-drive asserted a no-op. */
  def scd2Root(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-scd2/$fp-$layoutKey") { tmp =>
      val src = s"$tmp/src"
      val dst = s"$tmp/dst"
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("value").cast("decimal(18,4)").as("value"),
          col("ts"))
      val a = lit("2024-01-11 00:00:00").cast("timestamp")
      val b = lit("2024-01-21 00:00:00").cast("timestamp")
      def st(df: DataFrame) = df.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value").cast("decimal(18,4)").as("tv"))
      commitAppendStats(s, src, "acct", st(ev.filter(col("ts") < a)),
        Seq("user_id"), "user_id", 4)
      require(applyChangesScd2(s, src, "acct", dst, "acct_hist", "user_id")
        .exists(_._1 > 0), "scd2 bootstrap applied nothing")
      val _ = commitMergeUpsert(s, src, "acct",
        st(ev.filter(col("ts") >= a && col("ts") < b &&
          col("user_id") % 3 === 0)), "user_id")
      val _2 = commitDeleteVectors(s, src, "acct", col("user_id") % 5 === 0)
      val r2 = applyChangesScd2(s, src, "acct", dst, "acct_hist", "user_id")
      require(r2.exists { case (o, c) => o > 0 && c > 0 },
        s"scd2 incremental should open AND close intervals, got $r2")
      require(applyChangesScd2(s, src, "acct", dst, "acct_hist", "user_id")
        .isEmpty, "re-driven scd2 sync must be a no-op")
    }
  }

  /** q240's listing root: ONE atomic multi-table commit — events in 8
    * ts-ranged files, the per-type summary in 1. */
  def showTablesRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-show/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val _ = commitAppendMulti(s, tmp, Seq(
        ("events_log",
          ev.repartitionByRange(8, col("ts")).sortWithinPartitions("ts"),
          Seq("ts")),
        ("type_summary",
          ev.groupBy("event_type").agg(count(lit(1)).as("n")).coalesce(1),
          Seq.empty)))
    }
  }

  /** q209's replication pair under one staged root: `src/` gets a
    * pre-cut ranged append, is BOOTSTRAPPED to `dst/` (full export +
    * replica ledger), then takes a post-cut append AND a stats-pruned
    * DELETE — so the incremental sync interval contains both an append
    * and a REWRITE — and one `replicateSnapshot` mirrors both as their
    * exact remove+add footprint. A final sync proves idempotence
    * ((0, 0) on the ledger). */
  def replicatedRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-replica/$fp-$layoutKey") { tmp =>
      val src = s"$tmp/src"
      val dst = s"$tmp/dst"
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      commitAppendRanged(s, src, "events_log", ev.filter(col("ts") < cutTs), "ts", 8)
      val _ = replicateSnapshot(s, src, dst) // bootstrap: full export
      commitAppendRanged(s, src, "events_log", ev.filter(col("ts") >= cutTs), "ts", 8)
      val _2 = commitDeleteWhere(s, src, "events_log",
        Seq(Pred("ts", "2024-01-10 00:00:00", "2024-01-13 00:00:00", "timestamp")),
        col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-13 00:00:00").cast("timestamp"))
      val _3 = replicateSnapshot(s, src, dst) // incremental: append + rewrite
      val _4 = replicateSnapshot(s, src, dst) // idempotent no-op
    }
  }

  /** q201's Z-ordered root: the whole window in ONE 16-file append
    * laid on the (ts × user_id) Morton curve with stats on both — so
    * EITHER dimension prunes alone, unlike the range layout where only
    * the leading column has power (the contrast ManifestSpec
    * asserts). */
  def zorderRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-zorder/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      commitAppendZordered(s, tmp, "events_log", ev, "ts", "user_id", 16)
    }
  }

  /** q200's delta-chain root: TEN 3-day append commits — v1 is a full
    * manifest, v2–v8 are deltas, v9 is the automatic FOLD (chain hit
    * [[foldEvery]]), v10 a delta over the new full base. The daily
    * ingest cadence of a 100-TB table, where O(delta) manifest writes
    * are the difference between metadata-priced appends and rewriting
    * a multi-million-row file list every day. */
  def deltaChainRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-delta/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
        .withColumn("month", date_format(col("ts"), "yyyy-MM"))
      (0 until 10).foreach { w =>
        val lo = lit(s"2024-01-${"%02d".format(1 + w * 3)} 00:00:00").cast("timestamp")
        val hi = lit(s"2024-01-${"%02d".format(4 + w * 3)} 00:00:00").cast("timestamp")
        val slice =
          if (w == 9) ev.filter(col("ts") >= lo) // tail takes the rest
          else ev.filter(col("ts") >= lo && col("ts") < hi)
        commitAppend(s, tmp, "events_log", slice.repartition(2))
      }
    }
  }

  /** Shared two-version fixture builder (q187 + q195 + q199): v1 =
    * pre-cut summaries, v2 = full-window summaries, plus a planted
    * ORPHAN data file (a failed concurrent writer's leftovers) in the
    * live prefix. */
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
    Staging.ensure(s"target/graft-manifest/$fp-$layoutKey")(
      buildTwoVersionRoot(s, dir, _))
  }

  /** q199's exported root: the q187 snapshot shipped to a fresh root
    * via [[exportSnapshot]] — checksummed, orphan-free, v1 there. */
  def exportedRoot(s: SparkSession, dir: String): String = {
    val src = snapshotRoot(s, dir)
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-export/$fp-$layoutKey") { tmp =>
      val _ = exportSnapshot(s, src, tmp)
    }
  }

  /** q195's root: the q187 shape (two overwrite versions + orphan),
    * then vacuumed to the latest version only — staged once at a FIXED
    * path so the oracle can glob it. The compare is root-internal
    * (retained-manifest plan vs on-disk reality), so whichever fixture
    * seeds the build, both sides see the same root; the path key is the
    * build RECIPE × manifest layout (and the Verify gate rebuilds
    * unconditionally anyway, so even a recipe-key miss cannot serve
    * stale bytes to the gate). */
  val vacuumedRootDir: String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft-manifest-vac-" + Staging.contentKey(
        manifestDdl, "two-version-root+orphan", "vacuum-keep=1")).toString

  def vacuumedRoot(s: SparkSession, dir: String): String =
    Staging.ensure(vacuumedRootDir) { tmp =>
      buildTwoVersionRoot(s, dir, tmp)
      // single-writer staging: nothing can be in flight, and the q195
      // oracle asserts disk == retained plan immediately — opt in to 0
      val _ = vacuum(s, tmp, keep = 1, graceMs = 0L)
    }

  /** q211's WAP root: the full write-audit-publish loop over three ts
    * windows of `events`. Main commits window A; a CORRUPTED window-B
    * batch (event_type nulled) is staged on branch `qa-1`, fails its
    * audit, and is dropped — main never sees it; main then commits
    * window C directly (the branch never blocked ingest); the corrected
    * window B is staged on `qa-2`, passes audit, and is published. The
    * builder asserts both audit outcomes, so the staged fixture cannot
    * silently degenerate into a plain three-append root. */
  def wapRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-wap/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val cutA = lit("2024-01-11 00:00:00").cast("timestamp")
      val cutB = lit("2024-01-21 00:00:00").cast("timestamp")
      val winB = ev.filter(col("ts") >= cutA && col("ts") < cutB)
      commitAppend(s, tmp, "events_log", ev.filter(col("ts") < cutA))
      val audit: DataFrame => Option[String] = df => {
        val bad = df.filter(col("event_type").isNull).limit(1).count()
        if (bad > 0) Some("event_type NOT NULL violated") else None
      }
      commitAppendBranch(s, tmp, "events_log",
        winB.withColumn("event_type", lit(null).cast("string")), "qa-1")
      val first = auditThenPublish(s, tmp, "events_log", "qa-1")(audit)
      require(first.isLeft, "staging bug: corrupted batch passed audit")
      commitAppend(s, tmp, "events_log", ev.filter(col("ts") >= cutB))
      commitAppendBranch(s, tmp, "events_log", winB, "qa-2")
      val second = auditThenPublish(s, tmp, "events_log", "qa-2")(audit)
      require(second.isRight, s"staging bug: clean batch failed audit: $second")
    }
  }

  /** q212's bloom root: `orders` hash-scattered into 16 files on
    * `o_orderkey` — every file spans the whole key range, so [min,max]
    * stats cannot prune a point lookup and the per-file bloom is the
    * only thing standing between a 5-key lookup and a full scan. */
  def bloomRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("orders"))
    Staging.ensure(s"target/graft-manifest-bloom/$fp-$layoutKey") { tmp =>
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(16, col("o_orderkey"))
      commitAppendBloom(s, tmp, "orders_idx", orders, "o_orderkey",
        expectedPerFile = 16384L, fpp = 0.01)
    }
  }

  /** q213's consumer root: src commit log advanced four times, a
    * downstream projection table synced by [[consumeInto]] after
    * commits 1, 2 (with a re-driven duplicate), and 4. Sync 2 must
    * take the O(delta) append path, the re-drive must no-op, and the
    * interval spanning commit 4's REWRITE (a purge replacing the
    * table) must take the full-refresh path — all asserted at build
    * time so the fixture can't degenerate. */
  def consumeRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-consume/$fp-$layoutKey") { tmp =>
      val src = s"$tmp/src"
      val dst = s"$tmp/dst"
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val cutA = lit("2024-01-11 00:00:00").cast("timestamp")
      val cutB = lit("2024-01-21 00:00:00").cast("timestamp")
      val purgeLo = lit("2024-01-05 00:00:00").cast("timestamp")
      val purgeHi = lit("2024-01-08 00:00:00").cast("timestamp")
      val tr: DataFrame => DataFrame = df =>
        df.select(col("user_id"),
          upper(col("event_type")).as("event_type_u"), col("value"), col("ts"))
      def sync() = consumeInto(s, src, "events_log", dst, "events_mirror",
        "mirror-app")(tr)
      commitAppend(s, src, "events_log", ev.filter(col("ts") < cutA))
      require(sync().isDefined, "staging bug: bootstrap sync skipped")
      commitAppend(s, src, "events_log",
        ev.filter(col("ts") >= cutA && col("ts") < cutB))
      val s2 = sync()
      require(s2.exists(_._3), s"staging bug: append interval not pure: $s2")
      require(sync().isEmpty, "staging bug: re-driven sync applied twice")
      commitAppend(s, src, "events_log", ev.filter(col("ts") >= cutB))
      // a purge REWRITE: the consumer's next interval is impure
      commitReplace(s, src, "events_log",
        ev.filter(!(col("ts") >= purgeLo && col("ts") < purgeHi)))
      val s3 = sync()
      require(s3.exists(!_._3), s"staging bug: rewrite interval read as pure: $s3")
    }
  }

  /** q214's deletion-vector root: `events` committed as 8 ts-ranged
    * files, then a two-day window deleted as deletion vectors — the
    * builder asserts the data FILE SET is unchanged (no rewrite
    * happened) and that DV sidecars exist, so the fixture can't
    * silently degenerate into a copy-on-write delete. */
  def dvRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-dv/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      commitAppendRanged(s, tmp, "events_log", ev, "ts", 8)
      val before = manifestRows(s, tmp, snapshotVersion(tmp))
        .collect { case (_, f, _) => f }.toSet
      commitDeleteVectors(s, tmp, "events_log",
        col("ts") >= lit("2024-01-12 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-14 00:00:00").cast("timestamp"))
      val afterRows = manifestRows(s, tmp, snapshotVersion(tmp))
      val after = afterRows.collect { case (_, f, _) => f }.toSet
      require(after == before,
        "staging bug: DV delete rewrote the file set")
      require(afterRows.exists(r => r._3 != null && r._3.contains("__dv")),
        "staging bug: no deletion vector recorded")
    }
  }

  /** q215's update-where root: the q202 shape (16 ts-ranged files with
    * stats), then one stats-pruned UPDATE doubling `value` inside the
    * [Jan 10, Jan 13) window — only overlapping files rewritten; the
    * builder asserts untouched files are inherited by reference. */
  def updateWhereRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-update/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val cutTs = lit(Cdc.versionCut).cast("timestamp")
      commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") < cutTs), "ts", 8)
      commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") >= cutTs), "ts", 8)
      val before = manifestRows(s, tmp, snapshotVersion(tmp))
        .collect { case (_, f, _) => f }.toSet
      val _ = commitUpdateWhere(s, tmp, "events_log",
        Seq(Pred("ts", "2024-01-10 00:00:00", "2024-01-13 00:00:00", "timestamp")),
        col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-13 00:00:00").cast("timestamp"),
        Map("value" -> (col("value") * 2)))
      val after = manifestRows(s, tmp, snapshotVersion(tmp))
        .collect { case (_, f, _) => f }.toSet
      require((before intersect after).nonEmpty && before != after,
        "staging bug: update rewrote everything (or nothing)")
    }
  }

  /** q216's merge-on-read update root: 8 ts-ranged files, a two-day
    * DV delete, then a DV UPDATE negating user 3's `value` — old
    * images masked by sidecar, new images appended, the original file
    * set intact (the builder asserts no rewrite happened and that the
    * update did not resurrect the deleted window). */
  def dvUpdateRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-dvupd/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      commitAppendRanged(s, tmp, "events_log", ev, "ts", 8)
      val original = manifestRows(s, tmp, snapshotVersion(tmp))
        .collect { case (_, f, _) => f }.toSet
      commitDeleteVectors(s, tmp, "events_log",
        col("ts") >= lit("2024-01-12 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-14 00:00:00").cast("timestamp"))
      commitUpdateVectors(s, tmp, "events_log",
        col("user_id") === 3L, Map("value" -> -col("value")))
      val after = manifestRows(s, tmp, snapshotVersion(tmp))
        .collect { case (_, f, _) => f }.toSet
      require(original.subsetOf(after) && after.size > original.size,
        "staging bug: DV update rewrote original files or appended nothing")
    }
  }

  /** q218's multi-table root: three windows of `events`, each landed
    * by ONE [[commitAppendMulti]] claim carrying the fact batch
    * (`events_log`) AND its audit row (`batch_audit`: commit_id, row
    * count, value total) — the staging asserts the cross-table
    * invariant (audit totals == fact totals) at EVERY version, which
    * only an atomic multi-table commit can guarantee. */
  def multiRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("events"))
    Staging.ensure(s"target/graft-manifest-multi/$fp-$layoutKey") { tmp =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val c1 = lit("2024-01-08 00:00:00").cast("timestamp")
      val c2 = lit("2024-01-16 00:00:00").cast("timestamp")
      val windows = Seq(
        ev.filter(col("ts") < c1),
        ev.filter(col("ts") >= c1 && col("ts") < c2),
        ev.filter(col("ts") >= c2))
      windows.zipWithIndex.foreach { case (batch, i) =>
        val audit = batch.agg(
            count(lit(1)).as("n_rows"),
            sum("value").cast("decimal(28,4)").as("total_v"))
          .withColumn("commit_id", lit(i.toLong))
          .select("commit_id", "n_rows", "total_v")
        commitAppendMulti(s, tmp, Seq(
          ("events_log", batch, Seq("ts")),
          ("batch_audit", audit, Seq.empty)))
      }
      (1L to 3L).foreach { v =>
        val f = readTable(s, tmp, "events_log", v)
          .agg(count(lit(1)), sum("value").cast("decimal(28,4)")).head()
        val a = readTable(s, tmp, "batch_audit", v)
          .agg(sum("n_rows"), sum("total_v").cast("decimal(28,4)")).head()
        require(f.getLong(0) == a.getLong(0) && f.getDecimal(1) == a.getDecimal(1),
          s"staging bug: audit diverges from facts at v$v")
      }
    }
  }

  /** q220's dedup root: `documents` plus a doc_id-shifted copy of
    * every 10th doc (the fixture corpus is exact-duplicate-free, so
    * the re-crawl is planted deterministically — the oracle mirrors
    * the same union), committed as 4 doc_id-ranged files, then
    * deduplicated in place by [[commitDedupVectors]] on q40's
    * content-normalization key (md5 of the sorted token bag), min
    * doc_id surviving — the staging asserts no data file was
    * rewritten and at least one duplicate was masked. */
  def dedupDvRoot(s: SparkSession, dir: String): String = {
    val fp = Staging.fingerprintOf(dir, Seq("documents"))
    Staging.ensure(s"target/graft-manifest-dedup/$fp-$layoutKey") { tmp =>
      val base = Tables.load(s, dir, "documents")
      val docs = base.unionByName(
        base.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      commitAppendRanged(s, tmp, "documents", docs, "doc_id", 4)
      val before = manifestRows(s, tmp, snapshotVersion(tmp))
        .collect { case (_, f, _) => f }.toSet
      val nBefore = readTable(s, tmp, "documents").count()
      commitDedupVectors(s, tmp, "documents",
        expr("md5(concat_ws(' ', array_sort(split(text, ' '))))"), "doc_id")
      val after = manifestRows(s, tmp, snapshotVersion(tmp))
        .collect { case (_, f, _) => f }.toSet
      require(after == before, "staging bug: dedup rewrote the file set")
      require(readTable(s, tmp, "documents").count() < nBefore,
        "staging bug: fixture has no duplicates to mask")
    }
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

    // ----- MULTI-column stats + conjunctive pruning (q198): each
    //       file's manifest row records [min, max] for ts AND user_id;
    //       a (time window × user band) predicate keeps only files
    //       both intervals overlap — ManifestSpec asserts the read set
    //       is a strict subset. The oracle recomputes the same
    //       predicate from the raw table, so over-pruning loses rows
    //       and breaks the hash; treating stats as a row filter
    //       over-counts and breaks it too. -----
    Q("q198_manifest_multicol_prune",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-08 00:00:00'
             |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15 00:00:00'
             |  AND user_id BETWEEN 2 AND 5
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = multiStatsRoot(s, dir)
        val (pruned, _, _) = readTablePruned(s, root, "events_log", Seq(
          Pred("ts", "2024-01-08 00:00:00", "2024-01-15 00:00:00", "timestamp"),
          Pred("user_id", "2", "5", "bigint")))
        pruned
          .filter(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
            col("ts") < lit("2024-01-15 00:00:00").cast("timestamp") &&
            col("user_id").between(2, 5))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type")
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
        val resolved = manifestRows(s, root, v)
        import s.implicits._
        Seq("type_totals", "user_totals").map { t =>
          val nFiles = resolved.count(_._1 == t).toLong
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
      }),

    // ----- Snapshot export (q199): the q187 snapshot SHIPPED to a
    //       fresh root — only manifest-referenced files travel (the
    //       planted orphan must not), each copy is checksum-verified,
    //       and the destination serves the same consistent two-table
    //       read as v1 of its own commit log. The oracle recomputes
    //       from the raw source table, so a file lost, duplicated, or
    //       corrupted in transit breaks the hash; ManifestSpec pins
    //       the orphan exclusion and source-independence. -----
    Q("q199_snapshot_export",
      Some("""SELECT user_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_u,
             |  CAST((SELECT sum(CAST(value AS DECIMAL(18,4))) FROM events)
             |    AS DOUBLE) AS grand_total
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = exportedRoot(s, dir)
        val users = readTable(s, root, "user_totals")
        val grand = readTable(s, root, "type_totals")
          .agg(sum("total_t").as("grand_total"))
        users.crossJoin(broadcast(grand))
          .select(col("user_id"), col("total_u").cast("double").as("total_u"),
            col("grand_total").cast("double").as("grand_total"))
          .orderBy("user_id")
      }),

    // ----- Delta-manifest chain (q200): ten daily-cadence appends
    //       where all but the periodic FOLD write O(delta) manifest
    //       metadata; the read resolves the chain (deltas replayed
    //       over the last full base) into one explicit file list. The
    //       oracle recomputes the monthly account from the raw table,
    //       so a drop/add replayed in the wrong order, a lost delta,
    //       or a fold that dropped rows all break the hash;
    //       ManifestSpec pins the chain SHAPE (v1 full, deltas until
    //       the automatic fold, delta rows == files added). -----
    Q("q200_manifest_delta_chain",
      Some("""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m') AS month,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val root = deltaChainRoot(s, dir)
        readTable(s, root, "events_log")
          .groupBy("month")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("month")
      }),

    // ----- Z-order layout × per-file stats (q201): one 16-file append
    //       tiled on the (ts × user_id) Morton curve, stats on both
    //       dimensions — so a predicate on EITHER column prunes files
    //       (ManifestSpec asserts both single-dimension prunes are
    //       strict subsets, which a range layout cannot give its
    //       trailing column). The row predicate still applies after
    //       the file bound; the oracle recomputes from the raw table,
    //       so curve bugs (bad grid bounds, interleave errors) that
    //       misplace rows break the hash. -----
    Q("q201_manifest_zorder_prune",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-08 00:00:00'
             |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15 00:00:00'
             |  AND user_id BETWEEN 2 AND 5
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = zorderRoot(s, dir)
        val (pruned, _, _) = readTablePruned(s, root, "events_log", Seq(
          Pred("ts", "2024-01-08 00:00:00", "2024-01-15 00:00:00", "timestamp"),
          Pred("user_id", "2", "5", "bigint")))
        pruned
          .filter(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
            col("ts") < lit("2024-01-15 00:00:00").cast("timestamp") &&
            col("user_id").between(2, 5))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type")
      }),

    // ----- Stats-pruned DELETE (q202): a three-day window is deleted
    //       by rewriting ONLY the files whose stats overlap it (the
    //       rest inherited by reference; ManifestSpec pins the
    //       untouched-file identity, the O(affected) delta metadata,
    //       and the time-travelable pre-delete version). The oracle
    //       recomputes the complement from the raw table, so deleting
    //       too much (over-prune / filter polarity) or too little
    //       (missed file) breaks the hash. -----
    Q("q202_manifest_delete_where",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |WHERE NOT (CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
             |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-13 00:00:00')
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = deleteWhereRoot(s, dir)
        readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type")
      }),

    // ----- MERGE upsert through the commit log (q203): the users-2–5
    //       band's totals are replaced with full-window recomputations
    //       in ONE atomic delta commit that rewrites only the files
    //       whose user_id stats overlap the band (ManifestSpec pins
    //       untouched-file identity + time travel). The oracle derives
    //       the merged state from the raw table — for merged keys the
    //       full window, for the rest the pre-cut window — so a key
    //       updated twice, lost, or leaked outside the band breaks the
    //       hash. -----
    Q("q203_manifest_merge_upsert",
      Some("""SELECT user_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_u,
             |  CAST(count(*) AS BIGINT) AS n_u
             |FROM events
             |WHERE user_id BETWEEN 2 AND 5
             |   OR CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = mergeRoot(s, dir)
        readTable(s, root, "user_totals")
          .select(col("user_id"), col("total_u").cast("double").as("total_u"),
            col("n_u"))
          .orderBy("user_id")
      }),

    // ----- Incremental consumption / CDF-lite (q208): a consumer that
    //       processed the delta-chain table at v3 reads versions
    //       (3, 6] as exactly the three appended slices — file-
    //       granularity change feed, O(delta) I/O, no full rescan.
    //       The oracle recomputes those slices' window (days 10–19)
    //       from the raw table, so a missed delta, an inherited file
    //       misread as new, or wrong interval arithmetic all break
    //       the hash; ManifestSpec pins the pureAppend=false flag on
    //       rewrite intervals (where file deltas would double-count).
    //       -----
    Q("q208_table_changes",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
             |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-19 00:00:00'
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = deltaChainRoot(s, dir)
        val (delta, pureAppend) =
          tableChanges(s, root, "events_log", fromVersion = 3L, toVersion = 6L)
        require(pureAppend, "delta-chain interval must be append-only")
        delta.groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type")
      }),

    // ----- Incremental replication (q209): the DR replica is
    //       bootstrapped by full export, then ONE sync ships an
    //       interval containing both an append and a stats-pruned
    //       DELETE as its exact remove+add footprint, checksummed,
    //       exactly-once via the replica txn ledger. The returned
    //       relation reads the REPLICA; the oracle recomputes the
    //       post-delete state from the raw source table — a file
    //       lost/duplicated in transit, a rewrite mirrored as a plain
    //       append (double rows), or a replayed sync all break the
    //       hash. -----
    Q("q209_incremental_replication",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |WHERE NOT (CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
             |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-13 00:00:00')
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = replicatedRoot(s, dir)
        readTable(s, s"$root/dst", "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type")
      }),

    // ----- Write-audit-publish (q211): a corrupted batch staged on a
    //       WAP branch fails audit and is dropped (main never sees
    //       it); ingest continues on main meanwhile; the corrected
    //       batch is staged, audited, and published by an atomic
    //       CAS-claimed fast-forward. Final main = windows A + C +
    //       corrected B — i.e. exactly the raw table, which is what
    //       the oracle recomputes: a leaked corrupt batch adds a NULL
    //       event_type group, a lost publish drops window B, and a
    //       non-atomic publish tears the totals — all hash breaks.
    //       WapSpec pins the mechanics (invisibility, drop, conflict,
    //       vacuum of dropped branches). -----
    Q("q211_wap_publish",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = wapRoot(s, dir)
        readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type")
      }),

    // ----- Bloom point-lookup pruning (q212): five keys looked up in
    //       a 16-file hash-scattered table — range stats are useless
    //       here (every file spans the whole key range); the per-file
    //       bloom sidecars keep ~|keys| files (BloomIndexSpec asserts
    //       kept < total and zero false negatives). Blooms bound,
    //       never filter: the exact IN predicate still applies, and
    //       the oracle recomputes the lookup from the raw table — a
    //       false-negative prune loses rows and breaks the hash. -----
    Q("q212_bloom_point_lookup",
      Some("""SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
             |  CAST(o_custkey AS BIGINT) AS o_custkey,
             |  CAST(o_totalprice AS DOUBLE) AS o_totalprice
             |FROM orders
             |WHERE o_orderkey IN (
             |  SELECT o_orderkey FROM orders WHERE o_orderkey % 7 = 0
             |  ORDER BY o_orderkey LIMIT 5)
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        val root = bloomRoot(s, dir)
        import s.implicits._
        val keys = Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") % 7 === 0)
          .orderBy("o_orderkey").limit(5)
          .select(col("o_orderkey").cast("long")).as[Long].collect().toSeq
        val (hit, _, _) = readTablePoint(s, root, "orders_idx", "o_orderkey", keys)
        hit.select(col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_custkey").cast("long").as("o_custkey"),
          col("o_totalprice").cast("double").as("o_totalprice"))
          .orderBy("o_orderkey")
      }),

    // ----- Exactly-once incremental consumption (q213): a downstream
    //       projection table maintained from the source commit log —
    //       bootstrap, one O(delta) append sync, a re-driven duplicate
    //       (no-op via the dest txn ledger), and a purge REWRITE
    //       interval taken as a full refresh. The oracle recomputes
    //       the post-purge transform from the raw table: a replayed
    //       sync double-counts window B, a rewrite consumed as an
    //       append resurrects purged rows, and a dropped transform
    //       shows as case drift — all hash breaks. -----
    Q("q213_incremental_consume",
      Some("""SELECT UPPER(event_type) AS event_type_u,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |WHERE NOT (CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-05 00:00:00'
             |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-08 00:00:00')
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val root = consumeRoot(s, dir)
        readTable(s, s"$root/dst", "events_mirror")
          .groupBy("event_type_u")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type_u")
      }),

    // ----- Merge-on-read DELETE via deletion vectors (q214): a
    //       two-day purge recorded as per-file row-position sidecars —
    //       no data file rewritten (the builder asserts the file set
    //       is unchanged), deleted rows invisible to every read path.
    //       The oracle recomputes the post-purge aggregate from the
    //       raw table: a DV that leaks rows over-counts, one that
    //       over-deletes under-counts, and a read path that bypasses
    //       the DV (pruned scan, compaction, rewrite) resurrects the
    //       window — all hash breaks. DeletionVectorSpec pins the
    //       mechanics. -----
    Q("q214_deletion_vectors",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |WHERE NOT (CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-12 00:00:00'
             |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-14 00:00:00')
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = dvRoot(s, dir)
        readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type")
      }),

    // ----- Stats-pruned UPDATE (q215): `value` doubled inside a
    //       three-day window by rewriting ONLY the files whose stats
    //       overlap it (untouched files inherited by reference — the
    //       staging asserts it). The oracle recomputes with CASE WHEN
    //       from the raw table: updating too wide (over-prune), too
    //       narrow (missed file), or resurrecting pre-update images
    //       all break the hash. ManifestSpec pins NULL-predicate
    //       keeps, old-row SET evaluation, and time travel. -----
    Q("q215_manifest_update_where",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
             |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-13 00:00:00'
             |    THEN CAST(value AS DECIMAL(18,4)) * 2
             |    ELSE CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS total_v
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = updateWhereRoot(s, dir)
        readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type")
      }),

    // ----- Merge-on-read UPDATE via deletion vectors (q216): user
    //       3's `value` negated WITHOUT rewriting any original file —
    //       old images masked by position sidecars, new images
    //       appended, one atomic commit — after a DV delete already
    //       masked a two-day window. The oracle recomputes both
    //       effects from the raw table: an update that resurrects
    //       deleted rows, double-counts (old image leaks beside the
    //       new), or misses the append breaks the hash. -----
    Q("q216_manifest_update_vectors",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CASE WHEN user_id = 3
             |    THEN -CAST(value AS DECIMAL(18,4))
             |    ELSE CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS total_v
             |FROM events
             |WHERE NOT (CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-12 00:00:00'
             |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-14 00:00:00')
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = dvUpdateRoot(s, dir)
        readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type")
      }),

    // ----- Atomic multi-table commit (q218): each ingest window
    //       lands the fact batch AND its audit row in ONE claim, so
    //       no version can show them apart (the staging asserts the
    //       invariant at every version). The result carries the fact
    //       aggregate per event_type beside the audit ledger's grand
    //       totals; the oracle recomputes both from the raw table —
    //       a torn commit, a lost audit row, or fact/audit drift all
    //       break the hash. -----
    Q("q218_multi_table_commit",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v,
             |  CAST((SELECT count(*) FROM events) AS BIGINT) AS audit_n,
             |  CAST((SELECT sum(CAST(value AS DECIMAL(18,4))) FROM events)
             |    AS DOUBLE) AS audit_total
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = multiRoot(s, dir)
        val facts = readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
        val audit = readTable(s, root, "batch_audit")
          .agg(sum("n_rows").as("audit_n"),
            sum("total_v").cast("double").as("audit_total"))
        facts.crossJoin(broadcast(audit)).orderBy("event_type")
      }),

    // ----- In-place corpus dedup via deletion vectors (q220): q40's
    //       exact-dedup (md5 of the sorted token bag, min doc_id
    //       survives) executed against the committed corpus WITHOUT
    //       rewriting a file — duplicate positions masked by
    //       sidecars. The oracle recomputes the survivor set from the
    //       raw table and aggregates it per language: masking a
    //       survivor, keeping a duplicate, or picking a non-min
    //       doc_id all shift the counts and char totals — hash
    //       breaks. -----
    Q("q220_dedup_vectors",
      Some("""WITH corpus AS (
             |  SELECT doc_id, text, lang, n_chars FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000, text, lang, n_chars
             |  FROM documents WHERE doc_id % 10 = 0)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM corpus d
             |JOIN (SELECT min(doc_id) AS keep_id
             |      FROM (SELECT doc_id,
             |              md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS k
             |            FROM corpus)
             |      GROUP BY k) kk ON d.doc_id = kk.keep_id
             |GROUP BY lang ORDER BY lang""".stripMargin),
      (s, dir) => {
        val root = dedupDvRoot(s, dir)
        readTable(s, root, "documents")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
          .orderBy("lang")
      }),

    // ----- RESTORE to version (q221): a three-day window is DELETEd
    //       (the bad commit), then the table is restored to the
    //       pre-delete snapshot as a new, metadata-only commit —
    //       files re-referenced, zero data I/O, history preserved
    //       (ManifestSpec pins the roll-forward version, the no-op
    //       re-restore, and the vacuumed-snapshot refusal). The
    //       oracle aggregates the FULL raw window: a restore that
    //       missed a file, kept the deleted state, or resurrected
    //       the wrong snapshot all shift the counts — hash breaks.
    //       -----
    Q("q221_manifest_restore",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = restoreRoot(s, dir)
        readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type")
      }),

    // ----- snapshot tag as retention root (q227): v2 (pre-delete) is
    //       TAGGED, a three-day DELETE lands, and vacuum(keep=1)
    //       sweeps everything else below the floor — yet the tagged
    //       snapshot reads back in full, because tags pin files AND
    //       manifests past any retention window (ManifestSpec pins
    //       the negative control: the same vacuum without the tag
    //       makes v2 unreadable). The oracle recomputes the full
    //       window per user from the raw table: a tag that failed to
    //       retain (read throws = board FAIL) or resolved to the
    //       wrong version (post-delete counts) breaks the row. -----
    Q("q227_snapshot_tag",
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = tagRoot(s, dir)
        readTableTag(s, root, "events_log", "pre-delete")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("user_id")
      }),

    // ----- row-level change feed (q228): four commits — append,
    //       merge-on-read DELETE, merge-on-read UPDATE, append — read
    //       back as (insert | delete) rows tagged with their commit
    //       version, derived post-hoc from the log (DV-position drift
    //       = exact deletes; the UPDATE surfaces as its pre-image
    //       delete + post-image insert pair). The oracle recomputes
    //       every (version, change) class from the raw table: a
    //       pre-image priced with the NEW value, a delete double-
    //       reported, or an already-deleted row re-matching the
    //       update all shift the per-class sums — hash breaks. -----
    Q("q228_change_feed",
      Some("""WITH ev AS (SELECT user_id, CAST(value AS DECIMAL(18,4)) AS value,
             |    CAST(ts AS TIMESTAMP) AS ts FROM events),
             |del2 AS (SELECT * FROM ev
             |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
             |    AND ts >= TIMESTAMP '2024-01-10 00:00:00'
             |    AND ts < TIMESTAMP '2024-01-12 00:00:00'),
             |upd3 AS (SELECT * FROM ev
             |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00' AND user_id = 3
             |    AND NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
             |      AND ts < TIMESTAMP '2024-01-12 00:00:00')),
             |classes AS (
             |  SELECT 1 AS v, 'insert' AS change, count(*) AS n, sum(value) AS sv
             |  FROM ev WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
             |  UNION ALL SELECT 2, 'delete', count(*), sum(value) FROM del2
             |  UNION ALL SELECT 3, 'delete', count(*), sum(value) FROM upd3
             |  UNION ALL SELECT 3, 'insert', count(*), sum(value * 2) FROM upd3
             |  UNION ALL SELECT 4, 'insert', count(*), sum(value)
             |  FROM ev WHERE ts >= TIMESTAMP '2024-01-16 00:00:00')
             |SELECT CAST(v AS BIGINT) AS v, change,
             |  CAST(n AS BIGINT) AS n, CAST(sv AS DOUBLE) AS sv
             |FROM classes ORDER BY v, change""".stripMargin),
      (s, dir) => {
        val root = changeFeedRoot(s, dir)
        readChangeFeed(s, root, "events_log", fromVersion = 0L)
          .groupBy(col("_commit_version").as("v"),
            col("_change_type").as("change"))
          .agg(count(lit(1)).as("n"), sum("value").cast("double").as("sv"))
          .orderBy("v", "change")
      }),

    // ----- CHECK constraints at commit (q229): two registered
    //       predicates validate every write's published files before
    //       the claim; the fixture's violating batch is REJECTED with
    //       nothing visible (staging asserts no version advanced).
    //       The oracle aggregates the raw table incl. min(value): a
    //       leaked violating row drives min_v to −1, a wrongly-
    //       rejected good batch shifts the counts — hash breaks. -----
    Q("q229_check_constraints",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(min(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS min_v
             |FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = checksRoot(s, dir)
        readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            min("value").cast("double").as("min_v"))
          .orderBy("event_type")
      }),

    // ----- TIMESTAMP AS OF time travel (q230): the read resolves a
    //       wall-clock instant — v2's monotonic-adjusted commit time
    //       — to the newest version at or before it, then serves that
    //       snapshot. The oracle recomputes v2's window content from
    //       the raw table: resolving one version early (missing the
    //       mid window) or late (including the tail window) shifts
    //       every aggregate — hash breaks. -----
    Q("q230_timestamp_as_of",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = asOfRoot(s, dir)
        readTableAsOf(s, root, "events_log", commitTimeMs(root, 2L))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type")
      }),

    // ----- incremental OPTIMIZE (q232): six trickle files pack into
    //       one, eight right-sized files inherit by reference, and
    //       the result row carries BOTH file counts beside the full
    //       content aggregate — a compaction that rewrote the bigs
    //       (wrong cost class), missed a small, or lost rows in the
    //       pack all shift the row — hash breaks. File counts are
    //       deterministic constants of the fixture (8+6 → 8+1), so
    //       the oracle states them literally. -----
    Q("q232_compact_small_files",
      Some("""SELECT CAST(16 AS BIGINT) AS n_files_before,
             |  CAST(3 AS BIGINT) AS n_files_after,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events""".stripMargin),
      (s, dir) => {
        val root = smallFilesRoot(s, dir)
        val before = manifestRows(s, root, snapshotVersion(root) - 1)
          .count(_._1 == "events_log")
        val after = manifestRows(s, root, snapshotVersion(root))
          .count(_._1 == "events_log")
        readTable(s, root, "events_log")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .select(lit(before.toLong).as("n_files_before"),
            lit(after.toLong).as("n_files_after"),
            col("n_events"), col("total_v"))
      }),

    // ----- DESCRIBE HISTORY (q234): the change-feed root's four
    //       commits read back as (version, operation) rows from the
    //       `_op` markers the claims carry — the audit trail of what
    //       ran when. Operations are deterministic constants of the
    //       fixture, so the oracle states them literally; a commit
    //       path that stopped recording its marker (or recorded the
    //       wrong outermost name) breaks the hash. -----
    Q("q234_table_history",
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), 'commitAppendRanged'),
             |  (CAST(2 AS BIGINT), 'commitDeleteVectors'),
             |  (CAST(3 AS BIGINT), 'commitUpdateVectors'),
             |  (CAST(4 AS BIGINT), 'commitAppendRanged'))
             |AS h(version, operation) ORDER BY version""".stripMargin),
      (s, dir) => {
        val root = changeFeedRoot(s, dir)
        tableHistory(s, root)
          .select("version", "operation")
          .orderBy("version")
      }),

    // ----- APPLY CHANGES INTO (q236): the destination mirror is
    //       maintained purely from the row-level change feed — a
    //       CoW MERGE rewrite nets to its post-images, a DV delete
    //       to its net deletes, exactly once across re-drives (the
    //       staging asserts both). The result reads the MIRROR; the
    //       oracle recomputes the expected key-wise state from the
    //       raw table: a stale pre-image surviving, a deleted key
    //       resurrecting, or a double-applied interval all shift the
    //       per-user totals — hash breaks. -----
    Q("q236_apply_changes",
      Some("""SELECT user_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_u,
             |  CAST(count(*) AS BIGINT) AS n_u
             |FROM events
             |WHERE (user_id BETWEEN 2 AND 5
             |   OR CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00')
             |  AND user_id NOT BETWEEN 7 AND 9
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = applyChangesRoot(s, dir)
        readTable(s, s"$root/dst", "user_totals")
          .select(col("user_id"), col("total_u").cast("double").as("total_u"),
            col("n_u"))
          .orderBy("user_id")
      }),

    // ----- APPLY CHANGES, SCD TYPE 2 (q264): the history-keeping
    //       CDC mirror — three source commits (full state, a %3
    //       restatement, a %5 DV erasure) become one validity-interval
    //       row per (user, state); fixture drives TWO incremental
    //       syncs + a no-op re-drive through the txn ledger. The
    //       oracle derives the interval algebra (row count, open flag,
    //       current value) from raw events: a missed close, a phantom
    //       open, or an unchanged row emitting a spurious interval all
    //       shift a user's triple — hash breaks. -----
    Q("q264_apply_changes_scd2",
      Some("""WITH u1 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv
             |  FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-11 00:00:00'
             |  GROUP BY user_id),
             |u2 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv
             |  FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-11 00:00:00'
             |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-21 00:00:00'
             |    AND user_id % 3 = 0 GROUP BY user_id)
             |SELECT coalesce(u1.user_id, u2.user_id) AS user_id,
             |  CAST(CASE WHEN u1.user_id IS NOT NULL AND u2.user_id IS NOT NULL
             |    AND (u1.n <> u2.n OR u1.tv <> u2.tv) THEN 2 ELSE 1 END AS BIGINT) AS n_rows,
             |  CAST(CASE WHEN coalesce(u1.user_id, u2.user_id) % 5 = 0
             |    THEN 0 ELSE 1 END AS BIGINT) AS has_open,
             |  CAST(CASE WHEN coalesce(u1.user_id, u2.user_id) % 5 = 0 THEN -1
             |    ELSE CAST(coalesce(u2.tv, u1.tv) AS DOUBLE) END AS DOUBLE) AS cur_tv
             |FROM u1 FULL OUTER JOIN u2 ON u1.user_id = u2.user_id
             |ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = scd2Root(s, dir)
        readTable(s, s"$root/dst", "acct_hist")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_rows"),
            max(when(col("__end_v").isNull, 1L).otherwise(0L)).as("has_open"),
            coalesce(max(when(col("__end_v").isNull, col("tv"))).cast("double"),
              lit(-1.0)).as("cur_tv"))
          .orderBy("user_id")
      }),

    // ----- SHOW TABLES (q240): one atomic two-table commit, listed
    //       back as (table, n_files, n_rows) from manifest metadata —
    //       row counts via the q224 arithmetic per table. File counts
    //       are deterministic constants of the fixture layout, stated
    //       literally by the oracle; the row counts recompute from the
    //       raw table — a miscounted DV, a table dropped from the
    //       listing, or file-count drift all break the hash. -----
    Q("q240_show_tables",
      Some("""SELECT 'events_log' AS table_name, CAST(8 AS BIGINT) AS n_files,
             |  CAST(count(*) AS BIGINT) AS n_rows FROM events
             |UNION ALL
             |SELECT 'type_summary', CAST(1 AS BIGINT),
             |  CAST(count(DISTINCT event_type) AS BIGINT) FROM events
             |ORDER BY table_name""".stripMargin),
      (s, dir) => {
        val root = showTablesRoot(s, dir)
        listTables(s, root).orderBy("table_name")
      }),

    // ----- metadata-only COUNT (q224): both counts — the full table
    //       at v1 and the post-DV-delete state at v2 — answer from
    //       manifest arithmetic alone (Σ __nrows − Σ DV positions;
    //       ManifestSpec proves the data files need not even EXIST).
    //       The oracle recomputes both from the raw table: a footer
    //       count recorded wrong, a DV position double-counted, or
    //       version resolution off by one all shift the pair — hash
    //       breaks. -----
    Q("q224_metadata_count",
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_all,
             |  CAST(sum(CASE WHEN NOT (CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-12 00:00:00'
             |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-14 00:00:00')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_after
             |FROM events""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val root = dvRoot(s, dir)
        Seq((countRows(s, root, "events_log", version = 1L),
          countRows(s, root, "events_log"))).toDF("n_all", "n_after")
      })
  )
}
