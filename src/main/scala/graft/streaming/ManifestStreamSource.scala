package graft.streaming

import graft.ops.Manifest
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** The commit log as a STRUCTURED STREAMING SOURCE — the Delta/Iceberg
  * streaming-source analogue: `spark.readStream.format("graft-manifest")
  * .option("root", …).option("table", …).load()` serves each new
  * committed version's ADDED files as micro-batch input, exactly once,
  * resuming from the checkpoint across restarts.
  *
  * Offset model: `LongOffset(v)` means "all versions ≤ v served". The
  * engine polls [[ManifestStreamSource.getOffset]] (one pointer read +
  * claim listing — metadata-sized), and each batch is the file-set
  * difference `tableChanges((from, to])` — O(delta) planning and
  * O(delta) read I/O, never a rescan of table history. At 100 TB the
  * source's steady-state cost is exactly the new files' bytes, the
  * same contract as the batch consumer (q213) — this is that loop
  * expressed as a first-class `readStream` so watermarks, stateful
  * operators, and checkpointed sinks compose downstream.
  *
  * Rewrite intervals: a version span containing a compaction / DELETE /
  * MERGE / DV commit is NOT append-pure — its added files re-carry
  * surviving rows, and a consumer that read them as new data would
  * double-count. Default behavior is to FAIL LOUDLY (the Delta
  * `ignoreChanges` contract); `option("ignoreChanges", "true")` opts
  * into serving the interval's added files anyway, documenting that
  * rewritten survivors re-emit (downstream must be idempotent by key).
  *
  * V1 `Source` API by design: `getBatch` answers with a DataFrame over
  * exactly the delta's parquet files (re-wrapped streaming via
  * [[org.apache.spark.sql.GraftDatasetFactory.asStreaming]]), so the
  * scan, filters, and codegen are stock Spark — a DSv2 port would
  * re-implement the parquet reader for no semantic gain.
  */
class ManifestSourceProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {
  override def shortName: String = "graft-manifest"

  /** The WRITE half of the same format: `writeStream.format(
    * "graft-manifest")` commits each micro-batch to the table through
    * the exactly-once ledger ([[Streams.commitBatchToManifest]]:
    * `_txn_` marker atomic with the rows, redeliveries no-op, id gaps
    * throw) — so source and sink compose into a commit-log-to-
    * commit-log pipeline with end-to-end exactly-once and no
    * foreachBatch user code. */
  override def createSink(ctx: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    val root = parameters.getOrElse("root",
      throw new IllegalArgumentException("graft-manifest sink: missing option 'root'"))
    val table = parameters.getOrElse("table",
      throw new IllegalArgumentException("graft-manifest sink: missing option 'table'"))
    require(partitionColumns.isEmpty,
      "graft-manifest sink: partitionBy is not supported (layout comes from the table)")
    require(outputMode == OutputMode.Append(),
      s"graft-manifest sink: only Append output mode is supported, got $outputMode")
    val appId = parameters.getOrElse("appId", s"sink-$table")
    new ManifestStreamSink(root, table, appId)
  }

  private def schemaFor(spark: SparkSession,
                        parameters: Map[String, String]): StructType = {
    val root = parameters.getOrElse("root",
      throw new IllegalArgumentException("graft-manifest source: missing option 'root'"))
    val table = parameters.getOrElse("table",
      throw new IllegalArgumentException("graft-manifest source: missing option 'table'"))
    val v = Manifest.snapshotVersion(root)
    require(v > 0, s"graft-manifest source: no committed snapshot at $root")
    val base = Manifest.readTable(spark, root, table, v).schema
    if (parameters.get("readChangeFeed").exists(_.toBoolean))
      base.add("_change_type", org.apache.spark.sql.types.StringType,
          nullable = false)
        .add("_commit_version", org.apache.spark.sql.types.LongType,
          nullable = false)
    else base
  }

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName, schema.getOrElse(schemaFor(ctx.sparkSession, parameters)))

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new ManifestStreamSource(ctx.sparkSession,
      parameters("root"), parameters("table"),
      schema.getOrElse(schemaFor(ctx.sparkSession, parameters)),
      ignoreChanges = parameters.get("ignoreChanges").exists(_.toBoolean),
      maxVersionsPerTrigger = parameters.get("maxVersionsPerTrigger").map(_.toLong),
      readChangeFeed = parameters.get("readChangeFeed").exists(_.toBoolean),
      metadataPath = metadataPath)
}

/** V1 sink over [[Streams.commitBatchToManifest]]: each addBatch is
  * one ledgered manifest commit. */
class ManifestStreamSink(root: String, table: String, appId: String)
    extends Sink {
  override def addBatch(batchId: Long,
                        data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): Unit =
    Streams.commitBatchToManifest(
      org.apache.spark.sql.GraftDatasetFactory.asBatch(data.toDF()),
      root, batchId, appId, table)
  override def toString: String = s"ManifestStreamSink[$root::$table]"
}

class ManifestStreamSource(spark: SparkSession, root: String, table: String,
                           override val schema: StructType,
                           ignoreChanges: Boolean,
                           maxVersionsPerTrigger: Option[Long] = None,
                           readChangeFeed: Boolean = false,
                           metadataPath: String = "")
    extends Source {

  maxVersionsPerTrigger.foreach(n => require(n > 0,
    s"maxVersionsPerTrigger must be positive, got $n"))

  // Highest version already handed out via getBatch — the anchor the
  // rate limit caps against. PERSISTED under the source's own
  // checkpoint dir (the FileStreamSource pattern): after a restart
  // whose last batch COMMITTED, the engine asks getOffset before any
  // getBatch, and an unpersisted anchor would cap BELOW the
  // checkpointed start — an inverted interval. An anchor slightly
  // ahead of the checkpoint (crash between anchor write and offset
  // commit) only widens one batch, never loses data.
  private def anchorFile: Option[java.nio.file.Path] =
    if (metadataPath.isEmpty) None
    else Some(java.nio.file.Paths.get(
      java.net.URI.create(metadataPath).getPath match {
        case p if p.nonEmpty => p
        case _ => metadataPath
      }).resolve("_graft_served"))
  @volatile private var served: Long = {
    val fromDisk = anchorFile.filter(java.nio.file.Files.exists(_)).map(p =>
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim.toLong)
    fromDisk.getOrElse(-1L)
  }
  private def persistServed(v: Long): Unit = anchorFile.foreach { p =>
    try {
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, v.toString.getBytes("UTF-8"))
    } catch { case _: java.io.IOException => () } // best-effort cache
  }

  private def version(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  /** Newest committed version at which `table` exists — metadata-sized
    * (pointer read + claim listing + manifest resolution); None while
    * the table has not yet appeared, so the stream idles instead of
    * failing. With `maxVersionsPerTrigger` the offset is CAPPED at
    * served + N, so a backfill over a long history arrives as bounded
    * micro-batches (Delta's maxFilesPerTrigger, at version
    * granularity) instead of one giant catch-up batch. */
  override def getOffset: Option[OffsetV1] = {
    val v = Manifest.snapshotVersion(root)
    if (v <= 0) None
    else {
      val want = maxVersionsPerTrigger match {
        case Some(n) if served >= 0 => math.min(v, served + n)
        case Some(n) => math.min(v, n)
        case None => v
      }
      // round DOWN to a readable snapshot: the cap may land on a
      // crashed writer's unreadable claim number
      val capped = Manifest.readableAtOrBelow(root, want)
      if (capped > 0 &&
          Manifest.manifestRows(spark, root, capped).exists(_._1 == table))
        Some(LongOffset(capped))
      else if (capped > 0)
        // the table first appears ABOVE the cap (earlier versions
        // belong to other tables): jump forward to its first
        // appearance, else the cap never rises and the stream stalls
        Manifest.firstVersionWith(spark, root, table, capped)
          .filter(_ <= v).map(LongOffset.apply)
      else None
    }
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(version).getOrElse(0L)
    val to = version(end)
    if (to > served) { served = to; persistServed(to) } // rate-limit anchor
    import org.apache.spark.sql.functions.col
    // CDF mode: serve ROW-LEVEL change rows — rewrites stream as their
    // exact delete/insert pairs instead of refusing (Delta's
    // readChangeFeed streaming contract); appends and DV steps stay
    // O(delta) / O(matched)
    if (readChangeFeed)
      return org.apache.spark.sql.GraftDatasetFactory.asStreaming(
        Manifest.readChangeFeed(spark, root, table, from, to)
          .select(schema.fieldNames.toIndexedSeq.map(col): _*))
    val (delta, pureAppend) =
      Manifest.tableChanges(spark, root, table, from, to)
    if (!pureAppend && !ignoreChanges)
      throw new IllegalStateException(
        s"graft-manifest source: versions ($from, $to] of $table contain a " +
          "rewrite (compaction/DELETE/MERGE/DV) — added files would re-emit " +
          "surviving rows. Full-refresh downstream, stream the row-level " +
          "feed with option(\"readChangeFeed\", \"true\"), or opt in with " +
          "option(\"ignoreChanges\", \"true\") and make the sink idempotent by key.")
    // project to the pinned source schema (evolved readers NULL-fill),
    // then re-wrap streaming — getBatch's contract
    org.apache.spark.sql.GraftDatasetFactory.asStreaming(
      delta.select(schema.fieldNames.toIndexedSeq.map(col): _*))
  }

  override def commit(end: OffsetV1): Unit = () // checkpoint owns progress
  override def stop(): Unit = ()
  override def toString: String = s"ManifestStreamSource[$root::$table]"
}
