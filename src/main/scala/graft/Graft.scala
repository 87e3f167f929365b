package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The engine's public library surface — one documented facade over the
  * operator modules, so a user of the reference
  * (`beaconfireDE/bfs-etl-sep2025`) can run every workflow it runs
  * today (stage COPY, backfills, SQL scripts, parameterized SQL, DAG
  * orchestration) plus the training-data-pipeline operators
  * (dedup, similarity search, text analysis, multimodal plumbing,
  * streaming) from a single import:
  *
  * {{{
  * import graft.Graft
  * Graft.init(spark)                           // custom exprs + fusion rule
  * val df  = Graft.copyInto(spark, stage, files)
  * val out = Graft.dedupClusters(docsWithHashes)
  * }}}
  *
  * Everything is DataFrame-in / DataFrame-out and lazily planned —
  * Catalyst sees the whole composition. The named demo queries over
  * the driver fixtures live in [[SparkEntry.queries]].
  */
object Graft {

  /** Register the engine's custom expressions (`cosine_sim`,
    * `dot_product`) and the [[graft.functions.FuseDotProduct]]
    * optimizer rule on a live session. Idempotent. */
  def init(spark: SparkSession): Unit = functions.GraftExtensions.register(spark)

  // ----- ingestion (SURVEY §2.2: stage COPY, CSV options, idempotency) -----

  /** COPY FROM stage: CSV files → typed DataFrame with the reference's
    * full file_format option set (multi-value NULL_IF, quote doubling,
    * no unenclosed escape). */
  def copyInto(spark: SparkSession, stageDir: String, files: Seq[String]): DataFrame =
    ops.Ingest.copyInto(spark, stageDir, files)

  /** COPY with Snowflake-style load-history idempotency: already-loaded
    * files are skipped; interrupted loads are repaired by dynamic
    * partition overwrite. Returns the files actually loaded. */
  def copyIntoLogged(spark: SparkSession, stageDir: String, files: Seq[String],
                     table: String, logTable: String): Seq[String] =
    ops.Ingest.copyIntoLogged(spark, stageDir, files, table, logTable)

  /** catchup=True backfill: one COPY per logical date in [start, end). */
  def backfill(spark: SparkSession, stageDir: String,
               start: java.time.LocalDate, end: java.time.LocalDate): DataFrame =
    ops.Ingest.backfill(spark, stageDir, start, end)

  /** Multi-value NULL_IF normalization over all string columns. */
  def nullIf(df: DataFrame, values: Seq[String] = Seq("NULL", "null", "")): DataFrame =
    ops.Ingest.nullIf(df, values)

  // ----- SQL execution (SURVEY §2.3: scripts, params, files) -----

  /** Quote/comment-aware multi-statement script runner (the reference's
    * `"; ".join(...)` submissions); returns the last result. */
  def runScript(spark: SparkSession, script: String): DataFrame =
    ops.Sql.runScript(spark, script)

  // ----- orchestration (SURVEY §2.1: DAG shapes as driver structure) -----

  /** Sequential stages (the `a >> b >> c` chain). */
  def sequence(input: DataFrame, stages: Seq[ops.Pipeline.Stage]): DataFrame =
    ops.Pipeline.sequence(input, stages)

  /** Fan-out / fan-in diamond over concurrent Spark jobs. */
  def fanOutFanIn(input: DataFrame, branches: Seq[DataFrame => DataFrame],
                  merge: Seq[DataFrame] => DataFrame, eager: Boolean = false)
                 (implicit ec: scala.concurrent.ExecutionContext): DataFrame =
    ops.Pipeline.fanOutFanIn(input, branches, merge, eager)

  // ----- skew & layout (100 TB structure) -----

  /** Two-phase salted aggregation for hot grouping keys. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltFrom: Seq[String],
                      partials: Map[String, (Column, Column => Column)],
                      buckets: Int = 16): DataFrame =
    ops.Skew.saltedAggregate(df, keys, saltFrom, partials, buckets)

  /** Salted fact ⋈ replicated-dim join for known key skew. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFrom: Seq[String], buckets: Int = 16,
                 joinType: String = "inner"): DataFrame =
    ops.Skew.saltedJoin(fact, dim, key, saltFrom, buckets, joinType)

  /** Write a bucketed table; later equi-joins on `key` plan with zero
    * exchanges (amortized shuffle). */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
                    key: String, buckets: Int = 8): Unit =
    ops.Bucketing.writeBucketed(spark, df, table, key, buckets)

  /** Rewrite a table Z-ordered on two scaled dimensions so parquet
    * row-group stats prune on BOTH columns ([[ops.Layout.grid16]]
    * scales raw values to the 16-bit grid). */
  def writeZordered(df: DataFrame, aCol: Column, bCol: Column,
                    nFiles: Int, path: String): Unit =
    ops.Layout.writeZordered(df, aCol, bCol, nFiles, path)

  /** Compact a parquet directory's small files to ~targetBytes files
    * (returns the new file count; non-atomic swap — see scaladoc). */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L << 20): Int =
    ops.Layout.compact(spark, dir, targetBytes)

  /** Snapshot diff (CDC): classify every key across two snapshots as
    * insert / delete / update on the tracked columns, dropping the
    * unchanged majority inside the one full-outer join. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
                   tracked: Seq[String]): DataFrame =
    ops.Cdc.snapshotDiff(oldSnap, newSnap, key, tracked)

  /** Left as-of join through the engine's custom physical operator
    * (`plans.AsOfJoinExec`): each left row gains the latest right row
    * with the same key at-or-before its timestamp — one co-partitioned
    * forward merge per partition, no range-join candidate blowup.
    * Requires `Graft.init(spark)` (registers the planner strategy);
    * keys BIGINT, timestamps TIMESTAMP, disjoint column names. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               tolerance: Option[java.time.Duration] = None,
               direction: String = "backward"): DataFrame =
    plans.AsOfJoinApi.asofJoin(left, right, leftKey, rightKey, leftTs, rightTs,
      tolerance, direction)

  /** Bounded-heap per-group top-k typed aggregation column (map-side
    * partial: ≤k rows per group per partition cross the shuffle). */
  def topK(k: Int): org.apache.spark.sql.TypedColumn[(Long, Double), Seq[(Double, Long)]] =
    functions.TopKAggregator.topK(k)

  // ----- text / dedup (SURVEY §2.9) -----

  /** Per-row DISTINCT k-shingle 56-bit hash sets over a text column
    * (one md5 per shingle; all downstream dedup works on ints). */
  def shingleHashSets(docs: DataFrame, textCol: String, keep: Seq[String],
                      k: Int = 3): DataFrame =
    ops.Text.shingleHashSets(docs, textCol, keep, k)

  /** Xor-permutation minhash signature columns (mh1..mh6) over the
    * `hashes` column produced by [[shingleHashSets]]. */
  def minhashCols: Seq[Column] = ops.Text.mhCols

  /** Connected components of an undirected edge list (`src`, `dst`) via
    * iterative min-label propagation — closes near-dup candidate PAIRS
    * into whole CLUSTERS (rounds bounded by cluster diameter; one
    * id-keyed shuffle per round, per-round `localCheckpoint` keeps the
    * plan O(1); no driver-side graph state). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame =
    ops.Graph.connectedComponents(edges, maxIter)

  /** Canonical selection after clustering: keep the best-scoring member
    * of each cluster (score DESC, id tiebreak) — what a dedup pipeline
    * actually ships. `components` = (`id`, `component`) from
    * [[connectedComponents]]; `scored` = (idCol, scoreCol). */
  def keepBestPerCluster(components: DataFrame, scored: DataFrame,
                         idCol: String = "doc_id",
                         scoreCol: String = "score"): DataFrame =
    ops.Text.keepBestPerCluster(components, scored, idCol, scoreCol)

  // ----- corpus engineering (SURVEY §2.9: sampling, splits, packing) -----

  /** Deterministic percent-hash in [0,100) from a salted md5 of `keyCol`
    * — the reproducible-decision primitive behind stratified sampling
    * and train/val/test splits (pure function of the key: stable across
    * runs, machines, and data layout; the predicate pushes to the scan). */
  def hashPercent(keyCol: Column, salt: String): Column =
    ops.Corpus.hashPercent(keyCol, salt)

  /** Hash-based train/val/test split assignment (default 90/5/5). */
  def splitAssign(keyCol: Column, salt: String = "spl",
                  trainPct: Int = 90, valPct: Int = 5): Column =
    ops.Corpus.splitAssign(keyCol, salt, trainPct, valPct)

  /** Content-defined chunking: variable-length chunks whose boundaries
    * are a pure function of the content (geometric, mean ~16 words) —
    * shift-robust chunk dedup where fixed windows lose alignment after
    * one edit. Returns (id, chunk, chunk_text). */
  def cdcChunks(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    ops.Curation.cdcChunks(docs, idCol, textCol)

  /** n-token shingle hashes per document as 56-bit BIGINT keys (one
    * (id, gram) row each, distinct per doc) — the join currency for
    * cross-split decontamination and overlap screens. */
  def gramHashes(docs: DataFrame, n: Int = 8, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    ops.Curation.gramHashes(docs, n, idCol, textCol)

  // ----- pipeline auditing (SURVEY §2.7) -----

  /** Write `df` through `sink` with aggregate audit metrics observed on
    * that SAME pass (`observe()` — no second scan); returns the
    * collected metrics after the action completes. */
  def auditedWrite(df: DataFrame, metrics: Seq[Column],
                   sink: DataFrame => Unit =
                     _.write.format("noop").mode("overwrite").save()): Map[String, Any] =
    ops.Quality.auditedWrite(df, metrics, sink)

  // ----- multimodal ingestion (SURVEY §2.9) -----

  /** Ingest a media directory via the `binaryFile` source (opaque
    * bytes + typed metadata; `glob` prunes at file listing). */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    ops.Multimodal.readBinaryDir(spark, dir, glob)

  // ----- similarity search (SURVEY §2.9) -----

  /** Attach per-row L2 norm and sign-LSH bucket to any `array<float>`
    * embedding column; `hyperplanes(n, dims)` sizes the bucket space. */
  def withNormAndBucket(df: DataFrame, embCol: String,
                        hp: Array[Array[Double]] = ops.Similarity.hpSigns): DataFrame =
    ops.Similarity.withNormAndBucket(df, embCol, hp)

  /** Deterministic ±1 hyperplane matrix for [[withNormAndBucket]]. */
  def hyperplanes(nPlanes: Int, nDims: Int, seed: Long = 42L): Array[Array[Double]] =
    ops.Similarity.hyperplanes(nPlanes, nDims, seed)

  /** Corpus-sized LSH plane count: smallest even p with
    * n ≤ target·2^p — keeps expected bucket occupancy ≤ `target` as
    * the corpus grows (pass to [[hyperplanes]]/[[withNormAndBucket]]). */
  def autoPlanes(n: Long, target: Long = 64L): Int =
    ops.Similarity.autoPlanes(n, target)

  /** Mergeable SimHash aggregation over 64-bit token hashes: partial
    * state is 65 ints per group regardless of token count, so
    * signatures built per partition/file/day roll up losslessly. */
  def simhashAgg: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(functions.SimHashAgg)

  // ----- streaming (SURVEY §2.8) -----

  /** Incremental file-source stream over a stage directory. */
  def fileStream(spark: SparkSession, dir: String,
                 schema: org.apache.spark.sql.types.StructType,
                 format: String = "parquet"): DataFrame =
    streaming.Streams.fileStream(spark, dir, schema, format)

  /** Exactly-once-style parquet sink (idempotent per micro-batch). */
  def foreachBatchSink(sdf: DataFrame, outDir: String, checkpoint: String): StreamingQuery =
    streaming.Streams.foreachBatchSink(sdf, outDir, checkpoint)

  // ----- table format: the snapshot-manifest commit log -----
  // Every commit claims its version via CAS (atomic non-replacing
  // rename), appends/replaces write O(delta) ops-log manifests with an
  // automatic full fold, readers resolve pointer/claims → explicit
  // file lists. See [[ops.Manifest]] for the protocol doc.

  /** Commit tables as ONE atomic multi-table snapshot (overwrite). */
  def tableCommit(spark: SparkSession, root: String,
                  tables: Map[String, DataFrame]): Long =
    ops.Manifest.commit(spark, root, tables)

  /** Append-commit new data (O(delta) data AND metadata). */
  def tableAppend(spark: SparkSession, root: String, table: String,
                  df: DataFrame): Long =
    ops.Manifest.commitAppend(spark, root, table, df)

  /** Append with per-file [min, max] stats for `statsCols`, files
    * range-partitioned on `rangeCol` — the prunable-ingest path. */
  def tableAppendStats(spark: SparkSession, root: String, table: String,
                       df: DataFrame, statsCols: Seq[String],
                       rangeCol: String, nFiles: Int): Long =
    ops.Manifest.commitAppendStats(spark, root, table, df, statsCols, rangeCol, nFiles)

  /** Append laid on the 2-D Morton curve with stats on BOTH columns —
    * either dimension (or both) prunes subsequent reads. */
  def tableAppendZordered(spark: SparkSession, root: String, table: String,
                          df: DataFrame, aCol: String, bCol: String,
                          nFiles: Int): Long =
    ops.Manifest.commitAppendZordered(spark, root, table, df, aCol, bCol, nFiles)

  /** Schema-enforced append; `allowEvolution` registers the union
    * schema (per-table registry, at-or-below fallback). */
  def tableAppendEvolve(spark: SparkSession, root: String, table: String,
                        df: DataFrame, allowEvolution: Boolean = false): Long =
    ops.Manifest.commitAppendEvolve(spark, root, table, df, allowEvolution)

  /** Replace a table's file set in one commit (validated against
    * `expectedFiles` when the rewrite must not race an append). */
  def tableReplace(spark: SparkSession, root: String, table: String,
                   df: DataFrame): Long =
    ops.Manifest.commitReplace(spark, root, table, df)

  /** OPTIMIZE: bin-pack the table's files as one replace-commit;
    * concurrent appends force a recompute, never a lost update. */
  def tableCompact(spark: SparkSession, root: String, table: String,
                   targetBytes: Long = 128L << 20): Long =
    ops.Manifest.compactTable(spark, root, table, targetBytes)

  /** Stats-pruned DELETE: rewrite only the files whose stats overlap
    * `preds`, dropping rows matching `deleteFilter` — O(affected). */
  def tableDeleteWhere(spark: SparkSession, root: String, table: String,
                       preds: Seq[ops.Manifest.Pred],
                       deleteFilter: Column): Long =
    ops.Manifest.commitDeleteWhere(spark, root, table, preds, deleteFilter)

  /** MERGE upsert: replace same-key rows and insert new keys in one
    * atomic delta commit, touching only key-stats-overlapping files. */
  def tableMergeUpsert(spark: SparkSession, root: String, table: String,
                       updates: DataFrame, keyCol: String): Long =
    ops.Manifest.commitMergeUpsert(spark, root, table, updates, keyCol)

  /** Read a table at a version (default: current snapshot). */
  def tableRead(spark: SparkSession, root: String, table: String,
                version: Long = -1L): DataFrame =
    ops.Manifest.readTable(spark, root, table, version)

  /** Stats-pruned read under a conjunction of range predicates;
    * returns (relation, files read, files total). */
  def tableReadPruned(spark: SparkSession, root: String, table: String,
                      preds: Seq[ops.Manifest.Pred],
                      version: Long = -1L): (DataFrame, Int, Int) =
    ops.Manifest.readTablePruned(spark, root, table, preds, version)

  /** Read with the REGISTERED schema pinned (evolved tables: old files
    * NULL-fill, no footer merge). */
  def tableReadEvolved(spark: SparkSession, root: String, table: String): DataFrame =
    ops.Manifest.readTableEvolved(spark, root, table)

  /** Current committed snapshot version (0 = none). */
  def tableVersion(root: String): Long = ops.Manifest.snapshotVersion(root)

  /** Retention: keep the newest `keep` snapshots, delete expired
    * manifests and unreferenced data files; `graceMs` protects
    * in-flight commits under concurrent writers (safe-by-default: the
    * 10-minute window — pass 0 only when no writer can be racing). */
  def tableVacuum(spark: SparkSession, root: String, keep: Int,
                  graceMs: Long = ops.Manifest.defaultVacuumGraceMs): (Int, Int) =
    ops.Manifest.vacuum(spark, root, keep, graceMs)

  /** Expose a manifest table to `spark.sql`: registers `viewName` over
    * a data-skipping FileIndex, so verbatim SQL text gets file-level
    * stats pruning inside Catalyst's planning (and optional time
    * travel via `version`). Returns the index (its `lastPrune` is the
    * (kept, total) observability hook). */
  def tableRegisterSql(spark: SparkSession, root: String, table: String,
                       viewName: String, version: Long = -1L): sources.ManifestFileIndex =
    sources.ManifestSql.register(spark, root, table, viewName, version)

  /** Ship the current snapshot to a fresh root (checksummed, orphans
    * excluded, committed as v1 there). */
  def tableExport(spark: SparkSession, root: String, destRoot: String): (Int, Long) =
    ops.Manifest.exportSnapshot(spark, root, destRoot)

  /** Incremental DR sync: bring a replica (bootstrapped by
    * [[tableExport]] semantics on first call) up to the source's
    * current snapshot, shipping only the changed files — exactly-once
    * via the replica txn ledger. Returns (files copied, bytes). */
  def tableReplicate(spark: SparkSession, root: String, destRoot: String): (Int, Long) =
    ops.Manifest.replicateSnapshot(spark, root, destRoot)

  /** Rows ADDED to `table` in versions (from, to] — incremental
    * consumption at file granularity. The flag is false when the
    * interval contains a rewrite (consumer must full-refresh). */
  def tableChanges(spark: SparkSession, root: String, table: String,
                   fromVersion: Long, toVersion: Long = -1L): (DataFrame, Boolean) =
    ops.Manifest.tableChanges(spark, root, table, fromVersion, toVersion)

  /** foreachBatch handler: micro-batch → versioned manifest commit
    * (redelivery no-op, batch-id gap throws; event-time batches record
    * ts stats so the streaming table is range-prunable). */
  def streamingTableCommit(batch: DataFrame, root: String, batchId: Long): Unit =
    streaming.Streams.commitBatchToManifest(batch, root, batchId)

  /** Every row the interval's commits inserted or deleted, tagged
    * `_change_type`/`_commit_version` (UPDATE = delete+insert pair) —
    * the row-level CDC feed, derived from the log with no writer
    * cooperation. */
  def tableChangeFeed(spark: SparkSession, root: String, table: String,
                      fromVersion: Long, toVersion: Long = -1L): DataFrame =
    ops.Manifest.readChangeFeed(spark, root, table, fromVersion, toVersion)

  /** RESTORE the table to a prior snapshot's file set, as a new
    * metadata-only commit (history preserved; vacuumed snapshots
    * refuse loudly). */
  def tableRestore(spark: SparkSession, root: String, table: String,
                   toVersion: Long): Long =
    ops.Manifest.commitRestore(spark, root, table, toVersion)

  /** Metadata-only `count(*)` at any version: Σ footer row counts −
    * DV'd positions; stat-less vintage files are scanned, never
    * guessed. */
  def tableCount(spark: SparkSession, root: String, table: String,
                 version: Long = -1L): Long =
    ops.Manifest.countRows(spark, root, table, version)

  /** Immutable named snapshot ref; tagged snapshots survive vacuum
    * until dropped. */
  def tableTag(root: String, name: String, version: Long = -1L): Long =
    ops.Manifest.createTag(root, name, version)

  def tableDropTag(root: String, name: String): Unit =
    ops.Manifest.dropTag(root, name)

  def tableReadTag(spark: SparkSession, root: String, table: String,
                   tag: String): DataFrame =
    ops.Manifest.readTableTag(spark, root, table, tag)

  /** `TIMESTAMP AS OF`: read the newest snapshot committed at or
    * before a wall-clock instant (ms epoch). */
  def tableReadAsOf(spark: SparkSession, root: String, table: String,
                    tsMillis: Long): DataFrame =
    ops.Manifest.readTableAsOf(spark, root, table, tsMillis)

  /** Register a CHECK constraint; every subsequent write on any path
    * validates its published files before the claim (ANSI NULL-passes
    * semantics). */
  def tableAddCheck(spark: SparkSession, root: String, table: String,
                    name: String, exprText: String): Unit =
    ops.Manifest.addCheckConstraint(spark, root, table, name, exprText)

  def tableDropCheck(root: String, table: String, name: String): Unit =
    ops.Manifest.dropCheckConstraint(root, table, name)

  /** Merge-on-read row DML: O(matched rows) write cost, rewrite
    * deferred to the next compaction. */
  def tableDeleteVectors(spark: SparkSession, root: String, table: String,
                         deleteFilter: Column): Long =
    ops.Manifest.commitDeleteVectors(spark, root, table, deleteFilter)

  def tableUpdateVectors(spark: SparkSession, root: String, table: String,
                         updateFilter: Column, sets: Map[String, Column]): Long =
    ops.Manifest.commitUpdateVectors(spark, root, table, updateFilter, sets)

  /** Verbatim SQL DML (DELETE / UPDATE / MERGE INTO) over manifest
    * tables — the arbitrary-SQL surface for writes. */
  def runDml(spark: SparkSession, root: String, script: String): DataFrame =
    sources.ManifestSql.runDml(spark, root, script)

  /** The commit log as a streaming SOURCE: each committed version
    * interval arrives as a micro-batch, exactly-once across
    * restarts; `maxVersionsPerTrigger` bounds backfills. */
  def readStreamTable(spark: SparkSession, root: String, table: String,
                      maxVersionsPerTrigger: Option[Long] = None,
                      ignoreChanges: Boolean = false): DataFrame = {
    var r = spark.readStream.format("graft-manifest")
      .option("root", root).option("table", table)
      .option("ignoreChanges", ignoreChanges.toString)
    maxVersionsPerTrigger.foreach(n =>
      r = r.option("maxVersionsPerTrigger", n.toString))
    r.load()
  }

  /** CDC mirror: maintain dst as the key-wise mirror of src, driven
    * by the change feed — net-per-key, exactly-once across
    * re-drives. */
  def applyChangesInto(spark: SparkSession, srcRoot: String, srcTable: String,
                       dstRoot: String, dstTable: String,
                       keyCol: String): Option[(Long, Long)] =
    ops.Manifest.applyChangesInto(spark, srcRoot, srcTable, dstRoot, dstTable, keyCol)
}