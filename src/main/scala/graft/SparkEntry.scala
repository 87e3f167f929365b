package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * Each module under `graft.ops` contributes a list of named,
  * oracle-checked queries (`graft.Q`); this object is the flat registry
  * the driver's Verify/Bench mains consume.
  */
object SparkEntry {

  /** Full inventory, grouped by SURVEY.md §2 category. */
  def all: Seq[Q] =
    Relational.queries ++ RelationalX.queries ++ RelationalY.queries ++
      Ingest.queries ++ Sql.queries ++ Pipeline.queries ++ Text.queries ++
      Corpus.queries ++ Training.queries ++ Similarity.queries ++
      Windows.queries ++ Multimodal.queries ++ ScaleOps.queries ++
      Cdc.queries ++ Analytics.queries ++ Quality.queries ++ Curation.queries ++
      Compaction.queries ++ Lifecycle.queries ++ Stats.queries ++
      Manifest.queries ++ graft.sources.ManifestSql.queries ++
      Governance.queries ++ Views.queries ++
      graft.streaming.StreamQueries.queries

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_top_revenue_orders")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
