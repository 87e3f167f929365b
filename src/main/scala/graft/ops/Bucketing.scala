package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location (SURVEY.md scale notes): pre-shuffle a
  * fact and its join peer into the same bucket layout once at write
  * time, and every subsequent equi-join on the bucket key plans with
  * ZERO exchanges — the shuffle is amortized across all future reads.
  * This is the primary repeated-join strategy at 100 TB (the other is
  * broadcast, for dims small enough to ship).
  */
object Bucketing {

  /** Write `df` as a managed bucketed table on `key` (drops any stale
    * table/location first — same re-runnability contract as
    * [[Sql.dropTable]]). */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
                    key: String, buckets: Int = 8): Unit = {
    Sql.dropTable(spark, table)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Create the bucketed table only if it doesn't exist yet — the
    * amortization IS the point: the one-time layout shuffle is paid at
    * first use, and every later join on the key reads it shuffle-free.
    * `df` is by-name so an existing table costs no plan work. Callers
    * must key the table name to the source dataset (q107 appends a
    * fixture-dir tag) so layouts from different datasets never alias. */
  def ensureBucketed(spark: SparkSession, df: => DataFrame, table: String,
                     key: String, buckets: Int = 8): Unit =
    if (!spark.catalog.tableExists(table))
      writeBucketed(spark, df, table, key, buckets)

  /** Join two co-bucketed tables on their bucket key. The plan must
    * contain no Exchange on either side (asserted in BucketingSpec). */
  def cobucketedJoin(spark: SparkSession, left: String, right: String,
                     key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** Same, for sides whose bucket columns carry different names (the
    * usual fact ⋈ dim shape, e.g. `o_custkey = c_custkey`): each side
    * must be bucketed on its OWN join key with the same bucket count. */
  def cobucketedJoin(spark: SparkSession, left: String, leftKey: String,
                     right: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
