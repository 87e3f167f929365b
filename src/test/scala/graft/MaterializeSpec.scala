package graft

/** Verify-mode smoke over the FULL query inventory: every query must
  * MATERIALIZE every output column, not merely survive a count().
  *
  * Why this exists: count() lets Catalyst prune computed columns, so a
  * query whose projection crashes only when evaluated (q170's ANSI cast
  * was the live case — the probe threw only when the parquet dump
  * evaluated it) can look green in bench and then fail the driver's
  * Verify dump with no CORRECTNESS row at all. The noop sink evaluates
  * the same full row surface as Verify's parquet write at a fraction of
  * the IO, so this suite fails in CI for the whole
  * benches-but-cannot-materialize class.
  */
class MaterializeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  // One test per query (not one mega-test): a failure names the query
  // directly in the report and the rest of the inventory still runs.
  SparkEntry.all.foreach { q =>
    test(s"${q.name} materializes all columns on the smoke fixture") {
      q.fn(spark, dir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache() // same per-query hygiene as Verify/Bench
    }
  }
}
