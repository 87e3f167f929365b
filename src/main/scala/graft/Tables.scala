package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One named, oracle-checked engine query (driver contract, SURVEY.md §5).
  *
  * @param name   stable query id (key in `SparkEntry.queries`)
  * @param oracle equivalent ANSI SQL for the DuckDB oracle, or None for
  *               ops whose exact output is not SQL-expressible (approx
  *               sketches, seeded sampling) — those get a rows-only check.
  * @param fn     (session, sfDir) => result DataFrame
  */
final case class Q(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

/** Catalog of the driver-generated parquet fixtures (TESTDATA.md).
  *
  * All tables are plain parquet files `<sfDir>/<name>.parquet` with
  * embedded schemas; we read them directly (columnar scan, predicate
  * pushdown and column pruning apply). `registerAll` exposes them as
  * temp views so SQL-surface queries (SURVEY.md §2.5) can run through
  * `spark.sql` with the same text the DuckDB oracle sees.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else spark.read.parquet(path(dir, name))

  /** `events.ts` must surface as TimestampType (event-time semantics —
    * watermarks and as-of joins reject TIMESTAMP_NTZ), but the driver
    * fixture's physical annotation has varied across regenerations:
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it
    *    outright; read as raw nanos-since-epoch (legacy nanosAsLong
    *    mode) and convert with integer `div` — a double division would
    *    lose precision at 2^63-scale nanos. No sub-µs component exists
    *    in the fixture, so the truncation is lossless.
    *  - TIMESTAMP(MICROS) with isAdjustedToUTC=false: arrives as
    *    TIMESTAMP_NTZ; the wall-time is UTC by fixture convention and
    *    every session pins spark.sql.session.timeZone=UTC, so a plain
    *    cast to TimestampType is the identity on the underlying micros
    *    and matches DuckDB's naive read in oracle SQL.
    *
    * Normalizing HERE (the only events entry point) keeps every
    * downstream operator vintage-independent.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, "events"))
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) vintage under nanosAsLong
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
      case TimestampNTZType => // unadjusted-µs vintage
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
      case _ => raw
    }
  }

  /** Register every fixture table as a temp view named after the table.
    * Memoized on the session's CURRENT dir (views are session-global, so
    * the memo must track the last-registered dir, not the set of dirs
    * ever seen — a set would silently leave views pointing at another
    * dir's data when a session alternates between fixture dirs).
    * Skipping only when the same dir is already registered still avoids
    * re-planning all ten reads per SQL-surface query.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = synchronized {
    if (!registered.get(spark).contains(dir)) {
      all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      registered(spark) = dir
    }
  }

  private val registered = scala.collection.mutable.Map.empty[SparkSession, String]
}
