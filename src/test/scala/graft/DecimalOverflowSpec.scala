package graft

import org.apache.spark.SparkThrowable
import org.apache.spark.sql.functions._

/** q178's semantics pins: what `sum(DECIMAL)` does when the result
  * precision has no headroom left (a column already at the 38-digit
  * ceiling). Three behaviors, all deliberate and mutually exclusive:
  * ANSI throws NUMERIC_VALUE_OUT_OF_RANGE, `try_sum` degrades to NULL, and
  * legacy (non-ANSI) mode nulls silently. A 100-TB pipeline must pick
  * one knowingly — silent wraparound is not among them.
  */
class DecimalOverflowSpec extends SparkSuite {

  // 9·10^35 at DECIMAL(38,2): sum type is also DECIMAL(38,2) (the +10
  // headroom rule caps at 38), whose max is <10^36 — two rows overflow.
  private def big = lit("900000000000000000000000000000000000.00").cast("decimal(38,2)")

  private def twoRows = {
    import spark.implicits._
    Seq(1, 2).toDF("i").select(big.as("v"))
  }

  private def conditions(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).collect {
      case st: SparkThrowable if st.getCondition != null => st.getCondition
    }.toSeq

  test("ANSI sum overflow throws NUMERIC_VALUE_OUT_OF_RANGE (never silent wrap)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true",
      "engine sessions run ANSI mode")
    val e = intercept[Exception] { twoRows.agg(sum(col("v"))).collect() }
    // Spark 4's condition for decimal overflow (SQLSTATE 22003)
    assert(conditions(e).exists(_.startsWith("NUMERIC_VALUE_OUT_OF_RANGE")),
      s"expected NUMERIC_VALUE_OUT_OF_RANGE in cause chain, got: ${conditions(e)} / $e")
  }

  test("try_sum degrades the same overflow to NULL") {
    val row = twoRows.agg(try_sum(col("v")).as("s")).head()
    assert(row.isNullAt(0), s"try_sum should be NULL on overflow, got $row")
  }

  test("legacy non-ANSI mode nulls the sum silently") {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val row = twoRows.agg(sum(col("v")).as("s")).head()
      assert(row.isNullAt(0), s"non-ANSI sum should be NULL on overflow, got $row")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("widened precision is the recovery: headroom restores the exact sum") {
    import spark.implicits._
    // DECIMAL(12,2) values whose sum needs >12 digits: overflow-free
    // only because sum() widens to DECIMAL(22,2); re-summing the same
    // money at DECIMAL(20,2) (→ DECIMAL(30,2)) must agree exactly.
    val df = Seq.fill(10)("99999999.99").toDF("s")
      .select(col("s").cast("decimal(12,2)").as("p12"),
        col("s").cast("decimal(20,2)").as("p20"))
    val row = df.agg(
      sum(col("p12")).cast("string").as("a"),
      sum(col("p20")).cast("string").as("b")).head()
    assert(row.getString(0) === "999999999.90")
    assert(row.getString(0) === row.getString(1))
  }
}
