package graft

import graft.ops.Manifest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Exactly-once incremental consumption (q213): ledger-driven sync of
  * a derived table from the source commit log — O(delta) appends for
  * pure intervals, automatic full refresh across rewrites, no-op
  * re-drives, loud failure on a reset source log.
  */
class ConsumeSpec extends SparkSuite {

  import spark.implicits._

  private def roots(): (String, String) = {
    val t = Files.createTempDirectory("graft-consume-spec").toString
    (s"$t/src", s"$t/dst")
  }

  private def kv(rows: (Long, Double)*): DataFrame = rows.toDF("k", "v")

  private val double2x: DataFrame => DataFrame =
    df => df.select(col("k"), (col("v") * 2).as("v2"))

  private def dstVals(dst: String): Map[Long, Double] =
    Manifest.readTable(spark, dst, "m")
      .select("k", "v2").as[(Long, Double)].collect().toMap

  test("bootstrap, pure append, re-drive no-op, rewrite refresh") {
    val (src, dst) = roots()
    def sync() = Manifest.consumeInto(spark, src, "t", dst, "m", "app")(double2x)

    Manifest.commitAppend(spark, src, "t", kv(1L -> 1.0))
    val s1 = sync()
    assert(s1.map(r => (r._1, r._3)) == Some((1L, true)))
    assert(dstVals(dst) == Map(1L -> 2.0))

    Manifest.commitAppend(spark, src, "t", kv(2L -> 2.0))
    val s2 = sync()
    assert(s2.exists(_._3), "append interval must take the pure path")
    assert(dstVals(dst) == Map(1L -> 2.0, 2L -> 4.0))

    assert(sync().isEmpty, "re-driven sync must no-op")
    assert(dstVals(dst) == Map(1L -> 2.0, 2L -> 4.0))

    // a rewrite (row 1 purged): impure interval, full refresh
    Manifest.commitReplace(spark, src, "t", kv(2L -> 2.0, 3L -> 3.0))
    val s3 = sync()
    assert(s3.exists(!_._3), "rewrite interval must take the refresh path")
    assert(dstVals(dst) == Map(2L -> 4.0, 3L -> 6.0))
  }

  test("consumer ledger ahead of a reset source log fails loudly") {
    val (src, dst) = roots()
    Manifest.commitAppend(spark, src, "t", kv(1L -> 1.0))
    Manifest.commitAppend(spark, src, "t", kv(2L -> 2.0))
    val _ = Manifest.consumeInto(spark, src, "t", dst, "m", "app")(double2x)
    // a fresh (reset) source root at a lower version than the ledger
    val freshSrc = Files.createTempDirectory("graft-consume-reset").toString
    Manifest.commitAppend(spark, freshSrc, "t", kv(9L -> 9.0))
    intercept[IllegalArgumentException] {
      Manifest.consumeInto(spark, freshSrc, "t", dst, "m", "app")(double2x)
    }
  }

  test("q213 staged root: mirror equals the transformed post-purge source") {
    val sfDir = "/root/testdata/sf0.001"
    val root = Manifest.consumeRoot(spark, sfDir)
    val mirror = Manifest.readTable(spark, s"$root/dst", "events_mirror")
    val src = Manifest.readTable(spark, s"$root/src", "events_log")
    assert(mirror.count() == src.count())
    // the transform really applied (no lowercase leaks into the mirror)
    assert(mirror.filter(col("event_type_u") =!= upper(col("event_type_u")))
      .count() == 0L)
  }
}
