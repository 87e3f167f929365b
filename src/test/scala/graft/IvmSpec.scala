package graft

import graft.ops.{Manifest, Views}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Row-level incremental view maintenance (q277): the counting
  * algorithm over the change feed — signed weights, vanishing
  * zero-count groups, cancellation of a compaction's relocate pairs —
  * stays incremental through intervals the file-granular path must
  * full-refresh.
  */
class IvmSpec extends SparkSuite {

  import spark.implicits._

  private def roots(): (String, String) = {
    val t = Files.createTempDirectory("graft-ivm-spec").toString
    (s"$t/src", s"$t/dst")
  }

  private def refresh(src: String, dst: String) =
    Views.refreshAggFromFeed(spark, src, "t", dst, "mv", "ivm-spec",
      Seq("k"))(f => f.select(col("k"),
      col("v").cast("decimal(18,4)").as("v"), col("_w")))

  private def mvOf(dst: String): Map[Long, (BigDecimal, Long)] =
    Manifest.readTable(spark, dst, "mv").collect()
      .map(r => r.getLong(0) ->
        ((BigDecimal(r.getDecimal(1)), r.getLong(2)))).toMap

  test("IVM folds deletes, updates, and compaction; zero groups vanish") {
    val (src, dst) = roots()
    Manifest.commitAppendStats(spark, src, "t",
      Seq((1L, 1.0), (1L, 2.0), (2L, 5.0), (3L, 7.0))
        .toDF("k", "v").withColumn("v", col("v").cast("decimal(18,4)")),
      Seq("k"), "k", 2)
    assert(refresh(src, dst).isDefined)
    assert(mvOf(dst) == Map(1L -> ((BigDecimal(3.0), 2L)),
      2L -> ((BigDecimal(5.0), 1L)), 3L -> ((BigDecimal(7.0), 1L))))
    // delete k=2 entirely (group must VANISH), update k=3, and a
    // compaction whose relocate pairs must cancel — one refresh
    Manifest.commitDeleteVectors(spark, src, "t", expr("k = 2"))
    Manifest.commitUpdateVectors(spark, src, "t", expr("k = 3"),
      Map("v" -> expr("CAST(v + 1.5 AS DECIMAL(18,4))")))
    Manifest.compactTable(spark, src, "t", 128L << 20)
    assert(refresh(src, dst).isDefined)
    assert(mvOf(dst) == Map(1L -> ((BigDecimal(3.0), 2L)),
      3L -> ((BigDecimal(8.5), 1L))), mvOf(dst).toString)
    // current: third refresh is a ledger no-op
    assert(refresh(src, dst).isEmpty)
    // the MV equals a direct recompute of the current table state
    val direct = Manifest.readTable(spark, src, "t")
      .groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) ->
        ((BigDecimal(r.getDecimal(1)), r.getLong(2)))).toMap
    assert(direct == mvOf(dst))
  }
}
