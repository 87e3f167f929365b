package graft

import graft.ops.Manifest
import org.apache.spark.sql.functions._

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Parity of the two per-file stats collection mechanisms: the parquet
  * FOOTER path (the commit's primary, zero extra data I/O) must record
  * byte-identical stats_json to the Spark read-back pass it replaced —
  * the prune layer casts these strings back, so any rendering drift
  * (timestamp fractions, decimal scale, zone) would silently change
  * which files a predicate prunes.
  */
class FooterStatsSpec extends SparkSuite {

  private def statsOf(root: String): Map[String, String] =
    Manifest.manifestRows(spark, root, Manifest.snapshotVersion(root))
      .map { case (_, f, st) => f -> st }.toMap

  test("footer stats match the Spark read-back pass on all fixture types") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-footer-spec").toString
    val df = Seq(
      (1L, "2024-01-02 03:04:05.123456", "12.345", 1.5, "2024-01-02"),
      (2L, "2024-01-02 03:04:05.100", "-7.001", -0.25, "2024-02-29"),
      (3L, "2024-03-01 00:00:00", "0.000", 1e-7, "2023-12-31"),
      (4L, "2024-06-30 23:59:59.999999", "99999.999", 4.0E10, "2024-07-01"))
      .toDF("k", "s", "dec", "x", "ds")
      .select(col("k"), col("s").cast("timestamp").as("ts"),
        col("dec").cast("decimal(12,3)").as("d"), col("x"),
        col("ds").cast("date").as("dt"),
        lit(null).cast("double").as("n"))
    val cols = Seq("ts", "k", "d", "x", "dt", "n")
    Manifest.commitAppendStats(spark, root, "t", df, cols, "k", 2)
    val recorded = statsOf(root)
    assert(recorded.nonEmpty && recorded.values.forall(_ != null))
    // the read-back pass over the SAME published files must agree
    // byte-for-byte (both orderings of the map entries are fixed by
    // the statsCols order, so plain string equality is exact)
    val files = recorded.keys.toSeq.sorted
    val replay = Manifest.statsRowsForSpark(spark, root, "t", files, cols)
      .map { case (_, f, st) => f -> st }.toMap
    files.foreach { f =>
      assert(recorded(f) == replay(f),
        s"footer/read-back drift for $f:\n  footer:   ${recorded(f)}\n  readback: ${replay(f)}")
    }
    // and the all-null column really recorded null bounds
    assert(recorded(files.head).contains(""""n":{"min":null,"max":null}"""))
  }

  test("footer-statted files prune identically to read-back-statted ones") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-footer-prune-spec").toString
    val df = (1 to 28).map(i => (i.toLong, f"2024-01-$i%02d 12:00:00"))
      .toDF("k", "s")
      .select(col("k"), col("s").cast("timestamp").as("ts"))
    Manifest.commitAppendStats(spark, root, "t", df, Seq("ts", "k"), "ts", 4)
    val (pruned, read, total) = Manifest.readTablePruned(spark, root, "t", Seq(
      Manifest.Pred("ts", "2024-01-03 00:00:00", "2024-01-09 00:00:00", "timestamp")))
    assert(total == 4 && read < total, s"expected a strict prune, read $read/$total")
    assert(pruned.filter(col("ts").between(
      lit("2024-01-03 00:00:00").cast("timestamp"),
      lit("2024-01-09 00:00:00").cast("timestamp"))).count() == 6L)
  }
}
