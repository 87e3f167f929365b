package graft

import graft.ops.Manifest
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The driver-local (no Spark job) publish path for metadata-sized
  * LocalRelation batches must be BIT-COMPATIBLE with the distributed
  * write it replaces: same inferred schema, same values, for every
  * type the DML surface commits — and it must actually run without
  * scheduling a job. */
class DirectPublishSpec extends SparkSuite {

  private def freshRoot(): String =
    Files.createTempDirectory("graft-directpub").toString

  // a literal frame exercising the type surface DML commits: string,
  // int, long, double, boolean, date, timestamp, decimal, array,
  // struct — with nulls in every nullable slot
  private def literalDf = {
    val s = spark
    s.sql(
      """SELECT * FROM VALUES
        |  ('a', 1, 10L, 1.5D, true,  DATE'2024-01-15',
        |   TIMESTAMP'2024-01-15 12:34:56.789012', CAST(12.3456 AS DECIMAL(18,4)),
        |   array(1L, 2L, 3L), named_struct('x', 1, 'y', 'p'),
        |   CAST(1.25 AS DECIMAL(38,10))),
        |  ('b', 2, 20L, 2.5D, false, DATE'1999-12-31',
        |   TIMESTAMP'2024-02-01 00:00:00', CAST(-0.0001 AS DECIMAL(18,4)),
        |   array(4L), named_struct('x', 2, 'y', 'q'),
        |   CAST(-7.5 AS DECIMAL(38,10))),
        |  (CAST(NULL AS STRING), CAST(NULL AS INT), CAST(NULL AS BIGINT),
        |   CAST(NULL AS DOUBLE), CAST(NULL AS BOOLEAN), CAST(NULL AS DATE),
        |   CAST(NULL AS TIMESTAMP), CAST(NULL AS DECIMAL(18,4)),
        |   CAST(NULL AS ARRAY<BIGINT>), CAST(NULL AS STRUCT<x: INT, y: STRING>),
        |   CAST(NULL AS DECIMAL(38,10)))
        |AS t(s, i, l, d, b, dt, ts, dec, arr, st, bigdec)""".stripMargin)
  }

  test("direct publish: schema and values identical to the Spark write path") {
    val root = freshRoot()
    // direct path: the optimizer collapses literal VALUES to a
    // LocalRelation; Spark path: an exchange defeats the collapse
    Manifest.commit(spark, root, Map(
      "t_direct" -> literalDf,
      "t_spark" -> literalDf.repartition(1)))
    val a = Manifest.readTable(spark, root, "t_direct")
    val b = Manifest.readTable(spark, root, "t_spark")
    assert(a.schema === b.schema)
    val ka = a.orderBy(col("i").asc_nulls_last).collect().toSeq
    val kb = b.orderBy(col("i").asc_nulls_last).collect().toSeq
    assert(ka === kb)
    assert(ka.size === 3)
  }

  test("direct publish of a driver-resident batch schedules NO Spark job") {
    val root = freshRoot()
    Manifest.commit(spark, root, Map("seed" -> literalDf)) // table exists
    var jobs = 0
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      Manifest.commitAppend(spark, root, "seed", literalDf)
      Thread.sleep(200) // let any (unexpected) job-start event drain
    } finally spark.sparkContext.removeSparkListener(l)
    assert(jobs === 0, "a LocalRelation append must not schedule a job")
  }

  test("empty LIMIT 0 creation takes the direct path and reads back empty") {
    val root = freshRoot()
    val empty = literalDf.limit(0)
    Manifest.commitAppend(spark, root, "t0", empty)
    val back = Manifest.readTable(spark, root, "t0")
    assert(back.schema === literalDf.schema)
    assert(back.count() === 0L)
  }

  test("footer stats from a direct-written file prune like Spark-written ones") {
    val root = freshRoot()
    val df = spark.sql(
      """SELECT * FROM VALUES (1L, 'x', TIMESTAMP'2024-01-01 00:00:00'),
        |  (5L, 'y', TIMESTAMP'2024-03-01 00:00:00'),
        |  (9L, 'z', TIMESTAMP'2024-06-01 00:00:00')
        |AS t(k, s, ts)""".stripMargin)
    Manifest.commitAppendMulti(spark, root, Seq(("st", df, Seq("k", "ts"))))
    // stats landed in the manifest (per-file min/max JSON, non-null)
    val rows = Manifest.manifestRows(spark, root, Manifest.snapshotVersion(root))
    val st = rows.collect { case ("st", _, j) if j != null => j }
    assert(st.nonEmpty && st.forall(j => j.contains("\"k\"") && j.contains("\"ts\"")),
      s"expected k/ts stats in manifest, got $st")
    // and the values a pruned read serves are intact
    val got = Manifest.readTable(spark, root, "st")
      .filter(col("k") >= 5L).orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(5L, 9L))
  }
}
