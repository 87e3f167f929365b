package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: proves the second clustered dimension actually
  * prunes row groups that a linear sort cannot. Uses scan-node
  * `numOutputRows` (rows surviving parquet row-group min/max skipping)
  * as the pruning measure.
  */
class ZorderSpec extends SparkSuite {

  private def scanRows(path: String, cond: org.apache.spark.sql.Column): Long = {
    val q = spark.read.parquet(path).filter(cond)
    q.collect()
    q.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
  }

  test("morton key interleaves bits of both dimensions") {
    import spark.implicits._
    val rows = Seq((0, 0), (1, 0), (0, 1), (65535, 65535))
      .toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(rows == Seq(0L, 1L, 2L, 0xFFFFFFFFL))
  }

  test("zorderN at k=2 reproduces the 2-D fast path bit-for-bit") {
    import spark.implicits._
    val df = spark.range(500).select(
      pmod(hash(col("id")), lit(65536)).cast("long").as("a"),
      pmod(hash(col("id") * 13 + 3), lit(65536)).cast("long").as("b"))
    val mismatch = df.select(
      Layout.zorder2(col("a"), col("b")).as("z2"),
      Layout.zorderN(Seq(col("a"), col("b")), 16).as("zn"))
      .filter(col("z2") =!= col("zn")).count()
    assert(mismatch == 0L)
  }

  test("3-dim morton key places bit i of dim j at position i*3+j") {
    import spark.implicits._
    val z = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (2L, 0L, 0L))
      .toDF("a", "b", "c")
      .select(Layout.zorderN(Seq(col("a"), col("b"), col("c")), 16).as("z"))
      .as[Long].collect().toSeq
    assert(z == Seq(1L, 2L, 4L, 8L))
    // guards: dimension count and duplicate dims refuse loudly
    intercept[IllegalArgumentException] {
      Layout.zorderN(Seq(col("a")), 16)
    }
    intercept[IllegalArgumentException] {
      Layout.zorderN(Seq.fill(5)(col("a")), 16) // 5*16 > 62
    }
    assert(Layout.bitsFor(3) == 16 && Layout.bitsFor(4) == 15)
  }

  test("z-order layout prunes on the non-leading dimension; linear sort cannot") {
    val n = 100000L
    val base = spark.range(n).select(
      pmod(hash(col("id")), lit(65536)).as("x"),
      pmod(hash(col("id") * 31 + 7), lit(65536)).as("y"))

    val linDir = java.nio.file.Files.createTempDirectory("graft-lin").toString
    base.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString
    Layout.writeZordered(base, col("x"), col("y"), 16, zDir)

    val cond = col("y").between(1000, 2000)
    val linRows = scanRows(linDir, cond)
    val zRows = scanRows(zDir, cond)
    // same answer either way
    assert(spark.read.parquet(zDir).filter(cond).count() ==
      spark.read.parquet(linDir).filter(cond).count())
    // linear x-sort reads everything for a y-filter; z-order skips the
    // row groups whose y-range can't match (expect ~4/16 tiles touched)
    assert(linRows == n, s"expected no pruning on linear layout, read $linRows")
    assert(zRows * 2 < linRows, s"z-order pruned too little: $zRows of $linRows")
  }

  test("compact folds a many-small-files directory, preserving the data") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .repartition(40).write.mode("overwrite").parquet(dir)
    def files = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    // row-identical before/after (an aggregate would compare fp sums
    // whose addition order legitimately changes across layouts)
    val before = spark.read.parquet(dir).orderBy("o_orderkey").collect().toSeq
    assert(files == 40)
    val n = Layout.compact(spark, dir, targetBytes = 1L << 30)
    assert(n == 1 && files == 1)
    val after = spark.read.parquet(dir).orderBy("o_orderkey").collect().toSeq
    assert(after == before)
  }
}
