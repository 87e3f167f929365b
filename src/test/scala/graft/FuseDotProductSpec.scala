package graft

import graft.functions.{DotProduct, FuseDotProduct}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fusion rule must (a) actually fire on the engine's declarative
  * dot-product forms, (b) never change a value — fused and unfused
  * plans are bit-identical, including NULL/length edge cases. */
class FuseDotProductSpec extends SparkSuite {
  import spark.implicits._

  private val dotHof =
    "aggregate(zip_with(a, b, (x,y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc,v) -> acc + v)"
  private val normHof =
    "aggregate(transform(a, x -> cast(x as double) * cast(x as double)), cast(0 as double), (acc,v) -> acc + v)"

  private def fused(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions.exists(_.exists(_.isInstanceOf[DotProduct]))

  // parquet-backed input so nothing constant-folds away
  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    .select(col("vec_id"), col("embedding").as("a"),
      reverse(col("embedding")).as("b"))

  test("zip_with dot form and transform norm form both fuse") {
    assert(fused(emb.selectExpr(s"$dotHof AS dot")))
    assert(fused(emb.selectExpr(s"$normHof AS nrm2")))
  }

  test("mixed float x double-literal zip_with fuses (hyperplane shape)") {
    val lit = (1 to 64).map(i => if (i % 2 == 0) "1.0D" else "-1.0D").mkString("array(", ",", ")")
    val df = emb.selectExpr(s"aggregate(zip_with(a, $lit, (x,h) -> cast(x as double) * h), cast(0 as double), (acc,v) -> acc + v) AS s")
    assert(fused(df))
  }

  test("float-accumulating and non-product folds do NOT fuse") {
    assert(!fused(emb.selectExpr("aggregate(zip_with(a, b, (x,y) -> x * y), cast(0 as float), (acc,v) -> acc + v) AS s")))
    assert(!fused(emb.selectExpr("aggregate(a, cast(0 as double), (acc,v) -> acc + v) AS s")))
  }

  test("fused result is bit-identical to the HOF fold on real vectors") {
    val rows = emb.selectExpr("vec_id", s"$dotHof AS hof", "dot_product(a, b) AS fused")
      .where("hof <> fused OR (hof IS NULL) <> (fused IS NULL)")
    assert(rows.count() == 0)
  }

  test("NULL element and length mismatch yield NULL, matching zip_with") {
    val df = Seq(
      (1L, Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f, 4.0f)),
      (2L, Array[java.lang.Float](1.0f, null), Array[java.lang.Float](3.0f, 4.0f)),
      (3L, Array[java.lang.Float](1.0f), Array[java.lang.Float](3.0f, 4.0f))
    ).toDF("id", "a", "b")
    val out = df.selectExpr("id", s"$dotHof AS hof", "dot_product(a, b) AS fused")
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(out(0) == ((1L, Some(11.0), Some(11.0))))
    assert(out(1) == ((2L, None, None)))
    assert(out(2) == ((3L, None, None)))
  }

  test("rule object rewrite is idempotent") {
    val once = FuseDotProduct(emb.selectExpr(s"$dotHof AS dot").queryExecution.optimizedPlan)
    assert(FuseDotProduct(once) == once)
  }
}
