package graft

import graft.functions.GraftExtensions
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSuite {

  private def vecs = {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq(
      (1L, Seq(1f, 0f, 0f, 0f), Seq(1f, 0f, 0f, 0f)),   // identical → 1.0
      (2L, Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f)),   // orthogonal → 0.0
      (3L, Seq(1f, 0f, 0f, 0f), Seq(-1f, 0f, 0f, 0f)),  // opposite → -1.0
      (4L, Seq(1f, 1f, 0f, 0f), Seq(1f, 0f, 0f, 0f)))   // 45° → √2/2
      .toDF("id", "a", "b")
  }

  test("cosine_sim computes exact expected values (interpreted + codegen)") {
    val out = vecs.select(col("id"), expr("cosine_sim(a, b)").as("c"))
      .orderBy("id").collect().map(_.getDouble(1))
    assert(out(0) == 1.0 && out(1) == 0.0 && out(2) == -1.0)
    assert(math.abs(out(3) - math.sqrt(2) / 2) < 1e-15)
  }

  test("cosine_sim is bit-identical to the higher-order-function fold") {
    GraftExtensions.register(spark)
    val hof =
      """aggregate(zip_with(a, b, (x,y) -> cast(x as double) * cast(y as double)), cast(0 as double), (s,v) -> s + v)
        | / (sqrt(aggregate(transform(a, x -> cast(x as double) * cast(x as double)), cast(0 as double), (s,v) -> s + v))
        |    * sqrt(aggregate(transform(b, x -> cast(x as double) * cast(x as double)), cast(0 as double), (s,v) -> s + v)))""".stripMargin
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 50).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextFloat() - 0.5f), Seq.fill(64)(rnd.nextFloat() - 0.5f)))
      .toDF("id", "a", "b")
    val diff = df.select((expr("cosine_sim(a, b)") - expr(hof)).as("d"))
      .agg(max(abs(col("d")))).collect().head.getDouble(0)
    assert(diff == 0.0) // same fold order → bit-identical doubles
  }

  test("nulls propagate") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(df.select(expr("cosine_sim(a, b)")).collect().head.isNullAt(0))
  }

  test("length mismatch yields NULL (matches zip_with padding semantics)") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("a", "b")
    assert(df.select(expr("cosine_sim(a, b)")).collect().head.isNullAt(0))
  }
}
