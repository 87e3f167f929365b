package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {

  private lazy val skewed = {
    import spark.implicits._
    // hot key: 10k rows on key 1, a handful elsewhere
    ((1 to 10000).map(i => (1L, i.toDouble)) ++ Seq((2L, 5.0), (3L, 7.0)))
      .toDF("k", "v")
  }

  test("saltedAggregate equals plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
      .orderBy("k").collect()
    val salted = Skew.saltedAggregate(
      skewed, Seq("k"), saltFrom = Seq("v"),
      partials = Map(
        "total" -> (sum(col("v")), (c: org.apache.spark.sql.Column) => sum(c)),
        "n" -> (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c).cast("long"))))
      .orderBy("k").collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin equals plain join") {
    import spark.implicits._
    val dim = Seq((1L, "hot"), (2L, "warm"), (4L, "unmatched")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).groupBy("k", "name")
      .agg(count(lit(1)).as("n")).orderBy("k").collect()
    val salted = Skew.saltedJoin(skewed, dim, "k", saltFrom = Seq("v"))
      .groupBy("k", "name").agg(count(lit(1)).as("n")).orderBy("k").collect()
    assert(salted.toSeq == plain.toSeq)
    // the salt actually spreads the hot key over multiple buckets
    val buckets = skewed.withColumn("s", pmod(hash(col("v")), lit(16)))
      .filter(col("k") === 1).select("s").distinct().count()
    assert(buckets > 8)
  }
}
