package graft

import graft.ops.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.concurrent.ExecutionContext

class PipelineSpec extends SparkSuite {

  private def base: DataFrame = {
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (3, "a"), (4, "c")).toDF("id", "grp")
  }

  test("sequence composes stages in order; empty is identity") {
    val out = Pipeline.sequence(base, Seq(
      Pipeline.empty,
      Pipeline.Stage("filter", _.filter(col("id") > 1)),
      Pipeline.empty,
      Pipeline.Stage("proj", _.select("grp"))))
    assert(out.columns.toSeq == Seq("grp"))
    assert(out.count() == 3)
  }

  test("fanOutFanIn runs branches and merges (diamond DAG)") {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val out = Pipeline.fanOutFanIn(base,
      Seq(
        _.groupBy("grp").agg(count(lit(1)).as("n")).withColumn("side", lit("l")),
        _.groupBy("grp").agg(count(lit(1)).as("n")).withColumn("side", lit("r"))),
      dfs => dfs.reduce(_.unionByName(_)))
    assert(out.count() == 6) // 3 groups × 2 branches
  }

  test("bash stage runs a command and passes data through") {
    val st = Pipeline.bash("touch", Seq("sh", "-c", "true"))
    assert(st.run(base).count() == 4)
  }
}
