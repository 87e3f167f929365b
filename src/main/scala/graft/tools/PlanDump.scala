package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev utility: print exchange/join summary per query (plan audits). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    args.drop(1).foreach { n =>
      val p = graft.SparkEntry.queries(n)(spark, dir).queryExecution
        .explainString(FormattedMode)
      // count TREE lines only — formatted mode repeats every operator
      // as a "(n) Name" detail header, which would double-count
      val tree = p.linesIterator.filterNot(_.trim.startsWith("(")).mkString("\n")
      val joins = "\\b(\\w+Join)\\b".r.findAllMatchIn(tree).map(_.group(1)).toList
        .groupBy(identity).map { case (k, v) => s"$k x${v.size}" }.mkString(", ")
      val ex = "\\bExchange\\b".r.findAllIn(tree).size
      println(s"== $n: exchanges=$ex joins=[$joins]")
      if (sys.env.contains("PLAN_FULL")) println(p)
    }
    spark.stop()
  }
}
