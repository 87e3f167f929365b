package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev utility (opt guide §1): per-JOB wall-clock breakdown of one or
  * more declared queries — where "7 seconds" actually goes when the
  * data is small and the cost is scheduling. Prints every Spark job
  * the query ran (start offset, duration, #stages, #tasks, first line
  * of the call site) plus the driver-only gaps between jobs. */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/graft-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.Tables.registerAll(spark, dir)
    graft.Tables.all.foreach(t => graft.Tables.load(spark, dir, t).count())

    final case class J(id: Int, t0: Long, var t1: Long = 0L,
                       var stages: Int = 0, var tasks: Int = 0,
                       var site: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val j = J(e.jobId, e.time)
        j.site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobs(e.jobId) = j
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          // attribute the stage to the most recent unfinished job
          jobs.values.lastOption.foreach { j =>
            j.stages += 1; j.tasks += e.stageInfo.numTasks
          }
        }
    }
    args.foreach { n =>
      jobs.clear()
      spark.catalog.clearCache()
      spark.sparkContext.addSparkListener(listener)
      val w0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - w0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300)
      val js = jobs.synchronized(jobs.values.toVector.sortBy(_.t0))
      println(f"== $n%s wall=$wall%.2fs jobs=${js.size}%d")
      var prevEnd = js.headOption.map(_.t0).getOrElse(0L)
      js.foreach { j =>
        val gap = (j.t0 - prevEnd) / 1000.0
        val dur = (j.t1 - j.t0) / 1000.0
        if (gap > 0.02) println(f"   -- driver gap ${gap}%.2fs")
        println(f"   job ${j.id}%4d ${dur}%6.2fs stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.site}%s")
        prevEnd = j.t1
      }
      val jobSum = js.map(j => (j.t1 - j.t0) / 1000.0).sum
      println(f"   jobs-sum=${jobSum}%.2fs driver-other=${wall - jobSum}%.2fs")
    }
    spark.stop()
  }
}
