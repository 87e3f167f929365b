package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Orchestration operators (SURVEY.md §2.1, O1-O9), re-expressed as
  * driver-program structure: a pipeline is named stages over
  * DataFrames; edges are lineage (statement order); fan-out is
  * concurrent job submission on one SparkSession (Spark's scheduler
  * interleaves independent jobs across executor slots — on a cluster,
  * FAIR pools would share it the same way); fan-in is a Future barrier
  * followed by `unionByName` when data merges.
  */
object Pipeline {

  /** O1: a named pipeline of sequential stages (the `DAG` context). */
  final case class Stage(name: String, run: DataFrame => DataFrame)

  /** O2: `a >> b >> c` — statement order / function composition. */
  def sequence(input: DataFrame, stages: Seq[Stage]): DataFrame =
    stages.foldLeft(input)((df, st) => st.run(df))

  /** O6: EmptyOperator — the identity stage. */
  val empty: Stage = Stage("empty", identity)

  /** O5: BashOperator — a side-effect stage that runs a shell command
    * and passes its input through unchanged. A non-zero exit fails the
    * stage (the reference's BashOperator fails the task), so a broken
    * side-effect can't silently pass data downstream. */
  def bash(name: String, command: Seq[String]): Stage =
    Stage(name, { df =>
      val rc = scala.sys.process.Process(command).!
      require(rc == 0, s"bash stage '$name' exited $rc: ${command.mkString(" ")}")
      df
    })

  /** O3/O4: fan-out then fan-in (the `chain(start, [a,b], merge, end)`
    * diamond of `dags/complex_example.py:21`).
    *
    * DataFrame construction is lazy, so with `eager = false` the
    * futures only build plans concurrently and the actual computation
    * happens in whatever single action consumes the merged result —
    * appropriate when the merge is a union feeding one job. With
    * `eager = true` each branch is materialized inside its future
    * (`localCheckpoint`), so branch computations genuinely run as
    * concurrent Spark jobs and the merge consumes their checkpointed
    * results — the true analogue of Airflow's parallel task slots
    * (side-effecting branches, e.g. concurrent table writes, are
    * inherently eager; see E2ESpec's fan-out test).
    */
  def fanOutFanIn(input: DataFrame, branches: Seq[DataFrame => DataFrame],
                  merge: Seq[DataFrame] => DataFrame, eager: Boolean = false)
                 (implicit ec: ExecutionContext): DataFrame = {
    val outs = branches.map(b => Future {
      val out = b(input)
      if (eager) out.localCheckpoint(true) else out
    })
    merge(Await.result(Future.sequence(outs), Duration.Inf))
  }

  val queries: Seq[Q] = Seq(

    // ----- O3/O4 diamond: start → {by_status ∥ by_priority} → union → sort.
    //       Each branch is an independent aggregation over the shared
    //       upstream; at scale the two run as concurrent jobs sharing the
    //       cached/scanned upstream, and the fan-in is a cheap union of
    //       two tiny aggregates (no extra shuffle). -----
    Q("q39_pipeline_diamond",
      Some("""SELECT k, branch, n FROM (
             |  SELECT o_orderstatus AS k, 'by_status' AS branch, count(*) AS n
             |  FROM orders WHERE o_totalprice > 0 GROUP BY o_orderstatus
             |  UNION ALL
             |  SELECT o_orderpriority AS k, 'by_priority' AS branch, count(*) AS n
             |  FROM orders WHERE o_totalprice > 0 GROUP BY o_orderpriority
             |) ORDER BY branch, k""".stripMargin),
      (s, dir) => {
        implicit val ec: ExecutionContext = ExecutionContext.global
        val start = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 0)
        fanOutFanIn(start,
          Seq(
            in => in.groupBy(col("o_orderstatus").as("k"))
              .agg(count(lit(1)).as("n")).withColumn("branch", lit("by_status")),
            in => in.groupBy(col("o_orderpriority").as("k"))
              .agg(count(lit(1)).as("n")).withColumn("branch", lit("by_priority"))),
          outs => outs.reduce(_.unionByName(_)))
          .select("k", "branch", "n")
          .orderBy("branch", "k")
      })
  )
}
