package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to `sql`-private internals so the engine can hand a custom
  * [[graft.plans.AsOfJoinPlan]] logical node to a session's
  * analyzer/planner pipeline — the standard pattern for extension
  * libraries that add whole logical operators (cf. SNIPPETS.md [2]/[3]:
  * the same factory shim in public Spark extension projects).
  */
object GraftDatasetFactory {

  /** Wrap a logical plan as a DataFrame (analyzer runs on first use). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The Catalyst expression behind a (classic) Column. */
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Re-wrap a batch DataFrame as a STREAMING one (`isStreaming=true`)
    * — what a V1 streaming `Source.getBatch` must return
    * (`MicroBatchExecution` asserts it). The physical rows are the
    * batch plan's own `toRdd`; only the logical flag changes. The
    * same `internalCreateDataFrame` bridge every out-of-tree V1
    * source uses (cf. SNIPPETS.md [2]: Bahir-style source shims). */
  def asStreaming(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The reverse: re-wrap the micro-batch DataFrame a V1 streaming
    * `Sink.addBatch` receives (incremental-execution-planned,
    * `isStreaming=true`) as a plain BATCH frame so ordinary writers
    * (`df.write...`) accept it — the same bridge V1 sinks have always
    * used. */
  def asBatch(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
