package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions and optimizer rules. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSim)
    ext.injectFunction(GraftExtensions.dotProduct)
    ext.injectFunction(GraftExtensions.bloomAgg)
    ext.injectFunction(GraftExtensions.bloomMightContain)
    ext.injectOptimizerRule(_ => FuseDotProduct)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  // Arity guard: a builder that blindly indexes children(2) turns a
  // 1-arg SQL call into IndexOutOfBoundsException deep in analysis;
  // fail instead with the function name and the accepted counts.
  private def requireArity(fn: String, children: Seq[Expression], accepted: Set[Int]): Unit =
    if (!accepted.contains(children.length))
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function $fn: got ${children.length}, " +
          s"expected ${accepted.toSeq.sorted.mkString(" or ")}")

  private val cosineSim: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      requireArity("cosine_sim", children, Set(2))
      CosineSimilarity(children.head, children(1))
    })

  private val dotProduct: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => {
      requireArity("dot_product", children, Set(2))
      DotProduct(children.head, children(1))
    })

  // Spark ships codegen'd bloom expressions (used internally by runtime
  // row-group filtering) but doesn't expose them in the public registry;
  // surfacing them here keeps the q111 prefilter in whole-stage codegen
  // and scan-eligible instead of an opaque Scala-closure UDF.
  private val bloomAgg: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_filter_agg"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "bloom_filter_agg"),
    (children: Seq[Expression]) => {
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      requireArity("bloom_filter_agg", children, Set(1, 2, 3))
      children match {
        case Seq(c)       => new BloomFilterAggregate(c)
        case Seq(c, n)    => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
      }
    })

  private val bloomMightContain: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_might_contain"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "bloom_might_contain"),
    (children: Seq[Expression]) => {
      requireArity("bloom_might_contain", children, Set(2))
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        children.head, children(1))
    })

  /** Idempotent registration on an already-built session (used by the
    * query registry so the driver's stock session gets the function
    * surface, and by the Verify/Bench mains so the fusion rule is on
    * engine-wide). `extraOptimizations` is the runtime hook for
    * optimizer rules — guarded against double-append. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    // Engine session defaults (opt guide §2.2): AQE's size-based
    // partition coalescing is neutered by the stock
    // `parallelismFirst=true`, which pins post-shuffle partition count
    // to the cluster's parallelism even when the shuffled bytes are
    // metadata-sized — every tiny DML/streaming shuffle then pays
    // cores× task launches for KBs of data, and at 100 TB the same
    // flag under-sizes partitions AT the advisory target instead of
    // letting byte volume decide. `false` is the scale-adaptive
    // setting (partitions ≈ bytes / advisorySize at ANY scale — the
    // Spark tuning docs themselves recommend it); the advisory size
    // stays at the stock 64 MB so partition sizing remains the same
    // production value everywhere. Set via `conf` (session-level,
    // not harness-level) so Bench/Verify/driver sessions all inherit
    // it as engine behavior.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    // Same §2.2 discipline for CACHED frames: the stock
    // `canChangeCachedPlanOutputPartitioning=false` switches AQE OFF
    // for any plan that materializes into the cache, so every
    // intra-query `.cache()` (the LSH signature frame, iterative
    // edge lists) re-inherits the fixed shuffle-partition constant.
    // `true` lets cache materialization coalesce by bytes like any
    // other stage — same behavior at every scale.
    spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    Seq(cosineSim, dotProduct, bloomAgg, bloomMightContain).foreach { f =>
      spark.sessionState.functionRegistry.registerFunction(f._1, f._2, f._3)
    }
    if (!spark.experimental.extraOptimizations.contains(FuseDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseDotProduct
    // planner strategy for the custom as-of join operator (extension
    // tier c) — `extraStrategies` is the runtime hook mirroring
    // injectPlannerStrategy (cf. SNIPPETS.md [1])
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }
}
