package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §2 scale notes; the engine's
  * answer to hot keys at 100 TB — AQE's skew-join handles the common
  * case at runtime, these handle it structurally when key skew is
  * known in advance).
  *
  * Both transforms are deterministic: the salt is a hash of stable row
  * columns, never `rand()`, so results are reproducible and retryable
  * (a re-run of a failed task salts identically).
  */
object Skew {

  /** Two-phase (salted) aggregation for algebraic aggregates: partial
    * aggregate on (keys, salt) — spreading a hot key over `buckets`
    * reducers — then final aggregate on keys.
    *
    * `partials` maps output column name → (partialAgg, finalAgg), e.g.
    * `"n" -> (count(lit(1)), sum)` or `"total" -> (sum(c), sum)`.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      saltFrom: Seq[String],
      partials: Map[String, (Column, Column => Column)],
      buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(saltFrom.map(col): _*), lit(buckets)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2._1.as(partials.head._1),
        partials.tail.map { case (n, (p, _)) => p.as(n) }.toSeq: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(partials.head._2._2(col(partials.head._1)).as(partials.head._1),
        partials.tail.map { case (n, (_, f)) => f(col(n)).as(n) }.toSeq: _*)
  }

  /** Salted equi-join for a skewed fact side: the fact rows get a
    * deterministic salt in [0, buckets); the (small) dimension side is
    * replicated once per salt value so every (key, salt) bucket still
    * finds its match. Join key cardinality × buckets on the dim side —
    * only viable when dim is broadcast-scale, which is exactly the
    * skewed-fact-⋈-small-dim shape.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltFrom: Seq[String],
      buckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(saltFrom.map(col): _*), lit(buckets)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(broadcast(explodedDim), Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
