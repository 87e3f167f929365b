package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, TypedColumn}

/** Bounded per-group top-k as a typed [[Aggregator]] — the scale
  * alternative to `row_number() OVER (PARTITION BY g ORDER BY v) <= k`.
  *
  * The window form sorts EVERY row of every group after a full shuffle;
  * this aggregator keeps a k-element sorted buffer per group, so the
  * map side reduces each partition's contribution to ≤ k rows per group
  * before the exchange (Catalyst plans it as partial + final
  * ObjectHashAggregate). At 100 TB with k=5 that turns a
  * sort-the-world window into a shuffle of ~(groups × k × partitions)
  * tuples — the same partial-aggregation push that makes `max` cheap,
  * applied to the whole top-k set.
  *
  * Ranking is (value DESC, id ASC) — the id tiebreak makes the result
  * deterministic and oracle-comparable (mirrors
  * `ORDER BY v DESC, id` in the window equivalent).
  *
  * Input rows are `(id, value)`; output is the ranked `Seq` of
  * `(value, id)`, best first, at most k elements.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), List[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  /** True iff `a` ranks strictly before `b`. */
  private def before(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Ordered insert into a rank-sorted list, capped at k — O(k) per
    * row with an O(1) fast path once the buffer is full and the new
    * element ranks below the current cutoff (the common case on
    * sorted-ish or heavy-tailed data). */
  private def insert(sorted: List[(Double, Long)], e: (Double, Long)): List[(Double, Long)] =
    if (sorted.lengthCompare(k) >= 0 && !before(e, sorted.last)) sorted
    else {
      val (better, rest) = sorted.span(x => before(x, e))
      (better ::: e :: rest).take(k)
    }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], row: (Long, Double)): List[(Double, Long)] =
    insert(buf, (row._2, row._1))

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {
  /** The aggregator as a typed column, for
    * `ds.groupByKey(...).mapValues(r => (id, value)).agg(TopKAggregator.topK(5))`. */
  def topK(k: Int): TypedColumn[(Long, Double), Seq[(Double, Long)]] =
    new TopKAggregator(k).toColumn.name(s"top$k")
}
