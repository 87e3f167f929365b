package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Vector-state SimHash aggregator (SURVEY §2.6): input is the 64-bit
  * per-token hash, buffer is 64 per-bit set-counters plus a token
  * count, output sets bit b iff its set-count exceeds half the tokens
  * — exactly the `sum(±1) > 0` rule of the 64-sum expression form in
  * `Text.simhashDF` (set > n − set ⟺ 2·set > n; SimHashAggSpec asserts
  * bit-identical signatures on a fixture). Counters are Long: a
  * per-day group at corpus scale exceeds 2^31 tokens, which would
  * silently wrap Int state into garbage signatures.
  *
  * The point of the Aggregator shape here is the PARTIAL STATE: a
  * per-partition partial is 65 longs regardless of token count, and
  * `merge` is elementwise addition — signatures built per partition,
  * per file, or per day roll up losslessly, the same mergeability
  * argument as the q90 HLL sketches. TopKAggregator shows a bounded
  * heap buffer; this shows the fixed-width vector buffer.
  */
object SimHashAgg extends Aggregator[Long, Array[Long], Long] {

  def zero: Array[Long] = new Array[Long](65)

  def reduce(buf: Array[Long], tokenHash: Long): Array[Long] = {
    var b = 0
    while (b < 64) {
      if (((tokenHash >>> b) & 1L) == 1L) buf(b) += 1
      b += 1
    }
    buf(64) += 1
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 65) { a(i) += b(i); i += 1 }
    a
  }

  def finish(buf: Array[Long]): Long = {
    val n = buf(64)
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (2L * buf(b) > n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
