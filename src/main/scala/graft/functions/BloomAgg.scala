package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.util.sketch.BloomFilter

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Per-group Bloom filter as a typed [[Aggregator]] — the sketch that
  * answers "might this key be in this group" in O(1) from O(n·log 1/p)
  * BITS, mergeable across partitions like any algebraic aggregate.
  *
  * The engine uses it grouped by `input_file_name()` to build ONE
  * filter per data file in a single column-pruned pass (partial
  * filters are OR-merged map-side, so the exchange carries one
  * fixed-size sketch per (file × partition), never keys). That is the
  * same pass parquet's own footer-bloom writer pays, expressed as a
  * relational aggregate.
  *
  * Capacity is fixed at construction (`expected` keys at `fpp`):
  * overfilling degrades the false-positive rate but NEVER produces
  * false negatives, so a pruned read stays correct — the bound the
  * point-lookup pruner relies on (keys only vanish from a bloom by
  * never having been inserted).
  *
  * Input is the key as Long; wraps
  * `org.apache.spark.util.sketch.BloomFilter` (public Spark API — the
  * same sketch `DataFrameStatFunctions.bloomFilter` builds, but that
  * one is a whole-DataFrame action, not a groupable aggregate).
  */
final class BloomAgg(expected: Long, fpp: Double)
    extends Aggregator[Long, BloomFilter, Array[Byte]] {
  require(expected > 0 && fpp > 0 && fpp < 1, s"bad bloom shape: $expected/$fpp")

  override def zero: BloomFilter = BloomFilter.create(expected, fpp)

  override def reduce(b: BloomFilter, key: Long): BloomFilter = {
    b.putLong(key); b
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b); a
  }

  override def finish(b: BloomFilter): Array[Byte] = BloomAgg.serialize(b)

  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomAgg {
  def serialize(b: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}
