package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (SURVEY.md §4 scale notes): Z-order
  * (Morton) clustering so parquet row-group min/max statistics prune on
  * EVERY clustered dimension, not just the leading sort key.
  *
  * A table linearly sorted on `a` skips row groups for `a`-filters but
  * reads everything for `b`-filters; writing it in Z-order of (a, b)
  * keeps both columns' value ranges tight within each row group, so
  * either filter (or both) skips. At 100 TB this is the difference
  * between a full scan and touching a few percent of files for the
  * second-dimension query — the same layout trick Delta's OPTIMIZE
  * ZORDER applies, built from stock Spark bit arithmetic (codegen'd,
  * no UDF).
  */
object Layout {

  /** Spread the low 16 bits of `c` so a zero sits between consecutive
    * bits (x15 x14 … x0 → x15 0 x14 0 … x0): the classic magic-number
    * spread, as Column arithmetic. */
  private def spread16(c: Column): Column = {
    val masks = Seq(
      (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL),
      (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))
    masks.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (x, (shift, mask)) =>
        x.bitwiseOR(shiftleft(x, shift)).bitwiseAND(lit(mask))
    }
  }

  /** 2-D Morton key of two columns already scaled to [0, 65535]. */
  def zorder2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Min-max scale a numeric column to the 16-bit grid using provided
    * bounds (bounds come from a stats pass or catalog metadata — they
    * need not be exact; clamping keeps out-of-range rows valid). */
  def grid16(c: Column, lo: Double, hi: Double): Column =
    least(lit(65535), greatest(lit(0),
      ((c - lo) / (hi - lo) * 65535).cast("int")))

  /** Min-max scale to a `bits`-bit grid (the N-dim companion of
    * [[grid16]]). */
  def gridBits(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val max = (1L << bits) - 1L
    least(lit(max), greatest(lit(0L),
      ((c - lo) / (hi - lo) * max).cast("long")))
  }

  /** N-dim Morton key: interleave `bits` bits of each of k columns
    * (already scaled to the grid) — bit i of dim j lands at position
    * i*k + j. k*bits must stay under the long sign bit. Built as a
    * flat OR of shift/mask terms: pure Column arithmetic, stays
    * inside whole-stage codegen (the cost of a Z-rewrite is the
    * shuffle, never the key). [[zorder2]] keeps the 2-D magic-number
    * fast path. */
  def zorderN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, s"zorderN: need at least 2 dims, got $k")
    require(k * bits <= 62, s"zorderN: $k dims x $bits bits overflow a long")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Per-dim grid resolution for k dims: 16 bits through 3 dims, then
    * whatever fits (4 dims → 15 bits — a 32768-cell axis still prunes
    * far finer than any file count). */
  def bitsFor(k: Int): Int = math.min(16, 62 / k)

  /** EQUI-DEPTH grid: bucket index = how many quantile boundaries the
    * value exceeds. A skewed dimension makes a LINEAR (min-max) grid
    * collapse — most mass lands in a few cells, every Z-tile spans
    * the hot band, and no predicate inside it prunes; rank-gridding
    * is what Delta's OPTIMIZE ZORDER does (per-column range ids).
    * Repeated boundaries (extreme skew) merge cells harmlessly; a
    * NULL value lands in cell 0. Flat comparison chain — stays in
    * whole-stage codegen. */
  def equiDepthGrid(c: Column, boundaries: Seq[Double]): Column =
    boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(c > lit(b), 1).otherwise(0) }

  /** Compact a parquet directory's small files into ~`targetBytes`
    * files: one distributed read, one round-robin repartition to
    * ceil(dataBytes / target), one rewrite, then a directory swap.
    * The small-files problem is the classic streaming-sink /
    * over-parallel-write pathology — a 100 TB table of 10 MB files
    * pays listing, footer, and task-startup costs per FILE, so
    * compaction is routine maintenance, not an optimization.
    * Returns the new file count.
    *
    * The swap (delete + rename) is NOT atomic on a plain filesystem —
    * production table formats get atomicity from a commit log; on raw
    * directories, run compaction in a maintenance window.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              targetBytes: Long = 128L << 20): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataBytes = fs.listStatus(p)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val n = math.max(1, math.ceil(dataBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compact-tmp")
    spark.read.parquet(dir).repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(p, true)
    require(fs.rename(tmp, p), s"compaction swap failed for $dir")
    n
  }

  /** Rewrite `df` into `n` files Z-ordered on the two scaled dimensions:
    * range-partition by the Morton key (so files tile the Z-curve) and
    * sort within partitions (so row groups inside a file stay tight).
    * The key is dropped before the write — layout is physical, not
    * schema. */
  def writeZordered(df: DataFrame, aCol: Column, bCol: Column,
                    n: Int, path: String): Unit = {
    val keyed = df.withColumn("__z", zorder2(aCol, bCol))
    keyed.repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
