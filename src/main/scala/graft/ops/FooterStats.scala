package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}
import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, DecimalLogicalTypeAnnotation, IntLogicalTypeAnnotation, TimestampLogicalTypeAnnotation}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.time.{LocalDate, LocalDateTime, ZoneId, ZoneOffset}
import scala.jdk.CollectionConverters._

/** Per-file [min, max] column statistics read from PARQUET FOOTERS —
  * the bounds the write already produced, at zero extra data I/O.
  *
  * [[Manifest.commitAppendLaidOut]] records per-file stats in the
  * commit manifest; the naive collection mechanism is a read-back
  * Spark pass over the just-published files (`min(col)`/`max(col)`
  * per `_metadata.file_name`), which at daily-ingest scale doubles
  * the commit's read I/O. Production formats (Delta, Iceberg; the
  * reference ecosystem's micro-partition metadata) read the footers
  * instead — this object is that path, with the read-back pass kept
  * as the fallback for anything the footer cannot answer EXACTLY.
  *
  * Exactness contract: the returned strings must equal what Spark's
  * `min(col).cast("string")` would produce, because prune-time code
  * casts them back ([[Manifest.Pred]]) and the parity is spec-pinned
  * (FooterStatsSpec). Hence the conservative type allowlist:
  *
  *  - INT64 / INT32 (plain or int-annotated) → decimal string
  *  - INT64/INT32-backed and binary-backed DECIMAL → scaled plain
  *    string via `BigDecimal.toString` (what Spark's `Decimal
  *    .toString` delegates to)
  *  - INT64 TIMESTAMP (MICROS/MILLIS, adjusted or NTZ) → Spark's
  *    cast rendering in the session time zone ("yyyy-MM-dd
  *    HH:mm:ss[.f]", fraction trimmed); NANOS is refused (division
  *    would skew a truncated bound)
  *  - INT32 DATE → ISO local date
  *  - DOUBLE / FLOAT / BOOLEAN → JVM `toString` (Spark's cast)
  *  - BINARY strings are REFUSED: parquet orders them by unsigned
  *    bytes and may truncate long values, either of which silently
  *    breaks the "stats bound, never filter" invariant
  *
  * INT96 timestamps carry no usable statistics, which is why
  * [[Manifest]]'s data writes pin `outputTimestampType=
  * TIMESTAMP_MICROS` (INT96 is deprecated in the format anyway).
  */
object FooterStats {

  /** Stats for `cols` of every file, aligned with `files` — or None
    * if ANY column of ANY file is not footer-answerable (the caller
    * falls back to the read-back pass for the whole batch, keeping
    * the recorded stats uniform). A column with no non-null values
    * anywhere in a file yields (null, null) — same as the read-back
    * pass, and pruned for every predicate (exact: it holds no
    * rows). */
  def tryAll(conf: Configuration, files: Seq[String], cols: Seq[String],
             zone: ZoneId): Option[Seq[Seq[(String, (String, String))]]] = {
    val out = files.map { f =>
      fileStats(conf, f, cols, zone) match {
        case Some(st) => st
        case None => return None
      }
    }
    Some(out)
  }

  /** Top-level field names physically present in a file's footer
    * schema — the "was this file written before the column existed?"
    * question ADD COLUMN DEFAULT reads need (a file lacking the
    * physical column serves the registered default; a file carrying
    * it serves its stored values, including stored NULLs). One footer
    * open, no data I/O. */
  def physicalColumns(conf: Configuration, file: String): Set[String] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new HadoopPath(file), conf))
    try reader.getFooter.getFileMetaData.getSchema
      .getFields.asScala.map(_.getName).toSet
    finally reader.close()
  }

  private def fileStats(conf: Configuration, file: String, cols: Seq[String],
                        zone: ZoneId): Option[Seq[(String, (String, String))]] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new HadoopPath(file), conf))
    try {
      val footer = reader.getFooter
      val schema = footer.getFileMetaData.getSchema
      val blocks = footer.getBlocks.asScala.toSeq
      val perCol = cols.map { c =>
        columnStats(schema, blocks, c, zone) match {
          case Some(mm) => c -> mm
          case None => return None
        }
      }
      // per-column exact NULL counts, also free in the footer —
      // recorded as reserved `__nc_<col>` keys so IS [NOT] NULL
      // predicates can prune (an all-null file cannot match
      // IS NOT NULL; a null-free file cannot match IS NULL). Same
      // all-or-fallback contract as min/max, keeping the recorded
      // stats uniform with the Spark read-back path.
      val nulls = cols.map { c =>
        columnNulls(schema, blocks, c) match {
          case Some(n) => ("__nc_" + c) -> (n.toString, n.toString)
          case None => return None
        }
      }
      // the file's exact row count, free in the same footer — recorded
      // under the reserved `__nrows` key so COUNT-style queries answer
      // from the manifest alone (Manifest.countRows); never a prune
      // column (no schema field is named __nrows)
      val nRows = blocks.map(_.getRowCount).sum
      Some(perCol ++ nulls :+ ("__nrows" -> (nRows.toString, nRows.toString)))
    } finally reader.close()
  }

  /** Merge one column's min/max across all row groups of a file. */
  private def columnStats(schema: MessageType,
                          blocks: Seq[org.apache.parquet.hadoop.metadata.BlockMetaData],
                          col: String, zone: ZoneId): Option[(String, String)] = {
    if (!schema.containsField(col)) return None
    val field = schema.getType(Seq(col): _*)
    if (!field.isPrimitive) return None
    val prim = field.asPrimitiveType()
    val render = renderer(prim, zone).getOrElse(return None)

    var lo: Any = null
    var hi: Any = null
    val ord = ordering(prim).getOrElse(return None)
    blocks.foreach { b =>
      val chunk = b.getColumns.asScala
        .find(_.getPath.toDotString == col).getOrElse(return None)
      val st = chunk.getStatistics
      if (st == null) return None
      if (!st.hasNonNullValue) {
        // legal only when the chunk is provably all-null; otherwise the
        // writer simply recorded no stats and the footer can't answer
        if (!st.isNumNullsSet || st.getNumNulls != chunk.getValueCount) return None
      } else {
        val mn = st.genericGetMin
        val mx = st.genericGetMax
        if (lo == null || ord.compare(mn, lo) < 0) lo = mn
        if (hi == null || ord.compare(mx, hi) > 0) hi = mx
      }
    }
    Some((if (lo == null) null else render(lo),
      if (hi == null) null else render(hi)))
  }

  /** Exact NULL count of `col` across all row groups, or None when any
    * chunk's footer cannot answer (missing statistics / numNulls unset)
    * — the caller then falls back for the whole batch. */
  private def columnNulls(schema: MessageType,
                          blocks: Seq[org.apache.parquet.hadoop.metadata.BlockMetaData],
                          col: String): Option[Long] = {
    if (!schema.containsField(col)) return None
    var total = 0L
    blocks.foreach { b =>
      val chunk = b.getColumns.asScala
        .find(_.getPath.toDotString == col).getOrElse(return None)
      val st = chunk.getStatistics
      if (st == null || !st.isNumNullsSet) return None
      total += st.getNumNulls
    }
    Some(total)
  }

  private def ordering(prim: PrimitiveType): Option[Ordering[Any]] =
    prim.getPrimitiveTypeName match {
      // parquet's min/max comparator for these physical types is the
      // signed value order — the same order Spark's min/max aggregates
      // use, so cross-block merging here is exact
      case INT64 => Some(Ordering.by((a: Any) => a.asInstanceOf[java.lang.Long].longValue()))
      case INT32 => Some(Ordering.by((a: Any) => a.asInstanceOf[java.lang.Integer].intValue()))
      case DOUBLE => Some(Ordering.by((a: Any) => a.asInstanceOf[java.lang.Double].doubleValue()))
      case FLOAT => Some(Ordering.by((a: Any) => a.asInstanceOf[java.lang.Float].floatValue()))
      case BOOLEAN => Some(Ordering.by((a: Any) => a.asInstanceOf[java.lang.Boolean].booleanValue()))
      case FIXED_LEN_BYTE_ARRAY | BINARY if isDecimal(prim) =>
        Some(Ordering.by((a: Any) => new BigInteger(binaryBytes(a))))
      case _ => None
    }

  private def isDecimal(prim: PrimitiveType): Boolean =
    prim.getLogicalTypeAnnotation.isInstanceOf[DecimalLogicalTypeAnnotation]

  private def binaryBytes(a: Any): Array[Byte] =
    a.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes

  /** Value → the string Spark's cast-to-string produces, or None when
    * the (physical, logical) pair isn't on the exactness allowlist. */
  private def renderer(prim: PrimitiveType, zone: ZoneId): Option[Any => String] =
    (prim.getPrimitiveTypeName, prim.getLogicalTypeAnnotation) match {
      case (INT64, t: TimestampLogicalTypeAnnotation) =>
        val toMicros: Long => Long = t.getUnit match {
          case LogicalTypeAnnotation.TimeUnit.MICROS => identity
          case LogicalTypeAnnotation.TimeUnit.MILLIS => _ * 1000L
          case _ => return None // NANOS: truncation would skew the bound
        }
        val adjusted = t.isAdjustedToUTC
        Some(a => tsString(toMicros(a.asInstanceOf[java.lang.Long]), zone, adjusted))
      case (INT64, d: DecimalLogicalTypeAnnotation) =>
        Some(a => JBigDecimal.valueOf(a.asInstanceOf[java.lang.Long], d.getScale).toString)
      case (INT64, null | _: IntLogicalTypeAnnotation) =>
        Some(a => a.asInstanceOf[java.lang.Long].toString)
      case (INT32, _: DateLogicalTypeAnnotation) =>
        Some(a => LocalDate.ofEpochDay(a.asInstanceOf[java.lang.Integer].longValue()).toString)
      case (INT32, d: DecimalLogicalTypeAnnotation) =>
        Some(a => JBigDecimal.valueOf(a.asInstanceOf[java.lang.Integer].longValue(), d.getScale).toString)
      case (INT32, null | _: IntLogicalTypeAnnotation) =>
        Some(a => a.asInstanceOf[java.lang.Integer].toString)
      case (DOUBLE, _) => Some(a => a.asInstanceOf[java.lang.Double].toString)
      case (FLOAT, _) => Some(a => a.asInstanceOf[java.lang.Float].toString)
      case (BOOLEAN, _) => Some(a => a.asInstanceOf[java.lang.Boolean].toString)
      case (FIXED_LEN_BYTE_ARRAY | BINARY, d: DecimalLogicalTypeAnnotation) =>
        Some(a => new JBigDecimal(new BigInteger(binaryBytes(a)), d.getScale).toString)
      case _ => None
    }

  /** Spark's timestamp cast rendering: "yyyy-MM-dd HH:mm:ss" plus a
    * trailing-zero-trimmed fraction; instants render in the session
    * zone, NTZ values are zone-free local datetimes. */
  private def tsString(micros: Long, zone: ZoneId, adjustedToUtc: Boolean): String = {
    val secs = Math.floorDiv(micros, 1000000L)
    val frac = Math.floorMod(micros, 1000000L)
    val ldt =
      if (adjustedToUtc)
        LocalDateTime.ofInstant(java.time.Instant.ofEpochSecond(secs), zone)
      else LocalDateTime.ofEpochSecond(secs, 0, ZoneOffset.UTC)
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d" +
      f" ${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    if (frac == 0L) base
    else base + "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse
  }
}
