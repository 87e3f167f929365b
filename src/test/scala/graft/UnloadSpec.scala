package graft

import graft.ops.Ingest

import java.io.File
import java.nio.file.Files
import java.util.zip.GZIPInputStream
import scala.io.Source

/** Writer-side certification of the UNLOAD path (q180/q181): the gate
  * hash-checks parse-equivalence; this spec pins the FILE facts a
  * downstream consumer depends on — part-file split count, gzip codec,
  * per-file header, the NULL sentinel, and quote doubling in the raw
  * bytes.
  */
class UnloadSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def gunzipLines(f: File): Seq[String] = {
    val in = new GZIPInputStream(Files.newInputStream(f.toPath))
    try Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  test("unload splits into the requested gzip part files, each with a header") {
    val dir = new File(Ingest.unloadOrders(spark, sfDir))
    val parts = dir.listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.length == 4) // the MAX_FILE_SIZE analogue: 4-way split
    assert(parts.forall(_.getName.endsWith(".csv.gz")))
    val headers = parts.map(p => gunzipLines(p).head).distinct.toSeq
    assert(headers ==
      Seq("o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,note,comment_n"))
  }

  test("unloaded bytes carry the file_format edges: doubled quotes, NULL sentinel") {
    val dir = new File(Ingest.unloadOrders(spark, sfDir))
    val lines = dir.listFiles().filter(_.getName.startsWith("part-"))
      .flatMap(p => gunzipLines(p).drop(1)).toSeq
    // note embeds a quote and a comma → every line quotes it with doubling
    assert(lines.forall(_.contains("\"pri \"\"")))
    // every 7th orderkey nulls comment_n → unquoted NULL sentinel at line end
    assert(lines.exists(_.endsWith(",NULL")))
    // rows survive intact: line count equals the source row count
    assert(lines.size == Ingest.unloadSource(spark, sfDir).count())
  }

  test("readback row set equals the unloaded relation exactly") {
    import org.apache.spark.sql.functions.col
    val back = SparkEntry.queries("q180_unload_csv")(spark, sfDir)
    // the CSV chain itself runs typed (decimal(12,2) / TIMESTAMP_NTZ —
    // unloadSchema); only the gate-visible relation normalizes to
    // double/timestamp (the q175/q178 hasher convention), so the spec
    // compares in the normalized domain on both sides
    val src = Ingest.unloadSource(spark, sfDir)
      .withColumn("o_totalprice", col("o_totalprice").cast("double"))
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .orderBy("o_orderkey")
    assert(back.schema("o_totalprice").dataType.typeName == "double")
    assert(back.schema("o_orderdate").dataType.typeName == "timestamp")
    assert(back.schema.fieldNames.toSeq == Ingest.unloadSchema.fieldNames.toSeq)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }
}
