package graft

import graft.ops.Ingest
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import java.time.LocalDate

class IngestSpec extends SparkSuite {

  test("stagedFileName renders the reference's MMddyyyy Jinja slice") {
    assert(Ingest.stagedFileName(LocalDate.of(2022, 7, 13)) ==
      "product_order_trans_07132022.csv")
  }

  test("nullIf normalizes the NULL_IF set on string columns only") {
    import spark.implicits._
    val df = Seq(("NULL", 1), ("null", 2), ("", 3), ("ok", 4)).toDF("s", "i")
    val out = Ingest.nullIf(df).collect().toSeq
    assert(out == Seq(Row(null, 1), Row(null, 2), Row(null, 3), Row("ok", 4)))
  }

  test("copyInto parses every §2.2.1 edge: nulls, quoting, backslash") {
    val stage = Ingest.writeStageFixtures()
    val df = Ingest.copyInto(spark, stage,
      Seq(Ingest.stagedFileName(LocalDate.of(2022, 7, 13)))).orderBy("trans_id")
    val rows = df.collect()
    assert(rows.length == 8)
    assert(df.schema == Ingest.transSchema)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(1002L).isNullAt(3)) // NULL quantity
    assert(byId(1003L).isNullAt(4)) // null unit_price
    assert(byId(1004L).isNullAt(5)) // empty currency
    assert(byId(1005L).getString(7) == "quoted, with comma")
    assert(byId(1006L).getString(7) == "embedded \"quote\" here")
    assert(byId(1007L).getString(7) == "back\\slash note")
    assert(byId(1008L).isNullAt(2)) // missing product_id
  }

  test("backfill loads one partition per logical date, idempotent re-run") {
    val stage = Ingest.writeStageFixtures()
    val df = Ingest.backfill(spark, stage, Ingest.backfillStart, Ingest.backfillEnd)
    val counts = df.groupBy("load_date").count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(counts == Map("2022-07-13" -> 8L, "2022-07-14" -> 8L, "2022-07-15" -> 8L))
    // re-running the fixture writer and the read yields identical results
    val again = Ingest.backfill(spark, Ingest.writeStageFixtures(),
      Ingest.backfillStart, Ingest.backfillEnd)
    assert(again.count() == 24L)
  }

  test("copyOnErrorContinue loads exactly the clean rows and audits the rest") {
    val stage = Ingest.writeDirtyStageFixtures()
    val (loaded, audit) =
      Ingest.copyOnErrorContinue(spark, stage, Seq(Ingest.dirtyFileA, Ingest.dirtyFileB))
    // the loaded relation must MATERIALIZE under ANSI mode (a plain cast
    // on 'abc'/'not-a-timestamp' would throw here, not classify)
    val rows = loaded.orderBy("trans_id").collect()
    assert(rows.map(_.getLong(0)).toSeq ==
      Seq(2001L, 2004L, 2006L, 2101L, 2103L, 2104L))
    // surviving rows are fully typed (no nulls smuggled in by try_cast)
    assert(rows.forall(r => !r.isNullAt(3) && !r.isNullAt(4) && !r.isNullAt(6)))
    val a = audit.orderBy("file_name").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(a(Ingest.dirtyFileA) == ((6L, 3L, 3L)))
    assert(a(Ingest.dirtyFileB) == ((4L, 3L, 1L)))
  }

  test("malformed-record modes: PERMISSIVE captures, DROPMALFORMED drops, FAILFAST throws") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-badrec")
    java.nio.file.Files.writeString(dir.resolve("part.json"),
      """{"id": 1, "v": 10}
        |{"id": 2, "v": "not-a-number"}
        |{"id": 3, "v": 30}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType),
      StructField("_corrupt_record", StringType)))

    // PERMISSIVE (the load-and-audit default): bad row survives with its
    // raw text in _corrupt_record, good fields null — the audit trail a
    // 100 TB load needs instead of dying 90 TB in
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").json(dir.toString)
      .cache() // one parse: corrupt-record column must not re-read lazily
    assert(permissive.count() == 3)
    val bad = permissive.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record").contains("not-a-number"))

    val dropped = spark.read
      .schema(StructType(schema.dropRight(1)))
      .option("mode", "DROPMALFORMED").json(dir.toString)
    // collect(), not count(): count() prunes every column, so the parser
    // never touches `v` and malformed rows are not detected/dropped
    assert(dropped.collect().length == 2)

    val failfast = spark.read
      .schema(StructType(schema.dropRight(1)))
      .option("mode", "FAILFAST").json(dir.toString)
    val e = intercept[org.apache.spark.SparkException] { failfast.collect() }
    assert(e.getMessage.contains("MALFORMED_RECORD") ||
      e.getCause != null, e.getMessage)
  }
}
