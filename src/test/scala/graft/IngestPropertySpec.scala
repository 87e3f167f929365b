package graft

import graft.ops.Ingest
import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the ingest normalization path (SURVEY.md §5.3). */
class IngestPropertySpec extends SparkSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }

  test("property: nullIf is idempotent") {
    import spark.implicits._
    val cell = Gen.oneOf(Gen.const("NULL"), Gen.const("null"), Gen.const(""),
      Gen.alphaNumStr.map(_.take(8)))
    check(Prop.forAll(Gen.listOfN(6, cell)) { cells =>
      val df = cells.zipWithIndex.map { case (c, i) => (i, c) }.toDF("i", "s")
      val once = Ingest.nullIf(df).collect().sortBy(_.getInt(0)).toSeq
      val twice = Ingest.nullIf(Ingest.nullIf(df)).collect().sortBy(_.getInt(0)).toSeq
      once == twice
    })
  }

  test("CSV round-trip: write with engine options, read back equals source modulo NULL_IF") {
    import spark.implicits._
    val src = Seq(
      (1L, "plain", "USD"),
      (2L, "has,comma", "EUR"),
      (3L, "has\"quote", "GBP"),
      (4L, "NULL", "JPY"),    // NULL_IF sentinel → null after read
      (5L, "back\\slash", "CHF"))
      .toDF("id", "note", "cur")
    val dir = java.nio.file.Files.createTempDirectory("graft-rt").toString
    src.coalesce(1).write.mode("overwrite")
      .options(Ingest.csvOptions).csv(dir)
    val back = Ingest.nullIf(
      spark.read.options(Ingest.csvOptions)
        .schema("id LONG, note STRING, cur STRING").csv(dir))
      .collect().sortBy(_.getLong(0)).toSeq
    val expected = Ingest.nullIf(src).collect().sortBy(_.getLong(0)).toSeq
    assert(back == expected)
    assert(back(3) == Row(4L, null, "JPY")) // sentinel normalized
  }
}
