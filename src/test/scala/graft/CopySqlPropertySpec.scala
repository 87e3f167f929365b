package graft

import graft.ops.Manifest
import graft.sources.ManifestSql
import org.scalacheck.{Gen, Prop, Test => SCTest}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** End-to-end property for the COPY INTO statement parser: a staged
  * CSV written with RANDOM conventions (delimiter, NULL sentinel,
  * header presence) loads correctly when — and only because — the
  * statement's FILE_FORMAT block names those same conventions. The
  * whole path is public surface: statement text → `runDml` → option
  * mapping → scan → NULL_IF → typed casts → atomic commit → read
  * back. Any drift between what the block SAYS and what the scan
  * DOES shows up as a wrong cell, a phantom row (header not
  * skipped), or a missed NULL.
  */
class CopySqlPropertySpec extends SparkSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  test("property: FILE_FORMAT block round-trips delimiter/header/NULL sentinel") {
    val genDelim = Gen.oneOf(",", ";", "|")
    val genNull = Gen.oneOf("NULL", "NA", "-")
    val genHeader = Gen.oneOf(true, false)
    check(Prop.forAll(genDelim, genNull, genHeader) { (delim, nullStr, header) =>
      val stage = Files.createTempDirectory("graft-copyprop").toString
      val d = delim
      // trans-schema row set exercising: quoted delimiter, doubled
      // quote, the batch's NULL sentinel, and a plain row
      val rows = Seq(
        Seq("1", "10", "100", "2", "5.25", "USD", "2024-01-02 03:04:05", "plain"),
        Seq("2", "20", "200", nullStr, "1.50", "EUR", "2024-01-02 03:04:06",
          "has" + d + "delim"), // must be enclosed to survive
        Seq("3", "30", "300", "4", nullStr, "GBP", "2024-01-02 03:04:07",
          "has\"quote"))
      def cell(v: String): String =
        if (v.contains(d) || v.contains("\""))
          "\"" + v.replace("\"", "\"\"") + "\""
        else v
      val headerLine =
        if (header)
          Seq(Seq("trans_id", "order_id", "product_id", "quantity",
            "unit_price", "currency", "trans_ts", "note").mkString(d))
        else Nil
      val body = rows.map(_.map(cell).mkString(d))
      Files.write(Paths.get(stage, "f.csv"),
        (headerLine ++ body).mkString("", "\n", "\n")
          .getBytes(StandardCharsets.UTF_8))
      val root = Files.createTempDirectory("graft-copyprop-root").toString
      val delimSql = if (d == "\t") "\\t" else d
      val rep = ManifestSql.runDml(spark, root,
        s"""COPY INTO t FROM '$stage' FILES = ('f.csv')
           |FILE_FORMAT = (TYPE = CSV FIELD_DELIMITER = '$delimSql'
           |  SKIP_HEADER = ${if (header) 1 else 0}
           |  FIELD_OPTIONALLY_ENCLOSED_BY = '"'
           |  NULL_IF = ('$nullStr'))""".stripMargin).collect()
      val got = Manifest.readTable(spark, root, "t")
        .collect().map(r => r.getLong(0) -> r).toMap
      val ok =
        rep.map(_.getLong(1)).sum == 3L &&
          got.size == 3 &&
          got(1L).getInt(3) == 2 &&
          got(2L).isNullAt(3) && // sentinel quantity → NULL
          got(2L).getString(7) == ("has" + d + "delim") &&
          got(3L).isNullAt(4) && // sentinel price → NULL
          got(3L).getString(7) == "has\"quote"
      graft.ops.Staging.deleteRecursively(Paths.get(stage))
      graft.ops.Staging.deleteRecursively(Paths.get(root))
      ok
    })
  }

  test("property: time-travel rewrite is the identity on clause-free statements") {
    // statements WITHOUT a travel clause — including ones whose string
    // LITERALS contain clause-shaped text — must pass through
    // byte-identical (the rewrite must not touch, trim, or re-space
    // anything it does not resolve). The root is irrelevant on the
    // identity path: no clause ⇒ no registration ⇒ no filesystem read.
    val ident = Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
    val lit = Gen.oneOf(
      "plain text", "x VERSION AS OF 1", "TIMESTAMP AS OF '2024-01-01 00:00:00'",
      "where, = (")
    val stmt = for {
      t <- ident; c <- ident; l <- lit
    } yield s"SELECT $c, '$l' AS s FROM $t WHERE $c > 0 ORDER BY $c"
    check(Prop.forAll(stmt) { sql =>
      ManifestSql.rewriteTimeTravel(spark, "/nonexistent-root", sql) == sql
    })
  }
}
