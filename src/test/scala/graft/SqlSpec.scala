package graft

import graft.ops.Sql
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class SqlSpec extends AnyFunSuite {

  /** scalatestplus bridge isn't on the offline classpath — run
    * ScalaCheck directly and assert the result. */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("splitStatements splits on top-level semicolons") {
    assert(Sql.splitStatements("SELECT 1; SELECT 2 ; SELECT 3") ==
      Seq("SELECT 1", "SELECT 2", "SELECT 3"))
  }

  test("splitStatements ignores semicolons in single-quoted strings") {
    assert(Sql.splitStatements("INSERT INTO t VALUES ('a;b'); SELECT 1") ==
      Seq("INSERT INTO t VALUES ('a;b')", "SELECT 1"))
  }

  test("splitStatements handles '' escaped quotes") {
    assert(Sql.splitStatements("SELECT 'it''s; fine'; SELECT 2") ==
      Seq("SELECT 'it''s; fine'", "SELECT 2"))
  }

  test("splitStatements ignores semicolons in comments and identifiers") {
    assert(Sql.splitStatements("SELECT 1 -- no; split\n; SELECT \"a;b\"; SELECT /* x; y */ 2") ==
      Seq("SELECT 1 -- no; split", "SELECT \"a;b\"", "SELECT /* x; y */ 2"))
  }

  test("splitStatements drops empty trailing statement") {
    assert(Sql.splitStatements("SELECT 1;") == Seq("SELECT 1"))
    assert(Sql.splitStatements(";;") == Seq.empty)
  }

  test("property: N joined simple statements split back to N") {
    val stmtGen = Gen.chooseNum(0, 99).map(i => s"INSERT INTO t VALUES ('name', $i)")
    check(Prop.forAll(Gen.nonEmptyListOf(stmtGen)) { stmts =>
      Sql.splitStatements(stmts.mkString("; ")) == stmts
    })
  }

  test("property: statements containing quoted semicolons round-trip") {
    // string literal content: any printable chars, quotes pre-doubled
    val litGen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(';', ' ', ',')))
      .map(_.mkString)
    val stmtGen = litGen.map(s => s"SELECT '${s.replace("'", "''")}' AS c")
    check(Prop.forAll(Gen.nonEmptyListOf(stmtGen)) { stmts =>
      Sql.splitStatements(stmts.mkString(";")) == stmts
    })
  }

  test("splitStatements handles backslash-escaped quotes") {
    assert(Sql.splitStatements("INSERT INTO t VALUES ('O\\'Brien; Jr'); SELECT 1") ==
      Seq("INSERT INTO t VALUES ('O\\'Brien; Jr')", "SELECT 1"))
  }

  test("'/*/' is a comment OPENER, not a complete comment") {
    assert(Sql.splitStatements("SELECT 1 /*/ note; still comment */; SELECT 2") ==
      Seq("SELECT 1 /*/ note; still comment */", "SELECT 2"))
  }

  test("comment-only fragments are not statements") {
    assert(Sql.splitStatements("INSERT INTO t VALUES (1); -- done\n") ==
      Seq("INSERT INTO t VALUES (1)"))
    assert(Sql.splitStatements("-- only a comment\n; /* and another */") == Seq.empty)
  }

  test("translateDialect maps sysdate() and lowers CREATE OR REPLACE") {
    assert(Sql.translateDialect("INSERT INTO t VALUES (SYSDATE())") ==
      "INSERT INTO t VALUES (current_timestamp())")
    val out = Sql.translateDialect("CREATE OR REPLACE TRANSIENT TABLE dev_test (id INT)")
    assert(out == "DROP TABLE IF EXISTS dev_test; CREATE TABLE dev_test (id INT)")
    assert(Sql.splitStatements(out).size == 2)
  }

  test("runScript covers INSERT OVERWRITE and CREATE OR REPLACE VIEW") {
    val s = SparkSuite.session
    Sql.dropTable(s, "graft_ow")
    val out = Sql.runScript(s,
      """CREATE TABLE graft_ow (v INT) USING parquet;
        |INSERT INTO graft_ow VALUES (1);
        |INSERT OVERWRITE graft_ow VALUES (2), (3);
        |CREATE OR REPLACE TEMPORARY VIEW graft_ow_v AS SELECT sum(v) AS s FROM graft_ow;
        |SELECT s FROM graft_ow_v""".stripMargin)
    assert(out.head().getLong(0) == 5L) // overwrite replaced the 1
  }

  test("translateQualify: no QUALIFY → text unchanged") {
    val sql = "SELECT a FROM t WHERE b = 'QUALIFY x' ORDER BY a"
    assert(Sql.translateQualify(sql) == sql) // quoted keyword ignored
    val sub = "SELECT * FROM (SELECT a FROM t QUALIFY rn = 1) s"
    assert(Sql.translateQualify(sub) == sub) // parenthesized = not top level
  }

  test("translateQualify rewrites the clause and preserves the ORDER BY tail") {
    val s = SparkSuite.session
    import s.implicits._
    Seq((1, 10), (1, 20), (2, 30), (2, 5), (2, 1)).toDF("k", "v")
      .createOrReplaceTempView("graft_qual")
    val out = Sql.runScript(s, Sql.translateDialect(
      """SELECT k, v,
        |  row_number() OVER (PARTITION BY k ORDER BY v DESC) AS rn
        |FROM graft_qual
        |QUALIFY rn = 1
        |ORDER BY k""".stripMargin))
    assert(out.columns.toSeq == Seq("k", "v", "rn")) // helper col dropped
    assert(out.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((1, 20), (2, 30)))
  }

  test("translateQualify handles a window function directly in the predicate") {
    val s = SparkSuite.session
    import s.implicits._
    Seq((1, 10), (1, 20), (2, 30)).toDF("k", "v")
      .createOrReplaceTempView("graft_qual2")
    val out = Sql.runScript(s, Sql.translateQualify(
      "SELECT k, v FROM graft_qual2 QUALIFY rank() OVER (PARTITION BY k ORDER BY v DESC) = 1"))
    assert(out.collect().map(r => (r.getInt(0), r.getInt(1))).toSet ==
      Set((1, 20), (2, 30)))
  }
}
