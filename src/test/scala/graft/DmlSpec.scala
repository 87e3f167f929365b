package graft

import graft.ops.Manifest
import graft.sources.ManifestSql
import org.apache.spark.sql.functions._

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** SQL DML over manifest tables (q219): verbatim DELETE/UPDATE text
  * routes to the merge-on-read commit path; the statement splits
  * (WHERE, comma, `=`) are quote- and paren-aware; everything else
  * falls through to `spark.sql`.
  */
class DmlSpec extends SparkSuite {

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-dml-spec").toString

  test("DELETE and UPDATE text commit merge-on-read with SQL semantics") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, Some(1.0)), (2L, Some(2.0)), (3L, None), (4L, Some(4.0)))
        .toDF("k", "v").coalesce(1))
    ManifestSql.runDml(spark, root,
      "DELETE FROM t WHERE k = 4; UPDATE t SET v = v * 10 WHERE v >= 2.0")
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    // k=4 deleted; k=2 matched the update; k=3 NULL predicate kept
    assert(got == Map(1L -> Some(1.0), 2L -> Some(20.0), 3L -> None))
  }

  test("keywords and separators inside string literals do not split") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1))
    ManifestSql.runDml(spark, root,
      "UPDATE t SET s = 'where x, = (1' WHERE k = 1")
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "where x, = (1", 2L -> "b"))
  }

  test("multi-assignment SET evaluates against the old row (swap)") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 10.0, 100.0), (2L, 20.0, 200.0)).toDF("k", "v", "w").coalesce(1))
    ManifestSql.runDml(spark, root, "UPDATE t SET v = w, w = v WHERE k = 2")
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 10.0, 100.0), (2L, 200.0, 20.0)))
  }

  test("unqualified forms hit every row; SELECT passes through") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").coalesce(1))
    ManifestSql.runDml(spark, root, "UPDATE t SET v = v + 1")
    assert(Manifest.readTable(spark, root, "t")
      .agg(sum("v")).head().getDouble(0) == 5.0)
    val out = ManifestSql.runDml(spark, root,
      "UPDATE t SET v = 0 WHERE k = 1; SELECT 7 AS x")
    assert(out.head().getInt(0) == 7)
    ManifestSql.runDml(spark, root, "DELETE FROM t")
    assert(Manifest.readTable(spark, root, "t").count() == 0L)
  }

  test("malformed SET is rejected loudly") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "UPDATE t SET v WHERE k = 1")
    }
  }

  test("q219 staged root survives with its original files intact") {
    val sfDir = "/root/testdata/sf0.001"
    val root = ManifestSql.dmlRoot(spark, sfDir)
    val raw = Tables.load(spark, sfDir, "events")
    val lo = lit("2024-01-10 00:00:00").cast("timestamp")
    val hi = lit("2024-01-13 00:00:00").cast("timestamp")
    val expect = raw.filter(!(col("ts") >= lo && col("ts") < hi)).count()
    assert(Manifest.readTable(spark, root, "events_log").count() == expect)
  }

  test("MERGE INTO text upserts via a subquery or a view-name source") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").coalesce(1))
    Seq((2L, 200.0), (3L, 300.0)).toDF("k", "v")
      .createOrReplaceTempView("merge_src_view")
    ManifestSql.runDml(spark, root,
      """MERGE INTO t USING merge_src_view AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == Map(1L -> 10.0, 2L -> 200.0, 3L -> 300.0))
    // subquery source, string literal containing ' on ' and ' when '
    ManifestSql.runDml(spark, root,
      """MERGE INTO t USING (
        |  SELECT k, v * 2 AS v FROM merge_src_view
        |  WHERE 'x on y when z' = 'x on y when z' AND k = 3) AS s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(Manifest.readTable(spark, root, "t")
      .filter(col("k") === 3L).head().getDouble(1) == 600.0)
  }

  test("conditional WHEN clause applies; non-equi ON shapes still refuse") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    Seq((1L, 2.0)).toDF("k", "v").createOrReplaceTempView("merge_bad_src")
    // a conditional SET * routes through the clause path now
    ManifestSql.runDml(spark, root,
      """MERGE INTO t USING merge_bad_src AS s ON t.k = s.k
        |WHEN MATCHED AND s.v > 1 THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(Manifest.readTable(spark, root, "t").head().getDouble(1) == 2.0)
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """MERGE INTO t USING merge_bad_src AS s ON t.k >= s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    // the rejected statement committed nothing
    assert(Manifest.readTable(spark, root, "t").head().getDouble(1) == 2.0)
  }

  test("clause-form MERGE: first match wins, NULL conditions do not pass, DELETE routes") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 10.0, "a"), (2L, 20.0, "a"), (3L, 30.0, "a"), (4L, 40.0, "a"))
        .toDF("k", "v", "tag").coalesce(1))
    Seq((1L, Some(100.0)), (2L, None), (3L, Some(0.5)),
        (5L, Some(50.0)), (6L, None))
      .toDF("k", "v").createOrReplaceTempView("clause_src")
    ManifestSql.runDml(spark, root,
      """MERGE INTO t USING clause_src s ON t.k = s.k
        |WHEN MATCHED AND s.v > 50 THEN DELETE
        |WHEN MATCHED AND s.v > 0.4 THEN UPDATE SET v = t.v + s.v, tag = 'hit'
        |WHEN NOT MATCHED AND s.v IS NOT NULL THEN
        |  INSERT (k, tag) VALUES (s.k, 'new')""".stripMargin)
    val got = Manifest.readTable(spark, root, "t").collect()
      .map(r => (r.getLong(0),
        (Option(r.get(1)).map(_.asInstanceOf[Double]), r.getString(2)))).toMap
    // k=1: 100 > 50 → first clause (DELETE) wins over the also-true update
    // k=2: NULL condition passes NOTHING → row survives unchanged
    // k=3: second clause → old-row SET; k=4: unmatched target → unchanged
    // k=5: insert clause, unlisted v NULL-fills
    // k=6: NULL insert condition → not inserted
    assert(got == Map(
      2L -> (Some(20.0), "a"), 3L -> (Some(30.5), "hit"),
      4L -> (Some(40.0), "a"), 5L -> (None, "new")))
  }

  test("clause-form MERGE refusals: dup source keys, unknown SET column, arity, evolve/BY SOURCE combos") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    Seq((1L, 2.0), (1L, 3.0)).toDF("k", "v")
      .createOrReplaceTempView("clause_dup_src")
    Seq((1L, 2.0)).toDF("k", "v").createOrReplaceTempView("clause_one_src")
    // duplicate source keys refuse in the clause path too
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """MERGE INTO t USING clause_dup_src s ON t.k = s.k
          |WHEN MATCHED AND s.v > 1 THEN UPDATE SET v = s.v""".stripMargin)
    }
    // SET of a column the table does not have
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """MERGE INTO t USING clause_one_src s ON t.k = s.k
          |WHEN MATCHED AND s.v > 1 THEN UPDATE SET nosuch = 1""".stripMargin)
    }
    // INSERT column/value arity mismatch
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """MERGE INTO t USING clause_one_src s ON t.k = s.k
          |WHEN NOT MATCHED AND s.v > 1 THEN INSERT (k) VALUES (s.k, 1)""".stripMargin)
    }
    // WITH SCHEMA EVOLUTION supports only the full-row shorthand
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """MERGE WITH SCHEMA EVOLUTION INTO t USING clause_one_src s
          |ON t.k = s.k
          |WHEN MATCHED AND s.v > 1 THEN UPDATE SET v = s.v""".stripMargin)
    }
    // evolve + BY SOURCE refuses even on the shorthand head
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """MERGE WITH SCHEMA EVOLUTION INTO t USING clause_one_src s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    }
    // none of the rejected statements committed anything
    assert(Manifest.readTable(spark, root, "t").head().getDouble(1) == 1.0)
  }

  test("clause-form MERGE with BY SOURCE: conditional delete, update, first-match") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 10.0, "live"), (2L, 20.0, "live"), (3L, 30.0, "live"),
          (4L, 200.0, "live"))
        .toDF("k", "v", "st").coalesce(1))
    Seq((1L, 99.0)).toDF("k", "v").createOrReplaceTempView("bysrc_spec")
    // k=1 matched (updates); k=2..4 unmatched by source:
    //   v >= 100 → DELETE (k=4); v >= 25 → retired (k=3); else keep (k=2)
    ManifestSql.runDml(spark, root,
      """MERGE INTO t USING bysrc_spec s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED BY SOURCE AND t.v >= 100 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE AND v >= 25 THEN
        |  UPDATE SET st = 'retired'""".stripMargin)
    val got = Manifest.readTable(spark, root, "t").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getString(2)))).toMap
    assert(got == Map(1L -> (99.0, "live"), 2L -> (20.0, "live"),
      3L -> (30.0, "retired")))
    // BY-SOURCE-only statement (no core clauses): legal, and an
    // empty-interval source with BY SOURCE truncates conditionally
    ManifestSql.runDml(spark, root,
      """MERGE INTO t USING bysrc_spec s ON t.k = s.k
        |WHEN NOT MATCHED BY SOURCE AND st = 'retired' THEN DELETE""".stripMargin)
    assert(Manifest.readTable(spark, root, "t")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("INSERT INTO and CTAS route to manifest commits; VALUES form works; re-CTAS refuses") {
    val root = freshRoot()
    ManifestSql.runDml(spark, root,
      "CREATE TABLE t AS SELECT 1L AS k, 10.0D AS v")
    ManifestSql.runDml(spark, root, "INSERT INTO t VALUES (2L, 20.0D)")
    ManifestSql.runDml(spark, root,
      "INSERT INTO t SELECT 3L AS k, 30.0D AS v")
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // re-CTAS refuses and commits nothing
    val v = Manifest.snapshotVersion(root)
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "CREATE TABLE t AS SELECT 9L AS k, 0.0D AS v")
    }
    assert(Manifest.snapshotVersion(root) == v)
    // INSERTs respect CHECK constraints like any append
    Manifest.addCheckConstraint(spark, root, "t", "pos", "v >= 0")
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "INSERT INTO t VALUES (4L, -1.0D)")
    }
    assert(Manifest.readTable(spark, root, "t").count() == 3L)
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT as SQL text") {
    val root = freshRoot()
    ManifestSql.runDml(spark, root,
      "CREATE TABLE t AS SELECT 1L AS k, 5.0D AS v")
    ManifestSql.runDml(spark, root,
      "ALTER TABLE t ADD CONSTRAINT pos CHECK (v >= 0)")
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "INSERT INTO t VALUES (2L, -1.0D)")
    }
    // registration scans existing data: an impossible predicate refuses
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "ALTER TABLE t ADD CONSTRAINT impossible CHECK (v > 100)")
    }
    ManifestSql.runDml(spark, root, "ALTER TABLE t DROP CONSTRAINT pos")
    ManifestSql.runDml(spark, root, "INSERT INTO t VALUES (2L, -1.0D)")
    assert(Manifest.readTable(spark, root, "t").count() == 2L)
  }

  test("identifiers embedding keywords do not mis-split") {
    val root = freshRoot()
    // SET expression referencing a column whose name embeds 'where'
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0, 10.0), (2L, 2.0, 20.0))
        .toDF("k", "v", "my_where_col").coalesce(1))
    ManifestSql.runDml(spark, root,
      "UPDATE t SET v = my_where_col WHERE k = 1")
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == Map(1L -> 10.0, 2L -> 2.0))
    // MERGE source view whose name embeds 'on' — the ON split must
    // find the clause keyword, not the fragment inside the identifier
    Manifest.commitAppend(spark, root, "totals",
      Seq((1L, 5.0)).toDF("k", "x").coalesce(1))
    Seq((1L, 50.0), (3L, 30.0)).toDF("k", "x")
      .createOrReplaceTempView("totals_on_hand")
    ManifestSql.runDml(spark, root,
      """MERGE INTO totals USING totals_on_hand
        |ON totals.k = totals_on_hand.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val tot = Manifest.readTable(spark, root, "totals")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(tot == Map(1L -> 50.0, 3L -> 30.0))
  }

  test("COPY INTO as SQL text: FILES + FILE_FORMAT block, load report, NULL_IF") {
    val root = freshRoot()
    val stage = graft.ops.Ingest.writeStageFixtures()
    val f = graft.ops.Ingest.stagedFileName(graft.ops.Ingest.backfillStart)
    val rep = ManifestSql.runDml(spark, root,
      s"""COPY INTO t FROM '$stage' FILES = ('$f')
         |FILE_FORMAT = (TYPE = CSV FIELD_DELIMITER = ',' SKIP_HEADER = 1
         |  FIELD_OPTIONALLY_ENCLOSED_BY = '"' ESCAPE_UNENCLOSED_FIELD = NONE
         |  NULL_IF = ('NULL', 'null') EMPTY_FIELD_AS_NULL = TRUE)"""
        .stripMargin).collect()
    assert(rep.map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSeq == Seq((f, 8L, "LOADED")))
    val rows = Manifest.readTable(spark, root, "t")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 8)
    // NULL_IF applied before the typed casts: 'NULL' quantity, 'null'
    // price, and (EMPTY_FIELD_AS_NULL) empty currency are SQL NULL
    assert(rows(1002L).isNullAt(3))
    assert(rows(1003L).isNullAt(4))
    assert(rows(1004L).isNullAt(5))
    // quoted comma and doubled quote survive the enclosure options
    assert(rows(1005L).getString(7) == "quoted, with comma")
    assert(rows(1006L).getString(7) == "embedded \"quote\" here")
    // a second COPY appends (Snowflake COPY semantics; load-history
    // skip is copyIntoLogged's contract, not the plain statement's)
    ManifestSql.runDml(spark, root, s"COPY INTO t FROM '$stage' FILES = ('$f')")
    assert(Manifest.readTable(spark, root, "t").count() == 16L)
  }

  test("COPY INTO rejects malformed statements loudly") {
    val root = freshRoot()
    // unsupported clause
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "COPY INTO t FROM '/nope' ON_ERROR = 'CONTINUE'")
    }
    // unsupported format type
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "COPY INTO t FROM '/nope' FILE_FORMAT = (TYPE = JSON)")
    }
    // FILES and PATTERN are mutually exclusive
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "COPY INTO t FROM '/nope' FILES = ('a.csv') PATTERN = 'a.*'")
    }
    // unknown FILE_FORMAT key must not be silently ignored
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "COPY INTO t FROM '/nope' FILE_FORMAT = (VALIDATE_UTF8 = TRUE)")
    }
    // out-of-range SKIP_HEADER
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "COPY INTO t FROM '/nope' FILE_FORMAT = (SKIP_HEADER = 2)")
    }
  }

  test("maintenance verbs as SQL text: OPTIMIZE, VACUUM, RESTORE, DROP, TRUNCATE") {
    val root = freshRoot()
    // three single-file commits → OPTIMIZE packs them into one
    (1 to 3).foreach { i =>
      Manifest.commitAppend(spark, root, "t",
        Seq((i.toLong, i * 1.0)).toDF("k", "v").coalesce(1))
    }
    val rep = ManifestSql.runDml(spark, root, "OPTIMIZE t TARGET 1073741824")
      .collect()(0)
    assert(rep.getLong(1) == 3L && rep.getLong(2) == 1L,
      s"OPTIMIZE report: $rep")
    assert(Manifest.readTable(spark, root, "t").count() == 3L)
    // VACUUM DRY RUN prices the three packed-away files, moves nothing
    val dry = ManifestSql.runDml(spark, root,
      "VACUUM RETAIN 1 VERSIONS GRACE 0 DRY RUN").collect()(0)
    assert(dry.getLong(0) == 3L && dry.getLong(1) == 1L &&
      dry.getString(2) == "DRY RUN")
    assert(Manifest.readTable(spark, root, "t", 1L).count() == 1L) // intact
    // RESTORE rolls forward to the v2 file set
    ManifestSql.runDml(spark, root, "RESTORE TABLE t TO VERSION AS OF 2")
    assert(Manifest.readTable(spark, root, "t").count() == 2L)
    // TRUNCATE keeps the table listed with zero rows; DROP unlists
    Manifest.commitAppend(spark, root, "u",
      Seq((9L, 9.0)).toDF("k", "v").coalesce(1))
    val listed = ManifestSql.runDml(spark, root,
      "TRUNCATE TABLE t; SHOW TABLES")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(listed == Map("t" -> 0L, "u" -> 1L), listed.toString)
    ManifestSql.runDml(spark, root, "DROP TABLE u")
    val after = ManifestSql.runDml(spark, root, "SHOW TABLES")
      .collect().map(_.getString(0)).toSet
    assert(after == Set("t"))
    // pre-drop state time-travels (metadata-only drop)
    val preDrop = Manifest.snapshotVersion(root) - 1
    assert(Manifest.readTable(spark, root, "u", preDrop).count() == 1L)
    // absent table refuses loudly
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "DROP TABLE nope")
    }
    // DESCRIBE HISTORY surfaces the maintenance operations by name
    val ops = ManifestSql.runDml(spark, root, "DESCRIBE HISTORY t")
      .collect().map(_.getString(2)).toSet
    assert(Set("commitAppend", "compactTable", "commitRestore",
      "commitTruncate", "commitDropTable").subsetOf(ops), ops.toString)
  }

  test("COPY INTO location (unload) and CREATE OR REPLACE TABLE as SQL text") {
    val root = freshRoot()
    Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "c,d"))
      .toDF("k", "s").createOrReplaceTempView("unload_src_spec")
    val dest = Files.createTempDirectory("graft-unload-spec").toString + "/out"
    val rep = ManifestSql.runDml(spark, root,
      s"""COPY INTO '$dest' FROM unload_src_spec
         |FILE_FORMAT = (TYPE = CSV COMPRESSION = NONE NULL_IF = ('NULL'))"""
        .stripMargin).collect()(0)
    assert(rep.getLong(0) == 3L, s"unload report: $rep")
    val back = spark.read.format("csv")
      .options(graft.ops.Ingest.csvOptions).option("nullValue", "NULL")
      .schema("k LONG, s STRING").load(dest)
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(back == Set((1L, Some("a")), (2L, None), (3L, Some("c,d"))))
    // CREATE OR REPLACE swaps content atomically; plain CTAS refuses
    ManifestSql.runDml(spark, root, "CREATE TABLE t AS SELECT 1L AS k")
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "CREATE TABLE t AS SELECT 2L AS k")
    }
    ManifestSql.runDml(spark, root,
      "CREATE OR REPLACE TABLE t AS SELECT 2L AS k UNION ALL SELECT 3L AS k")
    assert(Manifest.readTable(spark, root, "t")
      .collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    // the replaced content time-travels
    assert(Manifest.readTable(spark, root, "t", 1L)
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("OPTIMIZE ZORDER BY and ALTER TABLE ADD COLUMN as SQL text") {
    val root = freshRoot()
    // 1024 rows over a 32x32 grid, range-committed by `a` — only the
    // leading dimension has pruning power before the rewrite
    val df = spark.range(1024).selectExpr(
      "id DIV 32 AS a", "id % 32 AS b", "CAST(id AS DOUBLE) AS v")
    Manifest.commitAppendStats(spark, root, "t", df, Seq("a"), "a", 4)
    val rep = ManifestSql.runDml(spark, root,
      "OPTIMIZE t ZORDER BY (a, b) SPLIT 16").collect()(0)
    assert(rep.getLong(1) == 4L && rep.getLong(2) == 16L, s"report: $rep")
    // a TRAILING-dimension predicate through the registered view now
    // prunes files (the property a range layout cannot provide)
    val idx = ManifestSql.register(spark, root, "t", "zorder_spec_t")
    val n = spark.sql(
      "SELECT count(*) AS n FROM zorder_spec_t WHERE b = 0")
      .collect()(0).getLong(0)
    assert(n == 32L)
    assert(idx.lastPrune._1 < idx.lastPrune._2,
      s"trailing-dimension predicate pruned nothing: ${idx.lastPrune}")
    // content preserved exactly; pre-rewrite layout time-travels
    assert(Manifest.readTable(spark, root, "t")
      .agg(sum(col("v"))).head().getDouble(0) == 523776.0)
    assert(Manifest.readTable(spark, root, "t", 1L).count() == 1024L)
    spark.catalog.dropTempView("zorder_spec_t")
    // ADD COLUMN registers the evolved schema; INSERT targets it;
    // old files NULL-fill on the evolved read
    ManifestSql.runDml(spark, root,
      "ALTER TABLE t ADD COLUMN tag STRING; " +
        "INSERT INTO t VALUES (99L, 99L, 0.5D, 'new')")
    intercept[IllegalArgumentException] { // duplicate column refuses
      ManifestSql.runDml(spark, root, "ALTER TABLE t ADD COLUMN tag STRING")
    }
    val evolved = Manifest.readTableEvolved(spark, root, "t")
    assert(evolved.schema.fieldNames.toSeq == Seq("a", "b", "v", "tag"))
    assert(evolved.count() == 1025L)
    assert(evolved.filter(col("tag").isNotNull).count() == 1L)
  }

  test("DELETE WHERE k IN (SELECT ...) routes through the semi-join DV path") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      (1L to 10L).toDF("k").withColumn("v", col("k") * 2.0).coalesce(1))
    Seq(2L, 4L, 999L).toDF("k").createOrReplaceTempView("doomed_spec")
    ManifestSql.runDml(spark, root,
      "DELETE FROM t WHERE k IN (SELECT k FROM doomed_spec)")
    assert(Manifest.readTable(spark, root, "t")
      .collect().map(_.getLong(0)).toSet == (1L to 10L).toSet -- Set(2L, 4L))
    // pre-delete state time-travels (merge-on-read)
    assert(Manifest.readTable(spark, root, "t", 1L).count() == 10L)
    // a multi-column subquery refuses loudly
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "DELETE FROM t WHERE k IN (SELECT k, k FROM doomed_spec)")
    }
    // a literal IN-list still takes the ordinary expression path
    ManifestSql.runDml(spark, root, "DELETE FROM t WHERE k IN (9, 10)")
    assert(Manifest.readTable(spark, root, "t").count() == 6L)
    // the two paths record their own operations in the history
    val ops = ManifestSql.runDml(spark, root, "DESCRIBE HISTORY t")
      .collect().map(_.getString(2)).toSet
    assert(Set("commitDeleteKeys", "commitDeleteVectors").subsetOf(ops), ops)
  }

  test("UPDATE WHERE k IN (SELECT ...) routes through the semi-join DV path") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      (1L to 10L).toDF("k").withColumn("v", col("k") * 1.0).coalesce(1))
    Seq(3L, 5L, 999L).toDF("k").createOrReplaceTempView("fixups_spec")
    ManifestSql.runDml(spark, root,
      "UPDATE t SET v = v + 100 WHERE k IN (SELECT k FROM fixups_spec)")
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(3L) == 103.0 && got(5L) == 105.0 && got(1L) == 1.0
      && got.size == 10, got.toString)
    // column ORDER of the new images matches the table (the semi-join
    // moves its key first internally; the rewrite must not)
    assert(Manifest.readTable(spark, root, "t")
      .schema.fieldNames.toSeq == Seq("k", "v"))
    // pre-update state time-travels; history names the keyed op
    assert(Manifest.readTable(spark, root, "t", 1L)
      .filter(col("v") > 100).count() == 0L)
    val ops = ManifestSql.runDml(spark, root, "DESCRIBE HISTORY t")
      .collect().map(_.getString(2)).toSet
    assert(ops.contains("commitUpdateKeys"), ops)
  }

  test("CREATE TABLE ... CLONE as SQL text — zero-copy, version-pinnable") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      (1L to 6L).toDF("k").coalesce(1))                    // v1
    Manifest.commitAppend(spark, root, "t",
      (7L to 9L).toDF("k").coalesce(1))                    // v2
    ManifestSql.runDml(spark, root, "CREATE TABLE dev SHALLOW CLONE t")
    ManifestSql.runDml(spark, root,
      "CREATE TABLE old CLONE t VERSION AS OF 1")
    assert(Manifest.readTable(spark, root, "dev").count() == 9L)
    assert(Manifest.readTable(spark, root, "old").count() == 6L)
    // divergence: DELETE on the clone leaves the source whole
    ManifestSql.runDml(spark, root, "DELETE FROM dev WHERE k > 3")
    assert(Manifest.readTable(spark, root, "dev").count() == 3L)
    assert(Manifest.readTable(spark, root, "t").count() == 9L)
    val ops = ManifestSql.runDml(spark, root, "DESCRIBE HISTORY dev")
      .collect().map(_.getString(2)).toSet
    assert(ops.contains("commitClone"), ops)
  }

  test("INSERT INTO ... REPLACE WHERE as SQL text swaps the slice atomically") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      (1L to 8L).toDF("k").withColumn("v", lit(1.0)).coalesce(2))
    ManifestSql.runDml(spark, root,
      "INSERT INTO t REPLACE WHERE k <= 2 SELECT * FROM VALUES " +
        "(CAST(1 AS BIGINT), 50.0D), (CAST(2 AS BIGINT), 50.0D)")
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 50.0 && got(2L) == 50.0 && got(3L) == 1.0
      && got.size == 8, got.toString)
    // contract: a batch row OUTSIDE the predicate refuses loudly
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "INSERT INTO t REPLACE WHERE k <= 2 SELECT * FROM VALUES " +
          "(CAST(99 AS BIGINT), 1.0D)")
    }
    assert(Manifest.readTable(spark, root, "t").count() == 8L)
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE THEN DELETE as SQL text") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v").coalesce(1))
    Seq((2L, 20.0), (9L, 9.0)).toDF("k", "v")
      .createOrReplaceTempView("sync_src_spec")
    ManifestSql.runDml(spark, root,
      """MERGE INTO t USING sync_src_spec s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(2L -> 20.0, 9L -> 9.0), got.toString)
    // conditional delete: unmatched rows failing the condition survive
    Seq((2L, 21.0)).toDF("k", "v").createOrReplaceTempView("sync_src_spec")
    ManifestSql.runDml(spark, root,
      """MERGE INTO t USING sync_src_spec s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND v > 100 THEN DELETE""".stripMargin)
    val got2 = Manifest.readTable(spark, root, "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got2 == Map(2L -> 21.0, 9L -> 9.0), got2.toString)
  }

  test("UNDROP TABLE restores the newest pre-drop state; guards hold") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      (1L to 6L).toDF("k").coalesce(2))
    Manifest.commitAppend(spark, root, "other",
      Seq(1L).toDF("x").coalesce(1))
    ManifestSql.runDml(spark, root, "DROP TABLE t")
    intercept[Exception] { Manifest.readTable(spark, root, "t") }
    // unrelated commit between drop and undrop
    Manifest.commitAppend(spark, root, "other", Seq(2L).toDF("x").coalesce(1))
    ManifestSql.runDml(spark, root, "UNDROP TABLE t")
    assert(Manifest.readTable(spark, root, "t").count() == 6L)
    // refuse while the table exists; refuse a name that never existed
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "UNDROP TABLE t")
    }
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "UNDROP TABLE ghost")
    }
    // vacuumed beyond recovery refuses loudly instead of resurrecting
    ManifestSql.runDml(spark, root, "DROP TABLE t")
    Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "UNDROP TABLE t")
    }
  }

  test("DROP TABLE unregisters the schema: a recreated table starts fresh") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    ManifestSql.runDml(spark, root, "ALTER TABLE t ADD COLUMN extra BIGINT")
    assert(Manifest.registeredSchema(spark, root, "t").exists(_.length == 3))
    ManifestSql.runDml(spark, root, "DROP TABLE t")
    assert(Manifest.registeredSchema(spark, root, "t").isEmpty)
    // recreate with a DIFFERENT shape: no stale registration leaks
    ManifestSql.runDml(spark, root,
      "CREATE TABLE t AS SELECT * FROM VALUES ('a', 1) AS v(s, n)")
    assert(Manifest.readTable(spark, root, "t").columns.toSeq == Seq("s", "n"))
    // UNDROP re-registers: drop the new one, restore the OLD t
    ManifestSql.runDml(spark, root, "DROP TABLE t; UNDROP TABLE t")
    assert(Manifest.readTable(spark, root, "t").columns.toSeq == Seq("s", "n"))
  }

  test("BEGIN...COMMIT lands the span as ONE atomic commit") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "a", Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    Manifest.commitAppend(spark, root, "b", Seq(("x", 1L)).toDF("s", "n").coalesce(1))
    val before = Manifest.snapshotVersion(root)
    val rep = ManifestSql.runDml(spark, root,
      """BEGIN TRANSACTION;
        |INSERT INTO a VALUES (2, 2.0);
        |INSERT INTO a VALUES (3, 3.0);
        |INSERT INTO b VALUES ('y', 2);
        |COMMIT""".stripMargin).head()
    // one claim for three statements across two tables
    assert(Manifest.snapshotVersion(root) == before + 1)
    assert(rep.getLong(1) == 3L && rep.getLong(2) == 2L, rep.toString)
    assert(Manifest.readTable(spark, root, "a").count() == 3L)
    assert(Manifest.readTable(spark, root, "b").count() == 2L)
  }

  test("a failure anywhere in a transaction leaves NOTHING visible") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "a", Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    Manifest.commitAppend(spark, root, "b", Seq(("x", 1L)).toDF("s", "n").coalesce(1))
    Manifest.addCheckConstraint(spark, root, "b", "n_pos", "n > 0")
    val before = Manifest.snapshotVersion(root)
    // the FIRST batch is fine; the SECOND violates b's CHECK — the
    // already-published first batch must stay unclaimed (invisible)
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """BEGIN;
          |INSERT INTO a VALUES (2, 2.0);
          |INSERT INTO b VALUES ('bad', -5);
          |COMMIT""".stripMargin)
    }
    assert(Manifest.snapshotVersion(root) == before)
    assert(Manifest.readTable(spark, root, "a").count() == 1L)
    assert(Manifest.readTable(spark, root, "b").count() == 1L)
    // ROLLBACK discards the span (effects defer to COMMIT)
    ManifestSql.runDml(spark, root,
      "BEGIN; INSERT INTO a VALUES (9, 9.0); ROLLBACK")
    assert(Manifest.snapshotVersion(root) == before)
    // guards: unsupported verbs (DELETE/UPDATE/INSERT are span verbs
    // now — MERGE stays its own atomic commit), bare COMMIT,
    // unterminated BEGIN
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "BEGIN; OPTIMIZE a; COMMIT")
    }
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "COMMIT")
    }
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "BEGIN; INSERT INTO a VALUES (9, 9.0)")
    }
    assert(Manifest.readTable(spark, root, "a").count() == 1L)
  }

  test("CONVERT TO imports a parquet dir zero-copy with footer stats") {
    val root = freshRoot()
    val src = Files.createTempDirectory("graft-convert-spec")
    (1L to 100L).toDF("k").repartitionByRange(4, col("k"))
      .sortWithinPartitions("k")
      .write.mode("overwrite").parquet(src.toString)
    val rep = ManifestSql.runDml(spark, root,
      s"CONVERT TO t FROM '$src' STATS (k)").head()
    assert(rep.getLong(2) == 4L, rep.toString)   // n_files
    assert(rep.getLong(3) == 100L, rep.toString) // n_rows (footer-exact)
    // ZERO-COPY: every table data file shares an inode with a source
    // file — hardlinks, not copies
    def inodes(dir: java.nio.file.Path): Set[Any] = {
      val l = Files.list(dir)
      try l.iterator().asScala.toList
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(Files.getAttribute(_, "unix:ino")).toSet
      finally l.close()
    }
    val srcIno = inodes(src)
    val tblIno = Manifest.manifestRows(spark, root,
      Manifest.snapshotVersion(root))
      .collect { case ("t", f, _) =>
        Files.getAttribute(java.nio.file.Paths.get(root, f), "unix:ino") }
      .toSet
    assert(tblIno == srcIno, s"expected shared inodes, got $tblIno vs $srcIno")
    // the footer stats prune inside the SQL plan
    val index = ManifestSql.register(spark, root, "t", "conv_t_spec")
    spark.sql("SELECT count(*) AS n FROM conv_t_spec WHERE k <= 25").collect()
    val (kept, total) = index.lastPrune
    assert(total == 4 && kept < total, s"kept $kept/$total")
    spark.catalog.dropTempView("conv_t_spec")
    // CREATE semantics + bad-source refusals; source stays readable
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, s"CONVERT TO t FROM '$src'")
    }
    val empty = Files.createTempDirectory("graft-convert-empty")
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, s"CONVERT TO t2 FROM '$empty'")
    }
    assert(spark.read.parquet(src.toString).count() == 100L)
    // the converted table is a full citizen: DML lands on it
    ManifestSql.runDml(spark, root, "DELETE FROM t WHERE k <= 10")
    assert(Manifest.readTable(spark, root, "t").count() == 90L)
  }

  test("DESCRIBE DETAIL reports metadata-exact counts, DV-aware") {
    val root = freshRoot()
    Manifest.commitAppendStats(spark, root, "t",
      (1L to 100L).toDF("k"), Seq("k"), "k", 4)
    ManifestSql.runDml(spark, root, "DELETE FROM t WHERE k <= 10")
    val d = ManifestSql.runDml(spark, root, "DESCRIBE DETAIL t").head()
    assert(d.getString(0) == "t")
    assert(d.getLong(2) == 4L, s"n_files: $d")      // DV delete rewrites nothing
    assert(d.getLong(3) == 90L, s"n_rows: $d")
    assert(d.getLong(5) >= 1L, s"n_dv_files: $d")
  }

  test("VERSION AS OF / TIMESTAMP AS OF resolve as SQL text") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    Thread.sleep(50) // commit times are ms-granular dir mtimes
    Manifest.commitAppend(spark, root, "t",
      Seq((2L, 2.0)).toDF("k", "v").coalesce(1))
    def n(sql: String): Long =
      ManifestSql.runDml(spark, root, sql).collect()(0).getLong(0)
    assert(n("SELECT count(*) AS n FROM t VERSION AS OF 1") == 1L)
    assert(n("SELECT count(*) AS n FROM t VERSION AS OF 2") == 2L)
    // subquery-transparent (the clause sits below top level)
    assert(n("SELECT count(*) AS n FROM (SELECT * FROM t VERSION AS OF 1)") == 1L)
    // wall-clock travel through the same text path
    val lit1 = java.time.Instant.ofEpochMilli(Manifest.commitTimeMs(root, 1L))
      .atZone(java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone))
      .toLocalDateTime.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS", java.util.Locale.ROOT))
    assert(n(s"SELECT count(*) AS n FROM t TIMESTAMP AS OF '$lit1'") == 1L)
    // the Snowflake spelling resolves through the same path
    assert(n(s"SELECT count(*) AS n FROM t AT (TIMESTAMP => '$lit1')") == 1L)
    assert(n("SELECT count(*) AS n FROM " +
      s"(SELECT * FROM t AT (TIMESTAMP => '$lit1'))") == 1L)
    // a clause-shaped STRING LITERAL is left alone
    val s0 = ManifestSql.runDml(spark, root,
      "SELECT 'x VERSION AS OF 1' AS s").collect()(0).getString(0)
    assert(s0 == "x VERSION AS OF 1")
    // an instant before the first commit refuses loudly
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "SELECT count(*) AS n FROM t TIMESTAMP AS OF '1999-01-01 00:00:00'")
    }
  }

  test("APPLY CHANGES statement refusals: malformed KEYS, missing INTO, bad SCD type, unknown source") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "src_t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    // empty KEYS never reaches the SQL parser
    val e1 = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "APPLY CHANGES INTO dst_t FROM src_t KEYS ()")
    }
    assert(e1.getMessage.contains("malformed APPLY CHANGES"))
    // missing INTO clause
    val e2 = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "APPLY CHANGES FROM src_t KEYS (k)")
    }
    assert(e2.getMessage.contains("malformed APPLY CHANGES"))
    // SCD TYPE 3 is not a thing this engine silently approximates
    val e3 = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "APPLY CHANGES INTO dst_t FROM src_t KEYS (k) STORED AS SCD TYPE 3")
    }
    assert(e3.getMessage.contains("SCD TYPE 3"))
    // a source that does not exist refuses instead of NOOP-ing
    val e4 = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "APPLY CHANGES INTO dst_t FROM nope_t KEYS (k)")
    }
    assert(e4.getMessage.contains("unknown source table"))
  }

  test("TBLPROPERTIES lifecycle: set, overwrite, unset, survive vacuum; refusals") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    ManifestSql.runDml(spark, root,
      "ALTER TABLE t SET TBLPROPERTIES ('owner'='alice', 'tier'='bronze')")
    ManifestSql.runDml(spark, root,
      "ALTER TABLE t SET TBLPROPERTIES ('tier'='gold')") // overwrite shadows
    ManifestSql.runDml(spark, root,
      "ALTER TABLE t UNSET TBLPROPERTIES ('owner', 'never.set')") // unknown = no-op
    assert(Manifest.tableProperties(root, "t") == Map("tier" -> "gold"))
    // the registry rides claim sidecars: vacuum to the floor keeps it
    Manifest.commitAppend(spark, root, "t",
      Seq((2L, 2.0)).toDF("k", "v").coalesce(1))
    val _ = Manifest.vacuum(spark, root, 1, 0L)
    assert(Manifest.tableProperties(root, "t") == Map("tier" -> "gold"))
    val show = ManifestSql.runDml(spark, root, "SHOW TBLPROPERTIES t")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(show.toSeq == Seq("tier" -> "gold"))
    // refusals: malformed kv, duplicate key, empty value, missing table
    val e1 = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "ALTER TABLE t SET TBLPROPERTIES (owner='alice')")
    }
    assert(e1.getMessage.contains("expected 'key'='value'"))
    val e2 = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "ALTER TABLE t SET TBLPROPERTIES ('a'='1', 'a'='2')")
    }
    assert(e2.getMessage.contains("duplicate key"))
    val e3 = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "ALTER TABLE t SET TBLPROPERTIES ('a'='')")
    }
    assert(e3.getMessage.contains("empty value"))
    val e4 = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "ALTER TABLE nope SET TBLPROPERTIES ('a'='1')")
    }
    assert(e4.getMessage.contains("no table nope"))
  }

  test("metadata COUNT over a column literally named distinct_ids") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, Some(1L)), (2L, None), (3L, Some(3L)))
        .toDF("k", "distinct_ids").coalesce(1))
    // the DISTINCT-keyword detection needs trailing whitespace: a bare
    // prefix test crashed the split on this statement (AIOOBE) where
    // the metadata non-null count should answer
    val n = ManifestSql.runDml(spark, root,
      "SELECT count(distinct_ids) AS n FROM t").collect()(0).getLong(0)
    assert(n == 2L)
  }

  test("MERGE WITH SCHEMA EVOLUTION: refusals and the nullable registration") {
    val root = freshRoot()
    // ranged append records k stats, so the far-key refusal below
    // exercises the NO-OVERLAP path (affected = empty), not the union
    Manifest.commitAppendRanged(spark, root, "t",
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), "k", 1)
    Seq((2L, 21.0, "x"), (3L, 30.0, "y")).toDF("k", "v", "tag")
      .createOrReplaceTempView("mev_spec_src")
    // BY SOURCE + evolution is refused, not guessed at
    val e1 = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "MERGE WITH SCHEMA EVOLUTION INTO t USING mev_spec_src s " +
          "ON t.k = s.k WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT * " +
          "WHEN NOT MATCHED BY SOURCE THEN DELETE")
    }
    assert(e1.getMessage.contains("does not combine"))
    // a source DROPPING a target column refuses even under evolution
    Seq((2L, "x")).toDF("k", "tag").createOrReplaceTempView("mev_spec_bad")
    val e2 = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "MERGE WITH SCHEMA EVOLUTION INTO t USING mev_spec_bad s " +
          "ON t.k = s.k WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e2.getMessage.contains("drops column"))
    // a widened source whose keys miss EVERY target file must refuse
    // too: no union runs on that path, so the explicit schema check is
    // the only thing standing between the statement and silently
    // publishing mixed-schema files
    Seq((999L, 9.0, "z")).toDF("k", "v", "tag")
      .createOrReplaceTempView("mev_spec_far")
    val e3 = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "MERGE INTO t USING mev_spec_far s ON t.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e3.getMessage.contains("do not match"))
    spark.catalog.dropTempView("mev_spec_far")
    // the happy path registers the added column NULLABLE (the source's
    // expression was non-nullable; pre-evolution rows have no value)
    ManifestSql.runDml(spark, root,
      "MERGE WITH SCHEMA EVOLUTION INTO t USING mev_spec_src s " +
        "ON t.k = s.k WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
    val sch = Manifest.registeredSchema(spark, root, "t").get
    assert(sch("tag").nullable, "evolved column must register nullable")
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        Option(r.get(2)))).toSet
    assert(got == Set((1L, 10.0, None), (2L, 21.0, Some("x")),
      (3L, 30.0, Some("y"))))
    spark.catalog.dropTempView("mev_spec_src")
    spark.catalog.dropTempView("mev_spec_bad")
  }

  test("GRANT lifecycle: open until first grant, enforced after, closure sticky") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").coalesce(1))
    def readAs(role: String): scala.util.Try[Long] = {
      spark.conf.set("graft.sql.role", role)
      val t = scala.util.Try {
        ManifestSql.register(spark, root, "t", "grant_spec_t")
        spark.sql("SELECT count(*) FROM grant_spec_t").collect()(0).getLong(0)
      }
      spark.conf.set("graft.sql.role", "admin")
      t
    }
    // no grant history: open to any role (pre-grant compatibility)
    assert(readAs("rando").get == 2L)
    ManifestSql.runDml(spark, root, "GRANT SELECT ON t TO analyst")
    assert(readAs("analyst").get == 2L)
    assert(readAs("admin").get == 2L)
    val denied = readAs("rando")
    assert(denied.isFailure &&
      denied.failed.get.getMessage.contains("lacks SELECT"))
    // the metadata fast path enforces too
    spark.conf.set("graft.sql.role", "rando")
    val metaDenied = scala.util.Try(
      ManifestSql.runDml(spark, root, "SELECT count(*) FROM t"))
    spark.conf.set("graft.sql.role", "admin")
    assert(metaDenied.isFailure)
    // revoking the LAST grant leaves the table CLOSED (admin-only),
    // never silently reopened
    ManifestSql.runDml(spark, root, "REVOKE SELECT ON t FROM analyst")
    assert(Manifest.tableGrants(root, "t").isEmpty)
    assert(readAs("analyst").isFailure, "revoked role must lose access")
    assert(readAs("rando").isFailure, "empty ACL must stay closed")
    assert(readAs("admin").get == 2L)
    // GRANT on a missing table refuses
    val e = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "GRANT SELECT ON nope TO analyst")
    }
    assert(e.getMessage.contains("no table nope"))
    spark.catalog.dropTempView("grant_spec_t")
  }

  test("APPLY CHANGES statement mirrors within one root and re-drives quiesce") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "src_t",
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").coalesce(1))
    val stmt = "APPLY CHANGES INTO dst_t FROM src_t KEYS (k)"
    val boot = ManifestSql.runDml(spark, root, stmt).collect()(0)
    assert(boot.getString(2) == "APPLIED" && boot.getLong(0) == 2L)
    // same-root re-drive: the interval now contains only the mirror's
    // own commit — a pure NOOP, and the version must NOT advance
    val v = Manifest.snapshotVersion(root)
    val re = ManifestSql.runDml(spark, root, stmt).collect()(0)
    assert(re.getString(2) == "NOOP")
    assert(Manifest.snapshotVersion(root) == v)
    assert(Manifest.readTable(spark, root, "dst_t").count() == 2L)
  }

  test("multi-verb span: one version, mid-span failure invisible, ROLLBACK no-op") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v").coalesce(1))
    Manifest.commitAppend(spark, root, "a",
      Seq(("n", 0L)).toDF("k", "c").coalesce(1))
    Seq((4L, 40.0)).toDF("k", "v").createOrReplaceTempView("span_src")
    val v0 = Manifest.snapshotVersion(root)
    // DELETE + INSERT (same table) + UPDATE (second table): ONE claim
    ManifestSql.runDml(spark, root,
      """BEGIN;
        |DELETE FROM t WHERE k = 2;
        |INSERT INTO t SELECT k, v FROM span_src;
        |UPDATE a SET c = c + 1;
        |COMMIT""".stripMargin)
    assert(Manifest.snapshotVersion(root) == v0 + 1)
    assert(Manifest.readTable(spark, root, "t").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap ==
      Map(1L -> 10.0, 3L -> 30.0, 4L -> 40.0))
    assert(Manifest.readTable(spark, root, "a").head().getLong(1) == 1L)
    // mid-span failure (bad INSERT arity AFTER a valid DELETE):
    // nothing visible, no version advanced
    val v1 = Manifest.snapshotVersion(root)
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """BEGIN;
          |DELETE FROM t WHERE k = 1;
          |INSERT INTO t SELECT k, v, 99 FROM span_src;
          |COMMIT""".stripMargin)
    }
    assert(Manifest.snapshotVersion(root) == v1)
    assert(Manifest.readTable(spark, root, "t").count() == 3L)
    // ROLLBACK discards a DELETE-carrying span entirely
    ManifestSql.runDml(spark, root,
      "BEGIN; DELETE FROM t WHERE k = 1; ROLLBACK")
    assert(Manifest.snapshotVersion(root) == v1)
    assert(Manifest.readTable(spark, root, "t").count() == 3L)
  }

  test("span ordering/verb refusals: DV-after-INSERT, double DV, MERGE, IN-subquery") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    Seq((2L, 2.0)).toDF("k", "v").createOrReplaceTempView("span_bad_src")
    val v = Manifest.snapshotVersion(root)
    // a DELETE of a table an earlier in-span INSERT touched (span
    // statements read the pre-transaction snapshot — refuse, not skew)
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """BEGIN;
          |INSERT INTO t SELECT k, v FROM span_bad_src;
          |DELETE FROM t WHERE k = 2;
          |COMMIT""".stripMargin)
    }
    // a second DELETE/UPDATE of the same table
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """BEGIN;
          |DELETE FROM t WHERE k = 1;
          |UPDATE t SET v = 2 WHERE k = 1;
          |COMMIT""".stripMargin)
    }
    // the MERGE forms a span cannot fold into DV sidecars refuse:
    // schema evolution and the BY SOURCE whole-table-scope tail
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """BEGIN;
          |MERGE WITH SCHEMA EVOLUTION INTO t USING span_bad_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *;
          |COMMIT""".stripMargin)
    }
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """BEGIN;
          |MERGE INTO t USING span_bad_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED BY SOURCE THEN DELETE;
          |COMMIT""".stripMargin)
    }
    // MERGE is the table's one DV verb: a second DV verb refuses
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """BEGIN;
          |MERGE INTO t USING span_bad_src s ON t.k = s.k
          |WHEN MATCHED THEN DELETE;
          |DELETE FROM t WHERE k = 1;
          |COMMIT""".stripMargin)
    }
    // the IN (subquery) forms run outside spans only
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """BEGIN;
          |DELETE FROM t WHERE k IN (SELECT k FROM span_bad_src);
          |COMMIT""".stripMargin)
    }
    // none of the refused spans committed anything
    assert(Manifest.snapshotVersion(root) == v)
    assert(Manifest.readTable(spark, root, "t").count() == 1L)
  }

  test("transform COPY: '$1' string literal is data, VALIDATION_MODE refuses") {
    val root = freshRoot()
    val stage = graft.ops.Ingest.writeStageFixtures()
    val f = graft.ops.Ingest.stagedFileName(graft.ops.Ingest.backfillStart)
    Manifest.commitAppend(spark, root, "xf",
      Seq.empty[(Long, String)].toDF("trans_id", "tag").coalesce(1))
    ManifestSql.runDml(spark, root,
      s"""COPY INTO xf FROM (SELECT CAST($$1 AS BIGINT), '$$1' FROM '$stage')
         |FILES = ('$f')""".stripMargin)
    val got = Manifest.readTable(spark, root, "xf")
    assert(got.count() == 8L &&
      got.select("tag").distinct().head().getString(0) == "$1")
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        s"""COPY INTO xf FROM (SELECT CAST($$1 AS BIGINT), '$$1' FROM '$stage')
           |FILES = ('$f') VALIDATION_MODE = 'RETURN_ERRORS'""".stripMargin)
    }
  }

  test("INSERT ALL/FIRST: same-table branches union, one claim, loud refusals") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t1",
      Seq((0L, 0.0)).toDF("k", "v").coalesce(1))
    Manifest.commitAppend(spark, root, "t2",
      Seq((0L, 0.0)).toDF("k", "v").coalesce(1))
    Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v")
      .createOrReplaceTempView("ins_multi_src")
    val v0 = Manifest.snapshotVersion(root)
    // two branches into the SAME table union into one batch; the
    // whole statement is one claim
    val rep = ManifestSql.runDml(spark, root,
      """INSERT ALL
        |  WHEN k = 1 THEN INTO t1
        |  WHEN v > 1.5 THEN INTO t1
        |  WHEN k = 2 THEN INTO t2 (k) VALUES (k * 10)
        |SELECT k, v FROM ins_multi_src""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("t1" -> 3L, "t2" -> 1L))
    assert(Manifest.snapshotVersion(root) == v0 + 1)
    assert(Manifest.readTable(spark, root, "t1").count() == 4L)
    val t2 = Manifest.readTable(spark, root, "t2").orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.get(1))))
    assert(t2.toSeq == Seq((0L, Some(0.0)), (20L, None))) // v NULL-fills
    // refusals: unknown target, unknown projected column, WHEN after
    // ELSE — and none of them committed anything
    intercept[Exception] {
      ManifestSql.runDml(spark, root,
        "INSERT ALL WHEN k = 1 THEN INTO nope SELECT k, v FROM ins_multi_src")
    }
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "INSERT ALL WHEN k = 1 THEN INTO t1 (zz) VALUES (k) " +
          "SELECT k, v FROM ins_multi_src")
    }
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """INSERT FIRST ELSE INTO t1 WHEN k = 1 THEN INTO t2
          |SELECT k, v FROM ins_multi_src""".stripMargin)
    }
    assert(Manifest.snapshotVersion(root) == v0 + 1)
  }

  test("MERGE inside BEGIN...COMMIT: one claim, all four row classes, DV + images") {
    val root = freshRoot()
    // restate + reconcile: DELETE the stale day's facts, MERGE the
    // corrections into state, INSERT the audit row — one claim
    Manifest.commitAppend(spark, root, "day_facts",
      Seq((1L, "d1"), (4L, "d2")).toDF("k", "day").coalesce(1))
    Manifest.commitAppend(spark, root, "state",
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
        .toDF("k", "v").coalesce(1))
    Manifest.commitAppend(spark, root, "audit",
      Seq((0L, "boot")).toDF("k", "tag").coalesce(1))
    // source: k=1 updates (op U), k=2 deletes (op D), k=3 matches NO
    // clause (op X — must survive unchanged), k=9 inserts (unmatched)
    Seq((1L, 5.0, "U"), (2L, 0.0, "D"), (3L, 7.0, "X"), (9L, 90.0, "U"))
      .toDF("k", "v", "op").createOrReplaceTempView("span_merge_src")
    val v0 = Manifest.snapshotVersion(root)
    val rep = ManifestSql.runDml(spark, root,
      """BEGIN;
        |DELETE FROM day_facts WHERE day = 'd2';
        |MERGE INTO state t USING span_merge_src s ON t.k = s.k
        |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET v = t.v + s.v
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN NOT MATCHED AND s.op = 'U' THEN INSERT (k, v) VALUES (s.k, s.v);
        |INSERT INTO audit SELECT 99, 'reconciled';
        |COMMIT""".stripMargin).collect()(0)
    // single-version atomicity: the whole span is ONE claim
    assert(rep.getLong(0) == v0 + 1 && Manifest.snapshotVersion(root) == v0 + 1)
    val got = Manifest.readTable(spark, root, "state").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // k=1: 10 + 5 updated; k=2 deleted; k=3 no clause → unchanged;
    // k=4 unmatched-by-source → untouched; k=9 inserted
    assert(got == Map(1L -> 15.0, 3L -> 30.0, 4L -> 40.0, 9L -> 90.0))
    assert(Manifest.readTable(spark, root, "day_facts").count() == 1L)
    assert(Manifest.readTable(spark, root, "audit").count() == 2L)
    // at v0 nothing had happened (time travel across the span)
    assert(Manifest.readTable(spark, root, "state", v0).count() == 4L)
    assert(Manifest.readTable(spark, root, "day_facts", v0).count() == 2L)
  }

  test("span MERGE failure leaves NOTHING visible; ordering refusals hold") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "state",
      Seq((1L, 10.0)).toDF("k", "v").coalesce(1))
    Manifest.commitAppend(spark, root, "other",
      Seq((1L, "x")).toDF("k", "tag").coalesce(1))
    Seq((1L, 5.0)).toDF("k", "v").createOrReplaceTempView("span_merge_bad")
    val v0 = Manifest.snapshotVersion(root)
    // unknown SET column: the whole span (including the earlier
    // DELETE's staged DVs on the OTHER table) must be invisible
    val e = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """BEGIN;
          |DELETE FROM other WHERE k = 1;
          |MERGE INTO state t USING span_merge_bad s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET nope = s.v;
          |COMMIT""".stripMargin)
    }
    assert(e.getMessage.contains("unknown columns"))
    assert(Manifest.snapshotVersion(root) == v0)
    assert(Manifest.readTable(spark, root, "state").count() == 1L)
    assert(Manifest.readTable(spark, root, "other").count() == 1L)
    // MERGE of a table an earlier in-span INSERT touched refuses
    // (span statements read the pre-transaction snapshot)
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """BEGIN;
          |INSERT INTO state SELECT 2, 2.0;
          |MERGE INTO state t USING span_merge_bad s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v;
          |COMMIT""".stripMargin)
    }
    // dup source keys refuse through the span path too
    Seq((1L, 5.0), (1L, 6.0)).toDF("k", "v")
      .createOrReplaceTempView("span_merge_dup")
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """BEGIN;
          |MERGE INTO state t USING span_merge_dup s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v;
          |COMMIT""".stripMargin)
    }
    assert(Manifest.snapshotVersion(root) == v0)
  }

  test("named streams: empty at creation, read-no-consume, consume-on-commit, exactly-once") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "src",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    Manifest.commitAppend(spark, root, "tgt",
      Seq.empty[(Long, Double)].toDF("k", "v").coalesce(1))
    ManifestSql.runDml(spark, root, "CREATE STREAM s1 ON TABLE src")
    // the stream starts EMPTY — pre-creation rows are not changes
    assert(ManifestSql.runDml(spark, root, "SELECT * FROM s1").count() == 0L)
    // a post-creation commit appears; plain reads do NOT consume
    ManifestSql.runDml(spark, root, "INSERT INTO src SELECT 2, 2.0")
    assert(ManifestSql.runDml(spark, root,
      "SELECT k FROM s1 WHERE _change_type = 'insert'").count() == 1L)
    assert(ManifestSql.runDml(spark, root, "SELECT k FROM s1").count() == 1L)
    // consumption: rows + advanced cursor land in ONE claim
    val v0 = Manifest.snapshotVersion(root)
    val rep = ManifestSql.runDml(spark, root,
      "INSERT INTO tgt SELECT k, v FROM s1 WHERE _change_type = 'insert'")
      .collect()(0)
    assert(rep.getString(4) == "APPLIED" && rep.getLong(1) == 1L)
    assert(Manifest.snapshotVersion(root) == v0 + 1)
    assert(Manifest.readTable(spark, root, "tgt").count() == 1L)
    assert(Manifest.streamDef(root, "s1").exists(_._2 == v0))
    // exactly-once under re-drive: the stream is empty, NO new
    // version mints, nothing double-applies
    val rep2 = ManifestSql.runDml(spark, root,
      "INSERT INTO tgt SELECT k, v FROM s1 WHERE _change_type = 'insert'")
      .collect()(0)
    assert(rep2.getString(4) == "NOOP")
    assert(Manifest.snapshotVersion(root) == v0 + 1)
    assert(Manifest.readTable(spark, root, "tgt").count() == 1L)
    // SHOW STREAMS serves the cursor; DROP tombstones; unknown refuses
    val shown = ManifestSql.runDml(spark, root, "SHOW STREAMS").collect()(0)
    assert(shown.getString(0) == "s1" && shown.getString(1) == "src")
    ManifestSql.runDml(spark, root, "DROP STREAM s1")
    assert(ManifestSql.runDml(spark, root, "SHOW STREAMS").count() == 0L)
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "DROP STREAM s1")
    }
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "CREATE STREAM s9 ON TABLE nope")
    }
  }

  test("session variables: literals only, quote immunity, UNSET, scope death") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    def refuse(stmt: String): Unit =
      intercept[IllegalArgumentException] {
        ManifestSql.runDml(spark, root, stmt) }
    // numbers and strings substitute at unquoted positions; a quoted
    // '$v' is DATA even while the variable is defined
    val r = ManifestSql.runDml(spark, root,
      """SET floor_k = 5;
        |SET tag = 'hot';
        |SELECT CAST(count(*) AS BIGINT) AS n, '$tag literal' AS quoted,
        |  $tag AS subbed
        |FROM (SELECT 1 AS x) WHERE 9 >= $floor_k""".stripMargin).collect()(0)
    assert(r.getLong(0) == 1L && r.getString(1) == "$tag literal" &&
      r.getString(2) == "hot")
    // UNSET kills the name mid-script; unknown UNSET refuses
    refuse("SET a = 1; UNSET a; SELECT $a AS x")
    refuse("UNSET nope")
    // values must be literals — an expression would drift per mention
    refuse("SET a = current_date(); SELECT 1 AS x")
    refuse("SET a = k + 1; SELECT 1 AS x")
    // undefined reference refuses; scope dies at script end
    ManifestSql.runDml(spark, root, "SET alive = 1; SELECT $alive AS x")
    refuse("SELECT $alive AS x")
  }

  test("APPEND_ONLY stream skips rewrite intervals the full feed flags") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    ManifestSql.runDml(spark, root,
      """CREATE STREAM ao ON TABLE t APPEND_ONLY = TRUE;
        |CREATE STREAM ff ON TABLE t""".stripMargin)
    Manifest.commitAppend(spark, root, "t",
      Seq((2L, 2.0), (3L, 3.0)).toDF("k", "v").coalesce(1))
    // DV DELETE between the two appends: the append-only consumer must
    // see ONLY the appended rows — the appended-then-deleted row
    // included (Snowflake's contract) — while the full feed flags the
    // interval with its delete row
    Manifest.commitDeleteVectors(spark, root, "t", col("k") === 2L)
    Manifest.commitAppend(spark, root, "t",
      Seq((4L, 4.0)).toDF("k", "v").coalesce(1))
    val ao = ManifestSql.runDml(spark, root,
      "SELECT k, _change_type FROM ao").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ao == Set((2L, "insert"), (3L, "insert"), (4L, "insert")), ao)
    val ff = ManifestSql.runDml(spark, root,
      "SELECT k, _change_type FROM ff").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ff == Set((2L, "insert"), (3L, "insert"), (4L, "insert"),
      (2L, "delete")), ff)
  }

  test("named tasks: subtree execution, refusal classes, SHOW TASKS") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "log",
      Seq((0L, "boot")).toDF("k", "src").coalesce(1))
    ManifestSql.runDml(spark, root,
      """CREATE TASK a AS INSERT INTO log SELECT 1, 'a';
        |CREATE TASK b AFTER a AS INSERT INTO log SELECT 2, 'b';
        |CREATE TASK c AFTER b AS INSERT INTO log SELECT 3, 'c'""".stripMargin)
    // executing a MID-GRAPH node runs its subtree only (b, c — never
    // the parent a), exactly a scheduler resuming from a failed node
    val rep = ManifestSql.runDml(spark, root, "EXECUTE TASK b").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rep == Seq(("b", 1), ("c", 2)))
    val srcs = Manifest.readTable(spark, root, "log").collect()
      .map(_.getString(1)).sorted.toSeq
    assert(srcs == Seq("b", "boot", "c")) // a never ran
    // SHOW TASKS serves the graph
    val shown = ManifestSql.runDml(spark, root, "SHOW TASKS").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown == Map("a" -> "", "b" -> "a", "c" -> "b"))
    // refusals: duplicate name, unknown AFTER, self-edge, drop with
    // dependents, unknown EXECUTE/DROP
    def refuse(stmt: String): Unit =
      intercept[IllegalArgumentException] {
        ManifestSql.runDml(spark, root, stmt) }
    refuse("CREATE TASK a AS INSERT INTO log SELECT 9, 'x'")
    refuse("CREATE TASK d AFTER nope AS INSERT INTO log SELECT 9, 'x'")
    refuse("CREATE TASK d AFTER d AS INSERT INTO log SELECT 9, 'x'")
    refuse("DROP TASK a") // b runs AFTER it
    refuse("DROP TASK nope")
    refuse("EXECUTE TASK nope")
    // SCHEDULE: registers (lists, ranges, steps), serves via SHOW
    // TASKS; malformed cron and SCHEDULE+AFTER both refuse at CREATE
    ManifestSql.runDml(spark, root,
      "CREATE TASK sch1 SCHEDULE = '*/5 2-4 1,15 * 0' AS SELECT 1 AS x")
    val schRow = ManifestSql.runDml(spark, root, "SHOW TASKS")
      .filter(col("name") === "sch1").collect()(0)
    assert(schRow.getString(1) == "" &&
      schRow.getString(2) == "*/5 2-4 1,15 * 0")
    refuse("CREATE TASK sch2 SCHEDULE = '1 2 3 4' AS SELECT 1 AS x")
    refuse("CREATE TASK sch2 SCHEDULE = 'x * * * *' AS SELECT 1 AS x")
    refuse("CREATE TASK sch2 SCHEDULE = '1 * * * *' AFTER sch1 AS SELECT 1 AS x")
    ManifestSql.runDml(spark, root, "DROP TASK sch1")
    // leaf-first drop succeeds
    ManifestSql.runDml(spark, root, "DROP TASK c; DROP TASK b; DROP TASK a")
    assert(ManifestSql.runDml(spark, root, "SHOW TASKS").count() == 0L)
  }

  test("SWAP WITH: grants travel with content; stream/index/self refusals") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "live",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    Manifest.commitAppend(spark, root, "stage",
      Seq((2L, 2.0), (3L, 3.0)).toDF("k", "v").coalesce(1))
    // a grant on live must guard the CONTENT after the swap (the
    // rename-pair semantics): stage's name inherits it, live opens
    Manifest.grantSelect(spark, root, "live", "analyst")
    ManifestSql.runDml(spark, root, "ALTER TABLE live SWAP WITH stage")
    assert(Manifest.readTable(spark, root, "live").count() == 2L)
    assert(Manifest.readTable(spark, root, "stage").count() == 1L)
    intercept[Exception] { // old content now named stage: grant moved
      Manifest.requireSelect(root, "stage", "stranger")
    }
    Manifest.requireSelect(root, "stage", "analyst") // granted role reads
    // refusals: self-swap, unknown table, live stream, ann index
    def refuse(stmt: String): Unit =
      intercept[IllegalArgumentException] {
        ManifestSql.runDml(spark, root, stmt) }
    refuse("ALTER TABLE live SWAP WITH live")
    refuse("ALTER TABLE live SWAP WITH nope")
    ManifestSql.runDml(spark, root, "CREATE STREAM s1 ON TABLE live")
    refuse("ALTER TABLE live SWAP WITH stage")
    ManifestSql.runDml(spark, root, "DROP STREAM s1")
    ManifestSql.runDml(spark, root, "ALTER TABLE live SWAP WITH stage") // works again
    assert(Manifest.readTable(spark, root, "live").count() == 1L)
    // a MATERIALIZED VIEW binding either side refuses like streams —
    // its txn ledger cursors the NAME's commit history, and a refresh
    // after the swap would absorb the flip as a whole-table delta
    ManifestSql.runDml(spark, root,
      """CREATE MATERIALIZED VIEW mv9 AS
        |SELECT k, SUM(v) AS sv, COUNT(*) AS n FROM live GROUP BY k""".stripMargin)
    ManifestSql.runDml(spark, root, "REFRESH MATERIALIZED VIEW mv9")
    refuse("ALTER TABLE live SWAP WITH stage")
    refuse("ALTER TABLE mv9 SWAP WITH stage") // the view's CONTENT table
    ManifestSql.runDml(spark, root, "DROP MATERIALIZED VIEW mv9")
  }

  test("materialized view statements: IVM through deletes, quiet NOOP, refusals") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "src",
      Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v").coalesce(1))
    Manifest.commitAppend(spark, root, "other",
      Seq((0L, 0.0)).toDF("k", "v").coalesce(1))
    ManifestSql.runDml(spark, root,
      """CREATE MATERIALIZED VIEW mv AS
        |SELECT k, SUM(v) AS sv, COUNT(*) AS n FROM src GROUP BY k""".stripMargin)
    def refresh() = ManifestSql.runDml(spark, root,
      "REFRESH MATERIALIZED VIEW mv").collect()(0).getString(3)
    assert(refresh() == "REFRESHED")
    // the content table serves the DECLARED aliases, not internal names
    assert(Manifest.readTable(spark, root, "mv").columns.toSeq ==
      Seq("k", "sv", "n"))
    val got0 = Manifest.readTable(spark, root, "mv").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got0 == Map(1L -> (30.0, 2L), 2L -> (5.0, 1L)))
    // an interval touching OTHER tables only quiesces (NOOP, no
    // version) — the shared-root tail-chasing guard
    Manifest.commitAppend(spark, root, "other",
      Seq((9L, 9.0)).toDF("k", "v").coalesce(1))
    val v0 = Manifest.snapshotVersion(root)
    assert(refresh() == "NOOP" && Manifest.snapshotVersion(root) == v0)
    // a DV delete folds incrementally: k=1 loses one row, k=2 drops out
    Manifest.commitDeleteVectors(spark, root, "src",
      col("v") === 20.0 || col("k") === 2L)
    assert(refresh() == "REFRESHED")
    val got1 = Manifest.readTable(spark, root, "mv").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got1 == Map(1L -> (10.0, 1L)))
    // refusals: duplicate name, name colliding with a table, unknown
    // source, non-SUM/COUNT shape, GROUP BY drift, unknown refresh/drop
    def refuse(stmt: String): Unit =
      intercept[IllegalArgumentException] {
        ManifestSql.runDml(spark, root, stmt) }
    refuse("CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(v) AS s, COUNT(*) AS n FROM src GROUP BY k")
    refuse("CREATE MATERIALIZED VIEW other AS SELECT k, SUM(v) AS s, COUNT(*) AS n FROM src GROUP BY k")
    refuse("CREATE MATERIALIZED VIEW m2 AS SELECT k, SUM(v) AS s, COUNT(*) AS n FROM nope GROUP BY k")
    refuse("CREATE MATERIALIZED VIEW m2 AS SELECT k, AVG(v) AS s, COUNT(*) AS n FROM src GROUP BY k")
    refuse("CREATE MATERIALIZED VIEW m2 AS SELECT k, SUM(v) AS s, COUNT(*) AS n FROM src GROUP BY k, v")
    // an alias colliding with a key (or its sibling) cannot be stored
    refuse("CREATE MATERIALIZED VIEW m2 AS SELECT k, SUM(v) AS k, COUNT(*) AS n FROM src GROUP BY k")
    refuse("CREATE MATERIALIZED VIEW m2 AS SELECT k, SUM(v) AS s, COUNT(*) AS s FROM src GROUP BY k")
    refuse("REFRESH MATERIALIZED VIEW nope")
    refuse("DROP MATERIALIZED VIEW nope")
    ManifestSql.runDml(spark, root, "DROP MATERIALIZED VIEW mv")
    refuse("REFRESH MATERIALIZED VIEW mv")
  }

  test("MATCH_BY_COLUMN_NAME: case modes, ambiguity refusal, clause combos") {
    val root = freshRoot()
    val stage = graft.ops.Ingest.writeMbnStageFixtures()
    Manifest.commitAppend(spark, root, "t",
      Seq.empty[(Long, Double, String, String)]
        .toDF("trans_id", "amount", "currency", "batch_tag").coalesce(1))
    // CASE_SENSITIVE: file B's TRANS_ID/Amount/CURRENCY match NOTHING
    // — every target column NULL-fills for B's rows (never mis-binds)
    ManifestSql.runDml(spark, root,
      s"""COPY INTO t FROM '$stage' FILES = ('graft_mbn_b.csv')
         |MATCH_BY_COLUMN_NAME = CASE_SENSITIVE
         |FILE_FORMAT = (TYPE = CSV NULL_IF = ('NULL', ''))""".stripMargin)
    val got = Manifest.readTable(spark, root, "t").collect()
    assert(got.length == 2 && got.forall(r =>
      r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)))
    // an ambiguous case-insensitive match refuses loudly
    val dir = java.nio.file.Paths.get(stage)
    java.nio.file.Files.write(dir.resolve("graft_mbn_amb.csv"),
      "amount,AMOUNT,trans_id\n1.0,2.0,9\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        s"""COPY INTO t FROM '$stage' FILES = ('graft_mbn_amb.csv')
           |MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE""".stripMargin)
    }
    assert(e.getMessage.contains("2 columns"))
    // clause combos refuse: validation, transform, unload; NONE is the
    // positional default (accepted, behaves positionally)
    def refuse(stmt: String): Unit =
      intercept[IllegalArgumentException] {
        ManifestSql.runDml(spark, root, stmt) }
    refuse(s"""COPY INTO t FROM '$stage' FILES = ('graft_mbn_a.csv')
              |MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE
              |VALIDATION_MODE = 'RETURN_ERRORS'""".stripMargin)
    refuse(s"""COPY INTO t FROM (SELECT $$1, $$2, $$3, $$4 FROM '$stage')
              |FILES = ('graft_mbn_a.csv')
              |MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE""".stripMargin)
    refuse(s"COPY INTO t FROM '$stage' MATCH_BY_COLUMN_NAME = SOMETIMES")
  }

  test("stream/task/mview/annidx registrations survive vacuum (marker carry)") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    // the ANN index's codebook marker is a registration like the
    // others: losing it to vacuum would orphan the cells/codes tables
    Manifest.commitAppend(spark, root, "emb",
      (0L until 12L).map(i =>
        (i, Array.tabulate(64)(j => ((i * 7 + j) % 11 + 1).toFloat)))
        .toDF("vec_id", "embedding").coalesce(1))
    graft.ops.Similarity.buildAnnIndex(spark, root, "emb", "ix1")
    // register all three SQL object families, then push every
    // registration claim below the retention floor with data commits
    ManifestSql.runDml(spark, root,
      """CREATE STREAM s1 ON TABLE t;
        |CREATE TASK tk1 AS INSERT INTO t SELECT 99, 9.9;
        |CREATE MATERIALIZED VIEW mv1 AS
        |SELECT k, SUM(v) AS sv, COUNT(*) AS n FROM t GROUP BY k""".stripMargin)
    (1 to 4).foreach(i => Manifest.commitAppend(spark, root, "t",
      Seq((i.toLong + 10, i.toDouble)).toDF("k", "v").coalesce(1)))
    val _ = Manifest.vacuum(spark, root, keep = 2, graceMs = 0L)
    // every registration still serves: the carry copied the newest
    // marker of each family into the oldest surviving claim
    assert(Manifest.streamDef(root, "s1").exists(_._1 == "t"))
    assert(Manifest.taskDefs(root).contains("tk1"))
    assert(Manifest.mviewDefs(root).contains("mv1"))
    // and they still WORK, not just list: execute, refresh, probe (the
    // codebook decodes the surviving cells/codes) + maintain quiesce.
    // The STREAM's registration survives but its offset history aged
    // below the retention floor — consumption reports STALENESS loudly
    // (the Snowflake contract), and a re-created stream serves again
    val stale = intercept[IllegalStateException] {
      ManifestSql.runDml(spark, root,
        "SELECT k FROM s1 WHERE _change_type = 'insert'").count()
    }
    assert(stale.getMessage.contains("STALE"))
    ManifestSql.runDml(spark, root, "DROP STREAM s1; CREATE STREAM s1 ON TABLE t")
    Manifest.commitAppend(spark, root, "t",
      Seq((77L, 7.7)).toDF("k", "v").coalesce(1))
    assert(ManifestSql.runDml(spark, root,
      "SELECT k FROM s1 WHERE _change_type = 'insert'").count() == 1L)
    assert(ManifestSql.runDml(spark, root, "EXECUTE TASK tk1")
      .collect()(0).getString(2) == "OK")
    assert(ManifestSql.runDml(spark, root, "REFRESH MATERIALIZED VIEW mv1")
      .collect()(0).getString(3) == "REFRESHED")
    val probe = graft.ops.Similarity.queryAnnIndex(spark, root, "ix1",
      Manifest.readTable(spark, root, "emb").filter(col("vec_id") < 2))
    assert(probe.count() > 0L)
    assert(graft.ops.Similarity.maintainAnnIndex(spark, root, "ix1").isEmpty)
  }

  test("composite-key MERGE: sibling keys untouched, dup refusal per COMPLETE key") {
    val root = freshRoot()
    // (a, b) is the key: a=1 appears under TWO b values — a bug that
    // matches on one column alone corrupts the sibling
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, "x", 10.0), (1L, "y", 20.0), (2L, "x", 30.0))
        .toDF("a", "b", "v").coalesce(1))
    Seq((1L, "x", 5.0)).toDF("a", "b", "v")
      .createOrReplaceTempView("ck_src")
    ManifestSql.runDml(spark, root,
      """MERGE INTO t USING ck_src s ON t.a = s.a AND t.b = s.b
        |WHEN MATCHED THEN UPDATE SET v = t.v + s.v""".stripMargin)
    val got = Manifest.readTable(spark, root, "t").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got == Map((1L, "x") -> 15.0, (1L, "y") -> 20.0, (2L, "x") -> 30.0))
    // same a under two b values is NOT a duplicate (complete-key
    // distinctness — a single-column dup check would wrongly refuse)
    Seq((3L, "x", 1.0), (3L, "y", 2.0)).toDF("a", "b", "v")
      .createOrReplaceTempView("ck_ok")
    ManifestSql.runDml(spark, root,
      """MERGE INTO t USING ck_ok s ON t.a = s.a AND t.b = s.b
        |WHEN NOT MATCHED THEN INSERT (a, b, v) VALUES (s.a, s.b, s.v)""".stripMargin)
    assert(Manifest.readTable(spark, root, "t").count() == 5L)
    // a REPEATED complete key refuses loudly (ANSI duplicate-source)
    Seq((9L, "x", 1.0), (9L, "x", 2.0)).toDF("a", "b", "v")
      .createOrReplaceTempView("ck_dup")
    val e = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """MERGE INTO t USING ck_dup s ON t.a = s.a AND t.b = s.b
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e.getMessage.contains("duplicate"))
    // a repeated key COLUMN in ON refuses at parse time
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """MERGE INTO t USING ck_ok s ON t.a = s.a AND t.a = s.a
          |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    }
  }

  test("composite-key merge prunes files by the CONJUNCTION of key bounds") {
    val root = freshRoot()
    // two batches with OVERLAPPING a-bounds but DISJOINT b-bounds:
    // pruning on a alone keeps both; the conjunction keeps only one
    Manifest.commitAppendStats(spark, root, "t",
      Seq((1L, 1L, 1.0), (10L, 10L, 2.0)).toDF("a", "b", "v").coalesce(1),
      Seq("a", "b"), "a", 1)
    Manifest.commitAppendStats(spark, root, "t",
      Seq((2L, 50L, 3.0), (9L, 60L, 4.0)).toDF("a", "b", "v").coalesce(1),
      Seq("a", "b"), "a", 1)
    val before = Manifest.manifestRows(spark, root,
      Manifest.snapshotVersion(root)).collect { case ("t", f, _) => f }.toSet
    assert(before.size == 2)
    val loB = before.find(_.contains("/v1/"))
      .getOrElse(fail("expected batch 1's file under data/v1/"))
    // keys (5, 55): a-interval [5,5] overlaps BOTH batches' a-bounds,
    // b-interval [55,55] overlaps only batch 2 — the merge must
    // rewrite batch 2's file and inherit batch 1's BY REFERENCE
    Manifest.commitMergeUpsert(spark, root, "t",
      Seq((5L, 55L, 9.0)).toDF("a", "b", "v"), Seq("a", "b"),
      5, None, allowEvolution = false)
    val after = Manifest.manifestRows(spark, root,
      Manifest.snapshotVersion(root)).collect { case ("t", f, _) => f }.toSet
    assert(after.contains(loB), "batch 1's file must survive by reference")
    assert(!after.contains(before.diff(Set(loB)).head),
      "batch 2's file must be rewritten")
    val got = Manifest.readTable(spark, root, "t").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == Map((1L, 1L) -> 1.0, (10L, 10L) -> 2.0,
      (2L, 50L) -> 3.0, (9L, 60L) -> 4.0, (5L, 55L) -> 9.0))
  }

  test("APPLY CHANGES with composite KEYS mirrors per pair; SCD2 runs composite too") {
    val root = freshRoot()
    val src = s"$root/src"
    Manifest.commitAppendStats(spark, src, "pairs",
      Seq((1L, "x", 1.0), (1L, "y", 2.0), (2L, "x", 3.0))
        .toDF("a", "b", "v").coalesce(1), Seq("a", "b"), "a", 1)
    val stmt = "APPLY CHANGES INTO dst.pairs FROM src.pairs KEYS (a, b)"
    val boot = ManifestSql.runDml(spark, root, stmt).collect()(0)
    assert(boot.getString(2) == "APPLIED" && boot.getLong(0) == 3L)
    // update ONE pair; its same-a sibling must not move
    Manifest.commitMergeUpsert(spark, src, "pairs",
      Seq((1L, "x", 10.0)).toDF("a", "b", "v"), Seq("a", "b"),
      5, None, allowEvolution = false)
    val inc = ManifestSql.runDml(spark, root, stmt).collect()(0)
    assert(inc.getString(2) == "APPLIED")
    val got = Manifest.readTable(spark, s"$root/dst", "pairs").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got == Map((1L, "x") -> 10.0, (1L, "y") -> 2.0, (2L, "x") -> 3.0))
    // re-drive quiesces (exactly-once through the txn ledger)
    assert(ManifestSql.runDml(spark, root, stmt).collect()(0)
      .getString(2) == "NOOP")
    // SCD TYPE 2 runs composite since q339: the statement bootstraps a
    // (a, b)-keyed history — one open interval per pair, current images
    val scd = ManifestSql.runDml(spark, root,
      "APPLY CHANGES INTO dst.hist FROM src.pairs KEYS (a, b) " +
        "STORED AS SCD TYPE 2").collect()(0)
    assert(scd.getString(2) == "APPLIED")
    val hist = Manifest.readTable(spark, s"$root/dst", "hist")
      .filter(col("__end_v").isNull).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(hist == Map((1L, "x") -> 10.0, (1L, "y") -> 2.0, (2L, "x") -> 3.0))
  }

  test("INSERT FIRST: duplicate condition text routes to the FIRST branch only") {
    val root = freshRoot()
    Seq("d1", "d2").foreach(t => Manifest.commitAppend(spark, root, t,
      Seq((0L, 0.0)).toDF("k", "v").coalesce(1)))
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
      .createOrReplaceTempView("ins_first_dup_src")
    // two WHEN branches with IDENTICAL condition text: FIRST-mode
    // precedence is positional — every matching row routes to d1,
    // NONE to d2 (guarding by condition text would send it to both)
    val rep = ManifestSql.runDml(spark, root,
      """INSERT FIRST
        |  WHEN k >= 1 THEN INTO d1
        |  WHEN k >= 1 THEN INTO d2
        |SELECT k, v FROM ins_first_dup_src""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("d1" -> 2L, "d2" -> 0L))
    assert(Manifest.readTable(spark, root, "d1").count() == 3L)
    assert(Manifest.readTable(spark, root, "d2").count() == 1L)
  }

  test("span UPDATE: typo'd SET column refuses even when nothing matches") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    val v0 = Manifest.snapshotVersion(root)
    // the predicate matches ZERO rows — the unknown SET column must
    // still refuse (validation runs before the match, the
    // commitMergeClauses/commitUpdateVectors discipline)
    val e = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """BEGIN;
          |UPDATE t SET nope = 9 WHERE k = 999;
          |COMMIT""".stripMargin)
    }
    assert(e.getMessage.contains("unknown columns"))
    assert(Manifest.snapshotVersion(root) == v0)
  }

  test("span UPDATE ... FROM refuses with the span's message, not a parse error") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    Seq((1L, 9.0)).toDF("k", "v").createOrReplaceTempView("span_updfrom_src")
    val e = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        """BEGIN;
          |UPDATE t SET v = s.v FROM span_updfrom_src s WHERE t.k = s.k;
          |COMMIT""".stripMargin)
    }
    assert(e.getMessage.contains("BEGIN...COMMIT"))
    // a SET expression whose TEXT contains 'from' (a string literal)
    // still parses as a plain span update
    Manifest.commitAppend(spark, root, "s2",
      Seq((1L, "x")).toDF("k", "tag").coalesce(1))
    ManifestSql.runDml(spark, root,
      """BEGIN;
        |UPDATE s2 SET tag = 'from here' WHERE k = 1;
        |COMMIT""".stripMargin)
    assert(Manifest.readTable(spark, root, "s2").head().getString(1) == "from here")
  }

  test("UPDATE...FROM is a one-clause merge; DELETE...USING rides the keyed DV path") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 10.0, 100.0), (2L, 20.0, 200.0), (3L, 30.0, 300.0))
        .toDF("k", "v", "w").coalesce(1))
    Seq((1L, 5.0, "U"), (2L, 7.0, "D"), (9L, 9.0, "U"))
      .toDF("k", "dv", "op").createOrReplaceTempView("jdml_spec_src")
    // join-update: source column in the SET, old-row semantics (v and
    // w swap THROUGH the source row), condition routes, k=9 (no
    // target match) lands nowhere, k=3 (no source row) untouched
    ManifestSql.runDml(spark, root,
      """UPDATE t SET v = t.w + s.dv, w = t.v
        |FROM jdml_spec_src s WHERE t.k = s.k AND s.op = 'U'""".stripMargin)
    val got = Manifest.readTable(spark, root, "t").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    assert(got == Map(1L -> (105.0, 10.0), 2L -> (20.0, 200.0),
      3L -> (30.0, 300.0)))
    // join-delete: duplicate source keys harmless; source-only
    // condition filters which rows drive it
    Seq((2L, "D"), (2L, "D"), (3L, "X"))
      .toDF("k", "op").createOrReplaceTempView("jdml_spec_dels")
    ManifestSql.runDml(spark, root,
      "DELETE FROM t USING jdml_spec_dels s WHERE t.k = s.k AND s.op = 'D'")
    assert(Manifest.readTable(spark, root, "t")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // refusals: no equi-join conjunct; target-side condition in
    // DELETE...USING; duplicate source keys in the join-UPDATE
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "UPDATE t SET v = s.dv FROM jdml_spec_src s WHERE s.op = 'U'")
    }
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "DELETE FROM t USING jdml_spec_dels s WHERE t.k = s.k AND t.v > 0")
    }
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root,
        "UPDATE t SET v = s.dv FROM jdml_spec_dels s WHERE t.k = s.k")
    }
    // nothing refused committed anything
    assert(Manifest.readTable(spark, root, "t").count() == 2L)
  }

  test("incremental ANALYZE: append merges O(delta), rewrite refuses, stale falls through") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      (1L to 50L).map(k => (k, s"u$k")).toDF("k", "s").coalesce(1))
    // no baseline yet: the increment refuses
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "ANALYZE TABLE t UPDATE STATISTICS")
    }
    ManifestSql.runDml(spark, root,
      "ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS k, s")
    Manifest.commitAppend(spark, root, "t",
      (51L to 80L).map(k => (k, s"u$k")).toDF("k", "s").coalesce(1))
    val inc = ManifestSql.runDml(spark, root,
      "ANALYZE TABLE t UPDATE STATISTICS")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getString(4), r.getString(5))).toMap
    // counts added, min/max folded; HLL is near-exact at this size
    assert(inc("k")._1 == 80L && inc("k")._3 == "1" && inc("k")._4 == "80")
    assert(math.abs(inc("k")._2 - 80L) <= 4L &&
      math.abs(inc("s")._2 - 80L) <= 4L)
    // the metadata fast path serves the merged NDV (registry fresh)
    val fast = ManifestSql.runDml(spark, root,
      "SELECT count(*) AS n, count(DISTINCT k) AS ndv FROM t").head()
    assert(fast.getLong(0) == 80L && math.abs(fast.getLong(1) - 80L) <= 4L)
    // a rewrite staleness: compaction repacks the file set, so the
    // interval is non-append — the increment refuses, and
    // count(DISTINCT) falls through to the scan path (exact again),
    // as the stale-exact discipline says
    Manifest.compactTable(spark, root, "t", targetBytes = Long.MaxValue)
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "ANALYZE TABLE t UPDATE STATISTICS")
    }
    ManifestSql.register(spark, root, "t", "t") // the scan path's relation
    val scan = ManifestSql.runDml(spark, root,
      "SELECT count(DISTINCT k) AS ndv FROM t").head()
    assert(scan.getLong(0) == 80L)
    spark.catalog.dropTempView("t")
  }

  test("schema grants: table grant overrides schema grant both ways; sticky closure") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "s.a",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    Manifest.commitAppend(spark, root, "s.b",
      Seq((2L, 2.0)).toDF("k", "v").coalesce(1))
    ManifestSql.runDml(spark, root, "GRANT SELECT ON SCHEMA s TO r1")
    def ok(role: String, table: String): Boolean = {
      spark.conf.set("graft.sql.role", role)
      try scala.util.Try(
        ManifestSql.register(spark, root, table, "schg_spec_v")).isSuccess
      finally spark.conf.set("graft.sql.role", "admin")
    }
    assert(ok("r1", "s.a") && ok("r1", "s.b") && !ok("r2", "s.a"))
    // NARROWING override: a table-level grant to r2 closes s.b at the
    // table level — r1's schema grant no longer reaches it
    ManifestSql.runDml(spark, root, "GRANT SELECT ON s.b TO r2")
    assert(!ok("r1", "s.b") && ok("r2", "s.b") && ok("r1", "s.a"))
    // WIDENING override: r2 is table-granted on s.b despite never
    // holding the schema grant (already shown), and revoking the
    // schema's last grant leaves the schema CLOSED, never reopened
    ManifestSql.runDml(spark, root, "REVOKE SELECT ON SCHEMA s FROM r1")
    assert(!ok("r1", "s.a") && !ok("r2", "s.a") && ok("r2", "s.b"))
    // a grant on a schema with no tables refuses (typo guard)
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "GRANT SELECT ON SCHEMA nope TO r1")
    }
  }

  test("table_changes() TVF: per-commit classes, repack silence, 2-arg/empty forms") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",                      // v1
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v").coalesce(2))
    Manifest.commitUpdateWhere(spark, root, "t",                 // v2: CoW rewrite
      Seq(Manifest.Pred("k", "2", "2", "bigint")), col("k") === 2L,
      Map("v" -> (col("v") + 5.0)))
    Manifest.compactTable(spark, root, "t", targetBytes = Long.MaxValue) // v3
    Manifest.commitAppend(spark, root, "t",                      // v4
      Seq((4L, 40.0)).toDF("k", "v").coalesce(1))
    val feed = ManifestSql.runDml(spark, root,
      """SELECT _commit_version AS cv, _change_type AS ct, k, v
        |FROM table_changes('t', 1, 4) ORDER BY cv, ct, k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // v2's CoW rewrite surfaces ONLY the changed row as its pre-image
    // delete + post-image insert (untouched rows in the rewritten file
    // cancel); v3's pure repack contributes ZERO change rows
    assert(feed.toSeq == Seq(
      (1L, "insert", 1L, 10.0), (1L, "insert", 2L, 20.0), (1L, "insert", 3L, 30.0),
      (2L, "delete", 2L, 20.0), (2L, "insert", 2L, 25.0),
      (4L, "insert", 4L, 40.0)))
    // 2-arg form reads to the current snapshot
    val tail = ManifestSql.runDml(spark, root,
      "SELECT k FROM table_changes('t', 4) ORDER BY k")
      .collect().map(_.getLong(0))
    assert(tail.toSeq == Seq(4L))
    // from = latest + 1: the legal empty interval, schema preserved
    val empty = ManifestSql.runDml(spark, root,
      "SELECT * FROM table_changes('t', 5)")
    assert(empty.count() == 0L &&
      empty.columns.contains("_change_type") &&
      empty.columns.contains("_commit_version"))
    // from-version 0 refuses (versions start at 1)
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "SELECT * FROM table_changes('t', 0, 4)")
    }
  }

  test("table_changes() text inside a string literal is immune to the rewrite") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    val got = ManifestSql.runDml(spark, root,
      """SELECT "table_changes('t', 1, 99)" AS s""")
      .collect()(0).getString(0)
    assert(got == "table_changes('t', 1, 99)")
  }
}
