package graft

import graft.ops.Manifest
import graft.sources.ManifestSql
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** DROP COLUMN and RENAME COLUMN as metadata DDL (q262/q263): the
  * narrowed/renamed registration serves every read path (API read,
  * SQL view, change feed), writes use current names only, DML on
  * renamed tables resolves aliases, and once-stored names are
  * RESERVED against resurrection.
  */
class SchemaDdlSpec extends SparkSuite {

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-schemaddl-spec").toString

  test("DROP COLUMN narrows every read NOW; old files keep bytes invisibly") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "s", "v").coalesce(1))
    Manifest.commitDropColumn(spark, root, "t", "s")
    assert(Manifest.readTable(spark, root, "t").columns.toSeq == Seq("k", "v"))
    // SQL view excludes it too
    ManifestSql.register(spark, root, "t", "t_dropped_view")
    assert(spark.table("t_dropped_view").columns.toSeq == Seq("k", "v"))
    // appends now carry the narrowed shape (positional INSERT)
    ManifestSql.runDml(spark, root, "INSERT INTO t VALUES (CAST(3 AS BIGINT), 3.0D)")
    assert(Manifest.readTable(spark, root, "t").count() == 3L)
    // pre-drop time travel still serves the column
    assert(Manifest.readTable(spark, root, "t", 1L).columns.contains("s"))
  }

  test("a dropped name is reserved: re-ADD refuses (resurrection guard)") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, "x", 1.0)).toDF("k", "s", "v").coalesce(1))
    Manifest.commitDropColumn(spark, root, "t", "s")
    val e = intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "ALTER TABLE t ADD COLUMN s STRING")
    }
    assert(e.getMessage.contains("resurrect"), e.getMessage)
  }

  test("DROP COLUMN refuses while a CHECK constraint references it") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "v").coalesce(1))
    Manifest.addCheckConstraint(spark, root, "t", "nonneg", "v >= 0")
    intercept[IllegalArgumentException] {
      Manifest.commitDropColumn(spark, root, "t", "v")
    }
    Manifest.dropCheckConstraint(root, "t", "nonneg")
    Manifest.commitDropColumn(spark, root, "t", "v") // now fine
    assert(Manifest.readTable(spark, root, "t").columns.toSeq == Seq("k"))
  }

  test("RENAME COLUMN: old files serve values under the new name everywhere") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amount").coalesce(1))
    ManifestSql.runDml(spark, root, "ALTER TABLE t RENAME COLUMN amount TO total")
    // API read
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 10.0, 2L -> 20.0), got.toString)
    assert(Manifest.readTable(spark, root, "t").columns.toSeq == Seq("k", "total"))
    // SQL view, with a predicate on the renamed column
    ManifestSql.register(spark, root, "t", "t_renamed_view")
    assert(spark.sql(
      "SELECT k FROM t_renamed_view WHERE total > 15").collect().map(_.getLong(0)).toSeq
      == Seq(2L))
    // appends land under the NEW name; mixed files both resolve
    ManifestSql.runDml(spark, root, "INSERT INTO t VALUES (CAST(3 AS BIGINT), 30.0D)")
    val all = Manifest.readTable(spark, root, "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(all == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0), all.toString)
  }

  test("DML on a renamed table resolves aliases: UPDATE/DELETE by new name") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "amount").coalesce(1))
    Manifest.commitRenameColumn(spark, root, "t", "amount", "total")
    ManifestSql.runDml(spark, root,
      "UPDATE t SET total = total * 10 WHERE total >= 2; DELETE FROM t WHERE total = 30.0")
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 2 updated to 20 via the alias-resolved scan; 3 (→30) deleted
    assert(got == Map(1L -> 1.0, 2L -> 20.0), got.toString)
  }

  test("compaction normalizes renamed columns; change feed serves current names") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "amount").coalesce(1))
    Manifest.commitRenameColumn(spark, root, "t", "amount", "total")
    Manifest.commitAppend(spark, root, "t", Seq((3L, 3.0)).toDF("k", "total"))
    // feed across the rename boundary carries the CURRENT name
    val feed = Manifest.readChangeFeed(spark, root, "t", 0L)
    assert(feed.columns.contains("total") && !feed.columns.contains("amount"))
    assert(feed.filter(col("_change_type") === "insert").count() == 3L)
    // compaction rewrites under the current name: the physical footer
    // of the compacted table has no 'amount' anywhere
    Manifest.compactTable(spark, root, "t", targetBytes = 1L << 30)
    val v = Manifest.snapshotVersion(root)
    val files = Manifest.manifestRows(spark, root, v)
      .collect { case (tb, f, _) if tb == "t" => s"$root/$f" }
    assert(files.forall(p =>
      spark.read.parquet(p).columns.toSeq == Seq("k", "total")), files)
    assert(Manifest.readTable(spark, root, "t").count() == 3L)
  }

  test("rename chain a→b→c resolves all vintages; old names stay reserved") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0)).toDF("k", "a").coalesce(1))
    Manifest.commitRenameColumn(spark, root, "t", "a", "b")
    Manifest.commitAppend(spark, root, "t", Seq((2L, 2.0)).toDF("k", "b"))
    Manifest.commitRenameColumn(spark, root, "t", "b", "c")
    Manifest.commitAppend(spark, root, "t", Seq((3L, 3.0)).toDF("k", "c"))
    val got = Manifest.readTable(spark, root, "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 1.0, 2L -> 2.0, 3L -> 3.0), got.toString)
    // both former names refuse re-introduction
    intercept[IllegalArgumentException] {
      Manifest.commitRenameColumn(spark, root, "t", "c", "a")
    }
    intercept[IllegalArgumentException] {
      ManifestSql.runDml(spark, root, "ALTER TABLE t ADD COLUMN b DOUBLE")
    }
  }

  test("ALTER COLUMN TYPE widens: pre-widen files promote, insert follows") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1, 1.5f, BigDecimal("12.34")), (2, 2.5f, BigDecimal("99999.99")))
        .toDF("k", "f", "d")
        .select(col("k").cast("int"), col("f").cast("float"),
          col("d").cast("decimal(8,2)")).coalesce(1))
    ManifestSql.runDml(spark, root,
      """ALTER TABLE t ALTER COLUMN k TYPE BIGINT;
        |ALTER TABLE t ALTER COLUMN f SET DATA TYPE DOUBLE;
        |ALTER TABLE t ALTER COLUMN d TYPE DECIMAL(18,2)""".stripMargin)
    // pre-widen INT32/FLOAT/DECIMAL(8,2) files read back exactly under
    // the widened registration (parquet type promotion, zero rewrites)
    val sch = Manifest.readTable(spark, root, "t").schema
    assert(sch("k").dataType.sql == "BIGINT" &&
      sch("f").dataType.sql == "DOUBLE" &&
      sch("d").dataType.sql == "DECIMAL(18,2)")
    // positional INSERT lands a value beyond the int range
    ManifestSql.runDml(spark, root,
      "INSERT INTO t VALUES (3000000001, 3.5, 123456789012345.67)")
    val got = Manifest.readTable(spark, root, "t").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDecimal(2).toString))
    assert(got.toSeq == Seq((1L, 1.5, "12.34"), (2L, 2.5, "99999.99"),
      (3000000001L, 3.5, "123456789012345.67")))
  }

  test("ALTER COLUMN TYPE refuses narrowing, lossy, scale, same-type, unknown") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 1.0, BigDecimal("1.23"))).toDF("k", "v", "d")
        .select(col("k"), col("v"), col("d").cast("decimal(8,2)")).coalesce(1))
    def refuse(stmt: String): Unit =
      intercept[IllegalArgumentException] { ManifestSql.runDml(spark, root, stmt) }
    refuse("ALTER TABLE t ALTER COLUMN k TYPE INT")           // narrowing
    refuse("ALTER TABLE t ALTER COLUMN v TYPE FLOAT")         // lossy
    refuse("ALTER TABLE t ALTER COLUMN d TYPE DECIMAL(18,4)") // scale change
    refuse("ALTER TABLE t ALTER COLUMN d TYPE DECIMAL(6,2)")  // precision shrink
    refuse("ALTER TABLE t ALTER COLUMN k TYPE BIGINT")        // already BIGINT
    refuse("ALTER TABLE t ALTER COLUMN v TYPE STRING")        // class change
    refuse("ALTER TABLE t ALTER COLUMN nope TYPE BIGINT")     // unknown column
    // nothing registered: the table still reads with its own types
    val sch = Manifest.readTable(spark, root, "t").schema
    assert(sch("k").dataType.sql == "BIGINT" &&
      sch("v").dataType.sql == "DOUBLE" &&
      sch("d").dataType.sql == "DECIMAL(8,2)")
  }

  test("ADD COLUMN DEFAULT: era-1 rows serve the default, stored NULL stays NULL") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").coalesce(1))
    // plain ADD COLUMN first, on a sibling table: era-1 NULL-fills —
    // the behavior DEFAULT must be DISTINGUISHABLE from
    Manifest.commitAppend(spark, root, "plain",
      Seq((1L, 10.0)).toDF("k", "v").coalesce(1))
    ManifestSql.runDml(spark, root, "ALTER TABLE plain ADD COLUMN tag STRING")
    assert(Manifest.readTable(spark, root, "plain").head().isNullAt(2))
    // DEFAULT: era-1 rows serve 'USD'
    ManifestSql.runDml(spark, root,
      "ALTER TABLE t ADD COLUMN cur STRING DEFAULT 'USD'")
    val era1 = Manifest.readTable(spark, root, "t").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(era1 == Map(1L -> "USD", 2L -> "USD"))
    // era-2: one explicit value, one explicit NULL — the stored NULL
    // must SURVIVE (a coalesce-based read would rewrite it to 'USD')
    ManifestSql.runDml(spark, root,
      "INSERT INTO t SELECT 3, 30.0, 'EUR'; " +
        "INSERT INTO t SELECT 4, 40.0, CAST(NULL AS STRING)")
    // era-2 positional omission: the trailing DEFAULT column fills
    ManifestSql.runDml(spark, root, "INSERT INTO t SELECT 5, 50.0")
    val got = Manifest.readTable(spark, root, "t").collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(got == Map(1L -> Some("USD"), 2L -> Some("USD"),
      3L -> Some("EUR"), 4L -> None, 5L -> Some("USD")))
    // DV'd reads keep the per-file branching: delete an era-1 row
    ManifestSql.runDml(spark, root, "DELETE FROM t WHERE k = 2")
    val afterDv = Manifest.readTable(spark, root, "t").collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(afterDv == got - 2L)
  }

  test("ADD COLUMN DEFAULT refusals: non-literal, bad cast, arity") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 10.0)).toDF("k", "v").coalesce(1))
    def refuse(stmt: String): String =
      intercept[IllegalArgumentException] {
        ManifestSql.runDml(spark, root, stmt) }.getMessage
    // function calls would re-evaluate per read (values drift);
    // column references have nothing to bind; both refuse loudly
    assert(refuse("ALTER TABLE t ADD COLUMN d DATE DEFAULT current_date()")
      .contains("not a literal"))
    assert(refuse("ALTER TABLE t ADD COLUMN w DOUBLE DEFAULT v * 2")
      .contains("not a literal"))
    assert(refuse("ALTER TABLE t ADD COLUMN r DOUBLE DEFAULT rand()")
      .contains("not a literal"))
    // a default that does not cast to the declared type refuses at
    // DDL time, not at first read
    assert(refuse("ALTER TABLE t ADD COLUMN n INT DEFAULT 'abc'")
      .contains("does not cast"))
    // a literal NULL default is legal (explicitly registered) — and so
    // is a TYPED null: CAST(NULL AS STRING) folds to null through the
    // cast chain, exactly as legal as the bare form
    ManifestSql.runDml(spark, root,
      "ALTER TABLE t ADD COLUMN tag STRING DEFAULT NULL")
    assert(Manifest.readTable(spark, root, "t").head().isNullAt(2))
    ManifestSql.runDml(spark, root,
      "ALTER TABLE t ADD COLUMN tag2 STRING DEFAULT CAST(NULL AS STRING)")
    assert(Manifest.readTable(spark, root, "t").head().isNullAt(3))
    // positional omission of a NON-default column still refuses
    Manifest.commitAppend(spark, root, "u",
      Seq((1L, 10.0)).toDF("k", "v").coalesce(1))
    assert(refuse("INSERT INTO u SELECT 2")
      .contains("no DEFAULT"))
  }

  test("ADD COLUMN DEFAULT on a table whose file set empties reads clean") {
    val root = freshRoot()
    Manifest.commitAppend(spark, root, "t",
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").coalesce(1))
    ManifestSql.runDml(spark, root,
      "ALTER TABLE t ADD COLUMN cur STRING DEFAULT 'USD'")
    // a copy-on-write DELETE of every row leaves ZERO files — the
    // default-branching read must serve the empty schema'd frame, not
    // throw on an empty reduce
    Manifest.commitDeleteWhere(spark, root, "t",
      Seq(Manifest.Pred("k", "0", "100", "bigint")), col("k") < 100L)
    val out = Manifest.readTable(spark, root, "t")
    assert(out.count() == 0L)
    assert(out.columns.toSeq == Seq("k", "v", "cur"))
  }
}
