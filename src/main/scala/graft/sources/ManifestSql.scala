package graft.sources

import graft.Q
import graft.ops.Manifest
import org.apache.hadoop.fs.{FileStatus, Path => HadoopPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.file.{Files, Paths}
import java.time.{LocalDate, LocalDateTime, ZoneId, ZoneOffset}
import scala.jdk.CollectionConverters._

/** The manifest table layer exposed to `spark.sql` — file-level
  * data skipping INSIDE Catalyst's planning, not behind a Scala call.
  *
  * [[Manifest.readTablePruned]] prunes files from per-file stats, but
  * only for callers who hand it `Pred` intervals; the reference's
  * implicit surface is "execute any SQL statement" (reference:
  * `dags/dev_db_test.py:41-70` submits arbitrary statements), so the
  * engine must do the same pruning when the predicate arrives as SQL
  * text. The Spark-native seam for that is a custom [[FileIndex]] —
  * exactly how Delta serves data skipping to vanilla Spark SQL: the
  * planner hands `listFiles` the pushed-down data filters, the index
  * answers with the manifest-listed files whose recorded [min, max]
  * may satisfy them, and everything downstream (parquet reader,
  * row-level filtering, whole-stage codegen, AQE) is stock Spark.
  * Unknown or unsupported predicates keep all files — stats BOUND the
  * scan, they never filter rows.
  *
  * At 100 TB: planning cost is |manifest rows| driver-side (metadata-
  * sized, no directory listing, no data I/O), and a day-window query
  * over a year-ranged table plans a scan of ~1/365 of the files with
  * zero user-code involvement.
  */
object ManifestSql {

  /** One manifest-listed file with its decoded stats: column →
    * (min, max) strings, None = recorded null bound (no non-null
    * rows in the file for that column). */
  private[sources] final case class Entry(
      path: String, size: Long, modTime: Long,
      stats: Map[String, (Option[String], Option[String])])

  /** Build the pruning [[FileIndex]] + DataFrame for `table`. With an
    * explicit `version` the view time-travels (frozen file list);
    * with the default the view is LIVE — every query resolves the
    * CURRENT committed snapshot, so commits made after registration
    * are visible without re-registering (a table, not a frozen file
    * list). The SCHEMA pins at registration: the registered one when
    * the table evolved (old files NULL-fill), else inferred from the
    * committed files — a later evolving append needs a re-register to
    * surface its new column (same contract as any SQL catalog). */
  def tableDF(spark: SparkSession, root: String, table: String,
              version: Long = -1L): (DataFrame, ManifestFileIndex) = {
    val v = if (version > 0) version else Manifest.snapshotVersion(root)
    require(v > 0, s"no committed snapshot at $root")
    // ACL gate: a table with registered grants reads only as admin or
    // a granted role (enforced HERE, where every SQL view is born, so
    // no statement path can route around it); grant-free tables stay
    // open. Enforcement is registration-time, like policy resolution.
    Manifest.requireSelect(root, table,
      spark.conf.get("graft.sql.role", "admin"))
    val entries = ManifestFileIndex.resolveEntries(spark, root, table, v)
    require(entries.nonEmpty, s"table $table absent from snapshot v$v")
    val schema = Manifest.registeredSchema(spark, root, table, v).getOrElse(
      spark.read.parquet(entries.map(_.path): _*).schema)
    // RENAME aliases: the relation scans the PHYSICAL union schema
    // (current + former names, NULL-filled where absent) and the view
    // projects back per-field coalesce(current, …aliases) — files
    // from either side of a rename serve their values under the
    // current name; alias-free tables keep the plain pinned relation
    val hasAliases = schema.fields.exists(f => Manifest.aliasesOf(f).nonEmpty)
    val physSchema =
      if (!hasAliases) schema
      else StructType(schema.fields.flatMap { f =>
        StructField(f.name, f.dataType, nullable = true) +:
          Manifest.aliasesOf(f).map(a =>
            StructField(a, f.dataType, nullable = true))
      })
    // the registration-time resolution seeds the index cache (valid
    // for snapshot v): a live view's first query re-resolves only if
    // the version moved — one manifest walk per change, not two per
    // registration
    val index = new ManifestFileIndex(spark, root, table,
      if (version > 0) version else -1L, physSchema, Manifest.sessionZone(spark),
      initial = Some(v -> entries))
    val relation = HadoopFsRelation(index, new StructType(), physSchema, None,
      new ParquetFileFormat(), Map.empty[String, String])(spark)
    val df0 = spark.baseRelationToDataFrame(relation)
    val df =
      if (!hasAliases) df0
      else df0.select(schema.fields.toIndexedSeq.map { f =>
        val alts = Manifest.aliasesOf(f)
        if (alts.isEmpty) col(f.name)
        else coalesce((f.name +: alts.reverse).map(col): _*).as(f.name)
      }: _*)
    (applyPolicies(spark, root, table, df), index)
  }

  /** Compose `table`'s REGISTERED governance policies onto the scan
    * for the session's role (`graft.sql.role`, default `admin` — the
    * single-user session owner): row-access policies filter first,
    * masking policies rewrite their columns, both as plain Catalyst
    * expressions (codegen'd, pushdown-friendly; the row filter reaches
    * the parquet scan). Policies resolve at REGISTRATION — after `SET
    * ROLE`, re-register the view, exactly like a catalog session. A
    * policy-free table returns the frame untouched. */
  private def applyPolicies(spark: SparkSession, root: String, table: String,
                            df0: DataFrame): DataFrame = {
    val (masks, rowPols) = Manifest.tablePolicies(root, table)
    if (masks.isEmpty && rowPols.isEmpty) return df0
    val role = spark.conf.get("graft.sql.role", "admin")
    def argAndBody(policy: String): (String, org.apache.spark.sql.Column) = {
      val (_, arg, body) = Manifest.policyOf(root, policy).getOrElse(
        throw new IllegalStateException(
          s"table $table references unknown policy $policy"))
      (arg, expr(Manifest.roleSubstituted(body, role)))
    }
    var df = df0
    rowPols.foreach { case (policy, colName) =>
      val (arg, pred) = argAndBody(policy)
      if (arg == colName) df = df.filter(pred)
      else df = df.withColumn(arg, col(colName)).filter(pred).drop(arg)
    }
    masks.toSeq.sorted.foreach { case (colName, policy) =>
      val (arg, e) = argAndBody(policy)
      if (arg == colName) df = df.withColumn(colName, e)
      else df = df.withColumn(arg, col(colName))
        .withColumn(colName, e).drop(arg)
    }
    df
  }

  /** Register `table` as temp view `viewName`: from here on, plain
    * `spark.sql` text over the view plans through the pruning index
    * (live-tracking unless `version` pins a snapshot). */
  def register(spark: SparkSession, root: String, table: String,
               viewName: String, version: Long = -1L): ManifestFileIndex = {
    val (df, index) = tableDF(spark, root, table, version)
    df.createOrReplaceTempView(viewName)
    index
  }

  // ------------------------------------------------------------------- DML

  /** Character positions of `s` at statement top level: outside string
    * literals, quoted identifiers, and parentheses — the only places a
    * DML keyword or separator can legally sit. */
  private def topLevelMask(s: String): Array[Boolean] = {
    val mask = new Array[Boolean](s.length)
    var depth = 0
    var state: Char = 'n' // n=normal, q='\'' string, b=`backtick`, d="double"
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      state match {
        case 'n' => ch match {
          case '\'' => state = 'q'
          case '`' => state = 'b'
          case '"' => state = 'd'
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ => if (depth == 0) mask(i) = true
        }
        case 'q' => if (ch == '\'') state = 'n'
        case 'b' => if (ch == '`') state = 'n'
        case 'd' => if (ch == '"') state = 'n'
      }
      i += 1
    }
    mask
  }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val mask = topLevelMask(s)
    val out = Seq.newBuilder[String]
    var start = 0
    for (i <- s.indices if s.charAt(i) == sep && mask(i)) {
      out += s.substring(start, i); start = i + 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Index of the first TOP-LEVEL occurrence of keyword `word`
    * (case-insensitive, word-bounded), or -1. `_` and `.` count as
    * word characters — a snake_case or qualified identifier that
    * EMBEDS a keyword (`totals_on_hand`, `my_where_col`, `t.on`) must
    * not split at the embedded fragment. */
  private def topLevelKeyword(s: String, word: String): Int = {
    val mask = topLevelMask(s)
    val lower = s.toLowerCase
    def wordChar(ch: Char): Boolean =
      Character.isLetterOrDigit(ch) || ch == '_' || ch == '.'
    var i = lower.indexOf(word)
    while (i >= 0) {
      val bounded =
        (i == 0 || !wordChar(lower.charAt(i - 1))) &&
          (i + word.length >= s.length ||
            !wordChar(lower.charAt(i + word.length)))
      if (bounded && mask(i)) return i
      i = lower.indexOf(word, i + 1)
    }
    -1
  }

  private val DeleteRe =
    "(?is)^DELETE\\s+FROM\\s+([A-Za-z0-9_.-]+)(?:\\s+(.*))?$".r
  // WHERE <col> IN (SELECT ...) — the whole clause, nothing trailing
  private val DeleteInSubRe =
    "(?is)^([A-Za-z0-9_.]+)\\s+IN\\s*\\((\\s*SELECT\\b.*)\\)\\s*$".r
  private val UpdateRe =
    "(?is)^UPDATE\\s+([A-Za-z0-9_.-]+)\\s+SET\\s+(.*)$".r
  private val MergeRe =
    ("(?is)^MERGE\\s+INTO\\s+([A-Za-z0-9_.-]+)" +
      "(?:\\s+(?:AS\\s+)?([A-Za-z_][A-Za-z0-9_]*))?\\s+USING\\s+(.*)$").r
  private val MergeEvolveRe =
    ("(?is)^MERGE\\s+WITH\\s+SCHEMA\\s+EVOLUTION\\s+INTO\\s+" +
      "([A-Za-z0-9_.-]+)" +
      "(?:\\s+(?:AS\\s+)?([A-Za-z_][A-Za-z0-9_]*))?\\s+USING\\s+(.*)$").r
  // one WHEN clause each — non-greedy condition up to THEN (a
  // top-level CASE ... THEN inside a clause condition would mis-split;
  // parenthesize it, as the loud downstream parse failure instructs)
  private val WhenNotMatchedRe =
    "(?is)^WHEN\\s+NOT\\s+MATCHED(?:\\s+AND\\s+(.+?))?\\s+THEN\\s+INSERT\\s+(.+)$".r
  private val WhenMatchedUpdRe =
    "(?is)^WHEN\\s+MATCHED(?:\\s+AND\\s+(.+?))?\\s+THEN\\s+UPDATE\\s+SET\\s+(.+)$".r
  private val WhenMatchedDelRe =
    "(?is)^WHEN\\s+MATCHED(?:\\s+AND\\s+(.+?))?\\s+THEN\\s+DELETE\\s*$".r
  private val WhenBySrcUpdRe =
    ("(?is)^WHEN\\s+NOT\\s+MATCHED\\s+BY\\s+SOURCE(?:\\s+AND\\s+(.+?))?" +
      "\\s+THEN\\s+UPDATE\\s+SET\\s+(.+)$").r
  private val WhenBySrcDelRe =
    ("(?is)^WHEN\\s+NOT\\s+MATCHED\\s+BY\\s+SOURCE(?:\\s+AND\\s+(.+?))?" +
      "\\s+THEN\\s+DELETE\\s*$").r

  /** All top-level word-boundary positions of keyword `word` — the
    * multi-hit sibling of [[topLevelKeyword]], used to split a MERGE's
    * WHEN-clause chain. */
  private def topLevelPositions(s: String, word: String): Seq[Int] = {
    val mask = topLevelMask(s)
    val lower = s.toLowerCase
    def wordChar(ch: Char): Boolean =
      Character.isLetterOrDigit(ch) || ch == '_' || ch == '.'
    val out = Seq.newBuilder[Int]
    var i = lower.indexOf(word)
    while (i >= 0) {
      val bounded =
        (i == 0 || !wordChar(lower.charAt(i - 1))) &&
          (i + word.length >= s.length ||
            !wordChar(lower.charAt(i + word.length)))
      if (bounded && mask(i)) out += i
      i = lower.indexOf(word, i + 1)
    }
    out.result()
  }

  /** `[AS] alias` tail of a MERGE relation; `default` is the relation's
    * own name (None for an anonymous subquery). */
  private def relAlias(toks: Seq[String], default: Option[String]): Option[String] =
    toks.map(_.trim).filter(_.nonEmpty) match {
      case Seq() => default
      case Seq(a) => Some(a)
      case Seq(as, a) if as.equalsIgnoreCase("AS") => Some(a)
      case other => throw new IllegalArgumentException(
        s"unsupported MERGE relation tail: ${other.mkString(" ")}")
    }

  /** Parse one `WHEN ...` clause into its [[Manifest.MergeWhen]] /
    * [[Manifest.MergeBySource]] form (BY SOURCE patterns checked
    * FIRST — `NOT MATCHED BY SOURCE` must never half-match the plain
    * `NOT MATCHED` insert grammar). SET left-hand sides may carry the
    * target alias (stripped here); expression text goes VERBATIM to
    * Spark's parser downstream. */
  private def parseWhenClause(clause: String, tAlias: String)
      : Either[Manifest.MergeBySource, Manifest.MergeWhen] = {
    def cond(c: String): Option[String] = Option(c).map(_.trim)
    def sets(body: String): Seq[(String, String)] =
      splitTopLevel(body, ',').map { a =>
        val eq = a.indexOf('=')
        require(eq > 0 && topLevelMask(a)(eq), s"malformed SET clause: $a")
        var lhs = a.substring(0, eq).trim
        if (lhs.length > tAlias.length + 1 &&
          lhs.substring(0, tAlias.length).equalsIgnoreCase(tAlias) &&
          lhs.charAt(tAlias.length) == '.')
          lhs = lhs.substring(tAlias.length + 1)
        lhs -> a.substring(eq + 1).trim
      }
    clause match {
      case WhenBySrcUpdRe(c, body) =>
        return Left(Manifest.BySourceUpdate(cond(c), sets(body.trim)))
      case WhenBySrcDelRe(c) =>
        return Left(Manifest.BySourceDelete(cond(c)))
      case _ =>
    }
    Right(clause match {
      case WhenNotMatchedRe(c, body0) =>
        val body = body0.trim
        if (body == "*") Manifest.MergeInsert(cond(c), Nil, Nil)
        else {
          require(body.startsWith("("),
            s"unsupported INSERT shape (need * or (cols) VALUES (exprs)): $body")
          val close = matchingParen(body)
          require(close > 0, s"unbalanced parens in INSERT column list: $body")
          val cols = splitTopLevel(body.substring(1, close), ',').map(_.trim)
          val after = body.substring(close + 1).trim
          require(after.length >= 6 && after.substring(0, 6).equalsIgnoreCase("VALUES"),
            s"INSERT column list without VALUES: $after")
          val vp = after.substring(6).trim
          require(vp.startsWith("("), s"VALUES without a parenthesized list: $vp")
          val vclose = matchingParen(vp)
          require(vclose == vp.length - 1,
            s"trailing text after INSERT VALUES list: $vp")
          Manifest.MergeInsert(cond(c), cols,
            splitTopLevel(vp.substring(1, vclose), ','))
        }
      case WhenMatchedUpdRe(c, body0) =>
        val body = body0.trim
        if (body == "*") Manifest.MergeUpdate(cond(c), Nil)
        else Manifest.MergeUpdate(cond(c), sets(body))
      case WhenMatchedDelRe(c) => Manifest.MergeDelete(cond(c))
      case other => throw new IllegalArgumentException(
        s"unsupported MERGE WHEN clause: $other")
    })
  }

  /** Parse a MERGE/UPDATE-FROM/DELETE-USING source relation —
    * `<view | (subquery)> [AS] alias` — into (frame, alias); a named
    * view's own name is its default alias. */
  private def parseRelation(spark: SparkSession,
                            part: String): (org.apache.spark.sql.DataFrame, Option[String]) =
    if (part.startsWith("(")) {
      val close = matchingParen(part)
      require(close > 0, s"unbalanced parens in source relation: $part")
      (spark.sql(part.substring(1, close)),
        relAlias(part.substring(close + 1).split("\\s+").toSeq, None))
    } else {
      val toks = part.split("\\s+").toSeq
      (spark.table(toks.head), relAlias(toks.tail, Some(toks.head)))
    }

  /** Split `text` on top-level AND keywords (quote/paren-aware). */
  private def splitConjuncts(text: String): Seq[String] = {
    val cuts = topLevelPositions(text, "and")
    val bounds = (-3 +: cuts) :+ text.length // -3: first segment starts at 0
    bounds.zip(bounds.tail).map { case (a, b) =>
      text.substring(a + 3, b).trim
    }.filter(_.nonEmpty)
  }

  /** `UPDATE t SET c = e, ... FROM <src> [AS] s WHERE t.k = s.k
    * [AND cond]` (the Snowflake join-update) — semantically a MERGE
    * with one conditional MATCHED clause and NO insert clause, and it
    * routes to exactly that machinery ([[Manifest.commitMergeClauses]]):
    * SET expressions see the OLD target row joined to its source row,
    * the extra WHERE conjuncts become the clause condition (verbatim,
    * either alias), unmatched target rows are untouched, and
    * duplicate source keys refuse LOUDLY — the nondeterministic
    * multi-match update warehouses ship as a footgun is not
    * reproduced. One WHERE conjunct must be the `t.k = s.k`
    * equi-join; stats-bounded O(affected files) cost as in MERGE. */
  private def runUpdateFrom(spark: SparkSession, root: String, table: String,
                            rest: String, fromPos: Int): Unit = {
    val setPart = rest.substring(0, fromPos)
    val tail = rest.substring(fromPos + 4)
    val wherePos = topLevelKeyword(tail, "where")
    require(wherePos > 0,
      s"UPDATE ... FROM without a WHERE join condition: $tail")
    val (sourceDf, srcAlias) =
      parseRelation(spark, tail.substring(0, wherePos).trim)
    val sA = srcAlias.getOrElse(throw new IllegalArgumentException(
      "UPDATE ... FROM needs a named or aliased source"))
    val sets = splitTopLevel(setPart, ',').map { a =>
      val eq = a.indexOf('=')
      require(eq > 0 && topLevelMask(a)(eq), s"malformed SET clause: $a")
      var lhs = a.substring(0, eq).trim
      if (lhs.length > table.length + 1 &&
        lhs.substring(0, table.length).equalsIgnoreCase(table) &&
        lhs.charAt(table.length) == '.')
        lhs = lhs.substring(table.length + 1)
      lhs -> a.substring(eq + 1).trim
    }
    val conj = splitConjuncts(tail.substring(wherePos + 5).trim)
    val (joins, conds) = conj.partition {
      case MergeOnRe(q1, k1, q2, k2) =>
        k1.equalsIgnoreCase(k2) &&
          Set(q1.toLowerCase, q2.toLowerCase) ==
            Set(table.toLowerCase, sA.toLowerCase)
      case _ => false
    }
    require(joins.nonEmpty,
      s"UPDATE ... FROM needs at least one '$table.k = $sA.k' equi-join " +
        "conjunct in WHERE")
    // composite keys: every `t.k = s.k` conjunct is a key column; the
    // match is their conjunction (the commitMergeClauses contract)
    val keyCols = joins.map { case MergeOnRe(_, k1, _, _) => k1 }
    require(keyCols.map(_.toLowerCase).distinct.size == keyCols.size,
      s"UPDATE ... FROM repeats a join key column: ${keyCols.mkString(", ")}")
    val cond = if (conds.isEmpty) None else Some(conds.mkString(" AND "))
    val _ = Manifest.commitMergeClauses(spark, root, table, sourceDf,
      keyCols, table, sA, Seq(Manifest.MergeUpdate(cond, sets)), Nil, Nil, 5)
  }

  /** `DELETE FROM t USING <src> [AS] s WHERE t.k = s.k [AND conds]`
    * (the Snowflake join-delete): rows of `t` whose key appears in
    * the (filtered) source are deleted through the SEMI-JOIN DV path
    * ([[Manifest.commitDeleteKeys]] — O(matched rows), key set never
    * visits the driver, duplicate source keys harmless). Extra
    * conjuncts must reference the SOURCE alone (they filter which
    * source rows drive the delete); a condition on the TARGET is the
    * MERGE ... WHEN MATCHED THEN DELETE clause's job and refuses
    * loudly here rather than mis-binding. */
  private def runDeleteUsing(spark: SparkSession, root: String, table: String,
                             rest: String): Unit = {
    val wherePos = topLevelKeyword(rest, "where")
    require(wherePos > 0,
      s"DELETE ... USING without a WHERE join condition: $rest")
    val (sourceDf, srcAlias) =
      parseRelation(spark, rest.substring(0, wherePos).trim)
    val sA = srcAlias.getOrElse(throw new IllegalArgumentException(
      "DELETE ... USING needs a named or aliased source"))
    val conj = splitConjuncts(rest.substring(wherePos + 5).trim)
    val (joins, conds) = conj.partition {
      case MergeOnRe(q1, k1, q2, k2) =>
        k1.equalsIgnoreCase(k2) &&
          Set(q1.toLowerCase, q2.toLowerCase) ==
            Set(table.toLowerCase, sA.toLowerCase)
      case _ => false
    }
    require(joins.nonEmpty,
      s"DELETE ... USING needs at least one '$table.k = $sA.k' equi-join " +
        "conjunct in WHERE")
    // composite keys: every `t.k = s.k` conjunct is a key column; a
    // row deletes only when ALL of them match a source row
    val keyCols = joins.map { case MergeOnRe(_, k1, _, _) => k1 }
    require(keyCols.map(_.toLowerCase).distinct.size == keyCols.size,
      s"DELETE ... USING repeats a join key column: ${keyCols.mkString(", ")}")
    // remaining conjuncts must bind to the source alone — strip the
    // alias and refuse any reference to the target's namespace
    val badRef = ("(?i)(?<![A-Za-z0-9_])" +
      java.util.regex.Pattern.quote(table) + "\\.").r
    conds.foreach(c => require(badRef.findFirstIn(c).isEmpty,
      s"DELETE ... USING condition references the target ($c) — " +
        "use MERGE ... WHEN MATCHED [AND cond] THEN DELETE for " +
        "target-side conditions"))
    val filtered = conds.foldLeft(sourceDf.alias(sA))(
      (df, c) => df.filter(expr(c))) // alias-qualified refs resolve
    val _ = Manifest.commitDeleteKeys(spark, root, table,
      filtered.select(keyCols.map(col): _*), keyCols, 5, None)
  }

  /** `INSERT ALL | FIRST [WHEN <cond> THEN] INTO t [(cols) VALUES
    * (exprs)] ... [ELSE INTO t ...] SELECT ...` — Snowflake's
    * multi-table insert (the fan-out router every warehouse ETL
    * eventually writes): the subquery evaluates ONCE (pinned), each
    * branch filters it — `ALL` fires every matching WHEN (a row can
    * land in several tables), `FIRST` fires only the first matching
    * WHEN per row (guarded by the accumulated negation of earlier
    * conditions), `ELSE` takes the rows no WHEN matched; a branch's
    * `(cols) VALUES (exprs)` projects subquery columns into the
    * target's columns (unlisted columns NULL-fill), a bare `INTO t`
    * takes the full row positionally. ALL targets land in ONE CAS
    * claim ([[Manifest.commitAppendMulti]]) — readers see every
    * branch or none, the cross-table atomicity Snowflake itself does
    * give this statement and single-table logs cannot. Targets must
    * exist (a typo'd INTO must not auto-create a table); unknown
    * branch columns refuse before anything lands. Returns the
    * (table, n_rows_inserted) report. */
  private def runInsertMulti(spark: SparkSession, root: String,
                             mode: String, rest: String): DataFrame = {
    val selPos = topLevelKeyword(rest, "select")
    require(selPos > 0, s"INSERT $mode without a SELECT subquery: $rest")
    val branchText = rest.substring(0, selPos).trim
    val first = mode.equalsIgnoreCase("FIRST")
    // scan the branch region: WHEN <cond> THEN INTO ... | ELSE INTO
    // ... | leading unconditional INTO ...
    val whenPos = topLevelPositions(branchText, "when")
    val elsePos = topLevelPositions(branchText, "else")
    require(elsePos.size <= 1, "INSERT: at most one ELSE branch")
    require(elsePos.forall(e => whenPos.forall(_ < e)),
      "INSERT: ELSE must follow every WHEN")
    // (condOpt, intoText) per region, in statement order
    val regions: Seq[(Option[String], String)] = {
      val cuts = (whenPos ++ elsePos).sorted
      if (cuts.isEmpty) Seq((None, branchText))
      else {
        val lead = branchText.substring(0, cuts.head).trim
        require(lead.isEmpty,
          s"INSERT: unparsed text before the first WHEN/ELSE: $lead")
        cuts.zip(cuts.tail :+ branchText.length).map { case (a, b) =>
          val seg = branchText.substring(a, b).trim
          if (seg.toLowerCase.startsWith("else"))
            (Some("__else__"), seg.substring(4).trim)
          else {
            val thenPos = topLevelKeyword(seg, "then")
            require(thenPos > 0, s"WHEN without THEN: $seg")
            (Some(seg.substring(4, thenPos).trim),
              seg.substring(thenPos + 4).trim)
          }
        }
      }
    }
    // each region's INTO list: INTO t [(cols) VALUES (exprs)] —
    // `whenIdx` is the region's POSITION among the WHEN regions (-1
    // for ELSE / unconditional): FIRST-mode precedence is positional,
    // so two WHEN branches with IDENTICAL condition text still negate
    // correctly (guarding by text would give the later branch the
    // first's guard and route a row into BOTH targets)
    final case class Branch(cond: Option[String], whenIdx: Int,
                            table: String, cols: Seq[String],
                            vals: Seq[String])
    var whenSeen = -1
    val branches = regions.flatMap { case (cond, intoText) =>
      val whenIdx = cond match {
        case Some(c) if c != "__else__" => whenSeen += 1; whenSeen
        case _ => -1
      }
      val intos = topLevelPositions(intoText, "into")
      require(intos.nonEmpty && intoText.substring(0, intos.head).trim.isEmpty,
        s"INSERT: expected INTO, got: $intoText")
      intos.zip(intos.tail :+ intoText.length).map { case (a, b) =>
        val seg = intoText.substring(a + 4, b).trim
        val name = seg.takeWhile(!_.isWhitespace)
        require(name.matches("[A-Za-z0-9_.-]+"), s"bad INTO target: $seg")
        val tail = seg.substring(name.length).trim
        if (tail.isEmpty) Branch(cond, whenIdx, name, Nil, Nil)
        else {
          require(tail.startsWith("("), s"unsupported INTO tail: $tail")
          val close = matchingParen(tail)
          val cols = splitTopLevel(tail.substring(1, close), ',').map(_.trim)
          val after = tail.substring(close + 1).trim
          require(after.length >= 6 &&
            after.substring(0, 6).equalsIgnoreCase("VALUES"),
            s"INTO column list without VALUES: $after")
          val vp = after.substring(6).trim
          require(vp.startsWith("(") && matchingParen(vp) == vp.length - 1,
            s"malformed INTO VALUES list: $vp")
          val vals = splitTopLevel(vp.substring(1, vp.length - 1), ',')
          require(cols.size == vals.size,
            s"INTO $name lists ${cols.size} columns but ${vals.size} values")
          Branch(cond, whenIdx, name, cols, vals)
        }
      }
    }
    require(branches.nonEmpty, "INSERT: no INTO branches")
    val pinned = spark.sql(rest.substring(selPos))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // FIRST: each WHEN guarded by the accumulated negation of the
      // earlier conditions BY POSITION (`take(whenIdx)`, never by
      // condition text — duplicate texts must not share a guard);
      // ELSE is that negation over ALL whens
      val whenConds = regions.flatMap(_._1).filter(_ != "__else__")
      def guard(cond: Option[String], whenIdx: Int): org.apache.spark.sql.Column =
        cond match {
          case None => lit(true)
          case Some("__else__") =>
            whenConds.map(c => !coalesce(expr(c), lit(false)))
              .foldLeft(lit(true))(_ && _)
          case Some(c) if first =>
            whenConds.take(whenIdx).map(p => !coalesce(expr(p), lit(false)))
              .foldLeft(coalesce(expr(c), lit(false)))(_ && _)
          case Some(c) => coalesce(expr(c), lit(false))
        }
      val perBranch = branches.map { b =>
        val target = Manifest.registeredSchema(spark, root, b.table)
          .getOrElse(Manifest.readTable(spark, root, b.table).schema)
        val rows = pinned.filter(guard(b.cond, b.whenIdx))
        val batch =
          if (b.cols.isEmpty) {
            require(rows.schema.length == target.length,
              s"INTO ${b.table}: ${rows.schema.length} columns provided, " +
                s"table has ${target.length}")
            rows.toDF(target.fieldNames.toIndexedSeq: _*)
              .select(target.fields.toIndexedSeq.map(f =>
                col(f.name).cast(f.dataType)): _*)
          } else {
            val bad = b.cols.filterNot(target.fieldNames.contains)
            require(bad.isEmpty, s"INTO ${b.table}: unknown columns $bad")
            rows.select(target.fields.toIndexedSeq.map { f =>
              (b.cols.indexOf(f.name) match {
                case -1 => lit(null)
                case p => expr(b.vals(p))
              }).cast(f.dataType).as(f.name)
            }: _*)
          }
        (b.table, batch)
      }
      // the (table, n_rows_inserted) report rides `observe` metrics on
      // the commit's OWN write pass (the COPY q241 / unload q251
      // idiom) — no second action per branch: publishData executes
      // each batch exactly once before the claim, so every
      // Observation resolves, including zero-row branches (count = 0)
      val merged = perBranch.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (t, bs) =>
          val obs = org.apache.spark.sql.Observation()
          (t, bs.map(_._2).reduce(_ unionByName _)
            .observe(obs, count(lit(1)).as("n")), obs)
      }
      val v = Manifest.commitAppendMulti(spark, root,
        merged.map { case (t, df, _) => (t, df, Seq.empty[String]) })
      import spark.implicits._
      merged.map { case (t, _, obs) => (t, obs.get("n").asInstanceOf[Long]) }
        .toDF("table_name", "n_rows_inserted")
        .withColumn("version", lit(v)).orderBy("table_name")
    } finally pinned.unpersist()
  }

  /** Shared body of the MERGE statement forms (see the q223 scaladoc):
    * parses the full clause grammar —
    * `USING <view | (subquery)> [AS] s ON t.k = s.k` followed by any
    * ordered mix of `WHEN MATCHED [AND c] THEN UPDATE SET <* | col =
    * expr, ...> | DELETE` and `WHEN NOT MATCHED [AND c] THEN INSERT
    * <* | (cols) VALUES (exprs)>` clauses
    * [+ `WHEN NOT MATCHED BY SOURCE [AND c] THEN DELETE`]. The exact
    * two-clause full-row shorthand (`UPDATE SET * / INSERT *`, no
    * conditions) routes to [[Manifest.commitMergeUpsert]] — bit-
    * unchanged fast path; everything else routes to
    * [[Manifest.commitMergeClauses]] with the statement's own aliases,
    * so clause text resolves `t.x`/`s.x` verbatim. `evolve` = the WITH
    * SCHEMA EVOLUTION statement form — full-row shorthand only, and
    * incompatible with the BY SOURCE tail (both combinations are
    * refused, not guessed at); the BY SOURCE tail likewise combines
    * only with the shorthand head ([[Manifest.commitMergeFull]]). */
  private def runMergeText(spark: SparkSession, root: String,
                           table: String, tgtAliasRaw: String,
                           rest: String, evolve: Boolean): Unit = {
    val onPos = topLevelKeyword(rest, "on")
    require(onPos > 0, s"MERGE without ON clause: $rest")
    val sourcePart = rest.substring(0, onPos).trim
    val afterOn = rest.substring(onPos + 2)
    val whenPos = topLevelKeyword(afterOn, "when")
    require(whenPos > 0, s"MERGE without WHEN clauses: $afterOn")
    val onText = afterOn.substring(0, whenPos).trim
    // full-sync tail first: WHEN NOT MATCHED BY SOURCE [AND c]
    // THEN DELETE peels off the original text (condition keeps
    // its case); the head must still be the standard shorthand
    val (coreWhen, syncDelete) = afterOn.substring(whenPos) match {
      case MergeSyncTailRe(head, cond) => (head, Some(Option(cond)))
      case w => (w, None)
    }
    require(!(evolve && syncDelete.isDefined),
      "MERGE WITH SCHEMA EVOLUTION does not combine with WHEN NOT " +
        "MATCHED BY SOURCE")
    val (sourceDf, srcAlias) =
      if (sourcePart.startsWith("(")) {
        val close = matchingParen(sourcePart)
        require(close > 0, s"unbalanced parens in MERGE source: $sourcePart")
        (spark.sql(sourcePart.substring(1, close)),
          relAlias(sourcePart.substring(close + 1).split("\\s+").toSeq, None))
      } else {
        val toks = sourcePart.split("\\s+").toSeq
        (spark.table(toks.head), relAlias(toks.tail, Some(toks.head)))
      }
    val tAlias = Option(tgtAliasRaw).getOrElse(table)
    // composite keys: the ON clause is a CONJUNCTION of `t.k = s.k`
    // equi-conjuncts (one or more) — every conjunct must bind the same
    // two relations, the key list must not repeat a column, and
    // anything else (OR, inequality, expressions) refuses loudly
    val onPairs = splitConjuncts(onText).map {
      case MergeOnRe(q1, k1, q2, k2) if k1.equalsIgnoreCase(k2) =>
        (Set(q1.toLowerCase, q2.toLowerCase), k1)
      case c => throw new IllegalArgumentException(
        s"unsupported MERGE ON conjunct (need t.k = s.k, shared column " +
          s"name per conjunct): $c")
    }
    require(onPairs.nonEmpty,
      s"unsupported MERGE ON shape (need t.k = s.k [AND ...]): $onText")
    require(onPairs.map(_._1).distinct.size == 1,
      s"MERGE ON conjuncts bind different relations: $onText")
    val onQuals = onPairs.head._1
    val keyCols = onPairs.map(_._2)
    require(keyCols.map(_.toLowerCase).distinct.size == keyCols.size,
      s"MERGE ON repeats a key column: $onText")
    // split + parse the clause chain (empty = the whole statement was
    // a single BY SOURCE tail the sync peel took — legal)
    val parsed =
      if (coreWhen.trim.isEmpty) Seq.empty
      else {
        val positions = topLevelPositions(coreWhen, "when")
        require(positions.nonEmpty &&
          coreWhen.substring(0, positions.head).trim.isEmpty,
          s"malformed MERGE WHEN chain: $coreWhen")
        positions.zip(positions.tail :+ coreWhen.length)
          .map { case (a, b) =>
            parseWhenClause(coreWhen.substring(a, b).trim, tAlias) }
      }
    val clauses = parsed.collect { case Right(w) => w }
    val bys = parsed.collect { case Left(b) => b }
    val legacy = bys.isEmpty && (clauses match {
      case Seq(Manifest.MergeUpdate(None, Seq()),
               Manifest.MergeInsert(None, Seq(), Seq())) => true
      case _ => false
    })
    require(!(evolve && (!legacy || syncDelete.isDefined)),
      "MERGE WITH SCHEMA EVOLUTION supports only the full-row " +
        s"UPDATE SET * / INSERT * shorthand (no BY SOURCE), got: $coreWhen")
    (syncDelete, legacy) match {
      case (Some(cond), true) =>
        // legacy sync merge, bit-unchanged: target rows whose key is
        // absent from the source are deleted (unconditionally, or
        // where the AND condition passes — unqualified target
        // columns), with union-of-bounds pruning
        val _ = Manifest.commitMergeFull(spark, root, table, sourceDf, keyCols,
          cond.map(expr).getOrElse(lit(true)), Nil, 5)
      case (None, true) =>
        val _ = Manifest.commitMergeUpsert(spark, root, table, sourceDf,
          keyCols, 5, None, allowEvolution = evolve)
      case (sd, false) =>
        // clause form: the statement's aliases ARE the resolution
        // namespace — require the ON qualifiers to be exactly them.
        // A trailing BY SOURCE DELETE the sync peel took rejoins the
        // chain as the LAST BY SOURCE clause (it was the last clause
        // of the statement)
        val sA = srcAlias.getOrElse(throw new IllegalArgumentException(
          "clause-form MERGE needs a named or aliased source"))
        require(onQuals == Set(tAlias.toLowerCase, sA.toLowerCase),
          s"MERGE ON qualifiers $onQuals do not match the statement " +
            s"aliases ($tAlias, $sA)")
        val allBys = bys ++
          sd.map(c => Manifest.BySourceDelete(c.map(_.trim))).toSeq
        val _ = Manifest.commitMergeClauses(spark, root, table, sourceDf,
          keyCols, tAlias, sA,
          clauses.filter(!_.isInstanceOf[Manifest.MergeInsert]),
          clauses.collect { case i: Manifest.MergeInsert => i },
          allBys, 5)
    }
  }
  /** Parse a clause-form MERGE statement body into a
    * [[Manifest.SpanMerge]] action for BEGIN...COMMIT spans — the same
    * ON/WHEN grammar as [[runMergeText]] minus the forms a span cannot
    * fold into DV sidecars: `WHEN NOT MATCHED BY SOURCE` (whole-table
    * rewrite scope) and WITH SCHEMA EVOLUTION refuse loudly toward
    * their single-statement forms. */
  private def parseSpanMerge(spark: SparkSession, table: String,
                             tgtAliasRaw: String,
                             rest: String): Manifest.SpanMerge = {
    val onPos = topLevelKeyword(rest, "on")
    require(onPos > 0, s"MERGE without ON clause: $rest")
    val sourcePart = rest.substring(0, onPos).trim
    val afterOn = rest.substring(onPos + 2)
    val whenPos = topLevelKeyword(afterOn, "when")
    require(whenPos > 0, s"MERGE without WHEN clauses: $afterOn")
    val onText = afterOn.substring(0, whenPos).trim
    val coreWhen = afterOn.substring(whenPos)
    require(!MergeSyncTailRe.matches(coreWhen),
      "MERGE ... WHEN NOT MATCHED BY SOURCE inside BEGIN...COMMIT is " +
        "not supported (run it as its own atomic statement)")
    val (sourceDf, srcAlias) = parseRelation(spark, sourcePart)
    val sA = srcAlias.getOrElse(throw new IllegalArgumentException(
      "MERGE inside BEGIN...COMMIT needs a named or aliased source"))
    val tAlias = Option(tgtAliasRaw).getOrElse(table)
    val onPairs = splitConjuncts(onText).map {
      case MergeOnRe(q1, k1, q2, k2) if k1.equalsIgnoreCase(k2) =>
        (Set(q1.toLowerCase, q2.toLowerCase), k1)
      case c => throw new IllegalArgumentException(
        s"unsupported MERGE ON conjunct (need t.k = s.k, shared column " +
          s"name per conjunct): $c")
    }
    require(onPairs.nonEmpty && onPairs.map(_._1).distinct.size == 1,
      s"unsupported MERGE ON shape (need t.k = s.k [AND ...]): $onText")
    require(onPairs.head._1 == Set(tAlias.toLowerCase, sA.toLowerCase),
      s"MERGE ON qualifiers ${onPairs.head._1} do not match the " +
        s"statement aliases ($tAlias, $sA)")
    val keyCols = onPairs.map(_._2)
    require(keyCols.map(_.toLowerCase).distinct.size == keyCols.size,
      s"MERGE ON repeats a key column: $onText")
    val positions = topLevelPositions(coreWhen, "when")
    require(positions.nonEmpty &&
      coreWhen.substring(0, positions.head).trim.isEmpty,
      s"malformed MERGE WHEN chain: $coreWhen")
    val parsed = positions.zip(positions.tail :+ coreWhen.length)
      .map { case (a, b) => parseWhenClause(coreWhen.substring(a, b).trim, tAlias) }
    require(parsed.forall(_.isRight),
      "MERGE ... WHEN NOT MATCHED BY SOURCE inside BEGIN...COMMIT is " +
        "not supported (run it as its own atomic statement)")
    val clauses = parsed.collect { case Right(w) => w }
    Manifest.SpanMerge(table, sourceDf, keyCols, tAlias, sA,
      clauses.filter(!_.isInstanceOf[Manifest.MergeInsert]),
      clauses.collect { case i: Manifest.MergeInsert => i })
  }

  private val InsertRe =
    "(?is)^INSERT\\s+INTO\\s+([A-Za-z0-9_.-]+)\\s+((?:SELECT|VALUES|WITH|TABLE)\\b.*)$".r
  private val InsertMultiRe =
    "(?is)^INSERT\\s+(ALL|FIRST)\\s+(.*)$".r
  private val CtasRe =
    "(?is)^CREATE\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+AS\\s+((?:SELECT|VALUES|WITH|TABLE)\\b.*)$".r
  private val CreateOrReplaceRe =
    "(?is)^CREATE\\s+OR\\s+REPLACE\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+AS\\s+((?:SELECT|VALUES|WITH|TABLE)\\b.*)$".r
  private val AddCheckRe =
    ("(?is)^ALTER\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+ADD\\s+CONSTRAINT\\s+" +
      "([A-Za-z0-9._-]+)\\s+CHECK\\s*\\((.*)\\)\\s*$").r
  private val DropCheckRe =
    "(?is)^ALTER\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+DROP\\s+CONSTRAINT\\s+([A-Za-z0-9._-]+)\\s*$".r
  private val MergeOnRe =
    "(?is)^\\s*([A-Za-z0-9_]+)\\.([A-Za-z0-9_]+)\\s*=\\s*([A-Za-z0-9_]+)\\.([A-Za-z0-9_]+)\\s*$".r
  // the full-sync tail: WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN
  // DELETE — split off the ORIGINAL text (the condition keeps its
  // case; string literals survive), head re-checked as the standard
  // two-clause shorthand
  private val MergeSyncTailRe =
    ("(?is)^(.*?)\\s+WHEN\\s+NOT\\s+MATCHED\\s+BY\\s+SOURCE" +
      "(?:\\s+AND\\s+(.+?))?\\s+THEN\\s+DELETE\\s*$").r
  private val CloneRe =
    ("(?is)^CREATE\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+(?:SHALLOW\\s+)?CLONE\\s+" +
      "([A-Za-z0-9_.-]+)(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*$").r
  private val ReplaceWhereRe =
    "(?is)^INSERT\\s+INTO\\s+([A-Za-z0-9_.-]+)\\s+REPLACE\\s+WHERE\\s+(.*)$".r

  /** Index of the ')' matching the '(' at `src(0)` (quote-aware),
    * or -1 if unbalanced. */
  private def matchingParen(src: String): Int = {
    var depth = 0
    var state: Char = 'n'
    var i = 0
    while (i < src.length) {
      val ch = src.charAt(i)
      state match {
        case 'n' => ch match {
          case '\'' => state = 'q'
          case '`' => state = 'b'
          case '"' => state = 'd'
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) return i
          case _ =>
        }
        case 'q' => if (ch == '\'') state = 'n'
        case 'b' => if (ch == '`') state = 'n'
        case 'd' => if (ch == '"') state = 'n'
      }
      i += 1
    }
    -1
  }

  /** Execute a multi-statement SQL script whose DML targets manifest
    * tables in `root` — the arbitrary-SQL surface extended to writes:
    * `DELETE FROM t [WHERE p]` routes to
    * [[Manifest.commitDeleteVectors]] and `UPDATE t SET a = e[, ...]
    * [WHERE p]` to [[Manifest.commitUpdateVectors]] (both
    * merge-on-read, O(matched rows), atomic commits with SQL
    * NULL-predicate semantics); every other statement runs as plain
    * `spark.sql` over whatever views are registered. `MERGE INTO t
    * USING <view | (subquery)> [AS] s ON t.k = s.k WHEN MATCHED THEN
    * UPDATE SET * WHEN NOT MATCHED THEN INSERT *` (the Delta full-row
    * shorthand) routes to [[Manifest.commitMergeUpsert]] — matched
    * keys replace, new keys insert, one atomic commit; appending
    * `WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE` routes to
    * [[Manifest.commitMergeFull]] (the full-sync form — unmatched
    * target rows delete where the condition passes). WHERE/SET
    * expression text goes VERBATIM to Spark's expression parser, and
    * the WHERE/comma/`=`/ON/WHEN splits are quote- and paren-aware,
    * so string literals containing keywords parse correctly;
    * statement shapes beyond these DML forms (conditional WHEN
    * clauses, column-wise MERGE SET lists, subqueries in DML
    * predicates) are rejected loudly rather than mis-parsed.
    *
    * Beyond the DML triad, the statement surface covers the table
    * format's whole verb set:
    *  - data movement: `COPY INTO t FROM '<stage>'` (FILES=/PATTERN=/
    *    FILE_FORMAT= → [[sqlCopyInto]]) and the unload direction
    *    `COPY INTO '<location>' FROM <view|(subquery)>`
    *    ([[sqlCopyUnload]]);
    *  - DDL/lifecycle: `CREATE TABLE AS` (refuses existing),
    *    `CREATE OR REPLACE TABLE AS`,
    *    `CREATE TABLE d [SHALLOW] CLONE s [VERSION AS OF n]`
    *    (zero-copy), `INSERT INTO` (positional,
    *    registered-schema-aware),
    *    `INSERT INTO t REPLACE WHERE <pred> <query>` (selective
    *    overwrite), `ALTER TABLE ADD/DROP CONSTRAINT`,
    *    `ALTER TABLE ADD/DROP/RENAME COLUMN` (metadata DDL — drop
    *    narrows the registration, rename carries the old name as a
    *    read alias), `DROP TABLE`, `UNDROP TABLE` (metadata restore
    *    of the newest pre-drop state), `TRUNCATE TABLE`;
    *  - maintenance: `OPTIMIZE t [MIN n] [TARGET n]`,
    *    `OPTIMIZE t ZORDER BY (a, b) [SPLIT n]`,
    *    `VACUUM RETAIN n VERSIONS [GRACE ms] [DRY RUN]`,
    *    `RESTORE TABLE t TO VERSION AS OF n`;
    *  - catalog reads: `DESCRIBE HISTORY`, `DESCRIBE DETAIL`,
    *    `SHOW TABLES`;
    *  - time travel in plain SELECT text: `FROM t VERSION AS OF n` /
    *    `TIMESTAMP AS OF '<ts>'` ([[rewriteTimeTravel]] — applied to
    *    every fall-through statement, quote-aware,
    *    subquery-transparent).
    *
    * Returns the last statement's DataFrame (maintenance verbs return
    * their reports; DML returns an empty relation). */
  def runDml(spark: SparkSession, root: String, script: String): DataFrame = {
    var last = spark.emptyDataFrame
    val exec: String => Unit = {
      case DeleteRe(table, rest) =>
        Option(rest).map(_.trim).filter(_.nonEmpty) match {
          case None => // unqualified DELETE: all rows
            Manifest.commitDeleteVectors(spark, root, table, lit(true))
          case Some(r) if r.toLowerCase.startsWith("using") =>
            // DELETE FROM t USING s WHERE t.k = s.k [AND conds-on-s]
            runDeleteUsing(spark, root, table, r.substring(5).trim)
          case Some(r) =>
            require(r.toLowerCase.startsWith("where"),
              s"unsupported DELETE clause: $r")
            val w = r.substring(5).trim
            w match {
              case DeleteInSubRe(keyCol, sub) =>
                // WHERE k IN (SELECT ...): the bulk-erasure form (a
                // GDPR request list, a dedup verdict) — the subquery
                // plans like any statement and the delete lands
                // through the SEMI-JOIN DV path, so the key set never
                // visits the driver and its size is unbounded. SQL IN
                // NULL semantics hold on both sides (a NULL key row
                // is kept; NULL subquery values match nothing).
                val keys = spark.sql(sub)
                require(keys.schema.length == 1,
                  s"DELETE ... IN (subquery): subquery must return " +
                    s"exactly one column, got ${keys.schema.length}")
                Manifest.commitDeleteKeys(spark, root, table,
                  keys.toDF(keyCol), keyCol)
              case _ =>
                Manifest.commitDeleteVectors(spark, root, table, expr(w))
            }
        }
        last = spark.emptyDataFrame
      case UpdateRe(table, rest) if {
          val f = topLevelKeyword(rest, "from")
          val w = topLevelKeyword(rest, "where")
          f >= 0 && (w < 0 || f < w)
        } =>
        // UPDATE t SET ... FROM <src> [AS] s WHERE t.k = s.k [AND c]:
        // the join-update — a one-clause MERGE under the hood
        runUpdateFrom(spark, root, table, rest,
          topLevelKeyword(rest, "from"))
        last = spark.emptyDataFrame
      case UpdateRe(table, rest) =>
        val wherePos = topLevelKeyword(rest, "where")
        val (setPart, whereText) =
          if (wherePos < 0) (rest, None)
          else (rest.substring(0, wherePos),
            Some(rest.substring(wherePos + 5).trim))
        val sets = splitTopLevel(setPart, ',').map { a =>
          val eq = a.indexOf('=')
          require(eq > 0 && topLevelMask(a)(eq), s"malformed SET clause: $a")
          a.substring(0, eq).trim -> expr(a.substring(eq + 1))
        }.toMap
        whereText match {
          case Some(DeleteInSubRe(keyCol, sub)) =>
            // WHERE k IN (SELECT ...): the corrections-list form —
            // same semi-join path as the keyed DELETE (q256), key set
            // never visits the driver
            val keys = spark.sql(sub)
            require(keys.schema.length == 1,
              s"UPDATE ... IN (subquery): subquery must return " +
                s"exactly one column, got ${keys.schema.length}")
            Manifest.commitUpdateKeys(spark, root, table,
              keys.toDF(keyCol), keyCol, sets)
          case Some(w) =>
            Manifest.commitUpdateVectors(spark, root, table, expr(w), sets)
          case None =>
            Manifest.commitUpdateVectors(spark, root, table, lit(true), sets)
        }
        last = spark.emptyDataFrame
      case MergeEvolveRe(table, tAlias, rest) =>
        // MERGE WITH SCHEMA EVOLUTION INTO t USING ... (Delta's
        // statement shape): the full-row merge where the source may
        // carry NEW columns — the widened schema registers atomically
        // with the merged data; old files NULL-fill on read
        runMergeText(spark, root, table, tAlias, rest, evolve = true)
        last = spark.emptyDataFrame
      case MergeRe(table, tAlias, rest) =>
        runMergeText(spark, root, table, tAlias, rest, evolve = false)
        last = spark.emptyDataFrame
      case ReplaceWhereRe(table, rest) =>
        // INSERT INTO t REPLACE WHERE <pred> <query>: selective
        // overwrite (Delta's replaceWhere) — atomically DV-delete the
        // matching slice and land the query's rows, ONE commit; every
        // inserted row must satisfy the predicate (validated). The
        // predicate/query split is the first TOP-LEVEL query keyword,
        // so `IN (SELECT ...)` subqueries stay inside the predicate.
        val starts = Seq("select", "values", "with", "table")
          .map(k => topLevelKeyword(rest, k)).filter(_ >= 0)
        require(starts.nonEmpty,
          s"INSERT ... REPLACE WHERE without a query: $rest")
        val cut = starts.min
        require(cut > 0, s"INSERT ... REPLACE WHERE with an empty predicate")
        val predText = rest.substring(0, cut).trim
        // the query aligns with the target schema BY POSITION, as
        // INSERT INTO does (a VALUES row has no column names)
        val rwTarget = Manifest.registeredSchema(spark, root, table)
          .getOrElse(Manifest.readTable(spark, root, table).schema)
        val rwBatch = spark.sql(rest.substring(cut))
        require(rwBatch.schema.length == rwTarget.length,
          s"INSERT ... REPLACE WHERE $table: ${rwBatch.schema.length} " +
            s"columns provided, table has ${rwTarget.length}")
        val rwAligned = rwBatch.toDF(rwTarget.fieldNames.toIndexedSeq: _*)
          .select(rwTarget.fields.toIndexedSeq.map(f =>
            col(f.name).cast(f.dataType)): _*)
        Manifest.commitReplaceWhere(spark, root, table, expr(predText), rwAligned)
        last = spark.emptyDataFrame
      case CloneRe(dst, src, verS) =>
        // CREATE TABLE d [SHALLOW] CLONE s [VERSION AS OF n]: the
        // zero-copy metadata commit — shared files, independent
        // divergence, schema + constraints ride along
        Manifest.commitClone(spark, root, src, dst,
          Option(verS).map(_.toLong).getOrElse(-1L))
        last = spark.emptyDataFrame
      case InsertMultiRe(mode, rest) =>
        // INSERT ALL|FIRST ... INTO ... SELECT: the Snowflake
        // multi-table router — all branches land in ONE claim
        last = runInsertMulti(spark, root, mode, rest)
      case InsertRe(table, query) if Manifest.streamNames(root)
          .exists(n => topLevelPositions(query, n.toLowerCase).nonEmpty) =>
        // INSERT INTO t SELECT ... FROM <stream>: the CONSUMING form —
        // the stream's pending interval plans as the source, and the
        // offset advances ATOMICALLY with the insert's own commit
        // (one claim: rows + cursor), so a re-driven statement sees an
        // empty stream and quiesces instead of double-applying
        val consumed = Manifest.streamNames(root)
          .filter(n => topLevelPositions(query, n.toLowerCase).nonEmpty)
        require(consumed.size == 1,
          s"INSERT consuming multiple streams (${consumed.mkString(", ")}) " +
            "is not supported — one cursor advances per statement")
        last = consumeStreamInsert(spark, root, consumed.head, table, query)
      case InsertRe(table, query) =>
        // INSERT INTO t <query>: the query text (SELECT/VALUES/WITH)
        // plans against whatever views are registered; the result
        // aligns with the TARGET schema BY POSITION (SQL INSERT
        // semantics — a VALUES row has no column names to match by),
        // casts to the target types, and appends through the ordinary
        // atomic commit — CHECK constraints apply like any append
        // an evolved table's REGISTERED schema is the insert target
        // (it is what the SQL read path serves); un-evolved tables
        // keep the inferred file schema
        val reg = Manifest.registeredSchema(spark, root, table)
        val target = reg.getOrElse(Manifest.readTable(spark, root, table).schema)
        val batch = spark.sql(query)
        // a positional INSERT may omit TRAILING columns that carry a
        // registered DEFAULT — the default fills them (the Snowflake/
        // Delta contract); any other arity mismatch refuses
        val nGiven = batch.schema.length
        val omittable = target.fields.drop(nGiven)
        require(nGiven == target.length ||
          (nGiven < target.length &&
            omittable.forall(f => Manifest.defaultOf(f).isDefined)),
          s"INSERT INTO $table: $nGiven columns provided, " +
            s"table has ${target.length}" +
            (if (nGiven < target.length) " and the omitted trailing " +
              "columns carry no DEFAULT" else ""))
        val aligned = batch
          .toDF(target.fieldNames.take(nGiven).toIndexedSeq: _*)
          .select(target.fields.toIndexedSeq.map { f =>
            if (target.fieldNames.indexOf(f.name) < nGiven)
              col(f.name).cast(f.dataType)
            else expr(Manifest.defaultOf(f).get).cast(f.dataType).as(f.name)
          }: _*)
        // through the evolve path when registered: the append is
        // enforced against the registration (and re-pins it)
        if (reg.isDefined)
          Manifest.commitAppendEvolve(spark, root, table, aligned)
        else
          Manifest.commitAppend(spark, root, table, aligned)
        last = spark.emptyDataFrame
      case CreateOrReplaceRe(table, query) =>
        // CREATE OR REPLACE TABLE t AS <query>: atomic replace (the
        // old file set survives for time travel); creates on first use
        Manifest.commitReplace(spark, root, table, spark.sql(query))
        last = spark.emptyDataFrame
      case CtasRe(table, query) =>
        // CREATE TABLE t AS <query>: first commit of a new table in
        // this root; an existing table refuses loudly (no silent
        // replace — that is commitReplace's job)
        val v = Manifest.snapshotVersion(root)
        require(v <= 0 ||
          !Manifest.manifestRows(spark, root, v).exists(_._1 == table),
          s"CREATE TABLE: $table already exists in $root")
        Manifest.commitAppend(spark, root, table, spark.sql(query))
        last = spark.emptyDataFrame
      case AddCheckRe(table, name, pred) =>
        // ALTER TABLE t ADD CONSTRAINT n CHECK (p): registration scans
        // existing data and refuses if it violates (Delta semantics)
        Manifest.addCheckConstraint(spark, root, table, name, pred)
        last = spark.emptyDataFrame
      case DropCheckRe(table, name) =>
        Manifest.dropCheckConstraint(root, table, name)
        last = spark.emptyDataFrame
      case UnloadRe(dest, rest) =>
        last = sqlCopyUnload(spark, dest, rest)
      case CopyTransformRe(table, part) =>
        // COPY INTO t FROM (SELECT $1, ... FROM '<stage>'): Snowflake
        // transform-on-load — reshape/cast during the load
        last = sqlCopyTransform(spark, root, table, part)
      case CopyRe(table, stage, clauses) =>
        last = sqlCopyInto(spark, root, table, stage, clauses)
      case ZorderRe(table, colsS, splitS) =>
        // OPTIMIZE t ZORDER BY (a, b[, c[, d]]) [SPLIT n]: rewrite
        // the current content onto the k-dim Morton curve (EVERY
        // dimension gets pruning power); SPLIT defaults to the
        // current file count
        val zCols = colsS.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val before = Manifest.snapshotVersion(root)
        val nBefore = Manifest.manifestRows(spark, root, before)
          .count(_._1 == table)
        val n = Option(splitS).map(_.toInt).getOrElse(math.max(1, nBefore))
        val v = Manifest.compactZorderCols(spark, root, table, zCols, n)
        val nAfter = Manifest.manifestRows(spark, root, v)
          .count(_._1 == table).toLong
        last = { import spark.implicits._
          Seq((v, nBefore.toLong, nAfter))
            .toDF("version", "n_files_before", "n_files_after") }
      case AddColumnRe(table, colName, typeDdl, defaultSql) =>
        // ALTER TABLE t ADD COLUMN c <type> [DEFAULT <literal>]:
        // metadata DDL — registers the evolved schema atomically.
        // Without DEFAULT, existing files NULL-fill the column on
        // read; with it, pre-evolution rows SERVE the default
        // (per-file footer branching — a stored NULL stays NULL) and
        // positional INSERT fills the missing trailing column
        val dt = org.apache.spark.sql.types.DataType.fromDDL(typeDdl)
        Option(defaultSql) match {
          case Some(d) =>
            Manifest.commitAddColumnDefault(spark, root, table, colName,
              dt, d.trim)
          case None =>
            val cur = Manifest.registeredSchema(spark, root, table)
              .getOrElse(Manifest.readTable(spark, root, table).schema)
            require(!cur.fieldNames.contains(colName),
              s"ALTER TABLE $table: column $colName already exists")
            val empty = spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](),
              StructType(cur.fields :+ StructField(colName, dt, nullable = true)))
            Manifest.commitAppendEvolve(spark, root, table, empty,
              allowEvolution = true)
        }
        last = spark.emptyDataFrame
      case DropColumnRe(table, colName) =>
        // ALTER TABLE t DROP COLUMN c: metadata DDL — registers the
        // narrowed schema; old files keep the bytes invisibly, the
        // name becomes reserved (re-adding would resurrect old values)
        Manifest.commitDropColumn(spark, root, table, colName)
        last = spark.emptyDataFrame
      case AlterColumnTypeRe(table, colName, typeDdl) =>
        // ALTER TABLE t ALTER COLUMN c [SET DATA] TYPE <type>:
        // WIDENING-only metadata DDL — pre-widen files serve through
        // parquet type promotion, narrowing refuses loudly
        Manifest.commitAlterColumnType(spark, root, table, colName,
          org.apache.spark.sql.types.DataType.fromDDL(typeDdl))
        last = spark.emptyDataFrame
      case RenameColumnRe(table, from, to) =>
        // ALTER TABLE t RENAME COLUMN a TO b: metadata DDL — the old
        // name rides as a read alias; no data moves
        Manifest.commitRenameColumn(spark, root, table, from, to)
        last = spark.emptyDataFrame
      case OptimizeWhereRe(table, colName, loS, hiS, targetS) =>
        // OPTIMIZE t WHERE c BETWEEN lo AND hi [TARGET n]: predicate-
        // scoped bin-pack — only stat-overlapping files rewrite, the
        // rest inherit by reference (Delta's selective OPTIMIZE)
        val sch = Manifest.registeredSchema(spark, root, table)
          .getOrElse(Manifest.readTable(spark, root, table).schema)
        val f = sch.fields.find(_.name == colName).getOrElse(
          throw new IllegalArgumentException(
            s"OPTIMIZE WHERE: no column $colName in $table"))
        def unq(v: String) =
          if (v.length >= 2 && v.startsWith("'") && v.endsWith("'"))
            v.substring(1, v.length - 1)
          else v
        val target = Option(targetS).map(_.toLong).getOrElse(128L << 20)
        val (v, nScope, nPacked) = Manifest.compactTableWhere(spark, root,
          table, Seq(Manifest.Pred(colName, unq(loS), unq(hiS),
            f.dataType.sql.toLowerCase(java.util.Locale.ROOT))), target)
        last = { import spark.implicits._
          Seq((v, nScope.toLong, nPacked.toLong))
            .toDF("version", "n_files_in_scope", "n_files_packed") }
      case OptimizeRe(table, minS, targetS) =>
        // OPTIMIZE t [MIN <bytes>] [TARGET <bytes>]: with MIN, the
        // incremental small-file pass (files under MIN bin-pack,
        // right-sized files inherit by reference — the daily
        // maintenance verb); without, the full bin-pack rewrite.
        // Result is the maintenance report a scheduler acts on.
        val target = Option(targetS).map(_.toLong).getOrElse(128L << 20)
        val before = Manifest.snapshotVersion(root)
        val nBefore = Manifest.manifestRows(spark, root, before)
          .count(_._1 == table).toLong
        val v = Option(minS).map(_.toLong) match {
          case Some(min) =>
            Manifest.compactSmallFiles(spark, root, table, min, target)
          case None => Manifest.compactTable(spark, root, table, target)
        }
        val nAfter = Manifest.manifestRows(spark, root, v)
          .count(_._1 == table).toLong
        last = { import spark.implicits._
          Seq((v, nBefore, nAfter))
            .toDF("version", "n_files_before", "n_files_after") }
      case VacuumRe(keepS, graceS, dry) =>
        // VACUUM RETAIN n VERSIONS [GRACE <ms>] [DRY RUN]: root-level
        // retention sweep; GRACE overrides the in-flight-commit
        // window (0 only with no concurrent writers); DRY RUN reports
        // without deleting.
        val isDry = dry != null
        val (removed, live) = Manifest.vacuum(spark, root, keepS.toInt,
          Option(graceS).map(_.toLong)
            .getOrElse(Manifest.defaultVacuumGraceMs),
          dryRun = isDry)
        last = { import spark.implicits._
          Seq((removed.toLong, live.toLong,
            if (isDry) "DRY RUN" else "EXECUTED"))
            .toDF("deleted_files", "live_files", "mode") }
      case RestoreRe(table, toV) =>
        // matched BEFORE the generic statement fallthrough, so the
        // time-travel rewrite never sees RESTORE's own AS OF clause
        Manifest.commitRestore(spark, root, table, toV.toLong)
        last = spark.emptyDataFrame
      case HistoryRe(_) =>
        last = Manifest.tableHistory(spark, root)
      case ShowTablesRe() =>
        last = Manifest.listTables(spark, root)
      case CreateStreamRe(name, table, appendOnly) =>
        // CREATE STREAM s ON TABLE t [APPEND_ONLY = TRUE]: register a
        // named change-feed cursor at the CURRENT version (the stream
        // starts empty — only commits after creation are changes, the
        // Snowflake contract); SELECT ... FROM s serves the feed since
        // the cursor, a consuming INSERT advances it with its own
        // commit; APPEND_ONLY reads filter to appended rows and SKIP
        // rewrite intervals (the ingest-pipeline default mode)
        Manifest.createStream(spark, root, name, table,
          appendOnly = Option(appendOnly)
            .exists(_.equalsIgnoreCase("TRUE")))
        last = spark.emptyDataFrame
      case DropStreamRe(name) =>
        Manifest.dropStream(spark, root, name)
        last = spark.emptyDataFrame
      case CreateTaskRe(name, sched, dep, body) =>
        // CREATE TASK t [SCHEDULE = '<cron>'] [AFTER dep] AS <stmt>:
        // the reference's DAG model as warehouse objects — one
        // registered statement per task, AFTER edges form the graph,
        // SCHEDULE carries the cron text (validated at CREATE; the
        // reference's own DAGs are literally cron-driven), EXECUTE
        // TASK runs a task and its descendants in dependency order
        Manifest.createTask(spark, root, name, Option(dep), body.trim,
          schedule = Option(sched))
        last = spark.emptyDataFrame
      case DropTaskRe(name) =>
        Manifest.dropTask(spark, root, name)
        last = spark.emptyDataFrame
      case ShowTasksRe() =>
        last = { import spark.implicits._
          Manifest.taskDefsFull(root).toSeq.sortBy(_._1)
            .map { case (n, (dep, sched, sql)) =>
              (n, dep.getOrElse(""), sched.getOrElse(""), sql) }
            .toDF("name", "after", "schedule", "definition") }
      case ExecuteTaskRe(name) =>
        last = executeTask(spark, root, name)
      case SwapRe(a, b) =>
        // ALTER TABLE a SWAP WITH b: the blue-green publish verb —
        // one claim re-keys both tables' rows by reference and swaps
        // their whole per-table metadata registry (schema, checks,
        // properties, grants, policies, stats), tombstoning one-sided
        // entries; streams/ANN indexes on either table refuse loudly
        Manifest.commitSwapTables(spark, root, a, b)
        last = spark.emptyDataFrame
      case CreateMviewRe(name, selList, srcTable, groupBy) =>
        // CREATE MATERIALIZED VIEW mv AS SELECT k..., SUM(e) AS a,
        // COUNT(*) AS b FROM t GROUP BY k...: registers the
        // definition; REFRESH maintains the content through row-level
        // IVM (the counting algorithm — O(changed rows + |MV|)
        // through appends, DV deletes, updates, compactions)
        val items = splitTopLevel(selList, ',').map(_.trim)
        require(items.size >= 3,
          "CREATE MATERIALIZED VIEW: select list must be key " +
            s"column(s), SUM(expr) AS alias, COUNT(*) AS alias: $selList")
        val (keys, aggs) = items.splitAt(items.size - 2)
        keys.foreach(k => require(k.matches("[A-Za-z_][A-Za-z0-9_]*"),
          s"CREATE MATERIALIZED VIEW: keys must be plain columns, got $k"))
        val (valExpr, sumAlias) = aggs(0) match {
          case SumAsRe(e, al) => (e.trim, al)
          case o => throw new IllegalArgumentException(
            s"CREATE MATERIALIZED VIEW: expected SUM(expr) AS alias, got $o")
        }
        val cntAlias = aggs(1) match {
          case CountAsRe(al) => al
          case o => throw new IllegalArgumentException(
            s"CREATE MATERIALIZED VIEW: expected COUNT(*) AS alias, got $o")
        }
        val gKeys = splitTopLevel(groupBy, ',').map(_.trim)
        require(gKeys.map(_.toLowerCase) == keys.map(_.toLowerCase),
          s"CREATE MATERIALIZED VIEW: GROUP BY ($gKeys) must list " +
            s"exactly the key columns ($keys)")
        Manifest.createMview(spark, root, name, srcTable, keys,
          valExpr, sumAlias, cntAlias)
        last = spark.emptyDataFrame
      case RefreshMviewRe(name) =>
        last = refreshMview(spark, root, name)
      case DropMviewRe(name) =>
        Manifest.dropMview(spark, root, name)
        last = spark.emptyDataFrame
      case ShowStreamsRe() =>
        last = { import spark.implicits._
          Manifest.streamNames(root)
            .map { n =>
              val (t, off, ao) = Manifest.streamDefFull(root, n).get
              (n, t, off, if (ao) "APPEND_ONLY" else "DEFAULT")
            }.toDF("name", "table_name", "offset", "mode").orderBy("name") }
      case DropTableRe(table) =>
        Manifest.commitDropTable(spark, root, table)
        last = spark.emptyDataFrame
      case UndropTableRe(table) =>
        // UNDROP TABLE t: restore the newest main-visible pre-drop
        // state — metadata only (drop never deleted the files)
        Manifest.commitUndropTable(spark, root, table)
        last = spark.emptyDataFrame
      case DescribeDetailRe(table) =>
        last = Manifest.describeDetail(spark, root, table)
      case ShowConstraintsRe(table) =>
        // SHOW CONSTRAINTS t: the registered CHECK constraints every
        // write path enforces — name + predicate text, pure metadata
        last = { import spark.implicits._
          Manifest.checkConstraints(root, table).toSeq.sorted
            .toDF("name", "expression") }
      case SetPropsRe(table, propsS) =>
        // ALTER TABLE t SET TBLPROPERTIES ('k'='v', ...): one claim-
        // sidecar commit; later SETs of the same key shadow earlier
        val kvs = splitTopLevel(propsS, ',').map(_.trim).map {
          case PropKvRe(k, v) => k -> v
          case other => throw new IllegalArgumentException(
            s"SET TBLPROPERTIES: expected 'key'='value', got: $other")
        }
        require(kvs.map(_._1).distinct.size == kvs.size,
          s"SET TBLPROPERTIES: duplicate key in ($propsS)")
        Manifest.setTableProperties(spark, root, table, kvs.toMap)
        last = spark.emptyDataFrame
      case UnsetPropsRe(table, keysS) =>
        val keys = splitTopLevel(keysS, ',').map(_.trim).map {
          case PropKeyRe(k) => k
          case other => throw new IllegalArgumentException(
            s"UNSET TBLPROPERTIES: expected 'key', got: $other")
        }
        Manifest.unsetTableProperties(spark, root, table, keys)
        last = spark.emptyDataFrame
      case ShowPropsRe(table) =>
        // SHOW TBLPROPERTIES t: the effective registry, pure metadata
        last = { import spark.implicits._
          Manifest.tableProperties(root, table).toSeq.sorted
            .toDF("key", "value") }
      case CommentTableRe(table, text) =>
        // COMMENT ON TABLE t IS '...': the 'comment' property (Spark's
        // catalog convention); '' clears it
        if (text.isEmpty)
          Manifest.unsetTableProperties(spark, root, table, Seq("comment"))
        else
          Manifest.setTableProperties(spark, root, table,
            Map("comment" -> text))
        last = spark.emptyDataFrame
      case CommentColumnRe(table, colName, text) =>
        // COMMENT ON COLUMN t.c IS '...': per-column comments under
        // 'comment.<col>' keys — DESCRIBE TABLE EXTENDED reads them back
        val sch = Manifest.registeredSchema(spark, root, table)
          .getOrElse(Manifest.readTable(spark, root, table).schema)
        require(sch.fieldNames.contains(colName),
          s"COMMENT ON COLUMN: no column $colName in $table")
        if (text.isEmpty)
          Manifest.unsetTableProperties(spark, root, table,
            Seq(s"comment.$colName"))
        else
          Manifest.setTableProperties(spark, root, table,
            Map(s"comment.$colName" -> text))
        last = spark.emptyDataFrame
      case DescribeExtRe(table) =>
        // DESCRIBE TABLE EXTENDED t: q278's column listing + comments
        val sch = Manifest.registeredSchema(spark, root, table)
          .getOrElse(Manifest.readTable(spark, root, table).schema)
        val props = Manifest.tableProperties(root, table)
        last = { import spark.implicits._
          sch.fields.toSeq.map(f =>
            (f.name, f.dataType.sql.toLowerCase, f.nullable,
              props.getOrElse(s"comment.${f.name}", "")))
            .toDF("col_name", "data_type", "nullable", "comment") }
      case DescribeTableRe(table) =>
        // DESCRIBE TABLE t: the column listing every catalog serves —
        // the REGISTERED schema when one governs reads (evolved /
        // renamed / narrowed tables), the inferred file schema
        // otherwise; pure metadata either way
        val sch = Manifest.registeredSchema(spark, root, table)
          .getOrElse(Manifest.readTable(spark, root, table).schema)
        last = { import spark.implicits._
          sch.fields.toSeq
            .map(f => (f.name, f.dataType.sql.toLowerCase, f.nullable))
            .toDF("col_name", "data_type", "nullable") }
      case ReorgRe(table) =>
        // REORG TABLE t APPLY (PURGE): rewrite ONLY the DV-carrying
        // files (physicalize soft deletes); clean files inherit by
        // reference — O(DV'd files), never the table
        val (v, n) = Manifest.compactPurgeDv(spark, root, table)
        last = { import spark.implicits._
          Seq((v, n.toLong)).toDF("version", "n_purged_files") }
      case ConvertRe(table, dir, statsOpt) =>
        // CONVERT TO t FROM '<dir>' [STATS (a, b)]: zero-copy import
        // of an existing parquet directory — hardlinks + footer
        // stats, one atomic commit; not a byte of data moves
        val cols = Option(statsOpt).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val v = Manifest.commitImportDir(spark, root, table, dir, cols)
        val n = Manifest.manifestRows(spark, root, v)
          .count(_._1 == table).toLong
        last = { import spark.implicits._
          Seq((table, v, n, Manifest.countRows(spark, root, table, v)))
            .toDF("table_name", "version", "n_files", "n_rows") }
      case TruncateRe(table) =>
        Manifest.commitTruncate(spark, root, table)
        last = spark.emptyDataFrame
      case CreatePolicyRe(kindS, name, argName, body) =>
        // CREATE MASKING/ROW ACCESS POLICY: the definition registers
        // as claim-sidecar metadata (survives vacuum, rides
        // replication); the body is a plain expression over the arg,
        // with current_role() substituted at read time
        val kind =
          if (kindS.equalsIgnoreCase("masking")) "mask" else "row"
        Manifest.createPolicy(spark, root, name, kind, argName, body.trim)
        last = spark.emptyDataFrame
      case SetMaskPolicyRe(table, colName, policy) =>
        Manifest.attachMaskingPolicy(spark, root, table, colName, policy)
        last = spark.emptyDataFrame
      case UnsetMaskPolicyRe(table, colName) =>
        Manifest.detachMaskingPolicy(spark, root, table, colName)
        last = spark.emptyDataFrame
      case AddRowPolicyRe(table, policy, colName) =>
        Manifest.attachRowPolicy(spark, root, table, policy, colName)
        last = spark.emptyDataFrame
      case DropRowPolicyRe(table, policy) =>
        Manifest.detachRowPolicy(spark, root, table, policy)
        last = spark.emptyDataFrame
      case SetRoleRe(role) =>
        // session role, read by policy application at REGISTRATION
        // time (re-register views after switching, like any catalog)
        require(role.matches("[A-Za-z0-9_]+"), s"unsafe role name: $role")
        spark.conf.set("graft.sql.role", role)
        last = spark.emptyDataFrame
      case GrantSchemaRe(schema, role) =>
        // GRANT SELECT ON SCHEMA s TO r: one grant covers every table
        // under the s. prefix; a table's own grant history overrides
        Manifest.grantSelectSchema(spark, root, schema, role)
        last = spark.emptyDataFrame
      case RevokeSchemaRe(schema, role) =>
        Manifest.revokeSelectSchema(spark, root, schema, role)
        last = spark.emptyDataFrame
      case ShowGrantsSchemaRe(schema) =>
        // SHOW GRANTS ON SCHEMA s: the live schema ACL, pure metadata
        last = { import spark.implicits._
          Manifest.schemaGrants(root, schema).toSeq.sorted
            .map(r => (r, "SELECT")).toDF("role", "privilege") }
      case GrantRe(table, role) =>
        // GRANT SELECT ON t TO r: the first grant closes the table
        // (only admin + granted roles read from then on)
        Manifest.grantSelect(spark, root, table, role)
        last = spark.emptyDataFrame
      case RevokeRe(table, role) =>
        Manifest.revokeSelect(spark, root, table, role)
        last = spark.emptyDataFrame
      case ShowGrantsRe(table) =>
        // SHOW GRANTS ON t: the live ACL, pure metadata
        last = { import spark.implicits._
          Manifest.tableGrants(root, table).toSeq.sorted
            .map(r => (r, "SELECT")).toDF("role", "privilege") }
      case FsckRe(table, dry) =>
        // FSCK REPAIR TABLE t [DRY RUN]: drop entries whose data files
        // vanished out-of-band; the maintenance report a scheduler acts on
        val isDry = dry != null
        val (missing, live) =
          Manifest.commitFsckRepair(spark, root, table, isDry)
        val mode =
          if (isDry) "DRY RUN"
          else if (missing == 0L) "CLEAN" // nothing committed
          else "REPAIRED"
        last = { import spark.implicits._
          Seq((missing, live, mode))
            .toDF("missing_files", "live_files", "mode") }
      case GenerateRe(table) =>
        // GENERATE symlink_format_manifest FOR TABLE t: export the
        // live file list for external parquet readers (refuses on DVs)
        val n = Manifest.generateSymlinkManifest(spark, root, table)
        last = { import spark.implicits._
          Seq(Tuple1(n)).toDF("n_files") }
      case ListStageRe(stage, pattern) =>
        // LIST '<stage>' [PATTERN = '...']: Snowflake's stage listing —
        // the introspection half of COPY/REMOVE, driver-side metadata
        // (one name + size per staged file, never a byte of content)
        val staged = graft.ops.Ingest.stageFiles(spark, stage)
        val names = Option(pattern).fold(staged)(p => staged.filter(_.matches(p)))
        last = { import spark.implicits._
          names.sorted.map(f =>
            (f, Files.size(Paths.get(stage, f))))
            .toDF("name", "size_bytes") }
      case CreateLikeRe(dst, src) =>
        // CREATE TABLE dst LIKE src: schema-only creation (Snowflake/
        // Spark's LIKE) — the new table starts EMPTY with src's
        // registered schema; properties/comments/grants/constraints
        // are NOT copied (they describe src's data and governance, not
        // dst's). One empty registering commit.
        val v = Manifest.snapshotVersion(root)
        require(v > 0 &&
          Manifest.manifestRows(spark, root, v).exists(_._1 == src),
          s"CREATE TABLE LIKE: no table $src in $root")
        require(!Manifest.manifestRows(spark, root, v).exists(_._1 == dst),
          s"CREATE TABLE: $dst already exists in $root")
        val sch = Manifest.registeredSchema(spark, root, src)
          .getOrElse(Manifest.readTable(spark, root, src).schema)
        val empty = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), sch)
        Manifest.commitAppendEvolve(spark, root, dst, empty,
          allowEvolution = true)
        last = spark.emptyDataFrame
      case ShowCreateRe(table) =>
        // SHOW CREATE TABLE t: one canonical single-line DDL statement
        // reassembled from registered metadata — schema (registered or
        // inferred), per-column comments, CHECK constraints (as
        // 'constraint.<name>' properties, the Delta convention), and
        // TBLPROPERTIES — all deterministically ordered. Pure metadata.
        val sch = Manifest.registeredSchema(spark, root, table)
          .getOrElse(Manifest.readTable(spark, root, table).schema)
        val props = Manifest.tableProperties(root, table)
        val cols = sch.fields.map { f =>
          val t = f.dataType.sql.toUpperCase(java.util.Locale.ROOT)
          val nn = if (f.nullable) "" else " NOT NULL"
          val cm = props.get(s"comment.${f.name}")
            .map(c => s" COMMENT '$c'").getOrElse("")
          s"${f.name} $t$nn$cm"
        }.mkString(", ")
        val allProps =
          Manifest.checkConstraints(root, table).map { case (n, e) =>
            s"constraint.$n" -> e
          } ++ props.view.filterKeys(!_.startsWith("comment."))
        val tail =
          if (allProps.isEmpty) ""
          else allProps.toSeq.sorted
            .map { case (k, v2) => s"'$k' = '$v2'" }
            .mkString(" TBLPROPERTIES (", ", ", ")")
        last = { import spark.implicits._
          Seq(s"CREATE TABLE $table ($cols) USING parquet$tail")
            .toDF("create_stmt") }
      case ShowPoliciesRe(table) =>
        val (masks, rowPols) = Manifest.tablePolicies(root, table)
        last = { import spark.implicits._
          (masks.toSeq.sorted.map { case (c, p) => ("MASKING", c, p) } ++
            rowPols.map { case (p, c) => ("ROW ACCESS", c, p) })
            .toDF("kind", "column_name", "policy") }
      case AnalyzeRe(table, colsS) =>
        // ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS a, b]:
        // exact stats, persisted as a claim marker (the registry SHOW
        // STATS and the count(DISTINCT) metadata path read back).
        // ACL-gated: per-column min/max/NDV IS data (the same contract
        // as the metadata-aggregate path)
        Manifest.requireSelect(root, table,
          spark.conf.get("graft.sql.role", "admin"))
        val cols = Option(colsS).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        last = Manifest.analyzeTable(spark, root, table, cols)
      case AnalyzeUpdateRe(table) =>
        // ANALYZE TABLE t UPDATE STATISTICS: incremental maintenance —
        // pure-append intervals merge O(delta) (HLL-union NDV, folded
        // min/max, added counts) and keep the metadata fast path
        // serving; rewrite intervals refuse (run the full ANALYZE)
        Manifest.requireSelect(root, table,
          spark.conf.get("graft.sql.role", "admin"))
        last = Manifest.analyzeIncremental(spark, root, table)
      case ShowStatsRe(table) =>
        // ACL-gated like ANALYZE: the registry holds column bounds/NDV
        Manifest.requireSelect(root, table,
          spark.conf.get("graft.sql.role", "admin"))
        last = Manifest.showStats(spark, root, table)
      case ApplyChangesRe(dst, src, keyColsS, scdType) =>
        // APPLY CHANGES INTO: the CDC-mirror verb family as statement
        // text — TYPE 1 (default) keeps dst the key-wise mirror of
        // src's change feed; TYPE 2 keeps the full validity-interval
        // history. Both are incremental and exactly-once through the
        // destination txn ledger, so re-driving the SAME statement is
        // a NOOP report, never a double-apply. The result is the sync
        // report a scheduler acts on.
        val (dstRoot, dstTable) = resolveQualified(root, dst)
        val (srcRoot, srcTable) = resolveQualified(root, src)
        val keyCols = keyColsS.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(keyCols.map(_.toLowerCase).distinct.size == keyCols.size,
          s"APPLY CHANGES: KEYS repeats a column (${keyCols.mkString(", ")})")
        val srcV = Manifest.snapshotVersion(srcRoot)
        require(srcV > 0,
          s"APPLY CHANGES: no committed snapshot at source '$src'")
        require(Manifest.manifestRows(spark, srcRoot, srcV)
          .exists(_._1 == srcTable),
          s"APPLY CHANGES: unknown source table '$src' (snapshot v$srcV)")
        import spark.implicits._
        last = Option(scdType).map(_.toInt).getOrElse(1) match {
          case 1 =>
            Manifest.applyChangesInto(spark, srcRoot, srcTable,
              dstRoot, dstTable, keyCols)
              .map { case (u, d) =>
                Seq((u, d, if (u == 0L && d == 0L) "NOOP" else "APPLIED")) }
              .getOrElse(Seq((0L, 0L, "NOOP")))
              .toDF("rows_upserted", "rows_deleted", "status")
          case 2 =>
            Manifest.applyChangesScd2(spark, srcRoot, srcTable,
              dstRoot, dstTable, keyCols)
              .map { case (o, c) =>
                Seq((o, c, if (o == 0L && c == 0L) "NOOP" else "APPLIED")) }
              .getOrElse(Seq((0L, 0L, "NOOP")))
              .toDF("intervals_opened", "rows_closed", "status")
          case n => throw new IllegalArgumentException(
            s"APPLY CHANGES: unsupported SCD TYPE $n (1 and 2 are supported)")
        }
      case st if st.trim.toUpperCase(java.util.Locale.ROOT)
          .startsWith("APPLY CHANGES") =>
        // refuse loudly instead of falling through to the SQL parser:
        // a malformed KEYS clause or missing INTO must never plan as a
        // (nonsensical) SELECT
        throw new IllegalArgumentException(
          "malformed APPLY CHANGES statement (expected: APPLY CHANGES " +
            "INTO <dst> FROM <src> KEYS (<key>) [STORED AS SCD TYPE 1|2]): " + st)
      case other =>
        // plain SQL text — after resolving any `table_changes(...)`
        // TVF calls (Delta's CDF SQL surface, feed registered as a
        // view) and `t VERSION AS OF n` / `t TIMESTAMP AS OF '...'`
        // time-travel clauses against the manifest root (Delta's SQL
        // travel syntax, register-time version pinning under the
        // hood). Whole-table COUNT/MIN/MAX statements over a manifest
        // table answer from metadata first (the Snowflake/Delta
        // aggregate pushdown — zero data I/O).
        last = metaAggAnswer(spark, root, other).getOrElse {
          val (rewritten0, streamViews) = rewriteStreamReads(spark, root, other)
          val (rewritten, feedViews) =
            rewriteTableChanges(spark, root, rewritten0)
          // analysis resolves the feed views INTO the plan, so they
          // drop as soon as spark.sql returns — no accumulation, no
          // cross-root collision window beyond this statement
          try spark.sql(rewriteTimeTravel(spark, root, rewritten))
          finally (feedViews ++ streamViews)
            .foreach(spark.catalog.dropTempView(_))
        }
    }
    // BEGIN [TRANSACTION] ... COMMIT spans fold into ONE atomic
    // multi-table commit; ROLLBACK discards the span (every effect is
    // deferred to COMMIT, so rollback has nothing to undo). Every
    // statement outside a span commits atomically on its own, as
    // before.
    //
    // SESSION VARIABLES (`SET v = <literal>` ... `$v` ...): the
    // engine analogue of the reference's Jinja parameterization —
    // scoped to THIS runScript invocation (the map below dies with
    // the call; a task body re-entering runDml gets a fresh empty
    // scope), substituted quote-aware into every subsequent statement
    // (a `$v` inside a string literal is DATA, never a reference —
    // the q243 masking discipline), values restricted to literals
    // (string/number/boolean — an expression would re-evaluate
    // per mention and drift). `$1`-style positional refs (COPY
    // transforms) never collide: variable names start with a letter.
    val sessionVars = scala.collection.mutable.LinkedHashMap[String, String]()
    val stmts = graft.ops.Sql.splitStatements(script).toIndexedSeq
    var i = 0
    while (i < stmts.length) {
      stmts(i) match {
        case SetVarRe(name, value) =>
          val v = value.trim
          require(v.matches("'([^']|'')*'") ||
            v.matches("-?[0-9]+(\\.[0-9]+)?") || v.matches("(?i)TRUE|FALSE"),
            s"SET $name: value must be a literal (string, number, " +
              s"boolean), got $v")
          sessionVars(name) = v
          last = spark.emptyDataFrame
          i += 1
        case UnsetVarRe(name) =>
          require(sessionVars.remove(name).isDefined,
            s"UNSET $name: undefined session variable")
          last = spark.emptyDataFrame
          i += 1
        case raw =>
          val st = substVars(raw, sessionVars)
          if (BeginRe.matches(st)) {
            val end = stmts.indexWhere(t =>
              CommitTxnRe.matches(t) || RollbackRe.matches(t), i + 1)
            require(end > 0,
              s"BEGIN without a matching COMMIT/ROLLBACK in the script")
            val body = stmts.slice(i + 1, end).map(substVars(_, sessionVars))
            require(!body.exists(BeginRe.matches),
              "nested BEGIN: transactions do not nest")
            if (CommitTxnRe.matches(stmts(end)))
              last = commitTxn(spark, root, body)
            i = end + 1
          } else if (CommitTxnRe.matches(st) || RollbackRe.matches(st)) {
            throw new IllegalArgumentException(s"$st without BEGIN")
          } else {
            exec(st)
            i += 1
          }
      }
    }
    last
  }

  private val SetVarRe =
    "(?is)^SET\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*=\\s*(.+)$".r
  private val UnsetVarRe =
    "(?is)^UNSET\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
  private val VarRefRe = "\\$([A-Za-z_][A-Za-z0-9_]*)".r

  /** Substitute `$name` session-variable references at UNQUOTED
    * positions with their registered literal text; an unregistered
    * reference refuses loudly (a silently-unsubstituted `$v` would
    * reach the SQL parser as garbage — or worse, parse). */
  private def substVars(sql: String,
                        vars: collection.Map[String, String]): String = {
    if (!sql.contains("$")) return sql
    val mask = quoteMask(sql)
    VarRefRe.findAllMatchIn(sql).filter(m => mask(m.start)).toList.reverse
      .foldLeft(sql) { (acc, m) =>
        val name = m.group(1)
        val v = vars.getOrElse(name,
          throw new IllegalArgumentException(
            s"undefined session variable $$$name " +
              s"(SET $name = <literal> first; scope is one script)"))
        acc.substring(0, m.start) + v + acc.substring(m.end)
      }
  }

  /** `BEGIN; DELETE FROM t ...; INSERT INTO t ...; COMMIT` — the span
    * lands as ONE claim ([[Manifest.commitSpan]]): a restate-a-day
    * (DELETE + re-INSERT), a fact batch and its audit rows, or any
    * mix of `INSERT INTO` / `DELETE FROM ... [WHERE ...]` /
    * `UPDATE ... SET ... [WHERE ...]` / clause-form `MERGE INTO`
    * across tables can never be observed apart, at any version, under
    * any crash — and a failure ANYWHERE in the span (analysis error,
    * CHECK violation on the last batch) leaves NOTHING visible;
    * already-published files and DV sidecars stay unclaimed and
    * vacuum collects them. Statements inside the span read the
    * PRE-transaction snapshot (effects defer to COMMIT); `commitSpan`
    * refuses the orderings that would contradict that, and MERGE
    * counts as the table's one DV verb. The `IN (subquery)`
    * DELETE/UPDATE forms, join-UPDATE, MERGE WITH SCHEMA EVOLUTION,
    * and MERGE ... BY SOURCE refuse loudly inside a span (each is its
    * own atomic commit); maintenance/DDL verbs likewise. Returns the
    * commit report. */
  private def commitTxn(spark: SparkSession, root: String,
                        body: Seq[String]): DataFrame = {
    require(body.nonEmpty, "empty transaction: nothing to commit")
    def noSubquery(w: String, verb: String): Unit =
      require(!DeleteInSubRe.matches(w),
        s"$verb ... IN (subquery) inside BEGIN...COMMIT is not " +
          "supported (run it as its own atomic statement)")
    val actions: Seq[Manifest.SpanAction] = body.map {
      case InsertRe(table, query) =>
        val target = Manifest.registeredSchema(spark, root, table)
          .getOrElse(Manifest.readTable(spark, root, table).schema)
        val batch = spark.sql(query)
        require(batch.schema.length == target.length,
          s"INSERT INTO $table: ${batch.schema.length} columns provided, " +
            s"table has ${target.length}")
        Manifest.SpanInsert(table,
          batch.toDF(target.fieldNames.toIndexedSeq: _*)
            .select(target.fields.toIndexedSeq.map(f =>
              col(f.name).cast(f.dataType)): _*))
      case DeleteRe(table, rest) =>
        Option(rest).map(_.trim).filter(_.nonEmpty) match {
          case None => Manifest.SpanDelete(table, lit(true))
          case Some(r) =>
            require(r.toLowerCase.startsWith("where"),
              s"unsupported DELETE clause: $r")
            val w = r.substring(5).trim
            noSubquery(w, "DELETE")
            Manifest.SpanDelete(table, expr(w))
        }
      case UpdateRe(table, rest) =>
        // mirror runDml's top-level FROM detection: a join-UPDATE
        // (`UPDATE t SET ... FROM s WHERE ...`) must refuse with the
        // span's clear unsupported-verb message, never mis-parse the
        // FROM clause into a SET expression and die in Spark's parser
        locally {
          val f = topLevelKeyword(rest, "from")
          val w = topLevelKeyword(rest, "where")
          require(f < 0 || (w >= 0 && w < f),
            "UPDATE ... FROM (join-update) inside BEGIN...COMMIT is " +
              "not supported (run it as its own atomic statement, or " +
              "use MERGE)")
        }
        val wherePos = topLevelKeyword(rest, "where")
        val (setPart, whereText) =
          if (wherePos < 0) (rest, None)
          else (rest.substring(0, wherePos),
            Some(rest.substring(wherePos + 5).trim))
        val sets = splitTopLevel(setPart, ',').map { a =>
          val eq = a.indexOf('=')
          require(eq > 0 && topLevelMask(a)(eq), s"malformed SET clause: $a")
          a.substring(0, eq).trim -> expr(a.substring(eq + 1))
        }.toMap
        whereText.foreach(noSubquery(_, "UPDATE"))
        Manifest.SpanUpdate(table,
          whereText.map(expr).getOrElse(lit(true)), sets)
      case MergeEvolveRe(_, _, _) =>
        throw new IllegalArgumentException(
          "MERGE WITH SCHEMA EVOLUTION inside BEGIN...COMMIT is not " +
            "supported (schema registration is its own atomic statement)")
      case MergeRe(table, tAlias, rest) =>
        // clause-form MERGE folds into the span as a DV verb: matched
        // UPDATE/DELETE hits land old positions in the table's DV
        // sidecars, new images and inserts stage as unpublished files,
        // all under the ONE claim (the restate-plus-reconcile
        // transaction: BEGIN; DELETE day; MERGE corrections; COMMIT)
        parseSpanMerge(spark, table, tAlias, rest)
      case other => throw new IllegalArgumentException(
        "only INSERT INTO / DELETE FROM / UPDATE / MERGE INTO are " +
          "supported inside BEGIN...COMMIT (every other verb is its " +
          s"own atomic commit): $other")
    }
    val v = Manifest.commitSpan(spark, root, actions)
    import spark.implicits._
    Seq((v, body.size.toLong, actions.map(_.table).distinct.size.toLong))
      .toDF("version", "n_statements", "n_tables")
  }

  // ------------------------------------------------------ COPY INTO (SQL)

  private val CopyRe =
    "(?is)^COPY\\s+INTO\\s+([A-Za-z0-9_.-]+)\\s+FROM\\s+'([^']+)'\\s*(.*)$".r
  // transform-on-load: the source is a parenthesized SELECT over a stage
  private val CopyTransformRe =
    "(?is)^COPY\\s+INTO\\s+([A-Za-z0-9_.-]+)\\s+FROM\\s*(\\(.*)$".r
  // unload direction: the TARGET is the quoted location
  private val UnloadRe =
    "(?is)^COPY\\s+INTO\\s+'([^']+)'\\s+FROM\\s+(.*)$".r

  // -------------------------------------------- maintenance verbs (SQL)

  private val OptimizeRe =
    "(?is)^OPTIMIZE\\s+([A-Za-z0-9_.-]+)(?:\\s+MIN\\s+(\\d+))?(?:\\s+TARGET\\s+(\\d+))?\\s*$".r
  private val OptimizeWhereRe =
    ("(?is)^OPTIMIZE\\s+([A-Za-z0-9_.-]+)\\s+WHERE\\s+" +
      "([A-Za-z_][A-Za-z0-9_]*)\\s+BETWEEN\\s+('[^']*'|[^\\s']+)\\s+AND\\s+" +
      "('[^']*'|[^\\s']+)(?:\\s+TARGET\\s+(\\d+))?\\s*$").r
  private val ZorderRe =
    ("(?is)^OPTIMIZE\\s+([A-Za-z0-9_.-]+)\\s+ZORDER\\s+BY\\s*\\(\\s*" +
      "([A-Za-z_][A-Za-z0-9_]*(?:\\s*,\\s*[A-Za-z_][A-Za-z0-9_]*)+)\\s*\\)" +
      "(?:\\s+SPLIT\\s+(\\d+))?\\s*$").r
  private val AddColumnRe =
    ("(?is)^ALTER\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+ADD\\s+COLUMN\\s+" +
      "([A-Za-z_][A-Za-z0-9_]*)\\s+([A-Za-z0-9_(),\\s]+?)" +
      "(?:\\s+DEFAULT\\s+(.+?))?\\s*$").r
  private val DropColumnRe =
    ("(?is)^ALTER\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+DROP\\s+COLUMN\\s+" +
      "([A-Za-z_][A-Za-z0-9_]*)\\s*$").r
  private val AlterColumnTypeRe =
    ("(?is)^ALTER\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+ALTER\\s+COLUMN\\s+" +
      "([A-Za-z_][A-Za-z0-9_]*)\\s+(?:SET\\s+DATA\\s+)?TYPE\\s+" +
      "([A-Za-z0-9_(),\\s]+?)\\s*$").r
  private val RenameColumnRe =
    ("(?is)^ALTER\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+RENAME\\s+COLUMN\\s+" +
      "([A-Za-z_][A-Za-z0-9_]*)\\s+TO\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$").r
  private val VacuumRe =
    "(?is)^VACUUM\\s+RETAIN\\s+(\\d+)\\s+VERSIONS(?:\\s+GRACE\\s+(\\d+))?(\\s+DRY\\s+RUN)?\\s*$".r
  private val RestoreRe =
    "(?is)^RESTORE\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*$".r
  private val HistoryRe =
    "(?is)^DESCRIBE\\s+HISTORY(?:\\s+([A-Za-z0-9_.-]+))?\\s*$".r
  private val ShowTablesRe = "(?is)^SHOW\\s+TABLES\\s*$".r
  private val CreateStreamRe =
    ("(?is)^CREATE\\s+STREAM\\s+([A-Za-z0-9_]+)\\s+ON\\s+TABLE\\s+" +
      "([A-Za-z0-9_.-]+)(?:\\s+APPEND_ONLY\\s*=\\s*(TRUE|FALSE))?\\s*$").r
  private val DropStreamRe =
    "(?is)^DROP\\s+STREAM\\s+([A-Za-z0-9_]+)\\s*$".r
  private val ShowStreamsRe = "(?is)^SHOW\\s+STREAMS\\s*$".r
  private val CreateTaskRe =
    ("(?is)^CREATE\\s+TASK\\s+([A-Za-z0-9_]+)" +
      "(?:\\s+SCHEDULE\\s*=\\s*'([^']+)')?" +
      "(?:\\s+AFTER\\s+([A-Za-z0-9_]+))?\\s+AS\\s+(.+)$").r
  private val ExecuteTaskRe =
    "(?is)^EXECUTE\\s+TASK\\s+([A-Za-z0-9_]+)\\s*$".r
  private val DropTaskRe =
    "(?is)^DROP\\s+TASK\\s+([A-Za-z0-9_]+)\\s*$".r
  private val ShowTasksRe = "(?is)^SHOW\\s+TASKS\\s*$".r
  private val SwapRe =
    ("(?is)^ALTER\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+SWAP\\s+WITH\\s+" +
      "([A-Za-z0-9_.-]+)\\s*$").r
  private val CreateMviewRe =
    ("(?is)^CREATE\\s+MATERIALIZED\\s+VIEW\\s+([A-Za-z0-9_]+)\\s+AS\\s+" +
      "SELECT\\s+(.+?)\\s+FROM\\s+([A-Za-z0-9_.-]+)\\s+GROUP\\s+BY\\s+(.+)$").r
  private val RefreshMviewRe =
    "(?is)^REFRESH\\s+MATERIALIZED\\s+VIEW\\s+([A-Za-z0-9_]+)\\s*$".r
  private val DropMviewRe =
    "(?is)^DROP\\s+MATERIALIZED\\s+VIEW\\s+([A-Za-z0-9_]+)\\s*$".r
  private val SumAsRe = "(?is)^SUM\\s*\\((.+)\\)\\s+AS\\s+([A-Za-z0-9_]+)$".r
  private val CountAsRe =
    "(?is)^COUNT\\s*\\(\\s*\\*\\s*\\)\\s+AS\\s+([A-Za-z0-9_]+)$".r
  private val DropTableRe =
    "(?is)^DROP\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s*$".r
  private val UndropTableRe =
    "(?is)^UNDROP\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s*$".r
  private val DescribeDetailRe =
    "(?is)^DESCRIBE\\s+DETAIL\\s+([A-Za-z0-9_.-]+)\\s*$".r
  // ------------------------- metadata-only aggregate statements ----

  private val MetaAggRe =
    ("(?is)^SELECT\\s+(.+?)\\s+FROM\\s+([A-Za-z0-9_.-]+)" +
      "(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*$").r
  private val MetaAggItemRe =
    ("(?is)^(count|min|max)\\s*\\(\\s*(\\*|(?:DISTINCT\\s+)?" +
      "[A-Za-z_][A-Za-z0-9_]*)\\s*\\)" +
      "(?:\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*))?$").r

  /** Whole-table `SELECT count(*) | count(c) | min(c) | max(c) [AS a],
    * ... FROM <manifest table> [VERSION AS OF n]` answers from the
    * per-file metadata ([[Manifest.countRows]],
    * [[Manifest.columnNonNullCount]], [[Manifest.columnBounds]]) —
    * the aggregate pushdown every warehouse serves: at 100 TB these
    * are driver-side arithmetic over the manifest row list, zero data
    * I/O for stat-covered DV-free files (the hybrid scans exactly the
    * files metadata can't answer — slower, never wrong). Returns None
    * — fall through to the ordinary plan — for any other statement
    * shape, a non-manifest name, a same-named temp view (view
    * semantics win), or a column type the typed stat compare doesn't
    * order. */
  private def metaAggAnswer(spark: SparkSession, root: String,
                            sql: String): Option[DataFrame] = sql match {
    case MetaAggRe(items, table, verS) =>
      val sv = Manifest.snapshotVersion(root)
      if (sv <= 0 || spark.catalog.tableExists(table)) return None
      val v = Option(verS).map(_.toLong).getOrElse(sv)
      val present =
        try Manifest.manifestRows(spark, root, v).exists(_._1 == table)
        catch { case _: Exception => false }
      if (!present) return None
      // a governed table never answers from metadata: row/mask
      // policies must see every read, and file stats know no roles
      if (Manifest.tableHasPolicies(root, table)) return None
      // the ACL gate applies to metadata answers too — min/max of a
      // column IS data (fail loudly, same contract as the scan path)
      Manifest.requireSelect(root, table,
        spark.conf.get("graft.sql.role", "admin"))
      val parsedOpt = splitTopLevel(items, ',').map(_.trim).map {
        case MetaAggItemRe(fn, arg, alias) =>
          Some((fn.toLowerCase, arg, Option(alias)))
        case _ => None
      }
      if (parsedOpt.exists(_.isEmpty) || parsedOpt.isEmpty) return None
      val parsed = parsedOpt.flatten
      lazy val schema = Manifest.registeredSchema(spark, root, table, v)
        .getOrElse(Manifest.readTable(spark, root, table, v).schema)
      def fieldOf(c: String) = schema.fields.find(_.name == c)
      def statType(dt: org.apache.spark.sql.types.DataType): Option[String] = {
        import org.apache.spark.sql.types._
        dt match {
          case LongType => Some("bigint")
          case IntegerType => Some("int")
          case ShortType => Some("smallint")
          case ByteType => Some("tinyint")
          case DoubleType => Some("double")
          case FloatType => Some("float")
          case d: DecimalType => Some(d.sql.toLowerCase)
          case TimestampType => Some("timestamp")
          case TimestampNTZType => Some("timestamp_ntz")
          case DateType => Some("date")
          case _ => None
        }
      }
      val cols = parsed.map { case (fn, arg, alias) =>
        // default names mirror spark.sql's, so swapping the answer
        // path never changes the result schema
        val name = alias.getOrElse(
          if (arg == "*") s"$fn(1)" else s"$fn($arg)")
        (fn, arg) match {
          case ("count", "*") =>
            Some(lit(Manifest.countRows(spark, root, table, v)).as(name))
          // the DISTINCT keyword needs trailing whitespace: a COLUMN
          // literally named distinct_ids is a plain count, and the
          // bare-prefix test used to crash the split below on it
          case ("count", d) if d.matches("(?is)^distinct\\s+.*") =>
            // exact NDV from the PERSISTED ANALYZE registry — only
            // while the stats still describe the current content
            // (freshStats compares the resolved file set), and only
            // for the live snapshot (a travel clause falls through to
            // the scan path, which is correct at any version)
            val c = d.split("\\s+", 2)(1)
            if (fieldOf(c).isEmpty || v != sv) None
            else Manifest.freshStats(spark, root, table)
              .flatMap(_.cols.get(c))
              .map(st => lit(st.ndv).as(name))
          case ("count", c) if fieldOf(c).isDefined =>
            Some(lit(Manifest.columnNonNullCount(spark, root, table, c, v))
              .as(name))
          case (mm, c) if (mm == "min" || mm == "max") && fieldOf(c).isDefined =>
            val dt = fieldOf(c).get.dataType
            statType(dt).map { t =>
              val b = Manifest.columnBounds(spark, root, table, c, t, v)
              val raw = b.map(p => if (mm == "min") p._1 else p._2).orNull
              lit(raw).cast(dt).as(name)
            }
          case _ => None
        }
      }
      if (cols.exists(_.isEmpty)) None
      else Some(spark.range(1).select(cols.flatten.toIndexedSeq: _*))
    case _ => None
  }

  private val BeginRe = "(?is)^BEGIN(?:\\s+TRANSACTION)?\\s*$".r
  private val CommitTxnRe = "(?is)^COMMIT\\s*$".r
  private val RollbackRe = "(?is)^ROLLBACK\\s*$".r
  private val ConvertRe =
    ("(?is)^CONVERT\\s+TO\\s+([A-Za-z0-9_.-]+)\\s+FROM\\s+'([^']+)'" +
      "(?:\\s+STATS\\s*\\(([^)]*)\\))?\\s*$").r
  private val DescribeTableRe =
    "(?is)^DESCRIBE\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s*$".r
  private val ShowConstraintsRe =
    "(?is)^SHOW\\s+CONSTRAINTS\\s+([A-Za-z0-9_.-]+)\\s*$".r
  // TBLPROPERTIES: Delta/Spark statement shapes, values as manifest
  // claim-sidecar markers (the CHECK-constraint registry idiom)
  private val SetPropsRe =
    ("(?is)^ALTER\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+SET\\s+TBLPROPERTIES" +
      "\\s*\\((.+)\\)\\s*$").r
  private val UnsetPropsRe =
    ("(?is)^ALTER\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+UNSET\\s+TBLPROPERTIES" +
      "\\s*\\(([^)]*)\\)\\s*$").r
  private val ShowPropsRe =
    "(?is)^SHOW\\s+TBLPROPERTIES\\s+([A-Za-z0-9_.-]+)\\s*$".r
  // COMMENT ON ... IS: sugar over the property registry (Spark's own
  // convention — table comments are the 'comment' catalog property)
  private val CommentTableRe =
    "(?is)^COMMENT\\s+ON\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+IS\\s+'([^']*)'\\s*$".r
  private val CommentColumnRe =
    ("(?is)^COMMENT\\s+ON\\s+COLUMN\\s+([A-Za-z0-9_.-]+)\\." +
      "([A-Za-z_][A-Za-z0-9_]*)\\s+IS\\s+'([^']*)'\\s*$").r
  private val DescribeExtRe =
    "(?is)^DESCRIBE\\s+TABLE\\s+EXTENDED\\s+([A-Za-z0-9_.-]+)\\s*$".r
  private val PropKvRe = "(?s)^'([^']+)'\\s*=\\s*'([^']*)'$".r
  private val PropKeyRe = "(?s)^'([^']+)'$".r
  private val ReorgRe =
    ("(?is)^REORG\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+APPLY\\s*" +
      "\\(\\s*PURGE\\s*\\)\\s*$").r
  private val TruncateRe =
    "(?is)^TRUNCATE\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s*$".r
  // APPLY CHANGES INTO <dst> FROM <src> KEYS (<k>) [STORED AS SCD
  // TYPE n] — the DLT statement shape for the CDC mirror. Either side
  // may be schema-qualified (`sub.table` = table `table` in manifest
  // root `<root>/sub`); a bare name lives in the statement root
  // itself.
  private val ApplyChangesRe =
    ("(?is)^APPLY\\s+CHANGES\\s+INTO\\s+([A-Za-z0-9_.-]+)\\s+FROM\\s+" +
      "([A-Za-z0-9_.-]+)\\s+KEYS\\s*\\(\\s*" +
      "([A-Za-z0-9_]+(?:\\s*,\\s*[A-Za-z0-9_]+)*)\\s*\\)" +
      "(?:\\s+STORED\\s+AS\\s+SCD\\s+TYPE\\s+(\\d+))?\\s*$").r

  // Governance DDL: policies as registered metadata (Snowflake's
  // statement shapes), applied per role on the SQL read path.
  private val CreatePolicyRe =
    ("(?is)^CREATE\\s+(MASKING|ROW\\s+ACCESS)\\s+POLICY\\s+([A-Za-z0-9_]+)" +
      "\\s+AS\\s*\\(\\s*([A-Za-z0-9_]+)\\s+[A-Za-z0-9(),\\s]+?\\)\\s*" +
      "RETURNS\\s+[A-Za-z0-9(),]+\\s*->\\s*(.+)$").r
  private val SetMaskPolicyRe =
    ("(?is)^ALTER\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+MODIFY\\s+COLUMN\\s+" +
      "([A-Za-z0-9_]+)\\s+SET\\s+MASKING\\s+POLICY\\s+([A-Za-z0-9_]+)\\s*$").r
  private val UnsetMaskPolicyRe =
    ("(?is)^ALTER\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+MODIFY\\s+COLUMN\\s+" +
      "([A-Za-z0-9_]+)\\s+UNSET\\s+MASKING\\s+POLICY\\s*$").r
  private val AddRowPolicyRe =
    ("(?is)^ALTER\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+ADD\\s+ROW\\s+ACCESS\\s+" +
      "POLICY\\s+([A-Za-z0-9_]+)\\s+ON\\s*\\(\\s*([A-Za-z0-9_]+)\\s*\\)\\s*$").r
  private val DropRowPolicyRe =
    ("(?is)^ALTER\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+DROP\\s+ROW\\s+ACCESS\\s+" +
      "POLICY\\s+([A-Za-z0-9_]+)\\s*$").r
  private val SetRoleRe = "(?is)^SET\\s+ROLE\\s+([A-Za-z0-9_]+)\\s*$".r
  // ACL statements: grants as registered metadata (Snowflake shapes)
  private val GrantRe =
    ("(?is)^GRANT\\s+SELECT\\s+ON\\s+([A-Za-z0-9_.-]+)\\s+TO\\s+" +
      "([A-Za-z0-9_]+)\\s*$").r
  private val RevokeRe =
    ("(?is)^REVOKE\\s+SELECT\\s+ON\\s+([A-Za-z0-9_.-]+)\\s+FROM\\s+" +
      "([A-Za-z0-9_]+)\\s*$").r
  private val ShowGrantsRe =
    "(?is)^SHOW\\s+GRANTS\\s+ON\\s+([A-Za-z0-9_.-]+)\\s*$".r
  private val GrantSchemaRe =
    ("(?is)^GRANT\\s+SELECT\\s+ON\\s+SCHEMA\\s+([A-Za-z0-9_.-]+)\\s+TO\\s+" +
      "([A-Za-z0-9_]+)\\s*$").r
  private val RevokeSchemaRe =
    ("(?is)^REVOKE\\s+SELECT\\s+ON\\s+SCHEMA\\s+([A-Za-z0-9_.-]+)\\s+FROM\\s+" +
      "([A-Za-z0-9_]+)\\s*$").r
  private val ShowGrantsSchemaRe =
    "(?is)^SHOW\\s+GRANTS\\s+ON\\s+SCHEMA\\s+([A-Za-z0-9_.-]+)\\s*$".r
  private val FsckRe =
    ("(?is)^FSCK\\s+REPAIR\\s+TABLE\\s+([A-Za-z0-9_.-]+)" +
      "(\\s+DRY\\s+RUN)?\\s*$").r
  private val GenerateRe =
    ("(?is)^GENERATE\\s+symlink_format_manifest\\s+FOR\\s+TABLE\\s+" +
      "([A-Za-z0-9_.-]+)\\s*$").r
  private val ListStageRe =
    "(?is)^LIST\\s+'([^']+)'(?:\\s+PATTERN\\s*=\\s*'([^']*)')?\\s*$".r
  private val CreateLikeRe =
    ("(?is)^CREATE\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+LIKE\\s+" +
      "([A-Za-z0-9_.-]+)\\s*$").r
  private val ShowCreateRe =
    "(?is)^SHOW\\s+CREATE\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s*$".r
  private val ShowPoliciesRe =
    "(?is)^SHOW\\s+POLICIES\\s+([A-Za-z0-9_.-]+)\\s*$".r
  private val AnalyzeRe =
    ("(?is)^ANALYZE\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+COMPUTE\\s+STATISTICS" +
      "(?:\\s+FOR\\s+COLUMNS\\s+(.+?))?\\s*$").r
  private val AnalyzeUpdateRe =
    "(?is)^ANALYZE\\s+TABLE\\s+([A-Za-z0-9_.-]+)\\s+UPDATE\\s+STATISTICS\\s*$".r
  private val ShowStatsRe =
    "(?is)^SHOW\\s+STATS\\s+(?:FOR\\s+)?([A-Za-z0-9_.-]+)\\s*$".r

  /** Resolve a possibly schema-qualified table reference of the APPLY
    * CHANGES statement: `sub.table` → (root/sub, table) at the FIRST
    * dot; a bare name stays in `root`. */
  private def resolveQualified(root: String, ref: String): (String, String) = {
    val i = ref.indexOf('.')
    if (i < 0) (root, ref)
    else {
      require(i > 0 && i < ref.length - 1,
        s"malformed qualified table reference: $ref")
      (s"$root/${ref.substring(0, i)}", ref.substring(i + 1))
    }
  }

  /** Strip one level of single quotes and unescape the two sequences
    * Snowflake option strings use (`\\n`, `\\t`); a bare token passes
    * through verbatim. */
  private def unquoteOpt(v0: String): String = {
    val v = v0.trim
    val body =
      if (v.length >= 2 && v.startsWith("'") && v.endsWith("'"))
        v.substring(1, v.length - 1)
      else v
    body.replace("\\n", "\n").replace("\\t", "\t")
  }

  /** Parse the clause tail of a COPY statement: `FILES = (...)`,
    * `PATTERN = '...'`, `FILE_FORMAT = (...)`,
    * `VALIDATION_MODE = 'RETURN_ERRORS'` in any order. Unknown
    * clauses are rejected loudly — a silently ignored ON_ERROR would
    * load with the wrong semantics. */
  private def parseCopyClauses(rest0: String)
      : (Option[Seq[String]], Option[String], Map[String, String],
         Option[String], Option[String]) = {
    var files: Option[Seq[String]] = None
    var pattern: Option[String] = None
    var fmt = Map.empty[String, String]
    var validation: Option[String] = None
    var matchBy: Option[String] = None
    var rest = rest0.trim
    val KeyRe = "(?is)^([A-Za-z_]+)\\s*=\\s*(.*)$".r
    while (rest.nonEmpty) {
      rest = rest match {
        case KeyRe(key, tail0) =>
          val tail = tail0.trim
          key.toUpperCase(java.util.Locale.ROOT) match {
            case "VALIDATION_MODE" =>
              require(tail.startsWith("'"),
                s"COPY INTO: VALIDATION_MODE expects a quoted mode, got: $tail")
              val close = tail.indexOf('\'', 1)
              require(close > 0,
                s"COPY INTO: unterminated VALIDATION_MODE: $tail")
              val mode = tail.substring(1, close)
                .toUpperCase(java.util.Locale.ROOT)
              require(mode == "RETURN_ERRORS",
                s"COPY INTO: unsupported VALIDATION_MODE '$mode' " +
                  "(only RETURN_ERRORS)")
              validation = Some(mode)
              tail.substring(close + 1).trim
            case "FILES" =>
              require(tail.startsWith("("),
                s"COPY INTO: FILES expects a parenthesized list, got: $tail")
              val close = matchingParen(tail)
              require(close > 0, s"COPY INTO: unbalanced parens in FILES: $tail")
              files = Some(splitTopLevel(tail.substring(1, close), ',')
                .map(unquoteOpt))
              tail.substring(close + 1).trim
            case "PATTERN" =>
              require(tail.startsWith("'"),
                s"COPY INTO: PATTERN expects a quoted regex, got: $tail")
              val close = tail.indexOf('\'', 1)
              require(close > 0, s"COPY INTO: unterminated PATTERN: $tail")
              pattern = Some(tail.substring(1, close))
              tail.substring(close + 1).trim
            case "FILE_FORMAT" =>
              require(tail.startsWith("("),
                s"COPY INTO: FILE_FORMAT expects a parenthesized block, got: $tail")
              val close = matchingParen(tail)
              require(close > 0,
                s"COPY INTO: unbalanced parens in FILE_FORMAT: $tail")
              fmt = parseFormatBlock(tail.substring(1, close))
              tail.substring(close + 1).trim
            case "MATCH_BY_COLUMN_NAME" =>
              val tok = tail.takeWhile(c => !c.isWhitespace)
              val mode = tok.toUpperCase(java.util.Locale.ROOT)
              require(mode == "CASE_INSENSITIVE" || mode == "CASE_SENSITIVE"
                || mode == "NONE",
                "COPY INTO: MATCH_BY_COLUMN_NAME expects CASE_INSENSITIVE" +
                  s" | CASE_SENSITIVE | NONE, got: $tok")
              if (mode != "NONE") matchBy = Some(mode)
              tail.substring(tok.length).trim
            case other =>
              throw new IllegalArgumentException(
                s"COPY INTO: unsupported clause '$other'")
          }
        case other =>
          throw new IllegalArgumentException(
            s"COPY INTO: malformed clause text: $other")
      }
    }
    (files, pattern, fmt, validation, matchBy)
  }

  /** Parse a FILE_FORMAT block's `KEY = value` pairs. Values are a
    * quoted string, a parenthesized list (kept verbatim for the
    * caller to split), or a bare token; keys are uppercased. */
  private def parseFormatBlock(src0: String): Map[String, String] = {
    var src = src0.trim
    var out = Map.empty[String, String]
    val KeyRe = "(?is)^([A-Za-z_]+)\\s*=\\s*(.*)$".r
    while (src.nonEmpty) {
      src = src match {
        case KeyRe(key, tail0) =>
          val tail = tail0.trim
          val (value, rest) =
            if (tail.startsWith("(")) {
              val close = matchingParen(tail)
              require(close > 0,
                s"FILE_FORMAT: unbalanced parens in value of $key: $tail")
              (tail.substring(0, close + 1), tail.substring(close + 1))
            } else if (tail.startsWith("'")) {
              val close = tail.indexOf('\'', 1)
              require(close > 0, s"FILE_FORMAT: unterminated string for $key")
              (tail.substring(0, close + 1), tail.substring(close + 1))
            } else {
              val end = tail.indexWhere(ch => ch.isWhitespace)
              if (end < 0) (tail, "") else tail.splitAt(end)
            }
          out += key.toUpperCase(java.util.Locale.ROOT) -> value.trim
          rest.trim
        case other =>
          throw new IllegalArgumentException(
            s"FILE_FORMAT: malformed option text: $other")
      }
    }
    out
  }

  /** Map a parsed FILE_FORMAT block onto Spark CSV reader options +
    * the NULL_IF list, starting from the engine defaults
    * ([[graft.ops.Ingest.csvOptions]] — the reference's option block,
    * `dags/s3_data_copy_test.py:38-40`). Every supported key maps
    * onto the documented Spark equivalent; an unknown key or an
    * unsupported value fails loudly — COPY must never silently parse
    * with different semantics than the statement asked for. */
  private[sources] def copyFormatOptions(fmt: Map[String, String])
      : (Map[String, String], Seq[String]) = {
    var opts = graft.ops.Ingest.csvOptions
    var nullVals = Seq("NULL", "null", "")
    fmt.foreach { case (k, raw) =>
      val v = unquoteOpt(raw)
      k match {
        case "TYPE" =>
          require(v.equalsIgnoreCase("CSV"),
            s"COPY INTO: only TYPE = CSV is supported, got $v")
        case "FIELD_DELIMITER" => opts += "sep" -> v
        case "RECORD_DELIMITER" => opts += "lineSep" -> v
        case "SKIP_HEADER" =>
          require(v == "0" || v == "1",
            s"COPY INTO: SKIP_HEADER must be 0 or 1, got $v")
          opts += "header" -> (v == "1").toString
        case "FIELD_OPTIONALLY_ENCLOSED_BY" =>
          opts += "quote" -> v
          // quote-doubling escape rides the quote char (the
          // ESCAPE_UNENCLOSED_FIELD = NONE convention)
          opts += "escape" -> v
        case "ESCAPE_UNENCLOSED_FIELD" =>
          require(v.equalsIgnoreCase("NONE"),
            s"COPY INTO: only ESCAPE_UNENCLOSED_FIELD = NONE is supported, got $v")
        case "NULL_IF" =>
          require(raw.startsWith("(") && raw.endsWith(")"),
            s"COPY INTO: NULL_IF expects a parenthesized list, got $raw")
          nullVals = splitTopLevel(raw.substring(1, raw.length - 1), ',')
            .map(unquoteOpt)
        case "EMPTY_FIELD_AS_NULL" =>
          v.toUpperCase(java.util.Locale.ROOT) match {
            case "TRUE" => if (!nullVals.contains("")) nullVals :+= ""
            case "FALSE" => nullVals = nullVals.filter(_.nonEmpty)
            case other => throw new IllegalArgumentException(
              s"COPY INTO: EMPTY_FIELD_AS_NULL must be TRUE/FALSE, got $other")
          }
        case "COMPRESSION" =>
          require(Seq("AUTO", "GZIP", "NONE").exists(v.equalsIgnoreCase),
            s"COPY INTO: unsupported COMPRESSION $v")
        // compression is extension-detected by the scan — no option
        case other =>
          throw new IllegalArgumentException(
            s"COPY INTO: unsupported FILE_FORMAT key '$other'")
      }
    }
    (opts, nullVals)
  }

  /** `COPY INTO <table> FROM '<stage>' [FILES = (...)] [PATTERN =
    * '...'] [FILE_FORMAT = (...)]` as verbatim SQL text — the
    * reference's one real data-movement operator
    * (`dags/s3_data_copy_test.py:32-41`) reachable from the same
    * any-statement surface as every other statement. File selection:
    * explicit FILES list, PATTERN regex over the staged names (a
    * driver-side metadata listing), or the whole stage; the load is
    * ONE scan of the selected files with the mapped option block +
    * NULL_IF normalization + typed casts ([[graft.ops.Ingest
    * .copyIntoOptions]]), committed atomically to the manifest table
    * (creating it on first load, appending after — Snowflake COPY
    * appends; use [[graft.ops.Ingest.copyIntoLogged]]'s load-history
    * idiom for skip-already-loaded semantics). Returns Snowflake's
    * load-report shape, one row per staged file: (file, rows_loaded,
    * status). The report is a per-file count aggregate — a second
    * pass over the stage; a single-pass variant would stage to
    * parquet once and serve both the commit and the report from the
    * staged copy, which is exactly what the manifest commit's own
    * files provide if the report is computed AFTER commit — kept as
    * two passes here so the report never reads back what it just
    * wrote. */
  def sqlCopyInto(spark: SparkSession, root: String, table: String,
                  stage: String, clauses: String): DataFrame = {
    val (files, pattern, fmt, validation, matchBy) = parseCopyClauses(clauses)
    require(files.isEmpty || pattern.isEmpty,
      "COPY INTO: FILES and PATTERN are mutually exclusive")
    val (opts, nullVals) = copyFormatOptions(fmt)
    val names = files.getOrElse {
      val staged = graft.ops.Ingest.stageFiles(spark, stage)
      val m = pattern.fold(staged)(p => staged.filter(_.matches(p)))
      require(m.nonEmpty, pattern.fold(s"COPY INTO: empty stage $stage")(p =>
        s"COPY INTO: PATTERN '$p' matched no staged files in $stage"))
      m
    }
    if (validation.isDefined) {
      require(matchBy.isEmpty,
        "COPY INTO: VALIDATION_MODE does not combine with " +
          "MATCH_BY_COLUMN_NAME (the dry-run classifies the parse)")
      // VALIDATION_MODE = 'RETURN_ERRORS' (Snowflake's dry-run COPY):
      // parse + classify the selected files with the ON_ERROR audit
      // machinery and return the per-file error report — COMMITTING
      // NOTHING. The statement a loader runs before trusting a stage.
      // The statement's own parsed FILE_FORMAT/NULL_IF options thread
      // through, so the dry-run classifies each row exactly as the
      // un-validated COPY would load it.
      val (_, audit) =
        graft.ops.Ingest.copyOnErrorContinue(spark, stage, names, opts, nullVals)
      return audit
        .select(col("file_name").as("file"), col("rows_parsed"),
          col("rows_loaded"), col("errors_seen"))
        .orderBy("file")
    }
    // MATCH_BY_COLUMN_NAME: each staged file reads HEADER-DRIVEN and
    // aligns to the target schema by name — per file, so reordered or
    // widened stages load correctly (the positional read is the
    // default, bit-unchanged)
    val loaded = matchBy match {
      case None => graft.ops.Ingest.copyIntoOptions(
        spark, stage, names, opts, nullVals, tagSrcFile = true)
      case Some(mode) =>
        val target = Manifest.registeredSchema(spark, root, table)
          .getOrElse(Manifest.readTable(spark, root, table).schema)
        graft.ops.Ingest.copyIntoByName(spark, stage, names, opts,
          nullVals, target, caseSensitive = mode == "CASE_SENSITIVE")
    }
    // The load report rides `observe` metrics on the SAME pass that
    // feeds the commit (one conditional sum per selected file — the
    // FILES/PATTERN list is statement-sized): no second stage scan to
    // diverge from the committed rows if the stage mutates, and a
    // selected file that yielded ZERO rows still reports (Snowflake
    // lists it with 0) because the report is built from the selected
    // NAME LIST, not from grouping the rows that happened to exist.
    val obs = org.apache.spark.sql.Observation()
    val perFile = names.zipWithIndex.map { case (f, i) =>
      sum(when(col("_src_file") === f, 1L).otherwise(0L)).as(s"f$i") }
    val observed = loaded.observe(obs, perFile.head, perFile.tail: _*)
    Manifest.commitAppend(spark, root, table, observed.drop("_src_file"))
    val counts = obs.get
    import spark.implicits._
    names.zipWithIndex
      .map { case (f, i) => (f, counts(s"f$i").asInstanceOf[Long], "LOADED") }
      .toDF("file", "rows_loaded", "status")
      .orderBy("file")
  }

  /** Rewrite Snowflake positional stage references `$N` into the
    * backticked column names the transform read serves (`\`$N\``),
    * quote-aware — a `'$1'` string literal is data, not a reference. */
  private def rewriteDollarRefs(e: String): String = {
    val mask = quoteMask(e)
    "\\$(\\d+)".r.findAllMatchIn(e).toList.reverse.foldLeft(e) { (acc, m) =>
      if (!mask(m.start)) acc
      else acc.substring(0, m.start) + "`$" + m.group(1) + "`" +
        acc.substring(m.end)
    }
  }

  /** `COPY INTO t FROM (SELECT $1, CAST($2 AS ...), ... FROM
    * '<stage>') [FILES/PATTERN/FILE_FORMAT]` — Snowflake's
    * TRANSFORM-on-load COPY: reshape, cast, derive, or drop columns
    * DURING the load instead of staging twice. `$N` is the N-th
    * staged field as TEXT (the stage-reference semantics); the
    * projection expressions go verbatim to Spark's parser with `$N`
    * rewritten to the positional read's columns; FILE_FORMAT/NULL_IF
    * apply BEFORE the projection sees a value (a NULL_IF sentinel
    * must not reach a CAST); the result aligns to the target schema
    * by position and lands through the ordinary atomic commit with
    * the same observe-metric per-file report as the plain COPY.
    * VALIDATION_MODE refuses here (the dry-run classifies the
    * UNTRANSFORMED parse — run it as a plain COPY statement). */
  def sqlCopyTransform(spark: SparkSession, root: String, table: String,
                       part: String): DataFrame = {
    val close = matchingParen(part)
    require(close > 0, s"unbalanced parens in COPY transform source: $part")
    val inner = part.substring(1, close).trim
    val clauses = part.substring(close + 1).trim
    require(inner.length >= 6 &&
      inner.substring(0, 6).equalsIgnoreCase("SELECT"),
      s"COPY INTO ... FROM (...) must wrap a SELECT: $inner")
    val fromPos = topLevelKeyword(inner, "from")
    require(fromPos > 0, s"transform COPY's SELECT has no FROM: $inner")
    val projText = inner.substring(6, fromPos)
    val stage = inner.substring(fromPos + 4).trim match {
      case s if s.length > 2 && s.head == '\'' && s.last == '\'' &&
        !s.substring(1, s.length - 1).contains('\'') =>
        s.substring(1, s.length - 1)
      case other => throw new IllegalArgumentException(
        s"transform COPY must read a quoted stage path, got: $other")
    }
    val (files, pattern, fmt, validation, matchBy) = parseCopyClauses(clauses)
    require(validation.isEmpty,
      "VALIDATION_MODE does not combine with a transform COPY (the " +
        "dry-run classifies the untransformed parse — run a plain COPY)")
    require(matchBy.isEmpty,
      "MATCH_BY_COLUMN_NAME does not combine with a transform COPY " +
        "(the SELECT projection IS the explicit mapping)")
    require(files.isEmpty || pattern.isEmpty,
      "COPY INTO: FILES and PATTERN are mutually exclusive")
    val (opts, nullVals) = copyFormatOptions(fmt)
    val names = files.getOrElse {
      val staged = graft.ops.Ingest.stageFiles(spark, stage)
      val m = pattern.fold(staged)(p => staged.filter(_.matches(p)))
      require(m.nonEmpty, pattern.fold(s"COPY INTO: empty stage $stage")(p =>
        s"COPY INTO: PATTERN '$p' matched no staged files in $stage"))
      m
    }
    val src = graft.ops.Ingest.copyTransformRead(spark, stage, names,
      opts, nullVals) // carries _src_file from the scan relation
    val projections = splitTopLevel(projText, ',').map(e =>
      rewriteDollarRefs(e.trim))
    val out = src.select(projections.map(expr) :+ col("_src_file"): _*)
    val target = Manifest.registeredSchema(spark, root, table)
      .getOrElse(Manifest.readTable(spark, root, table).schema)
    require(out.schema.length - 1 == target.length,
      s"COPY INTO $table: ${out.schema.length - 1} projected columns, " +
        s"table has ${target.length}")
    val batch = out.toDF(target.fieldNames.toIndexedSeq :+ "_src_file": _*)
      .select(target.fields.toIndexedSeq.map(f =>
        col(f.name).cast(f.dataType).as(f.name)) :+ col("_src_file"): _*)
    val obs = org.apache.spark.sql.Observation()
    val perFile = names.zipWithIndex.map { case (f, i) =>
      sum(when(col("_src_file") === f, 1L).otherwise(0L)).as(s"f$i") }
    val observed = batch.observe(obs, perFile.head, perFile.tail: _*)
    Manifest.commitAppend(spark, root, table, observed.drop("_src_file"))
    val counts = obs.get
    import spark.implicits._
    names.zipWithIndex
      .map { case (f, i) => (f, counts(s"f$i").asInstanceOf[Long], "LOADED") }
      .toDF("file", "rows_loaded", "status")
      .orderBy("file")
  }

  /** `COPY INTO '<location>' FROM <view | (subquery)> [FILE_FORMAT =
    * (...)]` — the UNLOAD direction (reference S17) as verbatim SQL
    * text. The source plans like any statement (a registered view —
    * including a manifest view, so unloads prune through the
    * FileIndex — or an inline subquery); the writer maps the
    * FILE_FORMAT block onto Spark's CSV writer with the engine's
    * canonical unload conventions (quote-doubling enclosure, NULL
    * sentinel, pinned timestamp formats). Split count GROWS with
    * estimated bytes over MAX_FILE_SIZE (floor 4) — gzip parts are
    * non-splittable, so a fixed split would serialize every
    * downstream reader (the round-8 unload lesson). The row count
    * rides an `observe` metric on the SAME write pass — no second
    * scan. Returns Snowflake's unload report (rows_unloaded,
    * n_files). */
  def sqlCopyUnload(spark: SparkSession, dest: String, rest0: String): DataFrame = {
    val rest = rest0.trim
    val (src, clauses) =
      if (rest.startsWith("(")) {
        val close = matchingParen(rest)
        require(close > 0, s"COPY INTO location: unbalanced subquery: $rest")
        (spark.sql(rest.substring(1, close)), rest.substring(close + 1))
      } else {
        val end = rest.indexWhere(_.isWhitespace)
        val (name, tail) = if (end < 0) (rest, "") else rest.splitAt(end)
        (spark.table(name), tail)
      }
    val (files, pattern, fmt, validation, matchBy) = parseCopyClauses(clauses)
    require(files.isEmpty && pattern.isEmpty,
      "COPY INTO location: FILES/PATTERN do not apply to an unload")
    require(validation.isEmpty,
      "COPY INTO location: VALIDATION_MODE does not apply to an unload")
    require(matchBy.isEmpty,
      "COPY INTO location: MATCH_BY_COLUMN_NAME does not apply to an unload")
    var opts = graft.ops.Ingest.csvOptions - "mode"
    opts += "nullValue" -> "NULL"
    opts += "timestampFormat" -> "yyyy-MM-dd HH:mm:ss"
    opts += "timestampNTZFormat" -> "yyyy-MM-dd HH:mm:ss"
    var compression = "gzip"
    var maxFileSize = 16L << 20 // the Snowflake MAX_FILE_SIZE default
    fmt.foreach { case (k, raw) =>
      val v = unquoteOpt(raw)
      k match {
        case "TYPE" => require(v.equalsIgnoreCase("CSV"),
          s"COPY INTO location: only TYPE = CSV is supported, got $v")
        case "FIELD_DELIMITER" => opts += "sep" -> v
        case "RECORD_DELIMITER" => opts += "lineSep" -> v
        case "HEADER" => opts += "header" -> v.toLowerCase(java.util.Locale.ROOT)
        case "COMPRESSION" =>
          require(Seq("GZIP", "NONE", "AUTO").exists(v.equalsIgnoreCase),
            s"COPY INTO location: unsupported COMPRESSION $v")
          compression = if (v.equalsIgnoreCase("NONE")) "none" else "gzip"
        case "NULL_IF" =>
          // writer side: the FIRST sentinel is what NULLs serialize as
          val vs = splitTopLevel(raw.stripPrefix("(").stripSuffix(")"), ',')
            .map(unquoteOpt)
          require(vs.nonEmpty, "COPY INTO location: empty NULL_IF")
          opts += "nullValue" -> vs.head
        case "MAX_FILE_SIZE" => maxFileSize = v.toLong
        case other => throw new IllegalArgumentException(
          s"COPY INTO location: unsupported FILE_FORMAT key '$other'")
      }
    }
    val estBytes = src.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = math.max(4L, (estBytes / maxFileSize).toLong).toInt
    val obs = org.apache.spark.sql.Observation()
    src.observe(obs, count(lit(1)).as("n"))
      .repartition(n)
      .write.mode("overwrite")
      .options(opts)
      .option("compression", compression)
      .csv(dest)
    val rows = obs.get("n").asInstanceOf[Long]
    // n_files reports what actually landed, not the requested split:
    // Spark's writer skips empty partitions, so an empty or skewed
    // source writes fewer parts than the repartition count (an empty
    // unload writes ZERO) — list the destination like any consumer
    // of the report would
    val written = {
      val l = Files.list(Paths.get(dest))
      try l.iterator().asScala.count { p =>
        val nm = p.getFileName.toString
        nm.startsWith("part-") && !nm.endsWith(".crc")
      } finally l.close()
    }
    import spark.implicits._
    Seq((rows, written.toLong)).toDF("rows_unloaded", "n_files")
  }

  // ------------------------------------------------- time travel (SQL)

  /** True at positions OUTSIDE string literals and quoted
    * identifiers. Unlike [[topLevelMask]], parens do NOT mask — a
    * time-travel clause inside a subquery must still rewrite. */
  private def quoteMask(s: String): Array[Boolean] = {
    val mask = new Array[Boolean](s.length)
    var state: Char = 'n'
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      state match {
        case 'n' => ch match {
          case '\'' => state = 'q'
          case '`' => state = 'b'
          case '"' => state = 'd'
          case _ => mask(i) = true
        }
        case 'q' => if (ch == '\'') state = 'n'
        case 'b' => if (ch == '`') state = 'n'
        case 'd' => if (ch == '"') state = 'n'
      }
      i += 1
    }
    mask
  }

  private val VersionAsOfRe =
    "(?i)\\b([A-Za-z_][A-Za-z0-9_.]*)\\s+VERSION\\s+AS\\s+OF\\s+([0-9]+)".r
  private val TimestampAsOfRe =
    "(?i)\\b([A-Za-z_][A-Za-z0-9_.]*)\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'".r
  // the Snowflake spelling of the same travel — `t AT (TIMESTAMP => 'ts')`
  private val AtTimestampRe =
    ("(?i)\\b([A-Za-z_][A-Za-z0-9_.]*)\\s+AT\\s*\\(\\s*TIMESTAMP\\s*=>" +
      "\\s*'([^']+)'\\s*\\)").r

  private def parseTsMillis(spark: SparkSession, text: String): Long = {
    val fmt = new java.time.format.DateTimeFormatterBuilder()
      .appendPattern("yyyy-MM-dd HH:mm:ss")
      .optionalStart()
      .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 1, 9, true)
      .optionalEnd()
      .toFormatter(java.util.Locale.ROOT)
    val ldt =
      try LocalDateTime.parse(text, fmt)
      catch {
        case e: java.time.format.DateTimeParseException =>
          throw new IllegalArgumentException(
            s"TIMESTAMP AS OF: cannot parse '$text' " +
              "(expected yyyy-MM-dd HH:mm:ss[.fraction], session zone)", e)
      }
    ldt.atZone(Manifest.sessionZone(spark)).toInstant.toEpochMilli
  }

  /** Resolve `t VERSION AS OF n` / `t TIMESTAMP AS OF 'ts'` clauses
    * in a SQL statement against manifest root `root`: each occurrence
    * registers a version-PINNED view of manifest table `t` (the q207
    * register-time pinning; timestamps resolve through
    * [[Manifest.versionAsOf]] — newest commit at or before the
    * instant, in the session zone) and the clause text is replaced by
    * the pinned view's name. Quote-aware (a clause-shaped string
    * literal is left alone) and subquery-transparent. Statements
    * without a travel clause pass through byte-identical. */
  def rewriteTimeTravel(spark: SparkSession, root: String, sql: String): String = {
    def rewrite(s0: String, re: scala.util.matching.Regex,
                resolve: String => Long): String = {
      val mask = quoteMask(s0)
      re.findAllMatchIn(s0).filter(m => mask(m.start)).toList.reverse
        .foldLeft(s0) { (acc, m) =>
          val table = m.group(1)
          val v = resolve(m.group(2))
          val view = s"${table.replace('.', '_')}__asof_v$v"
          register(spark, root, table, view, version = v)
          acc.substring(0, m.start) + view + acc.substring(m.end)
        }
    }
    val afterV = rewrite(sql, VersionAsOfRe, _.toLong)
    val afterT = rewrite(afterV, TimestampAsOfRe,
      ts => Manifest.versionAsOf(root, parseTsMillis(spark, ts)))
    rewrite(afterT, AtTimestampRe,
      ts => Manifest.versionAsOf(root, parseTsMillis(spark, ts)))
  }

  private val TableChangesRe =
    ("(?i)\\btable_changes\\s*\\(\\s*'([A-Za-z0-9_.-]+)'\\s*,\\s*" +
      "([0-9]+)\\s*(?:,\\s*([0-9]+)\\s*)?\\)").r

  /** Resolve `table_changes('<t>', from [, to])` table-function calls
    * (Delta's CDF SQL surface) against manifest root `root`: each
    * occurrence registers the row-level change feed of manifest table
    * `t` over commits `from..to` INCLUSIVE (omitted `to` = the current
    * snapshot) as a temp view — the table's columns plus
    * `_change_type` / `_commit_version`, derived post-hoc from the
    * commit log by [[Manifest.readChangeFeed]] (append steps price
    * O(delta), DV steps O(matched rows), CoW rewrites a file-bounded
    * row diff — so the batch SQL consumer pays the same costs the API
    * consumer does) — and the call text is replaced by the view's
    * name, so the surrounding statement plans over it like any
    * relation. `from = to + 1` is the legal EMPTY interval (a caught-
    * up consumer re-polling): an empty, schema-preserving frame.
    * Quote-aware (a call-shaped string literal is left alone — the
    * q243 rewrite discipline); statements without the TVF pass
    * through byte-identical.
    *
    * View names carry the ROOT's fingerprint plus a per-statement
    * nonce, and the caller drops them once `spark.sql` has planned
    * (analysis resolves the view into the plan, so the name is dead
    * weight after): two manifest roots with a same-named table in one
    * session can never collide via createOrReplaceTempView, and views
    * do not accumulate across statements. Returns the rewritten text
    * plus the view names to drop. */
  def rewriteTableChanges(spark: SparkSession, root: String,
                          sql: String): (String, Seq[String]) = {
    val mask = quoteMask(sql)
    val created = Seq.newBuilder[String]
    val out = TableChangesRe.findAllMatchIn(sql).filter(m => mask(m.start))
      .toList.reverse
      .foldLeft(sql) { (acc, m) =>
        val table = m.group(1)
        val from = m.group(2).toLong
        require(from >= 1,
          s"table_changes: from-version must be >= 1, got $from")
        val to = Option(m.group(3)).map(_.toLong).getOrElse(-1L)
        val view = s"${table.replace('.', '_')}__changes_${from}_" +
          (if (to > 0) to.toString else "latest") +
          f"_${root.hashCode & 0xffffff}%06x_${changesNonce.incrementAndGet()}"
        Manifest.readChangeFeed(spark, root, table, from - 1, to)
          .createOrReplaceTempView(view)
        created += view
        acc.substring(0, m.start) + view + acc.substring(m.end)
      }
    (out, created.result())
  }

  private val changesNonce = new java.util.concurrent.atomic.AtomicLong(0L)

  /** `REFRESH MATERIALIZED VIEW name`: one row-level IVM step — the
    * registered definition replays over the source's change feed
    * since the view's ledger ([[graft.ops.Views.refreshAggFromFeed]]:
    * inserts weigh +1, deletes −1, empty groups drop out), the
    * updated content replaces the view's table atomically with the
    * advanced ledger, re-drives and racers quiesce. Returns the
    * refresh report. */
  private def refreshMview(spark: SparkSession, root: String,
                           name: String): DataFrame = {
    import spark.implicits._
    val (src, keys, valExpr, sumAlias, cntAlias) =
      Manifest.mviewDefs(root).getOrElse(name,
        throw new IllegalArgumentException(s"unknown materialized view $name"))
    val appId = s"mview-$name"
    // metadata precheck: view and source share ONE root, so the
    // view's own replace commit advances the source version — an
    // interval whose commits never touched the SOURCE TABLE (pair
    // compare, DV drift included) must report NOOP without minting a
    // version, or every re-drive would chase its own tail
    val from = Manifest.lastCommittedTxn(root, appId).getOrElse(0L)
    val quiet = from > 0 && {
      val to = Manifest.snapshotVersion(root)
      def pairs(v: Long) = Manifest.manifestRows(spark, root, v)
        .collect { case (t, f, st) if t == src => (f, st) }.toSet
      to <= from || pairs(from) == pairs(to)
    }
    if (quiet)
      return Seq((name, -1L, -1L, "NOOP"))
        .toDF("view_name", "src_version", "view_version", "status")
    graft.ops.Views.refreshAggFromFeed(spark, root, src, root, name,
      appId, keys, sumAlias, cntAlias)(signed =>
      signed.select(keys.map(col) ++
        Seq(expr(valExpr).as("v"), col("_w")): _*)) match {
      case Some((srcV, dstV)) =>
        Seq((name, srcV, dstV, "REFRESHED"))
          .toDF("view_name", "src_version", "view_version", "status")
      case None =>
        Seq((name, -1L, -1L, "NOOP"))
          .toDF("view_name", "src_version", "view_version", "status")
    }
  }

  /** `EXECUTE TASK name`: run the task and every DESCENDANT through
    * AFTER edges, in BFS level order (name-sorted within a level —
    * deterministic fan-out, the reference's DAG semantics where a
    * task triggers when its predecessor completes). Each body is one
    * statement re-entering [[runDml]], so a task can be any verb the
    * surface ships — INSERT, MERGE, COPY, maintenance. A body failure
    * propagates loudly mid-run: already-completed tasks' commits
    * stand (each statement is its own atomic commit — task graphs are
    * checkpoints, not transactions; BEGIN...COMMIT is the atomicity
    * verb), exactly like a scheduler re-running a failed DAG from the
    * failed node. Returns one (task_name, position, status) row per
    * executed task. */
  private def executeTask(spark: SparkSession, root: String,
                          name: String): DataFrame = {
    import spark.implicits._
    val defs = Manifest.taskDefs(root)
    require(defs.contains(name), s"unknown task $name")
    val order = Seq.newBuilder[String]
    var frontier = Seq(name)
    val seen = scala.collection.mutable.Set(name)
    while (frontier.nonEmpty) {
      order ++= frontier
      val cur = frontier.toSet
      frontier = defs.collect {
        case (n, (Some(dep), _)) if cur.contains(dep) && !seen(n) => n
      }.toSeq.sorted
      frontier.foreach(seen += _)
    }
    order.result().zipWithIndex.map { case (t, i) =>
      val _ = runDml(spark, root, defs(t)._2)
      (t, i + 1, "OK")
    }.toDF("task_name", "position", "status")
  }

  /** The consuming INSERT's body: read the stream's pending interval,
    * plan the statement over it, land the rows AND the advanced
    * cursor in ONE claim ([[Manifest.commitConsumeStream]] — a racing
    * consumer fails loudly at claim time, never double-applies). An
    * interval with nothing pending is a PURE no-op: no claim, cursor
    * unchanged — the re-driven-scheduler quiesce discipline
    * ([[Manifest.applyChangesInto]]'s). Returns the consumption
    * report. */
  private def consumeStreamInsert(spark: SparkSession, root: String,
                                  name: String, table: String,
                                  query: String): DataFrame = {
    import spark.implicits._
    val (srcTable, offset, appendOnly) =
      Manifest.streamDefFull(root, name).getOrElse(
        throw new IllegalArgumentException(s"unknown stream $name"))
    val cur = Manifest.snapshotVersion(root)
    val feed = (if (appendOnly)
        Manifest.readAppendFeed(spark, root, srcTable, offset, cur)
      else Manifest.readChangeFeed(spark, root, srcTable, offset, cur))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (cur <= offset || feed.isEmpty)
        Seq((name, 0L, offset, offset, "NOOP"))
          .toDF("stream", "n_rows_inserted", "from_version", "to_version",
            "status")
      else {
        val view = s"${name}__consume_" +
          f"${root.hashCode & 0xffffff}%06x_${changesNonce.incrementAndGet()}"
        feed.createOrReplaceTempView(view)
        try {
          var q = query
          topLevelPositions(q, name.toLowerCase).sorted.reverse.foreach(p =>
            q = q.substring(0, p) + view + q.substring(p + name.length))
          val target = Manifest.registeredSchema(spark, root, table)
            .getOrElse(Manifest.readTable(spark, root, table).schema)
          val batch = spark.sql(q)
          require(batch.schema.length == target.length,
            s"INSERT INTO $table: ${batch.schema.length} columns " +
              s"provided, table has ${target.length}")
          val obs = org.apache.spark.sql.Observation()
          val aligned = batch.toDF(target.fieldNames.toIndexedSeq: _*)
            .select(target.fields.toIndexedSeq.map(f =>
              col(f.name).cast(f.dataType)): _*)
            .observe(obs, count(lit(1)).as("n"))
          val _ = Manifest.commitConsumeStream(spark, root, name, table,
            aligned, offset, cur)
          Seq((name, obs.get("n").asInstanceOf[Long], offset, cur, "APPLIED"))
            .toDF("stream", "n_rows_inserted", "from_version", "to_version",
              "status")
        } finally spark.catalog.dropTempView(view)
      }
    } finally feed.unpersist()
  }

  /** Resolve NAMED STREAM reads: every word-bounded, quote-masked
    * mention of a live stream name registers the stream's pending
    * change feed — `readChangeFeed(table, offset, current]`, the
    * table's columns + `_change_type`/`_commit_version` — as a
    * nonce'd temp view and rewrites the mention to it, so
    * `SELECT ... FROM s` plans over exactly what a consuming DML
    * would consume. A plain read NEVER advances the offset (Snowflake
    * semantics: only DML consumption does); statements mentioning no
    * stream pass through byte-identical. Returns the rewritten text
    * plus the views to drop after planning. */
  def rewriteStreamReads(spark: SparkSession, root: String,
                         sql: String): (String, Seq[String]) = {
    val names = Manifest.streamNames(root)
    if (names.isEmpty) return (sql, Nil)
    val created = Seq.newBuilder[String]
    var out = sql
    names.foreach { n =>
      val positions = topLevelPositions(out, n.toLowerCase)
      if (positions.nonEmpty) {
        val (t, off, ao) = Manifest.streamDefFull(root, n).get
        val cur = Manifest.snapshotVersion(root)
        val view = s"${n}__stream_" +
          f"${root.hashCode & 0xffffff}%06x_${changesNonce.incrementAndGet()}"
        (if (ao) Manifest.readAppendFeed(spark, root, t, off, cur)
         else Manifest.readChangeFeed(spark, root, t, off, cur))
          .createOrReplaceTempView(view)
        created += view
        positions.sorted.reverse.foreach(p =>
          out = out.substring(0, p) + view + out.substring(p + n.length))
      }
    }
    (out, created.result())
  }

  // --------------------------------------------------------------- queries

  val queries: Seq[Q] = Seq(

    // ----- SQL-surface stats pruning (q205): the q193 contract with
    //       the predicate arriving as VERBATIM SQL text over a temp
    //       view — the pruning FileIndex receives Catalyst's pushed
    //       data filters and bounds the scan from manifest stats
    //       alone (PlanShapeSpec asserts the scan's numFiles metric
    //       dropped). The oracle recomputes the window from the raw
    //       table: over-pruning loses rows, treating stats as a row
    //       filter over-counts — both break the hash. -----
    Q("q205_manifest_sql_prune",
      Some("""SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-08 00:00:00'
             |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15 00:00:00'
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val root = Manifest.statsRoot(s, dir)
        register(s, root, "events_log", "events_log_mf")
        s.sql("""SELECT CAST(ts AS DATE) AS day,
                |  CAST(count(*) AS BIGINT) AS n_events,
                |  CAST(sum(value) AS DOUBLE) AS total_v
                |FROM events_log_mf
                |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
                |  AND ts < TIMESTAMP '2024-01-15 00:00:00'
                |GROUP BY 1 ORDER BY 1""".stripMargin)
      }),

    // ----- SQL over the Z-ordered table (q206): a predicate on the
    //       SECOND Z-dimension alone (user band, no ts clause) prunes
    //       files through the same SQL path — the property a range
    //       layout cannot give its trailing column. Conjunctive with
    //       a value floor that the index must treat conservatively
    //       (no stats recorded for `value` → keeps all files; the row
    //       filter still applies). -----
    Q("q206_manifest_sql_zorder",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |WHERE user_id BETWEEN 2 AND 5 AND CAST(value AS DECIMAL(18,4)) > 1
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = Manifest.zorderRoot(s, dir)
        register(s, root, "events_log", "events_zorder_mf")
        s.sql("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                |  CAST(sum(value) AS DOUBLE) AS total_v
                |FROM events_zorder_mf
                |WHERE user_id BETWEEN 2 AND 5 AND value > 1
                |GROUP BY event_type ORDER BY event_type""".stripMargin)
      }),

    // ----- Time travel through the SQL surface (q207): the SAME view
    //       name bound to snapshot v1 serves the pre-cut window while
    //       the current snapshot serves the full one — version
    //       resolution is a register-time argument, not a query
    //       rewrite. The oracle recomputes v1's window (pre-cut) from
    //       the raw table. -----
    Q("q207_manifest_sql_time_travel",
      Some("""SELECT user_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_u,
             |  CAST(count(*) AS BIGINT) AS n_u
             |FROM events
             |WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = Manifest.statsRoot(s, dir)
        register(s, root, "events_log", "events_log_v1", version = 1L)
        s.sql("""SELECT user_id, CAST(sum(value) AS DOUBLE) AS total_u,
                |  CAST(count(*) AS BIGINT) AS n_u
                |FROM events_log_v1
                |GROUP BY user_id ORDER BY user_id""".stripMargin)
      }),

    // ----- LIVE view (q210): the view registers BEFORE the second
    //       append lands, and the query still sees the full window —
    //       each query resolves the CURRENT committed snapshot (a
    //       table, not a frozen file list; the FileIndex re-resolves
    //       on version change). A frozen-at-registration index would
    //       miss the post-registration rows and break the hash against
    //       the full-window oracle. -----
    Q("q210_manifest_sql_live_view",
      Some("""SELECT user_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_u,
             |  CAST(count(*) AS BIGINT) AS n_u
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cutTs = lit(graft.ops.Cdc.versionCut).cast("timestamp")
        val root = Files.createTempDirectory("graft-live-view").toString
        Manifest.commitAppendRanged(s, root, "events_log",
          ev.filter(col("ts") < cutTs), "ts", 4)
        register(s, root, "events_log", "events_live_mf")
        // committed AFTER registration — the live view must see it
        Manifest.commitAppendRanged(s, root, "events_log",
          ev.filter(col("ts") >= cutTs), "ts", 4)
        val out = s.sql(
          """SELECT user_id, CAST(sum(value) AS DOUBLE) AS total_u,
            |  CAST(count(*) AS BIGINT) AS n_u
            |FROM events_live_mf
            |GROUP BY user_id ORDER BY user_id""".stripMargin)
          .localCheckpoint(true)
        // the root is about to go away: deregister the view too, so no
        // catalog entry dangles over a deleted path
        s.catalog.dropTempView("events_live_mf")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- SQL DML over a manifest table (q219): the DELETE and
    //       UPDATE arrive as VERBATIM SQL text and commit through the
    //       merge-on-read path — no Scala call sites, completing the
    //       arbitrary-SQL surface for writes. The oracle recomputes
    //       both effects (window complement, negated user) from the
    //       raw table: a mis-parsed WHERE, an update leaking into the
    //       deleted window, or a SET applied to the wrong rows all
    //       break the hash. DmlSpec pins the parser edges (quoted
    //       keywords, multi-assignment, no-WHERE forms). -----
    Q("q219_manifest_sql_dml",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CASE WHEN user_id = 3
             |    THEN -CAST(value AS DECIMAL(18,4))
             |    ELSE CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS total_v
             |FROM events
             |WHERE NOT (CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
             |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-13 00:00:00')
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = dmlRoot(s, dir)
        Manifest.readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type")
      }),

    // ----- MERGE INTO through the SQL surface (q223): the q203
    //       upsert arriving as VERBATIM SQL text — subquery source,
    //       ON t.k = s.k, the Delta full-row UPDATE SET * / INSERT *
    //       shorthand — routed to the same atomic stats-bounded
    //       commit. Completes the DML triad (DELETE q219, UPDATE
    //       q219, MERGE here); DmlSpec pins the parser edges
    //       (conditional WHEN rejected, ON-shape rejected, view-name
    //       sources). The oracle derives the merged state from the
    //       raw table: a mis-parsed ON key, a WHEN clause silently
    //       ignored, or a source row lost all shift the totals —
    //       hash breaks. -----
    Q("q223_manifest_sql_merge",
      Some("""SELECT user_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_u,
             |  CAST(count(*) AS BIGINT) AS n_u
             |FROM events
             |WHERE user_id BETWEEN 2 AND 5
             |   OR CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = mergeSqlRoot(s, dir)
        Manifest.readTable(s, root, "user_totals")
          .select(col("user_id"), col("total_u").cast("double").as("total_u"),
            col("n_u"))
          .orderBy("user_id")
      }),

    // ----- CTAS + INSERT INTO through the SQL surface (q233): a new
    //       manifest table is CREATED from a SELECT and grown by an
    //       INSERT — verbatim SQL text, no Scala call sites, closing
    //       the write surface (CTAS/INSERT/DELETE/UPDATE/MERGE). The
    //       oracle recomputes both populations from the raw table: a
    //       CTAS that silently replaced, an INSERT that landed twice,
    //       or a mis-split statement all shift the union — hash
    //       breaks. -----
    Q("q233_manifest_sql_ctas",
      Some("""WITH pre AS (
             |  SELECT user_id, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_u
             |  FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |  GROUP BY user_id),
             |post AS (
             |  SELECT user_id + 1000 AS user_id,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_u
             |  FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'
             |  GROUP BY user_id)
             |SELECT user_id, total_u FROM pre
             |UNION ALL SELECT user_id, total_u FROM post
             |ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = ctasRoot(s, dir)
        Manifest.readTable(s, root, "user_totals_sql")
          .select(col("user_id"), col("total_u"))
          .orderBy("user_id")
      }),

    // ----- bloom point lookup through SQL (q237): q212's point-index
    //       power surfaced to verbatim SQL text — a pushed IN-list on
    //       the hash-scattered key consults the per-file bloom
    //       sidecars via the `__bloomcol` stats tag, keeping ~|keys|
    //       of 16 files where range stats keep all (PlanShapeSpec
    //       pins kept < total and the no-stats control). Blooms
    //       bound, never filter: the exact IN still applies row-wise,
    //       and the oracle recomputes the lookup from the raw table —
    //       a false-negative prune loses rows, hash breaks. -----
    Q("q237_sql_bloom_point",
      Some("""SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
             |  CAST(o_custkey AS BIGINT) AS o_custkey,
             |  CAST(o_totalprice AS DOUBLE) AS o_totalprice
             |FROM orders
             |WHERE o_orderkey IN (
             |  SELECT o_orderkey FROM orders WHERE o_orderkey % 7 = 0
             |  ORDER BY o_orderkey LIMIT 5)
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val root = Manifest.bloomRoot(s, dir)
        register(s, root, "orders_idx", "orders_bloom_mf")
        val keys = graft.Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") % 7 === 0)
          .orderBy("o_orderkey").limit(5)
          .select(col("o_orderkey").cast("long")).as[Long].collect().toSeq
        s.sql(s"""SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
                 |  CAST(o_custkey AS BIGINT) AS o_custkey,
                 |  CAST(o_totalprice AS DOUBLE) AS o_totalprice
                 |FROM orders_bloom_mf
                 |WHERE o_orderkey IN (${keys.mkString(", ")})
                 |ORDER BY o_orderkey""".stripMargin)
      }),

    // ----- constraint lifecycle through SQL (q239): CREATE TABLE AS,
    //       ADD CONSTRAINT (scanning existing data), a PASSING insert,
    //       a REJECTED violating insert (staging asserts it left
    //       nothing), DROP CONSTRAINT, and a post-drop insert that
    //       lands — all verbatim SQL text. The oracle recomputes the
    //       final population incl. the sentinel negative row: a
    //       constraint that kept enforcing after DROP (missing
    //       sentinel), or a violating batch that leaked while it was
    //       registered, both shift the totals — hash breaks. -----
    Q("q239_sql_constraint_lifecycle",
      Some("""WITH t AS (
             |  SELECT user_id, CAST(value AS DECIMAL(18,4)) AS v FROM events
             |  UNION ALL SELECT 9999, CAST(-1.0 AS DECIMAL(18,4)))
             |SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(v) AS DOUBLE) AS total_v
             |FROM t""".stripMargin),
      (s, dir) => {
        val root = sqlChecksRoot(s, dir)
        Manifest.readTable(s, root, "evsql")
          .agg(count(lit(1)).as("n_rows"),
            sum("v").cast("double").as("total_v"))
      }),

    // ----- NULL-count stats pruning (q225): `value IS NOT NULL`
    //       arrives as verbatim SQL over the manifest view, and the
    //       recorded `__nc_<col>`/`__nrows` footer counts drop the
    //       all-null files from the scan before it starts (Catalyst
    //       pushes IsNotNull for ANY value predicate too, so ordinary
    //       WHEREs inherit the same skip; PlanShapeSpec pins kept <
    //       total and the IS NULL complement). The oracle recomputes
    //       the same NULL structure from the raw table: a null count
    //       recorded wrong in either direction over- or under-prunes
    //       — hash breaks. -----
    Q("q225_null_stats_prune",
      Some("""WITH v AS (
             |  SELECT CASE
             |    WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-10 00:00:00' THEN NULL
             |    WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-20 00:00:00'
             |      AND user_id % 3 = 0 THEN NULL
             |    ELSE CAST(value AS DECIMAL(18,4)) END AS value
             |  FROM events)
             |SELECT CAST(count(*) AS BIGINT) AS n_notnull,
             |  CAST(sum(value) AS DOUBLE) AS total_v
             |FROM v WHERE value IS NOT NULL""".stripMargin),
      (s, dir) => {
        val root = nullStatsRoot(s, dir)
        register(s, root, "events_nulls", "events_nulls_mf")
        s.sql("""SELECT CAST(count(*) AS BIGINT) AS n_notnull,
                |  CAST(sum(value) AS DOUBLE) AS total_v
                |FROM events_nulls_mf WHERE value IS NOT NULL""".stripMargin)
      }),

    // ----- COPY INTO as verbatim SQL text (q241): the reference's
    //       one real data-movement operator (s3_data_copy_test.py:
    //       32-41) submitted as a STATEMENT — FILES list + the full
    //       reference FILE_FORMAT block parse from text, route
    //       through the same scan/NULL_IF/cast pipeline as q35, and
    //       the load commits atomically to a manifest table whose
    //       SQL read-back must match q35's DuckDB parse oracle
    //       byte-for-byte: any drift between the parsed option block
    //       and the executed one breaks the hash. -----
    Q("q241_sql_copy_into",
      Some(graft.ops.Ingest.duckCopyOracle(
        graft.ops.Ingest.stagedFileName(graft.ops.Ingest.backfillStart))),
      (s, _) => {
        val stage = graft.ops.Ingest.writeStageFixtures()
        val f = graft.ops.Ingest.stagedFileName(graft.ops.Ingest.backfillStart)
        val root = Files.createTempDirectory("graft-sql-copy").toString
        runDml(s, root,
          s"""COPY INTO prestg_product_order_trans FROM '$stage'
             |FILES = ('$f')
             |FILE_FORMAT = (TYPE = CSV FIELD_DELIMITER = ','
             |  SKIP_HEADER = 1 FIELD_OPTIONALLY_ENCLOSED_BY = '"'
             |  ESCAPE_UNENCLOSED_FIELD = NONE RECORD_DELIMITER = '\\n'
             |  NULL_IF = ('NULL', 'null', '') EMPTY_FIELD_AS_NULL = TRUE)"""
            .stripMargin)
        register(s, root, "prestg_product_order_trans", "sql_copied_trans")
        val out = s.sql(
          "SELECT * FROM sql_copied_trans ORDER BY trans_id")
          .localCheckpoint(true)
        s.catalog.dropTempView("sql_copied_trans")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- COPY INTO ... PATTERN= through SQL (q242): regex file
    //       selection from statement text over a stage holding
    //       decoys (the 07/15 backfill file, the gzip copy, both
    //       dirty fixtures) — must select exactly the two July 13-14
    //       files, and the statement's RESULT is Snowflake's load
    //       report (file, rows_loaded, status), pinned literally.
    //       Default FILE_FORMAT block (the reference's) applies when
    //       the statement carries none. -----
    Q("q242_sql_copy_pattern",
      Some("""SELECT file, CAST(rows_loaded AS BIGINT) AS rows_loaded, status
             |FROM (VALUES
             |  ('product_order_trans_07132022.csv', 8, 'LOADED'),
             |  ('product_order_trans_07142022.csv', 8, 'LOADED')
             |) AS t(file, rows_loaded, status)
             |ORDER BY file""".stripMargin),
      (s, _) => {
        val stage = graft.ops.Ingest.writeStageFixtures()
        graft.ops.Ingest.writeDirtyStageFixtures() // decoys share the prefix
        val root = Files.createTempDirectory("graft-sql-copy-pat").toString
        val report = runDml(s, root,
          s"""COPY INTO trans_pat FROM '$stage'
             |PATTERN = 'product_order_trans_071[34]2022\\.csv'""".stripMargin)
          .localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        report
      }),

    // ----- VERSION AS OF as SQL syntax (q243): the q207 pinning
    //       reached from STATEMENT TEXT — `FROM events_log VERSION
    //       AS OF 1` resolves to a version-pinned registration inside
    //       the SQL path, no register-time argument in sight. The
    //       oracle recomputes v1's window (pre-cut) from the raw
    //       table: resolving to the wrong snapshot (or reading the
    //       live one) shifts every group — hash breaks. -----
    Q("q243_sql_version_as_of",
      Some("""SELECT user_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_u,
             |  CAST(count(*) AS BIGINT) AS n_u
             |FROM events
             |WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = Manifest.statsRoot(s, dir)
        runDml(s, root,
          """SELECT user_id, CAST(sum(value) AS DOUBLE) AS total_u,
            |  CAST(count(*) AS BIGINT) AS n_u
            |FROM events_log VERSION AS OF 1
            |GROUP BY user_id ORDER BY user_id""".stripMargin)
      }),

    // ----- TIMESTAMP AS OF as SQL syntax (q244): wall-clock travel
    //       from statement text against the q230 fixture (three
    //       commits with real ms separation) — the instant of v2's
    //       commit, rendered as a session-zone literal, must resolve
    //       to exactly v2 (the first two windows). Off-by-one version
    //       resolution in either direction changes the event counts —
    //       hash breaks. -----
    Q("q244_sql_timestamp_as_of",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = Manifest.asOfRoot(s, dir)
        val lit2 = java.time.Instant.ofEpochMilli(Manifest.commitTimeMs(root, 2L))
          .atZone(Manifest.sessionZone(s)).toLocalDateTime
          .format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss.SSS", java.util.Locale.ROOT))
        runDml(s, root,
          s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(value) AS DOUBLE) AS total_v
             |FROM events_log TIMESTAMP AS OF '$lit2'
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
      }),

    // ----- OPTIMIZE as SQL text (q245): the q232 incremental
    //       small-file pass driven by a STATEMENT — `OPTIMIZE
    //       events_log MIN <thr> TARGET <max>` packs exactly the 14
    //       trickle files into one, the two right-sized files inherit
    //       by reference (staging asserts the 16→3 report the
    //       statement returned). File counts are fixture constants,
    //       stated literally; the content aggregate recomputes from
    //       the raw table — a pack that lost or doubled rows breaks
    //       the hash. -----
    Q("q245_sql_optimize",
      Some("""SELECT CAST(16 AS BIGINT) AS n_files_before,
             |  CAST(3 AS BIGINT) AS n_files_after,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events""".stripMargin),
      (s, dir) => {
        val root = sqlMaintRoot(s, dir)
        val v = Manifest.snapshotVersion(root)
        val before = Manifest.manifestRows(s, root, v - 1)
          .count(_._1 == "events_log")
        val after = Manifest.manifestRows(s, root, v)
          .count(_._1 == "events_log")
        Manifest.readTable(s, root, "events_log")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .select(lit(before.toLong).as("n_files_before"),
            lit(after.toLong).as("n_files_after"),
            col("n_events"), col("total_v"))
      }),

    // ----- VACUUM DRY RUN as SQL text (q246): the retention sweep's
    //       report form — `VACUUM RETAIN 1 VERSIONS GRACE 0 DRY RUN`
    //       against the maintenance root prices exactly the 14
    //       packed-away trickle files as dead and the 3 current files
    //       as live, and MUTATES NOTHING (which is also what makes
    //       the query idempotent across bench passes). Counts are
    //       fixture constants. -----
    Q("q246_sql_vacuum_dry",
      Some("""SELECT CAST(14 AS BIGINT) AS deleted_files,
             |  CAST(3 AS BIGINT) AS live_files, 'DRY RUN' AS mode"""
        .stripMargin),
      (s, dir) => {
        val root = sqlMaintRoot(s, dir)
        runDml(s, root, "VACUUM RETAIN 1 VERSIONS GRACE 0 DRY RUN")
      }),

    // ----- SHOW TABLES as SQL text (q247): the q240 catalog listing
    //       reached from a statement; same multi-table fixture, same
    //       oracle (file counts literal, row counts recomputed). -----
    Q("q247_sql_show_tables",
      Some("""SELECT 'events_log' AS table_name, CAST(8 AS BIGINT) AS n_files,
             |  CAST(count(*) AS BIGINT) AS n_rows FROM events
             |UNION ALL
             |SELECT 'type_summary', CAST(1 AS BIGINT),
             |  CAST(count(DISTINCT event_type) AS BIGINT) FROM events
             |ORDER BY table_name""".stripMargin),
      (s, dir) => {
        val root = Manifest.showTablesRoot(s, dir)
        runDml(s, root, "SHOW TABLES").orderBy("table_name")
      }),

    // ----- DESCRIBE HISTORY as SQL text (q248): the maintenance
    //       root's full operation log — 15 ranged appends then the
    //       OPTIMIZE's compaction — read back from a statement.
    //       Operations are fixture constants (the `_op` markers the
    //       claims carry); commit wall-times are projected away
    //       (non-deterministic). -----
    Q("q248_sql_describe_history",
      Some("""SELECT CAST(v AS BIGINT) AS version,
             |  CASE WHEN v <= 15 THEN 'commitAppendRanged'
             |       ELSE 'compactSmallFiles' END AS operation
             |FROM (SELECT CAST(range AS BIGINT) AS v FROM range(1, 17))
             |ORDER BY version""".stripMargin),
      (s, dir) => {
        val root = sqlMaintRoot(s, dir)
        runDml(s, root, "DESCRIBE HISTORY events_log")
          .select(col("version"), col("operation"))
          .orderBy("version")
      }),

    // ----- RESTORE as SQL text (q249): Delta's `RESTORE TABLE t TO
    //       VERSION AS OF n` verbatim — roll-forward to the v1 file
    //       set (metadata-priced, nothing copied), leaving v2 time-
    //       travelable. The clause is matched BEFORE the time-travel
    //       rewrite, so RESTORE's own AS OF text never registers a
    //       view. Oracle recomputes v1's window from the raw table:
    //       restoring to the wrong version (or not restoring) shifts
    //       every group — hash breaks. -----
    Q("q249_sql_restore",
      Some("""SELECT user_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_u,
             |  CAST(count(*) AS BIGINT) AS n_u
             |FROM events
             |WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val root = Files.createTempDirectory("graft-sql-restore").toString
        Manifest.commitAppendRanged(s, root, "events_log",
          ev.filter(col("ts") < cut), "ts", 2)
        Manifest.commitAppendRanged(s, root, "events_log",
          ev.filter(col("ts") >= cut), "ts", 2)
        runDml(s, root, "RESTORE TABLE events_log TO VERSION AS OF 1")
        val out = Manifest.readTable(s, root, "events_log")
          .groupBy("user_id")
          .agg(sum("value").cast("double").as("total_u"),
            count(lit(1)).as("n_u"))
          .orderBy("user_id").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- TRUNCATE + DROP TABLE as SQL text (q250): the remaining
    //       lifecycle verbs — TRUNCATE keeps the table registered
    //       with zero rows (schema-preserving empty replace), DROP
    //       removes its manifest rows entirely (metadata-only; files
    //       stay for time travel until vacuum) — verified through the
    //       SHOW TABLES statement in the same script. A TRUNCATE that
    //       dropped the table, or a DROP that left it listed, breaks
    //       the literal oracle. -----
    Q("q250_sql_drop_truncate",
      Some("SELECT 'user_totals' AS table_name, CAST(0 AS BIGINT) AS n_rows"),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"),
            col("value").cast("decimal(18,4)").as("value"))
        val root = Files.createTempDirectory("graft-sql-droptrunc").toString
        // content is irrelevant here (the oracle pins the TRUNCATED
        // listing) — a bounded slice keeps the per-run fixture commits
        // scan-cheap at bench SF
        Manifest.commitAppend(s, root, "user_totals",
          ev.limit(100).groupBy("user_id").agg(sum("value").as("total"))
            .coalesce(1))
        Manifest.commitAppend(s, root, "scratch", ev.limit(10).coalesce(1))
        val out = runDml(s, root,
          "TRUNCATE TABLE user_totals; DROP TABLE scratch; SHOW TABLES")
          .select(col("table_name"), col("n_rows"))
          .orderBy("table_name").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- CREATE OR REPLACE TABLE AS through SQL (q252): the
    //       replace verb CTAS deliberately refuses — an atomic
    //       content swap whose old file set stays time-travelable.
    //       The script creates with FULL counts then replaces with
    //       the user_id<=5 window; the oracle recomputes the WINDOW,
    //       so a replace that appended, no-op'd, or half-applied
    //       serves stale full counts — hash breaks. -----
    Q("q252_sql_create_or_replace",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n
             |FROM events WHERE user_id <= 5
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"))
          .createOrReplaceTempView("events_corr_src")
        val root = Files.createTempDirectory("graft-sql-corr").toString
        runDml(s, root,
          """CREATE TABLE t AS
            |SELECT event_type, CAST(count(*) AS BIGINT) AS n
            |FROM events_corr_src GROUP BY event_type;
            |CREATE OR REPLACE TABLE t AS
            |SELECT event_type, CAST(count(*) AS BIGINT) AS n
            |FROM events_corr_src WHERE user_id <= 5
            |GROUP BY event_type""".stripMargin)
        register(s, root, "t", "corr_t")
        val out = s.sql("SELECT event_type, n FROM corr_t ORDER BY event_type")
          .localCheckpoint(true)
        s.catalog.dropTempView("corr_t")
        s.catalog.dropTempView("events_corr_src")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- OPTIMIZE ... ZORDER BY through SQL (q253): the
    //       maintenance rewrite that RE-ORGANIZES an existing
    //       range-laid table onto the 2-D Morton curve — Delta's
    //       `OPTIMIZE t ZORDER BY (ts, user_id)` as statement text.
    //       Staging asserts the statement's 8→16 report AND that
    //       every rewritten file records BOTH dimensions' bounds (the
    //       pruning power a range layout cannot give its trailing
    //       column — q206/q201 prove the mayMatch side; DmlSpec pins
    //       kept < total through the registered view). The oracle
    //       recomputes the trailing-dimension band from the raw
    //       table: a rewrite that lost or doubled rows breaks the
    //       hash. -----
    Q("q253_sql_optimize_zorder",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events WHERE user_id BETWEEN 2 AND 5
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = sqlZorderRoot(s, dir)
        register(s, root, "events_log", "events_zorder_rw_mf")
        s.sql("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                |  CAST(sum(value) AS DOUBLE) AS total_v
                |FROM events_zorder_rw_mf WHERE user_id BETWEEN 2 AND 5
                |GROUP BY event_type ORDER BY event_type""".stripMargin)
      }),

    // ----- ALTER TABLE ADD COLUMN through SQL (q254): schema
    //       evolution as metadata DDL — the statement registers the
    //       evolved schema atomically (empty evolving append), the
    //       next INSERT targets the REGISTERED schema, and the SQL
    //       read path NULL-fills the column on pre-evolution files
    //       automatically (the register path pins registered schemas
    //       by design). The oracle recomputes the union: old rows
    //       with NULL score + one scored row per distinct user —
    //       wrong NULL-fill, a dropped registration, or an INSERT
    //       against the stale 2-column schema all shift the counts —
    //       hash breaks. -----
    Q("q254_sql_add_column",
      Some("""WITH ins AS (SELECT DISTINCT user_id FROM events)
             |SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(score) AS BIGINT) AS n_scored,
             |  CAST(sum(score) AS DOUBLE) AS total_score,
             |  CAST(sum(v) AS DOUBLE) AS total_v
             |FROM (
             |  SELECT user_id, CAST(value AS DECIMAL(18,4)) AS v,
             |    CAST(NULL AS DOUBLE) AS score FROM events
             |  UNION ALL
             |  SELECT user_id, CAST(1.0 AS DECIMAL(18,4)),
             |    CAST(user_id % 7 AS DOUBLE) FROM ins)""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"),
            col("value").cast("decimal(18,4)").as("v"))
        ev.createOrReplaceTempView("addcol_src_q254")
        val root = Files.createTempDirectory("graft-sql-addcol").toString
        Manifest.commitAppend(s, root, "t", ev)
        runDml(s, root,
          """ALTER TABLE t ADD COLUMN score DOUBLE;
            |INSERT INTO t
            |SELECT user_id, CAST(1.0 AS DECIMAL(18,4)),
            |  CAST(user_id % 7 AS DOUBLE)
            |FROM (SELECT DISTINCT user_id FROM addcol_src_q254)"""
            .stripMargin)
        register(s, root, "t", "addcol_t")
        val out = s.sql(
          """SELECT CAST(count(*) AS BIGINT) AS n_rows,
            |  CAST(count(score) AS BIGINT) AS n_scored,
            |  CAST(sum(score) AS DOUBLE) AS total_score,
            |  CAST(sum(v) AS DOUBLE) AS total_v
            |FROM addcol_t""".stripMargin).localCheckpoint(true)
        s.catalog.dropTempView("addcol_t")
        s.catalog.dropTempView("addcol_src_q254")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- DELETE ... WHERE k IN (SELECT ...) (q256): the bulk-
    //       erasure statement (a GDPR request list, a dedup verdict)
    //       — the subquery's key set flows into the SEMI-JOIN DV
    //       delete (`commitDeleteKeys`) without ever visiting the
    //       driver, so the erasure list's size is unbounded; the
    //       q182 erasure flow as one line of SQL text. Oracle
    //       recomputes the surviving complement: over- or under-
    //       deletion shifts every group — hash breaks. -----
    Q("q256_sql_delete_in_subquery",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events WHERE user_id % 4 <> 1
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val root = Files.createTempDirectory("graft-sql-delsub").toString
        Manifest.commitAppendRanged(s, root, "events_log", ev, "ts", 4)
        ev.filter(col("user_id") % 4 === 1).select("user_id").distinct()
          .createOrReplaceTempView("erasure_q256")
        runDml(s, root,
          """DELETE FROM events_log
            |WHERE user_id IN (SELECT user_id FROM erasure_q256)"""
            .stripMargin)
        val out = Manifest.readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type").localCheckpoint(true)
        s.catalog.dropTempView("erasure_q256")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- UPDATE ... SET ... WHERE k IN (SELECT ...) (q258): the
    //       corrections-list statement — apply a SET to every row
    //       whose key appears in a computed key set (a re-score, a
    //       currency fix, a label correction). The subquery drives a
    //       SEMI-JOIN into the DV update (`commitUpdateKeys`): the
    //       key set never visits the driver, matched files get a
    //       deletion vector + corrected re-images, untouched files
    //       are never rewritten. Oracle recomputes the post-fix state
    //       with a CASE: a missed or extra match shifts its group's
    //       sum — hash breaks. -----
    Q("q258_sql_update_in_subquery",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CASE WHEN user_id % 5 = 2
             |    THEN CAST(CAST(value AS DECIMAL(18,4)) * 2 AS DECIMAL(18,4))
             |    ELSE CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS total_v
             |FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val root = Files.createTempDirectory("graft-sql-updsub").toString
        Manifest.commitAppendRanged(s, root, "events_log", ev, "ts", 4)
        ev.filter(col("user_id") % 5 === 2).select("user_id").distinct()
          .createOrReplaceTempView("fixups_q258")
        runDml(s, root,
          """UPDATE events_log SET value = value * 2
            |WHERE user_id IN (SELECT user_id FROM fixups_q258)"""
            .stripMargin)
        val out = Manifest.readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type").localCheckpoint(true)
        s.catalog.dropTempView("fixups_q258")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- CREATE TABLE ... CLONE (q259): the zero-copy branch verb
    //       — one metadata commit registers the dev table over the
    //       SAME files, then the two tables diverge independently (a
    //       DV delete on main leaves the clone whole). Oracle
    //       recomputes both ends from raw events: any sharing
    //       violation in either direction shifts a group — hash
    //       breaks. TableCloneSpec pins the zero-data-file cost. -----
    Q("q259_sql_clone",
      Some("""SELECT 'dev' AS tbl, event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events GROUP BY 1, 2
             |UNION ALL
             |SELECT 'main' AS tbl, event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events WHERE user_id % 3 <> 0 GROUP BY 1, 2
             |ORDER BY tbl, event_type""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val root = Files.createTempDirectory("graft-sql-clone").toString
        Manifest.commitAppendRanged(s, root, "events_log", ev, "ts", 4)
        runDml(s, root,
          """CREATE TABLE events_dev SHALLOW CLONE events_log;
            |DELETE FROM events_log WHERE user_id % 3 = 0""".stripMargin)
        def aggOf(t: String, label: String) =
          Manifest.readTable(s, root, t)
            .groupBy("event_type")
            .agg(count(lit(1)).as("n_events"),
              sum("value").cast("double").as("total_v"))
            .select(lit(label).as("tbl"), col("event_type"),
              col("n_events"), col("total_v"))
        val out = aggOf("events_dev", "dev")
          .unionByName(aggOf("events_log", "main"))
          .orderBy("tbl", "event_type").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- INSERT INTO ... REPLACE WHERE (q260): the restatement-of-
    //       a-slice statement — re-land the corrected tail of the
    //       table (value × 3 for the last third of the window) in ONE
    //       commit: DV-delete of the matching slice + the corrected
    //       batch, no survivor rewrite. Oracle recomputes the post-
    //       restatement state with a CASE on the cut: a row replaced
    //       twice, missed, or leaked outside the slice shifts its
    //       group — hash breaks. -----
    Q("q260_sql_replace_where",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-20 00:00:00'
             |    THEN CAST(CAST(value AS DECIMAL(18,4)) * 3 AS DECIMAL(18,4))
             |    ELSE CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS total_v
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val root = Files.createTempDirectory("graft-sql-rw").toString
        Manifest.commitAppendRanged(s, root, "events_log", ev, "ts", 4)
        ev.createOrReplaceTempView("events_raw_q260")
        runDml(s, root,
          """INSERT INTO events_log
            |REPLACE WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
            |SELECT user_id, event_type,
            |  CAST(value * 3 AS DECIMAL(18,4)) AS value, ts
            |FROM events_raw_q260
            |WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'""".stripMargin)
        val out = Manifest.readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type").localCheckpoint(true)
        s.catalog.dropTempView("events_raw_q260")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- MERGE ... WHEN NOT MATCHED BY SOURCE (q261): the full-
    //       sync statement — a per-user state table synced to the
    //       second-half snapshot, where users absent from the new
    //       snapshot are dropped ONLY below an activity floor (the
    //       conditional by-source delete, Delta's
    //       whenNotMatchedBySourceDelete(cond)). Oracle recomputes
    //       the three-way outcome (replaced / inserted / conditionally
    //       retained) from raw events — any mis-routed row shifts the
    //       per-user state. -----
    Q("q261_sql_merge_sync",
      Some("""WITH firsth AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv
             |  FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |  GROUP BY user_id),
             |secondh AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv
             |  FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'
             |    AND user_id % 4 <> 0
             |  GROUP BY user_id)
             |SELECT user_id, n_events, CAST(tv AS DOUBLE) AS total_v FROM (
             |  SELECT * FROM secondh
             |  UNION ALL
             |  SELECT * FROM firsth f WHERE NOT EXISTS
             |    (SELECT 1 FROM secondh s WHERE s.user_id = f.user_id)
             |    AND f.n_events >= 37)
             |ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        def stateOf(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("user_id")
            .agg(count(lit(1)).as("n_events"),
              sum("value").cast("decimal(18,4)").as("tv"))
        val root = Files.createTempDirectory("graft-sql-sync").toString
        Manifest.commitAppend(s, root, "user_state",
          stateOf(ev.filter(col("ts") < cut)).coalesce(2))
        stateOf(ev.filter(col("ts") >= cut && col("user_id") % 4 =!= 0))
          .createOrReplaceTempView("sync_src_q261")
        runDml(s, root,
          """MERGE INTO user_state USING sync_src_q261 s
            |ON user_state.user_id = s.user_id
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *
            |WHEN NOT MATCHED BY SOURCE AND n_events < 37 THEN DELETE"""
            .stripMargin)
        val out = Manifest.readTable(s, root, "user_state")
          .select(col("user_id"), col("n_events"),
            col("tv").cast("double").as("total_v"))
          .orderBy("user_id").localCheckpoint(true)
        s.catalog.dropTempView("sync_src_q261")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- ALTER TABLE RENAME COLUMN (q262): metadata rename — the
    //       old name rides as a read alias, NO data moves — followed
    //       by an UPDATE addressed entirely through the NEW name: the
    //       DV-update scan must resolve the alias on pre-rename files
    //       (they physically store `value`) or every match misses.
    //       Oracle recomputes the post-update state from raw events —
    //       a missed alias zeroes the doubled half and every group
    //       shifts. -----
    Q("q262_sql_rename_column",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CASE WHEN user_id % 2 = 0
             |    THEN CAST(CAST(value AS DECIMAL(18,4)) * 2 AS DECIMAL(18,4))
             |    ELSE CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS total_amount
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val root = Files.createTempDirectory("graft-sql-rename").toString
        Manifest.commitAppendRanged(s, root, "events_log", ev, "ts", 4)
        runDml(s, root,
          """ALTER TABLE events_log RENAME COLUMN value TO amount;
            |UPDATE events_log SET amount = amount * 2 WHERE user_id % 2 = 0"""
            .stripMargin)
        val out = Manifest.readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("amount").cast("double").as("total_amount"))
          .orderBy("event_type").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- ALTER TABLE DROP COLUMN (q263): metadata narrow — every
    //       read stops serving the column NOW, old files keep the
    //       bytes invisibly, and the narrowed registration is the
    //       positional INSERT target from the next statement on (the
    //       3-column re-insert below lands against it). Oracle
    //       recomputes the doubled day-1 slice without the dropped
    //       column. SchemaDdlSpec pins the resurrection guard. -----
    Q("q263_sql_drop_column",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM (SELECT event_type, user_id FROM events
             |      UNION ALL
             |      SELECT event_type, user_id FROM events
             |      WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-02 00:00:00')
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val root = Files.createTempDirectory("graft-sql-dropcol").toString
        Manifest.commitAppendRanged(s, root, "events_log", ev, "ts", 4)
        ev.createOrReplaceTempView("events_raw_q263")
        runDml(s, root,
          """ALTER TABLE events_log DROP COLUMN value;
            |INSERT INTO events_log
            |SELECT user_id, event_type, ts FROM events_raw_q263
            |WHERE ts < TIMESTAMP '2024-01-02 00:00:00'""".stripMargin)
        val out = Manifest.readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            count_distinct(col("user_id")).as("n_users"))
          .orderBy("event_type").localCheckpoint(true)
        s.catalog.dropTempView("events_raw_q263")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- metadata-only MIN/MAX (q265): the aggregate-pushdown
    //       complement of q224's count — both bounds answer from the
    //       manifest's per-file stats alone (the q225 root: every file
    //       stat-covered, no DVs; BoundsSpec proves the data files
    //       need not even exist and pins the DV/stat-less hybrid).
    //       The all-NULL-value files contribute nothing, exactly like
    //       SQL MIN/MAX — a null bound misread as a value would shift
    //       min_v. Oracle recomputes all four bounds from raw events
    //       with the engineered null structure. -----
    Q("q265_metadata_minmax",
      Some("""SELECT CAST(min(CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS min_ts,
             |  CAST(max(CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS max_ts,
             |  CAST(min(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-10 00:00:00' THEN NULL
             |    WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-20 00:00:00' AND user_id % 3 = 0 THEN NULL
             |    ELSE CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS min_v,
             |  CAST(max(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-10 00:00:00' THEN NULL
             |    WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-20 00:00:00' AND user_id % 3 = 0 THEN NULL
             |    ELSE CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS max_v
             |FROM events""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val root = nullStatsRoot(s, dir)
        val (minTs, maxTs) = Manifest.columnBounds(s, root, "events_nulls",
          "ts", "timestamp").get
        val (minV, maxV) = Manifest.columnBounds(s, root, "events_nulls",
          "value", "decimal(18,4)").get
        Seq((minTs, maxTs, minV, maxV)).toDF("a", "b", "c", "d")
          .select(col("a").cast("timestamp").as("min_ts"),
            col("b").cast("timestamp").as("max_ts"),
            col("c").cast("double").as("min_v"),
            col("d").cast("double").as("max_v"))
      }),

    // ----- UNDROP TABLE (q266): the fat-finger recovery verb — DROP
    //       is metadata, so UNDROP is one metadata commit re-adding
    //       the newest pre-drop file set (existence-checked: a
    //       vacuumed table refuses rather than resurrecting a hole).
    //       An unrelated commit lands BETWEEN drop and undrop, so the
    //       restore provably searches history rather than "previous
    //       version". Oracle recomputes the original aggregate: a
    //       stale or partial restore shifts every group. -----
    Q("q266_sql_undrop",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events WHERE user_id < 50
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        import s.implicits._
        // user_id < 50 on BOTH sides: the verb flow (drop, interleaved
        // commit, undrop) is what's priced — it needs a real multi-file
        // table, not the whole fixture
        val ev = graft.Tables.load(s, dir, "events")
          .filter(col("user_id") < 50)
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val root = Files.createTempDirectory("graft-sql-undrop").toString
        Manifest.commitAppendRanged(s, root, "events_log", ev, "ts", 4)
        runDml(s, root, "DROP TABLE events_log")
        // an unrelated commit between drop and undrop
        Manifest.commitAppend(s, root, "audit",
          Seq(("drop", 1L)).toDF("op", "n").coalesce(1))
        runDml(s, root, "UNDROP TABLE events_log")
        val out = Manifest.readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- DESCRIBE DETAIL (q267): the one-row operational summary —
    //       version, file count, exact row count (footer counts minus
    //       DV positions), DV'd-file count — all metadata arithmetic
    //       over the q240 two-table atomic commit (version and file
    //       counts are fixture constants the oracle states literally;
    //       the row count recomputes from raw events). -----
    Q("q267_sql_describe_detail",
      Some("""SELECT 'events_log' AS table_name, CAST(1 AS BIGINT) AS version,
             |  CAST(8 AS BIGINT) AS n_files, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(0 AS BIGINT) AS n_dv_files FROM events""".stripMargin),
      (s, dir) => {
        val root = Manifest.showTablesRoot(s, dir)
        runDml(s, root, "DESCRIBE DETAIL events_log")
          .select("table_name", "version", "n_files", "n_rows", "n_dv_files")
      }),

    // ----- CONVERT TO (q268): zero-copy import of an existing
    //       parquet directory — every file HARDLINKS under the table
    //       root (no byte copied; at 100 TB the import is one footer
    //       read per file plus one commit), per-file stats come from
    //       the footers, and the converted table immediately serves
    //       the pruning SQL surface. Oracle recomputes the filtered
    //       aggregate from the raw source: a lost/duplicated file or
    //       a wrong prune shifts the groups. -----
    Q("q268_sql_convert",
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             |    AS revenue
             |FROM lineitem WHERE l_orderkey <= 3000
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) => {
        val li = graft.Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_returnflag"),
            col("l_extendedprice").cast("decimal(18,4)")
              .as("l_extendedprice"))
        val src = Files.createTempDirectory("graft-convert-src").toString
        li.repartitionByRange(6, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey")
          .write.mode("overwrite").parquet(src)
        val root = Files.createTempDirectory("graft-sql-convert").toString
        runDml(s, root, s"CONVERT TO li FROM '$src' STATS (l_orderkey)")
        register(s, root, "li", "converted_li")
        val out = s.sql(
          """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
            |  CAST(sum(l_extendedprice) AS DOUBLE) AS revenue
            |FROM converted_li WHERE l_orderkey <= 3000
            |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
          .localCheckpoint(true)
        s.catalog.dropTempView("converted_li")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        graft.ops.Staging.deleteRecursively(Paths.get(src))
        out
      }),

    // ----- BEGIN ... COMMIT (q269): the multi-statement transaction
    //       as verbatim text — a fact batch and its audit row land as
    //       ONE claim (the q218 atomic multi-table commit reached
    //       from SQL). Oracle recomputes the post-txn state of BOTH
    //       tables from raw events: a half-applied transaction (facts
    //       without audit or vice versa) breaks one branch of the
    //       union. Atomicity-under-failure is DmlSpec's pin. -----
    Q("q269_sql_transaction",
      Some("""WITH f AS (SELECT event_type,
             |    CAST(value AS DECIMAL(18,4)) AS v FROM events
             |  WHERE user_id < 50)
             |SELECT event_type AS k, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(v) AS DOUBLE) AS total
             |FROM f GROUP BY event_type
             |UNION ALL
             |SELECT 'audit:init', (SELECT CAST(count(*) AS BIGINT)
             |  FROM events WHERE user_id < 50
             |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'),
             |  CAST(NULL AS DOUBLE)
             |UNION ALL
             |SELECT 'audit:w2', (SELECT CAST(count(*) AS BIGINT)
             |  FROM events WHERE user_id < 50
             |  AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'),
             |  CAST(NULL AS DOUBLE)
             |ORDER BY k""".stripMargin),
      (s, dir) => {
        // user_id < 50 on BOTH sides: the transaction machinery is
        // what's priced, not the fixture volume
        val ev = graft.Tables.load(s, dir, "events")
          .filter(col("user_id") < 50)
          .select(col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val root = Files.createTempDirectory("graft-sql-txn").toString
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val w1 = ev.filter(col("ts") < cut)
        Manifest.commitAppend(s, root, "facts",
          w1.select("event_type", "value").coalesce(2))
        Manifest.commitAppend(s, root, "audit",
          w1.agg(count(lit(1)).as("n"))
            .select(lit("init").as("op"), col("n")).coalesce(1))
        ev.createOrReplaceTempView("txn_ev_src")
        runDml(s, root,
          """BEGIN;
            |INSERT INTO facts SELECT event_type, value FROM txn_ev_src
            |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00';
            |INSERT INTO audit SELECT 'w2', count(*) FROM txn_ev_src
            |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00';
            |COMMIT""".stripMargin)
        val facts = Manifest.readTable(s, root, "facts")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("value").cast("double").as("total"))
          .select(col("event_type").as("k"), col("n"), col("total"))
        val audit = Manifest.readTable(s, root, "audit")
          .select(concat(lit("audit:"), col("op")).as("k"), col("n"),
            lit(null).cast("double").as("total"))
        val out = facts.union(audit).orderBy("k").localCheckpoint(true)
        s.catalog.dropTempView("txn_ev_src")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- metadata aggregate statements (q270): whole-table
    //       COUNT(*)/COUNT(c)/MIN/MAX as verbatim SQL text answered
    //       from per-file stats — countRows + the new non-null counts
    //       (__nrows - __nc) + columnBounds behind one statement
    //       rewrite; at 100 TB these are driver-side arithmetic, zero
    //       data I/O (BoundsSpec proves it with the files deleted).
    //       Over the q225 engineered-null root, so COUNT(value) has
    //       real per-file null structure to get wrong. -----
    Q("q270_metadata_agg_sql",
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             |  CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-10 00:00:00' THEN NULL
             |    WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-20 00:00:00' AND user_id % 3 = 0 THEN NULL
             |    ELSE CAST(value AS DECIMAL(18,4)) END AS v
             |  FROM events)
             |SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(v) AS BIGINT) AS n_vals,
             |  CAST(min(v) AS DOUBLE) AS min_v,
             |  CAST(max(ts) AS TIMESTAMP) AS max_ts
             |FROM e""".stripMargin),
      (s, dir) => {
        val root = nullStatsRoot(s, dir)
        runDml(s, root,
          """SELECT count(*) AS n_rows, count(value) AS n_vals,
            |  min(value) AS min_v, max(ts) AS max_ts
            |FROM events_nulls""".stripMargin)
          .select(col("n_rows"), col("n_vals"),
            col("min_v").cast("double").as("min_v"), col("max_ts"))
      }),

    // ----- 3-dimension Z-order (q272): `OPTIMIZE t ZORDER BY
    //       (ts, user_id, value)` as verbatim text — the k-dim Morton
    //       relayout gives EVERY dimension tight per-file bounds, so
    //       a predicate on the TRAILING dimension alone prunes files
    //       (asserted on the scan's own FileIndex — a range layout
    //       would keep all 27). Oracle recomputes the band aggregate
    //       from raw events: a row misplaced by the relayout or a
    //       file wrongly pruned shifts the groups. -----
    Q("q272_sql_zorder3",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |WHERE CAST(value AS DECIMAL(18,4)) >= 10.0
             |  AND CAST(value AS DECIMAL(18,4)) < 20.0
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val root = sqlZorder3Root(s, dir)
        val index = register(s, root, "events3", "events_zorder3_mf")
        val out = s.sql(
          """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
            |  CAST(sum(value) AS DOUBLE) AS total_v
            |FROM events_zorder3_mf
            |WHERE value >= 10.0 AND value < 20.0
            |GROUP BY event_type ORDER BY event_type""".stripMargin)
          .localCheckpoint(true)
        val (kept, total) = index.lastPrune
        require(kept < total,
          s"trailing-dimension predicate kept $kept/$total — no prune")
        s.catalog.dropTempView("events_zorder3_mf")
        out
      }),

    // ----- REORG TABLE ... APPLY (PURGE) (q276): the DV-hardening
    //       maintenance verb as verbatim text — merge-on-read keeps
    //       DELETE O(matched files); this bounds the read-time DV
    //       masking by rewriting ONLY the DV-carrying files (clean
    //       files inherit by reference, asserted via the report and
    //       a DV-free DESCRIBE DETAIL). Oracle recomputes the
    //       post-delete state: a purge that loses or resurrects one
    //       masked row shifts the groups. -----
    Q("q276_sql_reorg_purge",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |WHERE user_id < 50
             |  AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-08 00:00:00'
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        // user_id < 50 on BOTH sides: the DELETE -> REORG -> verify
        // flow is what's priced, over a real 4-file table
        val ev = graft.Tables.load(s, dir, "events")
          .filter(col("user_id") < 50)
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val root = Files.createTempDirectory("graft-sql-reorg").toString
        Manifest.commitAppendRanged(s, root, "events_log", ev, "ts", 4)
        runDml(s, root,
          "DELETE FROM events_log WHERE ts < TIMESTAMP '2024-01-08 00:00:00'")
        val rep = runDml(s, root,
          "REORG TABLE events_log APPLY (PURGE)").head()
        require(rep.getLong(1) >= 1L, s"REORG purged no files: $rep")
        val d = Manifest.describeDetail(s, root, "events_log").head()
        require(d.getLong(5) == 0L, s"DVs survived the purge: $d")
        val out = Manifest.readTable(s, root, "events_log")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("event_type").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- DESCRIBE TABLE (q278): the column listing as text — the
    //       registered schema governs when present, the inferred file
    //       schema otherwise; pure metadata. The oracle states the
    //       q240 fixture's shape literally: a type drift (decimal
    //       widened, timestamp downgraded) or a leaked internal
    //       column breaks it. -----
    Q("q278_sql_describe_table",
      Some("""SELECT * FROM (VALUES
             |  ('event_type', 'string', true),
             |  ('ts', 'timestamp', true),
             |  ('user_id', 'bigint', true),
             |  ('value', 'decimal(18,4)', true))
             |  t(col_name, data_type, nullable)
             |ORDER BY col_name""".stripMargin),
      (s, dir) => {
        val root = Manifest.showTablesRoot(s, dir)
        runDml(s, root, "DESCRIBE TABLE events_log").orderBy("col_name")
      }),

    // ----- SHOW CONSTRAINTS (q280): the governance listing — which
    //       CHECK predicates every write path enforces, as text. The
    //       flow is the full DDL lifecycle in one script: two ADDs, a
    //       DROP, one listing; the oracle states the surviving pair
    //       literally, so a dropped constraint that lingers (or a
    //       kept one that vanishes) breaks it. -----
    Q("q280_sql_show_constraints",
      Some("""SELECT * FROM (VALUES
             |  ('uid_nonneg', 'user_id >= 0'),
             |  ('v_band', 'v BETWEEN -1000 AND 1000'))
             |  t(name, expression)
             |ORDER BY name""".stripMargin),
      (s, dir) => {
        val root = Files.createTempDirectory("graft-sql-showcon").toString
        graft.Tables.load(s, dir, "events")
          .filter(col("user_id") < 20)
          .select(col("user_id"), col("value").as("v"))
          .createOrReplaceTempView("showcon_src")
        val out = runDml(s, root,
          """CREATE TABLE t AS SELECT * FROM showcon_src;
            |ALTER TABLE t ADD CONSTRAINT uid_nonneg CHECK (user_id >= 0);
            |ALTER TABLE t ADD CONSTRAINT v_band CHECK (v BETWEEN -1000 AND 1000);
            |ALTER TABLE t ADD CONSTRAINT doomed CHECK (v >= -9999);
            |ALTER TABLE t DROP CONSTRAINT doomed;
            |SHOW CONSTRAINTS t""".stripMargin)
          .orderBy("name").localCheckpoint(true)
        s.catalog.dropTempView("showcon_src")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- APPLY CHANGES INTO as SQL text (q281): the q236 CDC-mirror
    //       flow driven ENTIRELY by one repeated statement — bootstrap,
    //       incremental (CoW merge + DV delete netted from the feed),
    //       and a NOOP re-drive, all `APPLY CHANGES INTO dst.user_totals
    //       FROM src.user_totals KEYS (user_id)` (staging asserts each
    //       drive's report; the query re-drives once more and must see
    //       NOOP). The mirror reads back through the SQL FileIndex
    //       after a statement REORG physicalized the sync's DVs. Same
    //       oracle as q236: any stale pre-image, resurrected key, or
    //       double-applied interval shifts the per-user totals. -----
    Q("q281_sql_apply_changes",
      Some("""SELECT user_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_u,
             |  CAST(count(*) AS BIGINT) AS n_u
             |FROM events
             |WHERE (user_id BETWEEN 2 AND 5
             |   OR CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00')
             |  AND user_id NOT BETWEEN 7 AND 9
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = sqlApplyRoot(s, dir)
        // re-drive THROUGH the statement: exactly-once means this is a
        // NOOP report, asserted IN the query so a regression fails the
        // board, not a spec
        val re = runDml(s, root,
          "APPLY CHANGES INTO dst.user_totals FROM src.user_totals KEYS (user_id)")
          .collect()(0)
        require(re.getString(2) == "NOOP",
          s"re-driven APPLY CHANGES must be a NOOP, reported $re")
        register(s, s"$root/dst", "user_totals", "apply_sql_mirror")
        val out = runDml(s, s"$root/dst",
          """SELECT user_id, CAST(total_u AS DOUBLE) AS total_u, n_u
            |FROM apply_sql_mirror ORDER BY user_id""".stripMargin)
          .localCheckpoint(true)
        s.catalog.dropTempView("apply_sql_mirror")
        out
      }),

    // ----- APPLY CHANGES ... STORED AS SCD TYPE 2 as SQL text (q282):
    //       the q264 history-keeping mirror from statement text —
    //       bootstrap, one incremental interval (restatement + DV
    //       erasure on the source) opening AND closing intervals, NOOP
    //       re-drive, all the same statement; the query asserts the
    //       NOOP in-plan and reads the interval algebra back through
    //       SQL over the registered history table. q264's oracle
    //       derives the expected (n_rows, has_open, cur_tv) triple per
    //       user from raw events. -----
    Q("q282_sql_apply_changes_scd2",
      Some("""WITH u1 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv
             |  FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-11 00:00:00'
             |  GROUP BY user_id),
             |u2 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv
             |  FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-11 00:00:00'
             |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-21 00:00:00'
             |    AND user_id % 3 = 0 GROUP BY user_id)
             |SELECT coalesce(u1.user_id, u2.user_id) AS user_id,
             |  CAST(CASE WHEN u1.user_id IS NOT NULL AND u2.user_id IS NOT NULL
             |    AND (u1.n <> u2.n OR u1.tv <> u2.tv) THEN 2 ELSE 1 END AS BIGINT) AS n_rows,
             |  CAST(CASE WHEN coalesce(u1.user_id, u2.user_id) % 5 = 0
             |    THEN 0 ELSE 1 END AS BIGINT) AS has_open,
             |  CAST(CASE WHEN coalesce(u1.user_id, u2.user_id) % 5 = 0 THEN -1
             |    ELSE CAST(coalesce(u2.tv, u1.tv) AS DOUBLE) END AS DOUBLE) AS cur_tv
             |FROM u1 FULL OUTER JOIN u2 ON u1.user_id = u2.user_id
             |ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = sqlScd2Root(s, dir)
        val re = runDml(s, root,
          "APPLY CHANGES INTO dst.acct_hist FROM src.acct KEYS (user_id) " +
            "STORED AS SCD TYPE 2").collect()(0)
        require(re.getString(2) == "NOOP",
          s"re-driven SCD2 APPLY CHANGES must be a NOOP, reported $re")
        register(s, s"$root/dst", "acct_hist", "scd2_sql_hist")
        val out = runDml(s, s"$root/dst",
          """SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows,
            |  CAST(max(CASE WHEN __end_v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS has_open,
            |  coalesce(CAST(max(CASE WHEN __end_v IS NULL THEN tv END) AS DOUBLE), -1.0D) AS cur_tv
            |FROM scd2_sql_hist GROUP BY user_id ORDER BY user_id""".stripMargin)
          .localCheckpoint(true)
        s.catalog.dropTempView("scd2_sql_hist")
        out
      }),

    // ----- TBLPROPERTIES (q295): table-level key→value metadata as
    //       statement text — SET (register + overwrite), UNSET
    //       (tombstone), SHOW (read back). Properties persist as
    //       claim-sidecar markers (the CHECK-constraint registry
    //       idiom): serialized with data commits by the version CAS
    //       and carried by VACUUM — the script vacuums to the
    //       retention floor BEFORE the listing, so a registry that
    //       only lived in collected claim dirs would come back empty
    //       and break the oracle's literal row set. Overwrite and
    //       tombstone shadowing are both exercised (quality.tier set
    //       twice, 'doomed' unset). Pure metadata at any scale. -----
    Q("q295_sql_tblproperties",
      Some("""SELECT * FROM (VALUES
             |  ('owner', 'data-platform'),
             |  ('quality.tier', 'gold'),
             |  ('retention.days', '30'))
             |  t(key, value)
             |ORDER BY key""".stripMargin),
      (s, dir) => {
        val root = Files.createTempDirectory("graft-sql-props").toString
        graft.Tables.load(s, dir, "events")
          .filter(col("user_id") < 20)
          .select(col("user_id"), col("value").as("v"))
          .createOrReplaceTempView("props_src")
        val out = runDml(s, root,
          """CREATE TABLE t AS SELECT * FROM props_src;
            |ALTER TABLE t SET TBLPROPERTIES ('owner'='data-platform', 'quality.tier'='bronze', 'doomed'='yes');
            |ALTER TABLE t SET TBLPROPERTIES ('quality.tier'='gold', 'retention.days'='30');
            |ALTER TABLE t UNSET TBLPROPERTIES ('doomed', 'never.was.set');
            |INSERT INTO t SELECT * FROM props_src;
            |VACUUM RETAIN 1 VERSIONS GRACE 0;
            |SHOW TBLPROPERTIES t""".stripMargin)
          .orderBy("key").localCheckpoint(true)
        s.catalog.dropTempView("props_src")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- GRANT / REVOKE / SHOW GRANTS (q297): the ACL half of the
    //       governance surface (policies rewrite WHAT a role sees,
    //       q283; grants decide WHETHER it reads at all). Grants are
    //       claim-sidecar markers — CAS-serialized, vacuum-carried —
    //       and the FIRST grant closes the table: only admin + granted
    //       roles read, enforced where every SQL view is born
    //       (tableDF) and on the metadata-aggregate fast path, failing
    //       loudly (a silent empty frame would read as "no rows", not
    //       "no access"). The query asserts the enforcement matrix
    //       IN-PLAN — granted role reads the same count as admin, an
    //       ungranted role refuses BOTH the view registration and the
    //       metadata COUNT — then lists the surviving ACL after a
    //       vacuum to the retention floor; the oracle states it
    //       literally, so a revoke that lingers (or a grant the vacuum
    //       dropped) breaks the board. Pure metadata at any scale. -----
    Q("q297_sql_grants",
      Some("""SELECT * FROM (VALUES ('analyst', 'SELECT'))
             |  t(role, privilege)
             |ORDER BY role""".stripMargin),
      (s, dir) => {
        val root = Files.createTempDirectory("graft-sql-grants").toString
        graft.Tables.load(s, dir, "events")
          .filter(col("user_id") < 20)
          .select(col("user_id"), col("value").as("v"))
          .createOrReplaceTempView("grants_src")
        runDml(s, root,
          """CREATE TABLE t AS SELECT * FROM grants_src;
            |GRANT SELECT ON t TO analyst;
            |GRANT SELECT ON t TO doomed;
            |REVOKE SELECT ON t FROM doomed;
            |INSERT INTO t SELECT * FROM grants_src;
            |VACUUM RETAIN 1 VERSIONS GRACE 0""".stripMargin)
        try {
          s.conf.set("graft.sql.role", "analyst")
          register(s, root, "t", "grants_t")
          val nGranted = s.sql("SELECT count(*) FROM grants_t")
            .collect()(0).getLong(0)
          s.conf.set("graft.sql.role", "intern")
          require(scala.util.Try(register(s, root, "t", "grants_t2"))
            .isFailure, "ungranted role must refuse view registration")
          require(scala.util.Try(
            runDml(s, root, "SELECT count(*) AS n FROM t")).isFailure,
            "ungranted role must refuse the metadata COUNT")
          s.conf.set("graft.sql.role", "admin")
          register(s, root, "t", "grants_t")
          val nAdmin = s.sql("SELECT count(*) FROM grants_t")
            .collect()(0).getLong(0)
          require(nGranted == nAdmin && nAdmin > 0L,
            s"granted role read $nGranted rows, admin $nAdmin")
        } finally s.conf.set("graft.sql.role", "admin")
        val out = runDml(s, root, "SHOW GRANTS ON t")
          .orderBy("role").localCheckpoint(true)
        s.catalog.dropTempView("grants_src")
        s.catalog.dropTempView("grants_t")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- COMMENT ON + DESCRIBE TABLE EXTENDED (q298): catalog
    //       documentation as statement text. Comments are sugar over
    //       the q295 property registry (Spark's own convention — the
    //       table comment IS the 'comment' catalog property; column
    //       comments live under 'comment.<col>'), so they inherit the
    //       full marker discipline for free: CAS-serialized,
    //       overwrite-shadowed, vacuum-carried. The script overwrites
    //       one column comment (last writer wins) and the query
    //       asserts the table-level comment in-plan via SHOW
    //       TBLPROPERTIES; the oracle states the annotated column
    //       listing literally. Pure metadata at any scale. -----
    Q("q298_sql_comments",
      Some("""SELECT * FROM (VALUES
             |  ('user_id', 'bigint', true, 'who did it'),
             |  ('v', 'double', true, 'event value'))
             |  t(col_name, data_type, nullable, comment)
             |ORDER BY col_name""".stripMargin),
      (s, dir) => {
        val root = Files.createTempDirectory("graft-sql-comments").toString
        graft.Tables.load(s, dir, "events")
          .filter(col("user_id") < 20)
          .select(col("user_id"), col("value").cast("double").as("v"))
          .createOrReplaceTempView("cmnt_src")
        val out = runDml(s, root,
          """CREATE TABLE t AS SELECT * FROM cmnt_src;
            |COMMENT ON TABLE t IS 'demo events slice';
            |COMMENT ON COLUMN t.user_id IS 'who did it';
            |COMMENT ON COLUMN t.v IS 'wrong, overwrite me';
            |COMMENT ON COLUMN t.v IS 'event value';
            |DESCRIBE TABLE EXTENDED t""".stripMargin)
          .orderBy("col_name").localCheckpoint(true)
        // the table-level comment rides the property registry —
        // asserted in-plan so a lost marker fails the board
        val tc = Manifest.tableProperties(root, "t").get("comment")
        require(tc.contains("demo events slice"),
          s"table comment missing or wrong: $tc")
        s.catalog.dropTempView("cmnt_src")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- FSCK REPAIR TABLE (q300): the corruption-repair verb —
    //       data files deleted OUT-OF-BAND (storage loss, a fat-
    //       fingered rm) leave manifest entries pointing at nothing
    //       and every read dying on FileNotFound; FSCK drops exactly
    //       the dead entries as a normal CAS claim (serialized with
    //       writers, in DESCRIBE HISTORY). The fixture commits two
    //       batches as separate claims, physically deletes the second
    //       batch's files BEHIND the ledger's back, asserts the DRY
    //       RUN prices the damage, repairs, asserts the re-run reports
    //       a clean table, and reads the survivors back through SQL —
    //       the oracle states the first batch from raw events, so a
    //       repair that drops a healthy file (or keeps a dead one and
    //       crashes the scan) breaks the board. Cost: one existence
    //       probe per manifest entry — metadata-sized at any scale. -----
    Q("q300_sql_fsck",
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n
             |FROM events WHERE user_id < 10
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = Files.createTempDirectory("graft-sql-fsck").toString
        graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("value").cast("double").as("v"))
          .createOrReplaceTempView("fsck_src")
        runDml(s, root,
          """CREATE TABLE t AS SELECT * FROM fsck_src WHERE user_id < 10;
            |INSERT INTO t SELECT * FROM fsck_src WHERE user_id >= 10""".stripMargin)
        // files of the SECOND commit only = v2's table entries minus v1's
        val v = Manifest.snapshotVersion(root)
        val before = Manifest.manifestRows(s, root, v - 1)
          .collect { case ("t", f, _) => f }.toSet
        val doomed = Manifest.manifestRows(s, root, v)
          .collect { case ("t", f, _) if !before(f) => f }
        require(doomed.nonEmpty, "fixture must add files in commit 2")
        doomed.foreach(f => Files.delete(Paths.get(root, f)))
        val dryRep = runDml(s, root, "FSCK REPAIR TABLE t DRY RUN")
          .collect()(0)
        require(dryRep.getLong(0) == doomed.size.toLong
          && dryRep.getString(2) == "DRY RUN",
          s"dry run must price the damage, reported $dryRep")
        runDml(s, root, "FSCK REPAIR TABLE t")
        val clean = runDml(s, root, "FSCK REPAIR TABLE t").collect()(0)
        require(clean.getLong(0) == 0L,
          s"post-repair FSCK must report a clean table, got $clean")
        register(s, root, "t", "fsck_t")
        val out = runDml(s, root,
          """SELECT user_id, CAST(count(*) AS BIGINT) AS n
            |FROM fsck_t GROUP BY user_id ORDER BY user_id""".stripMargin)
          .localCheckpoint(true)
        s.catalog.dropTempView("fsck_src")
        s.catalog.dropTempView("fsck_t")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- GENERATE symlink_format_manifest (q302): the external-
    //       reader bridge (Delta's GENERATE) — engines with no
    //       manifest machinery read the exported live-file list as
    //       plain parquet. The DV hazard is the whole point: after a
    //       merge-on-read DELETE the parquet bytes still hold the
    //       deleted rows, so GENERATE must REFUSE until REORG ...
    //       APPLY (PURGE) physicalizes the DVs (asserted in-plan).
    //       The PROOF is differential: the query's output is computed
    //       by reading ONLY the files the manifest exported — the
    //       external reader's exact path, no FileIndex, no DV
    //       machinery — and the oracle states the post-delete content
    //       from raw events; a manifest that leaks a pre-purge file
    //       resurrects deleted users and breaks the hash. -----
    Q("q302_sql_generate_manifest",
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n
             |FROM events WHERE user_id < 30 AND user_id % 3 <> 0
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = Files.createTempDirectory("graft-sql-gen").toString
        graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("value").cast("double").as("v"))
          .filter(col("user_id") < 30)
          .createOrReplaceTempView("gen_src")
        runDml(s, root,
          """CREATE TABLE t AS SELECT * FROM gen_src;
            |DELETE FROM t WHERE user_id % 3 = 0""".stripMargin)
        // with live DVs the export must refuse, pointing at REORG
        val refused = scala.util.Try(
          runDml(s, root, "GENERATE symlink_format_manifest FOR TABLE t"))
        require(refused.isFailure && refused.failed.get.getMessage
          .contains("REORG"), s"DV'd export must refuse, got $refused")
        runDml(s, root, "REORG TABLE t APPLY (PURGE)")
        val rep = runDml(s, root,
          "GENERATE symlink_format_manifest FOR TABLE t").collect()(0)
        // the external reader's path: the exported list IS the table
        val listed = Files.readAllLines(
          Paths.get(root, "_symlink_format_manifest", "t", "manifest"))
        require(rep.getLong(0) == listed.size.toLong && !listed.isEmpty,
          s"export listed ${listed.size} files, reported $rep")
        val out = s.read.parquet(
            scala.jdk.CollectionConverters.ListHasAsScala(listed)
              .asScala.toSeq: _*)
          .groupBy("user_id").agg(count(lit(1)).cast("long").as("n"))
          .orderBy("user_id")
          .localCheckpoint(true)
        s.catalog.dropTempView("gen_src")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- MERGE WITH SCHEMA EVOLUTION (q303): Delta's statement
    //       shape for the merge whose SOURCE carries new columns — the
    //       widened schema registers atomically in the SAME claim as
    //       the merged data (the evolving-append discipline applied to
    //       MERGE), and files the key-bound rewrite never touched
    //       NULL-fill the new column on read. The fixture builds the
    //       target as TWO commits so the merge's stats bound leaves
    //       the first commit's file untouched — proving the read-side
    //       NULL-fill, not just the rewrite path. In-plan asserts: the
    //       PLAIN MERGE statement refuses the widened source (no
    //       silent evolution), and DESCRIBE TABLE lists the new column
    //       after. Oracle derives the restated totals + tier from raw
    //       events. -----
    Q("q303_sql_merge_evolve",
      Some("""WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
             |  FROM events WHERE user_id < 30 GROUP BY user_id)
             |SELECT user_id,
             |  CASE WHEN user_id >= 10 THEN 2 * cnt ELSE cnt END AS n,
             |  CASE WHEN user_id >= 10 THEN (CASE WHEN user_id % 2 = 0
             |    THEN 'gold' ELSE 'silver' END) END AS tier
             |FROM u ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = Files.createTempDirectory("graft-sql-mev").toString
        graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("value").cast("double").as("v"))
          .createOrReplaceTempView("mev_src")
        runDml(s, root,
          """CREATE TABLE t AS SELECT user_id,
            |  CAST(count(*) AS BIGINT) AS n FROM mev_src
            |  WHERE user_id < 10 GROUP BY user_id;
            |INSERT INTO t SELECT user_id, CAST(count(*) AS BIGINT) AS n
            |  FROM mev_src WHERE user_id BETWEEN 10 AND 19
            |  GROUP BY user_id""".stripMargin)
        val srcSql = """(SELECT user_id, CAST(2 * count(*) AS BIGINT) AS n,
          | CASE WHEN user_id % 2 = 0 THEN 'gold' ELSE 'silver' END AS tier
          | FROM mev_src WHERE user_id BETWEEN 10 AND 29
          | GROUP BY user_id) s ON t.user_id = s.user_id
          | WHEN MATCHED THEN UPDATE SET *
          | WHEN NOT MATCHED THEN INSERT *""".stripMargin.replace("\n", " ")
        // a PLAIN merge must refuse the widened source, never evolve
        // silently
        val refused = scala.util.Try(
          runDml(s, root, s"MERGE INTO t USING $srcSql"))
        require(refused.isFailure,
          "plain MERGE must refuse a source with new columns")
        runDml(s, root, s"MERGE WITH SCHEMA EVOLUTION INTO t USING $srcSql")
        val cols = runDml(s, root, "DESCRIBE TABLE t")
          .collect().map(_.getString(0)).toSet
        require(cols == Set("user_id", "n", "tier"),
          s"evolved schema must list tier, got $cols")
        register(s, root, "t", "mev_t")
        val out = runDml(s, root,
          "SELECT user_id, n, tier FROM mev_t ORDER BY user_id")
          .localCheckpoint(true)
        s.catalog.dropTempView("mev_src")
        s.catalog.dropTempView("mev_t")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- CREATE TABLE ... LIKE (q304): schema-only creation — the
    //       new table starts EMPTY with the source's registered
    //       schema; data, properties, comments, grants and constraints
    //       are NOT copied (they describe the source's content and
    //       governance, not the clone's). The fixture decorates the
    //       source with a comment first, so the oracle's empty-comment
    //       column PROVES the non-copy; the metadata COUNT answering 0
    //       without a scan is asserted in-plan. One empty registering
    //       commit — metadata-sized at any scale. -----
    Q("q304_sql_create_like",
      Some("""SELECT * FROM (VALUES
             |  ('user_id', 'bigint', true, ''),
             |  ('v', 'double', true, ''))
             |  t(col_name, data_type, nullable, comment)
             |ORDER BY col_name""".stripMargin),
      (s, dir) => {
        val root = Files.createTempDirectory("graft-sql-like").toString
        graft.Tables.load(s, dir, "events")
          .filter(col("user_id") < 20)
          .select(col("user_id"), col("value").cast("double").as("v"))
          .createOrReplaceTempView("like_src")
        runDml(s, root,
          """CREATE TABLE t AS SELECT * FROM like_src;
            |COMMENT ON COLUMN t.v IS 'source-only comment';
            |CREATE TABLE t2 LIKE t""".stripMargin)
        // the clone is empty, and metadata answers that without a scan
        val n = runDml(s, root, "SELECT count(*) AS n FROM t2")
          .collect()(0).getLong(0)
        require(n == 0L, s"LIKE clone must start empty, counted $n")
        val out = runDml(s, root, "DESCRIBE TABLE EXTENDED t2")
          .orderBy("col_name").localCheckpoint(true)
        s.catalog.dropTempView("like_src")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- SHOW CREATE TABLE (q305): the DDL round-trip every catalog
    //       serves — one canonical statement reassembled from the
    //       registered metadata: schema with per-column comments and
    //       nullability, CHECK constraints as 'constraint.<name>'
    //       properties (the Delta convention), TBLPROPERTIES sorted.
    //       The fixture registers one of each metadata kind and the
    //       oracle states the statement LITERALLY — a constraint or
    //       property that leaks out of (or into) the DDL breaks the
    //       board. Pure metadata. -----
    Q("q305_sql_show_create",
      Some("""SELECT 'CREATE TABLE t (user_id BIGINT, v DOUBLE COMMENT '
             |  || chr(39) || 'event value' || chr(39)
             |  || ') USING parquet TBLPROPERTIES ('
             |  || chr(39) || 'constraint.uid_nonneg' || chr(39)
             |  || ' = ' || chr(39) || 'user_id >= 0' || chr(39) || ', '
             |  || chr(39) || 'owner' || chr(39)
             |  || ' = ' || chr(39) || 'alice' || chr(39) || ')'
             |  AS create_stmt""".stripMargin),
      (s, dir) => {
        val root = Files.createTempDirectory("graft-sql-showcreate").toString
        graft.Tables.load(s, dir, "events")
          .filter(col("user_id") < 20)
          .select(col("user_id"), col("value").cast("double").as("v"))
          .createOrReplaceTempView("showcreate_src")
        val out = runDml(s, root,
          """CREATE TABLE t AS SELECT * FROM showcreate_src;
            |ALTER TABLE t ADD CONSTRAINT uid_nonneg CHECK (user_id >= 0);
            |ALTER TABLE t SET TBLPROPERTIES ('owner'='alice');
            |COMMENT ON COLUMN t.v IS 'event value';
            |SHOW CREATE TABLE t""".stripMargin)
          .localCheckpoint(true)
        s.catalog.dropTempView("showcreate_src")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- OPTIMIZE ... WHERE (q308): predicate-scoped compaction —
    //       the verb for "yesterday's partition fragmented": only
    //       files whose recorded stats overlap the predicate rewrite,
    //       the rest inherit BY REFERENCE. In-plan asserts pin the
    //       scale contract, not just the outcome: the scope is a
    //       proper subset of the 8 ranged files, every out-of-scope
    //       file survives under its ORIGINAL path (identity, not
    //       re-write), and the packed files re-record key stats so a
    //       post-OPTIMIZE pruned read stays pruned. Oracle = full
    //       content unchanged (compaction must move bytes, never
    //       change them). -----
    Q("q308_sql_optimize_where",
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val root = Files.createTempDirectory("graft-sql-optwhere").toString
        Manifest.commitAppendRanged(s, root, "t",
          graft.Tables.load(s, dir, "events")
            .select(col("user_id"),
              col("value").cast("decimal(18,4)").as("value")),
          "user_id", 8)
        val before = Manifest.manifestRows(s, root, 1L)
          .collect { case ("t", f, _) => f }.toSet
        // SF-proportional scope: the bottom ~45% of the key range
        // covers several of the 8 ranged files at any fixture scale
        val maxU = graft.Tables.load(s, dir, "events")
          .agg(max(col("user_id"))).head().getLong(0)
        val rep = runDml(s, root,
          s"OPTIMIZE t WHERE user_id BETWEEN 0 AND ${maxU * 45 / 100} " +
            "TARGET 134217728").collect()(0)
        val (nScope, nPacked) = (rep.getLong(1), rep.getLong(2))
        require(nScope >= 2 && nScope < 8,
          s"scope must be a proper subset of the 8 ranged files: $nScope")
        val after = Manifest.manifestRows(s, root, rep.getLong(0))
          .collect { case ("t", f, _) => f }.toSet
        // out-of-scope files inherit by reference — identical paths
        val untouched = before.intersect(after)
        require(untouched.size.toLong == 8L - nScope,
          s"expected ${8 - nScope} untouched files, got ${untouched.size}")
        require(after.size.toLong == 8L - nScope + nPacked,
          s"file algebra broken: ${after.size} after")
        // pruning power survives the rewrite: a ranged read prunes
        val (keptRows, _) = graft.ops.Manifest.overlappingRowsSpark(s, root,
          "t", Seq(Manifest.Pred("user_id", "90", "99", "bigint")),
          rep.getLong(0))
        require(keptRows.size < after.size,
          s"post-OPTIMIZE stats must still prune " +
            s"(${keptRows.size} of ${after.size})")
        register(s, root, "t", "optwhere_t")
        val out = runDml(s, root,
          """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
            |  CAST(sum(value) AS DOUBLE) AS total
            |FROM optwhere_t GROUP BY user_id ORDER BY user_id""".stripMargin)
          .localCheckpoint(true)
        s.catalog.dropTempView("optwhere_t")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- COPY INTO ... VALIDATION_MODE = 'RETURN_ERRORS' (q309):
    //       Snowflake's dry-run COPY — parse and classify the selected
    //       staged files with the ON_ERROR audit machinery (q170's
    //       branch-stable PERMISSIVE classifier) and return the
    //       per-file error report while COMMITTING NOTHING: the
    //       statement a loader runs before trusting a stage. The
    //       no-commit contract is asserted IN-PLAN (the root has no
    //       snapshot after the validation ran); the oracle states the
    //       report literally — a validation that loads, or a load
    //       report that drifts from the ON_ERROR classifier's counts,
    //       breaks the board. -----
    Q("q309_sql_copy_validate",
      Some("""SELECT file, CAST(rows_parsed AS BIGINT) AS rows_parsed,
             |  CAST(rows_loaded AS BIGINT) AS rows_loaded,
             |  CAST(errors_seen AS BIGINT) AS errors_seen
             |FROM (VALUES
             |  ('product_order_trans_dirty_a.csv', 6, 3, 3),
             |  ('product_order_trans_dirty_b.csv', 4, 3, 1)
             |) AS t(file, rows_parsed, rows_loaded, errors_seen)
             |ORDER BY file""".stripMargin),
      (s, _) => {
        val root = Files.createTempDirectory("graft-sql-validate").toString
        val stage = graft.ops.Ingest.writeDirtyStageFixtures()
        val out = runDml(s, root,
          s"""COPY INTO trans FROM '$stage'
             |  FILES = ('${graft.ops.Ingest.dirtyFileA}', '${graft.ops.Ingest.dirtyFileB}')
             |  VALIDATION_MODE = 'RETURN_ERRORS'""".stripMargin
            .replace("\n", " "))
          .orderBy("file").localCheckpoint(true)
        // the dry-run contract: NOTHING was committed
        require(Manifest.snapshotVersion(root) <= 0,
          "VALIDATION_MODE must not commit")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- LIST '<stage>' (q310): Snowflake's stage listing as
    //       statement text — the introspection half of COPY (what
    //       would I load?) and REMOVE (what would I delete?). Pure
    //       driver-side metadata: one (name, size) row per staged
    //       file, PATTERN= shares COPY's regex selection, never a byte
    //       of content read. The oracle states the dirty fixtures'
    //       exact byte sizes literally — the fixture strings are
    //       pinned in this repo, so a drifted writer (extra newline,
    //       changed header) breaks the listing, the way a stage
    //       manifest should. -----
    Q("q310_sql_list_stage",
      Some("""SELECT * FROM (VALUES
             |  ('product_order_trans_dirty_a.csv', CAST(343 AS BIGINT)),
             |  ('product_order_trans_dirty_b.csv', CAST(264 AS BIGINT)))
             |  t(name, size_bytes)
             |ORDER BY name""".stripMargin),
      (s, _) => {
        val root = Files.createTempDirectory("graft-sql-list").toString
        val stage = graft.ops.Ingest.writeDirtyStageFixtures()
        val out = runDml(s, root,
          s"LIST '$stage' PATTERN = 'product_order_trans_dirty_.*'")
          .orderBy("name").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- conditional-clause MERGE (q311): the full ANSI grammar as
    //       text — WHEN MATCHED AND s.op='D' THEN DELETE / WHEN
    //       MATCHED THEN UPDATE SET col-wise / WHEN NOT MATCHED AND c
    //       THEN INSERT (cols) VALUES (exprs) — the first statement a
    //       migrating warehouse user writes that the full-row
    //       shorthand refuses. Four outcome classes in one statement:
    //       matched+op=D deletes, matched+op=U accumulates (SET
    //       expressions against the OLD row joined to its source row),
    //       source-only op=U inserts, source-only op=D hits NO insert
    //       clause and lands nowhere. Oracle recomputes all four
    //       routes per key — a clause mis-ordered, a condition
    //       evaluated on the wrong side, or a NULL-condition row
    //       mis-routed shifts some user's state. -----
    Q("q311_sql_merge_clauses",
      Some("""WITH firsth AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv
             |  FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |    AND user_id % 5 <> 3
             |  GROUP BY user_id),
             |secondh AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv,
             |    CASE WHEN user_id % 7 = 0 THEN 'D' ELSE 'U' END AS op
             |  FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'
             |  GROUP BY user_id),
             |merged AS (
             |  SELECT f.user_id, f.n_events + s.n_events AS n_events,
             |    CAST(f.tv + s.tv AS DECIMAL(18,4)) AS tv
             |  FROM firsth f JOIN secondh s ON f.user_id = s.user_id
             |  WHERE s.op <> 'D'
             |  UNION ALL
             |  SELECT f.user_id, f.n_events, f.tv FROM firsth f
             |  WHERE NOT EXISTS (SELECT 1 FROM secondh s WHERE s.user_id = f.user_id)
             |  UNION ALL
             |  SELECT s.user_id, s.n_events, s.tv FROM secondh s
             |  WHERE s.op <> 'D'
             |    AND NOT EXISTS (SELECT 1 FROM firsth f WHERE f.user_id = s.user_id))
             |SELECT user_id, n_events, CAST(tv AS DOUBLE) AS total_v
             |FROM merged ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        def stateOf(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("user_id")
            .agg(count(lit(1)).as("n_events"),
              sum("value").cast("decimal(18,4)").as("tv"))
        val root = Files.createTempDirectory("graft-sql-mclause").toString
        Manifest.commitAppend(s, root, "user_state",
          stateOf(ev.filter(col("ts") < cut && col("user_id") % 5 =!= 3))
            .coalesce(2))
        stateOf(ev.filter(col("ts") >= cut))
          .withColumn("op",
            when(col("user_id") % 7 === 0, "D").otherwise("U"))
          .createOrReplaceTempView("merge_src_q311")
        runDml(s, root,
          """MERGE INTO user_state t USING merge_src_q311 s
            |ON t.user_id = s.user_id
            |WHEN MATCHED AND s.op = 'D' THEN DELETE
            |WHEN MATCHED THEN UPDATE SET n_events = t.n_events + s.n_events,
            |  tv = t.tv + s.tv
            |WHEN NOT MATCHED AND s.op <> 'D' THEN
            |  INSERT (user_id, n_events, tv)
            |  VALUES (s.user_id, s.n_events, s.tv)""".stripMargin)
        val out = Manifest.readTable(s, root, "user_state")
          .select(col("user_id"), col("n_events"),
            col("tv").cast("double").as("total_v"))
          .orderBy("user_id").localCheckpoint(true)
        s.catalog.dropTempView("merge_src_q311")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- column-wise MERGE with clause precedence (q312): ordered
    //       matched clauses with OVERLAPPING conditions (n % 3 = 0
    //       beats n % 2 = 0 at n ≡ 0 mod 6 — first match wins, so a
    //       clause-order bug leaves 'c0' rows with a mutated tv),
    //       alias-qualified SET left-hand sides (t.n_events = ...),
    //       a no-clause-passes row class that must survive UNCHANGED,
    //       and a partial-column INSERT whose unlisted tv NULL-fills.
    //       Oracle recomputes the per-key CASE in clause order. -----
    Q("q312_sql_merge_colwise",
      Some("""WITH firsth AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv,
             |    'old' AS status
             |  FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |    AND user_id % 5 <> 3
             |  GROUP BY user_id),
             |secondh AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv
             |  FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'
             |  GROUP BY user_id),
             |out AS (
             |  SELECT f.user_id,
             |    CASE WHEN s.n_events % 3 = 0 THEN f.n_events + s.n_events
             |         WHEN s.n_events % 2 = 0 THEN f.n_events + s.n_events
             |         ELSE f.n_events END AS n_events,
             |    CASE WHEN s.n_events % 3 = 0 THEN f.tv
             |         WHEN s.n_events % 2 = 0 THEN CAST(f.tv + s.tv AS DECIMAL(18,4))
             |         ELSE f.tv END AS tv,
             |    CASE WHEN s.n_events % 3 = 0 THEN 'c0'
             |         ELSE f.status END AS status
             |  FROM firsth f JOIN secondh s ON f.user_id = s.user_id
             |  UNION ALL
             |  SELECT f.user_id, f.n_events, f.tv, f.status FROM firsth f
             |  WHERE NOT EXISTS (SELECT 1 FROM secondh s WHERE s.user_id = f.user_id)
             |  UNION ALL
             |  SELECT s.user_id, s.n_events, CAST(NULL AS DECIMAL(18,4)), 'new'
             |  FROM secondh s
             |  WHERE NOT EXISTS (SELECT 1 FROM firsth f WHERE f.user_id = s.user_id))
             |SELECT user_id, n_events, CAST(tv AS DOUBLE) AS total_v, status
             |FROM out ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        def stateOf(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("user_id")
            .agg(count(lit(1)).as("n_events"),
              sum("value").cast("decimal(18,4)").as("tv"))
        val root = Files.createTempDirectory("graft-sql-mcolwise").toString
        Manifest.commitAppend(s, root, "user_state",
          stateOf(ev.filter(col("ts") < cut && col("user_id") % 5 =!= 3))
            .withColumn("status", lit("old")).coalesce(2))
        stateOf(ev.filter(col("ts") >= cut))
          .createOrReplaceTempView("merge_src_q312")
        runDml(s, root,
          """MERGE INTO user_state t USING merge_src_q312 s
            |ON t.user_id = s.user_id
            |WHEN MATCHED AND s.n_events % 3 = 0 THEN UPDATE SET
            |  status = 'c0', n_events = t.n_events + s.n_events
            |WHEN MATCHED AND s.n_events % 2 = 0 THEN UPDATE SET
            |  t.n_events = t.n_events + s.n_events, t.tv = t.tv + s.tv
            |WHEN NOT MATCHED THEN INSERT (user_id, n_events, status)
            |  VALUES (s.user_id, s.n_events, 'new')""".stripMargin)
        val out = Manifest.readTable(s, root, "user_state")
          .select(col("user_id"), col("n_events"),
            col("tv").cast("double").as("total_v"), col("status"))
          .orderBy("user_id").localCheckpoint(true)
        s.catalog.dropTempView("merge_src_q312")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- table_changes() as SQL text (q313): the q228 row-level
    //       change feed reached as a TABLE FUNCTION in verbatim
    //       statement text — the batch SQL consumer Delta serves with
    //       `table_changes('t', from, to)`, no Scala call sites. Same
    //       four-commit fixture (append, DV DELETE, DV UPDATE,
    //       append), same oracle recomputing every (version, change)
    //       class from the raw table: a TVF that resolved the wrong
    //       interval, dropped the pre-image deletes, or priced the
    //       update's post-image with the old value shifts the
    //       per-class sums — hash breaks. -----
    Q("q313_sql_table_changes",
      Some("""WITH ev AS (SELECT user_id, CAST(value AS DECIMAL(18,4)) AS value,
             |    CAST(ts AS TIMESTAMP) AS ts FROM events),
             |del2 AS (SELECT * FROM ev
             |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
             |    AND ts >= TIMESTAMP '2024-01-10 00:00:00'
             |    AND ts < TIMESTAMP '2024-01-12 00:00:00'),
             |upd3 AS (SELECT * FROM ev
             |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00' AND user_id = 3
             |    AND NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
             |      AND ts < TIMESTAMP '2024-01-12 00:00:00')),
             |classes AS (
             |  SELECT 1 AS v, 'insert' AS change, count(*) AS n, sum(value) AS sv
             |  FROM ev WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
             |  UNION ALL SELECT 2, 'delete', count(*), sum(value) FROM del2
             |  UNION ALL SELECT 3, 'delete', count(*), sum(value) FROM upd3
             |  UNION ALL SELECT 3, 'insert', count(*), sum(value * 2) FROM upd3
             |  UNION ALL SELECT 4, 'insert', count(*), sum(value)
             |  FROM ev WHERE ts >= TIMESTAMP '2024-01-16 00:00:00')
             |SELECT CAST(v AS BIGINT) AS v, change,
             |  CAST(n AS BIGINT) AS n, CAST(sv AS DOUBLE) AS sv
             |FROM classes ORDER BY v, change""".stripMargin),
      (s, dir) => {
        val root = Manifest.changeFeedRoot(s, dir)
        runDml(s, root,
          """SELECT _commit_version AS v, _change_type AS change,
            |  CAST(count(*) AS BIGINT) AS n,
            |  CAST(sum(value) AS DOUBLE) AS sv
            |FROM table_changes('events_log', 1, 4)
            |GROUP BY _commit_version, _change_type
            |ORDER BY v, change""".stripMargin)
      }),

    // ----- multi-verb transaction (q314): the restate-a-day pattern
    //       as ONE atomic span — `BEGIN; DELETE day; INSERT day';
    //       UPDATE audit; COMMIT` folds a DV delete, an append, and a
    //       DV update (second table) into ONE CAS claim. The query
    //       asserts single-version atomicity IN-PLAN (`adv` = versions
    //       the span advanced, oracle says 1 — a span that committed
    //       per-verb reports 3); the oracle recomputes the restated
    //       day (doubled values) + kept days per event_type and the
    //       bumped audit counter: a half-applied span (day deleted but
    //       not re-inserted, audit not bumped) shifts a branch of the
    //       union — hash breaks. Failure-invisibility and ROLLBACK
    //       no-op are DmlSpec's pins. -----
    Q("q314_sql_multiverb_txn",
      Some("""WITH f AS (SELECT event_type, CAST(value AS DECIMAL(18,4)) AS v,
             |    CAST(ts AS TIMESTAMP) AS ts FROM events
             |  WHERE user_id < 50
             |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'),
             |kept AS (SELECT event_type, v FROM f
             |  WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
             |    AND ts < TIMESTAMP '2024-01-11 00:00:00')),
             |restated AS (SELECT event_type, CAST(v * 2 AS DECIMAL(18,4)) AS v
             |  FROM f WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
             |    AND ts < TIMESTAMP '2024-01-11 00:00:00'),
             |allr AS (SELECT * FROM kept UNION ALL SELECT * FROM restated)
             |SELECT event_type AS k, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(v) AS DOUBLE) AS total, CAST(1 AS BIGINT) AS adv
             |FROM allr GROUP BY event_type
             |UNION ALL
             |SELECT 'audit:restates', 1, CAST(NULL AS DOUBLE), 1
             |ORDER BY k""".stripMargin),
      (s, dir) => {
        // user_id < 50 on BOTH sides: span machinery is what's priced
        val ev = graft.Tables.load(s, dir, "events")
          .filter(col("user_id") < 50 &&
            col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val root = Files.createTempDirectory("graft-sql-span").toString
        Manifest.commitAppend(s, root, "facts", ev.coalesce(4))
        Manifest.commitAppend(s, root, "audit", {
          import s.implicits._
          Seq(("restates", 0L)).toDF("k", "n").coalesce(1)
        })
        ev.filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
            col("ts") < lit("2024-01-11 00:00:00").cast("timestamp"))
          .createOrReplaceTempView("span_src_q314")
        val before = Manifest.snapshotVersion(root)
        runDml(s, root,
          """BEGIN;
            |DELETE FROM facts WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
            |  AND ts < TIMESTAMP '2024-01-11 00:00:00';
            |INSERT INTO facts SELECT user_id, event_type, value * 2, ts
            |  FROM span_src_q314;
            |UPDATE audit SET n = n + 1;
            |COMMIT""".stripMargin)
        val adv = Manifest.snapshotVersion(root) - before
        val facts = Manifest.readTable(s, root, "facts")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("value").cast("double").as("total"))
          .select(col("event_type").as("k"), col("n"), col("total"))
        val audit = Manifest.readTable(s, root, "audit")
          .select(concat(lit("audit:"), col("k")).as("k"), col("n"),
            lit(null).cast("double").as("total"))
        val out = facts.union(audit)
          .withColumn("adv", lit(adv))
          .orderBy("k").localCheckpoint(true)
        s.catalog.dropTempView("span_src_q314")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- ALTER COLUMN TYPE widening (q315): an id column outgrows
    //       INT mid-history — the table commits as INT32 files, widens
    //       to BIGINT as ONE metadata commit (zero data moves), then a
    //       positional INSERT lands ids beyond the int range. The
    //       oracle recomputes both eras per event_type over BIGINT
    //       arithmetic: a pre-widen file misread under the widened
    //       registration (the parquet-promotion read path), an
    //       overflowed sum, or an insert that truncated back to int
    //       all shift sum_uid — hash breaks. -----
    Q("q315_sql_alter_column_type",
      Some("""WITH pre AS (SELECT event_type, CAST(user_id AS BIGINT) AS uid,
             |    CAST(value AS DECIMAL(18,4)) AS v FROM events
             |  WHERE user_id < 50
             |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'),
             |w2 AS (SELECT event_type,
             |    CAST(user_id AS BIGINT) + 3000000000 AS uid,
             |    CAST(value AS DECIMAL(18,4)) AS v FROM events
             |  WHERE user_id < 50
             |    AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'),
             |allr AS (SELECT * FROM pre UNION ALL SELECT * FROM w2)
             |SELECT event_type AS k, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(uid) AS BIGINT) AS sum_uid,
             |  CAST(sum(v) AS DOUBLE) AS total
             |FROM allr GROUP BY event_type ORDER BY k""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .filter(col("user_id") < 50)
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("v"), col("ts"))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val root = Files.createTempDirectory("graft-sql-widen").toString
        // era 1: uid is INT32 on disk
        Manifest.commitAppend(s, root, "facts",
          ev.filter(col("ts") < cut)
            .select(col("user_id").cast("int").as("uid"),
              col("event_type"), col("v")).coalesce(2))
        runDml(s, root, "ALTER TABLE facts ALTER COLUMN uid TYPE BIGINT")
        // era 2: ids beyond the int range, positional INSERT as text
        ev.filter(col("ts") >= cut)
          .select((col("user_id").cast("long") + 3000000000L).as("uid"),
            col("event_type"), col("v"))
          .createOrReplaceTempView("widen_src_q315")
        runDml(s, root,
          "INSERT INTO facts SELECT uid, event_type, v FROM widen_src_q315")
        val out = Manifest.readTable(s, root, "facts")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("uid").as("sum_uid"),
            sum("v").cast("double").as("total"))
          .select(col("event_type").as("k"), col("n"), col("sum_uid"),
            col("total"))
          .orderBy("k").localCheckpoint(true)
        s.catalog.dropTempView("widen_src_q315")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- schema-level grants (q316): `GRANT SELECT ON SCHEMA sales
    //       TO analyst` closes every table under the `sales.` prefix
    //       with ONE statement — and a table's own grant history
    //       OVERRIDES the schema grant in both directions (the q297
    //       table-level registry wins exclusively when present). The
    //       enforcement matrix is asserted IN-PLAN: analyst reads
    //       sales.facts (schema grant) at admin's count but refuses
    //       sales.audit (table-closed to auditor only), auditor reads
    //       audit but refuses facts, intern refuses both; the output
    //       lists both registries after a vacuum to the floor, stated
    //       literally by the oracle — a schema grant the vacuum
    //       dropped, or precedence inverted, breaks the board. Pure
    //       metadata at any scale. -----
    Q("q316_sql_schema_grants",
      Some("""SELECT * FROM (VALUES
             |  ('analyst', 'SELECT', 'schema:sales'),
             |  ('auditor', 'SELECT', 'table:sales.audit'))
             |  t(role, privilege, scope)
             |ORDER BY scope, role""".stripMargin),
      (s, dir) => {
        val root = Files.createTempDirectory("graft-sql-schgrants").toString
        graft.Tables.load(s, dir, "events")
          .filter(col("user_id") < 20)
          .select(col("user_id"), col("value").cast("double").as("v"))
          .createOrReplaceTempView("schg_src")
        runDml(s, root,
          """CREATE TABLE sales.facts AS SELECT * FROM schg_src;
            |CREATE TABLE sales.audit AS SELECT * FROM schg_src;
            |GRANT SELECT ON SCHEMA sales TO analyst;
            |GRANT SELECT ON sales.audit TO auditor;
            |VACUUM RETAIN 1 VERSIONS GRACE 0""".stripMargin)
        def canRead(role: String, table: String): Boolean = {
          s.conf.set("graft.sql.role", role)
          try scala.util.Try {
            register(s, root, table, "schg_probe_v")
            s.sql("SELECT count(*) FROM schg_probe_v").collect()(0).getLong(0)
          }.isSuccess
          finally s.conf.set("graft.sql.role", "admin")
        }
        // the precedence matrix, in-plan: schema grant serves facts,
        // table grant overrides it on audit, strangers refuse all
        require(canRead("analyst", "sales.facts") &&
          !canRead("analyst", "sales.audit") &&
          canRead("auditor", "sales.audit") &&
          !canRead("auditor", "sales.facts") &&
          !canRead("intern", "sales.facts") &&
          !canRead("intern", "sales.audit") &&
          canRead("admin", "sales.facts") && canRead("admin", "sales.audit"),
          "schema-grant precedence matrix violated")
        val out = runDml(s, root, "SHOW GRANTS ON SCHEMA sales")
          .withColumn("scope", lit("schema:sales"))
          .union(runDml(s, root, "SHOW GRANTS ON sales.audit")
            .withColumn("scope", lit("table:sales.audit")))
          .orderBy("scope", "role").localCheckpoint(true)
        s.catalog.dropTempView("schg_src")
        s.catalog.dropTempView("schg_probe_v")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- join-DML statements (q319): Snowflake's `DELETE FROM t
    //       USING s WHERE ...` and `UPDATE t SET ... FROM s WHERE
    //       ...` — the two statements a warehouse migration hits
    //       right after MERGE. The delete rides the semi-join DV path
    //       (duplicate source keys HARMLESS — the delete view is
    //       deliberately self-unioned to prove it); the update IS a
    //       one-clause MERGE (old-row SET semantics, source columns
    //       in scope, dup-key refusal). Source-only rows land
    //       NOWHERE (join-DML never inserts — that's MERGE's job).
    //       Oracle recomputes the three-way route per user. -----
    Q("q319_sql_join_dml",
      Some("""WITH firsth AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv
             |  FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |    AND user_id % 5 <> 3
             |  GROUP BY user_id),
             |secondh AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv,
             |    CASE WHEN user_id % 7 = 0 THEN 'D' ELSE 'U' END AS op
             |  FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'
             |  GROUP BY user_id),
             |out AS (
             |  SELECT f.user_id,
             |    f.n_events + coalesce(s.n_events, 0) AS n_events,
             |    CAST(f.tv + coalesce(s.tv, 0) AS DECIMAL(18,4)) AS tv
             |  FROM firsth f LEFT JOIN secondh s
             |    ON f.user_id = s.user_id AND s.op = 'U'
             |  WHERE NOT EXISTS (SELECT 1 FROM secondh d
             |    WHERE d.user_id = f.user_id AND d.op = 'D'))
             |SELECT user_id, n_events, CAST(tv AS DOUBLE) AS total_v
             |FROM out ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        def stateOf(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("user_id")
            .agg(count(lit(1)).as("n_events"),
              sum("value").cast("decimal(18,4)").as("tv"))
        val root = Files.createTempDirectory("graft-sql-joindml").toString
        Manifest.commitAppend(s, root, "user_state",
          stateOf(ev.filter(col("ts") < cut && col("user_id") % 5 =!= 3))
            .coalesce(2))
        val src = stateOf(ev.filter(col("ts") >= cut))
          .withColumn("op",
            when(col("user_id") % 7 === 0, "D").otherwise("U"))
        src.createOrReplaceTempView("jdml_src")
        // duplicate keys in the delete view — must be harmless
        src.filter(col("op") === "D").unionAll(src.filter(col("op") === "D"))
          .createOrReplaceTempView("jdml_dels")
        runDml(s, root,
          """DELETE FROM user_state USING jdml_dels s
            |  WHERE user_state.user_id = s.user_id AND s.op = 'D';
            |UPDATE user_state SET n_events = user_state.n_events + s.n_events,
            |  tv = user_state.tv + s.tv
            |FROM jdml_src s
            |WHERE user_state.user_id = s.user_id AND s.op = 'U'""".stripMargin)
        val out = Manifest.readTable(s, root, "user_state")
          .select(col("user_id"), col("n_events"),
            col("tv").cast("double").as("total_v"))
          .orderBy("user_id").localCheckpoint(true)
        s.catalog.dropTempView("jdml_src")
        s.catalog.dropTempView("jdml_dels")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- multi-table INSERT (q320): Snowflake's `INSERT FIRST WHEN
    //       ... THEN INTO ... ELSE INTO ... SELECT` router — one
    //       subquery pass fans rows to N tables, FIRST-match
    //       precedence (overlapping conditions make the order
    //       semantic: value >= 100 beats value >= 0), a (cols)
    //       VALUES (exprs) branch projecting/NULL-filling, and ALL
    //       BRANCHES IN ONE CAS CLAIM (atomicity Snowflake itself
    //       does not give this statement) — asserted in-plan via the
    //       report's single version. A second ALL-mode statement
    //       proves a row CAN land in two tables when both conditions
    //       pass. Oracle recomputes every route per class. -----
    Q("q320_sql_insert_multi",
      Some("""WITH e AS (SELECT user_id, event_type,
             |    CAST(value AS DECIMAL(18,4)) AS v FROM events
             |  WHERE user_id < 50
             |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00')
             |SELECT 'big' AS t, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(v) AS DOUBLE) AS sv FROM e WHERE v >= 100
             |UNION ALL SELECT 'mid', CAST(count(*) AS BIGINT),
             |  CAST(sum(v) AS DOUBLE) FROM e WHERE v >= 0 AND v < 100
             |UNION ALL SELECT 'neg', CAST(count(*) AS BIGINT),
             |  CAST(NULL AS DOUBLE) FROM e WHERE v < 0
             |UNION ALL SELECT 'all_hot', CAST(count(*) AS BIGINT),
             |  CAST(sum(v) AS DOUBLE) FROM e WHERE user_id < 10
             |UNION ALL SELECT 'all_purchase', CAST(count(*) AS BIGINT),
             |  CAST(sum(v) AS DOUBLE) FROM e WHERE event_type = 'purchase'
             |ORDER BY t""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val ev = graft.Tables.load(s, dir, "events")
          .filter(col("user_id") < 50 &&
            col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("v"))
        val root = Files.createTempDirectory("graft-sql-insmulti").toString
        val shape = ev.limit(0)
        Seq("big", "mid", "neg", "all_hot", "all_purchase").foreach(t =>
          Manifest.commitAppend(s, root, t, shape.coalesce(1)))
        ev.createOrReplaceTempView("route_src_q320")
        val before = Manifest.snapshotVersion(root)
        // FIRST: overlapping conditions — order decides; the neg
        // branch projects (user_id) VALUES (user_id): v NULL-fills
        val rep1 = runDml(s, root,
          """INSERT FIRST
            |  WHEN v >= 100 THEN INTO big
            |  WHEN v >= 0 THEN INTO mid
            |  ELSE INTO neg (user_id) VALUES (user_id)
            |SELECT user_id, event_type, v FROM route_src_q320""".stripMargin)
        // ALL: a hot-user purchase lands in BOTH tables
        val rep2 = runDml(s, root,
          """INSERT ALL
            |  WHEN user_id < 10 THEN INTO all_hot
            |  WHEN event_type = 'purchase' THEN INTO all_purchase
            |SELECT user_id, event_type, v FROM route_src_q320""".stripMargin)
        // one claim per statement — the report's version column is
        // constant within each
        require(rep1.select(countDistinct(col("version"))).head().getLong(0) == 1L
          && rep2.select(countDistinct(col("version"))).head().getLong(0) == 1L
          && Manifest.snapshotVersion(root) == before + 2,
          "multi-table INSERT must land as one claim per statement")
        val out = Seq("big", "mid", "neg", "all_hot", "all_purchase").map { t =>
          Manifest.readTable(s, root, t)
            .agg(count(lit(1)).as("n"), sum("v").cast("double").as("sv"))
            .select(lit(t).as("t"), col("n"), col("sv"))
        }.reduce(_ unionByName _).orderBy("t").localCheckpoint(true)
        s.catalog.dropTempView("route_src_q320")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- transform-on-load COPY (q321): Snowflake's `COPY INTO t
    //       FROM (SELECT $1, CAST(...), ... FROM '<stage>')` —
    //       reshape during the load instead of staging twice: casts,
    //       a derived column ($4 * $5), a function (upper), a
    //       constant batch tag, and dropped columns, with $N the
    //       N-th staged field AS TEXT and NULL_IF applied before any
    //       cast sees a sentinel. FULLY differential oracle: DuckDB
    //       re-reads the same staged file all-varchar and applies the
    //       same transforms — a projection bound to the wrong
    //       position, a cast applied before NULL_IF, or a dropped
    //       header row shifts the hash. -----
    Q("q321_sql_copy_transform",
      Some {
        val f = graft.ops.Ingest.stagedFileName(graft.ops.Ingest.backfillStart)
        s"""SELECT CAST(trans_id AS BIGINT) AS trans_id,
           |  CAST(CAST(quantity AS INT) * CAST(unit_price AS DOUBLE)
           |    AS DOUBLE) AS gross,
           |  upper(currency) AS currency_uc,
           |  'b-2022-07' AS batch
           |FROM read_csv('${graft.ops.Ingest.stageDir}/$f',
           |  header=true, delim=',', quote='"', escape='"',
           |  nullstr=['NULL', 'null', ''], all_varchar=true)
           |ORDER BY trans_id""".stripMargin
      },
      (s, _) => {
        import s.implicits._
        val stage = graft.ops.Ingest.writeStageFixtures()
        val f = graft.ops.Ingest.stagedFileName(graft.ops.Ingest.backfillStart)
        val root = Files.createTempDirectory("graft-sql-copy-xform").toString
        // the transform target must pre-exist (Snowflake's contract —
        // a typo'd COPY must not auto-create a mistyped table)
        Manifest.commitAppend(s, root, "trans_gross",
          Seq.empty[(Long, Double, String, String)]
            .toDF("trans_id", "gross", "currency_uc", "batch").coalesce(1))
        runDml(s, root,
          s"""COPY INTO trans_gross FROM (
             |  SELECT CAST($$1 AS BIGINT),
             |    CAST($$4 AS INT) * CAST($$5 AS DOUBLE),
             |    upper($$6), 'b-2022-07'
             |  FROM '$stage')
             |FILES = ('$f')
             |FILE_FORMAT = (TYPE = CSV FIELD_DELIMITER = ','
             |  SKIP_HEADER = 1 FIELD_OPTIONALLY_ENCLOSED_BY = '"'
             |  ESCAPE_UNENCLOSED_FIELD = NONE RECORD_DELIMITER = '\\n'
             |  NULL_IF = ('NULL', 'null', '') EMPTY_FIELD_AS_NULL = TRUE)"""
            .stripMargin)
        val out = Manifest.readTable(s, root, "trans_gross")
          .select(col("trans_id"), col("gross").cast("double").as("gross"),
            col("currency_uc"), col("batch"))
          .orderBy("trans_id").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- composite-key clause MERGE (q323): `ON t.a = s.a AND
    //       t.b = s.b` — the first statement a migrating user writes
    //       after the single-key one works (real warehouse tables key
    //       on (tenant, entity) or (date, id)). The table keys on
    //       (user_id, event_type): the SAME user_id appears under five
    //       event types, so a key bug that matches on user_id alone
    //       (or prunes on one column's bounds as a row filter)
    //       corrupts four siblings per hit. Four outcome classes:
    //       matched & s.n_events >= 4 accumulates, matched otherwise
    //       deletes, source-only & s.tv > 150 inserts, source-only
    //       otherwise lands NOWHERE (all four verified non-empty at
    //       sf0.01: 545/55/127/23). Oracle recomputes every class per
    //       composite key. -----
    Q("q323_sql_merge_composite_key",
      Some("""WITH firsth AS (
             |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv
             |  FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |    AND user_id % 5 <> 3
             |  GROUP BY 1, 2),
             |secondh AS (
             |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv
             |  FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'
             |  GROUP BY 1, 2),
             |merged AS (
             |  SELECT f.user_id, f.event_type,
             |    f.n_events + s.n_events AS n_events,
             |    CAST(f.tv + s.tv AS DECIMAL(18,4)) AS tv
             |  FROM firsth f JOIN secondh s
             |    ON f.user_id = s.user_id AND f.event_type = s.event_type
             |  WHERE s.n_events >= 4
             |  UNION ALL
             |  SELECT f.user_id, f.event_type, f.n_events, f.tv FROM firsth f
             |  WHERE NOT EXISTS (SELECT 1 FROM secondh s
             |    WHERE s.user_id = f.user_id AND s.event_type = f.event_type)
             |  UNION ALL
             |  SELECT s.user_id, s.event_type, s.n_events, s.tv FROM secondh s
             |  WHERE s.tv > 150 AND NOT EXISTS (SELECT 1 FROM firsth f
             |    WHERE f.user_id = s.user_id AND f.event_type = s.event_type))
             |SELECT user_id, event_type, n_events, CAST(tv AS DOUBLE) AS total_v
             |FROM merged ORDER BY user_id, event_type""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        def stateOf(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("user_id", "event_type")
            .agg(count(lit(1)).as("n_events"),
              sum("value").cast("decimal(18,4)").as("tv"))
        val root = Files.createTempDirectory("graft-sql-mergeck").toString
        Manifest.commitAppend(s, root, "pair_state",
          stateOf(ev.filter(col("ts") < cut && col("user_id") % 5 =!= 3))
            .coalesce(2))
        stateOf(ev.filter(col("ts") >= cut))
          .createOrReplaceTempView("merge_src_q323")
        runDml(s, root,
          """MERGE INTO pair_state t USING merge_src_q323 s
            |ON t.user_id = s.user_id AND t.event_type = s.event_type
            |WHEN MATCHED AND s.n_events >= 4 THEN
            |  UPDATE SET n_events = t.n_events + s.n_events, tv = t.tv + s.tv
            |WHEN MATCHED THEN DELETE
            |WHEN NOT MATCHED AND s.tv > 150 THEN
            |  INSERT (user_id, event_type, n_events, tv)
            |  VALUES (s.user_id, s.event_type, s.n_events, s.tv)""".stripMargin)
        val out = Manifest.readTable(s, root, "pair_state")
          .select(col("user_id"), col("event_type"), col("n_events"),
            col("tv").cast("double").as("total_v"))
          .orderBy("user_id", "event_type").localCheckpoint(true)
        s.catalog.dropTempView("merge_src_q323")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- composite-key join-DML (q324): `DELETE ... USING` and
    //       `UPDATE ... FROM` with TWO `t.k = s.k` equi-conjuncts in
    //       WHERE — the join-DML counterpart of q323. The delete's op
    //       flag depends on BOTH key columns ('D' only for user_id %
    //       7 = 0 AND event_type <> 'purchase'), so a single-column
    //       key bug erases a surviving sibling row (the same user's
    //       purchase state) and shifts the hash; the update
    //       accumulates per composite pair through the one-clause
    //       MERGE path (dup-pair refusal, old-row SET semantics).
    //       Oracle recomputes the three-way route per pair. -----
    Q("q324_sql_join_dml_composite",
      Some("""WITH firsth AS (
             |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv
             |  FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |    AND user_id % 5 <> 3
             |  GROUP BY 1, 2),
             |secondh AS (
             |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv,
             |    CASE WHEN user_id % 7 = 0 AND event_type <> 'purchase'
             |      THEN 'D' ELSE 'U' END AS op
             |  FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'
             |  GROUP BY 1, 2),
             |out AS (
             |  SELECT f.user_id, f.event_type,
             |    f.n_events + coalesce(s.n_events, 0) AS n_events,
             |    CAST(f.tv + coalesce(s.tv, 0) AS DECIMAL(18,4)) AS tv
             |  FROM firsth f LEFT JOIN secondh s
             |    ON f.user_id = s.user_id AND f.event_type = s.event_type
             |      AND s.op = 'U'
             |  WHERE NOT EXISTS (SELECT 1 FROM secondh d
             |    WHERE d.user_id = f.user_id AND d.event_type = f.event_type
             |      AND d.op = 'D'))
             |SELECT user_id, event_type, n_events, CAST(tv AS DOUBLE) AS total_v
             |FROM out ORDER BY user_id, event_type""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        def stateOf(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("user_id", "event_type")
            .agg(count(lit(1)).as("n_events"),
              sum("value").cast("decimal(18,4)").as("tv"))
        val root = Files.createTempDirectory("graft-sql-joindml2").toString
        Manifest.commitAppend(s, root, "pair_state",
          stateOf(ev.filter(col("ts") < cut && col("user_id") % 5 =!= 3))
            .coalesce(2))
        val src = stateOf(ev.filter(col("ts") >= cut))
          .withColumn("op",
            when(col("user_id") % 7 === 0 && col("event_type") =!= "purchase",
              "D").otherwise("U"))
        src.createOrReplaceTempView("jdml2_src")
        runDml(s, root,
          """DELETE FROM pair_state USING jdml2_src s
            |  WHERE pair_state.user_id = s.user_id
            |    AND pair_state.event_type = s.event_type AND s.op = 'D';
            |UPDATE pair_state
            |  SET n_events = pair_state.n_events + s.n_events,
            |      tv = pair_state.tv + s.tv
            |FROM jdml2_src s
            |WHERE pair_state.user_id = s.user_id
            |  AND pair_state.event_type = s.event_type AND s.op = 'U'""".stripMargin)
        val out = Manifest.readTable(s, root, "pair_state")
          .select(col("user_id"), col("event_type"), col("n_events"),
            col("tv").cast("double").as("total_v"))
          .orderBy("user_id", "event_type").localCheckpoint(true)
        s.catalog.dropTempView("jdml2_src")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- MERGE inside BEGIN...COMMIT (q325): the restate-plus-
    //       reconcile transaction — `BEGIN; DELETE day; MERGE
    //       corrections; INSERT audit; COMMIT` — lands as ONE claim:
    //       the day restatement, the clause MERGE's DV sidecars + new
    //       images (update/delete/insert/no-clause row classes, the
    //       q311 grammar), and the audit row can never be observed
    //       apart. Atomicity asserted IN-PLAN: the span report's
    //       version equals the single version the root advanced by.
    //       Oracle recomputes the post-span state of BOTH tables per
    //       user — a MERGE that committed separately from the DELETE
    //       would still hash right, which is why the version assert
    //       is in the plan and the row content is in the oracle. -----
    Q("q325_sql_txn_merge_span",
      Some("""WITH firsth AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv
             |  FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |    AND user_id % 5 <> 3
             |  GROUP BY user_id),
             |secondh AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv,
             |    CASE WHEN user_id % 7 = 0 THEN 'D' ELSE 'U' END AS op
             |  FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'
             |  GROUP BY user_id),
             |merged AS (
             |  SELECT f.user_id, f.n_events + s.n_events AS n_events,
             |    CAST(f.tv + s.tv AS DECIMAL(18,4)) AS tv
             |  FROM firsth f JOIN secondh s ON f.user_id = s.user_id
             |  WHERE s.op <> 'D'
             |  UNION ALL
             |  SELECT f.user_id, f.n_events, f.tv FROM firsth f
             |  WHERE NOT EXISTS (SELECT 1 FROM secondh s WHERE s.user_id = f.user_id)
             |  UNION ALL
             |  SELECT s.user_id, s.n_events, s.tv FROM secondh s
             |  WHERE s.op <> 'D'
             |    AND NOT EXISTS (SELECT 1 FROM firsth f WHERE f.user_id = s.user_id)),
             |surviving AS (
             |  SELECT user_id, CAST(count(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE))
             |    AS BIGINT) AS n_day_rows
             |  FROM events
             |  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |    AND CAST(CAST(ts AS TIMESTAMP) AS DATE) <> DATE '2024-01-10'
             |  GROUP BY user_id)
             |SELECT m.user_id, m.n_events, CAST(m.tv AS DOUBLE) AS total_v,
             |  CAST(coalesce(s.n_day_rows, 0) AS BIGINT) AS n_day_rows
             |FROM merged m LEFT JOIN surviving s ON m.user_id = s.user_id
             |ORDER BY m.user_id""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        def stateOf(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("user_id")
            .agg(count(lit(1)).as("n_events"),
              sum("value").cast("decimal(18,4)").as("tv"))
        val root = Files.createTempDirectory("graft-sql-mergespan").toString
        Manifest.commitAppend(s, root, "day_facts",
          ev.filter(col("ts") < cut)
            .groupBy(col("user_id"), to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("n")).coalesce(2))
        Manifest.commitAppend(s, root, "user_state",
          stateOf(ev.filter(col("ts") < cut && col("user_id") % 5 =!= 3))
            .coalesce(2))
        Manifest.commitAppend(s, root, "audit_log",
          Seq((0L, "boot")).toDF("span_id", "note").coalesce(1))
        stateOf(ev.filter(col("ts") >= cut))
          .withColumn("op",
            when(col("user_id") % 7 === 0, "D").otherwise("U"))
          .createOrReplaceTempView("span_merge_src_q325")
        val v0 = Manifest.snapshotVersion(root)
        val rep = runDml(s, root,
          """BEGIN;
            |DELETE FROM day_facts WHERE day = DATE '2024-01-10';
            |MERGE INTO user_state t USING span_merge_src_q325 s
            |ON t.user_id = s.user_id
            |WHEN MATCHED AND s.op = 'D' THEN DELETE
            |WHEN MATCHED THEN UPDATE SET n_events = t.n_events + s.n_events,
            |  tv = t.tv + s.tv
            |WHEN NOT MATCHED AND s.op <> 'D' THEN
            |  INSERT (user_id, n_events, tv)
            |  VALUES (s.user_id, s.n_events, s.tv);
            |INSERT INTO audit_log SELECT 1, 'reconciled';
            |COMMIT""".stripMargin).collect()(0)
        // single-version atomicity, in-plan: the whole span is ONE
        // claim, and the pre-span snapshot still time-travels
        require(rep.getLong(0) == v0 + 1 &&
          Manifest.snapshotVersion(root) == v0 + 1 &&
          Manifest.readTable(s, root, "audit_log").count() == 2L &&
          Manifest.readTable(s, root, "day_facts", v0).count() >
            Manifest.readTable(s, root, "day_facts").count(),
          "span must land as exactly one claim with the pre-span " +
            "snapshot intact")
        val dayCnt = Manifest.readTable(s, root, "day_facts")
          .groupBy("user_id").agg(count(lit(1)).as("n_day_rows"))
        val out = Manifest.readTable(s, root, "user_state")
          .join(dayCnt, Seq("user_id"), "left")
          .select(col("user_id"), col("n_events"),
            col("tv").cast("double").as("total_v"),
            coalesce(col("n_day_rows"), lit(0L)).as("n_day_rows"))
          .orderBy("user_id").localCheckpoint(true)
        s.catalog.dropTempView("span_merge_src_q325")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- ADD COLUMN ... DEFAULT (q326): the remaining evolution
    //       verb warehouses ship — pre-evolution rows SERVE the
    //       registered default (per-file footer branching, never
    //       `coalesce` — a post-evolution row that stored NULL must
    //       stay NULL), and a positional INSERT omitting the trailing
    //       column fills it with the default. Three row eras in one
    //       table: era-1 (before the column existed → 'USD'), era-2
    //       full-arity inserts (explicit 'EUR' / explicit NULL), and
    //       an era-2 positional insert (omitted → 'USD'). Oracle
    //       recomputes every era's currency; a NULL-fill read of
    //       era-1, a coalesce rewrite of era-2's NULLs, or a
    //       mis-filled positional insert each shift the hash. -----
    Q("q326_sql_add_column_default",
      Some("""WITH e AS (SELECT user_id, CAST(value AS DECIMAL(18,4)) AS v,
             |    CAST(ts AS TIMESTAMP) AS ts FROM events),
             |f AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(v) AS DECIMAL(18,4)) AS tv
             |  FROM e WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
             |s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(v) AS DECIMAL(18,4)) AS tv
             |  FROM e WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1)
             |SELECT user_id, n_events, CAST(tv AS DOUBLE) AS total_v,
             |  'USD' AS currency FROM f
             |UNION ALL
             |SELECT user_id + 200000, n_events, CAST(tv AS DOUBLE),
             |  CASE WHEN user_id % 3 = 0 THEN NULL ELSE 'EUR' END FROM s
             |UNION ALL
             |SELECT user_id + 100000, n_events, CAST(tv AS DOUBLE), 'USD'
             |FROM s WHERE user_id % 5 = 0
             |ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        def stateOf(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("user_id")
            .agg(count(lit(1)).as("n_events"),
              sum("value").cast("decimal(18,4)").as("tv"))
        val root = Files.createTempDirectory("graft-sql-adddefault").toString
        // era 1: the column does not exist yet
        Manifest.commitAppend(s, root, "costs",
          stateOf(ev.filter(col("ts") < cut)).coalesce(2))
        stateOf(ev.filter(col("ts") >= cut))
          .createOrReplaceTempView("add_default_src_q326")
        runDml(s, root,
          """ALTER TABLE costs ADD COLUMN currency STRING DEFAULT 'USD';
            |INSERT INTO costs SELECT user_id + 200000, n_events, tv,
            |  CASE WHEN user_id % 3 = 0 THEN CAST(NULL AS STRING)
            |    ELSE 'EUR' END FROM add_default_src_q326;
            |INSERT INTO costs SELECT user_id + 100000, n_events, tv
            |FROM add_default_src_q326 WHERE user_id % 5 = 0""".stripMargin)
        val out = Manifest.readTable(s, root, "costs")
          .select(col("user_id"), col("n_events"),
            col("tv").cast("double").as("total_v"), col("currency"))
          .orderBy("user_id").localCheckpoint(true)
        s.catalog.dropTempView("add_default_src_q326")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- CREATE STREAM ... ON TABLE (q327): the named change-feed
    //       object a statement-submitting scheduler reaches for —
    //       `CREATE STREAM s ON TABLE t` registers a cursor, `SELECT
    //       ... FROM s` reads the pending interval WITHOUT consuming,
    //       and `INSERT ... SELECT ... FROM s` lands the rows AND the
    //       advanced cursor in ONE claim, so a re-driven statement
    //       quiesces (NOOP, no new version) instead of double-
    //       applying — asserted in-plan across TWO consumption
    //       rounds + one re-drive. Oracle: the two consumed intervals
    //       union to exactly the post-creation data, so the final
    //       per-user rollup equals a plain aggregate of it — an
    //       offset that re-served round 1's rows in round 2 (or
    //       skipped a commit) shifts every affected user's sum. -----
    Q("q327_sql_named_stream",
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
             |    AS DOUBLE) AS total_v
             |FROM events
             |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val cut2 = lit("2024-01-23 00:00:00").cast("timestamp")
        val root = Files.createTempDirectory("graft-sql-stream").toString
        Manifest.commitAppend(s, root, "events_log",
          ev.filter(col("ts") < cut).coalesce(2))
        Manifest.commitAppend(s, root, "user_deltas",
          ev.groupBy("user_id")
            .agg(count(lit(1)).as("n_events"),
              sum("value").cast("decimal(18,4)").as("tv"))
            .limit(0).coalesce(1))
        runDml(s, root, "CREATE STREAM ev_stream ON TABLE events_log")
        val consume =
          """INSERT INTO user_deltas
            |SELECT user_id, count(*), CAST(sum(value) AS DECIMAL(18,4))
            |FROM ev_stream WHERE _change_type = 'insert'
            |GROUP BY user_id""".stripMargin
        // round 1: commit the mid-month batch, consume it
        Manifest.commitAppend(s, root, "events_log",
          ev.filter(col("ts") >= cut && col("ts") < cut2).coalesce(2))
        val r1 = runDml(s, root, consume).collect()(0)
        // re-drive: the cursor advanced with round 1's own commit —
        // the stream is EMPTY, no version mints, nothing double-lands
        val vAfter1 = Manifest.snapshotVersion(root)
        val re = runDml(s, root, consume).collect()(0)
        // round 2: a later batch consumes incrementally (never re-
        // serving round 1's interval)
        Manifest.commitAppend(s, root, "events_log",
          ev.filter(col("ts") >= cut2).coalesce(2))
        val r2 = runDml(s, root, consume).collect()(0)
        require(r1.getString(4) == "APPLIED" && re.getString(4) == "NOOP" &&
          r2.getString(4) == "APPLIED" &&
          Manifest.snapshotVersion(root) > vAfter1 &&
          r2.getLong(2) >= r1.getLong(3),
          s"stream consumption must advance exactly once per interval " +
            s"(r1=$r1, re=$re, r2=$r2)")
        val out = Manifest.readTable(s, root, "user_deltas")
          .groupBy("user_id")
          .agg(sum("n_events").cast("bigint").as("n_events"),
            sum("tv").cast("decimal(18,4)").cast("double").as("total_v"))
          .orderBy("user_id").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- named TASK objects (q330): the reference's entire
    //       operating model — an Airflow DAG submitting one statement
    //       per node — as warehouse objects: `CREATE TASK t [AFTER
    //       dep] AS <statement>` registers the node, AFTER edges form
    //       the graph, `EXECUTE TASK root` runs the node and its
    //       DESCENDANTS in dependency order (BFS levels, name-sorted
    //       fan-out — the load→{audit, daily} diamond every ETL
    //       ships). Order is asserted in-plan from the run report
    //       (positions 1/2/3) plus the audit row equaling the loaded
    //       count — a fan-out task running BEFORE its dependency
    //       would audit an empty table. Oracle recomputes the daily
    //       rollup straight from events. -----
    Q("q330_sql_tasks",
      Some("""SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"),
            col("value").cast("decimal(18,4)").as("v"),
            to_date(col("ts")).as("day"))
        val root = Files.createTempDirectory("graft-sql-tasks").toString
        Manifest.commitAppend(s, root, "fact", ev.limit(0).coalesce(1))
        Manifest.commitAppend(s, root, "daily",
          ev.groupBy("day").agg(count(lit(1)).as("n_events"),
            sum("v").cast("decimal(18,4)").as("tv")).limit(0).coalesce(1))
        Manifest.commitAppend(s, root, "audit",
          Seq.empty[Long].toDF("n_loaded").coalesce(1))
        ev.createOrReplaceTempView("task_src_q330")
        register(s, root, "fact", "fact_live_q330") // live view: sees t_load's commit
        runDml(s, root,
          """CREATE TASK t_load AS INSERT INTO fact
            |  SELECT user_id, v, day FROM task_src_q330;
            |CREATE TASK t_daily AFTER t_load AS INSERT INTO daily
            |  SELECT day, count(*), CAST(sum(v) AS DECIMAL(18,4))
            |  FROM fact_live_q330 GROUP BY day;
            |CREATE TASK t_audit AFTER t_load AS INSERT INTO audit
            |  SELECT count(*) FROM fact_live_q330""".stripMargin)
        val rep = runDml(s, root, "EXECUTE TASK t_load").collect()
          .map(r => (r.getString(0), r.getInt(1))).toSeq
        val nEv = ev.count()
        val audited = Manifest.readTable(s, root, "audit").head().getLong(0)
        require(rep == Seq(("t_load", 1), ("t_audit", 2), ("t_daily", 3)) &&
          audited == nEv,
          s"task graph must run load -> {audit, daily} in order " +
            s"(got $rep, audited $audited of $nEv)")
        val out = Manifest.readTable(s, root, "daily")
          .select(col("day"), col("n_events"),
            col("tv").cast("double").as("total_v"))
          .orderBy("day").localCheckpoint(true)
        s.catalog.dropTempView("task_src_q330")
        s.catalog.dropTempView("fact_live_q330")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- ALTER TABLE ... SWAP WITH (q331): Snowflake's blue-green
    //       publish — rebuild the corrected table under a staging
    //       name, swap atomically: ONE claim re-keys both tables'
    //       rows BY REFERENCE (zero data moved) and swaps the
    //       per-table metadata registry (the CHECK constraint and the
    //       quality-tier property travel WITH their content — the
    //       rename-pair semantics), tombstoning one-sided entries.
    //       In-plan asserts pin the single version, the staging side
    //       now holding the OLD content, the metadata having moved,
    //       and the pre-swap snapshot time-traveling. Oracle
    //       recomputes the published (full-corpus) rollup — a swap
    //       that copied instead of re-keyed would still hash right,
    //       which is why the version count and both directions are
    //       asserted in-plan. -----
    Q("q331_sql_swap_tables",
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        def stateOf(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("user_id")
            .agg(count(lit(1)).as("n_events"),
              sum("value").cast("decimal(18,4)").as("tv"))
        val root = Files.createTempDirectory("graft-sql-swap").toString
        // live = the stale first half; staging = the corrected rebuild
        Manifest.commitAppend(s, root, "costs",
          stateOf(ev.filter(col("ts") < cut)).coalesce(2))
        Manifest.commitAppend(s, root, "costs_staging",
          stateOf(ev).coalesce(2))
        runDml(s, root,
          "ALTER TABLE costs ADD CONSTRAINT pos CHECK (n_events > 0)")
        Manifest.setTableProperties(s, root, "costs",
          Map("quality.tier" -> "gold"))
        val nOld = Manifest.readTable(s, root, "costs").count()
        val nNew = Manifest.readTable(s, root, "costs_staging").count()
        val v0 = Manifest.snapshotVersion(root)
        runDml(s, root, "ALTER TABLE costs SWAP WITH costs_staging")
        require(Manifest.snapshotVersion(root) == v0 + 1 &&
          Manifest.readTable(s, root, "costs").count() == nNew &&
          Manifest.readTable(s, root, "costs_staging").count() == nOld &&
          Manifest.readTable(s, root, "costs", v0).count() == nOld &&
          Manifest.checkConstraints(root, "costs_staging").contains("pos") &&
          !Manifest.checkConstraints(root, "costs").contains("pos") &&
          Manifest.tableProperties(root, "costs_staging")
            .get("quality.tier").contains("gold") &&
          !Manifest.tableProperties(root, "costs").contains("quality.tier"),
          "SWAP WITH must exchange rows AND metadata in one claim, " +
            "time-travelably")
        val out = Manifest.readTable(s, root, "costs")
          .select(col("user_id"), col("n_events"),
            col("tv").cast("double").as("total_v"))
          .orderBy("user_id").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- MATERIALIZED VIEW statements (q332): CREATE / REFRESH /
    //       DROP as verbatim text over the row-level IVM machinery —
    //       the counting algorithm (insert +1, delete −1, empty
    //       groups drop) that stays INCREMENTAL through the DV
    //       DELETE where file-granular refresh would rescan the
    //       source. Three refresh classes asserted in-plan:
    //       bootstrap, incremental-through-append, incremental-
    //       through-merge-on-read-DELETE, then a re-drive NOOP.
    //       Oracle recomputes the view over exactly the SURVIVING
    //       rows — a delete the view absorbed wrong (or a replayed
    //       interval) shifts some user's sum. -----
    Q("q332_sql_materialized_view",
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events WHERE user_id % 7 <> 0
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"),
            col("value").cast("decimal(18,4)").as("v"), col("ts"))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val root = Files.createTempDirectory("graft-sql-mview").toString
        Manifest.commitAppend(s, root, "events_log",
          ev.filter(col("ts") < cut).coalesce(2))
        runDml(s, root,
          """CREATE MATERIALIZED VIEW user_mv AS
            |SELECT user_id, SUM(v) AS total_v, COUNT(*) AS n_events
            |FROM events_log GROUP BY user_id""".stripMargin)
        def refresh() = runDml(s, root,
          "REFRESH MATERIALIZED VIEW user_mv").collect()(0).getString(3)
        val boot = refresh()
        Manifest.commitAppend(s, root, "events_log",
          ev.filter(col("ts") >= cut).coalesce(2))
        val inc = refresh()
        // merge-on-read DELETE: the IVM path absorbs it incrementally
        runDml(s, root, "DELETE FROM events_log WHERE user_id % 7 = 0")
        val del = refresh()
        val re = refresh()
        require(boot == "REFRESHED" && inc == "REFRESHED" &&
          del == "REFRESHED" && re == "NOOP",
          s"refresh classes must be bootstrap/incremental/delete/noop " +
            s"(got $boot/$inc/$del/$re)")
        // the content serves the DECLARED aliases — `SUM(v) AS
        // total_v` stores total_v, not an internal name
        val out = Manifest.readTable(s, root, "user_mv")
          .select(col("user_id"), col("n_events").cast("bigint").as("n_events"),
            col("total_v").cast("double").as("total_v"))
          .orderBy("user_id").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- COPY INTO ... MATCH_BY_COLUMN_NAME (q333): the Snowflake
    //       option a reordered-or-widened stage needs — each staged
    //       file reads HEADER-DRIVEN and aligns to the target BY
    //       NAME, per file: the two fixture files disagree on column
    //       order AND case, one carries an extra column (dropped),
    //       the target carries a column neither file has
    //       (NULL-fills), and a NULL sentinel normalizes before the
    //       DOUBLE cast sees it. A positional read of file B would
    //       load currencies into trans_id — the differential oracle
    //       re-reads both files header-driven in DuckDB, so exactly
    //       that bug breaks the hash. -----
    Q("q333_sql_copy_match_by_name",
      Some {
        val d = graft.ops.Ingest.stageDir
        s"""SELECT * FROM (
           |  SELECT CAST(trans_id AS BIGINT) AS trans_id,
           |    CAST(amount AS DOUBLE) AS amount, currency,
           |    CAST(NULL AS VARCHAR) AS batch_tag
           |  FROM read_csv('$d/graft_mbn_a.csv', header=true,
           |    all_varchar=true, nullstr=['NULL', ''])
           |  UNION ALL
           |  SELECT CAST(TRANS_ID AS BIGINT),
           |    CAST(Amount AS DOUBLE), CURRENCY, CAST(NULL AS VARCHAR)
           |  FROM read_csv('$d/graft_mbn_b.csv', header=true,
           |    all_varchar=true, nullstr=['NULL', '']))
           |ORDER BY trans_id""".stripMargin
      },
      (s, _) => {
        import s.implicits._
        val stage = graft.ops.Ingest.writeMbnStageFixtures()
        val root = Files.createTempDirectory("graft-sql-mbn").toString
        Manifest.commitAppend(s, root, "mbn_target",
          Seq.empty[(Long, Double, String, String)]
            .toDF("trans_id", "amount", "currency", "batch_tag").coalesce(1))
        val rep = runDml(s, root,
          s"""COPY INTO mbn_target FROM '$stage'
             |FILES = ('graft_mbn_a.csv', 'graft_mbn_b.csv')
             |MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE
             |FILE_FORMAT = (TYPE = CSV FIELD_DELIMITER = ','
             |  NULL_IF = ('NULL', ''))""".stripMargin).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        require(rep == Map("graft_mbn_a.csv" -> 2L, "graft_mbn_b.csv" -> 2L),
          s"per-file load report must count both files (got $rep)")
        val out = Manifest.readTable(s, root, "mbn_target")
          .orderBy("trans_id").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- AT (TIMESTAMP => ...) on a PROMOTED REPLICA (q338):
    //       commit wall-time rides INSIDE each claim (`_ts`), so
    //       replication ships the SOURCE's history clock and the
    //       replica resolves the same instants the source would —
    //       the DR drill an mtime-based clock fails (every shipped
    //       claim would read "copy o'clock" and a mid-history probe
    //       would grab the wrong version). Fixture: bootstrap
    //       replicate at era-1, incremental sync after era-2, probe
    //       the REPLICA at the source's era-1 instant with the
    //       Snowflake AT (TIMESTAMP => ...) spelling; in-plan asserts
    //       pin clock preservation verbatim and pre-history refusal.
    //       Oracle recomputes era-1's per-user window from raw
    //       events — a probe resolving era-2 (clock lost) doubles
    //       some user's counts. -----
    Q("q338_sql_at_timestamp_replica",
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events
             |WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val tmp = Files.createTempDirectory("graft-sql-atreplica")
        val src = s"$tmp/src"; val dst = s"$tmp/dst"
        Manifest.commitAppend(s, src, "events_log",
          ev.filter(col("ts") < cut).coalesce(2))
        Manifest.replicateSnapshot(s, src, dst) // bootstrap at era-1's instant
        Thread.sleep(20) // distinct wall-clock instants across the eras
        Manifest.commitAppend(s, src, "events_log",
          ev.filter(col("ts") >= cut).coalesce(2))
        Manifest.replicateSnapshot(s, src, dst) // sync carries era-2's instant
        val t1 = Manifest.commitTimeMs(src, 1L)
        require(Manifest.commitTimeMs(dst, 1L) == t1 &&
          Manifest.commitTimeMs(dst, 2L) == Manifest.commitTimeMs(src, 2L),
          "replica lost the source's commit clock")
        // an instant before the source's first commit refuses loudly
        val early = intercept0(Manifest.versionAsOf(dst, t1 - 10000L))
        require(early, "pre-history instant must refuse")
        // probe the replica AT the source's era-1 instant
        val instant = java.time.Instant.ofEpochMilli(t1)
          .atZone(Manifest.sessionZone(s)).toLocalDateTime
          .format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss.SSS", java.util.Locale.ROOT))
        val out = runDml(s, dst,
          s"""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(value) AS DOUBLE) AS total_v
             |FROM events_log AT (TIMESTAMP => '$instant')
             |GROUP BY user_id ORDER BY user_id""".stripMargin)
          .localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(tmp)
        out
      }),

    // ----- SCD TYPE 2 over a COMPOSITE key (q339): the q282 history
    //       mirror keyed (user_id, event_type) — netting, the per-key
    //       timeline, open-row closes, and the merge identity all run
    //       per COMPLETE pair; the interval changes ONLY ('click',
    //       user%3) pairs and deletes ONLY ('view', user%5) pairs, so
    //       a keying bug that matches on user_id alone closes or
    //       rewrites a sibling pair's history. Oracle derives each
    //       pair's expected (n_rows, has_open, cur_tv) from raw
    //       events with the same scoping — a cross-pair interference
    //       shifts some sibling's triple and breaks the hash. -----
    Q("q339_sql_scd2_composite_key",
      Some("""WITH u1 AS (SELECT user_id, event_type,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv
             |  FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-11 00:00:00'
             |  GROUP BY user_id, event_type),
             |u2 AS (SELECT user_id, event_type,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS tv
             |  FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-11 00:00:00'
             |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-21 00:00:00'
             |    AND event_type = 'click' AND user_id % 3 = 0
             |  GROUP BY user_id, event_type)
             |SELECT user_id, event_type,
             |  CAST(CASE WHEN u1.n IS NOT NULL AND u2.n IS NOT NULL
             |    AND (u1.n <> u2.n OR u1.tv <> u2.tv) THEN 2 ELSE 1 END AS BIGINT) AS n_rows,
             |  CAST(CASE WHEN user_id % 5 = 0 AND event_type = 'view'
             |    THEN 0 ELSE 1 END AS BIGINT) AS has_open,
             |  CAST(CASE WHEN user_id % 5 = 0 AND event_type = 'view' THEN -1
             |    ELSE CAST(coalesce(u2.tv, u1.tv) AS DOUBLE) END AS DOUBLE) AS cur_tv
             |FROM u1 FULL OUTER JOIN u2 USING (user_id, event_type)
             |ORDER BY user_id, event_type""".stripMargin),
      (s, dir) => {
        val root = sqlScd2CompositeRoot(s, dir)
        val re = runDml(s, root,
          "APPLY CHANGES INTO dst.acct_hist FROM src.acct " +
            "KEYS (user_id, event_type) STORED AS SCD TYPE 2").collect()(0)
        require(re.getString(2) == "NOOP",
          s"re-driven composite SCD2 must be a NOOP, reported $re")
        register(s, s"$root/dst", "acct_hist", "scd2ck_sql_hist")
        val out = runDml(s, s"$root/dst",
          """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_rows,
            |  CAST(max(CASE WHEN __end_v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS has_open,
            |  coalesce(CAST(max(CASE WHEN __end_v IS NULL THEN tv END) AS DOUBLE), -1.0D) AS cur_tv
            |FROM scd2ck_sql_hist GROUP BY user_id, event_type
            |ORDER BY user_id, event_type""".stripMargin)
          .localCheckpoint(true)
        s.catalog.dropTempView("scd2ck_sql_hist")
        out
      }),

    // ----- CREATE TASK ... SCHEDULE = '<cron>' (q340): the last
    //       orchestration-surface asymmetry — the reference's DAGs
    //       are literally cron-driven, so the task OBJECT must carry
    //       the cron text: SCHEDULE registers in the `_task_` marker
    //       (shape-validated at CREATE — a typo'd schedule dies at
    //       registration, not by silently never firing), SHOW TASKS
    //       serves it, EXECUTE TASK stays manual (schedule EXECUTION
    //       is out-of-engine per SURVEY §2.1 O7 — the reference's own
    //       split). In-plan asserts pin the SHOW TASKS graph
    //       (schedule on the root, AFTER edges on the children),
    //       bad-cron refusal, SCHEDULE+AFTER mutual exclusion, and
    //       the diamond's execution order. Oracle recomputes the
    //       per-type rollup the graph materializes. -----
    Q("q340_sql_task_schedule",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("event_type"),
            col("value").cast("decimal(18,4)").as("v"))
        val root = Files.createTempDirectory("graft-sql-tasksched").toString
        Manifest.commitAppend(s, root, "fact", ev.limit(0).coalesce(1))
        Manifest.commitAppend(s, root, "bytype",
          ev.groupBy("event_type").agg(count(lit(1)).as("n_events"),
            sum("v").cast("decimal(18,4)").as("tv")).limit(0).coalesce(1))
        Manifest.commitAppend(s, root, "audit",
          Seq.empty[Long].toDF("n_loaded").coalesce(1))
        ev.createOrReplaceTempView("task_src_q340")
        register(s, root, "fact", "fact_live_q340")
        runDml(s, root,
          """CREATE TASK t_ing SCHEDULE = '7 3 * * *' AS INSERT INTO fact
            |  SELECT event_type, v FROM task_src_q340;
            |CREATE TASK t_by AFTER t_ing AS INSERT INTO bytype
            |  SELECT event_type, count(*), CAST(sum(v) AS DECIMAL(18,4))
            |  FROM fact_live_q340 GROUP BY event_type;
            |CREATE TASK t_cnt AFTER t_ing AS INSERT INTO audit
            |  SELECT count(*) FROM fact_live_q340""".stripMargin)
        // SHOW TASKS serves the registered graph: cron on the root,
        // AFTER edges (and no cron) on the children
        val shown = runDml(s, root, "SHOW TASKS").collect()
          .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
        require(shown == Map(
          "t_ing" -> ("" -> "7 3 * * *"),
          "t_by" -> ("t_ing" -> ""), "t_cnt" -> ("t_ing" -> "")),
          s"SHOW TASKS must serve the scheduled diamond (got $shown)")
        // CREATE-time refusals: malformed cron, SCHEDULE+AFTER combo
        require(intercept0(runDml(s, root,
          "CREATE TASK t_bad SCHEDULE = '7 3 * *' AS SELECT 1")),
          "a 4-field cron must refuse at CREATE")
        require(intercept0(runDml(s, root,
          "CREATE TASK t_bad SCHEDULE = 'every 5 minutes' AS SELECT 1")),
          "a non-cron schedule must refuse at CREATE")
        require(intercept0(runDml(s, root,
          "CREATE TASK t_bad SCHEDULE = '7 3 * * *' AFTER t_ing AS SELECT 1")),
          "SCHEDULE and AFTER together must refuse")
        // execution stays manual and respects the AFTER order
        val rep = runDml(s, root, "EXECUTE TASK t_ing").collect()
          .map(r => (r.getString(0), r.getInt(1))).toSeq
        val audited = Manifest.readTable(s, root, "audit").head().getLong(0)
        require(rep == Seq(("t_ing", 1), ("t_by", 2), ("t_cnt", 3)) &&
          audited == ev.count(),
          s"scheduled diamond must execute ing -> {by, cnt} (got $rep)")
        val out = Manifest.readTable(s, root, "bytype")
          .select(col("event_type"), col("n_events"),
            col("tv").cast("double").as("total_v"))
          .orderBy("event_type").localCheckpoint(true)
        s.catalog.dropTempView("task_src_q340")
        s.catalog.dropTempView("fact_live_q340")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- APPEND_ONLY streams (q341): the ingest-pipeline default
    //       stream mode — reads serve ONLY appended rows and a
    //       rewrite interval (DV UPDATE + DV DELETE here) SKIPS
    //       (cursor still advances) instead of feeding deletes or
    //       update post-images downstream. The timeline plants the
    //       exact bug the oracle catches: a consumer that filtered
    //       the FULL feed to inserts would ingest the UPDATE's
    //       post-image (+100) rows — in-plan asserts pin that the
    //       full feed carries them (insert count > appended count,
    //       delete rows flagged) while the append-only feed is
    //       exactly the appended set, Snowflake's appended-then-
    //       deleted rows included. Consumption lands the rows and
    //       advances the cursor in one claim; the re-drive NOOPs.
    //       Oracle: the whole corpus at ORIGINAL values. -----
    Q("q341_sql_append_only_stream",
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val root = Files.createTempDirectory("graft-sql-aostream").toString
        Manifest.commitAppend(s, root, "events_log", ev.limit(0).coalesce(1))
        runDml(s, root,
          """CREATE STREAM s_ao ON TABLE events_log APPEND_ONLY = TRUE;
            |CREATE STREAM s_full ON TABLE events_log""".stripMargin)
        Manifest.commitAppend(s, root, "events_log",
          ev.filter(col("ts") < cut).coalesce(2))
        runDml(s, root,
          "UPDATE events_log SET value = value + 100 WHERE user_id % 7 = 3")
        runDml(s, root, "DELETE FROM events_log WHERE user_id % 7 = 5")
        Manifest.commitAppend(s, root, "events_log",
          ev.filter(col("ts") >= cut).coalesce(2))
        val nAppended = ev.count()
        // the FULL feed flags the rewrite interval (delete rows) and
        // carries the update post-images; the APPEND_ONLY feed is
        // exactly the appended set
        val fullByType = runDml(s, root,
          "SELECT _change_type, count(*) AS n FROM s_full GROUP BY _change_type")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        require(fullByType.getOrElse("delete", 0L) > 0L,
          "full-feed stream must flag the rewrite interval's deletes")
        require(fullByType.getOrElse("insert", 0L) > nAppended,
          "full feed must carry update post-images append-only skips")
        val aoCnt = runDml(s, root, "SELECT count(*) AS n FROM s_ao")
          .collect()(0).getLong(0)
        require(aoCnt == nAppended,
          s"append-only must serve exactly the appended rows " +
            s"(got $aoCnt, want $nAppended)")
        val modes = runDml(s, root, "SHOW STREAMS").collect()
          .map(r => r.getString(0) -> r.getString(3)).toMap
        require(modes == Map("s_ao" -> "APPEND_ONLY", "s_full" -> "DEFAULT"),
          s"SHOW STREAMS must serve the mode (got $modes)")
        // consume-on-commit + re-drive quiesce
        Manifest.commitAppend(s, root, "tgt",
          ev.select("user_id", "value").limit(0).coalesce(1))
        val rep = runDml(s, root,
          "INSERT INTO tgt SELECT user_id, value FROM s_ao").collect()(0)
        require(rep.getString(4) == "APPLIED" && rep.getLong(1) == nAppended,
          s"append-only consumption must land the appended set (got $rep)")
        val re = runDml(s, root,
          "INSERT INTO tgt SELECT user_id, value FROM s_ao").collect()(0)
        require(re.getString(4) == "NOOP",
          s"re-driven append-only consumption must NOOP (got $re)")
        val out = Manifest.readTable(s, root, "tgt")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum("value").cast("double").as("total_v"))
          .orderBy("user_id").localCheckpoint(true)
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      }),

    // ----- session variables in scripts (q342): the engine analogue
    //       of the reference's Jinja parameterization — `SET v =
    //       <literal>` scopes to ONE script invocation, `$v`
    //       substitutes quote-aware into every later statement (a
    //       `$v` inside a string literal is DATA — the oracle itself
    //       pins it: the output carries a literal '$cut' column), an
    //       undefined reference refuses loudly, and the scope DIES at
    //       script end (asserted in-plan: the same reference refuses
    //       in the next invocation). The variable VALUES steer the
    //       data (uid floor, era cut), so a substitution bug shifts
    //       the oracle hash, not just an error message. -----
    Q("q342_sql_session_variables",
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_v,
             |  '$cut' AS tag
             |FROM events WHERE user_id >= 7
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("user_id"),
            col("value").cast("decimal(18,4)").as("value"), col("ts"))
        val root = Files.createTempDirectory("graft-sql-sessvars").toString
        ev.createOrReplaceTempView("ev_q342")
        // two variables parameterize a 3-statement script: the cut
        // instant (string) and the uid floor (number)
        runDml(s, root,
          """SET cut = '2024-01-16 00:00:00';
            |SET uid_floor = 7;
            |CREATE TABLE hi AS SELECT user_id, value FROM ev_q342
            |  WHERE ts < TIMESTAMP $cut AND user_id >= $uid_floor;
            |INSERT INTO hi SELECT user_id, value FROM ev_q342
            |  WHERE ts >= TIMESTAMP $cut AND user_id >= $uid_floor""".stripMargin)
        // scope DIED at script end: the same reference now refuses
        require(intercept0(runDml(s, root,
          "SELECT count(*) AS n FROM ev_q342 WHERE user_id >= $uid_floor")),
          "a session variable must not outlive its script")
        // quote immunity: with the var re-defined, a QUOTED '$cut' is
        // still data — it flows into the output column the oracle pins
        register(s, root, "hi", "hi_q342")
        val out = runDml(s, root,
          """SET cut = 'would-corrupt-the-tag-if-substituted';
            |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
            |  CAST(sum(value) AS DOUBLE) AS total_v, '$cut' AS tag
            |FROM hi_q342 GROUP BY user_id ORDER BY user_id""".stripMargin)
          .localCheckpoint(true)
        s.catalog.dropTempView("ev_q342")
        s.catalog.dropTempView("hi_q342")
        graft.ops.Staging.deleteRecursively(Paths.get(root))
        out
      })
  )

  /** True when `body` throws IllegalArgumentException — an inline
    * refusal probe for query fixtures (spec interceptors are not in
    * scope in src/main). */
  private def intercept0(body: => Any): Boolean =
    try { val _ = body; false }
    catch { case _: IllegalArgumentException => true }

  /** q281's root: the q236 CDC-mirror fixture driven ENTIRELY by
    * statement text — source commits land under `src/` exactly as in
    * [[Manifest.applyChangesRoot]], and every sync (bootstrap,
    * incremental, re-drive) is the verbatim APPLY CHANGES statement.
    * Staging asserts each drive's own report, then REORG-purges the
    * sync's deletion vectors so the mirror is SQL-FileIndex-readable. */
  def sqlApplyRoot(s: SparkSession, dir: String): String = {
    val fp = graft.ops.Staging.fingerprintOf(dir, Seq("events"))
    graft.ops.Staging.ensure(
      s"target/graft-sql-apply/$fp-${Manifest.layoutKey}") { tmp =>
      val src = s"$tmp/src"
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("value").cast("decimal(18,4)").as("value"),
          col("ts"))
      val cutTs = lit(graft.ops.Cdc.versionCut).cast("timestamp")
      def totals(df: DataFrame) = df.groupBy("user_id")
        .agg(sum("value").as("total_u"), count(lit(1)).as("n_u"))
      Manifest.commitAppendStats(s, src, "user_totals",
        totals(ev.filter(col("ts") < cutTs)), Seq("user_id"), "user_id", 4)
      val stmt =
        "APPLY CHANGES INTO dst.user_totals FROM src.user_totals KEYS (user_id)"
      val boot = runDml(s, tmp, stmt).collect()(0)
      require(boot.getString(2) == "APPLIED" && boot.getLong(0) > 0,
        s"staging bug: bootstrap reported $boot")
      val _ = Manifest.commitMergeUpsert(s, src, "user_totals",
        totals(ev).filter(col("user_id").between(2, 5)), "user_id")
      val _2 = Manifest.commitDeleteVectors(s, src, "user_totals",
        col("user_id").between(7, 9))
      val inc = runDml(s, tmp, stmt).collect()(0)
      require(inc.getLong(0) > 0 && inc.getLong(1) > 0,
        s"staging bug: incremental sync should net upserts AND deletes, got $inc")
      val re = runDml(s, tmp, stmt).collect()(0)
      require(re.getString(2) == "NOOP", s"staging bug: re-drive reported $re")
      val _3 = runDml(s, s"$tmp/dst", "REORG TABLE user_totals APPLY (PURGE)")
    }
  }

  /** q282's root: the q264 SCD2 fixture with every sync driven by the
    * verbatim `... STORED AS SCD TYPE 2` statement (reports asserted:
    * bootstrap opened intervals, the incremental opened AND closed,
    * the re-drive was NOOP). The SCD2 mirror is merge-only (no DVs),
    * so it is SQL-readable as committed. */
  def sqlScd2Root(s: SparkSession, dir: String): String = {
    val fp = graft.ops.Staging.fingerprintOf(dir, Seq("events"))
    graft.ops.Staging.ensure(
      s"target/graft-sql-scd2/$fp-${Manifest.layoutKey}") { tmp =>
      val src = s"$tmp/src"
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("value").cast("decimal(18,4)").as("value"),
          col("ts"))
      val a = lit("2024-01-11 00:00:00").cast("timestamp")
      val b = lit("2024-01-21 00:00:00").cast("timestamp")
      def st(df: DataFrame) = df.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value").cast("decimal(18,4)").as("tv"))
      Manifest.commitAppendStats(s, src, "acct", st(ev.filter(col("ts") < a)),
        Seq("user_id"), "user_id", 4)
      val stmt = "APPLY CHANGES INTO dst.acct_hist FROM src.acct " +
        "KEYS (user_id) STORED AS SCD TYPE 2"
      val boot = runDml(s, tmp, stmt).collect()(0)
      require(boot.getString(2) == "APPLIED" && boot.getLong(0) > 0,
        s"staging bug: scd2 bootstrap reported $boot")
      val _ = Manifest.commitMergeUpsert(s, src, "acct",
        st(ev.filter(col("ts") >= a && col("ts") < b &&
          col("user_id") % 3 === 0)), "user_id")
      val _2 = Manifest.commitDeleteVectors(s, src, "acct",
        col("user_id") % 5 === 0)
      val inc = runDml(s, tmp, stmt).collect()(0)
      require(inc.getLong(0) > 0 && inc.getLong(1) > 0,
        s"staging bug: scd2 incremental should open AND close intervals, got $inc")
      val re = runDml(s, tmp, stmt).collect()(0)
      require(re.getString(2) == "NOOP",
        s"staging bug: scd2 re-drive reported $re")
    }
  }

  /** q339's root: the SCD2 fixture raised to a COMPOSITE key — the
    * source is keyed (user_id, event_type), the incremental interval
    * changes ONLY the 'click' rows of user_id%3 users and DV-deletes
    * ONLY the 'view' rows of user_id%5 users, so any keying bug that
    * matches on one column alone closes or rewrites a SIBLING pair's
    * history (same user, other event_type) and the oracle hash
    * breaks. Reports asserted per drive: bootstrap opened, the
    * incremental opened AND closed, the re-drive NOOP'd. */
  def sqlScd2CompositeRoot(s: SparkSession, dir: String): String = {
    val fp = graft.ops.Staging.fingerprintOf(dir, Seq("events"))
    graft.ops.Staging.ensure(
      s"target/graft-sql-scd2ck/$fp-${Manifest.layoutKey}") { tmp =>
      val src = s"$tmp/src"
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val a = lit("2024-01-11 00:00:00").cast("timestamp")
      val b = lit("2024-01-21 00:00:00").cast("timestamp")
      def st(df: DataFrame) = df.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"), sum("value").cast("decimal(18,4)").as("tv"))
      Manifest.commitAppendStats(s, src, "acct",
        st(ev.filter(col("ts") < a)), Seq("user_id"), "user_id", 4)
      val stmt = "APPLY CHANGES INTO dst.acct_hist FROM src.acct " +
        "KEYS (user_id, event_type) STORED AS SCD TYPE 2"
      val boot = runDml(s, tmp, stmt).collect()(0)
      require(boot.getString(2) == "APPLIED" && boot.getLong(0) > 0,
        s"staging bug: composite scd2 bootstrap reported $boot")
      val _ = Manifest.commitMergeUpsert(s, src, "acct",
        st(ev.filter(col("ts") >= a && col("ts") < b &&
          col("user_id") % 3 === 0 && col("event_type") === "click")),
        Seq("user_id", "event_type"), maxRetries = 5, txn = None,
        allowEvolution = false)
      val _2 = Manifest.commitDeleteVectors(s, src, "acct",
        col("user_id") % 5 === 0 && col("event_type") === "view")
      val inc = runDml(s, tmp, stmt).collect()(0)
      require(inc.getLong(0) > 0 && inc.getLong(1) > 0,
        s"staging bug: composite scd2 incremental should open AND close, got $inc")
      val re = runDml(s, tmp, stmt).collect()(0)
      require(re.getString(2) == "NOOP",
        s"staging bug: composite scd2 re-drive reported $re")
    }
  }

  /** q225's null-stats root: three stats commits of `events` slices
    * with engineered NULL structure in `value` — days <10 all-NULL,
    * days 10–20 null-free, days ≥20 nulled for user_id%3=0 — so the
    * recorded `__nc_<col>`/`__nrows` counts give IS [NOT] NULL real
    * files to prune (and value predicates skip the all-null files via
    * the recorded null bounds). */
  def nullStatsRoot(s: SparkSession, dir: String): String = {
    val fp = graft.ops.Staging.fingerprintOf(dir, Seq("events"))
    graft.ops.Staging.ensure(
      s"target/graft-manifest-nullstats/$fp-${Manifest.layoutKey}") { tmp =>
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val d10 = col("ts") < lit("2024-01-10 00:00:00").cast("timestamp")
      val d20 = col("ts") < lit("2024-01-20 00:00:00").cast("timestamp")
      Manifest.commitAppendStats(s, tmp, "events_nulls",
        ev.filter(d10).withColumn("value",
          lit(null).cast("decimal(18,4)")), Seq("ts", "value"), "ts", 2)
      Manifest.commitAppendStats(s, tmp, "events_nulls",
        ev.filter(!d10 && d20), Seq("ts", "value"), "ts", 2)
      Manifest.commitAppendStats(s, tmp, "events_nulls",
        ev.filter(!d20).withColumn("value",
          when(col("user_id") % 3 === 0, lit(null).cast("decimal(18,4)"))
            .otherwise(col("value"))), Seq("ts", "value"), "ts", 2)
    }
  }

  /** q239's SQL constraint-lifecycle root: CTAS the pre-cut slice,
    * ADD CONSTRAINT, a passing INSERT (post-cut), a violating INSERT
    * rejected with nothing visible, DROP CONSTRAINT, then the
    * sentinel negative row lands. */
  def sqlChecksRoot(s: SparkSession, dir: String): String = {
    val fp = graft.ops.Staging.fingerprintOf(dir, Seq("events"))
    graft.ops.Staging.ensure(
      s"target/graft-manifest-sqlchecks/$fp-${Manifest.layoutKey}") { tmp =>
      graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("value").cast("decimal(18,4)").as("value"),
          col("ts"))
        .createOrReplaceTempView("events_raw_sqlchecks")
      runDml(s, tmp,
        """CREATE TABLE evsql AS
          |  SELECT user_id, value AS v FROM events_raw_sqlchecks
          |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00';
          |ALTER TABLE evsql ADD CONSTRAINT nonneg CHECK (v >= 0);
          |INSERT INTO evsql
          |  SELECT user_id, value AS v FROM events_raw_sqlchecks
          |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'""".stripMargin)
      val before = Manifest.snapshotVersion(tmp)
      val refused =
        try { runDml(s, tmp,
          "INSERT INTO evsql VALUES (9998L, -5.0D)"); false }
        catch { case e: IllegalArgumentException =>
          require(e.getMessage.contains("CHECK"), e.getMessage); true }
      require(refused, "staging bug: violating INSERT was accepted")
      require(Manifest.snapshotVersion(tmp) == before,
        "staging bug: violating INSERT advanced the version")
      runDml(s, tmp,
        """ALTER TABLE evsql DROP CONSTRAINT nonneg;
          |INSERT INTO evsql VALUES (9999L, -1.0D)""".stripMargin)
    }
  }

  /** q233's CTAS root: `CREATE TABLE ... AS SELECT` (pre-cut totals)
    * then `INSERT INTO ... SELECT` (post-cut totals under shifted
    * ids), both as one verbatim SQL script; the builder asserts a
    * re-CTAS refuses. */
  def ctasRoot(s: SparkSession, dir: String): String = {
    val fp = graft.ops.Staging.fingerprintOf(dir, Seq("events"))
    graft.ops.Staging.ensure(
      s"target/graft-manifest-ctas/$fp-${Manifest.layoutKey}") { tmp =>
      graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("value").cast("decimal(18,4)").as("value"),
          col("ts"))
        .createOrReplaceTempView("events_raw_ctas")
      runDml(s, tmp,
        """CREATE TABLE user_totals_sql AS
          |  SELECT user_id, CAST(sum(value) AS DOUBLE) AS total_u
          |  FROM events_raw_ctas
          |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY user_id;
          |INSERT INTO user_totals_sql
          |  SELECT user_id + 1000 AS user_id, CAST(sum(value) AS DOUBLE) AS total_u
          |  FROM events_raw_ctas
          |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY user_id""".stripMargin)
      val refused =
        try { runDml(s, tmp,
          "CREATE TABLE user_totals_sql AS SELECT 1 AS x"); false }
        catch { case _: IllegalArgumentException => true }
      require(refused, "staging bug: re-CTAS silently replaced the table")
    }
  }

  /** q223's MERGE-via-SQL root: pre-cut per-user totals appended with
    * user_id stats, then the users-2–5 full-window recomputation
    * upserted by ONE verbatim `MERGE INTO ... USING (subquery)`
    * statement through [[runDml]]. */
  def mergeSqlRoot(s: SparkSession, dir: String): String = {
    val fp = graft.ops.Staging.fingerprintOf(dir, Seq("events"))
    graft.ops.Staging.ensure(
      s"target/graft-manifest-mergesql/$fp-${Manifest.layoutKey}") { tmp =>
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("value").cast("decimal(18,4)").as("value"),
          col("ts"))
      val cutTs = lit(graft.ops.Cdc.versionCut).cast("timestamp")
      val pre = ev.filter(col("ts") < cutTs).groupBy("user_id")
        .agg(sum("value").as("total_u"), count(lit(1)).as("n_u"))
      Manifest.commitAppendStats(s, tmp, "user_totals", pre,
        Seq("user_id"), "user_id", 8)
      ev.createOrReplaceTempView("events_raw_mergesql")
      runDml(s, tmp,
        """MERGE INTO user_totals USING (
          |  SELECT user_id, sum(value) AS total_u, count(1) AS n_u
          |  FROM events_raw_mergesql
          |  WHERE user_id BETWEEN 2 AND 5 GROUP BY user_id) AS s
          |ON user_totals.user_id = s.user_id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
  }

  /** q219's DML root: 8 ts-ranged files, then a DELETE and an UPDATE
    * submitted as one verbatim SQL script through [[runDml]] — both
    * land as merge-on-read commits (the staging asserts the original
    * file set survived untouched). */
  def dmlRoot(s: SparkSession, dir: String): String = {
    val fp = graft.ops.Staging.fingerprintOf(dir, Seq("events"))
    graft.ops.Staging.ensure(
      s"target/graft-manifest-dml/$fp-${Manifest.layoutKey}") { tmp =>
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      Manifest.commitAppendRanged(s, tmp, "events_log", ev, "ts", 8)
      val original = Manifest.manifestRows(s, tmp, Manifest.snapshotVersion(tmp))
        .collect { case (_, f, _) => f }.toSet
      runDml(s, tmp,
        """DELETE FROM events_log
          |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
          |  AND ts < TIMESTAMP '2024-01-13 00:00:00';
          |UPDATE events_log SET value = -value WHERE user_id = 3""".stripMargin)
      val after = Manifest.manifestRows(s, tmp, Manifest.snapshotVersion(tmp))
        .collect { case (_, f, _) => f }.toSet
      require(original.subsetOf(after),
        "staging bug: SQL DML rewrote original files instead of merge-on-read")
    }
  }

  /** q245/q246/q248's maintenance root: two right-sized ranged files
    * (v1), 14 single-file daily trickle commits (v2–v15), then
    * `OPTIMIZE events_log MIN <thr> TARGET <max>` through the SQL
    * TEXT path (v16) — the staging asserts the statement's own 16→3
    * report, so the packed shape the queries assume is proven at
    * build time. VACUUM stays QUERY-time (dry run mutates nothing, so
    * the query is idempotent across bench passes). */
  def sqlMaintRoot(s: SparkSession, dir: String): String = {
    val fp = graft.ops.Staging.fingerprintOf(dir, Seq("events"))
    graft.ops.Staging.ensure(
      s"target/graft-manifest-sqlmaint/$fp-${Manifest.layoutKey}") { tmp =>
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      val cutTs = lit(graft.ops.Cdc.versionCut).cast("timestamp")
      Manifest.commitAppendRanged(s, tmp, "events_log",
        ev.filter(col("ts") < cutTs), "ts", 2)
      val days = 16 to 29
      days.foreach { d =>
        val lo = lit(f"2024-01-$d%02d 00:00:00").cast("timestamp")
        val slice =
          if (d == days.last) ev.filter(col("ts") >= lo)
          else ev.filter(col("ts") >= lo &&
            col("ts") < lit(f"2024-01-${d + 1}%02d 00:00:00").cast("timestamp"))
        Manifest.commitAppendRanged(s, tmp, "events_log", slice, "ts", 1)
      }
      val sizes = Manifest
        .manifestRows(s, tmp, Manifest.snapshotVersion(tmp))
        .collect { case (_, f, _) => f -> Files.size(Paths.get(tmp, f)) }
        .toMap
      require(sizes.size == 16,
        s"staging bug: expected 16 files, got ${sizes.size}")
      val byCommit = sizes.keys.groupBy(f => f.split('/')(1)) // data/vN/...
      val bigs = byCommit("v1").map(sizes)
      val smalls = (sizes.keySet -- byCommit("v1")).map(sizes)
      require(smalls.max < bigs.min,
        s"staging bug: size populations overlap (${smalls.max} vs ${bigs.min})")
      val rep = runDml(s, tmp,
        s"OPTIMIZE events_log MIN ${bigs.min} TARGET ${1L << 30}")
        .collect()(0)
      require(rep.getLong(1) == 16L && rep.getLong(2) == 3L,
        s"staging bug: OPTIMIZE reported $rep, expected 16 -> 3")
    }
  }

  /** q253's Z-order-rewrite root: a RANGE-laid table (8 ts-ranged
    * files — only the leading dimension prunes) rewritten onto the
    * Morton curve by `OPTIMIZE events_log ZORDER BY (ts, user_id)
    * SPLIT 16` as statement text. Staging asserts the statement's
    * 8→16 report and that EVERY rewritten file records bounds for
    * BOTH dimensions — the property the trailing-column pruning
    * stands on. */
  /** q272's 3-dim Z-order root: events range-laid on ts, then
    * `OPTIMIZE ... ZORDER BY (ts, user_id, value)` as verbatim text —
    * staging pins the 8→27 report and ALL THREE dimensions' bounds on
    * every rewritten file. */
  def sqlZorder3Root(s: SparkSession, dir: String): String = {
    val fp = graft.ops.Staging.fingerprintOf(dir, Seq("events"))
    // -eqd: the relayout algorithm changed to equi-depth grids; the
    // extra token retires fixtures laid out by the min-max grid
    graft.ops.Staging.ensure(
      s"target/graft-manifest-sqlzorder3/$fp-${Manifest.layoutKey}-eqd") { tmp =>
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      Manifest.commitAppendRanged(s, tmp, "events3", ev, "ts", 8)
      val rep = runDml(s, tmp,
        "OPTIMIZE events3 ZORDER BY (ts, user_id, value) SPLIT 27")
        .collect()(0)
      require(rep.getLong(1) == 8L && rep.getLong(2) == 27L,
        s"staging bug: 3-D ZORDER reported $rep, expected 8 -> 27")
      val rows = Manifest.manifestRows(s, tmp, Manifest.snapshotVersion(tmp))
      require(rows.forall { case (_, _, st) =>
        val m = Manifest.parseStatsJson(st)
        m.contains("ts") && m.contains("user_id") && m.contains("value")
      }, "staging bug: a rewritten file is missing a dimension's bounds")
    }
  }

  def sqlZorderRoot(s: SparkSession, dir: String): String = {
    val fp = graft.ops.Staging.fingerprintOf(dir, Seq("events"))
    // -eqd: same re-key as sqlZorder3Root — the relayout algorithm
    // changed to equi-depth grids, and a fixture staged under the old
    // min-max grid would keep serving a layout the pruning claims
    // (q253, DmlSpec) no longer describe
    graft.ops.Staging.ensure(
      s"target/graft-manifest-sqlzorder/$fp-${Manifest.layoutKey}-eqd") { tmp =>
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,4)").as("value"), col("ts"))
      Manifest.commitAppendRanged(s, tmp, "events_log", ev, "ts", 8)
      val rep = runDml(s, tmp,
        "OPTIMIZE events_log ZORDER BY (ts, user_id) SPLIT 16")
        .collect()(0)
      require(rep.getLong(1) == 8L && rep.getLong(2) == 16L,
        s"staging bug: ZORDER reported $rep, expected 8 -> 16")
      val rows = Manifest.manifestRows(s, tmp, Manifest.snapshotVersion(tmp))
      require(rows.forall { case (_, _, st) =>
        val m = Manifest.parseStatsJson(st)
        m.contains("ts") && m.contains("user_id")
      }, "staging bug: a rewritten file is missing a dimension's bounds")
    }
  }
}

/** Data-skipping [[FileIndex]] over a manifest file list: `listFiles`
  * keeps only the files whose recorded per-column [min, max] MAY
  * satisfy every pushed data filter. Evaluation is conservative
  * three-valued: an unsupported predicate shape, a column without
  * stats, or an unparseable bound keeps the file. Files whose bound
  * is a recorded NULL (no non-null rows) are excluded by value
  * predicates — exact, they hold nothing to match. Driver-side cost
  * is |files|; no filesystem listing ever happens (the manifest IS
  * the listing).
  */
object ManifestFileIndex {
  /** One snapshot's entries for `table`: manifest rows → (path, size,
    * mtime, decoded stats). Metadata-sized. */
  private[sources] def resolveEntries(spark: SparkSession, root: String,
                                      table: String, v: Long): Seq[ManifestSql.Entry] =
    Manifest.manifestRows(spark, root, v)
      .collect { case (t, f, st) if t == table => (s"$root/$f", st) }
      .map { case (p, st) =>
        val stats = Manifest.parseStatsJson(st)
        // The plain-file scan below cannot apply merge-on-read deletes;
        // serving a DV'd file here would RESURRECT deleted rows through
        // the SQL surface — refuse loudly (compact first, or read via
        // Manifest.readTable, which is DV-aware)
        require(!stats.contains("__dv"),
          s"table $table@v$v carries deletion vectors: not readable through " +
            "the SQL FileIndex — compact the table or use Manifest.readTable")
        val np = Paths.get(p)
        ManifestSql.Entry(p, Files.size(np),
          Files.getLastModifiedTime(np).toMillis, stats)
      }
}

final class ManifestFileIndex(
    spark: SparkSession,
    rootStr: String,
    table: String,
    pinnedVersion: Long, // > 0 = time travel; -1 = LIVE (track commits)
    schema: StructType,
    zone: ZoneId,
    initial: Option[(Long, Seq[ManifestSql.Entry])] = None) extends FileIndex {

  /** (kept, total) of the most recent `listFiles` — the observability
    * hook PlanShapeSpec asserts pruning through. */
  @volatile var lastPrune: (Int, Int) = (-1, -1)

  // A LIVE view (pinnedVersion = -1) re-resolves the manifest whenever
  // the snapshot version moved — each new QUERY over the view plans
  // against the current committed snapshot, the way a table (not a
  // frozen file list) behaves; a pinned view resolves once. The check
  // is one pointer read + claim listing (metadata-sized); resolution
  // itself only runs on version change. Registration seeds the cache.
  @volatile private var resolvedAt: Long = initial.map(_._1).getOrElse(-1L)
  @volatile private var cached: Seq[ManifestSql.Entry] =
    initial.map(_._2).getOrElse(Nil)

  private def entries: Seq[ManifestSql.Entry] = {
    val v =
      if (pinnedVersion > 0) pinnedVersion
      else Manifest.snapshotVersion(rootStr)
    if (v != resolvedAt) synchronized {
      if (v != resolvedAt) {
        cached = ManifestFileIndex.resolveEntries(spark, rootStr, table, v)
        resolvedAt = v
      }
    }
    cached
  }

  override def rootPaths: Seq[HadoopPath] = Seq(new HadoopPath(rootStr))

  override def partitionSchema: StructType = new StructType()

  override def sizeInBytes: Long = entries.map(_.size).sum

  override def inputFiles: Array[String] = entries.map(_.path).toArray

  override def refresh(): Unit = resolvedAt = -1L

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val es = entries
    val kept = es.filter(e => dataFilters.forall(f => mayMatch(e, f)))
    lastPrune = (kept.size, es.size)
    Seq(PartitionDirectory(InternalRow.empty, kept.map(e =>
      new FileStatus(e.size, false, 1, 128L << 20, e.modTime,
        new HadoopPath(e.path))).toArray))
  }

  private def fieldType(name: String): Option[DataType] =
    schema.fields.find(_.name == name).map(_.dataType)

  /** Three-valued "could any row of `e` satisfy `expr`": false only
    * on a PROVEN impossibility from the recorded bounds. */
  /** A reserved numeric stat of the entry (`__nrows`, `__nc_<col>`),
    * if recorded and parseable. */
  private def statLong(e: ManifestSql.Entry, key: String): Option[Long] =
    e.stats.get(key).flatMap(_._1).flatMap(v =>
      try Some(v.toLong) catch { case _: NumberFormatException => None })

  // Bloom sidecars deserialize once per (file, index instance) — the
  // planning path may consult the same file's bloom on every query
  private val bloomCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Keep the file unless its bloom sidecar (recorded for `colName`
    * via the `__bloomcol` stats key) excludes EVERY probe value —
    * the q212 point-index power surfaced to pushed SQL predicates.
    * Blooms bound, never filter: missing sidecar, foreign column, or
    * non-integral values keep the file. */
  private def bloomMayContain(e: ManifestSql.Entry, colName: String,
                              values: Seq[Any]): Boolean = {
    if (!e.stats.get("__bloomcol").flatMap(_._1).contains(colName)) return true
    val p = java.nio.file.Paths.get(e.path + ".bloom")
    if (!java.nio.file.Files.exists(p)) return true
    val bf = bloomCache.computeIfAbsent(e.path, { _ =>
      val in = java.nio.file.Files.newInputStream(p)
      try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
      finally in.close()
    }).asInstanceOf[org.apache.spark.util.sketch.BloomFilter]
    values.exists {
      case l: Long => bf.mightContainLong(l)
      case i: java.lang.Integer => bf.mightContainLong(i.longValue())
      case s: java.lang.Short => bf.mightContainLong(s.longValue())
      case b: java.lang.Byte => bf.mightContainLong(b.longValue())
      case _ => true // non-integral probe: the bloom cannot answer
    }
  }

  private def mayMatch(e: ManifestSql.Entry, expr: Expression): Boolean = expr match {
    case And(l, r) => mayMatch(e, l) && mayMatch(e, r)
    case Or(l, r) => mayMatch(e, l) || mayMatch(e, r)
    // null-count pruning from the recorded `__nc_<col>` / `__nrows`
    // stats: a file whose every row is NULL in the column cannot match
    // IS NOT NULL (and Catalyst pushes IsNotNull for ANY predicate on
    // the column, so all-null files drop out of ordinary WHEREs too);
    // a null-free file cannot match IS NULL. Unknown counts keep the
    // file — stats bound, never filter.
    case IsNotNull(a: AttributeReference) =>
      (statLong(e, "__nc_" + a.name), statLong(e, "__nrows")) match {
        case (Some(nc), Some(n)) => nc < n
        case _ => true
      }
    case IsNull(a: AttributeReference) =>
      statLong(e, "__nc_" + a.name).forall(_ > 0L)
    case EqualTo(a: AttributeReference, l: Literal) =>
      cmpRange(e, a.name, l, 0) && bloomMayContain(e, a.name, Seq(l.value))
    case EqualTo(l: Literal, a: AttributeReference) =>
      cmpRange(e, a.name, l, 0) && bloomMayContain(e, a.name, Seq(l.value))
    case EqualNullSafe(a: AttributeReference, l: Literal) => cmpRange(e, a.name, l, 0)
    case GreaterThan(a: AttributeReference, l: Literal) => cmpRange(e, a.name, l, 1)
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) => cmpRange(e, a.name, l, 1)
    case LessThan(a: AttributeReference, l: Literal) => cmpRange(e, a.name, l, -1)
    case LessThanOrEqual(a: AttributeReference, l: Literal) => cmpRange(e, a.name, l, -1)
    case GreaterThan(l: Literal, a: AttributeReference) => cmpRange(e, a.name, l, -1)
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) => cmpRange(e, a.name, l, -1)
    case LessThan(l: Literal, a: AttributeReference) => cmpRange(e, a.name, l, 1)
    case LessThanOrEqual(l: Literal, a: AttributeReference) => cmpRange(e, a.name, l, 1)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => cmpRange(e, a.name, v.asInstanceOf[Literal], 0)) &&
        bloomMayContain(e, a.name, vs.map(_.asInstanceOf[Literal].value))
    case _ => true
  }

  /** `side` > 0: any value >(=) lit possible (max >= lit)?
    * `side` < 0: any value <(=) lit possible (min <= lit)?
    * `side` = 0: lit inside [min, max]? Strictness is relaxed to
    * inclusive — conservative by one boundary value. */
  private def cmpRange(e: ManifestSql.Entry, col: String, lit: Literal,
                       side: Int): Boolean = {
    if (lit.value == null) return true
    val dt = fieldType(col).getOrElse(return true)
    e.stats.get(col) match {
      case None => true // no stats recorded for this column
      case Some((None, None)) => false // recorded all-null: no value matches
      case Some((mnOpt, mxOpt)) =>
        val mn = mnOpt.flatMap(cmp(_, lit.value, dt))
        val mx = mxOpt.flatMap(cmp(_, lit.value, dt))
        (mn, mx) match {
          case (Some(cMin), Some(cMax)) =>
            if (side > 0) cMax >= 0
            else if (side < 0) cMin <= 0
            else cMin <= 0 && cMax >= 0
          case _ => true // unparseable bound: stats bound, never filter
        }
    }
  }

  /** A timestamp literal's instant micros → micros of its LOCAL
    * rendering in the session zone. Comparisons then run local-vs-
    * local against [[Manifest.parseTsMicros]]'d stats strings.
    * SOUND ONLY under a fixed-offset session zone (UTC, the engine
    * default), where local order == instant order; under a DST zone
    * the local clock repeats the fall-back hour, no string-rendered
    * local scheme can prove impossibility, and [[cmp]] refuses
    * timestamp answers entirely (files are kept — stats bound, never
    * filter). */
  private def literalLocalMicros(micros: Long): Long = {
    val secs = Math.floorDiv(micros, 1000000L)
    val frac = Math.floorMod(micros, 1000000L)
    val ldt = LocalDateTime.ofInstant(java.time.Instant.ofEpochSecond(secs), zone)
    ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + frac
  }

  /** compare(statsString, catalystLiteralValue) in the column's value
    * domain; None when the stats string can't be decoded. */
  private def cmp(stat: String, lit: Any, dt: DataType): Option[Int] =
    try dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        Some(stat.toLong.compareTo(lit.asInstanceOf[Number].longValue()))
      case DoubleType | FloatType =>
        Some(stat.toDouble.compareTo(lit.asInstanceOf[Number].doubleValue()))
      case _: DecimalType =>
        Some(new java.math.BigDecimal(stat).compareTo(
          lit.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal))
      case TimestampType =>
        if (!zone.getRules.isFixedOffset) None // DST: local ≠ instant order
        else Manifest.parseTsMicros(stat)
          .map(_.compareTo(literalLocalMicros(lit.asInstanceOf[Long])))
      case TimestampNTZType => // NTZ literal micros ARE local micros
        Manifest.parseTsMicros(stat).map(_.compareTo(lit.asInstanceOf[Long]))
      case DateType =>
        Some(LocalDate.parse(stat).toEpochDay.toInt.compareTo(lit.asInstanceOf[Int]))
      case StringType =>
        // UTF8String order == Spark's min/max order for strings
        Some(UTF8String.fromString(stat).compareTo(lit.asInstanceOf[UTF8String]))
      case _ => None
    } catch { case _: Exception => None }
}
