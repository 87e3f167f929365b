package graft

import graft.plans.AsOfJoinApi
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The custom as-of join operator (LogicalPlan + Strategy + SparkPlan):
  * crafted-input semantics, planner-inserted distribution/ordering, and
  * fixture-level equivalence with the composed form (q54).
  */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def frames = {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3"), // before any right row of key 2
      (3L, ts("2024-01-01 10:00:00"), "p4")  // key absent on the right
    ).toDF("l_key", "l_ts", "l_tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "r1"),
      (1L, ts("2024-01-01 12:00:00"), "r2"), // equal ts: ≤ includes it
      (2L, ts("2024-01-01 11:00:00"), "r3")
    ).toDF("r_key", "r_ts", "r_tag")
    (left, right)
  }

  test("as-of picks the latest right row at-or-before, null-pads misses, resets across keys") {
    val (left, right) = frames
    val out = AsOfJoinApi.asofJoin(left, right, "l_key", "r_key", "l_ts", "r_ts")
      .select(col("l_tag"), col("r_tag")).as[(String, Option[String])]
      .collect().toMap
    assert(out == Map(
      "p1" -> Some("r1"), // 09:30 ≤ 10:00
      "p2" -> Some("r2"), // equal-ts right row included
      "p3" -> None,       // key 2's only right row is later
      "p4" -> None))      // key 3 has no right rows
  }

  test("match state does not leak into a key with no earlier right rows") {
    // key 1 accumulates a match, then key 2's left row at a LATER ts
    // must not inherit it (regression guard for the merge reset)
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, ts("2024-01-01 23:00:00"), "b")).toDF("l_key", "l_ts", "l_tag")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), "r1"))
      .toDF("r_key", "r_ts", "r_tag")
    val out = AsOfJoinApi.asofJoin(left, right, "l_key", "r_key", "l_ts", "r_ts")
      .select(col("l_tag"), col("r_tag")).as[(String, Option[String])]
      .collect().toMap
    assert(out == Map("a" -> Some("r1"), "b" -> None))
  }

  test("planner inserts the co-partitioning exchanges and (key, ts) sorts") {
    val (left, right) = frames
    val p = AsOfJoinApi.asofJoin(left, right, "l_key", "r_key", "l_ts", "r_ts")
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    // both children hash-partitioned on their key and sorted (key, ts)
    assert("hashpartitioning\\(l_key".r.findAllIn(p).nonEmpty, p)
    assert("hashpartitioning\\(r_key".r.findAllIn(p).nonEmpty, p)
    assert("Sort \\[l_key".r.findAllIn(p).nonEmpty, p)
    assert("Sort \\[r_key".r.findAllIn(p).nonEmpty, p)
  }

  test("custom operator agrees with the composed q54 on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val composed = SparkEntry.queries("q54_asof_join")(spark, dir).collect()
    val custom = SparkEntry.queries("q159_asof_custom")(spark, dir).collect()
    assert(custom.length == composed.length)
    assert(custom.sameElements(composed))
  }

  test("ambiguous column names are rejected up front") {
    val (left, right) = frames
    val renamed = right.withColumnRenamed("r_key", "l_key")
    intercept[IllegalArgumentException] {
      AsOfJoinApi.asofJoin(left, renamed, "l_key", "l_key", "l_ts", "r_ts")
    }
    // overlap in NON-key columns is rejected too (documented contract)
    intercept[IllegalArgumentException] {
      AsOfJoinApi.asofJoin(left, right.withColumnRenamed("r_tag", "l_tag"),
        "l_key", "r_key", "l_ts", "r_ts")
    }
  }

  test("tolerance nulls stale matches without substituting older in-window rows") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "fresh"),   // match 09:59 (1 min old)
      (1L, ts("2024-01-01 11:00:00"), "stale"),   // latest is 09:59 (61 min) → null
      (2L, ts("2024-01-01 10:00:00"), "exact")    // match at 0 staleness
    ).toDF("l_key", "l_ts", "l_tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "old"),     // older in-window? no — 10:00-09:00=60m > tol anyway
      (1L, ts("2024-01-01 09:59:00"), "recent"),
      (2L, ts("2024-01-01 10:00:00"), "now")
    ).toDF("r_key", "r_ts", "r_tag")
    val out = AsOfJoinApi.asofJoin(left, right, "l_key", "r_key", "l_ts", "r_ts",
        tolerance = Some(java.time.Duration.ofMinutes(10)))
      .select(col("l_tag"), col("r_tag")).as[(String, Option[String])]
      .collect().toMap
    assert(out == Map(
      "fresh" -> Some("recent"),
      "stale" -> None,   // 'recent' is 61 min old; 'old' must NOT substitute
      "exact" -> Some("now")))
    // zero tolerance keeps only exact-timestamp matches
    val strict = AsOfJoinApi.asofJoin(left, right, "l_key", "r_key", "l_ts", "r_ts",
        tolerance = Some(java.time.Duration.ZERO))
      .select(col("l_tag"), col("r_tag")).as[(String, Option[String])]
      .collect().toMap
    assert(strict == Map("fresh" -> None, "stale" -> None, "exact" -> Some("now")))
  }

  test("forward direction takes the earliest at-or-after row; one right row serves many lefts") {
    val left = Seq(
      (1L, ts("2024-01-01 09:00:00"), "a"), // both a and b → 10:00 row
      (1L, ts("2024-01-01 09:30:00"), "b"),
      (1L, ts("2024-01-01 10:00:00"), "c"), // equal ts included
      (1L, ts("2024-01-01 10:00:01"), "d"), // past the last right row → null
      (2L, ts("2024-01-01 09:00:00"), "e")  // no right rows for key 2
    ).toDF("l_key", "l_ts", "l_tag")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), "early"), // before every left: never a forward match
      (1L, ts("2024-01-01 10:00:00"), "next")
    ).toDF("r_key", "r_ts", "r_tag")
    val out = AsOfJoinApi.asofJoin(left, right, "l_key", "r_key", "l_ts", "r_ts",
        direction = "forward")
      .select(col("l_tag"), col("r_tag")).as[(String, Option[String])]
      .collect().toMap
    assert(out == Map(
      "a" -> Some("next"), "b" -> Some("next"), "c" -> Some("next"),
      "d" -> None, "e" -> None))
    // forward + tolerance: a is 60 min away → null at 45 min tolerance
    val tight = AsOfJoinApi.asofJoin(left, right, "l_key", "r_key", "l_ts", "r_ts",
        tolerance = Some(java.time.Duration.ofMinutes(45)), direction = "forward")
      .select(col("l_tag"), col("r_tag")).as[(String, Option[String])]
      .collect().toMap
    assert(tight("a") == None && tight("b") == Some("next") && tight("c") == Some("next"))
  }

  test("NULL keys and timestamps never match (SQL ASOF semantics)") {
    val left = Seq(
      (Option(1L), Option(ts("2024-01-01 10:00:00")), "a"),
      (Option.empty[Long], Option(ts("2024-01-01 10:00:00")), "nullkey"),
      (Option(1L), Option.empty[Timestamp], "nullts"),
      (Option(0L), Option(ts("2024-01-01 10:00:00")), "zero")
    ).toDF("l_key", "l_ts", "l_tag")
    val right = Seq(
      (Option(1L), Option(ts("2024-01-01 09:00:00")), "r1"),
      (Option.empty[Long], Option(ts("2024-01-01 08:00:00")), "rnull"), // matches nothing
      (Option(0L), Option(ts("2024-01-01 09:30:00")), "r0")
    ).toDF("r_key", "r_ts", "r_tag")
    val out = AsOfJoinApi.asofJoin(left, right, "l_key", "r_key", "l_ts", "r_ts")
      .select(col("l_tag"), col("r_tag")).as[(String, Option[String])]
      .collect().toMap
    assert(out == Map(
      "a" -> Some("r1"),
      "nullkey" -> None, // NOT coerced to key 0 (would wrongly hit r0)
      "nullts" -> None,
      "zero" -> Some("r0")))
  }
}
