package graft

import graft.ops.Quality
import graft.ops.Quality.{ExpectDrop, ExpectFail, ExpectWarn, Expectation}
import org.apache.spark.sql.functions._

/** DLT-style expectations (q273): per-rule policies (warn/drop/fail),
  * quarantine tagging, one-pass metrics, and the conservative
  * NULL-fails-the-rule semantics (deliberately unlike CHECK's ANSI
  * NULL-passes).
  */
class ExpectationsSpec extends SparkSuite {

  import spark.implicits._

  private val df = Seq(
    (1L, Some(5.0)), (2L, Some(-1.0)), (3L, Option.empty[Double]),
    (4L, Some(500.0))).toDF("k", "v")

  test("warn counts but keeps; drop filters; NULL fails the rule") {
    val (kept, quarantine, metrics) = Quality.expect(df, Seq(
      Expectation("v_pos", "v >= 0", ExpectDrop),
      Expectation("v_band", "v < 400", ExpectWarn)))
    // NULL v fails v_pos: kept = {1, 4}; 4 only warns (never filters)
    assert(kept.select("k").as[Long].collect().toSet == Set(1L, 4L))
    val m = metrics.collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(m("v_pos") == (("drop", 2L)), m.toString)
    assert(m("v_band") == (("warn", 2L)), m.toString) // NULL + 500
    val q = quarantine
      .select(col("k"), col("_failed_expectations").cast("string"))
      .as[(Long, String)].collect().toMap
    assert(q.keySet == Set(2L, 3L))
    assert(q(2L) == "[v_pos]" && q(3L) == "[v_pos]", q.toString)
  }

  test("warn-only expectations never filter; fail aborts the batch") {
    val (kept, quarantine, _) = Quality.expect(df,
      Seq(Expectation("band", "v < 400", ExpectWarn)))
    assert(kept.count() == 4L && quarantine.count() == 0L)
    val e = intercept[IllegalStateException] {
      Quality.expect(df, Seq(Expectation("v_pos", "v >= 0", ExpectFail)))
    }
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    // a passing fail-rule returns normally
    val (k2, _, m2) = Quality.expect(df,
      Seq(Expectation("k_pos", "k > 0", ExpectFail)))
    assert(k2.count() == 4L && m2.head().getLong(2) == 0L)
    // duplicate rule names refuse loudly
    intercept[IllegalArgumentException] {
      Quality.expect(df, Seq(
        Expectation("x", "k > 0", ExpectWarn),
        Expectation("x", "k > 1", ExpectWarn)))
    }
  }
}
