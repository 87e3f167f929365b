package graft

import java.sql.Timestamp

class WindowsSpec extends SparkSuite {

  private def events(rows: (Long, String, Long, String, Double)*): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ev").toString
    rows.toSeq
      .map(r => (r._1, Timestamp.valueOf(r._2), r._3, r._4, r._5, """{"k": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("session window: gap of exactly 30 minutes EXTENDS the session") {
    val dir = events(
      (1L, "2024-01-01 00:00:00", 1L, "click", 1.0),
      (2L, "2024-01-01 00:29:59", 1L, "click", 1.0), // same session
      (3L, "2024-01-01 00:59:59", 1L, "click", 1.0), // gap exactly 30:00 → Spark merges touching windows
      (4L, "2024-01-01 03:00:00", 1L, "click", 1.0)) // clearly new
    val out = SparkEntry.queries("q53_session_window")(spark, dir).collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(3)).toSeq == Seq(3L, 1L))
  }

  test("asof join picks the latest click at or before each purchase") {
    val dir = events(
      (1L, "2024-01-01 00:00:00", 1L, "click", 10.0),
      (2L, "2024-01-01 00:10:00", 1L, "click", 20.0),
      (3L, "2024-01-01 00:15:00", 1L, "purchase", 99.0), // → click 2
      (4L, "2024-01-01 00:10:00", 1L, "click", 30.0),    // same ts as 2, higher id wins
      (5L, "2024-01-01 00:05:00", 2L, "purchase", 5.0))  // user 2: no click → null
    val out = SparkEntry.queries("q54_asof_join")(spark, dir).collect()
    val byPurchase = out.map(r => r.getLong(1) -> r).toMap
    assert(byPurchase(3L).getLong(4) == 4L)      // click_event_id: max id at ts 00:10
    assert(byPurchase(3L).getDouble(5) == 30.0)  // its value
    assert(byPurchase(5L).isNullAt(3))           // no prior click for user 2
  }

  test("tumbling windows are epoch-hour aligned") {
    val dir = events(
      (1L, "2024-01-01 00:59:59", 1L, "view", 1.0),
      (2L, "2024-01-01 01:00:00", 1L, "view", 2.0))
    val out = SparkEntry.queries("q51_tumbling_window")(spark, dir).collect()
    assert(out.length == 2) // boundary event goes to the 01:00 window
  }

  test("forward fill carries the last non-null per user and leaves leading gaps null") {
    // 'view' rows are the masked (null) readings in q156
    val dir = events(
      (1L, "2024-01-01 00:00:00", 1L, "view", 9.0),   // leading gap → null
      (2L, "2024-01-01 00:01:00", 1L, "click", 5.0),
      (3L, "2024-01-01 00:02:00", 1L, "view", 9.0),   // → 5.0
      (4L, "2024-01-01 00:03:00", 1L, "click", 7.0),
      (5L, "2024-01-01 00:04:00", 1L, "view", 9.0),   // → 7.0
      (6L, "2024-01-01 00:00:30", 2L, "view", 9.0))   // other user: own gap
    val out = SparkEntry.queries("q156_forward_fill")(spark, dir)
      .collect().map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out == Map(1L -> None, 2L -> Some(5.0), 3L -> Some(5.0),
      4L -> Some(7.0), 5L -> Some(7.0), 6L -> None))
  }

  test("daily drift: known distribution shift yields exact TV distance") {
    // day 1: click/view 50/50; day 2: all click → TV = ½(|1−.5|+|0−.5|) = 0.5
    // day 3 ≡ day 2 → TV = 0. A type absent today still contributes
    // yesterday's mass through the densified grid.
    val dir = events(
      (1L, "2024-01-01 01:00:00", 1L, "click", 1.0),
      (2L, "2024-01-01 02:00:00", 1L, "view", 1.0),
      (3L, "2024-01-02 01:00:00", 1L, "click", 1.0),
      (4L, "2024-01-02 02:00:00", 1L, "click", 1.0),
      (5L, "2024-01-03 01:00:00", 1L, "click", 1.0),
      (6L, "2024-01-03 02:00:00", 1L, "click", 1.0))
    val out = SparkEntry.queries("q140_daily_drift")(spark, dir)
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    assert(out == Map("2024-01-02" -> 0.5, "2024-01-03" -> 0.0))
  }
}
