package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.{AsOf, Sessionize}
import graft.streaming.Speed

class SessionAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize: gap starts a new session, stats per session") {
    val ev = Seq(
      ("u", ts("2024-01-01 00:00:00"), 1.0),
      ("u", ts("2024-01-01 00:10:00"), 2.0),   // same session (10 min < 30)
      ("u", ts("2024-01-01 01:00:00"), 4.0),   // 50 min gap → new session
      ("v", ts("2024-01-01 00:05:00"), 8.0),
    ).toDF("user_id", "ts", "value")
    val out = Sessionize.sessionStats(ev, col("user_id"), col("ts"),
        col("value"), gapSeconds = 1800)
      .orderBy("key", "session_no")
      .as[(String, Long, Timestamp, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("u", 1L, ts("2024-01-01 00:00:00"), 2L, 3.0),
      ("u", 2L, ts("2024-01-01 01:00:00"), 1L, 4.0),
      ("v", 1L, ts("2024-01-01 00:05:00"), 1L, 8.0)))
  }

  test("session_window (Spark-native) agrees on the same fixture") {
    val ev = Seq(
      ("u", ts("2024-01-01 00:00:00"), 1.0),
      ("u", ts("2024-01-01 00:10:00"), 2.0),
      ("u", ts("2024-01-01 01:00:00"), 4.0),
    ).toDF("user_id", "ts", "value")
    val out = Speed.sessionWindowSum(ev, col("user_id"), "ts", "30 minutes",
        "0 seconds", col("value"), "s")
      .orderBy("timestamp").select("value").as[Double].collect().toSeq
    assert(out == Seq(3.0, 4.0))
  }

  test("asofBackward: most recent right row at-or-before each left row") {
    val errors = Seq(
      (1L, "u", ts("2024-01-01 00:00:10")),
      (2L, "u", ts("2024-01-01 00:00:05")),
      (3L, "v", ts("2024-01-01 00:00:07")),
      (4L, "w", ts("2024-01-01 00:00:09")),   // no clicks for w at all
    ).toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      ("u", ts("2024-01-01 00:00:04"), 101L),
      ("u", ts("2024-01-01 00:00:09"), 102L),
      ("v", ts("2024-01-01 00:00:08"), 103L),  // AFTER error 3 → no match
      ("v", ts("2024-01-01 00:00:07"), 104L),  // equal ts → inclusive match
    ).toDF("user_id", "ts", "click_id")
    val out = AsOf.asofBackward(errors, clicks, "user_id", "ts",
        rightCols = Seq("click_id"), prefix = "m_")
      .orderBy("event_id")
      .select("event_id", "m_click_id").as[(Long, Option[Long])].collect().toSeq
    assert(out == Seq(
      (1L, Some(102L)),  // latest click ≤ 00:00:10
      (2L, Some(101L)),  // only click ≤ 00:00:05
      (3L, Some(104L)),  // equal-timestamp click matches (inclusive)
      (4L, None)))       // left-outer: no click ever
  }
}
