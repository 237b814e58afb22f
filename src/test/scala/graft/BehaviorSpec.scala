package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.{Basket, Behavior}

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: steps must occur in order, each within the deadline") {
    val ev = Seq(
      // u completes the whole funnel inside the 1 h per-step window
      ("u", ts("2024-01-01 00:00:00"), "view"),
      ("u", ts("2024-01-01 00:30:00"), "click"),
      ("u", ts("2024-01-01 01:10:00"), "purchase"),
      // v clicks BEFORE any view — the click must not count; the later
      // purchase has no completed click step, so it can't count either
      ("v", ts("2024-01-01 00:10:00"), "click"),
      ("v", ts("2024-01-01 00:20:00"), "view"),
      ("v", ts("2024-01-01 00:40:00"), "purchase"),
      // w clicks past the 1 h deadline after its first view
      ("w", ts("2024-01-01 00:00:00"), "view"),
      ("w", ts("2024-01-01 02:00:00"), "click"),
    ).toDF("user_id", "ts", "event_type")
    val out = Behavior.funnelCounts(ev, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"),
        stepWindowSeconds = 3600)
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "view", 3L), (2L, "click", 1L), (3L, "purchase", 1L)))
  }

  test("funnel: a later, qualifying re-occurrence still counts (greedy chain)") {
    // x's first click is too late, but a purchase within deadline of the
    // EARLIEST QUALIFYING click (the second one) must still convert
    val ev = Seq(
      ("x", ts("2024-01-01 00:00:00"), "view"),
      ("x", ts("2024-01-01 00:30:00"), "click"),
      ("x", ts("2024-01-01 00:45:00"), "click"),   // later click: not the chain time
      ("x", ts("2024-01-01 01:20:00"), "purchase"), // 50 min after FIRST click: ok
    ).toDF("user_id", "ts", "event_type")
    val out = Behavior.funnelCounts(ev, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"),
        stepWindowSeconds = 3600)
      .as[(Long, String, Long)].collect().toSeq
    assert(out.map(_._3) == Seq(1L, 1L, 1L))
  }

  test("cohort retention: first-active day is offset 0, returns counted distinct") {
    val ev = Seq(
      ("u", ts("2024-01-01 10:00:00")),
      ("u", ts("2024-01-01 23:00:00")),   // same day, same user: one cell
      ("u", ts("2024-01-03 09:00:00")),   // +2 days
      ("v", ts("2024-01-01 05:00:00")),
      ("v", ts("2024-01-02 05:00:00")),   // +1 day
      ("w", ts("2024-01-02 00:00:00")),   // its own cohort
    ).toDF("user_id", "ts")
    val out = Behavior.cohortRetention(ev, col("user_id"), col("ts"))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd"),
        col("offset_days"), col("n_users"))
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 0L, 2L),
      ("2024-01-01", 1L, 1L),
      ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L)))
  }

  test("transition matrix: per-user ordered pairs, row-conditional p") {
    val ev = Seq(
      // u1: A→B→A (transitions A→B, B→A); u2: A→B (A→B)
      (1L, ts("2024-01-01 00:00:00"), "u1", "A"),
      (2L, ts("2024-01-01 00:01:00"), "u1", "B"),
      (3L, ts("2024-01-01 00:02:00"), "u1", "A"),
      (4L, ts("2024-01-01 00:00:00"), "u2", "A"),
      (5L, ts("2024-01-01 00:01:00"), "u2", "B"),
      // u3: one event — no transition; never crosses users
      (6L, ts("2024-01-01 00:00:30"), "u3", "C"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Behavior.transitionMatrix(ev, col("user_id"), col("ts"),
        col("event_type"), col("event_id"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(out == Set(("A", "B", 2L, 1.0), ("B", "A", 1L, 1.0)),
      "A→B twice (p=1 among A-departures), B→A once; no cross-user pair")
  }

  test("transition matrix: equal timestamps order by the tiebreak column") {
    val t = ts("2024-01-01 00:00:00")
    val ev = Seq((2L, t, "u", "B"), (1L, t, "u", "A"), (3L, t, "u", "C"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Behavior.transitionMatrix(ev, col("user_id"), col("ts"),
        col("event_type"), col("event_id"))
      .select("from_type", "to_type").as[(String, String)].collect().toSet
    assert(out == Set(("A", "B"), ("B", "C")), "event_id breaks the ts tie")
  }

  test("frequent pairs: per-basket dedup, support threshold, a<b packing") {
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 20L),    // duplicate line: one (10,20)
      (2L, 20L), (2L, 10L),               // reversed insert order: still (10,20)
      (3L, 10L), (3L, 30L),
    ).toDF("l_orderkey", "l_partkey")
    val out = Basket.frequentPairs(li, minSupport = 2L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((10L, 20L, 2L)))
  }
}
