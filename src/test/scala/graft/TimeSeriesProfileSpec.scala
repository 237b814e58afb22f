package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.TimeSeries
import graft.ext.Profile

class TimeSeriesProfileSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleLocf: empty buckets materialize with LOCF of the last sum") {
    val ev = Seq(
      ("u", ts("2024-01-01 00:01:00"), 2.0),
      ("u", ts("2024-01-01 00:05:00"), 3.0),   // same 10-min bucket → sum 5
      // buckets 00:10 and 00:20 empty → gaps carrying 5.0
      ("u", ts("2024-01-01 00:31:00"), 7.0),
      ("v", ts("2024-01-01 00:15:00"), 1.0)    // single-bucket key: no grid
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.resampleLocf(ev, col("user_id"), col("ts"),
        col("value"), bucketSeconds = 600L)
      .orderBy("key", "bucket_ts")
      .as[(String, Timestamp, Option[Double], Double, Int)].collect().toSeq
    assert(out == Seq(
      ("u", ts("2024-01-01 00:00:00"), Some(5.0), 5.0, 0),
      ("u", ts("2024-01-01 00:10:00"), None, 5.0, 1),
      ("u", ts("2024-01-01 00:20:00"), None, 5.0, 1),
      ("u", ts("2024-01-01 00:30:00"), Some(7.0), 7.0, 0),
      ("v", ts("2024-01-01 00:10:00"), Some(1.0), 1.0, 0)), out.toString)
  }

  test("scd2History: runs collapse, ties broken by seq, open current run") {
    val ev = Seq(
      // u: A A B A — three runs; the two 00:02:00 events tie on ts and
      // must order by seq (2 then 3), keeping the A-run unbroken
      ("u", ts("2024-01-01 00:01:00"), 1L, "A"),
      ("u", ts("2024-01-01 00:02:00"), 2L, "A"),
      ("u", ts("2024-01-01 00:02:00"), 3L, "B"),
      ("u", ts("2024-01-01 00:04:00"), 4L, "A"),
      ("v", ts("2024-01-01 00:00:30"), 5L, "X")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = TimeSeries.scd2History(ev, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .orderBy("key", "valid_from")
      .as[(String, String, Timestamp, Option[Timestamp])].collect().toSeq
    assert(out == Seq(
      ("u", "A", ts("2024-01-01 00:01:00"), Some(ts("2024-01-01 00:02:00"))),
      ("u", "B", ts("2024-01-01 00:02:00"), Some(ts("2024-01-01 00:04:00"))),
      ("u", "A", ts("2024-01-01 00:04:00"), None),
      ("v", "X", ts("2024-01-01 00:00:30"), None)), out.toString)
  }

  test("profile: one-pass counts and typed min/max, nulls counted") {
    val df = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, None, Some(1.5)),
      (3L, Some("c"), None),
      (3L, Some("a"), Some(9.0))
    ).toDF("k", "s", "x")
    val out = Profile.profile(df, Seq("k", "s", "x"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[String], Option[String])].collect().toSeq
    assert(out == Seq(
      ("k", 4L, 0L, 3L, Some(1.0), Some(3.0), None, None),
      ("s", 3L, 1L, 2L, None, None, Some("a"), Some("c")),
      ("x", 3L, 1L, 3L, Some(1.5), Some(9.0), None, None)), out.toString)
    // the whole profile is ONE aggregate: a single scan in the plan
    val plan = Profile.profile(df, Seq("k", "s", "x"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), plan)
  }
}
