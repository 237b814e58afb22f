package graft

import java.sql.Timestamp
import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.batch.BatchPipeline

/** Runs the reference's full batch composition (read → enrich → cache →
  * 3 aggregates + quota report) against in-memory fixtures with collecting
  * sinks. */
class BatchPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("template method fans out all four outputs from one cached join") {
    val msgs = Seq(
      (Timestamp.valueOf("2022-02-26 00:10:00"), "u1", "ant1", 100.0, "FB"),
      (Timestamp.valueOf("2022-02-26 00:20:00"), "u2", "ant1", 50.0, "IG"),
      (Timestamp.valueOf("2022-02-26 01:10:00"), "u1", "ant2", 7.0, "FB"),
    ).toDF("timestamp", "user_id", "antenna_id", "value", "app")
    val dim = Seq(("u1", "alice@x.io", 10.0), ("u2", "bob@x.io", 999.0))
      .toDF("id", "email", "quota")

    val aggs = mutable.Map[String, Seq[(Timestamp, String, Double, String)]]()
    var quota: Seq[(String, Double, Double, Timestamp)] = Nil

    new BatchPipeline {
      def readSlice(): DataFrame = msgs
      def readDimension(): DataFrame = dim
      def factKey = "user_id"; def dimKey = "id"
      def antennaCol: Column = col("antenna_id")
      def appCol: Column = col("app")
      def emailCol: Column = col("email")
      def quotaCol: Column = col("quota")
      def tsCol: Column = col("timestamp")
      def valueCol: Column = col("value")
      def writeAggregate(df: DataFrame, tag: String): Unit =
        aggs(tag) = df.as[(Timestamp, String, Double, String)].collect().toSeq
      def writeQuotaReport(df: DataFrame): Unit =
        quota = df.as[(String, Double, Double, Timestamp)].collect().toSeq
    }.run()

    assert(aggs("antenna_bytes_total").map(r => (r._2, r._3)).toSet ==
      Set(("ant1", 150.0), ("ant2", 7.0)))
    assert(aggs("email_bytes_total").map(r => (r._2, r._3)).toSet ==
      Set(("alice@x.io", 100.0), ("bob@x.io", 50.0), ("alice@x.io", 7.0)))
    assert(aggs("app_bytes_total").map(r => (r._2, r._3)).toSet ==
      Set(("FB", 100.0), ("IG", 50.0), ("FB", 7.0)))
    // alice: hour-0 usage 100 > quota 10 → violation; hour-1 usage 7 < 10 no
    assert(quota.map(q => (q._1, q._2)) == Seq(("alice@x.io", 100.0)))
  }
}
