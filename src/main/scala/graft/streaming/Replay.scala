package graft.streaming

import java.time.{Duration, LocalDateTime}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Batch→stream replay harness: drive the REAL Structured Streaming engine
  * (watermark, windowed state store, append-mode emission, parquet sink)
  * over a finite batch of rows, run it to completion with
  * `Trigger.AvailableNow`, and hand back the sink as a batch frame — so the
  * streaming code path itself can sit behind the same DuckDB oracle as its
  * batch equivalent (round-3 verdict #4: the streaming engine was
  * spec-only; this gives A1/T1/T2 a correctness row that actually executed
  * streaming).
  *
  * MemoryStream is driver-resident by design — this is the offline replay
  * harness, not an ingest path; production streams arrive through S1
  * ([[Speed.readFromKafka]]) and none of the windowing/watermark/sink code
  * here differs between the two sources (that is the point of the test).
  *
  * Append mode only emits a window once the watermark passes its end, and
  * the watermark trails the max seen event time — so the final windows of a
  * finite replay would stay unflushed forever. The harness appends one
  * SENTINEL row far past the real data (default +10 min ≫ watermark delay
  * + window length) whose only job is to push the watermark past every real
  * window end; the sentinel's own window never closes, so after filtering
  * its id the sink holds exactly the closed real windows.
  */
object Replay {

  val SentinelId = "zz__replay_sentinel"

  /** Replay `(ts, id, value)` rows through [[Speed.windowedSum]] (the
    * watermarked streaming aggregate) into a parquet sink and read it back.
    * Output schema matches the batch shape: (timestamp, id, value, type). */
  def windowedSumReplay(spark: SparkSession,
                        rows: Seq[(LocalDateTime, String, Double)],
                        windowDur: String, watermark: String, typeTag: String,
                        sentinelGap: Duration = Duration.ofMinutes(10)): DataFrame = {
    require(rows.nonEmpty, "replay needs at least one row")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(LocalDateTime, String, Double)]
    in.addData(rows)
    val maxTs = rows.iterator.map(_._1).max(Ordering.fromLessThan[LocalDateTime](_ isBefore _))
    in.addData((maxTs.plus(sentinelGap), SentinelId, 0.0))
    // the streaming engine only watermarks TIMESTAMP (not TIMESTAMP_NTZ);
    // cast in, and cast the window start back to NTZ on readback — an
    // identity round-trip under the fixed session timezone, keeping the
    // output schema on the repo's NTZ oracle contract
    val src = in.toDF().toDF("ts", "id", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = Speed.windowedSum(src, col("id"), "ts", windowDur, watermark,
      col("value"), typeTag)
    val dir = java.nio.file.Files.createTempDirectory("graft-replay-").toString
    val q = agg.writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$dir/out").where(col("id") =!= SentinelId)
      .withColumn("timestamp", col("timestamp").cast("timestamp_ntz"))
  }

  /** Replay two keyed `(event_id, ts, user_id)` streams through
    * [[Speed.joinWithin]] (the watermark-bounded stream-stream INNER join)
    * into a parquet sink and read it back — the stream-stream-join
    * counterpart of [[windowedSumReplay]], so the join code path gets a
    * DuckDB-graded correctness row too. No sentinel needed: inner-join
    * matches emit as rows are processed (the watermark only bounds state
    * eviction, not emission), so a finite `Trigger.AvailableNow` replay
    * emits every matched pair. Output: (event_id, ts, user_id,
    * <prefix>event_id, <prefix>ts), timestamps back on the NTZ contract. */
  def joinWithinReplay(spark: SparkSession,
                       left: Seq[(Long, LocalDateTime, Long)],
                       right: Seq[(Long, LocalDateTime, Long)],
                       watermark: String, within: String,
                       rightPrefix: String = "r_"): DataFrame = {
    require(left.nonEmpty && right.nonEmpty, "replay needs rows on both sides")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val l = MemoryStream[(Long, LocalDateTime, Long)]
    val r = MemoryStream[(Long, LocalDateTime, Long)]
    l.addData(left)
    r.addData(right)
    def src(ms: MemoryStream[(Long, LocalDateTime, Long)]) =
      ms.toDF().toDF("event_id", "ts", "user_id")
        .withColumn("ts", col("ts").cast("timestamp"))
    val joined = Speed.joinWithin(src(l), src(r), "user_id", "ts", "ts",
      watermark, within, rightPrefix)
    val dir = java.nio.file.Files.createTempDirectory("graft-replay-").toString
    val q = joined.writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$dir/out")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .withColumn(rightPrefix + "ts", col(rightPrefix + "ts").cast("timestamp_ntz"))
  }
}
