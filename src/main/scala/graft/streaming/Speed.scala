package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType
import graft.core.{Num, Parse}

/** Speed layer (survey §2.6 T1-T6): Structured Streaming equivalents of the
  * reference's streaming job (`StreamingJobImpl.scala`), parameterized.
  *
  * Semantics kept from the reference:
  *  - event-time tumbling windows (`window(ts, dur)`, one duration arg)
  *  - watermark before every streaming aggregate (bounds state; drops data
  *    later than the bound) — reference uses 15 s
  *  - unified output schema `(timestamp, id, value, type)`
  *  - several independent queries fanned out from one parsed stream
  *
  * Deliberate upgrades over the reference (documented, not silent):
  *  - every sink takes a checkpoint dir (the reference's JDBC sink had none
  *    → unbounded re-writes on restart)
  *  - explicit output modes / triggers instead of defaults
  *
  * Scale: windowed streaming aggregation state is per (dim, window) in the
  * state store; the watermark expires old windows so state is bounded by
  * (active windows × dims), independent of stream length. For very hot dims
  * the partial aggregation before the shuffle absorbs skew. RocksDB state
  * store is the 100 TB-scale choice (config, not code).
  */
object Speed {

  /** S1: Kafka streaming source — the production path (identical API to the
    * reference, `StreamingJobImpl.scala:18-25`). Offline tests substitute a
    * MemoryStream; this function is the deployment wiring. */
  def readFromKafka(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .load()

  /** P2-P4 on the stream: cast the raw payload to string, parse JSON with an
    * explicit schema, expand to top-level columns. */
  def parseJson(raw: DataFrame, payloadCol: String = "value",
                schema: StructType = Parse.deviceMessageSchema): DataFrame =
    Parse.parseJson(raw, col(payloadCol), schema)

  /** A1-A3 shape: watermark + tumbling-window + exact sum, projected onto
    * `(timestamp, id, value, type)`. Works on both streaming and batch
    * frames (watermark is a no-op in batch); the aggregation body is the
    * shared [[graft.core.Agg]] shape. */
  def windowedSum(df: DataFrame, dim: Column, tsCol: String, windowDur: String,
                  watermark: String, value: Column, typeTag: String): DataFrame =
    graft.core.Agg.windowedSum(df.withWatermark(tsCol, watermark),
      dim, col(tsCol), windowDur, value, typeTag)

  /** Long-typed variant (the reference sums LongType bytes). */
  def windowedSumLong(df: DataFrame, dim: Column, tsCol: String, windowDur: String,
                      watermark: String, value: Column, typeTag: String): DataFrame =
    graft.core.Agg.windowedSumLong(df.withWatermark(tsCol, watermark),
      dim, col(tsCol), windowDur, value, typeTag)

  /** J1 on the stream: stream-static equi-join against a dimension — the
    * per-micro-batch planner sizes the static side (broadcast while it fits,
    * shuffled join at scale), the stream side never shuffles when broadcast
    * wins, and no streaming state is held (static side is re-resolvable per
    * batch, so dimension updates between batches are picked up for file
    * sources). The streaming counterpart of [[graft.core.Enrich.enrich]];
    * same duplicate-key drop, same default-off hint. */
  def enrichStream(stream: DataFrame, dim: DataFrame,
                   streamKey: String, dimKey: String,
                   hintBroadcast: Boolean = false): DataFrame = {
    // hintBroadcast only for PROVABLY BOUNDED dims (the repo-wide broadcast
    // invariant): an SF-scaled dimension (customer/part/…) must pass false
    // and let the per-micro-batch planner size the static side itself —
    // it still broadcasts while the stats fit and falls back to a
    // shuffled join at scale instead of OOMing the driver.
    val d = if (hintBroadcast) broadcast(dim) else dim
    stream.join(d, stream(streamKey) === dim(dimKey), "inner")
      .drop(dim(dimKey))
  }

  /** Streaming exact dedup on ingest (an LLM-pipeline staple): drops rows
    * whose key was already seen within the watermark horizon — state is
    * bounded by (keys per watermark window), not stream length. */
  def dedupStream(df: DataFrame, keyCols: Seq[String], tsCol: String,
                  watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Session-window sum (Spark-native gap sessions; works on streams with
    * a watermark and on batch frames). The batch linear-scan equivalent is
    * graft.queries.Sessionize. */
  def sessionWindowSum(df: DataFrame, dim: Column, tsCol: String, gap: String,
                       watermark: String, value: Column, typeTag: String): DataFrame =
    graft.core.Agg.windowedSumSession(df.withWatermark(tsCol, watermark),
      dim, col(tsCol), gap, value, typeTag)

  /** Stream-stream join: left events pick up right events with the
    * same key whose event time falls in [leftTs − within, leftTs] — the
    * "error within N minutes of a click" correlation shape. Both sides are
    * watermarked and the join carries an explicit event-time range, so
    * Spark can expire join state: buffered rows per side are bounded by
    * (rate × (watermark + within)), independent of stream length — the
    * REQUIRED shape for an unbounded stream-stream join at scale (an
    * unconstrained join buffers both streams forever). Right columns are
    * prefixed to keep the output schema collision-free.
    *
    * `joinType` "inner" (default) emits matches as they arrive;
    * "left_outer" ADDITIONALLY emits a null-padded row for a left event
    * once the WATERMARK EXPIRES its state unmatched — emission driven by
    * state lifecycle, not arrival, which is why only a watermark-bounded
    * join may be outer on a stream (Spark rejects the unconstrained
    * form: the engine could never prove "no future match"). */
  def joinWithin(left: DataFrame, right: DataFrame, keyCol: String,
                 leftTs: String, rightTs: String,
                 watermark: String, within: String,
                 rightPrefix: String = "r_",
                 joinType: String = "inner"): DataFrame = {
    val r0 = right.withWatermark(rightTs, watermark)
    val r = r0.columns.foldLeft(r0)((df, c) => df.withColumnRenamed(c, rightPrefix + c))
    left.withWatermark(leftTs, watermark)
      .join(r, expr(
        s"$keyCol = $rightPrefix$keyCol AND " +
          s"$rightPrefix$rightTs BETWEEN $leftTs - INTERVAL $within AND $leftTs"),
        joinType)
      .drop(rightPrefix + keyCol)
  }

  /** T5: run several streaming queries to completion of any — the
    * reference's Future/sequence orchestration collapses to Spark's own
    * stream manager (`StreamingJob.scala:30-43`). */
  def awaitAny(spark: SparkSession): Unit =
    spark.streams.awaitAnyTermination()

  def stopAll(spark: SparkSession): Unit =
    spark.streams.active.foreach(_.stop())
}
