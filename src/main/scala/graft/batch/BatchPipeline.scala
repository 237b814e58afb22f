package graft.batch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Agg, Enrich, QuotaCheck}

/** The reference's batch-layer composition (survey §3.2/§3.4): read one
  * archive slice, enrich with the user dimension, cache the joined frame,
  * fan out four aggregates to sinks. The trait-with-template-method shape
  * is kept — operators are individually overridable/testable, `run`
  * composes them — but sources and sinks are injected functions instead of
  * hardwired Kafka/Postgres endpoints.
  *
  * The `.cache()` is deliberate (reference: `BatchJob.scala:34`): four
  * downstream actions share one join; that reuse is query-topology
  * knowledge Catalyst cannot infer. At 100 TB prefer
  * `persist(MEMORY_AND_DISK)` (the default) and size executors so the hot
  * slice fits; the first action populates, the rest reuse.
  */
trait BatchPipeline {

  /** One archive slice (the reference's partition-pruned parquet scan). */
  def readSlice(): DataFrame

  /** The user-metadata dimension (JDBC in production, parquet in tests). */
  def readDimension(): DataFrame

  def factKey: String
  def dimKey: String
  /** (dimCol, quotaCol, tsCol, valueCol) used by the aggregates. */
  def antennaCol: Column
  def appCol: Column
  def emailCol: Column
  def quotaCol: Column
  def tsCol: Column
  def valueCol: Column
  def windowDur: String = "1 hour"

  /** Sink for the unified (timestamp, id, value, type) aggregates. */
  def writeAggregate(df: DataFrame, tag: String): Unit
  /** Sink for the (email, usage, quota, timestamp) violation report. */
  def writeQuotaReport(df: DataFrame): Unit

  /** Template method: the reference's exact fan-out (BatchJob.scala:28-47). */
  def run(): Unit = {
    val enriched = Enrich.enrich(readSlice(), readDimension(), factKey, dimKey)
      .cache()
    try {
      writeAggregate(Agg.windowedSum(enriched, antennaCol, tsCol, windowDur,
        valueCol, "antenna_bytes_total"), "antenna_bytes_total")
      writeAggregate(Agg.windowedSum(enriched, emailCol, tsCol, windowDur,
        valueCol, "email_bytes_total"), "email_bytes_total")
      writeAggregate(Agg.windowedSum(enriched, appCol, tsCol, windowDur,
        valueCol, "app_bytes_total"), "app_bytes_total")
      writeQuotaReport(QuotaCheck.quotaViolations(enriched, emailCol, quotaCol,
        tsCol, valueCol, windowDur))
    } finally enriched.unpersist()
  }
}
