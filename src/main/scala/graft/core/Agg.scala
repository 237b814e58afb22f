package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's whole aggregation surface (survey §2.5 A1-A7): tumbling
  * event-time window + one grouping dimension + sum, projected onto the
  * unified output schema `(timestamp, id, value, type)`
  * (`StreamingJobImpl.scala:43-77`, `BatchJobImpl.scala:46-88`).
  *
  * Parameterized over group column, window duration and type tag — the
  * reference hardwires seven copies of this one shape; we keep one
  * implementation.
  *
  * Scale notes:
  *  - `groupBy(dim, window(ts, d))` compiles to partial HashAggregate →
  *    shuffle on (dim, window) → final HashAggregate. Map-side combine
  *    collapses each partition to ~|dims × windows-per-partition| rows
  *    before the shuffle, so shuffled bytes are bounded by group
  *    cardinality, not input rows — the right shape at 100 TB.
  *  - Skewed dims (one hot antenna) are handled by AQE skew handling; the
  *    partial aggregate already absorbs most of the skew.
  */
object Agg {

  /** The one aggregation shape everything shares: groupBy(dim, windowExpr)
    * → agg → unified `(timestamp = window.start, id, value, type)`. Every
    * public variant differs only in the window and the aggregate — a single
    * body keeps the contract in one place (the reference hardwires seven
    * copies of it). */
  private def unified(df: DataFrame, dim: Column, windowExpr: Column,
                      aggValue: Column, typeTag: String): DataFrame =
    df.groupBy(dim.as("id"), windowExpr.as("w"))
      .agg(aggValue.as("value"))
      .select(
        col("w.start").as("timestamp"),
        col("id"),
        col("value"),
        lit(typeTag).as("type"))

  /** Tumbling-window sum. The sum is exact-decimal (see [[Num.dsum]]) so
    * results are order-independent and reproducible. */
  def windowedSum(df: DataFrame, dim: Column, ts: Column, dur: String,
                  value: Column, typeTag: String): DataFrame =
    unified(df, dim, window(ts, dur), Num.dsum(value), typeTag)

  /** Sliding-window variant (duration > slide ⇒ each row lands in
    * duration/slide windows). The reference only uses tumbling windows;
    * this rounds out the window surface. */
  def windowedSumSliding(df: DataFrame, dim: Column, ts: Column, dur: String,
                         slide: String, value: Column, typeTag: String): DataFrame =
    unified(df, dim, window(ts, dur, slide), Num.dsum(value), typeTag)

  /** Same shape for an integral value column (the reference sums LongType
    * bytes — no decimal dance needed for exact integer sums). */
  def windowedSumLong(df: DataFrame, dim: Column, ts: Column, dur: String,
                      value: Column, typeTag: String): DataFrame =
    unified(df, dim, window(ts, dur), sum(value), typeTag)

  /** Session-window (gap-based) sum — used by the speed layer. */
  def windowedSumSession(df: DataFrame, dim: Column, ts: Column, gap: String,
                         value: Column, typeTag: String): DataFrame =
    unified(df, dim, session_window(ts, gap), Num.dsum(value), typeTag)

  /** Two-stage SALTED sum for pathologically skewed keys: stage 1 groups by
    * (key, salt) — salt derived deterministically from a high-cardinality
    * column — spreading one hot key across `nSalts` reducers; stage 2
    * re-sums the per-salt partials by key alone. AQE's skew handling splits
    * skewed JOIN partitions, but a skewed aggregation key still funnels its
    * entire post-combine partial stream into ONE reducer; salting is the
    * standard fix when a hot key (one antenna carrying 30% of a 100 TB
    * feed) overwhelms a single task. Exact-decimal partials ([[Num]]) make
    * the two-stage result bit-identical to the direct sum (associativity) —
    * a pure physical rewrite, oracle-checkable against the plain GROUP BY.
    */
  def saltedSum(df: DataFrame, key: Column, saltSrc: Column, nSalts: Int,
                value: Column, as: String): DataFrame = {
    require(nSalts > 0)
    df.groupBy(key.as("id"), pmod(xxhash64(saltSrc), lit(nSalts)).as("__salt"))
      .agg(Num.dsumDec(value).as("__part"))
      .groupBy("id").agg(sum(col("__part")).cast("double").as(as))
  }
}
