package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Num

/** Gap-based sessionization of an event stream (batch formulation).
  *
  * session boundary = event arriving more than `gap` after the previous
  * event of the same key; session number = running count of boundaries.
  * One shuffle (by key) + one sort (by ts) computes both window passes —
  * the standard linear-scan sessionizer, no self-join, no state blow-up.
  * The streaming equivalent is Spark's `session_window`
  * (graft.streaming.Speed covers the windowed-agg path).
  */
object Sessionize {

  /** Per-row session numbers: adds `session_no` (1-based per key). */
  def withSessionNo(df: DataFrame, key: Column, ts: Column, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts)
    val prev = lag(ts, 1).over(w)
    val isNew = when(prev.isNull ||
      unix_micros(ts.cast("timestamp")) - unix_micros(prev.cast("timestamp"))
        > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("session_no",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session aggregate: (key, session_no, session_start, n_events,
    * total_value). */
  def sessionStats(df: DataFrame, key: Column, ts: Column, value: Column,
                   gapSeconds: Long): DataFrame =
    withSessionNo(df, key, ts, gapSeconds)
      .groupBy(key.as("key"), col("session_no"))
      .agg(min(ts).as("session_start"),
        count(lit(1)).as("n_events"),
        Num.dsum(value).as("total_value"))
}
