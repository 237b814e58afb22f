package graft.core

import java.time.{LocalDateTime, ZoneOffset}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scan-pruning helpers.
  *
  * The reference's batch job filters one year/month/day/hour partition with
  * equality predicates on derived columns (`BatchJobImpl.scala:22-26`),
  * which works because its archive is directory-partitioned on those
  * columns. Over a flat timestamp column, `year(ts) = 2024 AND ...` is a
  * function of the column — unpushable, every row group gets read. The
  * equivalent half-open RANGE predicate on the raw column compares ts
  * against two literals, which pushes into the parquet scan (row-group
  * min/max pruning) and into partition pruning where the layout has it.
  * Semantics are identical; only the plan differs — this is the difference
  * between scanning 100 TB and scanning one hour of it.
  */
object Prune {

  /** Filter to exactly the (year, month, day, hour) slice, as a pushable
    * timestamp range. The wall-clock interpretation matches the UTC-pinned
    * sessions this engine runs with. */
  def hourSlice(df: DataFrame, tsCol: String,
                year: Int, month: Int, day: Int, hour: Int): DataFrame = {
    val start = LocalDateTime.of(year, month, day, hour, 0, 0)
    val end = start.plusHours(1)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    df.where(col(tsCol) >= lit(start.format(fmt)) && col(tsCol) < lit(end.format(fmt)))
  }

  /** Same slice over a raw epoch-NANOS long column (the events table's
    * physical ts). A long-range predicate pushes into the parquet scan even
    * though the derived timestamp column can't. */
  def hourSliceNanos(df: DataFrame, nanosCol: String,
                     year: Int, month: Int, day: Int, hour: Int): DataFrame = {
    val start = LocalDateTime.of(year, month, day, hour, 0, 0)
      .toEpochSecond(ZoneOffset.UTC) * 1000000000L
    val end = start + 3600L * 1000000000L
    df.where(col(nanosCol) >= lit(start) && col(nanosCol) < lit(end))
  }
}
