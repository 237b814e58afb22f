package graft.core

import java.time.LocalDateTime
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
    // typed LocalDateTime literals resolve as TIMESTAMP_NTZ — the events
    // table's physical type — so the comparison needs no cast on the column
    // side and the range reaches the scan's PushedFilters
    val start = LocalDateTime.of(year, month, day, hour, 0, 0)
    df.where(col(tsCol) >= lit(start) && col(tsCol) < lit(start.plusHours(1)))
  }
}
