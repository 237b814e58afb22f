package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric helpers that make aggregate results bit-deterministic.
  *
  * Summing doubles is order-dependent, and Spark's partial/final aggregation
  * order varies run to run — an oracle that hash-compares values would flake.
  * Casting each input to an exact decimal BEFORE the sum makes the arithmetic
  * associative (exact), so any summation order yields the same result; the
  * final cast back to double is then a single well-defined rounding. The same
  * trick is applied on the DuckDB oracle side
  * (`SUM(CAST(x AS DECIMAL(30,6)))`), so both engines agree bit-for-bit.
  *
  * This costs a little throughput vs native double sums, but it is the only
  * way to get reproducible aggregates on a 1000-executor cluster too — exact
  * decimal aggregation is the standard fix for non-reproducible double sums.
  */
object Num {
  private val Dec = DecimalType(30, 6)

  /** Exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Exact sum kept in decimal — for two-level aggregation (partial per
    * fine group, re-summed across grouping sets) where the cast to double
    * must happen only once, at the very end. */
  def dsumDec(c: Column): Column = sum(c.cast(Dec))

  /** Exact average of a double column, returned as double.
    * Division happens once, in double space, so both engines agree. */
  def davg(c: Column): Column =
    (sum(c.cast(Dec)).cast("double") / count(c)).cast("double")
}
