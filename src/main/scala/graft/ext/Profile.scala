package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** One-pass column profiler — the "describe my table" data-quality surface
  * (per column: non-null / null / exact-distinct counts, typed min/max).
  *
  * All metrics for all columns compute in ONE aggregate over ONE scan; the
  * per-column output rows are exploded from the single result row, so the
  * row-building step is O(columns), not a second pass. The exact
  * multi-column COUNT(DISTINCT) plans as a single Expand-based aggregate —
  * one scan, but the shuffle carries |cols| copies of each row; at the
  * 100 TB end swap `count_distinct` for `approx_count_distinct` (HLL++,
  * collapses the Expand — the apx1 sketch entry demonstrates that tier) and
  * keep everything else unchanged.
  *
  * Numeric columns report (min_num, max_num) as doubles; everything else
  * reports binary-collation (min_str, max_str) via an engine-portable
  * string cast (timestamps render zero-padded ISO, so lexicographic min =
  * chronological min).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val numeric = cols.map(c => c -> df.schema(c).dataType.isInstanceOf[NumericType]).toMap
    val aggs: Seq[Column] = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        count_distinct(col(c)).as(s"__d_$c"),
        (if (numeric(c)) min(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__mnn_$c"),
        (if (numeric(c)) max(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__mxn_$c"),
        (if (numeric(c)) lit(null).cast("string")
         else min(col(c).cast("string"))).as(s"__mns_$c"),
        (if (numeric(c)) lit(null).cast("string")
         else max(col(c).cast("string"))).as(s"__mxs_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__n_$c").as("n_nonnull"),
        (col("__total") - col(s"__n_$c")).as("n_null"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__mnn_$c").as("min_num"), col(s"__mxn_$c").as("max_num"),
        col(s"__mns_$c").as("min_str"), col(s"__mxs_$c").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
