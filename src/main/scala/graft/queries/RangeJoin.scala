package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 1-D range (interval) join: each point row joins every interval row whose
  * [lo, hi) contains it — an operator Spark's built-in joins only express as
  * a non-equi condition, which plans as BroadcastNestedLoopJoin (all-pairs
  * compare; dies when neither side broadcasts).
  *
  * Re-expressed Spark-first as BUCKETED blocking, the standard interval-
  * join decomposition (Flink's interval join and DuckDB's IEJoin solve the
  * same problem engine-side): quantize the line into fixed-width buckets,
  * explode each interval to the buckets it overlaps, map each point to its
  * single bucket, equi-join on the bucket id and re-check the exact
  * predicate as a residual. Correctness is exact — an interval overlaps the
  * point's bucket whenever it contains the point — and the plan is a plain
  * shuffle-or-broadcast HASH join keyed by bucket: no cartesian, no
  * nested-loop, pushdown/AQE all apply.
  *
  * Scale: shuffled rows = |points| + Σ per-interval ceil(len/width)+1.
  * Pick `bucketWidth` near the median interval length so most intervals
  * explode to ≤2 buckets; one very popular bucket (skew) splits fine under
  * AQE skew-join because the join is equi.
  */
object RangeJoin {

  /** Join `points` to every interval containing them.
    *
    * @param pointCol    numeric column on `points`
    * @param loCol/hiCol numeric bounds on `intervals`, half-open [lo, hi)
    * @param bucketWidth quantization width (> 0), ideally ≈ interval length
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bkt",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("__bkt",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(ib, Seq("__bkt"))
      .where(col(loCol) <= col(pointCol) && col(pointCol) < col(hiCol))
      .drop("__bkt")
  }
}
