package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Num

/** Time-series primitives over an event table: fixed-interval resampling
  * with gap fill + last-observation-carried-forward, and SCD2-style
  * attribute-history construction (the CDC "dimension history" build).
  *
  * Both are single-key-shuffle window formulations — no self-joins, no
  * driver-side materialization, per-key state bounded by that key's span.
  */
object TimeSeries {

  /** Fixed-interval resample with GAP FILL + LOCF: per-key `bucketSeconds`
    * sums of `value`, with every EMPTY bucket between a key's first and
    * last observation materialized (bucket_sum NULL, is_gap 1) and
    * `filled_sum` carrying the last non-null bucket sum forward — the
    * standard telemetry densification step before windowed models.
    *
    * Shape at scale: one shuffle to the (key, bucket) aggregate, a per-key
    * span aggregate (group count = |keys|), and `sequence()`-explode of the
    * missing grid — per-key output is span/bucket rows, generated on the
    * executors; nothing is global. The LOCF window sorts within key only.
    * Buckets are epoch-aligned tumbling windows, so the bucket timestamps
    * agree with SQL `time_bucket` in any engine. A key idle for years would
    * explode a long grid: bound the resample range upstream (the s2 slice
    * operator) if key lifetimes are unbounded.
    */
  def resampleLocf(df: DataFrame, key: Column, ts: Column, value: Column,
                   bucketSeconds: Long): DataFrame = {
    val dur = s"$bucketSeconds seconds"
    val perBucket = df
      .groupBy(key.as("key"), window(ts, dur).getField("start").as("bucket_ts"))
      .agg(Num.dsum(value).as("bucket_sum"))
    val grid = perBucket.groupBy("key")
      .agg(min("bucket_ts").as("b0"), max("bucket_ts").as("b1"))
      .select(col("key"), explode(sequence(col("b0"), col("b1"),
        expr(s"INTERVAL $bucketSeconds SECONDS"))).as("bucket_ts"))
    val w = Window.partitionBy("key").orderBy("bucket_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq("key", "bucket_ts"), "left")
      .withColumn("filled_sum", last(col("bucket_sum"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("bucket_sum").isNull.cast("int"))
      .select(col("key"), col("bucket_ts"), col("bucket_sum"),
        col("filled_sum"), col("is_gap"))
  }

  /** Fixed-interval resample with LINEAR INTERPOLATION — [[resampleLocf]]'s
    * smooth counterpart (LOCF holds, interp ramps): every gap bucket gets
    * prev + (next − prev) · (Δt_prev / Δt_span) between its neighboring
    * OBSERVED buckets. The grid spans each key's first→last observed
    * bucket, so every gap has both neighbors by construction — no
    * extrapolation arm.
    *
    * Same scale shape as LOCF: one (key, bucket) aggregate, executor-side
    * grid explode, and TWO frames over ONE key sort (the preceding
    * last-observation pair and the following first-observation pair — the
    * second Window reuses the first's exchange+sort, order already
    * satisfied). Determinism: bucket sums are exact-decimal doubles, the
    * interpolation is one fixed-order double expression over exact integer
    * second-offsets (ratio = Δt/Δspan, both engines correctly rounded),
    * emitted behind round(·, 6) — the st1/lm1 policy. */
  def resampleInterp(df: DataFrame, key: Column, ts: Column, value: Column,
                     bucketSeconds: Long): DataFrame = {
    val dur = s"$bucketSeconds seconds"
    val perBucket = df
      .groupBy(key.as("key"), window(ts, dur).getField("start").as("bucket_ts"))
      .agg(Num.dsum(value).as("bucket_sum"))
    val grid = perBucket.groupBy("key")
      .agg(min("bucket_ts").as("b0"), max("bucket_ts").as("b1"))
      .select(col("key"), explode(sequence(col("b0"), col("b1"),
        expr(s"INTERVAL $bucketSeconds SECONDS"))).as("bucket_ts"))
    val wb = Window.partitionBy("key").orderBy("bucket_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("key").orderBy("bucket_ts")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsTs = when(col("bucket_sum").isNotNull, col("bucket_ts"))
    val ratio =
      (unix_timestamp(col("bucket_ts")) - unix_timestamp(col("pt")))
        .cast("double") /
      (unix_timestamp(col("nt")) - unix_timestamp(col("pt"))).cast("double")
    grid.join(perBucket, Seq("key", "bucket_ts"), "left")
      .withColumn("pv", last(col("bucket_sum"), ignoreNulls = true).over(wb))
      .withColumn("pt", last(obsTs, ignoreNulls = true).over(wb))
      .withColumn("nv", first(col("bucket_sum"), ignoreNulls = true).over(wf))
      .withColumn("nt", first(obsTs, ignoreNulls = true).over(wf))
      .withColumn("interp_sum", round(
        when(col("bucket_sum").isNotNull, col("bucket_sum"))
          .otherwise(col("pv") + (col("nv") - col("pv")) * ratio), 6))
      .withColumn("is_gap", col("bucket_sum").isNull.cast("int"))
      .select(col("key"), col("bucket_ts"), col("bucket_sum"),
        col("interp_sum"), col("is_gap"))
  }

  /** SCD2 attribute history: collapse a keyed event log into the intervals
    * over which `attr` held each value — rows (key, attr, valid_from,
    * valid_to), valid_to NULL for the current run. `seq` breaks event-time
    * ties deterministically (pass a unique event id).
    *
    * Change points via lag, run numbering via a cumulative sum, one
    * group-by to the run's first timestamp, lead for the closing bound:
    * two window passes + one aggregate, all partitioned by key — the
    * linear-scan history build (same family as [[Sessionize]]), no
    * self-join, scales with the key with the most events.
    */
  def scd2History(df: DataFrame, key: Column, ts: Column, seq: Column,
                  attr: Column): DataFrame = {
    val w = Window.partitionBy("key").orderBy("ts", "seq")
    val prev = lag(col("attr"), 1).over(w)
    val runNo = sum(when(prev.isNull || prev =!= col("attr"), 1L).otherwise(0L))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.select(key.as("key"), ts.as("ts"), seq.as("seq"), attr.as("attr"))
      .withColumn("run_no", runNo)
      .groupBy("key", "run_no", "attr")
      .agg(min("ts").as("valid_from"))
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(Window.partitionBy("key").orderBy("run_no")))
      .select(col("key"), col("attr"), col("valid_from"), col("valid_to"))
  }

  /** Trailing-window anomaly score: hourly per-key totals, each scored
    * against the mean/stddev of the PRECEDING `window` hours (rows frame
    * [-window, -1] — the current hour never sees itself), emitted only
    * where the trailing window is full. The telemetry anomaly-detection
    * shape: one key shuffle, one sort, per-key state = `window` rows.
    *
    * Cross-engine determinism: hourly totals are exact integer micro-units
    * (SUM of floor(value·10⁶), the fb1s convention — floors agree
    * bit-for-bit and integer sums are order-free); the trailing sum and
    * sum-of-squares accumulate in DECIMAL(38,0) (exact — values are
    * ~10²⁰ ≪ 10³⁸; the DuckDB oracle uses HUGEINT, also exact), and the
    * mean/variance/z arithmetic happens once per row in double with an
    * identical formula on both sides (sqrt is IEEE-correctly-rounded;
    * `+1` regularizes a zero-variance window). Rounded to 6 decimals.
    */
  def hourlyAnomaly(df: DataFrame, key: Column, ts: Column, value: Column,
                    window: Int = 24): DataFrame = {
    val hourly = df
      .groupBy(key.as("id"), date_trunc("hour", ts).as("hour"))
      .agg(sum(floor(value * lit(1000000d)).cast("long")).as("vm"))
    val w = Window.partitionBy("id").orderBy("hour").rowsBetween(-window, -1)
    val dec = col("vm").cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val s = col("s_dec").cast("double")
    val ss = col("ss_dec").cast("double")
    val mean = s / window
    val variance = (ss - s * s / window) / (window - 1)
    hourly
      .select(col("id"), col("hour"), col("vm"),
        count(col("vm")).over(w).as("n"),
        sum(dec).over(w).as("s_dec"),
        sum(dec * dec).over(w).as("ss_dec"))
      .where(col("n") === window)
      .select(col("id"), col("hour").cast("timestamp_ntz").as("hour"), col("vm"),
        round((col("vm").cast("double") - mean) / sqrt(variance + lit(1.0)), 6)
          .as("zscore"))
  }
}
