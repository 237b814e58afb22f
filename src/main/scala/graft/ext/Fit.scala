package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed MODEL TRAINING with engine-exact arithmetic: full-batch
  * gradient descent for a linear probe (the classifier/regressor head a
  * data pipeline trains over engineered document features — quality
  * probes, filter heads, reward proxies), run entirely in scaled-BIGINT
  * fixed point so the whole optimization TRAJECTORY — every weight of
  * every iteration — is bit-identical on any engine, partitioning, or
  * summation order, and a SQL oracle can replay it step for step.
  *
  * Why exact: float GD accumulates per-shuffle-order rounding into the
  * weights, which compounds across iterations — two runs of the same job
  * agree only approximately, and an oracle can't value-check the result at
  * all. Integer GD makes training a deterministic query: weights are
  * `round(w · 2^scaleBits)`, residuals/gradients are exact integer sums,
  * and the learning-rate step is a truncating division (Scala `Long./`
  * truncates toward zero; the oracle mirrors it as sign-split floor
  * division, the km1 convention).
  *
  * The math, per iteration (X integer features, y integer target, S = 2^s,
  * η = 2^-e): R_i = Σ_j X_ij·W_j − y_i·S (scale S); G_j = Σ_i X_ij·R_i;
  * W_j ← W_j − G_j div (n·2^e); loss = Σ R_i² (reported at scale S²).
  * Overflow headroom: with |x| ≤ 100, |y| ≤ 1000, s = 16, residuals stay
  * < 2^26, per-row gradient terms < 2^33, and the global sums < 2^33·n —
  * Long-safe past 10⁹ rows; R² < 2^52 stays exactly representable in the
  * double the decimal accumulator ingests.
  *
  * Scale shape (the km1 discipline): one aggregate pass per iteration
  * over a persisted feature projection — map-side partials reduce each
  * partition to ONE row of (k gradients, n, loss), so per-iteration
  * shuffle and driver state are O(k). Choose η below 2/λ_max(XᵀX/n)
  * (≈ 2/(k·max|x|²)) or the descent oscillates; the spec pins a strictly
  * decreasing loss curve.
  */
object Fit {

  /** Train `iters` full-batch GD steps from W = 0; returns one row per
    * iteration: (iter, w_0..w_{k-1} scaled by 2^scaleBits, loss). */
  def linearProbeGd(df: DataFrame, features: Seq[Column], target: Column,
                    iters: Int, scaleBits: Int = 16, etaBits: Int = 15): DataFrame = {
    require(features.nonEmpty && iters >= 1)
    val k = features.size
    val spark = df.sparkSession
    val s = 1L << scaleBits
    val x = graft.core.Par.fanOut(df.select(
        features.zipWithIndex.map { case (c, i) => c.cast("long").as(s"x$i") } :+
        target.cast("long").as("y"): _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var w = Array.fill(k)(0L)
      val rows = (1 to iters).map { it =>
        val r = (0 until k).map(j => col(s"x$j") * lit(w(j))).reduce(_ + _) -
          col("y") * lit(s)
        val aggs = (0 until k).map(j =>
          sum(col(s"x$j") * r).as(s"g$j")) :+
          count(lit(1)).as("n") :+
          // R² < 2^52 is integer-exact in double; the decimal accumulator
          // keeps the SUM exact at any row count
          graft.core.Num.dsum((r * r).cast("double")).as("loss")
        val row = x.agg(aggs.head, aggs.tail: _*).collect()(0)
        val n = row.getAs[Long]("n")
        val loss = row.getAs[Double]("loss")
        val div = n * (1L << etaBits)
        // Scala Long division truncates toward zero for either sign; the
        // oracle mirrors it as sign-split floor division (DuckDB // floors)
        w = Array.tabulate(k)(j => w(j) - row.getAs[Long](s"g$j") / div)
        (it.toLong, w.toSeq, loss)
      }
      import spark.implicits._
      rows.map { case (it, ws, loss) => (it, ws, loss) }
        .toDF("iter", "w", "loss")
        .select(col("iter") +:
          (0 until k).map(j => col("w").getItem(j).as(s"w$j")) :+
          col("loss"): _*)
    } finally x.unpersist(blocking = false)
  }
}
