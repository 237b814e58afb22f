package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism control for compute-bound narrow stages.
  *
  * A small parquet file arrives as ONE input split, and every narrow
  * operator downstream of it (vector scoring, signature hashing,
  * per-partition codecs, nested-loop pair joins) inherits that parallelism —
  * one core does all the work no matter how many the cluster has. For
  * stages whose compute-per-byte is enormous (ANN scoring: ~10⁶ FLOPs per
  * input KB), an explicit repartition to cluster parallelism costs a
  * negligible shuffle of the small input and unlocks every core. The same
  * holds on a real cluster: match heavy-stage parallelism to cores, not to
  * input splits.
  */
object Par {
  /** Repartition up to the session's default parallelism (never down). */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
