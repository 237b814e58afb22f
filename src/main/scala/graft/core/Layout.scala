package graft.core

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical data layout for repeated-join/aggregation workloads: bucketing.
  *
  * The reference engine is single-node and has no layout tier; on a
  * cluster, layout is THE lever that removes per-query shuffles of a
  * 100 TB fact table. Writing a table bucketed (and bucket-sorted) by its
  * join/group key hash-pre-partitions it ON DISK into a fixed number of
  * buckets: every later equi-join against a table bucketed the same way,
  * and every aggregation keyed on the bucket column, reads co-located
  * buckets and satisfies Catalyst's distribution requirement WITHOUT an
  * Exchange — the shuffle is paid once at write time, amortized over every
  * subsequent query (LayoutSpec asserts the zero-Exchange plans).
  *
  * Scale notes:
  *  - Pick numBuckets ≈ cluster cores × small factor; both join sides must
  *    use the SAME bucket count (Spark joins bucketed tables shuffle-free
  *    only on matching counts; a mismatched side falls back to a shuffle).
  *  - `sortBy` on the bucket key additionally elides the per-task sort of
  *    sort-merge joins and gives row-group min/max locality for key
  *    predicates.
  *  - Bucketed tables must be managed/catalog tables (`saveAsTable`) — the
  *    bucket spec lives in the catalog, not the parquet footers.
  */
object Layout {

  /** Write `df` as a bucketed (optionally bucket-sorted) managed parquet
    * table. One shuffle now; zero shuffles for every later equi-join or
    * keyed aggregation on `bucketCol` against same-count tables. */
  /** @param path when set, the table is EXTERNAL with its data at `path`
    *             (the bucket spec still lives in the catalog) — lets
    *             harness runs stage bucketed data in scratch space instead
    *             of the session warehouse dir. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sorted: Boolean = true,
                    mode: SaveMode = SaveMode.Overwrite,
                    path: Option[String] = None): Unit = {
    val w0 = df.write.mode(mode).format("parquet").bucketBy(numBuckets, bucketCol)
    val w1 = path.fold(w0)(p => w0.option("path", p))
    (if (sorted) w1.sortBy(bucketCol) else w1).saveAsTable(table)
  }

  /** Repartition-and-sort layout for an intermediate frame consumed
    * several times on the same key in ONE job (no catalog needed): the
    * exchange is planned once and downstream consumers hit Spark's
    * exchange-reuse instead of re-shuffling.
    *
    * Caveat (pinned by LayoutSpec): reuse requires the consumers' subplans
    * to be IDENTICAL — Catalyst dedups by subtree equality, and column
    * pruning pushes each consumer's projection below the exchange, so two
    * consumers needing different column sets get two different exchanges.
    * Project the union of the columns every consumer needs BEFORE calling
    * this; for divergent consumers use a bucketed table ([[writeBucketed]])
    * or df.persist() instead. */
  def clusterBy(df: DataFrame, key: String, partitions: Int): DataFrame =
    df.repartition(partitions, df(key)).sortWithinPartitions(key)

  /** Morton (Z-order) interleave of two non-negative 32-bit keys into one
    * 64-bit curve key — multi-dimensional clustering, the data-skipping
    * layout for tables filtered on MORE THAN ONE column (bucketing and
    * single-column sort cluster one key; a scan filtered on the other
    * reads everything). Pure codegen'd column arithmetic (the classic
    * bit-spreading with five shift-mask rounds) — no UDF, no custom
    * expression needed. Keys outside [0, 2³²) must be pre-coded
    * (rank/bucket/offset) by the caller, the standard z-order contract. */
  def zorderKey(a: Column, b: Column): Column = {
    def spread(c: Column): Column = {
      // 32 bits → the even bit positions of a long
      var x = c.cast("long").bitwiseAND(lit(0xffffffffL))
      x = (x bitwiseOR shiftleft(x, 16)) bitwiseAND lit(0x0000FFFF0000FFFFL)
      x = (x bitwiseOR shiftleft(x, 8))  bitwiseAND lit(0x00FF00FF00FF00FFL)
      x = (x bitwiseOR shiftleft(x, 4))  bitwiseAND lit(0x0F0F0F0F0F0F0F0FL)
      x = (x bitwiseOR shiftleft(x, 2))  bitwiseAND lit(0x3333333333333333L)
      (x bitwiseOR shiftleft(x, 1)) bitwiseAND lit(0x5555555555555555L)
    }
    spread(a) bitwiseOR shiftleft(spread(b), 1)
  }

  /** Write `df` Z-ORDERED on two columns: range-partition by the Morton
    * key (contiguous curve segments → files), sort within each partition
    * by it, write plain parquet. Every file then covers a small rectangle
    * of the (a, b) space, so parquet footer min/max statistics prune
    * files/row-groups for predicates on EITHER column (~√F of F files per
    * point query, vs all F for the non-clustered column of a single-sort
    * layout — LayoutSpec measures both). One range shuffle at write time,
    * amortized over every later scan; no catalog requirement (footer
    * stats travel with the files, unlike the bucket spec). */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    path: String, files: Int): Unit =
    df.withColumn("__z", zorderKey(col(colA), col(colB)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
}
