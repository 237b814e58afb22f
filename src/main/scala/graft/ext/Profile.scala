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

  /** RECALL-EXACT heavy hitters — every key with frequency ≥ n/k, found
    * WITHOUT shuffling the full key space: phase 1 runs MISRA–GRIES
    * (1982) with k counters inside each partition (per-partition
    * imperative state no relational aggregate expresses without first
    * shuffling every distinct key — the one shape where mapPartitions is
    * the honest tool, same justification as the multimodal codec probe),
    * phase 2 exactly counts ONLY the surviving candidates via a semi-join
    * and applies the threshold on exact integers.
    *
    * Recall proof (why no true hitter is lost): a key with global
    * frequency ≥ n/k must have local frequency ≥ nₚ/k in at least one
    * partition (else summing the strict inequalities gives < n/k), and
    * Misra–Gries with k counters retains every key whose local frequency
    * exceeds nₚ/(k+1) — each decrement round consumes k+1 occurrences, so
    * at most nₚ/(k+1) rounds ever happen, and nₚ/k > nₚ/(k+1). False
    * positives are killed by the exact phase-2 count, so the output is
    * exactly the oracle's HAVING count·k ≥ n set.
    *
    * Shape at scale: the projected key column persists once (two
    * consumers: the MG pass and the exact-count pass; the bounded total
    * count doubles as the cache materializer). Phase 1 shuffles NOTHING —
    * each task emits ≤ k candidate keys; phase 2's aggregate touches only
    * rows matching the ≤ k·partitions candidate set (never a hint — the
    * set is plan-bounded but scales with the task count, AQE broadcasts
    * while it fits). Exactly-(n/k)-threshold semantics; output ≤ k rows
    * by definition of the threshold. */
  def heavyHitters(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 2)
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(key.cast("string").as("key"))
      .where(col("key").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = keys.count()
    val cands = keys.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        counters.get(x) match {
          case Some(c) => counters.update(x, c + 1)
          case None if counters.size < k => counters.update(x, 1L)
          case None =>
            // decrement-all round: consumes k+1 occurrences (k counters
            // + the incoming key); snapshot first — no mutation mid-scan
            val snap = counters.keys.toArray
            var i = 0
            while (i < snap.length) {
              val c = counters(snap(i))
              if (c == 1L) counters.remove(snap(i))
              else counters.update(snap(i), c - 1)
              i += 1
            }
        }
      }
      counters.keysIterator
    }.toDF("key").distinct()
    val res = keys.join(cands, Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("n"))
      .where(col("n") * lit(k.toLong) >= lit(n))
      .select(col("key"), col("n").cast("long").as("n"))
      .localCheckpoint()   // ≤ k rows; lets the key cache release now
    keys.unpersist()
    res
  }
}
