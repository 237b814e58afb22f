package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence: frequent item PAIRS by A-priori-style
  * support counting.
  *
  * Baskets (orders) have a bounded line count, so intra-basket pair
  * expansion is O(k²) with small constant k — the candidate stream is at
  * most k²/2 × |baskets| rows, NOT a self-join of the item table (a
  * `lineitem ⋈ lineitem` formulation shuffles the fact table twice and
  * explodes on popular items; this shuffles it once, expands inside the
  * partial-agg stage, and map-side-combines the pair counts before the
  * second exchange). Pairs ride as packed longs
  * ([[graft.functions.PairExpandExpr]] — codegen'd, min<<32|max, loud
  * range check) until the final projection unpacks them.
  */
object Basket {

  /** Item pairs co-purchased in at least `minSupport` distinct baskets.
    * Output: `(part_a, part_b, n_orders)` with part_a < part_b. */
  def frequentPairs(lineitem: DataFrame, minSupport: Long): DataFrame =
    lineitem
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      // collect_set dedups a part repeated across an order's lines;
      // sort_array gives the ascending order PairExpandExpr packs as a<b
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(
        graft.functions.VectorExpressions.pairExpandNative(col("ps"))).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= minSupport)
      .select(shiftright(col("p"), 32).as("part_a"),
        col("p").bitwiseAND(lit(0xffffffffL)).as("part_b"),
        col("n_orders"))
      .orderBy("part_a", "part_b")
}
