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
  /** FREQUENT TRIPLES via the APRIORI candidate-pruning step (Agrawal &
    * Srikant 1994) — the level-3 extension of [[frequentPairs]]: a naive
    * per-basket triple explode is C(n,3) (cubic in basket width, the
    * blow-up that kills market-basket mining at catalog scale), but every
    * frequent triple's three sub-pairs are provably frequent, so the
    * basket first DROPS items in no frequent pair, expands only (a,b)
    * legs that ARE frequent pairs, attaches c > b from the same reduced
    * basket, and prunes the (b,c) and (a,c) legs before the exact count —
    * recall-exact (monotonicity: support(triple) ≤ support(any sub-pair))
    * with the explode volume bounded by the frequent-pair structure, not
    * the raw basket width.
    *
    * Shape at scale: the frequent-pair list checkpoints once
    * (pair-vocabulary sized; four consumers) and every prune is a
    * semi-join against it (AQE broadcasts while it fits, never a hint);
    * the two corpus passes (pair counting, reduced-basket rebuild) are
    * Apriori's inherent level structure. Output: (part_a, part_b,
    * part_c, n_orders), a < b < c, exact support ≥ minSupport. */
  def frequentTriples(lineitem: DataFrame, minSupport: Long): DataFrame = {
    import graft.functions.VectorExpressions.pairExpandNative
    val lowMask = lit(0xffffffffL)
    val pairs = frequentPairs(lineitem, minSupport)
      .select(shiftleft(col("part_a"), 32).bitwiseOR(col("part_b")).as("pp"))
      .localCheckpoint()
    val items = pairs.select(shiftright(col("pp"), 32).as("l_partkey"))
      .union(pairs.select(col("pp").bitwiseAND(lowMask).as("l_partkey")))
      .distinct()
    val reduced = lineitem.select(col("l_orderkey"), col("l_partkey"))
      .join(items, Seq("l_partkey"), "left_semi")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .where(size(col("ps")) >= 3)
    val ab = reduced.select(col("ps"),
        explode(pairExpandNative(col("ps"))).as("pp"))
      .join(pairs, Seq("pp"), "left_semi")
    val bOf = col("pp").bitwiseAND(lowMask)
    val abc = ab
      .select(col("pp").as("ab"),
        explode(filter(col("ps"), c => c > bOf)).as("pc"))
      .withColumn("bc", shiftleft(col("ab").bitwiseAND(lowMask), 32)
        .bitwiseOR(col("pc")))
      .withColumn("ac", shiftleft(shiftright(col("ab"), 32), 32)
        .bitwiseOR(col("pc")))
      .join(pairs.select(col("pp").as("bc")), Seq("bc"), "left_semi")
      .join(pairs.select(col("pp").as("ac")), Seq("ac"), "left_semi")
    abc.groupBy("ab", "pc").agg(count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= minSupport)
      .select(shiftright(col("ab"), 32).as("part_a"),
        col("ab").bitwiseAND(lowMask).as("part_b"),
        col("pc").as("part_c"), col("n_orders"))
      .orderBy("part_a", "part_b", "part_c")
  }

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
