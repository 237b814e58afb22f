package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ENTITY RESOLUTION — record linkage across noisy copies of the same
  * real-world entity, the catalog/CRM cousin of document near-dup: match
  * rules combine an EXACT-key leg (shared identifier — SKU, phone,
  * normalized URL) with a FUZZY leg (name similarity), matched pairs close
  * transitively into entity clusters, and each cluster collapses to one
  * "golden record" by deterministic survivorship rules.
  *
  * Everything here composes operators this engine already grades:
  *  - fuzzy leg: [[Dedup.ngramJaccardPairs]] at n=1 — word-SET Jaccard
  *    over the name, with the full d2 scale machinery (inverted-index
  *    blocking, packed-long pairs, posting caps, sizes broadcast ceiling);
  *  - exact leg: distinct-value collapse → intra-group pair expansion
  *    (the CLAUDE.md pairwise rule — a key shared by k records expands
  *    map-side from ONE sorted list, never a self-join);
  *  - closure: [[Dedup.clusterRoots]] min-label fixpoint (components =
  *    entities; the root IS the minimum member id, which doubles as the
  *    deterministic golden id).
  *
  * Scale: both legs are blocked (no all-pairs anywhere), the closure is
  * the ccmp1 fixpoint (per-round cost = one edge shuffle), and
  * singletons never enter the fixpoint — they join back with
  * coalesce(root, id), so the iteration state is bounded by MATCHED
  * records, not the catalog.
  */
object EntityResolution {

  /** Entity membership: (id, component) for EVERY input record —
    * matched records share their cluster's min id as `component`,
    * singletons map to themselves. `keyCol` may be null (null keys match
    * nothing); `nameCol` drives the word-set Jaccard leg at
    * `minJaccard`.
    *
    * `records` is consumed three times (the id spine, the exact-key leg,
    * the fuzzy leg's fan-out) — each a column-pruned scan of two or three
    * columns. For a corpus-scale catalog where even pruned scans matter,
    * pass a persisted narrow projection and own the unpersist (the cur2
    * `materializeKept` contract); the default stays scan-per-consumer
    * because pinning a catalog-sized relation is a deployment decision,
    * not an operator default. */
  def matchComponents(records: DataFrame, idCol: String, nameCol: String,
                      keyCol: String, minJaccard: Double = 0.6): DataFrame = {
    val ids = records.select(col(idCol).cast("long").as("id"))
    // exact-key leg: one sorted member list per key value, expanded
    // map-side into packed pairs (groups are entity-sized, never corpus-
    // sized; a hot key is a data-quality signal upstream of this operator)
    val keyPairs = records
      .select(col(idCol).cast("long").as("id"), col(keyCol).as("k"))
      .where(col("k").isNotNull)
      .groupBy("k").agg(array_distinct(sort_array(collect_list(col("id")))).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(
        graft.functions.VectorExpressions.pairExpandNative(col("ids"))).as("p"))
      .select(call_function("shiftright", col("p"), lit(32)).as("id_a"),
        col("p").bitwiseAND(lit(0xffffffffL)).as("id_b"))
    // fuzzy leg: word-set Jaccard on the name — the PREFIX-FILTER
    // AllPairs join, not the full single-token inverted index: entity
    // names draw from small vocabularies (TPC-H's composite name space is
    // ~250 tokens), where full postings expand Σ C(df,2) ≈ 10⁸ candidate
    // pairs at 25 k records (measured 174 s at sf0.1); prefix posting
    // under the rarest-first order is recall-exact at the threshold and
    // collapses the quadratic df term (~3 s). Identical match semantics
    // (Jaccard over distinct hashed tokens), so downstream contracts and
    // oracles are unchanged.
    val namePairs = Dedup.setJaccardPairsPrefix(records, idCol, nameCol,
        minJaccard = minJaccard)
      .select(col("id_a"), col("id_b"))
    val comp = Dedup.clusterRoots(keyPairs.union(namePairs))
    ids.join(comp.select(col("id"), col("root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("component"))
  }
}
