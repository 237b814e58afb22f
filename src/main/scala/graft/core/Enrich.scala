package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** The reference's single join (survey §2.4 J1): enrich the fact stream with
  * a small user-metadata dimension, inner equi-join, dropping the duplicated
  * right-side key (`BatchJobImpl.scala:40-44`).
  *
  * Scale: the dimension is tiny relative to the fact (20 rows in the
  * reference; `customer` in the test data), so we broadcast it explicitly
  * rather than relying on the auto-broadcast threshold — at 100 TB the fact
  * side must never shuffle for this join. If the dimension ever outgrows
  * broadcast range, drop the hint and pre-bucket both sides on the key.
  */
object Enrich {

  /** fact ⋈ dim on `factKey === dimKey` (inner), keeping all fact columns
    * and the dim columns except its join key. */
  def enrich(fact: DataFrame, dim: DataFrame,
             factKey: String, dimKey: String): DataFrame =
    fact.join(broadcast(dim), fact(factKey) === dim(dimKey), "inner")
      .drop(dim(dimKey))
}
