package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide↔long reshaping — pivot (long → one column per category value) and
  * melt (wide → long), the report/feature-matrix surface every analytics
  * engine ends up needing.
  *
  * Scale rules:
  *   - Pivot takes an EXPLICIT value vocabulary. `pivot(col)` without
  *     values runs an eager DISTINCT job over the corpus to discover the
  *     columns (a full extra pass) and then builds one column per distinct
  *     value — unbounded output width on a 100 TB fact table. With the
  *     vocabulary given, the pivot plans as ONE hash aggregate whose
  *     per-group state is |values| cells (map-side combined, same shuffle
  *     as a plain groupBy) and the schema is fixed at plan time.
  *   - Melt is a pure projection (`stack`): rows × |cols| output, zero
  *     shuffles, no state.
  */
object Reshape {

  /** Per-key counts pivoted wide: one `n_<value>` LONG column per
    * vocabulary entry, absent combinations as 0 (count semantics), any
    * tag outside the vocabulary dropped at plan time. */
  def pivotCounts(df: DataFrame, key: Column, tag: Column,
                  values: Seq[String]): DataFrame = {
    require(values.nonEmpty)
    val wide = df.groupBy(key.as("id"))
      .pivot(tag.cast("string"), values)
      .agg(count(lit(1)))
    // pivot emits NULL for a (key, value) pair with no rows; count
    // semantics want 0 — coalesce and fix the column names in one pass
    wide.select(col("id") +: values.map(v =>
      coalesce(col(s"`$v`"), lit(0L)).cast("long").as("n_" + v)): _*)
  }

  /** Long-form melt of `cols` (wide columns → (id, name, value) rows) via
    * `stack` — the inverse reshape, a single codegen'd projection. */
  def melt(df: DataFrame, id: Column, cols: Seq[String],
           nameCol: String = "name", valueCol: String = "value"): DataFrame = {
    require(cols.nonEmpty)
    val pairs = cols.flatMap(c => Seq(lit(c), col(s"`$c`")))
    df.select(id.as("id"),
      stack(Seq(lit(cols.size)) ++ pairs: _*).as(Seq(nameCol, valueCol)))
  }
}
