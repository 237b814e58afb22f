package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply (MERGE/upsert): fold a batch of row-level change events into a
  * base snapshot, producing the next snapshot.
  *
  * Change rows carry a FULL new row image (Debezium-style "after" image),
  * an op tag (insert / update / delete — only delete changes behavior; I
  * and U both mean "the row now looks like this"), and a monotone sequence
  * (log offset). Per key the HIGHEST sequence wins — a delete followed by a
  * re-insert resurrects the row; an earlier update under a later delete is
  * dead. (key, seq) must be unique, which real change logs guarantee by
  * construction (one offset per record).
  *
  * Scale shape: latest-change-per-key is a WindowGroupLimit-able
  * row_number over the CHANGE BATCH only (shuffled by key — the batch,
  * typically ≪ the snapshot, never the snapshot itself), then ONE
  * full-outer equi-join against the base. Both sides are SF-scaled, so no
  * broadcast hint — AQE picks one while the batch fits. This is the plan a
  * lakehouse MERGE INTO executes; no per-row lookups, no driver state.
  */
object Cdc {

  /** @param base    current snapshot; all columns are payload except `key`
    * @param changes change batch: `key`, full payload image, `seq`, `op`
    * @param deleteOp value of `op` marking a delete (payload ignored) */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
                   seq: String, op: String, deleteOp: String = "D"): DataFrame = {
    val payload = base.columns.filterNot(_ == key).toSeq
    val w = Window.partitionBy(col(key)).orderBy(col(seq).desc)
    val latest = changes
      .select(col(key) +: col(seq) +: col(op).as("__op") +:
        payload.map(c => col(c).as(s"__c_$c")): _*)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", seq)
    base.join(latest, Seq(key), "full_outer")
      .where(col("__op").isNull || col("__op") =!= deleteOp)
      // full-row-image semantics: a surviving change replaces the whole
      // row (NULLs in the image are real NULLs, not "keep old value")
      .select(col(key) +: payload.map(c =>
        when(col("__op").isNotNull, col(s"__c_$c")).otherwise(col(c)).as(c)): _*)
  }
}
