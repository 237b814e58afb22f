package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming quota alerts — the speed-layer twin of the batch
  * quota-violation report (survey A7): instead of an hourly batch HAVING,
  * emit an alert the moment a user's cumulative usage crosses quota.
  *
  * Custom state via `flatMapGroupsWithState` (survey T6 notes the reference
  * never needed one; this is the extension tier exercising it):
  *  - state per user = running usage total + whether already alerted
  *  - emits exactly ONE alert per user per quota crossing
  *  - state size is O(users), independent of stream length; pair with an
  *    event-time timeout in production to expire idle users.
  */
object QuotaAlert {

  case class Usage(id: String, bytes: Long, quota: Long)
  case class UsageState(total: Long, alerted: Boolean)
  case class Alert(id: String, usage: Long, quota: Long)

  def updateState(id: String, rows: Iterator[Usage],
                  state: GroupState[UsageState]): Iterator[Alert] = {
    val prev = state.getOption.getOrElse(UsageState(0L, alerted = false))
    var total = prev.total
    var quota = Long.MaxValue
    rows.foreach { r => total += r.bytes; quota = math.min(quota, r.quota) }
    val crossed = !prev.alerted && quota != Long.MaxValue && total > quota
    state.update(UsageState(total, prev.alerted || crossed))
    if (crossed) Iterator(Alert(id, total, quota)) else Iterator.empty
  }

  /** parsed device messages (id, bytes) joined with a quota dimension →
    * stream of alerts. Input must have columns id:string, bytes:long,
    * quota:long. */
  def alerts(usage: DataFrame): Dataset[Alert] = {
    val spark = usage.sparkSession
    import spark.implicits._
    usage.select(col("id"), col("bytes").cast("long"), col("quota").cast("long"))
      .as[Usage]
      .groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateState)
  }
}
