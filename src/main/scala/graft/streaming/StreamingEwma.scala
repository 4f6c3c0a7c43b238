package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Per-user streaming EWMA of purchase value — the stateful-streaming
  * dual of [[graft.operators.EventAnalytics.userEwma]] (q198), and the
  * online form of the smoothing the daily EWMA (q187) runs in batch:
  * the per-key "running customer value" feature online feature stores
  * maintain.
  *
  * State per user is TWO numbers (current smoothed value + count) —
  * constant size, so an unbounded stream runs forever (the q70
  * state-boundedness contract). The recurrence
  * `s ← α·v + (1−α)·s` folds each micro-batch in event-time order
  * (within-batch sort; cross-batch order is stream order, the same
  * contract the sessionizer documents). `mapGroupsWithState` in Update
  * mode emits each touched user's refreshed smoothed value per batch —
  * exactly the changelog an online store ingests. Because the batch
  * dual computes the SAME recurrence in closed form, slicing the stream
  * anywhere yields identical final values — asserted in the spec. */
object StreamingEwma {

  final case class PEvent(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  final case class EwmaState(ewma: Double, n: Long)
  final case class UserEwma(user_id: Long, ewma_value: Double, n_obs: Long)

  def userEwma(
      spark: SparkSession,
      events: DataFrame,
      alpha: Double = 0.3): Dataset[UserEwma] = {
    import spark.implicits._
    events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .filter("event_type = 'purchase'")
      .as[PEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[PEvent], state: GroupState[EwmaState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var s = state.getOption.getOrElse(EwmaState(0.0, 0L))
          sorted.foreach { e =>
            s =
              if (s.n == 0L) EwmaState(e.value, 1L)
              else EwmaState(alpha * e.value + (1 - alpha) * s.ewma, s.n + 1L)
          }
          state.update(s)
          UserEwma(uid, math.floor(s.ewma * 10000 + 0.5) / 10000, s.n)
      }
  }
}
