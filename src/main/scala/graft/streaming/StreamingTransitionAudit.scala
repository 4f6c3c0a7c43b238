package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import java.sql.Timestamp

/** Streaming dual of the batch transition-rule audit (q304): illegal
  * per-user transitions surface AT INGEST instead of in a nightly
  * sweep — the difference between alerting on broken instrumentation
  * in minutes vs discovering a day of bad data at seal time.
  *
  * `flatMapGroupsWithState` keyed by user; state is the user's LAST
  * event (ts, event_id, type) — ONE small tuple per live user,
  * constant-size, so unbounded streams run forever (the q70
  * state-boundedness contract). Each micro-batch is folded in
  * (ts, event_id) order; the carried last-event chains transitions
  * ACROSS batch boundaries, so slicing never hides a violation —
  * asserted ≡ batch q304 in the spec. */
object StreamingTransitionAudit {

  final case class TEvent(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)
  final case class LastEvent(ts: Long, event_id: Long, event_type: String)
  final case class Violation(user_id: Long, prev_type: String, next_type: String, event_id: Long)

  val defaultAllowed: Set[(String, String)] = Set(
    "signup" -> "view", "signup" -> "click", "signup" -> "error",
    "view" -> "view", "view" -> "click", "view" -> "error",
    "click" -> "view", "click" -> "click", "click" -> "purchase",
    "click" -> "error",
    "purchase" -> "view", "purchase" -> "click",
    "error" -> "view", "error" -> "signup")

  def violations(
      spark: SparkSession,
      events: DataFrame,
      allowed: Set[(String, String)] = defaultAllowed): Dataset[Violation] = {
    import spark.implicits._
    events
      .selectExpr("event_id", "ts", "user_id", "event_type")
      .as[TEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[TEvent], state: GroupState[LastEvent]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var last = state.getOption
          val out = Seq.newBuilder[Violation]
          sorted.foreach { e =>
            last.foreach { p =>
              if (!allowed.contains(p.event_type -> e.event_type))
                out += Violation(uid, p.event_type, e.event_type, e.event_id)
            }
            last = Some(LastEvent(e.ts.getTime, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }
}
