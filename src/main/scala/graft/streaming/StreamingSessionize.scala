package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Gap-based sessionization over an event stream via
  * `flatMapGroupsWithState` — the stateful-streaming dual of
  * [[graft.operators.EventAnalytics.sessionize]].
  *
  * State per user is ONE open session (constant size); closed sessions
  * are emitted incrementally and the event-time timeout (watermark-driven)
  * flushes a session once `gap` has passed with no activity, so state
  * never grows with stream length — the property that keeps this runnable
  * forever on an unbounded 100 TB/day stream.
  */
object StreamingSessionize {

  final case class GEvent(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double, props: String)
  final case class OpenSession(startMs: Long, lastMs: Long, nEvents: Long)
  final case class SessionSummary(
      user_id: Long,
      start_ts: Timestamp,
      end_ts: Timestamp,
      n_events: Long,
      duration_s: Double)

  def sessionize(spark: SparkSession, events: DataFrame, gapMinutes: Int = 30): Dataset[SessionSummary] = {
    import spark.implicits._
    val gapMs = gapMinutes.toLong * 60000L

    def summary(uid: Long, s: OpenSession): SessionSummary =
      SessionSummary(uid, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.nEvents, (s.lastMs - s.startMs) / 1000.0)

    events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[GEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[GEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(summary(uid, _)).iterator
            state.remove()
            out
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var open   = state.getOption
            val closed = Seq.newBuilder[SessionSummary]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  open = Some(s.copy(lastMs = math.max(s.lastMs, t), nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed += summary(uid, s)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** The same sessionization via Spark's NATIVE `session_window` — no
    * user state-management code at all: the state store holds one
    * merging window per open (user, session) and the watermark emits a
    * session once its gap has passed (append mode). Batch dual:
    * [[graft.operators.EventAnalytics.sessionWindowNative]] (q95); the
    * emitted summaries match [[sessionize]] exactly (duration excludes
    * the trailing gap baked into session_window's `end`). */
  def sessionizeNative(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.functions._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("sw.start").as("start_ts"),
        col("n_events"),
        ((unix_micros(col("sw.end")) - unix_micros(col("sw.start")) - gapUs) / lit(1e6))
          .as("duration_s"))
  }
}
