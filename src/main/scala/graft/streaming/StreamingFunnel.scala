package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming sessionized funnel — the stateful-streaming dual of the
  * batch funnel (q76, [[graft.operators.EventAnalytics.funnel]]):
  * view → click-after-first-view → purchase-after-that-click, decided
  * per user with watermark-driven emission.
  *
  * Exactness under disorder: the per-user reduction is ORDER-
  * INSENSITIVE, so any within- or cross-batch arrival order yields the
  * batch answer. State per user is
  *
  *   - `vMin` — min view time seen (a late view can only lower it);
  *   - the min click ≥ vMin (the current stage-2 candidate) plus every
  *     click in [watermark, vMin) — a click below BOTH the watermark
  *     and vMin can never qualify (any future view arrives ≥ the
  *     watermark, so the final vMin is ≥ min(vMin, watermark)) and is
  *     dropped for good;
  *   - symmetrically for purchases against the click candidate.
  *
  * The buffers are therefore bounded by one user's funnel events
  * within the WATERMARK HORIZON, not stream length — the property that
  * keeps this runnable forever. A user emits ONE row (stage-reached
  * flags) when the event-time timeout fires `horizonMinutes` past
  * their last funnel event; global stage counts are then an ordinary
  * aggregate of the emitted rows ([[funnelCounts]]), ≡ q76 on any
  * fully-finalized slice.
  *
  * The ≡-batch guarantee requires the horizon to dominate BOTH the
  * arrival disorder (the standard watermark contract — an event later
  * than the horizon is dropped) AND each user's within-slice
  * inactivity gaps: a user silent for more than the horizon is
  * finalized, and a subsequent burst opens a NEW funnel row for the
  * same user — session semantics, deliberate for an unbounded stream,
  * but a row-count divergence from the one-row-per-user batch query.
  * Size `horizonMinutes` to the finalization SLA, not the session gap,
  * when batch equality is the goal.
  */
object StreamingFunnel extends Serializable {

  final case class FEvent(ts: Timestamp, user_id: Long, event_type: String)

  /** vMin = Long.MaxValue ⇔ no view yet; clicks/purchases hold the
    * candidate min plus the sub-candidate buffer described above. */
  final case class FunnelState(vMin: Long, clicks: List[Long], purchases: List[Long])

  final case class UserFunnel(
      user_id: Long,
      reached_view: Boolean,
      reached_click: Boolean,
      reached_purchase: Boolean)

  private val NoTs = Long.MaxValue

  private def minQualifying(cands: List[Long], bound: Long): Long = {
    var m = NoTs
    var rest = cands
    while (rest.nonEmpty) {
      val t = rest.head
      if (t >= bound && t < m) m = t
      rest = rest.tail
    }
    m
  }

  def funnelStages(
      spark: SparkSession,
      events: DataFrame,
      horizonMinutes: Int = 60): Dataset[UserFunnel] = {
    import spark.implicits._
    val horizonMs = horizonMinutes.toLong * 60000L

    def finalize(uid: Long, s: FunnelState): UserFunnel = {
      val cF = minQualifying(s.clicks, s.vMin)
      val pF = minQualifying(s.purchases, cF)
      UserFunnel(uid, s.vMin < NoTs, cF < NoTs, pF < NoTs)
    }

    events
      .selectExpr("ts", "user_id", "event_type")
      .where(col("event_type").isin("view", "click", "purchase"))
      .withWatermark("ts", s"$horizonMinutes minutes")
      .as[FEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[FEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(finalize(uid, _)).iterator
            state.remove()
            out
          } else {
            var s = state.getOption.getOrElse(FunnelState(NoTs, Nil, Nil))
            var lastSeen = Long.MinValue
            batch.foreach { e =>
              val t = e.ts.getTime
              if (t > lastSeen) lastSeen = t
              e.event_type match {
                case "view"     => if (t < s.vMin) s = s.copy(vMin = t)
                case "click"    => s = s.copy(clicks = t :: s.clicks)
                case "purchase" => s = s.copy(purchases = t :: s.purchases)
              }
            }
            // prune: candidate min + still-revivable buffer (≥ watermark)
            val w    = state.getCurrentWatermarkMs()
            val cEff = minQualifying(s.clicks, s.vMin)
            val keptC = (if (cEff < NoTs) List(cEff) else Nil) :::
              s.clicks.filter(c => c < s.vMin && c >= w && c != cEff)
            val pEff = minQualifying(s.purchases, cEff)
            val keptP = (if (pEff < NoTs) List(pEff) else Nil) :::
              s.purchases.filter(p => p < cEff && p >= w && p != pEff)
            s = s.copy(clicks = keptC, purchases = keptP)
            state.update(s)
            // EventTimeTimeout must be set past the current watermark
            state.setTimeoutTimestamp(math.max(lastSeen + horizonMs, w + 1))
            Iterator.empty
          }
      }
  }

  /** q76's one-row stage counts from the emitted per-user rows. */
  def funnelCounts(stages: Dataset[UserFunnel]): DataFrame =
    stages.toDF().agg(
      count(when(col("reached_view"), 1)).as("n_view_users"),
      count(when(col("reached_click"), 1)).as("n_click_users"),
      count(when(col("reached_purchase"), 1)).as("n_purchase_users"))
}
