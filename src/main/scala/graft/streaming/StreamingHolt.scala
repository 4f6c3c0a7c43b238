package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming Holt linear-trend smoothing — the stateful-streaming dual
  * of [[graft.operators.StatTests.holtForecast]] (q281), maintaining the
  * forecast model ONLINE as the sink seals new daily partitions: each
  * micro-batch of (day, revenue) rows folds into the coupled
  * level/trend recurrence and emits the refreshed model plus the
  * NEXT-day forecast — the changelog a forecasting dashboard ingests.
  *
  * State is THREE numbers (level, trend, day count) for the one global
  * model — constant size, the q70 state-boundedness contract (a
  * per-series variant would key by series id exactly like
  * [[StreamingEwma]]; the day table itself is calendar-bounded so a
  * single key is not a skew concern). Within a batch, days fold in day
  * order; across batches, arrival order is stream order — the same
  * contract the sessionizer and EWMA duals document. α=0.25 / β=0.125
  * are the batch dual's exact binary fractions, so slicing the stream
  * anywhere yields bit-identical final state to the batch closed run —
  * asserted in the spec. */
object StreamingHolt {

  final case class DayRev(day: String, rev: Double)
  final case class HoltState(level: Double, trend: Double, n: Long)
  final case class HoltOut(
      day: String, level: Double, trend: Double, next_forecast: Double, n_days: Long)

  private def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  /** `daily` must carry (day: string "yyyy-MM-dd", rev: double) rows —
    * the grain the batch dual aggregates to before its recurrence. */
  def dailyHolt(
      spark: SparkSession,
      daily: DataFrame,
      alpha: Double = 0.25,
      beta: Double = 0.125): Dataset[HoltOut] = {
    import spark.implicits._
    daily
      .selectExpr("day", "rev")
      .as[DayRev]
      .groupByKey(_ => 0)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (_: Int, batch: Iterator[DayRev], state: GroupState[HoltState]) =>
          val sorted = batch.toSeq.sortBy(_.day)
          var s = state.getOption.getOrElse(HoltState(0.0, 0.0, 0L))
          var lastDay = ""
          sorted.foreach { d =>
            s =
              if (s.n == 0L) HoltState(d.rev, 0.0, 1L)
              else {
                val lNew = alpha * d.rev + (1.0 - alpha) * (s.level + s.trend)
                HoltState(
                  lNew,
                  beta * (lNew - s.level) + (1.0 - beta) * s.trend,
                  s.n + 1L)
              }
            lastDay = d.day
          }
          state.update(s)
          // next_forecast is the model's one-step-ahead prediction FROM
          // the refreshed state — what the dual computes as day t+1's fc
          HoltOut(lastDay, r4(s.level), r4(s.trend), r4(s.level + s.trend), s.n)
      }
  }
}
