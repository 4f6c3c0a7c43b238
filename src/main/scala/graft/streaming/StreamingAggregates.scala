package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked event-time aggregation — the streaming dual of
  * [[graft.operators.EventAnalytics.hourlyRollup]]. State is bounded by
  * the watermark (late data beyond it is dropped, matching the sink's
  * partition-close contract), so state-store size is O(open windows),
  * not O(stream length). */
object StreamingAggregates {

  def hourlyCounts(stream: DataFrame, watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value"))

  /** Hopping (sliding) windows on a stream — the streaming dual of
    * [[graft.operators.EventAnalytics.hoppingWindow]]. Each event feeds
    * window/slide open windows; state is still O(open windows × types)
    * because the watermark retires slid-past windows. */
  def hoppingCounts(
      stream: DataFrame,
      windowDur: String = "1 hour",
      slide: String = "15 minutes",
      watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value"))

  /** Streaming DAU (stream_dau) — the streaming dual of q121's daily
    * distinct-user count, with SKETCH state: `approx_count_distinct`
    * keeps one HLL++ sketch per open day window (KBs) instead of exact
    * distinct's per-user state (unbounded as users grow). Register
    * insertion is order-insensitive, so the streamed result is
    * IDENTICAL to running the same approximation in batch — asserted
    * in the spec, alongside a ≤5% bound vs the exact count. */
  def dailyActiveUsers(
      stream: DataFrame,
      watermark: String = "25 hours",
      rsd: Double = 0.02): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("dau_approx"))
      .select(col("window.start").as("day_start"), col("dau_approx"))
}
