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

  /** stream_srm: LIVE sample-ratio-mismatch guardrail — the streaming
    * dual of q429, watching the md5-parity arm split drift per day
    * WHILE the experiment runs instead of at readout time. Sketch
    * state like stream_dau (one HLL per open (day, arm) window);
    * register insertion is order-insensitive so the streamed counts
    * equal the batch approximation on any prefix slicing. */
  def srmArmCounts(
      stream: DataFrame,
      watermark: String = "25 hours",
      rsd: Double = 0.02): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .withColumn("arm", graft.operators.Relational.hashArm(col("user_id")))
      .groupBy(window(col("ts"), "1 day"), col("arm"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users"))
      .select(col("window.start").as("day_start"), col("arm"), col("n_users"))

  /** The alarm readout over the maintained (day, arm) counts — a tiny
    * batch view run per micro-batch (foreachBatch) or on the sink
    * table: chi-square of the observed split against 50/50, flagged at
    * p<0.001 (the q429 threshold). */
  def srmReadout(armCounts: DataFrame): DataFrame = {
    val piv = armCounts
      .groupBy("day_start")
      .agg(
        sum(when(col("arm") === "A", col("n_users")).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "B", col("n_users")).otherwise(0L)).as("n_b"))
    val chi2 = (col("n_a") - col("n_b")).cast("double") *
      (col("n_a") - col("n_b")).cast("double") / (col("n_a") + col("n_b")).cast("double")
    piv
      .filter(col("n_a") + col("n_b") > 0)
      .select(
        col("day_start"), col("n_a"), col("n_b"),
        chi2.as("chi2"),
        (chi2 > lit(10.8276)).as("srm_flag"))
      .orderBy("day_start")
  }
}
