package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SLO monitoring at ingest — the streaming dual of the q337 batch
  * burn-rate report: the data-sized work (counting events and errors
  * per day) runs as a WATERMARKED tumbling-window aggregation inside
  * the stream, and the alert arithmetic (fast/slow burn windows, the
  * two-window AND) runs over the resulting calendar-bounded daily
  * frame via exactly the batch kernel
  * ([[graft.operators.EventAnalytics.burnReport]]) — one scoring code
  * path, so a page threshold tuned on the batch report transfers to
  * the live monitor unchanged (the [[DriftMonitor]]/[[StreamingHbos]]
  * discipline).
  *
  * Scale anatomy: streaming state is one (day) window row per day
  * inside the watermark — constant-sized regardless of event volume;
  * the day grain derives from the SAME `to_date` the batch frame uses,
  * so the daily rows are bit-identical (asserted in the spec). Append
  * mode emits each day exactly once when the watermark passes it —
  * the finalized rows land in the daily count table the report reads. */
object StreamingBurnRate {

  /** Watermarked daily (eday, day, n_events, n_errors) aggregation —
    * the streaming producer of [[graft.operators.EventAnalytics
    * .dailyErrorCounts]]'s frame. 25h watermark: a full day of
    * lateness plus clock skew, after which the day's row finalizes. */
  def dailyCounts(events: DataFrame): DataFrame = events
    .withWatermark("ts", "25 hours")
    .groupBy(window(col("ts"), "1 day").as("w"))
    .agg(
      count(lit(1)).as("n_events"),
      sum((col("event_type") === "error").cast("long")).as("n_errors"))
    .select(
      datediff(to_date(col("w.start")), to_date(lit("1970-01-01"))).as("eday"),
      date_format(to_date(col("w.start")), "yyyy-MM-dd").as("day"),
      col("n_events"), col("n_errors"))

  /** Score a landed daily count table with the batch kernel. */
  def report(daily: DataFrame, budget: Double = 0.25): DataFrame =
    graft.operators.EventAnalytics.burnReport(daily, budget)
}
