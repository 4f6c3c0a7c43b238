package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the in-flight version of the batch attribution
  * range join (q45). Two live event streams are joined on key + an
  * event-time interval; watermarks on BOTH sides bound the join state,
  * so Spark can drop buffered rows once no future match is possible.
  * State per side is O(events within watermark horizon), independent of
  * total stream history — the property that keeps this runnable forever
  * at 100 TB/day. */
object StreamingJoins {

  /** Purchases within `windowMinutes` after a click by the same user,
    * joined while both streams are in flight.
    *
    * The time bound appears in the JOIN CONDITION (not a post-filter),
    * which is what lets the streaming engine derive the state eviction
    * policy: a click older than watermark + window can never match a
    * future purchase and is evicted. `joinType` may be "inner" or
    * "leftOuter" (unmatched clicks emit with null purchase once the
    * watermark passes their window). */
  def attributionJoin(
      clicks: DataFrame,
      purchases: DataFrame,
      windowMinutes: Int = 60,
      watermark: String = "2 hours",
      joinType: String = "inner"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermark)
    c.join(
        p,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") < col("c_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
        joinType)
      .select(col("user_id"), col("click_id"), col("purchase_id"), col("c_ts"), col("p_ts"))
  }

  /** Stream-STATIC enrichment: each micro-batch joined against a
    * bounded dimension table (the classic "attach user/account
    * attributes at ingest"). The static side is a plain DataFrame —
    * Spark re-plans it per micro-batch, broadcasts it when under the
    * autoBroadcast threshold, and needs NO join state at all (nothing
    * is buffered; the dim is available in full every batch). Left
    * join so events with no dimension row survive with nulls — at
    * ingest you enrich what you can and never drop data. */
  def enrichmentJoin(stream: DataFrame, dim: DataFrame, key: String = "user_id"): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}
