package graft.streaming

import org.apache.spark.sql.DataFrame

/** At-least-once delivery dedup — upstream transports (Flume channels,
  * Kafka, retried producers) re-deliver events; the reference absorbs
  * duplicates at the sink. Spark-first: `dropDuplicatesWithinWatermark`
  * keyed on the event id keeps ONE state entry per key only until the
  * watermark passes it, so state is bounded by (throughput × watermark),
  * not stream length — safe on an unbounded 100 TB/day stream. */
object StreamingDedup {

  def dedup(stream: DataFrame, idCol: String = "event_id", watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)
}
