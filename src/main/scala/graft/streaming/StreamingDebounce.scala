package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming dual of the q214 debounce rule — burst-opening events
  * surface AT INGEST instead of in a nightly audit: a row opens a burst
  * when it is the first of its (user, type) key or arrives more than
  * `gapSeconds` (event time) after the key's previous raw event.
  *
  * State is ONE long (the last seen event second) per live (user, type)
  * key — 8 bytes however long the stream runs, the same
  * bounded-per-key shape as stream_ewma. Within a micro-batch the
  * group iterator is re-sorted by (ts, event_id) so the rule is applied
  * in event order; across batches the carried second continues the
  * chain, so slicing the stream anywhere yields the batch answer
  * (asserted in StreamingDebounceSpec against
  * [[graft.operators.EventAnalytics.debounce]]). */
object StreamingDebounce {

  /** Burst-opening (user_id, event_type, event_id) rows, append-mode. */
  def opensBursts(spark: SparkSession, stream: DataFrame, gapSeconds: Int = 300): DataFrame = {
    import spark.implicits._
    stream
      .selectExpr("user_id", "event_type", "ts", "event_id")
      .as[(Long, String, java.sql.Timestamp, Long)]
      .groupByKey { case (u, t, _, _) => (u, t) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[(Long, String, java.sql.Timestamp, Long)],
         state: GroupState[Long]) =>
          val ordered = rows.toSeq.sortBy(r => (r._3.getTime, r._4))
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = Seq.newBuilder[(Long, String, Long)]
          ordered.foreach { case (_, _, ts, id) =>
            // floor to seconds — the exact arithmetic of the batch rule's
            // unix_timestamp difference
            val sec = Math.floorDiv(ts.getTime, 1000L)
            if (last == Long.MinValue || sec - last > gapSeconds)
              out += ((key._1, key._2, id))
            last = sec
          }
          state.update(last)
          out.result().iterator
      }
      .toDF("user_id", "event_type", "event_id")
  }
}
