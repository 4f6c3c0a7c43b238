package graft

import graft.operators.EventAnalytics
import graft.sources.Tables
import graft.streaming.StreamingRetention
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** stream_retention: the live weekly retention triangle is
  * ROW-IDENTICAL to batch q417 over the same events on any stream
  * prefix, survives a replayed batch, and REASSIGNS a user's cohort
  * when a late batch reveals an earlier first week. */
class StreamingRetentionSpec extends SparkSpec {
  lazy val events = Tables(spark, sfDir).events

  test("incremental batches ≡ the batch q417 triangle; replay idempotent") {
    val root = Files.createTempDirectory("graft-ret").toString
    // 3 arrival batches split by event_id (arrival order ≠ event time,
    // deliberately: retention must not depend on arrival order)
    (0 until 3).foreach { b =>
      StreamingRetention.updateIncidence(
        events.filter(pmod(col("event_id"), lit(3)) === b), root, batchId = b)
    }
    // replay batch 1 — must overwrite its own slice exactly
    StreamingRetention.updateIncidence(
      events.filter(pmod(col("event_id"), lit(3)) === 1), root, batchId = 1)

    val streamed = StreamingRetention.retentionReport(spark, root).collect().toSeq
    val batch = EventAnalytics.retentionTriangle(events).collect().toSeq
    assert(streamed == batch,
      s"streamed triangle diverges from batch q417:\n$streamed\n$batch")
  }

  test("a mid-stream prefix equals the batch triangle over the prefix's events") {
    val root = Files.createTempDirectory("graft-ret2").toString
    val span = events.agg(max("event_id") + 1).head().getLong(0)
    val firstHalf = events.filter(col("event_id") * 2 < span)
    StreamingRetention.updateIncidence(firstHalf, root, batchId = 0)
    val streamed = StreamingRetention.retentionReport(spark, root).collect().toSeq
    val batch = EventAnalytics.retentionTriangle(firstHalf).collect().toSeq
    assert(streamed == batch, "prefix triangle must equal batch over the prefix")
  }

  test("a late batch revealing an earlier first week REASSIGNS the cohort") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-ret3").toString
    def ev(u: Long, day: String) = (u, java.sql.Timestamp.valueOf(s"$day 10:00:00"))
    // batch 0: user 7 first seen in week of Jan 8
    StreamingRetention.updateIncidence(
      Seq(ev(7, "2024-01-09")).toDF("user_id", "ts"), root, 0)
    val before = StreamingRetention.retentionReport(spark, root).collect()
    assert(before.map(_.getAs[String]("cohort_week")).toSet === Set("2024-01-08"))
    // batch 1 arrives LATE with a Jan 1-week event for the same user:
    // the cohort moves back a week and the old week becomes weeks_since=1
    StreamingRetention.updateIncidence(
      Seq(ev(7, "2024-01-02")).toDF("user_id", "ts"), root, 1)
    val after = StreamingRetention.retentionReport(spark, root).collect()
      .map(r => (r.getAs[String]("cohort_week"), r.getAs[Long]("weeks_since")) -> r).toMap
    assert(after.keySet === Set(("2024-01-01", 0L), ("2024-01-01", 1L)))
    assert(after(("2024-01-01", 1L)).getAs[Double]("retention") === 1.0)
  }
}
