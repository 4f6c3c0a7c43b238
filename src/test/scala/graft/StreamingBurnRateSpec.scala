package graft

import graft.operators.EventAnalytics
import graft.sources.Tables
import graft.streaming.StreamingBurnRate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

/** stream_burn_rate: the watermarked daily aggregation lands the
  * IDENTICAL daily frame the q337 batch report scores, so the alert
  * report transfers to ingest unchanged (one scoring kernel). */
class StreamingBurnRateSpec extends SparkSpec {
  import spark.implicits._

  test("streamed daily counts ≡ batch daily frame; report ≡ q337 (sentinel-closed)") {
    val t = Tables(spark, sfDir)
    val events = t.events.select("event_id", "ts", "user_id", "event_type", "value")
    // sentinel 60 days past the corpus pushes the watermark beyond every
    // real day; its own (unclosed) window never emits — the established
    // StreamingFunnel/Sessionize discipline
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinel = Seq((-1L, new Timestamp(maxTs.getTime + 60L * 86400000L),
      -1L, "view", 0.0)).toDF("event_id", "ts", "user_id", "event_type", "value")

    val in = Files.createTempDirectory("graft-burn").toString
    // slices must be TIME-ordered (a bus replays roughly in order): an
    // id-sliced feed would put whole-month data in every slice and the
    // watermark from slice 0 would legitimately drop slices 1–2 as late
    (0 until 3).foreach { s =>
      val tmp = Files.createTempDirectory(s"graft-burn-s$s").toString
      val slice = events.filter(
        pmod(dayofmonth(col("ts")) - 1, lit(31)).divide(11).cast("int") === s)
      (if (s == 2) slice.unionByName(sentinel) else slice)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(in, f"slice$s%02d.parquet")
      Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + s * 60000L)
    }
    val base = spark.read.parquet(in)
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = StreamingBurnRate.dailyCounts(stream)
      .writeStream.format("memory").queryName("burn_daily")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamedDaily = spark.table("burn_daily")
    val batchDaily = EventAnalytics.dailyErrorCounts(events)
    val sKey = streamedDaily.collect()
      .map(r => r.getAs[String]("day") ->
        (r.getAs[Int]("eday"), r.getAs[Long]("n_events"), r.getAs[Long]("n_errors"))).toMap
    val bKey = batchDaily.collect()
      .map(r => r.getAs[String]("day") ->
        (r.getAs[Int]("eday"), r.getAs[Long]("n_events"), r.getAs[Long]("n_errors"))).toMap
    assert(sKey == bKey,
      s"streamed daily frame diverged from batch: ${sKey.size} vs ${bKey.size} days")

    // the shared kernel scores both frames to the same report
    val viaStream = StreamingBurnRate.report(streamedDaily).collect().map(_.toString).sorted
    val viaBatch = EventAnalytics.sloBurnRate(events).collect().map(_.toString).sorted
    assert(viaStream.sameElements(viaBatch), "alert report must transfer unchanged")
  }

  test("state is day-granular: one window row per day, not per event") {
    val t = Tables(spark, sfDir)
    val days = t.events.select(countDistinct(to_date(col("ts")))).head().getLong(0)
    // the aggregation key space IS the day calendar — constant-sized
    // state per SLO regardless of event volume
    val daily = EventAnalytics.dailyErrorCounts(t.events)
    assert(daily.count() == days)
  }
}
