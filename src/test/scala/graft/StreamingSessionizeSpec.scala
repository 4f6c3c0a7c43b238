package graft

import graft.streaming.StreamingSessionize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = Files.createTempDirectory("graft-sess").toString

  def ev(id: Long, minute: Long, uid: Long): (Long, Timestamp, Long, String, Double, String) =
    (id, new Timestamp(1700000000000L + minute * 60000L), uid, "click", 1.0, "{}")

  test("sessions split on gaps; timeout flushes the last open session") {
    // user 1: events at minutes 0,5,10 then 60,62 -> two sessions (3 + 2)
    // user 2: one event at minute 0 -> one session
    // sentinel at minute 1000 pushes the watermark far past every gap
    val rows = Seq(
      ev(1, 0, 1), ev(2, 5, 1), ev(3, 10, 1),
      ev(4, 60, 1), ev(5, 62, 1),
      ev(6, 0, 2),
      ev(99, 1000, 999))
    val in = tmp()
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(in)

    val stream = spark.readStream
      .schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val q = StreamingSessionize.sessionize(spark, stream, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val out = spark.table("sess_test")
      .select("user_id", "n_events", "duration_s")
      .as[(Long, Long, Double)].collect().toSet
    // user 1 session A: 3 events over 10 min; session B: 2 events over 2 min; user 2: singleton
    assert(out.contains((1L, 3L, 600.0)), s"missing session A in $out")
    assert(out.contains((1L, 2L, 120.0)), s"missing session B in $out")
    assert(out.contains((2L, 1L, 0.0)), s"missing singleton in $out")
  }

  test("sessionizer runs on the RocksDB state store (the 100 TB state backend)") {
    // HDFS-backed state keeps every key in executor heap — fine for toy
    // state, an OOM at billions of open sessions. RocksDB spills to
    // local disk with bounded memory; prove the stateful sessionizer is
    // backend-agnostic by running the same assertions on RocksDB.
    val key  = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rows = Seq(
        ev(1, 0, 1), ev(2, 5, 1), ev(3, 10, 1),
        ev(4, 60, 1), ev(5, 62, 1),
        ev(6, 0, 2),
        ev(99, 1000, 999))
      val in = tmp()
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(1).write.mode("overwrite").parquet(in)
      val stream = spark.readStream
        .schema(spark.read.parquet(in).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in)
      val q = StreamingSessionize.sessionize(spark, stream, gapMinutes = 30)
        .writeStream.format("memory").queryName("sess_rocks")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = spark.table("sess_rocks")
        .select("user_id", "n_events", "duration_s")
        .as[(Long, Long, Double)].collect().toSet
      assert(out.contains((1L, 3L, 600.0)) && out.contains((1L, 2L, 120.0)) && out.contains((2L, 1L, 0.0)),
        s"RocksDB-backed sessions wrong: $out")
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("streamed session counts are bounded by the batch sessionizer") {
    val t  = graft.sources.Tables(spark, sfDir)
    val in = tmp()
    t.events.write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(t.events.schema).parquet(in)
    val q = StreamingSessionize.sessionize(spark, stream, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_real")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sess_real")
    val batch    = graft.operators.EventAnalytics.sessionize(t.events)
    val batchTotal = batch.agg(sum("n_sessions")).first().getLong(0)
    // append mode can only emit closed sessions; never more than batch total
    assert(streamed.count() <= batchTotal)
    assert(streamed.count() > 0)
    // every emitted session is internally consistent
    streamed.select("n_events", "duration_s").as[(Long, Double)].collect().foreach {
      case (n, d) => assert(n >= 1 && d >= 0)
    }
  }

  test("native session_window stream (q95 dual) emits the same closed sessions as the stateful sessionizer") {
    val rows = Seq(
      ev(1, 0, 1), ev(2, 5, 1), ev(3, 10, 1),
      ev(4, 60, 1), ev(5, 62, 1),
      ev(6, 0, 2),
      ev(99, 1000, 999))
    val in = tmp()
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(in)
    val stream = spark.readStream
      .schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val q = graft.streaming.StreamingSessionize.sessionizeNative(stream, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_native")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("sess_native")
      .select("user_id", "n_events", "duration_s")
      .as[(Long, Long, Double)].collect().toSet
    assert(out.contains((1L, 3L, 600.0)), s"missing session A in $out")
    assert(out.contains((1L, 2L, 120.0)), s"missing session B in $out")
    assert(out.contains((2L, 1L, 0.0)), s"missing singleton in $out")
  }
}
