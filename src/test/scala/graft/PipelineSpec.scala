package graft

import graft.operators.EventAnalytics
import graft.sources.{Tables, TextEvents}
import graft.streaming.{EventParser, HiveBatchSink}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Capstone: the reference's whole reason to exist, end to end —
  * delimited log lines → streaming parse → staged Hive-layout writes →
  * watermark close → sealed warehouse table → catalog registration →
  * downstream analytics agree with the source of truth. */
class PipelineSpec extends SparkSpec {

  test("log lines to warehouse analytics, end to end") {
    val logDir = Files.createTempDirectory("graft-pipe-in").toString
    val root   = Files.createTempDirectory("graft-pipe-root").toString
    val ckpt   = Files.createTempDirectory("graft-pipe-ck").toString

    // 1. the "Flume" world: raw delimited log lines on disk
    val events = Tables(spark, sfDir).events
    EventParser.formatLines(events).write.mode("overwrite").text(logDir)

    // 2. stream-parse and sink through the full lifecycle
    val sink = new HiveBatchSink(spark, root, allowedLatenessMinutes = 60)
    val q = sink.streamWriter(TextEvents.readStream(spark, logDir), ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // 3. conservation: staged + sealed == everything received
    val sealedRows = sink.readTable()
    val stagedRows = spark.read.parquet(sink.stagingPath)
    assert(sealedRows.count() + stagedRows.count() == events.count())
    assert(sink.received.value == events.count() && sink.corrupt.value == 0)

    // 4. catalog surface + downstream analytics agree with the source
    sink.registerTable("pipe_events")
    val warehouse = spark.table("pipe_events")
    val byType  = warehouse.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val srcByType = events
      .join(sealedRows.select("event_id"), "event_id") // same population
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == srcByType, s"$byType vs $srcByType")

    // 5. hourly rollup over the warehouse equals rollup over the same slice
    val wh  = EventAnalytics.hourlyRollup(warehouse.select(events.columns.map(col): _*))
    val src = EventAnalytics.hourlyRollup(events.join(sealedRows.select("event_id"), "event_id"))
    assert(wh.collect().toSeq == src.collect().toSeq)
  }

  test("checkpoint restart: the sink resumes where it stopped, replays nothing, loses nothing") {
    val landing = Files.createTempDirectory("graft-restart-in").toString
    val root    = Files.createTempDirectory("graft-restart-root").toString
    val ckpt    = Files.createTempDirectory("graft-restart-ck").toString
    val events  = Tables(spark, sfDir).events
    val sink    = new graft.streaming.HiveBatchSink(spark, root, allowedLatenessMinutes = 60)
    val schema  = events.schema

    def runToCompletion(): Unit = {
      val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(landing)
      val q = sink.streamWriter(stream, ckpt).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def ingested(): org.apache.spark.sql.DataFrame =
      sink.readTable().select("event_id")
        .unionByName(spark.read.parquet(sink.stagingPath).select("event_id"))

    // run 1: first half of the stream arrives and is fully processed
    events.filter(col("event_id") % 2 === 0).repartition(2).write.mode("append").parquet(landing)
    runToCompletion()
    val afterFirst = ingested().count()
    assert(afterFirst == events.filter(col("event_id") % 2 === 0).count())

    // run 2 (restart, same checkpoint): only the NEW files are processed
    events.filter(col("event_id") % 2 === 1).repartition(2).write.mode("append").parquet(landing)
    runToCompletion()
    assert(ingested().count() == events.count(), "second run must pick up exactly the new half")
    assert(ingested().distinct().count() == events.count(), "no event may be ingested twice")

    // run 3 (restart with nothing new): a pure no-op
    runToCompletion()
    assert(ingested().count() == events.count(), "an idle restart must not re-ingest")
  }
}
