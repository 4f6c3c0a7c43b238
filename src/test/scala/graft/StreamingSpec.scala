package graft

import graft.sources.Tables
import graft.streaming.{EventParser, HiveBatchSink, StreamingAggregates}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  lazy val t = Tables(spark, sfDir)

  def tmp(): String = Files.createTempDirectory("graft-stream").toString

  test("parser round-trips every event line (serialize -> parse == source)") {
    val events = t.events
    val parsed = EventParser.wellFormed(EventParser.parseLines(EventParser.formatLines(events)))
    assert(parsed.count() == events.count())
    assert(EventParser.corrupt(EventParser.parseLines(EventParser.formatLines(events))).count() == 0)
    // value + ts survive exactly (µs precision)
    val srcSum = events.agg(round(sum("value"), 4)).first().getDouble(0)
    val rtSum  = parsed.agg(round(sum("value"), 4)).first().getDouble(0)
    assert(srcSum == rtSum)
    val srcMax = events.agg(max("ts")).first().getTimestamp(0)
    val rtMax  = parsed.agg(max("ts")).first().getTimestamp(0)
    assert(srcMax == rtMax)
  }

  test("parser routes malformed lines to _corrupt, not to failure") {
    val lines  = Seq("1\t2024-01-01 00:00:00.000000\t7\tclick\t1.5\t{}", "garbage line with no tabs at all  ").toDF("value")
    val parsed = EventParser.parseLines(lines)
    assert(EventParser.wellFormed(parsed).count() == 1)
    assert(EventParser.corrupt(parsed).count() == 1)
  }

  test("sink lifecycle over a real stream: stage, close, seal, counters") {
    val in  = tmp(); val root = tmp(); val ckpt = tmp()
    val events = t.events
    events.write.mode("overwrite").parquet(in)
    val sink   = new HiveBatchSink(spark, root, allowedLatenessMinutes = 60)
    val stream = spark.readStream.schema(events.schema).parquet(in)
    val q      = sink.streamWriter(stream, ckpt).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // everything behind the watermark got sealed into the final table
    val tableRows   = sink.readTable()
    val maxTs       = events.agg(max("ts")).first().getTimestamp(0)
    val cutoff      = new java.sql.Timestamp(maxTs.getTime - 60 * 60000L)
    assert(tableRows.columns.toSet.contains("dt") && tableRows.columns.toSet.contains("hr"))
    assert(tableRows.count() > 0)
    assert(sink.received.value == events.count())
    assert(sink.written.value == events.count())
    assert(sink.corrupt.value == 0)
    // sealed partitions carry _DONE and exactly one parquet file
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val somePart = fs.globStatus(new org.apache.hadoop.fs.Path(sink.tablePath, "dt=*/hr=*")).head.getPath
    val entries  = fs.listStatus(somePart).map(_.getPath.getName)
    assert(entries.contains("_DONE"))
    assert(entries.count(_.endsWith(".parquet")) == 1)
    // nothing sealed remains in staging, and staged+sealed == all events
    val staged = spark.read.parquet(sink.stagingPath)
    assert(staged.count() + tableRows.count() == events.count())
  }

  test("sink: replaying the same batch is idempotent (no duplicates)") {
    val root   = tmp()
    val sink   = new HiveBatchSink(spark, root)
    val events = t.events
    sink.writeBatch(events, batchId = 7)
    val n1 = spark.read.parquet(sink.stagingPath).count()
    sink.writeBatch(events, batchId = 7) // simulated retry of the same micro-batch
    val n2 = spark.read.parquet(sink.stagingPath).count()
    assert(n1 == events.count() && n2 == n1)
  }

  test("sink: corrupt rows (null ts) are counted and excluded") {
    val root = tmp()
    val sink = new HiveBatchSink(spark, root)
    val bad  = t.events.withColumn("ts", when(col("event_id") % 10 === 0, lit(null)).otherwise(col("ts")))
    sink.writeBatch(bad, batchId = 0)
    assert(sink.corrupt.value == t.events.filter(col("event_id") % 10 === 0).count())
    assert(spark.read.parquet(sink.stagingPath).count() == sink.written.value)
  }

  test("sealing is idempotent and closes only watermark-passed partitions") {
    val root   = tmp()
    val sink   = new HiveBatchSink(spark, root, allowedLatenessMinutes = 60)
    val events = t.events
    sink.writeBatch(events, batchId = 0)
    val maxTs  = events.agg(max("ts")).first().getTimestamp(0)
    val closed = sink.closedPartitions(maxTs)
    assert(closed.nonEmpty)
    val sealed1 = sink.sealClosed(maxTs)
    assert(sealed1 == closed)
    assert(sink.sealClosed(maxTs).isEmpty) // second pass: nothing left to seal
    // row conservation across staging + table
    val total = spark.read.parquet(sink.stagingPath).count() + sink.readTable().count()
    assert(total == events.count())
  }

  test("streaming dedup: re-delivered events collapse to one per id") {
    val in = tmp(); val events = t.events.limit(200)
    // simulate at-least-once delivery: every event delivered twice
    events.unionAll(events).write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(events.schema).parquet(in)
    val q = graft.streaming.StreamingDedup.dedup(stream)
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("dedup_test")
    assert(out.count() == events.count(), s"${out.count()} vs ${events.count()}")
    assert(out.select("event_id").distinct().count() == events.count())
  }

  test("streaming watermarked hourly aggregation matches the batch rollup") {
    val in = tmp(); val events = t.events
    events.write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(events.schema).parquet(in)
    val agg    = StreamingAggregates.hourlyCounts(stream)
    val q = agg.writeStream.format("memory").queryName("hourly_test")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("hourly_test").agg(sum("n_events")).first().getLong(0)
    assert(streamed == events.count())
  }
}
