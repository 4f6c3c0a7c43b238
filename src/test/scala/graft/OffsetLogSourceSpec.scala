package graft

import graft.sources.{OffsetLog, OffsetLogSourceProvider, Tables}
import graft.streaming.{HiveBatchSink, OffsetLogRelay}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** source_offset_log as a DSv2 MicroBatchStream: `readStream` drains the
  * same immutable segments the hand-rolled relay does, with the ENGINE
  * owning offsets/checkpointing — proven by landing the identical sealed
  * table through both paths, and by a checkpointed restart resuming past
  * already-processed segments. */
class OffsetLogSourceSpec extends SparkSpec {
  private val P = 4
  private val fmt = classOf[OffsetLogSourceProvider].getName

  private def readLog(root: String): DataFrame =
    spark.readStream
      .format(fmt)
      .option("path", root)
      .option("numPartitions", P.toString)
      .load()

  test("readStream over the log lands the same sealed table as the relay") {
    val logRoot = Files.createTempDirectory("graft-dsv2-log").toString
    val events = Tables(spark, sfDir).events
    OffsetLog.append(spark, logRoot, events.limit(400), "user_id", P)
    OffsetLog.append(spark, logRoot, events.exceptAll(events.limit(400)), "user_id", P)

    // path A: the hand-rolled exactly-once relay
    val sinkA = new HiveBatchSink(spark,
      Files.createTempDirectory("graft-dsv2-sinkA").toString)
    OffsetLogRelay.drainLoop(spark, logRoot, "agent", P, sinkA)

    // path B: standard Structured Streaming over the DSv2 source
    val sinkB = new HiveBatchSink(spark,
      Files.createTempDirectory("graft-dsv2-sinkB").toString)
    val ck = Files.createTempDirectory("graft-dsv2-ck").toString
    val q = sinkB
      .streamWriter(readLog(logRoot).drop("partition", "offset"), ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def surface(s: HiveBatchSink) =
      s.readTable().select("event_id").unionByName(
        spark.read.parquet(s.stagingPath).select("event_id"))
    val a = surface(sinkA)
    val b = surface(sinkB)
    assert(a.count() == events.count() && b.count() == a.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "both paths land exactly the log's rows")
    // sealed partition layout agrees too (same watermark rule)
    val sealedA = sinkA.readTable().select("dt", "hr").distinct().collect().toSet
    val sealedB = sinkB.readTable().select("dt", "hr").distinct().collect().toSet
    assert(sealedA == sealedB, s"sealed partitions diverge: $sealedA vs $sealedB")
  }

  test("schema is directory partition + payload + offset; batch rows carry real offsets") {
    val logRoot = Files.createTempDirectory("graft-dsv2-log2").toString
    val events = Tables(spark, sfDir).events
    OffsetLog.append(spark, logRoot, events.limit(100), "user_id", P)
    val got = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    val q = readLog(logRoot).writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-dsv2-ck2").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.set(b.persist()); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val b = got.get()
    assert(b.columns.take(2).toSeq == Seq("partition", "offset") ||
      b.columns.contains("partition") && b.columns.contains("offset"))
    assert(b.count() == 100)
    // offsets are contiguous from 0 within each partition — the same
    // rows the batch read path returns
    val perPart = b.groupBy("partition")
      .agg(count(lit(1)).as("n"), min("offset").as("lo"), max("offset").as("hi"))
      .collect()
    perPart.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L &&
        r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
    }
    val viaBatch = OffsetLog.readBatch(spark, logRoot, P, Map.empty,
      OffsetLog.endOffsets(spark, logRoot, P))
    assert(b.select("event_id").exceptAll(viaBatch.select("event_id")).isEmpty)
    b.unpersist()
  }

  test("checkpointed restart resumes from the engine WAL, not from zero") {
    val logRoot = Files.createTempDirectory("graft-dsv2-log3").toString
    val ck = Files.createTempDirectory("graft-dsv2-ck3").toString
    val events = Tables(spark, sfDir).events
    val seen = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
    def runAvailable(): Unit = {
      val q = readLog(logRoot).writeStream
        .option("checkpointLocation", ck)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select("event_id").collect().foreach(r => seen.add(r.getLong(0)))
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    OffsetLog.append(spark, logRoot, events.limit(50), "user_id", P)
    runAvailable()
    assert(seen.size == 50)
    // second tranche appended AFTER the first run committed to the WAL:
    // the restart must read exactly the 30 new rows, no replay
    OffsetLog.append(spark, logRoot,
      events.exceptAll(events.limit(50)).limit(30), "user_id", P)
    runAvailable()
    assert(seen.size == 80, s"restart replayed or skipped rows: ${seen.size}")
    assert(seen.size == new java.util.HashSet[Long](seen).size, "no duplicates")
  }

  test("fan-in through the standard API: a union of two DSv2 log streams lands the FanInRelay's table") {
    val logA = Files.createTempDirectory("graft-dsv2-fanA").toString
    val logB = Files.createTempDirectory("graft-dsv2-fanB").toString
    val events = Tables(spark, sfDir).events
    OffsetLog.append(spark, logA, events.limit(120), "user_id", P)
    OffsetLog.append(spark, logB, events.exceptAll(events.limit(120)).limit(80), "user_id", P)

    // path A: the combined-commit fan-in relay
    val sinkA = new HiveBatchSink(spark,
      Files.createTempDirectory("graft-dsv2-fansinkA").toString)
    graft.streaming.FanInRelay.drainLoop(spark, Seq(logA, logB), "agents", P, sinkA,
      commitRoot = Files.createTempDirectory("graft-dsv2-fanck").toString)

    // path B: engine-checkpointed union — Structured Streaming tracks
    // each source's offsets in ONE commit, which is exactly the
    // combined-commit atomicity FanInRelay hand-builds
    val sinkB = new HiveBatchSink(spark,
      Files.createTempDirectory("graft-dsv2-fansinkB").toString)
    val unioned = readLog(logA).drop("partition", "offset")
      .unionByName(readLog(logB).drop("partition", "offset"))
    val q = sinkB
      .streamWriter(unioned, Files.createTempDirectory("graft-dsv2-fanck2").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def surface(s: HiveBatchSink) =
      s.readTable().select("event_id").unionByName(
        spark.read.parquet(s.stagingPath).select("event_id"))
    val a = surface(sinkA); val b = surface(sinkB)
    assert(a.count() == 200 && b.count() == 200)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "fan-in through readStream lands exactly the relay's rows")
  }

  test("numPartitions discovers from the directory layout when not specified") {
    val logRoot = Files.createTempDirectory("graft-dsv2-log5").toString
    val events = Tables(spark, sfDir).events
    OffsetLog.append(spark, logRoot, events.limit(60), "user_id", P)
    var rows = -1L
    val q = spark.readStream.format(fmt).option("path", logRoot).load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-dsv2-ck5").toString)
      .foreachBatch { (b: DataFrame, _: Long) => rows = b.count(); () }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(rows == 60, s"discovery must cover all $P partitions, read $rows rows")
  }

  test("empty log: attaching a consumer before the first append is caught-up, not an error") {
    val logRoot = Files.createTempDirectory("graft-dsv2-log4").toString
    new java.io.File(logRoot).mkdirs()
    var rows = -1L
    val q = readLog(logRoot).writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-dsv2-ck4").toString)
      .foreachBatch { (b: DataFrame, _: Long) => rows = b.count(); () }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(rows <= 0, s"an empty log must not produce rows, got $rows")
  }
}
