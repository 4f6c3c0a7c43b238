package graft

import graft.sources.{OffsetLog, OffsetLogSourceProvider, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** offset_log_dsv2_sink: the PRODUCER side of the bus through the
  * standard API — `writeStream.format(offsetlog)` appends epochs as
  * immutable contiguous segments, exactly-once across restarts and
  * replays, so bus MIRRORING is `readStream(A).writeStream(B)` with
  * zero graft-specific code. */
class OffsetLogSinkSpec extends SparkSpec {
  private val P = 4
  private val fmt = classOf[OffsetLogSourceProvider].getName

  private def logContents(root: String): DataFrame =
    OffsetLog.readBatch(spark, root, P, Map.empty,
      OffsetLog.endOffsets(spark, root, P))

  test("bus mirror: readStream(A) -> writeStream(B) lands exactly A's rows as contiguous segments") {
    val logA = Files.createTempDirectory("graft-sink-A").toString
    val logB = Files.createTempDirectory("graft-sink-B").toString
    val events = Tables(spark, sfDir).events
    OffsetLog.append(spark, logA, events.limit(300), "user_id", P)
    OffsetLog.append(spark, logA, events.exceptAll(events.limit(300)), "user_id", P)

    val q = spark.readStream.format(fmt)
      .option("path", logA).option("numPartitions", P.toString)
      .option("maxRowsPerTrigger", "250") // several epochs, several appends
      .load()
      .drop("partition", "offset")
      .writeStream.format(fmt)
      .option("path", logB).option("numPartitions", P.toString)
      .option("keyColumn", "user_id")
      .option("checkpointLocation", Files.createTempDirectory("graft-sink-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(240000)

    val a = logContents(logA).select("event_id", "ts", "user_id", "event_type", "value", "props")
    val b = logContents(logB).select("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(b.count() == events.count(), s"mirror lost rows: ${b.count()}")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "mirrored payloads (incl. timestamps/doubles) must round-trip exactly")
    // contiguity: per partition, offsets are 0..n-1 with no holes
    val off = logContents(logB).groupBy("partition")
      .agg(count(lit(1)).as("n"), min("offset").as("lo"), max("offset").as("hi"))
      .collect()
    off.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L && r.getAs[Long]("hi") == r.getAs[Long]("n") - 1,
        s"non-contiguous offsets: $r")
    }
    // same key -> same partition on both logs (the bus ordering contract)
    val partsA = logContents(logA).select(col("user_id"), col("partition")).distinct()
    val partsB = logContents(logB).select(col("user_id"), col("partition")).distinct()
    assert(partsA.exceptAll(partsB).isEmpty, "key routing must be identical")
  }

  test("exactly-once across a checkpointed restart: only the new tranche appends") {
    val logA = Files.createTempDirectory("graft-sink-A2").toString
    val logB = Files.createTempDirectory("graft-sink-B2").toString
    val ck = Files.createTempDirectory("graft-sink-ck2").toString
    val events = Tables(spark, sfDir).events
    def mirrorOnce(): Unit = {
      val q = spark.readStream.format(fmt)
        .option("path", logA).option("numPartitions", P.toString)
        .load()
        .drop("partition", "offset")
        .writeStream.format(fmt)
        .option("path", logB).option("numPartitions", P.toString)
        .option("keyColumn", "user_id")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(240000)
    }
    OffsetLog.append(spark, logA, events.limit(60), "user_id", P)
    mirrorOnce()
    assert(logContents(logB).count() == 60)
    OffsetLog.append(spark, logA,
      events.exceptAll(events.limit(60)).limit(40), "user_id", P)
    mirrorOnce()
    val b = logContents(logB)
    assert(b.count() == 100, s"restart duplicated or dropped rows: ${b.count()}")
    assert(b.select("event_id").distinct().count() == 100, "no event replays twice")
  }

  test("epoch replay is idempotent: appendAt with recorded bases skips already-landed segments") {
    val root = Files.createTempDirectory("graft-sink-replay").toString
    val events = Tables(spark, sfDir).events.limit(80)
    val bases = OffsetLog.endOffsets(spark, root, P) // all zero
    OffsetLog.appendAt(spark, root, events, "user_id", P, bases, skipExisting = true)
    val first = logContents(root).collect().toSet
    // the crash-replay: same rows, same recorded bases, segments exist
    OffsetLog.appendAt(spark, root, events, "user_id", P, bases, skipExisting = true)
    val second = logContents(root).collect().toSet
    assert(second == first, "replay must be a byte-level no-op")
    assert(logContents(root).count() == 80)
  }

  test("missing keyColumn fails loudly at plan time, not with a half-written epoch") {
    val logA = Files.createTempDirectory("graft-sink-A3").toString
    val logB = Files.createTempDirectory("graft-sink-B3").toString
    OffsetLog.append(spark, logA, Tables(spark, sfDir).events.limit(10), "user_id", P)
    val err = intercept[Exception] {
      val q = spark.readStream.format(fmt)
        .option("path", logA).option("numPartitions", P.toString)
        .load()
        .drop("partition", "offset")
        .writeStream.format(fmt)
        .option("path", logB).option("numPartitions", P.toString)
        .option("checkpointLocation", Files.createTempDirectory("graft-sink-ck3").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("keyColumn"), s"must name the missing option: $msgs")
    assert(OffsetLog.endOffsets(spark, logB, P).values.sum == 0L,
      "no rows may land without a key contract")
  }
}
