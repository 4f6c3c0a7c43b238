package graft

import graft.sources.{OffsetLog, Tables}
import graft.streaming.{FanInRelay, HiveBatchSink}
import java.nio.file.Files

/** Fan-in: many agent logs → one sink, exactly-once through a crash
  * that lands between the union write and the SINGLE combined commit —
  * including the partial-advance hazard per-log commits would have. */
class FanInRelaySpec extends SparkSpec {
  private val P = 4

  test("two logs fan into one table exactly once, through a crash with head movement") {
    val logA = Files.createTempDirectory("graft-fanin-a").toString
    val logB = Files.createTempDirectory("graft-fanin-b").toString
    val sinkRoot = Files.createTempDirectory("graft-fanin-sink").toString
    val logs = Seq(logA, logB)
    val events = Tables(spark, sfDir).events.orderBy("event_id").cache()
    val n = events.count().toInt
    val (qa, qb, qc) = (n / 3, n / 3, n - 2 * (n / 3))
    val sliceA = events.limit(qa)
    val rest = events.exceptAll(sliceA).orderBy("event_id")
    val sliceB = rest.limit(qb)
    val sliceC = rest.exceptAll(sliceB)
    val sink = new HiveBatchSink(spark, sinkRoot, allowedLatenessMinutes = 60)
    def landed() = sink.readTable().select("event_id")
      .unionByName(spark.read.parquet(sink.stagingPath).select("event_id"))

    // agents A and B each append a tranche; one cycle drains BOTH
    OffsetLog.append(spark, logA, sliceA, "user_id", P)
    OffsetLog.append(spark, logB, sliceB, "user_id", P)
    val s1 = FanInRelay.runOnce(spark, logs, "fleet", P, sink, sinkRoot)
    assert(s1.activeLogs == 2 && s1.drained == qa + qb && s1.corrupt == 0)
    assert(landed().count() == qa + qb)
    assert(landed().distinct().count() == qa + qb)

    // caught up → no-op
    assert(FanInRelay.runOnce(spark, logs, "fleet", P, sink, sinkRoot)
      == FanInRelay.FanInStats(0, 0, 0, 0, 0))

    // CRASH WINDOW: agent A appends; the cycle lands the union but dies
    // before the combined commit...
    OffsetLog.append(spark, logA, sliceC, "user_id", P)
    val from = FanInRelay.committed(spark, sinkRoot, "fleet")
    val endsA = OffsetLog.endOffsets(spark, logA, P)
    val batch = OffsetLog.readBatch(spark, logA, P, from(0), endsA).drop("partition", "offset")
    sink.writeBatch(batch, from.values.flatMap(_.values).sum) // landed, NOT committed
    assert(landed().count() == n)
    assert(FanInRelay.committed(spark, sinkRoot, "fleet") == from) // offsets unmoved

    // ...and while down, agent B's head also moves (the partial-advance
    // hazard: with per-log commits this would mint a new batch id)
    val extraId = 9000000L + n
    val extra = events.limit(1)
      .withColumn("event_id", org.apache.spark.sql.functions.lit(extraId))
    OffsetLog.append(spark, logB, extra, "user_id", P)

    // restart: ONE cycle re-drains A's overlap + B's new row under the
    // SAME ingest_batch id → dynamic overwrite erases the crashed files
    val s2 = FanInRelay.runOnce(spark, logs, "fleet", P, sink, sinkRoot)
    assert(s2.activeLogs == 2)
    assert(landed().count() == n + 1, "replay must not duplicate rows")
    assert(landed().distinct().count() == n + 1)

    // every event landed exactly once
    val landedIds = landed().orderBy("event_id").collect().map(_.getLong(0)).toSeq
    val srcIds = (events.select("event_id").collect().map(_.getLong(0)).toSeq :+ extraId).sorted
    assert(landedIds == srcIds)

    // loop form reports caught-up
    assert(FanInRelay.drainLoop(spark, logs, "fleet", P, sink, sinkRoot).isEmpty)
  }
}
