package graft

import graft.sources.{OffsetLog, Tables}
import graft.streaming.{HiveBatchSink, OffsetLogRelay}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The bus → sink agent loop: drain-land-seal-commit, exactly-once
  * through a crash between land and commit. */
class OffsetLogRelaySpec extends SparkSpec {
  private val P = 4

  test("drain-land-commit relays a log into the warehouse exactly once, through a crash") {
    val logRoot  = Files.createTempDirectory("graft-relay-log").toString
    val sinkRoot = Files.createTempDirectory("graft-relay-sink").toString
    val events = Tables(spark, sfDir).events.orderBy("event_id")
    val n = events.count()
    val half = (n / 2).toInt
    val sink = new HiveBatchSink(spark, sinkRoot, allowedLatenessMinutes = 60)

    // producer appends the first half; relay lands and commits it
    OffsetLog.append(spark, logRoot, events.limit(half), "user_id", P)
    val s1 = OffsetLogRelay.runOnce(spark, logRoot, "agent", P, sink)
    assert(s1.drained == half && s1.received == half && s1.corrupt == 0)
    def landed() = {
      val sealedRows = sink.readTable()
      val staged = spark.read.parquet(sink.stagingPath)
      sealedRows.select("event_id").unionByName(staged.select("event_id"))
    }
    assert(landed().count() == half)
    assert(landed().distinct().count() == half)

    // caught up: a second cycle is a no-op
    val s2 = OffsetLogRelay.runOnce(spark, logRoot, "agent", P, sink)
    assert(s2 == OffsetLogRelay.RelayStats(0, 0, 0, 0))

    // producer appends a second tranche; the relay CRASHES between land
    // and commit (simulated by landing the drained range without
    // committing). batchId is derived from the committed FROM offsets —
    // the value the restarted relay will recompute.
    val tranche2 = (n / 4).toInt
    val rest = events.exceptAll(events.limit(half)).orderBy("event_id")
    OffsetLog.append(spark, logRoot, rest.limit(tranche2), "user_id", P)
    val from  = OffsetLog.committed(spark, logRoot, "agent")
    val ends  = OffsetLog.endOffsets(spark, logRoot, P)
    val batch = OffsetLog.readBatch(spark, logRoot, P, from, ends)
      .drop("partition", "offset")
    sink.writeBatch(batch, from.values.sum) // landed, NOT committed
    assert(landed().count() == half + tranche2) // rows are there...
    assert(OffsetLog.committed(spark, logRoot, "agent") == from) // ...but offsets are not

    // the failure mode under test: a producer append lands BETWEEN the
    // crash and the restart, moving the head — the re-drain covers the
    // WIDER range [from, newHead) but must reuse the crashed cycle's
    // ingest_batch id so dynamic overwrite erases the crashed files
    // (an end-offset-derived id would mint a new one and duplicate the
    // overlap)
    OffsetLog.append(spark, logRoot, rest.exceptAll(rest.limit(tranche2)), "user_id", P)

    // restart: one cycle re-drains [from, newHead) into the SAME
    // ingest_batch — the replay of the crashed overlap is invisible
    val s3 = OffsetLogRelay.runOnce(spark, logRoot, "agent", P, sink)
    assert(s3.drained == n - half)
    assert(landed().count() == n, "replay must not duplicate rows")
    assert(landed().distinct().count() == n)

    // every appended event landed exactly once, bit-for-bit
    val landedIds = landed().orderBy("event_id").collect().map(_.getLong(0)).toSeq
    val srcIds    = events.select("event_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(landedIds == srcIds)

    // and the loop form reports caught-up
    assert(OffsetLogRelay.drainLoop(spark, logRoot, "agent", P, sink).isEmpty)
  }
}
