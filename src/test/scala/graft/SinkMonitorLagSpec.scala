package graft

import graft.sources.{OffsetLog, OffsetLogSourceProvider, Tables}
import graft.streaming.SinkMonitor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** offset_log_lag_report, wired OPERATIONALLY (round-9 verdict #8): a
  * running engine-owned stream exposes consumer lag / behind_retention
  * through [[SinkMonitor]] while it drains a backlog — the DSv2
  * source's `commitGroup` option mirrors the engine's committed range
  * into the log's group cursor, and the monitor samples
  * [[OffsetLog.lagRows]] at every micro-batch boundary. */
class SinkMonitorLagSpec extends SparkSpec {
  private val P = 4
  private val fmt = classOf[OffsetLogSourceProvider].getName

  test("a backlogged admission-controlled stream exposes shrinking lag through the monitor") {
    val logRoot = Files.createTempDirectory("graft-lagmon-log").toString
    val events = Tables(spark, sfDir).events
    val n = events.count()
    OffsetLog.append(spark, logRoot, events, "user_id", P)

    val mon = new SinkMonitor()
      .withLagProbe(logRoot, P, Seq("ops"))
      .attach(spark)
    try {
      val ck = Files.createTempDirectory("graft-lagmon-ck").toString
      val cap = math.max(1L, n / 5)
      def drain() = {
        val q = spark.readStream.format(fmt)
          .option("path", logRoot)
          .option("numPartitions", P.toString)
          .option("maxRowsPerTrigger", cap.toString)
          .option("commitGroup", "ops")
          .load()
          .writeStream
          .option("checkpointLocation", ck)
          .foreachBatch { (_: DataFrame, _: Long) => () }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination(180000)
      }
      drain()
      mon.sampleLag("manual", batchId = -1L) // post-drain observation

      val samples = mon.lagSamples
      assert(samples.nonEmpty, "the probe must capture at least one batch boundary")
      assert(samples.forall(_.group == "ops"))
      // round-11: every engine-captured sample carries its query identity
      assert(samples.filter(_.batchId >= 0).forall(_.queryName.nonEmpty))
      assert(samples.forall(!_.behindRetention),
        "no retention ran — nothing can be behind the retained tail")
      // mid-drain: some observation must catch the backlog NOT yet drained
      // (5+ bounded batches; the cursor mirror trails by at most one batch)
      val totalLagByBatch = samples.groupBy(_.batchId).map { case (b, ss) => b -> ss.map(_.lagRows).sum }
      assert(totalLagByBatch.values.exists(_ > 0),
        s"a 5-batch capped drain must be observed mid-backlog: $totalLagByBatch")
      // the mirror TRAILS by at most one committed batch (the engine
      // calls source.commit for batch N while cleaning up before batch
      // N+1, so a terminated AvailableNow run leaves the final batch
      // unmirrored — bus group commits are async in exactly this way)
      val fin = samples.filter(_.batchId == -1L)
      assert(fin.nonEmpty && fin.map(_.lagRows).sum <= cap,
        s"post-drain mirror may trail by at most one batch: $fin")
      assert(fin.map(_.head).sum == n, "heads must account for every appended row")
      // lag is monotone non-increasing batch over batch (drain makes progress)
      val ordered = totalLagByBatch.toSeq.sortBy { case (b, _) => if (b < 0) Long.MaxValue else b }
      ordered.sliding(2).foreach {
        case Seq((_, a), (_, b)) => assert(b <= a, s"lag must shrink monotonically: $ordered")
        case _ => ()
      }
      // ... and the next attach HEALS the trail: re-running the (now
      // caught-up) stream commits the restored final batch, bringing
      // the mirrored cursor to the head — lag reads 0 end-to-end
      drain()
      mon.sampleLag("manual", batchId = -2L)
      val healed = mon.lagSamples.filter(_.batchId == -2L)
      assert(healed.nonEmpty && healed.forall(_.lagRows == 0L),
        s"a reattach must heal the one-batch trail: $healed")
    } finally mon.detach(spark)
  }

  test("without commitGroup the cursor file is never written (observational mirror is opt-in)") {
    val logRoot = Files.createTempDirectory("graft-lagmon-log2").toString
    val events = Tables(spark, sfDir).events
    OffsetLog.append(spark, logRoot, events.limit(50), "user_id", P)
    val q = spark.readStream.format(fmt)
      .option("path", logRoot).option("numPartitions", P.toString)
      .load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-lagmon-ck2").toString)
      .foreachBatch { (_: DataFrame, _: Long) => () }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(OffsetLog.committed(spark, logRoot, "ops").isEmpty,
      "no commitGroup option => no cursor mirror")
  }
}
