package graft

import graft.streaming.StreamingFunnel
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

/** The streaming funnel must equal batch q76 on any finalized slice,
  * under arbitrary arrival disorder, with watermark-bounded state. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = Files.createTempDirectory("graft-funnel").toString

  def ev(minute: Long, uid: Long, tpe: String): (Timestamp, Long, String) =
    (new Timestamp(1700000000000L + minute * 60000L), uid, tpe)

  private def runStream(in: String, horizonMinutes: Int = 60, name: String) = {
    val stream = spark.readStream
      .schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val q = StreamingFunnel.funnelStages(spark, stream, horizonMinutes)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).filter(col("user_id") >= 0)
  }

  test("stage semantics match q76, including the out-of-order late-view case") {
    // user 1: full funnel in order
    // user 2: click BEFORE its only view, purchase after -> view only
    // user 3: out-of-order in the file: click(5) written before view(3):
    //         click at 5 >= first view at 3 -> click reached;
    //         purchase at 4 < click candidate 5 -> purchase NOT reached
    // user 4: no view at all -> nothing reached
    val rows = Seq(
      ev(0, 1, "view"), ev(1, 1, "click"), ev(2, 1, "purchase"),
      ev(1, 2, "click"), ev(2, 2, "view"), ev(0, 2, "purchase"),
      ev(5, 3, "click"), ev(4, 3, "purchase"), ev(3, 3, "view"),
      ev(0, 4, "click"), ev(1, 4, "purchase"),
      ev(100000, -1, "view")) // sentinel: watermark past every horizon
    val in = tmp()
    rows.toDF("ts", "user_id", "event_type").repartition(1)
      .write.mode("overwrite").parquet(in)
    val out = runStream(in, name = "funnel_hand")
      .select("user_id", "reached_view", "reached_click", "reached_purchase")
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((true, true, true)), s"user 1: ${out(1L)}")
    assert(out(2L) == ((true, false, false)), s"user 2: ${out(2L)}")
    assert(out(3L) == ((true, true, false)), s"user 3: ${out(3L)}")
    assert(out(4L) == ((false, false, false)), s"user 4: ${out(4L)}")
  }

  test("streamed funnel counts equal batch q76 on the events slice") {
    val t  = graft.sources.Tables(spark, sfDir)
    val in = tmp()
    // Batch equality holds exactly when the watermark horizon dominates
    // both arrival disorder and per-user inactivity gaps (see the
    // StreamingFunnel scaladoc). The slice spans ~30 days and arrives in
    // arbitrary cross-batch order (round-robin files), so the horizon
    // must cover the whole slice; the sentinel sits 2x the horizon past
    // the max so the final watermark clears every user's timeout.
    val horizonMin = 90 * 24 * 60
    val maxTs = t.events.agg(max("ts")).first().getTimestamp(0)
    t.events.select("ts", "user_id", "event_type")
      .repartition(4) // several files -> several micro-batches, cross-batch state
      .write.mode("overwrite").parquet(in)
    // The sentinel advances the watermark past every horizon, so its file
    // must be the LAST micro-batch: were it processed first, every real
    // event would arrive behind the watermark and be dropped as late.
    // FileStreamSource orders files by modification time; an explicit
    // later mtime pins the order (same-ms writes tie-break arbitrarily).
    val dir = new java.io.File(in)
    def parquets() = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    val realFiles = parquets().map(_.getName).toSet
    Seq((new Timestamp(maxTs.getTime + 2L * horizonMin * 60000L + 1000L), -1L, "view"))
      .toDF("ts", "user_id", "event_type")
      .repartition(1).write.mode("append").parquet(in)
    val latest = parquets().map(_.lastModified).max
    parquets().filterNot(f => realFiles(f.getName))
      .foreach(f => assert(f.setLastModified(latest + 60000L)))

    val streamed = StreamingFunnel.funnelCounts(
      runStream(in, horizonMinutes = horizonMin, name = "funnel_real")
        .as[StreamingFunnel.UserFunnel])
      .first()
    val batch = graft.operators.EventAnalytics.funnel(t.events).first()
    assert(streamed.getLong(0) == batch.getLong(0),
      s"view users: streamed ${streamed.getLong(0)} vs batch ${batch.getLong(0)}")
    assert(streamed.getLong(1) == batch.getLong(1),
      s"click users: streamed ${streamed.getLong(1)} vs batch ${batch.getLong(1)}")
    assert(streamed.getLong(2) == batch.getLong(2),
      s"purchase users: streamed ${streamed.getLong(2)} vs batch ${batch.getLong(2)}")
    assert(streamed.getLong(0) > 0, "vacuous: no view users in the slice")
  }
}
