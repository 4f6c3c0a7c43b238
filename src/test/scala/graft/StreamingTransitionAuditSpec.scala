package graft

import graft.operators.EventAnalytics
import graft.streaming.StreamingTransitionAudit
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

/** stream_transition_audit: illegal transitions surface at ingest and
  * chain across micro-batch boundaries via the carried last-event
  * state — streamed totals ≡ batch q304 on the same rows. */
class StreamingTransitionAuditSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, sec: Long, uid: Long, tpe: String) =
    (id, new Timestamp(1700000000000L + sec * 1000L), uid, tpe, 1.0, "{}")

  test("cross-batch boundary violation is caught; totals ≡ batch audit") {
    // u1: view → purchase (ILLEGAL) split across the batch boundary;
    // u2: click → purchase (legal) then purchase → purchase (ILLEGAL)
    // inside one batch; u3 clean
    val batch1 = Seq(
      ev(1, 0, 1, "view"), ev(2, 1, 2, "click"),
      ev(3, 2, 2, "purchase"), ev(4, 3, 2, "purchase"),
      ev(5, 4, 3, "view"))
    val batch2 = Seq(
      ev(6, 10, 1, "purchase"), // boundary: prev=view carried in state
      ev(7, 11, 3, "click"))
    val in = Files.createTempDirectory("graft-sta").toString
    Seq(batch1, batch2).zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory(s"graft-sta-$i").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(in, f"b$i%02d.parquet")
      Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + i * 60000L)
    }
    val all = (batch1 ++ batch2)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val base = spark.read.parquet(in)
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = StreamingTransitionAudit.violations(spark, stream)
      .writeStream.format("memory").queryName("sta_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.sql("SELECT prev_type, next_type FROM sta_test")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(streamed.sorted.toSeq === Seq(
      ("purchase", "purchase"), ("view", "purchase")))

    // batch q304 on the identical rows agrees on totals
    val batchTotal = EventAnalytics.transitionRuleAudit(all)
      .agg(org.apache.spark.sql.functions.sum("n_violations")).head().getLong(0)
    assert(batchTotal === streamed.length.toLong)
  }

  test("clean stream emits nothing and state stays one tuple per user") {
    val rows = Seq(ev(1, 0, 1, "view"), ev(2, 1, 1, "click"), ev(3, 2, 1, "purchase"))
    val in = Files.createTempDirectory("graft-sta2").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(in)
    val base = spark.read.parquet(in)
    val stream = spark.readStream.schema(base.schema).parquet(in)
    val q = StreamingTransitionAudit.violations(spark, stream)
      .writeStream.format("memory").queryName("sta_clean")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.sql("SELECT * FROM sta_clean").count() === 0L)
  }
}
