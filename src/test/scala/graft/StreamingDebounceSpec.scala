package graft

import graft.operators.EventAnalytics
import graft.streaming.StreamingDebounce
import graft.sources.Tables
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

/** stream_debounce: the streamed burst-opener set equals the batch q214
  * rule no matter where the stream is sliced — the carried last-seen
  * second continues the chain across micro-batches. */
class StreamingDebounceSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, second: Long, uid: Long, typ: String) =
    (id, new Timestamp(1700000000000L + second * 1000L), uid, typ, 1.0, "{}")

  test("hand fixture: first-of-burst kept, in-burst dropped, across a batch slice") {
    val all = Seq(
      ev(1, 0, 1, "click"),
      ev(2, 100, 1, "click"),  // +100 s: in burst
      ev(3, 500, 1, "click"),  // +400 s: opens
      ev(4, 0, 2, "click"))    // own key: opens
    val in = Files.createTempDirectory("graft-debounce").toString
    // two slices split MID-BURST (events 1-2 then 3-4): the carried state
    // must suppress nothing across the cut except what batch suppresses
    Seq(all.take(2), all.drop(2)).zipWithIndex.foreach { case (slice, i) =>
      val tmp = Files.createTempDirectory(s"graft-deb-s$i").toString
      slice.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(in, f"slice$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + i * 60000L)
    }
    val base = spark.read.parquet(in)
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = StreamingDebounce.opensBursts(spark, stream)
      .writeStream.format("memory").queryName("debounce_hand")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val kept = spark.table("debounce_hand").select("event_id")
      .as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L, 4L))
  }

  test("streamed kept counts ≡ batch q214 on the real events slice") {
    val events = Tables(spark, sfDir).events
    val in = Files.createTempDirectory("graft-debounce-real").toString
    val sliced = events.orderBy("ts", "event_id").limit(3000)
      .withColumn("slice", org.apache.spark.sql.functions.ntile(3)
        .over(org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")))
      .cache()
    (1 to 3).foreach { s =>
      val tmp = Files.createTempDirectory(s"graft-deb-r$s").toString
      sliced.filter(col("slice") === s)
        .drop("slice").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(in, f"slice$s%02d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + s * 60000L)
    }
    val base = spark.read.parquet(in)
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = StreamingDebounce.opensBursts(spark, stream)
      .writeStream.format("memory").queryName("debounce_real")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("debounce_real")
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = EventAnalytics.debounce(base)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_kept")).toMap
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }
}
