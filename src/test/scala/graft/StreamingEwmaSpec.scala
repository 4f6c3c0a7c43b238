package graft

import graft.operators.EventAnalytics
import graft.streaming.StreamingEwma
import graft.sources.Tables
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

/** stream_ewma: the per-user streaming EWMA changelog equals the batch
  * closed form regardless of where the stream is sliced. */
class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, minute: Long, uid: Long, typ: String, v: Double) =
    (id, new Timestamp(1700000000000L + minute * 60000L), uid, typ, v, "{}")

  test("hand recurrence: 3 purchases fold to α-weighted value in order") {
    val rows = Seq(
      ev(1, 0, 1, "purchase", 10.0),
      ev(2, 5, 1, "purchase", 20.0),
      ev(3, 9, 1, "click", 999.0),   // non-purchase ignored
      ev(4, 10, 1, "purchase", 30.0))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventAnalytics.userEwma(df).head()
    // s1=10, s2=.3·20+.7·10=13, s3=.3·30+.7·13=18.1
    assert(got.getAs[Double]("ewma_value") === 18.1)
    assert(got.getAs[Long]("n_obs") === 3L)
  }

  test("streamed final EWMA per user ≡ batch closed form on the real events slice") {
    val events = Tables(spark, sfDir).events
    val in = Files.createTempDirectory("graft-ewma").toString
    // slice the stream into 3 event-time-ordered files with ascending
    // mtimes → the file source replays them as 3 ordered micro-batches
    val sliced = events.orderBy("ts", "event_id").limit(3000)
      .withColumn("slice", org.apache.spark.sql.functions.ntile(3)
        .over(org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")))
      .cache()
    (1 to 3).foreach { s =>
      val tmp = Files.createTempDirectory(s"graft-ewma-s$s").toString
      sliced.filter(org.apache.spark.sql.functions.col("slice") === s)
        .drop("slice").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(in, f"slice$s%02d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + s * 60000L)
    }
    val base = spark.read.parquet(in)
    val stream = spark.readStream
      .schema(base.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val q = StreamingEwma.userEwma(spark, stream)
      .writeStream.format("memory").queryName("ewma_test")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // last emitted row per user is the final state
    val streamed = spark.table("ewma_test").as[StreamingEwma.UserEwma]
      .collect().groupBy(_.user_id)
      .map { case (u, rows) => u -> rows.maxBy(_.n_obs) }
    val batch = EventAnalytics.userEwma(base)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(batch.nonEmpty)
    assert(streamed.keySet === batch.keySet)
    batch.foreach { case (u, (ew, n)) =>
      val s = streamed(u)
      assert(s.n_obs === n, s"user $u count")
      assert(math.abs(s.ewma_value - ew) <= 1e-4, s"user $u: ${s.ewma_value} vs $ew")
    }
  }
}
