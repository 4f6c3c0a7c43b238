package graft

import graft.operators.EventAnalytics
import graft.sources.Tables
import graft.streaming.StreamingHbos
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** stream_hbos: the served HBOS model's streamed scores reproduce the
  * q328 batch scores exactly, with ZERO streaming state (pure map —
  * ingest-time anomaly gating adds no shuffle and no watermark). */
class StreamingHbosSpec extends SparkSpec {

  test("streamed scores ≡ q328 batch scores across 3 file slices, stateless") {
    val t = Tables(spark, sfDir)
    val events = t.events
    val n = events.count().toInt
    val model = StreamingHbos.trainModel(events)

    val in = Files.createTempDirectory("graft-hbos").toString
    (0 until 3).foreach { s =>
      val tmp = Files.createTempDirectory(s"graft-hbos-s$s").toString
      events.filter(col("event_id") % 3 === s)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(in, f"slice$s%02d.parquet")
      Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + s * 60000L)
    }
    val base = spark.read.parquet(in)
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = StreamingHbos.scoreEvents(spark, stream, model)
      .writeStream.format("memory").queryName("hbos_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.lastProgress.stateOperators.isEmpty,
      "serving must be stateless — no state operators in the streaming plan")

    val streamed = spark.sql("SELECT event_id, hbos_score FROM hbos_test")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // batch reference: q328 with the limit widened to the full frame
    val batch = EventAnalytics.hbosOutliers(events, topN = n)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("hbos_score")).toMap
    assert(streamed.size == n && batch.size == n)
    val diverging = batch.collect {
      case (id, s) if streamed(id) != s => (id, s, streamed(id))
    }
    assert(diverging.isEmpty,
      s"served scores diverged from q328 on ${diverging.size} events, e.g. ${diverging.take(3)}")
  }

  test("model is constant-sized and unseen bins fall to the 1/n floor") {
    val t = Tables(spark, sfDir)
    val model = StreamingHbos.trainModel(t.events)
    assert(model.dHour.size <= 24 && model.dDow.size <= 7 && model.dVbin.size <= 10,
      "densities are bounded histograms, never data-sized")
    assert(model.dHour.values.sum > 0.999 && model.dHour.values.sum < 1.001)
    // a value far outside the training range clamps into bin 0/9 (still
    // scored), and a never-seen hour falls to the floor density
    val far = model.score(0L, model.vmax * 1e6) // hour 0 of epoch day 0
    assert(!far.isNaN && !far.isInfinite, "serving must score any event it is handed")
    val floorScore = -math.log(model.floorP)
    assert(model.floorP > 0 && floorScore > 0)
  }
}
