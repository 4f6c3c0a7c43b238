package graft

import graft.streaming.StreamingAnnIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The continuously-maintained ANN index: micro-batch inserts fold into
  * the k-NN graph as versioned changelog deltas; replays are
  * idempotent; the merged view matches batch-built quality. */
class StreamingAnnIndexSpec extends SparkSpec {
  import spark.implicits._

  def clustered = {
    val rows = for { c <- 0 until 10; j <- 0 until 10 } yield {
      val v = new Array[Float](16)
      v(c) = 1f
      v(10 + (c % 6)) = 0.05f * j
      ((c * 10 + j).toLong, v, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("stream_ann_index: micro-batch maintenance converges, deltas version, replay is idempotent") {
    val dir = Files.createTempDirectory("graft-annidx").toString
    // three deterministic micro-batches: 0-39, 40-69, 70-99
    val b0 = clustered.filter(col("vec_id") < 40)
    val b1 = clustered.filter(col("vec_id") >= 40 && col("vec_id") < 70)
    val b2 = clustered.filter(col("vec_id") >= 70)
    assert(StreamingAnnIndex.maintain(spark, dir, b0, 0L, k = 8, iterations = 3) == 40)
    StreamingAnnIndex.maintain(spark, dir, b1, 1L, k = 8, iterations = 3)
    StreamingAnnIndex.maintain(spark, dir, b2, 2L, k = 8, iterations = 3)

    val idx = StreamingAnnIndex.readIndex(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every ingested vector has a neighborhood in the merged view
    assert(idx.map(_._1).distinct.length == 100)
    // incremental quality: most edges in-cluster despite 3-way split
    val inCluster = idx.count { case (a, b, _) => a / 10 == b / 10 }
    assert(inCluster.toDouble / idx.length > 0.7,
      s"streamed index strayed: $inCluster/${idx.length}")
    // deltas are versioned per batch
    val vers = new java.io.File(s"$dir/graph").listFiles()
      .map(_.getName).filter(_.startsWith("ver=")).toSet
    assert(vers == Set("ver=0", "ver=1", "ver=2"))

    // replay of the last batch (crash between publish and checkpoint
    // commit): overwrites its own ver partition, merged view unchanged
    val before = idx.toSet
    StreamingAnnIndex.maintain(spark, dir, b2, 2L, k = 8, iterations = 3)
    val after = StreamingAnnIndex.readIndex(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after.map(_._1) == before.map(_._1))
    assert(after.size == before.size, s"replay changed index size: ${before.size} -> ${after.size}")
  }

  test("stream_ann_index: the foreachBatch wiring drives the same maintenance") {
    val dir = Files.createTempDirectory("graft-annidx-s").toString
    val in = Files.createTempDirectory("graft-annidx-in").toString
    val ckpt = Files.createTempDirectory("graft-annidx-ck").toString
    clustered.repartition(3).write.mode("overwrite").parquet(in)
    val stream = spark.readStream
      .schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val q = StreamingAnnIndex.indexWriter(stream, dir, ckpt, k = 8, iterations = 3)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val idx = StreamingAnnIndex.readIndex(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(idx.map(_._1).distinct.length == 100)
    val inCluster = idx.count { case (a, b) => a / 10 == b / 10 }
    assert(inCluster.toDouble / idx.length > 0.7)
    // vectors are retrievable for downstream re-ranking
    assert(StreamingAnnIndex.readVectors(spark, dir).count() == 100)
  }
}
