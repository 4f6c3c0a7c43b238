package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{FirstSeenState, StreamingDedup, StreamingSessionize}

/** Streaming micro-bench (r12, verdict item 10): rows/s per micro-batch
  * for the stateful streaming operators — sessionize (custom
  * flatMapGroupsWithState and native session_window), watermark dedup
  * (by id and by content fingerprint), and the first-seen claim loop.
  *
  * The events table is staged as `nBatches` parquet files and replayed
  * with `maxFilesPerTrigger = 1` under `Trigger.AvailableNow`, so each
  * micro-batch is one file; per-batch rows and trigger wall come from
  * the streaming progress log — the numbers measure the operator and
  * its state store, not the harness. First-seen (a foreachBatch-side
  * batch loop by contract) is timed per `claimFirstSeen` call.
  *
  * A dev baseline tool (like BenchOne/BenchSeq) — NOT part of the
  * driver's Bench contract; it changes no operator semantics. */
object BenchStreaming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nBatches = if (args.length > 0) args(0).toInt else 8
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = graft.sources.Tables(spark, sfDir).events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
    // stage TIME-ORDERED slices, one file per micro-batch, written with
    // increasing mtimes (FileStreamSource feeds oldest-first) — random
    // slicing would drive events behind the watermark and break the
    // stateful operators' event-time contract
    val in = java.nio.file.Files.createTempDirectory("graft-bstream").toString
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val sliced = events.withColumn("__b", ntile(nBatches).over(wOrd))
    (1 to nBatches).foreach { b =>
      sliced.filter(col("__b") === b).drop("__b")
        .coalesce(1).write.mode("append").parquet(in)
      Thread.sleep(100)
    }
    val schema = spark.read.parquet(in).schema
    def stream: DataFrame = spark.readStream
      .schema(schema).option("maxFilesPerTrigger", 1).parquet(in)

    def run(name: String)(f: DataFrame => DataFrame): Unit = {
      val ck = java.nio.file.Files.createTempDirectory(s"graft-bs-ck").toString
      val q = f(stream).writeStream
        .format("noop")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      val tot = prog.map(_.numInputRows).sum
      val ms = prog.map(_.durationMs.get("triggerExecution").toLong).sum
      val per = prog
        .map(p => s"${p.numInputRows}r/${p.durationMs.get("triggerExecution")}ms")
        .mkString(" ")
      println(
        f"[benchstreaming] $name: $tot rows, ${prog.length} batches, " +
          f"${ms / 1000.0}%.2f s trigger time = ${tot * 1000.0 / math.max(1, ms)}%.0f rows/s  [$per]")
    }

    run("sessionize_fmgws")(df => StreamingSessionize.sessionize(spark, df).toDF())
    run("sessionize_native")(df => StreamingSessionize.sessionizeNative(df))
    run("dedup_id")(df => StreamingDedup.dedup(df))
    run("dedup_content")(df => StreamingDedup.dedupByContent(df))

    // first-seen claim: a foreachBatch-side batch loop by contract —
    // time each claim call over event_id-sliced batches
    val stateDir = java.nio.file.Files.createTempDirectory("graft-bs-fs").toString
    val fsSliced = events.withColumn("__b", pmod(col("event_id"), lit(nBatches)))
    val stats = (0 until nBatches).map { b =>
      val batch = fsSliced.filter(col("__b") === b).drop("__b")
      val n = batch.count()
      val t0 = System.nanoTime()
      FirstSeenState.claimFirstSeen(batch, Seq("user_id"), stateDir, batchId = b)
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val totFs = stats.map(_._1).sum
    val secFs = stats.map(_._2).sum
    val perFs = stats.map { case (n, s) => f"${n}r/${s}%.2fs" }.mkString(" ")
    println(
      f"[benchstreaming] first_seen_claim: $totFs rows, $nBatches batches, " +
        f"$secFs%.2f s = ${totFs / math.max(1e-9, secFs)}%.0f rows/s  [$perFs]")
    spark.stop()
  }
}
