package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q70 forensics (round 8): decompose the sink-ingest wall time into
  * (a) the events scan+rebalance shuffle, (b) the parquet staging write
  * with its 1440-file dynamic-partition commit, and (c) the read-back
  * aggregate — on BOTH a /tmp (disk) root and a /dev/shm (tmpfs) root.
  * If (b) on disk dominates and (b) on tmpfs doesn't, the regression the
  * round-7 judge flagged is file-commit I/O latency on the shared VM
  * volume, not a plan change. Dev tool, not part of the library surface. */
object BenchForensic {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-stage telemetry: wall-clock span, summed task time, task count —
    // separates "tasks are slow" from "driver/commit is slow" (a gap
    // between job wall and stage spans = driver-side commit time)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for (a <- i.completionTime; b <- i.submissionTime) yield (a - b) / 1e3).getOrElse(-1.0)
        val taskSec = i.taskMetrics.executorRunTime / 1e3
        stages.add(f"    stage ${i.stageId}%3d ${i.name.takeWhile(_ != ' ')}%-28s wall=$wall%6.2f s taskSum=$taskSec%7.2f s tasks=${i.numTasks}")
      }
    })

    def time[A](label: String)(f: => A): A = {
      stages.clear()
      val t0 = System.nanoTime(); val r = f
      println(f"[forensic] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      stages.forEach(println(_))
      r
    }

    val events = sources.Tables(spark, sfDir).events
    time("warm: events count")(events.count())

    // (a) shuffle only: same rebalance shape, no file write
    (1 to 2).foreach { i =>
      time(s"shuffle-only pass $i") {
        events.filter(col("ts").isNotNull)
          .withColumn("dt", date_format(col("ts"), "yyyyMMdd"))
          .withColumn("hr", date_format(col("ts"), "HH"))
          .hint("rebalance", col("dt"), col("hr"))
          .write.format("noop").mode("overwrite").save()
      }
    }

    println(s"[forensic] parquet codec = ${spark.conf.get("spark.sql.parquet.compression.codec")}")

    // (b)+(c): full writeBatch + read-back, per filesystem root × codec
    for (codec <- Seq("default", "snappy");
         base <- Seq("/tmp", "/dev/shm"); i <- 1 to 2) {
      if (codec != "default") spark.conf.set("spark.sql.parquet.compression.codec", codec)
      val root = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(base), "graft-forensic").toString
      val sink = new graft.streaming.HiveBatchSink(spark, root)
      time(f"writeBatch  $base%-9s $codec%-8s pass $i")(sink.writeBatch(events, 0))
      if (i == 1 && base == "/tmp") {
        val leaf = new java.io.File(root + "/staging")
        val dts = Option(leaf.listFiles()).getOrElse(Array.empty).filter(_.getName.startsWith("dt="))
        val sample = dts.take(3).flatMap { dt =>
          Option(dt.listFiles()).getOrElse(Array.empty).filter(_.getName.startsWith("hr=")).take(2).map { hr =>
            val files = Option(new java.io.File(hr, "ingest_batch=0").listFiles()).getOrElse(hr.listFiles())
            s"${dt.getName}/${hr.getName}: ${files.length} entries: ${files.map(_.getName).mkString(",").take(120)}"
          }
        }
        sample.foreach(s => println("[forensic] " + s))
        val all = java.nio.file.Files.walk(java.nio.file.Paths.get(root + "/staging"))
        try println(s"[forensic] total parquet files = ${all.filter(p => p.toString.endsWith(".parquet")).count()}")
        finally all.close()
      }
      time(f"readback    $base%-9s $codec%-8s pass $i") {
        spark.read.parquet(sink.stagingPath).groupBy("dt").count().count()
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
    spark.stop()
  }
}
