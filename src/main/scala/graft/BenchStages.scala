package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one registered query with a stage listener and print
  * per-stage wall span / summed task time / task count — the §1.1
  * "where does the time actually go" decomposition for any query
  * (BenchForensic generalized beyond q70). */
object BenchStages {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for (a <- i.completionTime; b <- i.submissionTime) yield (a - b) / 1e3).getOrElse(-1.0)
        val m = i.taskMetrics
        stages.add(
          f"    stage ${i.stageId}%3d ${i.name.takeWhile(_ != ' ')}%-24s wall=$wall%6.2f s " +
            f"taskSum=${m.executorRunTime / 1e3}%7.2f s tasks=${i.numTasks}%3d " +
            f"shRead=${m.shuffleReadMetrics.totalBytesRead >> 20}%4d MB " +
            f"shWrite=${m.shuffleWriteMetrics.bytesWritten >> 20}%4d MB " +
            f"spill=${m.diskBytesSpilled >> 20}%d MB")
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      stages.clear()
      val t0 = System.nanoTime()
      val (sec, err) = Bench.timeQuery(spark, sfDir, fn)
      println(f"[benchstages] $name run $i: $sec%.2f s${err.map(" ERR " + _).getOrElse("")} (outer ${(System.nanoTime() - t0) / 1e9}%.2f)")
      if (i == reps) stages.forEach(println(_))
    }
    spark.stop()
  }
}
