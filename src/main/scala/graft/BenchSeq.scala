package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a SEQUENCE of queries in one JVM (`runMain
  * graft.BenchSeq q65_semantic_dedup,q67_winnowing[:reps]`) — for
  * bisecting in-sweep timing effects where one query's execution
  * degrades a later one (JIT profile pollution, plan-state leaks),
  * which single-query BenchOne cannot reproduce by construction. */
object BenchSeq {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
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
    // process CPU seconds per run: on a host whose throttle swings
    // minute-to-minute (round-8 forensics), wall time can't compare two
    // code versions measured in different windows — CPU time measures
    // the work actually done and is steal-independent
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        val c0 = osBean.getProcessCpuTime
        val (sec, err) = Bench.timeQuery(spark, sfDir, fn)
        val cpuSec = (osBean.getProcessCpuTime - c0) / 1e9
        println(f"[benchseq] $name run $i: $sec%.2f s  cpu=$cpuSec%.1f s${err.map(" ERR " + _).getOrElse("")}  ${Bench.jvmStateLine()}")
      }
    }
    spark.stop()
  }
}
