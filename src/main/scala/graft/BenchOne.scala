package graft

import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query (dev loop: `runMain graft.BenchOne
  * <name> [reps]` with SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS). */
object BenchOne {
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
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val (sec, err) = Bench.timeQuery(spark, sfDir, fn)
      println(f"[benchone] $name run $i: $sec%.2f s${err.map(" ERR " + _).getOrElse("")}")
    }
    spark.stop()
  }
}
