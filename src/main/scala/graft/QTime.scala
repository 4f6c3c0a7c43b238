package graft

import org.apache.spark.sql.SparkSession

/** Developer utility: time a named subset of SparkEntry queries with the
  * same session config and warmup discipline as Bench, without paying for
  * the full 238-query sweep. Usage:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.QTime q104_bfs_reach q98_pagerank"`
  * Prints `qtime <name> <first>s <second>s` per query (two runs: cold-ish
  * then warm — the gap isolates codegen/page-cache cost from plan cost). */
object QTime {
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
    val names = if (args.isEmpty) Seq("q01_pricing_summary") else args.toSeq
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"qtime $name UNKNOWN")
        case Some(fn) =>
          val (a, e1) = Bench.timeQuery(spark, sfDir, fn)
          val (b, e2) = Bench.timeQuery(spark, sfDir, fn)
          println(f"qtime $name $a%.2fs $b%.2fs ${e1.orElse(e2).getOrElse("")}")
      }
    }
    spark.stop()
  }
}
