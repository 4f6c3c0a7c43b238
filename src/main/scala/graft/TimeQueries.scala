package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for iterating on one operator's plan without
  * paying the full Bench sweep: `runMain graft.TimeQueries q67_winnowing
  * [q40_minhash_lsh ...]`. Same session shape and min-of-two protocol as
  * Bench so numbers are comparable.
  */
object TimeQueries {
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
    val t = sources.Tables(spark, sfDir)
    Seq(t.lineitem, t.orders, t.documents, t.embeddings, t.events).foreach(_.count())
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val (a, e1) = Bench.timeQuery(spark, sfDir, fn)
      val (b, e2) = Bench.timeQuery(spark, sfDir, fn)
      println(f"TIMING $name%s cold=$a%.2f warm=$b%.2f min=${math.min(a, b)}%.2f err=${e1.orElse(e2).getOrElse("-")}")
    }
    spark.stop()
  }
}
