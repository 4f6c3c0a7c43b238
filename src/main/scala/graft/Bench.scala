package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the target scale
  * factor and prints one JSON line. A warmup pass (scan each table once +
  * a small shuffle) runs first so per-query numbers measure the operators,
  * not JVM/codegen/session initialization. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table (page cache + footer reads) and exercise
    // shuffle/codegen/UDF machinery once
    val t = sources.Tables(spark, sfDir)
    Seq(t.lineitem, t.orders, t.customer, t.part, t.supplier, t.nation, t.region, t.events, t.documents, t.embeddings)
      .foreach(_.count())
    t.lineitem.groupBy("l_returnflag").count().count()

    // steady-state timing: min of two runs (the first pays per-query
    // codegen compilation); queries over 10s run once to bound wall time
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val first = timeOnce(fn)
      name -> (if (first > 10.0) first else math.min(first, timeOnce(fn)))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
