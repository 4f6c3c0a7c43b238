package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Bench the SKEW-SENSITIVE family on the adversarial fixture
  * ([[GenSkewData]]: whale customer, hot part, hot date, hot user,
  * boilerplate-heavy corpus) — the dataset the uniform driver testdata
  * never is. Besides wall time, records the MAX per-task shuffle-read
  * and input record counts for each query: a hidden quadratic or an
  * unsplit hot key shows up as one monster task long before it shows up
  * in local wall-clock, which is exactly what dies first on a cluster.
  *
  * Run: `sbt "runMain graft.BenchSkew [fixtureDir]"` — generates the
  * fixture on first use (deterministic, ~600k lineitem at scale 1). */
object BenchSkew {

  /** Queries whose 100 TB story depends on skew handling. */
  private val SkewQueries = Seq(
    "q349_substitutes",   // whale-customer pair expansion (capPerKey)
    "q92_copurchase",     // basket pair expansion (order-size bounded)
    "q106_itemsets",      // triple expansion (order-size bounded)
    "q150_global_rownum", // global order via range buckets (hot values)
    "q154_skew_audit",    // the audit itself on a genuinely skewed key
    "q40_minhash_lsh",    // banded LSH with maxBucket caps (hot buckets)
    "q22_sessionize",     // per-user windows with a hot user
    "q118_peak_concurrency", // hot-day interval sweep
    "q70_sink_ingest",    // rebalance + AQE skew split on a hot (dt,hr)
    "q43_embedding_neardup", // SRP buckets vs a dense hot cluster
    "q52_ann_lsh",        // LSH buckets saturated by the hot cluster
    "q53_ann_ivf",        // IVF with 40% of mass in one centroid
    "q65_semantic_dedup") // bucketed cosine + bounded components, clumpy

  final class TaskMaxListener extends SparkListener {
    @volatile var maxShuffleReadRows = 0L
    @volatile var maxInputRows = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        maxShuffleReadRows = math.max(maxShuffleReadRows, m.shuffleReadMetrics.recordsRead)
        maxInputRows = math.max(maxInputRows, m.inputMetrics.recordsRead)
      }
    }
    def reset(): Unit = { maxShuffleReadRows = 0L; maxInputRows = 0L }
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/skewdata"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-bench-skew")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // embeddings is the newest fixture table — its presence marks a
    // complete generation
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")))
      GenSkewData.generate(spark, dir)

    val listener = new TaskMaxListener
    spark.sparkContext.addSparkListener(listener)

    // warmup: one scan per table
    Seq("lineitem", "orders", "customer", "part", "events", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$dir/$t.parquet").count())

    val rows = SkewQueries.map { name =>
      val fn = SparkEntry.queries(name)
      listener.reset()
      val (sec, err) = Bench.timeQuery(spark, dir, fn)
      // listener events drain asynchronously; settle before reading
      Thread.sleep(300)
      val line = (name, sec, listener.maxShuffleReadRows, listener.maxInputRows, err)
      System.err.println(f"[benchskew] $name%-24s ${sec}%7.2f s  maxTaskShuffleRows=${line._3}%,d maxTaskInputRows=${line._4}%,d ${err.getOrElse("")}")
      line
    }
    val qs = rows.map { case (n, s, sh, in, _) =>
      s""""$n":{"sec":$s,"max_task_shuffle_rows":$sh,"max_task_input_rows":$in}"""
    }.mkString("{", ",", "}")
    val errs = rows.collect { case (n, _, _, _, Some(e)) => s""""$n":"${e.replace("\"", "'")}"""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"skew_total","value":${rows.map(_._2).sum},"unit":"sec","queries":$qs,"errors":$errs,"fixture":"$dir"}""")
    spark.stop()
  }
}
