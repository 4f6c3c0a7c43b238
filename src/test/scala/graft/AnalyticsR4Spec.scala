package graft

import graft.operators.EventAnalytics
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Semantic ground truth for the round-4 family: sketch-backed
  * conversion latency (q145) and friends. */
class AnalyticsR4Spec extends SparkSpec {
  import spark.implicits._
  lazy val t = Tables(spark, sfDir)

  test("q145: t-digest latency percentiles land within 2% of exact q103, day by day") {
    val exact = EventAnalytics.conversionLatency(t.events).collect()
      .map(r => r.getAs[String]("day") ->
        (r.getAs[Long]("n_conversions"),
         r.getAs[Double]("median_latency_s"),
         r.getAs[Double]("p90_latency_s"))).toMap
    val sketch = EventAnalytics.conversionLatencySketch(t.events).collect()
    assert(sketch.nonEmpty, "sketch variant returned no days")
    assert(sketch.map(_.getAs[String]("day")).toSet == exact.keySet,
      "sketch and exact variants disagree on the day set")
    sketch.foreach { r =>
      val day = r.getAs[String]("day")
      val (en, em, ep) = exact(day)
      assert(r.getAs[Long]("n_conversions") == en, s"$day conversion count diverged")
      val sm = r.getAs[Double]("median_latency_s")
      val sp = r.getAs[Double]("p90_latency_s")
      assert(math.abs(sm - em) <= math.max(0.02 * em, 1e-3), s"$day median: sketch $sm vs exact $em")
      assert(math.abs(sp - ep) <= math.max(0.02 * ep, 1e-3), s"$day p90: sketch $sp vs exact $ep")
    }
  }
}
