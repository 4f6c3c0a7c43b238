package graft

import graft.operators.StatTests
import graft.sources.Tables

/** Round-9 additions: Holt linear-trend smoothing (q281). */
class AnalyticsR9Spec extends SparkSpec {
  import spark.implicits._
  lazy val t = Tables(spark, sfDir)

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("q281: hand-traced Holt recurrence (α=0.25, β=0.125)") {
    // daily revenue: d1=100, d2=110, d3=120
    // init: ℓ=100, b=0, f1=100
    // d2: f=100; ℓ=.25·110+.75·100=102.5; b=.125·2.5=0.3125
    // d3: f=102.8125; ℓ=.25·120+.75·102.8125=107.109375;
    //     b=.125·4.609375+.875·0.3125=0.849609375
    val orders = Seq(
      (1L, 1L, "O", 100.0, ts("1997-01-01"), "1-URGENT"),
      (2L, 1L, "O", 60.0, ts("1997-01-02"), "1-URGENT"),
      (3L, 1L, "O", 50.0, ts("1997-01-02"), "1-URGENT"),
      (4L, 1L, "O", 120.0, ts("1997-01-03"), "1-URGENT")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "o_orderpriority")
    val got = StatTests.holtForecast(orders).collect()
    assert(got.length === 3)
    val d2 = got(1)
    assert(d2.getAs[Double]("rev") === 110.0)
    assert(d2.getAs[Double]("forecast") === 100.0)
    assert(d2.getAs[Double]("level") === 102.5)
    assert(d2.getAs[Double]("trend") === 0.3125)
    assert(d2.getAs[Double]("err") === 10.0)
    val d3 = got(2)
    assert(d3.getAs[Double]("forecast") === 102.8125)
    assert(d3.getAs[Double]("level") === 107.1094) // 107.109375 → 4dp portable round
    assert(d3.getAs[Double]("trend") === 0.8496)   // 0.849609375 → 4dp
    assert(d3.getAs[Double]("err") === 17.1875)
  }

  test("q281: constant series locks level to the value with zero trend") {
    val orders = (1 to 5).map { i =>
      (i.toLong, 1L, "O", 42.0, ts(f"1997-01-0$i"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "o_orderpriority")
    val got = StatTests.holtForecast(orders).collect()
    assert(got.forall(_.getAs[Double]("level") === 42.0))
    assert(got.forall(_.getAs[Double]("trend") === 0.0))
    assert(got.forall(_.getAs[Double]("err") === 0.0))
  }

  test("q281 on the corpus: one row per day, forecast errors center near zero") {
    val got = StatTests.holtForecast(t.orders).collect()
    val nDays = t.orders.select(org.apache.spark.sql.functions.to_date(
      org.apache.spark.sql.functions.col("o_orderdate"))).distinct().count()
    assert(got.length.toLong === nDays)
    // smoothing tracks the series: mean |err| is well under the mean level
    val meanAbsErr = got.map(r => math.abs(r.getAs[Double]("err"))).sum / got.length
    val meanRev = got.map(_.getAs[Double]("rev")).sum / got.length
    assert(meanAbsErr < meanRev, s"Holt diverged: mae=$meanAbsErr vs rev=$meanRev")
  }
}
