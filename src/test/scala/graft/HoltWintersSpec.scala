package graft

import graft.operators.StatTests
import graft.sources.Tables

/** q298: additive Holt–Winters with a weekly season. */
class HoltWintersSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  private def orders(revByDay: Seq[Double], start: Int = 1) =
    revByDay.zipWithIndex.map { case (rev, i) =>
      val day = i + start
      (day.toLong, 1L, "O", rev, ts(f"1997-01-${day}%02d"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "o_orderpriority")

  test("constant series: level locks, trend and seasonals are zero") {
    val got = StatTests.holtWinters(orders(Seq.fill(10)(42.0))).collect()
    assert(got.length === 3) // days 8..10
    got.foreach { r =>
      assert(r.getAs[Double]("level") === 42.0)
      assert(r.getAs[Double]("trend") === 0.0)
      assert(r.getAs[Double]("seasonal") === 0.0)
      assert(r.getAs[Double]("forecast") === 42.0)
      assert(r.getAs[Double]("err") === 0.0)
    }
  }

  test("pure weekly pattern: second week is forecast exactly") {
    // week = 10..70 step 10; binary-exact arithmetic throughout:
    // l0 = 280/7 = 40, s_i = y_i - 40, forecasts reproduce the pattern
    val week = Seq(10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0)
    val got = StatTests.holtWinters(orders(week ++ week)).collect()
    assert(got.length === 7)
    got.zip(week).foreach { case (r, y) =>
      assert(r.getAs[Double]("forecast") === y)
      assert(r.getAs[Double]("err") === 0.0)
      assert(r.getAs[Double]("level") === 40.0)
      assert(r.getAs[Double]("trend") === 0.0)
      assert(r.getAs[Double]("seasonal") === y - 40.0)
    }
  }

  test("fewer than period+1 days yields an empty frame") {
    assert(StatTests.holtWinters(orders(Seq.fill(7)(5.0))).count() === 0L)
  }

  test("q315: conformal interval covers ≈ target on the real series, exact on a known one") {
    // constant series: every error is 0 → qhat = 0 and coverage = 1
    val flat = StatTests.conformalForecast(orders(Seq.fill(20)(42.0))).head()
    assert(flat.getAs[Double]("qhat") === 0.0)
    assert(flat.getAs[Double]("coverage") === 1.0)
    assert(flat.getAs[Long]("n_cal") === 11L) // floor(0.6*19)
    // real series: finite-sample guarantee says coverage ≥ ~0.9 up to
    // test-set noise; sanity band only
    val real = StatTests.conformalForecast(Tables(spark, sfDir).orders).head()
    assert(real.getAs[Double]("qhat") > 0.0)
    val cov = real.getAs[Double]("coverage")
    assert(cov > 0.6 && cov <= 1.0)
    assert(real.getAs[Long]("n_days") ===
      real.getAs[Long]("n_cal") + real.getAs[Long]("n_test") + 1L)
  }

  test("real orders: forecast errors are finite and seasonals sum to a bounded drift") {
    val got = StatTests.holtWinters(Tables(spark, sfDir).orders).collect()
    assert(got.length > 100)
    got.foreach { r =>
      assert(!r.getAs[Double]("forecast").isNaN)
      assert(!r.getAs[Double]("seasonal").isNaN)
    }
    // the smoothed level tracks revenue scale: within [min, max] of daily rev
    val revs = got.map(_.getAs[Double]("rev"))
    val lvls = got.map(_.getAs[Double]("level"))
    assert(lvls.max <= revs.max * 1.5 && lvls.min >= revs.min * 0.5)
  }
}
