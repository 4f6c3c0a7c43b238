package graft

import graft.operators.{AsOfJoin, EventAnalytics, Relational}
import org.apache.spark.sql.functions._

/** Round-5 batch-2 additions: drawdown (q210), Pythagorean means (q211),
  * leave-one-out benchmark (q212), activity streaks (q213), debounce
  * (q214), nearest-match join (q215), time-weighted average (q216),
  * sequence match with exclusion (q217). Hand-built fixtures with answers
  * verifiable by eye; the DuckDB oracle covers the real tables.
  */
class AnalyticsR7Spec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("q210: drawdown tracks the running peak, not the global one") {
    import spark.implicits._
    val customer = Seq((1L, 7)).toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (1L, ts("1995-01-10 00:00:00"), 100.0),
      (1L, ts("1995-02-10 00:00:00"), 50.0),  // dd 0.5 vs peak 100
      (1L, ts("1995-03-10 00:00:00"), 200.0), // new peak
      (1L, ts("1995-04-10 00:00:00"), 120.0)  // dd 0.4 vs peak 200
    ).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val r = Relational.revenueDrawdown(customer, orders).head()
    assert(r.getAs[Long]("n_months") === 4L)
    assert(r.getAs[Double]("peak_rev") === 200.0)
    assert(r.getAs[Double]("max_drawdown") === 0.5)
  }

  test("q211: arithmetic/geometric/harmonic means on a known pair") {
    import spark.implicits._
    val orders = Seq(("P1", 2.0), ("P1", 8.0)).toDF("o_orderpriority", "o_totalprice")
    val r = Relational.pythagoreanMeans(orders).head()
    assert(r.getAs[Double]("arith_mean") === 5.0)
    assert(r.getAs[Double]("geo_mean") === 4.0)
    assert(r.getAs[Double]("harm_mean") === 3.2)
  }

  test("q212: peer average excludes the nation itself") {
    import spark.implicits._
    val customer = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("o_custkey", "o_totalprice")
    val got = Relational.leaveOneOut(customer, orders)
      .collect().map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1, 25.0, 0.4), (2, 20.0, 1.0), (3, 15.0, 2.0)))
  }

  test("q213: islands split on the missing day; multiple visits one day count once") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 01:00:00")), (1L, ts("2024-01-01 22:00:00")),
      (1L, ts("2024-01-02 01:00:00")), (1L, ts("2024-01-03 01:00:00")),
      (1L, ts("2024-01-05 01:00:00")), // gap → second island of 1
      (2L, ts("2024-01-01 01:00:00")), (2L, ts("2024-01-03 01:00:00")),
      (2L, ts("2024-01-05 01:00:00"))  // all isolated → longest 1
    ).toDF("user_id", "ts")
    val got = EventAnalytics.activityStreaks(events)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 1L), (3L, 1L)))
  }

  test("q214: a burst keeps its first event; a gap past the threshold opens a new one") {
    import spark.implicits._
    val events = Seq(
      (1L, "click", ts("2024-01-01 00:00:00"), 1L),
      (1L, "click", ts("2024-01-01 00:01:40"), 2L), // +100 s: same burst
      (1L, "click", ts("2024-01-01 00:08:20"), 3L), // +400 s: new burst
      (2L, "click", ts("2024-01-01 00:00:00"), 4L)  // own burst
    ).toDF("user_id", "event_type", "ts", "event_id")
    val r = EventAnalytics.debounce(events).head()
    assert(r.getAs[Long]("n_events") === 4L)
    assert(r.getAs[Long]("n_kept") === 3L)
    assert(r.getAs[Double]("keep_ratio") === 0.75)
  }

  test("q215: picks the closest error either side; out-of-window purchases don't match") {
    import spark.implicits._
    val events = Seq(
      (1L, "purchase", ts("2024-01-01 10:00:00"), 10L),
      (1L, "error", ts("2024-01-01 09:50:00"), 11L),    // 600 s before ← nearest
      (1L, "error", ts("2024-01-01 10:11:40"), 12L),    // 700 s after
      (2L, "purchase", ts("2024-01-01 10:00:00"), 20L), // no error within 1 h
      (2L, "error", ts("2024-01-01 12:00:00"), 21L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val r = AsOfJoin.nearestEvent(events).head()
    assert(r.getAs[Long]("n_matched") === 1L)
    assert(r.getAs[Double]("mean_gap_s") === 600.0)
    assert(r.getAs[Double]("max_gap_s") === 600.0)
  }

  test("q216: holding time weights the mean; the open-ended last event is dropped") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),  // held 10 s
      (1L, ts("2024-01-01 00:00:10"), 2L, 100.0), // held 20 s
      (1L, ts("2024-01-01 00:00:30"), 3L, 999.0)  // last: no successor
    ).toDF("user_id", "ts", "event_id", "value")
    val r = EventAnalytics.timeWeightedAvg(events).head()
    assert(r.getAs[Long]("n_intervals") === 2L)
    assert(r.getAs[Double]("total_wt") === 30.0)
    assert(r.getAs[Double]("plain_avg") === 55.0)
    assert(r.getAs[Double]("twap") === 70.0) // (10·10 + 100·20) / 30
  }

  test("q216: a user whose events share one second is excluded, not divided by zero") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 00:00:00"), 2L, 20.0)
    ).toDF("user_id", "ts", "event_id", "value")
    assert(EventAnalytics.timeWeightedAvg(events).count() === 0L)
  }

  test("q217: an error between the view and the purchase breaks the pattern") {
    import spark.implicits._
    val events = Seq(
      (1L, "view", ts("2024-01-01 00:00:01"), 1L),  // clean pair
      (1L, "purchase", ts("2024-01-01 00:00:02"), 2L),
      (2L, "view", ts("2024-01-01 00:00:01"), 3L),  // error in between
      (2L, "error", ts("2024-01-01 00:00:02"), 4L),
      (2L, "purchase", ts("2024-01-01 00:00:03"), 5L),
      (3L, "error", ts("2024-01-01 00:00:01"), 6L), // error BEFORE the view: clean
      (3L, "view", ts("2024-01-01 00:00:02"), 7L),
      (3L, "purchase", ts("2024-01-01 00:00:03"), 8L),
      (4L, "purchase", ts("2024-01-01 00:00:01"), 9L) // no view at all
    ).toDF("user_id", "event_type", "ts", "event_id")
    val r = EventAnalytics.sequenceMatch(events).head()
    assert(r.getAs[Long]("n_clean_purchases") === 2L)
    assert(r.getAs[Long]("n_users") === 2L)
  }
}
