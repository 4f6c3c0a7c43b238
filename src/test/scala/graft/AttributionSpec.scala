package graft

import graft.operators.{EventAnalytics, Relational}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** q219 Markov removal-effect attribution + q220 sketch overlap. */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, second: Long, uid: Long, typ: String) =
    (id, new Timestamp(1700000000000L + second * 1000L), uid, typ, 1.0, "{}")

  private def events(rows: Seq[(Long, Long, Long, String)]) =
    rows.map { case (id, s, u, t) => ev(id, s, u, t) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("q219: the only converting channel takes all the credit") {
    // u1: A → purchase; u2: B → nothing
    val df = events(Seq(
      (1L, 0L, 1L, "A"), (2L, 10L, 1L, "purchase"),
      (3L, 0L, 2L, "B")))
    val got = EventAnalytics.markovAttribution(df)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    // p_full = 0.5; removing A kills all conversion (RE=1), removing B changes nothing
    assert(got === Seq(("A", 1.0, 1.0), ("B", 0.0, 0.0)))
    assert(EventAnalytics.markovAttribution(df).head().getAs[Double]("p_conv_full") === 0.5)
  }

  test("q219: a channel on the only path to conversion outranks a side channel") {
    // u1: A → B → purchase (both on the path)
    // u2: C → nothing (dead end)
    // u3: A → B → purchase
    val df = events(Seq(
      (1L, 0L, 1L, "A"), (2L, 1L, 1L, "B"), (3L, 2L, 1L, "purchase"),
      (4L, 0L, 2L, "C"),
      (5L, 0L, 3L, "A"), (6L, 1L, 3L, "B"), (7L, 2L, 3L, "purchase")))
    val rows = EventAnalytics.markovAttribution(df)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // removing A or B severs both converting paths; C never converts
    assert(rows("A") === 1.0 && rows("B") === 1.0 && rows("C") === 0.0)
  }

  test("q219: direct conversions (no prior touch) keep p_conv alive under removals") {
    // u1 converts with no touches; u2 touches A then dies
    val df = events(Seq(
      (1L, 0L, 1L, "purchase"),
      (2L, 0L, 2L, "A")))
    val r = EventAnalytics.markovAttribution(df).head()
    // START → CONV 0.5 direct; A contributes no conversion, removal effect 0
    assert(r.getString(0) === "A")
    assert(r.getAs[Double]("removal_effect") === 0.0)
    assert(r.getAs[Double]("p_conv_full") === 0.5)
  }

  test("q221: hand curve — churn drops survival, censoring only shrinks the risk set") {
    import java.sql.Timestamp
    def day(d: Int) = new Timestamp(1700000000000L + d * 86400000L)
    val orders = Seq(
      (1L, day(0)), (1L, day(60)),   // churned at 2 months
      (2L, day(0)),                  // churned at 0 months
      (3L, day(0)), (3L, day(900)),  // censored (active 100 d before end)
      (4L, day(500)), (4L, day(1000)) // censored, defines corpus end
    ).toDF("o_custkey", "o_orderdate")
    val got = graft.operators.StatTests.kaplanMeier(orders)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (0L, 4L, 1L, 0.75),  // 1 − 1/4
      (2L, 3L, 1L, 0.5),   // 0.75 · (1 − 1/3)
      (16L, 2L, 0L, 0.5),  // censoring: S unchanged
      (30L, 1L, 0L, 0.5)))
  }

  test("q221: everyone-at-risk dying zeroes S without ln(0) blowing up") {
    import java.sql.Timestamp
    def day(d: Int) = new Timestamp(1700000000000L + d * 86400000L)
    val orders = Seq(
      (1L, day(0)), (2L, day(0)), // both churn at lifetime 0
      (3L, day(2000))             // defines the corpus end, censored
    ).toDF("o_custkey", "o_orderdate")
    val got = graft.operators.StatTests.kaplanMeier(orders)
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
    // single-order customers all land at t=0: at_risk 3, d=2 → S = 1/3
    assert(got.toSeq === Seq((0L, 0.3333)))
    val all = graft.operators.StatTests.kaplanMeier(orders, churnDays = -1)
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
    // churnDays = -1 ⇒ every customer churns; the whole risk set dies at
    // t=0 → factor 0 → survival exactly 0 through the guard, not ln(0)
    assert(all.toSeq === Seq((0L, 0.0)))
  }

  test("q220: sketch overlap tracks the exact q162 matrix within 5%") {
    val ev = Tables(spark, sfDir).events
    val exact = Relational.audienceOverlap(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(4), r.getDouble(5))).toMap
    val est = Relational.sketchOverlap(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(5), r.getDouble(6))).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, (nBoth, jac)) =>
      val (eBoth, eJac) = est(k)
      assert(math.abs(eBoth - nBoth) <= math.max(5.0, 0.05 * nBoth), s"$k inter: $eBoth vs $nBoth")
      assert(math.abs(eJac - jac) <= 0.05, s"$k jaccard: $eJac vs $jac")
    }
  }
}
