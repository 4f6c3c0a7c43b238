package graft

import graft.operators.{EventAnalytics, Relational}
import graft.sources.Tables

class RelationalSpec extends SparkSpec {
  lazy val t = Tables(spark, sfDir)

  test("q01 pricing summary: one row per (returnflag, linestatus), totals consistent") {
    val rows = Relational.pricingSummary(t.lineitem).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = t.lineitem.filter("l_shipdate <= '1998-09-02'").count()
    assert(total == expected)
  }

  test("q03 top-k is sorted descending and bounded") {
    val rows = Relational.topkOrders(t.orders, 10).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("total_price"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q05 multi-join revenue is positive for at least one nation") {
    val rows = Relational.multiJoinAgg(t.region, t.nation, t.customer, t.orders, t.lineitem, t.supplier).collect()
    assert(rows.nonEmpty && rows.exists(_.getAs[Double]("revenue") > 0))
  }

  test("q07 window rank keeps at most N per customer, ranks start at 1") {
    val rows = Relational.windowRank(t.orders, 2).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    assert(byCust.values.forall(_.length <= 2))
    assert(byCust.values.forall(_.map(_.getAs[Long]("rn")).min == 1))
  }

  test("q10/q11 semi + anti join partition the customer set") {
    val c = t.customer; val o = t.orders
    val all  = c.count()
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    assert(semi + anti == all)
  }

  test("q22 sessionize: 1 <= sessions <= events per user") {
    val rows = EventAnalytics.sessionize(t.events).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Long]("n_sessions"); val e = r.getAs[Long]("n_events")
      assert(s >= 1 && s <= e)
    }
  }

  test("q20 hourly rollup counts sum to total events") {
    val rows  = EventAnalytics.hourlyRollup(t.events).collect()
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == t.events.count())
  }

  test("q04 broadcast join plan actually broadcasts the dim side") {
    val plan = Relational.joinBroadcast(t.lineitem, t.part).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }
}
