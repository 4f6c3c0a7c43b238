package graft

import graft.operators.{Graph, StatTests}
import graft.sources.Tables

/** Round-9 additions: Holt linear-trend smoothing (q281), weighted
  * shortest paths (q282). */
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

  test("q282: relaxation takes the 2-hop shortcut over the direct heavy edge") {
    import spark.implicits._
    // baskets: {1,2}×2 → w(1,2)=0.5; {2,3}×3 → w(2,3)=0.3333; {1,3}×1 → w=1.0
    // all degrees tie at 2 → seed = min id = 1
    // dist(3) = min(1.0 direct, 0.5+0.3333 via 2) = 0.8333
    val lineitem = Seq(
      (101L, 1L), (101L, 2L),
      (102L, 1L), (102L, 2L),
      (103L, 2L), (103L, 3L),
      (104L, 2L), (104L, 3L),
      (105L, 2L), (105L, 3L),
      (106L, 1L), (106L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val got = Graph.shortestPaths(lineitem, minSupport = 1, maxHops = 4)
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 0.0, 2L -> 0.5, 3L -> 0.8333))
  }

  test("q282: hop bound truncates the frontier — a 2-chain is cut at maxHops=1") {
    import spark.implicits._
    val lineitem = Seq(
      (101L, 1L), (101L, 2L), (102L, 1L), (102L, 2L),
      (103L, 2L), (103L, 3L), (104L, 2L), (104L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val got = Graph.shortestPaths(lineitem, minSupport = 1, maxHops = 1)
      .as[(Long, Double)].collect().toMap
    // seed is node 2 (degree 2 vs 1); one hop reaches 1 and 3
    assert(got.keySet === Set(1L, 2L, 3L))
    val cut = Graph.shortestPaths(
      Seq((101L, 1L), (101L, 2L), (103L, 2L), (103L, 3L)).toDF("l_orderkey", "l_partkey"),
      minSupport = 1, maxHops = 1)
      .as[(Long, Double)].collect().toMap
    assert(cut.keySet === Set(1L, 2L, 3L)) // seed 2 again: both ends in one hop
  }

  test("q282 on the corpus: seed at zero, distances positive and finite") {
    val got = Graph.shortestPaths(Tables(spark, sfDir).lineitem).collect()
    assert(got.length > 1, "seeded component must reach beyond the seed")
    val dists = got.map(_.getAs[Double]("dist"))
    assert(dists.count(_ == 0.0) === 1, "exactly the seed at distance 0")
    assert(dists.forall(d => d >= 0.0 && d <= 4.0), "≤4 hops of ≤1.0-weight edges")
  }

  test("q283: hand migration — riser, faller, churner, joiner all land in the right cell") {
    import spark.implicits._
    import graft.operators.GlobalOrder
    // before (5 customers → quintiles are singletons): rev order 1<2<3<4<5
    // after: customer 1 becomes top, 5 churns, 6 joins
    def o(id: Long, ck: Long, price: Double, day: String) =
      (id, ck, "O", price, ts(day), "1-URGENT")
    val orders = Seq(
      o(1, 1, 10.0, "1997-01-01"), o(2, 2, 20.0, "1997-01-01"),
      o(3, 3, 30.0, "1997-01-01"), o(4, 4, 40.0, "1997-01-01"),
      o(5, 5, 50.0, "1997-01-01"),
      o(6, 1, 500.0, "1999-01-01"), o(7, 2, 20.0, "1999-01-01"),
      o(8, 3, 30.0, "1999-01-01"), o(9, 4, 40.0, "1999-01-01"),
      o(10, 6, 1.0, "1999-01-01")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "o_orderpriority")
    val got = GlobalOrder.valueTierMigration(orders).collect()
      .map(r => (r.getAs[Int]("tier_before"), r.getAs[Int]("tier_after")) ->
        r.getAs[Long]("n_customers")).toMap
    // after-period ranking (rev, custkey): 6(1.0)→t1, 2(20)→t2, 3(30)→t3,
    // 4(40)→t4, 1(500)→t5
    assert(got((1, 5)) === 1L) // customer 1 rose bottom → top
    assert(got((5, 0)) === 1L) // customer 5 churned
    assert(got((0, 1)) === 1L) // customer 6 joined at the bottom
    assert(got((2, 2)) === 1L && got((3, 3)) === 1L && got((4, 4)) === 1L)
    assert(got.values.sum === 6L)
  }

  test("q284: precedence counts users, strict order, ties excluded") {
    import spark.implicits._
    import graft.operators.EventAnalytics
    def e(id: Long, min: Long, uid: Long, typ: String) =
      (id, new java.sql.Timestamp(1700000000000L + min * 60000L), uid, typ, 1.0, "{}")
    val events = Seq(
      e(1, 0, 1, "view"), e(2, 5, 1, "purchase"),   // view < purchase
      e(3, 0, 2, "view"), e(4, 5, 2, "purchase"),   // again
      e(5, 5, 3, "purchase"), e(6, 9, 3, "view"),   // reversed
      e(7, 0, 4, "view"), e(8, 0, 4, "purchase"),   // tie → neither direction
      e(9, 0, 5, "click")                           // single-type user
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventAnalytics.sequenceSupport(events).collect()
      .map(r => (r.getAs[String]("step_a"), r.getAs[String]("step_b")) ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("support"))).toMap
    assert(got(("view", "purchase"))._1 === 2L)
    assert(got(("purchase", "view"))._1 === 1L)
    assert(got(("view", "purchase"))._2 === 0.4) // 2 of 5 users
    assert(!got.contains(("click", "view")))
  }

  test("q287: U-shape weights — 40/20/40 with the 1- and 2-click conventions") {
    import spark.implicits._
    import graft.operators.EventAnalytics
    def e(id: Long, minute: Long, uid: Long, typ: String, v: Double) =
      (id, new java.sql.Timestamp(1700000000000L + minute * 60000L), uid, typ, v, "{}")
    val events = Seq(
      // user 1: 4 clicks then a 100.0 purchase → 40 + 10 + 10 + 40
      e(1, 0, 1, "click", 0.0), e(2, 1, 1, "click", 0.0),
      e(3, 2, 1, "click", 0.0), e(4, 3, 1, "click", 0.0),
      e(5, 10, 1, "purchase", 100.0),
      // user 2: one click, 50.0 purchase → full credit
      e(6, 0, 2, "click", 0.0), e(7, 5, 2, "purchase", 50.0),
      // user 3: two clicks, 80.0 purchase → 40/40
      e(8, 0, 3, "click", 0.0), e(9, 1, 3, "click", 0.0),
      e(10, 5, 3, "purchase", 80.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventAnalytics.positionAttribution(events).collect()
    assert(got.length === 1) // one click day
    val r = got(0)
    assert(r.getAs[Long]("n_touches") === 7L)
    assert(r.getAs[Long]("n_purchases") === 3L)
    // total credit conserves each purchase's full value
    assert(r.getAs[Double]("attributed_revenue") === 230.0)
  }

  test("q285: cumulative reach is monotone and ends at 1.0") {
    import graft.operators.EventAnalytics
    val got = EventAnalytics.cumulativeReach(Tables(spark, sfDir).orders).collect()
    assert(got.length > 1)
    val cum = got.map(_.getAs[Long]("cumulative_customers"))
    assert(cum.zip(cum.tail).forall { case (x, y) => y >= x }, "monotone")
    assert(got.last.getAs[Double]("reach_share") === 1.0)
    assert(cum.last === got.map(_.getAs[Long]("new_customers")).sum)
  }

  test("q288: peeling removes the pendant chain, keeps the triangle; cascade works") {
    import spark.implicits._
    // baskets encode: triangle 1-2-3 (each edge support 2) plus a chain
    // 3-4-5 (support 2): 2-core = the triangle; 4 peels, THEN 5 peels
    // (cascade — 5's degree only drops after 4 leaves)
    def basket(ok: Long, parts: Long*) = parts.map(p => (ok, p))
    val lineitem = (
      basket(1, 1, 2) ++ basket(2, 1, 2) ++
      basket(3, 2, 3) ++ basket(4, 2, 3) ++
      basket(5, 1, 3) ++ basket(6, 1, 3) ++
      basket(7, 3, 4) ++ basket(8, 3, 4) ++
      basket(9, 4, 5) ++ basket(10, 4, 5)
    ).toDF("l_orderkey", "l_partkey")
    val got = graft.operators.Graph.kCore(lineitem, k = 2, minSupport = 2)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_degree")).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got.values.forall(_ === 2L))
  }

  test("q288: k above the max degree peels everything to an empty core") {
    import spark.implicits._
    val lineitem = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
      .toDF("l_orderkey", "l_partkey")
    assert(graft.operators.Graph.kCore(lineitem, k = 3, minSupport = 2).isEmpty)
  }

  test("q288 on the corpus: every core member keeps >= k in-core neighbors") {
    val got = graft.operators.Graph.kCore(Tables(spark, sfDir).lineitem).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getAs[Long]("core_degree") >= 2L))
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
