package graft

import graft.operators.{EventAnalytics, Relational}
import graft.sources.Tables
import org.apache.spark.sql.functions.{col, expr}

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

  test("q38 t-digest percentiles track exact within 2% of the value range") {
    val rows = Relational.tdigestPercentiles(t.events).collect()
    assert(rows.nonEmpty)
    val span = {
      val mm = t.events.agg(
        org.apache.spark.sql.functions.min("value"),
        org.apache.spark.sql.functions.max("value")).head()
      mm.getDouble(1) - mm.getDouble(0)
    }
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("td_median") - r.getAs[Double]("exact_median")) <= 0.02 * span,
        s"median off for ${r.getAs[String]("event_type")}: $r")
      assert(math.abs(r.getAs[Double]("td_p95") - r.getAs[Double]("exact_p95")) <= 0.02 * span,
        s"p95 off for ${r.getAs[String]("event_type")}: $r")
    }
  }

  test("t-digest: digests merge associatively across partition layouts") {
    import graft.functions.SketchFunctions.tdigestQuantile
    // same data, adversarial partitioning: 1 partition vs 13 — the
    // merged sketch must land near the same quantile either way
    val vals = t.lineitem.select(col("l_extendedprice").as("v"))
    def p95(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(tdigestQuantile(col("v"), 0.95, 100.0)).head().getDouble(0)
    val one  = p95(vals.coalesce(1))
    val many = p95(vals.repartition(13))
    val exact = vals.agg(expr("percentile(v, 0.95)")).head().getDouble(0)
    assert(math.abs(one - exact) / exact <= 0.02, s"1-part digest $one vs exact $exact")
    assert(math.abs(many - exact) / exact <= 0.02, s"13-part digest $many vs exact $exact")
  }

  test("q39 sketch-table rollup: merged stored sketches track exact percentiles") {
    val rows = Relational.sketchTableRollup(t.events).collect()
    assert(rows.nonEmpty)
    // t-digest's guarantee lives in RANK space: assert the fraction of
    // values at or below the merged quantile estimate, not a value-space
    // distance (heavy tails make adjacent order stats jump arbitrarily)
    def rankOf(tpe: String, v: Double): Double = {
      val grp = t.events.filter(col("event_type") === tpe)
      grp.filter(col("value") <= v).count().toDouble / grp.count()
    }
    rows.foreach { r =>
      val tpe  = r.getAs[String]("event_type")
      val rMed = rankOf(tpe, r.getAs[Double]("merged_median"))
      val rP95 = rankOf(tpe, r.getAs[Double]("merged_p95"))
      assert(rMed >= 0.46 && rMed <= 0.54, s"merged median rank $rMed off for $tpe")
      assert(rP95 >= 0.92 && rP95 <= 0.98, s"merged p95 rank $rP95 off for $tpe")
    }
    // the sketch table itself is small: one binary row per (dt, type)
    import graft.functions.SketchFunctions.tdigestSketch
    val sk = t.events.groupBy("event_type").agg(tdigestSketch(col("value")).as("sk"))
    sk.collect().foreach(r => assert(r.getAs[Array[Byte]]("sk").length < 8192, "sketch over 8KB"))
  }

  test("t-digest: array form returns quantiles in order, SQL surface registered") {
    graft.plans.VectorFunctionRegistry.register(spark)
    val r = t.events
      .agg(expr("tdigest_quantile(value, array(0.1, 0.5, 0.9), 150.0)").as("qs"))
      .head().getSeq[Double](0)
    assert(r.length == 3 && r(0) <= r(1) && r(1) <= r(2), s"quantiles not monotone: $r")
    // sketch is bounded: centroid count stays ~O(compression) however
    // many points went in
    val d = new graft.plans.TDigest(100.0)
    (1 to 200000).foreach(i => d.add(math.sin(i).toDouble * i))
    assert(d.centroidCount <= 400, s"digest grew unbounded: ${d.centroidCount} centroids")
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

  test("q54 HLL sketch rollup: merged estimate within 5% of exact, deterministic") {
    val r1 = Relational.hllSketchRollup(t.events).collect()
    assert(r1.nonEmpty)
    r1.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact  = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: approx $approx vs exact $exact")
    }
    val r2 = Relational.hllSketchRollup(t.events).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq, "HLL rollup not deterministic")
  }

  test("q54 HLL union over stored sketches equals the estimate over raw union") {
    // the service-table property: estimate(union of per-dt sketches) must
    // match estimate(one sketch over all rows) — sketches merge loss-free
    val viaSketches = Relational.hllSketchRollup(t.events)
      .select("event_type", "approx_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = t.events.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSketches == direct, s"$viaSketches vs $direct")
  }

  test("q76 funnel: stages only count conversions in order") {
    import spark.implicits._
    def ev(id: Long, user: Long, tpe: String, min: Int) =
      (id, java.sql.Timestamp.valueOf(f"2026-01-01 00:$min%02d:00"), user, tpe, 1.0, "{}")
    val events = Seq(
      ev(1, 1, "view", 1), ev(2, 1, "click", 2), ev(3, 1, "purchase", 3), // full funnel
      ev(4, 2, "click", 1), ev(5, 2, "view", 2),                          // click BEFORE view
      ev(6, 3, "view", 1), ev(7, 3, "purchase", 2)                        // skips click
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.funnel(events).as[(Long, Long, Long)].head()
    assert(r == ((3L, 1L, 1L)), s"got $r") // 3 viewers, only user 1 converts through
  }

  test("q77 rolling window: trailing hour counts only in-range prior events") {
    import spark.implicits._
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1L, "view", 10.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2026-01-01 00:59:59"), 1L, "view", 20.0, "{}"), // within 1h of e1
      (3L, java.sql.Timestamp.valueOf("2026-01-01 01:00:00"), 1L, "view", 30.0, "{}"), // e1 just aged out
      (4L, java.sql.Timestamp.valueOf("2026-01-01 05:00:00"), 1L, "view", 40.0, "{}")  // alone
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.rollingWindow(events)
      .select("event_id", "cnt_1h", "sum_1h").as[(Long, Long, Double)].collect().toSeq
    assert(r == Seq((1L, 1L, 10.0), (2L, 2L, 30.0), (3L, 2L, 50.0), (4L, 1L, 40.0)), s"got $r")
  }

  test("q78 cohort retention: users bucket by first-seen day, offsets count later activity") {
    import spark.implicits._
    def ev(id: Long, user: Long, day: Int) =
      (id, java.sql.Timestamp.valueOf(f"2026-01-$day%02d 12:00:00"), user, "view", 1.0, "{}")
    val events = Seq(
      ev(1, 1, 1), ev(2, 1, 2), ev(3, 1, 2), // user1: cohort d1, active d1+d2
      ev(4, 2, 1), ev(5, 3, 2)               // user2: d1 only; user3: cohort d2
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.cohortRetention(events)
      .as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("2026-01-01", 0L, 2L), ("2026-01-01", 1L, 1L), ("2026-01-02", 0L, 1L)), s"got $r")
  }

  test("q81 hopping windows: every event lands in exactly window/slide windows") {
    val agg = EventAnalytics.hoppingWindow(t.events)
    val total = agg.agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    assert(total == 4 * t.events.count(), "1h/15min hopping must count each event 4 times")
    // window starts align to the 15-minute grid
    val misaligned = agg.filter(col("window_start") % 900 =!= 0).count()
    assert(misaligned == 0, s"$misaligned windows off the slide grid")
  }

  test("SQL front door: registered views + extension functions answer spark.sql queries") {
    t.createViews()
    val viaSql = spark.sql(
      """SELECT n_name, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin).collect()
    val viaApi = t.customer.join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").count().orderBy("n_name").collect()
    assert(viaSql.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      viaApi.map(r => (r.getString(0), r.getLong(1))).toSeq)
    // extension-registered vector functions compose with the views in SQL
    val sim = spark.sql(
      "SELECT vec_id, vec_cosine(embedding, embedding) AS self FROM embeddings LIMIT 5").collect()
    assert(sim.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-6), "self-cosine != 1")
  }

  test("q82 heavy hitters: merged CMS estimates dominate exact counts within the eps bound") {
    import spark.implicits._
    val eps = 0.001
    val rows = Relational.cmsHeavyHitters(t.events, topK = 3, eps = eps)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 3 * 5, s"unexpected row count ${rows.length}")
    val perType = t.events.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    rows.foreach { case (tpe, user, exact, est) =>
      assert(est >= exact, s"CMS underestimated $tpe/$user: $est < $exact")
      assert(est <= exact + math.ceil(eps * perType(tpe)).toLong + 1,
        s"CMS overshoot beyond eps bound for $tpe/$user: est $est exact $exact n=${perType(tpe)}")
    }
    // determinism: fixed seed → identical output across runs
    val again = Relational.cmsHeavyHitters(t.events, topK = 3, eps = eps)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.toSeq == again.toSeq, "CMS result not deterministic")
  }

  test("q84 gap fill: dense spine, forward-filled values across gaps, zeros before first actual") {
    import spark.implicits._
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 01:30:00"), 1L, "view", 10.0, "{}"),
      // hours 02-03 are a gap, then a new actual at 04
      (2L, java.sql.Timestamp.valueOf("2026-01-01 04:30:00"), 1L, "view", 7.0, "{}"),
      // a second type starting later: its hour-1..2 spine rows pre-date any actual
      (3L, java.sql.Timestamp.valueOf("2026-01-01 03:30:00"), 2L, "click", 5.0, "{}"),
      (4L, java.sql.Timestamp.valueOf("2026-01-01 01:10:00"), 3L, "click", 2.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventAnalytics.gapFill(events)
      .as[(String, Long, Double, Long)].collect()
      .map(r => (r._1, (r._2 % 86400) / 3600, r._3, r._4)).toSeq
    val expected = Seq(
      ("click", 1L, 2.0, 1L), ("click", 2L, 2.0, 0L), ("click", 3L, 5.0, 1L), ("click", 4L, 5.0, 0L),
      ("view", 1L, 10.0, 1L), ("view", 2L, 10.0, 0L), ("view", 3L, 10.0, 0L), ("view", 4L, 7.0, 1L))
    assert(got == expected, s"got $got")
  }

  test("q79 histogram: bins partition the orders exactly") {
    val bins = Relational.histogram(t.orders)
      .select("n_orders").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
    assert(bins.sum == t.orders.count(), "histogram dropped or double-counted rows")
    val bounds = Relational.histogram(t.orders)
      .select("bin", "bin_min", "bin_max")
      .as[(Long, Double, Double)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaDouble)).collect()
    bounds.foreach { case (bin, lo, hi) =>
      assert(lo >= bin * 50000.0 && hi < (bin + 1) * 50000.0, s"bin $bin bounds [$lo,$hi] leak")
    }
  }

  test("q147 waiting supplier: exact counts on a hand-built order book") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // order 1: supp 1 late twice, supp 2 on time  -> supp 1 credited 2
    // order 2: both supps late                     -> nobody credited
    // order 3: single-supplier order, late         -> nobody (no co-supplier)
    // order 4: supp 3 late once beside on-time 2   -> supp 3 credited 1
    // order 5: open order ('O'), supp 1 late       -> excluded by status
    val lineitem = Seq(
      (1L, 1L, ts("2025-06-01")), (1L, 1L, ts("2025-07-01")), (1L, 2L, ts("2025-01-10")),
      (2L, 1L, ts("2025-06-01")), (2L, 2L, ts("2025-06-01")),
      (3L, 1L, ts("2025-06-01")),
      (4L, 2L, ts("2025-01-15")), (4L, 3L, ts("2025-09-01")),
      (5L, 1L, ts("2025-06-01")), (5L, 2L, ts("2025-01-05"))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val orders = Seq(
      (1L, ts("2025-01-01"), "F"), (2L, ts("2025-01-01"), "F"),
      (3L, ts("2025-01-01"), "F"), (4L, ts("2025-01-01"), "F"),
      (5L, ts("2025-01-01"), "O")
    ).toDF("o_orderkey", "o_orderdate", "o_orderstatus")
    val supplier = Seq((1L, "S1"), (2L, "S2"), (3L, "S3")).toDF("s_suppkey", "s_name")
    val got = Relational.waitingSupplier(lineitem, orders, supplier)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("S1", 2L), ("S3", 1L)), s"got $got")
  }

  test("q147 waiting supplier: decorrelated plan ≡ the textbook correlated EXISTS form") {
    import spark.implicits._
    t.lineitem.createOrReplaceTempView("q147_l")
    t.orders.createOrReplaceTempView("q147_o")
    t.supplier.createOrReplaceTempView("q147_s")
    val textbook = spark.sql(
      """SELECT s.s_name, count(*) AS numwait
        |FROM q147_s s
        |JOIN q147_l l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN q147_o o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS
        |  AND EXISTS (SELECT 1 FROM q147_l l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM q147_l l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name LIMIT 20""".stripMargin)
      .as[(String, Long)].collect().toSeq
    val got = Relational.waitingSupplier(t.lineitem, t.orders, t.supplier)
      .as[(String, Long)].collect().toSeq
    assert(got.nonEmpty, "degenerate fixture: no sole-delayed supplier at sf0.001")
    assert(got == textbook, s"decorrelated $got != textbook $textbook")
  }
}
