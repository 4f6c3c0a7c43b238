package graft

import graft.operators.{EventAnalytics, Graph, Relational, StatTests, TextAnalysis}

/** Round-8 additions: PSI drift (q240), t-closeness (q241), lead/lag
  * cross-correlation (q242), seasonal-naive backtest (q243), BOM
  * hierarchy rollup (q244), link prediction (q245), Theil–Sen trend
  * (q246), two-feature OLS (q247). Hand-built fixtures with answers
  * verifiable by eye; the DuckDB oracle covers the real tables. */
class AnalyticsR8Spec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("q240: identical baseline/current distributions score PSI 0; a shift scores > 0") {
    import spark.implicits._
    // same shape both periods → every feature's PSI is exactly 0
    val stable = Seq(
      (ts("1997-01-01"), 10000.0, "1-URGENT", "O"), (ts("1997-01-02"), 90000.0, "5-LOW", "F"),
      (ts("1999-01-01"), 10000.0, "1-URGENT", "O"), (ts("1999-01-02"), 90000.0, "5-LOW", "F")
    ).toDF("o_orderdate", "o_totalprice", "o_orderpriority", "o_orderstatus")
    val r0 = StatTests.psiDrift(stable).collect()
    assert(r0.length === 3)
    assert(r0.forall(_.getAs[Double]("psi") === 0.0))
    // priority flips entirely between periods → priority PSI > 0
    val drifted = Seq(
      (ts("1997-01-01"), 10000.0, "1-URGENT", "O"),
      (ts("1999-01-01"), 10000.0, "5-LOW", "O")
    ).toDF("o_orderdate", "o_totalprice", "o_orderpriority", "o_orderstatus")
    val pr = StatTests.psiDrift(drifted).collect()
      .find(_.getAs[String]("feature") == "priority").get
    assert(pr.getAs[Double]("psi") > 0.0)
    assert(pr.getAs[Long]("n_baseline") === 1L && pr.getAs[Long]("n_current") === 1L)
  }

  test("q241: hand-computed TVD — {A,A,B,B} and {A,A,A,A} vs global 3/4 A") {
    import spark.implicits._
    val customer = Seq(
      (1L, 1, "AUTO"), (2L, 1, "AUTO"), (3L, 1, "BUILD"), (4L, 1, "BUILD"),
      (5L, 2, "AUTO"), (6L, 2, "AUTO"), (7L, 2, "AUTO"), (8L, 2, "AUTO")
    ).toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val r = Relational.tClosenessAudit(customer).head()
    // global: A 6/8, B 2/8; class1: A 1/2 → tvd .25; class2: A 1 → tvd .25
    assert(r.getAs[Long]("n_classes") === 2L)
    assert(r.getAs[Double]("t_closeness") === 0.25)
    assert(r.getAs[Double]("avg_tvd") === 0.25)
    assert(r.getAs[Long]("classes_above_t") === 2L)
  }

  test("q242: a series that leads revenue by exactly 2 days peaks at lag +2") {
    import spark.implicits._
    // views on day d: d+1 (varying); purchases on day d worth 10×views[d-2]
    val events = (1 to 12).flatMap { d =>
      val day = f"2024-01-$d%02d"
      val views = Seq.fill(d)(("view", java.sql.Timestamp.valueOf(s"$day 01:00:00"), 0.0))
      val rev =
        if (d >= 3) Seq(("purchase", java.sql.Timestamp.valueOf(s"$day 02:00:00"), (d - 2) * 10.0))
        else Seq.empty
      views ++ rev
    }.toDF("event_type", "ts", "value")
    val rows = StatTests.xcorrLag(events).collect()
    val at2 = rows.find(_.getAs[Long]("lag") == 2L).get
    assert(at2.getAs[Double]("xcorr") === 1.0)
  }

  test("q243: an exactly 7-periodic series backtests to zero error") {
    import spark.implicits._
    val orders = (0 until 21).map { i =>
      (ts(f"1995-01-${i + 1}%02d"), (i % 7 + 1) * 10.0)
    }.toDF("o_orderdate", "o_totalprice")
    val r = StatTests.seasonalBacktest(orders).head()
    assert(r.getAs[Long]("n_days") === 14L) // days 8..21 have both lag-7 and lag-1
    assert(r.getAs[Double]("mae") === 0.0)
    assert(r.getAs[Double]("smape") === 0.0)
    assert(r.getAs[Double]("mase") === 0.0)
  }

  test("q244: 7-part binary tree — root sees all, each child its half") {
    import spark.implicits._
    // p_partkey 0..6 → hierarchy keys 1..7: node 2 covers {2,4,5}, node 3 {3,6,7}
    val part = (0 to 6).map(k => (k.toLong, 1.0)).toDF("p_partkey", "p_retailprice")
    val got = Graph.bomRollup(part, levels = 2)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("n_parts"), r.getAs[Double]("subtree_cost")))
    assert(got.toSeq === Seq((1L, 7L, 7.0), (2L, 3L, 3.0), (3L, 3L, 3.0)))
  }

  test("q245: wedge 2–1–3 with no closing edge predicts exactly (2,3)") {
    import spark.implicits._
    // pairs (1,2) and (1,3) each co-bought twice; (2,3) never
    val lineitem = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 1L), (13L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val got = Graph.linkPrediction(lineitem).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("part_a") === 2L && r.getAs[Long]("part_b") === 3L)
    assert(r.getAs[Long]("common_neighbors") === 1L)
    assert(r.getAs[Double]("jaccard") === 1.0)
  }

  test("q246: a perfectly linear daily count series has slope 1 both ways") {
    import spark.implicits._
    val orders = (1 to 5).flatMap { d =>
      Seq.fill(d)((ts(f"1995-01-$d%02d"), 0L))
    }.toDF("o_orderdate", "o_orderkey")
    val r = StatTests.theilSenTrend(orders).head()
    assert(r.getAs[Long]("n_pairs") === 10L)
    assert(r.getAs[Double]("theil_sen") === 1.0)
    assert(r.getAs[Double]("ols_slope") === 1.0)
  }

  test("q248: a planted mean shift is found exactly, with zero residual SSE") {
    import spark.implicits._
    // 5 days at 2 orders/day then 5 days at 10/day → split after day 5
    val orders = (1 to 10).flatMap { d =>
      Seq.fill(if (d <= 5) 2 else 10)((ts(f"1995-01-$d%02d"), 0L))
    }.toDF("o_orderdate", "o_orderkey")
    val r = StatTests.changepoint(orders).head()
    assert(r.getAs[String]("split_day") === "1995-01-05")
    assert(r.getAs[Long]("n_left") === 5L && r.getAs[Long]("n_right") === 5L)
    assert(r.getAs[Double]("mean_left") === 2.0 && r.getAs[Double]("mean_right") === 10.0)
    // TSS = 10·(mean−6)² = 160, residual 0 → full reduction
    assert(r.getAs[Double]("sse_reduction") === 160.0)
  }

  test("q249: a star graph is perfectly disassortative (r = −1)") {
    import spark.implicits._
    // hub 1 co-bought twice with each spoke 2,3,4; spokes never together
    val lineitem = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 1L), (13L, 3L),
      (14L, 1L), (14L, 4L), (15L, 1L), (15L, 4L)
    ).toDF("l_orderkey", "l_partkey")
    val r = Graph.degreeAssortativity(lineitem).head()
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.getAs[Double]("assortativity") === -1.0)
  }

  test("q250: triangle of equally popular parts — confidence 1/2, lift 3/4") {
    import spark.implicits._
    // each pair co-bought twice; every part in 4 of 6 orders
    val lineitem = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 1L), (4L, 3L),
      (5L, 2L), (5L, 3L), (6L, 2L), (6L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val rows = Relational.basketLift(lineitem).collect()
    assert(rows.length === 6) // 3 pairs × both directions
    rows.foreach { r =>
      assert(r.getAs[Long]("n_together") === 2L)
      assert(r.getAs[Double]("confidence") === 0.5)
      assert(r.getAs[Double]("lift") === 0.75)
    }
  }

  test("q251: exact log-linear demand recovers elasticity −2") {
    import spark.implicits._
    // unit prices 1.0 and 0.5 with q = p^(−2): (q=1, ext=1·1), (q=4, ext=4·0.5)
    val lineitem = Seq((101L, 1.0, 1.0), (101L, 4.0, 2.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((101L, "BRAND#1")).toDF("p_partkey", "p_brand")
    val r = StatTests.priceElasticity(lineitem, part).head()
    assert(r.getAs[String]("p_brand") === "BRAND#1")
    assert(r.getAs[Long]("n_lines") === 2L)
    assert(r.getAs[Double]("elasticity") === -2.0)
  }

  test("q252: revenues 80/15/5 split exactly into A, B, C") {
    import spark.implicits._
    val lineitem = Seq((1L, 80.0), (2L, 15.0), (3L, 5.0))
      .toDF("l_partkey", "l_extendedprice")
    val got = Relational.abcAnalysis(lineitem)
      .collect()
      .map(r => (r.getAs[String]("abc_class"), r.getAs[Long]("n_parts"),
        r.getAs[Double]("class_revenue"), r.getAs[Double]("revenue_share")))
    assert(got.toSeq === Seq(("A", 1L, 80.0, 0.8), ("B", 1L, 15.0, 0.15), ("C", 1L, 5.0, 0.05)))
  }

  test("q253: 50/50 tokens → simpson ½, effective vocab 2; constant source → 0 and 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b b", "s1"), (2L, "a a a a", "s2")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.simpsonDiversity(docs)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("simpson"), r.getAs[Double]("eff_vocab"))).toMap
    assert(got("s1") === ((0.5, 2.0)))
    assert(got("s2") === ((0.0, 1.0)))
  }

  test("q254: a metronome stream has cv 0 and burstiness −1") {
    import spark.implicits._
    val events = (0 until 5).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${i * 10}"), "tick")
    }.toDF("event_id", "ts", "event_type")
    val r = EventAnalytics.burstiness(events).head()
    assert(r.getAs[Long]("n_gaps") === 4L)
    assert(r.getAs[Double]("mean_gap_s") === 10.0)
    assert(r.getAs[Double]("cv") === 0.0)
    assert(r.getAs[Double]("burstiness") === -1.0)
  }

  test("q255: the all-rare-token doc outranks the all-common-token doc") {
    import spark.implicits._
    val docs = Seq((1L, "unique"), (2L, "the the the")).toDF("doc_id", "text")
    val got = TextAnalysis.docSurprisal(docs).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    // corpus: 4 tokens; "unique" c=1 → ln4; "the" c=3 → ln(4/3)
    assert(got(0).getAs[Double]("mean_surprisal") === 1.3863)
    assert(got(1).getAs[Double]("mean_surprisal") === 0.2877)
  }

  test("q256: a strongly weekday-driven series scores high seasonal strength") {
    import spark.implicits._
    val df = (0 until 35).map { i =>
      val day = java.time.LocalDate.of(1995, 1, 1).plusDays(i)
      (java.sql.Timestamp.valueOf(day.atStartOfDay()), (day.getDayOfWeek.getValue % 7 + 1) * 100.0)
    }.toDF("o_orderdate", "o_totalprice")
    val r = StatTests.seasonalityStrength(df).head()
    assert(r.getAs[Long]("n_days") === 35L)
    val s = r.getAs[Double]("seasonal_strength")
    assert(s > 0.5 && s <= 1.0, s"seasonal strength $s not in (0.5, 1]")
  }

  test("q257: hand-computed Shapley values; efficiency law holds") {
    import spark.implicits._
    // u1 clicks and converts; u2 only views and doesn't
    val events = Seq(
      (1L, "click"), (1L, "purchase"), (2L, "view")
    ).map { case (u, t) => (u, t, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")) }
      .toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.shapleyAttribution(events)
      .collect().map(r => r.getAs[String]("channel") -> r.getAs[Double]("shapley")).toMap
    // v({click})=1, v({view})=0, all else unobserved → 0
    assert(got("click") === 0.25)
    assert(got("view") === -0.0833)
    assert(got("error") === -0.0833 && got("signup") === -0.0833)
    // efficiency: Σφ = v(full) − v(∅) = 0 − 0 (both unobserved)
    assert(math.abs(got.values.sum) < 0.001)
  }

  test("q258: revenues 1..10 trace the exact Lorenz curve") {
    import spark.implicits._
    val orders = (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("o_custkey", "o_totalprice")
    val rows = StatTests.lorenzCurve(orders).collect()
    assert(rows.length === 10)
    assert(rows.head.getAs[Double]("cum_pop_share") === 0.1)
    assert(rows.head.getAs[Double]("cum_rev_share") === 0.0182) // 1/55
    assert(rows.last.getAs[Double]("cum_pop_share") === 1.0)
    assert(rows.last.getAs[Double]("cum_rev_share") === 1.0)
    assert(rows.forall(_.getAs[Long]("n_customers") == 1L))
  }

  test("q259: a single spike above the X-mR limits is flagged, flat days are not") {
    import spark.implicits._
    val orders = ((1 to 9).map(d => (ts(f"1995-01-$d%02d"), 100.0)) :+
      (ts("1995-01-10"), 200.0))
      .toDF("o_orderdate", "o_totalprice")
    val r = StatTests.spcChart(orders).head()
    assert(r.getAs[Long]("n_days") === 10L)
    assert(r.getAs[Double]("center") === 110.0)
    assert(r.getAs[Double]("ucl") === 139.5556) // 110 + 2.66·(100/9)
    assert(r.getAs[Double]("lcl") === 80.4444)
    assert(r.getAs[Long]("n_out_of_control") === 1L)
  }

  test("q242 regression: a one-day overlap lag is dropped, not emitted as NaN") {
    import spark.implicits._
    // 8 days: lag ±7 pairs exactly one day → stddev NaN in Spark, NULL
    // in DuckDB — both engines must drop it
    val events = (1 to 8).flatMap { d =>
      val day = f"2024-01-$d%02d"
      Seq.fill(d)(("view", java.sql.Timestamp.valueOf(s"$day 01:00:00"), 0.0)) :+
        (("purchase", java.sql.Timestamp.valueOf(s"$day 02:00:00"), d * 10.0))
    }.toDF("event_type", "ts", "value")
    val rows = StatTests.xcorrLag(events).collect()
    assert(!rows.exists(r => math.abs(r.getAs[Long]("lag")) == 7L), "degenerate lag leaked")
    assert(rows.forall(r => !r.getAs[Double]("xcorr").isNaN))
  }

  test("q251 regression: a singleton brand is dropped, not emitted as NaN") {
    import spark.implicits._
    val lineitem = Seq((101L, 1.0, 1.0), (101L, 4.0, 2.0), (102L, 2.0, 3.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((101L, "BRAND#1"), (102L, "BRAND#SOLO")).toDF("p_partkey", "p_brand")
    val got = StatTests.priceElasticity(lineitem, part).collect()
    assert(got.map(_.getAs[String]("p_brand")).toSeq === Seq("BRAND#1"))
  }

  test("q254 regression: a type with a single gap is dropped, not emitted as NaN") {
    import spark.implicits._
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "lone"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), "lone"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "ok"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), "ok"),
      (5L, java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), "ok")
    ).toDF("event_id", "ts", "event_type")
    val got = EventAnalytics.burstiness(events).collect()
    assert(got.map(_.getAs[String]("event_type")).toSeq === Seq("ok"))
  }

  test("q259 regression: a single-day series reports zero violations, not NULL") {
    import spark.implicits._
    val orders = Seq((ts("1995-01-01"), 100.0)).toDF("o_orderdate", "o_totalprice")
    val r = StatTests.spcChart(orders).head()
    assert(r.getAs[Long]("n_days") === 1L)
    assert(!r.isNullAt(r.fieldIndex("n_out_of_control")))
    assert(r.getAs[Long]("n_out_of_control") === 0L)
  }

  test("q260: a missing hour and a stalled hour both flag; a healthy day does not") {
    import spark.implicits._
    def hourRows(day: String, hr: Int, n: Int) =
      (0 until n).map(i => java.sql.Timestamp.valueOf(f"$day $hr%02d:00:${i % 60}%02d"))
    val events = (
      (0 to 23).filter(_ != 5).flatMap(h => hourRows("2024-01-01", h, 10)) ++ // hour 5 missing
        (0 to 23).flatMap(h => hourRows("2024-01-02", h, if (h == 7) 1 else 10)) ++ // hour 7 stalled
        (0 to 23).flatMap(h => hourRows("2024-01-03", h, 10)) // healthy
      ).toDF("ts")
    val got = EventAnalytics.partitionCompleteness(events)
      .collect().map(r => r.getAs[String]("day") ->
        (r.getAs[Long]("missing_hours"), r.getAs[Boolean]("gap_risk"))).toMap
    assert(got("2024-01-01") === ((1L, true)))
    assert(got("2024-01-02") === ((0L, true))) // 1 < 0.2 · (231/24)
    assert(got("2024-01-03") === ((0L, false)))
  }

  test("q247: exact linear data recovers beta0=2, b_qty=3, b_disc=5, r2=1") {
    import spark.implicits._
    val rows = Seq((1.0, 0.0), (2.0, 1.0), (3.0, 1.0), (4.0, 0.0), (5.0, 1.0))
    val lineitem = rows
      .map { case (q, dc) => (q, dc, 2.0 + 3.0 * q + 5.0 * dc) }
      .toDF("l_quantity", "l_discount", "l_extendedprice")
    val r = StatTests.olsTwoFeature(lineitem).head()
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Double]("beta0") === 2.0)
    assert(r.getAs[Double]("beta_quantity") === 3.0)
    assert(r.getAs[Double]("beta_discount") === 5.0)
    assert(r.getAs[Double]("r2") === 1.0)
  }
}
