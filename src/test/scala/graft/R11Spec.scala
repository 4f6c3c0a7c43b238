package graft

import graft.operators.{Classify, FeatureEng, Relational}
import org.apache.spark.sql.functions._

/** Ground-truth fixtures for the round-11 additions: WOE/IV binning
  * (q426), uplift deciles (q428), SRM guardrail (q429). */
class R11Spec extends SparkSpec {
  import spark.implicits._

  private def md5ArmA(user: Long): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(user.toString.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    "01234567".contains(hex.charAt(0))
  }

  test("q426 woeIv: planted separations give signed evidence and non-negative IV") {
    // bin 0 (price < 50k): 9 of 10 orders returned; bin 1 (50k..100k):
    // 1 of 10 returned — WOE must be positive where returns concentrate,
    // negative where they are depleted, and every IV term >= 0.
    val orders = ((1L to 10L).map(k => (k, 10000.0)) ++
      (11L to 20L).map(k => (k, 60000.0))).toDF("o_orderkey", "o_totalprice")
    val returned = ((1L to 9L) :+ 11L).map(k => (k, "R")) :+ ((10L, "N"))
    val lineitem = returned.toDF("l_orderkey", "l_returnflag")
    val rows = FeatureEng.woeIv(orders, lineitem).collect()
    assert(rows.map(_.getAs[Int]("bin")).toSeq == Seq(0, 1))
    val byBin = rows.map(r => r.getAs[Int]("bin") -> r).toMap
    assert(byBin(0).getAs[Long]("n_pos") == 9L && byBin(0).getAs[Long]("n_neg") == 1L)
    assert(byBin(1).getAs[Long]("n_pos") == 1L && byBin(1).getAs[Long]("n_neg") == 9L)
    assert(byBin(0).getAs[Double]("woe") > 0, "returns concentrate in bin 0")
    assert(byBin(1).getAs[Double]("woe") < 0, "returns depleted in bin 1")
    assert(rows.forall(_.getAs[Double]("iv_term") >= 0), "IV terms are non-negative")
  }

  test("q426 woeIv: bins partition the orders and counts reconcile") {
    val t = graft.sources.Tables(spark, sfDir)
    val rows = FeatureEng.woeIv(t.orders, t.lineitem).collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == t.orders.count())
    assert(rows.forall(r =>
      r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") == r.getAs[Long]("n_orders")))
  }

  test("q429 srmCheck: an all-A cohort flags, a parity-faithful count reconciles") {
    // users chosen so md5 parity puts every one of them in arm A — a
    // deliberately broken assignment the guardrail must flag loudly.
    val aUsers = (1L to 2000L).filter(md5ArmA).take(40)
    assert(aUsers.size == 40)
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val broken = aUsers.map(u => (u, ts0)).toDF("user_id", "ts")
    val flagged = Relational.srmCheck(broken).collect()
    assert(flagged.length == 1)
    assert(flagged.head.getAs[Long]("n_a") == 40L && flagged.head.getAs[Long]("n_b") == 0L)
    assert(flagged.head.getAs[Double]("chi2") == 40.0)
    assert(flagged.head.getAs[Boolean]("srm_flag"), "all-A day must flag SRM")
    // a mixed day: n_a + n_b = distinct users, chi2 consistent
    val mixed = (1L to 200L).map(u => (u, ts0)).toDF("user_id", "ts")
    val r = Relational.srmCheck(mixed).collect().head
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert(na + nb == 200L)
    val expected = math.floor((na - nb).toDouble * (na - nb) / (na + nb) * 10000 + 0.5) / 10000
    assert(r.getAs[Double]("chi2") == expected)
    assert((1L to 200L).count(md5ArmA) == na)
  }

  test("q428 upliftDeciles: planted persuadables concentrate uplift in the top decile") {
    // score: high scorers are users 1..100 (20 views), the rest get 1
    // view. Conversions: in the HIGH-score group only arm-A users
    // convert (pure persuadables); in the low group nobody converts.
    // The top decile must then show uplift == rate_t == 1, and every
    // low-score decile shows 0/null uplift.
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val rows = (1L to 1000L).flatMap { u =>
      val high = u <= 100
      val views = if (high) 20 else 1
      val conv = high && md5ArmA(u)
      Seq.fill(views)((u, "view", ts0)) ++ (if (conv) Seq((u, "purchase", ts0)) else Nil)
    }
    val events = rows.toDF("user_id", "event_type", "ts")
    val out = Classify.upliftDeciles(events).collect()
    assert(out.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    assert(out.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c")).sum == 1000L)
    val top = out.head
    assert(top.getAs[Double]("rate_t") == 1.0, "every treated high-scorer converted")
    assert(top.getAs[Double]("rate_c") == 0.0)
    assert(top.getAs[Double]("uplift") == 1.0)
    assert(out.tail.forall(r => r.getAs[Long]("conv_t") == 0L && r.getAs[Long]("conv_c") == 0L),
      "no conversions outside the top decile")
  }

  test("q427 psmAtt: nearest control wins and controls-free nations degrade to null") {
    import graft.operators.StatTests
    // nation 7: treated (bal 160) sits between control A (100, outcome
    // 1000) and control B (200, outcome 5000) — B is 40 away vs 60, so
    // the match is B and ATT = (3000-5000)/1000 = -2.
    // nation 8: a treated customer with NO controls -> matched 0, null ATT.
    val customer = Seq(
      (1L, 7L, "BUILDING", 100.0),
      (2L, 7L, "BUILDING", 200.0),
      (3L, 7L, "AUTOMOBILE", 160.0),
      (4L, 8L, "AUTOMOBILE", 50.0)
    ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val orders = Seq((1L, 1000.0), (2L, 5000.0), (3L, 3000.0), (4L, 700.0))
      .toDF("o_custkey", "o_totalprice")
    val out = StatTests.psmAtt(customer, orders).collect()
    val n7 = out.find(_.getAs[Long]("c_nationkey") == 7L).get
    assert(n7.getAs[Long]("n_treated") == 1L && n7.getAs[Long]("n_matched") == 1L)
    assert(n7.getAs[Double]("att_k") == -2.0, s"expected -2.0, got $n7")
    assert(math.abs(n7.getAs[Double]("mean_score_gap") - 40.0) < 0.001)
    val n8 = out.find(_.getAs[Long]("c_nationkey") == 8L).get
    assert(n8.getAs[Long]("n_matched") == 0L && n8.isNullAt(n8.fieldIndex("att_k")))
  }

  test("q430 periodogram: a planted weekly impulse ranks period 7 first") {
    import graft.operators.StatTests
    val days = (0 until 56).map { t =>
      val d = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(t))
      (d, if (t % 7 == 0) 5000.0 else 100.0)
    }
    val orders = days.toDF("o_orderdate", "o_totalprice")
    val out = StatTests.periodogram(orders).collect()
    val p7 = out.find(_.getAs[Int]("period") == 7).get
    assert(p7.getAs[Int]("rank") == 1, s"period 7 should dominate: ${out.mkString("; ")}")
    // an impulse train splits its energy across the 1/7-harmonics; the
    // fundamental's share is 1/6 here, still far above every other row
    assert(p7.getAs[Double]("energy_share") > 0.15)
    assert(out.forall { r =>
      val s = r.getAs[Double]("energy_share"); s >= 0.0 && s <= 1.0001
    })
  }

  test("q431 ar2Forecast: Yule-Walker identity holds on the sf fixture") {
    import graft.operators.StatTests
    val t = graft.sources.Tables(spark, sfDir)
    val r = StatTests.ar2Forecast(t.orders).collect().head
    val (r1, phi1, phi2) = (r.getAs[Double]("r1"), r.getAs[Double]("phi1"), r.getAs[Double]("phi2"))
    assert(math.abs(r1) <= 1.0 && math.abs(r.getAs[Double]("r2")) <= 1.0)
    // first YW equation: rho1 = phi1 + phi2*rho1 (to rounding grain)
    assert(math.abs(phi1 + phi2 * r1 - r1) < 5e-3, s"YW identity: $r")
    assert(!r.isNullAt(r.fieldIndex("forecast_m")))
  }

  test("q432 newsvendor: interpolated fractile and its economics on a planted series") {
    import graft.operators.StatTests
    val d0 = java.time.LocalDate.of(2024, 1, 1)
    val li = Seq(10.0, 10.0, 10.0, 20.0).zipWithIndex.map { case (q, i) =>
      (1L, q, java.sql.Date.valueOf(d0.plusDays(i)))
    }.toDF("l_partkey", "l_quantity", "l_shipdate")
    val part = Seq((1L, "Brand#1")).toDF("p_partkey", "p_brand")
    val r = StatTests.newsvendor(li, part).collect().head
    assert(r.getAs[Double]("s_level") == 12.5) // 10 + 0.25*(20-10)
    assert(r.getAs[Double]("exp_leftover") == 1.875) // avg(2.5,2.5,2.5,0)
    assert(r.getAs[Double]("exp_shortage") == 1.875) // avg(0,0,0,7.5)
    assert(r.getAs[Double]("service_rate") == 0.75)
  }

  test("q433 mediation: a fully-mediated planted effect decomposes exactly") {
    import graft.operators.StatTests
    // m = 1 + t + (u mod 2) — arm shifts engagement by 1 with an
    // independent parity wiggle so (t, m) is NOT collinear; y = 3m
    // exactly, so OLS must recover b = 3 and direct = 0 and the effect
    // is fully mediated regardless of a's exact value.
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val rows = (1L to 400L).flatMap { u =>
      val views = 1 + (if (md5ArmA(u)) 1 else 0) + (u % 2).toInt
      val y = 3.0 * views
      Seq.fill(views)((u, "view", ts0, 0.0)) :+ ((u, "purchase", ts0, y))
    }
    val events = rows.toDF("user_id", "event_type", "ts", "value")
    val r = StatTests.mediation(events).collect().head
    assert(math.abs(r.getAs[Double]("a_t_to_m") - 1.0) < 0.2, s"a: $r")
    assert(r.getAs[Double]("b_m_to_y") == 3.0, s"b: $r")
    assert(r.getAs[Double]("direct") == 0.0, s"direct: $r")
    assert(r.getAs[Double]("indirect") == r.getAs[Double]("total"))
    assert(r.getAs[Double]("prop_mediated") == 1.0)
  }

  test("q434 fkCoverage: planted orphan and childless keys land in the right columns") {
    import graft.operators.Audit
    val nation = Seq((0L, "A"), (1L, "B")).toDF("n_nationkey", "n_name")
    val customer = Seq((1L, 0L), (2L, 0L), (3L, 9L)) // custkey 3 -> orphan nation 9
      .toDF("c_custkey", "c_nationkey")
    val supplier = Seq((1L, 0L)).toDF("s_suppkey", "s_nationkey")
    val orders = Seq((10L, 1L), (11L, 2L)).toDF("o_orderkey", "o_custkey")
    val part = Seq((100L, "x"), (101L, "never-ordered")).toDF("p_partkey", "p_name")
    val lineitem = Seq((10L, 100L, 1L), (99L, 100L, 1L)) // orderkey 99 -> orphan
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
    val out = Audit.fkCoverageAudit(orders, lineitem, customer, part, supplier, nation)
      .collect().map(r => r.getAs[String]("edge") -> r).toMap
    assert(out("customer_nation").getAs[Long]("n_orphan") == 1L) // custkey 3
    assert(out("customer_nation").getAs[Long]("n_childless") == 1L) // nation B
    assert(out("lineitem_orders").getAs[Long]("n_orphan") == 1L) // orderkey 99
    assert(out("lineitem_orders").getAs[Long]("n_childless") == 1L) // order 11
    assert(out("lineitem_part").getAs[Long]("n_orphan") == 0L)
    assert(out("lineitem_part").getAs[Long]("n_childless") == 1L) // part 101
    assert(out("orders_customer").getAs[Long]("n_orphan") == 0L)
    assert(out("lineitem_part").getAs[Double]("childless_share") == 0.5)
  }

  test("q435 fairnessSlices: slice gaps are doc-weighted centered on the overall accuracy") {
    import graft.operators.Classify
    val t = graft.sources.Tables(spark, sfDir)
    val out = Classify.fairnessSlices(t.documents).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val a = r.getAs[Double]("accuracy"); a >= 0.0 && a <= 1.0
    })
    // Σ n_s · (acc_s − overall) = 0 by construction (to rounding grain)
    val wsum = out.map(r => r.getAs[Long]("n_docs") * r.getAs[Double]("acc_gap")).sum
    val n = out.map(_.getAs[Long]("n_docs")).sum
    assert(math.abs(wsum) <= n * 1.1e-4, s"weighted gap sum $wsum over $n docs")
  }

  test("q436 bassDiffusion: a planted Bass adoption curve recovers its parameters") {
    import graft.operators.StatTests
    // simulate m=1000, p=0.03, q=0.38 with integer-rounded daily adopters
    val (m0, p0, q0) = (1000.0, 0.03, 0.38)
    val ts0 = java.time.LocalDate.of(2024, 1, 1)
    var cum = 0.0
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, java.sql.Timestamp, Double)]
    var uid = 0L
    var day = 0
    while (cum < 0.98 * m0 && day < 120) {
      val nExact = p0 * m0 + (q0 - p0) * cum - (q0 / m0) * cum * cum
      val n = math.max(0, math.round(nExact)).toInt
      val t = java.sql.Timestamp.valueOf(ts0.plusDays(day).atTime(12, 0))
      (0 until n).foreach { _ =>
        uid += 1
        rows += ((uid, "purchase", t, 1.0))
      }
      cum += n
      day += 1
    }
    val events = rows.toSeq.toDF("user_id", "event_type", "ts", "value")
    val r = StatTests.bassDiffusion(events).collect().head
    assert(math.abs(r.getAs[Double]("m_k") - 1.0) < 0.1, s"market size: $r")
    assert(math.abs(r.getAs[Double]("p_innovation") - p0) < 0.02, s"p: $r")
    assert(math.abs(r.getAs[Double]("q_imitation") - q0) < 0.05, s"q: $r")
  }

  test("q437 switchback: block arms partition the hours and a planted lift is recovered") {
    import graft.operators.{Relational, StatTests}
    // synthesize hourly blocks over 20 days; arm-A hours carry +5 revenue
    def armA(b: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(b.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      "01234567".contains(hex.charAt(0))
    }
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 30)
    val rows = (0 until 480).map { h =>
      val t = java.sql.Timestamp.valueOf(base.plusHours(h))
      val block = t.getTime * 1000L / 3600000000L
      val rev = if (armA(block)) 15.0 else 10.0
      (h.toLong, "purchase", t, rev)
    }
    val events = rows.toDF("user_id", "event_type", "ts", "value")
    val r = Relational.switchbackAnalysis(events).collect().head
    assert(r.getAs[Long]("n_blocks_a") + r.getAs[Long]("n_blocks_b") == 480L)
    assert(r.getAs[Double]("mean_rev_a") == 15.0 && r.getAs[Double]("mean_rev_b") == 10.0)
    assert(r.getAs[Double]("block_effect") == 5.0)
  }

  test("q438 equiDepthHistogram: deciles balance the rows and tile the value range") {
    import graft.operators.Relational
    val t = graft.sources.Tables(spark, sfDir)
    val out = Relational.equiDepthHistogram(t.orders).collect()
    assert(out.map(_.getAs[Int]("bucket")).toSeq == (0 to 9))
    val total = t.orders.count()
    assert(out.map(_.getAs[Long]("n_rows")).sum == total)
    // near-unique values -> every bucket within 2% of the even share
    out.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      assert(math.abs(n - total / 10.0) <= math.max(2.0, 0.02 * total), s"bucket $r")
    }
    // buckets tile: each bucket's lo is >= the previous bucket's hi... minus ties
    val sorted = out.sortBy(_.getAs[Int]("bucket"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Double]("lo") >= a.getAs[Double]("hi") - 1e-9)
    }
  }

  test("q439 joinEstimateAudit: uniform keys audit to ratio 1, skewed keys do not") {
    import graft.operators.Relational
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("o_orderkey", "o_custkey")
    val customer = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("c_custkey", "c_name")
    val lineitem = Seq((10L, 100L), (10L, 100L), (11L, 101L), (99L, 101L))
      .toDF("l_orderkey", "l_partkey")
    val part = Seq((100L, "a"), (101L, "b")).toDF("p_partkey", "p_name")
    val out = Relational.joinEstimateAudit(orders, customer, lineitem, part)
      .collect().map(r => r.getAs[String]("edge") -> r).toMap
    // lineitem⋈part: 4·2/max(2,2) = 4 estimated, actual 4 -> ratio 1
    assert(out("lineitem_part").getAs[Long]("n_actual") == 4L)
    assert(out("lineitem_part").getAs[Double]("err_ratio") == 1.0)
    // lineitem⋈orders: est 4·3/3 = 4, actual 3 (orderkey 99 dangles)
    assert(out("lineitem_orders").getAs[Long]("n_actual") == 3L)
    assert(out("lineitem_orders").getAs[Double]("n_estimate") == 4.0)
    // orders⋈customer: est 3·3/3 = 3, actual 3
    assert(out("orders_customer").getAs[Double]("err_ratio") == 1.0)
  }

  test("q440 designEffect: pure between-user variance gives ICC 1 and DEFF = m0") {
    import graft.operators.StatTests
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val rows = for {
      (u, v) <- Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)); _ <- 1 to 3
    } yield (u, "purchase", ts0, v)
    val events = rows.toDF("user_id", "event_type", "ts", "value")
    val r = StatTests.designEffect(events).collect().head
    assert(r.getAs[Long]("n_users") == 3L && r.getAs[Long]("n_purchases") == 9L)
    assert(r.getAs[Double]("m0") == 3.0)
    assert(r.getAs[Double]("icc") == 1.0, s"ICC: $r")
    assert(r.getAs[Double]("deff") == 3.0 && r.getAs[Double]("n_effective") == 3.0)
  }

  test("q441 quantileTreatmentEffects: deciles ascend and QTE is the signed gap") {
    import graft.operators.StatTests
    val t = graft.sources.Tables(spark, sfDir)
    val out = StatTests.quantileTreatmentEffects(t.events).collect()
    assert(out.map(_.getAs[Double]("p")).toSeq == (1 to 9).map(_ / 10.0))
    out.foreach { r =>
      assert(math.abs(
        r.getAs[Double]("qte") - (r.getAs[Double]("q_a") - r.getAs[Double]("q_b"))) < 2e-4)
    }
    val qa = out.map(_.getAs[Double]("q_a"))
    assert(qa.sliding(2).forall { case Array(a, b) => b >= a - 1e-9 }, "quantiles ascend")
  }

  test("q442 chunkDedupAudit: shared passages count as cross-doc, unique docs stay clean") {
    import graft.operators.TextAnalysis
    val passage = (1 to 64).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, passage, "en", "srcA", 100L),          // one chunk
      (2L, passage, "en", "srcA", 100L),          // identical -> cross-doc dup
      (3L, (1 to 30).map(i => s"u$i").mkString(" "), "en", "srcB", 100L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.chunkDedupAudit(docs)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("srcA").getAs[Double]("dup_share") > 0.9, s"srcA: ${out("srcA")}")
    assert(out("srcA").getAs[Double]("cross_doc_share") > 0.9)
    assert(out("srcB").getAs[Double]("dup_share") == 0.0)
    assert(out("srcB").getAs[Double]("cross_doc_share") == 0.0)
  }

  test("q443 dedupMixtureShift: dedup re-weights toward the cleaner source") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "alpha beta", "en", "dupheavy", 10L),
      (2L, "alpha beta", "en", "dupheavy", 10L), // dup of 1
      (3L, "gamma delta", "en", "dupheavy", 10L),
      (4L, "gamma delta", "en", "dupheavy", 10L), // dup of 3
      (5L, "epsilon zeta", "en", "clean", 10L),
      (6L, "eta theta", "en", "clean", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.dedupMixtureShift(docs)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("dupheavy").getAs[Long]("n_before") == 4L)
    assert(out("dupheavy").getAs[Long]("n_after") == 2L)
    assert(out("clean").getAs[Long]("n_after") == 2L)
    assert(out("dupheavy").getAs[Double]("share_before") == 0.6667)
    assert(out("dupheavy").getAs[Double]("share_after") == 0.5)
    assert(out("dupheavy").getAs[Double]("delta_pp") < 0)
    assert(out("clean").getAs[Double]("delta_pp") > 0)
  }

  test("q444 engleGranger: cointegrated planted pair flags, independent walk does not") {
    import graft.operators.StatTests
    // y tracks x plus stationary noise -> residuals mean-revert hard
    // (deterministic alternating noise), so the DF t-stat is deeply negative
    val d0 = java.time.LocalDate.of(2024, 1, 1)
    val orders = (0 until 120).flatMap { t =>
      val d = java.sql.Date.valueOf(d0.plusDays(t))
      val x = 1000.0 + 10.0 * t
      val y = 2.0 * x + (if (t % 2 == 0) 50.0 else -50.0)
      Seq((t.toLong * 2, 1L, y, d), (t.toLong * 2 + 1, 2L, x, d))
    }.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val customer = Seq((1L, "AUTOMOBILE"), (2L, "BUILDING")).toDF("c_custkey", "c_mktsegment")
    val r = StatTests.engleGranger(orders, customer).collect().head
    assert(math.abs(r.getAs[Double]("beta") - 2.0) < 0.05, s"beta: $r")
    assert(r.getAs[Double]("eg_tstat") < -3.34, s"alternating residuals must flag: $r")
    assert(r.getAs[Boolean]("cointegrated"))
  }

  test("q445 abcXyz: cells partition the brands and revenue shares sum to 100") {
    import graft.operators.StatTests
    val t = graft.sources.Tables(spark, sfDir)
    val out = StatTests.abcXyz(t.lineitem, t.part).collect()
    assert(out.nonEmpty)
    val nBrands = out.map(_.getAs[Long]("n_brands")).sum
    val distinctBrands = t.part.select("p_brand").distinct().count()
    assert(nBrands == distinctBrands, s"cells must partition $distinctBrands brands")
    val share = out.map(_.getAs[Double]("rev_share_pct")).sum
    assert(math.abs(share - 100.0) < 0.01, s"shares sum to $share")
    assert(out.forall(r => Set("A", "B", "C")(r.getAs[String]("abc"))
      && Set("X", "Y", "Z")(r.getAs[String]("xyz"))))
  }

  test("q428 upliftDeciles: decile sizes follow the ntile fill rule on the sf fixture") {
    val t = graft.sources.Tables(spark, sfDir)
    val out = Classify.upliftDeciles(t.events).collect()
    val sizes = out.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c"))
    val n = sizes.sum
    val q = n / 10; val rem = (n % 10).toInt
    val expected = (0 until 10).map(i => if (i < rem) q + 1 else q)
    assert(sizes.toSeq == expected, s"ntile fill rule: $n users -> ${expected.mkString(",")}")
  }
}
