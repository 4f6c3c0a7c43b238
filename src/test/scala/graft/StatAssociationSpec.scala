package graft

import graft.operators.StatTests

/** Ground truth for the association/feature-ranking trio: Spearman rank
  * correlation (q289), Cramér's V (q290), mutual-information gain (q291). */
class StatAssociationSpec extends SparkSpec {
  import spark.implicits._

  private def li(rows: Seq[(String, Double, Double)]) =
    rows.toDF("l_returnflag", "l_quantity", "l_discount")

  private def ev(rows: Seq[(String, String)]) =
    rows.zipWithIndex.map { case ((tsS, tpe), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(tsS), 1L, tpe, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("q289: perfect monotone nonlinear relation gives rho=1, pearson<1") {
    // y = x³ scaled into discount range: strictly increasing, convex
    val rows = (1 to 8).map(i => ("A", i.toDouble, i.toDouble * i * i / 1000.0))
    val got = StatTests.spearmanCorr(li(rows)).collect()
    assert(got.length === 1)
    assert(got(0).getAs[Double]("spearman_rho") === 1.0)
    assert(got(0).getAs[Double]("pearson_r") < 1.0)
  }

  test("q289: ties get average ranks (hand-traced)") {
    // x: 1,1,2 → avg ranks 1.5,1.5,3 ; y: 10,20,20 → ranks 1,2.5,2.5
    // corr([1.5,1.5,3],[1,2.5,2.5]) = cov/σxσy = 0.5 exactly
    val got = StatTests.spearmanCorr(li(Seq(
      ("A", 1.0, 0.10), ("A", 1.0, 0.20), ("A", 2.0, 0.20)))).collect()
    assert(got(0).getAs[Double]("spearman_rho") === 0.5)
    assert(got(0).getAs[Long]("n") === 3L)
  }

  test("q289: anti-monotone relation gives rho = -1") {
    val rows = (1 to 6).map(i => ("B", i.toDouble, (10 - i).toDouble / 100.0))
    val got = StatTests.spearmanCorr(li(rows)).collect()
    assert(got(0).getAs[Double]("spearman_rho") === -1.0)
  }

  test("q290: deterministic type↔hour association yields V = 1") {
    // click only at hour 2 (bucket h0), error only at hour 14 (h2):
    // the (event_type, hour_bucket) pair is a bijection → V = 1
    val rows = (0 until 20).map { i =>
      if (i % 2 == 0) ("1997-01-01 02:00:00", "click") else ("1997-01-01 14:00:00", "error")
    }
    val got = StatTests.cramersV(ev(rows)).collect()
    val th = got.find(r => r.getAs[String]("feature_a") == "event_type" &&
      r.getAs[String]("feature_b") == "hour_bucket").get
    assert(th.getAs[Double]("cramers_v") === 1.0)
    assert(th.getAs[Long]("n") === 20L)
  }

  test("q290: independent uniform features yield V = 0") {
    // both types appear at both hours with identical counts → chi2 = 0
    val rows = for {
      tpe <- Seq("click", "error"); h <- Seq("02", "14"); _ <- 1 to 5
    } yield (s"1997-01-01 $h:00:00", tpe)
    val got = StatTests.cramersV(ev(rows)).collect()
    val th = got.find(r => r.getAs[String]("feature_a") == "event_type" &&
      r.getAs[String]("feature_b") == "hour_bucket").get
    assert(th.getAs[Double]("chi2") === 0.0)
    assert(th.getAs[Double]("cramers_v") === 0.0)
  }

  test("q291: a feature that determines the target captures all its entropy") {
    // hour bucket ↔ type bijection, balanced: H(type)=1 bit, H(type|hour)=0,
    // IG = 1, gain_ratio = 1 (H(feature) = 1 bit too)
    val rows = (0 until 16).map { i =>
      if (i % 2 == 0) ("1997-01-01 02:00:00", "click") else ("1997-01-01 14:00:00", "error")
    }
    val got = StatTests.infoGain(ev(rows)).collect()
    val hb = got.find(_.getAs[String]("feature") == "hour_bucket").get
    assert(hb.getAs[Double]("h_target_bits") === 1.0)
    assert(hb.getAs[Double]("h_cond_bits") === 0.0)
    assert(hb.getAs[Double]("info_gain_bits") === 1.0)
    assert(hb.getAs[Double]("gain_ratio") === 1.0)
    // dow is constant (single value) → zero information gain
    val dw = got.find(_.getAs[String]("feature") == "dow").get
    assert(dw.getAs[Double]("info_gain_bits") === 0.0)
    assert(dw.getAs[Long]("cardinality") === 1L)
  }

  test("q318: proportional series correlate to 1, inverse to -1, zero-fill keeps all days") {
    // A and B perfectly proportional; C inverse of A; D present one day
    val rows = Seq.concat(
      Seq.fill(2)(("1997-01-01 01:00:00", "A")), Seq.fill(4)(("1997-01-01 01:00:00", "B")),
      Seq.fill(3)(("1997-01-02 01:00:00", "A")), Seq.fill(6)(("1997-01-02 01:00:00", "B")),
      Seq.fill(1)(("1997-01-03 01:00:00", "A")), Seq.fill(2)(("1997-01-03 01:00:00", "B")),
      Seq.fill(3)(("1997-01-01 01:00:00", "C")), Seq.fill(2)(("1997-01-02 01:00:00", "C")),
      Seq.fill(4)(("1997-01-03 01:00:00", "C")),
      Seq.fill(5)(("1997-01-01 01:00:00", "D")))
    val got = StatTests.metricCorrMatrix(ev(rows)).collect()
    val m = got.map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r).toMap
    assert(m(("A", "B")).getAs[Double]("pearson_r") === 1.0)
    assert(m(("A", "C")).getAs[Double]("pearson_r") === -1.0)
    // D's missing days zero-fill: every pair sees all 3 days
    assert(got.forall(_.getAs[Long]("n_days") === 3L))
    assert(got.length === 6) // C(4,2) pairs
  }

  test("q319: Wilson interval is exactly [0, hi] at k=0 and [lo, 1] at k=n") {
    val li = (
      (1 to 5).map(i => (i.toLong, 10L, "N")) ++ // brand ZERO: no returns
      (1 to 4).map(i => (100L + i, 20L, "R"))    // brand ALL: all returned
    ).toDF("l_orderkey", "l_partkey", "l_returnflag")
    val part = Seq((10L, "ZERO"), (20L, "ALL")).toDF("p_partkey", "p_brand")
    val got = StatTests.wilsonReturnRates(li, part).collect()
      .map(r => r.getAs[String]("p_brand") -> r).toMap
    val zero = got("ZERO")
    assert(zero.getAs[Double]("share") === 0.0)
    assert(zero.getAs[Double]("wilson_lo") === 0.0) // exact: center = spread at p=0
    assert(zero.getAs[Double]("wilson_hi") > 0.0)   // honest uncertainty at n=5
    val all = got("ALL")
    assert(all.getAs[Double]("share") === 1.0)
    assert(all.getAs[Double]("wilson_hi") === 1.0)
    assert(all.getAs[Double]("wilson_lo") < 1.0)
  }

  test("q289-q291 run on the real tables with sane ranges") {
    val t = sources.Tables(spark, sfDir)
    val sp = StatTests.spearmanCorr(t.lineitem).collect()
    assert(sp.nonEmpty)
    assert(sp.forall(r => math.abs(r.getAs[Double]("spearman_rho")) <= 1.0))
    val cv = StatTests.cramersV(t.events).collect()
    assert(cv.length === 3)
    assert(cv.forall { r =>
      val v = r.getAs[Double]("cramers_v"); v >= 0.0 && v <= 1.0001
    })
    val ig = StatTests.infoGain(t.events).collect()
    assert(ig.length === 3)
    assert(ig.forall { r =>
      r.getAs[Double]("info_gain_bits") >= -0.0001 &&
      r.getAs[Double]("info_gain_bits") <= r.getAs[Double]("h_target_bits") + 0.0001
    })
  }
}
