package graft

import graft.operators.{Relational, StatTests, TextAnalysis}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Ground-truth fixtures for the round-8 additions (q356–q359):
  * properties the DuckDB oracle equality can't state. */
class AnalyticsR12Spec extends SparkSpec {
  import spark.implicits._

  private def ordersOf(rows: (Long, String, Double, String)*) =
    rows.toDF("o_orderkey", "o_orderpriority", "o_totalprice", "d")
      .withColumn("o_orderdate", to_timestamp(col("d")))
      .withColumn("o_custkey", lit(1L))
      .withColumn("o_orderstatus", lit("F"))
      .drop("d")

  // ------------------------------------------------------------- q356
  test("q356: exact Weibull quantile lead times recover shape and scale with r2 = 1") {
    // choose integer-day lead times that ARE the Benard-rank quantiles
    // of some Weibull: with one line per distinct t and n points, the
    // regression of y on x is then exactly linear — r2 rounds to 1 and
    // the fitted shape/scale equal the hand-computed regression of the
    // same points (weights all 1, no ties)
    val n = 8
    val k = 2.0; val lam = 12.0
    // t_i = round(lam * (-ln(1-F_i))^(1/k)) — integers, so NOT exactly
    // on the curve; compute the expected fit by the same closed form
    val fs = (1 to n).map(i => (i - 0.3) / (n + 0.4))
    val ts = fs.map(f => math.max(1L, math.round(lam * math.pow(-math.log(1 - f), 1 / k))))
    assert(ts.distinct.size == n, s"fixture needs distinct integer days: $ts")
    val base = "2024-01-01 00:00:00"
    val orders = ordersOf(ts.zipWithIndex.map { case (_, i) =>
      ((i + 1).toLong, "1-URGENT", 100.0, base) }: _*)
    val lines = ts.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, Timestamp.valueOf(base).toLocalDateTime.plusDays(t - 1).toString.replace('T', ' ') + ":00")
    }.toDF("l_orderkey", "ship")
      .withColumn("l_shipdate", to_timestamp(col("ship")))
      .drop("ship")
    val out = StatTests.weibullLeadTime(orders, lines).collect()
    assert(out.length == 1)
    val r = out.head
    // expected: plain OLS of y_i = ln(-ln(1-F_i)) on x_i = ln(t_i)
    val xs = ts.map(t => math.log(t.toDouble))
    val ys = fs.map(f => math.log(-math.log(1 - f)))
    val sw = n.toDouble
    val sxx = xs.map(x => x * x).sum - math.pow(xs.sum, 2) / sw
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum - xs.sum * ys.sum / sw
    val slope = sxy / sxx
    val scale = math.exp(-(ys.sum - slope * xs.sum) / sw / slope)
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    assert(r.getAs[Double]("shape_k") == r4(slope), s"$r vs slope $slope")
    assert(r.getAs[Double]("scale_days") == r4(scale), s"$r vs scale $scale")
    assert(r.getAs[Double]("r2") > 0.99, s"near-exact quantile data must fit: $r")
    assert(math.abs(r.getAs[Double]("shape_k") - k) < 0.2 &&
      math.abs(r.getAs[Double]("scale_days") - lam) < 1.0,
      s"recovered (k, lambda) should approximate ($k, $lam): $r")
  }

  test("q356: a single distinct lead time degrades to null shape, not a blowup") {
    val orders = ordersOf((1L, "1-URGENT", 1.0, "2024-01-01 00:00:00"),
      (2L, "1-URGENT", 1.0, "2024-01-01 00:00:00"))
    val lines = Seq((1L, "2024-01-04 00:00:00"), (2L, "2024-01-04 00:00:00"))
      .toDF("l_orderkey", "ship")
      .withColumn("l_shipdate", to_timestamp(col("ship"))).drop("ship")
    val r = StatTests.weibullLeadTime(orders, lines).collect().head
    assert(r.isNullAt(r.fieldIndex("shape_k")) && r.isNullAt(r.fieldIndex("scale_days")))
  }

  // ------------------------------------------------------------- q357
  test("q357: hand-computed H on a tie-free two-group example; correction is identity") {
    // A = {10, 20}, B = {30, 40}: ranks 1,2 vs 3,4
    // H = 12/(4*5) * (3^2/2 + 7^2/2) - 3*5 = 0.6*29 - 15 = 2.4
    val orders = ordersOf(
      (1L, "A", 10.0, "2024-01-01 00:00:00"), (2L, "A", 20.0, "2024-01-01 00:00:00"),
      (3L, "B", 30.0, "2024-01-01 00:00:00"), (4L, "B", 40.0, "2024-01-01 00:00:00"))
    val r = StatTests.kruskalWallis(orders).collect().head
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("k") == 2)
    assert(r.getAs[Double]("h") == 2.4, r.toString)
    assert(r.getAs[Double]("h_tie_corrected") == 2.4, "no ties -> correction = 1")
  }

  test("q357: ties take average ranks and the correction inflates H") {
    // A = {10, 10}, B = {10, 40}: the three 10s share rank (1+2+3)/3 = 2
    val orders = ordersOf(
      (1L, "A", 10.0, "2024-01-01 00:00:00"), (2L, "A", 10.0, "2024-01-01 00:00:00"),
      (3L, "B", 10.0, "2024-01-01 00:00:00"), (4L, "B", 40.0, "2024-01-01 00:00:00"))
    val r = StatTests.kruskalWallis(orders).collect().head
    // Ra = 4, Rb = 6; H = 0.6*(16/2 + 36/2) - 15 = 0.6
    assert(r.getAs[Double]("h") == 0.6, r.toString)
    // tie correction: C = 1 - (27-3)/(64-4) = 0.6 -> H/C = 1.0
    assert(r.getAs[Double]("h_tie_corrected") == 1.0, r.toString)
  }

  // ------------------------------------------------------------- q358
  test("q358: equal spreads give F near 0; a blown-up group lifts F") {
    def fixture(bSpread: Double) = ordersOf((1 to 12).map { i =>
      val grp = if (i <= 6) "A" else "B"
      val spread = if (grp == "A") 1.0 else bSpread
      // symmetric around the group median 100: |x - med| is exactly
      // spread * {0,1,2} on each side
      val off = Seq(-2.0, -1.0, 0.0, 0.0, 1.0, 2.0)((i - 1) % 6) * spread
      (i.toLong, grp, 100.0 + off, "2024-01-01 00:00:00")
    }: _*)
    val same = StatTests.brownForsythe(fixture(1.0)).collect().head
    assert(same.getAs[Double]("f_stat") == 0.0, s"identical spreads: $same")
    val diff = StatTests.brownForsythe(fixture(5.0)).collect().head
    assert(diff.getAs[Double]("f_stat") > 4.0, s"5x spread must be detectable: $diff")
    assert(diff.getAs[Long]("n") == 12 && diff.getAs[Long]("k") == 2)
  }

  // ------------------------------------------------------------- q360
  test("q360: hand-computed Laspeyres/Paasche/Fisher on a two-part matched basket") {
    // part 1: y2023 p=10 q=5 -> y2024 p=12 q=4; part 2: p=2 q=10 -> p=2 q=20
    // part 3 trades only in 2024 (excluded from the matched basket)
    // L = (12*5 + 2*10)/(10*5 + 2*10) = 80/70; P = (48+40)/(40+40) = 1.1
    val li = Seq(
      (1L, 10.0 * 5, 5.0, "2023-03-01"), (1L, 12.0 * 4, 4.0, "2024-03-01"),
      (2L, 2.0 * 10, 10.0, "2023-05-01"), (2L, 2.0 * 20, 20.0, "2024-05-01"),
      (3L, 7.0 * 2, 2.0, "2024-06-01"))
      .toDF("l_partkey", "l_extendedprice", "l_quantity", "ship")
      .withColumn("l_shipdate", to_timestamp(col("ship")))
      .withColumn("l_discount", lit(0.0))
      .drop("ship")
    val r = Relational.priceIndex(li).collect().head
    assert(r.getAs[Long]("base_year") == 2023 && r.getAs[Long]("cur_year") == 2024)
    assert(r.getAs[Long]("n_parts") == 2)
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    assert(r.getAs[Double]("laspeyres") == r4(80.0 / 70))
    assert(r.getAs[Double]("paasche") == 1.1)
    assert(r.getAs[Double]("fisher") == r4(math.sqrt(80.0 / 70 * 1.1)))
  }

  // ------------------------------------------------------------- q361
  test("q361: Gumbel moments fit matches hand math; return levels are monotone in horizon") {
    val days = (1 to 30).map(i => (i.toLong, "P", 100.0 + (i % 7) * 13.0,
      f"2024-01-${i}%02d 00:00:00"))
    val orders = ordersOf(days: _*)
    val r = StatTests.gumbelExtremes(orders).collect().head
    assert(r.getAs[Long]("n_days") == 30)
    // hand moments over the daily maxima (one order per day -> max = value)
    val xs = days.map(_._3)
    val m = xs.sum / xs.size
    val s = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1))
    val beta = s * math.sqrt(6.0) / math.Pi
    val mu = m - 0.5772156649015329 * beta
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    assert(r.getAs[Double]("mu") == r4(mu) && r.getAs[Double]("beta") == r4(beta), r.toString)
    val (a, b, c) = (r.getAs[Double]("rl_30d"), r.getAs[Double]("rl_100d"), r.getAs[Double]("rl_365d"))
    assert(a < b && b < c, s"longer horizons mean higher return levels: $a $b $c")
  }

  // ------------------------------------------------------------- q362
  test("q362: Chapman estimator over head/tail detectors on planted overlap structure") {
    def block(ch: Char) = ch.toString * 256
    // docs 1,2 share the HEAD block only; 3,4 share the TAIL block only;
    // 5,6 share BOTH; 7..10 unique everywhere
    def doc(id: Long, head: String, tail: String) =
      (id, head + s" middle-$id " + tail, "en", "s", 600L)
    val docs = Seq(
      doc(1, block('a'), block('p') + "1"), doc(2, block('a'), block('q') + "2"),
      doc(3, block('b') + "3", block('z')), doc(4, block('c') + "4", block('z')),
      doc(5, block('d'), block('y')), doc(6, block('d'), block('y')),
      doc(7, block('e') + "7", block('m') + "7"), doc(8, block('f') + "8", block('n') + "8"),
      doc(9, block('g') + "9", block('o') + "9"), doc(10, block('h') + "0", block('r') + "0"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.dedupCoverageEstimate(docs).collect().head
    // A (head fp) flags {2, 6}; B (tail fp) flags {4, 6}; overlap {6}
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2 &&
      r.getAs[Long]("n_both") == 1, r.toString)
    // Chapman: 3*3/2 - 1 = 3.5
    assert(r.getAs[Double]("est_total_dups") == 3.5)
    assert(r.getAs[Double]("coverage_a") == math.floor(2 / 3.5 * 10000 + 0.5) / 10000)
  }

  // ------------------------------------------------------------- q363
  test("q363: Ljung-Box Q matches a brute-force reference; trend >> shuffled") {
    def qStat(xs: Seq[Double], m: Int): Double = {
      val n = xs.size
      val xbar = xs.sum / n
      val c = xs.map(_ - xbar)
      val ss = c.map(x => x * x).sum
      val rhos = (1 to m).map(k => (0 until n - k).map(i => c(i) * c(i + k)).sum / ss)
      n * (n + 2.0) * rhos.zipWithIndex.map { case (r, i) => r * r / (n - (i + 1)) }.sum
    }
    // strongly trending series over 40 consecutive days
    val trend = (1 to 40).map(i => 100.0 + i * 10.0)
    val orders = ordersOf(trend.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, "P", v,
        java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString + " 00:00:00")
    }: _*)
    val r = StatTests.ljungBox(orders).collect().head
    assert(r.getAs[Long]("n_days") == 40 && r.getAs[Long]("m_lags") == 7)
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    assert(math.abs(r.getAs[Double]("q_stat") - r4(qStat(trend, 7))) < 0.01,
      s"${r.getAs[Double]("q_stat")} vs ${qStat(trend, 7)}")
    assert(r.getAs[Double]("q_stat") > 100, "a strong trend must reject independence loudly")
  }

  // ------------------------------------------------------------- q365
  private def liQty(rows: (Long, Double, String)*) =
    rows.toDF("l_orderkey", "l_quantity", "l_returnflag")
      .withColumn("l_partkey", lit(1L))
      .withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0))

  test("q365: perfect dose-response matches the hand-computed Z; flat rates score ~0") {
    // doses w=1,2,3 (q=5,15,25), 10 lines each, return rates 0/.5/1
    def rows(rates: Seq[Int]) = (0 until 30).map { i =>
      val d = i / 10
      ((i + 1).toLong, d * 10 + 5.0, if (i % 10 < rates(d)) "R" else "N")
    }
    val trend = StatTests.cochranArmitage(liQty(rows(Seq(0, 5, 10)): _*)).collect().head
    // hand: n=30, pbar=.5, w=(1,2,3), r=(0,5,10), num=Σw·r−p̄Σw·n=25−.5*60=-?
    // Σw·r = 0+10+30 = 40; Σw·n = 60; num = 40 − 30 = 10
    // den² = .25*(Σw²n − (Σwn)²/N) = .25*(140*... w²n = 10+40+90=140; 60²/30=120) = .25*20 = 5
    val z = 10.0 / math.sqrt(5.0)
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    assert(trend.getAs[Long]("n") == 30 && trend.getAs[Long]("k_doses") == 3)
    assert(trend.getAs[Double]("z_trend") == r4(z), s"$trend vs $z")
    val flat = StatTests.cochranArmitage(liQty(rows(Seq(5, 5, 5)): _*)).collect().head
    assert(math.abs(flat.getAs[Double]("z_trend")) < 1e-9, flat.toString)
  }

  // ------------------------------------------------------------- q366
  test("q366: equal revenues give Theil 0; a dominant customer gives ln3/2 exactly") {
    val orders = (
      (1 to 4).map(i => (i.toLong, i.toLong, 100.0, "2024-01-01 00:00:00")) ++     // nation A: all equal
      Seq((10L, 10L, 1.0), (11L, 11L, 1.0), (12L, 12L, 1.0), (13L, 13L, 9.0))
        .map { case (k, c, v) => (k, c, v, "2024-01-01 00:00:00") }                // nation B: {1,1,1,9}
    ).map { case (k, c, v, d) => (k, c, "F", v, Timestamp.valueOf(d), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val customer = ((1 to 4).map(i => (i.toLong, 0)) ++ (10 to 13).map(i => (i.toLong, 1)))
      .toDF("c_custkey", "c_nationkey")
      .withColumn("c_name", lit("c")).withColumn("c_acctbal", lit(0.0))
      .withColumn("c_mktsegment", lit("BUILDING"))
    val nation = Seq((0, "EQUALIA"), (1, "SKEWLAND")).toDF("n_nationkey", "n_name")
    val out = StatTests.theilIndex(orders, customer, nation).collect()
      .map(r => r.getAs[String]("nation") -> r).toMap
    assert(out("EQUALIA").getAs[Double]("theil") == 0.0)
    // T({1,1,1,9}) = mean((x/3)ln(x/3)) = ln3/2
    val expected = math.floor(math.log(3.0) / 2 * 10000 + 0.5) / 10000
    assert(out("SKEWLAND").getAs[Double]("theil") == expected, out("SKEWLAND").toString)
    assert(out("SKEWLAND").getAs[Long]("n_customers") == 4)
  }

  // ------------------------------------------------------------- q359
  test("q359: a planted one-sided token tops the drift ranking with the right direction") {
    val common = "the quick brown fox jumps over lazy dogs daily " * 3
    val docs = (0 until 40).map { i =>
      val txt =
        if (i % 2 == 0) common + (" driftword" * 5) // A side only
        else common
      (i.toLong, txt, "en", "s", txt.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.tokenDrift(docs, minCount = 20, topN = 10).collect()
    val top = out.head
    assert(top.getAs[String]("token") == "driftword", out.map(_.toString).mkString(","))
    assert(top.getAs[Long]("cnt_a") == 100 && top.getAs[Long]("cnt_b") == 0)
    assert(top.getAs[Double]("log2_ratio") > 5.0, "A-only token drifts positive")
    // balanced tokens carry (near-)zero chi2: every other reported token
    // scores far below the planted one
    out.tail.foreach(r => assert(r.getAs[Double]("chi2") < top.getAs[Double]("chi2") / 10))
  }
}
