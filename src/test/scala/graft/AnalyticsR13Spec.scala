package graft

import graft.operators.{StatTests, TextAnalysis}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Ground-truth fixtures for the round-8 late widening (q367–q378):
  * hand-computed statistics on planted data — the properties the DuckDB
  * oracle equality can't state. */
class AnalyticsR13Spec extends SparkSpec {
  import spark.implicits._

  private def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000

  private def docsOf(rows: (Long, String, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  // ------------------------------------------------------------- q367
  test("q367: unit-shifted distributions are exactly W1 = 1 apart") {
    val cust = Seq(
      (1L, "BUILDING"), (2L, "BUILDING"), (3L, "BUILDING"),
      (4L, "MACHINERY"), (5L, "MACHINERY"), (6L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    // A = {1,2,3}, B = {2,3,4}: shifting a distribution by +1 moves
    // every unit of mass a distance of exactly 1
    val orders = Seq(
      (10L, 1L, 1.0), (11L, 2L, 2.0), (12L, 3L, 3.0),
      (13L, 4L, 2.0), (14L, 5L, 3.0), (15L, 6L, 4.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val r = StatTests.wasserstein(orders, cust).collect().head
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Double]("w1") == 1.0, r.toString)
  }

  test("q367: identical distributions are W1 = 0 apart") {
    val cust = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("c_custkey", "c_mktsegment")
    val orders = (1 to 10).flatMap(i =>
      Seq((i.toLong * 2, 1L, i * 7.0), (i.toLong * 2 + 1, 2L, i * 7.0)))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val r = StatTests.wasserstein(orders, cust).collect().head
    assert(r.getAs[Double]("w1") == 0.0, r.toString)
  }

  // ------------------------------------------------------------- q368
  private def prioOrders(rows: (Long, String, Double)*) =
    rows.toDF("o_orderkey", "o_orderpriority", "o_totalprice")

  test("q368: fully separated groups hit delta = -1 / +1 with a 'large' label") {
    val lo = prioOrders((1L, "1-URGENT", 1.0), (2L, "1-URGENT", 2.0), (3L, "1-URGENT", 3.0),
      (4L, "5-LOW", 4.0), (5L, "5-LOW", 5.0), (6L, "5-LOW", 6.0))
    val r = StatTests.cliffsDelta(lo).collect().head
    assert(r.getAs[Double]("delta") == -1.0 && r.getAs[String]("magnitude") == "large", r.toString)
    val hi = prioOrders((1L, "1-URGENT", 9.0), (2L, "1-URGENT", 8.0),
      (3L, "5-LOW", 1.0), (4L, "5-LOW", 2.0))
    val r2 = StatTests.cliffsDelta(hi).collect().head
    assert(r2.getAs[Double]("delta") == 1.0, r2.toString)
  }

  test("q368: interleaved equal-mass groups score delta = 0 / negligible") {
    val o = prioOrders((1L, "1-URGENT", 1.0), (2L, "5-LOW", 1.0),
      (3L, "1-URGENT", 2.0), (4L, "5-LOW", 2.0))
    val r = StatTests.cliffsDelta(o).collect().head
    assert(r.getAs[Double]("delta") == 0.0 && r.getAs[String]("magnitude") == "negligible")
  }

  // ------------------------------------------------------------- q369
  test("q369: groups split cleanly around the rank-⌈n/2⌉ median; chi2 = n") {
    // global sorted values 1..6 → median = value at rank 3 = 3
    // X all ≤ med (0 above), Y all > med (3 above): the 2×2 is maximal
    val o = prioOrders((1L, "X", 1.0), (2L, "X", 2.0), (3L, "X", 3.0),
      (4L, "Y", 4.0), (5L, "Y", 5.0), (6L, "Y", 6.0))
    val out = StatTests.moodMedian(o).collect()
    assert(out.length == 2)
    val x = out.find(_.getAs[String]("o_orderpriority") == "X").get
    val y = out.find(_.getAs[String]("o_orderpriority") == "Y").get
    assert(x.getAs[Long]("n_above") == 0 && y.getAs[Long]("n_above") == 3)
    assert(x.getAs[Double]("exp_above") == 1.5 && y.getAs[Double]("exp_above") == 1.5)
    // chi2 = Σ (o-e)²/e over 4 cells = 4 × 1.5²/1.5 = 6 (= n here)
    assert(x.getAs[Double]("chi2") == 6.0 && y.getAs[Double]("chi2") == 6.0)
  }

  // ------------------------------------------------------------- q370
  test("q370: planted geometric frequencies recover the exact Hill mean log") {
    // freqs 16,8,4,2,1 → top-3 over n_(4)=2: h = mean(ln8, ln4, ln2) = 2·ln2
    val text = (Seq.fill(16)("a") ++ Seq.fill(8)("b") ++ Seq.fill(4)("c")
      ++ Seq.fill(2)("d") ++ Seq("e")).mkString(" ")
    val docs = docsOf((1L, text, "en", "s", text.length.toLong))
    val r = TextAnalysis.hillTailExponent(docs, k = 3).collect().head
    assert(r.getAs[Long]("k_used") == 3)
    val h = 2 * math.log(2.0)
    assert(r.getAs[Double]("hill_mean_log") == r4(h), r.toString)
    assert(r.getAs[Double]("alpha_tail") == r4(1.0 / h), r.toString)
  }

  test("q370: a lang with fewer than k+1 types drops out (no tail to estimate)") {
    val docs = docsOf(
      (1L, "a a b", "short", "s", 5L),
      (2L, (1 to 80).map(i => s"t$i").mkString(" ") + " " + Seq.fill(60)("hot").mkString(" "),
        "long", "s", 400L))
    val out = TextAnalysis.hillTailExponent(docs, k = 50).collect()
    assert(out.map(_.getAs[String]("lang")).toSeq == Seq("long"))
  }

  // ------------------------------------------------------------- q371
  test("q371: Chao1 and coverage match the hand count") {
    // tokens: x×3 y×1 z×1 w×2 v×2 → N=9 V=5 f1=2 f2=2
    val docs = docsOf((1L, "x x x y z w w v v", "en", "s", 17L))
    val r = TextAnalysis.vocabRichness(docs).collect().head
    assert(r.getAs[Long]("n_tokens") == 9 && r.getAs[Long]("vocab") == 5)
    assert(r.getAs[Long]("f1") == 2 && r.getAs[Long]("f2") == 2)
    assert(r.getAs[Double]("chao1") == r4(5 + 2.0 * 1 / (2.0 * 3)), r.toString)
    assert(r.getAs[Double]("coverage") == r4(1 - 2.0 / 9), r.toString)
  }

  test("q371: an all-singleton corpus estimates near-double the seen vocab") {
    val docs = docsOf((1L, "a b c d", "en", "s", 7L))
    val r = TextAnalysis.vocabRichness(docs).collect().head
    // bias-corrected with f2=0: V + f1(f1-1)/2 = 4 + 6 = 10; coverage 0
    assert(r.getAs[Double]("chao1") == 10.0 && r.getAs[Double]("coverage") == 0.0)
  }

  // ------------------------------------------------------------- q372
  test("q372: counts-of-counts ladder gives the textbook r* table") {
    // 3 singletons, 2 doubletons, 1 tripleton → N=10
    val docs = docsOf((1L, "a b c d d e e f f f", "en", "s", 19L))
    val out = TextAnalysis.goodTuring(docs).collect()
    assert(out.length == 3)
    val by = out.map(r => r.getAs[Long]("r") -> r).toMap
    assert(by(1L).getAs[Long]("n_r") == 3 && by(1L).getAs[Long]("n_r_next") == 2)
    assert(by(1L).getAs[Double]("r_star") == r4(2.0 * 2 / 3))
    assert(by(2L).getAs[Double]("r_star") == 1.5)
    assert(by(3L).getAs[Long]("n_r_next") == 0 && by(3L).getAs[Double]("r_star") == 0.0)
    val p1 = math.floor(2.0 * 2 / 3 / 10 * 1e8 + 0.5) / 1e8
    assert(by(1L).getAs[Double]("p_gt") == p1, by(1L).toString)
  }

  // ------------------------------------------------------------- q373
  test("q373: identical sources are BC = 1 / Hellinger = 0; disjoint pairs vanish") {
    val docs = docsOf(
      (1L, "a b", "en", "s1", 3L),
      (2L, "a b", "en", "s2", 3L),
      (3L, "z z", "en", "s3", 3L))
    val out = TextAnalysis.sourceHellinger(docs).collect()
    assert(out.length == 1, out.map(_.toString).mkString(","))
    val r = out.head
    assert(r.getAs[String]("src_a") == "s1" && r.getAs[String]("src_b") == "s2")
    assert(r.getAs[Long]("common_vocab") == 2)
    assert(r.getAs[Double]("bc") == 1.0 && r.getAs[Double]("hellinger") == 0.0
      && r.getAs[Double]("bhattacharyya") == 0.0, r.toString)
  }

  test("q373: a half-overlapping source pair lands at BC = 0.5") {
    // s1 = {a:1/2, b:1/2}, s2 = {a:1/2, c:1/2} → BC over shared {a} = 1/2
    val docs = docsOf(
      (1L, "a b", "en", "s1", 3L),
      (2L, "a c", "en", "s2", 3L))
    val r = TextAnalysis.sourceHellinger(docs).collect().head
    assert(r.getAs[Double]("bc") == 0.5)
    assert(r.getAs[Double]("hellinger") == r4(math.sqrt(0.5)), r.toString)
    assert(r.getAs[Double]("bhattacharyya") == r4(math.log(2.0)), r.toString)
  }

  // ------------------------------------------------------------- q374
  test("q374: perfect agreement is kappa = 1; independence is kappa = 0") {
    val longText = Seq.fill(70)("w").mkString(" ")
    val shortText = "w w w"
    // 2 both-flagged + 2 neither → po = 1, pe = 0.5, κ = 1
    val agree = docsOf(
      (1L, longText, "en", "s", 500L), (2L, longText, "en", "s", 500L),
      (3L, shortText, "en", "s", 100L), (4L, shortText, "en", "s", 100L))
    val r = TextAnalysis.labelerKappa(agree).collect().head
    assert(r.getAs[Long]("n_both") == 2 && r.getAs[Long]("n_neither") == 2)
    assert(r.getAs[Double]("p_observed") == 1.0 && r.getAs[Double]("kappa") == 1.0)
    // one doc in each contingency cell → po = pe = 0.5, κ = 0
    val indep = docsOf(
      (1L, longText, "en", "s", 500L),  // a ∧ b
      (2L, shortText, "en", "s", 500L), // a ∧ ¬b
      (3L, longText, "en", "s", 100L),  // ¬a ∧ b
      (4L, shortText, "en", "s", 100L)) // ¬a ∧ ¬b
    val r2 = TextAnalysis.labelerKappa(indep).collect().head
    assert(r2.getAs[Double]("p_observed") == 0.5 && r2.getAs[Double]("p_expected") == 0.5)
    assert(r2.getAs[Double]("kappa") == 0.0, r2.toString)
  }

  // ------------------------------------------------------------- q375
  test("q375: IPW recovers the true uniform effect the naive difference distorts") {
    // stratum A: 3 treated (y=10), 1 control (y=0); stratum B: 1 treated
    // (y=20), 3 control (y=10). True effect = +10 in both strata; the
    // naive pooled difference is 5 because treatment concentrates in A.
    def ev(uid: Long, et: String, v: Double) = (uid, et, v)
    val events = Seq(
      ev(1, "A", 10.0), ev(3, "A", 10.0), ev(5, "A", 10.0), ev(2, "A", 0.0),
      ev(7, "B", 20.0), ev(4, "B", 10.0), ev(6, "B", 10.0), ev(8, "B", 10.0))
      .toDF("user_id", "event_type", "value")
    val r = StatTests.ipwAte(events).collect().head
    assert(r.getAs[Long]("n_events") == 8)
    assert(r.getAs[Double]("ate_naive") == 5.0, r.toString)
    assert(r.getAs[Double]("ate_ipw") == 10.0, r.toString)
    assert(r.getAs[Double]("mu_treated") == 15.0 && r.getAs[Double]("mu_control") == 5.0)
  }

  // ------------------------------------------------------------- q376
  test("q376: a perfectly consistent treatment ordering gives Q = 2b(k-1)·... the closed form") {
    // 3 blocks × 3 treatments, same order everywhere → rank sums 3,6,9
    // Q = 12/(3·3·4)·(9+36+81) − 3·3·4 = 42 − 36 = 6
    val rows = for {
      m <- 1 to 3
      (p, v) <- Seq(("1-URGENT", 10.0), ("3-MEDIUM", 20.0), ("5-LOW", 30.0))
    } yield ((m * 10 + v).toLong, p, v, f"2024-$m%02d-15 00:00:00")
    val orders = rows.toDF("o_orderkey", "o_orderpriority", "o_totalprice", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    val out = StatTests.friedman(orders).collect()
    assert(out.length == 3)
    val by = out.map(r => r.getAs[String]("o_orderpriority") -> r).toMap
    assert(by("1-URGENT").getAs[Double]("rank_sum") == 3.0)
    assert(by("3-MEDIUM").getAs[Double]("rank_sum") == 6.0)
    assert(by("5-LOW").getAs[Double]("rank_sum") == 9.0)
    out.foreach(r => assert(r.getAs[Double]("q_stat") == 6.0, r.toString))
    out.foreach(r => assert(r.getAs[Long]("n_blocks") == 3))
  }

  // ------------------------------------------------------------- q377
  test("q377: method-of-moments NB fit on planted counts, zero-order customers included") {
    val cust = Seq((1L, "SEG"), (2L, "SEG"), (3L, "SEG")).toDF("c_custkey", "c_mktsegment")
    // customer 1 places NO orders → count 0 via the left join
    val orders = ((1 to 2).map(i => (100L + i, 2L, 1.0))
      ++ (1 to 4).map(i => (200L + i, 3L, 1.0)))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val r = StatTests.negBinFit(orders, cust).collect().head
    assert(r.getAs[Long]("n_cust") == 3)
    // counts {0,2,4}: m=2, v=4 → r = 4/(4−2) = 2, p = 2/4, disp = 2
    assert(r.getAs[Double]("mean_orders") == 2.0 && r.getAs[Double]("var_orders") == 4.0)
    assert(r.getAs[Double]("nb_r") == 2.0 && r.getAs[Double]("nb_p") == 0.5)
    assert(r.getAs[Double]("dispersion") == 2.0)
  }

  // ------------------------------------------------------------- q378
  test("q378: Flesch/FK match the closed form on a punctuated fixture") {
    // 6 words, 2 sentences, 6 single-vowel-group syllables
    val docs = docsOf((1L, "The cat sat. The dog ran!", "en", "s", 26L))
    val r = TextAnalysis.readability(docs).collect().head
    assert(r.getAs[Long]("n_docs") == 1)
    assert(r.getAs[Double]("words_per_sentence") == 3.0)
    assert(r.getAs[Double]("syllables_per_word") == 1.0)
    assert(r.getAs[Double]("flesch_ease") == r4(206.835 - 1.015 * 3.0 - 84.6 * 1.0), r.toString)
    assert(r.getAs[Double]("fk_grade") == r4(0.39 * 3.0 + 11.8 * 1.0 - 15.59), r.toString)
  }

  test("q378: terminator-free corpora floor at one sentence per doc") {
    val docs = docsOf((1L, "only words no stops here", "en", "s", 24L))
    val r = TextAnalysis.readability(docs).collect().head
    assert(r.getAs[Double]("words_per_sentence") == 5.0, r.toString)
  }

  // ------------------------------------------------------------- q379
  test("q379: separated two-point samples match the hand-summed CvM statistic") {
    val cust = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("c_custkey", "c_mktsegment")
    // A = {1,2}, B = {3,4}: pooled CDF gaps .5, 1, .5, 0 → Σgap² = 1.5
    // T = (2·2/16)·1.5 = 0.375
    val orders = Seq((10L, 1L, 1.0), (11L, 1L, 2.0), (12L, 2L, 3.0), (13L, 2L, 4.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val r = StatTests.cramerVonMises(orders, cust).collect().head
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("t_stat") == 0.375, r.toString)
  }

  // ------------------------------------------------------------- q380
  test("q380: only the discordant cells drive McNemar, with capped continuity correction") {
    val strictA = Seq.fill(3)(("w w w", 500L))          // a ∧ ¬b ×3
    val strictB = Seq((Seq.fill(70)("w").mkString(" "), 100L)) // ¬a ∧ b ×1
    val docs = docsOf((strictA ++ strictB).zipWithIndex.map { case ((t, nc), i) =>
      ((i + 1).toLong, t, "en", "s", nc) }: _*)
    val r = TextAnalysis.mcnemar(docs).collect().head
    assert(r.getAs[Long]("n_a_only") == 3 && r.getAs[Long]("n_b_only") == 1)
    assert(r.getAs[Double]("chi2") == 1.0, r.toString)          // (3−1)²/4
    assert(r.getAs[Double]("chi2_corrected") == 0.25, r.toString) // (|2|−1)²/4
  }

  test("q380: zero discordance yields null statistics, not a division") {
    val docs = docsOf((1L, Seq.fill(70)("w").mkString(" "), "en", "s", 500L))
    val r = TextAnalysis.mcnemar(docs).collect().head
    assert(r.isNullAt(r.fieldIndex("chi2")) && r.isNullAt(r.fieldIndex("chi2_corrected")))
  }

  // ------------------------------------------------------------- q381
  test("q381: Kish ESS on the q375 fixture — 4 rows collapse to 3 effective") {
    val events = Seq(
      (1L, "A", 10.0), (3L, "A", 10.0), (5L, "A", 10.0), (2L, "A", 0.0),
      (7L, "B", 20.0), (4L, "B", 10.0), (6L, "B", 10.0), (8L, "B", 10.0))
      .toDF("user_id", "event_type", "value")
    val out = StatTests.ipwDiagnostics(events).collect()
    assert(out.length == 2)
    // both arms: weights {4/3, 4/3, 4/3, 4} → Σw = 8, Σw² = 64/3,
    // ESS = 64/(64/3) = 3, ratio .75, max 4, cv = (4/3)/2
    out.foreach { r =>
      assert(r.getAs[Long]("n") == 4)
      assert(r.getAs[Double]("sum_w") == 8.0, r.toString)
      assert(r.getAs[Double]("ess") == 3.0 && r.getAs[Double]("ess_ratio") == 0.75)
      assert(r.getAs[Double]("max_w") == 4.0)
      assert(r.getAs[Double]("cv_w") == r4(4.0 / 3 / 2), r.toString)
    }
  }

  // ------------------------------------------------------------- q382
  private def datedOrders(rows: (Long, Long, String)*) =
    rows.toDF("o_orderkey", "o_custkey", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")

  test("q382: identical survival in both segments scores chi2 = 0") {
    val cust = Seq((1L, "BUILDING"), (2L, "BUILDING"), (3L, "MACHINERY"), (4L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = datedOrders(
      (1L, 1L, "2022-01-01 00:00:00"),                                    // A: t=0 churned
      (2L, 2L, "2024-11-01 00:00:00"), (3L, 2L, "2024-12-31 00:00:00"),   // A: t=2 censored
      (4L, 3L, "2022-01-01 00:00:00"),                                    // B: t=0 churned
      (5L, 4L, "2024-11-01 00:00:00"), (6L, 4L, "2024-12-31 00:00:00"))   // B: t=2 censored
    val r = StatTests.logRank(orders, cust).collect().head
    assert(r.getAs[Long]("n_times") == 2)
    assert(r.getAs[Long]("o_a") == 1 && r.getAs[Double]("e_a") == 1.0)
    assert(r.getAs[Double]("chi2") == 0.0 && r.getAs[Double]("z_stat") == 0.0, r.toString)
  }

  test("q382: one segment churning while the other survives rejects loudly") {
    val cust = Seq((1L, "BUILDING"), (2L, "BUILDING"), (3L, "MACHINERY"), (4L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    // both A customers churn at t=0; both B customers censored at t=0
    val orders = datedOrders(
      (1L, 1L, "2022-01-01 00:00:00"), (2L, 2L, "2022-06-01 00:00:00"),
      (3L, 3L, "2024-12-31 00:00:00"), (4L, 4L, "2024-12-30 00:00:00"))
    val r = StatTests.logRank(orders, cust).collect().head
    // t=0: ra=rb=2, da=2, db=0 → E_A = 1, V = 2·¼·(4−2)/3 = 1/3
    assert(r.getAs[Long]("o_a") == 2 && r.getAs[Double]("e_a") == 1.0)
    assert(r.getAs[Double]("chi2") == 3.0, r.toString)
    assert(r.getAs[Double]("z_stat") == r4(math.sqrt(3.0)), r.toString)
  }

  // ------------------------------------------------------------- q383
  // ------------------------------------------------------------- q384
  test("q384: rate ratio and z match the closed form on planted counts") {
    val events = (Seq.fill(6)("purchase") ++ Seq.fill(3)("error") ++ Seq.fill(2)("view"))
      .zipWithIndex.map { case (et, i) =>
        (i.toLong, et, if (i % 2 == 0) "2024-01-01 10:00:00" else "2024-01-02 10:00:00")
      }.toDF("user_id", "event_type", "d")
      .withColumn("ts", to_timestamp(col("d"))).drop("d")
    val r = StatTests.rateRatio(events).collect().head
    assert(r.getAs[Long]("c_a") == 6 && r.getAs[Long]("c_b") == 3 && r.getAs[Long]("n_days") == 2)
    assert(r.getAs[Double]("rate_a") == 3.0 && r.getAs[Double]("rate_b") == 1.5)
    assert(r.getAs[Double]("rate_ratio") == 2.0)
    assert(r.getAs[Double]("z_stat") == r4(math.log(2.0) / math.sqrt(1.0 / 6 + 1.0 / 3)), r.toString)
  }

  // ------------------------------------------------------------- q385
  test("q385: trimmed means and Winsorized variance match the hand computation") {
    val orders = prioOrders(
      ((1 to 10).map(i => (i.toLong, "1-URGENT", i.toDouble))
        ++ (1 to 10).map(i => (100L + i, "5-LOW", i + 12.0))): _*)
    val r = StatTests.yuenTrimmed(orders).collect().head
    assert(r.getAs[Long]("n_a") == 10 && r.getAs[Long]("h_a") == 8)
    assert(r.getAs[Double]("tm_a") == 5.5 && r.getAs[Double]("tm_b") == 17.5)
    // winsorized sample {2,2,3..8,9,9}: SS = 66.5, var = 66.5/9,
    // d = var·9/(8·7) = 66.5/56 per side → t = −12/√(2·66.5/56)
    val t = -12.0 / math.sqrt(2 * 66.5 / 56)
    assert(r.getAs[Double]("t_stat") == r4(t), s"$r vs $t")
  }

  // ------------------------------------------------------------- q386
  test("q386: partial correlation matches the three-corr closed form on a planted frame") {
    // daily tuples: x = (10,25,30,50), y = (1,2,3,4), z = x/y
    val rows = Seq(
      (1L, 10.0, "2024-01-01"),
      (2L, 10.0, "2024-01-02"), (3L, 15.0, "2024-01-02"),
      (4L, 10.0, "2024-01-03"), (5L, 10.0, "2024-01-03"), (6L, 10.0, "2024-01-03"),
      (7L, 12.5, "2024-01-04"), (8L, 12.5, "2024-01-04"),
      (9L, 12.5, "2024-01-04"), (10L, 12.5, "2024-01-04"))
    val orders = rows.toDF("o_orderkey", "o_totalprice", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    val r = StatTests.partialCorr(orders).collect().head
    assert(r.getAs[Long]("n_days") == 4)
    // hand corrs on (x, y, z)
    def corr2(u: Seq[Double], v: Seq[Double]) = {
      val (mu, mv) = (u.sum / u.size, v.sum / v.size)
      val c = u.zip(v).map { case (a, b) => (a - mu) * (b - mv) }.sum
      c / math.sqrt(u.map(a => (a - mu) * (a - mu)).sum * v.map(b => (b - mv) * (b - mv)).sum)
    }
    val x = Seq(10.0, 25.0, 30.0, 50.0); val y = Seq(1.0, 2.0, 3.0, 4.0)
    val z = Seq(10.0, 12.5, 10.0, 12.5)
    val (rxy, rxz, ryz) = (corr2(x, y), corr2(x, z), corr2(y, z))
    val expected = (rxy - rxz * ryz) / math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    assert(math.abs(r.getAs[Double]("r_rev_cnt") - r4(rxy)) < 1.5e-4, r.toString)
    assert(math.abs(r.getAs[Double]("partial_r") - r4(expected)) < 1.5e-4,
      s"$r vs expected $expected")
  }

  // ------------------------------------------------------------- q387
  test("q387: additive 2x2 design recovers exact F ratios and zero interaction") {
    val rows = for {
      (m, base) <- Seq(("01", 0.0), ("02", 20.0))
      (p, off) <- Seq(("1-URGENT", 10.0), ("5-LOW", 20.0))
      e <- Seq(-2.0, 2.0)
    } yield (base + off + e, p, s"2024-$m-15 00:00:00")
    val orders = rows.zipWithIndex.map { case ((v, p, d), i) => ((i + 1).toLong, p, v, d) }
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    val r = StatTests.twoWayAnova(orders).collect().head
    // SSA = 800, SSB = 200, SSE = 32, SST = 1032, SSAB = 0 (hand math)
    assert(r.getAs[Long]("n_orders") == 8 && r.getAs[Long]("dfe") == 4)
    assert(r.getAs[Double]("f_month") == 100.0, r.toString)
    assert(r.getAs[Double]("f_prio") == 25.0, r.toString)
    assert(math.abs(r.getAs[Double]("f_inter")) < 1e-6, r.toString)
    assert(r.getAs[Double]("eta2_month") == r4(800.0 / 1032), r.toString)
  }

  // ------------------------------------------------------------- q388
  test("q388: equally-busy raters score Q = 0; a lone strict rater scores the closed form") {
    // one doc per disagreement pattern with equal column totals → Q = 0
    val balanced = docsOf(
      (1L, Seq.fill(70)("aaa").mkString(" "), "en", "s", 500L), // (1,1,1)
      (2L, "zz zz zz", "en", "s", 500L),                        // (1,0,0)
      (3L, Seq.fill(70)("zz").mkString(" "), "en", "s", 100L),  // (0,1,0)
      (4L, "aaa", "en", "s", 10L))                              // (0,0,1)
    val r = TextAnalysis.cochranQ(balanced).collect().head
    assert(r.getAs[Long]("c_a") == 2 && r.getAs[Long]("c_b") == 2 && r.getAs[Long]("c_c") == 2,
      r.toString)
    assert(r.getAs[Double]("q_stat") == 0.0, r.toString)
    // rater A alone flags all 3 docs → Q = 2(3·9 − 9)/(9 − 3) = 6
    val strict = docsOf((1 to 3).map(i => (i.toLong, "zz zz", "en", "s", 500L)): _*)
    val r2 = TextAnalysis.cochranQ(strict).collect().head
    assert(r2.getAs[Double]("q_stat") == 6.0, r2.toString)
  }

  // ------------------------------------------------------------- q389
  test("q389: hazard, cumulative hazard and NA survival match the hand table") {
    // c1,c2: single old orders (t=0, churned); c3: 60-day recent pair
    // (t=2, censored); c4: single recent order (t=0, censored)
    val orders = Seq(
      (1L, 1L, "2022-01-01 00:00:00"), (2L, 2L, "2022-02-01 00:00:00"),
      (3L, 3L, "2024-11-01 00:00:00"), (4L, 3L, "2024-12-31 00:00:00"),
      (5L, 4L, "2024-12-20 00:00:00"))
      .toDF("o_orderkey", "o_custkey", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    val out = StatTests.nelsonAalen(orders).collect()
    assert(out.length == 2)
    val t0 = out.head
    assert(t0.getAs[Long]("lifetime_months") == 0 && t0.getAs[Long]("at_risk") == 4)
    assert(t0.getAs[Long]("n_churned") == 2 && t0.getAs[Double]("hazard") == 0.5)
    assert(t0.getAs[Double]("cum_hazard") == 0.5)
    assert(t0.getAs[Double]("na_survival") == r4(math.exp(-0.5)), t0.toString)
    val t2 = out(1)
    assert(t2.getAs[Long]("at_risk") == 1 && t2.getAs[Double]("hazard") == 0.0)
    assert(t2.getAs[Double]("cum_hazard") == 0.5, "no churn at t=2 leaves H flat")
  }

  // ------------------------------------------------------------- q390
  test("q390: a planted spike day anchors the window; flat days read 1.0 vs baseline") {
    val orders = (1 to 21).map { i =>
      val rev = if (i == 11) 1000.0 else 100.0
      (i.toLong, "P", rev, f"2024-01-$i%02d 00:00:00")
    }
    val df = orders.toDF("o_orderkey", "o_orderpriority", "o_totalprice", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    val out = StatTests.eventStudy(df).collect()
    assert(out.length == 15, s"offsets -7..+7 all present: ${out.length}")
    val byOff = out.map(r => r.getAs[Long]("offset") -> r).toMap
    assert(byOff(0L).getAs[String]("day") == "2024-01-11")
    assert(byOff(0L).getAs[Double]("rel_to_baseline") == 10.0, byOff(0L).toString)
    (-7L to 7L).filter(_ != 0).foreach(o =>
      assert(byOff(o).getAs[Double]("rel_to_baseline") == 1.0, byOff(o).toString))
  }

  // ------------------------------------------------------------- q391
  test("q391: CV ranks the scattered part above the constant one; thin parts drop") {
    val rows =
      (1 to 5).map(i => (i.toLong, 1L, 10.0, 1.0)) ++          // part 1: constant price
      (1 to 4).map(i => (10L + i, 2L, 10.0, 1.0)) ++           // part 2: 4×10 + 1×20
      Seq((15L, 2L, 20.0, 1.0)) ++
      Seq((20L, 3L, 99.0, 1.0))                                // part 3: below minLines
    val li = rows.toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_quantity")
    val out = StatTests.priceDispersion(li).collect()
    assert(out.map(_.getAs[Long]("l_partkey")).toSeq == Seq(2L, 1L), out.mkString(","))
    val p2 = out.head
    // unit prices {10,10,10,10,20}: m=12, var_samp=20 → cv = √20/12
    assert(p2.getAs[Double]("avg_unit_price") == 12.0)
    assert(p2.getAs[Double]("cv") == r4(math.sqrt(20.0) / 12), p2.toString)
    assert(out(1).getAs[Double]("cv") == 0.0)
  }

  // ------------------------------------------------------------- q392
  private def liShip(rows: (Long, String, String)*) =
    rows.toDF("l_orderkey", "s", "e")
      .select(col("l_orderkey"),
        explode(array(to_timestamp(col("s")), to_timestamp(col("e")))).as("l_shipdate"))

  test("q392: overlapping fulfillment windows pair up; disjoint ones don't") {
    val orders = Seq((1L, 10L), (2L, 10L), (3L, 10L), (10L, 20L), (11L, 20L), (12L, 20L))
      .toDF("o_orderkey", "o_custkey")
    val li = liShip(
      // cust 10: A[01-01..01-10] ∩ B[01-05..01-15]; C[02-20..02-28] disjoint
      (1L, "2024-01-01 00:00:00", "2024-01-10 00:00:00"),
      (2L, "2024-01-05 00:00:00", "2024-01-15 00:00:00"),
      (3L, "2024-02-20 00:00:00", "2024-02-28 00:00:00"),
      // cust 20: three mutually overlapping windows → 3 pairs
      (10L, "2024-03-01 00:00:00", "2024-03-30 00:00:00"),
      (11L, "2024-03-05 00:00:00", "2024-03-25 00:00:00"),
      (12L, "2024-03-10 00:00:00", "2024-03-20 00:00:00"))
    val out = graft.operators.EventAnalytics.overlappingOrders(orders, li).collect()
    assert(out.map(r => r.getAs[Long]("o_custkey") -> r.getAs[Long]("n_overlap_pairs")).toMap
      == Map(10L -> 1L, 20L -> 3L), out.mkString(","))
    assert(out.head.getAs[Long]("o_custkey") == 20L, "most-overlapping customer first")
  }

  test("q392: a binding cap bounds the whale's pair expansion") {
    val orders = (1 to 10).map(i => (i.toLong, 99L)).toDF("o_orderkey", "o_custkey")
    // ten identical month-long windows → uncapped would be C(10,2) = 45 pairs
    val li = liShip((1 to 10).map(i =>
      (i.toLong, "2024-01-01 00:00:00", "2024-01-30 00:00:00")): _*)
    val out = graft.operators.EventAnalytics.overlappingOrders(orders, li, cap = 3).collect()
    assert(out.head.getAs[Long]("n_overlap_pairs") == 3L, // C(3,2)
      s"cap=3 must bound the expansion: ${out.mkString(",")}")
  }

  // ------------------------------------------------------------- q393
  test("q393: a range-clustered layout reads depth ~1; a shuffled one reads depth ~#files") {
    import graft.sources.ClusteringDepth
    val n = 20000
    val base = spark.range(n).select(
      col("id"), (col("id") % 97).as("noise"))
    val clustered = Files.createTempDirectory("graft-depth-sorted").toString
    val shuffled = Files.createTempDirectory("graft-depth-shuffled").toString
    base.repartitionByRange(8, col("id")).write.mode("overwrite").parquet(clustered)
    base.repartition(8, col("noise")).write.mode("overwrite").parquet(shuffled)
    val c = ClusteringDepth.report(spark, clustered, "id").collect().head
    val s = ClusteringDepth.report(spark, shuffled, "id").collect().head
    assert(c.getAs[Long]("n_files") >= 2 && c.getAs[Long]("n_rows") == n)
    assert(c.getAs[Double]("avg_open_depth") <= 1.5, s"range layout stays near depth 1: $c")
    assert(c.getAs[Double]("expected_stab") <= 1.5, s"range layout point cost ~1 file: $c")
    assert(s.getAs[Double]("expected_stab") >= s.getAs[Long]("n_files") * 0.8,
      s"shuffled layout overlaps everywhere: $s")
    assert(c.getAs[Double]("point_scan_share") < s.getAs[Double]("point_scan_share"),
      "the clustered table must be cheaper to point-scan")
  }

  // --------------------------------------------------------- q394/q395
  private def armOf(u: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    if ("01234567".contains(hex.charAt(0))) "A" else "B"
  }
  private def normQ(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.2316419 * x)
    math.exp(-0.5 * x * x) * 0.3989422804014327 *
      (0.319381530 * t - 0.356563782 * t * t + 1.781477937 * t * t * t
        - 1.821255978 * t * t * t * t + 1.330274429 * t * t * t * t * t)
  }

  test("q394: posterior P(A>B) matches the Jeffreys-normal closed form on planted arms") {
    // users 1..200, one event each; the first 100 purchase
    val events = (1L to 200L).map(u =>
      (u, if (u <= 100) "purchase" else "view", 1.0))
      .toDF("user_id", "event_type", "value")
    val r = graft.operators.Relational.bayesAb(events).collect().head
    val byArm = (1L to 200L).groupBy(armOf)
    val (na, nb) = (byArm("A").size, byArm("B").size)
    val (sa, sb) = (byArm("A").count(_ <= 100), byArm("B").count(_ <= 100))
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("s_a") == sa, r.toString)
    val pa = (sa + 0.5) / (na + 1); val pb = (sb + 0.5) / (nb + 1)
    val v = pa * (1 - pa) / (na + 1) + pb * (1 - pb) / (nb + 1)
    val z = (pa - pb) / math.sqrt(v)
    val prob = if (z >= 0) 1.0 - normQ(z) else normQ(-z)
    assert(r.getAs[Double]("conv_a") == r4(pa), r.toString)
    assert(math.abs(r.getAs[Double]("prob_a_beats_b") - r4(prob)) < 1.5e-4,
      s"$r vs prob $prob")
  }

  test("q395: near-identical arms with a tight spread declare equivalence") {
    val events = (1L to 200L).map(u => (u, "purchase", (u % 7).toDouble))
      .toDF("user_id", "event_type", "value")
    val r = graft.operators.Relational.tostEquivalence(events).collect().head
    // ground truth via the same md5 arms + formulas
    val revs = (1L to 200L).map(u => armOf(u) -> (u % 7).toDouble)
    def stats(arm: String) = {
      val xs = revs.filter(_._1 == arm).map(_._2)
      val m = xs.sum / xs.size
      (xs.size, m, xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1))
    }
    val (na, ma, va) = stats("A"); val (nb, mb, vb) = stats("B")
    val mAll = revs.map(_._2).sum / revs.size
    val d = ma - mb; val se = math.sqrt(va / na + vb / nb)
    val delta = math.abs(mAll) * 0.05
    val (zl, zu) = ((d + delta) / se, (delta - d) / se)
    def upperP(z: Double) = if (z >= 0) normQ(z) else 1.0 - normQ(-z)
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(math.abs(r.getAs[Double]("z_lower") - r4(zl)) < 1.5e-4, r.toString)
    assert(math.abs(r.getAs[Double]("z_upper") - r4(zu)) < 1.5e-4, r.toString)
    val expectEq = math.max(r4(upperP(zl)), r4(upperP(zu))) < 0.05
    assert(r.getAs[Boolean]("equivalent") == expectEq, s"$r vs p=(${upperP(zl)}, ${upperP(zu)})")
  }

  // ------------------------------------------------------------- q396
  test("q396: the advisor ranks the actually-clustered column first") {
    import graft.sources.ClusteringDepth
    val dir = Files.createTempDirectory("graft-advisor").toString
    spark.range(20000)
      .select(col("id"), (col("id") * 2654435761L % 9973).as("noise"))
      .repartitionByRange(8, col("id"))
      .write.mode("overwrite").parquet(dir)
    val out = ClusteringDepth.sortAdvisor(spark, dir, Seq("noise", "id")).collect()
    assert(out.length == 2)
    assert(out.head.getAs[String]("column") == "id",
      s"the range-partitioned key must win: ${out.mkString(",")}")
    assert(out.head.getAs[Double]("point_scan_share")
      < out(1).getAs[Double]("point_scan_share"), out.mkString(","))
  }

  test("q396: a degenerate constant column (span 0, null share) ranks LAST, never wins") {
    import graft.sources.ClusteringDepth
    val dir = Files.createTempDirectory("graft-advisor-const").toString
    spark.range(20000)
      .select(col("id"), lit(7L).as("konst"))
      .repartitionByRange(8, col("id"))
      .write.mode("overwrite").parquet(dir)
    val out = ClusteringDepth.sortAdvisor(spark, dir, Seq("konst", "id")).collect()
    assert(out.length == 2)
    assert(out.head.getAs[String]("column") == "id",
      s"a constant column carries no clustering signal and must not win: ${out.mkString(",")}")
    assert(out(1).getAs[String]("column") == "konst" && out(1).isNullAt(out(1).fieldIndex("point_scan_share")),
      s"the constant column's null share must sort last: ${out.mkString(",")}")
  }

  // ------------------------------------------------------------- q397
  test("q397: a strictly rising series scores S = C(n,2) and 'increasing'; flat scores null z") {
    def daysOf(revs: Seq[Double]) = prioOrders(revs.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, "P", v) }: _*)
      .withColumn("o_orderdate",
        to_timestamp(concat(lit("2024-01-"),
          lpad((col("o_orderkey")).cast("string"), 2, "0"), lit(" 00:00:00"))))
    val up = StatTests.mannKendall(daysOf((1 to 10).map(_ * 10.0))).collect().head
    assert(up.getAs[Long]("n_days") == 10 && up.getAs[Long]("s_stat") == 45)
    // no ties: Var = 10·9·25/18 = 125; z = 44/√125
    assert(up.getAs[Double]("var_s") == 125.0)
    assert(up.getAs[Double]("z_stat") == r4(44.0 / math.sqrt(125.0)), up.toString)
    assert(up.getAs[String]("trend") == "increasing")
    val flat = StatTests.mannKendall(daysOf(Seq.fill(10)(7.0))).collect().head
    assert(flat.getAs[Long]("s_stat") == 0 && flat.getAs[Double]("var_s") == 0.0)
    assert(flat.isNullAt(flat.fieldIndex("z_stat")) && flat.getAs[String]("trend") == "no_trend")
  }

  // ------------------------------------------------------------- q398
  test("q398: one half-life halves an order's contribution exactly") {
    val cust = Seq((1L, "SEG")).toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (1L, 1L, 100.0, "2024-12-31 00:00:00"), // age 0 → weight 1
      (2L, 1L, 100.0, "2024-07-04 00:00:00")) // age 180 → weight ½
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    val r = StatTests.decayedClv(orders, cust).collect().head
    assert(r.getAs[Long]("n_customers") == 1)
    assert(math.abs(r.getAs[Double]("avg_clv") - 150.0) < 1e-3, r.toString)
  }

  // ------------------------------------------------------------- q399
  test("q399: smooth and lumpy parts land in their Syntetos-Boylan quadrants") {
    val rows =
      (0 until 5).map(i => (i.toLong, 1L, 10.0, f"2024-01-${i + 1}%02d 00:00:00")) ++
      Seq((10L, 2L, 1.0, "2024-01-01 00:00:00"),
        (11L, 2L, 1.0, "2024-01-31 00:00:00"),
        (12L, 2L, 28.0, "2024-03-01 00:00:00"))
    val li = rows.toDF("l_orderkey", "l_partkey", "l_quantity", "d")
      .withColumn("l_shipdate", to_timestamp(col("d"))).drop("d")
    val out = StatTests.demandClasses(li).collect()
    val by = out.map(r => r.getAs[String]("demand_class") -> r).toMap
    // part 1: adi = 4/4 = 1, cv2 = 0 → smooth
    assert(by("smooth").getAs[Long]("n_parts") == 1 && by("smooth").getAs[Double]("avg_adi") == 1.0)
    // part 2: adi = 60/2 = 30; qty {1,1,28}: mq=10, vq=243 → cv2=2.43 → lumpy
    assert(by("lumpy").getAs[Long]("n_parts") == 1)
    assert(by("lumpy").getAs[Double]("avg_adi") == 30.0 && by("lumpy").getAs[Double]("avg_cv2") == 2.43,
      by("lumpy").toString)
    assert(out.length == 2)
  }

  // ------------------------------------------------------------- q400
  test("q400: values 10..19 put one observation on each second digit") {
    val orders = (10 to 19).map(v => (v.toLong, "P", v.toDouble))
    val out = StatTests.benfordSecondDigit(prioOrders(orders: _*)).collect()
    assert(out.length == 10)
    val probs = (0 to 9).map(d =>
      (1 to 9).map(k => math.log10(1.0 + 1.0 / (10 * k + d))).sum)
    out.foreach { r =>
      val d = r.getAs[Int]("digit")
      assert(r.getAs[Long]("n") == 1 && r.getAs[Double]("p_observed") == 0.1)
      assert(r.getAs[Double]("p_expected") == r4(probs(d)), r.toString)
    }
    val chi2 = probs.map(p => { val e = p * 10; (1 - e) * (1 - e) / e }).sum
    assert(math.abs(out.head.getAs[Double]("chi2") - r4(chi2)) < 1e-3, out.head.toString)
  }

  test("q400: absent second digits still appear (n=0) and owe their full (0-e)^2/e = e to chi2") {
    // values 10..14 → digits 0..4 observed once; digits 5..9 ABSENT
    val orders = (10 to 14).map(v => (v.toLong, "P", v.toDouble))
    val out = StatTests.benfordSecondDigit(prioOrders(orders: _*)).collect()
    assert(out.length == 10, s"frame must densify to all ten digits: ${out.length}")
    val probs = (0 to 9).map(d =>
      (1 to 9).map(k => math.log10(1.0 + 1.0 / (10 * k + d))).sum)
    (5 to 9).foreach { d =>
      val r = out(d)
      assert(r.getAs[Int]("digit") == d && r.getAs[Long]("n") == 0L, r.toString)
    }
    val chi2 = (0 to 9).map { d =>
      val e = probs(d) * 5
      val o = if (d <= 4) 1.0 else 0.0
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(out.head.getAs[Double]("chi2") - r4(chi2)) < 1e-3,
      s"zero cells must contribute e: ${out.head}")
  }

  // ------------------------------------------------------------- q401
  test("q401: price-level walks count exactly their changes") {
    val rows = Seq(
      // part 1: unit prices 10,10,20,20,10 in date order → 2 changes
      (1L, 1, 1L, 1.0, 10.0, "2024-01-01"), (2L, 1, 1L, 1.0, 10.0, "2024-01-02"),
      (3L, 1, 1L, 1.0, 20.0, "2024-01-03"), (4L, 1, 1L, 1.0, 20.0, "2024-01-04"),
      (5L, 1, 1L, 1.0, 10.0, "2024-01-05"),
      // part 2: constant → 0 changes
      (6L, 1, 2L, 1.0, 5.0, "2024-01-01"), (7L, 1, 2L, 1.0, 5.0, "2024-01-02"),
      (8L, 1, 2L, 1.0, 5.0, "2024-01-03"))
    val li = rows.toDF("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
      "l_extendedprice", "d")
      .withColumn("l_shipdate", to_timestamp(col("d"))).drop("d")
    val out = StatTests.priceChangeFrequency(li).collect()
    val by = out.map(r => r.getAs[Long]("n_changes") -> r.getAs[Long]("n_parts")).toMap
    assert(by == Map(0L -> 1L, 2L -> 1L), out.mkString(","))
    assert(out.find(_.getAs[Long]("n_changes") == 2L).get.getAs[Double]("avg_lines") == 5.0)
  }

  // ------------------------------------------------------------- q402
  test("q402: zero-order customers dilute the repeat share; repeaters average their own orders") {
    val cust = Seq((1L, "SEG"), (2L, "SEG"), (3L, "SEG")).toDF("c_custkey", "c_mktsegment")
    val orders = (Seq((10L, 2L)) ++ (1 to 3).map(i => (20L + i, 3L)))
      .toDF("o_orderkey", "o_custkey")
    val r = StatTests.repeatPurchase(orders, cust).collect().head
    assert(r.getAs[Long]("n_customers") == 3 && r.getAs[Long]("n_repeat") == 1)
    assert(r.getAs[Double]("avg_orders") == r4(4.0 / 3), r.toString)
    assert(r.getAs[Double]("repeat_share") == r4(1.0 / 3), r.toString)
    assert(r.getAs[Double]("orders_per_repeater") == 3.0, r.toString)
  }

  test("q383: planted 2x-scaled segment reads back 10 exact decile ratios of 2") {
    val cust = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("c_custkey", "c_mktsegment")
    val orders = ((1 to 10).map(i => (i.toLong, 1L, i * 10.0))
      ++ (1 to 10).map(i => (100L + i, 2L, i * 20.0)))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val out = StatTests.quantileShift(orders, cust).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert(r.getAs[Double]("q_a") == d * 10.0 && r.getAs[Double]("q_b") == d * 20.0)
      assert(r.getAs[Double]("shift") == d * 10.0 && r.getAs[Double]("ratio") == 2.0)
    }
  }
}
