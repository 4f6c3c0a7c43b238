package graft

import graft.operators.{Similarity, StatTests, TextAnalysis}
import org.apache.spark.sql.functions._

/** Ground-truth fixtures for the round-9 widening (q403–q407):
  * hand-computed statistics on planted data — the properties the DuckDB
  * oracle equality can't state. */
class AnalyticsR14Spec extends SparkSpec {
  import spark.implicits._

  private def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000

  private def dayOrders(revs: Seq[Double]) =
    revs.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, f"2024-01-${i + 1}%02d 00:00:00", v)
    }.toDF("o_orderkey", "ds", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("ds"))).drop("ds")

  // ------------------------------------------------------------- q403
  test("q403: a planted spike is the worst day with the closed-form G; flat-ish data is not an outlier") {
    // 9 days at 100, one at 1000
    val revs = Seq.fill(9)(100.0) :+ 1000.0
    val r = StatTests.grubbs(dayOrders(revs)).collect().head
    assert(r.getAs[Long]("n_days") == 10)
    assert(r.getAs[String]("worst_day") == "2024-01-10")
    val mu = revs.sum / 10
    val s = math.sqrt(revs.map(x => (x - mu) * (x - mu)).sum / 9)
    assert(r.getAs[Double]("g_stat") == r4(math.abs(1000.0 - mu) / s), r.toString)
    assert(r.getAs[Boolean]("outlier"), "a 10x spike must flag")
    // alternating small noise: max deviation ~1sigma, never an outlier
    val calm = StatTests.grubbs(dayOrders(Seq(100.0, 102, 98, 101, 99, 100, 102, 98, 101, 99)))
      .collect().head
    assert(!calm.getAs[Boolean]("outlier"), calm.toString)
  }

  // ------------------------------------------------------------- q404
  test("q404: a level shift drifts PH upward; a flat series never alarms") {
    // 30 flat days then 30 days at double revenue: the running mean
    // lags the new level, so PH accumulates through the second month
    val revs = Seq.fill(30)(100.0) ++ Seq.fill(30)(200.0)
    val sixty = revs.zipWithIndex.map { case (v, i) => ((i + 1).toLong, i, v) }
      .toDF("o_orderkey", "off", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(date_add(lit("2024-01-01"), col("off"))))
      .drop("off")
    val out = StatTests.pageHinkley(sixty).collect()
    val m = out.map(r => r.getAs[String]("month") -> r).toMap
    assert(m("2024-01").getAs[Int]("alarm") == 0, m("2024-01").toString)
    assert(m("2024-02").getAs[Double]("max_excursion_sigmas")
      > m("2024-01").getAs[Double]("max_excursion_sigmas"),
      "the shifted month must carry the larger excursion")
    val flat = StatTests.pageHinkley(dayOrders(Seq.fill(20)(100.0))).collect()
    assert(flat.forall(_.getAs[Int]("alarm") == 0), flat.mkString(","))
  }

  // ------------------------------------------------------------- q405
  test("q405: planted clusters classify perfectly; votes are k for pure neighbourhoods") {
    // two orthogonal clusters: label 0 along dim 0, label 1 along dim 1
    val rows = (0 until 40).map { i =>
      val lab = i % 2
      val base = Array.fill(4)(0.001f * i)
      base(lab) = 1.0f
      (i.toLong, base.toSeq, lab)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = Similarity.knnClassify(emb, numQueries = 4, k = 5).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getAs[Boolean]("correct"), r.toString)
      assert(r.getAs[Long]("votes") == 5L, s"pure neighbourhood votes unanimously: $r")
    }
  }

  // ------------------------------------------------------------- q406
  test("q406: an all-duplicate second half reads novelty 1.0 then 0.0 and a flat cumulative share") {
    // bins of 5 docs: first half unique, second half copies of doc 0..9
    val docs = (0 until 20).map { i =>
      val text = if (i < 10) s"unique document number $i" else s"unique document number ${i - 10}"
      (i.toLong, text, "en", "s", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.noveltyCurve(docs, nBins = 4).collect()
    assert(out.length == 4)
    assert(out(0).getAs[Double]("novelty_share") == 1.0 &&
      out(1).getAs[Double]("novelty_share") == 1.0, out.mkString(","))
    assert(out(2).getAs[Double]("novelty_share") == 0.0 &&
      out(3).getAs[Double]("novelty_share") == 0.0, out.mkString(","))
    assert(out(3).getAs[Double]("cum_distinct_share") == 0.5,
      "10 distinct fingerprints over 20 docs")
  }

  // ------------------------------------------------------------- q407
  test("q407: repetition compresses into the degenerate regime, prose keeps, noise reads low-info") {
    val repetitive = "spam spam spam spam " * 60
    val prose = "the quick brown fox jumps over the lazy dog while seventeen " +
      "curious researchers measure compression ratios of natural language " +
      "samples across replicated corpora and revise their quality thresholds " * 3
    // deterministic pseudo-noise: base-36 of a multiplicative hash
    val noise = (1 to 240).map(i => java.lang.Long.toString(i * 2654435761L & 0x7fffffff, 36))
      .mkString(" ")
    val docs = Seq(
      (0L, repetitive, "en", "rep", repetitive.length.toLong),
      (1L, prose, "en", "prose", prose.length.toLong),
      (2L, noise, "en", "noise", noise.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.compressionQuality(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val rRep = out("rep").getAs[Double]("avg_ratio")
    val rProse = out("prose").getAs[Double]("avg_ratio")
    val rNoise = out("noise").getAs[Double]("avg_ratio")
    assert(rRep > rProse && rProse > rNoise, s"rep=$rRep prose=$rProse noise=$rNoise")
    assert(out("rep").getAs[Long]("n_degenerate") == 1L, s"ratio $rRep must flag degenerate")
    assert(out("noise").getAs[Long]("n_low_info") == 1L, s"ratio $rNoise must flag low-info")
    assert(out("prose").getAs[Double]("keep_share") == 1.0, out("prose").toString)
    // determinism: the kernel is pure given the same bytes
    val again = TextAnalysis.compressionQuality(docs).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("avg_ratio")).toMap
    assert(again("prose") == rProse)
  }

  // ------------------------------------------------------------- q408
  test("q408: a pure trend scores the closed-form R/S per block and H near 1; an oscillation scores H = 0") {
    // linear trend x_t = t over 128 days: per even block of size n,
    // R = n^2/8 exactly, S = sqrt((n^2-1)/12) -> the H slope is the
    // same OLS fold run here in plain Scala
    val trend = StatTests.hurst(dayOrders128((1 to 128).map(_.toDouble))).collect()
    val sizes = Seq(8, 16, 32, 64)
    def rsOf(n: Int) = (n * n / 8.0) / math.sqrt((n.toDouble * n - 1) / 12.0)
    trend.zip(sizes).foreach { case (r, n) =>
      assert(r.getAs[Double]("mean_rs") == r4(rsOf(n)), s"size $n: $r")
    }
    val u = sizes.map(n => math.log(n.toDouble))
    val v = sizes.map(n => math.log(rsOf(n)))
    val ub = u.sum / 4; val vb = v.sum / 4
    val slope = u.zip(v).map { case (a, b) => (a - ub) * (b - vb) }.sum /
      u.map(a => (a - ub) * (a - ub)).sum
    assert(trend.head.getAs[Double]("hurst") == r4(slope), trend.head.toString)
    assert(slope > 0.85, s"a pure trend is persistent: $slope")
    // strict oscillation: every even block has R = S -> rs = 1 at every
    // size -> ln(rs) = 0 everywhere -> slope exactly 0
    val osc = StatTests.hurst(
      dayOrders128((1 to 128).map(i => if (i % 2 == 1) 101.0 else 99.0))).collect()
    assert(osc.forall(_.getAs[Double]("hurst") == 0.0), osc.mkString(","))
    assert(osc.forall(_.getAs[Double]("mean_rs") == 1.0), osc.mkString(","))
  }

  // ------------------------------------------------------------- q409
  test("q409: an exact Pareto tail recovers its alpha; an all-ties tail reads null") {
    // x_(i) = C * i^(-1/alpha): Hill over ranks recovers alpha up to
    // the harmonic-vs-log gap; use alpha = 2 over a wide tail and
    // assert the estimate lands near 2
    val alpha = 2.0
    val orders = (1 to 2000).map { i =>
      (i.toLong, "P", 1000.0 * math.pow(i.toDouble, -1.0 / alpha))
    }
    val r = StatTests.hillTail(prioOrders(orders: _*), k = 100).collect().head
    assert(r.getAs[Long]("n_tail") == 100)
    val est = r.getAs[Double]("alpha")
    assert(est > 1.7 && est < 2.3, s"Hill on an exact Pareto must sit near 2: $est")
    val flat = StatTests.hillTail(
      prioOrders((1 to 200).map(i => (i.toLong, "P", 42.0)): _*), k = 100).collect().head
    assert(flat.isNullAt(flat.fieldIndex("alpha")), "all-ties tail has no slope")
  }

  // ------------------------------------------------------------- q410
  test("q410: identical sources sit at delta 0; a style outlier is farther from both") {
    def doc(id: Long, src: String, text: String) = (id, text, "en", src, text.length.toLong)
    val common = "the cat sat on the mat and the dog ran over the hill " * 4
    val outlier = ("wherefore art thou yonder quill parchment hath scribe " * 5) + common
    val docs = Seq(
      doc(0, "a", common), doc(1, "b", common), doc(2, "c", outlier))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.burrowsDelta(docs, vocabV = 20).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) -> r.getAs[Double]("delta"))
      .toMap
    assert(out(("a", "b")) == 0.0, s"identical styles: ${out(("a", "b"))}")
    assert(out(("a", "c")) > 0.5 && out(("b", "c")) > 0.5, out.toString)
    assert(out(("a", "c")) == out(("b", "c")), "equidistant from the twin sources")
  }

  // ------------------------------------------------------------- q411
  test("q411: the budget prices the capped join's EXACT enumeration count and the disclosed drop share") {
    import graft.operators.Dedup
    // 6 copies of one text (every shingle df=6) + 2 copies of another
    // (df=2) + 1 unique (df=1): with cap 4, the df=6 family drops
    val t1 = "alpha beta gamma delta epsilon zeta"
    val t2 = "one two three four five six seven"
    val t3 = "lonely unique document with fresh words"
    val docs = ((0 until 6).map(i => (i.toLong, t1)) ++
      Seq((6L, t2), (7L, t2), (8L, t3)))
      .map { case (id, tx) => (id, tx, "en", "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.pairBudget(docs, maxDfs = Seq(1, 4, 10)).collect()
      .map(r => r.getAs[Int]("max_df") -> r).toMap
    val sh1 = 4; val sh2 = 5; val sh3 = 4 // 3-shingles per text (n_tok - 2)
    // cap 10 keeps everything: pairs = sh1*C(6,2) + sh2*C(2,2=1)
    assert(out(10).getAs[Long]("est_candidate_pairs") == sh1 * 15 + sh2 * 1,
      out(10).toString)
    assert(out(10).getAs[Double]("dropped_incidence_share") == 0.0)
    // cap 4 drops the df=6 family entirely
    assert(out(4).getAs[Long]("est_candidate_pairs") == sh2 * 1, out(4).toString)
    assert(out(4).getAs[Long]("n_shingles_dropped") == sh1)
    assert(out(4).getAs[Double]("dropped_incidence_share") ==
      r4(sh1 * 6.0 / (sh1 * 6 + sh2 * 2 + sh3)), out(4).toString)
    // cap 1 admits no pair at all
    assert(out(1).getAs[Long]("est_candidate_pairs") == 0L)
    // the forecast IS the capped join's enumeration count: replay the
    // q201 candidate join at cap 4 and count its output rows
    import graft.functions.TextFunctions.tokens
    val sets = Dedup.signatures(docs)
      .select(col("doc_id"), explode(col("shingles")).as("sh")).distinct()
    val rare = sets
      .join(sets.groupBy("sh").agg(count(lit(1)).as("df")), "sh")
      .filter(col("df") <= 4)
    val actual = rare.as("a")
      .join(rare.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .count()
    assert(actual == out(4).getAs[Long]("est_candidate_pairs"),
      s"forecast ${out(4)} vs actual join output $actual")
  }

  private def dayOrders128(revs: Seq[Double]) =
    revs.zipWithIndex.map { case (v, i) => ((i + 1).toLong, i, v) }
      .toDF("o_orderkey", "off", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(date_add(lit("2024-01-01"), col("off"))))
      .drop("off")

  private def prioOrders(rows: (Long, String, Double)*) =
    rows.toDF("o_orderkey", "o_orderpriority", "o_totalprice")
}
