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
}
