package graft

import graft.operators.{FeatureEng, TextAnalysis}

/** Ground truth for the feature-engineering / corpus-governance batch:
  * out-of-fold target encoding (q293), cross-source overlap matrix
  * (q294), Jensen–Shannon source divergence (q295), source data card
  * (q296). */
class FeatureCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String, String)]) =
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("q293: no row sees its own fold's target; shrink pulls toward the prior") {
    val orders = (1 to 200).map { i =>
      // segment A orders worth 100, segment B worth 300
      val cust = if (i % 2 == 0) 1L else 2L
      val price = if (cust == 1L) 100.0 else 300.0
      (i.toLong, cust, "O", price, java.sql.Timestamp.valueOf("1997-01-01 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "o_orderpriority")
    val customer = Seq((1L, "AUTO"), (2L, "BUILDING")).toDF("c_custkey", "c_mktsegment")
    val got = FeatureEng.targetEncodeOof(orders, customer).collect()
    // within a constant-valued segment the OOF mean is exact
    got.filter(_.getAs[String]("segment") == "AUTO").foreach { r =>
      assert(r.getAs[Double]("oof_mean") === 100.0)
      // prior excludes own fold but mixes both segments → strictly between
      val pr = r.getAs[Double]("oof_prior")
      assert(pr > 100.0 && pr < 300.0)
      // encoded shrinks the 100 toward the prior: 100 < enc < prior
      val enc = r.getAs[Double]("encoded")
      assert(enc > 100.0 && enc < pr)
    }
    // folds partition the rows: per-segment fold counts sum to segment size
    val nAuto = got.filter(_.getAs[String]("segment") == "AUTO")
      .map(_.getAs[Long]("n_rows")).sum
    assert(nAuto === 100L)
  }

  test("q294: hand-built overlap with one shared and one unique doc per source") {
    val d = docs(Seq(
      (1L, "shared doc body", "en", "web"),
      (2L, "only in web", "en", "web"),
      (3L, "shared doc body", "en", "books"),
      (4L, "only in books", "en", "books"),
      (5L, "third source alone", "en", "code")))
    val got = TextAnalysis.sourceOverlapMatrix(d).collect()
    assert(got.length === 3) // 3 source pairs, zero-overlap pairs included
    val bw = got.find(r => r.getAs[String]("source_a") == "books" &&
      r.getAs[String]("source_b") == "web").get
    assert(bw.getAs[Long]("n_shared") === 1L)
    assert(bw.getAs[Double]("fp_jaccard") === 0.3333) // 1/(2+2-1)
    val bc = got.find(r => r.getAs[String]("source_a") == "books" &&
      r.getAs[String]("source_b") == "code").get
    assert(bc.getAs[Long]("n_shared") === 0L)
    assert(bc.getAs[Double]("fp_jaccard") === 0.0)
  }

  test("q294: whitespace-normalized fingerprints collapse formatting variants") {
    val d = docs(Seq(
      (1L, "Hello   World", "en", "a"),
      (2L, "hello world", "en", "b")))
    val got = TextAnalysis.sourceOverlapMatrix(d).collect()
    assert(got.head.getAs[Long]("n_shared") === 1L)
  }

  test("q295: identical sources diverge by 0, disjoint sources by 1 bit") {
    val same = docs(Seq(
      (1L, "alpha beta gamma", "en", "a"),
      (2L, "alpha beta gamma", "en", "b")))
    val g1 = TextAnalysis.jsDivergence(same).collect()
    // each source IS half the corpus with the same distribution → JS = 0
    g1.foreach(r => assert(math.abs(r.getAs[Double]("js_bits")) < 1e-9))

    val disjoint = docs(Seq(
      (1L, "aa bb cc", "en", "a"),
      (2L, "xx yy zz", "en", "b")))
    val g2 = TextAnalysis.jsDivergence(disjoint).collect()
    // source vs corpus where corpus is a 50/50 blend: JS(P, (P+Q)/2-ish)
    // is strictly between 0 and 1 bit; both sources symmetric
    val v = g2.map(_.getAs[Double]("js_bits"))
    assert(v.length === 2 && math.abs(v(0) - v(1)) < 1e-9)
    assert(v.forall(x => x > 0.2 && x < 1.0))
    assert(g2.forall(_.getAs[Long]("vocab_size") === 3L))
  }

  test("q296: data card aggregates the hand-built corpus correctly") {
    val d = docs(Seq(
      (1L, "one two three", "en", "web"),
      (2L, "one two three", "en", "web"), // exact dup
      (3L, "vier funf", "de", "web"),
      (4L, "sechs sieben acht", "de", "books")))
    val got = TextAnalysis.sourceDataCard(d).collect()
    val web = got.find(_.getAs[String]("source") == "web").get
    assert(web.getAs[Long]("n_docs") === 3L)
    assert(web.getAs[Long]("total_tokens") === 8L)
    assert(web.getAs[Long]("n_langs") === 2L)
    assert(web.getAs[String]("top_lang") === "en")
    assert(web.getAs[Double]("top_lang_share") === 0.6667)
    assert(web.getAs[Double]("dup_rate") === 0.3333) // 2 distinct fp / 3 docs
    val books = got.find(_.getAs[String]("source") == "books").get
    assert(books.getAs[Double]("dup_rate") === 0.0)
  }

  test("q293-q296 run on the real tables with sane shapes") {
    val t = sources.Tables(spark, sfDir)
    val te = FeatureEng.targetEncodeOof(t.orders, t.customer).collect()
    assert(te.nonEmpty && te.forall(_.getAs[Double]("encoded") > 0.0))
    val ov = TextAnalysis.sourceOverlapMatrix(t.documents).collect()
    val nSrc = t.documents.select("source").distinct().count()
    assert(ov.length === (nSrc * (nSrc - 1) / 2).toInt)
    val js = TextAnalysis.jsDivergence(t.documents).collect()
    assert(js.forall { r =>
      val b = r.getAs[Double]("js_bits"); b >= -1e-9 && b <= 1.0 + 1e-9
    })
    val dc = TextAnalysis.sourceDataCard(t.documents).collect()
    assert(dc.length === nSrc.toInt)
    assert(dc.forall { r =>
      val d = r.getAs[Double]("dup_rate"); d >= 0.0 && d <= 1.0
    })
  }
}
