package graft

import graft.operators.{EventAnalytics, Similarity, StatTests, TextAnalysis}
import graft.sources.Tables

/** Ground truth for the pipeline-audit batch: TextRank keywords (q299),
  * sampled Kendall τ-b (q300), transition-rule audit (q304), embedding
  * QA (q308), duplicate-cluster size distribution (q309). */
class PipelineAuditSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) =
    rows.map { case (id, text) => (id, text, "en", "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("q299: hub word connected to everything outranks peripheral words") {
    // star graph: 'spark' adjacent to 4 distinct words; each peripheral
    // word touches only 'spark'
    val d = docs(Seq(
      (1L, "spark engine"), (2L, "spark cluster"),
      (3L, "spark shuffle"), (4L, "spark codegen")))
    val got = TextAnalysis.textRank(d).collect()
    assert(got.head.getAs[String]("keyword") === "spark")
    val scores = got.map(r => r.getAs[String]("keyword") -> r.getAs[Double]("textrank")).toMap
    assert(scores("spark") > scores("engine"))
    // symmetric peripherals tie exactly
    assert(scores("engine") === scores("cluster"))
  }

  test("q299: stopwords are excluded and never ranked") {
    val d = docs(Seq((1L, "the quick fox and the lazy dog")))
    val got = TextAnalysis.textRank(d).collect()
    assert(!got.exists(r => Seq("the", "and").contains(r.getAs[String]("keyword"))))
    // bridging works: removing 'the'/'and' makes quick-fox, fox-lazy adjacent
    assert(got.exists(_.getAs[String]("keyword") == "fox"))
  }

  test("q300: perfectly concordant sample gives tau_b = 1") {
    // x increasing with y increasing, unique values → no ties
    val li = (1 to 50).map(i => (i.toLong, i, i.toDouble, i.toDouble * 2))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val got = StatTests.kendallTau(li).head()
    assert(got.getAs[Long]("n_pairs") === 50L * 49 / 2)
    assert(got.getAs[Long]("discordant") === 0L)
    assert(got.getAs[Double]("tau_b") === 1.0)
  }

  test("q300: sign flip gives tau_b = -1; ties shrink the denominator") {
    val li = (1 to 40).map(i => (i.toLong, i, i.toDouble, -i.toDouble))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    assert(StatTests.kendallTau(li).head().getAs[Double]("tau_b") === -1.0)
    // constant y: every pair is a y-tie → tau undefined denominator 0 →
    // ANSI-safe? division by zero on double sqrt(0) → guard via values
    val li2 = (1 to 10).map(i => (i.toLong, i, i.toDouble, 7.0))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val r = StatTests.kendallTau(li2).head()
    assert(r.getAs[Long]("ties_y") === 45L)
  }

  test("q304: planted illegal transition is reported with its share") {
    val rows = Seq(
      (1L, "1997-01-01 00:00:01", 1L, "view"),
      (2L, "1997-01-01 00:00:02", 1L, "purchase"), // view>purchase NOT allowed
      (3L, "1997-01-01 00:00:03", 1L, "view"),     // purchase>view allowed
      (4L, "1997-01-01 00:00:04", 1L, "click"))    // view>click allowed
      .map { case (id, ts, uid, tpe) =>
        (id, java.sql.Timestamp.valueOf(ts), uid, tpe, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventAnalytics.transitionRuleAudit(rows).collect()
    assert(got.length === 1)
    assert(got(0).getAs[String]("prev_type") === "view")
    assert(got(0).getAs[String]("next_type") === "purchase")
    assert(got(0).getAs[Long]("n_violations") === 1L)
    assert(got(0).getAs[Double]("share_of_transitions") === 0.3333)
  }

  test("q308: planted zero, NaN, and outlier vectors are each counted") {
    val base = (1 to 60).map(i => (i.toLong, Array.fill(4)(1.0f), 0))
    val zero = Seq((61L, Array.fill(4)(0.0f), 0))
    val nan = Seq((62L, Array(Float.NaN, 1.0f, 1.0f, 1.0f), 0))
    val big = Seq((63L, Array.fill(4)(50.0f), 0)) // norm 100 vs cluster at 2
    val df = (base ++ zero ++ nan ++ big).toDF("vec_id", "embedding", "label")
    val got = Similarity.embeddingQa(df).head()
    assert(got.getAs[Long]("n_vecs") === 63L)
    assert(got.getAs[Long]("n_zero_norm") === 1L)
    assert(got.getAs[Long]("n_nonfinite") === 1L)
    assert(got.getAs[Long]("n_norm_outliers") >= 1L)
  }

  test("q309: hand-built cluster sizes histogram with corpus shares") {
    val d = docs(Seq(
      (1L, "aa"), (2L, "aa"), (3L, "aa"), // cluster of 3
      (4L, "bb"), (5L, "bb"),             // cluster of 2
      (6L, "cc")))                        // singleton
    val got = TextAnalysis.dupClusterDist(d).collect()
      .map(r => r.getAs[Long]("cluster_size") ->
        (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"), r.getAs[Double]("pct_docs")))
      .toMap
    assert(got(1L) === ((1L, 1L, 0.1667)))
    assert(got(2L) === ((1L, 2L, 0.3333)))
    assert(got(3L) === ((1L, 3L, 0.5)))
  }

  test("q299/q300/q304/q308/q309 run on the real tables") {
    val t = Tables(spark, sfDir)
    assert(TextAnalysis.textRank(t.documents).count() === 20L)
    val kt = StatTests.kendallTau(t.lineitem).head()
    assert(math.abs(kt.getAs[Double]("tau_b")) <= 1.0)
    assert(kt.getAs[Long]("n_pairs") === 500L * 499 / 2)
    EventAnalytics.transitionRuleAudit(t.events).collect() // runs; may be empty
    assert(Similarity.embeddingQa(t.embeddings).count() > 0L)
    val dist = TextAnalysis.dupClusterDist(t.documents).collect()
    val total = dist.map(_.getAs[Long]("n_docs")).sum
    assert(total === t.documents.count())
  }
}
