package graft

import graft.operators.Classify
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Semantic invariants of the q320/q321/q325 classification family —
  * properties the DuckDB oracle equality can't state. */
class ClassifySpec extends SparkSpec {
  lazy val t = Tables(spark, sfDir)

  test("q320: confusion matrix is a partition of the holdout docs") {
    val conf = Classify.naiveBayesLang(t.documents).cache()
    val total = conf.agg(sum("n_docs")).first().getLong(0)
    val holdout = t.documents.filter(col("doc_id") % 5 === 0).count()
    assert(total == holdout, s"confusion covers $total of $holdout holdout docs")
    // predicted labels come from the fixed class set
    val preds = conf.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("de", "en", "es", "fr", "zh")))
    conf.unpersist(blocking = false)
  }

  test("q320: planted disjoint vocabularies classify perfectly") {
    // the sf corpora carry lang labels that are (by construction) nearly
    // independent of the shared token pool, so accuracy there only
    // measures priors; the NB MATH is asserted on a planted corpus where
    // each class owns a disjoint vocabulary — confusion must be diagonal
    import spark.implicits._
    val langs = Seq("de", "en", "es", "fr", "zh")
    val docs = (for {
      (l, i) <- langs.zipWithIndex
      j <- 0 until 10
    } yield {
      val words = Seq(s"w${i}a", s"w${i}b", s"w${i}c", s"w${i}a")
      ((i * 10 + j).toLong, words.mkString(" "), l, "src", 10L)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    val conf = Classify.naiveBayesLang(docs).collect()
    assert(conf.forall(r => r.getString(0) == r.getString(1)),
      s"off-diagonal confusion on disjoint vocabularies: ${conf.mkString("; ")}")
    assert(conf.map(_.getAs[Long]("n_docs")).sum == 10L,
      "each lang contributes its two doc_id%5==0 holdout docs")
  }

  test("q320: prior-only prediction when the holdout doc's tokens are all unseen") {
    // a holdout doc of entirely novel tokens must fall back to the
    // class-floor scores: argmax(prior + T·ln(α/(N_c+αV))) — computable
    // by hand when one class dominates the training mass
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a", "en", "s", 7L), (2L, "a a a a", "en", "s", 7L),
      (3L, "a a a a", "en", "s", 7L), (4L, "b", "fr", "s", 1L),
      (0L, "zzz", "en", "s", 3L) // holdout: token unseen in training
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val conf = Classify.naiveBayesLang(docs).collect()
    assert(conf.length == 1)
    // en: prior 3/4, floor ln(1/(12+2)); fr: prior 1/4, floor ln(1/(1+2))
    // score_en = ln(.75) - ln(14) = -2.927; score_fr = ln(.25) - ln(3) = -2.485
    // → the rarer-but-smaller-vocab class wins: a true NB floor, not a
    // majority-class shortcut
    assert(conf.head.getAs[String]("pred_lang") == "fr",
      s"floor scoring must dominate the prior here, got ${conf.head}")
  }

  test("q321: metric ranges — AUC in [0,1], Brier in [0,1], ECE in [0,1], logloss > 0") {
    val r = Classify.modelEval(t.orders, t.lineitem).first()
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0, s"auc=$auc")
    val brier = r.getAs[Double]("brier")
    assert(brier >= 0.0 && brier <= 1.0, s"brier=$brier")
    val ece = r.getAs[Double]("ece")
    assert(ece >= 0.0 && ece <= 1.0, s"ece=$ece")
    assert(r.getAs[Double]("logloss") > 0.0)
    assert(r.getAs[Long]("n_pos") > 0 && r.getAs[Long]("n_pos") < r.getAs[Long]("n_orders"))
  }

  test("q321: AUC of a label-independent ranker sits near 1/2; a perfect ranker hits 1") {
    // AUC is computed from ranks of o_totalprice — on a synthetic frame
    // where the label IS the top half by price, the same rank-sum
    // machinery must return exactly 1.0
    import spark.implicits._
    val perfect = (1 to 100).map(i => (i.toLong, i * 10.0, "x")).toDF(
      "o_orderkey", "o_totalprice", "o_orderstatus")
    val li = (51 to 100).map(i => (i.toLong, "R")).toDF("l_orderkey", "l_returnflag")
    val r = Classify.modelEval(perfect, li).first()
    assert(r.getAs[Double]("auc") == 1.0, s"perfect separation must give AUC 1.0, got $r")
  }

  test("q321: tie correction — constant scores give AUC exactly 1/2") {
    import spark.implicits._
    val flat = (1 to 100).map(i => (i.toLong, 42.0, "x")).toDF(
      "o_orderkey", "o_totalprice", "o_orderstatus")
    val li = (1 to 30).map(i => (i.toLong, "R")).toDF("l_orderkey", "l_returnflag")
    val r = Classify.modelEval(flat, li).first()
    assert(r.getAs[Double]("auc") == 0.5,
      s"all-tied scores must average to AUC 0.5 via the tie correction, got $r")
  }

  test("q325: deciles partition the orders; capture is monotone and ends at 1") {
    val rows = Classify.liftTable(t.orders, t.lineitem).orderBy("decile").collect()
    assert(rows.length == 10)
    val totalOrders = rows.map(_.getAs[Long]("n_orders")).sum
    assert(totalOrders == t.orders.count())
    // exact-ntile fill rule: sizes differ by at most 1
    val sizes = rows.map(_.getAs[Long]("n_orders"))
    assert(sizes.max - sizes.min <= 1, s"ntile sizes ${sizes.mkString(",")}")
    val captures = rows.map(_.getAs[Double]("cum_capture"))
    assert(captures.zip(captures.tail).forall { case (a, b) => a <= b }, "capture not monotone")
    assert(math.abs(captures.last - 1.0) < 1e-9)
  }
}
