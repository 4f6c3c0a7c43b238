package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.round
import graft.functions.TextFunctions.tokens

/** Supervised-classification primitives over warehouse tables — the
  * "train a baseline model inside the engine" family that rounds out
  * the training-data toolkit (dedup, curation, sampling) with the model
  * side: a multinomial Naive Bayes text classifier, threshold-free
  * ranking metrics (ROC-AUC / Brier / log-loss / calibration), and the
  * decile lift table every campaign-targeting readout is built on.
  *
  * Scale shape shared by all three: model STATE is vocabulary- or
  * class-sized (a word-level vocab fits in a broadcast even at 100 TB
  * of documents; class priors are a handful of rows), so training is
  * data-proportional aggregation down to small state, and scoring is a
  * broadcast join back over the data — no per-row driver work, no
  * iteration. Ranking metrics ride the [[GlobalOrder]] range-bucket
  * machinery so the global sort every AUC formula assumes never plans
  * a data-sized single reducer.
  */
object Classify {

  /** The five language labels the synthetic corpus carries, in the
    * alphabetical order used for score tie-breaks. */
  private val Langs = Seq("de", "en", "es", "fr", "zh")

  /** q320: multinomial Naive Bayes language classifier, trained and
    * evaluated inside the engine on a deterministic hash split
    * (doc_id % 5 == 0 is the holdout). Returns the holdout confusion
    * matrix (true lang × predicted lang × doc count).
    *
    * Training is two data-proportional aggregates down to MODEL-sized
    * state: per-(class, term) token counts with add-α smoothing
    * (vocabulary-sized) and per-class token/doc totals (5 rows).
    * Scoring joins test-doc term frequencies against the BROADCAST
    * model — the join key is the term, so the fact-side shuffle is the
    * tf aggregate only — and handles unseen (class, term) pairs in
    * closed form: with M(d,c) = matched token mass, the remaining
    * T_d − M(d,c) tokens each contribute the class floor
    * ln(α/(N_c+αV)), so absent pairs never need materializing. The
    * per-doc argmax is a 5-row window partitioned by doc — bounded by
    * the label set, not the data. */
  def naiveBayesLang(documents: DataFrame, alpha: Double = 1.0): DataFrame =
    nbPredictions(documents, alpha, Seq("lang" -> "true_lang"))
      .groupBy(col("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("true_lang", "pred_lang")
      .localCheckpoint(eager = true) // ≤|classes|² rows

  /** Shared NB scoring core: train on the doc_id%5≠0 split, score the
    * holdout, return one row per holdout doc with its argmax class.
    * `carry` threads extra document columns (source, lang) through to
    * the prediction frame — q320 aggregates to the confusion matrix,
    * q435 slices the same predictions by source for the fairness
    * audit, and both MUST read the identical model or the audit lies. */
  private def nbPredictions(
      documents: DataFrame,
      alpha: Double,
      carry: Seq[(String, String)]): DataFrame = {
    val carried = carry.map { case (in, out) => col(in).as(out) }
    val carriedNames = carry.map(_._2)
    val tok = documents.select(
      (Seq(col("doc_id"), col("lang")) ++ carried :+ explode(tokens(col("text"))).as("term")): _*)

    // ONE training explode pass, aggregated straight to the vocab-sized
    // (class, term) count table; every other training statistic (class
    // token mass, vocabulary size) derives from THIS — the fact-sized
    // token stream is never re-scanned. It feeds three
    // consumers, which AQE's ReuseExchange dedupes inside the single
    // job the eager checkpoint at the end creates (explicit cache()
    // measured neutral-to-slower here — the q310 tradeoff).
    val cnts = tok.filter(col("doc_id") % 5 =!= 0)
      .groupBy(col("lang").as("c"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val classTok = cnts.groupBy("c").agg(sum(col("cnt")).as("n_tok"))
    val vocabSize = cnts.select(col("term")).distinct()
      .agg(count(lit(1)).as("v")) // 1 row
    // doc-count priors come off the documents scan (no explode)
    val classDoc = documents.filter(col("doc_id") % 5 =!= 0)
      .groupBy(col("lang").as("c")).agg(count(lit(1)).as("n_doc"))
    val nTrainDocs = documents.filter(col("doc_id") % 5 =!= 0)
      .agg(count(lit(1)).as("n_train")) // 1 row
    val classStats = classTok.join(classDoc, "c")
      .crossJoin(broadcast(nTrainDocs)).crossJoin(broadcast(vocabSize))
      .select(
        col("c"),
        log(col("n_doc").cast("double") / col("n_train")).as("log_prior"),
        (col("n_tok").cast("double") + lit(alpha) * col("v")).as("denom"))

    // observed-(class, term) log-likelihoods — vocabulary-sized
    val obs = cnts
      .join(broadcast(classStats), "c")
      .select(col("c"), col("term"),
        log((col("cnt") + lit(alpha)) / col("denom")).as("logp"))

    // ONE holdout explode pass down to (doc, term) tf grain — the
    // matched-mass join and the per-doc totals share its exchange
    val testTf = tok.filter(col("doc_id") % 5 === 0)
      .groupBy((col("doc_id") +: carriedNames.map(col) :+ col("term")): _*)
      .agg(count(lit(1)).as("tf"))
    val matched = testTf
      .join(broadcast(obs), "term")
      .groupBy(col("doc_id"), col("c"))
      .agg(sum(col("tf") * col("logp")).as("s_obs"), sum(col("tf")).as("m"))

    // full doc × class grid (explode of the literal label set), so a
    // class matching ZERO of a doc's terms still scores (all-floor)
    val docTotals = testTf.groupBy((col("doc_id") +: carriedNames.map(col)): _*)
      .agg(sum(col("tf")).as("t_d"))
    val grid = docTotals
      .withColumn("c", explode(array(Langs.map(lit): _*)))
      .join(matched, Seq("doc_id", "c"), "left")
      .join(broadcast(classStats), "c")
      .withColumn("score",
        col("log_prior") + coalesce(col("s_obs"), lit(0.0)) +
          (col("t_d") - coalesce(col("m"), lit(0L))) * log(lit(alpha) / col("denom")))

    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("c"))
    grid
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select((col("doc_id") +: carriedNames.map(col) :+ col("c").as("pred_lang")): _*)
  }

  /** q435: FAIRNESS-SLICE audit of the q320 classifier — the "is the
    * model equally good for every slice" readout a model card needs:
    * per source (the sensitive grouping), holdout accuracy, the share
    * of docs predicted 'en' (demographic parity on the majority
    * label), and each slice's accuracy gap vs the overall holdout
    * accuracy, flagged past a disparity threshold on the ROUNDED gap.
    * Reads the IDENTICAL predictions as q320 (shared scoring core) —
    * an audit of a different model would be no audit at all. Slice
    * stats are a #sources aggregate + one 1-row overall scalar. */
  def fairnessSlices(
      documents: DataFrame,
      alpha: Double = 1.0,
      gapFlag: Double = 0.1): DataFrame = {
    val preds = nbPredictions(
      documents, alpha, Seq("lang" -> "true_lang", "source" -> "source"))
      .withColumn("correct",
        when(col("pred_lang") === col("true_lang"), 1.0).otherwise(0.0))
      .withColumn("pred_en", when(col("pred_lang") === "en", 1.0).otherwise(0.0))
    val overall = preds.agg(avg(col("correct")).as("overall_acc"))
    // overall_acc is a broadcast constant; max() carries it through the agg
    val gap = round(avg(col("correct")) - max(col("overall_acc")), 4)
    preds
      .crossJoin(broadcast(overall))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("correct")), 4).as("accuracy"),
        round(avg(col("pred_en")), 4).as("en_share"),
        gap.as("acc_gap"),
        (abs(gap) > lit(gapFlag)).as("disparity_flag"))
      .orderBy("source")
  }

  /** Orders labeled by "contains a returned line" with a logistic
    * score over standardized order value — the shared input of
    * q321/q325. The label is a distinct-projected semi-join flag; the
    * score's μ/σ are 1-row broadcast scalars. The score exists to be a
    * deterministic, mildly-informative ranker; the POINT is the metric
    * machinery downstream, which accepts any (p, y) column pair. */
  private[graft] def scoredOrders(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val returned = lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("rk")).distinct()
    val stats = orders.agg(
      avg(col("o_totalprice")).as("mu"),
      stddev_samp(col("o_totalprice")).as("sd"))
    orders
      .join(returned, col("o_orderkey") === col("rk"), "left")
      .crossJoin(broadcast(stats))
      .select(
        col("o_orderkey"), col("o_totalprice"),
        when(col("rk").isNotNull, 1).otherwise(0).as("y"),
        // σ=0 (constant feature) guarded in a lazy CaseWhen — Spark 4
        // ANSI throws DIVIDE_BY_ZERO even on doubles; an uninformative
        // feature scores a flat 1/2
        when(col("sd") === 0.0, lit(0.5))
          .otherwise(lit(1.0) / (lit(1.0) +
            exp(-(col("o_totalprice") - col("mu")) / col("sd")))).as("p"))
  }

  /** q321: threshold-free evaluation of a probabilistic classifier —
    * ROC-AUC (tie-corrected rank-sum), Brier score, log-loss, and
    * expected calibration error over 10 equal-width probability bins,
    * in one row.
    *
    * AUC ranks by the RAW feature (o_totalprice) rather than the
    * logistic score: AUC is invariant under strictly-monotone
    * transforms, and ranking the stored column keeps the global order
    * bit-identical across engines (no float-function ulps near ties).
    * Ranks come from [[GlobalOrder.withGlobalRowNumber]] — range-bucket
    * partitioned, no data-sized single-reducer sort — and tie groups
    * collapse to their average rank via one aggregate on the tie key
    * (min(rn) + (n−1)/2 is the mean of a consecutive integer run).
    * Brier / log-loss / ECE are single-pass aggregates; the ECE bin
    * frame is 10 rows. */
  def modelEval(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    // scored feeds four consumers and ranked two; the shared shuffle
    // subtrees dedupe via AQE ReuseExchange inside the single job the
    // eager checkpoint creates (explicit cache() measured neutral here,
    // and a cache boundary would block broadcast re-planning)
    val scored = scoredOrders(orders, lineitem)
    val ranked = GlobalOrder.withGlobalRowNumber(
      scored, col("o_totalprice"), Seq("o_totalprice", "o_orderkey"), rnCol = "rn")
    // average rank of each price tie-group (AUC's tie correction)
    val avgRank = ranked
      .groupBy("o_totalprice")
      .agg(min(col("rn")).as("rmin"), count(lit(1)).as("tn"))
      .select(col("o_totalprice"),
        (col("rmin") + (col("tn") - 1) / lit(2.0)).as("arank"))
    val withRank = ranked.join(avgRank, "o_totalprice")

    val auc = withRank.agg(
      sum(when(col("y") === 1, col("arank"))).as("rpos"),
      sum(col("y")).as("npos"),
      count(lit(1)).as("n"))
      .select(col("n"), col("npos"),
        // one-class degenerate frame (n⁺·n⁻ = 0): AUC is undefined;
        // report the chance value 1/2 instead of dividing by zero
        when(col("npos") === 0 || col("npos") === col("n"), lit(0.5))
          .otherwise((col("rpos") - col("npos") * (col("npos") + 1) / lit(2.0)) /
            (col("npos") * (col("n") - col("npos")))).as("auc_raw"))

    val pointwise = scored.agg(
      avg(pow(col("p") - col("y"), 2)).as("brier_raw"),
      avg(-(col("y") * log(col("p")) + (lit(1) - col("y")) * log(lit(1.0) - col("p"))))
        .as("logloss_raw"))

    val ece = scored
      .withColumn("bin", least(floor(col("p") * 10), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("nb"), avg(col("p")).as("pb"), avg(col("y")).as("yb"))
      .agg(sum(col("nb") * abs(col("pb") - col("yb"))).as("gap"), sum(col("nb")).as("nt"))
      .select((col("gap") / col("nt")).as("ece_raw"))

    val out = auc.crossJoin(broadcast(pointwise)).crossJoin(broadcast(ece))
      .select(
        col("n").as("n_orders"), col("npos").as("n_pos"),
        round(col("auc_raw"), 6).as("auc"),
        round(col("brier_raw"), 6).as("brier"),
        round(col("logloss_raw"), 6).as("logloss"),
        round(col("ece_raw"), 6).as("ece"))
      .localCheckpoint(eager = true) // 1 row
    out
  }

  /** q325: decile lift table of the order-value ranker against the
    * returned-line label — the campaign-targeting readout ("the top
    * decile captures X% of all returns, lift Y"). Deciles are EXACT
    * ntile buckets over descending score from
    * [[GlobalOrder.withExactNtile]] (range-bucketed, bit-identical to
    * the single-reducer SQL window); per-decile rates, cumulative
    * capture, and lift then ride a 10-row frame. */
  def liftTable(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    // ranking by the raw feature (descending) — the logistic transform
    // is rank-preserving, so the μ/σ pass q321 needs is skipped here
    val returned = lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("rk")).distinct()
    val scored = orders
      .join(returned, col("o_orderkey") === col("rk"), "left")
      .select(
        col("o_orderkey"),
        when(col("rk").isNotNull, 1).otherwise(0).as("y"),
        (-col("o_totalprice")).as("negp"))
    val tiled = GlobalOrder.withExactNtile(
      scored, col("negp"), Seq("negp", "o_orderkey"), buckets = 10, outCol = "decile")
    val ten = Window.partitionBy(lit(1)) // folds away; 10-row frame
    tiled
      .groupBy("decile")
      .agg(count(lit(1)).as("n_orders"), sum(col("y")).as("n_pos"))
      .withColumn("tot_pos", sum(col("n_pos")).over(ten))
      .withColumn("tot_n", sum(col("n_orders")).over(ten))
      .withColumn("cum_pos",
        sum(col("n_pos")).over(ten.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(
        // long: the oracle's ntile() yields BIGINT and the driver's
        // value hash is dtype-sensitive
        col("decile").cast("long").as("decile"), col("n_orders"), col("n_pos"),
        round(col("n_pos") / col("n_orders").cast("double"), 4).as("pos_rate"),
        round(col("cum_pos") / col("tot_pos").cast("double"), 4).as("cum_capture"),
        round((col("n_pos") / col("n_orders").cast("double")) /
          (col("tot_pos") / col("tot_n").cast("double")), 4).as("lift"))
      .orderBy("decile")
  }

  /** q335: ISOTONIC calibration (pool-adjacent-violators) of the order
    * value ranker against the returned-line label — the calibration
    * layer between q320/q321's raw scores and a deployable probability:
    * PAVA finds the monotone-nondecreasing fit minimizing weighted
    * squared error, the standard post-hoc calibrator when the score is
    * rank-good but probability-poor (exactly what q321's ECE measures).
    *
    * Spark-first shape: the data-sized work is binning — exact score
    * ntiles from [[GlobalOrder.withExactNtile]] (range-bucketed, no
    * single-reducer sort) and one per-bin aggregate; PAVA itself runs
    * driver-side over the BIN frame (`bins` (n, ȳ) pairs — bounded by
    * construction, the q149/q329 driver-fold discipline), which is the
    * exact solution to the binned problem at any corpus size.
    * Rows-only surface: the PAVA recursion isn't SQL-expressible, so
    * correctness rides the hand-traced ScalaTest (violator pooling,
    * weighted means, monotone output, calibration-preserving mass). */
  def isotonicCalibration(
      orders: DataFrame,
      lineitem: DataFrame,
      bins: Int = 20): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val scored = scoredOrders(orders, lineitem)
    // the logistic transform is monotone in the raw feature, so binning
    // by o_totalprice bins by score with engine-stable ordering
    val binned = GlobalOrder.withExactNtile(
      scored, col("o_totalprice"), Seq("o_totalprice", "o_orderkey"), bins, "bin")
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), avg(col("p")).as("p_mean"), avg(col("y")).as("y_rate"))
      .orderBy("bin")
      .collect()
      .map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n"),
        r.getAs[Double]("p_mean"), r.getAs[Double]("y_rate")))
    // PAVA: maintain a stack of blocks (weight, weighted-mean); merge
    // while the tail violates monotonicity. O(bins) — driver math.
    case class Block(w: Double, mean: Double, span: Int)
    val blocks = binned.foldLeft(List.empty[Block]) { case (acc, (_, n, _, y)) =>
      var st = Block(n.toDouble, y, 1) :: acc
      while (st.tail.nonEmpty && st.tail.head.mean > st.head.mean + 1e-15) {
        val a :: b :: rest = st: @unchecked
        st = Block(a.w + b.w, (a.w * a.mean + b.w * b.mean) / (a.w + b.w), a.span + b.span) :: rest
      }
      st
    }.reverse
    val iso = blocks.flatMap(b => List.fill(b.span)(b.mean))
    val r4 = (x: Double) => math.floor(x * 10000 + 0.5) / 10000
    binned.zip(iso).map { case ((bin, n, pm, yr), cal) =>
      (bin.toLong, n, r4(pm), r4(yr), r4(cal))
    }.toSeq.toDF("bin", "n", "p_mean", "raw_rate", "iso_rate")
      .orderBy("bin")
  }

  /** q428: uplift-by-decile table — the campaign-targeting readout for
    * incrementality: users ranked by a targeting score (pre-outcome
    * engagement: view count), split into score deciles, and per decile
    * the treated-vs-control conversion gap. A well-targeted model shows
    * uplift concentrated in the top deciles; a flat table means the
    * score doesn't identify persuadables. Arms are the md5-parity
    * assignment shared with q171/q394 (same users, same arms, any
    * engine); deciles come from [[GlobalOrder.withExactNtile]] so the
    * global score ranking never plans a data-sized single partition and
    * reproduces SQL's ntile fill rule bit-for-bit.
    *
    * Scale shape: one user-grain aggregate (map-side partial) then the
    * range-bucketed ntile; everything after is a ≤buckets-row frame. */
  def upliftDeciles(events: DataFrame, buckets: Int = 10): DataFrame = {
    val users = events
      .groupBy("user_id")
      .agg(
        count(when(col("event_type") === "view", 1)).as("score"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      .withColumn("arm", Relational.hashArm(col("user_id")))
      .withColumn("neg_score", -col("score"))
    val ranked = GlobalOrder.withExactNtile(
      users, col("neg_score"), Seq("neg_score", "user_id"), buckets, "decile")
    val rateT = col("conv_t").cast("double") / col("n_t")
    val rateC = col("conv_c").cast("double") / col("n_c")
    ranked
      .groupBy("decile")
      .agg(
        count(when(col("arm") === "A", 1)).as("n_t"),
        count(when(col("arm") === "B", 1)).as("n_c"),
        sum(when(col("arm") === "A", col("conv")).otherwise(0)).as("conv_t"),
        sum(when(col("arm") === "B", col("conv")).otherwise(0)).as("conv_c"))
      .select(
        col("decile"), col("n_t"), col("n_c"), col("conv_t"), col("conv_c"),
        round(when(col("n_t") > 0, rateT), 4).as("rate_t"),
        round(when(col("n_c") > 0, rateC), 4).as("rate_c"),
        round(when(col("n_t") > 0 && col("n_c") > 0, rateT - rateC), 4).as("uplift"))
      .orderBy("decile")
  }
}
