package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.round

/** ML feature-engineering operators over warehouse tables — the
  * deterministic, leakage-aware encodings a training pipeline derives
  * from fact data before model fitting. */
object FeatureEng {

  /** q293: out-of-fold smoothed target encoding of the customer market
    * segment against order value — the leakage-correct way to turn a
    * categorical into a numeric feature: each fold's encoding is
    * computed ONLY from the other folds (a row never sees its own
    * target), and the James-Stein-style shrink toward the out-of-fold
    * global mean (weight m) keeps rare categories from memorizing
    * noise. The fold split is a deterministic md5 hash of the order key
    * (q55's sampling idiom) — stable across engines and reruns, so the
    * same row always lands in the same fold.
    *
    * Scale shape: one fact-proportional join (customer dim broadcast-
    * able) + one groupBy into #segments × #folds cells; every encoding
    * after that is window arithmetic on the bounded cell frame. The
    * encode-side join back to fact rows (not materialized here — the
    * cell table IS the feature map) is a broadcast of that same tiny
    * frame. */
  def targetEncodeOof(
      orders: DataFrame,
      customer: DataFrame,
      folds: Int = 5,
      m: Double = 20.0): DataFrame = {
    val base = orders
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(
        col("c_mktsegment").as("segment"),
        // hex-digit value of the first md5 char, mod folds; expr() form
        // because the DataFrame `instr` helper only takes a literal
        // needle, while the SQL function accepts two expressions
        (expr("instr('0123456789abcdef', substring(md5(cast(o_orderkey AS string)), 1, 1)) - 1")
          % lit(folds)).cast("int").as("fold"),
        col("o_totalprice").as("y"))
    val cells = base.groupBy("segment", "fold")
      .agg(sum("y").as("s"), count(lit(1)).as("cnt"))
    val wSeg = Window.partitionBy("segment")
    val wAll = Window.partitionBy(lit(1)) // bounded: segments × folds cells
    cells
      .withColumn("seg_s", sum("s").over(wSeg))
      .withColumn("seg_n", sum("cnt").over(wSeg))
      .withColumn("tot_s", sum("s").over(wAll))
      .withColumn("tot_n", sum("cnt").over(wAll))
      // everything OUT-OF-FOLD: own-fold sums subtracted before dividing
      .withColumn("oof_mean", (col("seg_s") - col("s")) / (col("seg_n") - col("cnt")))
      .withColumn("prior",
        (col("tot_s") - col("s")) / (col("tot_n") - col("cnt")))
      .withColumn("w", (col("seg_n") - col("cnt")).cast("double"))
      .select(
        col("segment"), col("fold"), col("cnt").as("n_rows"),
        round(col("oof_mean"), 4).as("oof_mean"),
        round(col("prior"), 4).as("oof_prior"),
        round((col("w") * col("oof_mean") + lit(m) * col("prior"))
          / (col("w") + lit(m)), 4).as("encoded"))
      .orderBy("segment", "fold")
  }

  /** q426: weight-of-evidence (WOE) binning + information value — the
    * credit-scoring feature-screening primitive: bucket a continuous
    * feature (order value, fixed-width bins), and per bin report
    * WOE = ln(P(bin|pos)/P(bin|neg)) with Laplace-smoothed counts plus
    * the bin's information-value term (Σ iv_term = the feature's IV,
    * the "is this feature worth encoding at all" screen). Label: the
    * order contains at least one returned line.
    *
    * Scale shape: one semi-join-shaped label probe (distinct returned
    * orderkeys, data-proportional equi-join), one groupBy into ≤nBins
    * rows, totals via the 1-row broadcast scalar idiom — everything
    * after the bin aggregate is arithmetic on a ≤nBins frame. */
  def woeIv(
      orders: DataFrame,
      lineitem: DataFrame,
      binWidth: Double = 50000.0,
      nBins: Int = 10): DataFrame = {
    val returned = lineitem
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o_orderkey"))
      .distinct()
      .withColumn("is_ret", lit(1))
    val labeled = orders
      .join(returned, Seq("o_orderkey"), "left")
      .select(
        least(floor(col("o_totalprice") / lit(binWidth)), lit(nBins - 1).cast("double"))
          .cast("int").as("bin"),
        coalesce(col("is_ret"), lit(0)).as("pos"))
    val bins = labeled
      .groupBy("bin")
      .agg(count(lit(1)).as("n_orders"), sum(col("pos")).as("n_pos"))
      .withColumn("n_neg", col("n_orders") - col("n_pos"))
    val tot = bins.agg(
      sum("n_pos").as("tot_pos"),
      sum("n_neg").as("tot_neg"))
    // smoothed log-odds evidence; iv_term multiplies the UNROUNDED woe
    val woe = log(
      ((col("n_pos") + lit(0.5)) / col("tot_pos")) /
        ((col("n_neg") + lit(0.5)) / col("tot_neg")))
    bins
      .crossJoin(broadcast(tot))
      .select(
        col("bin"), col("n_orders"), col("n_pos"), col("n_neg"),
        round(woe, 4).as("woe"),
        round(
          (col("n_pos").cast("double") / col("tot_pos")
            - col("n_neg").cast("double") / col("tot_neg")) * woe, 4).as("iv_term"))
      .orderBy("bin")
  }
}
