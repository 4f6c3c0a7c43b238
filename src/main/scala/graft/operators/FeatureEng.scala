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
}
