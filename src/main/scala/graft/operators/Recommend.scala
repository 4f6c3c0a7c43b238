package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.round

/** Recommender EVALUATION inside the engine — q92 builds the
  * co-purchase scores and q310/q245 rank graph neighbors, but none of
  * that says whether the recommendations are any good. This family
  * closes the loop with the standard offline protocol: hold out each
  * customer's LAST order, train on everything before it, recommend
  * top-k, and score hit-rate@k against what the held-out order actually
  * contained.
  *
  * Scale shape: the temporal split is one per-customer window (data-
  * proportional partitions); co-occurrence training is the q92 pair
  * expansion (Θ(Σ basket²), support-capped); candidate generation is
  * (customer train-part) ⋈ (part adjacency) — an equi-join whose fan-out
  * is bounded by the support filter exactly as in q192/q245; ranking is
  * a per-customer window; scoring is one semi-join. No driver-side
  * loops, no per-customer iteration.
  */
object Recommend {

  /** q326: leave-last-order-out hit-rate of the co-purchase
    * recommender. Returns one row: customers evaluated, hits at k=1 and
    * k=3, and the corresponding hit rates.
    *
    * A customer is EVALUATED when they have ≥2 orders (a train history
    * and a holdout) and ≥1 candidate recommendation; the holdout is the
    * last order by (o_orderdate, o_orderkey). Recommendation scores are
    * integer co-occurrence counts summed over the customer's train
    * parts — exact, so ranking with (score desc, part asc) tie-break is
    * engine-stable; already-bought train parts are anti-joined away
    * (recommending what you know they own is a free hit). */
  def lastOrderHitRate(
      orders: DataFrame,
      lineitem: DataFrame,
      minSupport: Long = 2,
      k: Int = 3): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_orderdate"), desc("o_orderkey"))
    val marked = orders
      .withColumn("rk", row_number().over(w))
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("cust"),
        (col("rk") === 1).as("is_holdout"))
    val lines = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("part"))
    val trainLines = lines.join(marked.filter(!col("is_holdout")), "ok")
      .select("cust", "ok", "part")
    val holdoutParts = lines.join(marked.filter(col("is_holdout")), "ok")
      .select("cust", "part").distinct()

    // co-occurrence adjacency from TRAIN orders only (both directions —
    // a recommendation flows from an owned part to its neighbor; r11:
    // Baskets single-shuffle form, same rows)
    val co = Baskets.pairCounts(trainLines.select("ok", "part"), "ok", "part")
      .filter(col("c") >= minSupport)
    val adj = co.select(col("pa").as("from"), col("pb").as("to"), col("c"))
      .unionAll(co.select(col("pb").as("from"), col("pa").as("to"), col("c")))

    val owned = trainLines.select("cust", "part").distinct()
    val candidates = owned
      .join(adj, col("part") === col("from"))
      .groupBy(col("cust"), col("to"))
      .agg(sum(col("c")).as("score"))
      .join(owned.withColumnRenamed("part", "to"), Seq("cust", "to"), "left_anti")
    val wc = Window.partitionBy("cust").orderBy(desc("score"), asc("to"))
    val ranked = candidates
      .withColumn("rnk", row_number().over(wc))
      .filter(col("rnk") <= k)

    // a hit at k: any of the top-k recs appears in the holdout order
    val hits = ranked
      .join(holdoutParts.withColumnRenamed("part", "to"), Seq("cust", "to"), "left_semi")
      .groupBy("cust").agg(min(col("rnk")).as("first_hit"))
    val evaluated = ranked.select("cust").distinct()
    evaluated
      .join(hits, Seq("cust"), "left")
      .agg(
        count(lit(1)).as("n_customers"),
        count(when(col("first_hit") === 1, 1)).as("hits_at_1"),
        count(when(col("first_hit").isNotNull, 1)).as("hits_at_k"))
      .select(
        col("n_customers"), col("hits_at_1"), col("hits_at_k"),
        round(col("hits_at_1").cast("double") / col("n_customers"), 4).as("hit_rate_1"),
        round(col("hits_at_k").cast("double") / col("n_customers"), 4).as("hit_rate_k"))
  }

  /** q343: recommendation COVERAGE and popularity-bias report — q326
    * says whether the recs hit; this says whether they span the catalog
    * or just re-rank the same bestsellers (the aggregate-diversity
    * readout a rec system is audited on): catalog coverage = share of
    * catalog parts that appear in ANY customer's top-k, and
    * concentration = share of all top-k slots taken by the 10 most-
    * recommended parts (popularity bias). Scores are integer
    * co-occurrence counts — ranking ties break on ids, engine-stable.
    *
    * Scale shape: the q92/q326 pair expansion (support-capped), one
    * equi-join candidate generation, per-customer top-k windows; the
    * report aggregates land on catalog- and customer-bounded frames. */
  def recCoverage(
      orders: DataFrame,
      lineitem: DataFrame,
      minSupport: Long = 2,
      k: Int = 3): DataFrame = {
    val lines = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("part"))
    val cust = orders.select(col("o_orderkey").as("ok"), col("o_custkey").as("cust"))
    val co = Baskets.pairCounts(lines, "ok", "part")
      .filter(col("c") >= minSupport)
    val adj = co.select(col("pa").as("from"), col("pb").as("to"), col("c"))
      .unionAll(co.select(col("pb").as("from"), col("pa").as("to"), col("c")))
    val owned = lines.join(cust, "ok").select("cust", "part").distinct()
    val candidates = owned
      .join(adj, col("part") === col("from"))
      .groupBy(col("cust"), col("to"))
      .agg(sum(col("c")).as("score"))
      .join(owned.withColumnRenamed("part", "to"), Seq("cust", "to"), "left_anti")
    val wc = Window.partitionBy("cust").orderBy(desc("score"), asc("to"))
    val topk = candidates
      .withColumn("rnk", row_number().over(wc))
      .filter(col("rnk") <= k)

    val perPart = topk.groupBy("to").agg(count(lit(1)).as("slots"))
    val wp = Window.orderBy(desc("slots"), asc("to"))
    val top10Slots = perPart
      .withColumn("pr", row_number().over(wp))
      .agg(
        sum(when(col("pr") <= 10, col("slots")).otherwise(0L)).as("top10_slots"),
        sum(col("slots")).as("total_slots"),
        count(lit(1)).as("n_rec_parts"))
    val scalars = owned.agg(countDistinct(col("cust")).as("n_customers"))
      .crossJoin(broadcast(lines.agg(countDistinct(col("part")).as("n_catalog"))))
      .crossJoin(broadcast(topk.agg(countDistinct(col("cust")).as("n_with_recs"))))
    scalars.crossJoin(broadcast(top10Slots))
      .select(
        col("n_customers"), col("n_with_recs"), col("n_catalog"), col("n_rec_parts"),
        col("total_slots"),
        round(col("n_with_recs") / col("n_customers").cast("double"), 4)
          .as("customer_share"),
        round(col("n_rec_parts") / col("n_catalog").cast("double"), 4).as("catalog_coverage"),
        round(col("top10_slots") / col("total_slots").cast("double"), 4)
          .as("top10_concentration"))
  }
}
