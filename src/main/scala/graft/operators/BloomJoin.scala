package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableRound.round
import graft.functions.SketchFunctions

/** Bloom-pruned fact⋈dim join — the hand-rolled runtime filter.
  *
  * When a join's build side is SELECTIVE (a filtered dim) but still too
  * big or too late-known for static partition pruning, the scalable move
  * is to ship a Bloom filter of its join keys to the probe side and drop
  * non-matching fact rows AT THE SCAN, before the join's exchange: the
  * shuffle then carries `selectivity + fpp` of the fact table instead of
  * all of it. Engines do this internally (Spark's own
  * `runtimeFilter.bloomFilter` injects the same shape); graft exposes it
  * as a composable operator over its own [[graft.plans.BloomSketch]]
  * aggregate so the filter can also be PERSISTED (the zone-map/sketch
  * table path) and reused across queries, which the engine-internal
  * runtime filter cannot.
  *
  * Correctness never depends on the filter: Bloom filters have no false
  * negatives, and the exact join that follows removes the fpp false
  * positives — so the DuckDB oracle is the plain join, and the filter
  * only sheds shuffle volume. Cost: one aggregation pass over the
  * (already filtered, dim-sized) build side to build a KB–MB filter held
  * as a plan literal, probed inside whole-stage codegen on the fact
  * scan. */
object BloomJoin {

  /** Prune `fact` rows on `factKey` against a filter built from
    * `build`'s `buildKey` column. Returns the pruned fact — exact-join
    * it afterwards. `expectedItems` sizes the filter; it is counted from
    * the build side when not given (one extra dim-sized pass). */
  def prunedFact(
      fact: DataFrame,
      factKey: String,
      build: DataFrame,
      buildKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    val expected = if (expectedItems > 0) expectedItems else math.max(build.count(), 1L)
    val bytes = build
      .agg(SketchFunctions.bloomSketch(col(buildKey), expected, fpp))
      .head().getAs[Array[Byte]](0)
    fact.filter(SketchFunctions.bloomMightContain(bytes, col(factKey)))
  }

  /** q151: revenue of lineitems belonging to urgent open orders, joined
    * through the bloom-pruned path. The order subset is ~1/10 of the dim
    * side, so the bloom probe sheds ~90% of the lineitem shuffle before
    * the exact join; the oracle is the plain SQL join (filter adds no
    * rows, removes no matches). */
  def urgentRevenue(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val sel = orders
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_orderdate"))
    val pruned = prunedFact(lineitem, "l_orderkey", sel, "o_orderkey")
    pruned
      .join(sel, pruned("l_orderkey") === sel("o_orderkey"))
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("order_month"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .orderBy("order_month")
  }
}
