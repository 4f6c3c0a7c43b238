package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Shuffle-reducing grouped top-k.
  *
  * Spark's idiomatic `row_number().over(partitionBy(key))` shuffles EVERY
  * row to the key's reducer before discarding all but k — at 100 TB the
  * shuffle is the job. This operator runs a bounded per-partition
  * selection first (each task keeps ≤ k rows per key it sees, via a
  * size-k heap), so the shuffle carries at most k·keys·partitions rows
  * instead of n. The window pass then finishes the job exactly: because
  * partial and final use the same total order (orderCol desc, tieCol
  * asc), no true top-k row can be evicted locally — the result is
  * identical to the window-only plan.
  *
  * NOTE: for the plain `row_number().over(...) <= k` SQL idiom, Spark
  * 3.5+ performs this optimization natively (Partial/Final
  * `WindowGroupLimit`, asserted in PlanSpec) — prefer the idiom there.
  * This operator is the explicit form for pipelines where the selection
  * must happen inside caller-controlled per-partition code (e.g. fused
  * with a codec/scoring pass in mapPartitions) or where the rank
  * function isn't rank-like.
  */
object TopK {

  def topKPerKey(df: DataFrame, keyCol: String, orderCol: String, tieCol: String, k: Int): DataFrame = {
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val ordIdx = schema.fieldIndex(orderCol)
    val tieIdx = schema.fieldIndex(tieCol)

    def num(r: Row, i: Int): Double = r.get(i) match {
      case n: Number => n.doubleValue()
      case other     => throw new IllegalArgumentException(s"non-numeric sort value: $other")
    }
    // total order: orderCol desc, tieCol asc; heap keeps the k best
    val ord = Ordering.by[Row, (Double, Double)](r => (-num(r, ordIdx), num(r, tieIdx)))

    val partial = df.mapPartitions { it =>
      val heaps = mutable.HashMap.empty[Any, mutable.PriorityQueue[Row]]
      it.foreach { r =>
        val h = heaps.getOrElseUpdate(r.get(keyIdx), mutable.PriorityQueue.empty[Row](ord)) // max-heap of worst-first
        if (h.size < k) h.enqueue(r)
        else if (ord.lt(r, h.head)) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(schema))

    val w = Window.partitionBy(keyCol).orderBy(desc(orderCol), asc(tieCol))
    partial
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** q327: TRENDING parts — week-over-week rank movement, the "what's
    * rising" readout behind every merchandising/feed-ranking surface.
    * Parts are ranked by revenue within each of the LAST TWO shipping
    * weeks (epoch-week arithmetic, exact integers); movers are parts
    * present in both rankings, scored by rank improvement, top `topN`
    * by (improvement desc, part asc).
    *
    * Scale shape: one fact-proportional (week, part) aggregate; ranking
    * happens ONLY inside the two selected weeks (the filter lands
    * before the window, so the per-week window partitions hold one
    * week's active parts — catalog-bounded, not fact-bounded); revenue
    * is rounded BEFORE ranking so ties break identically across
    * engines. */
  def trendingParts(lineitem: DataFrame, topN: Int = 20): DataFrame = {
    import graft.functions.PortableRound.{round => pround}
    val weekly = lineitem
      .select(
        col("l_partkey").as("part"),
        floor(datediff(to_date(col("l_shipdate")), to_date(lit("1970-01-01"))) / 7).as("wk"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .groupBy("part", "wk")
      .agg(pround(sum(col("rev")), 4).as("wrev"))
    val lastWk = weekly.agg(max(col("wk")).as("wmax")) // 1 row
    val two = weekly
      .crossJoin(broadcast(lastWk))
      .filter(col("wk") >= col("wmax") - 1)
    val w = Window.partitionBy("wk").orderBy(desc("wrev"), asc("part"))
    val ranked = two.withColumn("rnk", row_number().over(w).cast("long"))
    val cur = ranked.filter(col("wk") === col("wmax"))
      .select(col("part"), col("wrev").as("rev_cur"), col("rnk").as("rank_cur"))
    val prev = ranked.filter(col("wk") === col("wmax") - 1)
      .select(col("part"), col("wrev").as("rev_prev"), col("rnk").as("rank_prev"))
    cur.join(prev, "part")
      .select(
        col("part"), col("rank_prev"), col("rank_cur"),
        (col("rank_prev") - col("rank_cur")).as("rank_gain"),
        col("rev_prev"), col("rev_cur"))
      .orderBy(desc("rank_gain"), asc("part"))
      .limit(topN)
  }
}
