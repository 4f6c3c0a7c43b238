package graft

import graft.operators.{BloomJoin, EventAnalytics, GlobalOrder}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalOrder (q150/q153), BloomJoin (q151) and time-decay attribution
  * (q152): value equality with the single-reducer / unfiltered forms,
  * plan shape, and conservation laws. */
class GlobalOrderSpec extends SparkSpec {

  private lazy val t = Tables(spark, sfDir)

  test("q150: range-scheme row numbers ≡ single-reducer row_number") {
    val got = GlobalOrder.orderSequence(t.orders)
    val want = t.orders.select(
      row_number().over(Window.orderBy("o_orderdate", "o_orderkey")).cast("long").as("rn"),
      col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
      col("o_totalprice"))
    assert(got.count() === t.orders.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("q150: ranking window is bucket-partitioned; only the offset frame is single-partition") {
    val plan = GlobalOrder.orderSequence(t.orders).queryExecution.optimizedPlan.toString
    // the data-sized Window must carry a partition spec (__pid); the
    // only unpartitioned window is the prefix sum over bucket counts
    val windows = "Window \\[[^\\n]*".r.findAllIn(plan).toList
    assert(windows.nonEmpty)
    val unpartitioned = windows.filterNot(_.contains("windowspecdefinition(__pid"))
    assert(unpartitioned.forall(w => w.contains("count(1)") || w.contains("sum(count")),
      s"data-sized window lost its bucket partitioning:\n$plan")
  }

  test("exact ntile reproduces SQL ntile fill rule on skewed data, any total") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // heavy ties (only 17 distinct values over 501 rows) force the
    // fill-rule and tie-break paths; 501 % 5 != 0 exercises the
    // uneven-bucket branch
    val df = (1 to 501).map(i => (i.toLong, (rng.nextInt(17) * 3).toDouble)).toDF("id", "v")
    val got = GlobalOrder.withExactNtile(df, col("v"), Seq("v", "id"), 5, "bucket", numBuckets = 8)
    val want = df.withColumn("bucket", ntile(5).over(Window.orderBy("v", "id")))
    assert(got.select("id", "v", "bucket").except(want).isEmpty &&
      want.except(got.select("id", "v", "bucket")).isEmpty)
  }

  test("fused cum-sides ≡ single-reducer pooled rank + per-side running counts") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // ties across sides (23 distinct values over 400 rows) exercise the
    // tie-break columns; a 60/40 side split exercises unequal n_a/n_b
    val df = (1 to 400)
      .map(i => (i.toLong, (rng.nextInt(23) * 2).toDouble, if (rng.nextInt(5) < 3) 0 else 1))
      .toDF("k", "v", "side")
    val got = GlobalOrder.withCumSides(df, col("v"), Seq("v", "side", "k"), "side", numBuckets = 8)
      .select("k", "rn", "cum_a", "cum_b", "n_a", "n_b", "__total")
    val w = Window.orderBy("v", "side", "k")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(1))
    val want = df.select(
      col("k"),
      row_number().over(w).cast("long").as("rn"),
      sum(when(col("side") === 0, 1L).otherwise(0L)).over(run).as("cum_a"),
      sum(when(col("side") === 1, 1L).otherwise(0L)).over(run).as("cum_b"),
      sum(when(col("side") === 0, 1L).otherwise(0L)).over(all).as("n_a"),
      sum(when(col("side") === 1, 1L).otherwise(0L)).over(all).as("n_b"),
      count(lit(1)).over(all).as("__total"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("fused cum-sides: the data-sized window stays bucket-partitioned") {
    val vals = t.orders.select(col("o_orderkey").as("k"), col("o_totalprice").as("v"),
      (col("o_orderkey") % 2).cast("int").as("side"))
    val plan = GlobalOrder.withCumSides(vals, col("v"), Seq("v", "side", "k"), "side")
      .queryExecution.optimizedPlan.toString
    val windows = "Window \\[[^\\n]*".r.findAllIn(plan).toList
    assert(windows.nonEmpty)
    val unpartitioned = windows.filterNot(_.contains("windowspecdefinition(__pid"))
    assert(unpartitioned.forall(w => w.contains("sum(__c")),
      s"data-sized window lost its bucket partitioning:\n$plan")
  }

  test("q153: quintile scores partition all customers; segments conserve customers and revenue") {
    val seg = GlobalOrder.rfmSegmentation(t.orders).cache()
    val perCust = t.orders.groupBy("o_custkey").count()
    assert(seg.agg(sum("n_customers")).head().getLong(0) === perCust.count())
    val segRevenue = seg.agg(sum("segment_revenue")).head().getDouble(0)
    val totRevenue = t.orders.agg(sum("o_totalprice")).head().getDouble(0)
    assert(math.abs(segRevenue - totRevenue) / totRevenue < 1e-6)
    val scores = seg.select("r_score", "f_score", "m_score").collect()
    assert(scores.forall(r => (0 until 3).forall(i => r.getInt(i) >= 1 && r.getInt(i) <= 5)))
  }

  test("q151: bloom-pruned join ≡ plain join; the filter actually sheds fact rows") {
    val got = BloomJoin.urgentRevenue(t.lineitem, t.orders)
    val sel = t.orders
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_orderdate"))
    val want = t.lineitem
      .join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("order_month"))
      .agg(
        count(lit(1)).as("n_lines"),
        graft.functions.PortableRound.round(
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // pruning: against the selective build side the probe keeps
    // matches + fpp stragglers, far below the full fact table
    val kept = BloomJoin.prunedFact(t.lineitem, "l_orderkey", sel, "o_orderkey").count()
    val all = t.lineitem.count()
    val matched = t.lineitem.join(sel, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(kept >= matched, "bloom filter produced a false negative")
    assert(kept < all / 2, s"bloom filter shed almost nothing: kept $kept of $all")
  }

  test("q151: no false negatives even on a disjoint probe set") {
    import spark.implicits._
    val build = (1L to 1000L).map(i => i * 2).toDF("k") // even keys
    val probe = (1L to 4000L).toDF("pk")
    val kept = BloomJoin.prunedFact(probe, "pk", build, "k")
    // every even key ≤ 2000 must survive
    assert(kept.filter(col("pk") % 2 === 0 && col("pk") <= 2000).count() === 1000)
  }

  test("q160: merged-ranking percent rank ≡ correlated count-below, hand fixture") {
    import spark.implicits._
    val ref = Seq(10.0, 20.0, 20.0, 30.0, 40.0).toDF("rv")
    val query = Seq((1L, 5.0), (2L, 20.0), (3L, 25.0), (4L, 45.0)).toDF("qid", "qv")
    val got = GlobalOrder.percentRankAgainst(ref, "rv", query, "qid", "qv")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    // strictly-below counts: 5→0, 20→1 (only 10), 25→3, 45→5
    assert(got(1L) === (0L, 0.0))
    assert(got(2L) === (1L, 0.2))
    assert(got(3L) === (3L, 0.6))
    assert(got(4L) === (5L, 1.0))
  }

  test("q160: real-table ranks match the correlated recount") {
    val got = GlobalOrder.percentRankAgainst(
      t.customer, "c_acctbal", t.supplier, "s_suppkey", "s_acctbal")
    val refCount = t.customer.count()
    val recount = t.supplier.alias("s")
      .join(t.customer.alias("c"), col("c.c_acctbal") < col("s.s_acctbal"), "left")
      .groupBy(col("s.s_suppkey"))
      .agg(count(col("c.c_custkey")).as("n_below"))
    val joined = got.join(recount, "s_suppkey").collect()
    assert(joined.nonEmpty && joined.length.toLong === t.supplier.count())
    joined.foreach { r =>
      assert(r.getAs[Long]("n_ref_below") === r.getAs[Long]("n_below"))
    }
    assert(refCount > 0)
  }

  test("q152: decay credit conserves attributed purchase value; pair set matches q135") {
    val decay = EventAnalytics.timeDecayAttribution(t.events).cache()
    val linear = EventAnalytics.linearAttribution(t.events).cache()
    // the decay model reweights WITHIN a purchase — the (day, touches,
    // purchases) structure is identical to the linear model's
    assert(decay.select("click_day", "n_touches", "n_purchases")
      .except(linear.select("click_day", "n_touches", "n_purchases")).isEmpty)
    val creditSum = decay.agg(sum("attributed_revenue")).head().getDouble(0)
    val linearSum = linear.agg(sum("attributed_revenue")).head().getDouble(0)
    // both models fully distribute each attributed purchase's value
    assert(math.abs(creditSum - linearSum) / linearSum < 1e-4,
      s"decay $creditSum vs linear $linearSum")
  }
}
