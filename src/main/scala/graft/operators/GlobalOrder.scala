package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableRound.{moneySum, round}

/** Total-order operators — global `row_number` / `ntile` — that never
  * plan a data-sized `Exchange SinglePartition`.
  *
  * A bare `row_number() OVER (ORDER BY …)` funnels every row through ONE
  * reducer: fine at sf0.1, dead at 100 TB. This is the q25 range-bucket
  * scheme generalized to arbitrary sort orders:
  *
  *   1. one `approx_percentile` pass over `bucketKey` — a numeric column
  *      MONOTONE in the sort order — yields range bounds (a driver
  *      literal bounded by the bucket count; the scan is column-pruned
  *      to the key);
  *   2. each row's bucket id = #bounds below its key: computed from the
  *      DATA, so equal keys always share a bucket and bucket id is
  *      non-decreasing along the sort order (rounding in a lossy
  *      `bucketKey` cast is monotone, so ties merge buckets — never
  *      reorder them);
  *   3. per-bucket local ranks from a hash-partitioned window (the one
  *      data-sized shuffle in the plan); global number = local rank +
  *      per-bucket offset, where offsets are prefix sums over the
  *      bucket-count frame (a window over ≤numBuckets rows — the same
  *      bounded-aggregate idiom as q25) broadcast back on bucket id.
  *
  * Cost at any scale: two column-pruned scans (bounds, counts) + one
  * full scan + one full shuffle, everything whole-stage codegen. Skew is
  * governed by `bucketKey` granularity: a key that refines below the hot
  * value (e.g. date⊕orderkey rather than date) splits heavy sort-key
  * values across buckets instead of piling them into one task. */
object GlobalOrder {

  /** Append `rnCol` = 1-based global row number in `sortCols` order
    * (include a unique tie-break column for a deterministic total
    * order) and `totalCol` = total row count. `bucketKey` must be
    * numeric and monotone non-decreasing in `sortCols` order. */
  def withGlobalRowNumber(
      df: DataFrame,
      bucketKey: Column,
      sortCols: Seq[String],
      rnCol: String = "rn",
      totalCol: String = "__total",
      numBuckets: Int = 32,
      accuracy: Int = 10000): DataFrame =
    withGlobalRowNumberBounds(
      df, bucketKey, collectBounds(df, bucketKey, numBuckets, accuracy),
      sortCols, rnCol, totalCol)

  /** The one driver-side action of the range scheme: `approx_percentile`
    * bounds over `bucketKey` (a ≤numBuckets-element driver literal).
    * Exposed so multi-ranking operators (q153's three quintiles) can
    * fuse SEVERAL keys' bounds into one aggregate job instead of one
    * collection per ranking — r11. */
  private[operators] def collectBounds(
      df: DataFrame,
      bucketKey: Column,
      numBuckets: Int,
      accuracy: Int = 10000): Seq[Double] = {
    val probs = (1 until numBuckets).map(i => i.toDouble / numBuckets)
    val boundsRow = df
      .withColumn("__bkey", bucketKey.cast("double"))
      .agg(expr(s"approx_percentile(__bkey, array(${probs.mkString(",")}), $accuracy)"))
      .head()
    if (boundsRow.isNullAt(0)) Seq.empty else boundsRow.getSeq[Double](0)
  }

  /** Range-bucket id for a key given precomputed bounds: #bounds below. */
  private[operators] def pidExpr(bkey: Column, bounds: Seq[Double]): Column =
    bounds.foldLeft(lit(0)) { (acc, b) => acc + when(bkey > lit(b), 1).otherwise(0) }

  /** [[withGlobalRowNumber]] with caller-supplied range bounds (in
    * `bucketKey`-cast-double space) — no driver action of its own. */
  private[operators] def withGlobalRowNumberBounds(
      df: DataFrame,
      bucketKey: Column,
      bounds: Seq[Double],
      sortCols: Seq[String],
      rnCol: String = "rn",
      totalCol: String = "__total"): DataFrame = {
    val keyed = df.withColumn("__bkey", bucketKey.cast("double"))
    val withPid = keyed.withColumn("__pid", pidExpr(col("__bkey"), bounds))
    val tiny = Window.orderBy("__pid")
    val offsets = withPid
      .groupBy("__pid").count()
      .select(
        col("__pid"),
        coalesce(
          sum("count").over(tiny.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("__offset"),
        sum("count").over(tiny.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as(totalCol))
    val localRank = row_number().over(
      Window.partitionBy("__pid").orderBy(sortCols.map(col): _*))
    withPid
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(rnCol, localRank.cast("long") + col("__offset"))
      .drop("__pid", "__bkey", "__offset")
  }

  /** Append `outCol` = exact `ntile(buckets)` bucket of each row in
    * `sortCols` order, reproducing SQL ntile's fill rule (the first
    * `total % buckets` buckets take one extra row) from the global row
    * number — bit-identical to the single-reducer window form. */
  def withExactNtile(
      df: DataFrame,
      bucketKey: Column,
      sortCols: Seq[String],
      buckets: Int,
      outCol: String,
      numBuckets: Int = 32): DataFrame =
    withExactNtileBounds(
      df, bucketKey, collectBounds(df, bucketKey, numBuckets), sortCols, buckets, outCol)

  /** [[withExactNtile]] with caller-supplied range bounds — no driver
    * action of its own (r11: lets q153 fuse its three quintiles' bounds
    * into one aggregate job). */
  private[operators] def withExactNtileBounds(
      df: DataFrame,
      bucketKey: Column,
      bounds: Seq[Double],
      sortCols: Seq[String],
      buckets: Int,
      outCol: String): DataFrame =
    withGlobalRowNumberBounds(df, bucketKey, bounds, sortCols, "__rn", "__tot")
      .withColumn(outCol, expr(
        s"""CAST(CASE WHEN __rn <= (__tot % $buckets) * ((__tot div $buckets) + 1)
           |  THEN (__rn - 1) div ((__tot div $buckets) + 1)
           |  ELSE (__tot % $buckets)
           |    + (__rn - 1 - (__tot % $buckets) * ((__tot div $buckets) + 1))
           |      div greatest(__tot div $buckets, 1L)
           |END + 1 AS INT)""".stripMargin))
      .drop("__rn", "__tot")

  /** q150: global sequence numbering of orders by (date, key) — the
    * surrogate-key / total-ordering primitive. The DuckDB oracle is the
    * single-reducer `row_number()` window; this plan computes the same
    * numbers with the range scheme and no data-sized SinglePartition
    * exchange (plan-asserted in PlanSpec). The bucket key refines the
    * date with the order key, so even a hot date spreads across
    * buckets — there is no skew ceiling from the leading sort column. */
  def orderSequence(orders: DataFrame, numBuckets: Int = 32): DataFrame = {
    val slim = orders.select(
      col("o_orderkey"),
      col("o_orderdate"),
      col("o_totalprice"))
    // monotone in (o_orderdate, o_orderkey): days-since-epoch dominates,
    // orderkey refines within a day (keys ≪ 2^33)
    val bkey = datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
      .cast("long") * lit(1L << 33) + col("o_orderkey")
    withGlobalRowNumber(slim, bkey, Seq("o_orderdate", "o_orderkey"), "rn", "__tot", numBuckets)
      .select(
        col("rn"),
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_totalprice"))
      .orderBy("rn")
  }

  /** r11: pooled global row number PLUS both sides' running counts in
    * ONE bucketed pass — the two-sample CDF family (q184/q367/q379/q415)
    * previously ranked three times (pooled, then each side's rows
    * re-ranked, each side pass replaying the pooled ranking's plan).
    * Output columns: `rn` (pooled 1-based rank in `sortCols` order),
    * `cum_a`/`cum_b` (rows of side 0 / side 1 at-or-before this row in
    * that order — for a side-s row, `cum_s` IS the per-side row_number
    * the old per-side ranking assigned), `totalCol` (pooled count) and
    * `n_a`/`n_b` (side totals). One bounds collection + one shuffle +
    * one window with three running aggregates; same skew posture as
    * [[withGlobalRowNumber]] (`sideCol` must be 0/1). */
  def withCumSides(
      df: DataFrame,
      bucketKey: Column,
      sortCols: Seq[String],
      sideCol: String,
      rnCol: String = "rn",
      totalCol: String = "__total",
      numBuckets: Int = 32,
      accuracy: Int = 10000): DataFrame = {
    val bounds = collectBounds(df, bucketKey, numBuckets, accuracy)
    val keyed = df.withColumn("__bkey", bucketKey.cast("double"))
    val withPid = keyed.withColumn("__pid", pidExpr(col("__bkey"), bounds))
    val tiny = Window.orderBy("__pid")
    def pre(c: String) = coalesce(
      sum(c).over(tiny.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    def tot(c: String) =
      sum(c).over(tiny.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    val offsets = withPid
      .groupBy("__pid")
      .agg(
        count(lit(1)).as("__c"),
        sum(when(col(sideCol) === 0, 1L).otherwise(0L)).as("__c0"),
        sum(when(col(sideCol) === 1, 1L).otherwise(0L)).as("__c1"))
      .select(
        col("__pid"),
        pre("__c").as("__off"), pre("__c0").as("__off0"), pre("__c1").as("__off1"),
        tot("__c").as(totalCol), tot("__c0").as("n_a"), tot("__c1").as("n_b"))
    val w = Window.partitionBy("__pid").orderBy(sortCols.map(col): _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPid
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(rnCol, row_number().over(w).cast("long") + col("__off"))
      .withColumn("cum_a",
        sum(when(col(sideCol) === 0, 1L).otherwise(0L)).over(run) + col("__off0"))
      .withColumn("cum_b",
        sum(when(col(sideCol) === 1, 1L).otherwise(0L)).over(run) + col("__off1"))
      .drop("__pid", "__bkey", "__off", "__off0", "__off1")
  }

  /** Grouped variant: per-`groupCols` row numbers in `sortCols` order
    * WITHOUT sorting whole groups in one task. `bucketCol` must be a
    * small-cardinality column monotone in the sort order within each
    * group (e.g. the 2-hex md5 prefix for md5-ordered ranks, the q149
    * trick): local ranks come from (group, bucket)-partitioned windows
    * — each ≈ group/buckets rows — and per-(group,bucket) counts
    * prefix-sum into offsets with a window PARTITIONED BY GROUP over
    * ≤buckets rows per group. Nothing unpartitioned, nothing
    * group-sized in one sort. */
  def withGroupedRowNumber(
      df: DataFrame,
      groupCols: Seq[String],
      bucketCol: Column,
      sortCols: Seq[String],
      rnCol: String = "rn"): DataFrame = {
    val keyed = df.withColumn("__gbkt", bucketCol)
    val gcols = groupCols.map(col)
    val tiny = Window.partitionBy(gcols: _*).orderBy("__gbkt")
    val offsets = keyed
      .groupBy(gcols :+ col("__gbkt"): _*).count()
      .select(
        gcols :+ col("__gbkt") :+
          coalesce(
            sum("count").over(tiny.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)).as("__offset"): _*)
    val localRank = row_number().over(
      Window.partitionBy(gcols :+ col("__gbkt"): _*).orderBy(sortCols.map(col): _*))
    keyed
      .join(broadcast(offsets), groupCols :+ "__gbkt")
      .withColumn(rnCol, localRank.cast("long") + col("__offset"))
      .drop("__gbkt", "__offset")
  }

  /** q160: exact cross-distribution percent-rank ("score normalization
    * against a reference population") — each query row's percentile
    * within the REFERENCE distribution, exactly, with no per-row
    * correlated rescan and no single-reducer sort.
    *
    * The correlated form (`count(ref < x) / |ref|` per query row) is a
    * quadratic rescan; the scalable identity is rank algebra over ONE
    * merged ordering: sort `ref ∪ query` by (value, side) with query
    * rows FIRST among equals — then for a query row,
    * `refs strictly below = rank_in_union − rank_among_queries`. Both
    * ranks come from [[withGlobalRowNumber]] (same monotone bucket key),
    * so the whole thing is two bucketed rankings + an equi-join on the
    * query key: every stage data-proportional, codegen, skew governed by
    * the value distribution like any range scheme. |ref| rides along as
    * the union ranking's total. */
  def percentRankAgainst(
      ref: DataFrame,
      refValue: String,
      query: DataFrame,
      queryKey: String,
      queryValue: String,
      numBuckets: Int = 32): DataFrame = {
    val refSide = ref.select(
      col(refValue).cast("double").as("v"), lit(1).as("side"),
      lit(null).cast("long").as("qk"))
    val querySide = query.select(
      col(queryValue).cast("double").as("v"), lit(0).as("side"),
      col(queryKey).cast("long").as("qk"))
    val union = refSide.unionByName(querySide)
    val ranked = withGlobalRowNumber(
      union, col("v"), Seq("v", "side", "qk"), "rn_all", "__tot", numBuckets)
    val queriesRanked = withGlobalRowNumber(
      ranked.filter(col("side") === 0), col("v"), Seq("v", "side", "qk"), "rn_q", "__qtot", numBuckets)
    queriesRanked
      .select(
        col("qk").as(queryKey),
        col("v").as(queryValue),
        (col("rn_all") - col("rn_q")).as("n_ref_below"),
        round((col("rn_all") - col("rn_q")) / (col("__tot") - col("__qtot")), 4)
          .as("pct_rank"))
      .orderBy(queryKey)
  }

  /** q153: RFM customer segmentation — recency / frequency / monetary
    * quintiles, the classic CRM cut of the order history.
    *
    * Per-customer aggregates are one fact-table pass collapsing to
    * customer cardinality; each quintile is an [[withExactNtile]] over
    * that dimension-sized frame (three bucketed passes, no data-sized
    * SinglePartition, ntile semantics exact so the DuckDB window oracle
    * matches bit-for-bit). Ties break on customer key, so scores are
    * deterministic on both engines. Score orientation: 5 = best
    * (recent / frequent / high-spend); recency ranks via its negation
    * so all three ntiles run ascending. Output is the segment-level
    * report: customers and money per (r,f,m) cell. */
  def rfmSegmentation(orders: DataFrame, numBuckets: Int = 32): DataFrame = {
    // r11: ONE driver action replaces four (as-of max + three per-ntile
    // bounds collections). The per-customer aggregate keys recency by
    // last-order epoch days (monotone 1:1 with neg_recency = lastd −
    // asof, day grain), so the as-of date and all three quintiles'
    // range bounds come out of a single aggregate over the cached
    // dimension-sized frame; neg_recency bounds are the lastd bounds
    // shifted by the as-of constant (pid uses strict > comparisons —
    // an exact affine shift of key and bounds preserves every bucket).
    val probs = (1 until numBuckets).map(i => i.toDouble / numBuckets)
    def pct(c: String) =
      expr(s"approx_percentile(CAST($c AS DOUBLE), array(${probs.mkString(",")}), 10000)")
    val rfm0 = orders
      .groupBy(col("o_custkey"))
      .agg(
        datediff(max(col("o_orderdate")), to_date(lit("1970-01-01"))).cast("long")
          .as("lastd"),
        count(lit(1)).as("frequency"),
        // 4dp-rounded BEFORE ranking (the q283 lesson, applied here by an
        // sf1 failure: raw double sums order differently per summation
        // order, flipping quintile boundaries between engines)
        round(moneySum(col("o_totalprice")), 4).as("monetary"))
      .cache()
    val stats = rfm0.agg(
      max("lastd").as("asof"),
      pct("lastd").as("br"), pct("frequency").as("bf"), pct("monetary").as("bm"))
      .head()
    // empty input: no as-of date exists; 0 keeps the (empty) plan valid
    val asofDays = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    def bounds(i: Int): Seq[Double] =
      if (stats.isNullAt(i)) Seq.empty else stats.getSeq[Double](i)
    val rfm = rfm0
      .withColumn("recency_days", lit(asofDays) - col("lastd"))
      .withColumn("neg_recency", col("lastd") - lit(asofDays))
    // three INDEPENDENT quintile passes over the cached frame, joined
    // back on the key — chaining them instead was built and re-measured
    // this round: it removes the joins but each pass's offsets aggregate
    // replays every earlier pass's window subplan (plan 50 → 62
    // Exchanges), so the compact cache-fed passes win
    val scored = Seq(
      ("r_score", "neg_recency", bounds(1).map(_ - asofDays)),
      ("f_score", "frequency", bounds(2)),
      ("m_score", "monetary", bounds(3)))
      .map { case (out, key, bs) =>
        withExactNtileBounds(
          rfm.select("o_custkey", key), col(key), bs, Seq(key, "o_custkey"), 5, out)
          .select("o_custkey", out)
      }
      .foldLeft(rfm)(_.join(_, Seq("o_custkey")))
    scored
      .groupBy("r_score", "f_score", "m_score")
      .agg(
        count(lit(1)).as("n_customers"),
        // 4dp-exact decimal mass: segment revenue reaches 2.4e10 at sf1,
        // where double accumulation order moves the 4dp display
        round(sum(col("monetary").cast("decimal(28,4)")).cast("double"), 4)
          .as("segment_revenue"),
        round(avg("recency_days"), 4).as("avg_recency_days"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** q283: customer value-tier MIGRATION matrix — "which revenue
    * quintile did each customer move to after the pivot date" (the
    * segment-drift report behind churn/upsell programs; the q153
    * segmentation made longitudinal). Revenue quintiles are computed
    * per period with [[withExactNtile]] (the no-SinglePartition global
    * ranking), customers absent from a period land in tier 0
    * (new/churned), and the matrix is a 6×6 aggregate with each row
    * share windowed over its ≤tiers+1-row before-tier partition.
    * Per-customer revenue is 4-dp-rounded BEFORE ranking so the ntile
    * order (rev, custkey) is reproducible across engines — rounding
    * COARSENS ties and the key breaks them, where raw double sums
    * could order differently per summation order. */
  def valueTierMigration(
      orders: DataFrame,
      pivot: String = "1998-07-01",
      tiers: Int = 5,
      numBuckets: Int = 32): DataFrame = {
    def tierOf(slice: DataFrame, out: String): DataFrame = {
      val rev = slice
        .groupBy(col("o_custkey"))
        .agg(round(moneySum(col("o_totalprice")), 4).as("rev"))
      withExactNtile(rev, col("rev"), Seq("rev", "o_custkey"), tiers, out, numBuckets)
        .select("o_custkey", out)
    }
    val before = tierOf(orders.filter(col("o_orderdate") < lit(pivot)), "tier_before")
    val after = tierOf(orders.filter(col("o_orderdate") >= lit(pivot)), "tier_after")
    val byBefore = Window.partitionBy("tier_before")
    before
      .join(after, Seq("o_custkey"), "full_outer")
      .select(
        coalesce(col("tier_before"), lit(0)).as("tier_before"),
        coalesce(col("tier_after"), lit(0)).as("tier_after"))
      .groupBy("tier_before", "tier_after")
      .agg(count(lit(1)).as("n_customers"))
      .withColumn("row_share",
        round(col("n_customers").cast("double")
          / sum(col("n_customers")).over(byBefore), 4))
      .orderBy("tier_before", "tier_after")
  }
}
