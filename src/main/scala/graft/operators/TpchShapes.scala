package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.{moneySum, round}

/** The remaining classic TPC-H query shapes (Q7/Q8/Q10/Q11/Q14/Q18/Q19)
  * adapted to this star schema — each one exercises a distinct plan
  * pattern a warehouse engine must get right at 100 TB:
  *
  *  - Q7/Q8: multi-way star joins where every dimension (nation, region,
  *    supplier, customer, part) broadcasts and the ONLY data-sized
  *    exchange is the lineitem⋈orders equi-join on the order key.
  *  - Q10: join + aggregate + global top-k — the top-k must plan as
  *    TakeOrderedAndProject, never a full sort.
  *  - Q11: group → share-of-group-total filter via a window PARTITIONED
  *    by the group (no unpartitioned scan-wide window).
  *  - Q14: conditional aggregation (share of a slice) in one pass.
  *  - Q18: having-on-sum semi-filter feeding a join — the HAVING
  *    collapses lineitem to order grain BEFORE any wide join.
  *  - Q19: OR-of-ANDs predicate brackets — Catalyst must push the
  *    disjunction's common `p_partkey` equi-join and evaluate the
  *    brackets post-join without a nested-loop fallback.
  *
  * Floats are rounded with the portable floor-based round and outputs
  * deterministically ordered (DuckDB-oracle hash discipline).
  */
object TpchShapes {

  /** q173: bilateral trade volume (TPC-H Q7): revenue shipped between a
    * nation pair, split by direction and ship year. The supplier and
    * customer nation legs resolve through broadcast dims; lineitem⋈orders
    * is the single co-partitioned big join. Nation filters apply on the
    * broadcast side BEFORE the join, so non-pair rows never survive the
    * probe. */
  def nationTrade(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      supplier: DataFrame,
      nation: DataFrame,
      nationA: String = "NATION_1",
      nationB: String = "NATION_2"): DataFrame = {
    val pair = Seq(nationA, nationB)
    val suppNation = supplier
      .join(nation.filter(col("n_name").isInCollection(pair)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNation = customer
      .join(nation.filter(col("n_name").isInCollection(pair)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(count(lit(1)).as("n_lines"), round(sum(col("volume")), 4).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "ship_year")
  }

  /** q174: national market share (TPC-H Q8): within one customer
    * region's PROMO-part purchases, the share supplied by one nation,
    * per order year. The share is a conditional-sum ratio inside ONE
    * aggregate — no second pass, no self-join. */
  def marketShare(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      supplier: DataFrame,
      part: DataFrame,
      nation: DataFrame,
      region: DataFrame,
      targetNation: String = "NATION_3",
      targetRegion: String = "ASIA",
      partType: String = "PROMO"): DataFrame = {
    val regionCust = customer
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region.filter(col("r_name") === targetRegion),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNation = supplier
      .join(nation.select(col("n_nationkey"), col("n_name").as("supp_nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
      .join(broadcast(part.filter(col("p_type") === partType).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(regionCust), col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(
        round(sum(col("volume")), 4).as("total_volume"),
        round(sum(when(col("supp_nation") === targetNation, col("volume"))
          .otherwise(0.0)), 4).as("nation_volume"),
        round(
          sum(when(col("supp_nation") === targetNation, col("volume")).otherwise(0.0))
            / sum(col("volume")) * 100, 4).as("mkt_share_pct"))
      .orderBy("order_year")
  }

  /** q175: returned-item ranking (TPC-H Q10): revenue lost to returns
    * per customer, top 20. The plan must aggregate to customer grain
    * then TakeOrderedAndProject — the global sort never materializes. */
  def returnedCustomers(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      topN: Int = 20): DataFrame =
    lineitem
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_name"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(count(lit(1)).as("n_return_lines"), round(sum(col("volume")), 4).as("lost_revenue"))
      .orderBy(col("lost_revenue").desc, col("c_custkey"))
      .limit(topN)

  /** q176: late-shipment mix by priority and year (TPC-H Q12 shape:
    * CASE-bucketed counts over a join): per ship year, lines late beyond
    * `lateDays`, split by urgent-vs-other priority — the
    * two-conditional-counts-per-group pattern. */
  def lateShipmentMix(
      lineitem: DataFrame,
      orders: DataFrame,
      lateDays: Int = 60): DataFrame =
    lineitem
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > lateDays)
      .groupBy(year(col("l_shipdate")).as("ship_year"))
      .agg(
        sum(when(col("o_orderpriority").isInCollection(Seq("1-URGENT", "2-HIGH")), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isInCollection(Seq("1-URGENT", "2-HIGH")), 1L)
          .otherwise(0L)).as("low_line_count"))
      .orderBy("ship_year")

  /** q177: disjunctive predicate brackets (TPC-H Q19): OR-of-ANDs over
    * brand × size × quantity. The common `p_partkey` equi-join must stay
    * a broadcast hash join with the brackets as a post-join filter —
    * Catalyst must NOT fall back to a nested loop because of the OR. */
  def disjunctiveBrackets(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val joined = lineitem
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
    val bracket1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
      col("l_quantity").between(1, 20)
    val bracket2 = col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
      col("l_quantity").between(10, 35)
    val bracket3 = col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
      col("l_quantity").between(20, 50)
    joined
      .filter(bracket1 || bracket2 || bracket3)
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
  }

  /** q178: promotional revenue share per month (TPC-H Q14): the
    * conditional-share aggregate over a broadcast part join, bucketed by
    * ship month — one fact pass, everything map-side until the
    * month-cardinality shuffle. */
  def promoShare(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .select(col("l_partkey"), col("l_shipdate"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(
        round(sum(when(col("p_type") === "PROMO", col("volume")).otherwise(0.0)), 4)
          .as("promo_revenue"),
        round(sum(col("volume")), 4).as("total_revenue"),
        round(sum(when(col("p_type") === "PROMO", col("volume")).otherwise(0.0))
          / sum(col("volume")) * 100, 4).as("promo_share_pct"))
      .orderBy("ship_month")

  /** q179: large-volume orders (TPC-H Q18): orders whose total quantity
    * clears a threshold, with their customer. The HAVING collapses
    * lineitem to order grain FIRST (one co-partitioned aggregate), so
    * the orders/customer joins only see the surviving keys; final top-k
    * is TakeOrdered on (qty desc, key). */
  def bigOrders(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      minQty: Double = 200.0,
      topN: Int = 100): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
      .join(orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        round(col("o_totalprice"), 4).as("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(topN)

  /** q195: order-priority EXISTS check (TPC-H Q4): orders with AT LEAST
    * ONE badly late line (shipped > `lateDays` after order date),
    * counted once per order by priority. The EXISTS is a LEFT SEMI join
    * on the order key — the fact side collapses to qualifying order
    * keys, never duplicating orders per matching line (the q176 shape
    * counts LINES; this counts ORDERS — different semantics, different
    * plan: semi join vs join+filter). */
  def priorityExists(
      lineitem: DataFrame,
      orders: DataFrame,
      lateDays: Int = 90): DataFrame = {
    val slim = orders.select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    slim
      .join(
        lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          datediff(col("l_shipdate"), col("o_orderdate")) > lateDays,
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** q180: nation-level part concentration (TPC-H Q11 shape): parts
    * whose revenue within their supplier nation exceeds `factor`× the
    * nation's AVERAGE part value — the share filter is relative to
    * uniform, so it is scale-free (a fixed share threshold goes vacuous
    * as the part catalog grows with sf; this one keeps selecting the
    * over-represented tail at any scale). The filter is a window
    * PARTITIONED by nation over the (nation, part) aggregate — group
    * totals never leave their partition and nothing is scan-wide. */
  def nationPartConcentration(
      lineitem: DataFrame,
      supplier: DataFrame,
      nation: DataFrame,
      factor: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byNation = Window.partitionBy("n_name")
    val byNationPart = lineitem
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("l_partkey"))
      .agg(moneySum(col("l_extendedprice")).as("value"))
    byNationPart
      .withColumn("nation_total", sum(col("value")).over(byNation))
      .withColumn("n_parts", count(lit(1)).over(byNation))
      .filter(col("value") * col("n_parts") > col("nation_total") * factor)
      .select(col("n_name"), col("l_partkey"), round(col("value"), 4).as("value"),
        round(col("value") / col("nation_total") * 100, 4).as("share_pct"))
      .orderBy(col("n_name"), col("value").desc, col("l_partkey"))
  }

  /** q274: local-supplier volume (TPC-H Q5): revenue per nation from
    * orders where the CUSTOMER and the SUPPLIER sit in the same nation
    * of one region, within one order year. Plan shape: the region's
    * nations broadcast; customer and supplier each resolve their nation
    * through that broadcast BEFORE the fact joins; the date filter
    * prunes orders at the scan; lineitem⋈orders on the order key is the
    * only data-sized exchange — the locality condition
    * (c_nationkey = s_nationkey) is checked as a cheap post-join filter
    * on two already-attached ints, never as a second fact shuffle. */
  def localSupplierVolume(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      supplier: DataFrame,
      nation: DataFrame,
      region: DataFrame,
      regionName: String = "ASIA",
      yearStart: String = "1997-01-01",
      yearEnd: String = "1998-01-01"): DataFrame = {
    val regionNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val suppNation = supplier
      .join(broadcast(regionNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey").as("supp_nk"), col("n_name"))
    val custNation = customer
      .join(broadcast(regionNations.select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey").as("cust_nk"))
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
      .join(orders
        .filter(col("o_orderdate") >= lit(yearStart) && col("o_orderdate") < lit(yearEnd))
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nk") === col("cust_nk"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_lines"), round(sum(col("volume")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** q275: product-type profit (TPC-H Q9): profit per supplier nation
    * and order year over parts matching a name fragment. This schema
    * carries no partsupp/supplycost table, so cost is proxied as
    * `costFactor × p_retailprice × l_quantity` — the PLAN is the point:
    * the name filter prunes part BEFORE its broadcast, supplier⋈nation
    * broadcasts, and the only big exchange is lineitem⋈orders (orders
    * contributes just the year). */
  def productTypeProfit(
      lineitem: DataFrame,
      orders: DataFrame,
      supplier: DataFrame,
      part: DataFrame,
      nation: DataFrame,
      nameFragment: String = "red",
      costFactor: Double = 0.5): DataFrame = {
    val parts = part
      .filter(col("p_name").contains(nameFragment))
      .select(col("p_partkey"), col("p_retailprice"))
    val suppNation = supplier
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("supp_nation"), year(col("o_orderdate")).as("order_year"))
      .agg(round(sum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          - lit(costFactor) * col("p_retailprice") * col("l_quantity")), 4).as("profit"))
      .orderBy(col("supp_nation"), col("order_year").desc)
  }

  /** q276: supplier-count by part bucket (TPC-H Q16): how many DISTINCT
    * suppliers ship each (brand, type, size) bucket, excluding one
    * brand, one type, and "complaint" suppliers (negative account
    * balance stands in for Q16's complaint scan). The supplier–part
    * relationship is derived as `SELECT DISTINCT l_partkey, l_suppkey`
    * from the fact table (this schema has no partsupp): that distinct
    * collapses the fact to catalog grain FIRST, so the part join and
    * the count-distinct run on catalog-sized input. The excluded
    * suppliers arrive as a broadcast ANTI join — never a NOT IN scan. */
  def supplierPartBuckets(
      lineitem: DataFrame,
      part: DataFrame,
      supplier: DataFrame,
      excludeBrand: String = "Brand#5",
      excludeType: String = "PROMO",
      sizes: Seq[Int] = Seq(1, 5, 9, 13, 17, 21, 25, 29)): DataFrame = {
    val partSupp = lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
    val keptParts = part
      .filter(col("p_brand") =!= excludeBrand && col("p_type") =!= excludeType &&
        col("p_size").isInCollection(sizes))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val complainers = supplier.filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    partSupp
      .join(broadcast(complainers), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(keptParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** q277: small-quantity revenue (TPC-H Q17): average yearly revenue
    * lost if orders below a per-part quantity threshold (a fraction of
    * that part's OWN average quantity) were no longer taken, for one
    * brand. The correlated per-part average is ONE part-grain aggregate
    * over the brand-pruned fact slice, broadcast back onto the same
    * slice — the fact table is scanned once per side but never
    * self-joined at row grain. The threshold compares against the
    * 4-decimal portable round of `frac × avg`, so the cut is
    * reproducible across engines regardless of summation order
    * (quantities are integer-valued, so the avg itself is exact). */
  def smallQuantityRevenue(
      lineitem: DataFrame,
      part: DataFrame,
      brand: String = "Brand#1",
      frac: Double = 0.5,
      years: Double = 7.0): DataFrame = {
    val brandParts = part.filter(col("p_brand") === brand).select(col("p_partkey"))
    val slice = lineitem
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val perPartAvg = slice
      .groupBy(col("l_partkey"))
      .agg(round(avg(col("l_quantity")) * frac, 4).as("qty_cut"))
      .withColumnRenamed("l_partkey", "t_partkey")
    slice
      .join(broadcast(perPartAvg), col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_cut"))
      .agg(round(moneySum(col("l_extendedprice")) / years, 4).as("avg_yearly"))
  }

  /** q278: excess-stock suppliers (TPC-H Q20): suppliers whose shipments
    * of name-matched parts CONCENTRATE in one year — the pair's in-year
    * quantity share exceeds `factor ×` the corpus-wide year share
    * (availqty is proxied by lifetime volume — no partsupp table). The
    * threshold is RELATIVE to the global share (the q180 scale-free
    * discipline: a fixed share like TPC-H's 50% goes vacuous as sf
    * grows and each pair's share concentrates to the uniform year
    * fraction). Both grains come out of ONE scan of the name-pruned
    * slice via conditional aggregation (sum + sum-if), so there is no
    * two-aggregate self-join; the global share is the 1-row broadcast
    * scalar idiom; sparse pairs (< `minLines` shipments) can't qualify
    * by luck; qualifying pairs collapse to supplier keys and SEMI-join
    * the supplier dim. Quantities are integer-valued so every sum is
    * exact and the threshold compares deterministically across
    * engines. */
  def excessStockSuppliers(
      lineitem: DataFrame,
      part: DataFrame,
      supplier: DataFrame,
      nation: DataFrame,
      namePrefix: String = "small",
      yearStart: String = "1997-01-01",
      yearEnd: String = "1998-01-01",
      factor: Double = 2.0,
      minLines: Int = 3): DataFrame = {
    val namedParts = part.filter(col("p_name").startsWith(namePrefix)).select(col("p_partkey"))
    val inYear = col("l_shipdate") >= lit(yearStart) && col("l_shipdate") < lit(yearEnd)
    val slice = lineitem
      .join(broadcast(namedParts), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        when(inYear, col("l_quantity")).otherwise(0.0).as("year_qty"))
    val globalShare = slice.agg(
      (sum(col("year_qty")) / sum(col("l_quantity"))).as("global_share"))
    val qualifying = slice
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity")).as("life_qty"),
        sum(col("year_qty")).as("yr_qty"))
      .crossJoin(broadcast(globalShare))
      .filter(col("n_lines") >= minLines &&
        col("yr_qty") > col("life_qty") * col("global_share") * factor)
      .select(col("l_suppkey")).distinct()
    supplier
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name"))
      .orderBy(col("s_name"))
  }

  /** q286: relational DIVISION — parts supplied from EVERY nation of one
    * region ("universally stocked" items; the FOR ALL quantifier no
    * TPC-H query exercises, classically written as double-negated NOT
    * EXISTS). Spark-first it is counting, not negation: collapse the
    * fact to DISTINCT (part, nation) grain FIRST (the q276 catalog-grain
    * trick lives inside countDistinct here), one part-grain
    * `countDistinct(nation)` and keep rows whose count equals the
    * divisor cardinality — a 1-row broadcast scalar (the region's
    * nation count). The revenue measure rides the same pre-broadcast
    * slice in the same aggregate — one fact pass total. */
  def universallyStocked(
      lineitem: DataFrame,
      supplier: DataFrame,
      nation: DataFrame,
      region: DataFrame,
      regionName: String = "ASIA"): DataFrame = {
    val regionNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val suppNation = supplier
      .join(broadcast(regionNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"))
    val slice = lineitem
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("s_nationkey"), col("l_extendedprice"))
    val divisor = regionNations.agg(count(lit(1)).as("n_region_nations"))
    slice
      .groupBy(col("l_partkey"))
      .agg(countDistinct(col("s_nationkey")).as("n_nations"),
        round(moneySum(col("l_extendedprice")), 4).as("region_revenue"))
      .crossJoin(broadcast(divisor))
      .filter(col("n_nations") === col("n_region_nations"))
      .select(col("l_partkey"), col("n_nations"), col("region_revenue"))
      .orderBy(col("l_partkey"))
  }
}
