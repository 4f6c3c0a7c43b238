package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** q96: declarative data-quality constraint audit (the Deequ-style
  * verification suite a warehouse runs after each load — the reference's
  * "partition done" contract extended to "partition done AND valid").
  *
  * Checks are grouped so each TABLE is scanned once for all of its
  * row-level constraints (null / range / uniqueness collapse into ONE
  * conditional aggregate, fanned back out to a row per check with
  * `stack`), and each referential check is a single left join counting
  * unmatched children — never two passes (`count(*)` and the violation
  * count ride the same join). Every branch reduces to a handful of rows
  * before the final union, so the audit's cost at 100 TB is exactly one
  * scan per audited table plus one join per foreign key — the minimum
  * any audit can do.
  */
object Audit {

  private def rowChecks(df: DataFrame, tableName: String, checks: Seq[(String, Column)]): DataFrame = {
    val aggCols = count(lit(1)).as("n_rows") +: checks.map { case (n, c) => c.as(n) }
    val stackArgs = checks.map { case (n, _) => s"'$n', `$n`" }.mkString(", ")
    df.agg(aggCols.head, aggCols.tail: _*)
      .selectExpr(
        s"stack(${checks.size}, $stackArgs) AS (check_name, n_violations)",
        s"'$tableName' AS table_name",
        "n_rows")
  }

  /** One pass over the child table: left-join the parent's (distinct)
    * key column and count both rows and unmatched rows in the same
    * aggregate. The parent side is keys-only, so it broadcasts when the
    * parent is a dim and shuffles data-proportionally when it is not. */
  private def fkCheck(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      checkName: String, tableName: String): DataFrame =
    child
      .join(parent.select(col(parentKey).as("__pk")).distinct(), col(childKey) === col("__pk"), "left")
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("__pk").isNull && col(childKey).isNotNull, 1)).as("n_violations"))
      .select(lit(checkName).as("check_name"), lit(tableName).as("table_name"),
        col("n_violations"), col("n_rows"))

  def constraintAudit(
      orders: DataFrame, lineitem: DataFrame, customer: DataFrame, events: DataFrame): DataFrame = {
    val ordersChecks = rowChecks(orders, "orders", Seq(
      "notnull_o_custkey" -> count(when(col("o_custkey").isNull, 1)),
      "unique_o_orderkey" -> (count(lit(1)) - countDistinct(col("o_orderkey"))),
      "range_o_totalprice" -> count(when(col("o_totalprice") <= 0, 1))))
    val lineitemChecks = rowChecks(lineitem, "lineitem", Seq(
      "range_l_quantity" -> count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)),
      "range_l_discount" -> count(when(col("l_discount") < 0 || col("l_discount") > 1, 1)),
      "notnull_l_shipdate" -> count(when(col("l_shipdate").isNull, 1))))
    val eventsChecks = rowChecks(events, "events", Seq(
      "notnull_event_ts" -> count(when(col("ts").isNull, 1)),
      "unique_event_id" -> (count(lit(1)) - countDistinct(col("event_id")))))
    val fkOrders = fkCheck(orders, "o_custkey", customer, "c_custkey",
      "fk_orders_custkey", "orders")
    val fkLineitem = fkCheck(lineitem, "l_orderkey", orders, "o_orderkey",
      "fk_lineitem_orderkey", "lineitem")

    ordersChecks
      .unionByName(lineitemChecks)
      .unionByName(eventsChecks)
      .unionByName(fkOrders)
      .unionByName(fkLineitem)
      .withColumn("passed", col("n_violations") === 0L)
      .select("check_name", "table_name", "n_violations", "n_rows", "passed")
      .orderBy("check_name")
  }

  /** q322: duplicate-KEY audit of the fact table — q96's
    * `unique_*` check says HOW MANY rows violate uniqueness; this says
    * what the duplication looks like, which decides the fix. Per key
    * multiplicity m: how many (l_orderkey, l_linenumber) keys occur m
    * times, how many rows they hold, what share of the table that is,
    * and — the load-bearing split — how many of those keys are
    * DIVERGENT (same key, different measure tuple: a real correctness
    * bug needing upstream triage) vs pure replays (identical rows: safe
    * to `dropDuplicates`). The synthetic lineitem is known to carry
    * divergent duplicates, which is exactly why every sampling/top-k
    * operator here orders by the full value tuple.
    *
    * One key-grain aggregate (count + distinct value-tuple count per
    * key), one bounded multiplicity rollup, 1-row total broadcast — the
    * same two-shuffle shape at 100 TB. */
  def duplicateKeyAudit(lineitem: DataFrame): DataFrame = {
    val perKey = lineitem
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(
        count(lit(1)).as("m"),
        countDistinct(
          col("l_partkey"), col("l_suppkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus"), col("l_shipdate")).as("nv"))
    val total = lineitem.agg(count(lit(1)).as("n_total"))
    perKey
      .groupBy(col("m").as("multiplicity"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("m")).as("n_rows"),
        count(when(col("nv") > 1, 1)).as("n_divergent_keys"))
      .crossJoin(broadcast(total))
      .select(
        col("multiplicity"), col("n_keys"), col("n_rows"), col("n_divergent_keys"),
        graft.functions.PortableRound.round(
          col("n_rows").cast("double") / col("n_total"), 6).as("row_share"))
      .orderBy("multiplicity")
  }

  /** q434: referential-COVERAGE audit of the whole star — q96's FK
    * check counts orphans on two edges; this walks every declared edge
    * in BOTH directions: orphaned child rows (key points at a missing
    * parent — a correctness bug) and childless parent keys (a parent no
    * fact ever references — not a bug, but the dead-dimension share
    * that q422's cold-start coverage turns into a business readout).
    * Per edge: child rows / orphans / orphan share, distinct parent
    * keys / childless keys / childless share.
    *
    * Shape per edge: one child-side key-grain aggregate, one anti-join
    * each way (dim side broadcasts; fact-fact shuffles on the key) —
    * nothing wider than the child table, ever. */
  def fkCoverageAudit(
      orders: DataFrame, lineitem: DataFrame, customer: DataFrame,
      part: DataFrame, supplier: DataFrame, nation: DataFrame): DataFrame = {
    def edge(
        name: String,
        child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame = {
      val ck = child.groupBy(col(childKey).as("k")).agg(count(lit(1)).as("n"))
      val pk = parent.select(col(parentKey).as("k")).distinct()
      val orphans = ck.join(pk, Seq("k"), "left_anti")
        .agg(coalesce(sum("n"), lit(0L)).as("n_orphan"))
      val childless = pk.join(ck, Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_childless"))
      val totals = ck.agg(coalesce(sum("n"), lit(0L)).as("n_child"))
      val parents = pk.agg(count(lit(1)).as("n_parent"))
      totals.crossJoin(broadcast(orphans))
        .crossJoin(broadcast(parents)).crossJoin(broadcast(childless))
        .select(
          lit(name).as("edge"),
          col("n_child"), col("n_orphan"),
          graft.functions.PortableRound.round(
            when(col("n_child") > 0,
              col("n_orphan").cast("double") / col("n_child")), 6).as("orphan_share"),
          col("n_parent"), col("n_childless"),
          graft.functions.PortableRound.round(
            when(col("n_parent") > 0,
              col("n_childless").cast("double") / col("n_parent")), 6)
            .as("childless_share"))
    }
    edge("customer_nation", customer, "c_nationkey", nation, "n_nationkey")
      .unionByName(edge("lineitem_orders", lineitem, "l_orderkey", orders, "o_orderkey"))
      .unionByName(edge("lineitem_part", lineitem, "l_partkey", part, "p_partkey"))
      .unionByName(edge("lineitem_supplier", lineitem, "l_suppkey", supplier, "s_suppkey"))
      .unionByName(edge("orders_customer", orders, "o_custkey", customer, "c_custkey"))
      .unionByName(edge("supplier_nation", supplier, "s_nationkey", nation, "n_nationkey"))
      .orderBy("edge")
  }
}
