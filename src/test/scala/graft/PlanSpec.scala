package graft

/** Physical-plan regression guards: the scale properties SURVEY §5
  * promises must be visible in the executed plan, not just intended. */
class PlanSpec extends SparkSpec {
  def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  def formatted(name: String): String = {
    val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
    qe.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  test("q02: filters and column pruning reach the parquet scan") {
    val p = formatted("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull"), "filter pushdown missing")
    assert(p.contains("GreaterThanOrEqual(l_quantity,45.0)"), "predicate not pushed")
    // pruned read schema: no price/discount/tax columns materialized
    assert(!p.contains("l_extendedprice"), "column pruning failed")
  }

  test("q03: global top-k plans as TakeOrderedAndProject, not a full sort") {
    assert(plan("q03_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("q01: aggregation is two-phase (map-side partial before shuffle)") {
    assert(plan("q01_pricing_summary").contains("partial_sum"))
  }

  test("q05: every dimension join is a broadcast join (no fact shuffle)") {
    val p = plan("q05_multi_join_agg")
    assert(!p.contains("SortMergeJoin"), "dimension join degraded to SMJ")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q04: explicit broadcast hint survives into the physical plan") {
    assert(plan("q04_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q07: rank-filter idiom plans Partial+Final WindowGroupLimit (bounded pre-shuffle top-k)") {
    val p = plan("q07_window_rank")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial") && p.contains("Final"),
      s"expected partial window group limit in:\n$p")
  }
}
