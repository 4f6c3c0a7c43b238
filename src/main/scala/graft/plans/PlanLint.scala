package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan guardrails — a lint pass over the physical plan that catches the
  * three queries-that-work-locally-and-die-at-100-TB shapes BEFORE a job
  * ships:
  *
  *  - `cartesian-product`: an accidental cross join (missing/non-equi
  *    join condition) — O(n·m) at any scale.
  *  - `broadcast-nested-loop-join`: the non-equi fallback; fine for a
  *    deliberately tiny side, a cluster-killer when it isn't.
  *  - `unpartitioned-window`: `Window.orderBy(...)` with no partitionBy
  *    sends EVERY row to one reducer (the trap q25 was rebuilt to
  *    avoid).
  *
  * Inspects `queryExecution.sparkPlan` (pre-AQE — the shape is decided
  * here; AQE re-plans exchanges, it does not introduce joins/windows).
  * This is the programmatic form of the regression guards PlanSpec pins
  * per-query, usable as a CI gate on any user query:
  * `PlanLint.check(df)` throws with the violation list.
  */
object PlanLint {

  final case class Violation(rule: String, operator: String)

  def lint(df: DataFrame): Seq[Violation] = {
    val found = Seq.newBuilder[Violation]
    df.queryExecution.sparkPlan.foreach {
      case p: CartesianProductExec =>
        found += Violation("cartesian-product", p.nodeName)
      case p: BroadcastNestedLoopJoinExec =>
        found += Violation("broadcast-nested-loop-join", p.nodeName)
      case p: WindowExec if p.partitionSpec.isEmpty =>
        found += Violation("unpartitioned-window", p.nodeName)
      case _ => ()
    }
    found.result()
  }

  /** Gate form: throw if the plan trips any rule. */
  def check(df: DataFrame): Unit = {
    val v = lint(df)
    require(v.isEmpty, s"plan lint: ${v.map(x => s"${x.rule} (${x.operator})").mkString("; ")}")
  }
}
