package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Workload-driven materialized-view advisor — the missing front half of
  * [[MaterializedRollup]]/[[CalendarRollup]]: those ROUTE queries through a
  * rollup someone already chose; this chooses. It walks the ANALYZED
  * logical plans of a workload (plan metadata only — nothing is executed,
  * nothing is collected but kilobytes of plan shape), finds every
  * `Aggregate … (Filter?/Project?) Scan(parquet)` site the rollup rule
  * could serve, and groups sites by (table, grouping-key fingerprint).
  *
  * The recommendation logic is the subset-cover argument the router's
  * correctness rests on: a rollup grouped by key-set K answers every site
  * whose keys ⊆ K with only sum/count/min/max/avg measures. For each
  * table the advisor therefore reports each observed key-set with (a) how
  * many workload queries hit it exactly, (b) how many it would COVER as a
  * rollup (every routable site whose keys are a subset), so the top
  * `covers` row per table is the build-this-first candidate. At 100 TB
  * this ranking is what decides which single fact-table scan buys the
  * most downstream kilobyte-reads.
  *
  * Driver-side by design: the workload is a list of plans, bounded by the
  * number of queries (hundreds), never by data. */
object MvAdvisor {

  /** One aggregate site the rollup router could serve: base `table`,
    * normalized grouping-key names, and whether every measure re-merges
    * (sum/count/min/max/avg over plain columns). */
  final case class AggSite(table: String, keys: Seq[String], routable: Boolean)

  /** Grouping keys normalized to stable names: plain columns by name;
    * computed keys (e.g. `date_format(ts, 'yyyy-MM')`) by their SQL
    * rendering so identical derivations fingerprint identically. */
  private def keyName(e: Expression): String = e match {
    case a: AttributeReference => a.name
    case Alias(c, _)           => keyName(c)
    case other                 => other.sql.toLowerCase
  }

  /** The single parquet table under Project/Filter chains, if the shape
    * is one the MV router could rewrite; None for joins/unions/etc. */
  private def baseTable(plan: LogicalPlan): Option[String] = plan match {
    case Project(_, c)        => baseTable(c)
    case Filter(_, c)         => baseTable(c)
    case SubqueryAlias(_, c)  => baseTable(c)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.headOption.map { p =>
            p.getName.stripSuffix(".parquet")
          }
        case _ => None
      }
    case _ => None
  }

  /** True when every aggregate in the site re-merges loss-free from a
    * pre-aggregated rollup (the exact function set the router rewrites).
    * Distinct aggregates and anything exotic disqualify the site. */
  private def routableAggs(aggExprs: Seq[NamedExpression]): Boolean = {
    val aggs = aggExprs.flatMap(_.collect { case ae: AggregateExpression => ae })
    aggs.nonEmpty && aggs.forall { ae =>
      !ae.isDistinct && (ae.aggregateFunction match {
        case _: Count | _: Sum | _: Min | _: Max | _: Average => true
        case _                                                => false
      })
    }
  }

  /** Every rollup-servable aggregate site in one plan. */
  def aggSites(plan: LogicalPlan): Seq[AggSite] =
    plan.collect {
      case Aggregate(groupExprs, aggExprs, child, _) if groupExprs.nonEmpty =>
        baseTable(child).map { t =>
          AggSite(t, groupExprs.map(keyName).distinct.sorted, routableAggs(aggExprs))
        }
    }.flatten

  /** Advise over a named workload: per (table, key-set) report how many
    * queries hit it (`n_exact`), how many routable sites a rollup on it
    * would cover via the subset rule (`covers`), and the queries hitting
    * it exactly. Ordered by coverage — the top row per table is the
    * recommended build. */
  def advise(spark: SparkSession, workload: Seq[(String, DataFrame)]): DataFrame = {
    import spark.implicits._
    val sites: Seq[(String, AggSite)] = workload
      .sortBy(_._1)
      .flatMap { case (name, df) => aggSites(df.queryExecution.analyzed).map(name -> _) }
    val byKeySet = sites
      .groupBy { case (_, s) => (s.table, s.keys) }
      .toSeq
    val rows = byKeySet.map { case ((table, keys), hits) =>
      val covers = sites.count { case (_, s) =>
        s.routable && s.table == table && s.keys.toSet.subsetOf(keys.toSet)
      }
      (table, keys.mkString(","), hits.size.toLong, covers.toLong,
        hits.map(_._1).distinct.sorted.mkString(","))
    }
    rows
      .toDF("table", "group_keys", "n_exact", "covers", "queries")
      .orderBy(col("covers").desc, col("table"), col("group_keys"))
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)

  /** q218 driver entry: run the advisor over a fixed representative slice
    * of this library's own registered workload (every aggregate-shaped
    * query over the core tables; the slice is pinned by name so the
    * result is stable as the registry grows). */
  def adviseRegistered(spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame]): DataFrame = {
    val slice = queries.view
      .filterKeys(WorkloadSlice.contains)
      .toMap
      .map { case (n, fn) => n -> fn(spark, sfDir) }
      .toSeq
    advise(spark, slice)
  }

  /** The pinned advisory workload: single-table aggregate queries over
    * lineitem / orders / events / documents that exercise distinct
    * grouping grains. Grown deliberately (names, not prefixes) so adding
    * queries elsewhere never shifts this result. */
  val WorkloadSlice: Set[String] = Set(
    "q01_pricing_summary", "q06_selective_agg", "q08_distinct_count",
    "q12_case_agg", "q13_having", "q16_percentiles", "q20_events_hourly",
    "q21_partition_layout", "q28_pivot", "q29_stats_agg", "q79_histogram",
    "q87_anomaly", "q89_mom_change", "q118_peak_concurrency",
    "q121_dau_wau", "q136_moving_avg", "q143_calendar_rollup",
    "q186_dow_seasonality", "q200_exact_money", "q211_pythagorean_means")
}
