package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, date_format, lit, max, min, sum}
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Calendar-grain materialized rollup — the time-dimension sibling of
  * [[MaterializedRollup]]. ONE hourly pre-aggregate maintains every
  * coarser calendar grain: the hour key is the string `yyyy-MM-dd HH`,
  * whose 10- and 7-char prefixes ARE the day and month keys, so a
  * day- or month-grain aggregate re-merges loss-free from the hourly
  * rows (sum/count/min/max re-merge over any refinement; avg =
  * re-merged sum / re-merged count). At 100 TB the fact table is
  * scanned once at build; every hour/day/month dashboard query
  * afterwards reads O(hours) KB.
  *
  * Routing is a Catalyst `Rule[LogicalPlan]` like the subset-key
  * router's: it matches
  * `Aggregate [date_format(ts, fmt)] (Project) (Filter?) Scan(source)`
  * for fmt ∈ {hour, day, month} (the optimizer has pulled the derived
  * group key into the Project by the time extra rules run) and
  * substitutes a scan of the hourly rollup grouped by the matching
  * prefix of the hour key. Filter predicates are routed when every
  * timestamp reference is itself a supported `date_format(ts, fmt')`
  * — rewritten to the same prefix form — and nothing else of the
  * source is referenced; any other shape falls through untouched. */
object CalendarRollup {

  /** Supported `date_format` patterns → prefix length of the hour key. */
  private val grainPrefix: Map[String, Int] =
    Map("yyyy-MM-dd HH" -> 13, "yyyy-MM-dd" -> 10, "yyyy-MM" -> 7)

  /** A registered calendar rollup over `sourcePath`: pre-aggregated per
    * hour of `tsCol` with per-measure sum/min/max (+ always `cnt`). */
  final case class CalendarView(sourcePath: String, tsCol: String, measureCols: Seq[String], path: String)

  /** Build (or rebuild) the hourly rollup — one scan, one
    * (hour-cardinality) shuffle. */
  def build(spark: SparkSession, v: CalendarView): Unit = {
    val src  = spark.read.parquet(v.sourcePath)
    val aggs = count(lit(1)).as("cnt") +:
      v.measureCols.flatMap(m =>
        Seq(sum(col(m)).as(s"sum_$m"), min(col(m)).as(s"min_$m"), max(col(m)).as(s"max_$m")))
    src.groupBy(date_format(col(v.tsCol), "yyyy-MM-dd HH").as("h"))
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(v.path)
  }

  final class RewriteRule(spark: SparkSession, val view: CalendarView) extends Rule[LogicalPlan] {

    private def v: CalendarView = view

    private def pathOf(s: String): String = new Path(s).toUri.getPath

    private def isSource(plan: LogicalPlan): Boolean = plan match {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.exists(p => pathOf(p.toString) == pathOf(v.sourcePath))
          case _ => false
        }
      case _ => false
    }

    /** `date_format(tsCol, fmt)` (optionally through an hour-or-coarser
      * `date_trunc`, a no-op under these formats) → prefix length. */
    private def grainOf(e: Expression): Option[Int] = e match {
      case DateFormatClass(a: AttributeReference, Literal(f, StringType), _)
          if a.name == v.tsCol =>
        grainPrefix.get(f.toString)
      case DateFormatClass(TruncTimestamp(Literal(lvl, StringType), a: AttributeReference, _),
            Literal(f, StringType), _)
          if a.name == v.tsCol && lvl.toString.equalsIgnoreCase("hour") =>
        grainPrefix.get(f.toString)
      case _ => None
    }

    private def supported(fn: AggregateFunction): Boolean = fn match {
      case Count(Seq(_: Literal))            => true
      case Sum(a: AttributeReference, _)     => v.measureCols.contains(a.name)
      case Min(a: AttributeReference)        => v.measureCols.contains(a.name)
      case Max(a: AttributeReference)        => v.measureCols.contains(a.name)
      case Average(a: AttributeReference, _) => v.measureCols.contains(a.name)
      case _ => false
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg @ Aggregate(Seq(gk: AttributeReference), aggExprs, child, _) =>
        val routed = for {
          (projList, filterOpt, scan) <- child match {
            case Project(pl, s) if isSource(s)              => Some((pl, None, s))
            case Project(pl, Filter(c, s)) if isSource(s)   => Some((pl, Some(c), s))
            case Filter(c, Project(pl, s)) if isSource(s)   => Some((pl, Some(c), s))
            case _                                          => None
          }
          prefixLen <- projList.collectFirst {
            case al: Alias if al.exprId == gk.exprId => al.child
          }.flatMap(grainOf)
          if aggExprs.forall {
            case a: AttributeReference => a.exprId == gk.exprId
            case al: Alias             => routableExpr(al.child, gk)
            case _                     => false
          }
          out <- rewrite(agg, prefixLen, filterOpt)
        } yield out
        routed.getOrElse(agg)
    }

    /** An output expression routes when every aggregate inside it is a
      * provable re-merge and every non-aggregate reference is the group
      * key — scalar wrappers (rounding, arithmetic, casts) that
      * CollapseProject folds into the Aggregate are fine. */
    private def routableExpr(e: Expression, gk: AttributeReference): Boolean = e match {
      case ae: AggregateExpression =>
        !ae.isDistinct && ae.filter.isEmpty && supported(ae.aggregateFunction)
      case a: AttributeReference => a.exprId == gk.exprId
      case other                 => other.children.forall(routableExpr(_, gk))
    }

    private def prefix(h: Expression, len: Int): Expression =
      if (len >= 13) h else Substring(h, Literal(1), Literal(len))

    private def rewrite(
        agg: Aggregate,
        prefixLen: Int,
        filterOpt: Option[Expression]): Option[LogicalPlan] = {
      // fresh relation instance per rewrite (same discipline as the
      // subset-key router: two routed aggregates must not share ids)
      val mv = spark.read.parquet(v.path).queryExecution.analyzed match {
        case lr: LogicalRelation => lr.newInstance()
        case other               => other
      }
      val mvAttr: Map[String, Attribute] = mv.output.map(a => a.name -> a).toMap
      val hAttr = mvAttr("h")

      // Filter: every timestamp use must itself be a supported grain —
      // rewrite those to hour-key prefixes; any surviving reference to
      // something other than the hour key means raw rows are needed.
      val newFilter: Option[Option[Expression]] = filterOpt match {
        case None => Some(None)
        case Some(cond) =>
          val rewritten = cond.transform {
            case e: Expression if grainOf(e).isDefined => prefix(hAttr, grainOf(e).get)
            // null ts ⇒ null hour key: the optimizer's isnotnull(ts)
            // guard (and explicit null checks) map to the hour key
            case IsNotNull(a: AttributeReference) if a.name == v.tsCol => IsNotNull(hAttr)
            case IsNull(a: AttributeReference) if a.name == v.tsCol    => IsNull(hAttr)
          }
          if (rewritten.references.forall(_.exprId == hAttr.exprId)) Some(Some(rewritten))
          else None
      }
      newFilter.map { filt =>
        val child    = filt.map(Filter(_, mv)).getOrElse(mv)
        val keyAlias = Alias(prefix(hAttr, prefixLen), "_cal_key")()
        val proj     = Project(mv.output :+ keyAlias, child)
        val keyAttr  = keyAlias.toAttribute

        def remerged(fn: AggregateFunction): Expression = fn match {
          case Count(_)                      => Sum(mvAttr("cnt")).toAggregateExpression()
          case Sum(a: AttributeReference, _) => Sum(mvAttr(s"sum_${a.name}")).toAggregateExpression()
          case Min(a: AttributeReference)    => Min(mvAttr(s"min_${a.name}")).toAggregateExpression()
          case Max(a: AttributeReference)    => Max(mvAttr(s"max_${a.name}")).toAggregateExpression()
          case Average(a: AttributeReference, _) =>
            Divide(
              Cast(Sum(mvAttr(s"sum_${a.name}")).toAggregateExpression(), DoubleType),
              Cast(Sum(mvAttr("cnt")).toAggregateExpression(), DoubleType))
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
        val gk = agg.groupingExpressions.head.asInstanceOf[AttributeReference]
        def rewriteExpr(e: Expression): Expression = e match {
          case ae: AggregateExpression                        => remerged(ae.aggregateFunction)
          case a: AttributeReference if a.exprId == gk.exprId => keyAttr
          case other => other.withNewChildren(other.children.map(rewriteExpr))
        }
        val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
          case a: AttributeReference => Alias(keyAttr, a.name)(a.exprId)
          case al: Alias             => Alias(rewriteExpr(al.child), al.name)(al.exprId)
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
        Aggregate(Seq(keyAttr), newAggExprs, proj)
      }
    }
  }

  /** Register the routing rule for `v` on the session (idempotent). */
  def enable(spark: SparkSession, v: CalendarView): Unit = {
    val em      = spark.experimental
    val already = em.extraOptimizations.exists {
      case r: RewriteRule => r.view == v
      case _              => false
    }
    if (!already) em.extraOptimizations = em.extraOptimizations :+ new RewriteRule(spark, v)
  }

  /** Drop every routing rule for `path` (or all calendar rules). */
  def disable(spark: SparkSession, path: Option[String] = None): Unit = {
    val em = spark.experimental
    em.extraOptimizations = em.extraOptimizations.filterNot {
      case r: RewriteRule => path.forall(_ == r.view.path)
      case _              => false
    }
  }
}
