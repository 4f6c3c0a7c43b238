package graft

import graft.plans.MvAdvisor
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** q218: the workload-driven MV advisor reads plan shapes only — these
  * specs pin the three load-bearing behaviors: site extraction (what the
  * rollup router could serve), routability (what re-merges loss-free),
  * and subset coverage (what one rollup buys across the workload). */
class MvAdvisorSpec extends SparkSpec {

  private lazy val events = Tables(spark, sfDir).events

  test("q218: a plain groupBy over a parquet scan is one routable site") {
    val df = events.filter(col("value") > 0).groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
    val sites = MvAdvisor.aggSites(df.queryExecution.analyzed)
    assert(sites === Seq(MvAdvisor.AggSite("events", Seq("event_type"), routable = true)))
  }

  test("q218: distinct aggregates disqualify the site from routing") {
    val df = events.groupBy("event_type").agg(countDistinct("user_id").as("u"))
    val sites = MvAdvisor.aggSites(df.queryExecution.analyzed)
    assert(sites.map(_.routable) === Seq(false))
  }

  test("q218: a join below the aggregate yields no site") {
    val t = Tables(spark, sfDir)
    val (orders, customer) = (t.orders, t.customer)
    val df = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_nationkey").agg(sum("o_totalprice").as("rev"))
    assert(MvAdvisor.aggSites(df.queryExecution.analyzed).isEmpty)
  }

  test("q218: a rollup on (a,b) covers the routable subset-key sites") {
    val wide = events.groupBy("event_type", "user_id").agg(sum("value").as("s"))
    val narrow = events.groupBy("event_type").agg(sum("value").as("s"))
    val distinctQ = events.groupBy("event_type").agg(countDistinct("user_id").as("u"))
    val advice = MvAdvisor.advise(spark,
        Seq("wide" -> wide, "narrow" -> narrow, "distinctq" -> distinctQ))
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // (event_type,user_id) covers both routable sites; (event_type) covers
    // only the narrow one — the distinct query is never counted as covered
    assert(advice.toSeq === Seq(
      ("event_type,user_id", 1L, 2L),
      ("event_type", 2L, 1L)))
  }

  test("q218: the registered-workload slice recommends the hourly events grain") {
    val rec = SparkEntry.queries("q218_mv_advisor")(spark, sfDir).collect()
    assert(rec.nonEmpty)
    val tables = rec.map(_.getString(0)).toSet
    assert(tables.contains("events") && tables.contains("lineitem"))
    // every slice query that contributed appears somewhere in the report
    val queries = rec.flatMap(_.getString(4).split(",")).toSet
    assert(queries.contains("q01_pricing_summary"))
  }
}
