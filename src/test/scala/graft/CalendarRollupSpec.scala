package graft

import graft.plans.CalendarRollup
import graft.plans.CalendarRollup.CalendarView
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The calendar router must (a) answer hour/day/month-grain aggregates
  * from the ONE hourly MV scan, (b) re-merge exactly, (c) rewrite
  * calendar-grain filters to hour-key prefixes, (d) refuse anything it
  * can't prove — sub-hour grains, measure filters, distincts. */
class CalendarRollupSpec extends SparkSpec {

  // a micros-timestamp fact table (what the sink writes) — the raw
  // testdata events.parquet is TIMESTAMP(NANOS), only readable through
  // Tables; the MV family routes over ordinary sink-written sources.
  private lazy val srcPath = {
    val p = Files.createTempDirectory("graft-cal").toString + "/events"
    Tables(spark, sfDir).events.write.parquet(p)
    p
  }
  private lazy val mvPath = {
    val p = Files.createTempDirectory("graft-cal-mv").toString + "/events_hourly_mv"
    CalendarRollup.build(spark, CalendarView(srcPath, "ts", Seq("value"), p))
    p
  }
  private lazy val view = CalendarView(srcPath, "ts", Seq("value"), mvPath)

  private def src: DataFrame = spark.read.parquet(srcPath)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Keyed rows compared field-wise: longs exact, doubles to 1e-9
    * relative — re-merged float sums differ from raw sums at ULP level
    * (association), which string/rounded comparison turns into
    * boundary flakes. */
  private def assertSameRows(routed: DataFrame, baseline: DataFrame, ctx: String): Unit = {
    def keyed(df: DataFrame) = df.collect().map(r => r.getString(0) -> r).toMap
    val (a, b) = (keyed(routed), keyed(baseline))
    assert(a.keySet == b.keySet, s"$ctx: bucket sets diverge")
    a.foreach { case (k, ra) =>
      val rb = b(k)
      (1 until ra.length).foreach { i =>
        (ra.get(i), rb.get(i)) match {
          case (x: Long, y: Long)     => assert(x == y, s"$ctx $k col $i: $x != $y")
          case (x: Double, y: Double) =>
            assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)),
              s"$ctx $k col $i: $x vs $y")
          case (x, y) => assert(x == y, s"$ctx $k col $i: $x != $y")
        }
      }
    }
  }

  private def scansMv(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("events_hourly_mv")

  private def withView[A](f: => A): A = {
    CalendarRollup.enable(spark, view)
    try f
    finally CalendarRollup.disable(spark, Some(mvPath))
  }

  test("hour, day, and month grains all route to the one hourly MV and re-merge exactly") {
    for (fmt <- Seq("yyyy-MM-dd HH", "yyyy-MM-dd", "yyyy-MM")) {
      def q(df: => DataFrame) = df
        .groupBy(date_format(col("ts"), fmt).as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          sum("value").as("sv"),
          avg("value").as("av"),
          min("value").as("mn"),
          max("value").as("mx"))
      val baseline = q(src)
      withView {
        val routed = q(src)
        assert(scansMv(routed), s"$fmt did not route:\n${routed.queryExecution.executedPlan}")
        assertSameRows(routed, baseline, fmt)
      }
    }
  }

  test("the q20 date_trunc-hour idiom routes too") {
    def q(df: => DataFrame) = df
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n"))
    val baseline = sortedRows(q(src))
    withView {
      val routed = q(src)
      assert(scansMv(routed), s"date_trunc form did not route")
      assert(sortedRows(routed) == baseline)
    }
  }

  test("calendar-grain filter rewrites to an hour-key prefix and routes") {
    val month = src.select(date_format(col("ts"), "yyyy-MM").as("m"))
      .orderBy("m").limit(1).collect()(0).getString(0)
    def q(df: => DataFrame) = df
      .filter(date_format(col("ts"), "yyyy-MM") === month)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
    val baseline = q(src)
    assert(baseline.count() > 0, "filter month selected no rows — vacuous test")
    withView {
      val routed = q(src)
      assert(scansMv(routed), s"filtered day query did not route:\n${routed.queryExecution.executedPlan}")
      assertSameRows(routed, baseline, "filtered-day")
    }
  }

  test("unprovable queries fall through: sub-hour grain, measure filter, distinct") {
    withView {
      val minuteGrain = src
        .groupBy(date_format(col("ts"), "yyyy-MM-dd HH:mm").as("minute"))
        .agg(count(lit(1)).as("n"))
      assert(!scansMv(minuteGrain), "a sub-hour grain must not route")

      val measureFilter = src.filter(col("value") > 10)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
      assert(!scansMv(measureFilter), "a measure predicate must not route")

      val distinctAgg = src
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(countDistinct(col("user_id")).as("nd"))
      assert(!scansMv(distinctAgg), "distinct aggregates must not route")
    }
  }

  test("q143: the GROUPING SETS build agrees with three routed single-grain queries") {
    val gs = graft.operators.EventAnalytics.calendarRollup(Tables(spark, sfDir).events)
      .select(col("gid"),
        coalesce(col("hour"), col("day"), col("month")).as("bucket"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    withView {
      for ((fmt, gid) <- Seq(("yyyy-MM-dd HH", 3L), ("yyyy-MM-dd", 5L), ("yyyy-MM", 6L))) {
        val routed = src.groupBy(date_format(col("ts"), fmt).as("bucket"))
          .agg(count(lit(1)).as("n"))
        assert(scansMv(routed))
        routed.collect().foreach { r =>
          assert(gs((gid, r.getString(0))) == r.getLong(1),
            s"grain $fmt bucket ${r.getString(0)}: MV route vs GROUPING SETS diverge")
        }
      }
    }
  }
}
