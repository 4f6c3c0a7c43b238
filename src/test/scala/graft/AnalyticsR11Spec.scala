package graft

import graft.operators.{EventAnalytics, StatTests, TopK}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Semantic invariants of the q327–q329 batch — hand-traceable planted
  * fixtures for properties the DuckDB oracle equality can't state. */
class AnalyticsR11Spec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- q327
  private def liWeek(rows: (Long, Long, Double, String)*) =
    // (orderkey, partkey, extendedprice, shipdate "yyyy-MM-dd")
    rows.toDF("l_orderkey", "l_partkey", "l_extendedprice", "ship")
      .withColumn("l_shipdate", to_timestamp(col("ship")))
      .withColumn("l_discount", lit(0.0))
      .drop("ship")

  test("q327: rank movement is computed only over parts present in both weeks") {
    // epoch weeks: 2024-01-01 = day 19723 → wk 2817 (Mon); 2024-01-08 → wk 2818
    // prev week: part 1 rev 100 (rank 1), part 2 rev 50 (rank 2), part 3 rev 10 (rank 3)
    // last week: part 2 rev 90 (rank 1), part 1 rev 80 (rank 2); part 4 rev 5 new (rank 3)
    val rows = liWeek(
      (1L, 1L, 100.0, "2024-01-01"), (1L, 2L, 50.0, "2024-01-01"),
      (1L, 3L, 10.0, "2024-01-01"),
      (2L, 2L, 90.0, "2024-01-08"), (2L, 1L, 80.0, "2024-01-08"),
      (2L, 4L, 5.0, "2024-01-08"))
    val out = TopK.trendingParts(rows).collect()
    assert(out.map(_.getAs[Long]("part")).toSet == Set(1L, 2L),
      "new part 4 and vanished part 3 have no prev/cur pair")
    val byPart = out.map(r => r.getAs[Long]("part") -> r).toMap
    assert(byPart(2L).getAs[Long]("rank_prev") == 2 && byPart(2L).getAs[Long]("rank_cur") == 1)
    assert(byPart(2L).getAs[Long]("rank_gain") == 1, "part 2 rose one rank")
    assert(byPart(1L).getAs[Long]("rank_gain") == -1, "part 1 fell one rank")
    // biggest riser first
    assert(out.head.getAs[Long]("part") == 2L)
    assert(byPart(2L).getAs[Double]("rev_cur") == 90.0 &&
      byPart(2L).getAs[Double]("rev_prev") == 50.0)
  }

  test("q327: earlier weeks never leak into the two-week ranking") {
    // a massive week-0 revenue for part 9 must not appear anywhere
    val rows = liWeek(
      (1L, 9L, 99999.0, "2023-06-05"),
      (2L, 1L, 10.0, "2024-01-01"), (2L, 2L, 20.0, "2024-01-01"),
      (3L, 1L, 30.0, "2024-01-08"), (3L, 2L, 5.0, "2024-01-08"))
    val out = TopK.trendingParts(rows).collect()
    assert(!out.exists(_.getAs[Long]("part") == 9L))
    assert(out.length == 2)
  }

  // ---------------------------------------------------------------- q328
  test("q328: the event in the rare (hour, dow, bin) cell gets the top HBOS score") {
    // 9 events at hour 10 Monday value≈0 (common cell), 1 event at hour 3
    // Sunday value 100 (every feature rare: density 0.1 each)
    val common = (1 to 9).map(i =>
      (i.toLong, "view", 0.0 + i * 0.001, Timestamp.valueOf("2024-01-01 10:00:00")))
    val rare = Seq((99L, "purchase", 100.0, Timestamp.valueOf("2024-01-07 03:00:00")))
    val ev = (common ++ rare).toDF("event_id", "event_type", "value", "ts")
    val out = EventAnalytics.hbosOutliers(ev, topN = 10).collect()
    assert(out.head.getAs[Long]("event_id") == 99L, "rare-cell event must rank first")
    // rare event: -3*ln(0.1) = 6.9078 after 4dp rounding
    assert(out.head.getAs[Double]("hbos_score") == 6.9078)
    // common events: -(2*ln(0.9) + ln(0.9)) = 0.3161  (they share all three bins)
    assert(out.tail.forall(_.getAs[Double]("hbos_score") == 0.3161))
  }

  test("q328: constant value column does not divide by zero (degenerate bin 0)") {
    val ev = (1 to 5).map(i =>
      (i.toLong, "view", 7.0, Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("event_id", "event_type", "value", "ts")
    val out = EventAnalytics.hbosOutliers(ev).collect()
    assert(out.length == 5)
    assert(out.forall(_.getAs[Long]("f_vbin") == 0L))
    assert(out.forall(_.getAs[Double]("hbos_score") == 0.0),
      "all-identical events have density 1 in every feature → score 0")
  }

  // ---------------------------------------------------------------- q329
  test("q329: on a perfectly repeating weekly series, snaive7 has zero error and wins") {
    // 56 days of a strict period-7 pattern → snaive7 forecasts exactly;
    // naive / ewma / holt all carry day-to-day error
    val pattern = Array(100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0)
    val days = (0 until 56).map { i =>
      (i.toLong, 1L, "F", pattern(i % 7),
        Timestamp.valueOf(f"2024-01-01 00:00:00").toLocalDateTime.plusDays(i)
          .toString.replace('T', ' ') + ":00")
    }.map { case (k, c, s, p, d) => (k, c, s, p, Timestamp.valueOf(d)) }
    val orders = days.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate")
    val out = StatTests.forecastTournament(orders).collect()
    assert(out.length == 4 && out.map(_.getAs[String]("model")).toSet ==
      Set("naive", "snaive7", "ewma", "holt"))
    val best = out.head
    assert(best.getAs[String]("model") == "snaive7")
    assert(best.getAs[Double]("mae") == 0.0 && best.getAs[Double]("rmse") == 0.0)
    assert(best.getAs[Double]("mase") == 0.0)
    assert(out.forall(_.getAs[Long]("n_test") == 14L), "test window = n/4 = 14 days")
    // the naive model's MASE is ~1 by construction when train/test errors match scale
    val naive = out.find(_.getAs[String]("model") == "naive").get
    assert(naive.getAs[Double]("mae") > 0.0)
  }

  test("q329: on a constant series every model is perfect after warmup") {
    val days = (0 until 40).map { i =>
      (i.toLong, 1L, "F", 500.0,
        Timestamp.valueOf("2024-01-01 00:00:00").toLocalDateTime.plusDays(i))
    }.map { case (k, c, s, p, d) =>
      (k, c, s, p, Timestamp.valueOf(d.toLocalDate.atStartOfDay())) }
    val orders = days.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate")
    val out = StatTests.forecastTournament(orders).collect()
    assert(out.forall(_.getAs[Double]("mae") == 0.0),
      s"constant series → zero test error for all models: ${out.mkString(";")}")
  }
}
