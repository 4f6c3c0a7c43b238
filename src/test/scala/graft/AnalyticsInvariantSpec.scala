package graft

import graft.operators.{EventAnalytics, Relational, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Semantic invariants of the q85–q93 family — properties the DuckDB
  * oracle equality can't state (it would just repeat the computation). */
class AnalyticsInvariantSpec extends SparkSpec {
  lazy val t = Tables(spark, sfDir)

  test("q91: the split actually prevents leakage — no user appears in both splits") {
    val straddlers = EventAnalytics
      .leakageSplit(t.events)
      .select("split")
      .distinct()
      .count()
    assert(straddlers == 2, "expected exactly train and val splits")
    val byUser = t.events
      .withColumn(
        "split",
        when(substring(md5(col("user_id").cast("string")), 1, 1).isin("0", "1", "2"), "val")
          .otherwise("train"))
      .groupBy("user_id")
      .agg(countDistinct("split").as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(byUser.count() == 0, "a user straddles the train/val boundary")
  }

  test("q85: transition conservation — total transitions = events - users") {
    val total = EventAnalytics.transitionMatrix(t.events)
      .agg(sum("n_transitions")).first().getLong(0)
    val nEvents = t.events.count()
    val nUsers  = t.events.select("user_id").distinct().count()
    assert(total == nEvents - nUsers, s"$total transitions vs ${nEvents - nUsers} expected")
  }

  test("q90: MAD bound — strictly fewer than half the rows can be k-MAD outliers") {
    val rows = Relational.robustOutliers(t.events).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val outliers = r.getAs[Long]("n_outliers")
      val n        = r.getAs[Long]("n_events")
      assert(outliers < n / 2.0, s"${r.getString(0)}: $outliers outliers of $n rows")
      assert(r.getAs[Double]("mad_value") >= 0.0)
    }
  }

  test("q88: assignment is a partition — cluster sizes sum to the non-centroid corpus") {
    val rows  = Similarity.centroidAssign(t.embeddings).collect()
    val total = t.embeddings.filter(col("vec_id") >= 8).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    rows.foreach { r =>
      val c = r.getAs[Double]("avg_cos")
      assert(c >= -1.0001 && c <= 1.0001, s"avg cosine out of range: $c")
    }
  }

  test("q93: profile stats agree with direct queries") {
    val prof = Relational
      .profileColumns(t.orders, Seq("o_orderkey", "o_orderstatus"))
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    assert(prof("o_orderkey").getAs[Long]("n_distinct") == t.orders.count(),
      "o_orderkey must be unique per order")
    assert(prof("o_orderkey").getAs[Long]("n_nulls") == 0)
    val statuses = t.orders.select("o_orderstatus").distinct().count()
    assert(prof("o_orderstatus").getAs[Long]("n_distinct") == statuses)
  }

  test("q89: month-over-month anchors at zero and reconstructs the total") {
    val rows = Relational.monthOverMonth(t.orders).collect()
    assert(rows.head.getAs[Double]("pct_change") == 0.0, "first month must report 0 change")
    val total    = rows.map(_.getAs[Double]("revenue")).sum
    val expected = t.orders.agg(sum("o_totalprice")).first().getDouble(0)
    assert(math.abs(total - expected) < 1.0, s"monthly revenues don't sum to the total")
  }

  test("q92: pair counts are bounded by each part's own order count") {
    val pairs = Relational.coPurchase(t.lineitem, topN = 5).collect()
    val perPart = t.lineitem
      .select(col("l_partkey"), col("l_orderkey"))
      .distinct()
      .groupBy("l_partkey")
      .count()
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    pairs.foreach { r =>
      val (a, b, n) = (r.getLong(0), r.getLong(1), r.getAs[Long]("n_orders"))
      assert(a < b, "canonical pair order violated")
      assert(n <= math.min(perPart(a), perPart(b)), s"pair ($a,$b) counted more orders than either part has")
    }
  }
}
