package graft

import graft.operators.{Audit, Graph, Recommend, StatTests}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Semantic invariants of the q322–q326 batch — hand-traceable planted
  * fixtures for properties the DuckDB oracle equality can't state. */
class AnalyticsR10Spec extends SparkSpec {
  import spark.implicits._

  private def li(rows: (Long, Int, Long, Long, Double, Double, String)*) =
    rows.toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_returnflag")
      .withColumn("l_discount", lit(0.0))
      .withColumn("l_tax", lit(0.0))
      .withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate", lit(Timestamp.valueOf("2024-01-01 00:00:00")))

  test("q322: replayed vs divergent duplicate keys are told apart") {
    val rows = li(
      (1L, 1, 10L, 1L, 5.0, 100.0, "N"), // key (1,1) x2, identical → replay
      (1L, 1, 10L, 1L, 5.0, 100.0, "N"),
      (2L, 1, 10L, 1L, 5.0, 100.0, "N"), // key (2,1) x2, divergent measures
      (2L, 1, 11L, 1L, 7.0, 200.0, "R"),
      (3L, 1, 12L, 1L, 1.0, 50.0, "N")) // unique
    val audit = Audit.duplicateKeyAudit(rows).collect()
    val m1 = audit.find(_.getAs[Long]("multiplicity") == 1L).get
    val m2 = audit.find(_.getAs[Long]("multiplicity") == 2L).get
    assert(m1.getAs[Long]("n_keys") == 1 && m1.getAs[Long]("n_divergent_keys") == 0)
    assert(m2.getAs[Long]("n_keys") == 2, "two keys occur twice")
    assert(m2.getAs[Long]("n_divergent_keys") == 1,
      "exactly the key with differing measures is divergent")
    assert(m2.getAs[Long]("n_rows") == 4 && m2.getAs[Double]("row_share") == 0.8)
  }

  test("q323: triangle corner vs triangle edge nodes get the hand-computed coefficients") {
    // orders 1,2 buy {1,2,3} (triangle, support 2); orders 3,4 buy {1,4}
    // (pendant edge on node 1) → cc(1)=2·1/(3·2)=1/3, cc(2)=cc(3)=1, node 4 d=1 dropped
    val rows = li(
      (1L, 1, 1L, 1L, 1, 1, "N"), (1L, 2, 2L, 1L, 1, 1, "N"), (1L, 3, 3L, 1L, 1, 1, "N"),
      (2L, 1, 1L, 1L, 1, 1, "N"), (2L, 2, 2L, 1L, 1, 1, "N"), (2L, 3, 3L, 1L, 1, 1, "N"),
      (3L, 1, 1L, 1L, 1, 1, "N"), (3L, 2, 4L, 1L, 1, 1, "N"),
      (4L, 1, 1L, 1L, 1, 1, "N"), (4L, 2, 4L, 1L, 1, 1, "N"))
    val cc = Graph.localClusteringCoefficient(rows).collect()
      .map(r => r.getAs[Long]("part") -> r).toMap
    assert(cc.keySet == Set(1L, 2L, 3L), s"degree-1 node 4 must be dropped, got ${cc.keySet}")
    assert(cc(1L).getAs[Double]("local_cc") == 0.3333 && cc(1L).getAs[Long]("degree") == 3)
    assert(cc(2L).getAs[Double]("local_cc") == 1.0 && cc(2L).getAs[Long]("n_triangles") == 1)
    assert(cc(3L).getAs[Double]("local_cc") == 1.0)
  }

  test("q324: constant sizes and intervals reproduce themselves exactly (EWMA mass sums to 1)") {
    // part 7: demand 10.0 every second week, 6 events → z=10, p=2, rate=5 exactly
    // part 8: only 3 events → below minEvents, excluded
    val rows = (0 until 6).map { k =>
      (100L + k, 1, 7L, 1L, 10.0, 1.0, "N", Timestamp.valueOf(s"2024-01-0${1 + k} 00:00:00"))
    }
    val df = rows.toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_returnflag", "ship")
      .withColumn("l_shipdate",
        expr("timestampadd(WEEK, 2 * CAST(l_orderkey - 100 AS INT), timestamp'2024-01-01 00:00:00')"))
      .drop("ship")
      .unionByName(
        (0 until 3).map(k => (200L + k, 1, 8L, 1L, 5.0, 1.0, "N"))
          .toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_returnflag")
          .withColumn("l_shipdate",
            expr("timestampadd(WEEK, 2 * CAST(l_orderkey - 200 AS INT), timestamp'2024-01-01 00:00:00')")))
    val out = StatTests.crostonDemand(df).collect()
    assert(out.length == 1, s"only the 6-event part qualifies, got ${out.mkString(";")}")
    val r = out.head
    assert(r.getAs[Long]("part") == 7L && r.getAs[Long]("n_events") == 6L)
    assert(r.getAs[Double]("size_ewma") == 10.0, "constant sizes → EWMA = the constant")
    assert(r.getAs[Double]("interval_ewma") == 2.0, "constant 2-week gaps → EWMA = 2")
    assert(r.getAs[Double]("demand_rate") == 5.0)
  }

  test("q326: hand-traced holdout — only the customer with a candidate is evaluated, and hits") {
    val d1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val d2 = Timestamp.valueOf("2024-02-01 00:00:00")
    val orders = Seq(
      (11L, 1L, "F", 10.0, d1, "1-URGENT"), (12L, 1L, "F", 10.0, d2, "1-URGENT"),
      (21L, 2L, "F", 10.0, d1, "1-URGENT"), (22L, 2L, "F", 10.0, d2, "1-URGENT"),
      (31L, 3L, "F", 10.0, d1, "1-URGENT"), (32L, 3L, "F", 10.0, d2, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    // train baskets: cust1 {1,2}, cust2 {1,2}, cust3 {1} → edge (1,2) support 2
    // cust1/cust2 own both endpoints → no candidates; cust3 gets rec part 2,
    // and their holdout order 32 contains part 2 → hit at rank 1
    val lines = li(
      (11L, 1, 1L, 1L, 1, 1, "N"), (11L, 2, 2L, 1L, 1, 1, "N"),
      (21L, 1, 1L, 1L, 1, 1, "N"), (21L, 2, 2L, 1L, 1, 1, "N"),
      (31L, 1, 1L, 1L, 1, 1, "N"),
      (12L, 1, 3L, 1L, 1, 1, "N"), (22L, 1, 3L, 1L, 1, 1, "N"),
      (32L, 1, 2L, 1L, 1, 1, "N"))
    val r = Recommend.lastOrderHitRate(orders, lines).first()
    assert(r.getAs[Long]("n_customers") == 1, s"only cust3 has candidates: $r")
    assert(r.getAs[Long]("hits_at_1") == 1 && r.getAs[Long]("hits_at_k") == 1)
    assert(r.getAs[Double]("hit_rate_1") == 1.0 && r.getAs[Double]("hit_rate_k") == 1.0)
  }

  test("q326: hit rates are bounded and k=1 never beats k=3 on the real tables") {
    val t = graft.sources.Tables(spark, sfDir)
    val r = Recommend.lastOrderHitRate(t.orders, t.lineitem).first()
    val h1 = r.getAs[Double]("hit_rate_1")
    val hk = r.getAs[Double]("hit_rate_k")
    assert(h1 >= 0.0 && h1 <= 1.0 && hk >= 0.0 && hk <= 1.0)
    assert(h1 <= hk, "widening the rec list cannot lose hits")
    assert(r.getAs[Long]("n_customers") > 0)
  }
}
