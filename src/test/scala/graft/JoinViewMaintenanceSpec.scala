package graft

import graft.plans.JoinViewMaintenance._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** mv_join_maintenance: counting-algorithm (z-set) incremental join
  * view — refresh(V, Δ) must equal recompute for every base state,
  * inserts and deletes alike, and the delta plan must never re-join
  * base against base. */
class JoinViewMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def ordersF(rows: (Long, Long, Double)*) =
    weighted(rows.toDF("o_orderkey", "cust", "total"))
  private def custF(rows: (Long, String)*) =
    weighted(rows.toDF("cust", "segment"))

  private def asSet(df: DataFrame): Set[(Long, Long, Double, String, Long)] =
    df.collect().map(r => (
      r.getAs[Long]("o_orderkey"), r.getAs[Long]("cust"), r.getAs[Double]("total"),
      r.getAs[String]("segment"), r.getAs[Long]("__w"))).toSet

  test("insert delta: refresh equals recompute, and only the new rows join") {
    val a0 = ordersF((1L, 10L, 5.0), (2L, 11L, 7.0))
    val b0 = custF((10L, "BLD"), (11L, "MCH"))
    val v0 = consolidate(joinView(a0, b0, Seq("cust")))
    // new order for an existing customer + a brand-new customer with order
    val dA = ordersF((3L, 10L, 9.0), (4L, 12L, 1.0))
    val dB = custF((12L, "AUTO"))
    val v1 = refresh(v0, delta(a0, dA, b0, dB, Seq("cust")))
    val recomputed = consolidate(joinView(
      consolidate(a0.unionByName(dA)), consolidate(b0.unionByName(dB)), Seq("cust")))
    assert(asSet(v1) == asSet(recomputed), "incremental refresh diverged from recompute")
    assert(asSet(v1).map(_._1) == Set(1L, 2L, 3L, 4L))
  }

  test("delete delta: a retracted order and a retracted customer annihilate their rows") {
    val a0 = ordersF((1L, 10L, 5.0), (2L, 11L, 7.0), (3L, 11L, 2.0))
    val b0 = custF((10L, "BLD"), (11L, "MCH"))
    val v0 = consolidate(joinView(a0, b0, Seq("cust")))
    // retract order 1; retract customer 11 entirely (cascades to 2 and 3)
    val dA = negated(ordersF((1L, 10L, 5.0)))
    val dB = negated(custF((11L, "MCH")))
    val v1 = refresh(v0, delta(a0, dA, b0, dB, Seq("cust")))
    assert(asSet(v1).isEmpty, s"every view row should annihilate, got ${asSet(v1)}")
    val recomputed = consolidate(joinView(
      consolidate(a0.unionByName(dA)), consolidate(b0.unionByName(dB)), Seq("cust")))
    assert(asSet(recomputed).isEmpty)
  }

  test("mixed churn over 3 rounds stays equivalent to recompute (incl. ΔA⋈ΔB cross term)") {
    var a = ordersF((1L, 10L, 5.0))
    var b = custF((10L, "BLD"))
    var v = consolidate(joinView(a, b, Seq("cust")))
    val rounds = Seq(
      // insert order+customer together: only the ΔA⋈ΔB term can produce this row
      (ordersF((2L, 20L, 8.0)), custF((20L, "MCH"))),
      // delete that order, insert another for the same new customer
      (negated(ordersF((2L, 20L, 8.0))).unionByName(ordersF((3L, 20L, 6.0))), custF()),
      // retract the original customer
      (ordersF(), negated(custF((10L, "BLD")))))
    rounds.foreach { case (dA, dB) =>
      v = refresh(v, delta(a, dA, b, dB, Seq("cust")))
      a = consolidate(a.unionByName(dA))
      b = consolidate(b.unionByName(dB))
      val rec = consolidate(joinView(a, b, Seq("cust")))
      assert(asSet(v) == asSet(rec), "drifted from recompute mid-sequence")
    }
    assert(asSet(v).map(_._1) == Set(3L), "only order 3 (cust 20) survives the churn")
  }

  test("the delta plan probes bases with broadcast deltas and never joins base⋈base") {
    val a0 = ordersF((1L to 200L).map(i => (i, i % 20, i.toDouble)): _*)
    val b0 = custF((0L until 20L).map(i => (i, s"S$i")): _*)
    val dA = ordersF((201L, 3L, 1.0))
    val dB = custF((20L, "NEW"))
    val d = delta(a0, dA, b0, dB, Seq("cust"))
    val plan = d.queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts == 3, s"all three delta terms must broadcast the delta side:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no base-sized shuffle join belongs in a delta:\n$plan")
  }
}
