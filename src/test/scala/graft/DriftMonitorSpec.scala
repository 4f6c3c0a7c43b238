package graft

import graft.operators.StatTests
import graft.sources.Tables
import graft.streaming.DriftMonitor
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** stream_psi: the incrementally maintained count table + frozen
  * baseline reproduce the batch q240 PSI exactly, and a replayed batch
  * cannot double-count. */
class DriftMonitorSpec extends SparkSpec {
  lazy val t = Tables(spark, sfDir)

  test("incremental batches + baseline ≡ batch PSI; replay is idempotent") {
    val table = Files.createTempDirectory("graft-psi").toString
    val baseline = Files.createTempDirectory("graft-psi-base").toString
    val cut = to_date(lit("1998-01-01"))
    val ref = t.orders.filter(to_date(col("o_orderdate")) < cut)
    val cur = t.orders.filter(to_date(col("o_orderdate")) >= cut)

    DriftMonitor.writeBaseline(ref, baseline)
    // the current period arrives in 3 micro-batches
    (0 until 3).foreach { b =>
      DriftMonitor.updateCountTable(cur.filter(col("o_orderkey") % 3 === b), table, batchId = b)
    }
    // replay batch 1 (simulated retry) — overwrites its own slice only
    DriftMonitor.updateCountTable(cur.filter(col("o_orderkey") % 3 === 1), table, batchId = 1)

    val streamed = DriftMonitor.psiReport(spark, table, baseline)
      .collect().map(r => r.getAs[String]("feature") ->
        (r.getAs[Long]("n_baseline"), r.getAs[Long]("n_current"), r.getAs[Double]("psi"))).toMap
    val batch = StatTests.psiDrift(t.orders)
      .collect().map(r => r.getAs[String]("feature") ->
        (r.getAs[Long]("n_baseline"), r.getAs[Long]("n_current"), r.getAs[Double]("psi"))).toMap

    assert(streamed === batch, "streamed PSI diverges from the batch query")
    assert(streamed.nonEmpty && streamed.keySet === Set("price_bucket", "priority", "status"))
  }

  test("regression: a NULL feature value stays ONE cell (null-safe join), matching batch") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-psi3").toString
    val baseline = Files.createTempDirectory("graft-psi3-base").toString
    // identical single order with NULL priority on both sides → PSI 0;
    // a null-unsafe join would split the NULL cell and score > 0
    def orders() =
      Seq((java.sql.Timestamp.valueOf("1997-01-01 00:00:00"), 10000.0,
        null.asInstanceOf[String], "O"))
        .toDF("o_orderdate", "o_totalprice", "o_orderpriority", "o_orderstatus")
    DriftMonitor.writeBaseline(orders(), baseline)
    DriftMonitor.updateCountTable(orders(), table, batchId = 0)
    val pr = DriftMonitor.psiReport(spark, table, baseline)
      .collect().map(r => r.getAs[String]("feature") ->
        (r.getAs[Long]("k_buckets"), r.getAs[Double]("psi"))).toMap
    assert(pr("priority") === ((1L, 0.0)), s"NULL cell split: ${pr("priority")}")
  }

  test("a value unseen in the baseline still scores (smoothing keeps it finite)") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-psi2").toString
    val baseline = Files.createTempDirectory("graft-psi2-base").toString
    def orders(priority: String) =
      Seq((java.sql.Timestamp.valueOf("1997-01-01 00:00:00"), 10000.0, priority, "O"))
        .toDF("o_orderdate", "o_totalprice", "o_orderpriority", "o_orderstatus")
    DriftMonitor.writeBaseline(orders("1-URGENT"), baseline)
    DriftMonitor.updateCountTable(orders("5-LOW"), table, batchId = 0)
    val pr = DriftMonitor.psiReport(spark, table, baseline)
      .collect().map(r => r.getAs[String]("feature") -> r.getAs[Double]("psi")).toMap
    assert(pr("priority") > 0.0 && !pr("priority").isInfinite)
    assert(pr("status") === 0.0) // same single status both sides
  }
}
