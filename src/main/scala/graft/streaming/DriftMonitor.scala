package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.StatTests

/** stream_psi: ingest-time drift monitoring — the streaming dual of
  * q240's batch PSI. Each micro-batch persists its OWN (feature, value)
  * count slice under `ingest_batch=N` (dynamic partition overwrite, the
  * sink's idempotency rule — counts are additive, so merge-on-write
  * would double-count under a retried batch; merging at read time over
  * feature-cardinality rows is free and exactly-once by construction —
  * the same design as the CMS/t-digest tables in [[SketchMaintenance]]).
  *
  * The drift report then joins the merged live counts against a FROZEN
  * baseline count table (written once from the reference period) and
  * scores PSI per feature with exactly q240's smoothing — the batch
  * query and the monitor share the featurization and the PSI kernel
  * ([[StatTests.featurizeOrders]] / [[StatTests.psiFromCells]]), so a
  * threshold tuned on the batch report transfers to ingest unchanged.
  *
  * Scale shape: state is the count table — Σ feature cardinalities × a
  * few batches of KB-sized rows, never event-sized; the report is a
  * cell-cardinality join. At 100 TB/day the monitor costs one stack +
  * map-side count per batch and a trivial read-side merge.
  */
object DriftMonitor {

  /** One micro-batch's (feature, value) counts → its own partition. */
  def updateCountTable(batch: DataFrame, tablePath: String, batchId: Long): Unit =
    StatTests.featurizeOrders(batch)
      .groupBy("feature", "value")
      .agg(count(lit(1)).as("n"))
      .withColumn("ingest_batch", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("ingest_batch")
      .parquet(tablePath)

  /** Freeze the baseline period's counts (written once, read by every
    * report). */
  def writeBaseline(reference: DataFrame, baselinePath: String): Unit =
    StatTests.featurizeOrders(reference)
      .groupBy("feature", "value")
      .agg(count(lit(1)).as("nb"))
      .write.mode("overwrite").parquet(baselinePath)

  /** PSI per feature: merged live counts vs the frozen baseline.
    * Full-outer on (feature, value) so a value seen on only one side
    * still contributes (the Laplace smoothing keeps it finite) —
    * exactly the cell set q240 would build from the union. The value
    * join is NULL-SAFE (`<=>`): batch q240's groupBy merges NULL
    * feature values into one cell, and a plain equi-join would split
    * that cell in two here, silently inflating k_buckets and breaking
    * the documented batch ≡ streamed equivalence. */
  def psiReport(spark: SparkSession, tablePath: String, baselinePath: String): DataFrame = {
    val live = spark.read.parquet(tablePath)
      .groupBy("feature", "value")
      .agg(sum("n").as("nc"))
      .withColumnsRenamed(Map("feature" -> "lf", "value" -> "lv"))
    val base = spark.read.parquet(baselinePath)
    val cells = base
      .join(live, col("feature") <=> col("lf") && col("value") <=> col("lv"), "full_outer")
      .select(
        coalesce(col("feature"), col("lf")).as("feature"),
        coalesce(col("value"), col("lv")).as("value"),
        coalesce(col("nb"), lit(0L)).as("nb"),
        coalesce(col("nc"), lit(0L)).as("nc"))
    StatTests.psiFromCells(cells)
  }
}
