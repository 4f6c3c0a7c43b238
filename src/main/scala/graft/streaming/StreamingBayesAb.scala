package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** stream_bayes_ab: the live experiment dashboard — the streaming dual
  * of q394's Bayesian A/B, built on the [[StreamingLabelerKappa]] /
  * [[StreamingTokenDrift]] count-table discipline: each micro-batch
  * persists its per-arm exposure/conversion counts under
  * `ingest_batch=N` (dynamic partition overwrite — the four counts are
  * ADDITIVE longs, so merge-on-write would double-count under a retried
  * batch; summing #batches rows at read time is free and exactly-once
  * by construction), and the report runs the SAME Jeffreys-normal
  * kernel as batch q394 ([[Relational.bayesAbFromCounts]]) — integer
  * counts make the parity BIT-exact, and the 0.95 ship threshold tuned
  * on the batch report transfers to the monitor unchanged.
  *
  * Unlike a p-value, the posterior P(A>B) is legitimately peek-able
  * under a fixed decision threshold far more gracefully than repeated
  * z-tests (the always-valid alternative is q333's mSPRT) — which is
  * exactly why the STREAMING surface wants this metric. */
object StreamingBayesAb {

  /** One micro-batch's count slice → its own partition (idempotent
    * under replay: a retried batch overwrites exactly its own slice). */
  def updateCountTable(batch: DataFrame, tablePath: String, batchId: Long): Unit =
    Relational.bayesArmCounts(batch)
      .withColumn("ingest_batch", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("ingest_batch")
      .parquet(tablePath)

  /** Posterior report over everything ingested so far — identical
    * output schema and values to batch q394 on the same events. */
  def posteriorReport(spark: SparkSession, tablePath: String): DataFrame =
    Relational.bayesAbFromCounts(spark.read.parquet(tablePath))
}
