package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** stream_labeler_kappa: ingest-time rater-agreement monitoring — the
  * streaming dual of q374's Cohen's κ, built exactly like
  * [[StreamingTokenDrift]] (stream_token_drift): each micro-batch
  * persists its own 2×2 contingency slice under `ingest_batch=N`
  * (dynamic partition overwrite — the four cells are ADDITIVE longs, so
  * merge-on-write would double-count under a retried batch; summing at
  * read time over #batches rows is free and exactly-once by
  * construction), and the report sums the cells through the SAME
  * po/pe/κ kernel the batch query uses
  * ([[TextAnalysis.kappaFromCells]]) — integer cells make the parity
  * BIT-EXACT, and an agreement threshold tuned on the batch report
  * transfers to ingest unchanged.
  *
  * Scale shape: state is one 4-cell row per micro-batch — O(#batches),
  * never document-sized; each batch pays one map pass + one scalar
  * aggregate over its own rows. */
object StreamingLabelerKappa {

  /** One micro-batch's contingency slice → its own partition
    * (idempotent under replay: a retried batch overwrites exactly its
    * own slice). */
  def updateCellTable(
      batch: DataFrame,
      tablePath: String,
      batchId: Long,
      lenThresh: Int = 400,
      tokThresh: Int = 60): Unit =
    TextAnalysis.labelerCells(batch, lenThresh, tokThresh)
      .withColumn("ingest_batch", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("ingest_batch")
      .parquet(tablePath)

  /** Agreement report over everything ingested so far — identical
    * output schema and values to the batch q374 on the same corpus. */
  def agreementReport(spark: SparkSession, tablePath: String): DataFrame =
    TextAnalysis.kappaFromCells(spark.read.parquet(tablePath))
}
