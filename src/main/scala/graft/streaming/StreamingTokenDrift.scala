package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens
import graft.operators.TextAnalysis

/** stream_token_drift: ingest-time VOCABULARY drift monitoring — the
  * streaming dual of q359's batch token-drift report, built exactly like
  * [[DriftMonitor]] (stream_psi): each micro-batch persists its own
  * token-count slice under `ingest_batch=N` (dynamic partition
  * overwrite — counts are additive, so merge-on-write would
  * double-count under a retried batch; merging at read time over
  * vocabulary-cardinality rows is free and exactly-once by
  * construction), and the report joins merged live counts against a
  * FROZEN baseline vocabulary through the SAME chi-square kernel the
  * batch query uses ([[TextAnalysis.tokenDriftFromCounts]]) — a
  * threshold tuned on the batch report transfers to ingest unchanged.
  *
  * Scale shape: state is the count table — vocabulary-cardinality rows
  * per batch (hapax tail included but tiny), never document-sized; the
  * report is a token-grain full-outer join + a 1-row scalar. At
  * 100 TB/day the monitor costs one explode + map-side-combinable count
  * per batch. */
object StreamingTokenDrift {

  private def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))

  /** One micro-batch's token counts → its own partition (idempotent
    * under replay: a retried batch overwrites exactly its own slice). */
  def updateCountTable(batch: DataFrame, tablePath: String, batchId: Long): Unit =
    tokenCounts(batch)
      .withColumn("ingest_batch", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("ingest_batch")
      .parquet(tablePath)

  /** Freeze the reference corpus's vocabulary counts (written once,
    * read by every report). */
  def writeBaseline(reference: DataFrame, baselinePath: String): Unit =
    tokenCounts(reference)
      .withColumnRenamed("n", "nb")
      .write.mode("overwrite").parquet(baselinePath)

  /** Drift report: merged live counts (side A) vs the frozen baseline
    * (side B), full-outer on token with zero-fill so a token seen on
    * only one side still contributes — the cell set q359's parity
    * split would build, scored by the identical kernel. */
  def driftReport(
      spark: SparkSession,
      tablePath: String,
      baselinePath: String,
      minCount: Long = 20,
      topN: Int = 50): DataFrame = {
    val live = spark.read.parquet(tablePath)
      .groupBy("token").agg(sum("n").as("na"))
      .withColumnRenamed("token", "lt")
    val base = spark.read.parquet(baselinePath)
    val counts = base
      .join(live, col("token") === col("lt"), "full_outer")
      .select(
        coalesce(col("token"), col("lt")).as("token"),
        coalesce(col("na"), lit(0L)).as("cnt_a"),
        coalesce(col("nb"), lit(0L)).as("cnt_b"))
    TextAnalysis.tokenDriftFromCounts(counts, minCount, topN)
  }
}
