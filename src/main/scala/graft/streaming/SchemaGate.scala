package graft.streaming

import graft.plans.SchemaCompat
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** stream_schema_gate: the q317 data-contract check applied AT INGEST —
  * each micro-batch's schema is diffed against the table's established
  * contract before any row lands: compatible batches write through
  * (projected onto the contract: extra nullable columns dropped,
  * widened types cast back, missing nullable contract columns filled
  * with null), breaking batches divert WHOLE to a quarantine area with
  * the machine-readable diff — the schema sibling of the sink's
  * row-level rule quarantine, and the runtime half of
  * sink_schema_evolution (which merges schemas the gate has ACCEPTED).
  *
  * Batch-granular by design: a schema break means the producer
  * changed — mixing its rows into the table corrupts every downstream
  * reader, while quarantining preserves them byte-complete for replay
  * once the contract is amended. Both paths write `ingest_batch=N`
  * partitions (dynamic overwrite ⇒ replay-idempotent, the sink's
  * exactly-once idiom).
  *
  * 100 TB posture: the gate itself is METADATA-ONLY (a #fields diff per
  * micro-batch — no per-row schema work); the projection is a
  * column-level select Catalyst folds into the write. */
class SchemaGate(
    spark: SparkSession,
    contract: StructType,
    rootPath: String) extends Serializable {

  val acceptedPath: String = s"$rootPath/accepted"
  val schemaQuarantinePath: String = s"$rootPath/schema_quarantine"

  /** Project an accepted batch onto the contract: contract columns in
    * contract order, widened types cast to the contract type, missing
    * NULLABLE contract columns as typed nulls, extras dropped. */
  private[streaming] def project(batch: DataFrame): DataFrame = {
    val present = batch.columns.toSet
    batch.select(contract.fields.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Route one micro-batch. Returns true if accepted. */
  def gateBatch(batch: DataFrame, batchId: Long): Boolean = {
    val ok = SchemaCompat.admissible(contract, batch.schema)
    if (ok) {
      project(batch)
        .withColumn("ingest_batch", lit(batchId))
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(acceptedPath)
    } else {
      val diffs = SchemaCompat.dataDiff(contract, batch.schema)
        .filter(_.verdict == "breaking")
        .map(d => s"${d.field}:${d.change}")
        .mkString(";")
      batch
        .withColumn("ingest_batch", lit(batchId))
        .withColumn("schema_violation", lit(diffs))
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(schemaQuarantinePath)
    }
    ok
  }

  /** Attach the gate to a stream. */
  def start(stream: DataFrame, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        gateBatch(batch, batchId): Unit
      }
      .start()

  /** Rows that passed the gate, read back under the contract. */
  def readAccepted(): DataFrame = spark.read.parquet(acceptedPath)

  /** Quarantined batches with their violation tags. */
  def readSchemaQuarantine(): DataFrame = spark.read.parquet(schemaQuarantinePath)
}
