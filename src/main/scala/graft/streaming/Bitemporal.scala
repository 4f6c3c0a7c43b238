package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bitemporal reads — VALID time × TRANSACTION time — composed from the
  * two halves the library already maintains: SCD2 dimensions carry
  * valid-time intervals ([[graft.operators.EventAnalytics.scd2Build]]'s
  * `valid_from_us`/`valid_to_us`), and [[SnapshotStore]] versions are
  * transaction time (each maintenance/merge publishes an immutable
  * snapshot). `asOf(snapshot, validAtUs)` answers the audit question a
  * single-dimension read cannot: "what did we BELIEVE at publish time
  * T about the state at valid time V?" — a late correction lands in a
  * NEW snapshot, so the old belief stays readable (reproducing a
  * historical model run / regulatory report exactly), while current
  * reads see the corrected history.
  *
  * Scale shape: transaction-time selection is pointer resolution (no
  * data read); valid-time selection is a plain filter on the interval
  * columns, pushed to the snapshot's parquet scan. */
object Bitemporal {

  /** The rows valid at `validAtUs` as recorded by `snapName` (a
    * [[SnapshotStore]] version under `partDir`). Current rows have a
    * NULL `valid_to_us` and match any time ≥ their start. */
  def asOf(
      spark: SparkSession,
      partDir: String,
      snapName: String,
      validAtUs: Long): DataFrame =
    SnapshotStore.readAt(spark, partDir, snapName)
      .filter(col("valid_from_us") <= validAtUs &&
        (col("valid_to_us").isNull || col("valid_to_us") > validAtUs))

  /** Same valid-time cut against the CURRENT snapshot. */
  def asOfCurrent(spark: SparkSession, partDir: String, validAtUs: Long): DataFrame = {
    val snap = SnapshotStore.current(spark, partDir)
      .getOrElse(throw new IllegalStateException(s"no snapshot under $partDir"))
    asOf(spark, partDir, snap, validAtUs)
  }
}
