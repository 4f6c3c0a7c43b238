package graft.streaming

import graft.plans.JoinViewMaintenance
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming maintenance of a JOIN materialized view — the ingest-time
  * consumer of [[graft.plans.JoinViewMaintenance]]'s counting algorithm:
  * a weighted delta feed (insert +1 / retract −1 rows, tagged with the
  * base table they hit) drives `foreachBatch`, and every micro-batch
  * advances the view by the delta-proportional
  * ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — the view is never re-joined from
  * scratch, which is the entire point of materializing it.
  *
  * Why `foreachBatch` and not a stream-stream join: the maintained view
  * must support RETRACTIONS (a −1 delta annihilates its +1), and
  * append-mode stream joins cannot un-emit a row; the counting
  * algorithm handles both signs uniformly at delta cost.
  *
  * State anatomy: base snapshots A, B and the view V. In this
  * in-process form they are lineage-truncated DataFrames
  * (localCheckpoint per batch — O(1) plan depth across any number of
  * batches, the BoundedIteration discipline); a deployment lands the
  * same three frames as parquet via [[HiveBatchSink]]'s idempotent
  * `ingest_batch` overwrite, making replayed batches converge to the
  * same state (the sink's exactly-once rule — the algebra is
  * replay-safe because a re-applied batch overwrites, never re-adds). */
final class StreamingJoinMv(keys: Seq[String], aInit: DataFrame, bInit: DataFrame) {

  import JoinViewMaintenance._

  @volatile private var aState = consolidate(aInit).localCheckpoint(true)
  @volatile private var bState = consolidate(bInit).localCheckpoint(true)
  @volatile private var vState =
    consolidate(joinView(aState, bState, keys)).localCheckpoint(true)

  def view: DataFrame = vState
  def baseA: DataFrame = aState
  def baseB: DataFrame = bState

  /** The foreachBatch handler: `batch` carries a `side` tag ('A'|'B'),
    * the union of both base schemas (columns of the other side null),
    * and the signed `__w`. */
  def applyBatch(batch: DataFrame, aCols: Seq[String], bCols: Seq[String]): Unit = {
    val dA = batch.filter(col("side") === "A")
      .select((aCols :+ "__w").map(col): _*)
    val dB = batch.filter(col("side") === "B")
      .select((bCols :+ "__w").map(col): _*)
    val dV = delta(aState, dA, bState, dB, keys)
    // advance the view FIRST (it reads the OLD base states), then the bases
    vState = consolidate(vState.unionByName(dV)).localCheckpoint(true)
    aState = consolidate(aState.unionByName(dA)).localCheckpoint(true)
    bState = consolidate(bState.unionByName(dB)).localCheckpoint(true)
  }
}
