package graft.streaming

import graft.sources.OffsetLog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** The agent loop of the reference sink, Spark-first: source →
  * channel → sink becomes offset log → drain → HiveBatchSink, with the
  * channel's transaction replaced by the drain-land-commit handshake.
  *
  * Exactly-once anatomy (each step idempotent under replay):
  *   1. `drain` reads the group's uncommitted range [committed, head);
  *   2. the batch lands via [[HiveBatchSink.writeBatch]] under an
  *      `ingest_batch` id DERIVED FROM THE COMMITTED *FROM* OFFSETS
  *      (strictly monotone across committed cycles, and — unlike the
  *      head — unchanged by producer appends that race the crash
  *      window) — a re-landed batch dynamically overwrites exactly the
  *      crashed cycle's files;
  *   3. watermark-closed partitions seal;
  *   4. only then does the group commit the new offsets.
  * A crash between 2/3 and 4 re-drains [from, head') under the SAME
  * ingest_batch even if the head moved to head' > head while down: the
  * replay range is a superset of the crashed one, so every partition
  * the crashed cycle staged is overwritten — table state converges to
  * exactly-once without any rollback bookkeeping, which is the
  * reference's transaction model with the WAL replaced by bus offsets.
  * (Deriving the id from the END offsets instead would mint a NEW id
  * for the widened range and duplicate the overlap — the bug this
  * derivation exists to prevent.) */
object OffsetLogRelay {

  final case class RelayStats(drained: Long, received: Long, corrupt: Long, sealedParts: Long)

  /** One drain-land-seal-commit cycle. No-op (and no commit write)
    * when the group is already at the head. */
  def runOnce(
      spark: SparkSession,
      logRoot: String,
      group: String,
      numPartitions: Int,
      sink: HiveBatchSink): RelayStats = {
    val from = OffsetLog.committed(spark, logRoot, group)
    val ends = OffsetLog.endOffsets(spark, logRoot, numPartitions)
    val caughtUp = (0 until numPartitions)
      .forall(p => ends.getOrElse(p, 0L) == from.getOrElse(p, 0L))
    if (caughtUp) return RelayStats(0, 0, 0, 0)
    val batch = OffsetLog.readBatch(spark, logRoot, numPartitions, from, ends)
    // ingest_batch id = Σ committed FROM offsets: stable across replay
    // regardless of head movement (a crashed cycle's re-drain reuses the
    // id even when a producer append widened the range meanwhile), and
    // strictly monotone across committed cycles (a cycle only commits
    // when it drained > 0 rows, so the next cycle's from-sum is larger)
    val batchId = from.values.sum
    val events = batch.drop("partition", "offset")
    val stats = sink.writeBatch(events, batchId)
    val sealedNow = stats.maxEventTime.map(ts => sink.sealClosed(ts)).getOrElse(Seq.empty)
    OffsetLog.commit(spark, logRoot, group, ends)
    RelayStats(
      drained = ends.map { case (p, e) => e - from.getOrElse(p, 0L) }.sum,
      received = stats.received,
      corrupt = stats.corrupt,
      sealedParts = sealedNow.size.toLong)
  }

  /** Drive cycles until the group is caught up (bounded — a bus drain
    * loop, not a daemon; scheduling cadence is the caller's). */
  def drainLoop(
      spark: SparkSession,
      logRoot: String,
      group: String,
      numPartitions: Int,
      sink: HiveBatchSink,
      maxCycles: Int = 100): Seq[RelayStats] = {
    val out = Seq.newBuilder[RelayStats]
    var i = 0
    var done = false
    while (i < maxCycles && !done) {
      val s = runOnce(spark, logRoot, group, numPartitions, sink)
      if (s.drained == 0) done = true else out += s
      i += 1
    }
    out.result()
  }
}
