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
  *      `ingest_batch` id DERIVED FROM THE RANGE END (monotone in the
  *      log, identical on replay) — a re-landed batch dynamically
  *      overwrites exactly its own files;
  *   3. watermark-closed partitions seal;
  *   4. only then does the group commit the new offsets.
  * A crash between 2/3 and 4 replays the same range into the same
  * ingest_batch — table state converges to exactly-once without any
  * rollback bookkeeping, which is the reference's transaction model
  * with the WAL replaced by bus offsets. */
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
    // ingest_batch id = Σ end offsets: strictly monotone across cycles
    // (appends only grow offsets), identical on replay of the same range
    val batchId = ends.values.sum
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
