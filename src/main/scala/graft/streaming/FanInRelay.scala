package graft.streaming

import graft.sources.OffsetLog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Fan-in agent loop: MANY offset logs (one per producing agent — the
  * reference's deployment shape is a fleet of collectors draining into
  * ONE warehouse table) relay into a single [[HiveBatchSink]] with
  * exactly-once semantics across the whole group.
  *
  * The single-log relay's handshake does not survive fan-in naively: if
  * each log committed its own offsets, a crash BETWEEN two per-log
  * commits would leave log A advanced and log B not — the restarted
  * cycle would derive a DIFFERENT ingest_batch id (A's from moved), so
  * B's re-drained overlap would land under a new id instead of
  * overwriting the crashed files, duplicating rows. The fix is
  * structural: ONE combined commit record for the whole group
  * (`<commitRoot>/_fanin_offsets/<group>.txt`, lines `log:partition:
  * offset`, written temp-then-atomic-rename exactly like
  * [[OffsetLog.commit]]) — the commit either advances EVERY log's
  * offsets or none, so the crash window is the same single gap the
  * one-log relay proves out, and the batch id (Σ committed from-offsets
  * across all logs) is stable across replay and strictly monotone
  * across committed cycles for the same reasons.
  *
  * Scale shape: per cycle, one `readBatch` per log with new data (a
  * log-proportional union of file scans — no shuffle until the sink's
  * own dt/hr partitioning), one [[HiveBatchSink.writeBatch]], one seal
  * pass, one rename. Logs that are caught up contribute no scan. */
object FanInRelay {

  final case class FanInStats(
      drained: Long, received: Long, corrupt: Long, sealedParts: Long, activeLogs: Int)

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Combined committed offsets: log index → partition → offset. */
  def committed(
      spark: SparkSession, commitRoot: String, group: String): Map[Int, Map[Int, Long]] = {
    val f = fs(spark, commitRoot)
    val p = new Path(s"$commitRoot/_fanin_offsets/$group.txt")
    if (!f.exists(p)) Map.empty
    else {
      val in = f.open(p)
      val txt =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      txt.linesIterator.filter(_.nonEmpty).map { l =>
        val Array(lg, pt, off) = l.split(":")
        (lg.toInt, pt.toInt, off.toLong)
      }.toSeq.groupBy(_._1).map { case (lg, rows) =>
        lg -> rows.map(r => r._2 -> r._3).toMap
      }
    }
  }

  /** Atomically commit the WHOLE group's offsets — every log advances
    * or none does (temp + rename-overwrite, the OffsetLog idiom). */
  def commit(
      spark: SparkSession,
      commitRoot: String,
      group: String,
      offsets: Map[Int, Map[Int, Long]]): Unit = {
    val f = fs(spark, commitRoot)
    f.mkdirs(new Path(s"$commitRoot/_fanin_offsets"))
    val tmp = new Path(s"$commitRoot/_fanin_offsets/$group.txt.tmp")
    val out = f.create(tmp, true)
    val body = offsets.toSeq.sortBy(_._1).flatMap { case (lg, m) =>
      m.toSeq.sorted.map { case (pt, off) => s"$lg:$pt:$off" }
    }.mkString("\n")
    try out.write(body.getBytes("UTF-8"))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new Path(commitRoot).toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new Path(s"$commitRoot/_fanin_offsets/$group.txt"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** One drain-land-seal-commit cycle over every log. No-op (and no
    * commit write) when every log is caught up. */
  def runOnce(
      spark: SparkSession,
      logRoots: Seq[String],
      group: String,
      numPartitions: Int,
      sink: HiveBatchSink,
      commitRoot: String): FanInStats = {
    val from = committed(spark, commitRoot, group)
    val ends = logRoots.indices
      .map(i => i -> OffsetLog.endOffsets(spark, logRoots(i), numPartitions)).toMap
    def fromOf(i: Int): Map[Int, Long] = from.getOrElse(i, Map.empty)
    val active = logRoots.indices.filter { i =>
      (0 until numPartitions).exists(p => ends(i).getOrElse(p, 0L) != fromOf(i).getOrElse(p, 0L))
    }
    if (active.isEmpty) return FanInStats(0, 0, 0, 0, 0)
    val batch = active
      .map(i => OffsetLog.readBatch(spark, logRoots(i), numPartitions, fromOf(i), ends(i))
        .drop("partition", "offset"))
      .reduce(_.unionByName(_))
    // Σ committed from-offsets over ALL logs: unchanged until the single
    // combined commit lands, so a crashed cycle's re-drain (even one
    // widened by producer appends on ANY log) reuses the id and
    // dynamic-overwrites the crashed files; strictly monotone across
    // committed cycles because a cycle only commits after draining > 0
    val batchId = from.values.flatMap(_.values).sum
    val stats = sink.writeBatch(batch, batchId)
    val sealedNow = stats.maxEventTime.map(ts => sink.sealClosed(ts)).getOrElse(Seq.empty)
    commit(spark, commitRoot, group, logRoots.indices.map(i => i -> ends(i)).toMap)
    FanInStats(
      drained = active.map(i =>
        ends(i).map { case (p, e) => e - fromOf(i).getOrElse(p, 0L) }.sum).sum,
      received = stats.received,
      corrupt = stats.corrupt,
      sealedParts = sealedNow.size.toLong,
      activeLogs = active.size)
  }

  /** Drive cycles until every log is caught up (bounded loop). */
  def drainLoop(
      spark: SparkSession,
      logRoots: Seq[String],
      group: String,
      numPartitions: Int,
      sink: HiveBatchSink,
      commitRoot: String,
      maxCycles: Int = 100): Seq[FanInStats] = {
    val out = Seq.newBuilder[FanInStats]
    var i = 0
    var done = false
    while (i < maxCycles && !done) {
      val s = runOnce(spark, logRoots, group, numPartitions, sink, commitRoot)
      if (s.drained == 0) done = true else out += s
      i += 1
    }
    out.result()
  }
}
