package graft.streaming

import org.apache.hadoop.fs.Path

/** Consumer-side discovery of newly sealed partitions — the other half
  * of the reference's done-flag contract.
  *
  * A downstream job (e.g. [[IncrementalRollup]]) shouldn't need the
  * sealing process to hand it seal lists: the `_DONE` markers ARE the
  * publication. `newlySealed` lists markers stamped after a cursor and
  * returns the next cursor, so a consumer polls with O(partitions)
  * driver-side listing and never re-processes an hour it has seen —
  * across restarts, if it persists the cursor (a single long).
  *
  * Re-seals count as new: sealing stamps a fresh `_DONE` (marker mtime
  * advances), so a backfilled or compacted hour is re-delivered to
  * consumers — exactly what a rollup needs to stay consistent.
  */
object DoneScanner {

  final case class Scan(newParts: Seq[(String, String)], cursor: Long)

  /** Sealed (dt, hr) whose `_DONE` marker is newer than `sinceCursor`
    * (exclusive), with the max marker mtime as the next cursor. */
  def newlySealed(spark: org.apache.spark.sql.SparkSession, sink: HiveBatchSink, sinceCursor: Long = 0L): Scan = {
    val root = new Path(sink.tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Scan(Seq.empty, sinceCursor)
    val marks =
      for {
        dtDir <- fs.listStatus(root).toSeq
        if dtDir.isDirectory && dtDir.getPath.getName.startsWith("dt=")
        hrDir <- fs.listStatus(dtDir.getPath).toSeq
        if hrDir.isDirectory && hrDir.getPath.getName.startsWith("hr=")
        done = new Path(hrDir.getPath, "_DONE")
        if fs.exists(done)
        mtime = fs.getFileStatus(done).getModificationTime
        if mtime > sinceCursor
      } yield (
        (dtDir.getPath.getName.stripPrefix("dt="), hrDir.getPath.getName.stripPrefix("hr=")),
        mtime)
    if (marks.isEmpty) Scan(Seq.empty, sinceCursor)
    else Scan(marks.map(_._1).sorted, marks.map(_._2).max)
  }
}
