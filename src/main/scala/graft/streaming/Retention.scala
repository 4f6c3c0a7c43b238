package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Partition retention / TTL — the lifecycle rule every time-partitioned
  * Hive warehouse runs: drop sealed `dt` partitions older than the
  * retention horizon, atomically per day-directory.
  *
  * Discovery is a DRIVER LISTING only (O(partitions), like the
  * compaction planner — no data read, no job) because the partition key
  * IS the age: `dt=yyyyMMdd` compares lexicographically. The audit
  * reports file counts/bytes from the same listing. With `changeLog`,
  * the expiring rows are captured to the CDC feed (op=`expire`) BEFORE
  * deletion — one pruned scan of exactly the expiring slices — so
  * downstream mirrors retire the same rows instead of re-diffing.
  * Re-running with the same cutoff is a no-op (the dirs are gone), and
  * a re-run of the same changeId overwrites its own feed slice, so the
  * whole operation is idempotent like every other sink write.
  */
object Retention {

  final case class ExpiredPartition(dt: String, hr: String, files: Int, bytes: Long)

  /** Expire every sealed partition with `dt < cutoffDt` (exclusive —
    * the cutoff day itself is kept). Returns the per-hour audit of what
    * was removed, empty when nothing is old enough. */
  def expirePartitions(
      spark: SparkSession,
      sink: HiveBatchSink,
      cutoffDt: String,
      changeLog: Option[(String, Long)] = None): Seq[ExpiredPartition] = {
    val root = new Path(sink.tablePath)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(root)) return Seq.empty
    val expired = for {
      dtDir <- f.listStatus(root).toSeq
      if dtDir.isDirectory && dtDir.getPath.getName.startsWith("dt=")
      dt = dtDir.getPath.getName.stripPrefix("dt=")
      if dt < cutoffDt
      hrDir <- f.listStatus(dtDir.getPath).toSeq
      if hrDir.isDirectory && hrDir.getPath.getName.startsWith("hr=")
      files = f.listStatus(hrDir.getPath).filterNot(_.getPath.getName.startsWith("_"))
    } yield ExpiredPartition(dt, hrDir.getPath.getName.stripPrefix("hr="), files.length, files.map(_.getLen).sum)
    if (expired.isEmpty) return Seq.empty

    changeLog.foreach { case (path, changeId) =>
      val dirs = expired.map(e => s"${sink.tablePath}/dt=${e.dt}/hr=${e.hr}").distinct
      spark.read
        .option("basePath", sink.tablePath)
        .format(sink.sealFormat)
        .load(dirs: _*)
        .drop("dt", "hr")
        .withColumn("change_id", lit(changeId))
        .withColumn("op", lit("expire"))
        .write
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy("change_id", "op")
        .parquet(path)
    }
    expired.map(_.dt).distinct.foreach(dt => f.delete(new Path(sink.tablePath, s"dt=$dt"), true))
    spark.catalog.refreshByPath(sink.tablePath)
    expired.sortBy(e => (e.dt, e.hr))
  }
}
