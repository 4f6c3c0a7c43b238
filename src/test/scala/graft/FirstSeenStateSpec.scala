package graft

import graft.streaming.FirstSeenState
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import java.nio.file.Files

/** FirstSeenState (round-11, shared by stream_novelty/stream_retention):
  * the key-bucket layout keeps first-seen claims EXACT while letting the
  * per-batch history probe prune to the buckets the batch touches — the
  * round-10 verdict's "probe cost grows with history" fix, measured here
  * by file counts, not wall clock. */
class FirstSeenStateSpec extends SparkSpec {
  import spark.implicits._

  private val B = 8

  private def keysDf(ks: Seq[String]) = ks.toDF("k")

  /** numFiles the probe's parquet scan actually reads (post partition
    * pruning) — executes the scan plan directly so the metric is
    * populated on THIS plan instance. */
  private def probeFiles(stateDir: String, batchId: Long, touched: Seq[Long]): Long = {
    val probe = FirstSeenState.probeFrame(spark, stateDir, batchId, touched, Seq("k"))
    val plan = probe.queryExecution.executedPlan
    plan.execute().count()
    plan.collectLeaves().collectFirst { case f: FileSourceScanExec =>
      f.metrics("numFiles").value
    }.getOrElse(fail("no FileSourceScanExec under the probe"))
  }

  test("claims are exactly the first-seen keys, replay-idempotent, across bucketed batches") {
    val root = Files.createTempDirectory("graft-fss").toString
    FirstSeenState.claimFirstSeen(keysDf(Seq("a", "b")), Seq("k"), root, 0, B)
    FirstSeenState.claimFirstSeen(keysDf(Seq("b", "c")), Seq("k"), root, 1, B)
    FirstSeenState.claimFirstSeen(keysDf(Seq("a", "c", "d")), Seq("k"), root, 2, B)
    // replay batch 1: must rewrite its own claim exactly, steal nothing
    FirstSeenState.claimFirstSeen(keysDf(Seq("b", "c")), Seq("k"), root, 1, B)
    val claimed = spark.read.parquet(root)
      .select(col("k"), col("ingest_batch").cast("long")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(claimed === Map("a" -> 0L, "b" -> 0L, "c" -> 1L, "d" -> 2L))
  }

  test("the history probe prunes to the batch's buckets and its cost does NOT grow with unrelated history") {
    val root = Files.createTempDirectory("graft-fss2").toString
    // history: 3 batches, 60 spread keys (touch many buckets)
    (0 until 3).foreach { b =>
      FirstSeenState.claimFirstSeen(
        keysDf((0 until 20).map(i => s"h${b}_$i")), Seq("k"), root, b, B)
    }
    val probeKeys = keysDf(Seq("probe_me"))
    val touched = FirstSeenState.touchedBuckets(probeKeys, Seq("k"), B)
    assert(touched.size === 1)
    // the pruned probe reads strictly fewer files than the full state
    val pruned = probeFiles(root, 3, touched)
    val all = spark.read.parquet(root).inputFiles.length.toLong
    assert(pruned < all, s"probe must prune: read $pruned of $all files")
    // partition filter visible in the plan (kb is a partition column)
    val planStr = FirstSeenState.probeFrame(spark, root, 3, touched, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("kb"),
      s"kb partition filter missing:\n$planStr")

    // grow history with 3 more batches steered AWAY from the probe's
    // bucket (filtered by the same hash): the probe's file count must
    // not move — per-batch cost now scales with the batch's key spread,
    // not with accumulated history
    val other = (0 until 200).map(i => s"x$i")
    (3 until 6).foreach { b =>
      val steered = keysDf(other)
        .filter(pmod(xxhash64(col("k")), lit(B.toLong)) =!= touched.head)
      FirstSeenState.claimFirstSeen(steered, Seq("k"), root, b, B)
    }
    val prunedAfter = probeFiles(root, 6, touched)
    assert(prunedAfter === pruned,
      s"probe cost grew with unrelated history: $pruned -> $prunedAfter files")
  }

  test("a batch whose claim is contested by prior history claims only the novel keys (pruned probe, exact result)") {
    val root = Files.createTempDirectory("graft-fss3").toString
    FirstSeenState.claimFirstSeen(keysDf((0 until 50).map(i => s"k$i")), Seq("k"), root, 0, B)
    FirstSeenState.claimFirstSeen(
      keysDf(Seq("k7", "k13", "brand_new")), Seq("k"), root, 1, B)
    val b1 = spark.read.parquet(root).filter(col("ingest_batch") === 1)
      .select("k").as[String].collect().toSet
    assert(b1 === Set("brand_new"))
  }
}
