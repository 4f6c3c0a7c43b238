package graft

import graft.sources.Tables
import graft.streaming.SketchMaintenance
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch
import java.nio.file.Files

/** Incrementally maintained CMS sketch table: per-batch slices merge at
  * read time to EXACTLY the single-shot sketch (CMS addition is
  * loss-free), and a replayed batch cannot double-count. */
class SketchMaintenanceSpec extends SparkSpec {
  lazy val t = Tables(spark, sfDir)

  test("incremental batches merge to the single-shot sketch; replay is idempotent") {
    val table = Files.createTempDirectory("graft-cms").toString
    val ev = t.events
    (0 until 3).foreach { b =>
      SketchMaintenance.updateSketchTable(ev.filter(col("event_id") % 3 === b), table, batchId = b)
    }
    // replay batch 1 (simulated retry) — overwrites its own slice only
    SketchMaintenance.updateSketchTable(ev.filter(col("event_id") % 3 === 1), table, batchId = 1)

    val keys = ev.groupBy("user_id").count().orderBy(desc("count"), asc("user_id"))
      .limit(5).collect().map(_.getLong(0)).toSeq
    val got = SketchMaintenance.estimate(spark, table, keys)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    // single-shot reference sketch per type over ALL events, same seed
    val direct = ev.groupBy("event_type")
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("cms"))
      .collect()
      .map(r => r.getString(0) -> CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))).toMap

    val exact = ev.groupBy("event_type", "user_id").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.foreach { case ((tpe, k), est) =>
      assert(est == direct(tpe).estimateCount(k),
        s"merged estimate diverges from single-shot sketch for ($tpe, $k)")
      assert(est >= exact.getOrElse((tpe, k), 0L), "CMS must dominate the exact count")
    }
    assert(got.nonEmpty)
  }

  test("t-digest table: sliced batches + a replay answer percentiles within 2.5% of exact") {
    val table = Files.createTempDirectory("graft-td").toString
    val ev = t.events
    (0 until 3).foreach { b =>
      SketchMaintenance.updateDigestTable(ev.filter(col("event_id") % 3 === b), table, batchId = b)
    }
    // replayed batch overwrites its own ingest_batch partition only
    SketchMaintenance.updateDigestTable(ev.filter(col("event_id") % 3 === 1), table, batchId = 1)

    val got = SketchMaintenance.quantileEstimate(spark, table)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val exact = ev.groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"))
      .collect().flatMap(r =>
        Seq((r.getString(0), 0.5) -> r.getDouble(1), (r.getString(0), 0.9) -> r.getDouble(2)))
      .toMap
    assert(got.nonEmpty && got.keySet === exact.keySet)
    got.foreach { case (k, est) =>
      val ex = exact(k)
      // merged digests trade some accuracy for mergeability: ~1.2%
      // observed at p90/compression=200; 2.5% is the honest envelope
      val tol = math.max(0.025 * math.abs(ex), 1e-6)
      assert(math.abs(est - ex) <= tol, s"$k: sketch $est vs exact $ex")
    }
  }

  test("hll table: cross-batch users count once, replay leaves the estimate unchanged") {
    val table = Files.createTempDirectory("graft-hll").toString
    val ev = t.events
    // slice by EVENT id, so the same user lands in several batches —
    // the union must still count each user once per type
    (0 until 3).foreach { b =>
      SketchMaintenance.updateHllTable(ev.filter(col("event_id") % 3 === b), table, batchId = b)
    }
    val before = SketchMaintenance.distinctEstimate(spark, table)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // replayed batch (simulated retry) rewrites its own slice only
    SketchMaintenance.updateHllTable(ev.filter(col("event_id") % 3 === 1), table, batchId = 1)
    val after = SketchMaintenance.distinctEstimate(spark, table)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(before === after, "replay must not move a set-union estimate")

    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after.keySet === exact.keySet)
    after.foreach { case (tpe, est) =>
      val ex = exact(tpe).toDouble
      assert(math.abs(est.toDouble - ex) <= math.max(0.02 * ex, 2.0),
        s"$tpe: merged HLL $est vs exact $ex")
    }
  }
}
