package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Incrementally maintained count-min sketch table — the streaming dual
  * of q82's batch sketch table: every micro-batch persists one CMS per
  * (dt, event_type) for ITS OWN slice, partitioned by `ingest_batch`, so
  * a replayed batch dynamically overwrites exactly its own sketches
  * (the sink's idempotency rule — CMS merge is additive, so merge-on-
  * write would double-count under retry; merge-on-READ over the
  * KB-sized sketch rows is free and exactly-once by construction).
  *
  * Query side: `estimate` merges the stored sketches loss-free (CMS of
  * a union IS the cell-wise sum of the parts) and probes candidate
  * keys — no raw-event rescan, O(batches × days × types) KBs read.
  */
object SketchMaintenance {

  /** Write this micro-batch's (dt, type) sketches under `ingest_batch=N`. */
  def updateSketchTable(
      batch: DataFrame,
      tablePath: String,
      batchId: Long,
      eps: Double = 0.001,
      conf: Double = 0.99): Unit =
    batch
      .groupBy(date_format(col("ts"), "yyyyMMdd").as("dt"), col("event_type"))
      .agg(expr(s"count_min_sketch(user_id, ${eps}d, ${conf}d, 42)").as("cms"))
      .withColumn("ingest_batch", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("ingest_batch")
      .parquet(tablePath)

  /** Merged per-type estimates for `keys`, read purely from the sketch
    * table (all batches, all days). */
  def estimate(spark: SparkSession, tablePath: String, keys: Seq[Long]): DataFrame = {
    import spark.implicits._
    val merged = spark.read.parquet(tablePath)
      .select("event_type", "cms")
      .collect()
      .groupBy(_.getString(0))
      .map { case (tpe, rows) =>
        val sks = rows.map(r =>
          CountMinSketch.readFrom(new ByteArrayInputStream(r.getAs[Array[Byte]](1))))
        tpe -> sks.reduce { (a, b) => a.mergeInPlace(b); a }
      }
    merged.toSeq
      .flatMap { case (tpe, sk) => keys.map(k => (tpe, k, sk.estimateCount(k))) }
      .toDF("event_type", "user_id", "est_n")
      .orderBy("event_type", "user_id")
  }

  /** Serialize helper for specs comparing against a directly-built CMS. */
  private[graft] def toBytes(sk: CountMinSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    sk.writeTo(bos)
    bos.toByteArray
  }

  /** stream_tdigest: incrementally maintained t-digest table — the
    * quantile analog of the CMS table above, and the streaming feed for
    * q145's sketch-served latency percentiles. Each micro-batch writes
    * one digest per (dt, event_type) for ITS slice under
    * `ingest_batch=N` (dynamic overwrite ⇒ replays are idempotent —
    * the same rule as CMS: digests merge additively, so merge-on-write
    * would double-count under retry; merge-on-READ over KB rows is
    * free and exactly-once by construction). */
  def updateDigestTable(
      batch: DataFrame,
      tablePath: String,
      batchId: Long,
      compression: Double = 200.0): Unit =
    batch
      .groupBy(date_format(col("ts"), "yyyyMMdd").as("dt"), col("event_type"))
      .agg(graft.functions.SketchFunctions.tdigestSketch(col("value"), compression).as("td"))
      .withColumn("ingest_batch", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("ingest_batch")
      .parquet(tablePath)

  /** Merged per-type percentile estimates read purely from the digest
    * table — k₁-merge is loss-bounded, so answers stay within t-digest
    * accuracy of the exact percentile over the union with NO raw
    * rescan. */
  def quantileEstimate(
      spark: SparkSession,
      tablePath: String,
      ps: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    import spark.implicits._
    val merged = spark.read.parquet(tablePath)
      .select("event_type", "td")
      .collect()
      .groupBy(_.getString(0))
      .map { case (tpe, rows) =>
        val ds = rows.map(r => graft.plans.TDigest.deserialize(r.getAs[Array[Byte]](1)))
        tpe -> ds.reduce { (a, b) => a.merge(b); a }
      }
    merged.toSeq
      .flatMap { case (tpe, d) =>
        ps.map(p => (tpe, p, math.floor(d.quantile(p) * 10000 + 0.5) / 10000))
      }
      .toDF("event_type", "p", "quantile")
      .orderBy("event_type", "p")
  }

  /** stream_hll: incrementally maintained HLL sketch table — the
    * DISTINCT-count analog of the CMS/t-digest tables and the streaming
    * feed of q54's sketch-table rollup. Each micro-batch writes one
    * DataSketches HLL per (dt, event_type) for ITS slice under
    * `ingest_batch=N` (dynamic overwrite ⇒ replay rewrites exactly its
    * own sketches). HLL union is a SET union — a user seen by three
    * batches still counts once — so merge-on-read is not just
    * idempotent under retry but exactly the semantics distinct-count
    * needs across arbitrary slicings. */
  def updateHllTable(
      batch: DataFrame,
      tablePath: String,
      batchId: Long,
      lgConfigK: Int = 14): Unit =
    batch
      .groupBy(date_format(col("ts"), "yyyyMMdd").as("dt"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgConfigK)).as("hll"))
      .withColumn("ingest_batch", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("ingest_batch")
      .parquet(tablePath)

  /** Merged per-type distinct estimates read purely from the sketch
    * table. Unlike the CMS/t-digest readers this merge never touches
    * the driver: `hll_union_agg` is a distributed aggregate, so the
    * query side scales with sketch-table size (KBs per partition) on
    * executors. */
  def distinctEstimate(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(tablePath)
      .groupBy("event_type")
      .agg(
        hll_sketch_estimate(hll_union_agg(col("hll"), lit(false)))
          .as("approx_users"))
      .orderBy("event_type")
}
