package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition zone maps — a secondary-index side-table for the sealed
  * warehouse.
  *
  * Hive-style layouts prune on the PARTITION key (dt/hr) for free, but a
  * predicate on a VALUE column (user_id, event_type, value…) still scans
  * every partition. The warehouse-native fix is a zone map: a tiny
  * side-table of per-partition min/max for chosen columns, built in one
  * aggregation pass (or incrementally, per partition, at seal time).
  * Query time consults the zone map first — a driver-side read of
  * O(partitions) rows — and constructs the partition filter list for the
  * main scan, so only partitions whose [min, max] admits the predicate
  * are listed or read. At 100 TB this turns "scan 30 days" into "scan
  * the 2 partitions that can contain user X", the same trick Iceberg/
  * Delta play with file-level stats, applied at partition granularity
  * with zero table-format dependencies.
  */
object ZoneMap {

  /** One aggregation pass over the table → (partition keys, min, max,
    * count) per tracked column. Store it next to the table; rebuild is
    * idempotent, incremental rebuild = run over the new partitions and
    * append. */
  def build(table: DataFrame, partitionCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    val aggs = valueCols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    } :+ count(lit(1)).as("n_rows")
    table.groupBy(partitionCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The partitions an equality/range predicate on `valueCol` can touch:
    * zone-map rows whose [min, max] intersects [lo, hi]. The result is
    * the (tiny) partition list to feed into the main scan's partition
    * filter. */
  def candidatePartitions(
      zoneMap: DataFrame,
      partitionCols: Seq[String],
      valueCol: String,
      lo: Column,
      hi: Column): DataFrame =
    zoneMap
      .filter(col(s"${valueCol}_max") >= lo && col(s"${valueCol}_min") <= hi)
      .select(partitionCols.map(col): _*)

  /** Zone-map-pruned read: consult the side-table (driver-side,
    * O(partitions) rows), then scan ONLY the admitted partitions via an
    * IN filter on the partition keys — which Spark turns into
    * PartitionFilters, so non-candidate directories are never listed
    * into tasks. Semantics are identical to filtering the full table:
    * the zone map can only over-approximate. */
  def prunedRead(
      spark: SparkSession,
      tablePath: String,
      zoneMap: DataFrame,
      partitionCols: Seq[String],
      valueCol: String,
      lo: Column,
      hi: Column): DataFrame = {
    val parts = candidatePartitions(zoneMap, partitionCols, valueCol, lo, hi).collect()
    val table = spark.read.parquet(tablePath)
    table
      .filter(admitFilter(parts.toSeq, partitionCols))
      .filter(col(valueCol) >= lo && col(valueCol) <= hi)
  }

  private def admitFilter(parts: Seq[org.apache.spark.sql.Row], partitionCols: Seq[String]): Column =
    parts
      .map { row =>
        partitionCols.zipWithIndex
          .map { case (c, i) => col(c) === lit(row.get(i)) }
          .reduce(_ && _)
      }
      .reduceOption(_ || _)
      .getOrElse(lit(false))

  /** Zone map with per-partition BLOOM FILTERS beside min/max. Min/max
    * prunes range predicates; a point lookup on a high-cardinality
    * column whose values span every partition (user_id over time
    * partitions) passes every [min, max] test. The bloom column answers
    * "can this partition contain key X?" — no false negatives, `fpp`
    * false positives — so the point lookup scans only the partitions
    * that actually hold the key (plus ~fpp·partitions). Same one
    * aggregation pass as [[build]]; ~1.2 KB per 1k expected keys at 1%
    * fpp, still a tiny side-table at 100k partitions. */
  def buildWithBloom(
      table: DataFrame,
      partitionCols: Seq[String],
      valueCols: Seq[String],
      expectedKeysPerPartition: Long = 100000L,
      fpp: Double = 0.01): DataFrame = {
    val aggs = valueCols.flatMap { c =>
      Seq(
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        graft.functions.SketchFunctions
          .bloomSketch(col(c), expectedKeysPerPartition, fpp)
          .as(s"${c}_bloom"))
    } :+ count(lit(1)).as("n_rows")
    table.groupBy(partitionCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The partitions a POINT predicate `valueCol = value` can touch:
    * [min, max] must admit the value AND the partition's bloom filter
    * must report possible membership. Driver-side over the collected
    * side-table (each row's filter deserializes once). */
  def candidatePartitionsPoint(
      zoneMap: DataFrame,
      partitionCols: Seq[String],
      valueCol: String,
      value: Any): Seq[org.apache.spark.sql.Row] = {
    val probe = lit(value)
    val rows = zoneMap
      .filter(col(s"${valueCol}_max") >= probe && col(s"${valueCol}_min") <= probe)
      .select((partitionCols :+ s"${valueCol}_bloom").map(col): _*)
      .collect()
    rows.toSeq
      .filter { row =>
        val bf = graft.plans.BloomZone.deserialize(row.getAs[Array[Byte]](s"${valueCol}_bloom"))
        graft.plans.BloomZone.mightContain(bf, value)
      }
      .map(row => org.apache.spark.sql.Row.fromSeq(partitionCols.indices.map(row.get)))
  }

  /** Bloom-pruned point read: like [[prunedRead]] but for equality
    * predicates, with the bloom column vetoing partitions min/max alone
    * would admit. Result is identical to filtering the full table —
    * bloom filters have no false negatives. */
  def prunedReadPoint(
      spark: SparkSession,
      tablePath: String,
      zoneMap: DataFrame,
      partitionCols: Seq[String],
      valueCol: String,
      value: Any): DataFrame = {
    val parts = candidatePartitionsPoint(zoneMap, partitionCols, valueCol, value)
    spark.read
      .parquet(tablePath)
      .filter(admitFilter(parts, partitionCols))
      .filter(col(valueCol) === lit(value))
  }
}
