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
    val admit = parts
      .map { row =>
        partitionCols.zipWithIndex
          .map { case (c, i) => col(c) === lit(row.get(i)) }
          .reduce(_ && _)
      }
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    table.filter(admit).filter(col(valueCol) >= lo && col(valueCol) <= hi)
  }
}
