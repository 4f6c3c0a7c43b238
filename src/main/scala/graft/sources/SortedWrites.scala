package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sorted / z-ordered table layouts for data skipping.
  *
  * Parquet keeps min/max statistics per row group; a scan with a pushed
  * predicate skips every row group whose range can't match. That only
  * pays off if the layout puts similar key values in the same files —
  * which is exactly what a range-partitioned, sorted write produces.
  * At 100 TB the difference is "read 1/N of the table" vs "read all of
  * it" for selective point/range queries, with zero read-side cost: the
  * skipping happens in the parquet reader from footer stats alone.
  *
  * For two-dimensional access patterns a single sort key only skips on
  * the leading column; `zorderKey` bit-interleaves two keys so file
  * ranges stay narrow in BOTH dimensions (the classic Z-order curve,
  * the same layout trick behind Delta/Iceberg OPTIMIZE ZORDER).
  */
object SortedWrites {

  /** Range-partition + sort + write: each output file covers a narrow,
    * non-overlapping slice of `sortCols`, so parquet row-group stats
    * prune selective scans down to single files. */
  def writeSorted(df: DataFrame, path: String, numFiles: Int, sortCols: Column*): Unit =
    df.repartitionByRange(numFiles, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(path)

  /** Z-order interleave of two non-negative int keys (≤ 32 bits each)
    * into one long: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. Built from native shift/mask expressions — codegen'd, no UDF.
    * Locality property: values close in `a` AND `b` are close on the
    * curve, so range-partitioning by the key keeps per-file min/max
    * narrow in both dimensions. */
  def zorderKey(a: Column, b: Column, bits: Int = 21): Column = {
    val a64 = a.cast("long"); val b64 = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a64, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b64, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Z-ordered write on two columns: interleave → range partition →
    * sort → drop the helper key. */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int, colA: Column, colB: Column): Unit =
    df.withColumn("__z", zorderKey(colA, colB))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
