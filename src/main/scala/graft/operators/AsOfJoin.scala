package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the newest right row with
  * `right.ts <= left.ts` on the same key. Spark has no native operator
  * for this (a naive formulation is an O(n·m) range join, or a
  * per-left-row correlated subquery).
  *
  * Spark-first composition in ONE shuffle: tag both sides, union them,
  * and run `last(payload, ignoreNulls)` over a
  * (key, ts, side)-ordered running window — each left row picks up the
  * most recent right payload that sorted before it. Ties
  * (right.ts == left.ts) sort the right row first, so an equal-time
  * match is included (DuckDB `ASOF JOIN ... ON l.ts >= r.ts`
  * semantics). Cost is exactly one hash shuffle on the key plus a sort —
  * the same shape as a window aggregate, at any scale.
  */
object AsOfJoin {

  /** @param left      probe side (kept in full)
    * @param right     reference side: (keyCol, tsCol, valueCol) only
    * @param keyCol    equi-join key present on both sides
    * @param tsCol     event-time column present on both sides
    * @param valueCol  right-side payload to carry forward
    * @param as        output column name for the carried payload */
  /** Right side reduced to ONE row per (key, ts): duplicate-instant
    * payloads collapse to their max, so the window pick below is a
    * total (deterministic) order — otherwise `last(ignoreNulls)` over
    * tied rows is layout-dependent. */
  private def dedupRight(right: DataFrame, keyCol: String, tsCol: String, valueCol: String) =
    right
      .select(col(keyCol), col(tsCol), col(valueCol).as("_asof_v"))
      .groupBy(keyCol, tsCol)
      .agg(max(col("_asof_v")).as("_asof_v"))

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      as: String): DataFrame = {
    val leftCols = left.columns
    val tagged = left
      .withColumn("_asof_v", lit(null).cast(right.schema(valueCol).dataType))
      .withColumn("_side", lit(1))
      .unionByName(
        dedupRight(right, keyCol, tsCol, valueCol).withColumn("_side", lit(0)),
        allowMissingColumns = true)
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn(as, last(col("_asof_v"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) :+ col(as): _*)
  }

  /** q130: FORWARD as-of join — for every left row, the EARLIEST right
    * row with `right.ts >= left.ts` on the same key ("next maintenance
    * after the failure", "next price quote at or after the order").
    * Mirror image of [[asofJoin]]: same tagged union, same ONE shuffle,
    * with the running window reversed (ts desc) so `last(ignoreNulls)`
    * carries the nearest FUTURE payload backward. Equal-time right rows
    * still match (they sort before the left row in the reversed order,
    * matching DuckDB `ASOF JOIN ... ON l.ts <= r.ts`). */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      as: String): DataFrame = {
    val leftCols = left.columns
    val tagged = left
      .withColumn("_asof_v", lit(null).cast(right.schema(valueCol).dataType))
      .withColumn("_side", lit(1))
      .unionByName(
        dedupRight(right, keyCol, tsCol, valueCol).withColumn("_side", lit(0)),
        allowMissingColumns = true)
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn(as, last(col("_asof_v"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) :+ col(as): _*)
  }
}
