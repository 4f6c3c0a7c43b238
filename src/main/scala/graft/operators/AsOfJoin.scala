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

  /** Right side projected to the tagged-union shape. */
  private def taggedRight(right: DataFrame, keyCol: String, tsCol: String, valueCol: String) =
    right
      .select(col(keyCol), col(tsCol), col(valueCol).as("_asof_v"))
      .withColumn("_side", lit(0))

  /** Duplicate-instant right rows are made deterministic by ORDERING,
    * not aggregation: `_asof_v` participates in the window sort (asc),
    * so among tied (key, ts) right rows `last(ignoreNulls)` always picks
    * the MAX payload — a total order with zero extra shuffle (a
    * pre-groupBy dedup would exchange the right side on (key, ts)
    * first). Engines whose ASOF JOIN picks an ARBITRARY equal-instant
    * right row (e.g. DuckDB) must dedup the right side to max(value)
    * per (key, ts) to match this pin — the q44/q130 oracle SQL does.
    *
    * @param left      probe side (kept in full)
    * @param right     reference side: (keyCol, tsCol, valueCol) only
    * @param keyCol    equi-join key present on both sides
    * @param tsCol     event-time column present on both sides
    * @param valueCol  right-side payload to carry forward
    * @param as        output column name for the carried payload */
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
        taggedRight(right, keyCol, tsCol, valueCol),
        allowMissingColumns = true)
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("_side").asc, col("_asof_v").asc)
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
        taggedRight(right, keyCol, tsCol, valueCol),
        allowMissingColumns = true)
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col("_side").asc, col("_asof_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn(as, last(col("_asof_v"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) :+ col(as): _*)
  }

  /** q215: nearest-match join (pandas `merge_asof(direction='nearest')`)
    * — each purchase paired with the closest error of the SAME user
    * within ±`windowSeconds`, whichever side of it. Candidates come
    * from one user-keyed equi-join (per-user pair counts are
    * basket-bounded, the q92 argument — never a time-unbounded cross
    * product), the winner per purchase is a single `min(struct(gap,
    * ts, id))` aggregate (deterministic: smallest gap, then earliest,
    * then smallest id — no per-purchase sort), and the result rolls up
    * to match-rate/latency stats. */
  def nearestEvent(events: DataFrame, windowSeconds: Int = 3600): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("e_id"), col("ts").as("e_ts"))
    val gap = abs(unix_timestamp(col("e_ts")) - unix_timestamp(col("p_ts"))).cast("double")
    purchases
      .join(errors, "user_id")
      .withColumn("gap_s", gap)
      .filter(col("gap_s") <= windowSeconds)
      .groupBy("p_id")
      .agg(min(struct(col("gap_s"), col("e_ts"), col("e_id"))).as("best"))
      .select(col("p_id"), col("best.gap_s").as("gap_s"))
      .agg(
        count(lit(1)).as("n_matched"),
        round(avg("gap_s"), 4).as("mean_gap_s"),
        round(expr("percentile(gap_s, 0.5)"), 4).as("p50_gap_s"),
        round(max("gap_s"), 4).as("max_gap_s"))
  }
}
