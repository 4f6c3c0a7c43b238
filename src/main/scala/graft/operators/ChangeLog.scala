package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge-on-read changelog application (SURVEY.md §2: table maintenance
  * family — the read-path dual of TableMaintenance.upsert's write path).
  *
  * A mutable keyed table at 100 TB is physically a sealed base snapshot
  * plus an append-only op-log of deltas (upserts and delete tombstones)
  * — the copy-on-write alternative rewrites a whole partition per batch.
  * `applyChangeLog` reconstructs current state at READ time:
  *
  *   1. the log is first collapsed to its per-key winner — one
  *      delta-sized shuffle on the key, with map-side combine doing most
  *      of the collapse before the wire (the log re-states the same hot
  *      keys over and over; the post-shuffle winner set is ≤ #distinct
  *      keys touched);
  *   2. the base is then anti-joined against the winner KEYS — the
  *      winner set is delta-sized (≪ base), so the join broadcasts and
  *      the base is never shuffled: reconstruction cost is one pass over
  *      the base plus one delta-sized shuffle, independent of how many
  *      log batches accumulated since the last compaction;
  *   3. winners whose op is not a delete are unioned in as the new
  *      versions; delete winners simply suppress their base row.
  *
  * Ordering: within the log, the winner per key is the row with the
  * highest `versionCols` (lexicographic, nulls lose); at EQUAL version
  * an upsert outranks a delete — so a CDC feed that records a same-id
  * delete-of-the-old-row + insert-of-the-new-row (exactly what
  * TableMaintenance.recordChanges emits per changeId) replays to the
  * inserted row, and a delete for a key the base never held is a no-op.
  * Base rows are the sealed past: every log row outranks them by
  * construction (the log starts where the snapshot sealed).
  *
  * Out-of-order arrival needs no special casing — the winner window is
  * order-insensitive, which is what makes this the batch kernel the
  * streaming upsert view shares. */
object ChangeLog {

  /** Current state = base overridden by the op-log's per-key winners.
    *
    * @param base        sealed snapshot (payload columns only, no op)
    * @param log         delta rows: key + version + `opCol` + payload
    *                    (payload schema must match `base`)
    * @param keyCols     merge key
    * @param versionCols winner order within the log (highest wins)
    * @param opCol       op column in `log`: [[DeleteOp]] is a tombstone,
    *                    anything else is an upsert
    */
  def applyChangeLog(
      base: DataFrame,
      log: DataFrame,
      keyCols: Seq[String],
      versionCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "applyChangeLog needs at least one key column")
    require(versionCols.nonEmpty, "applyChangeLog needs at least one version column")
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((versionCols.map(c => col(c).desc_nulls_last) :+
        (col(opCol) =!= lit(DeleteOp)).desc): _*)
    val winners = log
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
    // delta-sized key set: broadcast keeps the base scan shuffle-free
    // (the repo-wide delta≪base precedent — TableMaintenance.upsert
    // broadcasts the same shape; a compaction run bounds log growth)
    val winnerKeys = winners.select(keyCols.map(col): _*).distinct()
    val survivors = base.join(broadcast(winnerKeys), keyCols, "left_anti")
    val upserts = winners
      .filter(col(opCol) =!= lit(DeleteOp))
      .drop(opCol)
      .drop(versionCols.filterNot(base.columns.contains): _*)
    survivors.unionByName(upserts)
  }

  val DeleteOp = "delete"

  /** Compact an op-log to its MINIMAL equivalent: one net op per key —
    * the log-side sibling of [[applyChangeLog]] (which resolves against
    * a base): replay cost and log storage drop to key-cardinality while
    * `apply(base, log) ≡ apply(base, compact(log))` for EVERY base (the
    * winner row is exactly the row apply would pick; a delete winner
    * must SURVIVE as a tombstone because the base may still hold the
    * key). This is the maintenance job a merge-on-read table runs when
    * the delta grows past read-amplification budget.
    *
    * Scale: one window partitioned by key over the LOG (delta-sized,
    * not base-sized) — the same shuffle apply itself needs. */
  def compactChangeLog(
      log: DataFrame,
      keyCols: Seq[String],
      versionCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty && versionCols.nonEmpty,
      "compactChangeLog needs key and version columns")
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((versionCols.map(c => col(c).desc_nulls_last) :+
        (col(opCol) =!= lit(DeleteOp)).desc): _*)
    log
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }

  /** q313: the registered compaction instantiation — q269's synthesized
    * post-cutoff order changelog compacted to one net op per customer.
    * Deterministic from the driver tables, DuckDB-oracled; the
    * apply≡apply∘compact equivalence is property-tested in the spec. */
  def compactedOrderLog(orders: DataFrame, cutoff: String = "1997-01-01"): DataFrame = {
    val log = orders
      .filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
      .withColumn("op",
        when(col("o_orderstatus") === "F", lit(DeleteOp)).otherwise(lit("upsert")))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("op"))
    compactChangeLog(log, Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
      .select(
        col("o_custkey"), col("op"),
        col("o_orderkey").as("net_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("net_date"),
        col("o_totalprice").as("net_price"))
      .orderBy("o_custkey")
  }

  /** q269: the registered merge-on-read instantiation — "current order
    * per customer" reconstructed from a sealed base (latest pre-1997
    * order per customer) plus the post-1997 orders replayed as a
    * changelog where a finalized order ('F') is a tombstone and anything
    * else upserts; version is (o_orderdate, o_orderkey). Deterministic
    * from the driver tables, DuckDB-oracled. */
  def morCurrentOrders(orders: DataFrame, cutoff: String = "1997-01-01"): DataFrame = {
    val payload = Seq("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val wb = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val base = orders
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .withColumn("__rk", row_number().over(wb))
      .filter(col("__rk") === 1)
      .select(payload.map(col): _*)
    val log = orders
      .filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
      .withColumn("op", when(col("o_orderstatus") === "F", lit(DeleteOp)).otherwise(lit("upsert")))
      .select((payload :+ "op").map(col): _*)
    applyChangeLog(base, log, keyCols = Seq("o_custkey"),
      versionCols = Seq("o_orderdate", "o_orderkey"))
      .select(
        col("o_custkey"),
        col("o_orderkey").as("cur_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("cur_date"),
        col("o_totalprice").as("cur_price"))
      .orderBy("o_custkey")
  }
}
