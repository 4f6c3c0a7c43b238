package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a JOIN materialized view — the missing
  * sibling of [[MaterializedRollup]] (aggregates) and
  * [[graft.streaming.IncrementalRollup]] (partition-incremental): a
  * join view recomputed from scratch on every base-table change is the
  * canonical MV cost trap, and the fix is the COUNTING algorithm
  * (z-sets / DBSP): every relation carries an integer multiplicity
  * `__w` (insert = +1, delete = −1), and for V = A ⋈ₖ B
  *
  *   ΔV = ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB   (weights multiply),
  *   V′ = consolidate(V ∪ ΔV)           (weights sum; zero rows vanish)
  *
  * which handles inserts and deletes uniformly — no per-row diffing, no
  * tombstone special cases — and satisfies `refresh ≡ recompute` for
  * EVERY base state (the spec's property test).
  *
  * Scale anatomy: the delta terms join a DELTA-sized side against a
  * base table on the view's equi-join key — the delta side carries an
  * explicit broadcast hint (ingest batches are small by construction;
  * at 100 TB the base tables are only PROBED by delta keys, and the
  * base⋈base term never reappears after initialization). Consolidation
  * is one groupBy over view rows, the same shuffle key the view's
  * consumers need anyway. */
object JoinViewMaintenance {

  /** Lift a plain relation to a weighted one (all multiplicities +1). */
  def weighted(df: DataFrame): DataFrame = df.withColumn("__w", lit(1L))

  /** Negate a weighted relation (the delete-delta constructor). */
  def negated(df: DataFrame): DataFrame =
    df.withColumn("__w", -col("__w"))

  /** Sum multiplicities per row value; drop annihilated rows. */
  def consolidate(df: DataFrame): DataFrame = {
    val valueCols = df.columns.filterNot(_ == "__w")
    df.groupBy(valueCols.map(col): _*)
      .agg(sum(col("__w")).as("__w"))
      .filter(col("__w") =!= 0L)
  }

  /** The view definition: weighted equi-join, multiplicities multiply.
    * Non-key columns of `a` and `b` must be disjoint. */
  def joinView(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val aw = a.withColumnRenamed("__w", "__wa")
    val bw = b.withColumnRenamed("__w", "__wb")
    aw.join(bw, keys)
      .withColumn("__w", col("__wa") * col("__wb"))
      .drop("__wa", "__wb")
  }

  /** Delta-proportional view change for base deltas `dA`, `dB` against
    * the OLD base states. Each term broadcasts its delta side. */
  def delta(
      aOld: DataFrame,
      dA: DataFrame,
      bOld: DataFrame,
      dB: DataFrame,
      keys: Seq[String]): DataFrame = {
    val t1 = joinView(broadcast(dA), bOld, keys)
    val t2 = joinView(aOld, broadcast(dB), keys)
    val t3 = joinView(broadcast(dA), broadcast(dB), keys)
    t1.unionByName(t2).unionByName(t3)
  }

  /** Apply a delta to the materialized view state. */
  def refresh(view: DataFrame, dV: DataFrame): DataFrame =
    consolidate(view.unionByName(dV))
}
