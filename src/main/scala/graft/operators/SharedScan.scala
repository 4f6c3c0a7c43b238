package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared-scan multi-query execution: answer N groupBy queries over the
  * same input with ONE scan and ONE shuffle.
  *
  * A reporting tier fires the same handful of rollups at the same fact
  * table — by returnflag, by linestatus, by (returnflag, linestatus),
  * grand total. Run naively that is N full scans of the fact table; at
  * 100 TB the scans dwarf everything else. The warehouse-classic fix is
  * multi-query scan sharing, and Spark already has the machinery:
  * GROUPING SETS plans one scan feeding an Expand (each row replicated
  * once per set, pre-aggregated map-side), so the N queries cost one
  * pass plus |union of group keys| extra agg rows. `grouping_id()` routes
  * every output row back to the query it answers.
  *
  * [[multiGroupBy]] returns per-query views over the single cached
  * grouping-sets result — the result is aggregate-sized (tiny), so the
  * cache holds rollup rows, never input data.
  */
object SharedScan {

  final case class GroupSpec(name: String, keys: Seq[String])

  /** The N queries as per-spec DataFrames, all served by one scan.
    * `aggs` must be named (`.as(...)`) aggregate columns; they apply to
    * every spec (the grouping-sets contract). Call `release()` when done
    * with the views. */
  final case class Shared(combined: DataFrame, views: Map[String, DataFrame]) {
    def release(): Unit = combined.unpersist()
  }

  def multiGroupBy(df: DataFrame, specs: Seq[GroupSpec], aggs: Seq[Column], cache: Boolean = true): Shared = {
    require(specs.nonEmpty && aggs.nonEmpty, "need at least one spec and one aggregate")
    val allKeys = specs.flatMap(_.keys).distinct
    // duplicate key-sets must plan ONCE or every copy doubles the rows
    val sets = specs.map(_.keys.toSet).distinct
    // grouping_id is only legal inside the grouping-sets aggregate itself
    val withGid = aggs :+ grouping_id(allKeys.map(col): _*).cast("long").as("gid")
    val base = df
      .groupingSets(sets.map(_.toSeq.sorted.map(col)), allKeys.map(col): _*)
      .agg(withGid.head, withGid.tail: _*)
    val combined = if (cache) base.cache() else base
    // grouping_id bit i (MSB-first over allKeys) = 1 when the key is
    // NOT grouped in that set
    def gidFor(keys: Set[String]): Long =
      allKeys.zipWithIndex.collect {
        case (k, i) if !keys.contains(k) => 1L << (allKeys.length - 1 - i)
      }.sum
    val views = specs.map { s =>
      s.name -> combined
        .filter(col("gid") === lit(gidFor(s.keys.toSet)))
        .select((s.keys.map(col) ++ aggs.map(a => col(extractAlias(a)))): _*)
    }.toMap
    Shared(combined, views)
  }

  /** q73: four classic lineitem rollups (by flag, by status, by both,
    * grand total) answered by ONE scan + ONE shuffle. The oracle is the
    * equivalent GROUPING SETS SQL; `gid` proves each row's provenance.
    * Null group keys from the rollup expansion render as 'ALL' so the
    * result is ordering-stable across engines. */
  def lineitemRollups(lineitem: DataFrame): DataFrame = {
    import graft.functions.PortableRound
    val shared = multiGroupBy(
      lineitem,
      Seq(
        GroupSpec("by_flag", Seq("l_returnflag")),
        GroupSpec("by_status", Seq("l_linestatus")),
        GroupSpec("by_both", Seq("l_returnflag", "l_linestatus")),
        GroupSpec("grand", Seq.empty)),
      Seq(
        PortableRound.round(sum(col("l_quantity")), 4).as("sum_qty"),
        count(lit(1)).as("n_rows")),
      cache = false) // single consumer: the combined frame IS the result
    shared.combined
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("ret_flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("line_status"),
        col("gid"),
        col("sum_qty"),
        col("n_rows"))
      .orderBy("gid", "ret_flag", "line_status")
  }

  private def extractAlias(c: Column): String =
    org.apache.spark.sql.graftbridge.ColumnBridge.aliasName(c).getOrElse(
      throw new IllegalArgumentException(s"aggregate must be named with .as(...): $c"))
}
