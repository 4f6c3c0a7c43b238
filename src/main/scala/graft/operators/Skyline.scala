package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** q102: 2-D skyline (pareto frontier) — parts no other part beats on
  * BOTH price (lower-is-better) and size (higher-is-better). The
  * multi-objective "best tradeoff" query every catalog/pricing pipeline
  * runs.
  *
  * Scale shape: skylines decompose — `skyline(S₁ ∪ S₂) ⊆ skyline(S₁) ∪
  * skyline(S₂)` (a global survivor is unbeaten in its own partition
  * too), so phase 1 computes each partition's local skyline with one
  * in-partition sort + prefix-max sweep (mapPartitions, the TopK
  * partial pattern), and phase 2 re-runs the identical sweep over the
  * gathered survivors in one task. The shuffle carries only local
  * survivors (frontier-sized, typically ≪ n) — never the table. The
  * naive formulations are both scale-dead: NOT EXISTS self-join is
  * O(n²) (that stays in the DuckDB oracle where it belongs), and the
  * declarative running-max window is unpartitioned (the q25
  * single-reducer trap). Exactness does NOT depend on partition layout;
  * only phase-1 survivor counts do.
  */
object Skyline {

  /** One sweep: sort by (price asc, size desc, key asc); a row survives
    * iff its size strictly beats every strictly-cheaper row's max size
    * and ties the max size of its own price level. */
  private def sweep(rows: Iterator[Row], priceIdx: Int, sizeIdx: Int, keyIdx: Int): Iterator[Row] = {
    val sorted = rows.toArray.sortBy(r => (r.getDouble(priceIdx), -r.getInt(sizeIdx), r.getLong(keyIdx)))
    val out = Array.newBuilder[Row]
    var bestSize = Int.MinValue // max size among strictly cheaper prices
    var i = 0
    while (i < sorted.length) {
      val price = sorted(i).getDouble(priceIdx)
      var j = i
      while (j < sorted.length && sorted(j).getDouble(priceIdx) == price) j += 1
      val levelMax = sorted(i).getInt(sizeIdx) // sorted size-desc within level
      var k = i
      while (k < j && sorted(k).getInt(sizeIdx) == levelMax) {
        if (levelMax > bestSize) out += sorted(k)
        k += 1
      }
      if (levelMax > bestSize) bestSize = levelMax
      i = j
    }
    out.result().iterator
  }

  /** q111: d-dimensional skyline over value tuples (the general form of
    * [[skyline]]; at d > 2 no sort order linearizes dominance, so the
    * sweep keeps a frontier set and filters each point against it —
    * O(n·|frontier|) per partition, and skyline frontiers are small by
    * nature). Same partial+final decomposition, same exactness
    * argument: a global survivor survives its own partition. Runs on
    * DISTINCT tuples (dominance is tuple-level), so the expensive scan
    * collapses to the value-combination cardinality first. */
  def skylineGeneral(df: DataFrame, dims: Seq[(String, Boolean)]): DataFrame = {
    val proj   = df.select(dims.map(d => col(d._1)): _*).distinct()
    val schema = proj.schema
    val maximize = dims.map(_._2).toArray

    def dominates(a: Row, b: Row): Boolean = { // a beats-or-ties b everywhere, beats somewhere
      var strict = false
      var i = 0
      while (i < maximize.length) {
        val av = a.getAs[Number](i).doubleValue()
        val bv = b.getAs[Number](i).doubleValue()
        val edge = if (maximize(i)) av - bv else bv - av
        if (edge < 0) return false
        if (edge > 0) strict = true
        i += 1
      }
      strict
    }
    def sweep(it: Iterator[Row]): Iterator[Row] = {
      val kept = scala.collection.mutable.ArrayBuffer.empty[Row]
      it.foreach { p =>
        if (!kept.exists(q => dominates(q, p))) {
          kept.filterInPlace(q => !dominates(p, q))
          kept += p
        }
      }
      kept.iterator
    }
    val enc = Encoders.row(schema)
    proj.mapPartitions(sweep _)(enc)
      .repartition(1) // frontier-sized survivors — the same final merge as 2-D
      .mapPartitions(sweep _)(enc)
      .orderBy(dims.map(d => col(d._1)): _*)
  }

  def skyline(part: DataFrame): DataFrame = {
    val proj = part.select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val schema = proj.schema
    val (pi, si, ki) = (schema.fieldIndex("p_retailprice"), schema.fieldIndex("p_size"), schema.fieldIndex("p_partkey"))
    val enc = Encoders.row(schema)
    val local = proj.mapPartitions(it => sweep(it, pi, si, ki))(enc)
    local
      .repartition(1) // frontier-sized survivor set — the TopK driver-merge shape
      .mapPartitions(it => sweep(it, pi, si, ki))(enc)
      .orderBy("p_partkey")
  }
}
