package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.round

/** q98: fixed-iteration PageRank over the co-purchase graph — the
  * link-graph importance signal corpus-curation pipelines compute over
  * web-crawl hosts (Common Crawl ranks hosts exactly this way) applied
  * to the warehouse's own part graph.
  *
  * Scale shape: the edge list is built once from the order-keyed
  * self-join (pair expansion Θ(Σ basket²), bounded by basket size like
  * q92, never table size), degree is attached to the edges up front, and
  * the edge set is hash-partitioned by `src` and cached — so each of the
  * k iterations is one join against the (node-cardinality) rank table
  * plus one data-proportional groupBy on `dst`. Nothing driver-side
  * except the node count (one scalar). The co-purchase graph is
  * symmetric, so every node has out-degree ≥ 1 — no dangling-mass term.
  * Ranks are reported scaled by n (1.0 = uniform) and portably rounded;
  * the top-k order uses the ROUNDED value so both engines sort the same
  * keys.
  */
object Graph {

  /** Degree-annotated distinct co-purchase edges (src, dst, d) — exposed
    * so PlanSpec can assert the build is equi-join-only (the returned
    * query result is an eager checkpoint, whose plan says nothing). */
  private[graft] def edgesWithDegree(lineitem: DataFrame): DataFrame = {
    val items = lineitem
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk"))
      .distinct()
    val edges = items.as("a")
      .join(items.as("b"), col("a.okey") === col("b.okey") && col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    edges.join(deg, "src").repartition(col("src"))
  }

  /** The rank fixpoint loop, exposed so PlanSpec can assert the plan
    * stays O(1)-deep in the iteration count. Each iteration ends in
    * `localCheckpoint(eager = true)`: the rank table (node cardinality,
    * orders of magnitude smaller than the edge set) is materialized and
    * its lineage truncated, so iteration k+1 plans one join + one
    * aggregate over a checkpoint scan rather than a k-join tower —
    * arbitrary iteration counts stay plannable and re-optimizable (AQE
    * sees fresh sizes each round) instead of overwhelming Catalyst. */
  private[graft] def iterateRanks(
      edgesWithDeg: DataFrame,
      n: Double,
      iterations: Int,
      damping: Double): DataFrame = {
    var ranks = edgesWithDeg.select(col("src").as("node")).distinct()
      .withColumn("pr", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      ranks = edgesWithDeg
        .join(ranks, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("d")).as("mass"))
        .select(
          col("dst").as("node"),
          (lit((1.0 - damping) / n) + lit(damping) * col("mass")).as("pr"))
        .localCheckpoint(eager = true)
    }
    ranks
  }

  def coPurchasePageRank(
      lineitem: DataFrame,
      iterations: Int = 3,
      damping: Double = 0.85,
      topN: Int = 20): DataFrame = {
    val edgesWithDeg = edgesWithDegree(lineitem).cache()
    val n = edgesWithDeg.select(countDistinct(col("src"))).head().getLong(0).toDouble

    // materialize the (topN-row) result eagerly, then release the edge cache
    val result = iterateRanks(edgesWithDeg, n, iterations, damping)
      .select(col("node").as("part"), round(col("pr") * n, 4).as("pr_x_n"))
      .orderBy(desc("pr_x_n"), asc("part"))
      .limit(topN)
      .localCheckpoint(eager = true)
    edgesWithDeg.unpersist(blocking = false)
    result
  }

  /** q104: BFS reachability — min-hop distance from a seed node over the
    * co-purchase graph ("products within k recommendation hops"; on a
    * crawl host graph, the link-distance-from-trusted-seeds quality
    * signal). Classic frontier BFS: each round joins the (shrinking)
    * frontier against the cached src-partitioned edge set, anti-joins
    * the visited set, and checkpoints — k rounds = k data-proportional
    * joins, no path enumeration (the DuckDB recursive-CTE oracle walks
    * every path and min-aggregates; the operator never materializes
    * paths at all, which is what survives a dense 100 TB graph). The
    * seed defaults to the smallest node id so both engines agree on it
    * deterministically. */
  def bfsReach(lineitem: DataFrame, maxHops: Int = 3): DataFrame = {
    val edges = edgesWithDegree(lineitem).select("src", "dst").cache()
    val seed  = edges.agg(min(col("src"))).head().getLong(0)
    val spark = lineitem.sparkSession
    import spark.implicits._
    var visited  = Seq((seed, 0L)).toDF("part", "hops").localCheckpoint(eager = true)
    var frontier = visited.select(col("part"))
    var h = 1
    while (h <= maxHops && !frontier.isEmpty) {
      val next = edges
        .join(frontier, col("src") === col("part"))
        .select(col("dst").as("part"))
        .distinct()
        .join(visited, Seq("part"), "left_anti")
        .withColumn("hops", lit(h.toLong))
        .localCheckpoint(eager = true)
      visited = visited.unionByName(next).localCheckpoint(eager = true)
      frontier = next.select(col("part"))
      h += 1
    }
    edges.unpersist(blocking = false)
    visited.orderBy("part")
  }

  /** q192: triangle census + global clustering coefficient of the
    * co-purchase graph, over edges with support ≥ `minSupport` (pairs
    * co-bought at least that often — the same support filter q92/q106
    * use, which also bounds the enumeration).
    *
    * Edges are canonically oriented (pa < pb), so each triangle is
    * enumerated exactly once as the path x→y→z (x<y<z) closed by the
    * x→z edge: two equi-joins over the edge table, both on edge keys.
    * The wedge count Σ d(v)·(d(v)−1)/2 comes from one degree aggregate;
    * the global coefficient is 3·triangles / wedges. The filtered edge
    * set is cached — it is read three times (path join ×2, degrees) and
    * is orders of magnitude smaller than the pair expansion that builds
    * it. At 100 TB the support filter is the scale lever: raising it
    * prunes the heavy tail that drives the join fan-out. */
  def triangleCensus(lineitem: DataFrame, minSupport: Long = 2): DataFrame = {
    val a = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
    val b = lineitem.select(col("l_orderkey").as("ok_b"), col("l_partkey").as("pb"))
    val edges = a
      .join(b, col("ok") === col("ok_b") && col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minSupport)
      .select("pa", "pb")
      .cache()
    val wedgePaths = edges.select(col("pa").as("x"), col("pb").as("y"))
      .join(edges.select(col("pa").as("y2"), col("pb").as("z")), col("y") === col("y2"))
    val triangles = wedgePaths
      .join(edges.select(col("pa").as("x3"), col("pb").as("z3")),
        col("x") === col("x3") && col("z") === col("z3"))
      .agg(count(lit(1)).as("n_triangles"))
    val edgeCount = edges.agg(count(lit(1)).as("n_edges"))
    val wedgeCount = edges
      .select(col("pa").as("node")).unionAll(edges.select(col("pb").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
      .agg(sum((col("d") * (col("d") - 1) / 2).cast("long")).as("n_wedges"))
    edgeCount
      .crossJoin(wedgeCount)
      .crossJoin(triangles)
      .select(
        col("n_edges"), col("n_wedges"), col("n_triangles"),
        round(
          when(col("n_wedges") > 0, lit(3.0) * col("n_triangles") / col("n_wedges"))
            .otherwise(lit(0.0)), 4).as("global_cc"))
  }
}
