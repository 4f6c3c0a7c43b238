package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.{moneySum, round}

/** q98: fixed-iteration PageRank over the co-purchase graph — the
  * link-graph importance signal corpus-curation pipelines compute over
  * web-crawl hosts (Common Crawl ranks hosts exactly this way) applied
  * to the warehouse's own part graph.
  *
  * Scale shape: the edge list is built once from the order-keyed
  * self-join (pair expansion Θ(Σ basket²), bounded by basket size like
  * q92, never table size), degree is attached to the edges up front, and
  * the edge set is cached — so each of the k iterations is one broadcast
  * join against the (node-cardinality) rank table, shuffle-free on the
  * edge side, plus one data-proportional groupBy on `dst`. Nothing driver-side
  * except the node count (one scalar). The co-purchase graph is
  * symmetric, so every node has out-degree ≥ 1 — no dangling-mass term.
  * Ranks are reported scaled by n (1.0 = uniform) and portably rounded;
  * the top-k order uses the ROUNDED value so both engines sort the same
  * keys.
  */
object Graph {

  /** Distinct co-purchase edges (src, dst) — exposed so PlanSpec can
    * assert the build is equi-join-only (the returned query result is an
    * eager checkpoint, whose plan says nothing). No repartition: every
    * consumer joins this against a node-cardinality table that Spark
    * broadcasts, so a hash exchange here would be a pure extra shuffle
    * of the (much larger) edge set — measured at sf0.1 it added ~2 s for
    * zero downstream benefit. */
  private[graft] def distinctEdges(lineitem: DataFrame): DataFrame =
    // r11: one basket aggregation + symmetric map-side pair emission +
    // one dedup aggregate (Baskets) instead of distinct + self-join +
    // distinct — 2 exchanges, was 4
    Baskets.distinctEdgesSym(
      lineitem.select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey")

  /** Degree-annotated distinct co-purchase edges (src, dst, d) for the
    * rank iteration, which divides mass by out-degree. Used by the plan
    * specs; the production rank loop keeps edges and the (node-sized)
    * degree table separate so the edge set is cached ONCE, raw. */
  private[graft] def edgesWithDegree(lineitem: DataFrame): DataFrame = {
    val edges = distinctEdges(lineitem)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    edges.join(deg, "src")
  }

  /** Out-degree per node of a (src, dst) edge set. */
  private[graft] def outDegrees(edges: DataFrame): DataFrame =
    edges.groupBy("src").agg(count(lit(1)).as("d"))

  /** The rank fixpoint loop, exposed so PlanSpec can assert the plan
    * stays O(1)-deep in the iteration count. Each iteration ends in
    * `localCheckpoint(eager = true)`: the rank table (node cardinality,
    * orders of magnitude smaller than the edge set) is materialized and
    * its lineage truncated, so iteration k+1 plans one join + one
    * aggregate over a checkpoint scan rather than a k-join tower —
    * arbitrary iteration counts stay plannable and re-optimizable (AQE
    * sees fresh sizes each round) instead of overwhelming Catalyst. */
  /** Node-count ceiling for forcing broadcast of the node-cardinality
    * rank/degree tables in the iteration (~16 B/row → ~500 MB at the
    * ceiling, inside Spark's broadcast limits with room for overhead).
    * Below it the explicit hint guarantees the cached edge set is never
    * re-shuffled; above it the hint is dropped so the planner degrades
    * to a shuffle join instead of the job failing outright on a
    * too-large broadcast — a billions-of-nodes graph runs slower, not
    * not-at-all. */
  private[graft] val MaxBroadcastNodes = 3e7

  private[graft] def iterateRanks(
      edges: DataFrame,
      deg: DataFrame,
      n: Double,
      iterations: Int,
      damping: Double): DataFrame = {
    val init = deg.select(col("src").as("node"))
      .withColumn("pr", lit(1.0 / n))
    // broadcast() is EXPLICIT (not left to autoBroadcastJoinThreshold)
    // but GATED on the measured node count: below the ceiling, Catalyst
    // falling back to a sort-merge join would re-shuffle the cached
    // edge set every iteration, voiding the shuffle-free-edge-side
    // contract; above it a forced broadcast would exceed the broadcast
    // limit and kill the job, so the hint is dropped.
    val hint: DataFrame => DataFrame =
      if (n <= MaxBroadcastNodes) broadcast else identity
    BoundedIteration.fixpoint(init, iterations) { (ranks, _) =>
      // per-source share first: a node-cardinality ⋈ node-cardinality
      // join, so the per-edge work is one probe — the edge set itself
      // is never re-joined with its own degrees.
      val share = ranks
        .join(hint(deg), col("node") === col("src"))
        .select(col("node").as("snode"), (col("pr") / col("d")).as("share"))
      edges
        .join(hint(share), col("src") === col("snode"))
        .groupBy(col("dst"))
        .agg(sum(col("share")).as("mass"))
        .select(
          col("dst").as("node"),
          (lit((1.0 - damping) / n) + lit(damping) * col("mass")).as("pr"))
    }
  }

  def coPurchasePageRank(
      lineitem: DataFrame,
      iterations: Int = 3,
      damping: Double = 0.85,
      topN: Int = 20): DataFrame = {
    // cache the raw edge set ONCE — the Θ(Σ basket²) pair expansion is
    // the dominant cost; degrees are a node-cardinality aggregate over
    // the cache, checkpointed so iterations read a 20k-row table, not a
    // re-aggregation
    val edges = distinctEdges(lineitem).cache()
    val deg = outDegrees(edges).localCheckpoint(eager = true)
    val n = deg.count().toDouble

    // materialize the (topN-row) result eagerly, then release the edge cache
    val result = iterateRanks(edges, deg, n, iterations, damping)
      .select(col("node").as("part"), round(col("pr") * n, 4).as("pr_x_n"))
      .orderBy(desc("pr_x_n"), asc("part"))
      .limit(topN)
      .localCheckpoint(eager = true)
    edges.unpersist(blocking = false)
    result
  }

  /** q104: BFS reachability — min-hop distance from a seed node over the
    * co-purchase graph ("products within k recommendation hops"; on a
    * crawl host graph, the link-distance-from-trusted-seeds quality
    * signal). Classic frontier BFS: each round broadcast-joins the
    * (shrinking) frontier against the cached edge set, anti-joins
    * the visited set, and checkpoints — k rounds = k data-proportional
    * joins, no path enumeration (the DuckDB recursive-CTE oracle walks
    * every path and min-aggregates; the operator never materializes
    * paths at all, which is what survives a dense 100 TB graph). The
    * seed defaults to the smallest node id so both engines agree on it
    * deterministically. The frontier never needs degrees, so the edge
    * set here skips the degree aggregate+join q98 pays (a 2.4M-row
    * groupBy and join, measured ~3 s at sf0.1, spent on a column BFS
    * immediately dropped). */
  def bfsReach(lineitem: DataFrame, maxHops: Int = 3): DataFrame = {
    val edges = distinctEdges(lineitem).cache()
    val seed  = edges.agg(min(col("src"))).head().getLong(0)
    val spark = lineitem.sparkSession
    import spark.implicits._
    // single-DataFrame loop state: visited (part, hops); the frontier is
    // the rows at the current hop count, not a second piece of state
    val init = Seq((seed, 0L)).toDF("part", "hops")
    val visited = BoundedIteration.fixpoint(
      init, maxHops,
      // stop as soon as a round discovers nothing (frontier exhausted)
      converged = (_, next, r) => next.filter(col("hops") === (r + 1).toLong).isEmpty) {
      (vis, r) =>
        val frontier = vis.filter(col("hops") === r.toLong).select(col("part"))
        // explicit broadcast for the same reason as iterateRanks: the
        // frontier (≤ node cardinality, usually far smaller) must probe
        // the cached edges without re-shuffling them.
        val next = edges
          .join(broadcast(frontier), col("src") === col("part"))
          .select(col("dst").as("part"))
          .distinct()
          .join(vis, Seq("part"), "left_anti")
          .withColumn("hops", lit(r + 1L))
        vis.unionByName(next)
    }
    edges.unpersist(blocking = false)
    visited.orderBy("part")
  }

  /** q282: weighted single-source shortest paths over the co-purchase
    * graph — bounded-hop Bellman–Ford ("how closely tied is every
    * product to the hub product", the weighted upgrade of q104's
    * hop-count BFS): edge weight = 1/support (strong co-purchase =
    * short distance), seed = the max-degree node (min id on ties —
    * deterministic in both engines, and it lands in the dense component
    * where the min-id seed can strand in a 2-node islet).
    *
    * Scale shape: `maxHops` relaxation rounds via [[BoundedIteration]],
    * each ONE equi-join of the cached edge set against the broadcast
    * distance table plus a node-grain min — never path enumeration (the
    * DuckDB recursive-CTE oracle walks every ≤maxHops path and
    * min-aggregates; path counts explode combinatorially, BF stays
    * Θ(edges·hops)). The broadcast hint is gated on the measured node
    * count exactly like [[iterateRanks]]. Float discipline: weights are
    * 4-dp-rounded BEFORE summation, path sums accumulate left-to-right
    * in both engines, and IEEE addition is monotone, so min-pruning
    * (dominated prefixes dropped) cannot change the attainable minimum
    * — BF's answer is bit-equal to the oracle's exhaustive min. */
  def shortestPaths(lineitem: DataFrame, minSupport: Long = 2, maxHops: Int = 4): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    val und = Baskets.pairCounts(
      lineitem.select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey")
      .filter(col("c") >= minSupport)
    val w = round(lit(1.0) / col("c"), 4)
    val edges = und
      .select(col("pa").as("src"), col("pb").as("dst"), w.as("w"))
      .unionByName(und.select(col("pb").as("src"), col("pa").as("dst"), w.as("w")))
      .cache()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    val seedRow = deg.orderBy(desc("d"), asc("src")).limit(1).head()
    val seed = seedRow.getLong(0)
    val n = deg.count().toDouble
    val hint: DataFrame => DataFrame =
      if (n <= MaxBroadcastNodes) broadcast else identity
    val init = Seq((seed, 0.0)).toDF("node", "dist")
    val dists = BoundedIteration.fixpoint(init, maxHops) { (state, _) =>
      val relaxed = edges
        .join(hint(state), col("src") === col("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      state.unionByName(relaxed).groupBy("node").agg(min(col("dist")).as("dist"))
    }
    edges.unpersist(blocking = false)
    dists.select(col("node"), round(col("dist"), 4).as("dist")).orderBy("node")
  }

  /** q288: k-CORE decomposition of the co-purchase graph — the maximal
    * subgraph where every node keeps ≥ k neighbors (the standard
    * "dense-community backbone vs periphery" split; on a crawl host
    * graph, the spam-farm/core-web separator). A NEW iterative shape
    * beside q98 (value propagation) and q104/q282 (frontier
    * expansion): PEELING — each round computes degrees over the
    * SURVIVING edge set, drops nodes under k, and prunes their edges;
    * node count is strictly decreasing until fixpoint, so convergence
    * (checked, required) arrives in ≤ #peel-waves rounds. Per round:
    * one degree aggregate + two semi-joins on the (cached-ancestor)
    * support-filtered edges — never adjacency materialization beyond
    * the edge list. Output is the surviving nodes with their in-core
    * degree. */
  def kCore(lineitem: DataFrame, k: Int = 2, minSupport: Long = 2, maxRounds: Int = 30): DataFrame = {
    val und = frequentEdges(lineitem, minSupport)
    val edges0 = und.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(und.select(col("pb").as("src"), col("pa").as("dst")))
    val init = edges0
    val core = BoundedIteration.fixpoint(
      init, maxRounds,
      converged = (prev, next, _) => next.count() == prev.count(),
      requireConvergence = true) { (edges, _) =>
      val keep = edges.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("node"))
      edges
        .join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
    }
    core.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core_degree"))
      .orderBy("node")
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
  /** q244: hierarchy rollup ("BOM explosion") — subtree totals over a
    * deterministic part hierarchy (parent(k) = k >> 1, the implicit
    * binary heap tree over part keys; a real BOM swaps in its parent
    * edge). Spark has no recursive CTE, and the Spark-first answer is
    * not an iterative loop at all: the ancestor CHAIN of a node is
    * computable in closed form per row, so one `transform`+`filter`+
    * `explode` over a constant-length shift sequence materializes every
    * (part, ancestor) pair in a single codegen'd pass — depth many rows
    * per part, one shuffle to the groupBy, no iteration, no driver.
    * The DuckDB oracle IS the recursive CTE, proving equivalence. For
    * non-arithmetic parent edges the same shape holds with a
    * closed-over parent map or an iterated self-join (log-depth rounds,
    * the q104 frontier pattern). Reported for the top `levels` of the
    * tree; `maxDepth` bounds the chain (40 covers any int64 key). */
  def bomRollup(part: DataFrame, levels: Int = 5, maxDepth: Int = 40): DataFrame =
    part
      // hierarchy key is p_partkey + 1: part keys are 0-based, and node 0
      // would be its own parent (0 >> 1 = 0) — shifting to 1-based makes
      // node 1 the unique root
      .select((col("p_partkey") + 1).as("hk"), col("p_retailprice"))
      .withColumn("node",
        explode(expr(s"filter(transform(sequence(0, $maxDepth), i -> shiftright(hk, i)), a -> a >= 1)")))
      .filter(col("node") < (1L << levels))
      .groupBy("node")
      .agg(
        count(lit(1)).as("n_parts"),
        round(moneySum(col("p_retailprice")), 2).as("subtree_cost"))
      .orderBy("node")

  /** Canonically-oriented (pa < pb) co-purchase edges with support ≥
    * `minSupport` — the shared build for q245/q249 (q192 keeps its own
    * inline copy with identical semantics, asserted by its spec). The
    * Θ(Σ basket²) pair expansion dominates every consumer, so callers
    * cache the result and unpersist after materializing. */
  private[graft] def frequentEdges(lineitem: DataFrame, minSupport: Long): DataFrame =
    // r11: single-shuffle basket aggregation + map-side pair emission
    // (see Baskets) — bit-identical rows to the former self-join build
    Baskets.pairCounts(
      lineitem.select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey")
      .filter(col("c") >= minSupport)
      .select("pa", "pb")

  /** q245: common-neighbor link prediction over the frequent co-purchase
    * graph — "which products are never bought together but share many
    * co-purchase partners" (the classic missing-link recommender
    * signal). The support filter bounds the graph exactly as in q192;
    * wedges x–y–z enumerate by one self-join of the symmetrized
    * adjacency on the shared endpoint, predicted pairs are wedge
    * endpoints with NO closing edge (left_anti against the edge set),
    * scored by common-neighbor count and Jaccard over neighbor sets
    * (cn / (deg x + deg z − cn) — degrees join in from a one-pass
    * aggregate). Ties break on integer keys so top-k is engine-stable. */
  def linkPrediction(lineitem: DataFrame, minSupport: Long = 2, topN: Int = 20): DataFrame = {
    val edges = frequentEdges(lineitem, minSupport).cache()
    val adj = edges.unionAll(edges.select(col("pb").as("pa"), col("pa").as("pb")))
    val deg = adj.groupBy(col("pa").as("node")).agg(count(lit(1)).as("d"))
    val wedges = adj.select(col("pa").as("y"), col("pb").as("x"))
      .join(adj.select(col("pa").as("y2"), col("pb").as("z")), col("y") === col("y2"))
      .filter(col("x") < col("z"))
      .groupBy("x", "z")
      .agg(count(lit(1)).as("cn"))
    val predicted = wedges
      .join(edges.withColumnRenamed("pa", "x").withColumnRenamed("pb", "z"),
        Seq("x", "z"), "left_anti")
      .join(deg.select(col("node").as("x"), col("d").as("dx")), "x")
      .join(deg.select(col("node").as("z"), col("d").as("dz")), "z")
      .select(
        col("x").as("part_a"), col("z").as("part_b"), col("cn").as("common_neighbors"),
        round(col("cn").cast("double") / (col("dx") + col("dz") - col("cn")), 4).as("jaccard"))
      .orderBy(desc("common_neighbors"), asc("part_a"), asc("part_b"))
      .limit(topN)
      .localCheckpoint(eager = true)
    edges.unpersist(blocking = false)
    predicted
  }

  /** q249: degree assortativity of the frequent co-purchase graph — the
    * Pearson correlation of endpoint degrees over edges ("do popular
    * products co-sell with popular products"), the one-number summary of
    * hub structure that separates social-style graphs (r>0) from
    * hub-and-spoke retail graphs (r<0). Support-filtered edge set (q192
    * idiom), degrees from one aggregate of the symmetrized adjacency,
    * attached to both edge endpoints by two node-keyed joins, then one
    * `corr` scalar — degree inputs are exact integers so both engines
    * correlate identical values. */
  def degreeAssortativity(lineitem: DataFrame, minSupport: Long = 2): DataFrame = {
    // cached: the adjacency feeds the plan three times (probe side plus
    // two degree joins) and the pair expansion behind it must run once
    val edges = frequentEdges(lineitem, minSupport).cache()
    val adj = edges.unionAll(edges.select(col("pb").as("pa"), col("pa").as("pb")))
    val deg = adj.groupBy(col("pa").as("node")).agg(count(lit(1)).as("d"))
    val result = adj
      .join(deg.select(col("node").as("pa"), col("d").as("da")), "pa")
      .join(deg.select(col("node").as("pb"), col("d").as("db")), "pb")
      .agg(
        (count(lit(1)) / 2).cast("long").as("n_edges"),
        round(corr(col("da").cast("double"), col("db").cast("double")), 4).as("assortativity"))
      .localCheckpoint(eager = true)
    edges.unpersist(blocking = false)
    result
  }

  def triangleCensus(lineitem: DataFrame, minSupport: Long = 2): DataFrame = {
    // r11: q192's contract (and oracle) counts LINE pairs, not distinct
    // basket pairs — the by-line Baskets variant keeps multiplicities
    // bit-identical to the former raw self-join while still collapsing
    // the build to two exchanges
    val edges = Baskets.pairCountsByLine(
      lineitem.select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey")
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

  /** q323: per-node LOCAL clustering coefficient over the frequent
    * co-purchase graph — q192 gives the one-number global census; this
    * is the node-level view ("which products sit inside tightly-knit
    * bundles vs. span unrelated baskets"), the standard local-structure
    * feature for node classification and community seeding.
    *
    * Triangles enumerate once in canonical x<y<z orientation (the q192
    * two-join shape), then each triangle credits ALL THREE corners via
    * a 3-row explode — per-node triangle counts come from one groupBy
    * over that, never from re-enumerating per node. Degrees are one
    * aggregate of the symmetrized adjacency; cc(v) = 2T(v)/(d(v)(d(v)−1))
    * with the d<2 frame filtered out before the division (ANSI). Ranked
    * by the ROUNDED coefficient with key tie-breaks so top-k is
    * engine-stable. */
  def localClusteringCoefficient(
      lineitem: DataFrame,
      minSupport: Long = 2,
      topN: Int = 20): DataFrame = {
    val edges = frequentEdges(lineitem, minSupport).cache()
    val wedgePaths = edges.select(col("pa").as("x"), col("pb").as("y"))
      .join(edges.select(col("pa").as("y2"), col("pb").as("z")), col("y") === col("y2"))
    val triCorners = wedgePaths
      .join(edges.select(col("pa").as("x3"), col("pb").as("z3")),
        col("x") === col("x3") && col("z") === col("z3"))
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    val deg = edges.select(col("pa").as("node")).unionAll(edges.select(col("pb").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val out = deg
      .filter(col("degree") >= 2)
      .join(triCorners, Seq("node"), "left")
      .select(
        col("node").as("part"), col("degree"),
        coalesce(col("tri"), lit(0L)).as("n_triangles"),
        round(lit(2.0) * coalesce(col("tri"), lit(0L)) /
          (col("degree") * (col("degree") - 1)), 4).as("local_cc"))
      .orderBy(desc("local_cc"), desc("degree"), asc("part"))
      .limit(topN)
      .localCheckpoint(eager = true)
    edges.unpersist(blocking = false)
    out
  }

  /** q310: personalized PageRank from a seed part over the co-purchase
    * graph — the "customers who bought this also explored…"
    * recommendation kernel: probability mass restarts at the SEED with
    * probability 1−d instead of everywhere, so scores measure proximity
    * to the seed, not global importance (q98's PageRank). Seed = the
    * highest-degree part (deterministic, key tie-break). Two unrolled
    * iterations at binary-exact d = 0.875 (the q292/q299 oracle
    * discipline; convergence runs route through [[BoundedIteration]]).
    *
    * Scale: same shape as q98 — weighted edges from the support-
    * filtered co-purchase build, per iteration one edge-proportional
    * equi-join + node groupBy; the seed row and normalizers are 1-row
    * broadcast scalars; top-k via TakeOrdered. */
  def personalizedPageRank(
      lineitem: DataFrame,
      minSupport: Long = 2,
      topN: Int = 20,
      d: Double = 0.875): DataFrame = {
    // weighted co-purchase edges (frequentEdges' build, keeping the
    // co-occurrence count as the edge weight; r11: Baskets single-shuffle
    // form, same rows)
    val canon = Baskets.pairCounts(
      lineitem.select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey")
      .withColumnRenamed("c", "w")
      .filter(col("w") >= minSupport)
    // NOT cached despite six consumers: AQE's ReuseExchange already
    // dedupes the repeated shuffle subtrees here (measured 2.6 s warm),
    // while a cache boundary blocks its broadcast re-planning and
    // columnar-materializes the frame (measured 7.1 s — 2.7× worse).
    // The q98 cache rule applies to ITERATED reuse across jobs, not
    // shared subtrees within one plan.
    val edges = canon.select(col("pa").as("a"), col("pb").as("b"), col("w"))
      .unionAll(canon.select(col("pb").as("a"), col("pa").as("b"), col("w")))
    val wdeg = edges.groupBy("a").agg(sum("w").as("wd"))
    // deterministic seed: max weighted degree, part-key tie-break
    val seed = wdeg
      .orderBy(col("wd").desc, col("a"))
      .limit(1)
      .select(col("a").as("seed"))
    // r0 = e_seed; r1 = (1−d)e + d·W·r0 — only the seed's out-edges
    // carry mass, so iteration 1 is a seed-filtered edge scan
    val r1 = edges
      .join(broadcast(seed), col("a") === col("seed"))
      .join(wdeg, "a")
      .select(col("b").as("node"), (lit(d) * col("w") / col("wd")).as("m"))
      .groupBy("node").agg(sum("m").as("r"))
      .unionByName(seed.select(col("seed").as("node"), lit(1.0 - d).as("r")))
      .groupBy("node").agg(sum("r").as("r1"))
    val r2 = edges
      .join(r1.withColumnRenamed("node", "a"), "a")
      .join(wdeg, "a")
      .select(col("b").as("node"), (lit(d) * col("w") / col("wd") * col("r1")).as("m"))
      .groupBy("node").agg(sum("m").as("r"))
      .unionByName(seed.select(col("seed").as("node"), lit(1.0 - d).as("r")))
      .groupBy("node").agg(sum("r").as("r2"))
    r2
      .crossJoin(broadcast(seed))
      .select(
        col("seed").as("seed_part"), col("node").as("part"),
        round(col("r2") * 1000, 6).as("ppr_x1000"))
      .orderBy(col("ppr_x1000").desc, col("part"))
      .limit(topN)
  }

  /** q292: HITS hubs & authorities on the supplier→part bipartite graph
    * — the mutually-recursive centrality (a good hub supplies
    * well-sourced parts; a good authority is supplied by broad hubs)
    * that degree (and PageRank's single score, q98) can't separate. Two
    * unrolled iterations with L1 normalization: h¹ = degree/|E|,
    * a¹ ∝ Σ h¹ over in-edges, h² ∝ Σ a¹ over out-edges.
    *
    * k is a FIXED small constant (unrolled, not iterated-to-
    * convergence) so the DuckDB oracle can replay the identical
    * dataflow; for convergence runs, route the same two joins through
    * [[BoundedIteration]] like q98. Scale shape: per iteration one
    * edge-proportional equi-join + node-level groupBy sum (map-side
    * combinable); normalizers are 1-row broadcast scalars. Output is
    * the top-k of each side — rank on the ROUNDED score with key
    * tie-break, so ordering is engine-stable. */
  def hits(lineitem: DataFrame, topN: Int = 20): DataFrame = {
    val edges = lineitem
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
      .distinct()
    // h1(s) = deg(s) / |E| : the L1-normalized first hub pass (a0 ≡ 1).
    // |E| = Σ deg is exact integer arithmetic — no float normalizer yet.
    val eCount = edges.agg(count(lit(1)).as("m"))
    val h1 = edges.groupBy("s").agg(count(lit(1)).as("deg"))
      .crossJoin(broadcast(eCount))
      .select(col("s"), (col("deg").cast("double") / col("m")).as("h1"))
    // a1(p) ∝ Σ_{s→p} h1(s), L1-normalized
    val a1raw = edges.join(broadcast(h1), "s").groupBy("p").agg(sum("h1").as("a1raw"))
    val a1norm = a1raw.agg(sum("a1raw").as("za"))
    val a1 = a1raw.crossJoin(broadcast(a1norm))
      .select(col("p"), (col("a1raw") / col("za")).as("a1"))
    // h2(s) ∝ Σ_{s→p} a1(p), L1-normalized
    val h2raw = edges.join(broadcast(a1), "p").groupBy("s").agg(sum("a1").as("h2raw"))
    val h2norm = h2raw.agg(sum("h2raw").as("zh"))
    val h2 = h2raw.crossJoin(broadcast(h2norm))
      .select(col("s"), (col("h2raw") / col("zh")).as("h2"))

    val hubs = h2.select(
      lit("hub").as("role"), col("s").as("node_id"),
      round(col("h2") * 1000, 6).as("score_x1000"))
    val auths = a1.select(
      lit("authority").as("role"), col("p").as("node_id"),
      round(col("a1") * 1000, 6).as("score_x1000"))
    import org.apache.spark.sql.expressions.Window
    // row_number ≤ k over a 2-value partition key: safe at node scale
    // because Spark rewrites it to Partial/Final WindowGroupLimit (each
    // task pre-keeps ≤ k rows per role before the shuffle — asserted in
    // PlanSpec for the q03 idiom), so the reducer sees k·partitions
    // rows, not every node
    val w = Window.partitionBy("role")
      .orderBy(col("score_x1000").desc, col("node_id"))
    hubs.unionByName(auths)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
      .orderBy("role", "rank")
  }
}
