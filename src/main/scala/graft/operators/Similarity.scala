package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.round
import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (SURVEY.md §2 q50–q52).
  *
  * Brute-force cosine is the exact baseline (query side broadcast, one
  * pass over candidates, TakeOrdered-style window top-k). The scale path
  * is *banded* signed-random-projection LSH — the same OR-of-ANDs band
  * construction as MinHash LSH (Dedup.scala): `numBands` independent
  * bucket tables of `planesPerBand` sign bits each. A candidate is
  * anything sharing ≥1 band bucket with the query. Two scale guarantees
  * the flat-bucket design lacked:
  *
  *   - recall is an OR across bands (1-(1-p^r)^b), tunable without
  *     growing any single bucket's occupancy;
  *   - `maxBucket` caps degenerate buckets BEFORE pair expansion, so a
  *     hot bucket is Θ(maxBucket²), never Ω(n²/buckets).
  *
  * LSH's contract is *near*-neighbor retrieval: recall is high where
  * cosine is high (the dedup/near-dup regime it exists for) and decays
  * for low-similarity "neighbors" — on uniformly random vectors whose
  * true top-k sit at cosine ≈ 0.4, no sublinear index retrieves the
  * exact top-k; the specs therefore measure recall on planted
  * high-similarity clusters.
  */
object Similarity {

  /** q50: per-label vector statistics (norms in double precision). */
  def embeddingStats(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), norm(col("embedding")).as("nrm"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        round(avg("nrm"), 4).as("avg_norm"),
        round(min("nrm"), 4).as("min_norm"),
        round(max("nrm"), 4).as("max_norm"))
      .orderBy("label")

  /** q308: embedding quality audit — the vector-side data-quality gate
    * an ANN/training pipeline runs BEFORE indexing: per label the
    * zero-norm count (dead encoder outputs poison cosine similarity),
    * non-finite component count (NaN/Inf propagate through every dot
    * product), and norm outliers at |z| > 3 against the label's own
    * norm distribution (a drifting encoder shifts norms long before
    * recall visibly drops). The q96/q304 audit discipline applied to
    * the embeddings table.
    *
    * Scale: one scan computes norms + badness flags map-side (the q50
    * norm kernel); label moment stats are a bounded aggregate joined
    * back broadcast; no window touches the fact table. Non-finite test
    * is isnan ∨ |x|>1e38 — portable (no isinf in Spark SQL; float Inf
    * exceeds any finite float threshold in both engines). */
  def embeddingQa(embeddings: DataFrame, zThresh: Double = 3.0): DataFrame = {
    val bad = exists(col("embedding"),
      x => isnan(x.cast("double")) || abs(x.cast("double")) > lit(1e38))
    val base = embeddings.select(
      col("label"), norm(col("embedding")).as("nrm"), bad.as("is_bad"))
    val stats = base.groupBy("label").agg(
      count(lit(1)).as("n_vecs"),
      count(when(col("nrm") === 0.0, lit(1))).as("n_zero_norm"),
      count(when(col("is_bad"), lit(1))).as("n_nonfinite"),
      avg("nrm").as("mu"),
      stddev_samp("nrm").as("sd"))
    base
      .join(broadcast(stats), "label")
      .groupBy(col("label"), col("n_vecs"), col("n_zero_norm"), col("n_nonfinite"),
        col("mu"), col("sd"))
      // nested when: the z division must not evaluate when sd = 0
      // (ANSI throws on /0; CaseWhen arms are lazy, And operands may
      // not be)
      .agg(count(
        when(col("sd") > 0,
          when(abs(col("nrm") - col("mu")) / col("sd") > zThresh, lit(1))))
        .as("n_norm_outliers"))
      .select(
        col("label"), col("n_vecs"), col("n_zero_norm"), col("n_nonfinite"),
        round(col("mu"), 4).as("avg_norm"),
        round(col("sd"), 4).as("std_norm"),
        col("n_norm_outliers"))
      .orderBy("label")
  }

  /** q113: per-label mean embedding (centroid pooling — the k-means
    * M-step, and the chunk→document embedding pool) in LONG format
    * (label, dim, avg_val): posexplode fans each vector to (dim, val)
    * rows map-side, and the (label, dim) groupBy partial-aggregates
    * BEFORE its shuffle — the wire carries #labels × d partial sums,
    * not n × d values. Long format keeps the result hash-comparable
    * per element (no array-of-float equality) and feeds both the
    * centroid table (q88 consumes exactly this shape, pivoted) and any
    * re-normalization step. */
  def meanEmbedding(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), (col("pos") + 1).cast("long").as("dim"))
      .agg(round(avg(col("v")), 4).as("avg_val"), count(lit(1)).as("n_vecs"))
      .orderBy("label", "dim")

  /** q51: brute-force cosine top-k. Queries are broadcast; ranking is a
    * per-query window. Embeddings here are unit-norm so cosine ≡ dot. */
  def annBruteForce(embeddings: DataFrame, numQueries: Int = 3, k: Int = 5): DataFrame = {
    val q = embeddings.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = embeddings.filter(col("vec_id") >= numQueries)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    c.crossJoin(broadcast(q))
      .withColumn("cos", dot(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 4).as("cosine"))
      .orderBy("qid", "rk")
  }

  /** q163: reciprocal-rank fusion (RRF) of two retrieval rankings — the
    * hybrid-search primitive (full-precision ranking ⊕ a cheap
    * first-stage, here the 8-dim truncated embedding standing in for the
    * sparse/keyword leg). RRF scores `Σ 1/(k0 + rank)` over the union of
    * the two top-m lists — scale-free, so no score calibration between
    * legs is needed, which is exactly why engines fuse this way.
    *
    * ONE broadcast-scored pass computes both similarity legs; both ranks
    * come from windows over the same (query-partitioned) shuffle; the
    * fusion is a row-local expression — no second scan, no join between
    * the legs. DuckDB-oracled (both engines accumulate the dot in double
    * over float inputs, and rank ties break on cid); the spec
    * additionally recomputes RRF from the collected legs and pins the
    * both-legs-top-1 dominance property. */
  def annRrfFusion(
      embeddings: DataFrame,
      numQueries: Int = 3,
      m: Int = 10,
      k: Int = 5,
      k0: Int = 60,
      cheapDims: Int = 8): DataFrame = {
    val q = embeddings.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = embeddings.filter(col("vec_id") >= numQueries)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w1 = Window.partitionBy("qid").orderBy(desc("s_full"), asc("cid"))
    val w2 = Window.partitionBy("qid").orderBy(desc("s_cheap"), asc("cid"))
    val wf = Window.partitionBy("qid").orderBy(desc("rrf"), asc("cid"))
    c.crossJoin(broadcast(q))
      .withColumn("s_full", dot(col("qe"), col("ce")))
      .withColumn("s_cheap", dot(slice(col("qe"), 1, cheapDims), slice(col("ce"), 1, cheapDims)))
      .withColumn("rk_full", row_number().over(w1).cast("long"))
      .withColumn("rk_cheap", row_number().over(w2).cast("long"))
      .withColumn("rrf",
        when(col("rk_full") <= m, lit(1.0) / (lit(k0) + col("rk_full"))).otherwise(lit(0.0)) +
          when(col("rk_cheap") <= m, lit(1.0) / (lit(k0) + col("rk_cheap"))).otherwise(lit(0.0)))
      .filter(col("rrf") > 0)
      .withColumn("rk", row_number().over(wf).cast("long"))
      .filter(col("rk") <= k)
      .select(
        col("qid"), col("rk"), col("cid"),
        col("rk_full"), col("rk_cheap"), round(col("rrf"), 4).as("rrf_score"))
      .orderBy("qid", "rk")
  }

  /** JIT kernels for the no-oracle LSH path: higher-order column math is
    * interpreted (≈µs/element, boxed); these tight loops are the same
    * arithmetic at ns/element. q51 keeps the declarative dot so its
    * evaluation order matches the DuckDB oracle exactly. */
  private def srpBandsUdf(numBands: Int, planesPerBand: Int, dim: Int) = {
    val planes = rademacherPlanes(numBands * planesPerBand, dim).map(_.toArray).toArray
    udf { (v: Seq[Float]) =>
      val a = v.toArray
      Array.tabulate(numBands) { b =>
        var bucket = 0
        var j = 0
        while (j < planesPerBand) {
          val plane = planes(b * planesPerBand + j)
          var d = 0.0
          var i = 0
          val n = math.min(plane.length, a.length)
          while (i < n) { d += plane(i) * a(i); i += 1 }
          bucket = bucket * 2 + (if (d > 0) 1 else 0)
          j += 1
        }
        bucket
      }
    }
  }

  private val dotUdf = udf { (x: Seq[Float], y: Seq[Float]) =>
    val a = x.toArray; val b = y.toArray
    var d = 0.0; var i = 0
    while (i < a.length && i < b.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
    d
  }

  /** (vec_id, embedding, band, bucket) — one row per band, all map-side. */
  private def banded(embeddings: DataFrame, numBands: Int, planesPerBand: Int, dim: Int): DataFrame =
    embeddings
      .withColumn("bands", srpBandsUdf(numBands, planesPerBand, dim)(col("embedding")))
      .select(col("vec_id"), col("embedding"), posexplode(col("bands")).as(Seq("band", "bucket")))

  /** Drop rows in degenerate (band, bucket) groups — the cap that keeps
    * pair expansion Θ(maxBucket²) per bucket instead of Ω(n²/buckets). */
  private def capBuckets(bandedRows: DataFrame, maxBucket: Int): DataFrame =
    bandedRows
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")

  /** q43: embedding-cosine near-dup pairs — the dedup-by-embedding path.
    * Banded SRP buckets generate candidates (OR across bands, never a
    * cross join), `maxBucket` bounds every bucket's pair expansion,
    * verification joins embeddings back onto the DISTINCT pair ids
    * (16-byte rows through the dedup shuffle, not float arrays), and the
    * global top-N is an `orderBy.limit` TakeOrdered merge. */
  def embeddingNearDupPairs(
      embeddings: DataFrame,
      numBands: Int = 6,
      planesPerBand: Int = 5,
      dim: Int = 64,
      topN: Int = 20,
      maxBucket: Int = 200): DataFrame =
    verifiedEmbeddingPairs(embeddings, numBands, planesPerBand, dim, maxBucket)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_a"), asc("vec_b"))
      .limit(topN)

  /** Shared candidate pipeline for the embedding near-dup family:
    * banded SRP buckets → cap → self-join → distinct pairs → exact
    * cosine. Both q43 (top-N) and q65 (threshold) rank/filter this. */
  private def verifiedEmbeddingPairs(
      embeddings: DataFrame,
      numBands: Int,
      planesPerBand: Int,
      dim: Int,
      maxBucket: Int): DataFrame = {
    val capped = capBuckets(banded(embeddings, numBands, planesPerBand, dim), maxBucket)
    val l = capped.select(col("band"), col("bucket"), col("vec_id").as("vec_a"))
    val r = capped.select(col("band"), col("bucket"), col("vec_id").as("vec_b"))
    val cand = l.join(r, Seq("band", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
      .distinct()
    val ea = embeddings.select(col("vec_id").as("vec_a"), col("embedding").as("e_a"))
    val eb = embeddings.select(col("vec_id").as("vec_b"), col("embedding").as("e_b"))
    cand
      .join(ea, "vec_a")
      .join(eb, "vec_b")
      .withColumn("cos", dotUdf(col("e_a"), col("e_b")))
  }

  /** All near-dup pairs above a cosine threshold (the un-truncated
    * sibling of [[embeddingNearDupPairs]]). */
  def embeddingPairsAbove(
      embeddings: DataFrame,
      cosThreshold: Double,
      numBands: Int = 6,
      planesPerBand: Int = 5,
      dim: Int = 64,
      maxBucket: Int = 200): DataFrame =
    verifiedEmbeddingPairs(embeddings, numBands, planesPerBand, dim, maxBucket)
      .filter(col("cos") >= cosThreshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cosine"))

  /** q65: semantic dedup (the SemDeDup recipe) — drop documents whose
    * EMBEDDINGS nearly coincide, catching paraphrases and re-renders
    * that defeat token-level dedup. Pipeline: SRP-LSH candidate pairs →
    * exact cosine ≥ `cosThreshold` → connected components → keep one
    * canonical per semantic cluster. Every stage is the verified scale
    * shape from q43/q47: bucket-capped candidates, data-proportional
    * shuffles, ≤diameter propagation rounds. */
  def semanticDedup(
      embeddings: DataFrame,
      cosThreshold: Double = 0.9,
      maxRounds: Int = 5): DataFrame =
    Dedup.connectedComponents(
        embeddingPairsAbove(embeddings, cosThreshold), "vec_a", "vec_b", maxRounds)
      .withColumnRenamed("node_id", "vec_id")
      .orderBy("cluster_id", "vec_id")

  /** q65 driver entry: semantic-dedup cluster-size histogram — one row
    * per distinct cluster size with the number of clusters at that size,
    * singletons (vectors in no near-dup cluster) counted as size-1
    * clusters. [[semanticDedup]] itself returns only clustered members,
    * which is EMPTY on a corpus with no pairs over the threshold (true
    * of the synthetic embeddings at small SF — max candidate cosine
    * ~0.49); a histogram over ALL vectors is never empty, its row count
    * is data-dependent, and it is what a curation run reports anyway
    * (dedup rate = 1 − Σn_clusters/Σ(size·n_clusters)). Scale shape:
    * the clustered side is the q47 component output (data-proportional);
    * the singleton count is one corpus count minus one cluster-member
    * count — no extra scan of the embedding arrays, ids only. */
  def semanticDedupStats(
      embeddings: DataFrame,
      cosThreshold: Double = 0.9,
      maxRounds: Int = 5): DataFrame = {
    val members = semanticDedup(embeddings, cosThreshold, maxRounds)
    val perCluster = members.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    val clusteredHist = perCluster.groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
    val nTotal = embeddings.agg(count(lit(1)).as("n_total"))
    val nMembers = members.agg(count(lit(1)).as("n_members"))
    val singletons = nTotal
      .crossJoin(nMembers) // 1×1 broadcast scalars, not fact data
      .select(lit(1L).as("cluster_size"), (col("n_total") - col("n_members")).as("n_clusters"))
      .filter(col("n_clusters") > 0)
    clusteredHist
      .unionByName(singletons)
      .groupBy("cluster_size")
      .agg(sum("n_clusters").as("n_clusters"))
      .orderBy("cluster_size")
  }

  /** q52: banded SRP-LSH ANN — the 100 TB scale path beside q51.
    *
    * The tiny query side is banded and broadcast; the candidate side is
    * banded map-side, degenerate buckets capped, and joined on
    * (band, bucket) — data-proportional, each candidate row touched once
    * per band it shares with a query. A pair matching in several bands is
    * deduplicated by aggregating the 24-byte (qid, cid, cos) triple
    * (map-side combinable partial aggregation), NOT by dropDuplicates
    * over embedding arrays. Final ranking is a per-query window over the
    * deduped candidates only. */
  /** Spherical k-means coarse quantizer for IVF: Lloyd iterations over a
    * bounded, deterministic sample (the standard IVF recipe — the
    * quantizer trains offline on a sample; only ASSIGNMENT is
    * data-proportional). Centroids are renormalized each round so
    * nearest-by-dot ≡ nearest-by-cosine on unit vectors. */
  private[graft] def trainCentroids(
      sample: Array[Array[Float]],
      nCells: Int,
      iters: Int): Array[Array[Float]] = {
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    def dotFF(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { d += a(i).toDouble * b(i).toDouble; i += 1 }
      d
    }
    var cents = sample.take(nCells).map(unit)
    var it = 0
    while (it < iters) {
      val sums   = Array.fill(cents.length)(new Array[Double](sample.head.length))
      val counts = new Array[Long](cents.length)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MinValue; var c = 0
        while (c < cents.length) {
          val d = dotFF(cents(c), v); if (d > bestD) { bestD = d; best = c }; c += 1
        }
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c) // empty cell keeps its centroid
        else unit(sums(c).map(_.toFloat))
      }.toArray
      it += 1
    }
    cents
  }

  private def bestCell(cents: Array[Array[Float]], v: Seq[Float]): Int = {
    val a = v.toArray
    var best = 0; var bestD = Double.MinValue; var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var d = 0.0; var i = 0
      val n = math.min(ct.length, a.length)
      while (i < n) { d += ct(i) * a(i); i += 1 }
      if (d > bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** q53: IVF ANN — the inverted-file scale path beside SRP-LSH (q52).
    *
    * A coarse quantizer (spherical k-means, trained on a deterministic
    * bounded sample) partitions the corpus into `nCells` inverted lists;
    * each base vector is assigned to its nearest cell in ONE map pass
    * over a broadcast centroid table. A query probes its `nProbe`
    * nearest cells, so the scan touches ~nProbe/nCells of the corpus —
    * at 100 TB, cells scale as √n and the probed fraction keeps falling.
    * Candidates join on the cell id (tiny query side broadcast), a pair
    * appears in exactly one cell (the candidate's), and ranking is a
    * per-query window over candidates only. */
  def annIvf(
      embeddings: DataFrame,
      numQueries: Int = 3,
      k: Int = 5,
      nCells: Int = 32,
      nProbe: Int = 4,
      sampleMod: Int = 7,
      iters: Int = 5): DataFrame = {
    // orderBy before limit: an unordered limit picks whichever partitions
    // scan first, so the "deterministic" training sample would drift with
    // file layout; the sort makes it a layout-independent top-k (cheap —
    // TakeOrdered over the modulo-filtered slice)
    val sample = embeddings
      .filter(col("vec_id") % sampleMod === 0)
      .select("vec_id", "embedding")
      .orderBy("vec_id")
      .limit(2048)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    val cents = trainCentroids(sample, nCells, iters)
    val assignUdf = udf { (v: Seq[Float]) => bestCell(cents, v) }
    val probeUdf = udf { (v: Seq[Float]) =>
      val a = v.toArray
      cents.indices
        .map { c =>
          val ct = cents(c)
          var d = 0.0; var i = 0
          val n = math.min(ct.length, a.length)
          while (i < n) { d += ct(i) * a(i); i += 1 }
          (c, d)
        }
        .sortBy(-_._2)
        .take(nProbe)
        .map(_._1)
        .toArray
    }
    val base = embeddings.filter(col("vec_id") >= numQueries)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .withColumn("cell", assignUdf(col("ce")))
    val q = embeddings.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("cell", explode(probeUdf(col("qe"))))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    base
      .join(broadcast(q), Seq("cell"))
      .withColumn("cos", dotUdf(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 4).as("cosine"))
      .orderBy("qid", "rk")
  }

  /** IVF planning from table stats: per-query probe cost is
    * nCells (centroid scan) + nProbe·n/nCells (probed lists); for fixed
    * probe fraction the sum is minimized at nCells ≈ √(nProbe·n) — the
    * classic √n rule. `targetScanFrac` is the recall knob: the expected
    * fraction of the corpus each query inspects. */
  def tuneIvf(n: Long, targetScanFrac: Double = 0.05): (Int, Int) = {
    require(n > 0 && targetScanFrac > 0 && targetScanFrac <= 1)
    val nCells = math.max(1, math.round(math.sqrt(n.toDouble)).toInt)
    val nProbe = math.max(1, math.ceil(nCells * targetScanFrac).toInt)
    (nCells, nProbe)
  }

  /** int8 scalar quantization: each float in [-1, 1] → one signed byte
    * (×127), the whole vector packed into a BinaryType cell. 4× less
    * storage/shuffle/scan than float32 — at 100 TB of embeddings the
    * quantized corpus is the one that fits in cluster page cache. */
  private val quantizeUdf = udf { (v: Seq[Float]) =>
    val out = new Array[Byte](v.length)
    var i = 0
    while (i < out.length) {
      val q = math.rint(v(i) * 127.0).toInt
      out(i) = math.max(-127, math.min(127, q)).toByte
      i += 1
    }
    out
  }

  /** Tight-loop int dot over packed int8 vectors (JIT kernel — the
    * interpreted-HOF trap does not apply to a single flat loop). */
  private val qdotUdf = udf { (a: Array[Byte], b: Array[Byte]) =>
    var s = 0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** q59: quantized ANN — int8 scan + exact re-rank. Stage 1 scans the
    * packed int8 corpus (¼ the bytes of float32) ranking by integer dot;
    * stage 2 re-ranks only the top `rerank` survivors per query with
    * exact float cosine. Quantization error can only reorder neighbors
    * whose cosines differ by ≲ 1/127, so with rerank ≳ 4k the final
    * top-k matches the exact baseline. Same broadcast-queries shape as
    * q51 — the win is the 4× smaller corpus side, which is what the
    * scan is bound by at scale. */
  def annQuantized(
      embeddings: DataFrame,
      numQueries: Int = 3,
      k: Int = 5,
      rerank: Int = 20): DataFrame = {
    val packed = embeddings.withColumn("qv", quantizeUdf(col("embedding")))
    val q = packed.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("qv").as("qq"), col("embedding").as("qe"))
    val c = packed.filter(col("vec_id") >= numQueries)
      .select(col("vec_id").as("cid"), col("qv").as("cq"), col("embedding").as("ce"))
    val wq = Window.partitionBy("qid").orderBy(desc("qscore"), asc("cid"))
    val wf = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    c.crossJoin(broadcast(q))
      .withColumn("qscore", qdotUdf(col("cq"), col("qq")))
      .withColumn("qrk", row_number().over(wq))
      .filter(col("qrk") <= rerank)
      .withColumn("cos", dot(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(wf).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 4).as("cosine"))
      .orderBy("qid", "rk")
  }

  /** q124: covariance matrix of the first `nDims` embedding dimensions
    * — the moment-matrix pass feeding whitening/PCA and the
    * redundancy diagnostic for learned representations. ONE corpus
    * scan: a JIT kernel emits the upper-triangle products per row
    * (d(d+1)/2 values), the (i,j) groupBy partial-aggregates before
    * its shuffle — the wire carries d² moment rows per task, never
    * n·d² values — and the d-row mean table broadcasts back to close
    * E[xy]−E[x]E[y]. Population covariance matches DuckDB covar_pop
    * exactly. */
  def covarianceMatrix(embeddings: DataFrame, nDims: Int = 16): DataFrame =
    covarianceTriangle(embeddings, nDims)
      .select(
        col("i").cast("long").as("dim_i"), col("j").cast("long").as("dim_j"),
        round(col("cov"), 4).as("cov"))
      .orderBy("dim_i", "dim_j")

  /** The 1-row raw-moment frame: (dim_sum, dim_cnt, pair_sum, pair_cnt)
    * arrays from ONE corpus scan through the
    * [[graft.functions.VectorFunctions.momentMatrix]] aggregate — the
    * r12 replacement for the explode-per-pair kernel (boxed
    * Array[(Int,Int,Double)] emission + d²-row shuffle + two broadcast
    * mean joins). Every moment consumer (q124 triangle, q144/q146 PCA
    * fit) decomposes this single row. */
  private def momentFrame(embeddings: DataFrame, nDims: Int): DataFrame =
    embeddings.agg(
      graft.functions.VectorFunctions.momentMatrix(col("embedding"), nDims).as("m"))

  /** 1-based (i, j) of the row-major upper-triangle index k. */
  private def triangleIndex(nDims: Int): (Array[Int], Array[Int]) = {
    val m = nDims * (nDims + 1) / 2
    val ia = new Array[Int](m); val ja = new Array[Int](m)
    var k = 0; var i = 0
    while (i < nDims) {
      var j = i
      while (j < nDims) { ia(k) = i + 1; ja(k) = j + 1; k += 1; j += 1 }
      i += 1
    }
    (ia, ja)
  }

  /** Upper-triangle covariance entries (i, j 1-based, cov UNROUNDED) —
    * shared by the q124 query surface (which rounds for the oracle)
    * and the q144 PCA fit (which must not round before eigensolving).
    * cov(i,j) = Σxy/n − μ_i·μ_j, all read off the 1-row moment frame:
    * one scan, one tiny exchange, no explode, no join. */
  private def covarianceTriangle(embeddings: DataFrame, nDims: Int): DataFrame = {
    val (ia, ja) = triangleIndex(nDims)
    momentFrame(embeddings, nDims)
      .select(
        col("m.dim_sum").as("ds"), col("m.dim_cnt").as("dc"),
        posexplode(arrays_zip(
          lit(ia).as("i"), lit(ja).as("j"),
          col("m.pair_sum").as("sxy"), col("m.pair_cnt").as("n"))).as(Seq("k", "e")))
      .filter(col("e.n") > 0)
      .select(
        col("e.i").as("i"), col("e.j").as("j"),
        (col("e.sxy") / col("e.n") -
          (element_at(col("ds"), col("e.i")) / element_at(col("dc"), col("e.i"))) *
          (element_at(col("ds"), col("e.j")) / element_at(col("dc"), col("e.j"))))
          .as("cov"))
  }

  /** q125: random-projection ANN (Johnson–Lindenstrauss): vectors are
    * compressed to `rDim` signed sums through deterministic Rademacher
    * planes (JIT kernel, one map pass — the planes ride the closure,
    * derived from a seeded hash so every executor agrees). Stage 1
    * ranks by projected dot over the 4×-smaller corpus — the bytes the
    * scan/shuffle is actually bound by at scale — and stage 2 re-ranks
    * the top `rerank` survivors with exact float cosine (q59's
    * compress-then-rerank contract; the spec pins ≡ exact top-k). JL
    * distortion only reorders neighbors whose projected dots are close,
    * so a modest rerank margin recovers the exact answer. */
  def annRpReduce(
      embeddings: DataFrame,
      numQueries: Int = 3,
      k: Int = 5,
      rDim: Int = 16,
      dim: Int = 64,
      rerank: Int = 60): DataFrame = {
    val planes = rademacherPlanes(rDim, dim).map(_.toArray).toArray
    val projectUdf = udf { (v: Seq[Float]) =>
      val a = v.toArray
      Array.tabulate(rDim) { j =>
        val p = planes(j)
        var s = 0.0; var i = 0
        val n = math.min(p.length, a.length)
        while (i < n) { s += p(i) * a(i); i += 1 }
        s
      }
    }
    val rdotUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    val packed = embeddings.withColumn("rv", projectUdf(col("embedding")))
    val q = packed.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("rv").as("rq"), col("embedding").as("qe"))
    val c = packed.filter(col("vec_id") >= numQueries)
      .select(col("vec_id").as("cid"), col("rv").as("rc"), col("embedding").as("ce"))
    val wq = Window.partitionBy("qid").orderBy(desc("rscore"), asc("cid"))
    val wf = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    c.crossJoin(broadcast(q))
      .withColumn("rscore", rdotUdf(col("rc"), col("rq")))
      .withColumn("qrk", row_number().over(wq))
      .filter(col("qrk") <= rerank)
      .withColumn("cos", dot(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(wf).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 4).as("cosine"))
      .orderBy("qid", "rk")
  }

  /** Fitted PCA: per-dimension means, the FULL eigenvalue spectrum
    * (descending), and the top-k eigenvectors (row per component,
    * sign-canonicalized so the largest-magnitude coordinate is
    * positive — Jacobi's rotation signs are otherwise arbitrary). */
  final case class PcaModel(
      means: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]])

  /** Cyclic Jacobi eigensolver for a symmetric matrix (classic public
    * algorithm — Golub & Van Loan, Matrix Computations §8.5). Strictly
    * driver-side: the input is the d×d covariance (d = 16–64 here), so
    * this is microseconds of work against a corpus-scan-sized fit.
    * Returns (eigenvalues descending, row-major eigenvectors aligned
    * to them). */
  private[graft] def jacobiEigen(
      m: Array[Array[Double]],
      maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0; var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && offDiag() > 1e-18) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = app - t * apq
            a(q)(q) = aqq + t * apq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var i = 0
            while (i < d) {
              if (i != p && i != q) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = c * aip - s * aiq; a(p)(i) = a(i)(p)
                a(i)(q) = s * aip + c * aiq; a(q)(i) = a(i)(q)
              }
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => Array.tabulate(d)(r => v(r)(i))).toArray)
  }

  /** q144 fit: covariance via the q124 one-scan moment pass (collected
    * UNROUNDED — d(d+1)/2 doubles), eigensolved driver-side with
    * Jacobi. Total distributed cost is the q124 scan plus the d-row
    * means aggregate; nothing but d² numbers ever reaches the driver. */
  private[graft] def pcaFit(embeddings: DataFrame, nDims: Int = 16, k: Int = 8): PcaModel = {
    // r12: ONE driver action — the former shape ran a means job AND a
    // covariance job (whose plan re-computed the means to join them);
    // everything here decomposes the single moment row.
    val m = momentFrame(embeddings, nDims).head().getStruct(0)
    val dimSum = m.getSeq[Double](0); val dimCnt = m.getSeq[Long](1)
    val pairSum = m.getSeq[Double](2); val pairCnt = m.getSeq[Long](3)
    val means = new Array[Double](nDims)
    var d = 0
    while (d < nDims) {
      if (dimCnt(d) > 0) means(d) = dimSum(d) / dimCnt(d)
      d += 1
    }
    val cov = Array.fill(nDims)(new Array[Double](nDims))
    var kk = 0; var i = 0
    while (i < nDims) {
      var j = i
      while (j < nDims) {
        if (pairCnt(kk) > 0) {
          val c = pairSum(kk) / pairCnt(kk) - means(i) * means(j)
          cov(i)(j) = c; cov(j)(i) = c
        }
        kk += 1; j += 1
      }
      i += 1
    }
    val (eigVals, eigVecs) = jacobiEigen(cov)
    def canonical(w: Array[Double]): Array[Double] = {
      var best = 0; var i = 1
      while (i < w.length) { if (math.abs(w(i)) > math.abs(w(best))) best = i; i += 1 }
      if (w(best) < 0) w.map(-_) else w
    }
    PcaModel(means, eigVals, eigVecs.take(k).map(canonical))
  }

  /** Map-side PCA projection kernel: y_c = Σ_i W_ci (x_i − μ_i),
    * optionally whitened (÷ √λ_c). The k×d model rides the closure —
    * projection at 100 TB is one scan, no join, no shuffle. */
  def pcaProjectUdf(model: PcaModel, whiten: Boolean = false) = udf { (x: Seq[Float]) =>
    val k = model.components.length
    Array.tabulate(k) { c =>
      val w = model.components(c)
      var s = 0.0; var i = 0
      val n = math.min(w.length, x.length)
      while (i < n) { s += w(i) * (x(i).toDouble - model.means(i)); i += 1 }
      if (whiten && model.eigenvalues(c) > 1e-12) s / math.sqrt(model.eigenvalues(c)) else s
    }
  }

  /** q144: PCA spectrum diagnostic — the whitening path over q124's
    * covariance. One row per retained component: the Jacobi eigenvalue,
    * its explained-variance fraction, and the POPULATION variance of
    * the corpus actually projected onto that component — which must
    * reproduce the eigenvalue (λ_c = Var(w_cᵀx) by definition), making
    * the output self-certifying. Rows-only: the eigensolve is float-
    * associative (cross-engine hashes unreliable); the spec pins
    * projected_var ≈ eigenvalue, the descending spectrum, and the
    * reconstruction-error bound instead. */
  def pcaVariance(embeddings: DataFrame, nDims: Int = 16, k: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val model = pcaFit(embeddings, nDims, k)
    val total = model.eigenvalues.sum
    val spectrum = model.eigenvalues.take(k).zipWithIndex
      .map { case (ev, c) => (c.toLong, ev, ev / total) }
      .toSeq.toDF("component", "eigenvalue", "explained_frac")
    val projected = embeddings
      .select(posexplode(pcaProjectUdf(model)(col("embedding"))).as(Seq("component", "y")))
      .groupBy(col("component").cast("long").as("component"))
      .agg(var_pop("y").as("projected_var"))
    spectrum.join(projected, "component")
      .select(col("component"),
        round(col("eigenvalue"), 4).as("eigenvalue"),
        round(col("projected_var"), 4).as("projected_var"),
        round(col("explained_frac"), 4).as("explained_frac"))
      .orderBy("component")
  }

  /** q146: PCA-compressed ANN — q125's compress-then-rerank contract
    * with the LEARNED projection instead of random planes: stage 1
    * ranks by dot product in the top-`pcaDims` component space (the
    * 4×-smaller bytes the scan is bound by at scale, and a tighter
    * compressor than JL where the corpus actually has low-rank
    * structure), stage 2 re-ranks the survivors with exact float
    * cosine. Fit cost is one q124 moment scan, amortized across every
    * query batch that reuses the model. */
  def annPcaReduce(
      embeddings: DataFrame,
      numQueries: Int = 3,
      k: Int = 5,
      pcaDims: Int = 16,
      dim: Int = 64,
      rerank: Int = 60): DataFrame = {
    val model = pcaFit(embeddings, nDims = dim, k = pcaDims)
    val proj = pcaProjectUdf(model)
    val rdotUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    val packed = embeddings.withColumn("rv", proj(col("embedding")))
    val q = packed.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("rv").as("rq"), col("embedding").as("qe"))
    val c = packed.filter(col("vec_id") >= numQueries)
      .select(col("vec_id").as("cid"), col("rv").as("rc"), col("embedding").as("ce"))
    val wq = Window.partitionBy("qid").orderBy(desc("rscore"), asc("cid"))
    val wf = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    c.crossJoin(broadcast(q))
      .withColumn("rscore", rdotUdf(col("rc"), col("rq")))
      .withColumn("qrk", row_number().over(wq))
      .filter(col("qrk") <= rerank)
      .withColumn("cos", dot(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(wf).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 4).as("cosine"))
      .orderBy("qid", "rk")
  }

  /** q88: nearest-centroid assignment — the clustering/labeling pass a
    * curation pipeline runs after picking centroids (here: a fixed,
    * deterministic centroid set so the assignment is oracle-checkable;
    * [[trainCentroids]] is the trained-quantizer variant q53 uses).
    * The centroid table is collected once and closed over by a JIT
    * argmax kernel — the whole assignment is ONE map pass over the
    * corpus with no join, no explode, no shuffle until the final
    * #centroids-row aggregate. Unit-norm embeddings make dot ≡ cosine. */
  def centroidAssign(embeddings: DataFrame, numCentroids: Int = 8): DataFrame = {
    val cents = embeddings.filter(col("vec_id") < numCentroids)
      .select("vec_id", "embedding")
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val assign = udf { (v: Seq[Float]) =>
      val a = v.toArray
      var bestId = -1L; var bestD = Double.MinValue
      cents.foreach { case (id, ct) =>
        var d = 0.0; var i = 0
        val n = math.min(ct.length, a.length)
        while (i < n) { d += ct(i).toDouble * a(i).toDouble; i += 1 }
        // ties break to the smaller centroid id (cents is id-ordered)
        if (d > bestD) { bestD = d; bestId = id }
      }
      (bestId, bestD)
    }
    embeddings.filter(col("vec_id") >= numCentroids)
      .withColumn("best", assign(col("embedding")))
      .groupBy(col("best._1").as("cluster_id"))
      .agg(
        count(lit(1)).as("n_vecs"),
        round(avg(col("best._2")), 4).as("avg_cos"))
      .orderBy("cluster_id")
  }

  /** q122: hard-negative mining — for each query vector, the top-k most
    * similar candidates with a DIFFERENT label (the contrastive-training
    * pair miner: near-duplicates of the anchor that the model must
    * learn to tell apart). Same broadcast-query / window-top-k shape as
    * the exact ANN baseline (q51) with the label guard pushed into the
    * join condition, so excluded same-label rows never reach the
    * ranking window. At scale the guard composes with any candidate
    * generator (LSH/IVF); the exact form here is the oracle-checkable
    * contract. */
  def hardNegatives(embeddings: DataFrame, numQueries: Int = 3, k: Int = 5): DataFrame = {
    val q = embeddings.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("label").as("qlabel"))
    val c = embeddings.filter(col("vec_id") >= numQueries)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("label").as("clabel"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    c.join(broadcast(q), col("clabel") =!= col("qlabel"))
      .withColumn("cos", dot(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 4).as("cosine"))
      .orderBy("qid", "rk")
  }

  /** q119: distributed spherical k-means — full-corpus Lloyd iterations
    * (the batch dual of [[trainCentroids]], which trains on a bounded
    * driver-side sample for IVF). Per iteration the corpus is touched
    * exactly ONCE: a JIT argmax kernel closed over the k×d centroid
    * array (tiny, rides the closure) assigns map-side, and a single
    * (cluster, dim) aggregate — partial-aggregated before its shuffle,
    * so the wire carries k×d moment rows, never n×d values — yields
    * BOTH the new centroids and the iteration's inertia (Σ 1−cos,
    * read off the dim-0 rows). Centroids are unit-normalized on the
    * driver (k×d doubles). Inertia is non-increasing under spherical
    * Lloyd — asserted per iteration in the spec, with planted-cluster
    * recovery. Seeding costs ONE additional corpus scan (a hash-keyed
    * top-m over-sample; farthest-first then runs driver-side on the
    * m points) — previously k sequential scans. At 100 TB: 1 + iters
    * linear scans, k×d-row shuffles, no cache, no driver data motion
    * beyond m×d + k×d. */
  private[graft] def kmeansDetail(
      embeddings: DataFrame,
      k: Int = 8,
      iters: Int = 4): (Array[Double], DataFrame) = {
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v.map(_.toFloat) else v.map(x => (x / n).toFloat)
    }
    // One-scan k-means‖-style seeding: a single TakeOrdered collects
    // the m = max(64, 16k) hash-minimal vectors (the same A-ES hash-key
    // order the weighted samplers use — layout/run-stable; planned as a
    // map-side top-m + driver merge, never a shuffle of vectors), then
    // farthest-first runs DRIVER-SIDE over that m-point over-sample:
    // seed 1 is the hash-minimal point (identical to the previous
    // scheme), each next seed the sample point least similar to its
    // nearest chosen seed, ties broken by sample (= hash) order.
    // O(m·k·d) driver flops replace the k sequential full-corpus scans
    // the previous scheme paid; a cluster with ≥ a handful of corpus
    // points lands ≥1 sample point w.h.p., preserving the
    // one-seed-per-cluster property Lloyd can't recover from losing.
    val sample: Array[Array[Float]] = embeddings
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(math.max(64, 16 * k))
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    var cents: Array[Array[Float]] = Array(sample(0))
    while (cents.length < k) {
      var worstIdx = 0; var worstSim = Double.MaxValue
      var i = 0
      while (i < sample.length) {
        val v = sample(i)
        var best = Double.MinValue; var c = 0
        while (c < cents.length) {
          val ct = cents(c)
          var d = 0.0; var j = 0
          val n = math.min(ct.length, v.length)
          while (j < n) { d += ct(j).toDouble * v(j).toDouble; j += 1 }
          if (d > best) best = d
          c += 1
        }
        if (best < worstSim) { worstSim = best; worstIdx = i }
        i += 1
      }
      cents = cents :+ sample(worstIdx)
    }
    def assignUdf = {
      val cs = cents
      udf { (v: Seq[Float]) =>
        val a = v.toArray
        var best = 0; var bestD = Double.MinValue; var c = 0
        while (c < cs.length) {
          val ct = cs(c)
          var d = 0.0; var i = 0
          val n = math.min(ct.length, a.length)
          while (i < n) { d += ct(i).toDouble * a(i).toDouble; i += 1 }
          if (d > bestD) { bestD = d; best = c }
          c += 1
        }
        (best, bestD)
      }
    }
    val inertia = new Array[Double](iters)
    var it = 0
    while (it < iters) {
      val moments = embeddings
        .withColumn("best", assignUdf(col("embedding")))
        .select(col("best._1").as("cl"), col("best._2").as("bd"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cl", "pos")
        .agg(sum(col("v").cast("double")).as("sv"), count(lit(1)).as("n"), sum("bd").as("sbd"))
        .collect()
      val sums   = Array.fill(k)(new Array[Double](cents(0).length))
      val counts = new Array[Long](k)
      var n = 0L; var sumBd = 0.0
      moments.foreach { r =>
        val cl = r.getInt(0); val pos = r.getInt(1)
        sums(cl)(pos) = r.getDouble(2)
        if (pos == 0) {
          counts(cl) = r.getLong(3); n += r.getLong(3); sumBd += r.getDouble(4)
        }
      }
      inertia(it) = n - sumBd
      cents = Array.tabulate(k)(c => if (counts(c) == 0) cents(c) else unit(sums(c)))
      it += 1
    }
    val assigned = embeddings
      .withColumn("best", assignUdf(col("embedding")))
      .select(col("vec_id"), col("label"),
        col("best._1").cast("long").as("cluster_id"), col("best._2").as("cos"))
    (inertia, assigned)
  }

  /** q119 query surface: final cluster summary after [[kmeansDetail]]'s
    * Lloyd loop (rows-only — float-sum association across partitions
    * makes exact cross-engine hashes unreliable; the spec pins planted
    * recovery + monotone inertia instead). */
  def kmeans(embeddings: DataFrame, k: Int = 8, iters: Int = 4): DataFrame = {
    val (_, assigned) = kmeansDetail(embeddings, k, iters)
    assigned
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_vecs"), round(avg("cos"), 4).as("avg_cos"))
      .orderBy("cluster_id")
  }

  /** q115: per-dimension z-score feature normalization (the feature-
    * scaling pass before training or distance work). One long-format
    * pass computes every dimension's mean and sample stddev — the
    * (dim) groupBy partial-aggregates before its shuffle, so the wire
    * carries d partial-moment rows per task, never n×d values. The
    * d-row stats table is BROADCAST back and the z-value is a pure
    * map-side expression: total cost at 100 TB is two linear scans
    * (one for stats, one to normalize) and a d-row shuffle. Long
    * output (vec_id, dim, z) keeps the result element-wise
    * hash-comparable (no float-array equality). */
  def featureScale(embeddings: DataFrame): DataFrame = {
    val long = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
    val stats = long
      .groupBy("pos")
      .agg(avg("v").as("mu"), stddev_samp("v").as("sigma"))
    long
      .join(broadcast(stats), Seq("pos"))
      .select(
        col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
        round((col("v") - col("mu")) / col("sigma"), 4).as("z"))
      .orderBy("vec_id", "dim")
  }

  def annLsh(
      embeddings: DataFrame,
      numQueries: Int = 3,
      k: Int = 5,
      numBands: Int = 6,
      planesPerBand: Int = 5,
      dim: Int = 64,
      maxBucket: Int = 500): DataFrame = {
    val b = banded(embeddings, numBands, planesPerBand, dim)
    val q = b.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("band"), col("bucket"))
    val c = capBuckets(b.filter(col("vec_id") >= numQueries), maxBucket)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("band"), col("bucket"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    c.join(broadcast(q), Seq("band", "bucket"))
      .withColumn("cos", dotUdf(col("qe"), col("ce")))
      .groupBy("qid", "cid")
      .agg(max("cos").as("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 4).as("cosine"))
      .orderBy("qid", "rk")
  }

  /** Driver-side plain (L2) Lloyd over a bounded sample — PQ codebook
    * training. Unlike [[trainCentroids]] this does NOT unit-normalize:
    * PQ quantizes raw subvectors, whose norms carry signal. Seeding is
    * the first `k` sample points (sample order is the deterministic
    * hash-minimal order, so codebooks are run-stable). */
  private def lloydL2(sample: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    var cents = sample.take(k)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cents.length)(new Array[Double](sample.head.length))
      val counts = new Array[Long](cents.length)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < cents.length) {
          val d = d2(cents(c), v); if (d < bestD) { bestD = d; best = c }; c += 1
        }
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(x => (x / counts(c)).toFloat)
      }.toArray
      it += 1
    }
    cents
  }

  /** q190: product-quantized ANN (PQ + asymmetric distance, the
    * FAISS-style memory-scale path beside int8 (q59) and PCA (q146)
    * compression): the vector splits into `m` subspaces, each quantized
    * to one of `ksub` codebook entries — 16 dims × 4 bytes become m
    * one-byte codes (16× smaller at m=4), and at 100 TB the candidate
    * scan reads CODES ONLY.
    *
    * Codebooks train driver-side on the deterministic hash-minimal
    * sample (bounded, the q53 discipline) with plain L2 Lloyd per
    * subspace. Scoring is ADC: dot(q, x) ≈ Σₛ dot(q_s, C_s[code_s]) —
    * each query precomputes its m×ksub lookup table once (driver math),
    * and scoring a candidate is m array lookups inside one JIT UDF over
    * the broadcast-joined query/candidate pairs. The ADC top-`rerank`
    * pool re-ranks EXACTLY against the full vectors, so reported
    * cosines are true cosines (the q59 re-rank discipline); recall is
    * spec-pinned against q51. Rows-only: float ranking. */
  def annPq(
      embeddings: DataFrame,
      numQueries: Int = 3,
      k: Int = 5,
      m: Int = 8,
      ksub: Int = 32,
      rerank: Int = 50,
      iters: Int = 12): DataFrame = {
    val sample: Array[Array[Float]] = embeddings
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(math.max(256, 16 * ksub))
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val dim = sample.head.length
    val sub = dim / m
    val books: Array[Array[Array[Float]]] = Array.tabulate(m) { s =>
      lloydL2(sample.map(_.slice(s * sub, (s + 1) * sub)), ksub, iters)
    }
    val encodeUdf = {
      val bs = books
      udf { (v: Seq[Float]) =>
        val a = v.toArray
        Array.tabulate(m) { s =>
          val x = a.slice(s * sub, (s + 1) * sub)
          var best = 0; var bestD = Double.MaxValue; var c = 0
          while (c < bs(s).length) {
            val ct = bs(s)(c)
            var d = 0.0; var i = 0
            while (i < sub) { val t = ct(i).toDouble - x(i).toDouble; d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          best
        }
      }
    }
    // ADC: the query's m×ksub dot-product table, flattened so the
    // kernel is two int ops + a lookup per subspace
    val adcUdf = {
      val bs = books
      udf { (q: Seq[Float], codes: Seq[Int]) =>
        val qa = q.toArray
        var s = 0; var acc = 0.0
        while (s < m) {
          val ct = bs(s)(codes(s))
          var i = 0
          while (i < sub) { acc += qa(s * sub + i).toDouble * ct(i).toDouble; i += 1 }
          s += 1
        }
        acc
      }
    }
    val q = embeddings.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = embeddings.filter(col("vec_id") >= numQueries)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .withColumn("codes", encodeUdf(col("ce")))
    val wAdc = Window.partitionBy("qid").orderBy(desc("adc"), asc("cid"))
    val wCos = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    c.crossJoin(broadcast(q))
      .withColumn("adc", adcUdf(col("qe"), col("codes")))
      .withColumn("rk_adc", row_number().over(wAdc).cast("long"))
      .filter(col("rk_adc") <= rerank)
      .withColumn("cos", dot(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(wCos).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"),
        round(col("adc"), 4).as("adc_score"), round(col("cos"), 4).as("cosine"))
      .orderBy("qid", "rk")
  }

  /** q191: maximal-marginal-relevance diversified top-k — the retrieval
    * surface RAG/training-mix pipelines actually want: relevant to the
    * query but not redundant with what's already selected.
    * MMR(c) = λ·sim(q,c) − (1−λ)·max_{s∈S} sim(c,s), greedily.
    *
    * Stage 1 (distributed): the exact top-`poolSize` relevance pool per
    * query — the q51 broadcast-scored window. Stage 2 (driver): the
    * greedy argmax loop over that pool — inherently sequential, but
    * bounded at poolSize×d floats per query (the q53/q119 bounded-
    * driver-math discipline); ties break on candidate id. Rows-only:
    * the spec pins top-1 = relevance top-1, selection size, and that
    * selected-set redundancy (max pairwise cosine) does not exceed the
    * plain top-k's. */
  def mmrDiversify(
      embeddings: DataFrame,
      numQueries: Int = 3,
      poolSize: Int = 50,
      k: Int = 10,
      lambda: Double = 0.7): DataFrame = {
    val q = embeddings.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = embeddings.filter(col("vec_id") >= numQueries)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy("qid").orderBy(desc("rel"), asc("cid"))
    val pool = c.crossJoin(broadcast(q))
      .withColumn("rel", dot(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= poolSize)
      .select(col("qid"), col("cid"), col("rel"), col("ce"))
      .collect()
      .groupBy(_.getLong(0))
    def dotDD(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    val rows = pool.toSeq.sortBy(_._1).flatMap { case (qid, rws) =>
      val cand = rws.map { r =>
        (r.getLong(1), r.getDouble(2), r.getSeq[Float](3).map(_.toDouble).toArray)
      }.sortBy(x => (-x._2, x._1)).toBuffer
      val selectedVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Double)]
      while (selected.length < k && cand.nonEmpty) {
        // argmax of λ·rel − (1−λ)·max-sim-to-selected, ties by cid
        var bestI = 0; var bestScore = Double.MinValue
        cand.indices.foreach { i =>
          val (cid, rel, v) = cand(i)
          val red = if (selectedVecs.isEmpty) 0.0 else selectedVecs.map(dotDD(v, _)).max
          val score = lambda * rel - (1 - lambda) * red
          if (score > bestScore || (score == bestScore && cid < cand(bestI)._1)) {
            bestScore = score; bestI = i
          }
        }
        val (cid, rel, v) = cand.remove(bestI)
        selectedVecs += v
        selected += ((qid, cid, rel, bestScore))
      }
      selected.zipWithIndex.map { case ((qd, cid, rel, score), i) =>
        (qd, i + 1L, cid, math.floor(rel * 10000 + 0.5) / 10000,
          math.floor(score * 10000 + 0.5) / 10000)
      }
    }
    val spark = embeddings.sparkSession
    import spark.implicits._
    rows.toDF("qid", "rk", "cid", "relevance", "mmr_score").orderBy("qid", "rk")
  }

  /** q228: ANN index quality report — recall@k of every approximate
    * index (SRP-LSH q52, IVF q53, int8 re-rank q59) against the exact
    * top-k (q51), per query and summarized per method. This is the
    * "did my index actually work" dashboard an embedding pipeline runs
    * after every (re)build: recall = |approx ∩ exact| / k via one
    * LEFT SEMI join per method on the k·#queries result frames —
    * evaluation cost is result-sized, not corpus-sized; queries whose
    * approximate list misses entirely still appear (left join from the
    * exact query set, zero-filled). On the uniform-random driver
    * embeddings recall is inherently low (top-5 sits at cosine ≈ 0.4,
    * where no sublinear index can match exact search — the q52 spec's
    * documented regime); the report's value is exactly that it SHOWS
    * this, and shows high recall where cluster structure exists
    * (planted-cluster spec). */
  def annRecallReport(embeddings: DataFrame, numQueries: Int = 3, k: Int = 5): DataFrame = {
    val exact = annBruteForce(embeddings, numQueries, k)
      .select(col("qid"), col("cid")).cache()
    val qids = exact.select("qid").distinct()
    def recallOf(method: String, approx: DataFrame): DataFrame = {
      val hits = approx.select(col("qid"), col("cid"))
        .join(exact, Seq("qid", "cid"), "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("hits"))
      qids
        .join(hits, Seq("qid"), "left")
        .select(col("qid"), (coalesce(col("hits"), lit(0L)) / k.toDouble).as("recall"))
        .agg(
          count(lit(1)).as("n_queries"),
          round(avg("recall"), 4).as("avg_recall"),
          round(min("recall"), 4).as("min_recall"))
        .select(lit(method).as("method"), col("n_queries"), col("avg_recall"), col("min_recall"))
    }
    recallOf("exact_self", annBruteForce(embeddings, numQueries, k))
      .unionByName(recallOf("lsh", annLsh(embeddings, numQueries, k)))
      .unionByName(recallOf("ivf", annIvf(embeddings, numQueries, k)))
      .unionByName(recallOf("int8_rerank", annQuantized(embeddings, numQueries, k)))
      .orderBy("method")
  }

  /** q267: predicate-filtered exact top-k — the "vector search with a
    * metadata WHERE clause" every retrieval stack needs (tenant/language/
    * date filters over the candidate set). Strategy is PRE-filter: the
    * predicate is applied to the candidate side BEFORE any scoring, so
    * it rides the parquet scan as a pushed filter and the dot-product
    * pass touches only qualifying vectors — at a 1% selective filter on
    * 100 TB that is a 100× scan reduction, where POST-filtering (score
    * everything, then drop) pays the full corpus every query AND can
    * return < k survivors. Result is exact over the filtered corpus by
    * construction (filter-then-rank ≡ rank-over-subset). */
  def annFiltered(
      embeddings: DataFrame,
      predicate: Column,
      numQueries: Int = 3,
      k: Int = 5): DataFrame = {
    val q = embeddings.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = embeddings.filter(col("vec_id") >= numQueries)
      .filter(predicate)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    c.crossJoin(broadcast(q))
      .withColumn("cos", dot(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 4).as("cosine"))
      .orderBy("qid", "rk")
  }

  /** q268: predicate-filtered IVF — the scale path for filtered search.
    * The predicate is applied INSIDE the inverted lists (cell scan →
    * filter → score), so candidate generation stays ~nProbe/nCells of
    * the corpus and the filter prunes before the dot product. The
    * filtered-ANN failure mode is starvation: a selective filter can
    * empty the probed cells and return < k survivors even though the
    * filtered corpus holds ≥ k. The standard remedy is probe widening —
    * here `nProbe` scales by 1/selectivity (estimated in one cheap
    * count) and is clamped to all cells, which degrades gracefully to
    * filtered brute force when the filter is so selective that every
    * cell must be probed anyway (exactly when scanning everything IS
    * the right plan — the filtered corpus is tiny). Returns the same
    * shape as [[annFiltered]]; recall is audited in
    * [[annFilteredRecall]] and the planted-cluster spec. */
  def annFilteredIvf(
      embeddings: DataFrame,
      predicate: Column,
      numQueries: Int = 3,
      k: Int = 5,
      nCells: Int = 32,
      nProbeBase: Int = 4,
      sampleMod: Int = 7,
      iters: Int = 5): DataFrame = {
    val sample = embeddings
      .filter(col("vec_id") % sampleMod === 0)
      .select("vec_id", "embedding")
      .orderBy("vec_id")
      .limit(2048)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    val cents = trainCentroids(sample, nCells, iters)
    // selectivity estimate: two metadata-only-ish counts (no vector
    // reads — column pruning keeps the scan to the predicate columns)
    val base0 = embeddings.filter(col("vec_id") >= numQueries)
    val total = base0.count().max(1L)
    val kept = base0.filter(predicate).count()
    val sel = math.max(kept.toDouble / total, 1e-9)
    val nProbe = math.min(nCells, math.ceil(nProbeBase / sel).toInt.max(nProbeBase))
    val assignUdf = udf { (v: Seq[Float]) => bestCell(cents, v) }
    val probeUdf = udf { (v: Seq[Float]) =>
      val a = v.toArray
      cents.indices
        .map { c =>
          val ct = cents(c)
          var d = 0.0; var i = 0
          val n = math.min(ct.length, a.length)
          while (i < n) { d += ct(i) * a(i); i += 1 }
          (c, d)
        }
        .sortBy(-_._2)
        .take(nProbe)
        .map(_._1)
        .toArray
    }
    val base = base0
      .filter(predicate)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .withColumn("cell", assignUdf(col("ce")))
    val q = embeddings.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("cell", explode(probeUdf(col("qe"))))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    base
      .join(broadcast(q), Seq("cell"))
      .withColumn("cos", dotUdf(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 4).as("cosine"))
      .orderBy("qid", "rk")
  }

  /** q270: hybrid retrieval — BM25 lexical leg ⊕ cosine vector leg,
    * RRF-fused (the production two-tower search stack: q203's scoring
    * with the QUERY DOC's own vocabulary as the term set, q51's exact
    * vector ranking, q163's calibration-free fusion). Query docs are
    * doc_id < numQueries; candidates join across documents ⋈ embeddings
    * on doc_id = vec_id.
    *
    * Scale shape: the candidate token explode (the expensive pass) is
    * pruned by a LEFT SEMI join against the broadcast query vocabulary
    * BEFORE its groupBy shuffle — the wire carries only matched-term
    * counts, not the corpus token stream; both leg rankings window on
    * the same qid partitioning; the vector leg broadcasts the
    * numQueries-row query table. Fusion joins two m·numQueries-row leg
    * frames — result-sized, never corpus-sized.
    *
    * Lexical ranks order on the ROUNDED score (q203's oracle-portable
    * precedent: BM25's ln/÷ arithmetic may differ from another engine by
    * an ulp; 4-decimal rounding before the window makes rank ties break
    * identically everywhere). */
  def hybridSearch(
      documents: DataFrame,
      embeddings: DataFrame,
      numQueries: Int = 3,
      m: Int = 10,
      k: Int = 5,
      k0: Int = 60,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    // --- lexical leg: BM25 of each candidate against each query's vocab
    val toks = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val qtoks = toks.filter(col("doc_id") < numQueries)
      .select(col("doc_id").as("qid"), col("tok")).distinct()
    val vocab = qtoks.select("tok").distinct()
    val ctoks = toks.filter(col("doc_id") >= numQueries)
    val dl = ctoks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = ctoks
      .join(broadcast(vocab), Seq("tok"), "left_semi")
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val lexScore = tf
      .join(broadcast(qtoks), Seq("tok"))
      .join(broadcast(df), Seq("tok"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("score",
        col("idf") * col("tf") * (lit(k1) + 1.0)
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("qid"), col("doc_id").as("cid"))
      .agg(round(sum(col("score")), 4).as("s_lex"))
    val wl = Window.partitionBy("qid").orderBy(desc("s_lex"), asc("cid"))
    val lex = lexScore
      .withColumn("rk_lex", row_number().over(wl).cast("long"))
      .filter(col("rk_lex") <= m)
      .select("qid", "cid", "rk_lex")
    // --- vector leg: exact cosine, queries broadcast
    val qv = embeddings.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cv = embeddings.filter(col("vec_id") >= numQueries)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val wv = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    val vec = cv.crossJoin(broadcast(qv))
      .withColumn("cos", dot(col("qe"), col("ce")))
      .withColumn("rk_vec", row_number().over(wv).cast("long"))
      .filter(col("rk_vec") <= m)
      .select("qid", "cid", "rk_vec")
    // --- RRF fusion over the union of the two top-m lists
    val wf = Window.partitionBy("qid").orderBy(desc("rrf"), asc("cid"))
    lex.join(vec, Seq("qid", "cid"), "full_outer")
      .withColumn("rrf",
        when(col("rk_lex").isNotNull, lit(1.0) / (lit(k0) + col("rk_lex"))).otherwise(lit(0.0)) +
          when(col("rk_vec").isNotNull, lit(1.0) / (lit(k0) + col("rk_vec"))).otherwise(lit(0.0)))
      .withColumn("rk", row_number().over(wf).cast("long"))
      .filter(col("rk") <= k)
      .select(
        col("qid"), col("rk"), col("cid"),
        coalesce(col("rk_lex"), lit(0L)).as("rk_lex"),
        coalesce(col("rk_vec"), lit(0L)).as("rk_vec"),
        round(col("rrf"), 4).as("rrf_score"))
      .orderBy("qid", "rk")
  }

  /** q268's registered face: recall@k of filtered-IVF against filtered
    * exact, plus survivor counts — the starvation audit. One row per
    * query so a sub-k result is visible, not averaged away. */
  def annFilteredRecall(
      embeddings: DataFrame,
      predicate: Column,
      numQueries: Int = 3,
      k: Int = 5): DataFrame = {
    val exact = annFiltered(embeddings, predicate, numQueries, k)
      .select(col("qid"), col("cid"))
    val approx = annFilteredIvf(embeddings, predicate, numQueries, k)
      .select(col("qid"), col("cid"))
    val hits = approx.join(exact, Seq("qid", "cid"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    val returned = approx.groupBy("qid").agg(count(lit(1)).as("n_returned"))
    exact.select("qid").distinct()
      .join(returned, Seq("qid"), "left")
      .join(hits, Seq("qid"), "left")
      .select(
        col("qid"),
        coalesce(col("n_returned"), lit(0L)).as("n_returned"),
        round(coalesce(col("hits"), lit(0L)) / k.toDouble, 4).as("recall_at_k"))
      .orderBy("qid")
  }

  /** q405: k-NN majority-vote CLASSIFICATION over the embedding corpus
    * — the label-transfer primitive (auto-labeling a new slice from an
    * already-labeled corpus, the standard weak-supervision step): each
    * held-out query vector takes the majority label of its k exact
    * nearest neighbours (dot product; the corpus is unit-norm so dot ≡
    * cosine). Votes tie-break to the smaller label, neighbour ranking
    * ties to the smaller cid — fully deterministic, and (like q191)
    * exactly replayable cross-engine because VecDot's left-to-right
    * double accumulation is bit-identical to list_dot_product. Scale
    * shape: the query slice broadcasts (q51 idiom), one data-
    * proportional scan + a per-query k-row heap (WindowGroupLimit),
    * vote aggregate is (queries×labels)-bounded. */
  def knnClassify(embeddings: DataFrame, numQueries: Int = 50, k: Int = 10): DataFrame = {
    val q = embeddings.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("true_label"))
    val c = embeddings.filter(col("vec_id") >= numQueries)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        col("label").as("clabel"))
    val wNn = Window.partitionBy("qid").orderBy(desc("d"), asc("cid"))
    val nn = c.crossJoin(broadcast(q))
      .withColumn("d", dot(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(wNn))
      .filter(col("rk") <= k)
    val wVote = Window.partitionBy("qid").orderBy(desc("v"), asc("clabel"))
    nn.groupBy("qid", "true_label", "clabel")
      .agg(count(lit(1)).as("v"))
      .withColumn("r", row_number().over(wVote))
      .filter(col("r") === 1)
      .select(
        col("qid"), col("true_label"),
        col("clabel").as("predicted"), col("v").as("votes"),
        (col("true_label") === col("clabel")).as("correct"))
      .orderBy("qid")
  }

  /** q414: nDCG@k of the CHEAP ranking against the full-precision gold
    * — the retrieval-quality readout that prices every "cheap first
    * pass" in this family (q163's truncated-dim scorer, PQ/int8
    * re-rank candidates): gold = full-dot top-k per query (binary
    * relevance), system = first-`cheapDims` dot ranking; nDCG@k =
    * Σ_{hits} 1/log2(r+1) over the system's top-k, normalized by the
    * ideal Σ_{r≤k}. Same bounded shape as q163: candidates × a
    * broadcast ≤`numQueries` query slice, two rank windows per query,
    * a ≤k-row fold — no all-pairs anything. VecDot keeps both engines'
    * dot products bit-identical, so gold/system sets — and therefore
    * the score — are exactly oracle-able. */
  def rankingNdcg(
      embeddings: DataFrame,
      numQueries: Int = 3,
      k: Int = 10,
      cheapDims: Int = 8): DataFrame = {
    val q = embeddings.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = embeddings.filter(col("vec_id") >= numQueries)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val wFull = Window.partitionBy("qid").orderBy(desc("s_full"), asc("cid"))
    val wCheap = Window.partitionBy("qid").orderBy(desc("s_cheap"), asc("cid"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("s_full", dot(col("qe"), col("ce")))
      .withColumn("s_cheap", dot(slice(col("qe"), 1, cheapDims), slice(col("ce"), 1, cheapDims)))
      .withColumn("rk_full", row_number().over(wFull).cast("long"))
      .withColumn("rk_cheap", row_number().over(wCheap).cast("long"))
    val idcg = (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0))).sum
    scored
      .filter(col("rk_cheap") <= k)
      .groupBy("qid")
      .agg(
        sum(when(col("rk_full") <= k,
          lit(1.0) / log2(col("rk_cheap") + 1)).otherwise(lit(0.0))).as("dcg"),
        sum(when(col("rk_full") <= k, 1L).otherwise(0L)).as("n_hits"))
      .select(
        col("qid"),
        col("n_hits"),
        round(col("dcg") / lit(idcg), 4).as("ndcg"))
      .orderBy("qid")
  }
}
