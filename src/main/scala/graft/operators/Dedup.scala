package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.round
import graft.functions.TextFunctions._

/** Near-duplicate detection (SURVEY.md §2 q40–q42).
  *
  * Scale shape: signatures are pure map-side column math (higher-order
  * functions, codegen'd); the only shuffles are (a) the LSH bucket join on
  * (band, bucket-hash) — data-proportional, never a cross join — and
  * (b) the pair-verification join, bounded by the candidate count.
  * Mega-buckets (degenerate hash collisions) are capped so one hot bucket
  * can't quadratically blow up a 100 TB run.
  */
object Dedup {

  val NumPerm  = 128
  val Bands    = 32
  val RowsPer  = 4 // threshold ≈ (1/32)^(1/4) ≈ 0.42

  /** Autotune the LSH OR-of-ANDs: pick (bands b, rows-per-band r) with
    * b·r = `sigLen` whose S-curve threshold (1/b)^(1/r) lands nearest
    * `targetJaccard`. More bands → lower threshold (higher recall, more
    * candidates); longer bands → higher threshold (tighter candidates).
    * Pure planning arithmetic — callers feed the result into
    * [[minhashLshPairs]]/the fused operator instead of hand-picking. */
  def tuneLshBands(targetJaccard: Double, sigLen: Int): (Int, Int) = {
    require(targetJaccard > 0 && targetJaccard < 1, s"threshold $targetJaccard out of (0,1)")
    val candidates = (1 to sigLen).filter(sigLen % _ == 0).map(b => (b, sigLen / b))
    candidates.minBy { case (b, r) => math.abs(math.pow(1.0 / b, 1.0 / r) - targetJaccard) }
  }
  val MersP    = 2147483647L // 2^31 - 1

  /** Deterministic permutation parameters (seeded, executor-independent). */
  private val permParams: (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(42)
    val as  = Seq.fill(NumPerm)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val bs  = Seq.fill(NumPerm)(rnd.nextInt(Int.MaxValue).toLong)
    (as, bs)
  }

  /** JIT-compiled shingle+minhash kernel. Higher-order column functions
    * evaluate interpreted (boxed, per-element expression eval) — nested
    * perms×shingles transforms cost ~60ms/doc; this tight loop does the
    * same work in ~µs/doc. Tokens → k-shingles → XXH64 (seed 42,
    * deterministic across executors, 63-bit — collision-free in
    * practice, which is what lets q120/q201 be value-oracled against
    * string-set jaccard/containment in DuckDB) → distinct sorted hash
    * set + the NumPerm affine-permutation minima over the 31-bit
    * reductions (factors and reduced hashes < 2^31 keep products
    * < 2^62 — no long overflow). Returns (shingle hash set,
    * signature). */
  private def sigUdf(shingleK: Int) = {
    val (as, bs) = permParams
    val aArr     = as.toArray
    val bArr     = bs.toArray
    udf { (toks: Seq[String]) =>
      import org.apache.spark.sql.catalyst.expressions.XXH64
      import org.apache.spark.unsafe.types.UTF8String
      val n = toks.length - shingleK + 1
      if (n <= 0) (Array.empty[Long], Array.empty[Long])
      else {
        // set elements are 63-BIT hashes: the exact-jaccard /
        // containment consumers (q120/q201) are DuckDB-oracled over
        // string shingle sets, and a 31-bit space collides once per
        // ~10^4 docs (a silent off-by-one in |set| that breaks the
        // value hash); at 63 bits a collision is a ~10^-12 event.
        val hs = Array.tabulate(n) { i =>
          val sb = new StringBuilder(toks(i))
          var j = 1
          while (j < shingleK) { sb.append(' ').append(toks(i + j)); j += 1 }
          XXH64.hashUTF8String(UTF8String.fromString(sb.result()), 42L) & Long.MaxValue
        }.distinct.sorted
        val sig = Array.tabulate(NumPerm) { i =>
          val a = aArr(i); val b = bArr(i)
          var m = Long.MaxValue
          var k = 0
          while (k < hs.length) {
            // minhash keeps the 31-bit REDUCTION: a, b and the reduced
            // hash are all < 2^31, so a*h+b stays < 2^62 — no overflow.
            // A reduced-space collision only shrinks the effective set
            // by one element, exactly the pre-63-bit behavior.
            val v = (a * (hs(k) & 0x7FFFFFFFL) + b) % MersP
            if (v < m) m = v
            k += 1
          }
          m
        }
        (hs, sig)
      }
    }
  }

  /** Shingle-only kernel: tokenize → k-shingles → XXH64 63-bit distinct
    * sorted hash set, WITHOUT the NumPerm permutation minima — the
    * containment / prefix-filter family ([[containmentJoin]],
    * [[prefixFilterJoin]], [[pairBudget]]) never reads the minhash
    * signature, so computing the 128-permutation pass there was pure
    * map-stage waste. Hashes are bit-identical to [[sigUdf]]'s shingle
    * side (same XXH64 seed, same 63-bit mask). */
  private def shingleUdf(shingleK: Int) = udf { (toks: Seq[String]) =>
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    val n = toks.length - shingleK + 1
    if (n <= 0) Array.empty[Long]
    else Array.tabulate(n) { i =>
      val sb = new StringBuilder(toks(i))
      var j = 1
      while (j < shingleK) { sb.append(' ').append(toks(i + j)); j += 1 }
      XXH64.hashUTF8String(UTF8String.fromString(sb.result()), 42L) & Long.MaxValue
    }.distinct.sorted
  }

  /** doc_id, shingles (distinct sorted hash set) — [[signatures]] minus
    * the minhash signature column and its permutation cost. Shingle-less
    * docs are dropped exactly as in [[signatures]]. */
  def shingleSets(documents: DataFrame, shingleK: Int = 3): DataFrame =
    documents
      .select(col("doc_id"), shingleUdf(shingleK)(tokens(col("text"))).as("shingles"))
      .filter(size(col("shingles")) > 0)

  /** Exact jaccard of two sorted long arrays (two-pointer merge). */
  private val jaccardUdf = udf { (a: Seq[Long], b: Seq[Long]) =>
    val x = a.toArray; val y = b.toArray
    var i = 0; var j = 0; var inter = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { inter += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    val union = x.length + y.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Signature agreement fraction (minhash jaccard estimate). */
  private val estJaccardUdf = udf { (a: Seq[Long], b: Seq[Long]) =>
    var i = 0; var eq = 0
    while (i < a.length && i < b.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    if (a.isEmpty) 0.0 else eq.toDouble / a.length
  }

  /** doc_id, shingles (distinct sorted hash set), minhash signature
    * (array<bigint> length NumPerm) — all map-side. Shingle-less docs are
    * dropped (nothing to compare; keeps them out of a degenerate
    * all-empty LSH bucket). */
  def signatures(documents: DataFrame, shingleK: Int = 3): DataFrame =
    documents
      .select(col("doc_id"), sigUdf(shingleK)(tokens(col("text"))).as("ss"))
      .select(col("doc_id"), col("ss._1").as("shingles"), col("ss._2").as("sig"))
      .filter(size(col("shingles")) > 0)

  /** Explode the signature into (doc_id, band, bucket) rows. */
  def bands(sigs: DataFrame): DataFrame = {
    val bandArr = transform(
      sequence(lit(0), lit(Bands - 1)),
      b =>
        struct(
          b.as("band"),
          xxhash64(concat_ws("_", transform(slice(col("sig"), b * RowsPer + 1, lit(RowsPer)), x => x.cast("string"))))
            .as("bucket")))
    sigs
      .select(col("doc_id"), explode(bandArr).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** q40: MinHash+LSH near-dup pairs, exact-verified.
    *
    * candidate pairs from same (band,bucket) → dedup → verify with exact
    * shingle-set jaccard ≥ verifyThreshold. `maxBucket` drops degenerate
    * buckets before the quadratic pair expansion.
    */
  /** Banded candidate pairs (doc_a < doc_b) from a signature frame —
    * the shared generation step of [[minhashLshPairs]] and the q261
    * quality report. `maxBucket` drops degenerate buckets before the
    * quadratic pair expansion. */
  // NOTE (r11): a collect_set + map-side pair-emission rewrite of this
  // (the Baskets idiom that won for order baskets) was built and
  // MEASURED SLOWER here — q261 cpu 9.7 → 17.7 s — because LSH buckets
  // are overwhelmingly size-1: the interpreted per-bucket HOF emission
  // costs more than the windowed count + self-join saves. Kept as-is.
  private[graft] def bandedCandidates(sigs: DataFrame, maxBucket: Int): DataFrame = {
    val bkt = bands(sigs)
    val bucketSized = bkt.withColumn("bsz", count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("bsz") <= maxBucket)
    val l = bucketSized.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val r = bucketSized.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Candidates annotated with estimated (signature) and exact
    * (shingle-set) jaccard — the verification join both consumers
    * share. Jaccards are UNROUNDED here: the verify predicate must use
    * exactly the comparison the prefix-filter truth set is complete
    * for (a pair at 0.69996 must NOT round up past a 0.7 threshold);
    * consumers round only for display. */
  private[graft] def annotatedCandidates(sigs: DataFrame, maxBucket: Int): DataFrame = {
    val sa = sigs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"), col("sig").as("sig_a"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"), col("sig").as("sig_b"))
    bandedCandidates(sigs, maxBucket)
      .join(sa, "doc_a")
      .join(sb, "doc_b")
      .withColumn("est_jaccard", estJaccardUdf(col("sig_a"), col("sig_b")))
      .withColumn("jaccard", jaccardUdf(col("sh_a"), col("sh_b")))
  }

  def minhashLshPairs(
      documents: DataFrame,
      shingleK: Int = 3,
      verifyThreshold: Double = 0.7,
      maxBucket: Int = 100): DataFrame = {
    val sigs = signatures(documents, shingleK).cache()
    annotatedCandidates(sigs, maxBucket)
      .filter(col("jaccard") >= verifyThreshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("est_jaccard"), 4).as("est_jaccard"),
        round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** q261: LSH candidate-quality report — the dedup sibling of q228's
    * ANN recall report, auditing the banding stage against EXACT ground
    * truth: the prefix-filtered set-similarity join ([[prefixFilterJoin]],
    * provably complete at the threshold) supplies every true pair, the
    * banded candidates are verified with exact jaccard, and one scalar
    * row reports the funnel (candidates → verified), precision, recall,
    * and the MinHash estimator's mean absolute error on true pairs —
    * the numbers that justify (or re-tune, via `planBands`) the
    * band/row split before a 100 TB run. All three inputs are
    * bucket-capped or prefix-filtered; nothing is all-pairs. */
  def lshQualityReport(
      documents: DataFrame,
      shingleK: Int = 3,
      threshold: Double = 0.7,
      maxBucket: Int = 100): DataFrame = {
    val sigs = signatures(documents, shingleK).cache()
    val annotated = annotatedCandidates(sigs, maxBucket).cache()
    // truth side reuses the cached signature frame's shingle sets — one
    // tokenize+shingle pass for the whole report, not two. The truth
    // pair set is RESULT-sized and read twice below (recall semi-join +
    // its own count): materialize it eagerly here — this report always
    // executes at construction anyway (r11: the materialization moved
    // here from prefixFilterJoinFromSets, whose other consumers are
    // single-read; lazy there, q261 re-ran the join per read, measured
    // cpu 9.7 → 21 s)
    val truth = prefixFilterJoinFromSets(sigs.select("doc_id", "shingles"), threshold)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(eager = true)
    val verified = annotated.filter(col("jaccard") >= threshold)
    val funnel = annotated.agg(
      count(lit(1)).as("n_candidates"),
      sum((col("jaccard") >= threshold).cast("long")).as("n_verified"),
      avg(when(col("jaccard") >= threshold, abs(col("est_jaccard") - col("jaccard")))).as("mae"))
    val hit = verified.join(truth, Seq("doc_a", "doc_b"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    val nTruth = truth.agg(count(lit(1)).as("n_true_pairs"))
    val result = funnel
      .crossJoin(nTruth)
      .crossJoin(hit)
      .select(
        col("n_true_pairs"), col("n_candidates"), col("n_verified"),
        // long/long division promotes to double, so 0/0 is NaN (non-null),
        // not NULL — guard the empty sets explicitly, not via coalesce.
        round(when(col("n_candidates") === 0, 0.0)
          .otherwise(col("n_verified") / col("n_candidates")), 4).as("precision"),
        round(when(col("n_true_pairs") === 0, 0.0)
          .otherwise(col("n_hit") / col("n_true_pairs")), 4).as("recall"),
        round(coalesce(col("mae"), lit(0.0)), 4).as("est_mae"))
      .localCheckpoint(eager = true)
    annotated.unpersist(blocking = false)
    sigs.unpersist(blocking = false)
    result
  }

  /** q46: MinHash LSH dedup through the FUSED custom operator
    * ([[graft.plans.LshCandidatePairsExec]]) — identical pair semantics
    * to [[minhashLshPairs]], but band explosion + bucket grouping +
    * bucket cap + pair emission run inside one physical operator with a
    * single shuffle (vs window + self-join + dedup exchanges). Same
    * exact-jaccard verification on top. */
  def minhashLshPairsFused(
      documents: DataFrame,
      shingleK: Int = 3,
      verifyThreshold: Double = 0.7,
      maxBucket: Int = 100): DataFrame = {
    val sigs = signatures(documents, shingleK).cache()
    val cand = graft.plans.LshApi
      .candidatePairs(sigs.select("doc_id", "sig"), "doc_id", "sig", Bands, RowsPer, maxBucket)
      .distinct()
    val sa = sigs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"), col("sig").as("sig_a"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"), col("sig").as("sig_b"))
    cand
      .join(sa, "doc_a")
      .join(sb, "doc_b")
      .withColumn("est_jaccard", estJaccardUdf(col("sig_a"), col("sig_b")))
      .withColumn("jaccard", jaccardUdf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= verifyThreshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("est_jaccard"), 4).as("est_jaccard"),
        round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** q47: near-dup CLUSTERS and canonical-doc election — the step that
    * turns verified pairs into an actually deduplicated corpus.
    *
    * Connected components by iterative min-label propagation: every doc
    * starts labeled with its own id; each round, a doc adopts the
    * smallest label among itself and its neighbors (one shuffle per
    * round: edges ⋈ labels, groupBy min). Label values can only
    * decrease, so the loop converges in ≤ diameter rounds — near-dup
    * clusters are tiny and dense (diameter ~2–3), so `maxRounds=5`
    * converges in practice at any corpus size; convergence is checked,
    * not assumed. Output keeps one row per clustered doc with its
    * cluster id (= min doc_id — the elected canonical) and a
    * keep/drop flag. Docs with no near-dup edges are implicitly kept
    * and stay out of the output (at 100 TB, the edgeless set is ~the
    * whole corpus — materializing it would dwarf the real result). */
  def nearDupClusters(documents: DataFrame, maxRounds: Int = 16): DataFrame =
    connectedComponents(
      minhashLshPairsFused(documents).select("doc_a", "doc_b"), "doc_a", "doc_b", maxRounds)
      .withColumnRenamed("node_id", "doc_id")
      .orderBy("cluster_id", "doc_id")

  /** q280: near-dup cluster resolution with QUALITY survivorship — the
    * curation deliverable q47 stops short of: q47 elects the MIN-ID doc
    * per cluster (arbitrary), but a pretraining pipeline keeps the
    * BEST-QUALITY copy (q131's election, extended from exact-dup groups
    * to LSH-verified NEAR-dup clusters) and ships the rest as a removal
    * manifest. Election is one cluster-grain `max_by(struct(quality,
    * −doc_id))` aggregate over the cluster table (result-sized — only
    * docs with near-dup edges, ~never the corpus), joined back on the
    * cluster key; quality is the q31 map-side scorer, LEFT-joined so a
    * token-free doc scores 0 rather than vanishing from its cluster. */
  def nearDupKeepBest(documents: DataFrame, maxRounds: Int = 16): DataFrame = {
    val clusters = nearDupClusters(documents, maxRounds).select("doc_id", "cluster_id")
    val scored = clusters
      .join(TextAnalysis.qualityScore(documents).select(col("doc_id"), col("quality")),
        Seq("doc_id"), "left")
      .withColumn("quality", coalesce(col("quality"), lit(0.0)))
    val elected = scored
      .groupBy("cluster_id")
      .agg(
        count(lit(1)).as("cluster_size"),
        max(struct(col("quality"), (-col("doc_id")).as("neg_id"))).as("best"))
      .select(col("cluster_id"), col("cluster_size"),
        (-col("best.neg_id")).cast("long").as("best_doc"))
    scored
      .join(elected, "cluster_id")
      .select(col("cluster_id"), col("cluster_size"), col("doc_id"), col("quality"),
        (col("doc_id") === col("best_doc")).as("keep"))
      .orderBy("cluster_id", "doc_id")
  }

  /** q67: winnowing fingerprints (the MOSS rolling-hash scheme) — the
    * plagiarism-detector's document fingerprint. Each k-token shingle
    * hashes to a 32-bit value (md5-prefix — engine-portable); a sliding
    * window of `w` consecutive hashes keeps its MINIMUM, and the
    * distinct window minima are the doc's fingerprint set. Guarantee:
    * any shared run of w+k-1 tokens between two docs shares ≥1
    * fingerprint, while only ~2/(w+1) of all shingles are kept.
    * Spark shape: one map-side explode + ONE per-doc window pass —
    * winnowing is a running min, not an iterative scan. Fingerprints
    * recurring across > `maxDf` docs (boilerplate) are dropped before
    * the overlap join, the same hot-key cap as LSH buckets. Output:
    * doc pairs sharing ≥ `minShared` fingerprints. */
  def winnowingOverlap(
      documents: DataFrame,
      k: Int = 3,
      w: Int = 4,
      minShared: Int = 2,
      maxDf: Int = 100): DataFrame = {
    val fps = winnowingFingerprints(documents, k, w)
    // df-cap via partial-aggregated groupBy + broadcast anti-join (the
    // q56 boilerplate idiom) — NOT a count-over-Window, which shuffles
    // and SORTS every (doc_id, fp) row just to attach a count. The
    // hot-fp set is bounded by construction (each survivor recurs in
    // > maxDf docs, so there are < |fps| / maxDf of them) and
    // broadcasts; the fps relation is computed twice (once for the df
    // agg, once for the anti-join) — two scans of map-side kernel
    // output beat one sort-based window exchange of the same rows.
    val hotFps = fps
      .groupBy("fp")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select("fp")
    val capped = fps
      .join(broadcast(hotFps), Seq("fp"), "left_anti")
      .select("doc_id", "fp")
    val l = capped.select(col("doc_id").as("doc_a"), col("fp"))
    val r = capped.select(col("doc_id").as("doc_b"), col("fp"))
    l.join(r, "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
      .orderBy("doc_a", "doc_b")
  }

  /** Single-pass winnowing kernel: per doc, hash every shingle (first 4
    * md5 bytes unsigned — identical to `conv(substring(md5(g),1,8),16,
    * 10)`, so the DuckDB oracle matches bit-for-bit), slide the w-window
    * min, emit the distinct minima. The whole fingerprint computation is
    * map-side scan work — no explode, no per-doc window sort, no
    * distinct shuffle; the first exchange in the operator is the (tiny)
    * fingerprint join itself. */
  private def winnowUdf(k: Int, w: Int) = udf { (toks: Seq[String]) =>
    val nGrams = toks.length - k + 1
    if (nGrams < w) Array.empty[Long]
    else {
      // shingling happens IN the kernel: building k-grams through the
      // declarative shingles() column (transform+slice+concat_ws) runs
      // interpreted per position — the HOF trap q40's sigUdf avoids the
      // same way
      val arr = toks.toArray
      val md = java.security.MessageDigest.getInstance("MD5")
      val sb = new java.lang.StringBuilder
      val hs = new Array[Long](nGrams)
      var i = 0
      while (i < nGrams) {
        sb.setLength(0)
        var j = 0
        while (j < k) { if (j > 0) sb.append(' '); sb.append(arr(i + j)); j += 1 }
        val d = md.digest(sb.toString.getBytes("UTF-8"))
        md.reset()
        hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        i += 1
      }
      val out = scala.collection.mutable.LinkedHashSet.empty[Long]
      i = 0
      while (i <= hs.length - w) {
        var m = hs(i); var j = 1
        while (j < w) { if (hs(i + j) < m) m = hs(i + j); j += 1 }
        out += m
        i += 1
      }
      out.toArray
    }
  }

  /** Distinct (doc_id, fp) winnowing fingerprints — see
    * [[winnowingOverlap]]. Docs with fewer than w shingles produce no
    * fingerprints (standard winnowing domain). */
  def winnowingFingerprints(documents: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    documents
      .select(
        col("doc_id"),
        explode(winnowUdf(k, w)(tokens(lower(col("text"))))).as("fp"))

  /** Declarative winnowing (explode + sliding window-min) — the portable
    * reference semantics the kernel is spec-tested against. */
  private[graft] def winnowingFingerprintsHof(documents: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    val winMin = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    documents
      .select(
        col("doc_id"),
        posexplode(shingles(tokens(lower(col("text"))), k)).as(Seq("pos", "gram")))
      .withColumn("h", conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long"))
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("fp", min("h").over(winMin))
      // a full window must exist at this start position (0-based pos)
      .filter(col("pos") <= col("n_sh") - w)
      .select("doc_id", "fp")
      .distinct()
  }

  /** Connected components over an undirected pair list by iterative
    * min-label propagation — the generic clustering core shared by the
    * text (q47) and embedding (q65) dedup paths. Labels monotonically
    * decrease, so the loop converges in ≤ diameter rounds; near-dup
    * clusters are tiny and dense (diameter ~2–3), so `maxRounds=5`
    * converges at any corpus size; convergence is checked, not assumed.
    * Returns one row per clustered node: (node_id, cluster_id = the
    * component minimum — the elected canonical, keep flag). Edgeless
    * nodes stay out of the output (at 100 TB they are ~the whole
    * corpus). */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxRounds: Int = 16): DataFrame = {
    // undirected edge list, both directions (propagation is symmetric).
    // NOTE (r11): a self-loop + gated-label-broadcast rewrite (one join
    // per round instead of two) was built and MEASURED SLOWER on every
    // CC consumer (q280 cpu 16 → 25 s, q272 3.3 → 8.5 s) — near-dup
    // edge sets are tiny, so the extra count() action, the per-round
    // broadcast build, and the enlarged edge table cost more than the
    // saved dimension-sized join. Kept as-is.
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .cache()
    val init = edges.select(col("src").as("node_id")).distinct()
      .withColumn("label", col("node_id"))
    // BoundedIteration checkpoints each round eagerly, so the
    // convergence check (did any label change?) compares two
    // materialized node tables — cheap, and wrong-if-truncated label
    // propagation is guarded by requireConvergence
    val labels = BoundedIteration.fixpoint(
      init, maxRounds,
      converged = (prev, next, _) =>
        next.join(prev.withColumnRenamed("label", "old"), "node_id")
          .filter(col("label") =!= col("old")).isEmpty,
      requireConvergence = true) { (lbl, _) =>
      val neighborMin = edges
        .join(lbl.withColumnRenamed("node_id", "dst").withColumnRenamed("label", "dst_label"), "dst")
        .groupBy(col("src").as("node_id"))
        .agg(min("dst_label").as("neighbor_label"))
      lbl
        .join(neighborMin, "node_id")
        .select(col("node_id"), least(col("label"), col("neighbor_label")).as("label"))
    }
    val result = labels
      .select(col("node_id"), col("label").as("cluster_id"))
      .withColumn("keep", col("node_id") === col("cluster_id"))
      .localCheckpoint(eager = true)
    edges.unpersist(blocking = false)
    result
  }

  /** Single-pass SimHash kernel: all 64 bit votes accumulate in one walk
    * over the token list. The per-token hash is Spark's own XXH64 over
    * the UTF8 bytes with seed 42 — bit-identical to the `xxhash64`
    * column function, so the kernel's output equals the declarative
    * nested-HOF formula ([[simhashHof]]) it replaced. That formula
    * re-walked the token-hash array 64× in interpreted mode (the same
    * ~100× interpreted-HOF trap SURVEY §5 measured for MinHash). */
  private val simhashUdf = udf { (toks: Seq[String]) =>
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    val votes = new Array[Int](64)
    toks.foreach { t =>
      val h = XXH64.hashUTF8String(UTF8String.fromString(t), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) != 0L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  /** Declarative SimHash (nested higher-order functions) — interpreted
    * and ~64× the work of the kernel; kept as the portable reference
    * semantics the kernel is spec-tested against. */
  def simhashHof(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val masks  = typedlit(Seq.tabulate(64)(i => 1L << i))
    val hashes = transform(tokens(lower(text)), t => xxhash64(t))
    aggregate(
      transform(
        masks,
        m =>
          when(
            aggregate(hashes, lit(0L), (acc, h) =>
              acc + when(h.bitwiseAND(m) =!= 0, 1L).otherwise(-1L)) > 0,
            m).otherwise(0L)),
      lit(0L),
      (acc, v) => acc + v)
  }

  /** SimHash as a reusable column — the streaming ingest path keys its
    * near-dup dedup state on it. */
  def simhashColumn(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    simhashUdf(tokens(lower(text)))

  /** q41: 64-bit SimHash per document over word hashes — one JIT kernel
    * pass per doc, map-side, no shuffle. */
  def simhash(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), simhashUdf(tokens(lower(col("text")))).as("simhash"))
      .orderBy("doc_id")

  /** SimHash candidate pairs with hamming distance ≤ maxHamming, via
    * 16-bit band blocking (a pair within hamming 3 of 64 bits must agree
    * exactly on ≥1 of 4 bands — pigeonhole). */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(documents)
    val bandMasks = typedlit(Seq.tabulate(4)(j => 0xFFFFL << (16 * j)))
    val banded = sh
      .select(
        col("doc_id"),
        posexplode(transform(bandMasks, m => col("simhash").bitwiseAND(m))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_bits")
    val l = banded.select(col("band"), col("band_bits"), col("doc_id").as("doc_a"))
    val r = banded.select(col("band"), col("band_bits"), col("doc_id").as("doc_b"))
    val cand = l.join(r, Seq("band", "band_bits")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val ha = sh.select(col("doc_id").as("doc_a"), col("simhash").as("h_a"))
    val hb = sh.select(col("doc_id").as("doc_b"), col("simhash").as("h_b"))
    cand
      .join(ha, "doc_a").join(hb, "doc_b")
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** q42: n-gram (token-set) jaccard between consecutive doc ids — the
    * exact-verification kernel, oracle-checkable. */
  def ngramJaccardAdjacent(documents: DataFrame): DataFrame = {
    val toks = array_distinct(tokens(col("text")))
    val t    = documents.select(col("doc_id"), toks.as("tok"))
    val a    = t.select(col("doc_id").as("doc_a"), col("tok").as("tok_a"))
    val b    = t.select(col("doc_id").as("doc_b"), col("tok").as("tok_b"))
    a.join(b, col("doc_b") === col("doc_a") + 1)
      .select(
        col("doc_a"),
        col("doc_b"),
        round(
          size(array_intersect(col("tok_a"), col("tok_b"))).cast("double") /
            size(array_union(col("tok_a"), col("tok_b"))),
          4).as("jaccard"))
      .orderBy("doc_a")
  }

  /** q100: cross-corpus near-dup join — FUZZY decontamination. q66 flags
    * exact shingle overlap against a benchmark; this finds candidate
    * docs that are NEAR-duplicates of any reference doc (a paraphrased
    * eval question, a re-crawled page) without ever comparing
    * reference×reference or candidate×candidate.
    *
    * Same LSH machinery as q40, but the band join is a two-SIDED join
    * (reference bands ⋈ candidate bands on (band, bucket)), so pair
    * expansion is |A∩B-bucket| products only — dedup-B-against-A at
    * 100 TB never pays for A's or B's internal near-dup structure.
    * Per-side bucket caps bound degenerate buckets before expansion.
    * Each flagged candidate reports its best-matching reference doc
    * (max exact jaccard, ties to the smallest ref id). */
  def crossCorpusNearDups(
      reference: DataFrame,
      candidates: DataFrame,
      shingleK: Int = 3,
      verifyThreshold: Double = 0.7,
      maxBucket: Int = 100): DataFrame = {
    val sr = signatures(reference, shingleK).cache()
    val sc = signatures(candidates, shingleK).cache()
    def capped(bnd: DataFrame, idAs: String): DataFrame =
      bnd
        .withColumn("bsz", count(lit(1)).over(Window.partitionBy("band", "bucket")))
        .filter(col("bsz") <= maxBucket)
        .select(col("band"), col("bucket"), col("doc_id").as(idAs))
    // r12 (guide §3.2, verdict item 7): the candidate corpus is the BIG
    // side and most of its band rows hit no reference bucket at all —
    // semi-join them against the (small) reference band keys BEFORE the
    // bucket-size window and the pair join, so non-matching buckets are
    // never shuffled or windowed. Results are identical: the prune drops
    // whole buckets only (a surviving bucket keeps every row, so its
    // windowed size is unchanged), and dropped buckets produced no join
    // rows anyway.
    val candBands = bands(sc)
      .join(bands(sr).select("band", "bucket"), Seq("band", "bucket"), "left_semi")
    val cand = capped(bands(sr), "ref_doc")
      .join(capped(candBands, "cand_doc"), Seq("band", "bucket"))
      .select("cand_doc", "ref_doc")
      .distinct()
    val shr = sr.select(col("doc_id").as("ref_doc"), col("shingles").as("sh_r"))
    val shc = sc.select(col("doc_id").as("cand_doc"), col("shingles").as("sh_c"))
    cand
      .join(shc, "cand_doc")
      .join(shr, "ref_doc")
      .withColumn("jaccard", round(jaccardUdf(col("sh_c"), col("sh_r")), 4))
      .filter(col("jaccard") >= verifyThreshold)
      .groupBy(col("cand_doc"))
      .agg(max(struct(col("jaccard"), (-col("ref_doc")).as("neg_ref"))).as("best"))
      .select(
        col("cand_doc"),
        (-col("best.neg_ref")).as("matched_ref"),
        col("best.jaccard").as("jaccard"))
      .orderBy("cand_doc")
  }

  /** All edit-distance-≤1 neighbors of a string: itself plus every
    * one-character deletion (FastSS). Two strings are within distance 1
    * iff their variant sets intersect — deletion covers substitution
    * (both drop the differing position) and insertion (the longer drops
    * the inserted char), so the candidate set is COMPLETE; the
    * levenshtein verify then removes the false positives the shared
    * variants admit (e.g. transposed neighbors). */
  private def deletionVariants(c: org.apache.spark.sql.Column) =
    array_union(
      array(c),
      transform(
        sequence(lit(1), length(c)),
        i => concat(c.substr(lit(1), i - lit(1)), c.substr(i + lit(1), lit(10000)))))

  /** q107: string-similarity self-join (entity resolution — the "same
    * customer, one typo" match): pairs within edit distance 1 via the
    * deletion-neighborhood join. The naive form is the O(n²) levenshtein
    * cross join (that stays in the oracle); this plans an EQUI-join on
    * variant strings — each row explodes to |s|+1 variants map-side, the
    * join is data-proportional, and levenshtein runs only on candidates.
    * `maxKey` bounds the demo subset so the quadratic ORACLE stays
    * tractable; the operator itself has no such need. */
  def fuzzyNameJoin(customer: DataFrame, maxKey: Long = 2000): DataFrame = {
    val subset = customer
      .filter(col("c_custkey") < maxKey)
      .select(col("c_custkey").as("ck"), col("c_name").as("name"))
    val variants = subset.select(
      col("ck"), col("name"), explode(deletionVariants(col("name"))).as("v"))
    val l = variants.select(col("v"), col("ck").as("ck_a"), col("name").as("name_a"))
    val r = variants.select(col("v"), col("ck").as("ck_b"), col("name").as("name_b"))
    l.join(r, Seq("v"))
      .filter(col("ck_a") < col("ck_b"))
      .select("ck_a", "ck_b", "name_a", "name_b")
      .distinct()
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
      .select(
        col("ck_a"), col("ck_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
      .orderBy("ck_a", "ck_b")
  }

  /** q120: prefix-filtered shingle-set similarity self-join (the
    * AllPairs/PPJoin family — the third candidate-generation shape
    * beside LSH banding (q40) and deletion neighborhoods (q107), and
    * unlike LSH it is EXACT: the prefix principle guarantees every
    * qualifying pair is generated). Set elements are the hashed
    * 3-token shingles (the q40/q42 set semantic — shingling is what
    * keeps prefix filtering alive on real text: unigram tokens in a
    * bounded vocabulary give every document the same hot tokens and
    * the candidate set degenerates toward n², measured here at 229 s
    * vs ~1 s at sf0.1). Shingles are globally ordered rarest-first by
    * sorting (df, shingle) structs — `sort_array` over
    * `struct(df, sh)` gives the (document frequency asc, shingle asc)
    * total order without materializing a string key; a pair with
    * jaccard ≥ θ must share an element within BOTH prefixes of length
    * |S| − ⌈θ·|S|⌉ + 1 under any consistent global order, so the
    * equi-join on prefix shingles is complete. Rare-first ordering is
    * what makes it cheap: boilerplate shingles fall OUT of long docs'
    * prefixes, and 3-shingle df is naturally near-1, so posting lists
    * under the join key stay tiny. All shuffles are data-
    * proportional: a shingle-keyed df join, a per-doc re-group, the
    * prefix join, and a doc-keyed verify join running the two-pointer
    * kernel on candidates only. The O(n²) all-pairs form exists only
    * as the spec's brute-force twin. */
  def prefixFilterJoin(
      documents: DataFrame,
      theta: Double = 0.5,
      shingleK: Int = 3): DataFrame =
    // r11: shingle-only kernel — the join never reads the minhash
    // signature, so the 128-permutation pass was pure waste here
    prefixFilterJoinFromSets(shingleSets(documents, shingleK), theta)

  /** The join proper, from precomputed (doc_id, shingles) sets — lets
    * q261 reuse the CACHED signature frame's shingle sets instead of
    * re-running tokenize+shingle+minhash over the whole corpus for the
    * truth side (the minhash minima, the expensive part of
    * [[signatures]], are pure waste there). */
  private[graft] def prefixFilterJoinFromSets(
      setsIn: DataFrame,
      theta: Double): DataFrame = {
    // r11 (revised mid-round): the sets frame feeds four plan subtrees
    // (df aggregate, prefix build, both verification joins), but the
    // whole join is ONE action — a cache() here columnar-materializes
    // the long arrays and pays a decode on every read, measured 5×
    // WORSE than recomputing the cheap map-side shingle kernel per
    // subtree (q418 cpu 2.1 s uncached vs 9.6 s cached; the same
    // columnar-boundary tax the q310 comment records). Recompute wins.
    val sets = setsIn.select(col("doc_id"), col("shingles"))
    val ex = sets.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val df = ex.groupBy("sh").agg(count(lit(1)).as("df"))
    // rarity order (df asc, sh asc) is used ONLY to pick prefixes; the
    // verify kernel runs on the value-sorted shingle arrays, and the
    // join key is the raw 8-byte shingle — never a string
    val ordered = ex
      .join(df, Seq("sh"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("rare"))
      .withColumn("sz", size(col("rare")))
      .withColumn(
        "pref",
        slice(col("rare"), lit(1), (col("sz") - ceil(lit(theta) * col("sz")) + 1).cast("int")))
      .select(col("doc_id"), col("sz"), posexplode(col("pref")).as(Seq("pos", "p")))
      .select(col("doc_id"), col("sz"), col("pos"), col("p.sh").as("sh"))
    val pl = ordered.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"), col("pos").as("pos_a"), col("sh"))
    val pr = ordered.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"), col("pos").as("pos_b"), col("sh"))
    val cand = pl.join(pr, Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      // length filter: |S| of a qualifying pair differ by ≤ 1/θ
      .filter(least(col("sz_a"), col("sz_b")) >= lit(theta) * greatest(col("sz_a"), col("sz_b")))
      // positional filter (PPJoin): a shared key at (pos_a, pos_b) bounds
      // the overlap by 1 + min remaining; a qualifying pair needs
      // inter ≥ ⌈θ/(1+θ)·(|a|+|b|)⌉
      .filter(
        lit(1) + least(col("sz_a") - col("pos_a") - 1, col("sz_b") - col("pos_b") - 1) >=
          ceil(lit(theta / (1 + theta)) * (col("sz_a") + col("sz_b"))))
      .select("doc_a", "doc_b")
      .distinct()
    val result = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shingles").as("k_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("shingles").as("k_b")), Seq("doc_b"))
      .withColumn("jaccard", round(jaccardUdf(col("k_a"), col("k_b")), 4))
      .filter(col("jaccard") >= theta)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
    // returned LAZY (r11, revised mid-round): an eager checkpoint here
    // forces the whole join to execute at query-construction time even
    // for consumers whose final plan provably needs none or part of it,
    // and every registered consumer now reads the frame exactly once
    // (q418's sweep was the lone multi-reader; its aggregates are fused
    // into one pass in thresholdSweep).
    result
  }

  /** Spec twin of [[prefixFilterJoin]]: brute-force all-pairs
    * shingle-set jaccard (O(n²) — never registered; exists to prove
    * the prefix filter generates EVERY qualifying pair). */
  private[graft] def prefixFilterJoinBrute(
      documents: DataFrame,
      theta: Double = 0.5,
      shingleK: Int = 3): DataFrame = {
    val sets = signatures(documents, shingleK)
      .select(col("doc_id"), col("shingles"))
    val l = sets.select(col("doc_id").as("doc_a"), col("shingles").as("k_a"))
    val r = sets.select(col("doc_id").as("doc_b"), col("shingles").as("k_b"))
    l.crossJoin(r)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", round(jaccardUdf(col("k_a"), col("k_b")), 4))
      .filter(col("jaccard") >= theta)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** q201: containment (near-superset) join — pairs where
    * C(A→B) = |A∩B| / |A| ≥ `theta`. Jaccard (q42/q120) misses the
    * asymmetric case a training pipeline cares about: a short document
    * wholly CONTAINED in a longer one (quote farms, concatenated
    * crawls) scores low Jaccard but containment ≈ 1 — the
    * keep-the-superset dedup decision.
    *
    * Shape: per-doc DISTINCT hashed `shingleK`-gram shingles (long
    * keys); common shingles with document frequency > `maxDf` are
    * dropped BEFORE pair expansion (the maxBucket discipline — a
    * boilerplate shingle shared by d docs would expand d² pairs;
    * recall loss is only for pairs whose ENTIRE overlap is
    * boilerplate, disclosed); candidate pairs come from a
    * shingle-keyed self-join (equi, data-proportional), intersection
    * sizes from one (a,b) groupBy, and containment divides by the
    * smaller side's size. Both directions are reported in one row
    * (a < b canonical, c_ab / c_ba columns). */
  /** NOTE on execution semantics: the returned frame is an EAGER
    * `localCheckpoint` — constructing the query executes the full join
    * (required to release the shared shingle/df caches safely), so
    * downstream filters cannot prune work, and the registered-query
    * plan is a checkpoint scan. The WORK plan stays lint-/dump-able
    * through [[containmentJoinWorkPlan]] (r12, advice). */
  def containmentJoin(
      documents: DataFrame,
      theta: Double = 0.8,
      shingleK: Int = 3,
      maxDf: Int = 200,
      pairBudget: Option[Long] = None): DataFrame = {
    // r11: one tokenize+shingle pass for every consumer below. The cache
    // holds the COMPACT per-doc arrays (doc-cardinality rows; exploding
    // from the cache is cheap columnar work, and caching the exploded
    // incidence instead measured slower — the materialization cost
    // outweighed the saved explode). The minhash signature was never
    // read, so the shingle-only kernel drops the 128-permutation pass;
    // the exploded incidence is distinct BY CONSTRUCTION (the kernel
    // emits a per-doc distinct set), so the former .distinct() was a
    // redundant full shuffle; and set sizes read off the array length
    // instead of a groupBy over the incidence — one less shuffle.
    val arrays = shingleSets(documents, shingleK).cache()
    // the df table is itself read up to three times (budget histogram,
    // rare filter, disclosure share) — aggregate once
    val dfs = arrays
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df")).cache()
    // result-sized (pairs above theta); materialize before releasing the
    // shared array/df caches
    val result = containmentFrame(arrays, dfs, theta, maxDf, pairBudget)
      .localCheckpoint(eager = true)
    dfs.unpersist(blocking = false)
    arrays.unpersist(blocking = false)
    result
  }

  /** The LAZY work plan of [[containmentJoin]] (uncached inputs) — the
    * pre-checkpoint shape PlanSpec lints and the optimization-round
    * plan dumps show; the production path's caches/checkpoint change
    * execution policy, never the plan's operators. */
  private[graft] def containmentJoinWorkPlan(
      documents: DataFrame,
      theta: Double = 0.8,
      shingleK: Int = 3,
      maxDf: Int = 200,
      pairBudget: Option[Long] = None): DataFrame = {
    val arrays = shingleSets(documents, shingleK)
    val dfs = arrays
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
    containmentFrame(arrays, dfs, theta, maxDf, pairBudget)
  }

  /** The containment join proper over a shared (doc_id, shingles) arrays
    * frame and its precomputed (sh, df) table. */
  private def containmentFrame(
      arrays: DataFrame,
      dfs: DataFrame,
      theta: Double,
      maxDf: Int,
      pairBudget: Option[Long]): DataFrame = {
    val sets = arrays.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val sizes = arrays.select(col("doc_id"), size(col("shingles")).cast("long").as("sz"))
    // ENFORCED pair budget (round-9: q411 priced the candidate stream
    // but nothing read the price — a duplication-heavy corpus grows
    // Σ df·(df−1)/2 quadratically in the duplication factor while every
    // input metric grows linearly, and maxDf alone doesn't know that).
    // With a budget, the cap is DERIVED from the corpus: the largest
    // df ≤ maxDf whose cumulative candidate enumeration fits.
    val effMaxDf = pairBudget.fold(maxDf)(b => budgetedMaxDfFromDfs(dfs, maxDf, b))
    // same rows as the former count-over-window + filter, but the df
    // aggregate is shared instead of recomputed as a window
    val rare = sets
      .join(dfs.filter(col("df") <= effMaxDf).select("sh"), Seq("sh"), "left_semi")
      .select("doc_id", "sh")
    val inter = rare.select(col("doc_id").as("doc_a"), col("sh"))
      .join(rare.select(col("doc_id").as("doc_b"), col("sh")), "sh")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("common"))
    val base = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("c_ab", col("common") / col("sz_a"))
      .withColumn("c_ba", col("common") / col("sz_b"))
      .filter(greatest(col("c_ab"), col("c_ba")) >= theta)
      .select(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"), col("common"),
        round(col("c_ab"), 4).as("c_ab"), round(col("c_ba"), 4).as("c_ba"))
      .orderBy("doc_a", "doc_b")
    // SELF-DESCRIBING budget binding (round-10 weak row: the default
    // budget collapsed the sf1 output to 0 rows and NOTHING on the
    // result said so — a caller who never runs q411 reads "no
    // near-dups" and believes it). When a budget is active, every
    // output row carries the derived cap and the share of shingle
    // incidence it discarded; a >50% discard additionally logs loud.
    pairBudget.fold(base) { _ =>
      val share = incidenceDropShareFromDfs(dfs, effMaxDf)
      if (share > 0.5)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"containmentJoin pair budget dropped ${share * 100}% of shingle " +
            s"incidence (eff_max_df=$effMaxDf) — near-dup recall is bounded; " +
            "run Dedup.pairBudget to price a larger budget")
      base
        .withColumn("eff_max_df", lit(effMaxDf))
        .withColumn("dropped_incidence_share",
          lit(math.floor(share * 10000 + 0.5) / 10000))
    }
  }

  /** The budget → cap derivation [[containmentJoin]] enforces: largest
    * df cutoff ≤ `maxDf` whose capped candidate-pair enumeration
    * Σ_{df ≤ cutoff} df·(df−1)/2 stays within `budget` — q411's price,
    * read back into the join as a ceiling instead of a report. Cost:
    * ONE df aggregate over the shingle incidence (the same aggregate
    * the join's df window needs anyway) folded to a ≤max-df-row
    * histogram, a cumulative sum over that bounded frame, and a 1-row
    * driver lookup. Never returns < 1 (df = 1 shingles generate zero
    * pairs, so cutoff 1 always fits any budget ≥ 0 — worst case the
    * join degenerates to "unique shingles only", disclosed by q411's
    * dropped_incidence_share rather than silently blowing the shuffle). */
  /** The helper's internal frame, exposed pre-collect so its SPEC can
    * lint the plan: the unpartitioned cumulative window is legal ONLY
    * because its input is the df HISTOGRAM (≤ max-observed-df rows by
    * construction) — a refactor that moved it onto the raw sh-grain
    * incidence would ship a data-sized single-partition sort, and
    * because the query executes eagerly here, PlanLint's registered-
    * query gate would never see it. AnalyticsR15Spec asserts the window
    * feeds off the keys=[df] aggregate. */
  private[graft] def dfBudgetFrame(sets: DataFrame, maxDf: Int, budget: Long): DataFrame =
    dfBudgetFrameFromDfs(sets.groupBy("sh").agg(count(lit(1)).as("df")), maxDf, budget)

  /** Same derivation from a PRECOMPUTED (sh, df) frame — lets
    * [[containmentJoin]] share one df aggregate across the budget
    * histogram, the rare filter, and the disclosure share instead of
    * re-aggregating the incidence three times (r11). */
  private[graft] def dfBudgetFrameFromDfs(dfs: DataFrame, maxDf: Int, budget: Long): DataFrame = {
    val wCum = Window.orderBy("df").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dfs
      .groupBy("df").agg(count(lit(1)).as("n_sh")) // histogram: ≤ max observed df rows
      // double math: df ~ corpus size makes df²·n_sh overflow-prone in
      // Long; the budget decision needs magnitude, not exactness past 2^53
      .withColumn("pp2",
        col("df").cast("double") * (col("df") - 1).cast("double") * col("n_sh").cast("double"))
      .withColumn("cum_pp2", sum("pp2").over(wCum))
      .filter(col("df") <= maxDf && col("cum_pp2") <= lit(2.0) * budget.toDouble)
      .agg(max(col("df")).as("d"))
  }

  private[graft] def budgetedMaxDf(sets: DataFrame, maxDf: Int, budget: Long): Int =
    budgetedMaxDfFromDfs(sets.groupBy("sh").agg(count(lit(1)).as("df")), maxDf, budget)

  private[graft] def budgetedMaxDfFromDfs(dfs: DataFrame, maxDf: Int, budget: Long): Int = {
    val r = dfBudgetFrameFromDfs(dfs, maxDf, budget).head()
    if (r.isNullAt(0)) 1 else math.max(1, r.getLong(0).toInt)
  }

  /** Share of shingle INCIDENCE (Σ df) above the derived cap — the
    * number the budget disclosure rides on. One histogram-sized
    * aggregate (same dfs frame as [[budgetedMaxDf]]), 1-row lookup. */
  private[graft] def incidenceDropShare(sets: DataFrame, cutoff: Int): Double =
    incidenceDropShareFromDfs(sets.groupBy("sh").agg(count(lit(1)).as("df")), cutoff)

  private[graft] def incidenceDropShareFromDfs(dfs: DataFrame, cutoff: Int): Double = {
    val r = dfs
      .agg(
        sum(when(col("df") > cutoff, col("df")).otherwise(0L)).as("dropped"),
        sum(col("df")).as("tot"))
      .head()
    if (r.isNullAt(1) || r.getLong(1) == 0L) 0.0
    else r.getLong(0).toDouble / r.getLong(1).toDouble
  }

  /** Scale-aware default pair budget (round-10 weak-row fix): a FIXED
    * budget tuned at one SF silently empties the join at 10× (the df
    * distribution shifts right ∝ corpus size, so a constant cutoff
    * prices out exactly the high-df shingles where the near-dup signal
    * lives). `max(floor, n_docs · perDoc)` keeps the enumeration
    * allowance proportional to corpus cardinality — still a hard cost
    * ceiling (pairs want to grow quadratically; this grows linearly),
    * but one that binds by DESIGN at scale instead of by accident at
    * the tuning SF. Cost: one count() of the input. */
  def scaledPairBudget(
      documents: DataFrame,
      floor: Long = 1000000L,
      perDoc: Long = 2000L): Long =
    math.max(floor, documents.count() * perDoc)

  /** q350: dedup CASCADE report — the pipeline-composition readout a
    * curation run ships with: how many documents and how much token
    * mass survive each stage of exact-fingerprint dedup (q33) followed
    * by near-dup cluster election (q40/q47/q280's MinHash components,
    * keep-best per cluster). Per stage: docs in, docs kept, token mass
    * kept, drop share — the number that justifies (or indicts) each
    * stage's cost at 100 TB.
    *
    * Scale shape: strictly the component operators' own plans (fp
    * groupBy; banded LSH → bounded components), composed stage-on-
    * stage so later stages only see survivors; the report is a 3-row
    * frame. Rows-only: MinHash banding is not portable SQL — the
    * ScalaTest plants one exact-dup pair and one near-dup pair and
    * checks each falls at its own stage. */
  def dedupCascadeReport(documents: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.{fingerprint, tokens}
    val spark = documents.sparkSession
    import spark.implicits._
    val base = documents
      .select(col("doc_id"), col("text"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
    // stage 1: exact fingerprint, keep smallest doc_id. r11: the input
    // stats and the survivor stats come out of ONE aggregate over the
    // windowed frame (the keep flag conditions the survivor sums) —
    // the old per-stage stat() actions replayed the tokenize +
    // fingerprint window once per stage, and the final stage's stat
    // replayed the ENTIRE cascade a second time.
    val flagged = base
      .withColumn("fp", fingerprint(col("text")))
      .withColumn("k1", col("doc_id") === min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
    val s01 = flagged.agg(
      count(lit(1)),
      coalesce(sum(col("n_tok")), lit(0L)),
      coalesce(sum(when(col("k1"), 1L)), lit(0L)),
      coalesce(sum(when(col("k1"), col("n_tok"))), lit(0L))).head()
    val (n0, t0, n1, t1) = (s01.getLong(0), s01.getLong(1), s01.getLong(2), s01.getLong(3))
    val exactKeep = flagged.filter(col("k1")).select("doc_id", "text", "source", "n_tok")
    // stage 2: near-dup components over the exact survivors, keep-best.
    // The cluster table covers ONLY docs with near-dup edges, so the
    // survivor stats are "stage-1 stats minus the election LOSERS'" —
    // one loser-sized join instead of an anti-join over the corpus
    // (which would replay the whole cascade per stat).
    val losers = nearDupKeepBest(exactKeep.select("doc_id", "text", "source"))
      .filter(!col("keep"))
      .select(col("doc_id"))
    val sL = losers.join(exactKeep.select("doc_id", "n_tok"), Seq("doc_id"))
      .agg(count(lit(1)), coalesce(sum(col("n_tok")), lit(0L))).head()
    val (n2, t2) = (n1 - sL.getLong(0), t1 - sL.getLong(1))
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    Seq(
      ("0_input", n0, t0, n0, t0, 0.0),
      ("1_exact", n0, t0, n1, t1, r4(1.0 - n1.toDouble / n0)),
      ("2_neardup", n1, t1, n2, t2, r4(1.0 - n2.toDouble / math.max(n1, 1L))))
      .toDF("stage", "docs_in", "tokens_in", "docs_kept", "tokens_kept", "doc_drop_share")
  }

  /** q411: PAIR-BUDGET advisor for the shingle-join dedup family — the
    * cost forecast you read BEFORE running q201/q42/q120 on a new
    * corpus (the round-9 sf1 run made the case: containment's cost is
    * its candidate-enumeration output, Σ df·(df−1)/2 over shingle
    * document frequencies, and a duplication-heavy corpus grows it
    * quadratically in the duplication factor while every input metric
    * grows linearly). For each candidate `maxDf` cap: shingles kept /
    * dropped, the EXACT candidate-pair enumeration count the capped
    * join would produce (pair-multiplicity — one per shared shingle,
    * i.e. join-output rows, the actual shuffle cost), and the share of
    * shingle incidence the cap discards (the disclosed recall
    * boundary). One df aggregate feeds every cap — the advisor costs
    * one scan regardless of how many caps it prices. */
  def pairBudget(
      documents: DataFrame,
      maxDfs: Seq[Int] = Seq(50, 100, 200, 400),
      shingleK: Int = 3): DataFrame = {
    // r11: shingle-only kernel (the advisor never reads the minhash
    // signature); the explode is distinct by construction — no .distinct()
    val dfs = shingleSets(documents, shingleK)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
    val totals = dfs.agg(sum("df").as("tot_inc"))
    dfs
      .withColumn("max_df", explode(lit(maxDfs.toArray)))
      .groupBy("max_df")
      .agg(
        sum(when(col("df") <= col("max_df"), 1L).otherwise(0L)).as("n_shingles_kept"),
        sum(when(col("df") > col("max_df"), 1L).otherwise(0L)).as("n_shingles_dropped"),
        sum(when(col("df") <= col("max_df"), col("df") * (col("df") - 1)).otherwise(0L))
          .as("pp2"),
        sum(when(col("df") > col("max_df"), col("df")).otherwise(0L)).as("dropped_inc"))
      .crossJoin(broadcast(totals)) // 1-row scalar
      .select(
        col("max_df"),
        col("n_shingles_kept"),
        col("n_shingles_dropped"),
        (col("pp2") / 2).cast("long").as("est_candidate_pairs"),
        round(col("dropped_inc") / col("tot_inc").cast("double"), 4)
          .as("dropped_incidence_share"))
      .orderBy("max_df")
  }

  /** q423: the q418 threshold sweep on a DETERMINISTIC md5 SUB-CORPUS
    * (the q55/q157/q300 sampling idiom: membership = md5(doc_id) hex
    * prefix, portable across engines) — the SCALE path for the sweep's
    * own cost: the exact sweep's pair enumeration grows ~quadratically
    * in corpus duplication, and at sf1 its brute DuckDB oracle form
    * OOMs (round-10: "oracle-infeasible"); a p-fraction sample cuts the
    * quadratic term by p² while the θ-curve SHAPE (the decision the
    * sweep informs) is preserved. Oracle-checkable at every SF. */
  def thresholdSweepSampled(
      documents: DataFrame,
      thetas: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9),
      hexChars: Seq[String] = Seq("0", "1", "2", "3")): DataFrame =
    thresholdSweep(
      documents.filter(
        substring(md5(col("doc_id").cast("string")), 1, 1).isInCollection(hexChars)),
      thetas)

  /** q424: corpus DUPLICATION PROFILE — the "how duplicated is this
    * corpus" readout a dedup pass is judged against (q33 deduplicates,
    * q350 reports survival; this reports the SHAPE of the duplication
    * being removed): exact-fingerprint cluster sizes, and per size k
    * the number of clusters, the document share, and the token share
    * held in k-sized clusters. A healthy crawl is mass-at-1; a quote
    * farm shows a fat tail. One fp groupBy + one bounded histogram
    * aggregate — the k domain is ≤ max cluster size. */
  def duplicationProfile(documents: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.{fingerprint, tokens}
    val clusters = documents
      .select(fingerprint(col("text")).as("fp"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy("fp")
      .agg(count(lit(1)).as("k"), sum("n_tok").as("toks"))
    val tot = clusters.agg(
      sum(col("k")).as("tot_docs"), sum(col("toks")).as("tot_toks"))
    clusters
      .groupBy("k")
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(col("k")).as("n_docs"),
        sum(col("toks")).as("n_tokens"))
      .crossJoin(broadcast(tot)) // 1-row scalar (q14 idiom)
      .select(
        col("k"),
        col("n_clusters"),
        col("n_docs"),
        round(col("n_docs") / col("tot_docs").cast("double"), 4).as("doc_share"),
        round(col("n_tokens") / col("tot_toks").cast("double"), 4).as("token_share"))
      .orderBy("k")
  }

  /** q425: WITHIN- vs CROSS-SOURCE duplication — where the exact dups
    * COME FROM (q424 profiles how much; this says whether dedup should
    * run per-source or globally: within-source dups are re-crawls and
    * cheap to kill at ingest, cross-source dups are syndication and
    * need the global pass): per fingerprint cluster (size ≥ 2), is it
    * confined to one source or spanning several; report per bucket the
    * cluster count, doc count, and redundant-doc count (k−1 per
    * cluster — what a keep-one dedup would delete). Plans as one fp
    * groupBy with a countDistinct(source) — no pair expansion at all,
    * the cheapest possible dup-provenance readout. */
  def dupSpanSources(documents: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.fingerprint
    documents
      .select(fingerprint(col("text")).as("fp"), col("source"))
      .groupBy("fp")
      .agg(count(lit(1)).as("k"), countDistinct("source").as("n_sources"))
      // singletons stay in the report as their own bucket: a clean
      // corpus must read "all unique", not an empty frame (the q412
      // lesson — empty output is indistinguishable from a broken probe)
      .withColumn("span",
        when(col("k") === 1, "unique")
          .when(col("n_sources") === 1, "within_source")
          .otherwise("cross_source"))
      .groupBy("span")
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(col("k")).as("n_docs"),
        sum(col("k") - 1).as("n_redundant"))
      .orderBy("span")
  }

  /** q418: DEDUP THRESHOLD SWEEP — what each candidate jaccard policy
    * would COST before anyone commits to one (the θ knob is the single
    * biggest recall/volume lever in a near-dup pass, and teams pick it
    * blind): ONE exact prefix-filtered join at the LOOSEST θ in the
    * grid (q120's machinery — the prefix principle makes it complete
    * at θ_min, and any tighter policy's pairs are a subset), then per
    * grid θ: qualifying pairs and distinct documents touched. The
    * sweep costs one q120 run regardless of grid size. Grid θ values
    * ride as double literals in BOTH engines (binary-inexactness is
    * shared, so the ≥ comparisons agree). */
  def thresholdSweep(
      documents: DataFrame,
      thetas: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9)): DataFrame = {
    val spark = documents.sparkSession
    val base = prefixFilterJoin(documents, thetas.min)
    // r11: ONE aggregation pass over the (theta, pair) stream — the old
    // two-branch form (pair stats + affected-doc stats) replayed the
    // whole prefix join per branch. Exploding both doc ids up front
    // doubles each pair row, so n_pairs = rows/2 (exact — always even),
    // the mean jaccard over the doubled multiset is the same mean, and
    // the distinct-doc count reads the very rows it needed anyway.
    val per = base
      .withColumn("theta", explode(lit(thetas.toArray)))
      .filter(col("jaccard") >= col("theta"))
      .select(col("theta"), col("jaccard"),
        explode(array(col("doc_a"), col("doc_b"))).as("d"))
    val stats = per.groupBy("theta").agg(
      (count(lit(1)) / 2).cast("long").as("n_pairs"),
      round(avg("jaccard"), 4).as("avg_jaccard"),
      countDistinct("d").as("n_docs_affected"))
    // grid densified: a θ no pair reaches must still price at zero
    import spark.implicits._
    thetas.toDF("theta")
      .join(stats, Seq("theta"), "left")
      .select(
        round(col("theta"), 4).as("theta"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_affected"), lit(0L)).as("n_docs_affected"),
        col("avg_jaccard"))
      .orderBy("theta")
  }
}
