package graft

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._
  lazy val t = Tables(spark, sfDir)

  def fixtureDocs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L),
    (1L, "The  quick brown FOX jumps over the lazy dog ", "en", "s0", 45L), // normalized dup of 0
    (2L, "der hund ist nicht die katze und das haus", "de", "s1", 41L),
    (3L, "completely different content about spark engines", "en", "s1", 48L),
    (4L, "the quick brown fox jumps over the lazy cat", "en", "s2", 43L) // near-dup of 0
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("q33 exact dedup keeps min doc_id per normalized fingerprint") {
    val kept = TextAnalysis.dedupExact(fixtureDocs).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 3L, 4L)) // doc 1 collapses into doc 0
  }

  test("q35 language ID picks the language with most marker hits") {
    val preds = TextAnalysis.langId(fixtureDocs)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(preds(0L) == "en")
    assert(preds(2L) == "de")
  }

  test("q31 quality: stopword-heavy doc scores below content-heavy doc") {
    val q = TextAnalysis.qualityScore(
      Seq(
        (0L, "the the the the a a and of to the", "en", "s", 1L),
        (1L, "spark catalyst optimizer rewrites logical plans efficiently always", "en", "s", 1L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars"))
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(q(0L) < q(1L))
  }

  test("q40 minhash-lsh recovers the planted near-dup pairs (vs exact jaccard)") {
    val docs = t.documents
    val found = Dedup.minhashLshPairs(docs, verifyThreshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // exact ground truth: all pairs with 3-shingle jaccard >= 0.8
    val sh = Dedup.signatures(docs).select(col("doc_id"), col("shingles"))
    val a  = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b  = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    val exact = a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("j",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("j") >= 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    val recall = exact.count(found.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} true pairs")
    assert(found.forall { case (x, y) => x < y })
  }

  test("q46 fused LSH operator returns exactly the composed operator's pairs") {
    val docs = t.documents
    val composed = Dedup.minhashLshPairs(docs).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    val fused = Dedup.minhashLshPairsFused(docs).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    assert(composed.nonEmpty)
    assert(fused == composed, s"fused ${fused.size} pairs vs composed ${composed.size}")
  }

  test("q46 fused LSH plans through the custom physical operator") {
    val sigs = Dedup.signatures(t.documents.limit(50)).select("doc_id", "sig")
    val df = graft.plans.LshApi.candidatePairs(sigs)
    // nodeName trims the Exec suffix and AQE hides the inner tree from
    // collect(), so assert on the plan string: the custom node planned
    // (present) and is valid (no missing-input "!" marker)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LshCandidatePairs"), s"custom exec missing from plan:\n$p")
    assert(!p.contains("!LshCandidatePairs"), s"invalid (missing-input) custom node:\n$p")
  }

  test("q46 pruning rule: a wide child collapses to (id, sig) under the custom node") {
    val wide = Dedup.signatures(t.documents.limit(50))
      .withColumn("junk", lit("x"))
      .select("doc_id", "sig", "shingles", "junk")
    val df = graft.plans.LshApi.candidatePairs(wide)
    val projected = df.queryExecution.optimizedPlan.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project => p.projectList.map(_.name)
    }
    assert(projected.exists(cols => cols.toSet == Set("doc_id", "sig")),
      s"no 2-column prune below the custom node: $projected")
    assert(df.select("doc_a").distinct().count() > 0)
  }

  test("q47 near-dup clusters: every cluster id is the member minimum, exactly one keeper") {
    val clusters = Dedup.nearDupClusters(t.documents)
      .as[(Long, Long, Boolean)].collect()
    assert(clusters.nonEmpty)
    val byCluster = clusters.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, s"cluster $cid label is not the min member")
      assert(members.count(_._3) == 1 && members.find(_._3).get._1 == cid,
        s"cluster $cid must keep exactly its canonical doc")
    }
    // clusters must cover exactly the docs that appear in verified pairs
    val paired = Dedup.minhashLshPairs(t.documents)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    assert(clusters.map(_._1).toSet == paired, "cluster membership != paired docs")
    // and each verified pair must land in one cluster
    val label = clusters.map(c => c._1 -> c._2).toMap
    Dedup.minhashLshPairs(t.documents).select("doc_a", "doc_b").as[(Long, Long)].collect()
      .foreach { case (a, b) => assert(label(a) == label(b), s"pair ($a,$b) split across clusters") }
  }

  test("q280 keep-best: the higher-quality copy survives even with a larger doc_id") {
    // doc 10 is a stopword-padded near-dup of doc 11 (shared 60-token base
    // → shingle Jaccard ≈ 0.86, well above the LSH threshold; the 8-stopword
    // head drops doc 10's q31 score): despite 10 < 11, the manifest must
    // keep 11 — exactly where min-id election goes wrong
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (10L, "the of and a to in is it " + base, "en", "s", 1L),
      (11L, base, "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Dedup.nearDupKeepBest(docs).collect()
    assert(r.nonEmpty, "planted near-dups must cluster")
    assert(r.length == 2 && r.map(_.getAs[Long]("cluster_size")).forall(_ == 2L))
    val kept = r.filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id")).toSeq
    assert(kept == Seq(11L), s"higher-quality doc must survive, kept=$kept")
    // quality column carries the q31 score used for the election
    val qm = r.map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("quality")).toMap
    assert(qm(11L) > qm(10L))
  }

  test("q280 on the corpus: one keeper per cluster, membership matches q47") {
    val r = Dedup.nearDupKeepBest(t.documents).collect()
    assert(r.nonEmpty)
    val byCluster = r.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      assert(members.count(_.getAs[Boolean]("keep")) == 1, s"cluster $cid keepers != 1")
      assert(members.length == members.head.getAs[Long]("cluster_size").toInt)
      val best = members.maxBy(m => (m.getAs[Double]("quality"), -m.getAs[Long]("doc_id")))
      assert(best.getAs[Boolean]("keep"), s"cluster $cid kept a non-best doc")
    }
    val q47docs = Dedup.nearDupClusters(t.documents)
      .select("doc_id").as[Long].collect().toSet
    assert(r.map(_.getAs[Long]("doc_id")).toSet == q47docs)
  }

  test("q41 simhash: near-identical docs land within small hamming distance") {
    val pairs = Dedup.simhashPairs(fixtureDocs, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"dup pair not found in $pairs")
  }

  test("q41 simhash kernel equals the declarative nested-HOF formula") {
    val kernel = Dedup.simhash(t.documents.limit(50))
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    val hof = t.documents.limit(50)
      .select(col("doc_id"), Dedup.simhashHof(col("text")).as("simhash"))
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(kernel == hof, "JIT kernel diverges from reference HOF semantics")
  }

  test("q42 jaccard kernel: identical sets = 1, disjoint = 0") {
    val j = Dedup.ngramJaccardAdjacent(
      Seq(
        (0L, "alpha beta gamma", "en", "s", 1L),
        (1L, "alpha beta gamma", "en", "s", 1L),
        (2L, "delta epsilon zeta", "en", "s", 1L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars"))
      .select("doc_a", "jaccard").as[(Long, Double)].collect().toMap
    assert(j(0L) == 1.0 && j(1L) == 0.0)
  }

  test("q55 deterministic hash sample: reproducible, ~3/16 rate, composable subsets") {
    val docs = Tables(spark, sfDir).documents
    val total = docs.count()
    val r1 = TextAnalysis.deterministicSample(docs).collect()
    val r2 = TextAnalysis.deterministicSample(docs).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq, "sample not reproducible")
    val sampled = r1.map(_.getAs[Long]("n_docs")).sum.toDouble
    val rate = sampled / total
    assert(rate > 0.10 && rate < 0.28, s"sample rate $rate far from 3/16")
    // composability: the 2-nibble sample is a strict subset of the 3-nibble one
    val ids3 = docs.filter(
      org.apache.spark.sql.functions.substring(
        org.apache.spark.sql.functions.md5(col("doc_id").cast("string")), 1, 1).isin("0", "1", "2"))
      .select("doc_id").as[Long].collect().toSet
    val ids2 = docs.filter(
      org.apache.spark.sql.functions.substring(
        org.apache.spark.sql.functions.md5(col("doc_id").cast("string")), 1, 1).isin("0", "1"))
      .select("doc_id").as[Long].collect().toSet
    assert(ids2.subsetOf(ids3) && ids2.size < ids3.size)
  }

  test("q261 LSH quality report: recall 1 on the fixture, verified ⊆ truth, funnel consistent") {
    val r = Dedup.lshQualityReport(fixtureDocs, threshold = 0.7).head()
    val nTrue = r.getAs[Long]("n_true_pairs")
    val nCand = r.getAs[Long]("n_candidates")
    val nVer = r.getAs[Long]("n_verified")
    assert(nTrue > 0, "fixture should contain planted near-dup pairs")
    assert(nVer <= nCand, "verification can only shrink the candidate set")
    // verification applies the SAME exact jaccard as the truth join, so
    // every verified pair is true and recall is n_verified/n_true
    assert(r.getAs[Double]("recall") === (nVer.toDouble / nTrue))
    assert(r.getAs[Double]("recall") === 1.0, "banding missed a planted pair")
    assert(r.getAs[Double]("precision") > 0.0 && r.getAs[Double]("precision") <= 1.0)
    assert(r.getAs[Double]("est_mae") < 0.2, "MinHash estimate wildly off on true pairs")
  }

  test("q56 line dedup removes planted boilerplate lines, keeps content in order") {
    val boiler = "subscribe to our newsletter"
    val docs = Seq(
      (0L, s"$boiler\nunique content zero\nmore zero", "en", "s", 1L),
      (1L, s"unique content one\n$boiler\ntail one", "en", "s", 1L),
      (2L, s"$boiler\nunique content two", "en", "s", 1L),
      (3L, "no boilerplate here at all\njust content", "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.lineDedup(docs, delimiter = "\n", minDocFrac = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // the boilerplate line (3/4 docs) is gone everywhere; order preserved
    assert(out(0L).getAs[String]("kept_text") == "unique content zero\nmore zero")
    assert(out(1L).getAs[String]("kept_text") == "unique content one\ntail one")
    assert(out(2L).getAs[String]("kept_text") == "unique content two")
    assert(out(3L).getAs[String]("kept_text") == "no boilerplate here at all\njust content")
    assert(out(0L).getAs[Long]("n_total") == 3 && out(0L).getAs[Long]("n_kept") == 2)
  }

  test("q57 repetition score flags a degenerate all-same-word doc, keeps varied text") {
    val docs = Seq(
      (0L, "spam spam spam spam spam spam spam spam", "en", "s", 1L),
      (1L, "a varied document with distinct words only", "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.repetitionScore(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out(0L).getAs[Boolean]("kept") && out(0L).getAs[Double]("dup_frac") > 0.8)
    assert(out(1L).getAs[Boolean]("kept") && out(1L).getAs[Double]("dup_frac") == 0.0)
  }

  test("q58 sequence packing: bins conserve tokens, fill hovers at budget, bins are contiguous") {
    val docs = Tables(spark, sfDir).documents
    val budget = 512
    val out = TextAnalysis.sequencePacking(docs, budget).collect()
    val totalOut = out.map(_.getAs[Long]("bin_tokens")).sum
    val totalIn = docs.select(size(split(col("text"), " ")).cast("long")).as[Long].collect().sum
    assert(totalOut == totalIn, "packing lost or duplicated tokens")
    // a mid-stream bin can lose at most one straddling doc's worth of
    // tokens to its predecessor, so fill floor = budget - longest doc
    val maxDoc = docs.select(size(split(col("text"), " ")).cast("long")).as[Long]
      .collect().max
    val bySource = out.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, bins) =>
      val sorted = bins.sortBy(_.getAs[Long]("bin"))
      sorted.dropRight(1).foreach { b =>
        assert(b.getAs[Long]("bin_tokens") >= budget - maxDoc,
          s"$src bin ${b.getAs[Long]("bin")} underfilled mid-stream")
      }
      // bin ids contiguous from 0
      assert(sorted.map(_.getAs[Long]("bin")).toSeq == sorted.indices.map(_.toLong))
    }
  }

  test("q67 winnowing: shared w+k-1 token run guarantees a shared fingerprint; disjoint docs share none") {
    // k=3, w=4 -> any shared run of 6 tokens must yield >= 1 common fp
    val run = "one two three four five six"
    val docs = Seq(
      (0L, s"prefix words here $run suffix end words", "en", "s", 1L),
      (1L, s"$run totally different tail content words", "en", "s", 1L),
      (2L, "nothing in common with the others at all whatsoever", "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val fps = Dedup.winnowingFingerprints(docs)
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) => d -> rs.map(_.getAs[Long]("fp")).toSet }
    assert((fps(0L) intersect fps(1L)).nonEmpty, "shared 6-token run produced no shared fingerprint")
    assert((fps(0L) intersect fps(2L)).isEmpty && (fps(1L) intersect fps(2L)).isEmpty)
    // density: winnowing keeps far fewer fps than shingles
    val nShingles0 = docs.filter(col("doc_id") === 0)
      .select(size(graft.functions.TextFunctions.shingles(
        graft.functions.TextFunctions.tokens(lower(col("text"))), 3))).as[Int].first()
    assert(fps(0L).size < nShingles0, "no compression over raw shingles")
    // overlap operator surfaces exactly the overlapping pair at minShared=1
    val pairs = Dedup.winnowingOverlap(docs, minShared = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)), s"got $pairs")
  }

  test("q67 winnowing kernel equals the declarative sliding-window formula") {
    val docs = Tables(spark, sfDir).documents.limit(200)
    val kernel = Dedup.winnowingFingerprints(docs)
      .as[(Long, Long)].collect().toSet
    val hof = Dedup.winnowingFingerprintsHof(docs)
      .as[(Long, Long)].collect().toSet
    assert(kernel == hof, "kernel diverges from reference winnowing semantics")
  }

  test("q72 mixture solver: rates hit target shares, scarcest source taken whole") {
    val docs = Tables(spark, sfDir).documents
    val shares = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val rates = TextAnalysis.mixtureRates(docs, shares).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(rates.keySet == shares.keySet)
    // all rates are valid Bernoulli fractions; the binding source is ~1
    assert(rates.values.forall { case (rate, _) => rate > 0 && rate <= 1.0001 })
    assert(rates.values.exists { case (rate, _) => rate > 0.9999 }, s"no binding source in $rates")
    // sampled tokens realize the target ratios exactly (solver is exact)
    val st = rates.map { case (s, (_, tok)) => s -> tok }
    assert(math.abs(st("src0") / st.values.sum - 0.5) < 0.001)
    assert(math.abs(st("src1") / st.values.sum - 0.3) < 0.001)
    // materialized mixture: realized token shares approach targets
    val sample = TextAnalysis.mixtureSample(docs, shares)
    val realized = sample.groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val tot = realized.values.sum
    assert(math.abs(realized("src0") / tot - 0.5) < 0.15,
      s"realized shares ${realized.map { case (k, v) => k -> v / tot }}")
  }

  test("q71 LM score: in-corpus bigram model ranks gibberish worse than corpus-like text") {
    val corpus = Tables(spark, sfDir).documents.limit(300)
    val gibberish = Seq((999999L, "zq xv qqj zzk wxq vqz jxq qzz kvx zqj xqv", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val scored = TextAnalysis.lmScore(corpus.unionAll(gibberish))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bits_per_bigram")).toMap
    val corpusBits = scored.filter(_._1 != 999999L).values
    assert(scored(999999L) > corpusBits.sum / corpusBits.size + 1.0,
      s"gibberish ${scored(999999L)} not clearly above corpus mean ${corpusBits.sum / corpusBits.size}")
    // deterministic across runs
    val again = TextAnalysis.lmScore(corpus.unionAll(gibberish))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bits_per_bigram")).toMap
    assert(again == scored)
  }

  test("q66 decontamination flags docs overlapping the benchmark, spares clean ones") {
    val eight = "alpha beta gamma delta epsilon zeta eta theta" // exactly one 8-gram
    val train = Seq(
      (0L, s"intro words then $eight and a tail", "en", "s", 1L), // contains the benchmark 8-gram
      (1L, "completely unrelated content with many distinct words here", "en", "s", 1L),
      (2L, s"alpha beta gamma delta epsilon zeta eta NOT-theta filler filler", "en", "s", 1L) // 7-gram prefix only
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val bench = Seq((100L, s"$eight", "en", "b", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.decontaminate(train, bench)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Boolean]("contaminated"))).toMap
    assert(out(0L) == ((1L, true)), s"got ${out(0L)}")
    assert(out(1L) == ((0L, false)))
    assert(out(2L) == ((0L, false)), "7-token prefix wrongly flagged")
  }

  test("q64 training pipeline: packs exactly the dedup+repetition survivors") {
    val docs = Tables(spark, sfDir).documents
    val out = TextAnalysis.trainingPipeline(docs).collect()
    val packedTokens = out.map(_.getAs[Long]("bin_tokens")).sum
    // independent survivor computation from the verified stages
    val kept = TextAnalysis.dedupExact(docs).select("doc_id")
    val lowRep = TextAnalysis.repetitionScore(docs)
      .filter(col("dup_frac") <= 0.55).select("doc_id")
    val survivors = docs.join(kept, "doc_id").join(lowRep, "doc_id")
    val survivorTokens = survivors
      .select(size(split(col("text"), " ")).cast("long")).as[Long].collect().sum
    assert(packedTokens == survivorTokens, s"$packedTokens packed vs $survivorTokens survivor tokens")
    assert(packedTokens < docs.select(size(split(col("text"), " ")).cast("long")).as[Long].collect().sum,
      "pipeline filtered nothing — stages not applied")
  }

  test("LSH band autotuner: S-curve threshold tracks the target, monotone in threshold") {
    // 128-perm signature, target 0.42 -> the hand-picked (32, 4) default
    assert(Dedup.tuneLshBands(0.42, 128) == ((32, 4)))
    // the choice is never beaten by another (b, r) factorization
    Seq(0.3, 0.5, 0.7, 0.8, 0.9).foreach { t =>
      val (b, r) = Dedup.tuneLshBands(t, 128)
      assert(b * r == 128)
      val err = math.abs(math.pow(1.0 / b, 1.0 / r) - t)
      (1 to 128).filter(128 % _ == 0).foreach { b2 =>
        val r2 = 128 / b2
        val alt = math.abs(math.pow(1.0 / b2, 1.0 / r2) - t)
        assert(err <= alt + 1e-12, s"target $t: ($b,$r) err $err beaten by ($b2,$r2)")
      }
    }
    // higher target threshold never asks for more bands
    val bandsAt = Seq(0.3, 0.5, 0.7, 0.9).map(t => Dedup.tuneLshBands(t, 128)._1)
    assert(bandsAt == bandsAt.sorted.reverse, s"bands not monotone: $bandsAt")
  }

  test("stratified sampleBy: per-stratum fractions honored within tolerance, deterministic") {
    val docs = Tables(spark, sfDir).documents
    val fr = Map("en" -> 0.5, "de" -> 0.1)
    val s1 = TextAnalysis.stratifiedSample(docs, "lang", fr, seed = 7L)
    val s2 = TextAnalysis.stratifiedSample(docs, "lang", fr, seed = 7L)
    assert(s1.count() == s2.count(), "sampleBy not deterministic under fixed seed")
    val byLang = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.keySet.exists(l => !fr.contains(l)), "unrequested stratum sampled")
    fr.foreach { case (lang, f) =>
      val got = byLang.getOrElse(lang, 0L).toDouble / totals(lang)
      assert(math.abs(got - f) < 0.15, s"$lang: got rate $got want $f")
    }
  }

  test("q74 tfidf: corpus-wide words score zero, rare distinctive words rank first") {
    val docs = Seq(
      (0L, "spark spark spark common", "en", "s0", 24L),
      (1L, "duck duck common", "en", "s0", 16L),
      (2L, "unique common", "en", "s0", 13L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val top = TextAnalysis.tfidf(docs, topK = 1)
      .select("doc_id", "term", "tfidf").as[(Long, String, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // 'common' appears in every doc → idf = ln(1) = 0; never the top term
    assert(top(0L)._1 == "spark" && top(0L)._2 > 0)
    assert(top(1L)._1 == "duck")
    assert(top(2L)._1 == "unique")
    // tf weighting: 3 sparks in doc0 vs 2 ducks in doc1 (same idf)
    assert(top(0L)._2 > top(1L)._2)
  }

  test("q75 chunking: windows tile with overlap, tails shorten, content round-trips") {
    val text100 = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = Seq((7L, text100, "en", "s0", text100.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val chunks = TextAnalysis.chunkDocuments(docs, window = 64, stride = 48)
      .select("chunk_id", "chunk_len", "chunk_md5").as[(Long, Long, String)].collect()
    assert(chunks.map(c => (c._1, c._2)).toSeq == Seq((0L, 64L), (1L, 52L), (2L, 4L)))
    val md5OfFirst = java.security.MessageDigest.getInstance("MD5")
      .digest((1 to 64).map(i => s"w$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(chunks.head._3 == md5OfFirst, "chunk content fingerprint diverged")
  }

  test("pii redaction replaces planted emails/IPs/phones/numbers with labels") {
    val redacted = TextAnalysis.redact(lit(
      "mail a.user+x@example.co.uk from 10.0.255.3 or +44 (0)20 7946-0958 room 42"),
      TextAnalysis.defaultPiiPatterns)
    val got = Seq(1).toDF("x").select(redacted.as("r")).as[String].head()
    assert(got == "mail <EMAIL> from <IP> or <PHONE> room <NUM>", got)
  }
}
