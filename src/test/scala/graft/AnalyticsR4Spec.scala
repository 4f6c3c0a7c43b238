package graft

import graft.operators.{EventAnalytics, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Semantic ground truth for the round-4 family: sketch-backed
  * conversion latency (q145), PCA spectrum/whitening (q144), and
  * PCA-compressed ANN (q146). */
class AnalyticsR4Spec extends SparkSpec {
  import spark.implicits._
  lazy val t = Tables(spark, sfDir)

  private def unit(v: Array[Double]): Array[Float] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat)
  }

  test("q144: projected variance reproduces each eigenvalue; spectrum descends; planted rank captured") {
    // rank-3 planted structure in 16 dims + small deterministic noise
    val d = 16
    val rows = (0 until 120).map { i =>
      val c = i % 3
      val amp = 1.0 + 0.3 * math.sin(i * 13)
      val base = Array.tabulate(d)(j => if (j == c * 5) amp else 0.0)
      val noise = Array.tabulate(d)(j => 0.02 * math.sin(i * 31 + j * 7))
      (i.toLong, base.zip(noise).map { case (a, b) => a + b }.map(_.toFloat).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = Similarity.pcaVariance(emb, nDims = d, k = 8).collect()
    assert(out.length == 8)
    // self-certification: Var(projection onto w_c) == λ_c
    out.foreach { r =>
      val ev = r.getAs[Double]("eigenvalue"); val pv = r.getAs[Double]("projected_var")
      assert(math.abs(ev - pv) <= math.max(0.01 * math.abs(ev), 2e-4),
        s"component ${r.getLong(0)}: eigenvalue $ev vs projected variance $pv")
    }
    val evs = out.map(_.getAs[Double]("eigenvalue"))
    evs.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9, "spectrum not descending") }
    // reconstruction error of the top-3 cut is the dropped-eigenvalue
    // mass: planted rank 3 + tiny noise => > 99% explained
    val explained3 = out.take(3).map(_.getAs[Double]("explained_frac")).sum
    assert(explained3 > 0.99, s"top-3 explain only $explained3 of planted rank-3 data")
  }

  test("q144: k-dim PCA reconstruction error is bounded by the dropped eigenvalue mass") {
    val d = 16
    val rows = (0 until 90).map { i =>
      val c = i % 3
      val base = Array.tabulate(d)(j => if (j == c * 5) 1.0 + 0.2 * math.cos(i * 7) else 0.0)
      val noise = Array.tabulate(d)(j => 0.02 * math.sin(i * 29 + j * 11))
      (i.toLong, base.zip(noise).map { case (a, b) => a + b }.map(_.toFloat).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val model = Similarity.pcaFit(emb, nDims = d, k = 3)
    // E||x - reconstruct(x)||² == Σ_{c>k} λ_c (the PCA optimality identity)
    val droppedMass = model.eigenvalues.drop(3).sum
    val vecs = emb.select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val mse = vecs.map { x =>
      val y = model.components.map { w =>
        w.indices.map(i => w(i) * (x(i) - model.means(i))).sum
      }
      val rec = Array.tabulate(d)(i =>
        model.means(i) + model.components.indices.map(c => model.components(c)(i) * y(c)).sum)
      x.indices.map(i => { val e = x(i) - rec(i); e * e }).sum
    }.sum / vecs.length
    assert(math.abs(mse - droppedMass) <= math.max(0.02 * droppedMass, 1e-6),
      s"mean reconstruction error $mse != dropped eigenvalue mass $droppedMass")
    assert(mse < 0.01, s"rank-3 cut reconstruction error $mse too large")
  }

  test("q146: PCA compress-then-rerank equals brute force on planted clusters") {
    // same regime as the q125 spec: high within-cluster cosine, and the
    // corpus genuinely low-rank — exactly where a learned compressor
    // must recover the exact top-k with a modest rerank margin
    val d = 64
    val rows = (0 until 63).map { i =>
      val c = i % 3
      val base = Array.tabulate(d)(j => if (j == c * 20) 1.0 else 0.0)
      val noise = Array.tabulate(d)(j => 0.05 * math.cos(i * 17 + j * 3))
      (i.toLong, unit(base.zip(noise).map { case (a, b) => a + b }).toSeq, c)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val exact = Similarity.annBruteForce(emb).collect().toSeq
    val pca   = Similarity.annPcaReduce(emb, rerank = 20).collect().toSeq
    assert(pca == exact, "PCA-projected rerank diverges from the exact top-k on planted clusters")
  }

  test("q144/q146 run on the embeddings table and are deterministic") {
    val a = Similarity.pcaVariance(t.embeddings).collect().toSeq
    val b = Similarity.pcaVariance(t.embeddings).collect().toSeq
    assert(a == b, "pcaVariance not deterministic across runs")
    assert(a.nonEmpty)
    val ann = Similarity.annPcaReduce(t.embeddings)
    assert(ann.count() > 0)
  }

  test("q145: t-digest latency percentiles land within 2% of exact q103, day by day") {
    val exact = EventAnalytics.conversionLatency(t.events).collect()
      .map(r => r.getAs[String]("day") ->
        (r.getAs[Long]("n_conversions"),
         r.getAs[Double]("median_latency_s"),
         r.getAs[Double]("p90_latency_s"))).toMap
    val sketch = EventAnalytics.conversionLatencySketch(t.events).collect()
    assert(sketch.nonEmpty, "sketch variant returned no days")
    assert(sketch.map(_.getAs[String]("day")).toSet == exact.keySet,
      "sketch and exact variants disagree on the day set")
    sketch.foreach { r =>
      val day = r.getAs[String]("day")
      val (en, em, ep) = exact(day)
      assert(r.getAs[Long]("n_conversions") == en, s"$day conversion count diverged")
      val sm = r.getAs[Double]("median_latency_s")
      val sp = r.getAs[Double]("p90_latency_s")
      assert(math.abs(sm - em) <= math.max(0.02 * em, 1e-3), s"$day median: sketch $sm vs exact $em")
      assert(math.abs(sp - ep) <= math.max(0.02 * ep, 1e-3), s"$day p90: sketch $sp vs exact $ep")
    }
  }

  test("q148: per-stratum cutoffs and kept counts match a driver-side exact recount") {
    import graft.operators.TextAnalysis
    import graft.functions.TextFunctions.{tokens, stopCount}
    import graft.functions.PortableRound.round
    val keepFrac = 0.25
    val got = TextAnalysis.calibratedCuration(t.documents, keepFrac).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("cutoff"), r.getAs[Long]("n_total"), r.getAs[Long]("n_kept")))
      .toMap
    // ground truth: collect every (stratum, quality) and redo the exact
    // continuous-percentile + >= filter in plain Scala
    val toks = tokens(col("text"))
    val scored = t.documents
      .select(
        col("lang"), col("source"),
        size(toks).cast("long").as("n_tok"),
        stopCount(toks).cast("long").as("n_stop"))
      .filter(col("n_tok") > 0)
      .withColumn("q",
        round((lit(1.0) - col("n_stop").cast("double") / col("n_tok")) *
          least(lit(1.0), col("n_tok").cast("double") / 50.0), 4))
      .select("lang", "source", "q").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Double]("q")))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    assert(scored.keySet == got.keySet, "stratum sets differ")
    scored.foreach { case (k, qs) =>
      val pos = (1.0 - keepFrac) * (qs.length - 1)
      val (lo, hi) = (qs(pos.toInt), qs(math.ceil(pos).toInt))
      val cut = lo + (pos - pos.toInt) * (hi - lo)
      val (gotCut, nTotal, nKept) = got(k)
      assert(nTotal == qs.length.toLong, s"$k total ${qs.length} vs $nTotal")
      assert(math.abs(gotCut - cut) <= 1e-4 + 1e-9, s"$k cutoff $cut vs $gotCut")
      val expectKept = qs.count(_ >= cut)
      assert(nKept == expectKept.toLong, s"$k kept $expectKept vs $nKept")
      assert(nKept >= 1 && nKept <= nTotal)
    }
  }

  test("q149: bucket-decomposed budget selection ≡ the naive per-source running sum") {
    import graft.operators.TextAnalysis
    import graft.functions.TextFunctions.tokens
    import org.apache.spark.sql.expressions.Window
    val budget = 600L
    val got = TextAnalysis.tokenBudgetSelect(t.documents, budget).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy("source").orderBy("priority", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = t.documents
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        md5(col("doc_id").cast("string")).as("priority"))
      .filter(col("n_tok") > 0)
      .withColumn("cum", sum("n_tok").over(w))
      .filter(col("cum") <= budget)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(got == naive, s"bucket path diverges: only-got ${got -- naive}, only-naive ${naive -- got}")
  }

  test("q149: every source fills its budget maximally — no unkept doc could still fit") {
    import graft.operators.TextAnalysis
    import graft.functions.TextFunctions.tokens
    val budget = 600L
    val kept = TextAnalysis.tokenBudgetSelect(t.documents, budget).collect()
    val keptTok = kept.groupBy(_.getString(0)).map { case (s, rs) =>
      s -> rs.map(_.getAs[Long]("n_tok")).sum
    }
    keptTok.foreach { case (s, tot) => assert(tot <= budget, s"$s over budget: $tot") }
    // maximality: the FIRST unkept doc in priority order must overflow
    val keptIds = kept.map(r => (r.getString(0), r.getLong(1))).toSet
    val all = t.documents
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        md5(col("doc_id").cast("string")).as("priority"))
      .filter(col("n_tok") > 0)
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getString(3)))
    all.groupBy(_._1).foreach { case (src, docs) =>
      docs.sortBy(d => (d._4, d._2))
        .find(d => !keptIds.contains((src, d._2)))
        .foreach { firstOut =>
          assert(keptTok.getOrElse(src, 0L) + firstOut._3 > budget,
            s"$src: doc ${firstOut._2} (${firstOut._3} tok) still fits")
        }
    }
  }
}
