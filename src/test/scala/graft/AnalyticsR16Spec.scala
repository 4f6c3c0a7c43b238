package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Round-11 additions: sampled threshold sweep (q423), duplication
  * profile (q424), dup source-span (q425) — planted-corpus ground
  * truths beside the DuckDB oracles. */
class AnalyticsR16Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toSeq.map { case (id, text, src) => (id, text, "en", src) }
      .toDF("doc_id", "text", "lang", "source")

  // ------------------------------------------------------------- q423
  test("q423: the sampled sweep equals the exact sweep run on the sample membership") {
    val rows = (1L to 40L).map { i =>
      val text =
        if (i % 4 == 0) "alpha beta gamma delta epsilon zeta" + (i % 8)
        else s"unique${i}_a unique${i}_b unique${i}_c unique${i}_d"
      (i, text, s"s${i % 3}")
    }
    val d = docs(rows: _*)
    val sampled = Dedup.thresholdSweepSampled(d).collect().map(_.toString).sorted
    val manual = Dedup.thresholdSweep(
      d.filter(substring(md5(col("doc_id").cast("string")), 1, 1)
        .isInCollection(Seq("0", "1", "2", "3")))).collect().map(_.toString).sorted
    assert(sampled.sameElements(manual),
      "sampled sweep must be the exact sweep over the md5 sub-corpus")
    // the membership predicate is deterministic: re-running selects the
    // same sub-corpus (portability is the q55 idiom, spec'd there)
    val again = Dedup.thresholdSweepSampled(d).collect().map(_.toString).sorted
    assert(again.sameElements(sampled))
  }

  // ------------------------------------------------------------- q424
  test("q424: duplication profile reports exact cluster-size histogram with doc and token shares") {
    // plant: 3 singletons (4 tokens each), one pair (2 docs x 3 tokens),
    // one triple (3 docs x 2 tokens). Whitespace variants must collapse
    // (fingerprint normalizes).
    val d = docs(
      (1L, "one two three four", "a"),
      (2L, "five six seven eight", "a"),
      (3L, "nine ten eleven twelve", "b"),
      (4L, "pair text here", "a"),
      (5L, "PAIR   text    here", "b"), // normalization collapses this
      (6L, "tri ple", "a"),
      (7L, "tri ple", "a"),
      (8L, "tri  ple", "b"))
    val out = Dedup.duplicationProfile(d).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L).getAs[Long]("n_clusters") === 3L)
    assert(out(1L).getAs[Long]("n_docs") === 3L)
    assert(out(2L).getAs[Long]("n_clusters") === 1L)
    assert(out(3L).getAs[Long]("n_docs") === 3L)
    // shares: docs 3/8, 2/8, 3/8; tokens 12/24, 6/24, 6/24
    assert(out(1L).getAs[Double]("doc_share") === 0.375)
    assert(out(2L).getAs[Double]("doc_share") === 0.25)
    assert(out(1L).getAs[Double]("token_share") === 0.5)
    assert(out(3L).getAs[Double]("token_share") === 0.25)
  }

  // ------------------------------------------------------------- q425
  test("q425: dup span separates re-crawls (within-source) from syndication (cross-source)") {
    val d = docs(
      (1L, "recrawl body", "s0"),
      (2L, "recrawl body", "s0"),    // within-source pair
      (3L, "syndicated piece", "s0"),
      (4L, "syndicated piece", "s1"),
      (5L, "syndicated piece", "s2"), // cross-source triple
      (6L, "unique doc", "s0"))       // singleton: excluded
    val out = Dedup.dupSpanSources(d).collect()
      .map(r => r.getAs[String]("span") -> r).toMap
    assert(out.keySet === Set("unique", "within_source", "cross_source"))
    assert(out("within_source").getAs[Long]("n_clusters") === 1L)
    assert(out("within_source").getAs[Long]("n_redundant") === 1L)
    assert(out("cross_source").getAs[Long]("n_docs") === 3L)
    assert(out("cross_source").getAs[Long]("n_redundant") === 2L)
    // the clean remainder reads as unique, never as an empty frame
    assert(out("unique").getAs[Long]("n_clusters") === 1L)
    assert(out("unique").getAs[Long]("n_redundant") === 0L)
  }
}
