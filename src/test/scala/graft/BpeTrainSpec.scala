package graft

import graft.operators.TextAnalysis
import graft.sources.Tables

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._
  lazy val t = Tables(spark, sfDir)

  private def corpus(wordFreqs: (String, Int)*) = {
    val text = wordFreqs.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    Seq((0L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("q273 learns the textbook merge sequence with exact weighted counts") {
    // hug*10 pug*5 pun*12 bun*4 hugs*5: pair counts round 1 are
    // ug=20 un=16 pu=17? no — pu=5+12=17 < ug=20; round 2 un=16; round 3 h+ug=15
    val docs = corpus("hug" -> 10, "pug" -> 5, "pun" -> 12, "bun" -> 4, "hugs" -> 5)
    val merges = TextAnalysis.bpeTrain(docs, numMerges = 3)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1L, "u", "g", "ug", 20L),
      (2L, "u", "n", "un", 16L),
      (3L, "h", "ug", "hug", 15L)), s"got $merges")
  }

  test("q273 greedy non-overlapping rewrite and early exhaustion") {
    // "aaa": round 1 counts the a+a pair twice (weight 2) but the greedy
    // rewrite merges LEFT-TO-RIGHT non-overlapping: aaa -> [aa, a];
    // round 2 merges aa+a; then nothing remains — the loop must stop
    // early with 2 merges even though 5 were requested
    val merges = TextAnalysis.bpeTrain(corpus("aaa" -> 1), numMerges = 5)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1L, "a", "a", "aa", 2L),
      (2L, "aa", "a", "aaa", 1L)), s"got $merges")
  }

  test("q273 tie-break is deterministic: equal counts merge the lexicographically least pair") {
    // "ab" and "cd" both appear twice — (a,b) < (c,d) must win round 1
    val merges = TextAnalysis.bpeTrain(corpus("ab" -> 2, "cd" -> 2), numMerges = 1)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(merges == Seq((1L, "a", "b", "ab", 2L)))
  }

  test("q273 on the driver corpus: full rank sequence, positive weighted counts") {
    val merges = TextAnalysis.bpeTrain(t.documents, numMerges = 10).collect()
    assert(merges.map(_.getAs[Long]("rank")).toSeq == (1L to 10L),
      "templated corpus has plenty of pairs — all 10 requested merges must be learned")
    assert(merges.forall(_.getAs[Long]("weighted_count") > 0))
    // learned merges are distinct symbols
    val sym = merges.map(_.getAs[String]("merged"))
    assert(sym.distinct.length == sym.length)
  }
}
