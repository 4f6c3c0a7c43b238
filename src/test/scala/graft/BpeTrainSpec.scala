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

  test("q279 encode round-trips the trained segmentation: hand fertility") {
    // corpus: hug*10 pug*5 pun*12 bun*4 hugs*5 (the q273 fixture).
    // 3 merges: ug, un, hug. Encodings: hug→[hug] (1), pug→[p,ug] (2),
    // pun→[p,un] (2), bun→[b,un] (2), hugs→[hug,s] (2).
    // tokens = 10*1 + 5*2 + 12*2 + 4*2 + 5*2 = 62; words = 36;
    // chars = 10*3 + 5*3 + 12*3 + 4*3 + 5*4 = 113
    val docs = corpus("hug" -> 10, "pug" -> 5, "pun" -> 12, "bun" -> 4, "hugs" -> 5)
    val r = TextAnalysis.bpeEncode(docs, numMerges = 3).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_words") == 36L)
    assert(r(0).getAs[Long]("n_bpe_tokens") == 62L)
    assert(r(0).getAs[Double]("fertility") == math.floor(62.0 / 36.0 * 10000 + 0.5) / 10000)
    assert(r(0).getAs[Double]("chars_per_token") == math.floor(113.0 / 62.0 * 10000 + 0.5) / 10000)
  }

  test("q279 with zero merges degenerates to character tokenization") {
    val docs = corpus("ab" -> 2, "c" -> 1)
    val r = TextAnalysis.bpeEncode(docs, numMerges = 0).collect()
    // ab→2 chars ×2 + c→1 char = 5 tokens over 3 words
    assert(r(0).getAs[Long]("n_bpe_tokens") == 5L)
    assert(r(0).getAs[Long]("n_words") == 3L)
  }

  test("q279 on the driver corpus: fertility falls as merges grow") {
    val few = TextAnalysis.bpeEncode(t.documents, numMerges = 2).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("fertility")).toMap
    val many = TextAnalysis.bpeEncode(t.documents, numMerges = 10).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("fertility")).toMap
    assert(few.keySet == many.keySet)
    // more merges can only shorten (or keep) every word's segmentation
    many.foreach { case (src, f) => assert(f <= few(src), s"$src: $f > ${few(src)}") }
    assert(many.values.forall(f => f >= 1.0))
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
