package graft

import graft.operators.TextAnalysis
import graft.sources.Tables
import graft.streaming.StreamingTokenDrift
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** stream_token_drift: the incrementally maintained token-count table +
  * frozen baseline reproduce the batch q359 report exactly through the
  * shared kernel, and a replayed batch cannot double-count. */
class StreamingTokenDriftSpec extends SparkSpec {
  lazy val docs = Tables(spark, sfDir).documents

  test("incremental batches + baseline ≡ the batch parity-split report; replay idempotent") {
    val table = Files.createTempDirectory("graft-tdrift").toString
    val baseline = Files.createTempDirectory("graft-tdrift-base").toString
    // side B (baseline) = odd doc_ids, side A (live) = even — exactly
    // q359's parity split, so the streamed report must equal the batch one
    val ref = docs.filter(col("doc_id") % 2 === 1)
    val live = docs.filter(col("doc_id") % 2 === 0)

    StreamingTokenDrift.writeBaseline(ref, baseline)
    (0 until 3).foreach { b =>
      StreamingTokenDrift.updateCountTable(
        live.filter(col("doc_id") % 6 === b * 2), table, batchId = b)
    }
    // replay batch 1 — overwrites its own slice only
    StreamingTokenDrift.updateCountTable(
      live.filter(col("doc_id") % 6 === 2), table, batchId = 1)

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("token"), r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b"),
        r.getAs[Double]("log2_ratio"), r.getAs[Double]("chi2"))
    val streamed = StreamingTokenDrift.driftReport(spark, table, baseline)
      .collect().map(key).toSet
    val batch = TextAnalysis.tokenDrift(docs).collect().map(key).toSet
    assert(streamed == batch, "streamed drift diverges from the batch q359 report")
    assert(streamed.nonEmpty)
  }

  test("a token unseen in the baseline still reports, with zero-filled counts") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-tdrift2").toString
    val baseline = Files.createTempDirectory("graft-tdrift2-base").toString
    val refDocs = Seq((1L, ("base " * 30).trim, "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val liveDocs = Seq((2L, ("novel " * 30).trim, "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    StreamingTokenDrift.writeBaseline(refDocs, baseline)
    StreamingTokenDrift.updateCountTable(liveDocs, table, batchId = 0)
    val out = StreamingTokenDrift.driftReport(spark, table, baseline, minCount = 10)
      .collect().map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b"))).toMap
    assert(out("novel") == ((30L, 0L)), s"live-only token zero-fills baseline: $out")
    assert(out("base") == ((0L, 30L)), s"baseline-only token zero-fills live: $out")
  }
}
