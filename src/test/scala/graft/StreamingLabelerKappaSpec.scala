package graft

import graft.operators.TextAnalysis
import graft.sources.Tables
import graft.streaming.StreamingLabelerKappa
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** stream_labeler_kappa: incrementally accumulated 2×2 contingency
  * slices reproduce the batch q374 report BIT-EXACTLY through the
  * shared kernel (integer cells, no float drift), and a replayed batch
  * cannot double-count. */
class StreamingLabelerKappaSpec extends SparkSpec {
  lazy val docs = Tables(spark, sfDir).documents

  test("incremental batches ≡ the batch q374 report, bit-exact; replay idempotent") {
    val table = Files.createTempDirectory("graft-kappa").toString
    (0 until 3).foreach { b =>
      StreamingLabelerKappa.updateCellTable(
        docs.filter(col("doc_id") % 3 === b), table, batchId = b)
    }
    // replay batch 1 — overwrites its own slice only
    StreamingLabelerKappa.updateCellTable(
      docs.filter(col("doc_id") % 3 === 1), table, batchId = 1)

    val streamed = StreamingLabelerKappa.agreementReport(spark, table).collect().head
    val batch = TextAnalysis.labelerKappa(docs).collect().head
    assert(streamed == batch,
      s"streamed agreement diverges from batch q374:\n$streamed\n$batch")
    assert(streamed.getAs[Long]("n_docs") == docs.count())
  }

  test("agreement shifts as low-quality docs arrive — the monitoring signal moves") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-kappa2").toString
    val agreeing = Seq.tabulate(4)(i =>
      ((i + 1).toLong, Seq.fill(70)("w").mkString(" "), "en", "s", 500L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    StreamingLabelerKappa.updateCellTable(agreeing, table, batchId = 0)
    val k0 = StreamingLabelerKappa.agreementReport(spark, table)
      .collect().head.getAs[Long]("n_both")
    // a batch the raters DISAGREE on: long char count, few tokens
    val disagreeing = Seq.tabulate(4)(i =>
      ((10 + i).toLong, "w w w", "en", "s", 500L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    StreamingLabelerKappa.updateCellTable(disagreeing, table, batchId = 1)
    val r = StreamingLabelerKappa.agreementReport(spark, table).collect().head
    assert(k0 == 4 && r.getAs[Long]("n_both") == 4 && r.getAs[Long]("n_a_only") == 4)
    assert(r.getAs[Double]("p_observed") == 0.5, r.toString)
  }
}
