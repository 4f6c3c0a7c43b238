package graft

import graft.operators.TextAnalysis
import graft.sources.Tables
import graft.streaming.StreamingNovelty
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** stream_novelty: the live first-seen curve is ROW-IDENTICAL to the
  * batch q406 report on the same bin boundaries, and a replayed batch
  * can neither double-claim nor steal first-seen fingerprints. */
class StreamingNoveltySpec extends SparkSpec {
  lazy val docs = Tables(spark, sfDir).documents

  test("incremental batches ≡ the batch q406 curve row-for-row; replay idempotent") {
    val root = Files.createTempDirectory("graft-novelty").toString
    // 4 batches on exactly q406's doc_id bin boundaries
    val span = docs.agg(max("doc_id") + 1).head().getLong(0)
    (0 until 4).foreach { b =>
      StreamingNovelty.updateSeenTable(
        docs.filter(floor(col("doc_id") * 4 / lit(span)) === b), root, batchId = b)
    }
    // replay batch 2 — must overwrite its own slice exactly
    StreamingNovelty.updateSeenTable(
      docs.filter(floor(col("doc_id") * 4 / lit(span)) === 2), root, batchId = 2)

    val streamed = StreamingNovelty.noveltyReport(spark, root).collect().toSeq
    val batch = TextAnalysis.noveltyCurve(docs, nBins = 4).collect().toSeq
    assert(streamed == batch,
      s"streamed curve diverges from batch q406:\n$streamed\n$batch")
    assert(streamed.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }

  test("an all-duplicate batch reads novelty 0 and leaves the seen set unchanged") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-novelty2").toString
    val b0 = Seq((0L, "alpha content"), (1L, "beta content")).toDF("doc_id", "text")
    val b1 = Seq((2L, "alpha content"), (3L, "beta content")).toDF("doc_id", "text")
    StreamingNovelty.updateSeenTable(b0, root, 0)
    StreamingNovelty.updateSeenTable(b1, root, 1)
    val rows = StreamingNovelty.noveltyReport(spark, root).collect()
    assert(rows(0).getAs[Double]("novelty_share") == 1.0)
    assert(rows(1).getAs[Double]("novelty_share") == 0.0, rows.mkString(","))
    assert(rows(1).getAs[Double]("cum_distinct_share") == 0.5)
  }
}
