package graft

import graft.operators.Classify
import graft.streaming.StreamingClassify
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** stream_classify: the served model's streamed predictions reproduce
  * the q320 batch confusion matrix exactly, with ZERO streaming state
  * (pure map — the serving path adds no shuffle and no watermark). */
class StreamingClassifySpec extends SparkSpec {

  test("streamed holdout confusion ≡ q320 batch confusion across 3 file slices, stateless") {
    val t = Tables(spark, sfDir)
    val docs = t.documents
    val model = StreamingClassify.trainModel(docs)

    // holdout docs arrive as 3 separate files → 3 micro-batches
    val in = Files.createTempDirectory("graft-cls").toString
    val holdout = docs.filter(col("doc_id") % 5 === 0).cache()
    (0 until 3).foreach { s =>
      val tmp = Files.createTempDirectory(s"graft-cls-s$s").toString
      holdout.filter(col("doc_id") % 3 === s)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(in, f"slice$s%02d.parquet")
      Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + s * 60000L)
    }
    val base = spark.read.parquet(in)
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = StreamingClassify.classify(spark, stream, model)
      .writeStream.format("memory").queryName("cls_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.lastProgress.stateOperators.isEmpty,
      "serving must be stateless — no state operators in the streaming plan")

    val streamed = spark.sql(
      """SELECT true_lang, pred_lang, count(*) AS n_docs
        |FROM cls_test GROUP BY 1, 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Classify.naiveBayesLang(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_docs")).toMap
    assert(streamed == batch,
      s"streamed serving diverged from the batch classifier:\n  stream=$streamed\n  batch=$batch")
    holdout.unpersist(blocking = false)
  }

  test("model export is holdout-blind and vocabulary-sized") {
    val t = Tables(spark, sfDir)
    val model = StreamingClassify.trainModel(t.documents)
    val trainVocab = t.documents.filter(col("doc_id") % 5 =!= 0)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "").distinct().count()
    assert(model.termLogp.size.toLong == trainVocab, "one vector per TRAIN term")
    assert(model.classes.map(_.label).toSeq == model.classes.map(_.label).toSeq.sorted,
      "classes pre-sorted so first-max argmax matches the (score desc, label asc) tie-break")
    // priors are a probability distribution
    val mass = model.classes.map(c => math.exp(c.logPrior)).sum
    assert(math.abs(mass - 1.0) < 1e-9)
  }
}
