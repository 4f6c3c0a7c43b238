package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Model SERVING at ingest — the streaming dual of the q320 batch
  * Naive Bayes: the model is trained offline (the same vocabulary-sized
  * aggregates q320 computes), exported as a compact driver-side value,
  * and applied to the document stream as a STATELESS map — the shape
  * real classifier serving takes inside an ingest pipeline (language
  * routing, quality gating, safety filtering before landing).
  *
  * Scale anatomy:
  *  - the model is vocabulary × classes log-likelihoods plus per-class
  *    priors/floors — megabytes for a word-level vocab even off 100 TB
  *    of training text, so collecting it to the driver and shipping it
  *    in the task closure is the bounded-by-design idiom (BPE/vocab
  *    table discipline), not a driver-side loop over data;
  *  - scoring is one typed `map` per document row: fold the token
  *    stream once against the broadcast model, argmax over ≤#classes
  *    accumulators. No shuffle, no state, no watermark — each document
  *    is classified in the micro-batch it arrives in, and the SAME
  *    code path classifies a batch DataFrame (batch/stream parity is
  *    asserted in the spec against q320's confusion matrix).
  */
object StreamingClassify {

  /** Per-class slice of the model: label, ln prior, and the "floor"
    * log-likelihood ln(α/(N_c+αV)) an unseen (class, term) pair
    * contributes. */
  final case class ClassInfo(label: String, logPrior: Double, floor: Double)

  /** Compact serving model: class table + term → per-class
    * log-likelihood vectors (classes order = `classes`; absent
    * (class, term) pairs already hold the class floor, so scoring is a
    * pure vector add per token). */
  final case class NbModel(classes: Array[ClassInfo], termLogp: Map[String, Array[Double]]) {
    def score(text: String): Array[Double] = {
      val acc = Array.tabulate(classes.length)(i => classes(i).logPrior)
      val it = text.split(" ").iterator.filter(_.nonEmpty)
      while (it.hasNext) {
        termLogp.get(it.next()) match {
          case Some(v) =>
            var i = 0
            while (i < acc.length) { acc(i) += v(i); i += 1 }
          case None =>
            var i = 0
            while (i < acc.length) { acc(i) += classes(i).floor; i += 1 }
        }
      }
      acc
    }
    /** argmax with the q320 tie-break (score desc, label asc — labels
      * are pre-sorted, so first max wins). */
    def predict(text: String): String = {
      val s = score(text)
      var best = 0
      var i = 1
      while (i < s.length) { if (s(i) > s(best)) best = i; i += 1 }
      classes(best).label
    }
  }

  final case class DocIn(doc_id: Long, lang: String, text: String)
  final case class Prediction(doc_id: Long, true_lang: String, pred_lang: String)

  /** Train the q320 model on the %5≠0 split and export it driver-side.
    * The aggregates are exactly [[graft.operators.Classify]]'s (same
    * smoothing, same floors), collected at vocabulary grain — bounded
    * by the word-level vocab, not the corpus. */
  def trainModel(documents: DataFrame, alpha: Double = 1.0): NbModel = {
    val tok = documents
      .filter(col("doc_id") % 5 =!= 0)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val cnts = tok.groupBy("lang", "term").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val docCounts = documents.filter(col("doc_id") % 5 =!= 0)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val labels = docCounts.keys.toArray.sorted
    val nTrain = docCounts.values.sum.toDouble
    val vocab = cnts.keys.map(_._2).toSet
    val v = vocab.size.toDouble
    val nTok = labels.map(l => cnts.collect { case ((c, _), n) if c == l => n }.sum.toDouble)
    val denom = nTok.map(_ + alpha * v)
    val classes = labels.zipWithIndex.map { case (l, i) =>
      ClassInfo(l, math.log(docCounts(l) / nTrain), math.log(alpha / denom(i)))
    }
    val termLogp = vocab.iterator.map { t =>
      t -> labels.zipWithIndex.map { case (l, i) =>
        cnts.get((l, t)) match {
          case Some(n) => math.log((n + alpha) / denom(i))
          case None    => classes(i).floor
        }
      }
    }.toMap
    NbModel(classes, termLogp)
  }

  /** Classify a (streaming or batch) document frame with a trained
    * model — one stateless typed map, no shuffle, append-mode safe. */
  def classify(spark: SparkSession, docs: DataFrame, model: NbModel): Dataset[Prediction] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("lang"), col("text")).as[DocIn]
      .map(d => Prediction(d.doc_id, d.lang, model.predict(d.text)))
  }
}
