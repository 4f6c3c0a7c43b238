package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.round

/** Multimodal column plumbing (SURVEY.md §2 q60–q61).
  *
  * Media are opaque `binary` payloads + a typed metadata struct. The
  * decode step is where a real codec (image/audio lib) would run; those
  * libs aren't in this container, so `fakeDecodeFrames` is a clearly
  * marked deterministic stand-in — but the Spark-side shape is the real
  * one: binary column in, `mapPartitions` batch iteration (amortizes
  * per-partition codec init, the same batching contract a Pandas UDF
  * would have), typed rows out.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct to each document. Payload
    * is the utf-8 bytes of the text (a deterministic stand-in for real
    * media bytes). */
  def withPayload(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("source"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("image").as("modality"),
        lit(64).as("width_px"),
        lit(64).as("height_px"),
        lit(0).as("sample_rate_hz")).as("media_meta"))

  /** q60: byte-level stats per source over the binary payload. */
  def metaStats(documents: DataFrame): DataFrame =
    withPayload(documents)
      .select(col("source"), octet_length(col("payload")).as("nb"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("nb"), 4).as("avg_bytes"),
        round(sum(col("nb").cast("double")), 4).as("total_bytes"),
        max(col("nb")).cast("long").as("max_bytes"))
      .orderBy("source")

  final case class FrameInfo(doc_id: Long, n_frames: Long, sampled_frames: Long, first_frame_checksum: Long)

  final case class MediaFeature(doc_id: Long, width_px: Int, height_px: Int, feature: Array[Float])

  /** q62: "decode → resize → feature-extract" over binary payloads. STUB
    * CODEC: the resize just reports clamped target dims and the feature
    * vector is a deterministic byte-histogram embedding — a real build
    * swaps in an image library + model; the pipeline shape (binary in,
    * per-partition batching where the model would be loaded once, fixed-
    * width float vector out, ready for graft.operators.Similarity) is the
    * production contract. */
  def featureExtract(spark: SparkSession, documents: DataFrame, dim: Int = 16, targetPx: Int = 64): Dataset[MediaFeature] = {
    import spark.implicits._
    withPayload(documents)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // model/codec handles would be initialized here, once per partition
        it.map { case (id, payload) =>
          val hist = new Array[Float](dim)
          payload.foreach(b => hist((b & 0xFF) % dim) += 1f)
          val n = math.max(1, payload.length)
          var i = 0
          while (i < dim) { hist(i) /= n; i += 1 }
          MediaFeature(id, math.min(targetPx, 4096), math.min(targetPx, 4096), hist)
        }
      }
  }

  /** q63: the multimodal → similarity handoff — extracted feature
    * vectors flow straight into cosine ANN ranking, proving the
    * pipeline contract end-to-end: binary payload → per-partition
    * feature extraction (q62) → `array<float>` column → the same
    * codegen'd vector math the text-embedding path uses (q51). The
    * feature histograms are l1-normalized, so ranking uses true cosine
    * (single-pass native expression), not a unit-norm dot shortcut. */
  def featureSimilarity(
      spark: SparkSession,
      documents: DataFrame,
      numQueries: Int = 3,
      k: Int = 5): DataFrame = {
    import graft.functions.VectorFunctions.cosine
    import org.apache.spark.sql.expressions.Window
    val feats = featureExtract(spark, documents).toDF().select(col("doc_id"), col("feature"))
    val q = feats.filter(col("doc_id") < numQueries)
      .select(col("doc_id").as("qid"), col("feature").as("qf"))
    val c = feats.filter(col("doc_id") >= numQueries)
      .select(col("doc_id").as("cid"), col("feature").as("cf"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    c.crossJoin(broadcast(q))
      .withColumn("cos", cosine(col("qf"), col("cf")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 4).as("cosine"))
      .orderBy("qid", "rk")
  }

  /** q61: "decode" + frame-sample each payload. STUB CODEC: frames are
    * fixed 16-byte windows and the checksum a byte sum — a real build
    * swaps `decode` for an image/video library call; everything around
    * it (partition iteration, batch shape, typed output) is production
    * shape. */
  def frameExtract(spark: SparkSession, documents: DataFrame, frameBytes: Int = 16, sampleEvery: Int = 4): Dataset[FrameInfo] = {
    import spark.implicits._
    withPayload(documents)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init site (codec handles would be opened here, once)
        def decode(bytes: Array[Byte]): Iterator[Array[Byte]] = bytes.grouped(frameBytes)
        it.map { case (id, payload) =>
          val frames  = decode(payload).toArray
          val sampled = frames.indices.count(_ % sampleEvery == 0)
          val checksum = if (frames.isEmpty) 0L else frames.head.foldLeft(0L)((a, b) => a + (b & 0xFF))
          FrameInfo(id, frames.length.toLong, sampled.toLong, checksum)
        }
      }
  }
}
