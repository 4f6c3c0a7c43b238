package graft.streaming

import graft.operators.AnnGraph
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** stream_ann_index: a continuously-maintained graph-ANN index — the
  * streaming dual of q266, closing the loop between the ingest model
  * and the similarity stack: each micro-batch of new vectors folds into
  * the k-NN graph with [[AnnGraph.nnDescentInsert]] (new-batch-
  * proportional descent, never a rebuild), and the index UPDATE is
  * published as a changelog delta under `ver=<batchId>`:
  *
  * {{{
  *   <indexDir>/vectors/ver=B/...   the corpus, append-only by batch
  *   <indexDir>/graph/ver=B/...     changed neighborhoods only
  * }}}
  *
  * Idempotency is the sink's own idiom: both writes are dynamic
  * partition overwrites keyed on the DETERMINISTIC streaming batch id,
  * so a replayed micro-batch overwrites exactly its own files — the
  * index converges to exactly-once state with no rollback bookkeeping.
  * A delta holds ONLY the neighborhoods the batch touched (the new
  * nodes, plus old nodes that adopted a new neighbor — the only old
  * rows [[AnnGraph.nnDescentInsert]] can change); [[readIndex]] merges
  * by latest version per node. At 100 TB the per-batch write is
  * touched-neighborhood-sized, the read-side merge is one window over
  * the (k·n)-row graph, and periodic delta compaction is the same
  * maintenance job every changelog table here already has. */
object StreamingAnnIndex {

  private def vectorsDir(indexDir: String) = s"$indexDir/vectors"
  private def graphDir(indexDir: String)   = s"$indexDir/graph"

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The merged current graph: each node's latest published
    * neighborhood. */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val w = Window.partitionBy("id")
    spark.read.option("basePath", graphDir(indexDir)).parquet(graphDir(indexDir))
      .withColumn("__mx", max("ver").over(w))
      .filter(col("ver") === col("__mx"))
      .select("id", "nb", "sim")
  }

  /** All vectors ingested so far. */
  def readVectors(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.option("basePath", vectorsDir(indexDir)).parquet(vectorsDir(indexDir))
      .select("vec_id", "embedding")

  /** Fold one micro-batch of (vec_id, embedding) into the index.
    * Replay-idempotent per `batchId`. Returns the number of node
    * neighborhoods published in this delta. */
  def maintain(
      spark: SparkSession,
      indexDir: String,
      batch: DataFrame,
      batchId: Long,
      k: Int = 10,
      iterations: Int = 2): Long = {
    val newVecs = batch.select("vec_id", "embedding").dropDuplicates("vec_id")
      .localCheckpoint(eager = true)
    if (newVecs.isEmpty) return 0L
    val first = !exists(spark, graphDir(indexDir))
    newVecs
      .withColumn("ver", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode(if (exists(spark, vectorsDir(indexDir))) "overwrite" else "errorifexists")
      .partitionBy("ver")
      .parquet(vectorsDir(indexDir))
    val delta =
      if (first) AnnGraph.nnDescentGraph(newVecs, k, iterations)
      else {
        val graph = readIndex(spark, indexDir).localCheckpoint(eager = true)
        val allVecs = readVectors(spark, indexDir)
        val updated = AnnGraph
          .nnDescentInsert(graph, allVecs, newVecs.select("vec_id"), k, iterations)
        // publish only touched neighborhoods: new nodes, and old nodes
        // that now carry a new-node neighbor (the only rows insert can
        // have changed)
        val newIds = newVecs.select(col("vec_id").as("id"))
        val touched = updated.join(broadcast(newIds), Seq("id"), "left_semi")
          .select("id")
          .unionByName(
            updated.join(broadcast(newIds.withColumnRenamed("id", "nb")), Seq("nb"), "left_semi")
              .select("id"))
          .distinct()
        updated.join(touched, Seq("id"), "left_semi")
      }
    val out = delta.withColumn("ver", lit(batchId)).localCheckpoint(eager = true)
    out.write
      .option("partitionOverwriteMode", "dynamic")
      .mode(if (first) "errorifexists" else "overwrite")
      .partitionBy("ver")
      .parquet(graphDir(indexDir))
    out.select("id").distinct().count()
  }

  /** Wire [[maintain]] into a vector stream (foreachBatch — the same
    * micro-batch contract as the sink). */
  def indexWriter(
      stream: DataFrame,
      indexDir: String,
      checkpoint: String,
      k: Int = 10,
      iterations: Int = 2): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maintain(batch.sparkSession, indexDir, batch, batchId, k, iterations)
        ()
      }
}
