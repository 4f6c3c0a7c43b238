package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (SURVEY.md §2 q50–q52).
  *
  * Brute-force cosine is the exact baseline (query side broadcast, one
  * pass over candidates, TakeOrdered-style window top-k). SRP-LSH is the
  * scale path: bucket ids are map-side column math, the candidate join is
  * bucket-equality (data-proportional), so 100 TB of vectors never meets
  * a cross join.
  */
object Similarity {

  /** q50: per-label vector statistics (norms in double precision). */
  def embeddingStats(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), norm(col("embedding")).as("nrm"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        round(avg("nrm"), 4).as("avg_norm"),
        round(min("nrm"), 4).as("min_norm"),
        round(max("nrm"), 4).as("max_norm"))
      .orderBy("label")

  /** q51: brute-force cosine top-k. Queries are broadcast; ranking is a
    * per-query window. Embeddings here are unit-norm so cosine ≡ dot. */
  def annBruteForce(embeddings: DataFrame, numQueries: Int = 3, k: Int = 5): DataFrame = {
    val q = embeddings.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = embeddings.filter(col("vec_id") >= numQueries)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    c.crossJoin(broadcast(q))
      .withColumn("cos", dot(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 4).as("cosine"))
      .orderBy("qid", "rk")
  }

  /** q52: SRP-LSH bucketed ANN. Same output shape as q51 but candidates
    * are restricted to the query's hyperplane-sign bucket; ScalaTest
    * measures recall against the brute-force baseline. */
  def annLsh(embeddings: DataFrame, numQueries: Int = 3, k: Int = 5, numPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val planes   = typedlit(rademacherPlanes(numPlanes, dim))
    val bucketed = embeddings.withColumn("bucket", srpBucket(col("embedding"), planes))
    val q = bucketed.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket"))
    val c = bucketed.filter(col("vec_id") >= numQueries)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("bucket"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    c.join(broadcast(q), "bucket")
      .withColumn("cos", dot(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 4).as("cosine"))
      .orderBy("qid", "rk")
  }
}
