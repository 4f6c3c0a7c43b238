package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableRound.round
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

  /** JIT kernels for the no-oracle LSH path: higher-order column math is
    * interpreted (≈µs/element, boxed); these tight loops are the same
    * arithmetic at ns/element. q51 keeps the declarative dot so its
    * evaluation order matches the DuckDB oracle exactly. */
  private def srpBucketUdf(planes: Seq[Seq[Double]]) = {
    val p = planes.map(_.toArray).toArray
    udf { (v: Seq[Float]) =>
      val a = v.toArray
      var bucket = 0
      p.foreach { plane =>
        var d = 0.0; var i = 0
        while (i < plane.length && i < a.length) { d += plane(i) * a(i); i += 1 }
        bucket = bucket * 2 + (if (d > 0) 1 else 0)
      }
      bucket
    }
  }

  private val dotUdf = udf { (x: Seq[Float], y: Seq[Float]) =>
    val a = x.toArray; val b = y.toArray
    var d = 0.0; var i = 0
    while (i < a.length && i < b.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
    d
  }

  /** q43: embedding-cosine near-dup pairs — the dedup-by-embedding path.
    * SRP buckets bound the candidate set (no O(n²) cross join at scale);
    * within-bucket pairs are ranked by cosine and the global top-N kept
    * (TakeOrdered merge, not a full sort). */
  def embeddingNearDupPairs(embeddings: DataFrame, numPlanes: Int = 4, dim: Int = 64, topN: Int = 20): DataFrame = {
    val bucketed = embeddings
      .withColumn("bucket", srpBucketUdf(rademacherPlanes(numPlanes, dim))(col("embedding")))
    val a = bucketed.select(col("bucket"), col("vec_id").as("vec_a"), col("embedding").as("e_a"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("vec_b"), col("embedding").as("e_b"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", dotUdf(col("e_a"), col("e_b")))
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_a"), asc("vec_b"))
      .limit(topN)
  }

  /** q52: SRP-LSH bucketed ANN with multi-probe. Candidates are
    * restricted to the query's hyperplane-sign bucket plus (multi-probe)
    * every bucket at sign-hamming distance ≤ `probeHamming` — the
    * standard recall lever: a near neighbor that lands on the wrong side
    * of one hyperplane is still found, at probes× (not candidates×)
    * cost. Only the tiny query side is exploded; the candidate table is
    * touched once. ScalaTest measures recall against brute force. */
  def annLsh(
      embeddings: DataFrame,
      numQueries: Int = 3,
      k: Int = 5,
      numPlanes: Int = 4,
      dim: Int = 64,
      probeHamming: Int = 1): DataFrame = {
    val bucketed = embeddings.withColumn(
      "bucket", srpBucketUdf(rademacherPlanes(numPlanes, dim))(col("embedding")))
    // probe masks: all bucket-bit flips within hamming distance
    val probeMasks = (0 until (1 << numPlanes))
      .filter(m => Integer.bitCount(m) <= probeHamming)
      .map(m => lit(m))
    val q = bucketed.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket"))
      .withColumn("bucket", explode(array(probeMasks.map(m => col("bucket").bitwiseXOR(m)): _*)))
    val c = bucketed.filter(col("vec_id") >= numQueries)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("bucket"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    c.join(broadcast(q), "bucket")
      .select(col("qid"), col("cid"), col("qe"), col("ce")).dropDuplicates(Seq("qid", "cid"))
      .withColumn("cos", dotUdf(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 4).as("cosine"))
      .orderBy("qid", "rk")
  }
}
