package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale-up of the driver testdata (sf0.1 → sf1) by key-remapped
  * replication — the measured answer to "would this still work at the
  * next decade of scale" that plan-shape lint cannot give: every
  * registered query runs unchanged on the output via `Tables(spark,
  * outDir)`, and per-query time ratios vs sf0.1 expose any operator
  * whose constant only shows up 10× along (spill, broadcast-threshold
  * crossovers, memory pressure).
  *
  * Replication model (mirrors the driver generator's own scaling —
  * verified from sf0.01 → sf0.1: all fact/dim tables ×10, region/nation
  * fixed, embeddings ×4):
  *   - every table replicates R times with per-table key strides
  *     (stride = max(key)+1) so join integrity is preserved replica-by
  *     -replica: shifted orders join shifted customers exactly as the
  *     originals did;
  *   - dates/timestamps stay FIXED — like TPC-H, a bigger SF densifies
  *     the same calendar window (per-day volumes grow 10×), it does not
  *     stretch history;
  *   - document text is PERTURBED per replica (a replica-tag token
  *     prefixed, n_chars recomputed) so the dedup family sees a
  *     realistically grown corpus, not 10 exact copies of every doc;
  *   - embeddings rotate their dimensions per replica ((pos+16·rep) mod
  *     dim) — norm- and distribution-preserving, but replicas are no
  *     longer mutual nearest neighbours, so ANN/near-dup workloads keep
  *     their true shape.
  *
  * Usage: runMain graft.GenScaleData <srcSfDir> <outDir> [reps=10]
  */
object GenScaleData {

  private def replicate(df: DataFrame, reps: Int): DataFrame =
    df.crossJoin(
      df.sparkSession.range(reps).select(col("id").cast("long").as("__rep")))

  def generate(spark: SparkSession, srcDir: String, outDir: String, reps: Int = 10): Unit = {
    val t = sources.Tables(spark, srcDir)

    def strideOf(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    val custStride = strideOf(t.customer, "c_custkey")
    val suppStride = strideOf(t.supplier, "s_suppkey")
    val partStride = strideOf(t.part, "p_partkey")
    val orderStride = strideOf(t.orders, "o_orderkey")
    val eventStride = strideOf(t.events, "event_id")
    val userStride = strideOf(t.events, "user_id")
    val docStride = strideOf(t.documents, "doc_id")
    val vecStride = strideOf(t.embeddings, "vec_id")

    def shift(c: String, stride: Long) = col(c) + col("__rep") * stride

    def write(df: DataFrame, name: String): Unit = {
      df.drop("__rep")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      ()
    }

    // fixed-size dims copy through unchanged
    t.region.write.mode("overwrite").parquet(s"$outDir/region.parquet")
    t.nation.write.mode("overwrite").parquet(s"$outDir/nation.parquet")

    // replica entities are NEW entities: identity strings must not be
    // byte-copies, or name-keyed operators (prefix join q120, fuzzy
    // join q107, entity resolution q272) see 10 exact copies of every
    // name and pay a pair expansion ×reps² that real growth never has
    // (measured: q120 11.3× / q272 6.8× at 10× data before this fix)
    def tagName(c: String) =
      when(col("__rep") === 0, col(c))
        .otherwise(concat(col(c), lit("-r"), col("__rep")))
    write(replicate(t.customer, reps)
      .withColumn("c_custkey", shift("c_custkey", custStride))
      .withColumn("c_name", tagName("c_name")), "customer")
    write(replicate(t.supplier, reps)
      .withColumn("s_suppkey", shift("s_suppkey", suppStride))
      .withColumn("s_name", tagName("s_name")), "supplier")
    write(replicate(t.part, reps)
      .withColumn("p_partkey", shift("p_partkey", partStride))
      .withColumn("p_name", tagName("p_name")), "part")
    write(replicate(t.orders, reps)
      .withColumn("o_orderkey", shift("o_orderkey", orderStride))
      .withColumn("o_custkey", shift("o_custkey", custStride)), "orders")
    write(replicate(t.lineitem, reps)
      .withColumn("l_orderkey", shift("l_orderkey", orderStride))
      .withColumn("l_partkey", shift("l_partkey", partStride))
      .withColumn("l_suppkey", shift("l_suppkey", suppStride)), "lineitem")
    write(replicate(t.events, reps)
      .withColumn("event_id", shift("event_id", eventStride))
      .withColumn("user_id", shift("user_id", userStride)), "events")
    write(replicate(t.documents, reps)
      .withColumn("doc_id", shift("doc_id", docStride))
      .withColumn("text",
        when(col("__rep") === 0, col("text"))
          .otherwise(concat(lit("r"), col("__rep"), lit(" "), col("text"))))
      .withColumn("n_chars", length(col("text")).cast("long")), "documents")
    // embeddings scale ×(reps·4/10) — the driver's own sublinear rule
    val vecReps = math.max(1, reps * 4 / 10)
    write(replicate(t.embeddings, vecReps)
      .withColumn("vec_id", shift("vec_id", vecStride))
      .withColumn("embedding",
        // dimension rotation: element i of the output is input
        // (i + 16·rep) mod dim — norm-preserving, decorrelates replicas
        expr("transform(embedding, (x, i) -> " +
          "element_at(embedding, CAST((i + 16*__rep) % size(embedding) AS INT) + 1))")),
      "embeddings")
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, reps)
    println(s"scale data written to $out")
    spark.stop()
  }
}
