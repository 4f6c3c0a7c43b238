package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarially-SKEWED fixture generator — the dataset the uniform
  * TPC-H-ish driver testdata can never be: Zipfian customers with a
  * planted whale, hot parts, and a hot ingest date. Exists because every
  * skew-sensitive scale claim (q349's capped pair expansion, q150's
  * range buckets, Skew.saltedJoin, the LSH maxBucket caps, q92/q106
  * baskets) was otherwise only ever benched on uniform data — a
  * quadratic term hiding behind a "bounded by nature" assumption would
  * not show up anywhere (round-7 verdict, "What's missing" #1).
  *
  * Deterministic (hash-derived, no RNG), written once under `outDir`
  * with the driver testdata's exact schemas so every registered query
  * runs on it unchanged via `Tables(spark, outDir)`.
  *
  * Planted structure at scale=1 (≈ sf0.1 volume):
  *   - customers: 15k; customer 0 is the WHALE (places 10% of all
  *     orders); customer popularity otherwise ~ 1/rank (Zipf);
  *   - parts: 20k; part 0 is HOT (appears in ~10% of line items);
  *     part popularity otherwise ~ 1/rank;
  *   - orders: 150k over 365 days, 30% of them on ONE day (hot dt);
  *   - lineitem: ~600k rows, 1-7 lines per order, whale orders pick
  *     DISTINCT parts so the whale genuinely owns a huge popular-part
  *     set (the q349 killer), not one part many times;
  *   - events: 100k rows, 30% on one hot (dt, hr), hot user = user 0.
  */
object GenSkewData {

  /** 1/rank Zipf over [0, n): maps a uniform hash u in [0,1) through
    * the inverse CDF approximation rank = n^u − 1 (heavy head, long
    * tail — exact Zipf shape is not the point, adversarial skew is). */
  private def zipfIdx(u: org.apache.spark.sql.Column, n: Int) =
    least(lit(n - 1), greatest(lit(0), (pow(lit(n.toDouble), u) - 1).cast("long")))

  private def u01(c: org.apache.spark.sql.Column) =
    (pmod(xxhash64(c), lit(1000000L)).cast("double") / 1e6)

  def generate(spark: SparkSession, outDir: String, scale: Double = 1.0): Unit = {
    val nCust = (15000 * scale).toInt.max(100)
    val nPart = (20000 * scale).toInt.max(100)
    val nOrders = (150000 * scale).toInt.max(1000)
    val nEvents = (100000 * scale).toInt.max(1000)

    val customer = spark.range(nCust).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), col("id")).as("c_name"),
      pmod(col("id"), lit(25)).cast("int").as("c_nationkey"),
      (pmod(xxhash64(col("id")), lit(10000L)).cast("double") / 10).as("c_acctbal"),
      element_at(array(lit("BUILDING"), lit("AUTOMOBILE"), lit("MACHINERY"),
        lit("HOUSEHOLD"), lit("FURNITURE")), pmod(col("id"), lit(5)).cast("int") + 1)
        .as("c_mktsegment"))

    val part = spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat(lit("part "), col("id")).as("p_name"),
      concat(lit("Brand#"), pmod(col("id"), lit(25))).as("p_brand"),
      concat(lit("TYPE "), pmod(col("id"), lit(50))).as("p_type"),
      (pmod(col("id"), lit(50)) + 1).cast("int").as("p_size"),
      (lit(900.0) + pmod(xxhash64(col("id")), lit(10000L)).cast("double") / 10).as("p_retailprice"))

    // orders: whale (cust 0) places 10%; the rest Zipf; 30% on the hot day
    val orders = spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      when(pmod(xxhash64(col("id"), lit(1)), lit(10L)) === 0, lit(0L))
        .otherwise(zipfIdx(u01(col("id") + 7), nCust)).as("o_custkey"),
      when(pmod(col("id"), lit(2)) === 0, lit("F")).otherwise(lit("O")).as("o_orderstatus"),
      (lit(1000.0) + pmod(xxhash64(col("id"), lit(2)), lit(400000L)).cast("double") / 2)
        .as("o_totalprice"),
      when(pmod(xxhash64(col("id"), lit(3)), lit(10L)) < 3,
        to_timestamp(lit("2024-06-01 00:00:00")))
        .otherwise(to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(pmod(xxhash64(col("id"), lit(4)), lit(365L)).cast("int")))
        .as("o_orderdate"),
      element_at(array(lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"),
        lit("4-NOT SPECIFIED"), lit("5-LOW")), pmod(col("id"), lit(5)).cast("int") + 1)
        .as("o_orderpriority"))

    // lineitem: 1-7 lines per order; hot part 0 on ~10% of lines; WHALE
    // lines pick DISTINCT mid-popularity parts (hash spread over the top
    // 8k) so customer 0 owns a popular-part set in the thousands
    val lines = orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .withColumn("l_linenumber",
        explode(sequence(lit(1), (pmod(xxhash64(col("o_orderkey"), lit(5)), lit(7L)) + 1).cast("int"))))
    val lineitem = lines.select(
      col("o_orderkey").as("l_orderkey"),
      when(col("o_custkey") === 0,
        pmod(xxhash64(col("o_orderkey"), col("l_linenumber")), lit(8000L)))
        .when(pmod(xxhash64(col("o_orderkey"), col("l_linenumber"), lit(6)), lit(10L)) === 0, lit(0L))
        .otherwise(zipfIdx(u01(xxhash64(col("o_orderkey"), col("l_linenumber"), lit(7))), nPart))
        .as("l_partkey"),
      pmod(xxhash64(col("o_orderkey"), col("l_linenumber"), lit(8)), lit(1000L)).as("l_suppkey"),
      col("l_linenumber"),
      (pmod(xxhash64(col("o_orderkey"), col("l_linenumber"), lit(9)), lit(50L)) + 1)
        .cast("double").as("l_quantity"),
      (lit(100.0) + pmod(xxhash64(col("o_orderkey"), col("l_linenumber"), lit(10)), lit(90000L))
        .cast("double") / 10).as("l_extendedprice"),
      (pmod(xxhash64(col("o_orderkey"), col("l_linenumber"), lit(11)), lit(11L))
        .cast("double") / 100).as("l_discount"),
      (pmod(xxhash64(col("o_orderkey"), col("l_linenumber"), lit(12)), lit(9L))
        .cast("double") / 100).as("l_tax"),
      when(pmod(xxhash64(col("o_orderkey"), col("l_linenumber"), lit(13)), lit(4L)) === 0, lit("R"))
        .otherwise(lit("N")).as("l_returnflag"),
      lit("O").as("l_linestatus"),
      (col("o_orderdate") + make_dt_interval(
        pmod(xxhash64(col("o_orderkey"), col("l_linenumber"), lit(14)), lit(30L)).cast("int")))
        .as("l_shipdate"))

    // events: 30% on one hot (dt, hr); user 0 is the hot user (20%)
    val events = spark.range(nEvents).select(
      col("id").as("event_id"),
      when(pmod(xxhash64(col("id"), lit(20)), lit(10L)) < 3,
        to_timestamp(lit("2024-03-15 12:00:00")))
        .otherwise(to_timestamp(lit("2024-03-01 00:00:00")) +
          make_dt_interval(days = pmod(xxhash64(col("id"), lit(21)), lit(30L)).cast("int"),
            hours = pmod(xxhash64(col("id"), lit(22)), lit(24L)).cast("int")))
        .as("ts"),
      when(pmod(xxhash64(col("id"), lit(23)), lit(5L)) === 0, lit(0L))
        .otherwise(zipfIdx(u01(col("id") + 31), 5000)).as("user_id"),
      element_at(array(lit("click"), lit("view"), lit("purchase"), lit("signup"), lit("error")),
        pmod(xxhash64(col("id"), lit(24)), lit(5L)).cast("int") + 1).as("event_type"),
      (pmod(xxhash64(col("id"), lit(25)), lit(10000L)).cast("double") / 100).as("value"),
      concat(lit("p"), pmod(xxhash64(col("id"), lit(26)), lit(100L))).as("props"))

    // documents: 30% are one boilerplate template with a tiny suffix
    // tweak — the LSH adversary (hot shingle buckets that saturate a
    // band; the maxBucket caps are what keeps this sub-quadratic)
    val nDocs = (20000 * scale).toInt.max(500)
    val boiler = "terms and conditions apply please read the full agreement before " +
      "continuing standard shipping rates and return policies are described below "
    val documents = spark.range(nDocs).select(
      col("id").as("doc_id"),
      when(pmod(xxhash64(col("id"), lit(30)), lit(10L)) < 3,
        concat(lit(boiler * 3), lit("case "), pmod(xxhash64(col("id"), lit(31)), lit(50L))))
        .otherwise(concat(lit("unique document body "),
          sha2(concat(col("id").cast("string"), lit("salt")), 256),
          lit(" with distinct content "),
          sha2(concat(col("id").cast("string"), lit("salt2")), 256)))
        .as("text"),
      lit("en").as("lang"),
      concat(lit("src"), pmod(col("id"), lit(5))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))

    // embeddings: CLUSTERED with one dense hot cluster — the ANN
    // adversary (uniform vectors make every LSH/IVF bucket balanced;
    // real corpora are clumpy, and a dense cluster is what saturates a
    // bucket): 40% of vectors in ONE tight cluster, the rest across 20
    // looser clusters; 32-dim, deterministic hash-derived coordinates
    val nVec = (8000 * scale).toInt.max(200)
    val dim = 32
    val embeddings = spark.range(nVec)
      .withColumn("label",
        when(pmod(xxhash64(col("id"), lit(40)), lit(10L)) < 4, lit(0))
          .otherwise((pmod(xxhash64(col("id"), lit(41)), lit(20L)) + 1).cast("int")))
      .select(
        col("id").as("vec_id"),
        expr(s"""transform(sequence(0, ${dim - 1}), d ->
             CAST(label * 3.0
               + CAST(pmod(xxhash64(label, d), 1000) AS DOUBLE) / 500.0
               + CAST(pmod(xxhash64(id, d, 42), 1000) AS DOUBLE) / 1000.0
                 * CASE WHEN label = 0 THEN 0.05 ELSE 0.6 END AS FLOAT))""")
          .as("embedding"),
        col("label"))
    Seq("customer" -> customer, "part" -> part, "orders" -> orders,
      "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
      "embeddings" -> embeddings)
      .foreach { case (n, df) =>
        df.write.mode("overwrite").parquet(s"$outDir/$n.parquet")
      }
  }

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "target/skewdata"
    val scale = if (args.length > 1) args(1).toDouble else 1.0
    val spark = GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, appName = "graft-genskew")
    generate(spark, outDir, scale)
    val li = spark.read.parquet(s"$outDir/lineitem.parquet")
    println(s"[genskew] lineitem rows = ${li.count()}")
    val whale = li.join(
      spark.read.parquet(s"$outDir/orders.parquet").filter(col("o_custkey") === 0),
      col("l_orderkey") === col("o_orderkey"))
      .select("l_partkey").distinct().count()
    println(s"[genskew] whale distinct parts = $whale")
    spark.stop()
  }
}
