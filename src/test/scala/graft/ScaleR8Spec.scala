package graft

import graft.operators.{Relational, Skew}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Round-8 scale work: the deterministic per-key cap (Skew.capPerKey)
  * and the planted-whale bound on q349's customer-grain pair expansion. */
class ScaleR8Spec extends SparkSpec {
  import spark.implicits._

  test("capPerKey: under-cap keys pass through bit-identical, whale keys capped, deterministic") {
    val df = (
      (1 to 5).map(i => ("small", s"item$i")) ++          // 5 rows, under cap
      (1 to 40).map(i => ("whale", f"item$i%03d"))         // 40 rows, over cap
    ).toDF("k", "v")
    val capped = Skew.capPerKey(df, "k", "v", cap = 10)
    val byKey = capped.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey("small") == 5L, "under-cap key keeps every row")
    assert(byKey("whale") == 10L, "whale key keeps exactly cap rows")
    // the small key's rows are the original rows, untouched
    val smallRows = capped.filter($"k" === "small").select("v").as[String].collect().toSet
    assert(smallRows == (1 to 5).map(i => s"item$i").toSet)
    // deterministic: the same input selects the same survivors every run
    val again = Skew.capPerKey(df, "k", "v", cap = 10)
      .filter($"k" === "whale").select("v").as[String].collect().toSet
    val first = capped.filter($"k" === "whale").select("v").as[String].collect().toSet
    assert(first == again, "hash-ranked survivors are stable across runs")
    assert(first.size == 10)
  }

  test("capPerKey: cap above every degree is the identity") {
    val df = (1 to 7).map(i => (s"k${i % 3}", i)).toDF("k", "v")
    val out = Skew.capPerKey(df, "k", "v", cap = 100)
    assert(out.count() == 7L)
    assert(out.select("k", "v").collect().toSet == df.collect().toSet)
  }

  // ------------------------------------------------------------- q349
  private def whaleFixture = {
    // custs 1..3 own ONLY parts 1,2, in separate orders — the planted
    // qualifying substitute pair, well under any cap. custs 96..99 are
    // whales: each owns all 40 parts 101..140 in separate orders (4
    // owners ≥ minCustomers, so every whale part passes the degree
    // prefilter and enters the expansion).
    val orders = (
      (1 to 3).flatMap(c => (1 to 2).map(slot => (c * 1000L + slot, c.toLong))) ++
      (96 to 99).flatMap(c => (1 to 40).map(slot => (c * 1000L + slot, c.toLong)))
    ).map { case (ok, c) =>
      (ok, c, "F", 1.0, Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val lines = (
      (1 to 3).flatMap(c => Seq((c * 1000L + 1, 1L), (c * 1000L + 2, 2L))) ++
      (96 to 99).flatMap(c => (1 to 40).map(i => (c * 1000L + i, 100L + i)))
    ).toDF("l_orderkey", "l_partkey")
      .withColumn("l_linenumber", lit(1))
      .withColumn("l_suppkey", lit(1L))
      .withColumn("l_quantity", lit(1.0))
      .withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_returnflag", lit("N"))
      .withColumn("l_discount", lit(0.0))
      .withColumn("l_tax", lit(0.0))
      .withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate", lit(Timestamp.valueOf("2024-01-01 00:00:00")))
    (orders, lines)
  }

  test("q349 planted whale: the capped owned set bounds per-customer pair expansion") {
    val (orders, lines) = whaleFixture
    // reconstruct the capped owned set exactly as substituteParts builds it
    val owned0 = lines.select(col("l_orderkey").as("ok"), col("l_partkey").as("part"))
      .join(orders.select(col("o_orderkey").as("ok"), col("o_custkey").as("cust")), "ok")
      .select("cust", "part").distinct()
    val popular = owned0.groupBy("part").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3).select("part")
    val capped = Skew.capPerKey(
      owned0.join(popular, Seq("part"), "left_semi"), "cust", "part", cap = 10)
    val maxDeg = capped.groupBy("cust").count().agg(max("count")).as[Long].head()
    assert(maxDeg <= 10L,
      s"whale's popular-part set must be capped at 10 (pair expansion ≤ 45, not 780): $maxDeg")
  }

  test("q349 planted whale: capped run keeps the real substitute pair and stays whale-bounded") {
    val (orders, lines) = whaleFixture
    val out = Relational.substituteParts(orders, lines, maxPartsPerCustomer = 10, topN = 1000)
      .collect()
    val pairs = out.map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb"))).toSet
    assert(pairs.contains((1L, 2L)),
      s"the non-whale substitute pair (1,2) survives the whale cap: $pairs")
    // whale-part pairs shrink from C(40,2)=780 to at most C(10,2)=45 per
    // capped customer set — counted over pairs where both sides are whale parts
    val whalePairs = pairs.count { case (a, b) => a > 100L && b > 100L }
    assert(whalePairs <= 45 * 4,
      s"whale-part expansion is bounded by the cap, got $whalePairs pairs")
  }

  test("saltedJoin bounds the hot key's per-task shuffle rows (task-level, measured)") {
    // one hot key carrying 90% of the large side: unsalted, ONE reducer
    // task reads all its rows; salted over 8 buckets, no task reads more
    // than ~1/8 of them. Asserted from real task metrics, not plan shape.
    val large = spark.range(200000).selectExpr(
      "CASE WHEN id % 10 < 9 THEN 'hot' ELSE concat('k', id % 1000) END AS k",
      "id AS payload")
    val small = (Seq("hot") ++ (0 until 1000).map(i => s"k$i")).toDF("k")
      .withColumn("dim", lit(1))
    val listener = new BenchSkew.TaskMaxListener
    spark.sparkContext.addSparkListener(listener)
    // this fixture is kilobytes, so AQE would coalesce the whole shuffle
    // into one partition and void the per-task measurement; at real
    // scale the partitions are advisory-sized and stay separate
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      def measure(df: org.apache.spark.sql.DataFrame): Long = {
        listener.reset()
        // plain count(): the only shuffle executed is the JOIN's own
        // exchange (a groupBy here would re-shuffle by the hot key and
        // measure the wrong stage)
        df.count()
        Thread.sleep(500)
        listener.maxShuffleReadRows
      }
      // broadcast would dodge the shuffle and void the measurement —
      // force a shuffle join for both shapes
      val unsaltedMax = measure(
        large.hint("shuffle_hash").join(small, "k"))
      val saltedMax = measure(
        Skew.saltedJoin(large, small.hint("shuffle_hash"), "k", "payload", saltBuckets = 64))
      val hotRows = 180000L
      assert(unsaltedMax >= hotRows,
        s"control: the unsalted join must concentrate the hot key in one task ($unsaltedMax)")
      // 64 salts over the 4 test reducers spread the hot key ~evenly;
      // the bound leaves binomial slack (salt->reducer is a hash, not a
      // round-robin)
      assert(saltedMax <= hotRows / 2,
        s"salted max per-task shuffle rows $saltedMax vs $unsaltedMax unsalted")
      // 4 test reducers leave real hash imbalance (measured ~2.5x cut
      // here; at cluster partition counts the cut approaches saltBuckets)
      assert(saltedMax * 2 <= unsaltedMax,
        s"salting must cut the hot task by at least 2x: $saltedMax vs $unsaltedMax")
    } finally {
      prev.fold(spark.conf.unset(coalesceKey))(v => spark.conf.set(coalesceKey, v))
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("q349: a non-binding cap (default 1000) changes nothing vs an effectively infinite cap") {
    val (orders, lines) = whaleFixture
    val a = Relational.substituteParts(orders, lines, topN = 1000).collect().toSet
    val b = Relational.substituteParts(orders, lines, topN = 1000,
      maxPartsPerCustomer = Int.MaxValue).collect().toSet
    assert(a == b, "cap above every real degree is exact")
  }
}
