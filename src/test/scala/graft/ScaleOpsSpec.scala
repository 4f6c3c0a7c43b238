package graft

import graft.operators.{Similarity, TopK}
import graft.sources.{Bucketing, Tables}
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._
  lazy val t = Tables(spark, sfDir)

  test("topKPerKey: partial-selection result identical to window-only plan") {
    val orders = t.orders
    val got = TopK.topKPerKey(orders, "o_custkey", "o_totalprice", "o_orderkey", 3)
      .select("o_custkey", "o_orderkey", "rn")
      .as[(Long, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val ref = orders.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "rn")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == ref)
  }

  test("q44 as-of join: carries the newest right value at or before each left ts") {
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val left = Seq((1L, ts(0), 10L), (2L, ts(5), 10L), (3L, ts(10), 10L), (4L, ts(1), 99L))
      .toDF("event_id", "ts", "user_id")
    val right = Seq((10L, ts(1), 100.0), (10L, ts(7), 200.0), (55L, ts(0), 9.0))
      .toDF("user_id", "ts", "value")
    val out = graft.operators.AsOfJoin.asofJoin(left, right, "user_id", "ts", "value", "v")
      .select("event_id", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isEmpty)            // before any right row
    assert(out(2L).contains(100.0))    // newest right at m1
    assert(out(3L).contains(200.0))    // newest right at m7
    assert(out(4L).isEmpty)            // user 99 has no right rows
  }

  test("q44 equal timestamps match (>= semantics)") {
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val left  = Seq((1L, ts(5), 10L)).toDF("event_id", "ts", "user_id")
    val right = Seq((10L, ts(5), 42.0)).toDF("user_id", "ts", "value")
    val out = graft.operators.AsOfJoin.asofJoin(left, right, "user_id", "ts", "value", "v").collect()
    assert(out.head.getAs[Double]("v") == 42.0)
  }

  test("q52 recall vs brute force is monotone in the band count (OR-construction)") {
    val emb = t.embeddings
    val truth = Similarity.annBruteForce(emb)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    def recall(bands: Int): Double = {
      val got = Similarity.annLsh(emb, numBands = bands, planesPerBand = 5)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      truth.count(got.contains).toDouble / truth.size
    }
    val r1 = recall(1); val r6 = recall(6)
    assert(r6 >= r1, s"6-band recall $r6 < 1-band recall $r1")
  }

  test("bucketed tables join without an Exchange in the plan") {
    // a stale warehouse dir from a previous JVM blocks saveAsTable
    Seq("b_orders", "b_customer").foreach { tb =>
      spark.sql(s"DROP TABLE IF EXISTS $tb")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$tb")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    }
    Bucketing.writeBucketed(t.orders, "b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(
      t.customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer", "o_custkey", 8)
    val joined = spark.table("b_orders")
      .join(spark.table("b_customer").hint("merge"), "o_custkey")
      .groupBy("c_mktsegment").count()
    joined.collect() // force execution so AQE finalizes the plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_custkey"), s"bucket co-location lost:\n$plan")
  }
}
