package graft

import graft.streaming.StreamingTargetEncode
import graft.sources.Tables
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** stream_target_encode: per-segment (Σ target, count) sufficient
  * statistics maintained online equal the batch aggregate regardless of
  * micro-batch slicing (sums are associative). */
class StreamingTargetEncodeSpec extends SparkSpec {
  import spark.implicits._

  test("streamed final segment stats ≡ batch aggregate across 3 slices") {
    val t = Tables(spark, sfDir)
    val orders = t.orders.orderBy("o_orderkey").limit(900).cache()
    val in = Files.createTempDirectory("graft-te").toString
    (0 until 3).foreach { s =>
      val tmp = Files.createTempDirectory(s"graft-te-s$s").toString
      orders.filter(col("o_orderkey") % 3 === s)
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
    val q = StreamingTargetEncode.segmentStats(spark, stream, t.customer)
      .writeStream.format("memory").queryName("te_test")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // final changelog row per segment (memory sink keeps every update;
    // the last per segment is the final state = max n_rows)
    val streamed = spark.sql(
      """SELECT segment, max_by(mean_y, n_rows) AS mean_y, max(n_rows) AS n
        |FROM te_test GROUP BY segment""".stripMargin)
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap

    val cust = t.customer // Tables.customer is a def: capture ONE frame so
    val batch = orders    // both join sides share attribute ids
      .join(cust, orders("o_custkey") === cust("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.avg("o_totalprice").as("mean_y"))
      .collect().map(r => (r.getString(0), (r.getDouble(2), r.getLong(1)))).toMap

    assert(streamed.keySet === batch.keySet)
    streamed.foreach { case (seg, (mean, n)) =>
      assert(n === batch(seg)._2)
      // float sum order differs across slicings: compare to 1e-6 relative
      assert(math.abs(mean - batch(seg)._1) / batch(seg)._1 < 1e-6)
    }
  }
}
