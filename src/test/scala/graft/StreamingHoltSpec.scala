package graft

import graft.operators.StatTests
import graft.sources.Tables
import graft.streaming.StreamingHolt
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** stream_holt: the online Holt model equals the batch recurrence (q281)
  * no matter where the stream is sliced. */
class StreamingHoltSpec extends SparkSpec {
  import spark.implicits._

  test("streamed final level/trend ≡ batch q281 across 3 arbitrary slices") {
    val orders = Tables(spark, sfDir).orders
    val batchRun = StatTests.holtForecast(orders).collect()
    val last = batchRun.last
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg((floor(sum(col("o_totalprice")) * 10000 + 0.5) / 10000).as("rev"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("rev"))
      .orderBy("day")
      .cache()

    val in = Files.createTempDirectory("graft-holt").toString
    val sliced = daily.withColumn("slice",
      ntile(3).over(org.apache.spark.sql.expressions.Window.orderBy("day")))
    (1 to 3).foreach { s =>
      val tmp = Files.createTempDirectory(s"graft-holt-s$s").toString
      sliced.filter(col("slice") === s).drop("slice")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(in, f"slice$s%02d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + s * 60000L)
    }
    val base = spark.read.parquet(in)
    val stream = spark.readStream
      .schema(base.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val q = StreamingHolt.dailyHolt(spark, stream)
      .writeStream.format("memory").queryName("holt_test")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val emitted = spark.table("holt_test").as[StreamingHolt.HoltOut].collect()
    assert(emitted.length === 3, "one changelog row per micro-batch")
    val fin = emitted.maxBy(_.n_days)
    assert(fin.n_days === batchRun.length.toLong, "every day folded exactly once")
    // bit-identical to the batch recurrence (same exact-fraction α/β,
    // same fold order), not merely close
    assert(fin.level === last.getAs[Double]("level"))
    assert(fin.trend === last.getAs[Double]("trend"))
    // intermediate emissions are a prefix of the batch run's trajectory
    emitted.sortBy(_.n_days).init.foreach { e =>
      val b = batchRun(e.n_days.toInt - 1)
      assert(e.level === b.getAs[Double]("level"), s"prefix level at n=${e.n_days}")
      assert(e.trend === b.getAs[Double]("trend"), s"prefix trend at n=${e.n_days}")
    }
  }
}
