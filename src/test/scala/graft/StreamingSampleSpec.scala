package graft

import graft.operators.TextAnalysis
import graft.sources.Tables
import graft.streaming.{StreamingJoins, StreamingSample}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming duals added in round 3: the A-ES weighted reservoir
  * (stream_weighted_sample ≡ batch q105) and stream-static enrichment. */
class StreamingSampleSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = Files.createTempDirectory("graft-sample").toString

  /** Max-version rows per source from an update-mode memory sink. */
  def latestReservoir(table: String): Set[(String, Long, Long)] = {
    val rows = spark.table(table)
      .select("source", "ver", "doc_id", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lastVer = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    rows.filter { case (s, v, _, _) => v == lastVer(s) }
      .map { case (s, _, d, n) => (s, d, n) }.toSet
  }

  test("stream_sample_table: streamed md5 sample ≡ batch filter, estimates ≡ q157") {
    val orders = Tables(spark, sfDir).orders
    val in = tmp()
    orders.repartition(3).write.mode("overwrite").parquet(in)
    val stream = spark.readStream
      .schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val q = StreamingSample.hashSampleStream(stream, "o_orderkey")
      .writeStream.format("memory").queryName("aqp_sample")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("aqp_sample")
    val batchSample = orders.filter(
      graft.operators.Relational.hashSamplePredicate(col("o_orderkey"), Seq("0", "1", "2", "3")))
    assert(streamed.count() === batchSample.count())
    assert(streamed.select("o_orderkey").except(batchSample.select("o_orderkey")).isEmpty)
    // estimates computed FROM the streamed sample table match the batch
    // q157 answer bit-for-bit
    val fromStream = graft.operators.Relational.approxFromSample(streamed, 0.25)
    val batch = graft.operators.Relational.approxGroupBy(orders)
    assert(fromStream.except(batch).isEmpty && batch.except(fromStream).isEmpty)
  }

  test("stream_weighted_sample: final reservoir equals the batch q105 sample") {
    val docs = Tables(spark, sfDir).documents
    val in = tmp()
    // three micro-batches of the same corpus
    docs.repartition(3).write.mode("overwrite").parquet(in)
    val stream = spark.readStream
      .schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val q = StreamingSample.weightedSample(spark, stream, k = 20)
      .writeStream.format("memory").queryName("wsample")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = latestReservoir("wsample")
    val want = TextAnalysis.weightedSample(docs, k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      s"streaming reservoir diverges from batch sample: extra=${got -- want} missing=${want -- got}")
  }

  test("stream_weighted_sample: reservoir is identical under a different batch slicing") {
    val docs = Tables(spark, sfDir).documents
    def runWith(parts: Int): Set[(String, Long, Long)] = {
      val in = tmp()
      docs.repartition(parts).write.mode("overwrite").parquet(in)
      val stream = spark.readStream
        .schema(spark.read.parquet(in).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in)
      val name = s"wsample_p$parts"
      val q = StreamingSample.weightedSample(spark, stream, k = 20)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      latestReservoir(name)
    }
    assert(runWith(1) == runWith(5), "sample depends on micro-batch slicing")
  }

  test("stream_dau: streamed sketch DAU equals the batch approximation, within 5% of exact") {
    val events = Tables(spark, sfDir).events
    val in = tmp()
    events.repartition(3).write.mode("overwrite").parquet(in)
    val stream = spark.readStream
      .schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    // the corpus spans a month and file slicing is NOT time-ordered, so
    // a production-sized watermark would (correctly) drop whole late
    // days — use one wider than the data span to test the aggregation
    val q = graft.streaming.StreamingAggregates.dailyActiveUsers(stream, watermark = "45 days")
      .writeStream.format("memory").queryName("sdau")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // HLL estimates are monotone as batches accumulate, so the final
    // update per day window is its maximum
    val rows = spark.table("sdau").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1))
    val got = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val batch = events.groupBy(window(col("ts"), "1 day"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("a"))
      .collect().map(r => r.getStruct(0).getTimestamp(0) -> r.getLong(1)).toMap
    assert(got == batch, "streamed sketch diverges from batch approximation")
    val exact = events.groupBy(window(col("ts"), "1 day"))
      .agg(countDistinct("user_id").as("e"))
      .collect().map(r => r.getStruct(0).getTimestamp(0) -> r.getLong(1)).toMap
    got.foreach { case (day, a) =>
      val e = exact(day)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"day $day: approx $a exact $e")
    }
  }

  test("stream_srm: a planted all-A stream flags, the balanced fixture does not") {
    import graft.streaming.StreamingAggregates
    def runSrm(events: org.apache.spark.sql.DataFrame, name: String) = {
      val in = tmp()
      events.repartition(2).write.mode("overwrite").parquet(in)
      val stream = spark.readStream
        .schema(spark.read.parquet(in).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in)
      val q = StreamingAggregates.srmArmCounts(stream, watermark = "45 days")
        .writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // HLL counts are monotone per (day, arm); keep each key's max
      val last = spark.table(name).collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toSeq
        .map { case ((d, a), n) => (d, a, n) }
        .toDF("day_start", "arm", "n_users")
      StreamingAggregates.srmReadout(last).collect()
    }
    // balanced: the sf fixture's md5 parity is a fair split
    val events = Tables(spark, sfDir).events
    val fair = runSrm(events.select("ts", "user_id"), "srm_fair")
    assert(fair.nonEmpty && fair.forall(!_.getAs[Boolean]("srm_flag")),
      s"fair split must not flag: ${fair.mkString("; ")}")
    // broken: a synthesized log where only arm-A users ever appear
    def armA(u: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      "01234567".contains(hex.charAt(0))
    }
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val brokenEvents = (1L to 2000L).filter(armA).take(40)
      .map(u => (ts0, u)).toDF("ts", "user_id")
    val broken = runSrm(brokenEvents, "srm_broken")
    assert(broken.nonEmpty && broken.forall(_.getAs[Boolean]("srm_flag")),
      s"all-A stream must flag every day: ${broken.mkString("; ")}")
  }

  test("stream_static enrichment: streamed join equals the batch left join") {
    val events = Tables(spark, sfDir).events
    val dim = events.select("user_id").distinct()
      .withColumn("tier", pmod(col("user_id"), lit(3)).cast("int"))
    val in = tmp()
    events.repartition(2).write.mode("overwrite").parquet(in)
    val stream = spark.readStream
      .schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val q = StreamingJoins.enrichmentJoin(stream, dim)
      .select("event_id", "user_id", "tier")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("enriched")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = events.join(dim, Seq("user_id"), "left")
      .select("event_id", "user_id", "tier")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }
}
