package graft

import graft.sources.Tables
import graft.streaming.HiveBatchSink
import graft.streaming.HiveBatchSink.IngestRule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Ingest-time constraint enforcement: q96's audit rules as a sink
  * quarantine predicate. Planted violations must quarantine per rule,
  * clean batches must stage byte-identically to a rule-less sink, and
  * replay must re-ingest repaired rows while still-broken rows stay. */
class SinkConstraintSpec extends SparkSpec {
  import spark.implicits._
  lazy val t = Tables(spark, sfDir)

  private def tmp(): String = Files.createTempDirectory("graft-rules").toString

  /** t.events with three planted violation classes (and one corrupt ts). */
  private def planted: DataFrame = t.events
    .withColumn("value",
      when(col("event_id") % 100 === 1, -col("value")).otherwise(col("value")))
    .withColumn("event_type",
      when(col("event_id") % 100 === 2, lit("mystery")).otherwise(col("event_type")))
    .withColumn("user_id",
      when(col("event_id") % 100 === 3, lit(null)).otherwise(col("user_id")))
    .withColumn("ts",
      when(col("event_id") % 100 === 4, lit(null)).otherwise(col("ts")))

  test("planted violations are quarantined per rule; clean rows stage") {
    val root = tmp()
    val sink = new HiveBatchSink(spark, root, rules = HiveBatchSink.eventIngestRules)
    val bad  = planted
    val stats = sink.writeBatch(bad, batchId = 0)

    val nNegValue  = bad.filter(col("ts").isNotNull && col("value") < 0).count()
    val nBadType   = bad.filter(col("ts").isNotNull && col("event_type") === "mystery").count()
    val nNullUser  = bad.filter(col("ts").isNotNull && col("user_id").isNull).count()
    val nCorrupt   = bad.filter(col("ts").isNull).count()
    assert(stats.corrupt == nCorrupt)
    assert(stats.violations("range_event_value") == nNegValue)
    assert(stats.violations("known_event_type") == nBadType)
    assert(stats.violations("notnull_user_id") == nNullUser)

    val q = sink.readQuarantine()
    assert(q.count() == nNegValue + nBadType + nNullUser + nCorrupt,
      "quarantine row count != distinct rejected rows (planted classes are disjoint)")
    // every quarantined row carries exactly the rule it broke
    def tagged(rule: String) = q.filter(col("violated_rules") === rule)
    assert(tagged("range_event_value").count() == nNegValue)
    assert(tagged("known_event_type").count() == nBadType)
    assert(tagged("notnull_user_id").count() == nNullUser)
    assert(tagged("corrupt_ts").count() == nCorrupt)

    // staged rows are exactly the clean complement, and none violate
    val staged = spark.read.parquet(sink.stagingPath)
    assert(staged.count() == bad.count() - q.count())
    assert(staged.filter(col("value") < 0 || col("event_type") === "mystery" ||
      col("user_id").isNull).count() == 0, "a violating row reached staging")
    assert(sink.written.value == staged.count())
  }

  test("a row breaking several rules is tagged with all of them, once") {
    val root = tmp()
    val sink = new HiveBatchSink(spark, root, rules = HiveBatchSink.eventIngestRules)
    val multi = t.events.limit(5)
      .withColumn("value", when(col("event_id") === col("event_id"), -1.0))
      .withColumn("event_type", lit("mystery"))
    sink.writeBatch(multi, batchId = 0)
    val q = sink.readQuarantine()
    assert(q.count() == 5)
    q.select("violated_rules").as[String].collect().foreach { tags =>
      assert(tags == "range_event_value,known_event_type", s"got tags '$tags'")
    }
  }

  test("a clean batch stages byte-identically to a rule-less sink") {
    val clean = t.events
    val rootA = tmp(); val rootB = tmp()
    new HiveBatchSink(spark, rootA).writeBatch(clean, batchId = 0)
    new HiveBatchSink(spark, rootB, rules = HiveBatchSink.eventIngestRules)
      .writeBatch(clean, batchId = 0)
    val fs = new org.apache.hadoop.fs.Path(rootA)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listing(root: String): Map[String, Long] = {
      val base = new org.apache.hadoop.fs.Path(s"$root/staging")
      val it = fs.listFiles(base, true)
      val out = scala.collection.mutable.Map[String, Long]()
      while (it.hasNext) {
        val f = it.next()
        // keep only the path below /staging/ and normalize away the
        // per-write UUID in part file names, so two writes of identical
        // content compare equal
        val full = f.getPath.toString
        val rel = full.substring(full.indexOf("/staging/"))
          .replaceAll("part-(\\d+)-[0-9a-f\\-]+", "part-$1")
        if (!rel.endsWith("_SUCCESS")) out(rel) = f.getLen
      }
      out.toMap
    }
    assert(listing(rootA) == listing(rootB),
      "rule-enabled sink staged a clean batch differently from the historical path")
    // and neither produced a quarantine
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$rootB/quarantine")))
  }

  test("replay re-ingests repaired rows; still-broken rows stay quarantined with fresh tags") {
    val root = tmp()
    val sink = new HiveBatchSink(spark, root, rules = HiveBatchSink.eventIngestRules)
    sink.writeBatch(planted, batchId = 0)
    val nQuarantined = sink.readQuarantine().count()
    val nFixable = sink.readQuarantine()
      .filter(col("violated_rules") === "range_event_value").count()
    assert(nFixable > 0 && nQuarantined > nFixable)

    // repair only the negative values; everything else stays broken
    val n = sink.replayQuarantine(df => df.withColumn("value", abs(col("value"))), replayBatchId = 99)
    assert(n == nFixable, s"restored $n, expected $nFixable")

    val q = sink.readQuarantine()
    assert(q.count() == nQuarantined - nFixable)
    assert(q.filter(col("violated_rules").contains("range_event_value")).count() == 0,
      "a repaired class survived in quarantine")
    // repaired rows are back in staging under the replay batch
    val staged = spark.read.parquet(sink.stagingPath)
    assert(staged.filter(col("ingest_batch") === 99).count() == nFixable)
  }
}
