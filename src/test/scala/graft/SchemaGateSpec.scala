package graft

import graft.streaming.SchemaGate
import org.apache.spark.sql.types._
import java.nio.file.Files

/** stream_schema_gate: contract-checked ingest routing — compatible
  * batches project onto the contract, breaking batches quarantine
  * whole, replay is idempotent per batch id. */
class SchemaGateSpec extends SparkSpec {
  import spark.implicits._

  private val contract = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("v", LongType, nullable = true),
    StructField("tag", StringType, nullable = true)))

  private def gate() =
    new SchemaGate(spark, contract,
      Files.createTempDirectory("graft-sgate").toString)

  test("compatible evolved batch is accepted and projected onto the contract") {
    val g = gate()
    // widened-from-int v, extra nullable column, missing nullable tag
    val batch = Seq((1L, 10, "x")).toDF("id", "v", "extra")
      .selectExpr("id", "CAST(v AS INT) AS v", "extra")
    assert(g.gateBatch(batch, 0L))
    val got = g.readAccepted()
    assert(got.columns.toSeq === Seq("id", "v", "tag", "ingest_batch"))
    assert(got.schema("v").dataType === LongType) // cast back to contract
    val row = got.head()
    assert(row.getAs[Long]("v") === 10L)
    assert(row.getAs[String]("tag") === null) // filled nullable
  }

  test("breaking batch quarantines whole with the machine-readable diff") {
    val g = gate()
    val breaking = Seq((1L, "not-a-long")).toDF("id", "v") // type change
    assert(!g.gateBatch(breaking, 3L))
    val q = g.readSchemaQuarantine()
    assert(q.count() === 1L)
    val tag = q.head().getAs[String]("schema_violation")
    assert(tag.contains("v:type-mismatch"))
    // nothing landed in accepted
    intercept[Exception](g.readAccepted().count())
  }

  test("replaying the same batch id overwrites its own partition only") {
    val g = gate()
    assert(g.gateBatch(Seq((1L, 1L, "a")).toDF("id", "v", "tag"), 0L))
    assert(g.gateBatch(Seq((2L, 2L, "b")).toDF("id", "v", "tag"), 1L))
    // replay batch 0 with corrected content
    assert(g.gateBatch(Seq((9L, 9L, "z")).toDF("id", "v", "tag"), 0L))
    val got = g.readAccepted().collect()
    assert(got.length === 2)
    assert(got.map(_.getAs[Long]("id")).toSet === Set(9L, 2L))
  }

  test("gate attached to a stream passes the fixed stream schema through") {
    val dir = Files.createTempDirectory("graft-sgate-in").toString
    Seq((1L, 5L, "s")).toDF("id", "v", "tag")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)
    val g = gate()
    val q = g.start(
      spark.readStream.schema(base.schema).parquet(dir),
      Files.createTempDirectory("graft-sgate-ck").toString)
    q.awaitTermination()
    assert(g.readAccepted().count() === 1L)
  }
}
