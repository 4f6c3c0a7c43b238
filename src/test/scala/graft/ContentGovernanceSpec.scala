package graft

import graft.operators.TextAnalysis
import graft.plans.SchemaCompat
import graft.sources.Tables
import org.apache.spark.sql.types._

/** q316 blocklist filter report and q317 schema-compatibility gate. */
class ContentGovernanceSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("q316: term and phrase hits counted per source, zero cells kept") {
    val d = docs(Seq(
      (1L, "this is bad stuff", "a"),
      (2L, "totally fine", "a"),
      (3L, "bad and very bad", "b"),
      (4L, "clean here", "b")))
    val got = TextAnalysis.blocklistReport(d, Seq("bad", "very bad")).collect()
    assert(got.length === 4) // 2 sources × 2 terms, zero cells included
    val m = got.map(r => (r.getAs[String]("source"), r.getAs[String]("term")) ->
      (r.getAs[Long]("n_flagged"), r.getAs[Double]("flag_rate"))).toMap
    assert(m(("a", "bad")) === ((1L, 0.5)))
    assert(m(("a", "very bad")) === ((0L, 0.0))) // phrase absent in a
    assert(m(("b", "bad")) === ((1L, 0.5)))
    assert(m(("b", "very bad")) === ((1L, 0.5))) // phrase match
  }

  test("q316: real corpus report has the full grid shape") {
    val t = Tables(spark, sfDir)
    val nSrc = t.documents.select("source").distinct().count()
    val got = TextAnalysis.blocklistReport(t.documents).collect()
    assert(got.length === (nSrc * 3).toInt)
    assert(got.forall { r =>
      val rate = r.getAs[Double]("flag_rate"); rate >= 0.0 && rate <= 1.0
    })
  }

  test("q317: each change class gets the right verdict") {
    val reader = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", IntegerType, nullable = true),
      StructField("gone", StringType, nullable = true),
      StructField("narrowed", LongType, nullable = true),
      StructField("tight", StringType, nullable = true)))
    val writer = StructType(Seq(
      StructField("id", LongType, nullable = true),  // relaxed → ok
      StructField("v", LongType, nullable = true),   // widened → ok
      StructField("narrowed", IntegerType, nullable = true), // breaking
      StructField("tight", StringType, nullable = false),    // breaking
      StructField("extra_opt", StringType, nullable = true), // ok
      StructField("extra_req", LongType, nullable = false))) // breaking
    val d = SchemaCompat.diff(reader, writer)
      .map(x => x.field -> (x.change, x.verdict)).toMap
    assert(d("id") === (("relaxed-nullable", "ok")))
    assert(d("v") === (("widening-ok", "ok")))
    assert(d("gone") === (("removed", "breaking")))
    assert(d("narrowed") === (("narrowing", "breaking")))
    assert(d("tight") === (("required-tightened", "breaking")))
    assert(d("extra_opt") === (("add-nullable", "ok")))
    assert(d("extra_req") === (("add-required", "breaking")))
    assert(!SchemaCompat.compatible(reader, writer))
    assert(SchemaCompat.compatible(reader, reader))
  }

  test("q317: registered events-v2 report exercises every verdict class") {
    val got = SchemaCompat.eventsV2Report(spark, Tables(spark, sfDir).events).collect()
    val changes = got.map(_.getAs[String]("change")).toSet
    assert(changes === Set("removed", "narrowing", "required-tightened", "add-nullable"))
    assert(got.count(_.getAs[String]("verdict") == "breaking") === 3)
  }
}
