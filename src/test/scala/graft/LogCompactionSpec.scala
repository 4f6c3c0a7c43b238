package graft

import graft.operators.{ChangeLog, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** q313 changelog compaction and q314 feature-hashing vectors. */
class LogCompactionSpec extends SparkSpec {
  import spark.implicits._

  test("q313: apply(base, log) ≡ apply(base, compact(log)) on randomized logs") {
    val rnd = new scala.util.Random(42)
    val base = (1 to 30).map(k => (k.toLong, s"base$k", 100.0 + k))
      .toDF("k", "payload", "v0")
    val log = (1 to 120).map { i =>
      val k = (rnd.nextInt(40) + 1).toLong // keys beyond base too
      val op = if (rnd.nextBoolean()) "upsert" else ChangeLog.DeleteOp
      (k, s"log$i", 200.0 + i, i.toLong, op)
    }.toDF("k", "payload", "v0", "ver", "op")
    val full = ChangeLog.applyChangeLog(base, log, Seq("k"), Seq("ver"))
      .orderBy("k").collect().toSeq
    val compacted = ChangeLog.compactChangeLog(log, Seq("k"), Seq("ver"))
    // compacted is key-cardinality
    assert(compacted.count() === log.select("k").distinct().count())
    val viaCompact = ChangeLog.applyChangeLog(base, compacted, Seq("k"), Seq("ver"))
      .orderBy("k").collect().toSeq
    assert(full === viaCompact)
  }

  test("q313: delete winners survive as tombstones") {
    val log = Seq(
      (1L, "a", 1.0, 1L, "upsert"),
      (1L, "b", 2.0, 2L, ChangeLog.DeleteOp))
      .toDF("k", "payload", "v0", "ver", "op")
    val c = ChangeLog.compactChangeLog(log, Seq("k"), Seq("ver")).collect()
    assert(c.length === 1)
    assert(c(0).getAs[String]("op") === ChangeLog.DeleteOp)
  }

  test("q313: registered surface is one net op per active customer") {
    val got = ChangeLog.compactedOrderLog(Tables(spark, sfDir).orders)
    val keys = got.select("o_custkey").distinct().count()
    assert(got.count() === keys)
  }

  test("q314: vectors are unit-norm, dims bounded, deterministic") {
    val got = TextAnalysis.featureHashing(Tables(spark, sfDir).documents).collect()
    assert(got.nonEmpty)
    assert(got.forall { r => val d = r.getAs[Int]("dim"); d >= 0 && d < 16 })
    // per-doc L2 norm ≈ 1 (rounded components)
    got.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rows) =>
      val n2 = rows.map(r => math.pow(r.getAs[Double]("val"), 2)).sum
      assert(math.abs(n2 - 1.0) < 0.01)
    }
    // identical text → identical vector (hash determinism)
    val d2 = Seq(
      (1L, "alpha beta gamma", "en", "web", 16L),
      (2L, "alpha beta gamma", "en", "web", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val v = TextAnalysis.featureHashing(d2).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rows) =>
        id -> rows.map(r => (r.getAs[Int]("dim"), r.getAs[Double]("val"))).sortBy(_._1).toSeq
      }
    assert(v(1L) === v(2L))
  }

  test("q314: opposite-sign collisions cancel instead of inflating") {
    // one token appearing n times scales the same dim linearly, so the
    // normalized vector is identical for 1× and 3× repetitions
    val d = Seq(
      (1L, "zzz", "en", "web", 3L),
      (2L, "zzz zzz zzz", "en", "web", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val v = TextAnalysis.featureHashing(d).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rows) =>
        id -> rows.map(r => (r.getAs[Int]("dim"), math.abs(r.getAs[Double]("val")))).toSeq
      }
    assert(v(1L) === v(2L))
  }
}
