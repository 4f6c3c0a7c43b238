package graft

import graft.operators.ChangeLog
import graft.sources.Tables
import graft.streaming.{HiveBatchSink, TableMaintenance}
import org.apache.spark.sql.functions._

class ChangeLogSpec extends SparkSpec {
  import spark.implicits._
  lazy val t = Tables(spark, sfDir)
  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft-cl").toString

  test("q269 applyChangeLog: upsert/delete/reinsert semantics, order-insensitive") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    // deliberately shuffled input order: the winner window must not care
    val log = Seq(
      (4L, "d2", 44.0, 2L, "upsert"),  // delete-then-reinsert: v2 wins
      (2L, "b1", 21.0, 1L, "upsert"),  // revises base k=2
      (3L, "c1", 0.0, 1L, ChangeLog.DeleteOp), // tombstones base k=3
      (4L, "d1", 40.0, 1L, ChangeLog.DeleteOp),
      (5L, "e1", 0.0, 1L, ChangeLog.DeleteOp), // delete of a never-held key: no-op
      (2L, "b2", 22.0, 2L, "upsert")   // later version beats b1
    ).toDF("k", "name", "v", "ver", "op")
    val got = ChangeLog.applyChangeLog(base, log, Seq("k"), Seq("ver"))
      .select("k", "name", "v").as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a", 10.0), (2L, "b2", 22.0), (4L, "d2", 44.0)))
  }

  test("q269 equal-version tie: upsert outranks delete (CDC delete-old+insert-new replays to the insert)") {
    val base = Seq((1L, 1.0)).toDF("k", "v")
    val log = Seq(
      (1L, 1.0, 7L, ChangeLog.DeleteOp), // same changeId deletes the old row...
      (1L, 2.0, 7L, "insert")            // ...and inserts the revision
    ).toDF("k", "v", "ver", "op")
    val got = ChangeLog.applyChangeLog(base, log, Seq("k"), Seq("ver"))
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2.0)))
  }

  test("q269 distributed CDC replay: applyChangeLog(pre-state, feed) == post-state") {
    val root = tmp(); val cl = tmp() + "/changes"
    val sink = new HiveBatchSink(spark, root)
    def toDf(rows: Seq[(Long, String, Long, Double)]) =
      rows.toDF("event_id", "ts_s", "user_id", "value")
        .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"), col("user_id"), col("value"))
    sink.writeBatch(toDf(Seq(
      (1L, "2026-01-01T00:10:00Z", 7L, 1.0), (2L, "2026-01-01T00:20:00Z", 8L, 2.0),
      (3L, "2026-01-01T01:10:00Z", 9L, 3.0))), batchId = 0)
    sink.sealClosed(java.sql.Timestamp.valueOf("2026-02-01 00:00:00"))
    val pre = sink.readTable().select("event_id", "ts", "user_id", "value").cache()
    pre.count()

    TableMaintenance.deleteWhere(spark, sink, col("user_id") === 7L, changeLog = Some((cl, 1L)))
    TableMaintenance.upsert(spark, sink, toDf(Seq(
      (2L, "2026-01-01T00:20:00Z", 8L, 20.0), (4L, "2026-01-01T02:10:00Z", 5L, 40.0))),
      Seq("event_id"), changeLog = Some((cl, 2L)))
    val post = sink.readTable().select("event_id", "value").as[(Long, Double)].collect().toMap

    // the operator replay: feed versioned by change_id, payload aligned to pre
    val feed = spark.read.parquet(cl)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"),
        col("change_id").as("ver"), col("op"))
    val replayed = ChangeLog.applyChangeLog(pre, feed, Seq("event_id"), Seq("ver"))
      .select("event_id", "value").as[(Long, Double)].collect().toMap
    assert(replayed == post, s"replayed $replayed vs post $post")
  }

  test("q269 mor read: winners are never finalized orders, base survives only untouched keys") {
    val got = ChangeLog.morCurrentOrders(t.orders).cache()
    val n = got.count()
    assert(n > 0)
    // one row per customer, at most
    assert(got.select("o_custkey").distinct().count() == n)
    // every post-cutoff winner that landed is an upsert: its (custkey,
    // orderkey) must exist in orders as a non-'F' row
    val winners = got.filter(col("cur_date") >= "1997-01-01")
    val bad = winners.join(
      t.orders.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"), col("o_orderkey").as("cur_orderkey")),
      Seq("o_custkey", "cur_orderkey"), "left_semi").count()
    assert(bad == 0, s"$bad finalized orders won the merge")
    got.unpersist()
  }
}
