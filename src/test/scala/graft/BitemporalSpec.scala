package graft

import graft.operators.EventAnalytics
import graft.streaming.{Bitemporal, SnapshotStore}
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Bitemporal (valid × transaction time): a late correction revises
  * CURRENT belief about the past without rewriting what was believed
  * at publish time — old snapshots reproduce old reports exactly. */
class BitemporalSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ev(id: Long, minute: Long, uid: Long, v: Double) =
    (id, new Timestamp(t0 + minute * 60000L), uid, "purchase", v, "{}")
  private def us(minute: Long) = (t0 + minute * 60000L) * 1000L

  test("asOf(old snapshot) preserves the superseded belief; current sees the correction") {
    val dir = Files.createTempDirectory("graft-bitemporal").toString
    // initial history: user 1 at tier 10 from minute 0
    val events1 = Seq(ev(1, 0, 1L, 10.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dim1 = EventAnalytics.scd2Build(events1)
    val snap1 = SnapshotStore.writeSnapshot(spark, dir, dim1)

    // LATE correction arrives: user 1 had actually moved to tier 20 at
    // minute 5 — merge re-derives the history, publish a NEW snapshot
    val late = Seq(ev(2, 5, 1L, 20.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dim2 = EventAnalytics.scd2Merge(SnapshotStore.readAt(spark, dir, snap1), late)
    val snap2 = SnapshotStore.writeSnapshot(spark, dir, dim2)

    val validAt = us(7) // valid-time minute 7, after the late change
    // transaction time snap1: we still believed tier 10 at minute 7
    val believedThen = Bitemporal.asOf(spark, dir, snap1, validAt).collect()
    assert(believedThen.length === 1)
    assert(believedThen(0).getAs[Double]("tier") === 10.0)
    // transaction time NOW: the corrected history says tier 20
    val believedNow = Bitemporal.asOfCurrent(spark, dir, validAt).collect()
    assert(believedNow.length === 1)
    assert(believedNow(0).getAs[Double]("tier") === 20.0)
    assert(SnapshotStore.current(spark, dir).contains(snap2))

    // valid-time BEFORE the correction reads tier 10 in both worlds
    val early = us(2)
    assert(Bitemporal.asOf(spark, dir, snap1, early).head().getAs[Double]("tier") === 10.0)
    assert(Bitemporal.asOfCurrent(spark, dir, early).head().getAs[Double]("tier") === 10.0)

    // valid-time before ANY history → empty cut, both transaction times
    assert(Bitemporal.asOf(spark, dir, snap1, us(-1)).isEmpty)
    assert(Bitemporal.asOfCurrent(spark, dir, us(-1)).isEmpty)
  }
}
