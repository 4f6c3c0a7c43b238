package graft

import graft.sources.OffsetLog
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bus-shape source contract: per-partition contiguous offsets,
  * metadata-only head, name-pruned range reads, committed consumer
  * groups, replayable ranges. */
class OffsetLogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-offsetlog").toString
  private val P = 4

  private def batch(ids: Range) =
    ids.map(i => (s"k${i % 7}", i.toLong, s"payload-$i")).toDF("k", "n", "payload")

  test("append assigns per-partition contiguous offsets; endOffsets is metadata-only") {
    val root = tmp()
    val e1 = OffsetLog.append(spark, root, batch(0 until 50), "k", P)
    val e2 = OffsetLog.append(spark, root, batch(50 until 80), "k", P)
    assert(e1.values.sum == 50 && e2.values.sum == 80)
    val all = OffsetLog.readBatch(spark, root, P, Map.empty, Map.empty)
    // offsets contiguous 0..n-1 within each partition
    val perPart = all.groupBy("partition")
      .agg(count(lit(1)).as("n"), min("offset").as("lo"), max("offset").as("hi"))
      .collect()
    perPart.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
    }
    // the metadata head equals the data head
    val dataEnds = perPart.map(r => r.getAs[Int]("partition") -> (r.getAs[Long]("hi") + 1)).toMap
    assert(e2.filter(_._2 > 0) == dataEnds)
    // same key always lands in the same partition (per-key total order)
    val kparts = all.groupBy("k").agg(countDistinct("partition").as("np")).collect()
    kparts.foreach(r => assert(r.getAs[Long]("np") == 1L))
  }

  test("a consumer started before the first producer append sees an empty caught-up batch, not a crash") {
    val root = tmp()
    // no segments at all: drain must return an empty frame (schema from
    // the caller when supplied), never throw
    val (d0, ends0) = OffsetLog.drain(spark, root, "early", P)
    assert(d0.count() == 0 && ends0.values.forall(_ == 0L))
    val s = batch(0 until 1).schema
    val (d1, _) = OffsetLog.drain(spark, root, "early", P, Some(s))
    assert(d1.count() == 0 && d1.schema == s)
    // the producer shows up later; the same group then drains normally
    OffsetLog.append(spark, root, batch(0 until 10), "k", P)
    val (d2, ends2) = OffsetLog.drain(spark, root, "early", P)
    assert(d2.count() == 10)
    OffsetLog.commit(spark, root, "early", ends2)
    assert(OffsetLog.drain(spark, root, "early", P)._1.count() == 0)
  }

  test("drain → commit → drain consumes each record exactly once; uncommitted ranges replay") {
    val root = tmp()
    OffsetLog.append(spark, root, batch(0 until 40), "k", P)
    val (d1, ends1) = OffsetLog.drain(spark, root, "g1", P)
    assert(d1.count() == 40)
    // crash before commit: the same range replays identically
    val (d1again, _) = OffsetLog.drain(spark, root, "g1", P)
    assert(d1again.orderBy("partition", "offset").collect().toSeq ==
      d1.orderBy("partition", "offset").collect().toSeq)
    OffsetLog.commit(spark, root, "g1", ends1)
    assert(OffsetLog.committed(spark, root, "g1") == ends1)
    // caught up: empty frame, schema intact
    val (empty, _) = OffsetLog.drain(spark, root, "g1", P)
    assert(empty.count() == 0)
    assert(empty.columns.contains("offset") && empty.columns.contains("partition"))
    // new appends: only the new records arrive
    OffsetLog.append(spark, root, batch(40 until 55), "k", P)
    val (d2, ends2) = OffsetLog.drain(spark, root, "g1", P)
    assert(d2.count() == 15)
    assert(d2.agg(min("n")).head().getLong(0) == 40L)
    OffsetLog.commit(spark, root, "g1", ends2)
    // a second group is independent and sees the whole log
    val (dAll, _) = OffsetLog.drain(spark, root, "g2", P)
    assert(dAll.count() == 55)
  }

  test("range reads prune segments by name before opening files") {
    val root = tmp()
    val e1 = OffsetLog.append(spark, root, batch(0 until 60), "k", P)
    val e2 = OffsetLog.append(spark, root, batch(60 until 120), "k", P)
    val e3 = OffsetLog.append(spark, root, batch(120 until 180), "k", P)
    assert(e3.values.sum == 180)
    // tail read: only the third append's segments are opened
    val tail = OffsetLog.readBatch(spark, root, P, e2, e3)
    assert(tail.count() == 60)
    val opened = tail.inputFiles.toSeq
    assert(opened.nonEmpty && opened.forall { f =>
      val name = f.split('/').last
      val start = name.stripPrefix("segment-").split("-")(0).toLong
      val p = f.split('/').init.last.stripPrefix("partition=").toInt
      start >= e2(p)
    }, s"tail read opened non-tail segments: $opened")
    // historical replay of the middle range is exact and repeatable
    val mid1 = OffsetLog.readBatch(spark, root, P, e1, e2).orderBy("partition", "offset").collect()
    val mid2 = OffsetLog.readBatch(spark, root, P, e1, e2).orderBy("partition", "offset").collect()
    assert(mid1.toSeq == mid2.toSeq && mid1.length == 60)
  }

  test("lag report: caught-up group reads lag 0, a lagging group reads exactly the undrained rows, retention breach flags") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-lag").toString
    val P = 4
    val events = graft.sources.Tables(spark, sfDir).events
    OffsetLog.append(spark, root, events.limit(100), "user_id", P)
    // group "fast" drains and commits; group "slow" never commits
    val (batch, ends) = OffsetLog.drain(spark, root, "fast", P)
    assert(batch.count() == 100)
    OffsetLog.commit(spark, root, "fast", ends)
    OffsetLog.append(spark, root,
      events.exceptAll(events.limit(100)).limit(40), "user_id", P)
    val rep = OffsetLog.lagReport(spark, root, P, Seq("fast", "slow"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    val fastLag = (0 until P).map(p => rep(("fast", p)).getAs[Long]("lag_rows")).sum
    val slowLag = (0 until P).map(p => rep(("slow", p)).getAs[Long]("lag_rows")).sum
    assert(fastLag == 40, s"fast group owes exactly the new tranche: $fastLag")
    assert(slowLag == 140, s"uncommitted group owes everything: $slowLag")
    assert(rep.values.forall(!_.getAs[Boolean]("behind_retention")))
    // expire the oldest segment of one partition: the slow group's
    // cursor (0) is now behind the retained tail — flagged, not silent
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val SegRe = "segment-(\\d+)-(\\d+)\\.parquet".r
    val victim = (0 until P).flatMap { p =>
      val d = new org.apache.hadoop.fs.Path(s"$root/partition=$p")
      f.listStatus(d).toSeq.collect {
        case st if SegRe.findFirstIn(st.getPath.getName).isDefined &&
          st.getPath.getName.startsWith("segment-0-") => (p, st.getPath)
      }
    }.head
    f.delete(victim._2, false)
    val rep2 = OffsetLog.lagReport(spark, root, P, Seq("fast", "slow"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    assert(rep2(("slow", victim._1)).getAs[Boolean]("behind_retention"),
      "a cursor behind the retained tail must flag")
    assert(!rep2(("fast", victim._1)).getAs[Boolean]("behind_retention"),
      "the caught-up group is unaffected by tail expiry")
  }
}
