package graft

import graft.sources.Tables
import graft.streaming.SnapshotStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Snapshot-isolation guarantees: a compaction rewrite never disturbs a
  * concurrent reader of the previous snapshot; reclaim is explicit. */
class SnapshotStoreSpec extends SparkSpec {
  lazy val t = Tables(spark, sfDir)

  private def tmp(): String = Files.createTempDirectory("graft-snap").toString

  private def dirs(root: String): Set[String] =
    new java.io.File(root).listFiles().map(_.getName).filter(_.startsWith("snap-")).toSet

  private def nFiles(dir: String): Int =
    new java.io.File(dir).listFiles().count(f => f.getName.endsWith(".parquet"))

  test("write → compact → vacuum lifecycle with reader isolation") {
    val part = tmp()
    val src  = t.events.filter(col("event_type") === "click")
    val n    = src.count()

    // initial load: fragmented (8 files), pointer at snap-000001
    val s1 = SnapshotStore.writeSnapshot(spark, part, src, targetFiles = 8)
    assert(s1 == "snap-000001")
    assert(SnapshotStore.current(spark, part).contains(s1))
    assert(nFiles(s"$part/$s1") == 8)
    assert(SnapshotStore.read(spark, part).count() == n)

    // a reader plans against the CURRENT snapshot before the rewrite…
    val oldResolved = SnapshotStore.resolve(spark, part).get
    val oldReader   = spark.read.parquet(oldResolved)

    // …compaction rewrites to 1 file and swaps the pointer…
    val s2 = SnapshotStore.compact(spark, part, targetFiles = 1)
    assert(s2 == "snap-000002")
    assert(SnapshotStore.current(spark, part).contains(s2))
    assert(nFiles(s"$part/$s2") == 1)

    // …and the old reader still scans its immutable file set untouched
    assert(dirs(part) == Set(s1, s2))
    assert(oldReader.count() == n)

    // new reads resolve the compacted snapshot with identical content
    val before = src.agg(round(sum("value"), 4)).first().getDouble(0)
    val after  = SnapshotStore.read(spark, part).agg(round(sum("value"), 4)).first().getDouble(0)
    assert(before == after)
    assert(SnapshotStore.read(spark, part).count() == n)

    // time travel: both retained versions readable by name, same content
    assert(SnapshotStore.snapshots(spark, part) == Seq(s1, s2))
    assert(SnapshotStore.readAt(spark, part, s1).count() == n)
    assert(SnapshotStore.readAt(spark, part, s2).count() == n)

    // vacuum reclaims exactly the superseded snapshot
    assert(SnapshotStore.vacuum(spark, part) == 1)
    assert(dirs(part) == Set(s2))
    assert(SnapshotStore.read(spark, part).count() == n)

    // the vacuumed version is gone for time travel, with a clear error
    assertThrows[IllegalArgumentException](SnapshotStore.readAt(spark, part, s1))
  }

  test("bulk compaction rewrites many partitions in one job with per-partition isolation") {
    val root = tmp()
    val ev = graft.operators.EventAnalytics.withPartitionKeys(t.events)
    // initialize three partitions, fragmented
    val parts = ev.select("dt", "hr").distinct().orderBy("dt", "hr").limit(3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val counts = parts.map { case (dt, hr) =>
      val slice = ev.filter(col("dt") === dt && col("hr") === hr).drop("dt", "hr")
      SnapshotStore.writeSnapshot(spark, s"$root/dt=$dt/hr=$hr", slice, targetFiles = 4)
      (dt, hr) -> slice.count()
    }.toMap

    // readers planned against the pre-compaction snapshots
    val oldReaders = parts.map { case (dt, hr) =>
      (dt, hr) -> spark.read.parquet(SnapshotStore.resolve(spark, s"$root/dt=$dt/hr=$hr").get)
    }

    val promoted = SnapshotStore.compactPartitions(spark, root, parts)
    assert(promoted == Seq.fill(3)("snap-000002"))
    parts.foreach { case (dt, hr) =>
      val partDir = s"$root/dt=$dt/hr=$hr"
      assert(SnapshotStore.current(spark, partDir).contains("snap-000002"))
      assert(nFiles(s"$partDir/snap-000002") == 1, "bulk compaction should produce one file per partition")
      assert(SnapshotStore.read(spark, partDir).count() == counts((dt, hr)))
      assert(dirs(partDir) == Set("snap-000001", "snap-000002"), "old snapshot must survive the rewrite")
    }
    oldReaders.foreach { case ((dt, hr), r) => assert(r.count() == counts((dt, hr))) }
    // temp staging is gone
    assert(!new java.io.File(root).listFiles().exists(_.getName.startsWith("_compact_tmp")))
  }

  test("two concurrent compactions: one wins cleanly, no snapshot is lost") {
    val part = tmp()
    val src  = t.events.limit(200)
    val n    = src.count()
    SnapshotStore.writeSnapshot(spark, part, src, targetFiles = 4)

    // race two compactions from two threads. The writer lock serializes
    // the read→write→swap critical sections: depending on timing either
    // both run back-to-back (snap-2 then snap-3) or the loser fails fast
    // with the concurrent-writer error — never a corrupt dir or lost rows.
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool  = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val outcomes = (1 to 2).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, String]] {
        def call(): Either[Throwable, String] = {
          start.await()
          try Right(SnapshotStore.compact(spark, part, targetFiles = 1))
          catch { case e: Throwable => Left(e) }
        }
      })
    }
    start.countDown()
    val results = outcomes.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()

    val winners = results.collect { case Right(name) => name }
    val losers  = results.collect { case Left(e) => e }
    assert(winners.nonEmpty, s"at least one compaction must win; got $results")
    losers.foreach(e =>
      assert(e.getMessage != null && e.getMessage.contains("concurrent writer"),
        s"loser must fail with the lock error, not $e"))
    winners.foreach(w => assert(w == "snap-000002" || w == "snap-000003"))
    assert(winners.distinct.size == winners.size, "two writers can never claim the same snapshot name")

    // the pointer names a complete, readable snapshot with all rows
    val live = SnapshotStore.current(spark, part).get
    assert(winners.contains(live))
    assert(SnapshotStore.read(spark, part).count() == n)
    // every retained snapshot (initial + each winner) is intact
    SnapshotStore.snapshots(spark, part).foreach(s =>
      assert(SnapshotStore.readAt(spark, part, s).count() == n))
    // the lock was released: a subsequent writer proceeds normally
    val after = SnapshotStore.compact(spark, part, targetFiles = 1)
    assert(SnapshotStore.current(spark, part).contains(after))
  }

  test("a stale writer lock (crashed holder) is broken after the TTL; a fresh one blocks") {
    val part = tmp()
    val src  = t.events.limit(50)
    SnapshotStore.writeSnapshot(spark, part, src)

    // fresh foreign lock → writers fail fast with a clear error
    val lock = new java.io.File(part, "_WRITER_LOCK")
    assert(lock.createNewFile())
    val e = intercept[IllegalStateException](SnapshotStore.compact(spark, part))
    assert(e.getMessage.contains("concurrent writer"))

    // age the lock past the TTL → next writer breaks it and proceeds
    assert(lock.setLastModified(System.currentTimeMillis() - SnapshotStore.LockTtlMs - 60000))
    val s2 = SnapshotStore.compact(spark, part)
    assert(SnapshotStore.current(spark, part).contains(s2))
    assert(!lock.exists(), "the broken lock must not linger after release")
  }

  test("breaking a stale lock that was replaced by a FRESH one mid-break restores it and reports contention") {
    // the two-writer race the uuid-verified break closes: A observed the
    // stale lock, but before A's rename, B broke it and created a fresh
    // uuid-bearing lock. A's rename then yanks B's lock — the verify
    // step must detect the uuid mismatch, put B's lock back, and throw,
    // instead of letting A acquire alongside B.
    val part = tmp()
    val lock = new java.io.File(part, "_WRITER_LOCK")
    val freshBody = java.util.UUID.randomUUID().toString + " " + System.currentTimeMillis()
    java.nio.file.Files.write(lock.toPath, freshBody.getBytes("UTF-8"))
    val f = new org.apache.hadoop.fs.Path(part)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val e = intercept[IllegalStateException](
      SnapshotStore.breakStaleLock(
        f, new org.apache.hadoop.fs.Path(part, "_WRITER_LOCK"), part,
        observedId = Some("stale-uuid-that-was-already-broken"), observedMtime = 0L))
    assert(e.getMessage.contains("concurrent writer"))
    assert(lock.exists(), "the fresh lock must be restored after a mistaken break")
    assert(new String(java.nio.file.Files.readAllBytes(lock.toPath), "UTF-8") == freshBody,
      "the restored lock must be the fresh holder's, byte-for-byte")
    assert(!new java.io.File(part).listFiles().exists(_.getName.contains("broken")),
      "no tombstone may linger")
  }

  test("a crash between snapshot write and pointer swap leaves the previous snapshot live; vacuum reclaims the orphan") {
    val part = tmp()
    val src  = t.events.limit(100)
    val s1   = SnapshotStore.writeSnapshot(spark, part, src)

    // simulate the crash: the next snapshot dir lands fully, but the
    // pointer never moves (write the files exactly as compact would)
    src.repartition(1).write.parquet(s"$part/snap-000002")
    assert(SnapshotStore.current(spark, part).contains(s1))
    assert(SnapshotStore.read(spark, part).count() == 100)

    // vacuum removes the orphan; the live snapshot survives
    assert(SnapshotStore.vacuum(spark, part) == 1)
    assert(dirs(part) == Set(s1))
    assert(SnapshotStore.read(spark, part).count() == 100)

    // and the next writer does not collide with the reclaimed name space
    val s3 = SnapshotStore.writeSnapshot(spark, part, src)
    assert(s3 == "snap-000002")
    assert(SnapshotStore.read(spark, part).count() == 100)
  }
}
