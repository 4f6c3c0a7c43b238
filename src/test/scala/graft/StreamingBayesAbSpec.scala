package graft

import graft.operators.Relational
import graft.sources.Tables
import graft.streaming.StreamingBayesAb
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** stream_bayes_ab: incrementally accumulated per-arm count slices
  * reproduce the batch q394 posterior BIT-EXACTLY through the shared
  * kernel, and a replayed batch cannot double-count. */
class StreamingBayesAbSpec extends SparkSpec {
  lazy val events = Tables(spark, sfDir).events

  test("incremental batches ≡ the batch q394 posterior, bit-exact; replay idempotent") {
    val table = Files.createTempDirectory("graft-bayes").toString
    (0 until 3).foreach { b =>
      StreamingBayesAb.updateCountTable(
        events.filter(col("event_id") % 3 === b), table, batchId = b)
    }
    // replay batch 2 — overwrites its own slice only
    StreamingBayesAb.updateCountTable(
      events.filter(col("event_id") % 3 === 2), table, batchId = 2)

    val streamed = StreamingBayesAb.posteriorReport(spark, table).collect().head
    val batch = Relational.bayesAb(events).collect().head
    assert(streamed == batch,
      s"streamed posterior diverges from batch q394:\n$streamed\n$batch")
    assert(streamed.getAs[Long]("n_a") + streamed.getAs[Long]("n_b") == events.count())
  }

  test("the posterior moves toward the converting arm as evidence accumulates") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-bayes2").toString
    // find a user id in each arm via the same md5 parity the operator uses
    def armOf(u: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      if ("01234567".contains(hex.charAt(0))) "A" else "B"
    }
    val uA = (1L to 50L).find(armOf(_) == "A").get
    val uB = (1L to 50L).find(armOf(_) == "B").get
    // batch 0: balanced exposures, no conversions → P(A>B) ≈ 0.5
    val b0 = Seq.tabulate(20)(i => (if (i % 2 == 0) uA else uB, "view", 1.0))
      .toDF("user_id", "event_type", "value")
    StreamingBayesAb.updateCountTable(b0, table, batchId = 0)
    val p0 = StreamingBayesAb.posteriorReport(spark, table)
      .collect().head.getAs[Double]("prob_a_beats_b")
    // batch 1: arm A converts heavily — but exposure is still tiny, so
    // the minimum-exposure gate must hold the decision at inconclusive
    // (the normal approximation to the Beta posterior is least
    // trustworthy exactly here, the early-batch window)
    val b1 = Seq.tabulate(30)(_ => (uA, "purchase", 1.0))
      .toDF("user_id", "event_type", "value")
    StreamingBayesAb.updateCountTable(b1, table, batchId = 1)
    val r1 = StreamingBayesAb.posteriorReport(spark, table).collect().head
    assert(math.abs(p0 - 0.5) < 0.01, s"no-conversion start sits at 0.5: $p0")
    assert(r1.getAs[Double]("prob_a_beats_b") > 0.99, r1.toString)
    assert(r1.getAs[Long]("n_a") < Relational.BayesMinExposure)
    assert(r1.getAs[String]("decision") == "inconclusive",
      s"an early lucky streak must not ship: $r1")
    // batch 2: enough exposure on BOTH arms to clear the gate — the
    // posterior still favors A overwhelmingly, and NOW it may ship
    val b2 = Seq.tabulate(300)(i => (if (i % 2 == 0) uA else uB, "view", 1.0))
      .toDF("user_id", "event_type", "value")
    StreamingBayesAb.updateCountTable(b2, table, batchId = 2)
    val r2 = StreamingBayesAb.posteriorReport(spark, table).collect().head
    assert(r2.getAs[Long]("n_a") >= Relational.BayesMinExposure &&
      r2.getAs[Long]("n_b") >= Relational.BayesMinExposure)
    assert(r2.getAs[String]("decision") == "ship_a", r2.toString)
  }
}
