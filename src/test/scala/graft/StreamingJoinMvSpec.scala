package graft

import graft.plans.JoinViewMaintenance._
import graft.streaming.StreamingJoinMv
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** mv_join_stream: a weighted tagged delta feed drives foreachBatch
  * maintenance of the join view — after any sequence of micro-batches
  * (inserts, retractions, dim updates) the maintained view equals the
  * from-scratch recompute of the maintained bases. */
class StreamingJoinMvSpec extends SparkSpec {
  import spark.implicits._

  private val aCols = Seq("o_orderkey", "cust", "total")
  private val bCols = Seq("cust", "segment")

  private def tagged(side: String, rows: Seq[(Long, Long, Double, String)], w: Long) =
    rows.toDF("o_orderkey", "cust", "total", "segment")
      .withColumn("side", lit(side))
      .withColumn("__w", lit(w))
      .select("side", "o_orderkey", "cust", "total", "segment", "__w")

  test("3 micro-batches of inserts, retractions and dim churn ≡ recompute") {
    val a0 = weighted(Seq((1L, 10L, 5.0)).toDF("o_orderkey", "cust", "total"))
    val b0 = weighted(Seq((10L, "BLD"), (11L, "MCH")).toDF("cust", "segment"))
    val mv = new StreamingJoinMv(Seq("cust"), a0, b0)

    // slice 0: two new orders (one for a dim key arriving in the SAME
    // batch — only the ΔA⋈ΔB cross term can join it)
    val s0 = tagged("A", Seq((2L, 11L, 7.0, null), (3L, 12L, 9.0, null)), 1L)
      .unionByName(tagged("B", Seq((0L, 12L, 0.0, "AUTO")), 1L))
    // slice 1: retract order 1
    val s1 = tagged("A", Seq((1L, 10L, 5.0, null)), -1L)
    // slice 2: customer 11 re-segments (retract old row, insert new)
    val s2 = tagged("B", Seq((0L, 11L, 0.0, "MCH")), -1L)
      .unionByName(tagged("B", Seq((0L, 11L, 0.0, "MCH2")), 1L))

    val in = Files.createTempDirectory("graft-jmv").toString
    Seq(s0, s1, s2).zipWithIndex.foreach { case (df, s) =>
      val tmp = Files.createTempDirectory(s"graft-jmv-s$s").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(in, f"slice$s%02d.parquet")
      Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + s * 60000L)
    }
    val base = spark.read.parquet(in)
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        mv.applyBatch(batch, aCols, bCols)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("cust"),
        r.getAs[Double]("total"), r.getAs[String]("segment"), r.getAs[Long]("__w"))).toSet
    val recomputed = consolidate(joinView(mv.baseA, mv.baseB, Seq("cust")))
    assert(asSet(mv.view) == asSet(recomputed),
      s"maintained view drifted from recompute:\n${asSet(mv.view)}\nvs\n${asSet(recomputed)}")
    // order 1 retracted; orders 2 (now MCH2), 3 (AUTO) remain
    assert(asSet(mv.view).map(r => (r._1, r._4)) == Set((2L, "MCH2"), (3L, "AUTO")))
    assert(asSet(mv.view).forall(_._5 == 1L), "all multiplicities consolidate to +1")
  }
}
