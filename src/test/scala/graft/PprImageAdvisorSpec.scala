package graft

import graft.operators.{Graph, Multimodal}
import graft.plans.PartitionAdvisor
import graft.sources.Tables

/** Ground truth for personalized PageRank (q310), perceptual image
  * near-dup (q311), and the partition-layout advisor (q312). */
class PprImageAdvisorSpec extends SparkSpec {
  import spark.implicits._

  test("q310: hand-traced seeded random walk on a 3-node path") {
    // orders→parts: four orders pair part 1 with 2 and 3 (support 2
    // each); (2,3) co-occurs once → dropped. Seed = part 1 (degree 4).
    // r1 = {1:.125, 2:.4375, 3:.4375}
    // r2 = {1:.890625, 2:.0546875, 3:.0546875} — exact binary
    val li = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 1L), (4L, 3L),
      (5L, 2L), (5L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val got = Graph.personalizedPageRank(li).collect()
      .map(r => r.getAs[Long]("part") -> r.getAs[Double]("ppr_x1000")).toMap
    assert(got(1L) === 890.625)
    assert(got(2L) === 54.6875)
    assert(got(3L) === 54.6875)
  }

  test("q310: restart mass keeps the walk near the seed on the real graph") {
    val got = Graph.personalizedPageRank(Tables(spark, sfDir).lineitem).collect()
    assert(got.nonEmpty)
    val seed = got.head.getAs[Long]("seed_part")
    // the seed itself carries the restart mass → ranks first
    assert(got.head.getAs[Long]("part") === seed)
    assert(got.forall(_.getAs[Double]("ppr_x1000") >= 0.0))
  }

  private def png(px: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      px, px, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until px; x <- 0 until px) {
      val g = gray(x, y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("q311: scale-invariant match, near-match, and distinct images") {
    // 1: flat 8×8; 2: flat 16×16 (same content, different encoding and
    // size → identical aHash); 3: half-bright/half-dark; 4: = 3 with one
    // pixel flipped (Hamming 1 from 3, no bands shared with 1/2)
    val payloads = Seq(
      (1L, png(8, (_, _) => 100)),
      (2L, png(16, (_, _) => 100)),
      (3L, png(8, (x, _) => if (x < 4) 200 else 50)),
      (4L, png(8, (x, y) => if (x == 0 && y == 0) 50 else if (x < 4) 200 else 50))
    ).toDF("doc_id", "payload")
    val got = Multimodal.imageNearDupPairs(spark, payloads).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
    assert(got.contains((1L, 2L, 0L))) // re-encoded + rescaled → same hash
    assert(got.exists { case (a, b, h) => a == 3L && b == 4L && h <= 2L })
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 3L) || Set(a, b) == Set(2L, 3L) })
  }

  test("q311: report runs over the synthetic corpus payloads") {
    val r = Multimodal.imageNearDupReport(spark, Tables(spark, sfDir).documents).head()
    assert(r.getAs[Long]("n_images") === Tables(spark, sfDir).documents.count())
    assert(r.getAs[Long]("n_neardup_pairs") >= 0L)
  }

  test("q312: rejects over-partitioned keys, ranks a balanced key first") {
    val got = PartitionAdvisor.advise(
      Tables(spark, sfDir).events, targetRowsPerPartition = 100L, maxPartitions = 500L)
      .collect()
    val byName = got.map(r => r.getAs[String]("candidate") -> r).toMap
    assert(byName("event_id").getAs[String]("verdict") === "reject")
    assert(byName("event_id").getAs[String]("reason").contains("small-file"))
    assert(byName("date(ts)").getAs[String]("verdict") === "ok")
    // rank 1 is an 'ok' candidate with the best fit
    val first = got.find(_.getAs[Long]("rank") == 1L).get
    assert(first.getAs[String]("verdict") === "ok")
  }

  test("q312: constant and skewed columns get called out") {
    val df = Seq.tabulate(100)(i => (i.toLong, "same", if (i < 90) "hot" else s"v$i"))
      .toDF("id", "const_col", "skew_col")
    val got = PartitionAdvisor.advise(df, 10L, 1000L).collect()
      .map(r => r.getAs[String]("candidate") -> r).toMap
    assert(got("const_col").getAs[String]("verdict") === "reject")
    assert(got("const_col").getAs[String]("reason").contains("constant"))
    assert(got("skew_col").getAs[String]("verdict") === "warn")
    assert(got("skew_col").getAs[String]("reason").contains("skewed"))
  }
}
