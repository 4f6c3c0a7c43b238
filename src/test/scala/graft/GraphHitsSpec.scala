package graft

import graft.operators.{EventAnalytics, Graph}

/** Ground truth for HITS hubs/authorities (q292) and next-event
  * conditional entropy (q297). */
class GraphHitsSpec extends SparkSpec {
  import spark.implicits._

  test("q292: hand-traced two-supplier bipartite HITS") {
    // edges: s1→{p1,p2}, s2→{p1} (duplicate lines must collapse)
    // m=3; h1: s1=2/3, s2=1/3; a1raw: p1=1, p2=2/3; za=5/3
    // a1: p1=0.6, p2=0.4; h2raw: s1=1.0, s2=0.6; zh=1.6
    // h2: s1=0.625, s2=0.375
    val lineitem = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 1L)
    ).toDF("l_suppkey", "l_partkey")
    val got = Graph.hits(lineitem).collect()
      .map(r => (r.getAs[String]("role"), r.getAs[Long]("node_id"),
        r.getAs[Double]("score_x1000"), r.getAs[Long]("rank")))
    assert(got.toSet === Set(
      ("authority", 1L, 600.0, 1L), ("authority", 2L, 400.0, 2L),
      ("hub", 1L, 625.0, 1L), ("hub", 2L, 375.0, 2L)))
  }

  test("q292: scores are L1-normalized within each role") {
    val t = sources.Tables(spark, sfDir)
    val got = Graph.hits(t.lineitem, topN = 1000000).collect()
    val byRole = got.groupBy(_.getAs[String]("role"))
    for ((_, rows) <- byRole) {
      val s = rows.map(_.getAs[Double]("score_x1000")).sum / 1000.0
      assert(math.abs(s - 1.0) < 1e-3)
      // ranks are 1..n with no gaps
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to rows.length).toSeq)
    }
  }

  private def ev(rows: Seq[(Long, String, String)]) =
    rows.zipWithIndex.map { case ((uid, tsS, tpe), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(tsS), uid, tpe, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("q297: hand-traced conditional entropy with a 50/50 branch") {
    // user1: A,B,C,B → A→B, B→C, C→B ; user2: A,C → A→C
    // after A: {B:1, C:1} → 1 bit, top B (count tie, alphabetical)
    // after B: {C:1} → 0 bits ; after C: {B:1} → 0 bits
    val got = EventAnalytics.nextEventEntropy(ev(Seq(
      (1L, "1997-01-01 00:00:01", "A"),
      (1L, "1997-01-01 00:00:02", "B"),
      (1L, "1997-01-01 00:00:03", "C"),
      (1L, "1997-01-01 00:00:04", "B"),
      (2L, "1997-01-01 00:00:01", "A"),
      (2L, "1997-01-01 00:00:02", "C")))).collect()
    val byPrev = got.map(r => r.getAs[String]("prev_type") -> r).toMap
    assert(byPrev("A").getAs[Double]("entropy_bits") === 1.0)
    assert(byPrev("A").getAs[String]("top_next") === "B")
    assert(byPrev("A").getAs[Double]("top_share") === 0.5)
    assert(byPrev("A").getAs[Long]("n_next_types") === 2L)
    assert(byPrev("B").getAs[Double]("entropy_bits") === 0.0)
    assert(byPrev("B").getAs[Double]("top_share") === 1.0)
    assert(byPrev("C").getAs[Double]("entropy_bits") === 0.0)
  }

  test("q297: entropy bounded by log2 of next-type cardinality on real events") {
    val t = sources.Tables(spark, sfDir)
    val got = EventAnalytics.nextEventEntropy(t.events).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      val k = r.getAs[Long]("n_next_types").toDouble
      assert(h >= -1e-9 && h <= math.log(k) / math.log(2.0) + 1e-9)
    }
  }
}
