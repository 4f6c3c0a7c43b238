package graft

import graft.operators.{Classify, FeatureEng, Relational}
import org.apache.spark.sql.functions._

/** Ground-truth fixtures for the round-11 additions: WOE/IV binning
  * (q426), uplift deciles (q428), SRM guardrail (q429). */
class R11Spec extends SparkSpec {
  import spark.implicits._

  private def md5ArmA(user: Long): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(user.toString.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    "01234567".contains(hex.charAt(0))
  }

  test("q426 woeIv: planted separations give signed evidence and non-negative IV") {
    // bin 0 (price < 50k): 9 of 10 orders returned; bin 1 (50k..100k):
    // 1 of 10 returned — WOE must be positive where returns concentrate,
    // negative where they are depleted, and every IV term >= 0.
    val orders = ((1L to 10L).map(k => (k, 10000.0)) ++
      (11L to 20L).map(k => (k, 60000.0))).toDF("o_orderkey", "o_totalprice")
    val returned = ((1L to 9L) :+ 11L).map(k => (k, "R")) :+ ((10L, "N"))
    val lineitem = returned.toDF("l_orderkey", "l_returnflag")
    val rows = FeatureEng.woeIv(orders, lineitem).collect()
    assert(rows.map(_.getAs[Int]("bin")).toSeq == Seq(0, 1))
    val byBin = rows.map(r => r.getAs[Int]("bin") -> r).toMap
    assert(byBin(0).getAs[Long]("n_pos") == 9L && byBin(0).getAs[Long]("n_neg") == 1L)
    assert(byBin(1).getAs[Long]("n_pos") == 1L && byBin(1).getAs[Long]("n_neg") == 9L)
    assert(byBin(0).getAs[Double]("woe") > 0, "returns concentrate in bin 0")
    assert(byBin(1).getAs[Double]("woe") < 0, "returns depleted in bin 1")
    assert(rows.forall(_.getAs[Double]("iv_term") >= 0), "IV terms are non-negative")
  }

  test("q426 woeIv: bins partition the orders and counts reconcile") {
    val t = graft.sources.Tables(spark, sfDir)
    val rows = FeatureEng.woeIv(t.orders, t.lineitem).collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == t.orders.count())
    assert(rows.forall(r =>
      r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") == r.getAs[Long]("n_orders")))
  }

  test("q429 srmCheck: an all-A cohort flags, a parity-faithful count reconciles") {
    // users chosen so md5 parity puts every one of them in arm A — a
    // deliberately broken assignment the guardrail must flag loudly.
    val aUsers = (1L to 2000L).filter(md5ArmA).take(40)
    assert(aUsers.size == 40)
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val broken = aUsers.map(u => (u, ts0)).toDF("user_id", "ts")
    val flagged = Relational.srmCheck(broken).collect()
    assert(flagged.length == 1)
    assert(flagged.head.getAs[Long]("n_a") == 40L && flagged.head.getAs[Long]("n_b") == 0L)
    assert(flagged.head.getAs[Double]("chi2") == 40.0)
    assert(flagged.head.getAs[Boolean]("srm_flag"), "all-A day must flag SRM")
    // a mixed day: n_a + n_b = distinct users, chi2 consistent
    val mixed = (1L to 200L).map(u => (u, ts0)).toDF("user_id", "ts")
    val r = Relational.srmCheck(mixed).collect().head
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert(na + nb == 200L)
    val expected = math.floor((na - nb).toDouble * (na - nb) / (na + nb) * 10000 + 0.5) / 10000
    assert(r.getAs[Double]("chi2") == expected)
    assert((1L to 200L).count(md5ArmA) == na)
  }

  test("q428 upliftDeciles: planted persuadables concentrate uplift in the top decile") {
    // score: high scorers are users 1..100 (20 views), the rest get 1
    // view. Conversions: in the HIGH-score group only arm-A users
    // convert (pure persuadables); in the low group nobody converts.
    // The top decile must then show uplift == rate_t == 1, and every
    // low-score decile shows 0/null uplift.
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val rows = (1L to 1000L).flatMap { u =>
      val high = u <= 100
      val views = if (high) 20 else 1
      val conv = high && md5ArmA(u)
      Seq.fill(views)((u, "view", ts0)) ++ (if (conv) Seq((u, "purchase", ts0)) else Nil)
    }
    val events = rows.toDF("user_id", "event_type", "ts")
    val out = Classify.upliftDeciles(events).collect()
    assert(out.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    assert(out.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c")).sum == 1000L)
    val top = out.head
    assert(top.getAs[Double]("rate_t") == 1.0, "every treated high-scorer converted")
    assert(top.getAs[Double]("rate_c") == 0.0)
    assert(top.getAs[Double]("uplift") == 1.0)
    assert(out.tail.forall(r => r.getAs[Long]("conv_t") == 0L && r.getAs[Long]("conv_c") == 0L),
      "no conversions outside the top decile")
  }

  test("q428 upliftDeciles: decile sizes follow the ntile fill rule on the sf fixture") {
    val t = graft.sources.Tables(spark, sfDir)
    val out = Classify.upliftDeciles(t.events).collect()
    val sizes = out.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c"))
    val n = sizes.sum
    val q = n / 10; val rem = (n % 10).toInt
    val expected = (0 until 10).map(i => if (i < rem) q + 1 else q)
    assert(sizes.toSeq == expected, s"ntile fill rule: $n users -> ${expected.mkString(",")}")
  }
}
