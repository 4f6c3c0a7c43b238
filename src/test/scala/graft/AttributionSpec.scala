package graft

import graft.operators.{EventAnalytics, Relational}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** q219 Markov removal-effect attribution + q220 sketch overlap. */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, second: Long, uid: Long, typ: String) =
    (id, new Timestamp(1700000000000L + second * 1000L), uid, typ, 1.0, "{}")

  private def events(rows: Seq[(Long, Long, Long, String)]) =
    rows.map { case (id, s, u, t) => ev(id, s, u, t) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("q219: the only converting channel takes all the credit") {
    // u1: A → purchase; u2: B → nothing
    val df = events(Seq(
      (1L, 0L, 1L, "A"), (2L, 10L, 1L, "purchase"),
      (3L, 0L, 2L, "B")))
    val got = EventAnalytics.markovAttribution(df)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    // p_full = 0.5; removing A kills all conversion (RE=1), removing B changes nothing
    assert(got === Seq(("A", 1.0, 1.0), ("B", 0.0, 0.0)))
    assert(EventAnalytics.markovAttribution(df).head().getAs[Double]("p_conv_full") === 0.5)
  }

  test("q219: a channel on the only path to conversion outranks a side channel") {
    // u1: A → B → purchase (both on the path)
    // u2: C → nothing (dead end)
    // u3: A → B → purchase
    val df = events(Seq(
      (1L, 0L, 1L, "A"), (2L, 1L, 1L, "B"), (3L, 2L, 1L, "purchase"),
      (4L, 0L, 2L, "C"),
      (5L, 0L, 3L, "A"), (6L, 1L, 3L, "B"), (7L, 2L, 3L, "purchase")))
    val rows = EventAnalytics.markovAttribution(df)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // removing A or B severs both converting paths; C never converts
    assert(rows("A") === 1.0 && rows("B") === 1.0 && rows("C") === 0.0)
  }

  test("q219: direct conversions (no prior touch) keep p_conv alive under removals") {
    // u1 converts with no touches; u2 touches A then dies
    val df = events(Seq(
      (1L, 0L, 1L, "purchase"),
      (2L, 0L, 2L, "A")))
    val r = EventAnalytics.markovAttribution(df).head()
    // START → CONV 0.5 direct; A contributes no conversion, removal effect 0
    assert(r.getString(0) === "A")
    assert(r.getAs[Double]("removal_effect") === 0.0)
    assert(r.getAs[Double]("p_conv_full") === 0.5)
  }

  test("q221: hand curve — churn drops survival, censoring only shrinks the risk set") {
    import java.sql.Timestamp
    def day(d: Int) = new Timestamp(1700000000000L + d * 86400000L)
    val orders = Seq(
      (1L, day(0)), (1L, day(60)),   // churned at 2 months
      (2L, day(0)),                  // churned at 0 months
      (3L, day(0)), (3L, day(900)),  // censored (active 100 d before end)
      (4L, day(500)), (4L, day(1000)) // censored, defines corpus end
    ).toDF("o_custkey", "o_orderdate")
    val got = graft.operators.StatTests.kaplanMeier(orders)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (0L, 4L, 1L, 0.75),  // 1 − 1/4
      (2L, 3L, 1L, 0.5),   // 0.75 · (1 − 1/3)
      (16L, 2L, 0L, 0.5),  // censoring: S unchanged
      (30L, 1L, 0L, 0.5)))
  }

  test("q221: everyone-at-risk dying zeroes S without ln(0) blowing up") {
    import java.sql.Timestamp
    def day(d: Int) = new Timestamp(1700000000000L + d * 86400000L)
    val orders = Seq(
      (1L, day(0)), (2L, day(0)), // both churn at lifetime 0
      (3L, day(2000))             // defines the corpus end, censored
    ).toDF("o_custkey", "o_orderdate")
    val got = graft.operators.StatTests.kaplanMeier(orders)
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
    // single-order customers all land at t=0: at_risk 3, d=2 → S = 1/3
    assert(got.toSeq === Seq((0L, 0.3333)))
    val all = graft.operators.StatTests.kaplanMeier(orders, churnDays = -1)
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
    // churnDays = -1 ⇒ every customer churns; the whole risk set dies at
    // t=0 → factor 0 → survival exactly 0 through the guard, not ln(0)
    assert(all.toSeq === Seq((0L, 0.0)))
  }

  test("q222: windowed closed form equals the sequential CUSUM recursion") {
    import java.sql.Timestamp
    def day(d: Int) = new Timestamp(1700000000000L + d * 86400000L)
    // one order per day → daily x is the order value itself
    val xs = Seq(100.0, 100.0, 100.0, 100.0, 300.0, 300.0, 300.0, 100.0, 100.0, 100.0)
    val orders = xs.zipWithIndex
      .map { case (x, i) => (i.toLong, day(i), x) }
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = graft.operators.StatTests.cusumDrift(orders).head()
    // sequential reference: S_t = max(0, S_{t-1} + x - mu - sigma/2)
    val mu = xs.sum / xs.length
    val sigma = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1))
    val sRef = xs.scanLeft(0.0)((s, x) => math.max(0.0, s + x - mu - sigma / 2)).tail
    val expected = math.floor(sRef.max / sigma * 10000 + 0.5) / 10000
    assert(got.getAs[Double]("max_excursion_sigmas") === expected)
    assert(got.getAs[Long]("n_days") === xs.length.toLong)
  }

  test("q223: a planted pre/post correlation shrinks variance; arms keep their users") {
    // users with strongly correlated pre (x) and post (y) spend: y ≈ 2x + arm lift
    val rows = (1L to 200L).flatMap { u =>
      val base = (u % 10).toDouble * 10
      Seq(
        (u * 10 + 1, new Timestamp(1700000000000L + 86400000L * 2), u, "purchase", base, "{}"),
        (u * 10 + 2, new Timestamp(1700000000000L + 86400000L * 20), u, "purchase", 2 * base + (u % 2), "{}"))
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.operators.Relational.cupedAb(df).head()
    assert(r.getAs[Double]("var_reduction_pct") > 90.0, "correlated covariate must slash variance")
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === 200L)
  }

  test("q223: zero-variance covariate degrades to theta 0, never a null division") {
    val rows = (1L to 50L).map { u =>
      (u, new Timestamp(1700000000000L + 86400000L * 20), u, "purchase", u.toDouble, "{}")
    } :+ ((0L, new Timestamp(1700000000000L), 1L, "view", 0.0, "{}")) // anchors d0 → all purchases are post-period
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.operators.Relational.cupedAb(df).head()
    assert(r.getAs[Double]("theta") === 0.0)
    assert(r.getAs[Double]("var_cuped") === r.getAs[Double]("var_raw"))
  }

  test("q224: the MDE and required-n follow the two-sample z formulas") {
    val ev = Tables(spark, sfDir).events
    val r = graft.operators.Relational.abPower(ev).head()
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert(na > 0 && nb > 0)
    // recompute from the per-user frame with plain Scala
    val perUser = ev.groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)).as("rev"))
      .withColumn("arm", substring(md5(col("user_id").cast("string")), 1, 1)
        .isInCollection(Seq("0", "1", "2", "3", "4", "5", "6", "7")))
      .collect().map(x => (x.getBoolean(2), x.getDouble(1)))
    def stats(v: Array[Double]) = {
      val m = v.sum / v.length
      (v.length, m, v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
    }
    val (naR, ma, va) = stats(perUser.filter(_._1).map(_._2))
    val (nbR, mb, vb) = stats(perUser.filterNot(_._1).map(_._2))
    assert(na === naR.toLong && nb === nbR.toLong)
    val z = 1.959963984540054 + 0.8416212335729143
    val mde = math.floor(z * math.sqrt(va / naR + vb / nbR) * 10000 + 0.5) / 10000
    assert(r.getAs[Double]("mde_at_current_n") === mde)
    val nReq = math.ceil(z * z * (va + vb) / math.pow(ma - mb, 2))
    assert(r.getAs[Double]("n_per_arm_for_observed_lift") === nReq)
  }

  test("q225: overlapping and touching intervals merge; separated ones don't") {
    import java.sql.Timestamp
    def sec(s: Int) = new Timestamp(1700000000000L + s * 1000L)
    val events = Seq(
      (1L, sec(0), 1L),    // [-150, 150]
      (2L, sec(100), 1L),  // [-50, 250] overlaps → merged
      (3L, sec(300), 1L),  // [150, 450] touches 250? no — starts at 150 < 250 → merged
      (4L, sec(1000), 1L), // [850, 1150] separate
      (5L, sec(0), 2L))    // own user
      .map { case (id, ts, u) => (id, ts, u, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.operators.EventAnalytics.intervalUnion(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // user 1: [-150,450] (600 s) + [850,1150] (300 s); user 2: 300 s
    assert(got.toSeq === Seq((1L, 4L, 2L, 900L), (2L, 1L, 1L, 300L)))
  }

  test("q226: a planted weekday effect dominates the variance decomposition") {
    import java.sql.Timestamp
    // 4 weeks of daily orders: weekday base value + tiny within-noise
    val orders = (0 until 28).map { d =>
      val wd = d % 7
      (d.toLong, new Timestamp(1700000000000L + d.toLong * 86400000L),
        1000.0 + wd * 500.0 + (d % 2))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val r = graft.operators.StatTests.weekdayAnova(orders).head()
    assert(r.getAs[Long]("n_days") === 28L && r.getAs[Long]("k") === 7L)
    assert(r.getAs[Double]("eta_sq") > 0.99)
    assert(r.getAs[Double]("f_stat") > 100.0)
  }

  test("q229: the LOO z-score judges a row by its peers only") {
    import java.sql.Timestamp
    val d = new Timestamp(1700000000000L)
    // customer 1: peers 10,10,10 + outlier 100. LOO for the outlier:
    // mean 10, var 0 → filtered (var>0); LOO for a 10: peers (10,10,100)
    // mean 40, var 2700, z = (10-40)/√2700
    val orders = Seq(
      (1L, 1L, d, 10.0), (2L, 1L, d, 10.0), (3L, 1L, d, 10.0), (4L, 1L, d, 100.0),
      (5L, 2L, d, 50.0), (6L, 2L, d, 50.0)) // n<3 → excluded
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val got = Relational.looPeerZscore(orders)
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
    val zOf10 = math.floor((10.0 - 40.0) / math.sqrt(2700.0) * 10000 + 0.5) / 10000
    assert(got.toSeq === Seq((1L, zOf10), (2L, zOf10), (3L, zOf10)))
  }

  test("q230: universe sampling is exact at p = 1 and key-complete at p < 1") {
    val t = Tables(spark, sfDir)
    val allHex = "0123456789abcdef".map(_.toString)
    val full = Relational.universeJoinSample(t.orders, t.customer, allHex)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    val exact = t.orders.join(t.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("rev"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(full.keySet === exact.keySet)
    exact.foreach { case (k, (n, rev)) =>
      assert(full(k)._1 === n)
      assert(math.abs(full(k)._2 - rev) < 1.0)
    }
    // p = 0.25: every sampled key's orders ALL survive (universe property)
    val sampled = Relational.universeJoinSample(t.orders, t.customer)
    val perKey = t.orders
      .filter(Relational.hashSamplePredicate(col("o_custkey"), Seq("0", "1", "2", "3")))
      .groupBy("o_custkey").agg(count(lit(1)).as("n")).agg(sum("n")).head().getLong(0)
    assert(sampled.agg(sum("n_sampled")).head().getLong(0) === perKey)
  }

  test("q231: the proportion z matches a hand-computed pooled test on real arms") {
    val ev = Tables(spark, sfDir).events
    val r = graft.operators.Relational.abProportionTest(ev).head()
    val cnts = ev.groupBy("user_id")
      .agg(sum((col("event_type") === "purchase").cast("int")).as("cnt"))
      .withColumn("isA", substring(md5(col("user_id").cast("string")), 1, 1)
        .isInCollection(Seq("0", "1", "2", "3", "4", "5", "6", "7")))
      .collect().map(x => (x.getBoolean(2), x.getLong(1)))
    val sorted = cnts.map(_._2.toDouble).sorted
    val med =
      if (sorted.length % 2 == 1) sorted(sorted.length / 2)
      else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2.0
    val perUser = cnts.map { case (isA, c) => (isA, if (c > med) 1 else 0) }
    val (as, bs) = perUser.partition(_._1)
    val (na, nb) = (as.length.toDouble, bs.length.toDouble)
    val (ca, cb) = (as.map(_._2).sum.toDouble, bs.map(_._2).sum.toDouble)
    val (pa, pb) = (ca / na, cb / nb)
    val pool = (ca + cb) / (na + nb)
    val z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    assert(r.getAs[Long]("n_a") === as.length.toLong)
    assert(r.getAs[Double]("z") === math.floor(z * 10000 + 0.5) / 10000)
  }

  test("q232: co-moving streams read +1, opposed streams read -1") {
    import java.sql.Timestamp
    def day(d: Int) = new Timestamp(1700000000000L + d * 86400000L)
    // 10 days; purchases ramp 1..10; errors ramp with them (perfect +)
    val rows = (0 until 10).flatMap { d =>
      (0 to d).flatMap { i =>
        Seq((d * 100L + i * 2, day(d), 1L, "purchase", 1.0, "{}"),
          (d * 100L + i * 2 + 1, day(d), 1L, "error", 1.0, "{}"))
      }
    }
    val got = graft.operators.StatTests.rollingCorrelation(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().map(_.getAs[Double]("corr_7d"))
    assert(got.length === 4) // days 7..10 have full windows
    got.foreach(c => assert(c === 1.0))
  }

  test("q233: k-anonymity is the smallest class; below-k share counts rows, not classes") {
    val customer = (
      (1 to 2).map(i => (i.toLong, 0, "A")) ++   // class of 2 (below k)
      (1 to 12).map(i => (100L + i, 1, "B")))    // class of 12
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val r = graft.operators.Relational.kAnonymityAudit(customer).head()
    assert(r.getAs[Long]("n_rows") === 14L)
    assert(r.getAs[Long]("n_classes") === 2L)
    assert(r.getAs[Long]("k_anonymity") === 2L)
    assert(r.getAs[Double]("pct_rows_below_k") ===
      math.floor(2.0 / 14.0 * 100 * 10000 + 0.5) / 10000)
  }

  test("q234: the Laplace noise is the exact inverse-CDF draw from the md5 u") {
    val ev = Tables(spark, sfDir).events
    val got = graft.operators.Relational.dpCounts(ev)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    def expectedNoise(key: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((key + "dp1").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / 4294967297.0
      val c = u - 0.5
      val noise = -2.0 * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
      math.floor(noise * 10000 + 0.5) / 10000
    }
    got.keys.foreach { k => assert(got(k) === expectedNoise(k), s"noise for $k") }
    // determinism: a second run draws identical noise
    val again = graft.operators.Relational.dpCounts(ev)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(again === got)
  }

  test("q235: repetitive text compresses far below prose; empty text is ratio 1") {
    val docs = Seq(
      (1L, "ab" * 500, "en", "rep", 1000L),
      (2L, (1 to 200).map(i => s"w${i * 7919 % 997}x${i}").mkString(" "), "en", "var", 2000L),
      (3L, "", "en", "rep", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.operators.TextAnalysis.compressionFilter(docs)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val (repMin, repFlagged) = got("rep")
    val (varMin, _) = got("var")
    assert(repMin < 0.1 && varMin > repMin, s"rep min $repMin vs varied min $varMin")
    assert(repFlagged === 50.0) // the ab-run flags, the empty doc (ratio 1) doesn't
  }

  test("q236: in-bucket, cross-bucket and multi-empty-bucket gaps all surface") {
    val keys = Seq(1L, 2L, 3L, 5L, 9L, 10L, 4000L)
      .toDF("l_orderkey")
    val got = graft.operators.Relational.keyGapAudit(keys, bucketSpan = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((11L, 3999L, 3989L), (6L, 8L, 3L), (4L, 4L, 1L)))
  }

  test("q237: a single-segment class drops corpus l-diversity to 1") {
    val customer = (
      (1 to 5).map(i => (i.toLong, 0, s"SEG${i % 3}")) ++ // 3 distinct segments
      (1 to 4).map(i => (100L + i, 1, "ONLY")))           // 1 distinct
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val r = graft.operators.Relational.lDiversityAudit(customer).head()
    assert(r.getAs[Long]("n_classes") === 2L)
    assert(r.getAs[Long]("l_diversity") === 1L)
    assert(r.getAs[Long]("classes_below_l") === 1L)
    assert(r.getAs[Long]("n_rows") === 9L)
  }

  test("q238: the LTV curve accumulates per cohort and divides by cohort size") {
    import java.sql.Timestamp
    def day(d: Int) = new Timestamp(1700000000000L + d * 86400000L)
    val events = Seq(
      (1L, day(0), 1L, "purchase", 10.0, "{}"),   // u1 cohort week 0
      (2L, day(8), 1L, "purchase", 20.0, "{}"),   // age 1
      (3L, day(0), 2L, "view", 0.0, "{}"),        // u2 cohort week 0, no revenue
      (4L, day(7), 3L, "purchase", 5.0, "{}"))    // u3 cohort week 1, age 0
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventAnalytics.cohortLtv(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    // cohort 0 has 2 users (u1 + u2): age 0 ltv 10/2, age 1 ltv 30/2
    assert(got.toSeq === Seq((0L, 0L, 2L, 5.0), (0L, 1L, 2L, 15.0), (1L, 0L, 1L, 5.0)))
  }

  test("q239: the confusion matrix conserves label counts and its diagonal is the accuracy") {
    val docs = Tables(spark, sfDir).documents
    val rows = graft.operators.TextAnalysis.langConfusion(docs).collect()
    val total = docs.count()
    assert(rows.map(_.getLong(2)).sum === total)
    val acc = rows.head.getDouble(4)
    val diag = rows.filter(r => r.getString(0) == r.getString(1)).map(_.getLong(2)).sum
    assert(acc === math.floor(diag.toDouble / total * 10000 + 0.5) / 10000)
    // per-label fractions sum to 1 over each matrix row
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-6)
    }
  }

  test("q219: a zero-conversion corpus attributes nothing (no phantom full credit)") {
    val df = events(Seq((1L, 0L, 1L, "A"), (2L, 0L, 2L, "B")))
    val got = EventAnalytics.markovAttribution(df)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq === Seq(("A", 0.0, 0.0), ("B", 0.0, 0.0)))
  }

  test("q235: null and huge-incompressible text terminate with sane ratios") {
    val rnd = new scala.util.Random(11)
    // ~200 KB of random base36 — deflate output EXCEEDS a raw+64 buffer
    val big = Iterator.continually(rnd.nextInt(36)).take(200000)
      .map(i => Integer.toString(i, 36)).mkString
    val docs = Seq(
      (1L, big, "en", "s", big.length.toLong),
      (2L, null.asInstanceOf[String], "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.operators.TextAnalysis.compressionFilter(docs).head()
    assert(r.getAs[Long]("n_docs") === 2L)
    // random text barely compresses; null reads as ratio 1.0
    assert(r.getAs[Double]("min_ratio") > 0.5)
  }

  test("q239: a predicted-but-never-labeled language keeps its cells (conservation holds)") {
    // only 'en' and 'de' labels, but the de doc's tokens are French
    // markers → predicted 'fr' must not vanish from the matrix
    val docs = Seq(
      (1L, "the and of to in is", "en", "s", 10L),
      (2L, "le les et des une est", "de", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = graft.operators.TextAnalysis.langConfusion(docs).collect()
    assert(rows.map(_.getLong(2)).sum === 2L)
    val deRow = rows.filter(r => r.getString(0) == "de" && r.getLong(2) > 0)
    assert(deRow.map(_.getString(1)).toSeq === Seq("fr"))
  }

  test("q220: sketch overlap tracks the exact q162 matrix within 5%") {
    val ev = Tables(spark, sfDir).events
    val exact = Relational.audienceOverlap(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(4), r.getDouble(5))).toMap
    val est = Relational.sketchOverlap(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(5), r.getDouble(6))).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, (nBoth, jac)) =>
      val (eBoth, eJac) = est(k)
      assert(math.abs(eBoth - nBoth) <= math.max(5.0, 0.05 * nBoth), s"$k inter: $eBoth vs $nBoth")
      assert(math.abs(eJac - jac) <= 0.05, s"$k jaccard: $eJac vs $jac")
    }
  }
}
