package graft

import graft.operators.{Relational, Skew}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-5 additions: skew audit (q154), per-group regression trend
  * (q155), top-supplier-with-ties (q156). */
class AnalyticsR5Spec extends SparkSpec {

  private lazy val t = Tables(spark, sfDir)

  test("q154: planted hot key lands in its log2 bucket with the right salt factor") {
    import spark.implicits._
    // one key with 1000 rows, 50 keys with 1 row
    val rows = (1 to 1000).map(_ => "hot") ++ (1 to 50).map(i => s"k$i")
    val df = rows.toDF("k")
    val audit = Skew.skewAudit(df, "k", targetRowsPerTask = 100L).cache()
    // 1000 → bin length 10 → bucket 9; singletons → bucket 0
    val hot = audit.filter(col("bucket") === 9).head()
    assert(hot.getAs[Long]("n_keys") === 1L)
    assert(hot.getAs[Long]("max_count") === 1000L)
    // ceil(1000/100) = 10-way salt recommendation, identical on every row
    assert(audit.select("rec_salt").distinct().head().getLong(0) === 10L)
    val singles = audit.filter(col("bucket") === 0).head()
    assert(singles.getAs[Long]("n_keys") === 50L)
    // histogram partitions all rows
    assert(audit.agg(sum("n_rows")).head().getLong(0) === 1050L)
  }

  test("q154: audit over the real events stream is conservative and well-formed") {
    val audit = Skew.skewAudit(t.events, "user_id").cache()
    val totalRows = t.events.count()
    assert(audit.agg(sum("n_rows")).head().getLong(0) === totalRows)
    assert(audit.agg(sum("n_keys")).head().getLong(0) ===
      t.events.select("user_id").distinct().count())
  }

  test("q155: exact linear revenue growth recovers slope/intercept/r2 = 1") {
    import spark.implicits._
    // customer 1 in nation 7: revenue 100·monthIdx, perfectly linear
    val orders = (1 to 6).map { m =>
      (1L, java.sql.Timestamp.valueOf(f"2020-$m%02d-15 00:00:00"), (2020 * 12 + m) * 100.0)
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val customer = Seq((1L, 7)).toDF("c_custkey", "c_nationkey")
    val fit = Relational.revenueTrend(orders, customer).head()
    assert(fit.getAs[Int]("c_nationkey") === 7)
    assert(fit.getAs[Long]("n_months") === 6L)
    assert(math.abs(fit.getAs[Double]("slope") - 100.0) < 1e-6)
    assert(math.abs(fit.getAs[Double]("r2") - 1.0) < 1e-6)
  }

  test("q156: revenue ties at the top keep every tied supplier") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("1996-02-01 00:00:00")
    val lineitem = Seq(
      (1L, ts, 1000.0, 0.0),  // supplier 1: 1000
      (2L, ts, 500.0, 0.0),   // supplier 2: 1000 in two lines
      (2L, ts, 500.0, 0.0),
      (3L, ts, 999.0, 0.0)    // supplier 3: below
    ).toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val supplier = Seq((1L, "s1"), (2L, "s2"), (3L, "s3")).toDF("s_suppkey", "s_name")
    val top = Relational.topSupplier(lineitem, supplier)
    assert(top.select("s_name").collect().map(_.getString(0)).toSeq === Seq("s1", "s2"))
  }

  test("q157: estimator collapses to the exact answer at p = 1") {
    val all = "0123456789abcdef".map(_.toString)
    val est = Relational.approxGroupBy(t.orders, all)
    val exact = t.orders.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("rev"))
    val joined = est.join(exact, "o_orderpriority").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Double]("est_count") === r.getAs[Long]("n").toDouble)
      assert(math.abs(r.getAs[Double]("est_revenue") - r.getAs[Double]("rev")) < 1e-2)
      assert(r.getAs[Double]("stderr_revenue") === 0.0) // (1-p) = 0
    }
  }

  test("q157: 25% sample estimates land within 4 standard errors of truth") {
    val est = Relational.approxGroupBy(t.orders)
    val exact = t.orders.groupBy("o_orderpriority")
      .agg(sum("o_totalprice").as("rev"))
    val joined = est.join(exact, "o_orderpriority").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val err = math.abs(r.getAs[Double]("est_revenue") - r.getAs[Double]("rev"))
      val se = r.getAs[Double]("stderr_revenue")
      assert(se > 0 && err < 4 * se, s"${r.getString(0)}: err $err vs stderr $se")
    }
  }

  test("q158: planted NULL zeroes the ANSI variant; rewrite matches Spark's own NOT IN") {
    val got = Relational.notInNullable(t.customer, t.supplier).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("ansi_not_in") === 0L)
    // Spark's own planning of the raw three-valued predicate agrees
    t.customer.createOrReplaceTempView("c_v")
    t.supplier.createOrReplaceTempView("s_v")
    val sparkAnsi = spark.sql(
      "SELECT count(*) FROM c_v WHERE c_nationkey NOT IN (SELECT nullif(s_nationkey, 3) FROM s_v)")
      .head().getLong(0)
    val sparkStripped = spark.sql(
      """SELECT count(*) FROM c_v WHERE c_nationkey NOT IN
        |(SELECT nullif(s_nationkey, 3) FROM s_v WHERE nullif(s_nationkey, 3) IS NOT NULL)""".stripMargin)
      .head().getLong(0)
    assert(got("ansi_not_in") === sparkAnsi)
    assert(got("null_stripped") === sparkStripped)
    assert(got("null_stripped") > 0)
  }

  test("q159: listagg order is by rank, deterministic under ties") {
    import spark.implicits._
    val customer = Seq(
      (1L, "alice", 7, 500.0), (2L, "bob", 7, 500.0), (3L, "carol", 7, 900.0),
      (4L, "dave", 7, 100.0), (5L, "erin", 8, 50.0)
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val got = Relational.topCustomerListagg(customer)
      .collect().map(r => r.getAs[Int]("c_nationkey") -> r.getAs[String]("top_names")).toMap
    // nation 7: carol (900), then the 500-tie broken by custkey: alice, bob
    assert(got(7) === "carol,alice,bob")
    assert(got(8) === "erin")
  }

  test("q161: JS divergence is zero for a mirrored source, large for a shifted one, ≤ ln 2") {
    import spark.implicits._
    // source "same" mirrors the reference shape exactly (it IS most of
    // the corpus); source "shifted" lives in the top bin only
    val docs =
      (1 to 400).map(i => (i.toLong, "x" * 100, "same")) ++
        (1 to 400).map(i => (400L + i, "x" * 100, "same2")) ++
        (1 to 20).map(i => (800L + i, "x" * 1900, "shifted"))
    val df = docs.toDF("doc_id", "text", "source")
    val out = graft.operators.TextAnalysis.lengthDrift(df)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("same")._1 === 400L && out("shifted")._1 === 20L)
    // identical-shape sources sit near zero; the shifted source is an
    // order of magnitude farther from the reference; all within [0, ln2]
    assert(out.values.forall { case (_, js) => js >= 0.0 && js <= math.log(2.0) + 1e-9 })
    assert(out("shifted")._2 > 10 * math.max(out("same")._2, 1e-4))
  }

  test("q161: single-source corpus diverges from its own reference by exactly zero") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, "y" * (i * 37 % 2000), "only")).toDF("doc_id", "text", "source")
    val js = graft.operators.TextAnalysis.lengthDrift(df).head().getDouble(2)
    assert(js === 0.0)
  }

  test("q162: hand-built audiences produce exact intersections and jaccard") {
    import spark.implicits._
    // u1: {a,b}; u2: {a,b,c}; u3: {a}; u4: {c}
    val events = Seq(
      (1L, "a"), (1L, "b"), (1L, "a"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (4L, "c")
    ).toDF("user_id", "event_type")
    val got = Relational.audienceOverlap(events)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got(("a", "b")) === ((3L, 2L, 2L, 0.6667)))
    assert(got(("a", "c")) === ((3L, 2L, 1L, 0.25)))
    assert(got(("b", "c")) === ((2L, 2L, 1L, 0.3333)))
  }

  test("q162: real-event overlaps are bounded by audience sizes") {
    val rows = Relational.audienceOverlap(t.events).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (na, nb, both, j) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_both"), r.getAs[Double]("jaccard"))
      assert(both <= math.min(na, nb) && j >= 0.0 && j <= 1.0)
    }
  }

  test("q163: fused score recomputes from the legs; both-legs-top-1 dominates") {
    import graft.operators.Similarity
    val fused = Similarity.annRrfFusion(Tables(spark, sfDir).embeddings).collect()
    assert(fused.nonEmpty)
    // per query: rrf_score must equal the RRF formula over the reported ranks
    fused.foreach { r =>
      val expect =
        (if (r.getAs[Long]("rk_full") <= 10) 1.0 / (60 + r.getAs[Long]("rk_full")) else 0.0) +
          (if (r.getAs[Long]("rk_cheap") <= 10) 1.0 / (60 + r.getAs[Long]("rk_cheap")) else 0.0)
      assert(math.abs(r.getAs[Double]("rrf_score") - expect) < 1e-4)
    }
    // fused ranking is descending in score within each query
    fused.groupBy(_.getAs[Long]("qid")).values.foreach { rows =>
      val byRank = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("rrf_score"))
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y - 1e-9 })
    }
    // a candidate that tops BOTH legs must top the fusion
    fused.groupBy(_.getAs[Long]("qid")).values.foreach { rows =>
      rows.find(r => r.getAs[Long]("rk_full") == 1L && r.getAs[Long]("rk_cheap") == 1L)
        .foreach(r => assert(r.getAs[Long]("rk") === 1L))
    }
  }

  test("q164: purchases close epochs; browse value accumulates between resets") {
    import spark.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val events = Seq(
      (1L, ts(1), 7L, "view", 5.0), (2L, ts(2), 7L, "click", 3.0),
      (3L, ts(3), 7L, "purchase", 10.0), (4L, ts(4), 7L, "view", 2.0),
      (5L, ts(5), 7L, "purchase", 1.0), (6L, ts(6), 7L, "view", 4.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.EventAnalytics.spendBetweenPurchases(events)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    assert(got(0L) === ((3L, 8.0, 1)))  // view+click+closing purchase
    assert(got(1L) === ((2L, 2.0, 1)))  // view, closing purchase
    assert(got(2L) === ((1L, 4.0, 0)))  // trailing open epoch
  }

  test("q165: churn fixture — gained/retained/lost per consecutive day") {
    import spark.implicits._
    val ts = (d: Int, u: Long) => java.sql.Timestamp.valueOf(f"2024-02-0$d%d 10:00:00")
    val events = Seq(
      (1L, ts(1, 1), 1L, "view", 0.0), (2L, ts(1, 2), 2L, "view", 0.0),
      (3L, ts(2, 2), 2L, "view", 0.0), (4L, ts(2, 3), 3L, "view", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.EventAnalytics.dailyChurn(events)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("2024-02-01") === ((0L, 2L, 0L)))  // retained, gained, lost
    assert(got("2024-02-02") === ((1L, 1L, 1L)))
    assert(got("2024-02-03") === ((0L, 0L, 2L)))  // day after the window
  }

  test("q165: per-day conservation — retained + gained equals that day's active users") {
    val churn = graft.operators.EventAnalytics.dailyChurn(t.events)
    val active = t.events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct("user_id").as("n_active"))
    val joined = churn.join(active, Seq("day"), "inner").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("retained") + r.getAs[Long]("gained") === r.getAs[Long]("n_active"))
    }
  }

  test("q166: Neyman allocation favors big varied strata; selection is the md5 top-n") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // "wild": 300 docs, lengths 10..1000 (high σ); "flat": 300 docs, all length 100
    val docs = ((1 to 300).map(i => (i.toLong, "x" * (10 + rng.nextInt(990)), "wild")) ++
      (1 to 300).map(i => (300L + i, "x" * 100, "flat"))).toDF("doc_id", "text", "source")
    val out = graft.operators.TextAnalysis.neymanSample(docs, budget = 60)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val (wildPop, wildAlloc, wildSel, _) = out("wild")
    assert(wildPop === 300L && wildAlloc === wildSel)
    // zero-variance stratum gets nothing under Neyman (so it vanishes
    // from the post-selection report); the varied one takes ~everything
    assert(!out.contains("flat") || out("flat")._2 === 0L)
    assert(wildAlloc >= 55L && wildAlloc <= 60L)
    // selection = the n_alloc smallest md5 priorities of the stratum
    val expectAvg = docs.filter(col("source") === "wild")
      .select(col("doc_id"), length(col("text")).cast("double").as("x"),
        md5(col("doc_id").cast("string")).as("p"))
      .orderBy("p", "doc_id").limit(wildAlloc.toInt)
      .agg(avg("x")).head().getDouble(0)
    assert(math.abs(out("wild")._4 - expectAvg) < 1e-2)
  }

  test("q166: real-table selection never exceeds allocation and fills it when possible") {
    val rows = graft.operators.TextAnalysis.neymanSample(t.documents).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pop, alloc, sel) = (r.getAs[Long]("n_pop"), r.getAs[Long]("n_alloc"), r.getAs[Long]("n_selected"))
      assert(sel === math.min(alloc, pop))
    }
  }

  test("q169: nation shares sum to 100 within each region and globally") {
    val out = Relational.revenueContribution(t.orders, t.customer, t.nation, t.region).cache()
    val regionSums = out.groupBy("r_name").agg(sum("pct_of_region").as("s")).collect()
    regionSums.foreach(r => assert(math.abs(r.getAs[Double]("s") - 100.0) < 0.01))
    val globalSum = out.agg(sum("pct_of_global")).head().getDouble(0)
    assert(math.abs(globalSum - 100.0) < 0.01)
  }

  test("q167: interpolation blends linearly between knots; edges take the lone neighbor") {
    import spark.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val events = Seq(
      (0L, ts(0), 7L, "view", 99.0),      // before first knot → next_v = 10
      (1L, ts(1), 7L, "purchase", 10.0),
      (2L, ts(2), 7L, "view", 0.0),       // 1/3 of the way → 20
      (3L, ts(3), 7L, "click", 0.0),      // 2/3 → 30
      (4L, ts(4), 7L, "purchase", 40.0),
      (5L, ts(5), 7L, "view", 0.0)        // after last knot → prev_v = 40
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.operators.EventAnalytics.interpolatePurchaseValue(events).head()
    assert(r.getAs[Long]("n_events") === 6L)
    assert(r.getAs[Long]("n_knots") === 2L)
    assert(r.getAs[Long]("n_interpolated") === 4L)
    // (10 + 20 + 30 + 40) / 4
    assert(math.abs(r.getAs[Double]("avg_interp") - 25.0) < 1e-9)
  }

  test("q168: every source row of the smoothed matrix sums to 1; counts match q85-style lags") {
    val m = graft.operators.EventAnalytics.markovMatrix(t.events).cache()
    val k = t.events.select("event_type").distinct().count()
    assert(m.count() === k * k)
    val rowSums = m.groupBy("src").agg(sum("p").as("s")).collect()
    rowSums.foreach(r => assert(math.abs(r.getAs[Double]("s") - 1.0) < 0.002))
    // unsmoothed counts must equal the raw lag-pair count
    val total = m.agg(sum("n")).head().getLong(0)
    val expected = t.events.count() - t.events.select("user_id").distinct().count()
    assert(total === expected)
  }

  test("q170: equal-size sources normalize onto identical global order statistics") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x" * 100, "a"), (2L, "x" * 200, "a"), (3L, "x" * 300, "a"),
      (4L, "x" * 10, "b"), (5L, "x" * 20, "b"), (6L, "x" * 30, "b")
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.TextAnalysis.quantileNormalize(docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // both strata map rank {1,2,3} of 3 onto global ranks {2,4,6} =
    // values {20,100,300} → the SAME normalized mean, by construction
    assert(out("a")._1 === 3L && out("b")._1 === 3L)
    assert(out("a")._3 === out("b")._3)
    assert(math.abs(out("a")._3 - (20.0 + 100.0 + 300.0) / 3) < 1e-6)
    // raw means differ wildly; normalization erased the batch effect
    assert(math.abs(out("a")._2 - 200.0) < 1e-9 && math.abs(out("b")._2 - 20.0) < 1e-9)
  }

  test("q170: real-corpus normalized means concentrate around the global mean") {
    val out = graft.operators.TextAnalysis.quantileNormalize(t.documents).cache()
    val globalMean = t.documents.agg(avg(length(col("text")))).head().getDouble(0)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val rawSpread = rows.map(r => math.abs(r.getAs[Double]("avg_raw") - globalMean)).max
    val normSpread = rows.map(r => math.abs(r.getAs[Double]("avg_normalized") - globalMean)).max
    assert(normSpread <= rawSpread, s"normalization widened spread: $normSpread > $rawSpread")
  }

  test("q171: arms partition users; Welch stats recompute from an independent rollup") {
    val row = Relational.abTestWelch(t.events).head()
    val nUsers = t.events.select("user_id").distinct().count()
    assert(row.getAs[Long]("n_a") + row.getAs[Long]("n_b") === nUsers)
    // independent recount through a different plan shape
    val perUser = t.events.groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)).as("rev"))
      .withColumn("arm",
        when(substring(md5(col("user_id").cast("string")), 1, 1)
          .isInCollection(Seq("0", "1", "2", "3", "4", "5", "6", "7")), "A").otherwise("B"))
    val stats = perUser.groupBy("arm")
      .agg(count(lit(1)).as("n"), avg("rev").as("m"), var_samp("rev").as("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val (na, ma, va) = stats("A"); val (nb, mb, vb) = stats("B")
    val t0 = (ma - mb) / math.sqrt(va / na + vb / nb)
    val df0 = math.pow(va / na + vb / nb, 2) /
      (math.pow(va / na, 2) / (na - 1) + math.pow(vb / nb, 2) / (nb - 1))
    assert(math.abs(row.getAs[Double]("t_stat") - t0) < 1e-3)
    assert(math.abs(row.getAs[Double]("welch_df") - df0) < df0 * 1e-3)
    assert(df0 >= math.min(na, nb) - 1 && df0 <= na + nb - 2) // Welch df bounds
  }

  test("q172: SLA fixture — exact percentiles and compliance share") {
    import spark.implicits._
    val od = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val ship = (d: Int) => java.sql.Timestamp.valueOf(f"1996-01-${1 + d}%02d 00:00:00")
    val orders = Seq((1L, "1-URGENT", od)).toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val lineitem = Seq(
      (1L, ship(10)), (1L, ship(20)), (1L, ship(28)), (1L, ship(29))
    ).toDF("l_orderkey", "l_shipdate")
    val r = Relational.slaCompliance(lineitem, orders, slaDays = 25).head()
    assert(r.getAs[Long]("n_lines") === 4L)
    // delays {10,20,28,29}: p50 = 24 (midpoint), p90 = 28.7, 2 of 4 within 25
    assert(math.abs(r.getAs[Double]("p50_delay") - 24.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("p90_delay") - 28.7) < 1e-9)
    assert(math.abs(r.getAs[Double]("pct_within_sla") - 50.0) < 1e-9)
  }

  test("q172: real-table compliance is a valid distribution summary") {
    val rows = Relational.slaCompliance(t.lineitem, t.orders).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("p50_delay") <= r.getAs[Double]("p90_delay"))
      val pct = r.getAs[Double]("pct_within_sla")
      assert(pct >= 0.0 && pct <= 100.0)
    }
  }

  test("q156: real-table result is the argmax of the quarter revenue") {
    val top = Relational.topSupplier(t.lineitem, t.supplier)
    val best = t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("r"))
      .agg(max("r")).head().getDouble(0)
    val got = top.collect()
    assert(got.nonEmpty)
    assert(got.forall(r => math.abs(r.getAs[Double]("total_revenue") - best) < 1e-3))
  }
}
