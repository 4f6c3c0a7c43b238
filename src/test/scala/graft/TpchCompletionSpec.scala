package graft

import graft.operators.TpchShapes

/** Completing the classic TPC-H shape family (Q5/Q9/Q16/Q17/Q20 →
  * q274–q278). Hand-built fixtures whose answers are checkable by eye;
  * the DuckDB oracle covers the real tables at sf0.01. */
class TpchCompletionSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("q274: only same-nation customer/supplier pairs in the region and year count") {
    import spark.implicits._
    val region = Seq((1, "ASIA"), (2, "EUROPE")).toDF("r_regionkey", "r_name")
    val nation = Seq((10, "N_A", 1), (11, "N_B", 1), (20, "N_C", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((100L, "S1", 10, 0.0), (101L, "S2", 11, 0.0), (102L, "S3", 20, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val customer = Seq((200L, "C1", 10, 0.0, "AUTO"), (201L, "C2", 20, 0.0, "AUTO"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = Seq(
      (1L, 200L, "O", 1.0, ts("1997-06-01"), "1-URGENT"), // in year, ASIA customer
      (2L, 200L, "O", 1.0, ts("1996-06-01"), "1-URGENT"), // out of year
      (3L, 201L, "O", 1.0, ts("1997-06-01"), "1-URGENT")  // EUROPE customer
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "o_orderpriority")
    val lineitem = Seq(
      (1L, 100L, 100.0, 0.1), // same nation (10=10) → revenue 90
      (1L, 101L, 50.0, 0.0),  // supplier in N_B ≠ customer N_A → excluded
      (2L, 100L, 77.0, 0.0),  // order out of year → excluded
      (3L, 102L, 60.0, 0.0)   // customer outside region → excluded
    ).map { case (ok, sk, px, dc) => (ok, 1L, sk, 1, 1.0, px, dc, 0.0, "N", "O", ts("1997-06-02")) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    val got = TpchShapes.localSupplierVolume(
      lineitem, orders, customer, supplier, nation, region).collect()
    assert(got.length === 1)
    assert(got(0).getAs[String]("n_name") === "N_A")
    assert(got(0).getAs[Long]("n_lines") === 1L)
    assert(got(0).getAs[Double]("revenue") === 90.0)
  }

  test("q275: profit = revenue minus costFactor×retailprice×qty, name-filtered") {
    import spark.implicits._
    val part = Seq(
      (1L, "red widget", "Brand#1", "PROMO", 5, 10.0),
      (2L, "blue bolt", "Brand#1", "PROMO", 5, 10.0) // no 'red' → excluded
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val supplier = Seq((100L, "S1", 10, 0.0)).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val nation = Seq((10, "N_A", 1)).toDF("n_nationkey", "n_name", "n_regionkey")
    val orders = Seq((1L, 200L, "O", 1.0, ts("1998-03-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority")
    val lineitem = Seq(
      (1L, 1L, 100L, 1, 2.0, 100.0, 0.1), // profit = 90 - 0.5*10*2 = 80
      (1L, 2L, 100L, 2, 2.0, 100.0, 0.1)  // part 2 filtered out
    ).map { case (ok, pk, sk, ln, q, px, dc) =>
      (ok, pk, sk, ln, q, px, dc, 0.0, "N", "O", ts("1998-03-02"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    val got = TpchShapes.productTypeProfit(lineitem, orders, supplier, part, nation).collect()
    assert(got.length === 1)
    assert(got(0).getAs[String]("supp_nation") === "N_A")
    assert(got(0).getAs[Int]("order_year") === 1998)
    assert(got(0).getAs[Double]("profit") === 80.0)
  }

  test("q276: brand/type/size exclusions apply and complainer suppliers don't count") {
    import spark.implicits._
    val part = Seq(
      (1L, "a", "Brand#1", "SMALL", 5, 1.0),  // kept bucket
      (2L, "b", "Brand#5", "SMALL", 5, 1.0),  // excluded brand
      (3L, "c", "Brand#1", "PROMO", 5, 1.0),  // excluded type
      (4L, "d", "Brand#1", "SMALL", 2, 1.0)   // size not in list
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val supplier = Seq(
      (100L, "S1", 10, 5.0), (101L, "S2", 10, 5.0), (102L, "S3", 10, -1.0) // S3 complains
    ).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val lineitem = Seq(
      (1L, 1L, 100L), (1L, 1L, 100L), // duplicate pair → one distinct supplier
      (2L, 1L, 101L),                 // second supplier for part 1
      (3L, 1L, 102L),                 // complainer → excluded
      (4L, 2L, 100L), (5L, 3L, 100L), (6L, 4L, 100L) // excluded parts
    ).map { case (ok, pk, sk) =>
      (ok, pk, sk, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts("1997-06-02"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    val got = TpchShapes.supplierPartBuckets(lineitem, part, supplier).collect()
    assert(got.length === 1)
    assert(got(0).getAs[String]("p_brand") === "Brand#1")
    assert(got(0).getAs[Int]("p_size") === 5)
    assert(got(0).getAs[Long]("supplier_cnt") === 2L)
  }

  test("q277: only lines under half the part's own average quantity contribute") {
    import spark.implicits._
    val part = Seq(
      (1L, "a", "Brand#1", "SMALL", 5, 1.0),
      (2L, "b", "Brand#2", "SMALL", 5, 1.0) // other brand → out of slice
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    // part 1 quantities: 1, 10, 19 → avg 10, cut 5.0 → only the qty-1 line counts
    val lineitem = Seq(
      (1L, 1L, 1.0, 700.0), (2L, 1L, 10.0, 999.0), (3L, 1L, 19.0, 999.0),
      (4L, 2L, 1.0, 555.0)
    ).map { case (ok, pk, q, px) =>
      (ok, pk, 100L, 1, q, px, 0.0, 0.0, "N", "O", ts("1997-06-02"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    val got = TpchShapes.smallQuantityRevenue(lineitem, part).collect()
    assert(got.length === 1)
    assert(got(0).getAs[Double]("avg_yearly") === 100.0) // 700 / 7
  }

  test("q286: division keeps only parts covered by EVERY region nation") {
    import spark.implicits._
    val region = Seq((1, "ASIA"), (2, "EUROPE")).toDF("r_regionkey", "r_name")
    val nation = Seq((10, "N_A", 1), (11, "N_B", 1), (20, "N_C", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq(
      (100L, "S1", 10, 0.0), (101L, "S2", 11, 0.0), (102L, "S3", 20, 0.0)
    ).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val lineitem = Seq(
      // part 1: supplied from both ASIA nations → kept, revenue 30
      (1L, 1L, 100L, 10.0), (2L, 1L, 101L, 20.0),
      // part 2: only N_A → dropped
      (3L, 2L, 100L, 99.0),
      // part 3: N_A twice + EUROPE (doesn't count toward the divisor) → dropped
      (4L, 3L, 100L, 1.0), (5L, 3L, 100L, 1.0), (6L, 3L, 102L, 1.0)
    ).map { case (ok, pk, sk, px) =>
      (ok, pk, sk, 1, 1.0, px, 0.0, 0.0, "N", "O", ts("1997-06-02"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    val got = TpchShapes.universallyStocked(lineitem, supplier, nation, region).collect()
    assert(got.length === 1)
    assert(got(0).getAs[Long]("l_partkey") === 1L)
    assert(got(0).getAs[Long]("n_nations") === 2L)
    assert(got(0).getAs[Double]("region_revenue") === 30.0)
  }

  test("q278: a year-concentrated supplier qualifies; spread-out and sparse ones don't") {
    import spark.implicits._
    val part = Seq(
      (1L, "small ring", "Brand#1", "SMALL", 5, 1.0),
      (2L, "red widget", "Brand#1", "SMALL", 5, 1.0) // name not 'small%' → ignored
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val supplier = Seq((100L, "S_CONC", 10, 0.0), (101L, "S_SPREAD", 10, 0.0),
      (102L, "S_BG", 10, 0.0), (103L, "S_SPARSE", 10, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val nation = Seq((10, "N_A", 1)).toDF("n_nationkey", "n_name", "n_regionkey")
    // global year share = (8+1+2)/(10+10+15+2) = 11/37 ≈ 0.297 → cut ≈ 0.595×life
    val lineitem = Seq(
      // S_CONC: 8 of 10 in-year over 3 lines → 0.8 > 0.514 → qualifies
      (1L, 1L, 100L, 4.0, ts("1997-06-01")),
      (2L, 1L, 100L, 4.0, ts("1997-07-01")),
      (3L, 1L, 100L, 2.0, ts("1996-06-01")),
      // S_SPREAD: 1 of 10 in-year → 0.1 < 0.514 → excluded
      (4L, 1L, 101L, 1.0, ts("1997-06-01")),
      (5L, 1L, 101L, 5.0, ts("1996-06-01")),
      (6L, 1L, 101L, 4.0, ts("1996-07-01")),
      // S_BG: all out-of-year, 3 lines → excluded (and drags the global share down)
      (7L, 1L, 102L, 5.0, ts("1996-01-01")),
      (8L, 1L, 102L, 5.0, ts("1996-02-01")),
      (9L, 1L, 102L, 5.0, ts("1996-03-01")),
      // S_SPARSE: fully in-year (share 1.0 > cut) but only ONE line →
      // under minLines, can't qualify by luck
      (10L, 1L, 103L, 2.0, ts("1997-06-01")),
      // S_SPREAD ships a LOT of the non-matching part in-year: must not help
      (11L, 2L, 101L, 50.0, ts("1997-06-01"))
    ).map { case (ok, pk, sk, q, sd) =>
      (ok, pk, sk, 1, q, 1.0, 0.0, 0.0, "N", "O", sd)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    val got = TpchShapes.excessStockSuppliers(lineitem, part, supplier, nation).collect()
    assert(got.map(_.getAs[String]("s_name")).toSeq === Seq("S_CONC"))
    assert(got(0).getAs[String]("n_name") === "N_A")
  }
}
