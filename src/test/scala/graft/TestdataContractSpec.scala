package graft

import graft.sources.Tables
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Contract tests against the REAL driver-generated testdata (sf0.001):
  * the table registry must absorb schema drift in the generated parquet
  * (the events `ts` column has shipped as TIMESTAMP(NANOS), as a raw
  * long, and as TIMESTAMP_NTZ micros across data generations) and always
  * present the stable schema every operator assumes. Round 4 lost its
  * whole bench artifact to exactly this drift — an analysis error on
  * `ts` arithmetic — so this is pinned here where `sbt test` sees it. */
class TestdataContractSpec extends SparkSpec {

  private lazy val t = Tables(spark, sfDir)

  test("events.ts normalizes to TimestampType regardless of parquet encoding") {
    assert(t.events.schema("ts").dataType == TimestampType)
  }

  test("events survives timestamp arithmetic and yields sane epochs") {
    import org.apache.spark.sql.functions._
    val row = t.events
      .agg(
        min(unix_timestamp(col("ts"))).as("lo"),
        max(unix_timestamp(col("ts"))).as("hi"),
        count(lit(1)).as("n"))
      .head()
    assert(row.getAs[Long]("n") > 0)
    // generated stream is dated circa 2024 — epoch seconds must be
    // positive and within [2000-01-01, 2100-01-01); a unit slip
    // (ns-as-s or ms-as-s) lands far outside this band
    assert(row.getAs[Long]("lo") > 946684800L && row.getAs[Long]("hi") < 4102444800L)
  }

  test("every table loads with its operator-facing columns present") {
    val expected = Map(
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "region" -> Seq("r_regionkey", "r_name"),
      "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents" -> Seq("doc_id", "text", "lang", "source"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    val loaded = Map(
      "lineitem" -> t.lineitem, "orders" -> t.orders, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "nation" -> t.nation,
      "region" -> t.region, "events" -> t.events, "documents" -> t.documents,
      "embeddings" -> t.embeddings)
    expected.foreach { case (name, cols) =>
      val have = loaded(name).columns.toSet
      val missing = cols.filterNot(have)
      assert(missing.isEmpty, s"$name is missing operator-facing columns: $missing")
    }
    // key id columns keep integral types (joins and hash-partitioning
    // assume numeric keys, not strings)
    assert(t.lineitem.schema("l_orderkey").dataType == LongType)
    assert(t.events.schema("user_id").dataType == LongType)
  }
}
