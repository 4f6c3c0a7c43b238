package graft

import graft.operators.EntityResolution
import graft.sources.Tables
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._
  lazy val t = Tables(spark, sfDir)

  /** (key, name, brand, type, size, price) — keys 1..3 chain into one
    * entity, 10/11 pair up, 20 is a singleton with no match. */
  def fixture = Seq(
    (1L, "red widget", "acme", "small anodized", 10, 100.0),
    (2L, "red widget", "acme", "small anodized", 11, 140.0), // vs 1: type+size+price = 10
    (3L, "red widget", "bolt", "small anodized", 12, 300.0), // vs 2: type+size = 8; vs 1: type only = 5
    (10L, "blue bolt", "acme", "large polished", 5, 50.0),
    (11L, "blue bolt", "zeta", "large polished", 5, 55.0),   // vs 10: 10 points
    (20L, "blue bolt", "acme", "tiny burnished", 40, 999.0)  // no 7+ match with anyone
  ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")

  test("q271 linkage pairs: integer agreement points classify exactly") {
    val pairs = EntityResolution.linkagePairs(fixture)
      .select("key_a", "key_b", "points", "matched")
      .as[(Long, Long, Int, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(pairs((1L, 2L)) == (10, 1))
    assert(pairs((2L, 3L)) == (8, 1))
    assert(pairs((1L, 3L)) == (5, 0), "type-only agreement must not match")
    assert(pairs((10L, 11L)) == (10, 1))
    assert(pairs((10L, 20L))._2 == 0 && pairs((11L, 20L))._2 == 0)
  }

  test("q271 report aggregates per name") {
    val rep = EntityResolution.linkageReport(fixture)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // red widget: 3 pairs, 2 matched
    assert(rep("red widget") == ("red widget", 1L, 3L, 2L, 0.6667))
    // blue bolt: 3 pairs, 1 matched
    assert(rep("blue bolt") == ("blue bolt", 1L, 3L, 1L, 0.3333))
  }

  test("q272 golden records: transitive cluster, survivorship rules applied") {
    val golden = EntityResolution.goldenRecords(fixture)
      .collect().map(r => r.getAs[Long]("entity_id") -> r).toMap
    assert(golden.keySet == Set(1L, 10L), s"got ${golden.keySet}")
    val e1 = golden(1L)
    // 1-2 matched, 2-3 matched → {1,2,3} is one entity despite 1-3 not matching
    assert(e1.getAs[Long]("n_members") == 3L)
    assert(e1.getAs[String]("brand") == "acme", "alphabetic-min brand survives")
    assert(e1.getAs[Double]("price") == 300.0, "max price survives")
    assert(e1.getAs[Int]("size_min") == 10 && e1.getAs[Int]("size_max") == 12)
    assert(golden(10L).getAs[Long]("n_members") == 2L)
    // singleton 20 must NOT produce a golden record
    assert(!golden.contains(20L))
  }

  test("q271 sub-blocking: an oversized name block splits by brand, bounding pair cost") {
    // 6 same-name records across 2 brands; maxBlock=4 forces the split
    val recs = (1L to 6L).map(k =>
      (k, "hot gear", if (k <= 3) "acme" else "zeta", "t", 1, 10.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val pairs = EntityResolution.linkagePairs(recs, maxBlock = 4)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    // within-brand pairs only: C(3,2) + C(3,2) = 6, never the 15 of the unsplit block
    assert(pairs.size == 6, s"expected 6 sub-blocked pairs, got ${pairs.size}")
    assert(pairs.forall { case (a, b) => (a <= 3) == (b <= 3) }, "cross-brand pair leaked through the split")
    // without the cap the same records form all 15 pairs
    assert(EntityResolution.linkagePairs(recs, maxBlock = 64).count() == 15)
  }

  test("q272 on the driver part table: entities are multi-member, ids canonical-min") {
    val golden = EntityResolution.goldenRecords(t.part).cache()
    assert(golden.count() > 0, "the templated part table must resolve some entities")
    assert(golden.filter(col("n_members") < 2).count() == 0)
    // entity ids are distinct (one golden record per entity)
    assert(golden.select("entity_id").distinct().count() == golden.count())
    golden.unpersist()
  }
}
