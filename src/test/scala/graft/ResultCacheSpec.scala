package graft

import graft.plans.ResultCache
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** result_cache: plan-fingerprint result memoization — hits serve the
  * landed parquet, any input change invalidates, plan-identical
  * queries share an entry, plan changes fork one. */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def freshInput(): String = {
    val dir = Files.createTempDirectory("graft-rc-in").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "k", "v").write.mode("overwrite").parquet(dir)
    dir
  }

  test("miss computes and lands; the re-request is a hit with identical rows") {
    val in = freshInput()
    val cache = Files.createTempDirectory("graft-rc").toString
    def q = spark.read.parquet(in).groupBy("k").agg(sum("v").as("s"))
    val (r1, hit1) = ResultCache.cachedWithStatus(q, cache)
    assert(!hit1, "first request must be a miss")
    val (r2, hit2) = ResultCache.cachedWithStatus(q, cache)
    assert(hit2, "identical plan over unchanged inputs must hit")
    assert(r1.collect().map(_.toString).sorted.sameElements(
      r2.collect().map(_.toString).sorted))
    assert(new java.io.File(cache).listFiles().count(!_.getName.startsWith("_")) == 1)
  }

  test("appending to an input invalidates: the snapshot forks the fingerprint") {
    val in = freshInput()
    val cache = Files.createTempDirectory("graft-rc").toString
    def q = spark.read.parquet(in).groupBy("k").agg(sum("v").as("s"))
    val fp1 = ResultCache.fingerprint(q)
    ResultCache.cached(q, cache)
    Seq((4L, "a", 40.0)).toDF("id", "k", "v")
      .write.mode("append").parquet(in)
    val fp2 = ResultCache.fingerprint(q)
    assert(fp1 != fp2, "file count/bytes changed → new fingerprint")
    val (r, hit) = ResultCache.cachedWithStatus(q, cache)
    assert(!hit, "stale entry must not serve")
    val s = r.filter(col("k") === "a").head().getAs[Double]("s")
    assert(s == 80.0, "the recompute sees the appended row")
  }

  test("syntactically different but plan-identical queries share one entry") {
    val in = freshInput()
    val cache = Files.createTempDirectory("graft-rc").toString
    val q1 = spark.read.parquet(in).filter(col("v") > 5.0).select("k", "v")
    val q2 = spark.read.parquet(in).select("id", "k", "v")
      .filter(col("v") > lit(5.0)).drop("id")
    assert(ResultCache.fingerprint(q1) == ResultCache.fingerprint(q2),
      "canonicalization must absorb alias/ordering noise")
    // a real plan change forks
    val q3 = spark.read.parquet(in).filter(col("v") > 6.0).select("k", "v")
    assert(ResultCache.fingerprint(q1) != ResultCache.fingerprint(q3))
  }

  test("literal local data fingerprints by content: different rows fork, same rows share") {
    val a1 = Seq((1L, "a"), (2L, "b")).toDF("id", "k").groupBy("k").count()
    val a2 = Seq((1L, "a"), (2L, "b")).toDF("id", "k").groupBy("k").count()
    val b  = Seq((1L, "a"), (9L, "z")).toDF("id", "k").groupBy("k").count()
    assert(ResultCache.fingerprint(a1) == ResultCache.fingerprint(a2),
      "identical literal frames share an entry")
    assert(ResultCache.fingerprint(a1) != ResultCache.fingerprint(b),
      "the canonicalized plan elides LocalRelation data — the content hash must fork it")
  }

  test("fail-closed: an RDD-backed frame is refused, not silently cached stale") {
    val rdd = spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    val df = spark.createDataFrame(rdd, schema)
    val e = intercept[IllegalArgumentException](ResultCache.fingerprint(df))
    assert(e.getMessage.contains("non-snapshotable"), e.getMessage)
    val cache = Files.createTempDirectory("graft-rc").toString
    intercept[IllegalArgumentException](ResultCache.cached(df, cache))
  }

  test("range and mixed file+local plans fingerprint fine") {
    val in = freshInput()
    val dim = Seq(("a", "alpha"), ("b", "beta")).toDF("k", "name")
    val q = spark.read.parquet(in).join(dim, "k").groupBy("name").count()
    val fp1 = ResultCache.fingerprint(q)
    assert(fp1.nonEmpty)
    assert(ResultCache.fingerprint(spark.range(10).toDF()).nonEmpty)
    // appending to the FILE side still invalidates the mixed plan
    Seq((5L, "a", 1.0)).toDF("id", "k", "v").write.mode("append").parquet(in)
    assert(ResultCache.fingerprint(q) != fp1)
  }

  test("evictExcept drops dead entries and keeps live ones") {
    val in = freshInput()
    val cache = Files.createTempDirectory("graft-rc").toString
    val q1 = spark.read.parquet(in).groupBy("k").count()
    val q2 = spark.read.parquet(in).agg(sum("v").as("s"))
    ResultCache.cached(q1, cache)
    ResultCache.cached(q2, cache)
    val keep = ResultCache.fingerprint(q1)
    val dropped = ResultCache.evictExcept(spark, cache, Set(keep))
    assert(dropped == 1L)
    val (_, hit) = ResultCache.cachedWithStatus(q1, cache)
    assert(hit, "kept entry still serves")
  }
}
