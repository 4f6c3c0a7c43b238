package graft

class BenchSpec extends SparkSpec {
  test("bench records per-query errors instead of swallowing them") {
    val (_, err) = Bench.timeQuery(spark, sfDir, (_, _) => throw new RuntimeException("boom"))
    assert(err.exists(_.contains("boom")), s"broken query must surface its error, got $err")
  }

  test("bench times a working query with no error") {
    val (sec, err) = Bench.timeQuery(spark, sfDir, (s, d) => graft.sources.Tables(s, d).nation)
    assert(err.isEmpty && sec >= 0.0)
  }
}
