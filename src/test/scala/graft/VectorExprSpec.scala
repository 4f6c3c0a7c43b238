package graft

import graft.functions.VectorFunctions._
import graft.plans.VectorFunctionRegistry
import org.apache.spark.sql.functions._

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  def vecs = Seq(
    (0L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
    (1L, Array(0f, 0f, 0f), Array(1f, 1f, 1f)),
    (2L, Array(0.5f, -0.5f, 2f), Array(-1f, 3f, 0.25f))
  ).toDF("id", "a", "b")

  test("native vec_dot matches the interpreted HOF reference bit-for-bit") {
    val rows = vecs
      .select(col("id"), dot(col("a"), col("b")).as("native"), dotHof(col("a"), col("b")).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getDouble(1) == r.getDouble(2), s"mismatch on id ${r.getLong(0)}"))
    assert(rows.find(_.getLong(0) == 0L).get.getDouble(1) == 32.0)
  }

  test("native vec_norm matches the interpreted reference") {
    val rows = vecs.select(norm(col("a")).as("native"), normHof(col("a")).as("ref")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("vec_cosine: parallel vectors 1, zero vector 0") {
    val r = Seq((Array(1f, 2f), Array(2f, 4f), Array(0f, 0f)))
      .toDF("a", "b", "z")
      .select(cosine(col("a"), col("b")).as("par"), cosine(col("a"), col("z")).as("zero"))
      .first()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
  }

  test("regression: several vector exprs in ONE codegen function compile (fresh locals)") {
    // pre-fix, every vector expression declared the same Java locals
    // (i, n, d, ...) — two of them in one whole-stage-codegen function
    // made janino reject the class and the stage silently fell back to
    // interpreted execution (caught in the round-8 bench). fallback=false
    // turns the silent downgrade into a hard failure so this can't rot.
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val r = vecs.select(
        dot(col("a"), col("b")).as("d"),
        dot(col("b"), col("a")).as("d2"),
        norm(col("a")).as("na"),
        norm(col("b")).as("nb"),
        cosine(col("a"), col("b")).as("c"),
        cosine(col("b"), col("a")).as("c2"))
        .filter(col("d") === col("d2"))
        .collect()
      assert(r.length == vecs.count())
      assert(r.forall(x => math.abs(x.getAs[Double]("c") - x.getAs[Double]("c2")) < 1e-12))
    } finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
  }

  test("SQL registration: vec_dot/vec_norm/vec_cosine callable from spark.sql") {
    VectorFunctionRegistry.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0F,2.0F), array(3.0F,4.0F)) AS d, " +
        "vec_norm(array(3.0D,4.0D)) AS n, " +
        "vec_cosine(array(1.0F,0.0F), array(1.0F,0.0F)) AS c").first()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0 && r.getDouble(2) == 1.0)
  }

  test("null elements contribute zero instead of nulling the result") {
    val r = spark.sql("SELECT vec_dot(array(1.0F, CAST(NULL AS FLOAT), 2.0F), array(1.0F, 1.0F, 1.0F)) AS d")
    VectorFunctionRegistry.register(spark)
    assert(r.first().getDouble(0) == 3.0)
  }

  test("native expression stays inside whole-stage codegen over a real scan") {
    val emb = graft.sources.Tables(spark, sfDir).embeddings
    val df  = emb.select(dot(col("embedding"), col("embedding")).as("sq"))
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vec_dot"), s"no codegen span in:\n$plan")
    // unit-norm corpus: v·v == 1 — and the generated code actually runs
    val sq = df.agg(avg("sq")).first().getDouble(0)
    assert(math.abs(sq - 1.0) < 0.01)
  }
}
