package graft

import graft.operators.BoundedIteration
import org.apache.spark.sql.functions._

class BoundedIterationSpec extends SparkSpec {
  import spark.implicits._

  test("fixpoint runs exactly maxRounds without a convergence predicate") {
    val init = Seq(0L).toDF("v")
    val out = BoundedIteration.fixpoint(init, 5) { (df, _) =>
      df.select((col("v") + 1).as("v"))
    }
    assert(out.as[Long].collect().toSeq == Seq(5L))
  }

  test("fixpoint stops early when converged and passes the 0-based round") {
    val init = Seq(0L).toDF("v")
    var seen = Vector.empty[Int]
    val out = BoundedIteration.fixpoint(
      init, 100,
      converged = (prev, next, r) => {
        seen :+= r
        next.as[Long].head() >= 3L
      }) { (df, _) => df.select((col("v") + 1).as("v")) }
    assert(out.as[Long].head() == 3L)
    assert(seen == Vector(0, 1, 2)) // three rounds, 0-based
  }

  test("fixpoint with requireConvergence errors on truncation") {
    val init = Seq(0L).toDF("v")
    val e = intercept[IllegalArgumentException] {
      BoundedIteration.fixpoint(
        init, 2,
        converged = (_, next, _) => next.as[Long].head() >= 10L,
        requireConvergence = true) { (df, _) => df.select((col("v") + 1).as("v")) }
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("each round's state is checkpointed: plan depth is O(1) in rounds") {
    val init = Seq(1L).toDF("v")
    val out = BoundedIteration.fixpoint(init, 20) { (df, _) =>
      df.select((col("v") + 1).as("v"))
    }
    // a checkpointed state plans as a scan of an RDD, not a 20-project tower
    val planLines = out.queryExecution.optimizedPlan.toString.linesIterator.size
    assert(planLines <= 4, s"plan unexpectedly deep:\n${out.queryExecution.optimizedPlan}")
    assert(out.as[Long].head() == 21L)
  }
}
