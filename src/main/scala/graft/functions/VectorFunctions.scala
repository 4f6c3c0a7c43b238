package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` columns via higher-order
  * functions — fully codegen'd, left-to-right double accumulation
  * (bit-identical to a serial loop, so results are engine-portable). */
object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toColumn, expression}
  import graft.plans.{VecCosine, VecDot, VecNorm}

  /** Σ aᵢ·bᵢ in double precision — native codegen'd expression
    * ([[graft.plans.VecDot]]): primitive loop inside whole-stage codegen,
    * same left-to-right accumulation as a serial reference loop. */
  def dot(a: Column, b: Column): Column = toColumn(VecDot(expression(a), expression(b)))

  /** ‖v‖₂ in double precision (native codegen). */
  def norm(v: Column): Column = toColumn(VecNorm(expression(v)))

  /** Single-pass cosine (native codegen). */
  def cosine(a: Column, b: Column): Column = toColumn(VecCosine(expression(a), expression(b)))

  /** One-pass raw-moment aggregate over the first `nDims` dimensions of
    * a vector column ([[graft.plans.MomentMatrix]]): per-dim Σx/counts
    * plus upper-triangle Σx_i·x_j/co-counts in ONE tight-loop pass — no
    * per-pair explode, no boxed tuples; partial buffers merge on the
    * reduce side. */
  def momentMatrix(v: Column, nDims: Int): Column =
    toColumn(
      graft.plans.MomentMatrix(
        expression(v),
        org.apache.spark.sql.catalyst.expressions.Literal(nDims)).toAggregateExpression())

  /** Declarative (higher-order-function) variants: interpreted and ~1000×
    * slower per element, kept as the portable reference semantics the
    * native expressions are tested against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def normHof(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Signed-random-projection bucket id: sign bits of `v·plane_j` folded
    * into an int. `planes` must be a literal array<array<double>>. */
  def srpBucket(v: Column, planes: Column): Column =
    aggregate(
      transform(planes, p => when(dot(v, p) > 0, 1).otherwise(0)),
      lit(0),
      (acc, bit) => acc * 2 + bit)

  /** Deterministic ±1 hyperplanes (Rademacher) for SRP-LSH: seeded hash,
    * no RNG state, so every executor derives the same planes. */
  def rademacherPlanes(numPlanes: Int, dim: Int, seed: Int = 42): Seq[Seq[Double]] =
    Seq.tabulate(numPlanes) { j =>
      Seq.tabulate(dim) { i =>
        val h = scala.util.hashing.MurmurHash3.productHash((seed, j, i))
        if ((h & 1) == 0) 1.0 else -1.0
      }
    }
}
