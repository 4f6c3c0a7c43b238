package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math over
  * `array<float|double>` columns.
  *
  * These exist because the two portable alternatives both lose at scale:
  * higher-order column functions evaluate interpreted (boxed, ~µs per
  * element), and Scala UDFs pay serialization at the row boundary and
  * break whole-stage codegen. A native expression with `doGenCode`
  * compiles to a primitive loop inside the generated stage — no boxing,
  * no row-boundary crossing — which is the right shape for 100 TB of
  * embedding math.
  *
  * Accumulation is double-precision, left-to-right (index order), so
  * results are bit-identical to a serial reference implementation
  * regardless of engine or parallelism. Null elements contribute 0.
  */
trait VectorExpressionHelpers { self: Expression =>
  protected def elemType(t: DataType): DataType = t match {
    case ArrayType(e, _) => e
    case other           => other
  }

  protected def checkVectorInput(types: Seq[DataType]): TypeCheckResult =
    if (types.forall {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires array<float> or array<double> arguments, got ${types.mkString(", ")}")

  protected def getDouble(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case _         => arr.getDouble(i)
  }

  /** Java source for reading element `idx` of `arr` as double. The
    * index variable is caller-supplied: every local in these codegen
    * bodies MUST be a `ctx.freshName` — two vector expressions landing
    * in ONE whole-stage-codegen function otherwise redeclare the same
    * Java locals, janino rejects the class, and the stage silently
    * falls back to interpreted execution (caught in the round-8 bench:
    * "Redefinition of local variable i" on the ANN path). */
  protected def getterSrc(arr: String, idx: String, t: DataType): String = t match {
    case FloatType => s"(double) $arr.getFloat($idx)"
    case _         => s"$arr.getDouble($idx)"
  }
}

/** Σ aᵢ·bᵢ — codegen'd dot product. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with VectorExpressionHelpers {

  override def prettyName: String = "vec_dot"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    checkVectorInput(Seq(left.dataType, right.dataType))

  private lazy val lt = elemType(left.dataType)
  private lazy val rt = elemType(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0; var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) d += getDouble(x, i, lt) * getDouble(y, i, rt)
      i += 1
    }
    d
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $dot += ${getterSrc(x, i, lt)} * ${getterSrc(y, i, rt)};
         |  }
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** ‖v‖₂ — codegen'd euclidean norm. */
case class VecNorm(child: Expression)
    extends UnaryExpression with VectorExpressionHelpers {

  override def prettyName: String = "vec_norm"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    checkVectorInput(Seq(child.dataType))

  private lazy val et = elemType(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0
    while (i < x.numElements()) {
      if (!x.isNullAt(i)) { val v = getDouble(x, i, et); s += v * v }
      i += 1
    }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i"); val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $x.numElements(); $i++) {
         |  if (!$x.isNullAt($i)) {
         |    double $v = ${getterSrc(x, i, et)};
         |    $s += $v * $v;
         |  }
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** Single-pass cosine similarity: dot and both norms in one loop. */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression with VectorExpressionHelpers {

  override def prettyName: String = "vec_cosine"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    checkVectorInput(Seq(left.dataType, right.dataType))

  private lazy val lt = elemType(left.dataType)
  private lazy val rt = elemType(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val u = getDouble(x, i, lt); val v = getDouble(y, i, rt)
        d += u * v; na += u * u; nb += v * v
      }
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else d / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val u = ctx.freshName("u")
      val v = ctx.freshName("v"); val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $d = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    double $u = ${getterSrc(x, i, lt)};
         |    double $v = ${getterSrc(y, i, rt)};
         |    $d += $u * $v; $na += $u * $u; $nb += $v * $v;
         |  }
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = $denom == 0.0 ? 0.0 : $d / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

/** Registers the vector expressions as SQL functions on a session (works
  * on an already-running session; [[GraftExtensions]] does the same at
  * session build time via `spark.sql.extensions`). */
object VectorFunctionRegistry {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot"    -> (args => VecDot(args(0), args(1))),
    "vec_norm"   -> (args => VecNorm(args(0))),
    "vec_cosine" -> (args => VecCosine(args(0), args(1))),
    "tdigest_quantile" -> (args =>
      if (args.length >= 3) TDigestQuantile(args(0), args(1), args(2))
      else new TDigestQuantile(args(0), args(1))),
    "tdigest_sketch" -> (args =>
      TDigestSketch(args(0), if (args.length >= 2) args(1) else Literal(100.0))),
    "tdigest_merge_quantile" -> (args => TDigestMergeQuantile(args(0), args(1))),
    "mg_topk" -> (args => MisraGriesTopK(args(0), args(1))),
    "bloom_sketch" -> (args =>
      BloomSketch(
        args(0),
        if (args.length >= 2) args(1) else Literal(100000L),
        if (args.length >= 3) args(2) else Literal(0.01))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` injects the vector
  * functions into every session built with the config. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    VectorFunctionRegistry.functions.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft.plans.VectorExpressions", name),
          builder))
    }
    ext.injectPlannerStrategy(_ => LshStrategy)
    ext.injectOptimizerRule(_ => LshColumnPruning)
  }
}
