package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable raw-moment buffer over the first `nDims` dimensions of a
  * vector column: per-dimension sums/counts plus upper-triangle
  * pair-product sums/counts (k = triangle index of (i, j), j ≥ i,
  * row-major). One tight JIT loop per input row — no per-pair tuple
  * boxing, no explode, no join; partial buffers merge element-wise on
  * the reduce side, so the shuffle carries O(d²) doubles per task
  * regardless of row count. Ragged vectors contribute only the
  * dimensions they actually have (per-dim / per-pair counts track
  * that), matching the former explode-based kernel's semantics. */
final class MomentBuffer(val nDims: Int) extends Serializable {
  val nPairs: Int = nDims * (nDims + 1) / 2
  val dimSum = new Array[Double](nDims)
  val dimCnt = new Array[Long](nDims)
  val pairSum = new Array[Double](nPairs)
  val pairCnt = new Array[Long](nPairs)

  def add(values: Array[Double], n: Int): Unit = {
    var i = 0
    var k = 0
    while (i < n) {
      val xi = values(i)
      dimSum(i) += xi
      dimCnt(i) += 1
      // triangle row i starts at i*nDims - i*(i-1)/2; walking rows in
      // order keeps k contiguous without recomputing the base
      k = i * nDims - i * (i - 1) / 2
      var j = i
      while (j < n) {
        pairSum(k) += xi * values(j)
        pairCnt(k) += 1
        j += 1
        k += 1
      }
      i += 1
    }
  }

  def merge(other: MomentBuffer): Unit = {
    var i = 0
    while (i < nDims) {
      dimSum(i) += other.dimSum(i); dimCnt(i) += other.dimCnt(i); i += 1
    }
    var k = 0
    while (k < nPairs) {
      pairSum(k) += other.pairSum(k); pairCnt(k) += other.pairCnt(k); k += 1
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(nDims)
    var i = 0
    while (i < nDims) { out.writeDouble(dimSum(i)); out.writeLong(dimCnt(i)); i += 1 }
    var k = 0
    while (k < nPairs) { out.writeDouble(pairSum(k)); out.writeLong(pairCnt(k)); k += 1 }
    out.flush()
    bos.toByteArray
  }
}

object MomentBuffer {
  def deserialize(bytes: Array[Byte]): MomentBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new MomentBuffer(in.readInt())
    var i = 0
    while (i < b.nDims) { b.dimSum(i) = in.readDouble(); b.dimCnt(i) = in.readLong(); i += 1 }
    var k = 0
    while (k < b.nPairs) { b.pairSum(k) = in.readDouble(); b.pairCnt(k) = in.readLong(); k += 1 }
    b
  }
}

/** `moment_matrix(vec, nDims)` — one-pass raw moments of a
  * vector column (array<float> / array<double>). Output struct:
  * `dim_sum: array<double>, dim_cnt: array<long>` (per-dimension Σx and
  * non-null counts) and `pair_sum: array<double>, pair_cnt: array<long>`
  * (upper-triangle Σ x_i·x_j and co-presence counts, row-major triangle
  * order). Consumers derive means, covariance and Gram matrices from
  * the single row this emits. */
case class MomentMatrix(
    child: Expression,
    nDimsExpression: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentBuffer] {

  private lazy val nDims: Int = nDimsExpression.eval() match {
    case n: Number => n.intValue()
    case other     => throw new IllegalArgumentException(s"bad nDims: $other")
  }

  private lazy val elementGet: (ArrayData, Int) => Double =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case DoubleType => (a, i) => a.getDouble(i)
      case FloatType  => (a, i) => a.getFloat(i).toDouble
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  override def prettyName: String = "moment_matrix"
  override def children: Seq[Expression] = Seq(child, nDimsExpression)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if nDimsExpression.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure("nDims must be a literal")
    case t =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<float|double>, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("dim_sum", ArrayType(DoubleType, containsNull = false)),
    StructField("dim_cnt", ArrayType(LongType, containsNull = false)),
    StructField("pair_sum", ArrayType(DoubleType, containsNull = false)),
    StructField("pair_cnt", ArrayType(LongType, containsNull = false))))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MomentBuffer = new MomentBuffer(nDims)

  // scratch row values, reused across update calls (single-threaded per
  // task, like every aggregate buffer)
  @transient private lazy val scratch = new Array[Double](nDims)

  override def update(buffer: MomentBuffer, input: InternalRow): MomentBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(nDims, arr.numElements())
      // a null element truncates the contribution at that position —
      // vectors in practice have no null cells; this just avoids NPE
      var i = 0
      var ok = true
      while (i < n && ok) {
        if (arr.isNullAt(i)) ok = false
        else { scratch(i) = elementGet(arr, i); i += 1 }
      }
      buffer.add(scratch, i)
    }
    buffer
  }

  override def merge(buffer: MomentBuffer, other: MomentBuffer): MomentBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: MomentBuffer): Any =
    new GenericInternalRow(Array[Any](
      new GenericArrayData(buffer.dimSum),
      new GenericArrayData(buffer.dimCnt),
      new GenericArrayData(buffer.pairSum),
      new GenericArrayData(buffer.pairCnt)))

  override def serialize(buffer: MomentBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): MomentBuffer = MomentBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MomentMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MomentMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MomentMatrix =
    copy(child = newChildren(0), nDimsExpression = newChildren(1))
}
