package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Merging t-digest (Dunning's MergingDigest shape): centroids sized by
  * the k₁ scale function, so resolution concentrates at the tails where
  * percentile error matters. This is the constant-memory dual of exact
  * percentiles (q16): a digest is a few KB regardless of input rows,
  * partial digests merge associatively on the reduce side, and accuracy
  * degrades gracefully (tight at the tails, loosest at the median) —
  * the right trade at 100 TB where exact percentiles would need a
  * global sort.
  *
  * Points buffer locally and compress in batches: one sort of
  * (centroids + buffer) per compression, then a single greedy pass that
  * merges neighbours while the merged weight stays under the k₁ bound
  * `4·W·q(1-q)/δ`.
  */
final class TDigest(initialCompression: Double) extends Serializable {
  // adopted upward when merging a finer-grained sketch, so re-merging
  // stored δ=200 sketches through a δ=100 buffer keeps their accuracy
  private var compressionV = initialCompression
  def compression: Double = compressionV
  private var means   = new Array[Double](0)
  private var weights = new Array[Double](0)
  private var nCentroids = 0

  private val bufCap = 512
  private var buf    = new Array[Double](bufCap)
  private var bufN   = 0
  // true whenever centroids were appended out of order since the last
  // merge pass (quantile/serialize need the sorted canonical form)
  private var dirty = false

  def totalWeight: Double = {
    var w = 0.0; var i = 0
    while (i < nCentroids) { w += weights(i); i += 1 }
    w + bufN
  }

  def add(x: Double): Unit = {
    if (bufN == bufCap) compress()
    buf(bufN) = x
    bufN += 1
  }

  /** Bulk merge: append the other digest's centroid arrays in one copy,
    * then ONE compress pass — the reduce path runs O((C₁+C₂)·log) per
    * merge, not a full sort per incoming centroid. */
  def merge(other: TDigest): Unit = {
    other.compress()
    if (other.compressionV > compressionV) compressionV = other.compressionV
    compress() // flush own point buffer so centroid arrays are canonical
    val n2 = nCentroids + other.nCentroids
    val m2 = java.util.Arrays.copyOf(means, n2)
    val w2 = java.util.Arrays.copyOf(weights, n2)
    System.arraycopy(other.means, 0, m2, nCentroids, other.nCentroids)
    System.arraycopy(other.weights, 0, w2, nCentroids, other.nCentroids)
    means = m2; weights = w2; nCentroids = n2
    dirty = true
    compress()
  }

  /** The k₁ scale function δ/2π·asin(2q−1): steep at the tails, so a
    * centroid there may hold little weight (tight tail percentiles),
    * flat at the median where error matters least. */
  private def kScale(q: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)

  /** One merge pass: sort centroids+buffer by mean, then greedily fuse
    * neighbours while the fused centroid spans ≤1 unit of k₁ — the
    * merging-digest criterion, which caps the centroid count at ~2δ. */
  def compress(): Unit = {
    if (bufN == 0 && !dirty && nCentroids <= 2 * compression.toInt) return
    if (bufN == 0 && nCentroids == 0) return
    val m = new Array[Double](nCentroids + bufN)
    val w = new Array[Double](nCentroids + bufN)
    var i = 0
    while (i < nCentroids) { m(i) = means(i); w(i) = weights(i); i += 1 }
    var j = 0
    while (j < bufN) { m(nCentroids + j) = buf(j); w(nCentroids + j) = 1.0; j += 1 }
    val order = m.indices.sortBy(i => m(i))
    val total = w.sum

    val outM = new Array[Double](m.length)
    val outW = new Array[Double](m.length)
    var outN = 0
    var curM = m(order.head)
    var curW = w(order.head)
    var cumLeft = 0.0 // weight fully emitted so far
    var kLeft = kScale(0.0)
    var k = 1
    while (k < order.length) {
      val idx = order(k)
      val qMerged = (cumLeft + curW + w(idx)) / total
      if (kScale(qMerged) - kLeft <= 1.0) {
        // weighted mean keeps the centroid unbiased
        curM = (curM * curW + m(idx) * w(idx)) / (curW + w(idx))
        curW += w(idx)
      } else {
        outM(outN) = curM; outW(outN) = curW; outN += 1
        cumLeft += curW
        kLeft = kScale(cumLeft / total)
        curM = m(idx); curW = w(idx)
      }
      k += 1
    }
    outM(outN) = curM; outW(outN) = curW; outN += 1
    means = outM.take(outN)
    weights = outW.take(outN)
    nCentroids = outN
    bufN = 0
    dirty = false
  }

  /** Interpolated quantile across centroid midpoints. The target rank
    * q·(W−1)+½ (not q·W) makes a digest of singleton centroids
    * reproduce exact Type-7 percentile interpolation bit-for-bit, and
    * the two conventions coincide as W grows. */
  def quantile(q: Double): Double = {
    compress()
    if (nCentroids == 0) return Double.NaN
    if (nCentroids == 1) return means(0)
    val target = q * (totalWeight - 1.0) + 0.5
    var cum = 0.0
    var i = 0
    var prevMid = 0.0
    var prevMean = means(0)
    while (i < nCentroids) {
      val mid = cum + weights(i) / 2.0
      if (target <= mid) {
        if (i == 0) return means(0)
        val t = (target - prevMid) / (mid - prevMid)
        return prevMean + t * (means(i) - prevMean)
      }
      prevMid = mid
      prevMean = means(i)
      cum += weights(i)
      i += 1
    }
    means(nCentroids - 1)
  }

  def centroidCount: Int = { compress(); nCentroids }

  def serialize(): Array[Byte] = {
    compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(compression)
    out.writeInt(nCentroids)
    var i = 0
    while (i < nCentroids) { out.writeDouble(means(i)); out.writeDouble(weights(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object TDigest {
  def deserialize(bytes: Array[Byte]): TDigest = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d  = new TDigest(in.readDouble())
    val n  = in.readInt()
    // serialize() wrote the compressed canonical (sorted) form — restore
    // the arrays wholesale, no re-compression needed
    d.means = new Array[Double](n)
    d.weights = new Array[Double](n)
    var i = 0
    while (i < n) { d.means(i) = in.readDouble(); d.weights(i) = in.readDouble(); i += 1 }
    d.nCentroids = n
    d
  }
}

/** `tdigest_quantile(col, p [, compression])` — SQL/Column aggregate over
  * a [[TDigest]] buffer. `p` is a foldable double or array<double>;
  * output shape matches (double / array<double>), like
  * `percentile_approx`. Partial digests serialize to a few KB and merge
  * on the reduce side — constant memory at any input size. */
case class TDigestQuantile(
    child: Expression,
    percentageExpression: Expression,
    compressionExpression: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  def this(child: Expression, percentageExpression: Expression) =
    this(child, percentageExpression, Literal(100.0))

  private lazy val returnArray: Boolean =
    percentageExpression.dataType.isInstanceOf[ArrayType]

  private def asDouble(v: Any): Double = v match {
    case d: Double  => d
    case f: Float   => f.toDouble
    case d: Decimal => d.toDouble
    case n: Number  => n.doubleValue()
    case other      => throw new IllegalArgumentException(s"non-numeric literal: $other")
  }

  private lazy val percentages: Array[Double] = percentageExpression.eval() match {
    case arr: ArrayData =>
      val et = percentageExpression.dataType.asInstanceOf[ArrayType].elementType
      arr.toObjectArray(et).map(asDouble)
    case v => Array(asDouble(v))
  }

  private lazy val compression: Double = asDouble(compressionExpression.eval())

  /** Unboxing converter matched once to the (resolved) input type, so
    * `update` does no per-row type dispatch. */
  private lazy val toDouble: Any => Double = child.dataType match {
    case DoubleType     => v => v.asInstanceOf[Double]
    case FloatType      => v => v.asInstanceOf[Float].toDouble
    case _: DecimalType => v => v.asInstanceOf[Decimal].toDouble
    case _              => v => v.asInstanceOf[Number].doubleValue()
  }

  override def prettyName: String = "tdigest_quantile"
  override def children: Seq[Expression] =
    Seq(child, percentageExpression, compressionExpression)
  override def checkInputDataTypes(): TypeCheckResult = {
    def numericish(t: DataType): Boolean = t match {
      case _: NumericType => true
      case _              => false
    }
    def pctTypeOk = percentageExpression.dataType match {
      case ArrayType(e, _) => numericish(e)
      case t               => numericish(t)
    }
    if (!numericish(child.dataType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs a numeric column, got ${child.dataType}")
    else if (!percentageExpression.foldable || !compressionExpression.foldable)
      TypeCheckResult.TypeCheckFailure("percentage and compression must be literals")
    else if (!pctTypeOk || !numericish(compressionExpression.dataType))
      TypeCheckResult.TypeCheckFailure("percentage and compression must be numeric")
    else if (percentages.exists(p => p < 0.0 || p > 1.0))
      TypeCheckResult.TypeCheckFailure("percentages must be in [0, 1]")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType =
    if (returnArray) ArrayType(DoubleType, containsNull = false) else DoubleType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buffer.add(toDouble(v))
    buffer
  }

  override def merge(buffer: TDigest, other: TDigest): TDigest = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: TDigest): Any = {
    if (buffer.totalWeight == 0.0) return null
    val qs = percentages.map(buffer.quantile)
    if (returnArray) new GenericArrayData(qs) else qs.head
  }

  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TDigestQuantile =
    copy(
      child = newChildren(0),
      percentageExpression = newChildren(1),
      compressionExpression = newChildren(2))
}

/** `tdigest_sketch(col [, compression])` — aggregate a numeric column
  * into a serialized t-digest (binary). The storable half of the
  * sketch-table pattern: aggregate once per partition/hour into a
  * few-KB sketch column, then answer percentile queries over ANY time
  * range by re-merging stored sketches ([[TDigestMergeQuantile]])
  * instead of rescanning raw rows — the only way percentile rollups
  * stay interactive at 100 TB. */
case class TDigestSketch(
    child: Expression,
    compressionExpression: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  private lazy val compression: Double = compressionExpression.eval() match {
    case d: Double => d
    case n: Number => n.doubleValue()
    case other     => throw new IllegalArgumentException(s"bad compression: $other")
  }

  private lazy val toDouble: Any => Double = child.dataType match {
    case DoubleType     => v => v.asInstanceOf[Double]
    case FloatType      => v => v.asInstanceOf[Float].toDouble
    case _: DecimalType => v => v.asInstanceOf[Decimal].toDouble
    case _              => v => v.asInstanceOf[Number].doubleValue()
  }

  override def prettyName: String = "tdigest_sketch"
  override def children: Seq[Expression] = Seq(child, compressionExpression)
  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs a numeric column, got ${child.dataType}")
    else if (!compressionExpression.foldable)
      TypeCheckResult.TypeCheckFailure("compression must be a literal")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TDigest = new TDigest(compression)
  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buffer.add(toDouble(v))
    buffer
  }
  override def merge(buffer: TDigest, other: TDigest): TDigest = { buffer.merge(other); buffer }
  override def eval(buffer: TDigest): Any = buffer.serialize()
  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TDigestSketch =
    copy(child = newChildren(0), compressionExpression = newChildren(1))
}

/** `tdigest_merge_quantile(sketchCol, p)` — re-merge stored binary
  * t-digest sketches and read quantiles off the merged digest. The query
  * half of the sketch-table pattern: input rows are sketches, not data
  * points, so a year-long percentile query touches O(partitions) KB. */
case class TDigestMergeQuantile(
    child: Expression,
    percentageExpression: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  private lazy val returnArray: Boolean =
    percentageExpression.dataType.isInstanceOf[ArrayType]

  private def asDouble(v: Any): Double = v match {
    case d: Double  => d
    case f: Float   => f.toDouble
    case d: Decimal => d.toDouble
    case n: Number  => n.doubleValue()
    case other      => throw new IllegalArgumentException(s"non-numeric literal: $other")
  }

  private lazy val percentages: Array[Double] = percentageExpression.eval() match {
    case arr: ArrayData =>
      val et = percentageExpression.dataType.asInstanceOf[ArrayType].elementType
      arr.toObjectArray(et).map(asDouble)
    case v => Array(asDouble(v))
  }

  override def prettyName: String = "tdigest_merge_quantile"
  override def children: Seq[Expression] = Seq(child, percentageExpression)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs a binary sketch column, got ${child.dataType}")
    else if (!percentageExpression.foldable)
      TypeCheckResult.TypeCheckFailure("percentage must be a literal")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType =
    if (returnArray) ArrayType(DoubleType, containsNull = false) else DoubleType
  override def nullable: Boolean = true

  // compression rides inside each serialized sketch; the buffer adopts
  // the finest (max) compression of the sketches it merges, so stored
  // accuracy survives the re-merge
  override def createAggregationBuffer(): TDigest = new TDigest(100.0)
  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buffer.merge(TDigest.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }
  override def merge(buffer: TDigest, other: TDigest): TDigest = { buffer.merge(other); buffer }
  override def eval(buffer: TDigest): Any = {
    if (buffer.totalWeight == 0.0) return null
    val qs = percentages.map(buffer.quantile)
    if (returnArray) new GenericArrayData(qs) else qs.head
  }
  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestMergeQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestMergeQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TDigestMergeQuantile =
    copy(child = newChildren(0), percentageExpression = newChildren(1))
}
