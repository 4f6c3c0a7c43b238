package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_sketch(col, expectedItems, fpp)` — aggregate a key column into
  * a serialized Bloom filter (binary), the membership companion to the
  * min/max zone map ([[graft.sources.ZoneMap]]).
  *
  * Min/max stats prune RANGE predicates, but a point lookup on a
  * high-cardinality column that spans every partition (user_id over a
  * time-partitioned table) passes every [min, max] test and scans
  * everything. A per-partition Bloom filter answers "can this partition
  * contain value X?" with no false negatives and fpp false positives, so
  * the side-table lookup rules out the ~all partitions that don't hold
  * the key — the same trick as Parquet column bloom filters, hoisted to
  * partition granularity where it prunes whole directories instead of
  * row groups.
  *
  * Built on `org.apache.spark.util.sketch.BloomFilter` (the engine's own
  * sketch, same bit layout as its runtime join filters): partial filters
  * OR-merge associatively on the reduce side, so the build is one
  * aggregation pass however large the table. Size the filter from the
  * expected DISTINCT keys per partition: ~1.2 KB per 1k keys at 1% fpp.
  */
case class BloomSketch(
    child: Expression,
    expectedExpression: Expression,
    fppExpression: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[BloomFilter] {

  private lazy val expectedItems: Long = expectedExpression.eval() match {
    case n: Number => n.longValue()
    case other     => throw new IllegalArgumentException(s"bad expectedItems: $other")
  }
  private lazy val fpp: Double = fppExpression.eval() match {
    case n: Number => n.doubleValue()
    case other     => throw new IllegalArgumentException(s"bad fpp: $other")
  }

  /** Insert matched once to the resolved input type — the same encodings
    * [[BloomZone.mightContain]] probes with. */
  private lazy val put: (BloomFilter, Any) => Unit = child.dataType match {
    case LongType    => (bf, v) => bf.putLong(v.asInstanceOf[Long])
    case IntegerType => (bf, v) => bf.putLong(v.asInstanceOf[Int].toLong)
    case ShortType   => (bf, v) => bf.putLong(v.asInstanceOf[Short].toLong)
    case ByteType    => (bf, v) => bf.putLong(v.asInstanceOf[Byte].toLong)
    case StringType  => (bf, v) => bf.putBinary(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType  => (bf, v) => bf.putBinary(v.asInstanceOf[Array[Byte]])
    case t           => throw new IllegalStateException(s"unsupported type $t")
  }

  override def prettyName: String = "bloom_sketch"
  override def children: Seq[Expression] = Seq(child, expectedExpression, fppExpression)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType | BinaryType =>
      if (!expectedExpression.foldable || !fppExpression.foldable)
        TypeCheckResult.TypeCheckFailure("expectedItems and fpp must be literals")
      else TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs an integral/string/binary key column, got $t")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BloomFilter = BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) put(buffer, v)
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buffer.writeTo(bos)
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomSketch =
    copy(child = newChildren(0), expectedExpression = newChildren(1), fppExpression = newChildren(2))
}

/** Probe side of [[BloomSketch]] — deserialize once, test many values
  * with the value encodings `update` inserted. Driver-side by design:
  * the zone-map side table is O(partitions) rows, so membership tests
  * happen where the partition list is assembled, not in a per-row
  * expression that would re-parse the filter bits every row. */
object BloomZone {
  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  def mightContain(bf: BloomFilter, value: Any): Boolean = value match {
    case l: Long        => bf.mightContainLong(l)
    case i: Int         => bf.mightContainLong(i.toLong)
    case s: Short       => bf.mightContainLong(s.toLong)
    case b: Byte        => bf.mightContainLong(b.toLong)
    case s: String      => bf.mightContainBinary(s.getBytes("UTF-8"))
    case u: UTF8String  => bf.mightContainBinary(u.getBytes)
    case b: Array[Byte] => bf.mightContainBinary(b)
    case other          => throw new IllegalArgumentException(s"unsupported probe type: $other")
  }
}

/** Row-level probe of a [[BloomSketch]]-built filter — the runtime-filter
  * companion to the driver-side [[BloomZone]] partition probe.
  *
  * `bloom_might_contain(filterBytes, key)` tests an integral key against
  * a filter built over the SELECTIVE side of a join and broadcast into
  * this expression as a reference object, so the probe compiles into the
  * scan's whole-stage codegen: fact rows that cannot match are dropped
  * at the scan, before the join's exchange ever sees them. No false
  * negatives (the following exact join keeps correctness; the filter
  * only sheds shuffle volume), fpp false positives ride through to the
  * join. The filter deserializes once per executor — not per row, not
  * per batch. */
case class BloomMightContain(filterBytes: Array[Byte], child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.Predicate {

  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper

  override def prettyName: String = "bloom_might_contain"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs an integral key, got $t")
  }

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && bf.mightContainLong(v.asInstanceOf[Number].longValue())
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", bf, classOf[BloomFilter].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""boolean ${ev.value} = !${c.isNull} && $bfRef.mightContainLong((long) ${c.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
