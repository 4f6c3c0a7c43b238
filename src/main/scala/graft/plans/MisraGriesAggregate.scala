package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary — the deterministic-guarantee
  * heavy-hitter sketch beside the probabilistic CMS (q82): at most
  * `k − 1` counters, each reported count is a LOWER bound within n/k of
  * the true frequency, and every item with true frequency > n/k is
  * guaranteed to survive. That guarantee is what makes the
  * sketch-then-exact-recount pattern (q205) yield an EXACTLY correct,
  * deterministic answer from a lossy O(k) summary.
  *
  * Mergeable-summaries contract (Agarwal et al., PODS'12): partial
  * summaries sum their counters, then shrink back to k − 1 entries by
  * subtracting the k-th largest count — the n/k error bound is
  * preserved under any merge tree, which is exactly the associativity a
  * partial/final Spark aggregation needs. Intermediate counter values
  * depend on merge order (inherent to MG); the q205 recount step is
  * what restores cross-run determinism.
  */
final class MGSummary(val k: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  var n: Long = 0L

  def add(x: String): Unit = {
    n += 1
    counts.get(x) match {
      case Some(c) => counts.update(x, c + 1)
      case None =>
        if (counts.size < k - 1) counts.update(x, 1L)
        else decrementAll(1L)
    }
  }

  private def decrementAll(by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    counts.foreach { case (key, c) =>
      if (c <= by) dead += key else counts.update(key, c - by)
    }
    dead.foreach(counts.remove)
  }

  def merge(other: MGSummary): Unit = {
    n += other.n
    other.counts.foreach { case (key, c) =>
      counts.update(key, counts.getOrElse(key, 0L) + c)
    }
    if (counts.size > k - 1) {
      // shrink: subtract the k-th largest counter from all
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(sorted.length - k)
      decrementAll(cut)
    }
  }
}

/** `mg_topk(col, k)` → struct(n, items: array<struct<item, count_lb>>),
  * items sorted by (count desc, item asc). */
case class MisraGriesTopK(
    child: Expression,
    kExpression: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[MGSummary] {

  private lazy val k: Int = kExpression.eval() match {
    case n: Number if n.intValue() >= 2 => n.intValue()
    case other => throw new IllegalArgumentException(s"mg_topk k must be ≥ 2, got $other")
  }

  override def prettyName: String = "mg_topk"
  override def children: Seq[Expression] = Seq(child, kExpression)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (!kExpression.foldable) TypeCheckResult.TypeCheckFailure("k must be a literal")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string column, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_lb", LongType, nullable = false))), containsNull = false))))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MGSummary, other: MGSummary): MGSummary = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: MGSummary): Any = {
    val items = buffer.counts.toArray
      .sortBy { case (item, c) => (-c, item) }
      .map { case (item, c) =>
        InternalRow(UTF8String.fromString(item), c): Any
      }
    InternalRow(buffer.n, new GenericArrayData(items))
  }

  override def serialize(buffer: MGSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeLong(buffer.n)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (item, c) =>
      val bytes = item.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new MGSummary(in.readInt())
    s.n = in.readLong()
    val size = in.readInt()
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      s.counts.update(new String(buf, "UTF-8"), in.readLong())
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = newChildren(0), kExpression = newChildren(1))
}
