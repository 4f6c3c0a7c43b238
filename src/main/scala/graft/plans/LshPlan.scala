package graft.plans

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DataType, LongType}

import scala.collection.mutable.ArrayBuffer

/** Whole-operator custom plan: fused LSH candidate-pair generation.
  *
  * The composed DataFrame version (Dedup.minhashLshPairs) pays three
  * shuffles before verification: the banded explode feeds a window (to
  * size buckets), the bucket self-join exchanges both sides, and the
  * pair dedup shuffles again. This operator fuses band explosion,
  * bucket grouping, the degenerate-bucket cap, and in-bucket pair
  * emission into ONE shuffle: map side emits ((band, bucket), id)
  * straight out of the signature rows (no materialized explode), the
  * reduce side groups buckets in memory, drops buckets past `maxBucket`
  * (the quadratic-blowup guard — enforced before any pair exists), and
  * streams out id pairs. Output is candidate pairs, possibly repeated
  * across bands — callers `distinct()` before the verification join,
  * so the whole pipeline is 2 shuffles instead of 4.
  *
  * The full custom-operator surface, registered by [[GraftExtensions]]
  * (or lazily via [[LshApi.ensureRegistered]]):
  * [[LshCandidatePairs]] (logical) → [[LshColumnPruning]]
  * (optimizer rule) → [[LshStrategy]] (planner strategy) →
  * [[LshCandidatePairsExec]] (physical).
  */
case class LshCandidatePairs(
    idName: String,
    sigName: String,
    bands: Int,
    rowsPer: Int,
    maxBucket: Int,
    child: LogicalPlan,
    // output lives in the constructor so `copy()`/`transform` preserve
    // expr ids — a recomputed `val output` would orphan every downstream
    // reference on the first tree transform
    output: Seq[Attribute] = Seq(
      AttributeReference("doc_a", LongType, nullable = false)(),
      AttributeReference("doc_b", LongType, nullable = false)())) extends UnaryNode {

  override def references: AttributeSet =
    AttributeSet(child.output.filter(a => a.name == idName || a.name == sigName))

  // the output attrs are minted here, not consumed from the child
  override def producedAttributes: AttributeSet = AttributeSet(output)

  override lazy val resolved: Boolean =
    child.resolved && Seq(idName, sigName).forall(n => child.output.exists(_.name == n))

  override protected def withNewChildInternal(newChild: LogicalPlan): LshCandidatePairs =
    copy(child = newChild)
}

/** Column pruning for the custom node: only (id, sig) may flow into the
  * exec, so a wide child collapses to a 2-column scan exactly as it
  * would under a declarative Project. */
object LshColumnPruning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case l: LshCandidatePairs if l.resolved && l.child.output.size > 2 =>
      val keep = l.child.output.filter(a => a.name == l.idName || a.name == l.sigName)
      l.copy(child = Project(keep, l.child))
  }
}

object LshStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case l: LshCandidatePairs =>
      LshCandidatePairsExec(l.bands, l.rowsPer, l.maxBucket, l.output, l.idName, l.sigName, planLater(l.child)) :: Nil
    case _ => Nil
  }
}

case class LshCandidatePairsExec(
    bands: Int,
    rowsPer: Int,
    maxBucket: Int,
    output: Seq[Attribute],
    idName: String,
    sigName: String,
    child: SparkPlan) extends UnaryExecNode {

  override protected def withNewChildInternal(newChild: SparkPlan): LshCandidatePairsExec =
    copy(child = newChild)

  override def producedAttributes: AttributeSet = AttributeSet(output)

  override protected def doExecute(): RDD[InternalRow] = {
    val idIdx  = child.output.indexWhere(_.name == idName)
    val sigIdx = child.output.indexWhere(_.name == sigName)
    require(idIdx >= 0 && sigIdx >= 0, s"columns $idName/$sigName not in ${child.output}")
    val nParts = conf.numShufflePartitions
    val b = bands; val r = rowsPer; val cap = maxBucket

    // map side: ((band, bucket-hash), id) straight from the signature —
    // the banded "explode" never materializes as rows in a columnar batch
    val keyed: RDD[((Int, Long), Long)] = child.execute().mapPartitions { iter =>
      iter.flatMap { row =>
        if (row.isNullAt(idIdx) || row.isNullAt(sigIdx)) Iterator.empty
        else {
          val id  = row.getLong(idIdx)
          val sig = row.getArray(sigIdx)
          if (sig.numElements() < b * r) Iterator.empty
          else Iterator.tabulate(b) { band =>
            // xxhash-style avalanche over the band's signature slice
            var h = 0x9E3779B97F4A7C15L + band
            var i = 0
            while (i < r) {
              h = (h ^ sig.getLong(band * r + i)) * 0xC2B2AE3D27D4EB4FL
              h ^= (h >>> 29)
              i += 1
            }
            ((band, h), id)
          }
        }
      }
    }

    // reduce side: group by exact (band, bucket), cap, emit pairs.
    // Memory per task is the banded rows of one shuffle partition —
    // bounded by maxBucket per group and sized by numShufflePartitions.
    keyed.partitionBy(new HashPartitioner(nParts)).mapPartitions { iter =>
      val groups = new java.util.HashMap[(Int, Long), ArrayBuffer[Long]]()
      iter.foreach { case (k, id) =>
        var buf = groups.get(k)
        if (buf == null) { buf = new ArrayBuffer[Long](4); groups.put(k, buf) }
        buf += id
      }
      val proj = UnsafeProjection.create(Array[DataType](LongType, LongType))
      val row  = new GenericInternalRow(2)
      import scala.jdk.CollectionConverters._
      groups.values().iterator().asScala.flatMap { ids =>
        if (ids.length < 2 || ids.length > cap) Iterator.empty
        else {
          val sorted = ids.sorted.distinct
          for {
            i <- sorted.indices.iterator
            j <- (i + 1 until sorted.length).iterator
          } yield {
            row.update(0, sorted(i))
            row.update(1, sorted(j))
            proj(row)
          }
        }
      }
    }
  }
}

/** DataFrame entry point for the fused operator. */
object LshApi {

  /** Idempotently register strategy + rule on a live session (sessions
    * built with `spark.sql.extensions=graft.plans.GraftExtensions` get
    * them at build time). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraStrategies.contains(LshStrategy))
      em.extraStrategies = em.extraStrategies :+ LshStrategy
    if (!em.extraOptimizations.contains(LshColumnPruning))
      em.extraOptimizations = em.extraOptimizations :+ LshColumnPruning
  }

  /** Candidate pairs (doc_a, doc_b), repeated across agreeing bands —
    * `distinct()` before verification. */
  def candidatePairs(
      sigs: DataFrame,
      idCol: String = "doc_id",
      sigCol: String = "sig",
      bands: Int = 32,
      rowsPer: Int = 4,
      maxBucket: Int = 100): DataFrame = {
    val spark = sigs.sparkSession
    ensureRegistered(spark)
    org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(
      spark,
      LshCandidatePairs(idCol, sigCol, bands, rowsPer, maxBucket, sigs.queryExecution.analyzed))
  }
}
