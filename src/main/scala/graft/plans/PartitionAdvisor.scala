package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** q312: partition-layout advisor — the front half of the layout family
  * (compaction_planner sizes files AFTER layout; storage_audit measures
  * an existing one; this CHOOSES the partition column): for every
  * plausible candidate (string/integer columns, plus the DATE derived
  * from each timestamp — the reference sink's own dt layout), one
  * grouped aggregate yields cardinality, skew, and rows-per-partition,
  * and a verdict ranks them against the three failure modes a 100 TB
  * table actually hits:
  *
  *  - too many partitions → small-file explosion (metastore + NN load,
  *    open-file churn at write);
  *  - too few / constant → no pruning, every query scans everything;
  *  - skewed → one partition holds the table, stragglers everywhere.
  *
  * Driver-side by design, bounded by #columns never rows (the
  * MvAdvisor discipline): each candidate costs one aggregate over the
  * table — at 100 TB run it on a hash sample; cardinality RATIOS, not
  * absolutes, drive the verdicts. */
object PartitionAdvisor {

  private def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  def advise(
      df: DataFrame,
      targetRowsPerPartition: Long = 1000000L,
      maxPartitions: Long = 10000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val total = df.count()
    val candidates: Seq[(String, Column)] = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case TimestampType | TimestampNTZType =>
          Seq(s"date(${f.name})" -> to_date(col(f.name)).cast("string"))
        case StringType | LongType | IntegerType | ShortType | DateType =>
          Seq(f.name -> col(f.name).cast("string"))
        case _ => Nil
      }
    }
    val rows = candidates.map { case (name, c) =>
      val st = df.groupBy(c.as("v")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("nd"), max("n").as("topn")).head()
      val nd = st.getLong(0)
      val topn = st.getLong(1)
      val rpp = total.toDouble / math.max(1L, nd)
      val topShare = topn.toDouble / math.max(1L, total)
      val (verdict, reason) =
        if (nd < 2) ("reject", "constant column: no pruning possible")
        else if (nd > maxPartitions)
          ("reject", s"$nd partitions: small-file explosion")
        else if (topShare > 0.5)
          // no numeric interpolation: the share is already a column
          // (top_share), and %-formatting is the one thing two engines
          // can disagree on at exact half-ULPs — keep reasons literal
          ("warn", "top value holds over half of rows: skewed partitions")
        else ("ok", "balanced cardinality and spread")
      // fit = distance of rows/partition from target, in log decades —
      // 10× over or under costs equally
      val fit = math.abs(math.log10(rpp / targetRowsPerPartition.toDouble))
      (name, nd, r4(topShare), r4(rpp), verdict, reason, r4(fit))
    }
    val ranked = rows
      .sortBy { case (n, _, _, _, v, _, fit) =>
        (v match { case "ok" => 0; case "warn" => 1; case _ => 2 }, fit, n)
      }
      .zipWithIndex
      .map { case ((n, nd, ts, rpp, v, rsn, fit), i) =>
        ((i + 1).toLong, n, nd, ts, rpp, v, rsn, fit)
      }
    ranked.toSeq.toDF(
      "rank", "candidate", "n_partitions", "top_share", "rows_per_partition",
      "verdict", "reason", "fit_log10")
  }
}
