package graft

import graft.plans.MaterializedRollup
import graft.plans.MaterializedRollup.View
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The rollup router must (a) answer routed queries from the MV scan,
  * (b) re-merge every supported aggregate exactly, (c) refuse anything
  * it can't prove — measure filters, distincts, unknown functions. */
class MaterializedRollupSpec extends SparkSpec {

  private val srcPath = s"$sfDir/lineitem.parquet"
  private lazy val mvPath = {
    val p = Files.createTempDirectory("graft-mv").toString + "/lineitem_rf_ls"
    MaterializedRollup.build(
      spark,
      View(srcPath, Seq("l_returnflag", "l_linestatus"), Seq("l_quantity", "l_extendedprice"), p))
    p
  }
  private lazy val view =
    View(srcPath, Seq("l_returnflag", "l_linestatus"), Seq("l_quantity", "l_extendedprice"), mvPath)

  private def src: DataFrame = spark.read.parquet(srcPath)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def scansMv(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("lineitem_rf_ls")

  private def withView[A](f: => A): A = {
    MaterializedRollup.enable(spark, view)
    try f
    finally MaterializedRollup.disable(spark, Some(mvPath))
  }

  test("subset-key aggregate routes to the MV and matches the source answer") {
    def q(df: => DataFrame) = df
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum("l_quantity").as("sq"),
        avg("l_quantity").as("aq"),
        min("l_extendedprice").as("mn"),
        max("l_extendedprice").as("mx"))
    val baseline = sortedRows(q(src))
    withView {
      val routed = q(src)
      assert(scansMv(routed), s"expected MV scan:\n${routed.queryExecution.executedPlan}")
      assert(sortedRows(routed) == baseline, "routed answer diverges from the source answer")
    }
  }

  test("full-key aggregate and key-only filter both route") {
    def q(df: => DataFrame) = df
      .filter(col("l_returnflag") === "R")
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sq"))
    val baseline = sortedRows(q(src))
    withView {
      val routed = q(src)
      assert(scansMv(routed))
      assert(sortedRows(routed) == baseline)

      val full = src.groupBy("l_returnflag", "l_linestatus").agg(sum("l_quantity").as("sq"))
      assert(scansMv(full))
    }
  }

  test("unprovable queries fall through to the source: measure filter, distinct, unsupported fn") {
    withView {
      val measureFilter = src.filter(col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      assert(!scansMv(measureFilter), "a measure predicate must not route")

      val distinctAgg = src.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("nd"))
      assert(!scansMv(distinctAgg), "distinct aggregates must not route")

      val stddevAgg = src.groupBy("l_returnflag")
        .agg(stddev_samp(col("l_quantity")).as("sd"))
      assert(!scansMv(stddevAgg), "unsupported functions must not route")

      val otherTable = spark.read.parquet(s"$sfDir/orders.parquet")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(!scansMv(otherTable), "another table must not route")
    }
  }

  test("disable() restores source execution") {
    MaterializedRollup.enable(spark, view)
    MaterializedRollup.disable(spark, Some(mvPath))
    val q = src.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(!scansMv(q))
  }

  /** Round the float sums (association differs between incremental
    * merge and full rebuild); cnt/min/max compare exactly. */
  private def canon(df: DataFrame): Seq[String] = {
    val rounded = df.columns.foldLeft(df) { (d, c) =>
      if (c.startsWith("sum_")) d.withColumn(c, round(col(c), 4)) else d
    }
    sortedRows(rounded)
  }

  test("incremental maintenance from an insert-only delta equals a full rebuild") {
    val dir = Files.createTempDirectory("graft-ivm").toString
    val base = src.filter(col("l_orderkey") % 7 =!= 0)
    base.write.parquet(s"$dir/source")
    val v = View(s"$dir/source", Seq("l_returnflag", "l_linestatus"),
      Seq("l_quantity", "l_extendedprice"), s"$dir/mv")
    MaterializedRollup.build(spark, v)

    // new rows arrive: append to source, then sync the view from the feed
    val inserts = src.filter(col("l_orderkey") % 7 === 0)
    inserts.write.mode("append").parquet(s"$dir/source")
    MaterializedRollup.maintainIncremental(spark, v, inserts.withColumn("op", lit("insert")))

    val rebuilt = View(s"$dir/source", v.groupCols, v.measureCols, s"$dir/mv_full")
    MaterializedRollup.build(spark, rebuilt)
    assert(canon(spark.read.parquet(v.path)) == canon(spark.read.parquet(rebuilt.path)))
  }

  test("incremental maintenance with deletes recomputes only touched groups, equals a full rebuild") {
    val dir = Files.createTempDirectory("graft-ivm2").toString
    src.write.parquet(s"$dir/source")
    val v = View(s"$dir/source", Seq("l_returnflag", "l_linestatus"),
      Seq("l_quantity", "l_extendedprice"), s"$dir/mv")
    MaterializedRollup.build(spark, v)

    // delete one slice (includes per-group extremal rows with certainty:
    // the filter removes the global quantity maximum rows)
    val doomed = src.filter(col("l_quantity") >= 49)
    assert(doomed.count() > 0)
    val kept = src.filter(col("l_quantity") < 49)
    kept.write.mode("overwrite").parquet(s"$dir/source2")
    val v2 = View(s"$dir/source2", v.groupCols, v.measureCols, v.path)
    MaterializedRollup.maintainIncremental(spark, v2, doomed.withColumn("op", lit("delete")))

    val rebuilt = View(s"$dir/source2", v.groupCols, v.measureCols, s"$dir/mv_full")
    MaterializedRollup.build(spark, rebuilt)
    assert(canon(spark.read.parquet(v.path)) == canon(spark.read.parquet(rebuilt.path)))
  }

  test("incremental maintenance drops a group whose count reaches zero") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ivm3").toString
    val rows = Seq(("A", "x", 1.0, 10.0), ("A", "x", 2.0, 20.0), ("B", "y", 3.0, 30.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    rows.write.parquet(s"$dir/source")
    val v = View(s"$dir/source", Seq("l_returnflag", "l_linestatus"),
      Seq("l_quantity", "l_extendedprice"), s"$dir/mv")
    MaterializedRollup.build(spark, v)

    rows.filter(col("l_returnflag") === "A").write.mode("overwrite").parquet(s"$dir/source2")
    val v2 = View(s"$dir/source2", v.groupCols, v.measureCols, v.path)
    MaterializedRollup.maintainIncremental(
      spark, v2, rows.filter(col("l_returnflag") === "B").withColumn("op", lit("delete")))
    val left = spark.read.parquet(v.path)
    assert(left.count() == 1 && left.first().getString(0) == "A")
  }
}
