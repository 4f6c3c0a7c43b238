package graft

import org.apache.spark.sql.functions._
import graft.operators.Baskets

/** r11 optimization round: the single-shuffle basket pair/triple builds
  * must be row-identical to the distinct-self-join shapes they replaced
  * — including on baskets with DUPLICATE item lines (q192's by-line
  * contract) and on single-item/empty baskets. */
class BasketsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val items = Seq(
    // basket 1: duplicate line for part 10 (multiplicity 2), plus 20, 30
    (1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L),
    // basket 2: shares (10, 20)
    (2L, 20L), (2L, 10L),
    // basket 3: single item — emits nothing
    (3L, 10L),
    // basket 4: all-duplicate lines of one part — emits nothing
    (4L, 40L), (4L, 40L)
  ).toDF("ok", "pk")

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("pairCounts equals the distinct + self-join + count build") {
    val distinctItems = items.distinct()
    val joined = distinctItems.as("a")
      .join(distinctItems.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("c"))
    assert(sortedRows(Baskets.pairCounts(items, "ok", "pk")) === sortedRows(joined))
  }

  test("pairCountsByLine keeps line multiplicities like the raw self-join (q192 contract)") {
    val joined = items.as("a")
      .join(items.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("c"))
    assert(sortedRows(Baskets.pairCountsByLine(items, "ok", "pk")) === sortedRows(joined))
    // the duplicate 10-line doubles (10, 20): multiplicity is preserved
    val c1020 = Baskets.pairCountsByLine(items, "ok", "pk")
      .filter(col("pa") === 10 && col("pb") === 20).head().getLong(2)
    assert(c1020 === 3L) // basket 1 contributes 2 (dup line), basket 2 contributes 1
  }

  test("distinctEdgesSym equals the distinct + a!=b self-join + distinct build") {
    val distinctItems = items.distinct()
    val joined = distinctItems.as("a")
      .join(distinctItems.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .distinct()
    assert(sortedRows(Baskets.distinctEdgesSym(items, "ok", "pk")) === sortedRows(joined))
  }

  test("tripleCounts equals the distinct three-way self-join build") {
    val withTriples = items.union(Seq((5L, 7L), (5L, 8L), (5L, 9L), (5L, 7L)).toDF("ok", "pk"))
    val d = withTriples.distinct()
    val joined = d.as("a")
      .join(d.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .join(d.as("c"), col("b.ok") === col("c.ok") && col("b.pk") < col("c.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"), col("c.pk").as("pc"))
      .agg(count(lit(1)).as("c"))
    assert(sortedRows(Baskets.tripleCounts(withTriples, "ok", "pk")) === sortedRows(joined))
  }
}
