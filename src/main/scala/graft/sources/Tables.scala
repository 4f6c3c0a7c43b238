package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table registry over a scale-factor directory.
  *
  * All operators read through here so the scan layer stays swappable
  * (parquet dir locally; Hive metastore tables / object-store layouts on a
  * cluster). Loads are plain `spark.read.parquet` — column pruning and
  * predicate pushdown happen in Catalyst, so callers just select/filter.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** `events.ts` normalization, adaptive to how the parquet was written.
    * Generations of the test data have stored it as TIMESTAMP(NANOS)
    * (which Spark's vectorized reader only reads as a long via the legacy
    * conf — floor-convert ns→µs to match DuckDB's truncation) or as plain
    * TIMESTAMP_NTZ micros (cast to TimestampType; the session timezone is
    * pinned to UTC everywhere, so the cast is value-preserving). Either
    * way downstream operators see one stable TimestampType `ts`. */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table("events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Register every table as a temp view so the whole surface is
    * reachable from `spark.sql(...)` — together with the
    * SparkSessionExtensions-registered functions (vec_*, tdigest_*,
    * bloom_sketch) this is the library's SQL front door. Views are
    * lazy: nothing is scanned until a query runs, and pushdown/pruning
    * work exactly as through the DataFrame API. */
  def createViews(): Unit =
    Seq(
      "region" -> region, "nation" -> nation, "customer" -> customer,
      "supplier" -> supplier, "part" -> part, "orders" -> orders,
      "lineitem" -> lineitem, "events" -> events,
      "documents" -> documents, "embeddings" -> embeddings)
      .foreach { case (n, df) => df.createOrReplaceTempView(n) }
}
