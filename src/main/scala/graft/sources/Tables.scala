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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as a long and floor-convert ns→µs (matching
    * DuckDB's truncation) into a proper TimestampType column. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events").withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
