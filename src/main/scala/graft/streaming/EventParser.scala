package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative event-line parser (the reference sink's serializer path,
  * inverted): raw delimited log lines → typed columns.
  *
  * Built on `from_csv` so it is codegen'd, streaming-safe (works the same
  * on a `readStream` of lines) and permissive: malformed lines land in
  * `_corrupt` instead of killing the stream — the reference's
  * received/failed counter split falls out of one filter.
  */
object EventParser {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Parse one line column into the typed event struct + `_corrupt`. */
  def parseLines(lines: DataFrame, lineCol: String = "value", sep: String = "\t"): DataFrame = {
    val schemaWithCorrupt = eventSchema.add(StructField("_corrupt", StringType))
    val opts = Map(
      "sep" -> sep,
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> "_corrupt",
      "timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS")
    lines
      .withColumn("parsed", from_csv(col(lineCol), schemaWithCorrupt, opts))
      .select(col("parsed.*"))
  }

  def wellFormed(parsed: DataFrame): DataFrame = parsed.filter(col("_corrupt").isNull).drop("_corrupt")
  def corrupt(parsed: DataFrame): DataFrame    = parsed.filter(col("_corrupt").isNotNull)

  /** The delimited-line serialization of one typed event row (the
    * reference sink's output format). */
  def lineColumn(sep: String = "\t"): Column =
    concat_ws(
      sep,
      col("event_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
      col("user_id"),
      col("event_type"),
      col("value"),
      col("props"))

  /** Serialize typed events back to delimited lines (round-trip dual,
    * used by tests and by sinks that emit text). */
  def formatLines(events: DataFrame, sep: String = "\t"): DataFrame =
    events.select(lineColumn(sep).as("value"))
}
