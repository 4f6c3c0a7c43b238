package graft.sources

import graft.streaming.EventParser
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** JSON-lines event ingestion — the other wire format the reference's
  * upstream (Flume event bodies) commonly carries. Lines are read as
  * text and parsed with `from_json` against an imposed schema, so a
  * 100 TB backfill never pays an inference scan and malformed rows land
  * in `_corrupt` instead of failing the job (the raw-JSON reader forbids
  * corrupt-column-only filters; the text→from_json path does not). */
object JsonEvents {

  private val opts = Map(
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> "_corrupt",
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")

  private def schemaWithCorrupt = EventParser.eventSchema.add("_corrupt", StringType)

  private def parse(lines: DataFrame): DataFrame =
    lines
      .withColumn("parsed", from_json(col("value"), schemaWithCorrupt, opts))
      .select(col("parsed.*"))
      .filter(col("_corrupt").isNull)
      .drop("_corrupt")

  def read(spark: SparkSession, path: String): DataFrame = parse(spark.read.text(path))

  def readStream(spark: SparkSession, path: String): DataFrame = parse(spark.readStream.text(path))

  /** Serialize typed events to JSON lines (round-trip dual; microsecond
    * timestamp precision matches the parse side). */
  def formatLines(events: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    events.select(
      to_json(
        struct(events.columns.map(col): _*),
        Map("timestampFormat" -> opts("timestampFormat")).asJava).as("value"))
  }
}
