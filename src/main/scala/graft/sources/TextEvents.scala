package graft.sources

import graft.streaming.EventParser
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Delimited-text event ingestion — the reference's input edge (Flume
  * delivers delimited log lines). Batch and streaming read the same
  * parser, so a backfill over historical log dirs and the live stream
  * produce identical typed rows. */
object TextEvents {

  /** Batch: read a directory of delimited log lines as typed events. */
  def read(spark: SparkSession, path: String, sep: String = "\t"): DataFrame =
    EventParser.wellFormed(EventParser.parseLines(spark.read.text(path), sep = sep))

  /** Streaming: tail a directory of delimited log lines as typed events. */
  def readStream(spark: SparkSession, path: String, sep: String = "\t"): DataFrame =
    EventParser.wellFormed(EventParser.parseLines(spark.readStream.text(path), sep = sep))

  /** Malformed-line side channel for the batch path (received-vs-failed
    * accounting, the reference's failed counter). */
  def readCorrupt(spark: SparkSession, path: String, sep: String = "\t"): DataFrame =
    EventParser.corrupt(EventParser.parseLines(spark.read.text(path), sep = sep))
}
