package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Producer fencing on the DSv2 offset-log sink (round-10 verdict,
  * Missing #5): the intent protocol is exactly-once for ONE writer;
  * two LIVE producers on the same log are undefined. The fence makes
  * the newest claimant win and the zombie fail LOUD. */
class OffsetLogFencingSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("v", LongType)))
  private def writer(root: String) =
    new OffsetLogStreamingWrite(root, 2, "user_id", schema)
  private val noFiles = Array.empty[WriterCommitMessage]

  test("a newer writer fences the older one: the zombie's next commit throws, the new writer proceeds") {
    spark // force session init (the sink resolves SparkSession.active)
    val root = Files.createTempDirectory("graft-fence").toString
    val w1 = writer(root)
    val w2 = writer(root)
    w1.commit(0, noFiles) // w1 claims the fence (fence=1)
    w2.commit(1, noFiles) // takeover: w2 bumps the fence (fence=2)
    val e = intercept[IllegalStateException] { w1.commit(2, noFiles) }
    assert(e.getMessage.contains("FENCED OUT"), e.getMessage)
    // the survivor keeps committing normally
    w2.commit(2, noFiles)
    w2.commit(3, noFiles)
  }

  test("a single writer is never fenced by its own replays or successive epochs") {
    spark
    val root = Files.createTempDirectory("graft-fence2").toString
    val w = writer(root)
    (0 until 5).foreach(e => w.commit(e.toLong, noFiles))
    w.commit(4, noFiles) // replay of a retired epoch: no-op, no fence error
  }

  test("a restart (new writer instance, old one dead) takes over cleanly") {
    spark
    val root = Files.createTempDirectory("graft-fence3").toString
    writer(root).commit(0, noFiles)      // first incarnation, then 'crash'
    val revived = writer(root)
    (1 until 4).foreach(e => revived.commit(e.toLong, noFiles)) // takeover, no error
  }
}
