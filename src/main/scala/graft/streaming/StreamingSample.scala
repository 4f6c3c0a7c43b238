package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming weighted sampling — the streaming dual of q105's
  * Efraimidis–Spirakis A-ES sampler. Keeping the top-k A-ES keys per
  * source IS a weighted reservoir: state is exactly k (key, doc) pairs
  * per source — O(sources × k), independent of stream length — and
  * merging a new batch is "union, keep k largest", which is associative,
  * so any micro-batch slicing of the corpus yields the IDENTICAL sample
  * as the batch pass (same hash-derived u, same doubles, same
  * tie-break). Each update emits the group's current sample stamped
  * with a per-source version; consumers read the max-version rows
  * (the spec proves final state ≡ the batch sampler). */
object StreamingSample {

  case class DocIn(source: String, doc_id: Long, n_chars: Long, key: Double)
  case class SampleOut(source: String, ver: Long, rank: Int, doc_id: Long, n_chars: Long)
  case class SampleState(ver: Long, items: List[(Double, Long, Long)])

  /** Sample-table maintenance for AQP (q157's sink-side half): keep the
    * deterministic md5-prefix p-sample of the stream as its own table,
    * written alongside the full data. The predicate is STATELESS and
    * row-local, so it composes with any slicing, needs no state store,
    * and the streamed sample is the same row set as the batch filter by
    * construction (spec-asserted) — downstream approximate dashboards
    * then SCAN p of the data, not just shuffle p of it. */
  def hashSampleStream(
      events: DataFrame,
      keyCol: String,
      hexChars: Seq[String] = Seq("0", "1", "2", "3")): DataFrame =
    events.filter(graft.operators.Relational.hashSamplePredicate(col(keyCol), hexChars))

  def weightedSample(spark: SparkSession, docs: DataFrame, k: Int = 20): DataFrame = {
    import spark.implicits._
    def update(source: String, rows: Iterator[DocIn], state: GroupState[SampleState]): Iterator[SampleOut] = {
      val prev = state.getOption.getOrElse(SampleState(0L, Nil))
      val merged = (prev.items ++ rows.map(r => (r.key, r.doc_id, r.n_chars)))
        .sortBy { case (key, doc, _) => (-key, doc) }
        .take(k)
      val next = SampleState(prev.ver + 1, merged)
      state.update(next)
      merged.iterator.zipWithIndex.map { case ((_, doc, nc), i) =>
        SampleOut(source, next.ver, i + 1, doc, nc)
      }
    }
    docs
      // degenerate zero-weight docs are dropped (ln(u)/0 is undefined;
      // a weighted sample cannot select a zero-weight item anyway)
      .filter(col("n_chars") > 0)
      .select(
        col("source"), col("doc_id"), col("n_chars"),
        graft.functions.TextFunctions.aesKey(col("doc_id"), col("n_chars")).as("key"))
      .as[DocIn]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
      .toDF()
  }
}
