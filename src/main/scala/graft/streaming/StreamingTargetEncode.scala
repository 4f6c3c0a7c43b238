package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Online category-statistics maintenance — the streaming dual of the
  * out-of-fold target encoder (q293): the encoder's per-segment
  * (Σ target, count) sufficient statistics maintained incrementally as
  * order events arrive, emitted as a changelog an online feature store
  * ingests. Serving-side encoding is then the same shrink formula q293
  * applies, computed from these stats at lookup time.
  *
  * Stream-static enrichment (broadcast customer dim, re-planned per
  * micro-batch, zero join state — the stream_static_join idiom) feeds
  * `mapGroupsWithState` keyed by segment; state is TWO numbers per
  * segment (constant — unbounded streams run forever). Sums are
  * associative, so ANY micro-batch slicing yields the same final stats
  * as the batch aggregate — asserted in the spec. */
object StreamingTargetEncode {

  final case class SegRow(segment: String, y: Double)
  final case class SegStats(s: Double, n: Long)
  final case class SegUpdate(segment: String, n_rows: Long, mean_y: Double)

  def segmentStats(
      spark: SparkSession,
      orders: DataFrame,
      customer: DataFrame): Dataset[SegUpdate] = {
    import spark.implicits._
    val dim = customer.select("c_custkey", "c_mktsegment")
    orders
      .join(broadcast(dim), orders("o_custkey") === dim("c_custkey"))
      .selectExpr("c_mktsegment AS segment", "o_totalprice AS y")
      .as[SegRow]
      .groupByKey(_.segment)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (seg: String, batch: Iterator[SegRow], state: GroupState[SegStats]) =>
          var st = state.getOption.getOrElse(SegStats(0.0, 0L))
          batch.foreach(r => st = SegStats(st.s + r.y, st.n + 1L))
          state.update(st)
          SegUpdate(seg, st.n, math.floor(st.s / st.n * 10000 + 0.5) / 10000)
      }
  }
}
