package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Anomaly SCORING at ingest — the streaming dual of the q328 batch
  * HBOS: densities are trained offline (the same three bounded
  * histograms q328 aggregates), exported as a compact driver-side
  * model, and applied to the event stream as a STATELESS map — the
  * shape an ingest-time anomaly gate takes (route suspicious events to
  * review before landing), mirroring [[StreamingClassify]]'s
  * train-offline/serve-stateless discipline.
  *
  * Scale anatomy: the model is ≤ 24 + 7 + 10 density entries plus the
  * value range — constant-sized off any training volume, so shipping
  * it in the task closure is the bounded-by-design idiom. Scoring is
  * one typed map per event: three hash probes and a log-sum. No
  * shuffle, no state, no watermark; the SAME code path scores a batch
  * frame (parity with q328 asserted in the spec).
  */
object StreamingHbos {

  /** Bounded density model. `floorP` (1/n_train) is the mass assigned
    * to a bin never seen in training — a streamed event CAN land in one
    * (new hour-of-day after a partial training window, value outside
    * the training range), and "rarest observed" is the honest score. */
  final case class HbosModel(
      dHour: Map[Long, Double],
      dDow: Map[Long, Double],
      dVbin: Map[Long, Double],
      vmin: Double,
      vmax: Double,
      floorP: Double) {

    private def vbin(v: Double): Long =
      if (vmax == vmin) 0L
      else math.max(0L, math.min(math.floor((v - vmin) * 10 / (vmax - vmin)).toLong, 9L))

    /** HBOS score Σ −ln(density), 4dp-rounded exactly like q328. */
    def score(tsMicros: Long, value: Double): Double = {
      val epochDay = Math.floorDiv(tsMicros, 86400000000L)
      val hour = Math.floorDiv(Math.floorMod(tsMicros, 86400000000L), 3600000000L)
      val dh = dHour.getOrElse(hour, floorP)
      val dd = dDow.getOrElse(Math.floorMod(epochDay, 7L), floorP)
      val dv = dVbin.getOrElse(vbin(value), floorP)
      val raw = -(math.log(dh) + math.log(dd) + math.log(dv))
      math.floor(raw * 10000 + 0.5) / 10000
    }
  }

  final case class EventIn(event_id: Long, event_type: String, ts: java.sql.Timestamp, value: Double)
  final case class Scored(event_id: Long, event_type: String, hbos_score: Double)

  /** Train the q328 densities on a batch frame and export them
    * driver-side. The aggregates are exactly
    * [[graft.operators.EventAnalytics.hbosOutliers]]'s (same epoch-day
    * dow, same decile formula over the SAME broadcast min/max), so the
    * served scores reproduce the batch report bit-for-bit. */
  def trainModel(events: DataFrame): HbosModel = {
    val vr = events.agg(min(col("value")), max(col("value")), count(lit(1))).head()
    val (vmin, vmax, n) = (vr.getDouble(0), vr.getDouble(1), vr.getLong(2))
    val featured = events.select(
      hour(col("ts")).cast("long").as("f_hour"),
      (datediff(to_date(col("ts")), to_date(lit("1970-01-01"))) % 7).cast("long").as("f_dow"),
      when(lit(vmax) === lit(vmin), lit(0L))
        .otherwise(least(
          floor((col("value") - lit(vmin)) * 10 / (lit(vmax) - lit(vmin))),
          lit(9L))).as("f_vbin"))
    def densities(key: String): Map[Long, Double] = featured
      .groupBy(key).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toDouble / n).toMap
    HbosModel(densities("f_hour"), densities("f_dow"), densities("f_vbin"),
      vmin, vmax, 1.0 / n)
  }

  /** Score a (streaming or batch) event frame with a trained model —
    * one stateless typed map, no shuffle, append-mode safe. The
    * timestamp converts through epoch-µs integer arithmetic, which
    * matches Spark's UTC hour()/datediff() exactly (sessions pin
    * spark.sql.session.timeZone=UTC). */
  def scoreEvents(spark: SparkSession, events: DataFrame, model: HbosModel): Dataset[Scored] = {
    import spark.implicits._
    events.select(col("event_id"), col("event_type"), col("ts"), col("value")).as[EventIn]
      .map { e =>
        // epoch-µs: whole seconds from getTime (floorDiv drops its ms
        // part), sub-second µs from getNanos — exact for any timestamp
        val micros = Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000
        Scored(e.event_id, e.event_type, model.score(micros, e.value))
      }
  }
}
