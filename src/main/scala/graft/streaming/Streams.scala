package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A single stream event (the streaming face of the `events` table). */
final case class StreamEvent(user_id: Long, ts: Timestamp, event_type: String, value: Double)

/** Open-session accumulator kept in state store between micro-batches. */
final case class SessionState(startUs: Long, lastUs: Long, n: Int, sumValue: Double)

/** A closed session emitted downstream. */
final case class SessionOut(
    user_id: Long, start: Timestamp, end: Timestamp, n_events: Int, sum_value: Double)

/** Structured Streaming operators: the batch engine's aggregation /
  * sessionization semantics re-expressed as readStream → transform →
  * writeStream pipelines. State is bounded by watermarks (windowed aggs)
  * or explicit event-time timeouts (sessionization) — both prerequisites
  * for an unbounded 100 TB/day stream.
  */
object Streams {

  /** Watermarked tumbling-window aggregation: the streaming twin of
    * q17_date_agg. Late data beyond `watermark` is dropped; state for
    * closed windows is evicted automatically. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String = "ts",
      typeCol: String = "event_type",
      windowDuration: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration).as("w"), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col(typeCol), col("n"), col("sum_value"))

  /** Streaming exact dedup (the streaming twin of Dedup.exactGroups):
    * drops re-deliveries of the same key within the watermark horizon —
    * state stays bounded because expired keys are evicted with the
    * watermark. */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Gap-based streaming sessionization (the streaming twin of
    * TemporalJoins.sessionize): sessions close when no event arrives for
    * `gapSec` of *event time*, enforced with an event-time timeout so
    * state cannot grow unboundedly. Requires a watermark on the input. */
  def sessionize(events: Dataset[StreamEvent], gapSec: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapSec * 1000000L

    def us(t: Timestamp): Long = t.getTime * 1000L
    def toTs(usVal: Long): Timestamp = new Timestamp(usVal / 1000L)
    def close(userId: Long, s: SessionState): SessionOut =
      SessionOut(userId, toTs(s.startUs), toTs(s.lastUs), s.n, s.sumValue)

    events
      .withWatermark("ts", s"$gapSec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[StreamEvent], state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(close(userId, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => us(e.ts))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = us(e.ts)
              open match {
                case Some(s) if t - s.lastUs <= gapUs =>
                  open = Some(SessionState(s.startUs, math.max(s.lastUs, t), s.n + 1,
                    s.sumValue + e.value))
                case Some(s) =>
                  closed += close(userId, s)
                  open = Some(SessionState(t, t, 1, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapSec * 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
