package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA volume trend — the ingest counterpart of the batch q132
  * fold: per event type, daily counts accumulate in keyed state and each
  * COMPLETED day folds into the running EWMA with exactly the batch's
  * integer recurrence (`e' = (3·n·1e6 + 7·e) div 10`, spike when
  * `n·1e6 > 2·e`, accumulator packed `e·64 + spikes`) — so an in-order
  * stream's emitted chain is bit-equal to the batch fold over the same
  * prefix (pinned in spec). The always-on volume monitor a log pipeline
  * runs between nightly q132 sweeps.
  *
  * A day completes when a LATER day's event arrives for the type, or when
  * the event-time timeout passes the pending day's end plus the lateness
  * allowance (a quiet day still finalizes as long as the global watermark
  * advances). One trend row is emitted per completed day, append mode.
  *
  * State per event type: THREE LONGS (pending day, pending count, packed
  * accumulator) — and the key space is the event-type vocabulary, so state
  * is bounded by construction and never needs eviction; the timeout only
  * finalizes quiet days. Documented divergence from batch (the standard
  * bounded-state trade): an event arriving AFTER its day has folded is
  * dropped from the trend (`late` in the emitted row counts them at fold
  * time where the batch sweep would have included them); the nightly q132
  * remains the exact accounting.
  */
object StreamingEwma {

  case class Ev(eventType: String, eventTime: java.sql.Timestamp, day: Long)

  /** One completed day: `ewmaU`/`spikes` are the chain AFTER folding it. */
  case class Trend(eventType: String, day: Long, n: Long, ewmaU: Long,
      spikes: Long, late: Long)

  /** Keyed state (public: the state encoder's generated code needs the
    * constructor). `packed` = -1 until the first day folds. */
  case class EwmaState(day: Long, n: Long, packed: Long, late: Long)

  private val DayMs = 86400L * 1000L

  private[streaming] def stepPacked(packed: Long, n: Long): Long =
    if (packed < 0L) n * 1000000L * 64L
    else {
      val prev = packed / 64L
      val spike = if (n * 1000000L > 2L * prev) 1L else 0L
      // the counter SATURATES at 63: this monitor is always-on (unlike the
      // batch q132 whose corpus span pins spikes < 64), and a 64th spike
      // must not carry into the EWMA field and corrupt the chain. Batch
      // divergence past 63 spikes is the documented price; the EWMA field
      // itself stays bit-equal to the batch fold.
      ((3L * n * 1000000L + 7L * prev) / 10L) * 64L +
        math.min(packed % 64L + spike, 63L)
    }

  def trends(events: DataFrame, typeCol: String, tsCol: String,
      watermarkDelay: String = "10 minutes",
      lateAllowanceMs: Long = 10L * 60L * 1000L): Dataset[Trend] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(typeCol).as("eventType"),
        col(tsCol).cast("timestamp").as("eventTime"),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 86400000000")
          .as("day"))
      .as[Ev]
      .withWatermark("eventTime", watermarkDelay)
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[EwmaState, Trend](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, incoming: Iterator[Ev], state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(-1L, 0L, -1L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[Trend]
          def fold(): Unit = if (st.day >= 0L) {
            val packed = stepPacked(st.packed, st.n)
            out += Trend(typ, st.day, st.n, packed / 64L, packed % 64L, st.late)
            st = EwmaState(-1L, 0L, packed, 0L)
          }
          if (state.hasTimedOut) {
            fold() // quiet-day finalization; the chain itself persists
          } else {
            // deterministic in-batch order: day, then event time
            for (e <- incoming.toSeq.sortBy(r => (r.day, r.eventTime.getTime))) {
              if (e.day == st.day) st = st.copy(n = st.n + 1L)
              else if (e.day > st.day) { fold(); st = st.copy(day = e.day, n = 1L) }
              else st = st.copy(late = st.late + 1L) // day already folded
            }
          }
          state.update(st)
          // guard: another key's events may already have pushed the global
          // watermark past this key's deadline — a timeout timestamp at or
          // below the watermark is rejected, so clamp to the next tick
          if (st.day >= 0L)
            state.setTimeoutTimestamp(math.max(
              (st.day + 1L) * DayMs + lateAllowanceMs,
              state.getCurrentWatermarkMs() + 1L))
          out.iterator
      }
  }
}
