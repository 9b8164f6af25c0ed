package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming windowed aggregation — the watermark + event-time-window
  * surface (SURVEY §2.4 streaming): the always-on counterparts of the batch
  * day-bucket rollup (q15) and gap sessionization (Temporal.sessionize).
  *
  * Both run in append mode: a window is emitted exactly once, when the
  * watermark passes its end — the idempotent-sink analogue of the
  * reference's "re-run the day until it stops changing" cron model, with
  * the lateness bound made explicit instead of implied by re-run cadence.
  * State per key×window is one aggregate row, evicted at emit; rows later
  * than the watermark are dropped (counted by the query progress metrics).
  */
object StreamingRollup {

  /** Tumbling event-time counts per group. */
  def tumblingCounts(events: DataFrame, tsCol: String, groupCol: String,
      windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("w"), col(groupCol))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col(groupCol), col("n"))

  /** Gap-based session counts per key via the built-in session_window —
    * sessions merge as events arrive and finalize when the watermark passes
    * the session end (last event + gap). */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
      gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("session_start"), col(keyCol), col("n"))
}
