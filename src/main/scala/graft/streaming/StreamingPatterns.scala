package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming behavioral pattern screen — the q154 ingest mirror: each
  * user's gap session accumulates inside a `session_window` aggregate and,
  * when the watermark passes the session end (last event + gap), emits its
  * FULL ordered journey path plus the four ordered-containment screens,
  * exactly once (append mode). The batch q154 over the same rows computes
  * identical paths/flags per session (spec-pinned); this is the always-on
  * cohort filter — route a converted-after-view session to one sink, an
  * error-recovery session to another, at session close rather than nightly.
  *
  * State per (user, open session): the collected (tsu, event_id, type)
  * structs — bounded by session length (the gap rule caps realistic size;
  * the same bound the batch q141/q154 rollups carry), evicted at emit.
  * Ordering inside the collect is made total by sorting the structs — the
  * same (tsu, event_id) discipline as every batch path query, so
  * micro-batch arrival order cannot reshape a path. */
object StreamingPatterns {

  def sessionScreens(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.select(col(userCol).cast("long").as("user_id"),
        col(tsCol).cast("timestamp").as("eventTime"),
        col(idCol).cast("long").as("event_id"),
        col(typeCol).as("event_type"))
      .withWatermark("eventTime", watermarkDelay)
      .groupBy(session_window(col("eventTime"), gap).as("w"), col("user_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(unix_micros(col("eventTime")).as("tsu"),
          col("event_id"), col("event_type")))),
        e => e.getField("event_type")), ">").as("path"))
      .select(col("w.start").as("session_start"), col("user_id"), col("path"),
        col("path").like("%view%purchase%").as("view_to_purchase"),
        col("path").like("%error%purchase%").as("error_recovery"),
        col("path").like("signup%").as("signup_entry"),
        (!col("path").like("%purchase%") && !col("path").like("%signup%"))
          .as("browse_only"))
}
