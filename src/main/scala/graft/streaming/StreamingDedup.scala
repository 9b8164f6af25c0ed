package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming counterpart of
  * Dedup.exactDedup for an always-on ingest pipeline: emit only the FIRST
  * occurrence of each content digest, holding per-digest state no longer
  * than the watermark horizon.
  *
  * State is keyed by the 128-bit digest pair (16 bytes/key — same
  * content-hash guarantee as the batch path), never the payload.
  * `dropDuplicatesWithinWatermark` gives the bounded-state trade every
  * streaming dedup makes: a duplicate arriving after its original has aged
  * past the watermark is admitted as new — at 100 TB/day the alternative
  * (unbounded digest state) is not survivable, and the batch dedup sweeping
  * behind the stream (the reference's cron re-run model) removes the
  * stragglers.
  */
object StreamingDedup {

  def firstOccurrence(
      docs: DataFrame, textCol: String, tsCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("_d1", xxhash64(col(textCol)))
      .withColumn("_d2", xxhash64(lit(0x9E3779B9L), col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_d1", "_d2")
      .drop("_d1", "_d2")
}
