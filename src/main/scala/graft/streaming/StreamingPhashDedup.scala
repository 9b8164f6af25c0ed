package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming PERCEPTUAL near-duplicate screening — the ingest mirror of the
  * batch q122 report (`Multimodal.phashNearDupReport`): as assets stream
  * in, emit a rejection for every one whose 64-bit positional average-hash
  * sits within `maxHamming` of an earlier arrival that shares an LSH band.
  *
  * Shape: the same blocking as batch — `Multimodal.phashCol` (decoded 8×8
  * aHash for real images, the `graft_phash64` byte kernel otherwise) runs
  * in the select (payloads never enter the state store), each asset visits
  * its `bands` 16-bit band buckets, and keyed state per (modality, band,
  * bits) bucket holds the first `bucketCap` arrivals' hashes (16 bytes per
  * entry — id + hash, the StreamingDedup discipline). A pathological
  * constant-payload firehose therefore costs each event `bucketCap` XORs,
  * never |bucket| — the star-cap trade the batch path makes.
  *
  * Append contract: one rejection row PER WITNESSING BAND (first witness
  * within each band bucket), so an asset colliding in k bands emits up to
  * k rows; row-existence is the verdict and a per-asset rollup is a
  * downstream aggregation — the same contract as StreamingChunkDedup's
  * chunk relation. Batch parity: for an in-id-order stream, the rejected
  * asset set equals the batch report's near-pair members on the LARGER-id
  * side of each pair (batch pairs are idA < idB; the stream witnesses
  * earlier arrivals) — pinned in StreamingPhashDedupSpec. Bucket state is
  * evicted after `watermarkDelay` of event-time inactivity; the nightly
  * batch q122 sweeping behind the stream catches stragglers.
  */
object StreamingPhashDedup {

  case class BandEvent(assetId: Long, eventTime: java.sql.Timestamp,
      modality: String, band: Int, bits: Long, h: Long)

  /** An asset denied admission: `priorId` is the earlier same-bucket
    * witness, `hamming` the exact 64-bit distance. */
  case class PhashRejection(assetId: Long, eventTime: java.sql.Timestamp,
      modality: String, band: Int, priorId: Long, hamming: Int)

  /** First-`bucketCap` bucket members in arrival order (hashes only). */
  case class BucketState(ids: Seq[Long], hashes: Seq[Long])

  def nearDupRejections(
      assets: DataFrame, payloadCol: String = "payload",
      idCol: String = "asset_id", tsCol: String = "ts",
      modalityCol: String = "meta.modality",
      bands: Int = 4, maxHamming: Int = 3, bucketCap: Int = 64,
      watermarkDelay: String = "10 minutes",
      horizonMs: Long = 10L * 60L * 1000L): Dataset[PhashRejection] = {
    require(64 % bands == 0, s"bands=$bands must divide 64")
    require(maxHamming < bands,
      s"maxHamming=$maxHamming needs bands > maxHamming for complete recall")
    val width = 64 / bands
    val spark = assets.sparkSession
    import spark.implicits._
    graft.expr.GraftFunctions.ensureRegistered(spark)
    val hashed = assets.select(
      col(idCol).cast("long").as("assetId"),
      col(tsCol).cast("timestamp").as("eventTime"),
      col(modalityCol).as("modality"),
      // null payloads hash to 0L like empty ones — the batch report's rule;
      // real images take the decoded 8x8 hash, same as batch (parity holds:
      // both sides call the same phash64Any)
      graft.ops.Multimodal.phashCol(
        coalesce(col(payloadCol), lit(Array.emptyByteArray))).as("h"))
    val banded = hashed.select(col("assetId"), col("eventTime"),
      col("modality"), expr(s"explode(sequence(0, ${bands - 1}))").as("band"),
      col("h"))
      .withColumn("bits",
        expr(s"shiftrightunsigned(h, 64 - $width * (band + 1))")
          .bitwiseAND(lit((1L << width) - 1)))
      .as[BandEvent]
      .withWatermark("eventTime", watermarkDelay)

    banded
      .groupByKey(e => (e.modality, e.band, e.bits))
      .flatMapGroupsWithState[BucketState, PhashRejection](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (String, Int, Long), incoming: Iterator[BandEvent],
            state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(BucketState(Vector.empty, Vector.empty))
            // deterministic in-batch order: event time, ties to smaller id
            // (the batch report's idA < idB rule)
            val sorted = incoming.toSeq.sortBy(r => (r.eventTime.getTime, r.assetId))
            val out = Seq.newBuilder[PhashRejection]
            sorted.foreach { r =>
              val witness = st.ids.iterator.zip(st.hashes.iterator)
                .map { case (pid, ph) =>
                  (pid, java.lang.Long.bitCount(ph ^ r.h)) }
                .find { case (pid, d) => pid != r.assetId && d <= maxHamming }
              witness.foreach { case (pid, d) =>
                out += PhashRejection(r.assetId, r.eventTime, r.modality,
                  r.band, pid, d)
              }
              // every arrival joins the bucket, rejected or not (batch
              // parity: batch pairs form against near-dup members too),
              // capped earliest-first
              if (st.ids.size < bucketCap && !st.ids.contains(r.assetId))
                st = BucketState(st.ids :+ r.assetId, st.hashes :+ r.h)
            }
            state.update(st)
            val maxEventMs = sorted.map(_.eventTime.getTime).max
            state.setTimeoutTimestamp(
              math.max(maxEventMs + horizonMs, state.getCurrentWatermarkMs() + 1L))
            out.result().iterator
          }
      }
  }
}
