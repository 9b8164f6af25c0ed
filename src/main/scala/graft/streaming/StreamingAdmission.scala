package graft.streaming

import graft.ops.{PortableSketch, TextOps}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate ADMISSION — the streaming mirror of
  * `PortableSketch.incrementalAdmit` for an always-on ingest pipeline: as
  * documents stream in, emit a REJECTION for every doc whose estimated
  * Jaccard against some PRIOR document reaches the threshold, where "prior"
  * means anything admitted earlier on the stream (older micro-batch, or an
  * earlier event-time/-id row of the same batch).
  *
  * Shape: the same banded-LSH blocking as the batch path — a doc's k-perm
  * minhash signature splits into `bands` band keys; keyed state holds, per
  * band bucket, the signatures of previously ADMITTED docs (capped at
  * `maxBucket`, earliest kept — the hot-bucket guard). A new doc checks only
  * its own buckets, so per-event cost is O(bucket), never O(corpus); the
  * signature (k longs), not the payload, is what state stores and the
  * shuffle carries.
  *
  * The output is the rejection LOG, not the admitted stream: streaming
  * can't express "docs for which NOTHING was emitted" without a second
  * full-stream join, while a consumer can (anti-join the ingest table with
  * the rejection sink, or quarantine rejected ids). Each of a doc's buckets
  * that holds a witness emits its own row — chaining a stateful per-doc
  * dedup after flatMapGroupsWithState is exactly the global-watermark
  * correctness hazard Spark refuses, and all of a doc's rows land in ONE
  * micro-batch anyway, so the sink-side reader collapses them with a plain
  * DISTINCT (see StreamingAdmissionSpec).
  *
  * Prior-side parity with the batch path: EVERY arriving doc's signature
  * joins its buckets' state (capped, earliest kept), rejected or not — in
  * `incrementalAdmit` the prior side likewise contains every smaller-id
  * batch doc, including ones that are themselves rejected. Bucket state is
  * evicted after `watermarkDelay` of event-time inactivity — a dup arriving
  * after its original's bucket aged out is admitted as new; the batch dedup
  * sweeping behind the stream (the reference's cron model) removes
  * stragglers, the same bounded-state trade as [[StreamingDedup]].
  */
object StreamingAdmission {

  /** One doc in one of its band buckets. */
  case class BandedDoc(docId: Long, eventTime: java.sql.Timestamp,
      sig: Seq[Long], band: Int, key: String)

  /** A doc denied admission: `priorId` is the witnessing prior document and
    * `estJaccard` the signature agreement that crossed the threshold. */
  case class Rejection(docId: Long, eventTime: java.sql.Timestamp,
      priorId: Long, estJaccard: Double)

  /** Admitted signatures of one band bucket, arrival order, capped. */
  case class BucketState(ids: Seq[Long], sigs: Seq[Seq[Long]])

  private def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    var eq = 0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  def nearDupRejections(
      docs: DataFrame, textCol: String, idCol: String, tsCol: String,
      k: Int = 16, bands: Int = 4, n: Int = 3, threshold: Double = 0.5,
      maxBucket: Int = 1024, watermarkDelay: String = "10 minutes",
      horizonMs: Long = 10L * 60L * 1000L): Dataset[Rejection] = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = k / bands
    // two projections like the batch path: the signature materializes once,
    // then the band array reads the attribute (never size/extra siblings of
    // an explode over a recomputed expression — see TextOps.containmentScores)
    val sigged = docs.select(
      col(idCol).cast("long").as("docId"),
      col(tsCol).cast("timestamp").as("eventTime"),
      PortableSketch.minhashSigFromGramsFast(
        TextOps.wordShingles(col(textCol), n), k).as("sig"))
    val banded = sigged.select(col("docId"), col("eventTime"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), PortableSketch.bandKey(col("sig"), b, rows).as("key"))
      }: _*)).as("_b"))
      .select(col("docId"), col("eventTime"), col("sig"),
        col("_b.band").as("band"), col("_b.key").as("key"))
      .as[BandedDoc]
      .withWatermark("eventTime", watermarkDelay)

    banded
      .groupByKey(r => s"${r.band}|${r.key}")
      .flatMapGroupsWithState[BucketState, Rejection](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, incoming: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(BucketState(Vector.empty, Vector.empty))
            // deterministic arrival order within the micro-batch: event time,
            // ties to the smaller id (the batch path's first-arrival rule)
            val sorted = incoming.toSeq.sortBy(r => (r.eventTime.getTime, r.docId))
            val out = Seq.newBuilder[Rejection]
            sorted.foreach { r =>
              val witness = st.ids.iterator.zip(st.sigs.iterator)
                .map { case (pid, psig) => (pid, estJaccard(psig, r.sig)) }
                .find { case (pid, e) => pid != r.docId && e >= threshold }
              witness.foreach { case (pid, e) =>
                out += Rejection(r.docId, r.eventTime, pid, math.round(e * 1e6) / 1e6)
              }
              // every arrival joins the prior side, rejected or not (batch
              // parity); capped earliest-first, one entry per doc per bucket
              if (st.ids.size < maxBucket && !st.ids.contains(r.docId))
                st = BucketState(st.ids :+ r.docId, st.sigs :+ r.sig)
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
