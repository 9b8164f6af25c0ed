package graft.streaming

import graft.ops.SemDedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SEMANTIC near-duplicate admission — the embedding-space mirror
  * of [[StreamingAdmission]], and the streaming counterpart of the batch
  * SemDeDup prune (`SemDedup.assignAndPrune`, q91): as vectors stream in,
  * emit a rejection for every one whose cosine against an earlier-arriving
  * member of its k-means cluster reaches the threshold.
  *
  * Shape: the centroid model is STATIC (fitted by the nightly batch
  * `SemDedup.kmeansFit`, a few k×dim doubles — rebroadcast each micro-batch
  * for free as literals inside the assignment expression); keyed state per
  * cluster holds the first `repCap` arrivals' vectors — the same
  * representative cap as the batch prune, so a pathological mega-cluster
  * costs each event `repCap` dot products, never |cluster|. State stores
  * (id, vector) pairs only; payloads never enter the state store.
  *
  * Batch parity: the batch rule prunes id X when some rep among the
  * cluster's first-`repCap`-by-id with a SMALLER id has cosine ≥ τ. Reps
  * enter the batch rep set whether or not they are themselves pruned; the
  * stream therefore also inserts EVERY arrival into state (capped,
  * earliest first), rejected or not. An in-id-order stream reproduces the
  * batch pruned set exactly — pinned in StreamingSemDedupSpec. Cluster
  * state is evicted after `watermarkDelay` of event-time inactivity, the
  * same bounded-state trade as the text-side admission: the nightly batch
  * sweep behind the stream catches stragglers.
  */
object StreamingSemDedup {

  case class VecEvent(vecId: Long, eventTime: java.sql.Timestamp,
      vec: Seq[Double], ci: Int)

  /** A vector denied admission: `priorId` is the witnessing earlier member
    * of the same cluster, `cosine` their similarity (6-dp rounded). */
  case class SemRejection(vecId: Long, eventTime: java.sql.Timestamp,
      ci: Int, priorId: Long, cosine: Double)

  /** First-`repCap` cluster members in arrival order. */
  case class ClusterState(ids: Seq[Long], vecs: Seq[Seq[Double]])

  /** Plain left-to-right dot — the same summation order as the fused
    * `graft_dot` kernel and DuckDB's list_dot_product, so stream and batch
    * cosines are bit-identical. */
  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1 }
    val d = math.sqrt(daa) * math.sqrt(dbb)
    if (d == 0.0) 0.0 else dab / d
  }

  def nearDupRejections(
      docs: DataFrame, vecCol: String, idCol: String, tsCol: String,
      cents: Seq[(Int, Array[Double])], threshold: Double,
      repCap: Int = 256, watermarkDelay: String = "10 minutes",
      horizonMs: Long = 10L * 60L * 1000L): Dataset[SemRejection] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.expr.GraftFunctions.ensureRegistered(spark)
    val assigned = docs.select(
      col(idCol).cast("long").as("vecId"),
      col(tsCol).cast("timestamp").as("eventTime"),
      col(vecCol).cast("array<double>").as("vec"),
      SemDedup.assignLabeled(col(vecCol).cast("array<double>"), cents).as("ci"))
      .as[VecEvent]
      .withWatermark("eventTime", watermarkDelay)

    assigned
      .groupByKey(_.ci)
      .flatMapGroupsWithState[ClusterState, SemRejection](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Int, incoming: Iterator[VecEvent], state: GroupState[ClusterState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(ClusterState(Vector.empty, Vector.empty))
            // deterministic in-batch order: event time, ties to smaller id
            // (the batch path's by-id rule)
            val sorted = incoming.toSeq.sortBy(r => (r.eventTime.getTime, r.vecId))
            val out = Seq.newBuilder[SemRejection]
            sorted.foreach { r =>
              val witness = st.ids.iterator.zip(st.vecs.iterator)
                .map { case (pid, pv) => (pid, cos(pv, r.vec)) }
                .find { case (pid, c) => pid != r.vecId && c >= threshold }
              witness.foreach { case (pid, c) =>
                out += SemRejection(r.vecId, r.eventTime, r.ci, pid,
                  math.round(c * 1e6) / 1e6)
              }
              // every arrival joins the rep side, rejected or not (batch
              // parity), capped earliest-first
              if (st.ids.size < repCap && !st.ids.contains(r.vecId))
                st = ClusterState(st.ids :+ r.vecId, st.vecs :+ r.vec)
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
