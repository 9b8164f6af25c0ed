package graft.streaming

import graft.ops.SemDedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ONLINE CORESET — the ingest counterpart of the batch
  * cluster-balanced coreset (q119): as vectors stream in, each k-means
  * cluster admits a new member only while its kept count is below
  * ceil(sqrt(members seen so far)) — the same sublinear balance target,
  * maintained online.
  *
  * Deliberate divergence from batch, documented: q119 picks WHICH members
  * survive by a content-hash order over the complete cluster; an online
  * admitter cannot know the final membership, so it keeps the EARLIEST
  * arrivals that fit under the running quota (first-fit). The quota curve
  * is identical (after N arrivals a cluster holds exactly
  * ceil(sqrt(N)) members — pinned in spec); the member choice is
  * arrival-order, and the nightly batch q119 re-balances to the canonical
  * hash-ordered set. Shape: the centroid model is static (batch-fitted,
  * broadcast as literals in the assignment expression); keyed state per
  * cluster is TWO LONGS (seen, kept) — no vectors, no payloads — evicted
  * after `watermarkDelay` of event-time inactivity.
  */
object StreamingCoreset {

  case class VecEvent(vecId: Long, eventTime: java.sql.Timestamp, ci: Int)

  /** One admission decision: `seen`/`kept` are the cluster's counters AFTER
    * this event. */
  case class Admission(vecId: Long, eventTime: java.sql.Timestamp, ci: Int,
      seen: Long, kept: Long, admitted: Boolean)

  /** Per-cluster counters (public: the state encoder's generated code
    * needs the constructor). */
  case class QuotaState(seen: Long, kept: Long)

  def admissions(
      docs: DataFrame, vecCol: String, idCol: String, tsCol: String,
      cents: Seq[(Int, Array[Double])],
      watermarkDelay: String = "10 minutes",
      horizonMs: Long = 10L * 60L * 1000L): Dataset[Admission] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.expr.GraftFunctions.ensureRegistered(spark)
    val assigned = docs.select(
      col(idCol).cast("long").as("vecId"),
      col(tsCol).cast("timestamp").as("eventTime"),
      SemDedup.assignLabeled(col(vecCol).cast("array<double>"), cents).as("ci"))
      .as[VecEvent]
      .withWatermark("eventTime", watermarkDelay)

    assigned
      .groupByKey(_.ci)
      .flatMapGroupsWithState[QuotaState, Admission](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Int, incoming: Iterator[VecEvent], state: GroupState[QuotaState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(QuotaState(0L, 0L))
            // deterministic in-batch order: event time, ties to smaller id
            val sorted = incoming.toSeq.sortBy(r => (r.eventTime.getTime, r.vecId))
            val out = sorted.map { r =>
              val seen = st.seen + 1
              val quota = math.ceil(math.sqrt(seen.toDouble)).toLong
              val admit = st.kept < quota
              st = QuotaState(seen, st.kept + (if (admit) 1L else 0L))
              Admission(r.vecId, r.eventTime, r.ci, seen, st.kept, admit)
            }
            state.update(st)
            val maxEventMs = sorted.map(_.eventTime.getTime).max
            state.setTimeoutTimestamp(
              math.max(maxEventMs + horizonMs, state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
  }

  /** The gate: only admitted vectors flow to the shard writer. */
  def admitted(
      docs: DataFrame, vecCol: String, idCol: String, tsCol: String,
      cents: Seq[(Int, Array[Double])],
      watermarkDelay: String = "10 minutes"): DataFrame =
    admissions(docs, vecCol, idCol, tsCol, cents, watermarkDelay)
      .toDF().where(col("admitted"))
}
