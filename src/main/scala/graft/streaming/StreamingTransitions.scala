package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-transition extraction — the ingest counterpart of the
  * batch q140 matrix: per user, each arriving event pairs with the user's
  * LAST event in the total (ts, event_id) order and emits one
  * `src_type → dst_type` hop, append mode. Rolled up downstream (or
  * nightly by q140) these hops ARE the first-order Markov transition
  * counts; an in-order stream's hop multiset is exactly the batch pair
  * set over the same prefix (pinned in spec).
  *
  * State per user: ONE event — (tsu, event_id, type) plus a late counter,
  * ~3 longs and a short string; the key space is the user population, so
  * state grows with users, never with events. By DEFAULT nothing is
  * evicted (an idle user's last event stays valid context for their
  * return — evicting it would silently drop the comeback transition): a
  * hop closes only when the next event arrives; a final dangling event
  * emits nothing, exactly like the batch lead(…) over a window.
  *
  * OPTIONAL TTL (`idleTimeoutMs`, round 16): at crawl scale "one entry
  * per user forever" is a real state-store bill, so an event-time timeout
  * can evict users idle past the TTL. Eviction is LOUD, never silent: the
  * evicted context emits a terminal accounting row `src → (evicted)`
  * carrying the pending `late` count, so every hop a comeback WOULD have
  * closed is visible downstream (count the sentinel rows), and the late
  * counter cannot vanish with the state. A returning user starts fresh —
  * their first event back emits nothing, exactly like a brand-new user;
  * the timeout re-arms at max(lastEvent + TTL, watermark + 1) so late
  * in-TTL data can never fail the timestamp precondition.
  *
  * Documented divergence (the [[StreamingEwma]] bounded-state trade): an
  * event arriving OUT OF ORDER — behind the user's already-consumed
  * (tsu, event_id) frontier — would retroactively change two already-
  * emitted hops in batch semantics; bounded state cannot rewrite history,
  * so the event is dropped and counted in `late` on the user's next
  * emitted hop (or on the eviction sentinel). With TTL enabled the
  * comeback hop itself is the additional documented loss — announced by
  * the sentinel. The nightly q140 remains the exact accounting.
  */
object StreamingTransitions {

  /** dstType of the terminal accounting row a TTL eviction emits. */
  val Evicted = "(evicted)"

  case class Ev(userId: Long, tsu: Long, eventId: Long, eventType: String)

  /** One closed hop: `late` = out-of-order arrivals dropped for this user
    * since the previous emitted hop. */
  case class Hop(userId: Long, srcType: String, dstType: String,
      tsu: Long, eventId: Long, late: Long)

  /** Keyed state (public: the state encoder's generated code needs the
    * constructor). `eventType == null` until the user's first event. */
  case class LastEv(tsu: Long, eventId: Long, eventType: String, late: Long)

  def hops(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String,
      watermarkDelay: String = "10 minutes",
      idleTimeoutMs: Option[Long] = None): Dataset[Hop] = {
    require(idleTimeoutMs.forall(_ > 0L), s"idleTimeoutMs must be positive: $idleTimeoutMs")
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeoutMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.select(col(userCol).cast("long").as("userId"),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP))").as("tsu"),
        col(idCol).cast("long").as("eventId"),
        col(typeCol).as("eventType"),
        col(tsCol).cast("timestamp").as("eventTime"))
      .withWatermark("eventTime", watermarkDelay)
      .as[Ev] // extra eventTime column carries the watermark, Ev ignores it
      .groupByKey(_.userId)
      .flatMapGroupsWithState[LastEv, Hop](
        OutputMode.Append, timeoutConf) {
        (uid: Long, incoming: Iterator[Ev], state: GroupState[LastEv]) =>
          if (state.hasTimedOut) {
            // TTL eviction: drop the entry, announce the lost context
            val st = state.get
            state.remove()
            if (st.eventType != null)
              Iterator.single(Hop(uid, st.eventType, Evicted,
                st.tsu, st.eventId, st.late))
            else Iterator.empty
          } else {
            var st = state.getOption.getOrElse(
              LastEv(Long.MinValue, Long.MinValue, null, 0L))
            val out = scala.collection.mutable.ArrayBuffer.empty[Hop]
            // deterministic in-batch order = the batch window's sort key
            for (e <- incoming.toSeq.sortBy(r => (r.tsu, r.eventId))) {
              val ahead = e.tsu > st.tsu || (e.tsu == st.tsu && e.eventId > st.eventId)
              if (ahead) {
                if (st.eventType != null) {
                  out += Hop(uid, st.eventType, e.eventType, e.tsu, e.eventId, st.late)
                  st = LastEv(e.tsu, e.eventId, e.eventType, 0L)
                } else st = LastEv(e.tsu, e.eventId, e.eventType, st.late)
              } else st = st.copy(late = st.late + 1L)
            }
            state.update(st)
            idleTimeoutMs.foreach { ttl =>
              // must land strictly past the watermark or Spark rejects it
              state.setTimeoutTimestamp(
                math.max(st.tsu / 1000L + ttl, state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }
}
