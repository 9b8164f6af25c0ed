package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** MEASURED state-store bounds for the stateful mirror families — every
  * mirror documents its bytes-per-key / rows-per-key budget; this spec
  * drives each family with an adversarial key distribution (orders of
  * magnitude more EVENTS than keys, hot keys, time skew) and asserts the
  * state store's actual `numRowsTotal` against the documented bound, so
  * "bounded keyed state" is a number read off query progress, not a
  * docstring claim. Families: digest drop-dup (StreamingDedup, also the
  * CDC/chunk variants' mechanism), fixed-bytes-per-key fMGWS
  * (StreamingEwma), per-entity no-timeout fMGWS (StreamingTransitions —
  * bound is |entities| by design), per-cluster quota fMGWS
  * (StreamingCoreset, with timeout eviction), capped-rep-list fMGWS
  * (StreamingSemDedup), and watermark-evicted windowed aggregation
  * (StreamingRollup). */
class StreamingStateAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  /** Total state rows across operators from the most recent progress
    * entry that reported state. */
  private def stateRows(q: StreamingQuery): Long =
    q.recentProgress.reverse
      .map(p => Option(p.stateOperators).map(_.toSeq).getOrElse(Nil))
      .find(_.nonEmpty).map(_.map(_.numRowsTotal).sum).getOrElse(0L)

  private val t0 = java.sql.Timestamp.valueOf("2025-08-11 00:00:00")
  private def ts(plusSec: Long) = new java.sql.Timestamp(t0.getTime + plusSec * 1000L)

  test("digest drop-dup: state rows track DISTINCT digests, not arrivals, " +
      "and the watermark evicts aged digests") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = StreamingDedup.firstOccurrence(
      input.toDS().toDF("doc_id", "text", "ts"), "text", "ts",
      watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("audit_dedup")
      .outputMode("append").start()
    try {
      // hostile: 400 arrivals over only 10 distinct texts
      input.addData((1L to 400L).map(i =>
        (i, s"text-${i % 10}", ts(i % 60))): _*)
      q.processAllAvailable()
      val afterFlood = stateRows(q)
      assert(afterFlood <= 10L,
        s"400 arrivals / 10 digests must hold <= 10 state rows, got $afterFlood")
      // advance event time 3 h: the flood's digests age past the horizon
      input.addData((1000L, "fresh-a", ts(10800)), (1001L, "fresh-b", ts(10801)))
      q.processAllAvailable()
      input.addData((1002L, "fresh-c", ts(10802)))
      q.processAllAvailable()
      val afterEvict = stateRows(q)
      assert(afterEvict <= 3L,
        s"aged digests must evict (<= 3 live), got $afterEvict")
    } finally q.stop()
  }

  test("EWMA trends: one fixed-size state row per event TYPE under a " +
      "500x event flood") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val out = StreamingEwma.trends(
      input.toDS().toDF("event_type", "ts"), "event_type", "ts")
    val q = out.writeStream.format("memory").queryName("audit_ewma")
      .outputMode("append").start()
    try {
      input.addData((1 to 2500).map(i =>
        (s"type${i % 5}", ts(i % 120))): _*)
      q.processAllAvailable()
      val rows = stateRows(q)
      assert(rows == 5L,
        s"2500 events over 5 types must hold exactly 5 state rows, got $rows")
    } finally q.stop()
  }

  test("transitions: state is one row per ENTITY whatever the per-entity " +
      "event volume (the documented no-timeout |entities| bound)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val out = StreamingTransitions.hops(
      input.toDS().toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type")
    val q = out.writeStream.format("memory").queryName("audit_hops")
      .outputMode("append").start()
    try {
      // hostile: 40 users, 50 events each — state must be 40, not 2000
      input.addData((1L to 2000L).map(i =>
        (i % 40, ts(i / 40), i, s"ev${i % 3}")): _*)
      q.processAllAvailable()
      val rows = stateRows(q)
      assert(rows == 40L,
        s"2000 events over 40 users must hold exactly 40 state rows, got $rows")
    } finally q.stop()
  }

  test("transitions TTL: idle users EVICT — state returns to the active " +
      "population instead of one-row-per-user-forever") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val out = StreamingTransitions.hops(
      input.toDS().toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type",
      watermarkDelay = "0 seconds", idleTimeoutMs = Some(60000L))
    val q = out.writeStream.format("memory").queryName("audit_hops_ttl")
      .outputMode("append").start()
    try {
      // 40 users burst at t≈0, then go idle; one survivor keeps emitting
      input.addData((1L to 400L).map(i =>
        (i % 40, ts(i / 40), i, s"ev${i % 3}")): _*)
      q.processAllAvailable()
      val before = stateRows(q)
      assert(before == 40L, s"burst must hold 40 state rows, got $before")
      // advance the watermark far past every idle user's TTL; two extra
      // batches so the timed-out keys actually fire and are swept
      input.addData((0L, ts(600), 1001L, "ev0")); q.processAllAvailable()
      input.addData((0L, ts(610), 1002L, "ev1")); q.processAllAvailable()
      input.addData((0L, ts(620), 1003L, "ev2")); q.processAllAvailable()
      val after = stateRows(q)
      assert(after <= 2L,
        s"idle users must evict after the 60 s TTL: $before -> $after state rows")
    } finally q.stop()
  }

  test("coreset admissions: one quota row per cluster under overfeed; " +
      "idle clusters evict on event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cents = Seq(
      0 -> Array(1.0, 0.0, 0.0, 0.0),
      1 -> Array(0.0, 1.0, 0.0, 0.0),
      2 -> Array(0.0, 0.0, 1.0, 0.0))
    val input = MemoryStream[(Long, java.sql.Timestamp, Array[Double])]
    val out = StreamingCoreset.admissions(
      input.toDS().toDF("vec_id", "ts", "embedding"),
      "embedding", "vec_id", "ts", cents,
      watermarkDelay = "10 minutes", horizonMs = 10L * 60L * 1000L)
    val q = out.writeStream.format("memory").queryName("audit_coreset")
      .outputMode("append").start()
    try {
      // 300 vectors over 3 clusters: 3 rows of two counters each
      input.addData((1L to 300L).map { i =>
        val v = Array(0.0, 0.0, 0.0, 0.1)
        v((i % 3).toInt) = 1.0
        (i, ts(i % 60), v)
      }: _*)
      q.processAllAvailable()
      val flood = stateRows(q)
      assert(flood == 3L, s"300 vectors / 3 clusters must hold 3 rows, got $flood")
      // advance 3 h in cluster 0 only → clusters 1,2 pass their deadline
      input.addData((900L, ts(10800), Array(1.0, 0.0, 0.0, 0.0)))
      q.processAllAvailable()
      input.addData((901L, ts(10860), Array(1.0, 0.0, 0.0, 0.0)))
      q.processAllAvailable()
      val afterIdle = stateRows(q)
      assert(afterIdle <= 1L,
        s"idle clusters must time out and remove, got $afterIdle rows")
    } finally q.stop()
  }

  test("semantic dedup: state rows = clusters (rep list capped inside the " +
      "row), never arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cents = Seq(0 -> Array(1.0, 0.0, 0.0, 0.0))
    val input = MemoryStream[(Long, java.sql.Timestamp, Array[Double])]
    val out = StreamingSemDedup.nearDupRejections(
      input.toDS().toDF("vec_id", "ts", "embedding"),
      "embedding", "vec_id", "ts", cents, threshold = 0.99, repCap = 16)
    val q = out.writeStream.format("memory").queryName("audit_semdedup")
      .outputMode("append").start()
    try {
      // 200 near-identical arrivals: one cluster row, reps capped at 16
      input.addData((1L to 200L).map(i =>
        (i, ts(i % 60), Array(1.0, 1e-9 * i, 0.0, 0.0))): _*)
      q.processAllAvailable()
      val rows = stateRows(q)
      assert(rows == 1L,
        s"200 near-dup arrivals must hold ONE cluster row, got $rows")
      val rejected = spark.sql("SELECT count(*) FROM audit_semdedup")
        .first().getLong(0)
      // reps cap at 16: every later arrival still finds a witness among
      // the capped reps (all ~identical), so rejections keep flowing
      assert(rejected >= 180L, s"cap must not stop rejection, got $rejected")
    } finally q.stop()
  }

  test("windowed rollup: watermark caps state to the open-horizon windows, " +
      "not the stream's lifetime window count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val out = StreamingRollup.tumblingCounts(
      input.toDS().toDF("ts", "g"), "ts", "g",
      windowDur = "1 minute", watermarkDelay = "5 minutes")
    val q = out.writeStream.format("memory").queryName("audit_rollup")
      .outputMode("append").start()
    try {
      // 60 distinct minutes × 4 groups = 240 lifetime windows, fed in
      // ascending batches so the watermark closes old windows as it moves
      (0 until 6).foreach { b =>
        input.addData((0 until 400).map { i =>
          val sec = b * 600L + (i % 600)
          (ts(sec), s"g${i % 4}")
        }: _*)
        q.processAllAvailable()
      }
      val rows = stateRows(q)
      // open horizon: ~(5 min delay + 10 min batch span) of 1-min windows
      // × 4 groups, far below the 240 lifetime windows
      assert(rows <= 4L * 20L,
        s"state must hold only open-horizon windows, got $rows (lifetime 240)")
    } finally q.stop()
  }
}
