package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Append-mode watermark semantics: the watermark advances to each batch's
  * max event time (delay 0 here) and a no-data batch then emits every
  * window whose end it passed — so only windows containing the very latest
  * event remain open. The specs drive that explicitly. */
class StreamingRollupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val t0 = java.sql.Timestamp.valueOf("2025-08-11 00:00:00")
  private def ts(plusSec: Int) = new java.sql.Timestamp(t0.getTime + plusSec * 1000L)

  test("tumbling windows finalize once watermark passes; late rows are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val out = StreamingRollup.tumblingCounts(
      input.toDS().toDF("event_type", "ts"), "ts", "event_type",
      windowDur = "1 minute", watermarkDelay = "0 seconds")
    val query = out.writeStream.format("memory").queryName("tumbling_out")
      .outputMode("append").start()
    try {
      // batch 1: two rows in window [00:00,00:01), one in [00:01,00:02)
      input.addData(("click", ts(10)), ("click", ts(40)), ("click", ts(90)))
      query.processAllAvailable()
      // batch 2 advances the watermark past w0's end -> w0 emitted (n=2)
      input.addData(("click", ts(130)))
      query.processAllAvailable()
      // batch 3: advance past w1's end; also a too-late row for closed w0
      input.addData(("click", ts(180)), ("click", ts(50)))
      query.processAllAvailable()
      val rows = spark.sql("SELECT window_start, n FROM tumbling_out")
        .as[(java.sql.Timestamp, Long)].collect().toMap
      assert(rows.get(ts(0)).contains(2L), s"w0 must emit n=2 (late row dropped), got $rows")
      assert(rows.get(ts(60)).contains(1L), s"w1 must emit n=1, got $rows")
      assert(rows.get(ts(120)).contains(1L), s"w2's end equals the final watermark, got $rows")
      // the window holding the latest event (watermark == its start) is open
      assert(!rows.contains(ts(180)), "unfinalized windows must not emit in append mode")
    } finally query.stop()
  }

  test("session windows merge within gap and finalize after watermark passes end+gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val out = StreamingRollup.sessionCounts(
      input.toDS().toDF("user", "ts"), "ts", "user",
      gap = "30 seconds", watermarkDelay = "0 seconds")
    val query = out.writeStream.format("memory").queryName("session_out")
      .outputMode("append").start()
    try {
      // one session of three events (gaps 20 s, 15 s), one singleton later
      input.addData(("u", ts(0)), ("u", ts(20)), ("u", ts(35)), ("u", ts(300)))
      query.processAllAvailable()
      input.addData(("u", ts(600))) // watermark -> 300: closes session 1
      query.processAllAvailable()
      input.addData(("u", ts(1200))) // watermark -> 600: closes session 2
      query.processAllAvailable()
      val rows = spark.sql("SELECT session_start, n FROM session_out")
        .as[(java.sql.Timestamp, Long)].collect().toMap
      assert(rows.get(ts(0)).contains(3L), s"merged session of 3 expected, got $rows")
      assert(rows.get(ts(300)).contains(1L), s"singleton session expected, got $rows")
      assert(rows.get(ts(600)).contains(1L), s"watermark 1200 closes [600,630), got $rows")
      // the session holding the latest event has not aged past its gap
      assert(!rows.contains(ts(1200)), "open sessions must not emit in append mode")
    } finally query.stop()
  }
}
