package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingTemporalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val t0 = java.sql.Timestamp.valueOf("2025-08-11 00:00:00")
  private def ts(plusSec: Int) = new java.sql.Timestamp(t0.getTime + plusSec * 1000L)

  test("stream-stream interval join matches within lookback, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(String, java.sql.Timestamp, Long)]
    val views = MemoryStream[(String, java.sql.Timestamp, Long)]
    val joined = StreamingTemporal.intervalJoin(
      clicks.toDS().toDF("cu", "cts", "click_id"),
      views.toDS().toDF("vu", "vts", "view_id"),
      leftKey = "cu", rightKey = "vu", leftTs = "cts", rightTs = "vts",
      lookback = "60 seconds", watermarkDelay = "0 seconds")
    val query = joined.selectExpr("click_id", "view_id")
      .writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").start()
    try {
      // view in batch 1, click in batch 2: cross-batch buffering must match
      views.addData(("u1", ts(10), 100L), ("u1", ts(200), 101L), ("u2", ts(15), 102L))
      query.processAllAvailable()
      clicks.addData(
        ("u1", ts(40), 1L),  // matches view 100 (30 s back), not 101 (future)
        ("u1", ts(230), 2L), // matches view 101 (30 s back), not 100 (220 s back > lookback)
        ("u3", ts(50), 3L))  // no views for u3
      query.processAllAvailable()
      // equal-timestamp view matches its click; later-than-click view does not
      views.addData(("u2", ts(300), 103L))
      clicks.addData(("u2", ts(300), 4L), ("u2", ts(290), 5L))
      query.processAllAvailable()
      val got = spark.sql("SELECT click_id, view_id FROM ssjoin_out")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 100L), (2L, 101L), (4L, 103L)), s"got $got")
    } finally query.stop()
  }
}
