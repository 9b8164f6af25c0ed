package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("streaming dedup emits first occurrences only, keyed on content") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDS().toDF("doc_id", "text", "ts")
    val out = StreamingDedup.firstOccurrence(docs, "text", "ts")
    val query = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2025-08-11 00:00:00")
      def ts(plusSec: Int) = new java.sql.Timestamp(t0.getTime + plusSec * 1000L)
      input.addData(
        (1L, "alpha text", ts(0)),
        (2L, "beta text", ts(1)),
        (3L, "alpha text", ts(2))) // duplicate of 1 within the same batch
      query.processAllAvailable()
      input.addData((4L, "alpha text", ts(3))) // duplicate across batches
      query.processAllAvailable()
      input.addData((5L, "gamma text", ts(4)))
      query.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM dedup_out").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 5L), s"got $kept")
    } finally query.stop()
  }

  test("duplicate arriving after its original aged past the watermark is re-admitted") {
    // the documented bounded-state trade: digest state lives only within
    // the watermark horizon; the batch dedup sweeping behind the stream
    // removes these stragglers
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = StreamingDedup.firstOccurrence(
      input.toDS().toDF("doc_id", "text", "ts"), "text", "ts",
      watermarkDelay = "10 minutes")
    val query = out.writeStream.format("memory").queryName("dedup_expiry")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2025-08-11 00:00:00")
      def ts(plusSec: Int) = new java.sql.Timestamp(t0.getTime + plusSec * 1000L)
      input.addData((1L, "alpha text", ts(0)))
      query.processAllAvailable()
      // advance the watermark hours past the original + delay: its digest
      // state expires
      input.addData((2L, "other text", ts(7200)))
      query.processAllAvailable()
      // same content again, event time near the new watermark — the
      // original's state is gone, so this is admitted as new
      input.addData((3L, "alpha text", ts(7300)))
      query.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM dedup_expiry").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 3L), s"expired duplicate must re-admit, got $kept")
    } finally query.stop()
  }
}
