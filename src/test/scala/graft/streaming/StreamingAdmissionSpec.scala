package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingAdmissionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val t0 = java.sql.Timestamp.valueOf("2025-08-11 00:00:00")
  private def ts(plusSec: Int) = new java.sql.Timestamp(t0.getTime + plusSec * 1000L)

  test("near-dup of an admitted doc is rejected; fresh docs are not") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDS().toDF("doc_id", "text", "ts")
    val out = StreamingAdmission.nearDupRejections(docs, "text", "doc_id", "ts")
    val query = out.writeStream.format("memory").queryName("adm_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog", ts(0)),
        (2L, "completely different content with no overlap at all here", ts(1)))
      query.processAllAvailable()
      input.addData(
        (10L, "the quick brown fox jumps over the lazy dog", ts(60)), // dup of 1
        (11L, "yet another unrelated document about spark and shuffles", ts(61)))
      query.processAllAvailable()
      // intra-batch dup: 12 duplicates 11 (admitted one micro-batch ago),
      // 13 duplicates 12's content within the same batch — both rejected,
      // and 13's witness is the ADMITTED 11, never the rejected 12
      input.addData(
        (12L, "yet another unrelated document about spark and shuffles", ts(120)),
        (13L, "yet another unrelated document about spark and shuffles", ts(121)))
      query.processAllAvailable()
      // one row per witnessing bucket; DISTINCT collapses them (all of a
      // doc's rows land in one micro-batch, so this is a plain sink read)
      val got = spark.sql("SELECT DISTINCT docId, priorId, estJaccard FROM adm_out")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == Set((10L, 1L, 1.0), (12L, 11L, 1.0), (13L, 11L, 1.0)), s"got $got")
    } finally query.stop()
  }

  test("bucket state expires past the watermark horizon: old corpus forgets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDS().toDF("doc_id", "text", "ts")
    val out = StreamingAdmission.nearDupRejections(docs, "text", "doc_id", "ts",
      watermarkDelay = "10 minutes", horizonMs = 10L * 60L * 1000L)
    val query = out.writeStream.format("memory").queryName("adm_expiry")
      .outputMode("append").start()
    try {
      input.addData((1L, "the quick brown fox jumps over the lazy dog", ts(0)))
      query.processAllAvailable()
      // push the watermark hours ahead: doc 1's buckets age out
      input.addData((2L, "some entirely unrelated filler content", ts(7200)))
      query.processAllAvailable()
      input.addData((3L, "the quick brown fox jumps over the lazy dog", ts(7300)))
      query.processAllAvailable()
      val rejected = spark.sql("SELECT docId FROM adm_expiry").as[Long].collect().toSet
      // doc 3 is a dup of 1, but 1's state expired — admitted as new; the
      // batch sweep behind the stream owns stragglers (documented trade)
      assert(rejected.isEmpty, s"expired bucket must not reject, got $rejected")
    } finally query.stop()
  }

  test("stream rejections equal the batch incrementalAdmit complement on a fixture day") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // corpus arrives first (one batch), then the 'daily arrivals'; the
    // stream's rejected set must equal batch \ incrementalAdmit(corpus, batch)
    val corpusRows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different content with no overlap at all here"),
      (3L, "a third corpus text about catalyst plans and codegen stages"))
    val batchRows = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // dup of corpus 1
      (11L, "fresh arrival text with brand new material"),
      (12L, "fresh arrival text with brand new material"), // dup of 11
      (13L, "another novel document mentioning shuffles and exchanges"))
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDS().toDF("doc_id", "text", "ts")
    val out = StreamingAdmission.nearDupRejections(docs, "text", "doc_id", "ts")
    val query = out.writeStream.format("memory").queryName("adm_equiv")
      .outputMode("append").start()
    try {
      input.addData(corpusRows.zipWithIndex.map { case ((id, t), i) => (id, t, ts(i)) }: _*)
      query.processAllAvailable()
      input.addData(batchRows.zipWithIndex.map { case ((id, t), i) => (id, t, ts(100 + i)) }: _*)
      query.processAllAvailable()
      val streamRejected = spark.sql("SELECT DISTINCT docId FROM adm_equiv")
        .as[Long].collect().toSet
      val admitted = graft.ops.PortableSketch.incrementalAdmit(
        corpusRows.toDF("doc_id", "text"), batchRows.toDF("doc_id", "text"),
        "text", "doc_id", k = 16, bands = 4, n = 3, threshold = 0.5)
        .select("doc_id").as[Long].collect().toSet
      assert(streamRejected == batchRows.map(_._1).toSet -- admitted,
        s"stream rejected $streamRejected vs batch admitted $admitted")
    } finally query.stop()
  }
}
