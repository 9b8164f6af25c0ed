package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingPackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def doc(id: Long, n: Int, source: String): (Long, String, String) =
    (id, (0 until n).map(i => s"t${id}_$i").mkString(" "), source)

  test("in-order batches reproduce the batch q88 packing, state carried across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDS().toDF("doc_id", "text", "source")
    val query = StreamingPacking.packStream(docs).toDF()
      .writeStream.format("memory").queryName("pack_out")
      .outputMode("append").start()
    try {
      // batch 1: s0 gets 100 + 200 tokens; batch 2 continues s0 at 300 and
      // opens s1 — the cross-batch state is the running end offset
      input.addData(doc(0L, 100, "s0"), doc(1L, 200, "s0"))
      query.processAllAvailable()
      input.addData(doc(2L, 300, "s0"), doc(10L, 10, "s1"), doc(11L, 250, "s1"))
      query.processAllAvailable()
      val got = spark.sql(
        "SELECT source, doc_id, n, start, end, seq_id, straddles FROM pack_out")
        .as[(String, Long, Long, Long, Long, Long, Boolean)].collect()
        .map(r => r._2 -> r).toMap
      // identical to the batch windowed-cumsum formula (q88, B=256):
      assert(got(0L) == (("s0", 0L, 100L, 0L, 100L, 0L, false)))
      assert(got(1L) == (("s0", 1L, 200L, 100L, 300L, 0L, true))) // crosses 256
      assert(got(2L) == (("s0", 2L, 300L, 300L, 600L, 1L, true))) // crosses 512
      assert(got(10L) == (("s1", 10L, 10L, 0L, 10L, 0L, false)))
      assert(got(11L) == (("s1", 11L, 250L, 10L, 260L, 0L, true)))
      // per-source rollup matches q88's aggregates on the same docs
      val s0 = Seq(got(0L), got(1L), got(2L))
      assert(s0.map(_._3).sum == 600L && s0.count(_._7) == 2)
      assert((s0.map(_._5).max + 255L) / 256L == 3L) // n_seqs
    } finally query.stop()
  }

  test("within one batch, packing order is deterministic by doc_id, not arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val query = StreamingPacking.packStream(
      input.toDS().toDF("doc_id", "text", "source")).toDF()
      .writeStream.format("memory").queryName("pack_order")
      .outputMode("append").start()
    try {
      // arrival order 5, 3, 4 — offsets must follow doc_id order 3, 4, 5
      input.addData(doc(5L, 30, "s0"), doc(3L, 10, "s0"), doc(4L, 20, "s0"))
      query.processAllAvailable()
      val got = spark.sql("SELECT doc_id, start FROM pack_order")
        .as[(Long, Long)].collect().toMap
      assert(got == Map(3L -> 0L, 4L -> 10L, 5L -> 30L))
    } finally query.stop()
  }

  test("tokenless docs are dropped and consume no offset") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val query = StreamingPacking.packStream(
      input.toDS().toDF("doc_id", "text", "source")).toDF()
      .writeStream.format("memory").queryName("pack_empty")
      .outputMode("append").start()
    try {
      input.addData((1L, "", "s0"), (2L, "   ", "s0"), doc(3L, 7, "s0"))
      query.processAllAvailable()
      val got = spark.sql("SELECT doc_id, start, end FROM pack_empty")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == Seq((3L, 0L, 7L)))
    } finally query.stop()
  }
}
