package graft.streaming

import graft.ops.SemDedup
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)

  // two direction clusters; ids 0 and 2 are the kmeans init (every 2nd < 4)
  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f)),    // +x, first — survives
    (1L, Array(4.0f, 0.1f)),    // +x near-dup of 0 — rejected
    (2L, Array(0.0f, 1.0f)),    // +y, first — survives
    (3L, Array(-0.1f, 2.0f)),   // +y near-dup of 2 — rejected
    (5L, Array(2.0f, 0.0f)),    // +x exact direction dup of 0 — rejected
    (6L, Array(-1.0f, 0.9f)))   // diagonal-ish: lands somewhere, no near dup

  private lazy val cents = {
    import spark.implicits._
    SemDedup.kmeansFit(vecs.toDF("vec_id", "embedding"), "embedding", "vec_id",
      initEvery = 2, initMax = 4, iters = 2)
  }

  test("in-order stream rejects exactly the batch pruned set, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Array[Float])]
    val docs = input.toDS().toDF("vec_id", "ts", "embedding")
    val query = StreamingSemDedup.nearDupRejections(
      docs, "embedding", "vec_id", "ts", cents, threshold = 0.95, repCap = 256)
      .writeStream.format("memory").queryName("semdedup_out")
      .outputMode("append").start()
    try {
      val events = vecs.zipWithIndex.map { case ((id, v), i) => (id, ts(i), v) }
      input.addData(events.take(3): _*)
      query.processAllAvailable()
      input.addData(events.drop(3): _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT vecId, priorId FROM semdedup_out")
        .as[(Long, Long)].collect().toMap
      val batchPruned = SemDedup.assignAndPrune(
        vecs.toDF("vec_id", "embedding"), "embedding", "vec_id", cents,
        threshold = 0.95, repCap = 256)
        .where(col("_pruned")).select("_id").as[Long].collect().toSet
      assert(streamed.keySet == batchPruned)
      assert(batchPruned == Set(1L, 3L, 5L), "fixture must exercise both clusters")
      // witnesses are the earliest cluster member in each case
      assert(streamed(1L) == 0L && streamed(5L) == 0L && streamed(3L) == 2L)
    } finally query.stop()
  }

  test("rep cap bounds state; a capped cluster still rejects against its reps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Array[Float])]
    val docs = input.toDS().toDF("vec_id", "ts", "embedding")
    // one cluster, repCap=2: ids 0,1 fill the rep set (1 rejecting against
    // 0 on the way in); 2 is dissimilar to both reps so it is admitted but
    // can no longer become a rep; 9 then matches 2 almost exactly yet is
    // admitted too — the documented cap trade-off (the nightly batch sweep
    // catches it)
    val query = StreamingSemDedup.nearDupRejections(
      docs, "embedding", "vec_id", "ts", Seq(0 -> Array(1.0, 0.0)),
      threshold = 0.9, repCap = 2)
      .writeStream.format("memory").queryName("semdedup_cap_out")
      .outputMode("append").start()
    try {
      input.addData(
        (0L, ts(0), Array(1.0f, 0.0f)),
        (1L, ts(1), Array(1.0f, 0.01f)),
        (2L, ts(2), Array(0.6f, 0.8f)),
        (9L, ts(3), Array(0.6f, 0.81f)))
      query.processAllAvailable()
      val got = spark.sql("SELECT vecId FROM semdedup_cap_out")
        .as[Long].collect().toSet
      assert(got == Set(1L), s"only the rep near-dup rejects under the cap, got $got")
    } finally query.stop()
  }
}
