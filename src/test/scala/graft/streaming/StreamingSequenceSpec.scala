package graft.streaming

import graft.ops.Layout
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSequenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def tmpLedger(): String = java.nio.file.Files
    .createTempDirectory("stream-seq").resolve("ledger").toString

  test("micro-batches draw contiguous position blocks, keys-ordered within each") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ledger = tmpLedger()
    val input = MemoryStream[(Long, String)]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val query = StreamingSequence.resumeEachBatch(
      input.toDS().toDF("doc_id", "text"),
      Seq(col("doc_id")), ledger) { (df, batchId) =>
      results ++= df.select(lit(batchId), col("doc_id"), col("pos"))
        .as[(Long, Long, Long)].collect()
    }
    try {
      input.addData((5L, "a"), (3L, "b"), (9L, "c"))
      query.processAllAvailable()
      input.addData((2L, "d"), (7L, "e"))
      query.processAllAvailable()
      val byBatch = results.groupBy(_._1)
      // batch 0: doc_ids 3,5,9 -> pos 1,2,3 in key order despite arrival order
      assert(byBatch(0L).sortBy(_._3).map(_._2).toSeq == Seq(3L, 5L, 9L))
      assert(byBatch(0L).map(_._3).toSet == Set(1L, 2L, 3L))
      // batch 1 continues: doc_ids 2,7 -> pos 4,5
      assert(byBatch(1L).sortBy(_._3).map(r => (r._2, r._3)).toSeq ==
        Seq((2L, 4L), (7L, 5L)))
    } finally query.stop()
  }

  test("a replayed batch id reassigns the IDENTICAL positions (ledger idempotence)") {
    import spark.implicits._
    val ledger = tmpLedger()
    val b0 = Seq((30L, "x"), (10L, "y")).toDF("doc_id", "text")
    val b1 = Seq((20L, "z")).toDF("doc_id", "text")
    val keys = Seq(col("doc_id"))
    val first = StreamingSequence.assignBatch(b0, keys, ledger, batchId = 0L)
      .select("doc_id", "pos").as[(Long, Long)].collect().toSet
    StreamingSequence.assignBatch(b1, keys, ledger, batchId = 1L).count()
    // crash-replay of batch 0: same id, same rows -> same positions, and the
    // ledger did not advance (batch 1 still owns 3)
    val replay = StreamingSequence.assignBatch(b0, keys, ledger, batchId = 0L)
      .select("doc_id", "pos").as[(Long, Long)].collect().toSet
    assert(first == Set((10L, 1L), (30L, 2L)))
    assert(replay == first)
    assert(StreamingSequence.readLedger(spark, ledger)
      .map(r => r._1 -> (r._2, r._3)).toMap ==
      Map(0L -> (0L, 2L), 1L -> (2L, 3L)))
  }

  test("streaming positions equal the batch resumeSequence over the same shards") {
    import spark.implicits._
    val ledgerA = tmpLedger()
    val stateB = java.nio.file.Files
      .createTempDirectory("stream-seq-b").resolve("state").toString
    val shard1 = (1 to 50).map(i => ((i * 7 % 100).toLong, i.toLong))
      .toDF("k", "id")
    val shard2 = (51 to 80).map(i => ((i * 7 % 100).toLong, i.toLong))
      .toDF("k", "id")
    val keys = Seq(col("k"), col("id"))
    val streamed =
      StreamingSequence.assignBatch(shard1, keys, ledgerA, 0L).unionByName(
        StreamingSequence.assignBatch(shard2, keys, ledgerA, 1L))
        .select("k", "id", "pos").as[(Long, Long, Long)].collect().sortBy(_._3)
    val batch =
      Layout.resumeSequence(shard1, keys, stateB).unionByName(
        Layout.resumeSequence(shard2, keys, stateB))
        .select("k", "id", "pos").as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(streamed.toSeq == batch.toSeq)
  }
}
