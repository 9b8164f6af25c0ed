package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Batch↔stream parity for chunk-level dedup: for an in-event-order stream
  * the surviving chunk set must equal the batch q105 keep-first decision,
  * including a duplicate chunk arriving in a LATER micro-batch and an
  * intra-document repeated chunk. */
class StreamingChunkDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("streamed kept chunks equal the batch q105 keep-first set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val shared = (1 to 20).map(i => f"sh$i%02d")
    val uniqA = (1 to 20).map(i => f"ua$i%02d")
    val uniqB = (1 to 20).map(i => f"ub$i%02d")
    val runt = (1 to 5).map(i => f"rt$i%02d")
    val rows = Seq(
      (0L, (shared ++ uniqA ++ runt).mkString(" ")),   // chunks: shared, uniqA, runt
      (1L, (uniqB ++ shared).mkString(" ")),           // shared dups doc 0 chunk 0
      (2L, (shared ++ shared).mkString(" ")),          // intra-doc repeat
      (3L, runt.mkString(" ")))                        // runt dups doc 0 chunk 2
    val t0 = java.sql.Timestamp.valueOf("2025-08-11 00:00:00")
    val timed = rows.zipWithIndex.map { case ((id, tx), i) =>
      (id, tx, new java.sql.Timestamp(t0.getTime + i * 1000L))
    }

    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val query = StreamingChunkDedup.keptChunks(
        input.toDS().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("chunks_out")
      .outputMode("append").start()
    val streamed = try {
      input.addData(timed.take(2): _*)
      query.processAllAvailable()
      input.addData(timed.drop(2): _*) // dups arrive a batch later
      query.processAllAvailable()
      spark.sql("SELECT doc_id, chunk_idx, n_chunk FROM chunks_out")
        .as[(Long, Long, Int)].collect().toSet
    } finally query.stop()

    // batch q105 on the same corpus: per-doc (n_chunks, n_kept) must equal
    // the streamed survivors grouped by doc
    val dir = java.nio.file.Files.createTempDirectory("schunk").toString
    timed.map(r => (r._1, r._2, "en", "s0")).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batch = graft.operators.CurationQueries.chunkDedup(spark, dir)
      .select("doc_id", "n_kept")
      .as[(Long, Long)].collect().toMap
    val streamedPerDoc = streamed.groupBy(_._1).map { case (id, cs) => id -> cs.size.toLong }
    assert(streamedPerDoc == batch.filter(_._2 > 0), s"streamed=$streamedPerDoc batch=$batch")
    // exact survivors: doc 0 keeps all three firsts; everything later is a dup
    assert(streamed == Set((0L, 0L, 20), (0L, 1L, 20), (0L, 2L, 5), (1L, 0L, 20)))
  }
}
