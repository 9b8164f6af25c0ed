package graft.streaming

import graft.ops.UnigramLM
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming unigram-LM tokenize pins: piece counts on a stream must equal
  * the batch fit's segmentation applied to the same words, model save/load
  * must round-trip, and out-of-alphabet words must take the documented
  * len-fallback instead of failing the stream. */
class StreamingTokenizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("streamed piece counts equal the batch segmentation; model " +
      "round-trips through parquet; OOV falls back to len") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tf = Seq(("tok", 50L), ("tokens", 20L), ("take", 5L)).toDF("w", "c")
    val (m, seg) = UnigramLM.fit(tf)
    val segSizes = seg.select(col("w"), size(col("pieces")))
      .as[(String, Int)].collect().toMap

    val path = java.nio.file.Files
      .createTempDirectory("unigram-model").resolve("m").toString
    UnigramLM.saveModel(spark, m, path)
    val loaded = UnigramLM.loadModel(spark, path)
    assert(loaded == m, "save/load must round-trip the piece table")

    val input = MemoryStream[(Long, String)]
    val query = StreamingTokenize.annotate(
        input.toDS().toDF("doc_id", "text"), loaded)
      .select("doc_id", "n_words", "n_pieces", "oov_words")
      .writeStream.format("memory").queryName("tok_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "tok tokens take"),
        (2L, "tok tok"),
        (3L, "zzz tok")) // 'z' not in the fitted alphabet → len fallback
      query.processAllAvailable()
      val got = spark.sql("SELECT * FROM tok_out")
        .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val expect1 = (3L,
        (segSizes("tok") + segSizes("tokens") + segSizes("take")).toLong, 0L)
      assert(got(1L) == expect1, s"batch/stream divergence: ${got(1L)} vs $expect1")
      assert(got(2L) == ((2L, 2L * segSizes("tok"), 0L)))
      assert(got(3L) == ((2L, 3L + segSizes("tok"), 1L)),
        "the OOV word must count len(w) pieces and one oov_words")
    } finally query.stop()
    spark.sharedState.cacheManager.clearCache()
  }
}
