package graft.streaming

import graft.ops.LangId
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming language-ID pins: the collected model + imperative scorer
  * must predict EXACTLY what the batch q158 pipeline (LangId.predict)
  * predicts on the same documents, and the annotation must compose in
  * append mode as a stateless funnel stage. */
class StreamingLangIdSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def trainDf = {
    import spark.implicits._
    Seq(
      ("xx", "aaa bbb aaa aab"), ("xx", "aab baa aaa bba"),
      ("yy", "zzz yyy zzy yzz"), ("yy", "zzy yzz zzz yyz"),
      ("ww", "mno nop opq mno")
    ).toDF("lang", "text")
  }

  test("streamed predictions are bit-equal to the batch scorer on the " +
      "same documents (incl. OOV-only and short texts)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "aaa aab baa"), (2L, "zzz yzz"), (3L, "mno opq"),
      (4L, "qqq rrr sss"), // fully OOV → priors + OOV floors
      (5L, "ab"),          // shorter than the gram width → one collapsed gram
      (6L, "")             // empty text
    )
    val (model, stats) = LangId.fit(trainDf, "text", "lang", n = 3)
    val batch = LangId.predict(docs.toDF("doc_id", "text"), "text", "doc_id",
        n = 3, model, stats)
      .as[(Long, String)].collect().toMap

    val m = StreamingLangId.fitModel(trainDf, "text", "lang", n = 3)
    val input = MemoryStream[(Long, String)]
    val query = StreamingLangId.annotate(
        input.toDS().toDF("doc_id", "text"), m, "text", n = 3)
      .select("doc_id", "lang_pred")
      .writeStream.format("memory").queryName("langid_out")
      .outputMode("append").start()
    try {
      input.addData(docs.take(3): _*)
      query.processAllAvailable()
      input.addData(docs.drop(3): _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, lang_pred FROM langid_out")
        .as[(Long, String)].collect().toMap
      assert(streamed == batch,
        s"stream/batch divergence: $streamed vs $batch")
    } finally query.stop()
    spark.sharedState.cacheManager.clearCache()
  }

  test("capped model: top-N-grams-per-lang prune matches batch predict on " +
      "the SAME capped table, and really bounds the collect") {
    import spark.implicits._
    val docs = Seq((1L, "aaa aab baa"), (2L, "zzz yzz"), (3L, "mno opq"),
      (4L, "qqq rrr"), (5L, "aaa zzz mno"))
    val cap = 3
    val (model, stats) = LangId.fit(trainDf, "text", "lang", n = 3)
    val capped = StreamingLangId.cappedModel(model, cap)
    // the prune really bit: the uncapped table is larger than langs×cap
    assert(model.count() > capped.count())
    assert(capped.groupBy("lang").count().agg(max("count")).head.getLong(0)
      <= cap)
    // batch scoring against the capped table == streaming Model from the
    // same cap (pruned grams fall to the OOV floor on BOTH sides)
    val batch = LangId.predict(docs.toDF("doc_id", "text"), "text", "doc_id",
        n = 3, capped, stats)
      .as[(Long, String)].collect().toMap
    val m = StreamingLangId.fitModel(trainDf, "text", "lang", n = 3,
      maxGramsPerLang = cap)
    assert(m.llu.size <= cap * m.langs.length,
      "collected map must be cap-bounded")
    val streamed = StreamingLangId.annotate(
        docs.toDF("doc_id", "text"), m)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(streamed == batch,
      s"capped stream/batch divergence: $streamed vs $batch")
    spark.sharedState.cacheManager.clearCache()
  }

  test("annotate is stateless: a static frame scores identically and keeps " +
      "its other columns") {
    import spark.implicits._
    val m = StreamingLangId.fitModel(trainDf, "text", "lang", n = 3)
    val got = StreamingLangId.annotate(
        Seq((7L, "zzz zzy", "keepme")).toDF("doc_id", "text", "extra"), m)
      .select("doc_id", "lang_pred", "extra")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((7L, "yy", "keepme")))
    spark.sharedState.cacheManager.clearCache()
  }
}
