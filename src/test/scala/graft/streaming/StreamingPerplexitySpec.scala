package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming perplexity pins: the collected per-lang bigram LM scores
  * bit-equal to the batch q164 arithmetic on in-vocabulary documents, the
  * stream-only OOV lanes take the documented smoothed floors, and the
  * frozen-cutoff gate keeps exactly the at-or-under documents. */
class StreamingPerplexitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "en", "aa bb aa bb aa"), (2L, "en", "aa bb cc"),
      (3L, "en", "cc cc cc"), (4L, "fr", "xx yy xx"), (5L, "fr", "yy xx yy")
    ).toDF("doc_id", "lang", "text")
  }

  /** The batch q164 scoring arithmetic (grouped counts → micro-unit nlp →
    * integer per-doc mean), replayed with DataFrame ops. */
  private def batchAvgU = {
    graft.expr.GraftFunctions.ensureRegistered(spark)
    val grouped = corpus
      .select(col("doc_id"), col("lang"),
        explode(graft.expr.GraftFunctions.wordBigrams(col("text"))).as("_bg"))
      .select(col("doc_id"), col("lang"),
        substring_index(col("_bg"), " ", 1).as("w1"),
        substring_index(col("_bg"), " ", -1).as("w2"))
      .groupBy("doc_id", "lang", "w1", "w2").agg(count(lit(1)).as("n"))
    val c2 = grouped.groupBy("lang", "w1", "w2").agg(sum("n").as("c2"))
    val c1 = grouped.groupBy("lang", "w1").agg(sum("n").as("c1"))
    val v = corpus.select(col("lang"),
        explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
      .groupBy("lang").agg(countDistinct("w").as("_v"))
    grouped.join(c2, Seq("lang", "w1", "w2")).join(c1, Seq("lang", "w1"))
      .join(v, Seq("lang"))
      .select(col("doc_id"), col("n"),
        round(lit(1e6) * -log((col("c2") + lit(0.5)) /
          (col("c1") + lit(0.5) * col("_v")))).cast("long").as("_nlp_u"))
      .groupBy("doc_id")
      .agg(expr("sum(n * _nlp_u) div sum(n)").as("avg_u"))
  }

  test("in-vocabulary documents score bit-equal to the batch q164 " +
      "arithmetic, through a real stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val expected = batchAvgU.as[(Long, Long)].collect().toMap
    val m = StreamingPerplexity.fitModel(corpus, "text", "lang")
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingPerplexity.annotate(
        input.toDS().toDF("doc_id", "lang", "text"), m)
      .select("doc_id", "nlp_u")
      .writeStream.format("memory").queryName("ppl_out")
      .outputMode("append").start()
    try {
      input.addData((1L, "en", "aa bb aa bb aa"), (2L, "en", "aa bb cc"),
        (3L, "en", "cc cc cc"), (4L, "fr", "xx yy xx"), (5L, "fr", "yy xx yy"))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, nlp_u FROM ppl_out")
        .as[(Long, Long)].collect().toMap
      assert(streamed == expected,
        s"stream/batch divergence: $streamed vs $expected")
    } finally q.stop()
    spark.sharedState.cacheManager.clearCache()
  }

  test("stream-only lanes: unseen bigram takes the seen-w1 floor, unseen " +
      "w1 scores ln(V), unknown lang and short text score NULL") {
    import spark.implicits._
    val m = StreamingPerplexity.fitModel(corpus, "text", "lang")
    val vEn = m.vocab("en") // 3 distinct unigrams: aa bb cc
    val got = StreamingPerplexity.annotate(
        Seq((10L, "en", "aa zz"),    // unseen bigram (aa, zz): c1(aa)=4
          (11L, "en", "zz zz"),      // unseen w1: -ln(0.5/(0.5 V)) = ln(V)
          (12L, "de", "aa bb"),      // unknown lang
          (13L, "en", "aa"))         // <2 tokens
          .toDF("doc_id", "lang", "text"), m)
      .select("doc_id", "nlp_u").as[(Long, Option[Long])].collect().toMap
    val c1aa = m.c1(("en", "aa"))
    assert(got(10L).contains(
      math.round(1e6 * -math.log(0.5 / (c1aa + 0.5 * vEn)))))
    assert(got(11L).contains(math.round(1e6 * math.log(vEn.toDouble))))
    assert(got(12L).isEmpty && got(13L).isEmpty)
    spark.sharedState.cacheManager.clearCache()
  }

  test("capped model: per-lang top-N prune bounds BOTH tables; pruned " +
      "bigrams fall to their w1 floor, pruned w1 to ln(V)") {
    import spark.implicits._
    val full = StreamingPerplexity.fitModel(corpus, "text", "lang")
    val m = StreamingPerplexity.fitModel(corpus, "text", "lang",
      maxBigramsPerLang = 1)
    assert(full.nlpU.size > m.nlpU.size && full.c1.size > m.c1.size)
    assert(m.nlpU.keys.groupBy(_._1).values.forall(_.size <= 1))
    assert(m.c1.keys.groupBy(_._1).values.forall(_.size <= 1))
    // (en) keeps only the most frequent bigram (aa,bb) c2=3, scored with
    // its EXACT c1 — capping never changes a kept bigram's score
    assert(m.nlpU(("en", "aa", "bb")) == full.nlpU(("en", "aa", "bb")))
    // w1 'bb' is pruned from the floor table (c1 ties 3=3, 'aa' wins the
    // (c1 desc, w1) order) -> 'bb ?' now scores the unseen-w1 ln(V) floor
    assert(m.c1.contains(("en", "aa")) && !m.c1.contains(("en", "bb")))
    val got = StreamingPerplexity.annotate(
        Seq((20L, "en", "bb zz")).toDF("doc_id", "lang", "text"), m)
      .select("nlp_u").as[Option[Long]].head()
    assert(got.contains(math.round(1e6 * math.log(m.vocab("en").toDouble))))
    spark.sharedState.cacheManager.clearCache()
  }

  test("gate: frozen cutoffs keep at-or-under scored docs, reject the " +
      "unscorable lane") {
    import spark.implicits._
    val m = StreamingPerplexity.fitModel(corpus, "text", "lang")
    val scored = StreamingPerplexity.annotate(corpus, m)
      .select("doc_id", "nlp_u").as[(Long, Long)].collect().toMap
    val cut = scored(2L) // keep docs scoring <= doc 2's nlp
    val kept = StreamingPerplexity.gate(
        corpus.unionByName(Seq((9L, "de", "aa bb")).toDF("doc_id", "lang", "text")),
        m, Map("en" -> cut, "fr" -> Long.MaxValue))
      .select("doc_id").as[Long].collect().toSet
    val expect = scored.collect {
      case (id, u) if id <= 3 && u <= cut => id
      case (id, _) if id >= 4 => id // fr cutoff is MaxValue
    }.toSet
    assert(kept == expect, s"gate kept $kept, expected $expect")
    spark.sharedState.cacheManager.clearCache()
  }
}
