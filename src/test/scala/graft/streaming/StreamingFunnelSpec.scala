package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pin for the composed streaming ingest funnel: the streamed
  * survivor set must equal the batch composition of the same stages, and
  * the fixture must exercise EVERY stage — each one drops or transforms a
  * specific document (attributed batch-side stage by stage), because a
  * funnel test that filters nothing proves nothing. */
class StreamingFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val probeText = "the quick brown fox jumps over the lazy dog"
  // gate scores probed against Scrub.tokenWeight: 0 → −16 (gate-dropped),
  // 3 → +140 (PII doc the gate KEEPS, so masking is visible in survivors),
  // 4 → +18 (passes the gate; 3 shared probe 3-grams, so the screen drops it)
  private val fixture = Seq(
    (0L, "mail a1234@ex.com at 10.0.0.1 order 98765"),
    (1L, "clean text with no sensitive content"),
    (2L, "ids 42 and 31337 only"),
    (3L, "spark table join hash window row a1234@ex.com"),
    (4L, "spark table the quick brown fox jumps window row"),
    (5L, "clean text with no sensitive content"), // dup of 1 (post-mask)
    // dup of 1 only AFTER repair: NUL inside a token + doubled space —
    // without the repair stage its digest would differ and it would survive
    (6L, "clean text with no sensitive c" + 0.toChar + "ontent  "))

  test("streamed funnel survivors equal the batch composition, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = StreamingDecontam.probeIndex(Seq(probeText).toDF("text"))

    val t0 = java.sql.Timestamp.valueOf("2025-08-11 00:00:00")
    def ts(i: Int) = new java.sql.Timestamp(t0.getTime + i * 1000L)
    val rows = fixture.zipWithIndex.map { case ((id, tx), i) => (id, tx, ts(i)) }

    // the survivor set must be INVARIANT to where micro-batch boundaries
    // fall (order is preserved; only batching changes): all-at-once,
    // the dup pair split from its original, and one-row batches
    def runSplit(cuts: Seq[Int], qn: String): Set[(Long, String)] = {
      val input = MemoryStream[(Long, String, java.sql.Timestamp)]
      val query = StreamingFunnel.ingest(
          input.toDS().toDF("doc_id", "text", "ts"), idx)
        .select("doc_id", "text")
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        val bounds = (0 +: cuts :+ rows.size).distinct.sorted
        bounds.sliding(2).foreach { case Seq(a, b) =>
          if (b > a) { input.addData(rows.slice(a, b): _*); query.processAllAvailable() }
        }
        spark.sql(s"SELECT * FROM $qn").as[(Long, String)].collect().toSet
      } finally query.stop()
    }
    val streamed = runSplit(Seq(3), "funnel_out")
    assert(runSplit(Seq(), "funnel_one") == streamed, "single-batch run must agree")
    assert(runSplit((1 until rows.size), "funnel_rowwise") == streamed,
      "one-row micro-batches must agree")

    // batch replay of the same stages; keep-first computed per masked text
    // in arrival order (the stream is in event-time order here)
    val static = rows.toDF("doc_id", "text", "ts")
    val gated = StreamingScrub.classifierGate(
      StreamingScrub.scrub(StreamingRepair.repair(static)))
    val gatedIds = gated.select("doc_id").as[Long].collect().toSet
    val clean = StreamingDecontam.screen(gated, idx)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq.sortBy(_._1)
    val expected = clean.groupBy(_._2).map(_._2.minBy(_._1)).toSet
    assert(streamed == expected, s"streamed=$streamed expected=$expected")

    // every stage did work, attributed to the right stage:
    val cleanIds = clean.map(_._1).toSet
    assert(streamed.exists(t => t._1 == 3L && t._2.contains("<EMAIL>")),
      "scrub's masking must be visible on a surviving doc")
    assert(!gatedIds.contains(0L), "gate must drop the low-scoring PII doc")
    assert(gatedIds.contains(4L) && !cleanIds.contains(4L),
      "screen (not the gate) must drop the contaminated doc")
    assert(cleanIds.contains(5L) && !streamed.exists(_._1 == 5L),
      "dedup (not an earlier stage) must drop the cross-batch duplicate")
    assert(cleanIds.contains(6L) && !streamed.exists(_._1 == 6L),
      "the NUL-dirtied dup must dedup — only possible if repair ran first")
    assert(streamed.map(_._1) == Set(1L, 2L, 3L))
  }

  test("perplexity stage gates inside the funnel on the PREDICTED lang; " +
      "the drop attributes to it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = StreamingDecontam.probeIndex(Seq(probeText).toDF("text"))
    // both arrival texts use positive-weight classifier tokens ('clean'
    // +46, 'quality' +14) so the classifier gate keeps them; the LM is fit
    // on 'clean quality' chains, so doc A's bigrams are all in-model while
    // doc B rides the unseen-bigram floor -> only the perplexity stage
    // separates them
    val fit = Seq(("xx", "clean quality clean quality clean")).toDF("lang", "text")
    val lm = StreamingLangId.fitModel(fit, "text", "lang", n = 3)
    val pm = StreamingPerplexity.fitModel(fit, "text", "lang")
    val static = Seq((10L, "clean quality clean"), (11L, "quality quality quality"))
      .toDF("doc_id", "text")
    val scored = StreamingPerplexity.annotate(
        StreamingLangId.annotate(static, lm), pm, "text", "lang_pred")
      .select("doc_id", "nlp_u").as[(Long, Long)].collect().toMap
    assert(scored(10L) < scored(11L), s"fixture must separate: $scored")
    val cutoffs = Map("xx" -> scored(10L))

    val t0 = java.sql.Timestamp.valueOf("2025-08-11 00:00:00")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val query = StreamingFunnel.ingest(
        input.toDS().toDF("doc_id", "text", "ts"), idx,
        langModel = Some(lm),
        perplexityModel = Some(pm), perplexityCutoffsU = cutoffs)
      .select("doc_id")
      .writeStream.format("memory").queryName("funnel_ppl")
      .outputMode("append").start()
    try {
      input.addData((10L, "clean quality clean", t0),
        (11L, "quality quality quality",
          new java.sql.Timestamp(t0.getTime + 1000)))
      query.processAllAvailable()
      val survivors = spark.sql("SELECT * FROM funnel_ppl").as[Long].collect().toSet
      assert(survivors == Set(10L), s"got $survivors")
      // attribution: both docs survive every non-perplexity stage
      val gated = StreamingScrub.classifierGate(
        StreamingScrub.scrub(StreamingRepair.repair(
          static.withColumn("ts", lit(t0)))))
      val screened = StreamingDecontam.screen(gated, idx)
        .select("doc_id").as[Long].collect().toSet
      assert(screened == Set(10L, 11L),
        "both arrivals must survive every non-perplexity stage")
    } finally query.stop()
  }

  test("importance stage gates inside the funnel; the drop attributes to it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = StreamingDecontam.probeIndex(Seq(probeText).toDF("text"))
    // fit: 'clean' is the target vocabulary, 'quality' raw-only; both words
    // carry POSITIVE classifier token weights (+46 / +14), so the
    // classifier gate keeps both arrivals and any drop below is the
    // importance stage's alone
    val fit = Seq(("clean clean", "t"), ("quality quality", "r"))
      .toDF("text", "slice")
    val model = StreamingImportance.fitModel(fit, "text", col("slice") === "t")

    val t0 = java.sql.Timestamp.valueOf("2025-08-11 00:00:00")
    val rows = Seq(
      (10L, "clean clean", new java.sql.Timestamp(t0.getTime)),        // target-like
      (11L, "quality quality", new java.sql.Timestamp(t0.getTime + 1000))) // raw-like

    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val query = StreamingFunnel.ingest(
        input.toDS().toDF("doc_id", "text", "ts"), idx,
        importanceModel = Some(model))
      .select("doc_id")
      .writeStream.format("memory").queryName("funnel_imp")
      .outputMode("append").start()
    try {
      input.addData(rows.take(1): _*); query.processAllAvailable()
      input.addData(rows.drop(1): _*); query.processAllAvailable()
      val survivors = spark.sql("SELECT * FROM funnel_imp").as[Long].collect().toSet
      assert(survivors == Set(10L), s"got $survivors")
      // attribution: both docs pass repair+scrub+gate AND the screen; only
      // the importance stage separates them
      val static = rows.toDF("doc_id", "text", "ts")
      val gated = StreamingScrub.classifierGate(
        StreamingScrub.scrub(StreamingRepair.repair(static)))
      val screened = StreamingDecontam.screen(gated, idx)
        .select("doc_id").as[Long].collect().toSet
      assert(screened == Set(10L, 11L),
        "both arrivals must survive every non-importance stage")
    } finally query.stop()
  }
}
