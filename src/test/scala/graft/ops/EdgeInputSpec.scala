package graft.ops

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-input robustness: null text, empty strings, whitespace-only docs,
  * and single-char payloads must flow through every sketch/text operator
  * without NPEs or crashes, producing the documented degenerate values.
  * (A 100 TB corpus ALWAYS contains these rows; an operator that throws on
  * one poisons its whole task.) */
class EdgeInputSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val edgeDocs = Seq(
    (1L, null.asInstanceOf[String]),
    (2L, ""),
    (3L, "   "),
    (4L, "x"),
    (5L, "normal document with several words in it"),
    (6L, "normal document with several words in it") // dup of 5
  ).toDF("doc_id", "text")

  test("exact dedup survives null/empty/whitespace texts") {
    val kept = Dedup.exactDedup(edgeDocs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(5L) && !kept.contains(6L), "dup of 5 must drop")
    assert(kept.intersect(Set(2L, 3L, 4L)) == Set(2L, 3L, 4L), "distinct edge docs survive")
  }

  test("minhash + LSH pipelines survive edge inputs (both hash families)") {
    val fused = Dedup.minhashNearDups(edgeDocs, "text", "doc_id",
      k = 16, bands = 4, shingle = 3, threshold = 0.5, wordGrams = true)
      .as[(Long, Long, Double)].collect().toSet
    assert(fused.contains((5L, 6L, 1.0)), s"exact dups must pair: $fused")
    val portable = PortableSketch.minhashNearDups(edgeDocs, "text", "doc_id",
      k = 16, bands = 4, n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(portable.contains((5L, 6L, 1.0)), s"exact dups must pair: $portable")
  }

  test("simhash, winnow, fingerprint and token ops survive edge inputs") {
    val out = edgeDocs.select(
      col("doc_id"),
      PortableSketch.simhash60(col("text"), 5).as("sh"),
      PortableSketch.winnowText(col("text"), 8, 16).as("wn"),
      TextOps.tokenCount(col("text")).as("ntok"))
      .collect()
    assert(out.length == 6) // no task death
    val ntoks = out.map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
    // null text null-propagates; empty/whitespace tokenize to zero
    assert(ntoks(1L).isEmpty)
    assert(ntoks(2L).contains(0) && ntoks(3L).contains(0) && ntoks(4L).contains(1))
  }

  test("bm25 ignores degenerate docs without crashing") {
    val scored = Retrieval.bm25(edgeDocs, "text", "doc_id", Seq("document"))
      .as[(String, Long, Long, Double)].collect()
    assert(scored.map(_._2).toSet == Set(5L, 6L))
    assert(scored.forall(_._4 > 0.0))
  }

  test("bm25 with no matching term returns an empty frame, not an error") {
    val scored = Retrieval.bm25(edgeDocs, "text", "doc_id", Seq("zzz_absent_term"))
    assert(scored.count() == 0)
  }

  test("round-11 doc analytics (q146/q152/q156) survive edge inputs") {
    val dir = java.nio.file.Files.createTempDirectory("edge-docs").toString
    edgeDocs.withColumn("lang", when(col("doc_id") % 2 === 0, lit("en")))
      .withColumn("source", lit("s0"))
      // id 100: a probe doc (doc_id % 100 == 0) among the edge rows;
      // id 200: a NULL-text probe — its tag never tokenizes, so it is out
      // of eval scope by construction (documented in retrievalEval)
      .unionByName(Seq((100L, "normal probe doc words", "en", "s0"),
        (200L, null.asInstanceOf[String], null, "s0"))
        .toDF("doc_id", "text", "lang", "source"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // q146: null text contributes no tokens; null lang coalesces to '??';
    // the tf >= 5 floor empties this tiny corpus — no crash, sane frame
    val q146 = graft.operators.PipelineQueries.distinctiveTerms(spark, dir).collect()
    assert(q146.forall(_.getLong(4) > 0L))
    // q152: profiles only languages that produced tokens
    val q152 = graft.operators.PipelineQueries.tokenConcentration(spark, dir)
      .collect()
    assert(q152.nonEmpty && q152.forall(r => r.getLong(1) > 0))
    // q156: the null-text probe drops from scope; the real probe ranks 1
    val q156 = graft.operators.PipelineQueries.retrievalEval(spark, dir)
      .as[(Long, Long, Long, Long)].collect().head
    assert(q156 == ((1L, 1L, 1L, 10000L)), s"got $q156")
    spark.sharedState.cacheManager.clearCache()
  }

  test("repetition/annotation path survives edge inputs") {
    // same shape as q68's per-doc stage
    val tk = edgeDocs.select(col("doc_id"), TextOps.tokens(col("text")).as("_ts"))
    val g = tk.withColumn("_grams",
      when(size(col("_ts")) < 2, array(concat_ws(" ", col("_ts"))))
        .otherwise(transform(sequence(lit(0), size(col("_ts")) - 2),
          i => concat_ws(" ", slice(col("_ts"), i + 1, lit(2))))))
    val rows = g.select(col("doc_id"), size(col("_grams")).as("n")).collect()
    assert(rows.length == 6)
  }

  test("scrub survives null/empty/digit-only strings") {
    val got = edgeDocs.union(Seq((7L, "123456")).toDF("doc_id", "text"))
      .select(col("doc_id"), Scrub.scrub(col("text")).as("r")).select(col("doc_id"), col("r.*"))
      .as[(Long, Option[Int], Option[Int], Option[Int], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // null text -> null struct fields, no NPE; empty/whitespace are identity
    assert(got(1L) == ((None, None, None, None)))
    assert(got(2L) == ((Some(0), Some(0), Some(0), Some(""))))
    assert(got(7L) == ((Some(0), Some(0), Some(1), Some("<NUM>"))))
  }

  test("classifier score: null text drops at the gate, empty text scores 0") {
    val scored = edgeDocs.withColumn("s",
      graft.streaming.StreamingScrub.score(col("text")))
    val byId = scored.select("doc_id", "s").as[(Long, Option[Long])].collect().toMap
    assert(byId(1L).isEmpty, "null text -> null score")
    assert(byId(2L).contains(0L) && byId(3L).contains(0L), "tokenless -> fold init 0")
    val kept = graft.streaming.StreamingScrub.classifierGate(edgeDocs)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(1L), "null score must not pass the >= 0 gate")
    assert(kept.contains(2L), "empty text scores 0 and passes")
  }

  test("semantic ops survive zero vectors and singleton clusters") {
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f)),   // zero vector: cosine guard -> 0 everywhere
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cents = SemDedup.kmeansFit(vecs, "embedding", "vec_id",
      initEvery = 2, initMax = 3, iters = 1)
    val got = SemDedup.assignAndPrune(vecs, "embedding", "vec_id", cents,
      threshold = 0.9).as[(Long, Int, Boolean)].collect()
    assert(got.length == 3)
    val pruned = got.filter(_._3).map(_._1).toSet
    assert(pruned == Set(3L), "exact duplicate of 2 prunes; zero vector never matches")
  }

  test("globalSequence of an empty frame is empty, not an error") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "k")
    assert(Layout.globalSequence(empty, Seq(col("k"), col("id")), "pos",
      partitions = 4).count() == 0)
  }

  test("importance scoring survives edge inputs; gate drops null and tokenless") {
    import graft.streaming.StreamingImportance
    // fit on the edge corpus itself: null/empty/whitespace rows contribute
    // no tokens and must not poison the model
    val model = StreamingImportance.fitModel(edgeDocs, "text", col("doc_id") >= 5)
    assert(model.length === 128)
    val byId = StreamingImportance.annotate(edgeDocs, model)
      .select("doc_id", "logw").as[(Long, Option[Double])].collect().toMap
    assert(byId(1L).isEmpty, "null text -> null logw (dropped by the gate)")
    assert(byId(2L).contains(0.0) && byId(3L).contains(0.0),
      "tokenless -> fold init 0.0")
    val kept = StreamingImportance.gate(edgeDocs, model)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.intersect(Set(1L, 2L, 3L)).isEmpty,
      "null and tokenless docs never pass the logw > 0 gate")
    // the target-slice docs (the only token sources) must score positive
    assert(kept == Set(5L, 6L))
  }

  test("bloom screen survives null/empty/whitespace texts on both sides") {
    // a null-text probe and null/degenerate corpus docs must not crash the
    // gram kernel, the h60 hashing, or the position joins; doc 5/6 share
    // their whole gram set with the identical probe
    val probes = Seq((100L, "normal document with several words in it"),
      (101L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextOps.bloomDecontam(edgeDocs, "text", "doc_id",
        probes, "text", "doc_id")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(5L, 6L), s"only real sharers appear: $got")
    assert(got(5L)._1 == got(5L)._2 && got(5L)._2 >= 2L,
      "full-overlap doc: candidates == exact >= threshold")
    spark.sharedState.cacheManager.clearCache()
  }

  test("events analytics survive an empty day table shape") {
    // zero events: retention, anomalies, EWMA, graph seeds — empty frames
    // with the declared schema, never an error
    val dir = java.nio.file.Files.createTempDirectory("edge-ev").toString
    Seq.empty[(Long, String, java.sql.Timestamp)]
      .toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(graft.operators.PipelineQueries.cohortRetention(spark, dir).count() == 0L)
    assert(graft.operators.PipelineQueries.hourlyAnomalies(spark, dir).count() == 0L)
    assert(graft.operators.PipelineQueries.ewmaTrend(spark, dir).count() == 0L)
    spark.sharedState.cacheManager.clearCache()
  }

  test("phash near-dup report: null and empty payloads stay visible as 0-hash exact dups") {
    val assets = Seq(
      (1L, null.asInstanceOf[Array[Byte]], "image"),
      (2L, Array.emptyByteArray, "image"),
      (3L, Array.fill(128)(65.toByte), "image")) // constant bytes also hash 0
      .toDF("asset_id", "payload", "m")
      .select(col("asset_id"), col("payload"),
        struct(col("m").as("modality"), lit("png").as("format"),
          lit(0).as("width"), lit(0).as("height"), lit(0L).as("durationMs"),
          coalesce(length(col("payload")).cast("long"), lit(0L)).as("sizeBytes"))
          .as("meta"))
    val r = Multimodal.phashNearDupReport(assets)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // all three collapse to hash 0 (null == empty == mean-flat payload):
    // n_assets counts every row — a null payload never vanishes from the
    // report — and the trio forms 3 exact-dup pairs
    assert(r == Seq(("image", 3L, 1L, 3L, 3L, 3L)))
  }

  test("cdcChunks survives edge inputs: null/empty drop, short texts chunk " +
      "whole, every chunk has positive length") {
    val ch = TextOps.cdcChunks(edgeDocs, "text", Seq("doc_id"))
      .select("doc_id", "chunk_len").as[(Long, Long)].collect()
    assert(!ch.exists(c => c._1 == 1L || c._1 == 2L),
      "null/empty texts have no chunks")
    // sub-window texts ('   ', 'x') chunk as one whole-text chunk
    assert(ch.count(_._1 == 3L) == 1 && ch.count(_._1 == 4L) == 1)
    assert(ch.forall(_._2 >= 1L), "no zero-length chunks")
    spark.sharedState.cacheManager.clearCache()
  }

  test("byte BPE vocabulary path survives whitespace-only and 1-char docs") {
    val dir = java.nio.file.Files.createTempDirectory("edgebpe").toString
    edgeDocs
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.operators.Round13Queries.byteBpe(spark, dir)
      .select("source", "n_words").as[(String, Long)].collect()
    // null/empty/whitespace docs contribute no words; 'x' and the dup pair do
    assert(r.nonEmpty && r.head._2 >= 1L)
    spark.sharedState.cacheManager.clearCache()
  }
}
