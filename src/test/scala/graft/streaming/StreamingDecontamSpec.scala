package graft.streaming

import graft.ops.TextOps
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming decontamination screen must reproduce the batch q51
  * decision exactly: same grams, same hashes, same "shares >= minShared
  * distinct grams with SOME single probe" rule. */
class StreamingDecontamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("per-row overlap equals the batch contamination join's per-pair max, corpus-wide") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.operators.ContractQueries.table(spark, dir, "documents")
    val probes = docs.where(pmod(col("doc_id"), lit(100)) === 0)
    val idx = StreamingDecontam.probeIndex(probes, "text", n = 3)
    // batch side: per-(doc, probe) distinct shared grams (minShared=1 keeps
    // every matching pair), maxed per doc; docs in the probe set excluded
    // (q51 excludes self-pairs; an arriving stream never contains probes)
    val batchMax = TextOps.contamination(docs, "text", "doc_id",
        probes, "text", "doc_id", n = 3, minShared = 1)
      .where(pmod(col("doc_id"), lit(100)) =!= 0)
      .groupBy("doc_id").agg(max("shared_ngrams").as("m"))
      .as[(Long, Long)].collect().toMap
    val streamSide = StreamingDecontam.annotate(
        docs.where(pmod(col("doc_id"), lit(100)) =!= 0), idx)
      .select(col("doc_id"), col("max_shared"))
      .as[(Long, Int)].collect().toMap
    assert(streamSide.nonEmpty)
    streamSide.foreach { case (id, m) =>
      assert(m.toLong == batchMax.getOrElse(id, 0L), s"doc $id")
    }
    assert(batchMax.keySet.subsetOf(streamSide.keySet))
  }

  test("streaming screen drops exactly the batch-flagged docs, across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val probeFixture = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (200L, "one two three four five six seven"))
    val arriving = Seq(
      (1L, "alpha beta gamma delta epsilon zeta entirely lifted"), // 4 shared 3-grams
      (2L, "unrelated text with no overlap at all"),
      (3L, "one two three and then something else"), // exactly 1 shared gram
      (4L, "one two three four plus trailing words")) // 2 shared grams
    val probes = probeFixture.toDF("doc_id", "text")
    val idx = StreamingDecontam.probeIndex(probes, "text", n = 3)
    val input = MemoryStream[(Long, String)]
    val query = StreamingDecontam.screen(
        input.toDS().toDF("doc_id", "text"), idx, minShared = 2)
      .select("doc_id").writeStream.format("memory").queryName("decontam_out")
      .outputMode("append").start()
    try {
      input.addData(arriving.take(2): _*)
      query.processAllAvailable()
      input.addData(arriving.drop(2): _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM decontam_out").as[Long].collect().toSet
      // batch decision on the same fixture through the REAL q51 operator
      val flagged = TextOps.contamination(
          arriving.toDF("doc_id", "text"), "text", "doc_id",
          probes, "text", "doc_id", n = 3, minShared = 2)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == arriving.map(_._1).toSet -- flagged)
      assert(streamed == Set(2L, 3L)) // 1 and 4 are contaminated
    } finally query.stop()
  }

  test("fewer-than-n-token docs and empties screen consistently with the batch fallback") {
    val s = spark
    import s.implicits._
    val probes = Seq((1L, "tiny probe")).toDF("doc_id", "text")
    val idx = StreamingDecontam.probeIndex(probes, "text", n = 3)
    // "tiny probe" has < 3 tokens → ONE whole-text gram on both paths
    val rows = Seq((10L, "tiny probe"), (11L, "tiny"), (12L, ""))
      .toDF("doc_id", "text")
    val got = StreamingDecontam.annotate(rows, idx)
      .select("doc_id", "max_shared").as[(Long, Int)].collect().toMap
    assert(got(10L) == 1) // exact whole-text match
    assert(got(11L) == 0 && got(12L) == 0)
  }
}
