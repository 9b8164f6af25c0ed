package graft.streaming

import graft.operators.CurationQueries
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingCurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  // one doc per rule outcome: clean keep, short, stopword-heavy+repetitive
  private val goodDoc = (Seq("good", "good") ++ (1 to 23).map(i => f"tk$i%02d")).mkString(" ")
  private val fixture = Seq(
    (0L, goodDoc, "en", "s0"),
    (1L, "only five words in here", "en", "s0"),
    (2L, (List.fill(13)("the") ++ (1 to 12).map(i => f"wd$i%02d")).mkString(" "), "en", "s0"),
    (3L, "", "en", "s0")) // tokenless: keep=false, dropped by the gate

  test("streaming gate emits exactly the batch keeps, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, String)]
    val docs = input.toDS().toDF("doc_id", "text", "lang", "source")
    val query = StreamingCuration.qualityGate(docs)
      .select("doc_id").writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try {
      input.addData(fixture.take(2): _*)
      query.processAllAvailable()
      input.addData(fixture.drop(2): _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM gate_out").as[Long].collect().toSet
      val batch = StreamingCuration.qualityGate(
        fixture.toDF("doc_id", "text", "lang", "source"))
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch && streamed == Set(0L))
    } finally query.stop()
  }

  test("array-side flags agree with the relational q82 rollup") {
    import spark.implicits._
    // same fixture through both implementations: the per-language rollup of
    // the stateless flags must equal the corpus-scale relational rollup
    val dir = java.nio.file.Files.createTempDirectory("stream-curation").toString
    val df = fixture.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val relational = CurationQueries.gopherRules(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val arraySide = StreamingCuration.annotate(df)
      .where(col("n_tokens") > 0) // the relational path never sees tokenless docs
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_keep"),
        sum(lit(1L) - col("wc_ok").cast("long")).as("v_wordcount"),
        sum(lit(1L) - col("mwl_ok").cast("long")).as("v_meanlen"),
        sum(lit(1L) - col("stop_ok").cast("long")).as("v_stopword"),
        sum(lit(1L) - col("rep_ok").cast("long")).as("v_repetition"))
      .orderBy("lang")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(arraySide == relational)
  }

  test("flags agree with the relational path on real corpus data too") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val relational = CurationQueries.gopherRules(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val arraySide = StreamingCuration.annotate(
      graft.operators.ContractQueries.table(spark, dir, "documents"))
      .where(col("n_tokens") > 0)
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_keep"),
        sum(lit(1L) - col("wc_ok").cast("long")).as("v_wordcount"),
        sum(lit(1L) - col("mwl_ok").cast("long")).as("v_meanlen"),
        sum(lit(1L) - col("stop_ok").cast("long")).as("v_stopword"),
        sum(lit(1L) - col("rep_ok").cast("long")).as("v_repetition"))
      .orderBy("lang")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(arraySide == relational)
  }
}
