package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** StreamingImportance = the ingest mirror of batch q113: the fit must
  * reproduce the batch ratio table's arithmetic, per-row scores must equal
  * the batch per-doc log-weights, and micro-batch boundaries must not
  * change anything (stateless stage). */
class StreamingImportanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val corpus = Seq(
    (0L, "alpha beta alpha gamma", "en", "srcA"),
    (1L, "alpha alpha beta beta", "en", "srcA"),
    (2L, "delta epsilon zeta", "de", "srcB"),
    (3L, "alpha delta delta", "de", "srcB"),
    (5L, "beta gamma gamma gamma alpha", "en", "srcB"))

  test("fit + annotate rollup equals the batch q113 report on one corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("simp-docs").toString
    corpus.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = StreamingImportance.fitModel(docs, "text", col("lang") === "en")
    val rollup = StreamingImportance.annotate(docs, model)
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(col("selected").cast("long")).as("sel_docs"),
        sum(size(graft.ops.TextOps.tokens(col("text")))).as("n_tokens"),
        round(avg("logw"), 6).as("avg_logw"),
        round(max("logw"), 6).as("max_logw"))
      .orderBy("source")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    val batch = graft.operators.SelectionQueries.importanceWeights(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(rollup == batch)
    spark.sharedState.cacheManager.clearCache()
  }

  test("stream scores equal batch scores across micro-batches; OOV bucket " +
    "takes the smoothed default") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fit = corpus.map(c => (c._1, c._2, c._3)).toDF("doc_id", "text", "lang")
    val model = StreamingImportance.fitModel(fit, "text", col("lang") === "en")
    // arriving docs include a token the fit corpus never saw ("omega")
    val arrivals = Seq(
      (10L, "alpha beta"),
      (11L, "delta delta epsilon"),
      (12L, "omega"),
      (13L, "alpha omega gamma"))
    val input = MemoryStream[(Long, String)]
    val query = StreamingImportance.annotate(
        input.toDS().toDF("doc_id", "text"), model)
      .select("doc_id", "logw", "selected")
      .writeStream.format("memory").queryName("imp_out")
      .outputMode("append").start()
    try {
      input.addData(arrivals.take(2): _*)
      query.processAllAvailable()
      input.addData(arrivals.drop(2): _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM imp_out")
        .as[(Long, Double, Boolean)].collect().toSet
      val batch = StreamingImportance.annotate(
          arrivals.toDF("doc_id", "text"), model)
        .select("doc_id", "logw", "selected")
        .as[(Long, Double, Boolean)].collect().toSet
      assert(streamed == batch && streamed.size == 4)
      // the en-looking arrival ranks above the de-looking one
      val byId = streamed.map(t => t._1 -> t._2).toMap
      assert(byId(10L) > byId(11L))
      // OOV-only doc scores exactly the never-seen-bucket default
      val tr = corpus.map(_._2.split("\\s+").count(_.nonEmpty)).sum
      val tt = corpus.filter(_._3 == "en")
        .map(_._2.split("\\s+").count(_.nonEmpty)).sum
      val dflt = BigDecimal(StrictMath.log(
        ((0 + 1).toDouble / (tt + 128)) / ((0 + 1).toDouble / (tr + 128))))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(byId(12L) == BigDecimal(dflt).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    } finally query.stop()
  }
}
