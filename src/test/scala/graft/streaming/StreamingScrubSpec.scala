package graft.streaming

import graft.ops.Scrub
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingScrubSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("trained gate: fit → saveModel → stream-score equals the batch gate") {
    import graft.ops.TrainedGate
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // separable toy features: keep iff x_t is clearly positive
    val train = (0 until 120).map { i =>
      val x = (i % 13 - 6) / 6.0
      (i.toLong, if (x >= 0.2) 1.0 else 0.0, 1.0, x)
    }
    val f = train.toDF("doc_id", "y", "x_b", "x_t")
    val xCols = Seq("x_b", "x_t")
    val w = TrainedGate.fitLogistic(f, xCols, "y", lr = 1.0, iters = 20)
    val dir = java.nio.file.Files.createTempDirectory("graft-gate-model")
      .resolve("m").toString
    TrainedGate.saveModel(spark, w, xCols, dir)
    val (cols2, w2) = TrainedGate.loadModel(spark, dir)
    assert(cols2 == xCols && w2 == w) // exact round-trip, order preserved

    val input = MemoryStream[(Long, Double, Double)]
    val query = TrainedGate.gate(
        input.toDS().toDF("doc_id", "x_b", "x_t"), w2, cols2)
      .select("doc_id", "margin").writeStream.format("memory")
      .queryName("trained_gate_out").outputMode("append").start()
    try {
      input.addData(train.map(t => (t._1, t._3, t._4)).take(60): _*)
      query.processAllAvailable()
      input.addData(train.map(t => (t._1, t._3, t._4)).drop(60): _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM trained_gate_out")
        .as[(Long, Double)].collect().toSet
      val batch = TrainedGate.gate(
          train.map(t => (t._1, t._3, t._4)).toDF("doc_id", "x_b", "x_t"),
          w, xCols)
        .select("doc_id", "margin").as[(Long, Double)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally query.stop()
  }

  private val fixture = Seq(
    (0L, "mail a1234@ex.com at 10.0.0.1 order 98765"),
    (1L, "clean text with no sensitive content"),
    (2L, "ids 42 and 31337 only"),
    (3L, "spark table join hash window row"))

  test("streaming scrub masks exactly like the batch operator, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDS().toDF("doc_id", "text")
    val query = StreamingScrub.scrub(docs)
      .select("doc_id", "text", "n_email", "n_ip", "n_num")
      .writeStream.format("memory").queryName("scrub_out")
      .outputMode("append").start()
    try {
      input.addData(fixture.take(2): _*)
      query.processAllAvailable()
      input.addData(fixture.drop(2): _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM scrub_out")
        .as[(Long, String, Int, Int, Int)].collect().toSet
      val batch = StreamingScrub.scrub(fixture.toDF("doc_id", "text"))
        .select("doc_id", "text", "n_email", "n_ip", "n_num")
        .as[(Long, String, Int, Int, Int)].collect().toSet
      assert(streamed == batch)
      assert(streamed.find(_._1 == 0L).get ==
        ((0L, "mail <EMAIL> at <IP> order <NUM>", 1, 1, 1)))
    } finally query.stop()
  }

  test("streaming classifier gate keeps exactly the batch q95 keeps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDS().toDF("doc_id", "text")
    val query = StreamingScrub.classifierGate(docs)
      .select("doc_id", "score").writeStream.format("memory")
      .queryName("gate95_out").outputMode("append").start()
    try {
      input.addData(fixture: _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM gate95_out")
        .as[(Long, Long)].collect().toMap
      // the fold-based stream score must equal the explode+sum batch score
      val batchScores = fixture.toDF("doc_id", "text")
        .select(col("doc_id"), explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
        .groupBy("doc_id").agg(sum(Scrub.tokenWeight(col("w"))).as("score"))
        .as[(Long, Long)].collect().toMap
      val batchKeeps = batchScores.filter(_._2 >= 0)
      assert(streamed == batchKeeps)
      assert(streamed.nonEmpty && streamed.size < fixture.size,
        "fixture must exercise both sides of the gate")
    } finally query.stop()
  }
}
