package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming transition pins: an in-order stream's hop multiset equals the
  * batch q140 pair set over the same rows (micro-batch cuts must not change
  * it — the hop crossing a cut closes from state), same-ts ties order by
  * event_id, and an out-of-order arrival is dropped-and-counted, never
  * rewriting an emitted hop. */
class StreamingTransitionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def ts(sec: Long) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  // (user_id, ts, event_id, event_type)
  private def run(rows: Seq[(Long, java.sql.Timestamp, Long, String)],
      cuts: Seq[Int], qn: String)
      : Seq[(Long, String, String, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val query = StreamingTransitions.hops(
        input.toDS().toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_id", "event_type")
      .toDF().select("userId", "srcType", "dstType", "tsu", "eventId", "late")
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try {
      val bounds = (0 +: cuts :+ rows.size).distinct.sorted
      bounds.sliding(2).foreach { case Seq(a, b) =>
        if (b > a) { input.addData(rows.slice(a, b): _*); query.processAllAvailable() }
      }
      spark.sql(s"SELECT * FROM $qn")
        .as[(Long, String, String, Long, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._4, r._5))
    } finally query.stop()
  }

  private val baseRows = Seq(
    (1L, ts(10), 1L, "view"), (1L, ts(20), 2L, "cart"), (1L, ts(30), 3L, "buy"),
    (2L, ts(10), 4L, "view"), (2L, ts(10), 5L, "view"), // same-ts: id order
    (2L, ts(40), 6L, "exit"))

  test("in-order hops equal the batch consecutive pairs; ties order by event_id") {
    val got = run(baseRows, Seq(), "hops_inorder")
    assert(got == Seq(
      (1L, "view", "cart", 20000000L, 2L, 0L),
      (1L, "cart", "buy", 30000000L, 3L, 0L),
      (2L, "view", "view", 10000000L, 5L, 0L),
      (2L, "view", "exit", 40000000L, 6L, 0L)))
  }

  test("micro-batch cuts never change the hop set: the crossing hop closes from state") {
    for (cuts <- Seq(Seq(1), Seq(2), Seq(3), Seq(1, 4), (1 until baseRows.size))) {
      val got = run(baseRows, cuts.toSeq, s"hops_cut_${cuts.mkString("_")}")
      assert(got == run(baseRows, Seq(), s"hops_ref_${cuts.mkString("_")}"),
        s"cuts=$cuts changed the hop set")
    }
  }

  test("rolled-up hops match the batch q140 matrix on a parquet twin") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("trans-stream").toString
    baseRows.toDF("user_id", "ts", "event_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.operators.PipelineQueries.eventTransitions(spark, dir)
      .select("src_type", "dst_type", "n")
      .as[(String, String, Long)].collect().toSet
    val streamed = run(baseRows, Seq(2), "hops_parity")
      .groupBy(h => (h._2, h._3)).map { case ((s, d), hs) => (s, d, hs.size.toLong) }
      .toSet
    assert(streamed == batch)
  }

  test("an out-of-order event is dropped and counted late on the next hop") {
    val rows = Seq(
      (1L, ts(10), 1L, "view"), (1L, ts(30), 3L, "buy"),
      (1L, ts(20), 2L, "cart"), // behind the frontier once 3 consumed
      (1L, ts(40), 4L, "exit"))
    val got = run(rows, Seq(2), "hops_late")
    assert(got == Seq(
      (1L, "view", "buy", 30000000L, 3L, 0L),
      (1L, "buy", "exit", 40000000L, 4L, 1L)))
    // batch over the same rows WOULD thread the cart event through — the
    // documented divergence the late counter surfaces
  }

  test("a dangling single event emits nothing; state persists across batches") {
    val got = run(Seq((9L, ts(10), 1L, "view")), Seq(), "hops_dangling")
    assert(got.isEmpty)
  }

  test("TTL: idle context evicts LOUDLY; the comeback starts fresh and is counted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def runTtl(ttl: Option[Long], qn: String) = {
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
      val query = StreamingTransitions.hops(
          input.toDS().toDF("user_id", "ts", "event_id", "event_type"),
          "user_id", "ts", "event_id", "event_type",
          watermarkDelay = "0 seconds", idleTimeoutMs = ttl)
        .toDF().select("userId", "srcType", "dstType", "tsu", "eventId", "late")
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        val batches = Seq(
          Seq((1L, ts(10), 1L, "view"), (1L, ts(20), 2L, "cart")),
          Seq((2L, ts(100), 3L, "view")), // watermark → 100s > 20s + 60s TTL
          Seq((2L, ts(110), 4L, "exit")), // the timed-out key fires here
          Seq((1L, ts(120), 5L, "buy")),  // comeback: fresh context
          Seq((1L, ts(130), 6L, "exit")))
        batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
        spark.sql(s"SELECT * FROM $qn")
          .as[(Long, String, String, Long, Long, Long)].collect().toSeq
          .sortBy(r => (r._1, r._4, r._5))
      } finally query.stop()
    }
    val evicted = runTtl(Some(60000L), "hops_ttl")
    assert(evicted == Seq(
      (1L, "view", "cart", 20000000L, 2L, 0L),
      (1L, "cart", StreamingTransitions.Evicted, 20000000L, 2L, 0L),
      (1L, "buy", "exit", 130000000L, 6L, 0L),
      (2L, "view", "exit", 110000000L, 4L, 0L)),
      s"TTL stream must announce the evicted context and restart fresh: $evicted")
    // the sentinel rows ARE the lost-comeback accounting: exactly one per
    // evicted context, so downstream counts them where batch q140 would
    // have threaded cart → buy
    assert(evicted.count(_._3 == StreamingTransitions.Evicted) == 1)
    // without TTL the same stream threads the comeback hop instead
    val noTtl = runTtl(None, "hops_nottl")
    assert(noTtl.contains((1L, "cart", "buy", 120000000L, 5L, 0L)) &&
      !noTtl.exists(_._3 == StreamingTransitions.Evicted), s"no-TTL parity: $noTtl")
  }
}
