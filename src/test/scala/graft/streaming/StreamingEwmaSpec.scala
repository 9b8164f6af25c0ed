package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming EWMA pins: the emitted per-day chain must replay the batch
  * q132 integer fold bit-for-bit on an in-order stream, micro-batch
  * boundaries must not change it, a quiet day must finalize via the
  * event-time timeout, and a post-fold (late) arrival must be counted but
  * not re-open its day. */
class StreamingEwmaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def dayTs(day: Long, sec: Long) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(day * 86400 + sec))

  private def run(rows: Seq[(String, java.sql.Timestamp)], cuts: Seq[Int],
      qn: String, delay: String = "30 days")
      : Seq[(String, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val query = StreamingEwma.trends(
        input.toDS().toDF("event_type", "ts"), "event_type", "ts", delay)
      .toDF().select("eventType", "day", "n", "ewmaU", "spikes", "late")
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try {
      val bounds = (0 +: cuts :+ rows.size).distinct.sorted
      bounds.sliding(2).foreach { case Seq(a, b) =>
        if (b > a) { input.addData(rows.slice(a, b): _*); query.processAllAvailable() }
      }
      spark.sql(s"SELECT * FROM $qn")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2))
    } finally query.stop()
  }

  // days 10..14 with counts [4,4,4,20,4], then one day-15 event to fold
  // day 14 (off epoch zero: an event AT the initial watermark would drop)
  private val chainRows: Seq[(String, java.sql.Timestamp)] =
    (10L to 12L).flatMap(d => (0L until 4L).map(i => ("a", dayTs(d, i)))) ++
      (0L until 20L).map(i => ("a", dayTs(13, i))) ++
      (0L until 4L).map(i => ("a", dayTs(14, i))) :+ (("a", dayTs(15, 0)))

  test("emitted chain replays the batch q132 fold; spike lands on the step day") {
    val got = run(chainRows, Seq(), "ewma_chain")
    assert(got == Seq(
      ("a", 10L, 4L, 4000000L, 0L, 0L),
      ("a", 11L, 4L, 4000000L, 0L, 0L),
      ("a", 12L, 4L, 4000000L, 0L, 0L),
      ("a", 13L, 20L, 8800000L, 1L, 0L),  // 20e6 > 2·4e6 → spike; e = 8.8e6
      ("a", 14L, 4L, 7360000L, 1L, 0L)))  // e = (12e6 + 61.6e6) div 10
    // the last fold equals the batch q132 report over days 0..4
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ewma-stream").toString
    chainRows.dropRight(1).toDF("event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.operators.PipelineQueries.ewmaTrend(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(batch == Seq(("a", 5L, 7360000L, 1L)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("micro-batch boundaries do not change the chain") {
    val whole = run(chainRows, Seq(), "ewma_one")
    val cut = run(chainRows, chainRows.indices.drop(1), "ewma_rowwise")
    assert(whole == cut)
  }

  test("a late event after its day folded is counted, not re-opened") {
    val rows = Seq(
      ("a", dayTs(0, 1)), ("a", dayTs(0, 2)),
      ("a", dayTs(1, 1)),       // folds day 0 (n=2)
      ("a", dayTs(0, 50)),      // LATE: day 0 already folded
      ("a", dayTs(2, 1)))       // folds day 1 (n=1), carrying late=1
    val got = run(rows, rows.indices.drop(1), "ewma_late")
    assert(got == Seq(
      ("a", 0L, 2L, 2000000L, 0L, 0L),
      ("a", 1L, 1L, 1700000L, 0L, 1L))) // e=(3e6+14e6) div 10; late counted
  }

  test("a quiet day finalizes via the event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val query = StreamingEwma.trends(
        input.toDS().toDF("event_type", "ts"), "event_type", "ts", "10 minutes")
      .toDF().select("eventType", "day", "n", "ewmaU", "spikes")
      .writeStream.format("memory").queryName("ewma_timeout")
      .outputMode("append").start()
    try {
      input.addData(("a", dayTs(0, 1)), ("a", dayTs(0, 2)))
      query.processAllAvailable()
      // another type's far-future events push the global watermark past
      // day 0's deadline; the NEXT batch fires a's timeout
      input.addData(("b", dayTs(3, 0)))
      query.processAllAvailable()
      input.addData(("b", dayTs(3, 1)))
      query.processAllAvailable()
      val got = spark.sql("SELECT * FROM ewma_timeout")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
        .filter(_._1 == "a")
      assert(got == Seq(("a", 0L, 2L, 2000000L, 0L)),
        s"quiet day must fold on timeout, got $got")
    } finally query.stop()
  }

  test("stepPacked: the spike counter saturates at 63 and never carries " +
      "into the EWMA field") {
    // alternating heavy/quiet days: at the steady state e ≈ 0.41·B, so
    // every heavy day satisfies B·1e6 > 2·e and spikes — >63 spikes over
    // 160 folds. Without saturation the 64th spike would carry into the
    // EWMA field; the packed EWMA must track the independently-computed
    // unpacked recurrence bit-for-bit the whole way.
    var packed = -1L
    var refE = -1L
    var refSpikes = 0L
    for (day <- 1 to 160) {
      val n = if (day % 2 == 1) 1000L else 1L
      packed = StreamingEwma.stepPacked(packed, n)
      if (refE < 0L) refE = n * 1000000L
      else {
        if (n * 1000000L > 2L * refE) refSpikes += 1L
        refE = (3L * n * 1000000L + 7L * refE) / 10L
      }
      assert(packed / 64L == refE,
        s"day $day: EWMA field diverged from the unpacked recurrence")
      assert(packed % 64L == math.min(refSpikes, 63L),
        s"day $day: spike field must saturate at 63")
    }
    assert(refSpikes > 63L, "the drive pattern must actually exceed 63 spikes")
    assert(packed % 64L == 63L)
  }
}
