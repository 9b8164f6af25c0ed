package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Online coreset pins: the per-cluster kept count must track
  * ceil(sqrt(seen)) exactly (the q119 balance target, maintained online by
  * first-fit), state must persist across micro-batches, and clusters must
  * not share counters. */
class StreamingCoresetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val cents = Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
  private def t0 = java.sql.Timestamp.valueOf("2025-08-11 00:00:00")
  private def ts(i: Int) = new java.sql.Timestamp(t0.getTime + i * 1000L)

  private def run(rows: Seq[(Long, java.sql.Timestamp, Array[Double])],
      cuts: Seq[Int], qn: String): Seq[(Long, Int, Long, Long, Boolean)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Array[Double])]
    val query = StreamingCoreset.admissions(
        input.toDS().toDF("vec_id", "ts", "embedding"),
        "embedding", "vec_id", "ts", cents)
      .toDF().select("vecId", "ci", "seen", "kept", "admitted")
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try {
      val bounds = (0 +: cuts :+ rows.size).distinct.sorted
      bounds.sliding(2).foreach { case Seq(a, b) =>
        if (b > a) { input.addData(rows.slice(a, b): _*); query.processAllAvailable() }
      }
      spark.sql(s"SELECT * FROM $qn")
        .as[(Long, Int, Long, Long, Boolean)].collect().toSeq.sortBy(_._3)
    } finally query.stop()
  }

  test("kept tracks ceil(sqrt(seen)) exactly; admissions land at quota steps") {
    // 12 arrivals into cluster 0 (all +x vectors)
    val rows = (1 to 12).map(i => (i.toLong, ts(i), Array(1.0, 0.01 * i)))
    val got = run(rows, Seq(5), "coreset_quota")
    assert(got.size == 12 && got.forall(_._2 == 0))
    got.foreach { case (_, _, seen, kept, _) =>
      assert(kept == math.ceil(math.sqrt(seen.toDouble)).toLong,
        s"kept $kept at seen $seen")
    }
    // first-fit admits exactly where the quota curve steps: n = 1,2,5,10
    assert(got.filter(_._5).map(_._3) == Seq(1L, 2L, 5L, 10L))
  }

  test("micro-batch boundaries do not change decisions; clusters are independent") {
    // interleave two clusters; cluster 1 gets 4 arrivals (admits at 1,2),
    // cluster 0 gets 4 (admits at 1,2)
    val rows = (1 to 8).map { i =>
      val v = if (i % 2 == 0) Array(0.0, 1.0) else Array(1.0, 0.0)
      (i.toLong, ts(i), v)
    }
    val a = run(rows, Seq(), "coreset_one")
    val b = run(rows, (1 until rows.size), "coreset_rowwise")
    assert(a.toSet == b.toSet, "one-row micro-batches must agree")
    val byCluster = a.groupBy(_._2)
    assert(byCluster.keySet == Set(0, 1))
    byCluster.values.foreach { evs =>
      assert(evs.map(_._3).sorted == Seq(1L, 2L, 3L, 4L),
        "each cluster counts its own arrivals")
      assert(evs.filter(_._5).map(_._3).sorted == Seq(1L, 2L))
    }
  }
}
