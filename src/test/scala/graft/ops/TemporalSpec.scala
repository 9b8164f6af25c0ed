package graft.ops

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("asofJoinPrior: picks most recent prior row, ties include equal ts, no match = null") {
    val probes = Seq(
      ("u1", 100L, "p1"), // after q at 90 and 50 -> q90
      ("u1", 50L, "p2"),  // exactly at q ts 50 -> q50 (tie includes equal)
      ("u1", 10L, "p3"),  // before all quotes -> null
      ("u2", 100L, "p4")  // key with no quotes at all -> null
    ).toDF("k", "ts", "pid")
    val quotes = Seq(
      ("u1", 50L, 500L), ("u1", 90L, 900L), ("u1", 120L, 1200L),
      ("u3", 10L, 30L)
    ).toDF("k", "ts", "qid")
    val got = Temporal.asofJoinPrior(probes, quotes, "k", "ts", "ts",
      rightPick = Seq("qid"), rightTieBreak = "qid")
      .select("pid", "qid").as[(String, Option[Long])].collect().toMap
    assert(got == Map("p1" -> Some(900L), "p2" -> Some(500L), "p3" -> None, "p4" -> None))
  }

  test("asofJoinPrior: equal-timestamp quotes resolve to greatest tie-break") {
    val probes = Seq(("k", 10L, 1L)).toDF("k", "ts", "pid")
    val quotes = Seq(("k", 10L, 7L), ("k", 10L, 3L), ("k", 5L, 99L)).toDF("k", "ts", "qid")
    val got = Temporal.asofJoinPrior(probes, quotes, "k", "ts", "ts", Seq("qid"), "qid")
      .select("qid").as[Long].head()
    assert(got == 7L)
  }

  test("asofJoinNext: picks earliest following row, equal ts matches, min tie-break") {
    val probes = Seq(("k", 50L, "p1"), ("k", 121L, "p2")).toDF("k", "ts", "pid")
    val quotes = Seq(("k", 50L, 7L), ("k", 50L, 3L), ("k", 40L, 99L), ("k", 120L, 1L))
      .toDF("k", "ts", "qid")
    val got = Temporal.asofJoinNext(probes, quotes, "k", "ts", "ts", Seq("qid"), "qid")
      .select("pid", "qid").as[(String, Option[Long])].collect().toMap
    // p1 at 50: quotes at 50 qualify (>=), min tie-break 3 wins; 40 is past
    // p2 at 121: nothing follows -> null
    assert(got == Map("p1" -> Some(3L), "p2" -> None))
  }

  test("asof tolerance drops stale (backward) and far-future (forward) matches") {
    val probes = Seq(("k", 100L, "p")).toDF("k", "ts", "pid")
    val quotes = Seq(("k", 40L, 1L), ("k", 130L, 2L)).toDF("k", "ts", "qid")
    def prior(tol: Long) = Temporal.asofJoinPrior(probes, quotes, "k", "ts", "ts",
      Seq("qid"), "qid", tolerance = tol).select("qid").as[Option[Long]].head()
    def next(tol: Long) = Temporal.asofJoinNext(probes, quotes, "k", "ts", "ts",
      Seq("qid"), "qid", tolerance = tol).select("qid").as[Option[Long]].head()
    assert(prior(60L).contains(1L) && prior(59L).isEmpty) // match is 60 old
    assert(next(30L).contains(2L) && next(29L).isEmpty)   // match is 30 ahead
  }

  test("asofJoinPrior plans one shuffle and no join") {
    val probes = Seq(("k", 10L, 1L)).toDF("k", "ts", "pid")
    val quotes = Seq(("k", 5L, 2L)).toDF("k", "ts", "qid")
    val p = Temporal.asofJoinPrior(probes, quotes, "k", "ts", "ts", Seq("qid"), "qid")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Join"), s"as-of must not plan a join\n$p")
    val exchanges = p.linesIterator.count(l => l.trim.matches("\\(\\d+\\) Exchange.*"))
    assert(exchanges == 1, s"exactly the key shuffle expected, got $exchanges\n$p")
  }

  test("bucketedRangeJoin matches a brute-force interval filter") {
    val events = (0L until 500L).map(i => (i, i * 13L % 997L)).toDF("id", "ts")
    val ivals = Seq((1L, 10L, 80L), (2L, 75L, 200L), (3L, 900L, 996L), (4L, 400L, 400L))
      .toDF("wid", "lo", "hi")
    val got = Temporal.bucketedRangeJoin(events, "ts", ivals, "lo", "hi", bucketWidth = 50L)
      .select("id", "wid").as[(Long, Long)].collect().toSet
    val brute = events.crossJoin(ivals)
      .where(col("ts").between(col("lo"), col("hi")))
      .select("id", "wid").as[(Long, Long)].collect().toSet
    assert(got == brute && got.nonEmpty)
  }

  test("bucketedRangeJoin emits no duplicate matches for multi-bucket intervals") {
    val events = Seq((1L, 100L)).toDF("id", "ts")
    val ivals = Seq((1L, 0L, 1000L)).toDF("wid", "lo", "hi") // spans many buckets
    val n = Temporal.bucketedRangeJoin(events, "ts", ivals, "lo", "hi", 10L).count()
    assert(n == 1L)
  }

  test("bucketedRangeJoin handles negative timestamps (true floor buckets)") {
    // -5 lies in [-10, -1]; truncate-toward-zero bucketing would put -5 in
    // bucket 0 while the interval explodes to buckets [-1, 0] — a miss
    val events = Seq((1L, -5L), (2L, -50L), (3L, 5L)).toDF("id", "ts")
    val ivals = Seq((1L, -10L, -1L), (2L, -60L, 12L)).toDF("wid", "lo", "hi")
    val got = Temporal.bucketedRangeJoin(events, "ts", ivals, "lo", "hi", 50L)
      .select("id", "wid").as[(Long, Long)].collect().toSet
    val brute = events.crossJoin(ivals)
      .where(col("ts").between(col("lo"), col("hi")))
      .select("id", "wid").as[(Long, Long)].collect().toSet
    assert(got == brute && got((1L, 1L)))
  }

  test("bucketedRangeJoin rejects colliding column names") {
    val events = Seq((1L, 100L)).toDF("id", "ts")
    val ivals = Seq((1L, 0L, 1000L)).toDF("id", "lo", "hi") // shares "id"
    val e = intercept[IllegalArgumentException] {
      Temporal.bucketedRangeJoin(events, "ts", ivals, "lo", "hi", 10L)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("sessionize: gap splits, within-gap rows share a session, per-key numbering") {
    val rows = Seq(
      ("a", 0L, 1L), ("a", 100L, 2L), ("a", 150L, 3L), // session 1
      ("a", 1000L, 4L),                                 // session 2 (gap 850 > 500)
      ("b", 40L, 5L), ("b", 541L, 6L)                   // b: gap 501 > 500 → two sessions
    ).toDF("k", "ts", "id")
    val got = Temporal.sessionize(rows, "k", "ts", "id", gap = 500L)
      .select("id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L, 6L -> 2L))
  }

  test("sessionize: a gap of exactly the threshold stays in-session") {
    val rows = Seq(("k", 0L, 1L), ("k", 500L, 2L)).toDF("k", "ts", "id")
    val seqs = Temporal.sessionize(rows, "k", "ts", "id", gap = 500L)
      .select("session_seq").as[Long].collect().toSet
    assert(seqs == Set(1L))
  }
}
