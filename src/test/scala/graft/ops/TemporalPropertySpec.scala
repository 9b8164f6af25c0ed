package graft.ops

import graft.pipeline.SparkTestSession
import org.scalacheck.{Gen, Prop, Properties}

/** The as-of join and sessionization against brute-force references over
  * random key/timestamp data — including timestamp collisions, empty sides,
  * and keys present on only one side. */
class TemporalPropertySpec extends Properties("temporal") {
  private lazy val spark = SparkTestSession.get

  // small key and timestamp spaces force collisions
  private val genRows: Gen[Seq[(String, Long, Long)]] = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "c")
      ts <- Gen.choose(0L, 12L)
    } yield (k, ts))
  } yield rows.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }

  property("asofJoinPrior matches the brute-force most-recent-prior pick") =
    Prop.forAll(genRows, genRows) { (probeRows, quoteRows) =>
      val s = spark
      import s.implicits._
      val probes = probeRows.toDF("k", "ts", "pid")
      val quotes = quoteRows.map { case (k, ts, i) => (k, ts, i + 1000L) }.toDF("k", "ts", "qid")
      val got = Temporal.asofJoinPrior(probes, quotes, "k", "ts", "ts",
        rightPick = Seq("qid"), rightTieBreak = "qid")
        .select("pid", "qid").as[(Long, Option[Long])].collect().toMap
      val quoteSeq = quoteRows.map { case (k, ts, i) => (k, ts, i + 1000L) }
      val expect = probeRows.map { case (k, ts, pid) =>
        val eligible = quoteSeq.filter { case (qk, qts, _) => qk == k && qts <= ts }
        pid -> (if (eligible.isEmpty) None
                else Some(eligible.maxBy { case (_, qts, qid) => (qts, qid) }._3))
      }.toMap
      got == expect
    }

  property("asofJoinNext matches the brute-force earliest-following pick") =
    Prop.forAll(genRows, genRows) { (probeRows, quoteRows) =>
      val s = spark
      import s.implicits._
      val probes = probeRows.toDF("k", "ts", "pid")
      val quotes = quoteRows.map { case (k, ts, i) => (k, ts, i + 1000L) }.toDF("k", "ts", "qid")
      val got = Temporal.asofJoinNext(probes, quotes, "k", "ts", "ts",
        rightPick = Seq("qid"), rightTieBreak = "qid")
        .select("pid", "qid").as[(Long, Option[Long])].collect().toMap
      val quoteSeq = quoteRows.map { case (k, ts, i) => (k, ts, i + 1000L) }
      val expect = probeRows.map { case (k, ts, pid) =>
        val eligible = quoteSeq.filter { case (qk, qts, _) => qk == k && qts >= ts }
        pid -> (if (eligible.isEmpty) None
                else Some(eligible.minBy { case (_, qts, qid) => (qts, qid) }._3))
      }.toMap
      got == expect
    }

  private val genIntervals: Gen[Seq[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 15)
    ivs <- Gen.listOfN(n, for {
      lo <- Gen.choose(-150L, 200L) // negatives: floor-div bucketing must hold
      span <- Gen.choose(0L, 120L)
    } yield (lo, lo + span))
  } yield ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }

  property("bucketedRangeJoin equals the brute-force interval filter") =
    Prop.forAll(genIntervals, Gen.choose(1L, 60L)) { (ivs, width) =>
      val s = spark
      import s.implicits._
      import org.apache.spark.sql.functions.col
      val events = (0L until 50L).map(i => (i, i * 7L % 211L - 70L)).toDF("id", "ts")
      val ivals = ivs.toDF("wid", "lo", "hi")
      val got =
        if (ivs.isEmpty) Set.empty[(Long, Long)]
        else Temporal.bucketedRangeJoin(events, "ts", ivals, "lo", "hi", width)
          .select("id", "wid").as[(Long, Long)].collect().toSet
      val brute = (for {
        (id, ts) <- (0L until 50L).map(i => (i, i * 7L % 211L - 70L))
        (wid, lo, hi) <- ivs if ts >= lo && ts <= hi
      } yield (id, wid)).toSet
      got == brute
    }

  property("sessionize assigns the same sessions as a sequential scan") =
    Prop.forAll(genRows, Gen.choose(1L, 6L)) { (rows, gap) =>
      val s = spark
      import s.implicits._
      val df = rows.toDF("k", "ts", "id")
      val got = Temporal.sessionize(df, "k", "ts", "id", gap)
        .select("id", "session_seq").as[(Long, Long)].collect().toMap
      val expect = rows.groupBy(_._1).values.flatMap { ofKey =>
        val ordered = ofKey.sortBy { case (_, ts, id) => (ts, id) }
        var seq = 0L
        var prev = Long.MinValue
        ordered.map { case (_, ts, id) =>
          if (prev == Long.MinValue || ts - prev > gap) seq += 1
          prev = ts
          id -> seq
        }
      }.toMap
      got == expect
    }
}
