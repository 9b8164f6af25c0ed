package graft.ops

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DiffQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged per key") {
    val prev = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "s", "v")
    val next = Seq((2L, "b", 20), (3L, "CHANGED", 30), (4L, "d", 40)).toDF("k", "s", "v")
    val got = Diff.snapshotDiff(prev, next, "k", Seq("s", "v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff treats null column values consistently") {
    val prev = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "s")
    val next = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "s")
    val got = Diff.snapshotDiff(prev, next, "k", Seq("s"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("snapshotDiff equals brute-force classification on random snapshots") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 10) {
      val prev = (0 until 60).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(5), rnd.nextInt(3)))
        .distinctBy(_._1)
      val next = (0 until 60).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(5), rnd.nextInt(3)))
        .distinctBy(_._1)
      val got = Diff.snapshotDiff(
        prev.toDF("k", "a", "b"), next.toDF("k", "a", "b"), "k", Seq("a", "b"))
        .as[(Long, String)].collect().toMap
      val pm = prev.map(r => r._1 -> ((r._2, r._3))).toMap
      val nm = next.map(r => r._1 -> ((r._2, r._3))).toMap
      val brute = (pm.keySet ++ nm.keySet).map { k =>
        k -> ((pm.get(k), nm.get(k)) match {
          case (None, _) => "added"
          case (_, None) => "removed"
          case (Some(p), Some(n)) => if (p == n) "unchanged" else "changed"
        })
      }.toMap
      assert(got == brute, s"trial $trial")
    }
  }

  test("quality report counts violations per rule in one pass") {
    val df = Seq(
      (1L, 1, 5.0, Some("x")),
      (1L, 1, 60.0, Some("y")), // dup key + out-of-range v
      (2L, 1, -1.0, None),      // out-of-range v + null s
      (3L, 2, 7.0, Some("z"))
    ).toDF("k", "sub", "v", "s")
    val got = Quality.check(df, Seq(
      Quality.notNull("s"),
      Quality.inRange("v", 0, 50),
      Quality.unique("k", "sub")))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("not_null(s)") == ((1L, 4L)))
    assert(got("range(v)") == ((2L, 4L)))
    assert(got("unique(k,sub)") == ((1L, 4L)))
  }

  test("quality report: null predicate input counts as a violation") {
    val df = Seq((Some(5.0)), (None), (Some(99.0))).toDF("v")
    val got = Quality.check(df, Seq(Quality.inRange("v", 0, 50)))
      .as[(String, Long, Long)].head()
    assert(got == (("range(v)", 2L, 3L))) // null AND out-of-range both violate
  }

  test("refIntegrity counts orphans, skips null keys, composes with row rules") {
    val child = Seq(
      (Some(1L), "a"), (Some(2L), "b"), (Some(9L), "c"), // 9 is an orphan
      (None, "d"),                                       // null key: NOT a violation
      (Some(9L), "e")                                    // orphans count per ROW
    ).toDF("fk", "payload")
    val parent = Seq((1L, "p"), (2L, "q"), (3L, "r")).toDF("pk", "name")
    val got = Quality.check(child, Seq(
      Quality.notNull("fk"),
      Quality.refIntegrity(Seq("fk"), parent, Seq("pk"))))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("ref(fk)") == ((2L, 5L)))
    assert(got("not_null(fk)") == ((1L, 5L)))
    // empty child: 0 violations / 0 rows, same as every other rule family
    val gotEmpty = Quality.check(child.where(lit(false)),
      Seq(Quality.refIntegrity(Seq("fk"), parent, Seq("pk"))))
      .as[(String, Long, Long)].head()
    assert(gotEmpty == (("ref(fk)", 0L, 0L)))
    // key-arity mismatch fails loudly at construction time, not mid-job
    intercept[IllegalArgumentException] {
      Quality.check(child, Seq(Quality.refIntegrity(Seq("fk"), parent, Seq("pk", "name"))))
    }
  }

  test("quality report on an empty table: every rule reads 0 violations / 0 rows") {
    val df = Seq((1L, Some(5.0))).toDF("k", "v").where(lit(false))
    val got = Quality.check(df, Seq(
      Quality.notNull("v"),
      Quality.inRange("v", 0, 50),
      Quality.unique("k")))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "not_null(v)" -> ((0L, 0L)),
      "range(v)" -> ((0L, 0L)),
      "unique(k)" -> ((0L, 0L))))
  }
}
