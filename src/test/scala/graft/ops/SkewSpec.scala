package graft.ops

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("saltedJoin equals the plain join (multiset), spreading the hot key") {
    // 90% of the fact rows share one key — the canonical power-law shape
    val fact = (0 until 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong)
    }.toDF("key", "v")
    val dim = (Seq("hot") ++ (0 until 7).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, s"attr$i") }.toDF("key", "attr")

    def counted(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("key", "v", "attr").count().as[(String, Long, String, Long)]
        .collect().toSet

    val plain = fact.join(dim, Seq("key"))
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 8)
    assert(counted(salted) == counted(plain))

    // the salt actually spreads the hot key across distinct shuffle keys
    val saltSpread = fact
      .withColumn("_salt", pmod(xxhash64(struct(fact.columns.map(col).toIndexedSeq: _*)), lit(8)))
      .where($"key" === "hot").select("_salt").distinct().count()
    assert(saltSpread > 1, "hot-key rows must land on multiple salts")
  }

  test("saltedJoin preserves left-outer semantics for unmatched keys") {
    val fact = Seq(("a", 1L), ("missing", 2L)).toDF("key", "v")
    val dim = Seq(("a", "x")).toDF("key", "attr")
    val got = Skew.saltedJoin(fact, dim, "key", salts = 4, joinType = "left_outer")
      .as[(String, Long, Option[String])].collect().toSet
    assert(got == Set(("a", 1L, Some("x")), ("missing", 2L, None)))
  }

  test("saltedJoin rejects right-preserving join types (replicated side)") {
    val fact = Seq(("a", 1L)).toDF("key", "v")
    val dim = Seq(("a", "x"), ("b", "y")).toDF("key", "attr")
    // an unmatched right row would surface once per salt — refuse up front
    for (jt <- Seq("right_outer", "rightouter", "full_outer", "full", "outer")) {
      val e = intercept[IllegalArgumentException] {
        Skew.saltedJoin(fact, dim, "key", salts = 4, joinType = jt)
      }
      assert(e.getMessage.contains("left-preserving"), jt)
    }
    // the accepted spellings still work
    for (jt <- Seq("inner", "left", "left_outer", "leftouter", "left_semi", "semi", "left_anti", "anti"))
      Skew.saltedJoin(fact, dim, "key", salts = 4, joinType = jt).collect()
  }

  test("quotaPerKeyAgg selects exactly the window variant's rows under a hot key") {
    // 90% of rows behind one key (the power-law crawl shape), plus a group
    // smaller than the quota and a null-key group — order key unique per key
    val rows = (0 until 3000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 50}" else "hot"
      (k, i.toLong, s"payload$i")
    } ++ Seq(("tiny", 9001L, "t1"), ("tiny", 9000L, "t2"),
      (null.asInstanceOf[String], 5L, "n1"), (null.asInstanceOf[String], 4L, "n2"))
    val df = rows.toDF("key", "ord", "payload")

    def asSet(d: org.apache.spark.sql.DataFrame) =
      d.as[(String, Long, String)].collect().toSet

    for (q <- Seq(1, 7, 20)) {
      val win = asSet(Sampling.quotaPerKey(df, "key", "ord", q))
      val agg = asSet(Sampling.quotaPerKeyAgg(df, "key", "ord", q))
      assert(agg == win, s"quota=$q")
    }
    // quota larger than every group: identity (all rows kept)
    assert(asSet(Sampling.quotaPerKeyAgg(df, "key", "ord", 5000)) == rows.toSet)
  }

  test("quotaPerKeyAgg plans without a Window and with partial aggregation") {
    val df = (0 until 100).map(i => ("k", i.toLong)).toDF("key", "ord")
    val plan = Sampling.quotaPerKeyAgg(df, "key", "ord", 5)
      .queryExecution.executedPlan.toString
    // the whole point: no per-key ranking stage — the hot key never sorts
    // in one task; the threshold comes from a mergeable bounded-state agg
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_bottomkaggregator") ||
      plan.toLowerCase.contains("partial"), plan)
  }
}
