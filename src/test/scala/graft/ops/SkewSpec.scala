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
}
