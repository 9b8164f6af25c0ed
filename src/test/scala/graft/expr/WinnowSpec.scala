package graft.expr

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WinnowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val n = 5
  private val w = 4

  /** Independent formulation: window hashes via the Catalyst expression
    * tree (xxhash64 over substrings — bit-equal to the kernel's byte
    * windows on ASCII), winnowing replayed brutally in Scala. */
  private def bruteWinnow(text: String): Seq[Long] = {
    val t = text.toLowerCase
    val hs = Seq(t).toDF("t").select(
      transform(
        sequence(lit(1), greatest(length(col("t")) - (n - 1), lit(1))),
        i => xxhash64(col("t").substr(i, lit(n))))
        .as("hs")).as[Seq[Long]].head()
    val win = math.max(w, 1)
    (0 to math.max(hs.length - win, 0))
      .map(i => hs.slice(i, math.min(i + win, hs.length)).min)
      .distinct.sorted
  }

  test("kernel equals the brute-force per-window-min formulation") {
    val rnd = new scala.util.Random(17)
    val texts = (0 until 30).map { _ =>
      val len = 1 + rnd.nextInt(120)
      (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString // tiny alphabet: forces hash ties
    } :+ "" :+ "ab" :+ "aaaaaaaaaaaaaaaa"
    texts.foreach { t =>
      val got = Seq(t).toDF("text")
        .select(GraftFunctions.winnow(col("text"), n, w).as("fp"))
        .as[Seq[Long]].head()
      assert(got == bruteWinnow(t), s"mismatch for ${t.take(40)}")
    }
  }

  test("guarantee: sharing a substring of length >= w+n-1 shares a fingerprint") {
    val rnd = new scala.util.Random(23)
    def noise(len: Int) = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val common = "the quick brown fox jumps over" // length 30 >= w+n-1 = 8
    (0 until 20).foreach { _ =>
      val d1 = noise(50) + common + noise(50)
      val d2 = noise(80) + common + noise(20)
      val fps = Seq(d1, d2).toDF("text")
        .select(GraftFunctions.winnow(col("text"), n, w).as("fp"))
        .as[Seq[Long]].collect()
      assert(fps(0).toSet.intersect(fps(1).toSet).nonEmpty,
        "planted common substring must share a winnow fingerprint")
    }
  }

  test("short and empty texts yield exactly one fingerprint") {
    val got = Seq("", "ab", "abcd").toDF("text")
      .select(size(GraftFunctions.winnow(col("text"), n, w)).as("m"))
      .as[Int].collect().toSeq
    assert(got == Seq(1, 1, 1))
  }
}
