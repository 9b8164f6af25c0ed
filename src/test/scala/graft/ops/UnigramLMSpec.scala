package graft.ops

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnigramLMSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("viterbi: picks the cheapest segmentation; ties prefer the longer piece") {
    val pieces = Map("a" -> 10L, "b" -> 10L, "ab" -> 25L, "abb" -> 19L)
    // "ab": single pieces cost 20, "ab" costs 25 → split wins
    assert(UnigramLM.viterbi("ab", pieces) == Seq("a", "b"))
    // "abb": piece cost 19 < a+b+b = 30 and < ab+b = 35 → whole piece
    assert(UnigramLM.viterbi("abb", pieces) == Seq("abb"))
    // exact tie: "ab"(25) vs "a"+"b"(10+15): craft costs so paths tie
    val tie = Map("a" -> 10L, "b" -> 15L, "ab" -> 25L)
    assert(UnigramLM.viterbi("ab", tie) == Seq("ab"),
      "equal-cost paths must resolve to the longer final piece " +
        "(the ·16+(Lmax−k) encoding the oracle replays)")
  }

  test("viterbi: unsegmentable input fails loudly; empty word is empty") {
    assert(UnigramLM.viterbi("", Map("a" -> 1L)).isEmpty)
    intercept[IllegalArgumentException] {
      UnigramLM.viterbi("ax", Map("a" -> 1L))
    }
  }

  test("fit: segmentations always concatenate back to their words, and a " +
      "dominant repeated word becomes a single piece") {
    // "tok" appears overwhelmingly often → after EM it should be one piece
    val tf = Seq(("tok", 500L), ("tax", 3L), ("kot", 2L)).toDF("w", "c")
    val (model, seg) = UnigramLM.fit(tf)
    val rows = seg.select("w", "pieces").as[(String, Seq[String])].collect()
    rows.foreach { case (w, ps) =>
      assert(ps.mkString("") == w, s"pieces of $w must cover it exactly")
    }
    assert(rows.toMap.apply("tok") == Seq("tok"),
      s"the dominant word must collapse to one piece; model=$model")
    spark.sharedState.cacheManager.clearCache()
  }

  test("fit: rejects a vocabulary word longer than the oracle's DP unroll") {
    val tf = Seq(("a" * (UnigramLM.MaxWordLen + 1), 1L)).toDF("w", "c")
    intercept[IllegalArgumentException] { UnigramLM.fit(tf) }
  }
}
