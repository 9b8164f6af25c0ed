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

  test("viterbi: a word past MaxWordLen segments char-wise (the documented " +
      "degrade-not-crash fallback), even when longer pieces exist") {
    val pieces = Map("a" -> 1L, "aaaa" -> 1L)
    val long = "a" * (UnigramLM.MaxWordLen + 1)
    assert(UnigramLM.viterbi(long, pieces) == long.map(_.toString),
      "overlong words must take the char-wise branch the oracle replays")
    // at exactly MaxWordLen the DP still runs and picks the cheap long piece
    val exact = "a" * UnigramLM.MaxWordLen
    assert(UnigramLM.viterbi(exact, pieces).contains("aaaa"))
  }

  test("fit: a planted 40-char word degrades char-wise instead of crashing, " +
      "and the rest of the vocabulary still fits normally") {
    val long = "ab" * 20 // 40 chars, well past MaxWordLen
    val tf = Seq(("tok", 500L), ("tax", 3L), (long, 7L)).toDF("w", "c")
    val (model, seg) = UnigramLM.fit(tf)
    val rows = seg.select("w", "pieces").as[(String, Seq[String])].collect().toMap
    assert(rows(long) == long.map(_.toString),
      "the overlong word must segment char-wise")
    assert(rows("tok") == Seq("tok"),
      s"the dominant short word must still collapse to one piece; model=$model")
    // the fallback's single chars flow into the recounts: 'a'/'b' counts
    // include the overlong word's contribution, so they stay in the model
    assert(model.contains("a") && model.contains("b"))
    spark.sharedState.cacheManager.clearCache()
  }
}
