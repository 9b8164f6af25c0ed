package graft.ops

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LangIdSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("charGrams: multiplicity kept, short text collapses to one gram") {
    val got = Seq("ABAB", "ab", "").toDF("t")
      .select(LangId.charGrams(col("t"), 3)).as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("aba", "bab"), Seq("ab"), Seq("")))
  }

  test("fit + predict: distinctive char patterns classify a held-out doc; " +
      "OOV grams fall to the per-language floor") {
    val train = Seq(
      ("xx", "aaa bbb aaa"), ("xx", "aab baa aaa"),
      ("yy", "zzz yyy zzz"), ("yy", "zzy yzz zzz")
    ).toDF("lang", "text")
    val (model, stats) = LangId.fit(train, "text", "lang", n = 3)
    val test = Seq(
      (1L, "aaa aab"),     // xx-shaped
      (2L, "zzz yzz"),     // yy-shaped
      (3L, "qqq qqq qqq")  // all OOV → priors + OOV floors decide, total order
    ).toDF("doc_id", "text")
    val got = LangId.predict(test, "text", "doc_id", n = 3, model, stats)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "xx")
    assert(got(2L) == "yy")
    assert(Set("xx", "yy").contains(got(3L)),
      "an all-OOV doc still gets a deterministic prediction")
    // determinism: re-running fit+predict reproduces the same predictions
    val (m2, s2) = LangId.fit(train, "text", "lang", n = 3)
    val again = LangId.predict(test, "text", "doc_id", n = 3, m2, s2)
      .as[(Long, String)].collect().toMap
    assert(got == again)
    spark.sharedState.cacheManager.clearCache()
  }

  test("prediction key is tie-free: identical scores resolve by language " +
      "index, never arbitrarily") {
    // two languages with IDENTICAL training text → identical likelihoods
    // and priors; the ·8 − lang_idx encoding must pick the alphabetically
    // FIRST language for every doc
    val train = Seq(("aa", "foo bar foo"), ("bb", "foo bar foo"))
      .toDF("lang", "text")
    val (model, stats) = LangId.fit(train, "text", "lang", n = 3)
    val test = Seq((1L, "foo bar"), (2L, "bar foo foo")).toDF("doc_id", "text")
    val got = LangId.predict(test, "text", "doc_id", n = 3, model, stats)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "aa", 2L -> "aa"))
    spark.sharedState.cacheManager.clearCache()
  }
}
