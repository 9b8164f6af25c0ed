package graft.expr

import graft.ops.{Dedup, TextOps}
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused codegen kernels must agree exactly with the built-in-function
  * formulations on ASCII text (same bytes → same xxhash64 values), and be
  * callable from SQL via the registered functions. */
class TextHashExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "spark catalyst whole stage codegen",
    "aaaaa", "abc", "", "repeated repeated repeated repeated")

  test("fused word bigrams equal the HOF formulation; strict under two tokens") {
    GraftFunctions.ensureRegistered(spark)
    val cases = texts ++ Seq(
      "  leading and   multiple   spaces\ttabs\nnewlines  ",
      "one", "two words", "丸 山 unicode  テスト")
    val df = cases.toDF("text")
    val ts = TextOps.tokens(col("text"))
    val hof = when(size(ts) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(ts) - 1),
        i => concat_ws(" ", element_at(ts, i), element_at(ts, i + 1))))
    val both = df.select(hof.as("h"), GraftFunctions.wordBigrams(col("text")).as("f"))
      .as[(Seq[String], Seq[String])].collect()
    both.foreach { case (h, f) => assert(h == f, s"hof=$h fused=$f") }
    // null text null-propagates like every unary kernel
    val n = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(GraftFunctions.wordBigrams(col("text"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("fused word n-grams equal wordShingles exactly (incl. fallback, distinct order, unicode)") {
    GraftFunctions.ensureRegistered(spark)
    val cases = texts ++ Seq(
      "  leading and   multiple   spaces\ttabs\nnewlines  ",
      "one", "two words", "a b", "a b c", "a b c d",
      "dup gram dup gram dup gram", // distinct must keep first occurrence
      "丸 山 unicode  テスト", "   ", "\t\n")
    val rnd = new scala.util.Random(7)
    val alphabet = "ab … xyzXYZ09.,!丸テ \t\n  "
    val fuzz = Seq.fill(200)(
      Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    for (n <- Seq(1, 2, 3, 5)) {
      val both = (cases ++ fuzz).toDF("text").select(
        TextOps.wordShingles(col("text"), n).as("hof"),
        GraftFunctions.wordNGrams(col("text"), n).as("fused"))
        .as[(Seq[String], Seq[String])].collect()
      both.foreach { case (h, f) => assert(h == f, s"n=$n hof=$h fused=$f") }
    }
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(GraftFunctions.wordNGrams(col("text"), 3)).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("fused fingerprint64 equals builtin formulation on ASCII") {
    val df = texts.toDF("text")
    val both = df.select(
      TextOps.fingerprint64(col("text"), 8).as("builtin"),
      GraftFunctions.fingerprint64(col("text"), 8).as("fused"))
      .as[(Long, Long)].collect()
    both.foreach { case (b, f) => assert(b == f) }
  }

  test("fused simhash equals builtin formulation on ASCII") {
    val df = texts.toDF("text")
    val both = df.select(
      Dedup.simhashBuiltin(col("text"), 5).as("builtin"),
      Dedup.simhash(col("text"), 5).as("fused"))
      .as[(Long, Long)].collect()
    both.foreach { case (b, f) => assert(b == f) }
  }

  test("fused minhash matches the UDF fold over builtin shingle hashes") {
    val df = texts.filter(_.nonEmpty).toDF("text")
    // reconstruct the UDF-fold result: same family, same shingle hashes
    val fam = TextHash.family(16, 42L)
    val expected = df.select(
      array_distinct(transform(TextOps.charShingles(col("text"), 5), s => xxhash64(s))).as("hs"))
      .as[Seq[Long]].collect()
      .map { hs =>
        val sig = Array.fill(16)(Long.MaxValue)
        hs.foreach { h =>
          var i = 0
          while (i < 16) {
            val v = h * fam(2 * i) + fam(2 * i + 1)
            if (v < sig(i)) sig(i) = v
            i += 1
          }
        }
        sig.toSeq
      }
    val fused = df.select(GraftFunctions.minhash(col("text"), 5, 16, 42L).as("sig"))
      .as[Seq[Long]].collect()
    expected.zip(fused).foreach { case (e, f) => assert(e == f) }
  }

  test("fused word-gram minhash is bit-equal to the UDF fold, all edge shapes") {
    // edge shapes: multi-space / tab / newline separators, leading+trailing
    // whitespace, fewer tokens than n, single token, empty, unicode tokens
    val wordTexts = Seq(
      "the quick  brown\tfox\njumps  over the lazy dog",
      "  leading and trailing   ",
      "one two", "single", "", "   ",
      "répété répété ünïcode tokens here",
      "a b a b a b a b")
    val df = wordTexts.toDF("text")
    val expected = df.select(Dedup.minhashUdfFold(col("text"), 16, 3, 42L).as("sig"))
      .as[Seq[Long]].collect()
    val fused = df.select(GraftFunctions.wordMinhash(col("text"), 3, 16, 42L).as("sig"))
      .as[Seq[Long]].collect()
    expected.zip(fused).foreach { case (e, f) => assert(e == f) }
  }

  test("functions usable from raw SQL") {
    spark.range(1).createOrReplaceTempView("one")
    val r = spark.sql(
      "SELECT graft_fingerprint64('hello world text', 8) AS fp, " +
        "graft_simhash('hello world text', 5) AS sh, " +
        "size(graft_minhash('hello world text', 5, 32, 42)) AS k")
      .as[(Long, Long, Int)].head()
    assert(r._3 == 32)
  }

  test("null text yields null, not a crash") {
    val r = Seq[Option[String]](None, Some("x")).toDF("text")
      .select(GraftFunctions.fingerprint64(col("text"), 8).as("fp"))
      .collect()
    assert(r(0).isNullAt(0) && !r(1).isNullAt(0))
  }
}
