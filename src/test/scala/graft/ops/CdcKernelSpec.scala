package graft.ops

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused CDC boundary kernel (graft.expr.CdcKernel via
  * `graft_cdc_ends`) pinned element-for-element against the ORIGINAL
  * per-position expression-tree formulation (TextOps.cdcEndsReference —
  * sequence → h60 transform → filter → greedy fold → tail close) on
  * adversarial corpora: multi-byte UTF-8 (CJK two/three-byte, astral
  * four-byte — char positions must count CODE POINTS exactly as SQL
  * substr does), empty/short/exact-W texts, boundary-dense small
  * alphabets, and long mixed documents. The PortableSketch
  * fused-vs-reference discipline applied to chunking. */
class CdcKernelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def both(texts: Seq[String]): Seq[(Seq[Int], Seq[Int])] = {
    val s = spark
    import s.implicits._
    graft.expr.GraftFunctions.ensureRegistered(s)
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        call_function("graft_cdc_ends", col("text")).as("fused"),
        TextOps.cdcEndsReference(col("text")).as("ref"))
      .orderBy("doc_id")
      .as[(Long, Seq[Int], Seq[Int])].collect().toSeq
      .map(r => (r._2, r._3))
  }

  test("fused == reference on edge shapes: empty, sub-W, exact-W, " +
      "boundary at the tail") {
    val texts = Seq("", "a", "abcdefg", "abcdefgh", "abcdefghi",
      " " * 40, "x" * 16, "ab" * 64)
    for (((f, r), i) <- both(texts).zipWithIndex)
      assert(f == r, s"text #$i ${texts(i).take(20)}: fused=$f ref=$r")
  }

  test("fused == reference on multi-byte UTF-8 (CJK, astral emoji, " +
      "mixed planes) — char positions count code points") {
    val texts = Seq(
      "的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得就那要下",
      "😀🚀🌍🎉🔥💡🐍📚🧪🦉" * 5,
      "héllo wörld ünïcode " * 12,
      ("mixed 中文 and ascii 😀 words " * 10).trim,
      "é" * 30 + " " + "中" * 30 + " " + "😀" * 20)
    for (((f, r), i) <- both(texts).zipWithIndex)
      assert(f == r, s"unicode text #$i: fused=$f ref=$r")
  }

  test("fused == reference on 200 random texts (small alphabets force " +
      "boundary-dense and boundary-free runs)") {
    val rng = new scala.util.Random(15)
    // alphabets as code-point strings: charAt sampling would split the
    // astral emoji's surrogate pair into lone surrogates
    val alphabets = Seq(Seq("a", "b"), "abcdefgh".map(_.toString),
      Seq("a", "å", "中", "😀", " "), Seq(" ", "\t", "\n", "x", "y"))
    val texts = (1 to 200).map { _ =>
      val a = alphabets(rng.nextInt(alphabets.length))
      val n = rng.nextInt(300)
      (1 to n).map(_ => a(rng.nextInt(a.length))).mkString
    }
    for (((f, r), i) <- both(texts).zipWithIndex)
      assert(f == r, s"random text #$i ${texts(i).take(30)}: fused=$f ref=$r")
  }

  test("chunk ends tile the text: ascending, min-length everywhere but " +
      "the tail, last end == numChars") {
    val rng = new scala.util.Random(16)
    val texts = (1 to 50).map { _ =>
      (1 to rng.nextInt(400)).map(_ => ('a' + rng.nextInt(3)).toChar).mkString }
      .filter(_.nonEmpty)
    for ((f, _) <- both(texts)) {
      assert(f == f.sorted && f.distinct == f, s"not ascending: $f")
      for (Seq(a, b) <- f.sliding(2) if b != f.last)
        assert(b - a >= TextOps.CdcMinLen, s"short non-tail chunk in $f")
    }
  }
}
