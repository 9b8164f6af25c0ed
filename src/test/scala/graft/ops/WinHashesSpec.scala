package graft.ops

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused sliding-window hash kernel (graft.expr.WinKernel via
  * `graft_win_hashes`, a PRIMITIVE long array — element k is the window
  * at 1-based start k+1) pinned element-for-element against the ORIGINAL
  * per-position expression-tree formulation (`transform(sequence(1,
  * len−w+1), i → h60(substr(i, w)))`) — the CdcKernelSpec discipline
  * applied to the ExactSubstr window relation (q124/q125/q188).
  * Multi-byte UTF-8 is the hazard: positions must count CODE POINTS
  * exactly as SQL substr does. */
class WinHashesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def reference(t: org.apache.spark.sql.Column, w: Int) =
    transform(sequence(lit(1L), length(t) - (w - 1)),
      i => graft.ops.PortableSketch.h60(t.substr(i.cast("int"), lit(w))))

  private def both(texts: Seq[String], w: Int): Seq[(Seq[Long], Seq[Long])] = {
    val s = spark
    import s.implicits._
    graft.expr.GraftFunctions.ensureRegistered(s)
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .where(length(col("text")) >= w) // reference sequence would descend
      .select(col("doc_id"),
        call_function("graft_win_hashes", col("text"), lit(w)).as("fused"),
        reference(col("text"), w).as("ref"))
      .orderBy("doc_id")
      .as[(Long, Seq[Long], Seq[Long])].collect().toSeq
      .map(r => (r._2, r._3))
  }

  test("fused == reference: ascii, CJK, astral, mixed planes, w=40") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running far",
      "的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得就那要下以生会自",
      "😀🚀🌍🎉🔥💡🐍📚🧪🦉" * 6,
      ("mixed 中文 ascii 😀 words é " * 8).trim)
    for (((f, r), i) <- both(texts, 40).zipWithIndex)
      assert(f == r, s"text #$i: fused=${f.take(5)} ref=${r.take(5)}")
  }

  test("fused == reference on 150 random texts at w ∈ {2, 8, 20}") {
    val rng = new scala.util.Random(15)
    val alphabets = Seq(Seq("a", "b"), "abcdefgh".map(_.toString),
      Seq("a", "中", "😀", " "))
    for (w <- Seq(2, 8, 20)) {
      val texts = (1 to 50).map { _ =>
        val a = alphabets(rng.nextInt(alphabets.length))
        (1 to w + rng.nextInt(120)).map(_ => a(rng.nextInt(a.length))).mkString
      }
      for (((f, r), i) <- both(texts, w).zipWithIndex)
        assert(f == r, s"w=$w text #$i: fused=${f.take(5)} ref=${r.take(5)}")
    }
  }

  test("exact-w text yields one window; empty array below w") {
    val out = both(Seq("abcdefgh"), 8)
    assert(out.size == 1 && out.head._1.size == 1)
    assert(out.head._1 == out.head._2)
    val s = spark
    import s.implicits._
    val sub = Seq((0L, "abc")).toDF("doc_id", "text")
      .select(call_function("graft_win_hashes", col("text"), lit(8)).as("f"))
      .as[Seq[Long]].collect()
    assert(sub.head.isEmpty, s"sub-w text must yield []: ${sub.head}")
  }

  test("one-argument call fails with a clear arity error, not an index error") {
    val s = spark
    graft.expr.GraftFunctions.ensureRegistered(s)
    val ex = intercept[Throwable] {
      s.sql("SELECT graft_win_hashes('abcdefgh')").collect()
    }
    val messages = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(m =>
      m.contains("graft_win_hashes") && m.contains("argument")),
      s"expected an arity message naming the function, got: $messages")
  }
}
