package graft.ops

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Edit-distance record linkage (Dedup.editNearDups, q142): the bounded
  * levenshtein verify against a plain-Scala DP reference, the sampled-gram
  * blocking contract (including the honest miss a blocking scheme owns),
  * the star-cap path, and the integer sim_bp arithmetic. */
class EditLinkageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** Textbook O(n·m) Levenshtein. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def wordGrams(s: String, n: Int = 3): Set[String] = {
    val t = s.split("\\s+").filter(_.nonEmpty).toSeq
    if (t.isEmpty) Set.empty
    else if (t.length < n) Set(t.mkString(" "))
    else t.sliding(n).map(_.mkString(" ")).toSet
  }

  /** Plain-Scala replay: candidates share ≥1 gram with h60 ≡ 0 (mod m);
    * keep pairs with lev·5 ≤ max(len). */
  private def ref(docs: Seq[(Long, String)], sampleMod: Int): Set[(Long, Long, Long, Long)] = {
    val grams = docs.map { case (id, t) =>
      id -> wordGrams(t).filter(g => graft.TestRefs.h60(g) % sampleMod == 0)
    }.toMap
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      if (grams(ia) & grams(ib)).nonEmpty
      l = lev(ta, tb); ml = math.max(ta.length, tb.length)
      if l * 5 <= ml
    } yield (ia, ib, l.toLong, 10000L - l.toLong * 10000L / ml)).toSet
  }

  private def run(docs: Seq[(Long, String)], sampleMod: Int,
      maxBucket: Int = 1024): Set[(Long, Long, Long, Long)] = {
    val out = Dedup.editNearDups(docs.toDF("doc_id", "text"), "text", "doc_id",
      sampleMod = sampleMod, maxBucket = maxBucket)
      .as[(Long, Long, Long, Long)].collect().toSet
    spark.sharedState.cacheManager.clearCache()
    out
  }

  test("one-word edit links; unrelated text does not; sim_bp is exact") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "alpha beta gamma delta epsilon zeta eta theta iota kappZ" // 1 edit
    val c = "one two three four five six seven eight nine ten"
    val docs = Seq((1L, a), (2L, b), (3L, c))
    val got = run(docs, sampleMod = 1)
    val ml = math.max(a.length, b.length).toLong
    assert(got == Set((1L, 2L, 1L, 10000L - 10000L / ml)))
    assert(got == ref(docs, 1))
  }

  test("honest blocking miss: every-3rd-word edits kill all shared 3-grams") {
    // 12 tokens; tokens 3,6,9,12 changed by one char — every 3-token window
    // covers a changed token, so NO gram survives and the pair is never a
    // candidate, though lev=4 qualifies at these lengths (the miss the
    // blocking scheme owns; q98's recall-audit analogue for edit linkage)
    val base = "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk llll"
    val tweaked = "aaaa bbbb cccX dddd eeee fffX gggg hhhh iiiX jjjj kkkk lllX"
    val docs = Seq((1L, base), (2L, tweaked))
    assert(lev(base, tweaked) * 5 <= base.length)
    assert(run(docs, sampleMod = 1) == Set.empty)
    assert(ref(docs, 1) == Set.empty)
  }

  test("star cap: a hot bucket pairs every member with its min-id representative") {
    // four mutual near-dups differing only in the LAST word: every SHARED
    // gram lies in the common prefix, so every shared bucket holds all 4
    // docs and maxBucket=1 stars them all on doc 1 — transitive pairs like
    // (2,3) survive only through the representative.
    val docs = Seq(
      (1L, "x y z aaaa bbbb cccc dddd eee1"),
      (2L, "x y z aaaa bbbb cccc dddd eee2"),
      (3L, "x y z aaaa bbbb cccc dddd eee3"),
      (4L, "x y z aaaa bbbb cccc dddd eee4"))
    val full = run(docs, sampleMod = 1)
    val starred = run(docs, sampleMod = 1, maxBucket = 1)
    assert(full.map(t => (t._1, t._2)) ==
      Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(starred.subsetOf(full))
    assert(starred.map(t => (t._1, t._2)) == Set((1L, 2L), (1L, 3L), (1L, 4L)))
  }

  test("property: 25 random corpora match the plain-Scala replay (sampleMod 1 and 8)") {
    val rnd = new scala.util.Random(20260817L)
    val vocab = Vector("red", "blue", "green", "dog", "cat", "fox", "run",
      "jump", "walk", "fast", "slow", "big")
    for (case_ <- 1 to 25) {
      val nDocs = 2 + rnd.nextInt(8)
      val docs = (0 until nDocs).map { i =>
        val len = 3 + rnd.nextInt(10)
        val words = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).toArray
        // half the docs are a mutation of doc 0 — guarantees near pairs
        if (i > 0 && rnd.nextBoolean() && i % 2 == 0) {
          val base = Seq.fill(len)(vocab(rnd.nextInt(3))).toArray
          base(rnd.nextInt(len)) = vocab(rnd.nextInt(vocab.size))
          (i.toLong, base.mkString(" "))
        } else (i.toLong, words.mkString(" "))
      }
      for (m <- Seq(1, 8)) {
        assert(run(docs, m) == ref(docs, m), s"case $case_ mod=$m docs=$docs")
      }
    }
  }

  test("null and empty text rows never link or throw") {
    val docs = Seq((1L, "aa bb cc dd"), (2L, null), (3L, ""), (4L, "aa bb cc dd"))
    val got = run(docs, sampleMod = 1)
    assert(got.map(t => (t._1, t._2)) == Set((1L, 4L)))
  }
}
