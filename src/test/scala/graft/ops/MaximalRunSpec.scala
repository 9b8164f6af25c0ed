package graft.ops

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[TextOps.maximalDupRuns]] against a plain-Scala diagonal-walk reference
  * (the suffix-array result computed the obvious O(n²) way): for every
  * ordered occurrence pair and every diagonal, the maximal equal stretches
  * of length ≥ w + stride − 1, with exact 1-based inclusive boundaries.
  * The reference shares none of the Spark plumbing — no hashing, no
  * banding, no window functions — so a divergence indicts the
  * seed/cluster/extend mechanics, not the definition.
  *
  * Fixtures stay in the BMP (char index == code-point index), matching
  * the Spark/DuckDB substr discipline q124 established. */
class MaximalRunSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  /** All maximal duplicated runs of length ≥ w + stride − 1. Orientation
    * matches the op: id_a < id_b, or id_a == id_b with a_s < b_s (diag
    * < 0). Tuple: (id_a, id_b, a_s, a_e, b_s, b_e, run_len), 1-based
    * inclusive. */
  private def refRuns(docs: Seq[(Long, String)], w: Int, stride: Int)
      : Set[(Long, Long, Long, Long, Long, Long, Long)] = {
    val minRun = w + stride - 1
    val out = scala.collection.mutable.Set
      .empty[(Long, Long, Long, Long, Long, Long, Long)]
    for ((ida, ta) <- docs; (idb, tb) <- docs
        if ida < idb || (ida == idb)) {
      val (la, lb) = (ta.length, tb.length)
      // diag d = posA − posB (1-based); same-doc pairs only d ≤ −1
      val dMin = 1 - lb
      val dMax = if (ida == idb) -1 else la - 1
      for (d <- dMin to dMax) {
        var i = math.max(1, 1 + d) // smallest valid posA on this diagonal
        val iEnd = math.min(la, lb + d)
        while (i <= iEnd) {
          if (ta.charAt(i - 1) == tb.charAt(i - d - 1)) {
            val s = i
            while (i <= iEnd && ta.charAt(i - 1) == tb.charAt(i - d - 1))
              i += 1
            val e = i - 1
            val len = e - s + 1
            if (len >= minRun)
              out += ((ida, idb, s.toLong, e.toLong,
                (s - d).toLong, (e - d).toLong, len.toLong))
          } else i += 1
        }
      }
    }
    out.toSet
  }

  private def opRuns(docs: Seq[(Long, String)], w: Int, stride: Int)
      : Set[(Long, Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val got = TextOps.maximalDupRuns(df, "text", "doc_id", w, stride)
      .select("id_a", "id_b", "a_s", "a_e", "b_s", "b_e", "run_len")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    spark.sharedState.cacheManager.clearCache()
    got
  }

  // unique filler so only PLANTED runs can match: per-doc distinct token
  // streams (doc 1 speaks a1 a2 …, doc 2 b1 b2 …)
  private def filler(tag: Char, n: Int): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("planted run at misaligned offsets: exact boundaries, threshold " +
      "exact at minRun, absent at minRun − 1 (w=40, stride=8)") {
    val run47 = "SHARED-RUN-" + ("z" * 36) // 47 chars
    assert(run47.length == 47)
    val run46 = run47.dropRight(1)
    // pads of different lengths put the copies on awkward alignments;
    // DISTINCT boundary chars (!? vs #%) pin the maximal run to exactly
    // the planted block — a shared flanking space would extend it
    val docs47 = Seq(
      1L -> (filler('a', 3) + "!" + run47 + "?" + filler('c', 6)),
      2L -> ("xx#" + run47 + "%" + filler('d', 6)))
    val got47 = opRuns(docs47, 40, 8)
    val want47 = refRuns(docs47, 40, 8)
    assert(want47.nonEmpty, "fixture self-check: the 47-run must exist")
    assert(got47 == want47, s"got $got47\nwant $want47")
    assert(got47.forall(_._7 == 47), s"planted length must be exact: $got47")
    val docs46 = Seq(
      1L -> (filler('a', 3) + "!" + run46 + "?" + filler('c', 6)),
      2L -> ("xx#" + run46 + "%" + filler('d', 6)))
    assert(opRuns(docs46, 40, 8).isEmpty &&
      refRuns(docs46, 40, 8).isEmpty, "46 < minRun must be invisible")
  }

  test("two runs on one diagonal separated by a short gap stay TWO exact " +
      "runs; self-repetition within a doc is reported") {
    val blockA = "FIRST-BLOCK-" + ("p" * 40)  // 52 chars
    val blockB = "SECOND-BLCK-" + ("q" * 40)  // 52 chars
    // same diagonal: doc 2 carries both blocks at the same offsets with a
    // 3-char mismatch between (XYZ vs xyz)
    val docs = Seq(
      1L -> (blockA + "XYZ" + blockB),
      2L -> (blockA + "xyz" + blockB))
    val got = opRuns(docs, 40, 8)
    val want = refRuns(docs, 40, 8)
    assert(want.size == 2, s"fixture self-check: want two runs, $want")
    assert(got == want, s"got $got\nwant $want")
    // self-repetition: one doc, the run twice
    val self = Seq(3L -> (blockA + " middle words here " + blockA))
    val gotSelf = opRuns(self, 40, 8)
    val wantSelf = refRuns(self, 40, 8)
    assert(wantSelf.nonEmpty && gotSelf == wantSelf,
      s"got $gotSelf\nwant $wantSelf")
    assert(gotSelf.forall(r => r._1 == 3L && r._2 == 3L && r._3 < r._5))
  }

  test("stride=1 degenerates cleanly (no extension, minRun = w)") {
    val run = "EXACT-" + ("r" * 34) // 40 chars
    val docs = Seq(
      1L -> (filler('a', 4) + " " + run),
      2L -> (run + " " + filler('b', 4)))
    val got = opRuns(docs, 40, 1)
    val want = refRuns(docs, 40, 1)
    assert(want.nonEmpty && got == want, s"got $got\nwant $want")
  }

  test("randomized differential: 20 random small-alphabet corpora match " +
      "the plain-Scala reference exactly (w=8, stride=3)") {
    // a 3-letter alphabet makes natural runs, overlaps, periodic repeats
    // and same-diagonal gap structure all common — the hostile regime for
    // seed/cluster/extend bookkeeping
    val rnd = new scala.util.Random(188)
    (1 to 20).foreach { trial =>
      val nDocs = 2 + rnd.nextInt(4)
      val docs = (1 to nDocs).map { id =>
        val len = rnd.nextInt(120)
        id.toLong -> (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      val got = opRuns(docs, 8, 3)
      val want = refRuns(docs, 8, 3)
      assert(got == want,
        s"trial $trial diverged\ndocs=$docs\ngot ${got.toSeq.sorted}\n" +
          s"want ${want.toSeq.sorted}")
    }
  }
}
