package graft.ops

import graft.pipeline.SparkTestSession
import org.scalacheck.{Gen, Prop, Properties}

/** Invariants of content-defined chunking (TextOps.cdcChunks) over random
  * texts: chunks must TILE the text exactly (lengths sum, order, no gaps),
  * boundaries must be deterministic and purely content-local (a prefix
  * edit leaves the suffix chunking identical once re-synchronized), and
  * the greedy rule must respect the minimum length everywhere but the
  * tail. A plain-Scala replay of the boundary rule is the test oracle. */
class CdcPropertySpec extends Properties("cdcChunks") {
  private lazy val spark = SparkTestSession.get

  // each trial is a small Spark job (toDF + collect); 30 trials per
  // property keeps the suite's time budget while still sweeping sizes
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val genText: Gen[String] = for {
    n <- Gen.choose(0, 60)
    ws <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.alphaLowerChar)
    } yield cs.mkString)
  } yield ws.mkString(" ")

  private def chunksOf(texts: Seq[String]): Map[Long, Seq[(Long, Long, Long)]] = {
    val s = spark
    import s.implicits._
    TextOps.cdcChunks(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        "text", Seq("doc_id"))
      .select("doc_id", "chunk_idx", "chunk_len", "_h")
      .as[(Long, Long, Long, Long)].collect().toSeq
      .groupBy(_._1)
      .map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(r => (r._2, r._3, r._4))
      }
  }

  /** Plain-Scala replay of the boundary rule (the h60 window test + the
    * greedy min-length fold) — the same math, none of the Spark plumbing. */
  private def referenceEnds(t: String): Seq[Int] = {
    val cands = (TextOps.CdcW to t.length).filter { i =>
      PortableSketch.h60String(
        t.substring(i - TextOps.CdcW, i)) % TextOps.CdcMask == 0
    }
    val bs = cands.foldLeft(List(0)) { (acc, x) =>
      if (x - acc.head >= TextOps.CdcMinLen) x :: acc else acc
    }.reverse.tail
    if (t.length > bs.lastOption.getOrElse(0)) bs :+ t.length else bs
  }

  property("chunks tile the text exactly and match the plain-Scala replay") =
    Prop.forAll(Gen.listOfN(4, genText)) { texts =>
      val got = chunksOf(texts)
      texts.zipWithIndex.forall { case (t, i) =>
        val ends = referenceEnds(t)
        val ch = got.getOrElse(i.toLong, Seq.empty)
        val lens = ends.zip(0 +: ends).map { case (e, s) => (e - s).toLong }
        ch.map(_._2) == lens &&
          ch.map(_._1) == ch.indices.map(_.toLong) &&
          ch.map(_._2).sum == t.length.toLong
      }
    }

  property("every chunk except the tail respects the minimum length") =
    Prop.forAll(genText) { t =>
      val ch = chunksOf(Seq(t)).getOrElse(0L, Seq.empty)
      ch.dropRight(1).forall(_._2 >= TextOps.CdcMinLen)
    }

  property("the re-sync theorem: once both greedy folds accept the SAME " +
      "content position, every later chunk coincides exactly") =
    Prop.forAll(genText, genText) { (prefix0, base) =>
      // the greedy fold's whole state is "last accepted boundary", and
      // candidates downstream of the seam are content-identical (just
      // offset by the prefix), so from the first SHARED accepted position
      // onward the folds are literally the same computation. (Whether a
      // shared position exists at all is probabilistic — min-length gating
      // can stay out of phase — so the property conditions on it rather
      // than asserting it.)
      val pfx = prefix0 + " "
      val shift = pfx.length
      val both = chunksOf(Seq(base, pfx + base))
      def endsAndHashes(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long)] = {
        val ends = rows.map(_._2).scanLeft(0L)(_ + _).tail
        ends.zip(rows.map(_._3))
      }
      val a = endsAndHashes(both.getOrElse(0L, Seq.empty))
        .map { case (e, h) => (e + shift, h) } // base coords -> prefixed coords
      val b = endsAndHashes(both.getOrElse(1L, Seq.empty))
      val sharedEnds = a.map(_._1).toSet intersect b.map(_._1).toSet
      sharedEnds.isEmpty || {
        val p = sharedEnds.min
        a.filter(_._1 > p) == b.filter(_._1 > p)
      }
    }
}
