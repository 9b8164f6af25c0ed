package graft.operators

import graft.pipeline.SparkTestSession
import org.scalacheck.{Gen, Prop, Properties}

/** The exact-substring family (q124 spans, q125 cut) against plain-Scala
  * brute-force references over RANDOM corpora. The generators draw text as
  * sequences of 10-char blocks from a SMALL pool, so 40-char windows
  * (4 blocks) repeat within and across documents constantly — periodic
  * runs, shifted copies, and boundary-touching spans arise that the fixed
  * testdata and the hand-built fixtures never fully sweep. The reference
  * works on window CONTENT (no hashing): a 60-bit md5 collision inside a
  * ≤ 30-doc corpus is not a realistic event, and the operators' hash
  * family is already pinned cross-engine by the DuckDB oracles. */
class SubstringPropertySpec extends Properties("substr") {
  private lazy val spark = SparkTestSession.get

  private val W = 40
  private val Blocks = Vector("AAAAAAAAAA", "BBBBBBBBBB", "CCCCCCCCCC",
    "0123456789", "abcdefghij")

  private val genCorpus: Gen[Seq[(Long, String, String)]] = for {
    n <- Gen.choose(1, 10)
    rows <- Gen.listOfN(n, for {
      len <- Gen.frequency(1 -> Gen.choose(0, 3), 5 -> Gen.choose(4, 12))
      blocks <- Gen.listOfN(len, Gen.oneOf(Blocks.indices))
      lang <- Gen.oneOf("en", "fr")
    } yield (blocks.map(Blocks).mkString, lang))
  } yield rows.zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) }

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("substr-prop").toString
    rows.map { case (id, t, l) => (id, t, l, "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** (doc, pos0) -> window content, 0-based pos. */
  private def windows(rows: Seq[(Long, String, String)]): Seq[(Long, Int, String)] =
    for {
      (id, t, _) <- rows; if t.length >= W
      p <- 0 to t.length - W
    } yield (id, p, t.substring(p, p + W))

  /** Merge 0-based duplicated positions into [start, endExcl) spans. */
  private def spans(ps: Seq[Int]): Seq[(Int, Int)] =
    ps.sorted.foldLeft(Vector.empty[(Int, Int)]) { case (acc, p) =>
      acc.lastOption match {
        case Some((s, e)) if p <= e => acc.init :+ (s, p + W)
        case _ => acc :+ (p, p + W)
      }
    }

  property("q124 span report matches the brute-force reference") =
    Prop.forAll(genCorpus) { rows =>
      val s = spark
      import s.implicits._
      val got = CurationQueries.substringDupSpans(spark, docsDir(rows))
        .as[(String, Long, Long, Double, Long, Long, Long)].collect().toSeq
      val ws = windows(rows)
      val counts = ws.groupBy(_._3).view.mapValues(_.size).toMap
      val perDoc = rows.map { case (id, t, _) =>
        val dup = ws.collect { case (`id`, p, w) if counts(w) >= 2 => p }
        val sp = spans(dup)
        (id, sp.map(x => x._2 - x._1).sum.toLong, sp.size.toLong,
          sp.map(x => x._2 - x._1).foldLeft(0)(math.max).toLong, t.length)
      }.map(x => x._1 -> x).toMap
      def r(x: Double, n: Int) =
        BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
      val want = rows.map(_._3).distinct.sorted.map { lang =>
        val ds = rows.filter(_._3 == lang).map(r0 => perDoc(r0._1))
        (lang, ds.size.toLong, ds.count(_._3 > 0).toLong,
          r(ds.map(d => if (d._5 > 0) r(d._2.toDouble / d._5, 9) else 0.0).sum / ds.size, 6),
          ds.map(_._2).sum, ds.map(_._3).sum, ds.map(_._4).foldLeft(0L)(math.max))
      }
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("q125 cut report matches the brute-force reference") =
    Prop.forAll(genCorpus) { rows =>
      val s = spark
      import s.implicits._
      def h60(str: String): Long = graft.TestRefs.h60(str)
      val M = 1000000007L
      val got = CurationQueries.substringCut(spark, docsDir(rows))
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      val ws = windows(rows)
      val byContent = ws.groupBy(_._3)
      val canonical = byContent.view
        .mapValues(_.map(x => (x._1, x._2)).min).toMap
      val rewritten = rows.map { case (id, t, _) =>
        val cut = ws.collect {
          case (`id`, p, w) if byContent(w).size >= 2 && canonical(w) != ((id, p)) => p
        }
        val sp = spans(cut)
        val kept = new StringBuilder
        var at = 0
        sp.foreach { case (st, en) => kept ++= t.substring(at, st); at = en }
        kept ++= t.substring(at)
        (id, t, kept.toString, sp.nonEmpty)
      }
      val want = rows.map(_._3).distinct.sorted.map { lang =>
        val ids = rows.filter(_._3 == lang).map(_._1).toSet
        val ds = rewritten.filter(d => ids(d._1))
        (lang, ds.size.toLong, ds.count(_._4).toLong,
          ds.map(_._2.length.toLong).sum, ds.map(_._3.length.toLong).sum,
          ds.map(d => h60(d._3) % M).sum)
      }
      Prop(got == want) :| s"got=$got want=$want"
    }
}
