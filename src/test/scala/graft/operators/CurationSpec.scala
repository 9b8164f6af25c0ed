package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the round-8 curation operators on hand-computed
  * fixtures — the oracle certifies them against DuckDB at sf scale; these
  * fix the INTENDED math on inputs small enough to verify by hand. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  /** Write a tiny documents-shaped parquet dir and return its path. */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("curation-docs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q82: each rule trips on its own violation, keep requires all four") {
    import spark.implicits._
    // 25 tokens of length 4, no stopwords, max token 'good' x2 (2*20=40 <= 75)
    val ok = (Seq("good", "good") ++ (1 to 23).map(i => f"tk$i%02d")).mkString(" ")
    val shortDoc = "only five words in here" // n=5 < 20 → wc violation
    // 25 tokens, 13 'the' → nstop*10=130 > 25 → stopword violation; 'the'
    // count 13 also trips repetition (13*20=260 > 75); len: 13*3+12*4=87,
    // 87*10=870 inside [25*40=1000]... 870 < 1000 → ALSO mean-length-low
    val stopy = (List.fill(13)("the") ++ (1 to 12).map(i => f"wd$i%02d")).mkString(" ")
    val dir = docsDir(Seq(
      (0L, ok, "en", "s0"), (1L, shortDoc, "en", "s0"), (2L, stopy, "en", "s0")))
    val r = CurationQueries.gopherRules(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // (lang, n_docs, n_keep, v_wordcount, v_meanlen, v_stopword, v_repetition)
    assert(r == Seq(("en", 3L, 1L, 1L, 2L, 1L, 2L)))
    // v_meanlen=2: shortDoc mean len (4+4+5+2+4)/5=3.8 < 4.0 trips too;
    // v_repetition=2: shortDoc's all-distinct 5 tokens give mx/n=0.2 > 0.15
  }

  test("q83: chunk boundaries — stride 15, window 20, runt tail kept") {
    import spark.implicits._
    val words = (1 to 37).map(i => f"w$i%02d") // 37 tokens → starts 0,15,30
    val dir = docsDir(Seq((7L, words.mkString(" "), "en", "s0")))
    val r = CurationQueries.docChunks(spark, dir)
      .as[(Long, Long, Int, String)].collect().toSeq
    assert(r.map(c => (c._2, c._3)) == Seq((0L, 20), (1L, 20), (2L, 7)))
    // chunk content is pinned by md5 of the space-joined slice
    def m(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(r(0)._4 == m(words.slice(0, 20).mkString(" ")))
    assert(r(1)._4 == m(words.slice(15, 35).mkString(" ")))
    assert(r(2)._4 == m(words.slice(30, 37).mkString(" ")))
  }

  test("q83 property: chunks cover every token; de-overlapped chunks reassemble the doc") {
    import spark.implicits._
    // lengths around every boundary: < W, == W, == W+1, mid-stride, multiple
    // of stride, and a long tail
    val lengths = Seq(1, 5, 15, 19, 20, 21, 30, 35, 36, 50, 99, 100)
    val docs = lengths.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(k => s"t${i}_$k").mkString(" "), "en", "s0")
    }
    val dir = docsDir(docs)
    val got = CurationQueries.docChunks(spark, dir)
      .as[(Long, Long, Int, String)].collect().toSeq.groupBy(_._1)
    def m(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    docs.foreach { case (id, text, _, _) =>
      val toks = text.split(" ").toSeq
      val chunks = got(id).sortBy(_._2)
      // expected chunk starts: 0, 15, 30… while start < n
      val starts = 0 until toks.size by 15
      assert(chunks.size == starts.size, s"doc $id chunk count")
      starts.zip(chunks).foreach { case (start, (_, idx, nChunk, md5)) =>
        val slice = toks.slice(start, math.min(start + 20, toks.size))
        assert(idx == start / 15 && nChunk == slice.size, s"doc $id start $start")
        assert(md5 == m(slice.mkString(" ")), s"doc $id start $start content")
      }
      // de-overlapping reassembly: chunk 0 whole + later chunks minus the
      // 5-token overlap = the original token stream, exactly once each
      val reassembled = chunks.zipWithIndex.flatMap { case ((_, _, _, _), i) =>
        val start = i * 15
        val slice = toks.slice(start, math.min(start + 20, toks.size))
        if (i == 0) slice else slice.drop(5)
      }
      assert(reassembled == toks, s"doc $id reassembly")
    }
  }

  test("q84: smoothed bigram probabilities on a two-doc corpus, by hand") {
    import spark.implicits._
    // corpus: doc0 = "a b a b", doc1 = "a b"  → bigrams: (a,b)x3, (b,a)x1
    // c1: a→3, b→1; V = 2; k = 0.5
    // P(b|a) = (3+.5)/(3+.5*2) = 3.5/4 ; P(a|b) = (1+.5)/(1+.5*2) = 1.5/2
    val dir = docsDir(Seq((0L, "a b a b", "en", "s0"), (1L, "a b", "en", "s0")))
    val r = CurationQueries.bigramLm(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
      .map(t => t._1 -> ((t._2, t._3))).toMap
    def rd(x: Double) = math.rint(x * 1e6) / 1e6
    val lpAB = math.log(3.5 / 4.0); val lpBA = math.log(1.5 / 2.0)
    assert(r(0L) == ((3L, rd((2 * lpAB + lpBA) / 3))))
    assert(r(1L) == ((1L, rd(lpAB))))
  }

  test("q85: entropy is 0 for a constant doc, ln(n) for all-distinct") {
    import spark.implicits._
    val dir = docsDir(Seq(
      (0L, "x x x x", "en", "s0"), // H = 0
      (1L, "a b c d", "fr", "s0"))) // H = ln 4
    val r = CurationQueries.tokenEntropy(spark, dir)
      .as[(String, Long, Double, Double, Double, Long)].collect()
      .map(t => t._1 -> ((t._3, t._6))).toMap
    assert(r("en") == ((0.0, 1L))) // constant doc: zero entropy, low-flagged
    assert(r("fr") == ((math.rint(math.log(4.0) * 1e4) / 1e4, 1L))) // ln 4 ≈ 1.3863 < 3 → low
  }

  test("q87: centroid cosine by hand on a 2-dim, 2-label corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("curation-emb").toString
    Seq((0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = CurationQueries.embeddingDrift(spark, dir)
      .as[(Int, Long, Double, Double)].collect().map(t => t._1 -> t).toMap
    // corpus centroid = weighted mean = [2/3, 1/3]; |c| = sqrt(5)/3
    def rd(x: Double) = math.rint(x * 1e4) / 1e4
    assert(r(0) == ((0, 2L, rd(2.0 / math.sqrt(5.0)), 1.0)))
    assert(r(1) == ((1, 1L, rd(1.0 / math.sqrt(5.0)), 1.0)))
  }

  test("q88: packing math by hand — boundaries, straddlers, tail waste") {
    import spark.implicits._
    // one shard, docs of 100/200/300 tokens → concatenated [0,600), B=256:
    // doc0 [0,100) inside seq 0; doc1 [100,300) crosses 256; doc2 [300,600)
    // crosses 512 → 2 straddlers, 3 sequences, waste 768-600=168
    def doc(n: Int, id: Long) = (id, (0 until n).map(i => s"w$i").mkString(" "), "en", "s0")
    val dir = docsDir(Seq(doc(100, 0L), doc(200, 1L), doc(300, 2L)))
    val r = CurationQueries.sequencePacking(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("s0", 3L, 600L, 3L, 2L, 168L)))
    // exact-fit shard: 256 tokens in one doc → 1 seq, 0 straddlers, 0 waste
    val dir2 = docsDir(Seq(doc(256, 0L)))
    val r2 = CurationQueries.sequencePacking(spark, dir2)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r2 == Seq(("s0", 1L, 256L, 1L, 0L, 0L)))
  }

  test("edge inputs: null/empty/whitespace/one-token docs flow through all five") {
    import spark.implicits._
    val dir = docsDir(Seq(
      (1L, null.asInstanceOf[String], "en", "s0"),
      (2L, "", "en", "s0"),
      (3L, "   ", "en", "s0"),
      (4L, "x", "en", "s0"),
      (5L, "alpha beta alpha gamma", "en", "s1")))
    // tokenless docs (1-3) vanish from token-derived stats on BOTH engines
    // (explode of null/empty drops the row; unnest ditto) — no task death
    val rules = CurationQueries.gopherRules(spark, dir).collect()
    assert(rules.map(_.getLong(1)).sum == 2) // docs 4 and 5 only
    val chunks = CurationQueries.docChunks(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(chunks == Set(4L, 5L)) // one runt chunk each
    val lm = CurationQueries.bigramLm(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(lm == Set(5L)) // only the doc with >= 2 tokens scores
    val ent = CurationQueries.tokenEntropy(spark, dir).collect()
    assert(ent.map(_.getLong(1)).sum == 2)
    val mix = CurationQueries.mixWeights(spark, dir)
      .select("source").as[String].collect().toSet
    assert(mix == Set("s0", "s1")) // s0 survives via doc 4's single token
  }

  test("q86: α=1 degenerates to natural share; weights sum to 1") {
    import spark.implicits._
    // with the committed α=0.3, a smaller source must get boost > 1 and the
    // dominant source boost < 1, and the weights must sum to 1
    val small = (1 to 10).map(i => s"s$i").mkString(" ")
    val big = (1 to 90).map(i => s"b$i").mkString(" ")
    val dir = docsDir(Seq((0L, small, "en", "minor"), (1L, big, "en", "major")))
    val r = CurationQueries.mixWeights(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(math.abs(r.values.map(_._4).sum - 1.0) < 1e-5)
    assert(r("minor")._5 > 1.0 && r("major")._5 < 1.0)
    // hand value: share .1/.9 → raw = share^0.3 → w_minor = .1^.3/(.1^.3+.9^.3)
    val w = math.pow(0.1, 0.3) / (math.pow(0.1, 0.3) + math.pow(0.9, 0.3))
    assert(math.abs(r("minor")._4 - w) < 1e-5)
  }

  test("q120 soft dedup: weights sum to one per duplicate group, across sources") {
    import spark.implicits._
    // 'dup' appears 3x total (2 in sA, 1 in sB): each copy weighs 1/3, so
    // sA gets 2/3 + 1 (its unique doc) and sB gets 1/3 + 1
    val dir = docsDir(Seq(
      (0L, "dup text body", "en", "sA"),
      (1L, "dup text body", "en", "sA"),
      (2L, "dup text body", "en", "sB"),
      (3L, "unique a", "en", "sA"),
      (4L, "unique b", "en", "sB")))
    val r = CurationQueries.softDedupWeights(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    def rnd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r == Seq(
      ("sA", 3L, 2L, rnd6(2.0 / 3 + 1)),
      ("sB", 2L, 2L, rnd6(1.0 / 3 + 1))))
    // invariant: total effective docs == number of distinct texts
    assert(rnd6(r.map(_._4).sum) == 3.0)
  }

  test("q121 repetition profile: argmax + tie-break, dup overlap, clean doc, empty doc") {
    import spark.implicits._
    // doc0 "a b a b a b c": 2-grams 'a b'x3,'b a'x2,'b c'x1 → top num2=3*2=6;
    // 3-grams 'a b a'x2,'b a b'x2 TIE at c=2 → 'a b a' wins (gram asc) →
    // num3=2*3=6; dup2 = 3*2 + 2*2 = 10 (overlapping chars counted per
    // occurrence — the fraction may exceed 1 by design); totchars=7 → all
    // three integer gates trip (60>7, 60>7, 50>7)
    val a = "a b a b a b c"
    // doc1: 30 distinct 3-char tokens → totchars=90; top2 num=1*6 (60<=90
    // keeps), top3 num=1*9 (90<=90 keeps — the boundary is NOT a violation),
    // dup2=0 → clean keep
    val b = (1 to 30).map(i => f"w$i%02d").mkString(" ")
    // doc3's NULL text must land at totchars 0 and count in n_keep like the
    // oracle's coalesce — not NULL out of the keep predicate
    val dir = docsDir(Seq((0L, a, "en", "s0"), (1L, b, "en", "s0"),
      (2L, "", "fr", "s0"), (3L, null.asInstanceOf[String], "fr", "s0")))
    val r = CurationQueries.repetitionProfile(spark, dir)
      .as[(String, Long, Double, Double, Double, Long, Long, Long, Long)]
      .collect().toSeq
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val en = ("en", 2L,
      r6((r9(6.0 / 7) + r9(6.0 / 90)) / 2),
      r6((r9(6.0 / 7) + r9(9.0 / 90)) / 2),
      r6((r9(10.0 / 7) + 0.0) / 2),
      1L, 1L, 1L, 1L)
    // doc2 tokenless and doc3 null: totchars=0 → fractions pin to 0.0,
    // nothing trips, BOTH count as keeps
    val fr = ("fr", 2L, 0.0, 0.0, 0.0, 0L, 0L, 0L, 2L)
    assert(r == Seq(en, fr))
  }

  test("q124 substring spans: cross-doc, self-repetition, periodic merge, W-gap split") {
    import spark.implicits._
    val common = "abcdefghij" * 4 // the shared 40-char block
    val rows = Seq(
      // window at pos 1 == common, shared with doc1/5/6 → one span [1,40]
      (0L, common + "0" * 10, "en", "s0"),
      // common at pos 6 → one span, frac 40/50
      (1L, "1" * 5 + common + "2" * 5, "en", "s0"),
      // every window identical (self-repetition IS duplication): positions
      // 1..61 all dup → ONE merged span covering all 100 chars
      (2L, "R" * 100, "en", "s0"),
      // under W chars: no windows, frac 0
      (3L, "short text", "en", "s0"),
      // fully periodic 80 chars: all 41 positions dup, one span of 80
      (5L, common + common, "en", "s0"),
      // two common copies split by a 40-char M-run: dup at pos 1 and 81,
      // 81 > 1 + W → TWO spans of 40 (the M-run itself occurs once — clean)
      (6L, common + "M" * 40 + common, "en", "s0"),
      // other language, no dups anywhere
      (7L, ('a' to 'z').mkString + "0123456789" * 3, "fr", "s0"))
    val r = CurationQueries.substringDupSpans(spark, docsDir(rows))
      .as[(String, Long, Long, Double, Long, Long, Long)].collect().toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val en = ("en", 6L, 5L,
      r6((r9(40.0 / 50) + r9(40.0 / 50) + 1.0 + 0.0 + 1.0 + r9(80.0 / 120)) / 6),
      40L + 40L + 100L + 80L + 80L, 6L, 100L)
    assert(r == Seq(en, ("fr", 1L, 0L, 0.0, 0L, 0L, 0L)))
  }

  test("q126 char coverage: top-32 tie-break at the boundary, rare-char screen") {
    import spark.implicits._
    // en: 33 distinct chars, each exactly twice — every count ties, so the
    // rank-33 exclusion is decided purely by the char-asc tiebreak ('g' is
    // the largest: ASCII uppercase sorts before lowercase)
    val chars = ('A' to 'Z') ++ ('a' to 'g')
    assert(chars.size == 33)
    val en = (chars ++ chars).mkString
    // fr: one dominant char + one singleton at frequency 1/20001 < 1/10000
    val fr = "x" * 20000 + "q"
    val dir = docsDir(Seq((0L, en, "en", "s0"), (1L, fr, "fr", "s0")))
    val r = CurationQueries.charCoverage(spark, dir)
      .as[(String, Long, Long, Long, Double, Long)].collect().toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r == Seq(
      ("en", 66L, 33L, 64L, r6(64.0 / 66), 0L),
      ("fr", 20001L, 2L, 20001L, 1.0, 1L)))
  }

  test("q125 substring cut: canonical keeps, span-union overlap, full-doc cut, checksum") {
    import spark.implicits._
    def h60(s: String): Long = graft.TestRefs.h60(s)
    val M = 1000000007L
    val common = "abcdefghij" * 4
    val d0 = common + "0" * 10 // owns the canonical common → kept whole
    val d3 = "short text"
    val d7 = ('a' to 'z').mkString + "0123456789" * 3
    val rows = Seq(
      (0L, d0, "en", "s0"),
      (1L, "1" * 5 + common + "2" * 5, "en", "s0"), // cut [6,45] → "1111122222"
      (2L, "R" * 100, "en", "s0"), // canonical pos 1; span-union cuts [2,100] → "R"
      (3L, d3, "en", "s0"), // sub-W: untouched
      // periodic: class-1 canonical lives in doc0, in-doc shift classes
      // self-duplicate → cut spans union to the WHOLE doc → ""
      (5L, common + common, "en", "s0"),
      (6L, common + "M" * 40 + common, "en", "s0"), // two cuts → "M"*40
      (7L, d7, "fr", "s0"))
    val r = CurationQueries.substringCut(spark, docsDir(rows))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val enSum = Seq(d0, "1111122222", "R", d3, "", "M" * 40)
      .map(s => h60(s) % M).sum
    assert(r == Seq(
      ("en", 6L, 4L, 410L, 111L, enSum),
      ("fr", 1L, 0L, 56L, 56L, h60(d7) % M)))
  }

  test("q124/q125 handle variants release the persisted window relation") {
    val common = "abcdefghij" * 4
    val dir = docsDir(Seq(
      (0L, common + "0" * 10, "en", "s0"),
      (1L, "1" * 5 + common + "2" * 5, "en", "s0")))
    spark.sharedState.cacheManager.clearCache() // isolate the assertion
    // build one handle at a time: the two window relations share a logical
    // plan, so eager construction would dedup to ONE cache entry and the
    // first release() would drop the second handle's cache out from under it
    for (mk <- Seq(
        () => CurationQueries.substringDupSpansHandle(spark, dir),
        () => CurationQueries.substringCutHandle(spark, dir))) {
      val (res, release) = mk()
      res.collect()
      assert(!spark.sharedState.cacheManager.isEmpty,
        "window relation should be cached while the handle is open")
      release()
      assert(spark.sharedState.cacheManager.isEmpty,
        "release() must unpersist the window relation")
    }
  }
}
