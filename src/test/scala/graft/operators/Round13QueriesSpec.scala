package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions.{col, md5}
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture pins for the round-13 queries: byte-level BPE (q165),
  * the ANF calibration audit (q166), host-reputation composition (q167)
  * and the phash banding recall audit (q168). The DuckDB oracles certify
  * each at sf scale; these fix the intended math on inputs small enough
  * to verify by hand. */
class Round13QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r13docs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q165: hand-sized corpus — byte merges collapse 'ab' to one token, " +
      "bytes_per_token is exact") {
    import spark.implicits._
    // vocab: 'ab' (x3, source A), 'abc' (x1, source B). seg0 over hex byte
    // pairs: [61 62] / [61 62 63]. merge 1 = (61,62) cnt 4; merge 2 =
    // (6162,63) cnt 1; then no pairs remain -> early stop.
    val dir = docsDir(Seq(
      (1L, "ab ab ab", "en", "A"), (2L, "abc", "en", "B")))
    val r = Round13Queries.byteBpe(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq(("A", 3L, 6L, 3L, 2.0), ("B", 1L, 3L, 1L, 3.0)),
      s"got $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q165: multi-byte UTF-8 words count BYTES, not chars") {
    import spark.implicits._
    // 'é' is 2 UTF-8 bytes (C3 A9): one word of 2 chars = 4 bytes
    val dir = docsDir(Seq((1L, "éé", "fr", "A")))
    val r = Round13Queries.byteBpe(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(r.head._1 == "A" && r.head._2 == 1L && r.head._3 == 4L,
      s"expected 4 UTF-8 bytes for 'éé', got $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q187: per-lang fertility under the shared corpus model — exact " +
      "ratios on the hand-sized merge chain") {
    import spark.implicits._
    // same corpus as the q165 pin, split across langs: en gets 3x 'ab'
    // (one merged token each, 2 bytes), fr gets 'abc' (one token, 3
    // bytes). corpus bpt = 9/4 = 2.25; fertility = lang bpt / 2.25.
    val dir = docsDir(Seq(
      (1L, "ab ab ab", "en", "A"), (2L, "abc", "fr", "B")))
    val r = Round13Queries.byteBpeLangFertility(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(r == Seq(
      ("en", 3L, 6L, 3L, 2.0, 0.888889),
      ("fr", 1L, 3L, 1L, 3.0, 1.333333)), s"got $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q166: one planted seed — exact ball sizes are the hand count, " +
      "single-seed mean==max, error non-negative") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r13trade").toString
    // trade graph: customer 1 <-> supplier 100 (the only %100 seed)
    Seq((100L)).toDF("s_suppkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 100L)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Round13Queries.anfCalibration(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(r.map(_._1) == Seq(1L, 2L, 3L), s"hops: $r")
    // ball of the seed = {self, customer} at every hop
    assert(r.forall(t => t._2 == 1L && t._3 == 2L), s"exact balls: $r")
    assert(r.forall(t => t._4 == t._5),
      s"single seed: mean must equal max: $r")
    assert(r.forall(t => t._4 >= 0.0), s"relative error is absolute: $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q167: quality gate is the q82 rule set per host — a passing host " +
      "keeps iff it is also centrally reachable; failing quality zeroes " +
      "the weight") {
    import spark.implicits._
    // host A: docs with 25 distinct 4-char words -> all four Gopher rules
    // pass. host B: 5-word docs -> wc rule fails every doc.
    // 25 distinct 4-char words: wc 25 in [20,90], mean len exactly 4.0,
    // no stopwords, max single-token count 1
    val good = (1 to 25).map(i => f"w$i%03d").mkString(" ")
    val bad = "one two three four five"
    val dir = docsDir(
      (0 until 4).map(i => (i * 20L, good, "en", "srcA")) ++
        (0 until 4).map(i => (i * 20L + 1, bad, "en", "srcB")))
    val r = Round13Queries.hostReputation(spark, dir)
      .select("host", "n_docs", "n_keep", "qual_rate_u", "qual_ok", "keep",
        "weight_u")
      .as[(String, Long, Long, Long, Boolean, Boolean, Long)].collect()
      .map(t => t._1 -> t).toMap
    val a = r("srca.example.com")
    val b = r("srcb.example.com")
    assert(a._2 == 4L && a._3 == 4L && a._4 == 1000000L && a._5,
      s"host A must pass quality: $a")
    assert(b._2 == 4L && b._3 == 0L && b._4 == 0L && !b._5 && !b._6 &&
      b._7 == 0L, s"host B must fail quality and carry weight 0: $b")
    // keep == qual_ok AND cent_ok, so keep implies qual_ok
    assert(!a._6 || a._5)
    spark.sharedState.cacheManager.clearCache()
  }

  test("q170: rejected hosts sample nothing (threshold 0); kept thresholds " +
      "are 16-bit bounded and sampling never exceeds the host's docs") {
    import spark.implicits._
    val good = (1 to 25).map(i => f"w$i%03d").mkString(" ")
    val bad = "one two three four five"
    val dir = docsDir(
      (0 until 6).map(i => (i * 20L, good + s" x$i", "en", "srcA")) ++
        (0 until 6).map(i => (i * 20L + 1, bad + s" y$i", "en", "srcB")))
    val r = Round13Queries.reputationSelect(spark, dir)
      .select("host", "n_docs", "keep", "t_u", "n_sampled")
      .as[(String, Long, Boolean, Long, Long)].collect().toSeq
    assert(r.nonEmpty)
    r.foreach { case (h, nd, keep, t, ns) =>
      if (!keep) assert(t == 0L && ns == 0L, s"rejected $h must sample 0")
      assert(t >= 0L && t <= 65536L, s"$h threshold out of 16-bit range: $t")
      assert(ns <= nd, s"$h sampled more than its docs")
    }
    // srcB fails the quality gate outright (5-word docs) -> never kept
    val b = r.find(_._1 == "srcb.example.com").get
    assert(!b._3 && b._5 == 0L)
    spark.sharedState.cacheManager.clearCache()
  }

  test("q172: curriculum shards are position-contiguous and bucket-monotone " +
      "(head shards strictly precede middle, middle precede tail)") {
    import spark.implicits._
    val r = Round13Queries.curriculumPacking(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(r.nonEmpty)
    // contiguous epoch positions across shards
    r.sliding(2).foreach {
      case Array(a, b) => assert(b._8 == a._9 + 1,
        s"shard ${b._1} first_pos ${b._8} must follow shard ${a._1} " +
          s"last_pos ${a._9}")
      case _ =>
    }
    // bucket monotonicity: a later shard never reintroduces an earlier
    // bucket after the curriculum has moved past it
    val stages = r.map { row =>
      val Seq(h, m, t2, u) = Seq(row._4, row._5, row._6, row._7)
      (h > 0, m > 0, t2 > 0, u > 0)
    }
    def lastIdx(p: ((Boolean, Boolean, Boolean, Boolean)) => Boolean) = {
      val idxs = stages.zipWithIndex.filter { case (s, _) => p(s) }.map(_._2)
      if (idxs.isEmpty) -1 else idxs.max
    }
    def firstIdx(p: ((Boolean, Boolean, Boolean, Boolean)) => Boolean) = {
      val idxs = stages.zipWithIndex.filter { case (s, _) => p(s) }.map(_._2)
      if (idxs.isEmpty) Int.MaxValue else idxs.min
    }
    assert(lastIdx(_._1) <= firstIdx(_._3),
      "a head shard must never follow a tail shard")
    assert(lastIdx(_._2) <= firstIdx(_._4),
      "a middle shard must never follow an unscored shard")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q173: a document embedded whole in a longer one scores containment " +
      "1.0 — the asymmetric dup Jaccard underestimates") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def txt(n: Int) = (1 to n).map(_ =>
      ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(3))).mkString(" ")
    val short = txt(80)
    val long = short + " " + txt(200) // short embedded whole at the head
    val dir = docsDir(Seq(
      (1L, short, "en", "srcA"), (2L, long, "en", "srcA"),
      (3L, txt(150), "en", "srcB")))
    val r = Round13Queries.cdcContainment(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val pair = r.find(p => p._1 == 1L && p._2 == 2L)
    assert(pair.isDefined, s"the embedded pair must surface: $r")
    assert(pair.get._4 >= 0.8,
      s"containment of an embedded doc must be ~1: ${pair.get}")
    r.foreach { case (a, b, ns, c) =>
      assert(a < b && ns >= 2 && c >= 0.5 && c <= 1.0, s"invariants: $r")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("q174: a batch doc already in the corpus scores novelty 0 and is " +
      "rejected; a fully novel one scores 1.0 and admits; a shifted copy " +
      "is still rejected (the CDC point)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def txt(n: Int) = (1 to n).map(_ =>
      ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(3))).mkString(" ")
    val known = txt(150)
    val dir = docsDir(Seq(
      (1L, known, "en", "src0"),            // corpus
      (2L, txt(150), "en", "src1"),         // corpus
      (18L, known, "en", "src18"),          // batch: exact dup
      (19L, "PREFIX edit " + known, "en", "src18"), // batch: shifted dup
      (20L, txt(150), "en", "src19")))      // batch: novel
    val r = Round13Queries.cdcAdmit(spark, dir)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> t).toMap
    assert(r(18L)._4 == 0L && !r(18L)._5, s"exact dup must reject: ${r(18L)}")
    assert(r(19L)._4 < 500000L && !r(19L)._5,
      s"shifted dup must still reject — chunks re-sync: ${r(19L)}")
    assert(r(20L)._4 == 1000000L && r(20L)._5, s"novel doc admits: ${r(20L)}")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q171/cdcChunks: a prefix insertion re-synchronizes — nearly all " +
      "chunk hashes survive the shift (the property fixed tiles lack), and " +
      "chunks tile the text exactly") {
    import spark.implicits._
    import graft.ops.TextOps
    val rnd = new scala.util.Random(7)
    val t = (1 to 120).map(_ =>
      ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(3))).mkString(" ")
    val df = Seq((1L, t), (2L, "XYZprefix " + t)).toDF("doc_id", "text")
    val ch = TextOps.cdcChunks(df, "text", Seq("doc_id"))
      .select("doc_id", "chunk_idx", "chunk_len", "_h")
      .as[(Long, Long, Long, Long)].collect()
    val Seq(h1, h2) = Seq(1L, 2L).map(id =>
      ch.filter(_._1 == id).sortBy(_._2).map(_._4).toSeq)
    assert(h1.size >= 4, s"fixture must chunk: ${h1.size} chunks")
    // re-sync: doc2's trailing chunks equal doc1's (suffix match), with at
    // most a couple of leading chunks differing around the insertion
    val common = (1 to math.min(h1.size, h2.size))
      .takeWhile(k => h1.takeRight(k) == h2.takeRight(k)).lastOption.getOrElse(0)
    assert(common >= h1.size - 2,
      s"CDC must re-sync after the prefix: only $common of ${h1.size} " +
        "trailing chunks shared")
    // chunks tile the text: lengths sum to the doc length
    assert(ch.filter(_._1 == 1).map(_._3).sum == t.length)
    // contrast: fixed tiles share NO chunk digests after the same shift
    // (the tokens all shift by one position within the 20-token tiles)
    val tiles = TextOps.chunkTiles(df, "text", Seq("doc_id"))
      .select(col("doc_id"), md5(col("_chunk")).as("h"))
      .as[(Long, String)].collect()
    val Seq(t1, t2) = Seq(1L, 2L).map(id =>
      tiles.filter(_._1 == id).map(_._2).toSet)
    assert((t1 intersect t2).isEmpty,
      "fixture self-check: fixed tiles must be blind to the prefix shift")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q168: identical same-modality payloads land a guaranteed hd-0 row; " +
      "every guaranteed (hd<=3) bucket has catch_rate exactly 1.0 — the " +
      "pigeonhole floor the audit exists to measure") {
    import spark.implicits._
    // doc_ids 0 and 3 share modality (mod 3) and text -> exact dup pair.
    // Texts must survive the 50% md5 sample: brute-force a salt char.
    val base = "the quick brown fox jumps over the lazy dog " * 3
    def sampled(t: String): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(("q168" + t).getBytes("UTF-8"))
      (md(0) & 0xF0) < 0x80
    }
    val t1 = (0 until 16).map(i => base + ('a' + i).toChar).find(sampled).get
    val t2 = (0 until 16).map(i => base + "zz" + ('a' + i).toChar)
      .find(sampled).get
    val dir = docsDir(Seq(
      (0L, t1, "en", "srcA"), (3L, t1, "en", "srcA"),
      (6L, t2, "en", "srcA")))
    val r = Round13Queries.phashRecallAudit(spark, dir)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    val hd0 = r.find(_._1 == 0L)
    assert(hd0.isDefined && hd0.get._2 >= 1L && hd0.get._4 == 1.0 &&
      hd0.get._5, s"identical payloads must be a caught hd-0 pair: $r")
    assert(r.filter(_._5).forall(_._4 == 1.0),
      s"pigeonhole: every hd<=3 bucket must catch 1.0: $r")
    spark.sharedState.cacheManager.clearCache()
  }
}
