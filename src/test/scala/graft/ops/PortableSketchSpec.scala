package graft.ops

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PortableSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("h60 equals the cross-engine definition (top 15 md5 hex chars)") {
    // pinned against DuckDB: SELECT ('0x'||substr(md5('abc'),1,15))::BIGINT
    val got = Seq("abc").toDF("s")
      .select(PortableSketch.h60(col("s")).as("h")).as[Long].head()
    assert(got == 648541476951500027L)
  }

  test("minhashNearDups: exact duplicates pair at est_jaccard 1.0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content with no overlap at all here"),
      (4L, "yet another unrelated document about spark and shuffles")
    ).toDF("doc_id", "text")
    val got = PortableSketch.minhashNearDups(docs, "text", "doc_id",
      k = 16, bands = 4, n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0)))
  }

  test("incrementalAdmit: corpus dups reject, intra-batch keeps first arrival") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different content with no overlap at all here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // dup of corpus 1 → rejected
      (11L, "yet another unrelated document about spark and shuffles"), // fresh → admitted
      (12L, "yet another unrelated document about spark and shuffles"), // dup of batch 11 → rejected
      (13L, "a third novel text mentioning catalyst plans and codegen") // fresh → admitted
    ).toDF("doc_id", "text")
    val admitted = PortableSketch.incrementalAdmit(
      corpus, batch, "text", "doc_id", k = 16, bands = 4, n = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // 11 survives its own duplicate (smaller id = earlier arrival wins);
    // the corpus rows themselves never appear — output is batch-only
    assert(admitted == Set(11L, 13L))
  }

  test("incrementalAdmit agrees with the symmetric pair pipeline on a random corpus") {
    // consistency contract: the asymmetric probe must reject EXACTLY the
    // batch docs that the symmetric near-dup pair relation over corpus ∪
    // batch connects to a prior doc (any corpus doc, or a smaller-id batch
    // doc). Randomized docs with planted dups exercise real signatures.
    val rnd = new scala.util.Random(41)
    def doc(): String = (0 until 12).map(_ => s"tok${rnd.nextInt(30)}").mkString(" ")
    val corpusRows = (1L to 30L).map(i => (i, doc()))
    // ~40% of the batch duplicates a corpus doc; fresh batch docs can also
    // collide with each other by chance (12 tokens over a 30-token vocab),
    // exercising the smaller-id-batch-prior rule too
    val batchRows = (100L to 119L).map { i =>
      if (rnd.nextInt(10) < 4) (i, corpusRows(rnd.nextInt(corpusRows.size))._2)
      else (i, doc())
    }
    val corpus = corpusRows.toDF("doc_id", "text")
    val batch = batchRows.toDF("doc_id", "text")
    val admitted = PortableSketch.incrementalAdmit(
      corpus, batch, "text", "doc_id", k = 16, bands = 4, n = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // reference: symmetric pairs over the union, then the prior-doc rule
    val batchIds = batchRows.map(_._1).toSet
    val pairs = PortableSketch.minhashNearDups(corpus.union(batch), "text", "doc_id",
      k = 16, bands = 4, n = 3, threshold = 0.5)
      .select("idA", "idB").as[(Long, Long)].collect()
    // pair ids come ordered idA < idB, and corpus ids (1-30) all precede
    // batch ids (100+), so in every pair touching a batch doc the idA side
    // is prior (corpus, or an earlier-arrival batch doc) — the rejected set
    // is exactly the batch members appearing as idB
    val rejected = pairs.collect { case (_, b) if batchIds(b) => b }.toSet
    assert(admitted == batchIds -- rejected)
    assert(rejected.nonEmpty, "test corpus planted no duplicates — regenerate seeds")
  }

  test("incrementalAdmit: hot-bucket cap keeps corpus witnesses over smaller batch ids") {
    // all three docs are identical, so every band bucket holds (corpus 100,
    // batch 0, batch 1) and overflows maxBucket=1. A cap ordered by _id
    // alone keeps batch 0 — useless to probe 0 (the join demands _isCorpus
    // OR _id < probe id), so doc 0 would be wrongly admitted despite
    // duplicating corpus 100. The corpus-first cap keeps the corpus
    // witness, so BOTH batch docs reject.
    val t = "the quick brown fox jumps over the lazy dog"
    val corpus = Seq((100L, t)).toDF("doc_id", "text")
    val batch = Seq((0L, t), (1L, t)).toDF("doc_id", "text")
    val admitted = PortableSketch.incrementalAdmit(corpus, batch, "text", "doc_id",
      k = 16, bands = 4, n = 3, threshold = 0.5, maxBucket = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set.empty[Long])
  }

  test("incrementalAdmit: an empty batch admits nothing and a disjoint batch admits all") {
    val corpus = Seq((1L, "some corpus text body here")).toDF("doc_id", "text")
    val empty = corpus.where(lit(false))
    assert(PortableSketch.incrementalAdmit(corpus, empty, "text", "doc_id").count() == 0)
    val fresh = Seq((7L, "entirely new material"), (8L, "more new material entirely"))
      .toDF("doc_id", "text")
    assert(PortableSketch.incrementalAdmit(corpus, fresh, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet == Set(7L, 8L))
  }

  test("simhashNearDups equals the brute-force all-pairs scan (pigeonhole exact)") {
    val docs = (0L until 40L).map { i =>
      // ten near-identical docs (one char varies) + thirty distinct ones
      if (i < 10) (i, s"shared boilerplate text that repeats almost verbatim $i")
      else (i, s"unique document number $i with its own words ${i * 37} ${i * 101}")
    }.toDF("doc_id", "text")
    val got = PortableSketch.simhashNearDups(docs, "text", "doc_id", n = 5)
      .as[(Long, Long, Long)].collect().toSet
    val sh = docs.select(col("doc_id"),
      PortableSketch.simhash60(col("text"), 5).as("sh"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("long").as("d"))
      .where(col("d") <= 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
    assert(got.nonEmpty, "fixture must produce at least one near-dup pair")
  }

  test("winnowSet: shared substring >= w+n-1 chars forces a shared fingerprint") {
    val shared = "a very long shared passage lifted verbatim" // 42 >= 16+8-1
    val docs = Seq(
      (1L, s"prefix one $shared suffix one"),
      (2L, s"totally different start $shared and end"),
      (3L, "no overlap with the others at all, separate text")
    ).toDF("doc_id", "text")
    val fps = docs
      .select(col("doc_id"), PortableSketch.charGramHashes(col("text"), 8).as("_hs"))
      .select(col("doc_id"), PortableSketch.winnowFromHashes(col("_hs"), 16).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty,
      "winnowing guarantees a shared window-min for long shared substrings")
    assert(fps(1L).toSet.intersect(fps(3L).toSet).isEmpty)
  }

  test("winnowFromHashesFast (deque) equals the expression-tree winnow set") {
    val rnd = new scala.util.Random(11)
    val docs = (0L until 60L).map { i =>
      val len = 1 + rnd.nextInt(120)
      (i, (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    }.toDF("doc_id", "text")
      .select(col("doc_id"), PortableSketch.charGramHashes(col("text"), 8).as("_hs"))
    val both = docs.select(col("doc_id"),
      PortableSketch.winnowFromHashes(col("_hs"), 16).as("ref"),
      PortableSketch.winnowFromHashesFast(col("_hs"), 16).as("fast"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    both.foreach { case (id, ref, fast) =>
      assert(ref == fast, s"doc $id: deque path must match the spec form exactly")
    }
  }

  test("winnowFromHashes on an empty hash array yields [] (matches the deque path)") {
    val df = Seq(Tuple1(Seq.empty[Long]), Tuple1(Seq(7L)), Tuple1((1L to 20L).toSeq))
      .toDF("_hs")
    val both = df.select(
      PortableSketch.winnowFromHashes(col("_hs"), 16).as("ref"),
      PortableSketch.winnowFromHashesFast(col("_hs"), 16).as("fast"))
      .as[(Seq[Long], Seq[Long])].collect()
    both.foreach { case (ref, fast) => assert(ref == fast) }
    assert(both.head._1 == Seq.empty[Long])
  }

  test("fused minhash/simhash kernels equal the expression-tree forms") {
    val rnd = new scala.util.Random(17)
    val alphabets = Seq("ab cd ef gh ij", "αβ γδ εζ ηθ", "wörds ünd möre tëxt")
    val docs = (0L until 60L).map { i =>
      val alpha = alphabets((i % 3).toInt)
      val len = 1 + rnd.nextInt(90)
      (i, (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }.toDF("doc_id", "text")
    val mh = docs
      .select(col("doc_id"), TextOps.wordShingles(col("text"), 3).as("_g"))
      .select(col("doc_id"),
        PortableSketch.minhashSigFromGrams(col("_g"), 16).as("ref"),
        PortableSketch.minhashSigFromGramsFast(col("_g"), 16).as("fast"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    mh.foreach { case (id, ref, fast) =>
      assert(ref == fast, s"doc $id: fused minhash must match the spec form")
    }
    val sh = docs.select(col("doc_id"),
      PortableSketch.simhash60(col("text"), 5).as("ref"),
      PortableSketch.simhash60Fast(col("text"), 5).as("fast"))
      .as[(Long, Long, Long)].collect()
    sh.foreach { case (id, ref, fast) =>
      assert(ref == fast, s"doc $id: fused simhash must match the spec form")
    }
  }

  test("winnowText fused kernel equals the expression-tree winnow set") {
    val rnd = new scala.util.Random(13)
    val alphabets = Seq("abcd", "αβγδ εζ", "mixé Ünïcode and ASCII ")
    val docs = (0L until 90L).map { i =>
      val alpha = alphabets((i % 3).toInt)
      val len = 1 + rnd.nextInt(200)
      (i, (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }.toDF("doc_id", "text")
    val both = docs
      .select(col("doc_id"), col("text"),
        PortableSketch.charGramHashes(col("text"), 8).as("_hs"))
      .select(col("doc_id"),
        PortableSketch.winnowFromHashes(col("_hs"), 16).as("ref"),
        PortableSketch.winnowText(col("text"), 8, 16).as("fused"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    both.foreach { case (id, ref, fused) =>
      assert(ref == fused, s"doc $id: fused kernel must match the spec form exactly")
    }
  }

  test("dedup keep-best rule: most tokens wins, ties to the smallest id") {
    // three exact-dup groups with varying richness; via the full q66 path
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),          // cluster {10,11,12}
      (11L, "alpha beta gamma delta epsilon zeta eta theta"), // richest → keep
      (12L, "alpha beta gamma delta epsilon zeta"),
      (20L, "one two three four five six seven"),             // cluster {20,21}: tie
      (21L, "one two three four five six seven"),             //   → keep min id 20
      (30L, "lonely document with no duplicate partner text")
    ).toDF("doc_id", "text")
    val spark2 = spark
    import org.apache.spark.sql.functions.{col => c}
    val pairs = PortableSketch.minhashNearDups(docs, "text", "doc_id",
      k = 16, bands = 4, n = 3, threshold = 0.5).select("idA", "idB")
    val toks = docs.select(c("doc_id"), TextOps.tokenCount(c("text")).as("tokens"))
    val got = Dedup.dupClusters(pairs)
      .join(toks, c("id") === c("doc_id"))
      .groupBy(c("rep").as("cluster_rep"))
      .agg(count(lit(1)).as("n_docs"),
        max_by(c("id"), struct(c("tokens"), -c("id"))).as("keep_doc"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 3L, 11L), (20L, 2L, 20L)))
  }

  test("winnowing guarantee: every shared substring >= w+n-1 chars surfaces (randomized)") {
    // Schleimer/Wilkerson/Aiken theorem: with n-gram hashes and window w,
    // two documents sharing any substring of length >= w+n-1 must share at
    // least one selected fingerprint. 60 random plants across alphabets.
    val rnd = new scala.util.Random(41)
    def rand(len: Int, alpha: String) =
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val cases = (0 until 60).map { i =>
      val alpha = Seq("ab", "abcd", "abcdefgh ")(i % 3)
      val shared = rand(23 + rnd.nextInt(30), alpha) // >= w+n-1 = 23
      (i.toLong,
        rand(rnd.nextInt(40), alpha) + shared + rand(rnd.nextInt(40), alpha),
        rand(rnd.nextInt(40), alpha) + shared + rand(rnd.nextInt(40), alpha))
    }
    val fps = cases.flatMap { case (i, a, b) => Seq((i, "A", a), (i, "B", b)) }
      .toDF("case_id", "side", "text")
      .select(col("case_id"), col("side"),
        PortableSketch.winnowText(col("text"), 8, 16).as("fps"))
      .as[(Long, String, Seq[Long])].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3.toSet).toMap).toMap
    cases.foreach { case (i, _, _) =>
      assert(fps(i)("A").intersect(fps(i)("B")).nonEmpty,
        s"case $i: planted shared substring produced no shared fingerprint")
    }
  }

  test("winnowSet: document shorter than one window keeps its global min") {
    val fps = Seq((1L, "tiny doc")).toDF("doc_id", "text")
      .select(PortableSketch.charGramHashes(col("text"), 8).as("_hs"))
      .select(PortableSketch.winnowFromHashes(col("_hs"), 16).as("fps"))
      .as[Seq[Long]].head()
    assert(fps.length == 1)
  }
}
