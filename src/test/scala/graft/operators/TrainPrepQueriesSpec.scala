package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture pins for the training-set assembly queries: the
  * dup-cluster split's zero-leak theorem (q175), the padding-waste
  * accounting (q176), the water-fill cap cascade's exact integer
  * arithmetic (q177), and the rank-defined percentile rule (q178). The
  * DuckDB oracles certify each at sf scale; these fix the intended math
  * on inputs small enough to verify by hand. */
class TrainPrepQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tprep").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q175: a near-dup pair always lands in ONE split (leak_pairs 0), " +
      "clusters counted once") {
    import spark.implicits._
    // docs 1/2 share all but one word (3-gram Jaccard well over 0.5);
    // doc 3 is unrelated. Whatever split the rep's hash draws, both
    // members inherit it — the zero-leak theorem, measured.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dir = docsDir(Seq(
      (1L, base + " one", "en", "A"),
      (2L, base + " two", "en", "A"),
      (3L, "completely different words about ships and harbors entirely", "en", "B")))
    val r = TrainPrepQueries.leakSafeSplit(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r.map(_._2).sum == 3L, s"3 docs total, got $r")
    assert(r.map(_._4).sum == 2L, s"2 clusters (pair + singleton), got $r")
    assert(r.map(_._5).sum == 0L, s"cluster split must never leak, got $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q176: length-sorted batching of a bimodal corpus pads ZERO; " +
      "totals are exact") {
    import spark.implicits._
    // 8 ten-word docs + 8 one-word docs, batch size 8: length order packs
    // each mode into its own batch — slot == real. Texts are all distinct
    // so the hash order is total.
    val long = (1 to 10).map(i => s"w$i").mkString(" ")
    val rows = (1L to 8L).map(i => (i, s"$long x$i", "en", "A")) ++
      (9L to 16L).map(i => (i, s"solo$i", "en", "A"))
    val dir = docsDir(rows)
    val r = TrainPrepQueries.paddingAudit(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    val sorted = r("length_sorted")
    // 8 docs of 11 tokens ("x$i" appends one) + 8 of 1 token
    assert(sorted == ("length_sorted", 2L, 96L, 96L, 0L, 0L), s"got $sorted")
    val hash = r("hash_order")
    assert(hash._3 == 96L && hash._4 >= sorted._4,
      s"hash order can only pad MORE, got $hash")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q177: two-source water-fill — the small source caps round 1, the " +
      "big source absorbs the leftover exactly to (not past) its cap") {
    import spark.implicits._
    // big = 100 tokens, small = 10. budget = 275; round 1 alloc = 137 →
    // small caps at 25; round 2 gives big (275-25)/1 = 250 = its cap
    // EXACTLY (alloc > cap is false → stays uncapped at 2.5 epochs).
    val dir = docsDir(Seq(
      (1L, (1 to 100).map(i => s"b$i").mkString(" "), "en", "big"),
      (2L, (1 to 10).map(i => s"s$i").mkString(" "), "en", "small")))
    val r = TrainPrepQueries.epochMix(spark, dir)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(r == Seq(
      ("big", 100L, 250L, 2500000L, false),
      ("small", 10L, 25L, 2500000L, true)), s"got $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q178: rank-defined percentiles on lengths 1..4 — P50 is the " +
      "ceil-rank value, never an interpolation") {
    import spark.implicits._
    val dir = docsDir(Seq(
      (1L, "a", "en", "A"),
      (2L, "a b", "en", "A"),
      (3L, "a b c", "en", "A"),
      (4L, "a b c d", "en", "A")))
    // n=4: P50 rank ceil(2)=2 → 2; P90 rank ceil(3.6)=4 → 4; P99 → 4.
    val r = TrainPrepQueries.lengthPercentiles(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("A", 4L, 2L, 4L, 4L, 4L)), s"got $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q179: a shared passage flags the train copy; a fully-distinct " +
      "corpus flags nothing") {
    import spark.implicits._
    // every doc carries the same 12-word passage plus a unique tail: any
    // train doc shares ≥ 4 word-3-grams with any probe doc, so n_flagged
    // must equal n_train wherever a probe exists (hash-split-agnostic pin)
    val passage = "one two three four five six seven eight nine ten eleven twelve"
    val dirShared = docsDir((1L to 30L).map(i =>
      (i, s"$passage unique$i", "en", s"S${i % 2}")))
    val shared = TrainPrepQueries.splitDecontam(spark, dirShared)
      .as[(String, Long, Long, Long)].collect().toSeq
    val nTrain = shared.map(_._2).sum
    assert(nTrain < 30L, "fixture self-check: some docs must be probes")
    assert(shared.map(_._3).sum == nTrain,
      s"every train doc shares the passage with every probe, got $shared")
    spark.sharedState.cacheManager.clearCache()
    // fully-distinct corpus: no two docs share any gram
    val dirDistinct = docsDir((1L to 30L).map(i =>
      (i, (1 to 8).map(j => s"w${i}x$j").mkString(" "), "en", "S0")))
    val distinct = TrainPrepQueries.splitDecontam(spark, dirDistinct)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(distinct.map(_._3).sum == 0L, s"nothing shared, got $distinct")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q180: single-doc corpus — first positions are exact, thresholds " +
      "past the corpus saturate to the full vocabulary") {
    import spark.implicits._
    // "a a a b": a first at pos 1 (kmin 0), b at pos 4 (kmin 2) — both
    // inside 2^4, so every k row reports 2 distinct over 4 prefix tokens
    val dir = docsDir(Seq((1L, "a a a b", "en", "A")))
    val r = TrainPrepQueries.vocabGrowth(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == (4 to 20).map(k => (k.toLong, 4L, 2L)), s"got $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q180: the curve is monotone and ends at the exact full vocabulary " +
      "whatever the hash order draws") {
    import spark.implicits._
    val dir = docsDir((1L to 12L).map(i =>
      (i, (1 to 6).map(j => s"tok${(i * 7 + j) % 30}").mkString(" "), "en", "A")))
    val r = TrainPrepQueries.vocabGrowth(spark, dir)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r.sliding(2).forall(p => p(0)._3 <= p(1)._3), s"non-monotone: ${r.toSeq}")
    val vocab = (1L to 12L).flatMap(i => (1 to 6).map(j => s"tok${(i * 7 + j) % 30}"))
      .distinct.size.toLong
    assert(r.last._3 == vocab && r.last._2 == 72L,
      s"must end at |vocab|=$vocab over 72 tokens, got ${r.last}")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q181: a single-keep-class corpus makes every lift exactly 10000 — " +
      "the integer identity when one marginal is the whole corpus") {
    import spark.implicits._
    // all docs fail Gopher (3 tokens < 20): kt == N, n == bt per bucket
    val dirFail = docsDir((1L to 6L).map(i =>
      (i, s"aa bb cc$i", "en", "A")))
    val rf = TrainPrepQueries.signalAgreement(spark, dirFail)
      .as[(String, Boolean, Long, Long)].collect().toSeq
    assert(rf.nonEmpty && rf.forall(c => !c._2 && c._4 == 10000L), s"got $rf")
    assert(rf.map(_._3).sum == 6L, s"cells must partition the corpus: $rf")
    spark.sharedState.cacheManager.clearCache()
    // all docs pass Gopher (24 distinct words, mean word length 4.5): same
    // identity from the other side, terciles balanced 3/3/3
    // 12 four-char + 12 five-char distinct words: n=24 ∈ [20,90], mean
    // word length 4.5 ∈ [4,5], no stopwords, max count 1 — all rules pass
    def keeperText(i: Long): String =
      ((1 to 12).map(j => f"a$i%01d$j%02d") ++
        (1 to 12).map(j => f"b$i%01dx$j%02d")).mkString(" ")
    val dirKeep = docsDir((1L to 9L).map(i => (i, keeperText(i), "en", "A")))
    val rk = TrainPrepQueries.signalAgreement(spark, dirKeep)
      .as[(String, Boolean, Long, Long)].collect().toSeq
    assert(rk.forall(c => c._2 && c._4 == 10000L), s"got $rk")
    assert(rk.map(_._3).sum == 9L, s"cells must partition the corpus: $rk")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q182: a single-source corpus is perfectly 'clumped' — observed and " +
      "expected rates are both exactly 10000; a singleton source expects 0") {
    import spark.implicits._
    val dirOne = docsDir((1L to 10L).map(i => (i, s"text number $i", "en", "A")))
    val r1 = TrainPrepQueries.mixingAudit(spark, dirOne)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r1 == Seq(("A", 10L, 9L, 9L, 10000L, 10000L)), s"got $r1")
    spark.sharedState.cacheManager.clearCache()
    val dirTwo = docsDir((1L to 9L).map(i => (i, s"text number $i", "en", "A")) :+
      ((10L, "the lone wolf document", "en", "B")))
    val r2 = TrainPrepQueries.mixingAudit(spark, dirTwo)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(r2("B")._6 == 0L, s"a singleton source expects 0 bp, got ${r2("B")}")
    assert(r2("A")._2 + r2("B")._2 == 10L &&
      r2("A")._3 + r2("B")._3 == 9L, s"adjacency pairs must total N-1: $r2")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q183: a 64-token doc fits one window; a 65-token doc crosses — " +
      "exact rows either way") {
    import spark.implicits._
    val dirFit = docsDir(Seq((1L, (1 to 64).map(i => s"w$i").mkString(" "), "en", "A")))
    val rf = TrainPrepQueries.windowBoundaryAudit(spark, dirFit)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rf == Seq(("A", 1L, 64L, 0L, 0L, 1000000L)), s"got $rf")
    spark.sharedState.cacheManager.clearCache()
    val dirCross = docsDir(Seq((1L, (1 to 65).map(i => s"w$i").mkString(" "), "en", "A")))
    val rc = TrainPrepQueries.windowBoundaryAudit(spark, dirCross)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rc == Seq(("A", 1L, 65L, 1L, 10000L, 2000000L)), s"got $rc")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q184: stage accounting is monotone, packing conserves the " +
      "decontaminated stage, and a shared passage empties the train side") {
    import spark.implicits._
    val passage = "one two three four five six seven eight nine ten eleven twelve"
    val dir = docsDir((1L to 20L).map(i =>
      (i, s"$passage unique$i", "en", s"S${i % 2}")))
    val r = TrainPrepQueries.assemblyFunnel(spark, dir)
      .as[(String, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(r("1_corpus")._2 == 20L)
    assert(r("2_train_split")._2 <= r("1_corpus")._2)
    assert(r("3_decontaminated")._2 <= r("2_train_split")._2)
    // packing conserves docs and tokens of the decontaminated stage
    assert(r("4_packed")._2 == r("3_decontaminated")._2 &&
      r("4_packed")._3 == r("3_decontaminated")._3, s"got $r")
    // every doc shares the passage: if any probe exists, every train doc
    // is flagged and the decontaminated stage is empty
    if (r("2_train_split")._2 < r("1_corpus")._2)
      assert(r("3_decontaminated")._2 == 0L, s"got $r")
    // shard count is exact, not merely ≥1: an empty packed stage must
    // report 0 shards (no phantom shard), and this fixture packs at most
    // one budget's worth so a non-empty stage is exactly 1 shard
    assert(r("4_packed")._4 == (if (r("4_packed")._2 == 0L) 0L else 1L),
      s"got $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q185: a source-grain entry blocks its lang-SUBDOMAIN docs through " +
      "the suffix walk; unblocked sources report zero") {
    import spark.implicits._
    // single source: either its domain entry hashes into the blocklist
    // (everything blocked, subdomained or not) or it doesn't (only its
    // subdomain hosts can independently hash in). Either way the suffix
    // walk must treat even/odd docs of one blocked source identically.
    val dir = docsDir((1L to 40L).map(i =>
      (i, s"document number $i", Seq("en", "fr")(i.toInt % 2), s"src${i % 4}")))
    val r = TrainPrepQueries.blocklistFilter(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r.map(_._2).sum == 40L)
    // per-source share is 0, 10000, or strictly between (subdomain-only
    // blocks hit only even doc_ids): all values must be consistent with
    // n_blocked/n_docs exactly
    r.foreach { case (s, n, b, bp) =>
      assert(bp == b * 10000 / n, s"bp must be exact integer share: $s $n $b $bp") }
    spark.sharedState.cacheManager.clearCache()
  }

  test("q186: the planted boilerplate surfaces as shared template chunks; " +
      "a template-free corpus reports none") {
    import spark.implicits._
    // 12 docs, all doc_id % 3 == 0 carriers get the header: with one
    // source every header chunk is shared by exactly the carriers
    val dir = docsDir((1L to 12L).map(i =>
      (i * 3, s"utterly distinct body text number ${i * 97} with words w${i}a w${i}b w${i}c w${i}d", "en", "A")))
    val r = TrainPrepQueries.templateInventory(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r.nonEmpty, "the planted header must produce template chunks")
    r.foreach { case (_, len, nd, ns) =>
      assert(nd >= 5L && ns == 1L && len >= 16L, s"got ($len, $nd, $ns)") }
    spark.sharedState.cacheManager.clearCache()
    // no carriers (no doc_id divisible by 3): template-free
    val dir2 = docsDir(Seq((1L, "plain short text", "en", "A"),
      (2L, "another plain body", "en", "A")))
    assert(TrainPrepQueries.templateInventory(spark, dir2).count() == 0L)
    spark.sharedState.cacheManager.clearCache()
  }

  test("q176 plan: every ranking window is partitioned by the range id — " +
      "no single-partition window (the final 2-row rollup's exchange is " +
      "the only global stage)") {
    val p = TrainPrepQueries.paddingAudit(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, s"expected ranking windows in the plan\n$p")
    windows.foreach { w =>
      assert(w.contains("_pid#"),
        s"a ranking window is not partitioned by the range id:\n$w")
    }
    spark.sharedState.cacheManager.clearCache()
  }
}
