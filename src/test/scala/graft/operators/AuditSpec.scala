package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture pins for the audit queries added in round 10: the ANN
  * recall audit (q104) and chunk-level global dedup (q105). The DuckDB
  * oracles certify both at sf scale; these fix the intended math on inputs
  * small enough to verify by hand. */
class AuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("q104: probe-2 recovers the cross-boundary neighbors probe-1 misses") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audit-emb").toString
    // Two coarse buckets: centroids are the id-RANK 1 and 51 vectors (the
    // distribution-free seed rule) — id 0 (+x) and id 58 (+y), with 48
    // antipodal (−x) spacer rows at ids 10..57 lifting id 58 to rank 51.
    // Queries are ids < 10 (0 and 1, both +x-leaning → bucket A); the −x
    // spacers and the (.6,.8) neighbor assign to bucket B (cos 0 > −1,
    // .8 > .6), so probe-1 sees only {1, 60} while the exact top-5 truth
    // crosses the boundary: q0 = {60, 1, 59, 58, 10}, q1 = {59, 60, 0, 58,
    // 10} (spacer ties at equal cosine break to the smaller id). Hits 2/5
    // at probe-1; probe-2 reaches both buckets → 5/5.
    val spacers = (10L until 58L).map(i => (i, Array(-1.0f, 0.0f), 0))
    (Seq(
      (0L, Array(1.0f, 0.0f), 0),    // query + centroid A (rank 1)
      (1L, Array(0.8f, 0.6f), 0)) ++ // query, bucket A (cos .8 vs .6)
      spacers ++ Seq(
      (58L, Array(0.0f, 1.0f), 0),   // centroid B (rank 51)
      (59L, Array(0.6f, 0.8f), 0),   // bucket B — the cross-boundary miss
      (60L, Array(0.98f, 0.2f), 0))) // bucket A
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = NorthStarQueries.annRecall(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(r == Seq((0L, 2L, 5L, 0.4, 1.0), (1L, 2L, 5L, 0.4, 1.0)), s"got $r")
  }

  test("q104: one bucket means both probe depths are exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audit-emb1").toString
    // only vec 0 qualifies as a centroid -> nlist=1, every probe exact
    Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.5f, 0.5f), 0),
      (2L, Array(0.0f, 1.0f), 0),
      (3L, Array(-1.0f, 0.2f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = NorthStarQueries.annRecall(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(r.size == 4)
    // hits == |truth| == 3 non-self vectors for every query, at both depths
    assert(r.forall(t => t._2 == 3L && t._3 == 3L && t._4 == 0.6 && t._5 == 0.6))
  }

  test("q105: shared chunk survives only at its first (doc,chunk) occurrence") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audit-docs").toString
    val shared = (1 to 20).map(i => f"sh$i%02d")
    val uniqA = (1 to 20).map(i => f"ua$i%02d")
    val uniqB = (1 to 20).map(i => f"ub$i%02d")
    val rep = (1 to 20).map(i => f"rp$i%02d")
    Seq(
      // doc 0: [shared][uniqA]       -> both chunks first occurrences
      (0L, (shared ++ uniqA).mkString(" "), "en", "s0"),
      // doc 1: [uniqB][shared]       -> shared already seen in doc 0 chunk 0
      (1L, (uniqB ++ shared).mkString(" "), "en", "s0"),
      // doc 2: [rep][rep]            -> intra-doc dup, first of the two kept
      (2L, (rep ++ rep).mkString(" "), "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CurationQueries.chunkDedup(spark, dir)
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      (0L, "s0", 2L, 2L, 1.0),
      (1L, "s0", 2L, 1L, 0.5),
      (2L, "s1", 2L, 1L, 0.5)))
  }

  test("q106: pair counts weight by token frequency; 1-char tokens excluded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audit-bpe").toString
    // tf: ab->2, abc->1, x->1(excluded) => pairs ab: 2+1=3, bc: 1
    Seq((0L, "ab ab abc x", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = PipelineQueries.bpePairs(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("ab", 3L), ("bc", 1L)))
  }

  test("q107: vocabulary is the top-64 by frequency; OOV counts the tail") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audit-oov").toString
    // corpus: "hot" x10 (s0) + 70 singleton tokens t00..t69 split 35/35.
    // vocab = hot + t00..t62 (singleton ties break lexicographic), so s0's
    // tokens are all covered and s1 has exactly t63..t69 out of vocabulary.
    val s0 = (List.fill(10)("hot") ++ (0 to 34).map(i => f"t$i%02d")).mkString(" ")
    val s1 = (35 to 69).map(i => f"t$i%02d").mkString(" ")
    Seq((0L, s0, "en", "s0"), (1L, s1, "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = PipelineQueries.oovRate(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r == Seq(("s0", 45L, 0L, 0.0), ("s1", 35L, 7L, 0.2)))
  }

  test("q109: lossless codebook makes PQ exact, so recall is the bucket's share") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audit-pq").toString
    // every corpus vector EQUALS one of the codebook sample vectors (the
    // id-RANK 1 and 51 rows: id 0 = e1, id 50 = e2 among dense ids 0..52),
    // so PQ encoding is lossless and ADC == exact cosine — the only recall
    // loss left is the single-probe bucket restriction. Queries are ids
    // < 10: the e1 queries see the whole e1 bucket (ADC ties cut at
    // top-12 by smallest id still cover the 5 smallest-id truths) → 5/5;
    // the lone e2 query (id 2) probes bucket B = {50, 51, 52} → hits 3 of
    // its truth {50, 51, 52, 0, 1} → 3/5.
    val e1 = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Array.tabulate(64)(i => if (i == 1) 1.0f else 0.0f)
    val rows = (0L until 53L).map { i =>
      (i, if (i == 2L || i >= 50L) e2 else e1, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = NorthStarQueries.pqRecall(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    val want = (0L until 10L).map(q => if (q == 2L) (q, 3L, 0.6) else (q, 5L, 1.0))
    assert(r == want, s"got $r")
  }

  test("q110: NFC composes, controls strip, whitespace collapses — counted by hand") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audit-nfc").toString
    // "cafe" + combining acute + double space + x + NUL + y + trailing space
    // = 11 chars -> NFC composes é (10) -> NUL stripped (9) -> "  "->" "
    // (8) -> trim (7): delta 4, changed
    val dirty = "cafe\u0301  x\u0000y "
    Seq(
      (0L, dirty, "en", "s0"),
      (1L, "plain text", "en", "s0"),
      (2L, null.asInstanceOf[String], "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CurationQueries.normalizeRepair(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("s0", 3L, 1L, 4L)))
    // kernel: ASCII fast path returns the SAME instance; combining composes
    val ascii = org.apache.spark.unsafe.types.UTF8String.fromString("plain")
    assert(graft.expr.TextNormalize.nfc(ascii) eq ascii)
    assert(graft.expr.TextNormalize.nfc(
      org.apache.spark.unsafe.types.UTF8String.fromString("e\u0301")).toString == "\u00e9")
  }

  test("q111: tokens below the corpus-frequency floor mask; checksum pins the rewrite") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audit-rare").toString
    // corpus counts span BOTH surfaces: alice x3 (kept), cooper x2 /
    // stone x1 / x x1 (masked); events' k,v x3 (kept)
    Seq((1L, "alice cooper"), (2L, "alice stone"), (3L, "alice cooper x"))
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // the null-props row vanishes from the report on BOTH engines (the
    // explode drops it), so n_rows stays 3 — tokenless rows have no tokens
    // to audit, unlike q93 which counts every scanned row
    Seq((1L, Some("k v")), (2L, Some("k v")), (3L, Some("k v")), (4L, None))
      .toDF("event_id", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SelectionQueries.rareScrub(spark, dir)
      .as[(String, Long, Long, Long, Double, Long)].collect().toSeq
    def h60mod(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1000000007L
    }
    val ckCust = Seq("alice <RARE>", "alice <RARE>", "alice <RARE> <RARE>").map(h60mod).sum
    val ckEv = Seq.fill(3)("k v").map(h60mod).sum
    assert(r == Seq(
      ("customer", 3L, 7L, 4L, math.rint(4.0 / 7 * 1e6) / 1e6, ckCust),
      ("events", 3L, 6L, 0L, 0.0, ckEv)))
  }

  test("null/empty/whitespace docs flow through q105-q108 without errors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audit-edge").toString
    Seq(
      (0L, null.asInstanceOf[String], "en", "s0"),
      (1L, "", "en", "s0"),
      (2L, "   ", "en", "s0"),
      (3L, "ab ab cd", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // tokenless docs vanish from all four (explode/filter semantics match
    // the oracles: NULL/empty token arrays produce no rows)
    assert(CurationQueries.chunkDedup(spark, dir)
      .as[(Long, String, Long, Long, Double)].collect().toSeq ==
      Seq((3L, "s1", 1L, 1L, 1.0)))
    assert(PipelineQueries.bpePairs(spark, dir)
      .as[(String, Long)].collect().toSeq == Seq(("ab", 2L), ("cd", 1L)))
    assert(PipelineQueries.oovRate(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq ==
      Seq(("s1", 3L, 0L, 0.0)))
    // vocab: ab (2) id 1, cd (1) id 2 -> checksum 1*1 + 2*1 + 3*2 = 9
    assert(PipelineQueries.tokenIds(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq == Seq((3L, 3L, 9L)))
  }

  test("q108: vocab ids rank by frequency then lexicographically; OOV -> 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audit-ids").toString
    // tf: a:2 (id 1), b:1 (id 2), u00..u64 singletons -> u00..u61 get ids
    // 3..64; u62..u64 fall past the 64-token vocab -> id 0
    val tail = (0 to 64).map(i => f"u$i%02d")
    Seq(
      (0L, "b a a", "en", "s0"),
      (1L, tail.mkString(" "), "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = PipelineQueries.tokenIds(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    // doc 0: positions (1,2,3) x ids (2,1,1) -> 1*2 + 2*1 + 3*1 = 7
    // doc 1: u_i at pos i+1 with id i+3 for i <= 61, 0 past the vocab
    val ck1 = (0 to 61).map(i => (i + 1L) * (i + 3L)).sum
    assert(r == Seq((0L, 3L, 7L), (1L, 65L, ck1)))
  }

  test("q105: runt tails dedup by content; empty docs vanish") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audit-docs2").toString
    // 25-token docs: chunk 0 (20 toks) distinct, chunk 1 = identical 5-token
    // runt in both docs -> the runt dedups across docs despite n_chunk < W
    val tail = (1 to 5).map(i => f"tl$i%02d")
    val a = (1 to 20).map(i => f"aa$i%02d") ++ tail
    val b = (1 to 20).map(i => f"bb$i%02d") ++ tail
    Seq(
      (0L, a.mkString(" "), "en", "s0"),
      (1L, b.mkString(" "), "en", "s0"),
      (2L, "   ", "en", "s0")) // whitespace-only: zero tokens, no chunks
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CurationQueries.chunkDedup(spark, dir)
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      (0L, "s0", 2L, 2L, 1.0),
      (1L, "s0", 2L, 1L, 0.5)))
  }

  test("q117: BPE merges chain (later rounds see earlier products); ties lexicographic") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe-docs").toString
    // tf: aaab x2, aab x1. Hand trace:
    //  r1 pairs: (a,a)=2*2+1=5, (a,b)=2+1=3            -> merge (a,a) 5
    //  r2 seg aaab=[aa,a,b] aab=[aa,b]:
    //     (aa,a)=2, (a,b)=2, (aa,b)=1; tie 'a'<'aa'    -> merge (a,b) 2
    //  r3 seg aaab=[aa,ab] aab=[aa,b]: (aa,ab)=2,(aa,b)=1 -> merge (aa,ab) 2
    //  r4 seg aaab=[aaab] aab=[aa,b]: (aa,b)=1         -> merge (aa,b) 1
    //  r5: no pairs left -> induction stops early (4 of 6 rounds)
    Seq((0L, "aaab aaab aab", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = PipelineQueries.bpeInduct(spark, dir)
      .as[(Int, String, Long)].collect().toSeq
    assert(r == Seq((1, "a a", 5L), (2, "a b", 2L), (3, "aa ab", 2L),
      (4, "aa b", 1L)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("q117: greedy left-to-right fold never re-merges a fresh product in-pass") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe-docs2").toString
    // 'cccc': r1 counts 3 adjacent (c,c) pairs but the greedy re-segment
    // yields [cc, cc] (two non-overlapping merges), so r2 merges (cc,cc)
    Seq((0L, "cccc", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = PipelineQueries.bpeInduct(spark, dir)
      .as[(Int, String, Long)].collect().toSeq
    assert(r == Seq((1, "c c", 3L), (2, "cc cc", 1L)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("q118: encode report weights the final segmentation by word frequency") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe-docs3").toString
    // same vocabulary as the q117 trace, split across two sources; final
    // segmentation after the 4 possible merges ((a,a),(a,b),(aa,ab),(aa,b)):
    // both words collapse to a single symbol
    Seq((0L, "aaab aaab", "en", "s0"), (1L, "aab", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = PipelineQueries.bpeEncodeReport(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      ("s0", 2L, 8L, 2L, 4.0),   // both 'aaab's encode to 1 symbol
      ("s1", 1L, 3L, 1L, 3.0)))  // merge 4 (aa,b) collapses 'aab' too
    spark.sharedState.cacheManager.clearCache()
  }

  test("q116: funnel stages require strict order; gaps average exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("funnel-ev").toString
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    Seq(
      // u1: full conversion, gaps 10 s then 10 s
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // u2: click BEFORE the first view must not count; later click does (gap 5 s)
      (2L, "click", ts(5)), (2L, "view", ts(10)), (2L, "click", ts(15)),
      // u3: view then purchase with no click -> stalls at stage 1
      (3L, "view", ts(10)), (3L, "purchase", ts(20)),
      // u4: click with no view at all -> never enters the funnel
      (4L, "click", ts(5)),
      // u5: click at EXACTLY the view ts -> strict 'after' excludes it
      (5L, "view", ts(10)), (5L, "click", ts(10)),
      // noise event type is filtered at the scan
      (1L, "error", ts(25)))
      .toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = PipelineQueries.conversionFunnel(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    assert(r == Seq(
      ("1_view", 4L, 0.0),        // u1 u2 u3 u5
      ("2_click", 2L, 7.5),       // u1 gap 10, u2 gap 5
      ("3_purchase", 1L, 10.0)))  // u1 only (u3 never clicked)
    spark.sharedState.cacheManager.clearCache()
  }

  test("q116: an empty stage yields zero users and a 0.0 gap, not null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("funnel-ev2").toString
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    Seq((1L, "view", ts(10)), (2L, "purchase", ts(5)))
      .toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = PipelineQueries.conversionFunnel(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    assert(r == Seq(("1_view", 1L, 0.0), ("2_click", 0L, 0.0),
      ("3_purchase", 0L, 0.0)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("q129: cohorts by first day, same-day repeats collapse, gaps stay gaps") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cohort-ev").toString
    def ts(day: Long, sec: Long) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(day * 86400 + sec))
    Seq(
      // cohort day 0: u1 active days 0,1,3 (day 2 is a gap); u2 day 0 only
      (1L, ts(0, 10)), (1L, ts(1, 20)), (1L, ts(3, 30)),
      (2L, ts(0, 40)),
      // cohort day 1: u3 days 1,2; u4 day 1 twice (distinct must collapse)
      (3L, ts(1, 50)), (3L, ts(2, 60)),
      (4L, ts(1, 70)), (4L, ts(1, 80)))
      .toDF("user_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = PipelineQueries.cohortRetention(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (0L, 0L, 2L, 2L, 10000L), // both cohort-0 users on day 0 by definition
      (0L, 1L, 2L, 1L, 5000L),  // only u1 returns
      (0L, 3L, 2L, 1L, 5000L),  // gap day 2 has no row
      (1L, 0L, 2L, 2L, 10000L),
      (1L, 1L, 2L, 1L, 5000L))) // u4's double event counted once
    spark.sharedState.cacheManager.clearCache()
  }

  test("q131: screen thresholds at 2 shared grams; probe docs are excluded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bloom-docs").toString
    Seq(
      (100L, "the quick brown fox jumps high", "sP"), // the probe (id % 100 == 0)
      (1L, "the quick brown fox jumps over the lazy dog", "sA"), // 3 shared -> flagged
      (2L, "quick brown fox under a red sun", "sA"),             // 1 shared -> clean
      (3L, "completely unrelated text about spark catalyst plans", "sB"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = NorthStarQueries.bloomDecontamScreen(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("sA", 2L, 1L, 1L, 0L, 0L), // doc 1 flagged, doc 2 under threshold
      ("sB", 1L, 0L, 0L, 0L, 0L))) // probe source absent: 100 is not screened
    spark.sharedState.cacheManager.clearCache()
  }

  test("q132: EWMA chain and spike count replay the hand-traced integer fold") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ewma-ev").toString
    def ts(day: Long, sec: Long) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(day * 86400 + sec))
    // type a, days 0..4 with counts [4,4,4,20,4] written OUT of day order:
    // e=4e6 through day 2; day 3: 20e6 > 2*4e6 -> spike, e=(60e6+28e6)/10=8.8e6;
    // day 4: no spike, e=(12e6+61.6e6)/10=7.36e6
    val rows =
      (0L until 20L).map(i => ("a", ts(3, i))) ++
        (0L until 4L).flatMap(i => Seq(("a", ts(0, i)), ("a", ts(1, i)),
          ("a", ts(2, i)), ("a", ts(4, i)))) ++
        // type b: a single day is the fold's seed, never a spike
        (0L until 3L).map(i => ("b", ts(7, i)))
    rows.toDF("event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = PipelineQueries.ewmaTrend(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("a", 5L, 7360000L, 1L), ("b", 1L, 3000000L, 0L)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("q136: co-purchase pairs count distinct shared customers; the whale cap prunes pairs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("copurchase").toString
    // customers→suppliers: c1 {1,2,3}, c2 {1,2}, c3 {1,2}, c4 {3};
    // c1 buys supplier 1 twice across two orders (distinct must collapse)
    Seq((10L, 1L), (11L, 1L), (20L, 2L), (30L, 3L), (40L, 4L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 1L),
      (20L, 1L), (20L, 2L), (30L, 1L), (30L, 2L), (40L, 3L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = NorthStarQueries.coPurchasePairs(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L)))
    // whale pin: capping c1's basket at 2 keeps only its two SMALLEST
    // supplier ids, so every pair involving supplier 3 via c1 disappears
    val ps = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L))
      .toDF("c", "s")
    val capped = NorthStarQueries.coPurchaseProjection(ps, quota = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L, 2L)), s"capped basket must drop s=3 pairs: $capped")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q143: confidence divides by the antecedent, lift by both; support gate prunes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("assoc").toString
    // baskets (distinct customer→supplier): c1{1,2,6} c2{1,2} c3{1,2} c4{1}
    // c5{4,5} c6{4,5} c7{4,5} c8{4,5}; c1 buys supplier 1 twice (distinct
    // collapses). N=8. shared: (1,2)=3 (1,6)=1 (2,6)=1 (4,5)=4 — the <3
    // pairs prune. counts: n1=4 n2=3 n4=n5=4 n6=1.
    Seq((11L, 1L), (12L, 1L), (20L, 2L), (30L, 3L), (40L, 4L),
      (50L, 5L), (60L, 6L), (70L, 7L), (80L, 8L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((11L, 1L), (11L, 2L), (12L, 1L), (12L, 6L),
      (20L, 1L), (20L, 2L), (30L, 1L), (30L, 2L), (40L, 1L),
      (50L, 4L), (50L, 5L), (60L, 4L), (60L, 5L),
      (70L, 4L), (70L, 5L), (80L, 4L), (80L, 5L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = NorthStarQueries.associationRules(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // 1→2: conf 3·1e4 div 4 = 7500, lift 3·1e4·8 div 12 = 20000
    // 2→1: conf 10000, lift 20000; 4↔5: conf 10000, lift 4·1e4·8 div 16 = 20000
    // order: lift ties → conf desc → ante asc (2, 4, 5), then the 7500 rule
    assert(r == Seq(
      (2L, 1L, 3L, 3L, 4L, 10000L, 20000L),
      (4L, 5L, 4L, 4L, 4L, 10000L, 20000L),
      (5L, 4L, 4L, 4L, 4L, 10000L, 20000L),
      (1L, 2L, 3L, 4L, 3L, 7500L, 20000L)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("q143: the 256 basket cap binds on a whale customer end-to-end") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("assoc-whale").toString
    // whale c1 buys suppliers 0..299 (basket 300 > quota 256): the capped
    // basket keeps the 256 SMALLEST supplier ids, so c1's contribution to
    // the (0, 299) pair vanishes. c2/c3 buy {0, 299, 400, 401}, c4 buys
    // {400, 401}. Uncapped, (0, 299) has support 3 (c1+c2+c3) and would
    // lead the output (lift 13333, ante 0 sorts first); capped, its
    // support is 2 → pruned, and ONLY the (400, 401) rules survive:
    // shared 3, n_ante = n_cons = 3, conf 10000, lift 3·1e4·4 div 9 = 13333.
    val orders = Seq((100L, 1L), (200L, 2L), (300L, 3L), (400L, 4L))
    orders.toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val li = (0L until 300L).map(s => (100L, s)) ++
      Seq(200L, 300L).flatMap(o => Seq(0L, 299L, 400L, 401L).map(s => (o, s))) ++
      Seq((400L, 400L), (400L, 401L))
    li.toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = NorthStarQueries.associationRules(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (400L, 401L, 3L, 3L, 3L, 10000L, 13333L),
      (401L, 400L, 3L, 3L, 3L, 10000L, 13333L)),
      s"capped rules must exclude every whale-only pair: $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q146: slice-exclusive tokens out-lift shared ones; the tf floor hides rare") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("distinctive").toString
    // en: uniqen×5 both×5 rare×2 (ltot 12); fr: uniqfr×6 both×5 (ltot 11);
    // T=23. rare (tf 2) sits under the ≥5 floor despite infinite-ish lift.
    Seq(
      (1L, "en", "uniqen uniqen uniqen both both rare"),
      (2L, "en", "uniqen uniqen both both both rare"),
      (3L, "fr", "uniqfr uniqfr uniqfr both both both"),
      (4L, "fr", "uniqfr uniqfr uniqfr both both"))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = PipelineQueries.distinctiveTerms(spark, dir)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("fr", "uniqfr", 6L, 6L, 20909L),  // 6·23·1e4 div (6·11)
      ("en", "uniqen", 5L, 5L, 19166L),  // 5·23·1e4 div (5·12)
      ("fr", "both", 5L, 10L, 10454L),   // 5·23·1e4 div (10·11)
      ("en", "both", 5L, 10L, 9583L)))   // 5·23·1e4 div (10·12)
    spark.sharedState.cacheManager.clearCache()
  }

  test("q137: rolling WAU covers trailing 7 days; gap days report dau 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rolling-ev").toString
    def ts(day: Long, sec: Long) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(day * 86400 + sec))
    // u1 active days 0 and 3 (twice on 0 — distinct collapses); u2 days 0, 1
    Seq((1L, ts(0, 1)), (1L, ts(0, 2)), (1L, ts(3, 1)),
      (2L, ts(0, 3)), (2L, ts(1, 1)))
      .toDF("user_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = PipelineQueries.rollingActiveUsers(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (0L, 2L, 2L, 10000L),
      (1L, 1L, 2L, 5000L),
      (2L, 0L, 2L, 0L),   // nobody active, both in the trailing window
      (3L, 1L, 2L, 5000L)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("q140: transitions pair consecutive events; same-ts order breaks by event_id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("trans-ev").toString
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    Seq(
      // u1: view→click→view
      (1L, 10L, "view", ts(100)), (1L, 11L, "click", ts(200)), (1L, 12L, "view", ts(300)),
      // u2: view and click share ts 50 — event_id 20 < 21 orders view first
      (2L, 20L, "view", ts(50)), (2L, 21L, "click", ts(50)), (2L, 22L, "purchase", ts(60)),
      // u3: a single event contributes no transition
      (3L, 30L, "signup", ts(10)))
      .toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = PipelineQueries.eventTransitions(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("click", "purchase", 1L, 5000L), // click totals 2 across users
      ("click", "view", 1L, 5000L),
      ("view", "click", 2L, 10000L)))   // view's only destination
    spark.sharedState.cacheManager.clearCache()
  }

  test("q147: dwell quantiles interpolate the exact percentile; approx stays in band") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dwell-ev").toString
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    Seq(
      // u1 view→click delta 10s, then click→view 80s
      (1L, 10L, "view", ts(100)), (1L, 11L, "click", ts(110)), (1L, 12L, "view", ts(190)),
      // u2 view→click delta 20s; u3 delta 30s — odd group so the exact
      // interpolating p50 lands ON an element and the discrete
      // approx_percentile must agree (a 2-element group's interpolated
      // midpoint is a value no discrete sketch can return — not this
      // audit's regime; the oracled p50/p90 columns stay exact regardless)
      (2L, 20L, "view", ts(0)), (2L, 21L, "click", ts(20)),
      (3L, 30L, "view", ts(0)), (3L, 31L, "click", ts(30)))
      .toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = PipelineQueries.transitionLatency(spark, dir)
      .as[(String, String, Long, Double, Double, Boolean)].collect().toSeq
    // view→click deltas {10, 20, 30}: p50 = 20.0, p90 = 20 + 0.8·10 = 28.0
    assert(r == Seq(
      ("click", "view", 1L, 80.0, 80.0, true),
      ("view", "click", 3L, 20.0, 28.0, true)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("q149: weekday ids are epoch-day arithmetic; index is share vs uniform") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dow-ev").toString
    // 1970-01-01 (epoch day 0) was a THURSDAY → dow (0+3)%7 = 3 under the
    // 0=Monday encoding; 1970-01-05 (day 4) was a Monday → (4+3)%7 = 0.
    def at(day: Long, sec: Long) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(day * 86400 + sec))
    Seq(
      (1L, 1L, "view", at(0, 10)),  // Thu → dow 3
      (2L, 2L, "view", at(0, 20)),  // Thu → dow 3
      (3L, 3L, "view", at(4, 0)),   // Mon → dow 0
      (4L, 4L, "buy", at(6, 0)))    // Wed (1970-01-07) → dow 2
      .toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = PipelineQueries.weekdaySeasonality(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    // view: Thu 2 of 3 → 2·7·10000 div 3 = 46666; Mon 1 of 3 → 23333;
    // buy: its only day → 70000 (7× uniform)
    assert(r == Seq(
      ("buy", 2L, 1L, 70000L),
      ("view", 0L, 1L, 23333L),
      ("view", 3L, 2L, 46666L)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("q154: patterns are ordered containment per session; gap splits isolate journeys") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("patt-ev").toString
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    Seq(
      (1L, 10L, "view", ts(10)), (1L, 11L, "purchase", ts(20)),   // view→purchase
      (2L, 20L, "error", ts(10)), (2L, 21L, "purchase", ts(20)),  // error recovery
      (3L, 30L, "signup", ts(10)), (3L, 31L, "click", ts(20)),    // signup entry
      (4L, 40L, "view", ts(10)), (4L, 41L, "click", ts(20)),      // browse only
      // u4's SECOND session (past the 30-min gap): a bare purchase — counted
      // in total, matching no screen (no view precedes it in ITS session)
      (4L, 42L, "purchase", ts(7000)))
      .toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = PipelineQueries.sessionPatternScreen(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("browse_only", 1L, 2000L),
      ("error_recovery", 1L, 2000L),
      ("signup_entry", 1L, 2000L),
      ("view_to_purchase", 1L, 2000L)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("q156: known-item eval ranks by idf dominance, not raw tf — the trap doc loses") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mrr-docs").toString
    // doc 0 is the probe (doc_id % 100 == 0). Its query = [uniq0, 'aaa',
    // 'bbb'] (the 2 smallest distinct tokens). doc 1 is the TF TRAP: it
    // spams the common query terms — a scorer that weights term frequency
    // over idf (or mis-floors idf) ranks the trap first; correct BM25 puts
    // the tagged doc 0 on top because df=1 idf dwarfs df=3 idf.
    Seq(
      (0L, "aaa bbb ccc"),
      (1L, "aaa aaa aaa aaa bbb bbb bbb bbb"),
      (2L, "aaa bbb zzz"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = PipelineQueries.retrievalEval(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L, 1L, 10000L)), s"trap doc outranked the known item: $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q150: RFM splits at integer means; recency measures from the corpus anchor") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rfm").toString
    def day(d: Long) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(d * 86400))
    // c1: 2 orders (last day 10), qty 100; c2: 1 order day 10, qty 10;
    // c3: 1 order day 0, qty 10. anchor=10, n=3 → rbar=(30−20)div 3=3,
    // fbar=4 div 3=1, mbar=120 div 3=40.
    Seq((101L, 1L, day(10)), (102L, 1L, day(5)), (103L, 2L, day(10)),
        (104L, 3L, day(0)))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((101L, 30.0), (101L, 30.0), (102L, 40.0), (103L, 10.0), (104L, 10.0))
      .toDF("l_orderkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = PipelineQueries.rfmSegments(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("R0F0M0", 1L, 1L, 10L),   // c3: r_days 10 > 3
      ("R1F0M0", 1L, 1L, 10L),   // c2: recent but single small order
      ("R1F1M1", 1L, 2L, 100L))) // c1: 2 > fbar, 100 > mbar
    spark.sharedState.cacheManager.clearCache()
  }

  test("q141: paths cut at 5 events, split at the 30-min gap, tie-break by event_id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("paths-ev").toString
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val u1Long = Seq("view", "click", "view", "click", "purchase", "error", "signup")
      .zipWithIndex.map { case (t, i) => (1L, 10L + i, t, ts(100L + i)) }
    Seq(
      // u1 session 2 after a >30min silence: the same 2-path u2 produces
      (1L, 20L, "error", ts(100 + 7 + 1900)), (1L, 21L, "signup", ts(100 + 7 + 1901)),
      (2L, 30L, "error", ts(500)), (2L, 31L, "signup", ts(501)),
      // u3: equal timestamps — event_id 40 < 41 puts click before view
      (3L, 40L, "click", ts(700)), (3L, 41L, "view", ts(700))
    ).++(u1Long)
      .toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = PipelineQueries.sessionPaths(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(
      ("error>signup", 2L),                  // u1 session 2 + u2
      ("click>view", 1L),                    // u3 tie broken by id
      ("view>click>view>click>purchase", 1L) // u1's 7-event session cut at 5
    ))
    spark.sharedState.cacheManager.clearCache()
  }

  test("q130: planted spike flags at 3σ, flat types don't, peak ties break low") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("anom-ev").toString
    def ts(hr: Long, sec: Long) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(hr * 3600 + sec))
    val rows =
      // type a: hours 0..9 one event each, hour 10 spikes to 12
      // H=11 S=22 Q=154: spike (12·11−22)²=12100 > 9·(11·154−22²)=10890 → 3σ
      (0L to 9L).map(h => ("a", ts(h, 1))) ++
        (0L until 12L).map(i => ("a", ts(10, i))) ++
        // type b: two hours both count 5 — zero variance, peak tie → hour 3
        (0L until 5L).flatMap(i => Seq(("b", ts(3, i)), ("b", ts(7, i)))) ++
        // type c: a single hour can never be anomalous (0 > 0 is false)
        (0L until 4L).map(i => ("c", ts(2, i)))
    rows.toDF("event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = PipelineQueries.hourlyAnomalies(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("a", 11L, 1L, 1L, 10L, 12L),
      ("b", 2L, 0L, 0L, 3L, 5L),
      ("c", 1L, 0L, 0L, 2L, 4L)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("q164 mechanism: common-bigram docs land in head, rare-bigram docs " +
      "in tail; terciles are balanced and deterministic") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q164").toString
    // lang A: 6 docs — 4 made of one dominating bigram, one mixed, one of
    // bigrams that occur nowhere else (highest surprise → tail)
    val docs = Seq(
      (1L, "aa bb aa bb aa bb", "A"), (2L, "aa bb aa bb", "A"),
      (3L, "aa bb aa bb aa", "A"), (4L, "aa bb", "A"),
      (5L, "aa bb zz qq", "A"), (6L, "rare1 rare2 rare3", "A")
    ).toDF("doc_id", "text", "lang")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Round12Queries.perplexityBuckets(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val byBucket = out.map(r => r._2 -> r._3).toMap
    assert(byBucket == Map("head" -> 2L, "middle" -> 2L, "tail" -> 2L),
      s"6 docs must cut into 2/2/2 terciles, got $out")
    // the all-rare doc must be in the tail tercile: its mean nlp is the
    // language maximum, so max_nlp(tail) > max_nlp(head)
    val maxByBucket = Round12Queries.perplexityBuckets(spark, dir)
      .collect().map(r => r.getString(1) -> r.getDouble(4)).toMap
    assert(maxByBucket("tail") > maxByBucket("head"),
      s"surprise must increase head→tail: $maxByBucket")
    // determinism
    val again = Round12Queries.perplexityBuckets(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == again)
    spark.sharedState.cacheManager.clearCache()
  }

  test("q98: the audit sample rate is a live parameter — a smaller hex " +
      "threshold audits a strict subset") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    def sampleOf(hex: String): Long =
      PortableQueries.dedupRecall(spark, sf, sampleHex = hex)
        .select("n_sample").as[Long].head()
    val half = sampleOf(PortableQueries.Q98SampleHex) // "8000" = 50%
    val quarter = sampleOf("4000")
    assert(quarter < half && quarter > 0L,
      s"the 25% sample ($quarter) must be a strict nonempty subset of the 50% ($half)")
    spark.sharedState.cacheManager.clearCache()
  }
}
