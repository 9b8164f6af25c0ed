package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable sketch family — minhash, simhash, winnowing — built on
  * the one hash every SQL engine computes identically: md5. Each hash value
  * is the top 15 hex chars of the md5 digest read as a 60-bit integer, so it
  * fits a signed BIGINT everywhere (`conv(substr(md5(x),1,15),16,10)` in
  * Spark ≡ `('0x'||substr(md5(x),1,15))::BIGINT` in DuckDB/Trino).
  *
  * Why this exists alongside the fused xxhash64 kernels (graft.expr
  * .TextHashExpressions): the kernels are the throughput path — one pass
  * over the UTF8 bytes, no allocation — but their hash family is
  * JVM-specific, so their outputs can only be checked rows-only by an
  * external engine. This family trades raw speed for cross-engine
  * reproducibility: signatures, simhash bits and winnow fingerprints can be
  * recomputed bit-for-bit in plain SQL by an independent engine, which
  * turns the driver's DuckDB oracle into a full replication of the near-dup
  * pipeline (banding, pigeonhole blocking, verification thresholds — q63 -
  * q65), and at 100 TB lets an auditor spot-check any doc's sketch without
  * a JVM. Each sketch has two formulations: an expression-tree reference
  * built from codegen'd Catalyst built-ins (md5/conv/transform/array_min) —
  * the shape the SQL oracle mirrors — and a fused single-pass UDF the
  * queries run (one reused MessageDigest, 60-bit values read off digest
  * bytes), pinned element-for-element against the reference in
  * PortableSketchSpec.
  */
object PortableSketch {

  /** 60-bit portable hash: top 15 hex chars of md5 as a BIGINT. */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Second independent 60-bit hash from the SAME digest: hex chars 17-31
    * (bytes 8-15 of md5). One md5 yields both halves of the
    * Kirsch-Mitzenmacher double-hash family below. */
  def h60b(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 17, 15), 16, 10).cast("long")

  /** Double-hash minhash family: h_i(g) = (h1 + i·(h2 mod 2^56)) mod 2^60.
    * One md5 per gram for ALL k permutations (vs k seeded digests), and the
    * arithmetic stays strictly inside signed-64 range (h1 < 2^60,
    * i·h2' ≤ 15·2^56 < 2^60, sum < 2^61), so any engine's BIGINT computes
    * it without overflow — DuckDB's checked arithmetic included. */
  private[ops] val H2Mod = 1L << 56
  private[ops] val SigMod = 1L << 60

  // --- portable minhash ----------------------------------------------------

  /** k-permutation minhash signature from a MATERIALIZED gram-array column —
    * the expression-tree reference formulation of the double-hash family
    * (the SQL oracle mirrors this shape; queries run the fused UDF pinned
    * against it). Pass an attribute, not the shingling expression: an
    * expression captured inside a lambda re-evaluates per element/
    * permutation — Catalyst caches nothing across lambda invocations — so
    * inlining the shingles here would re-tokenize the document k times.
    * Grams come from TextOps.wordShingles, whose semantics (fewer than n
    * tokens collapse to one whole-text gram) make every signature total,
    * even for empty text. */
  def minhashSigFromGrams(grams: Column, k: Int): Column =
    // empty gram set → the empty-set minhash (all Long.MaxValue), matching
    // the fused kernel's fold-of-nothing; array_min over [] would yield
    // NULL elements instead (pipelines filter zero-gram docs before
    // signatures — this keeps the two spec-pinned forms element-equal on
    // ANY input, including zero-token texts)
    when(size(grams) === 0,
      array((0 until k).map(_ => lit(Long.MaxValue)): _*))
      .otherwise(array((0 until k).map { i =>
        array_min(transform(grams, g =>
          (h60(g) + lit(i.toLong) * (h60b(g) % lit(H2Mod))) % lit(SigMod)))
      }: _*))

  /** Fused single-pass signature: one reused MessageDigest, one md5 per
    * gram, both 60-bit halves read straight off the digest bytes, k affine
    * mins in a primitive loop. Pinned element-for-element against
    * minhashSigFromGrams in PortableSketchSpec. */
  private val minhashFused = udf { (grams: Seq[String], k: Int) =>
    if (grams == null) null
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val sig = Array.fill(k)(Long.MaxValue)
      grams.foreach { g =>
        val d = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h1 = beLong(d, 0) >>> 4
        val h2m = (beLong(d, 8) >>> 4) % H2Mod
        var i = 0
        while (i < k) {
          val v = (h1 + i * h2m) % SigMod
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      sig.toSeq
    }
  }

  def minhashSigFromGramsFast(grams: Column, k: Int): Column =
    minhashFused(grams, lit(k))

  /** Big-endian long from 8 digest bytes at `off`; >>> 4 of the first/second
    * half equals parsing md5 hex chars 1-15 / 17-31 — the cross-engine
    * definition (h60/h60b) without the hex round-trip. */
  /** JVM-side [[h60]] of a string — identical value to the Column form on
    * the same text (big-endian first 8 digest bytes >>> 4 ≡ parsing the top
    * 15 hex chars), for imperative kernels that must hash batch-identically
    * (the streaming language-ID scorer). */
  def h60String(s: String): Long =
    beLong(java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)), 0) >>> 4

  private def beLong(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xFFL) << 56) | ((d(off + 1) & 0xFFL) << 48) |
      ((d(off + 2) & 0xFFL) << 40) | ((d(off + 3) & 0xFFL) << 32) |
      ((d(off + 4) & 0xFFL) << 24) | ((d(off + 5) & 0xFFL) << 16) |
      ((d(off + 6) & 0xFFL) << 8) | (d(off + 7) & 0xFFL)

  /** Band key for positions [b*rows, (b+1)*rows): the signature slice joined
    * with commas — a STRING key on purpose (decimal rendering of integers is
    * identical across engines; xxhash64-of-json, which the fast path uses,
    * is not). */
  private[graft] def bandKey(sig: Column, b: Int, rows: Int): Column =
    array_join(transform(slice(sig, b * rows + 1, rows), _.cast("string")), ",")

  /** Portable MinHash+LSH near-duplicate pairs: identical pipeline shape to
    * Dedup.minhashNearDups (band explode → capped self-equi-join → estimate
    * screen) over the portable hash family. Returns (idA, idB, est_jaccard
    * rounded to 6) with idA < idB. */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
      k: Int = 16, bands: Int = 4, n: Int = 3, threshold: Double = 0.5,
      maxBucket: Int = 1024): DataFrame = {
    // two projections on purpose: "_grams" materializes the tokenize+shingle
    // work once per row before the k-permutation loop reads it k times
    // (CollapseProject leaves multi-referenced non-trivial aliases alone)
    graft.expr.GraftFunctions.ensureRegistered(df.sparkSession)
    // zero-gram (zero-token) docs take no part in the sketch relation — a
    // doc with no content shares nothing (the wordNGrams empty-set rule;
    // without the filter every empty doc holds the identical fold-of-
    // nothing signature and they all pair at estimate 1.0, which the
    // oracle's NULL-signature algebra rejects — a fuzz_diff find)
    val sigs = Partitioning.spread(df)
      .select(col(idCol).as("_id"),
        graft.expr.GraftFunctions.wordNGrams(col(textCol), n).as("_grams"))
      .where(size(col("_grams")) > 0)
      .select(col("_id"), minhashSigFromGramsFast(col("_grams"), k).as("_sig"))
      .persist() // compact sketch frame; band explode re-derives per branch
    nearDupsFromSigs(sigs, k, bands, threshold, maxBucket)
  }

  /** The banding + estimate stages of [[minhashNearDups]] over an ALREADY
    * COMPUTED `(_id, _sig)` signature frame — callers that need the
    * signatures for their own purposes (the q98 recall audit attaches them
    * to true pairs for per-band attribution) compute + persist ONE sketch
    * pass and feed it here instead of paying a second tokenize+hash sweep
    * inside this function. Persist lifecycle belongs to the caller. */
  def nearDupsFromSigs(sigs: DataFrame, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, maxBucket: Int = 1024): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    candidatePairsFromSigs(sigs, k, bands, maxBucket)
      .join(sigs.select(col("_id").as("idA"), col("_sig").as("sigA")), "idA")
      .join(sigs.select(col("_id").as("idB"), col("_sig").as("sigB")), "idB")
      .withColumn("est_jaccard",
        round(Dedup.minhashEstimate(col("sigA"), col("sigB"), k), 6))
      .where(col("est_jaccard") >= threshold)
      .select("idA", "idB", "est_jaccard")
  }

  /** The banding CANDIDATE stage alone — distinct (idA, idB) pairs sharing
    * at least one band key, BEFORE the estimate screen: what the S-curve
    * audit (q161) measures, since `1 − (1 − s^r)^b` models exactly this
    * stage. The PORTABLE key definition is the comma-joined decimal string
    * (what the SQL oracle replays), but the shuffled relation carries only
    * its xxhash64 — 8 bytes instead of ~70 (the narrow-intermediate rule).
    * Bucket equality groups are identical on both representations; a
    * 64-bit key collision could only MERGE two buckets, adding candidates
    * downstream screens filter, so outputs are unchanged. */
  def candidatePairsFromSigs(sigs: DataFrame, k: Int = 16, bands: Int = 4,
      maxBucket: Int = 1024): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val rows = k / bands
    val banded = sigs.select(col("_id"), explode(array((0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(bandKey(col("_sig"), b, rows)).as("key"))
    }: _*)).as("_b"))
    Dedup.cappedPairs(banded, maxBucket)
  }

  // --- portable simhash ----------------------------------------------------

  /** 60-lane bit-vote accumulation (the only genuinely imperative step; the
    * MATH — majority vote per bit over distinct-gram hashes, ties to 0 — is
    * what the SQL oracle replays, not this code). */
  private val vote60 = udf { (hs: Seq[Long]) =>
    if (hs == null || hs.isEmpty) 0L
    else {
      val votes = new Array[Int](60)
      hs.foreach { h =>
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      var out = 0L
      var b = 0
      while (b < 60) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      out
    }
  }

  /** Portable 60-bit simhash over distinct lowercased char n-grams — the
    * expression-tree reference formulation (what the SQL oracle mirrors). */
  def simhash60(text: Column, n: Int): Column =
    vote60(array_distinct(transform(TextOps.charShingles(text, n), g => h60(g))))

  /** Fused single-pass simhash: lowercase, walk distinct code-point n-grams,
    * one reused MessageDigest per row, vote inline. Pinned against
    * simhash60 in PortableSketchSpec. */
  private val simhashTextFused = udf { (textRaw: String, n: Int) =>
    if (textRaw == null) 0L // matches the expression form: vote60(null) = 0
    else {
      val t = textRaw.toLowerCase(java.util.Locale.ROOT)
      val cps = {
        val b = scala.collection.mutable.ArrayBuffer.empty[Int]
        var i = 0
        while (i < t.length) { b += i; i = t.offsetByCodePoints(i, 1) }
        b += t.length
        b.toArray
      }
      val nCp = cps.length - 1
      val grams =
        if (nCp < n) Iterator.single(t)
        else Iterator.range(0, nCp - n + 1).map(i => t.substring(cps(i), cps(i + n)))
      val md = java.security.MessageDigest.getInstance("MD5")
      val seen = scala.collection.mutable.HashSet.empty[String]
      val votes = new Array[Int](60)
      var any = false
      grams.foreach { g =>
        if (seen.add(g)) {
          any = true
          val h = beLong(md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8)), 0) >>> 4
          var b = 0
          while (b < 60) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
      }
      if (!any) 0L
      else {
        var out = 0L
        var b = 0
        while (b < 60) { if (votes(b) > 0) out |= (1L << b); b += 1 }
        out
      }
    }
  }

  def simhash60Fast(text: Column, n: Int): Column =
    simhashTextFused(text, lit(n))

  /** Portable simhash near-dups: block on 4×15-bit chunks, verify exact
    * hamming ≤ maxDistance. For maxDistance ≤ 3 the pigeonhole blocking is
    * LOSSLESS (≤3 differing bits leave at least one of the 4 chunks intact),
    * so — when no hot-bucket cap fires — the output provably equals the
    * brute-force all-pairs scan, which is exactly what the q64 DuckDB
    * oracle computes. */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
      n: Int = 5, maxDistance: Int = 3, maxBucket: Int = 1024): DataFrame = {
    require(maxDistance <= 3, "4-chunk pigeonhole blocking is exact only for hamming <= 3")
    val sh = Partitioning.spread(df)
      .select(col(idCol).as("_id"), simhash60Fast(col(textCol), n).as("_sh"))
      .persist()
    val chunked = sh.select(col("_id"), col("_sh"),
      explode(array((0 until 4).map { i =>
        struct(lit(i).as("chunk"),
          shiftright(col("_sh"), i * 15).bitwiseAND(lit(0x7FFFL)).as("key"))
      }: _*)).as("_b"))
    Dedup.cappedPairs(chunked, maxBucket, carry = Seq("_sh"))
      .withColumn("hamming", bit_count(col("_shA").bitwiseXOR(col("_shB"))))
      .where(col("hamming") <= maxDistance)
      .select("idA", "idB", "hamming")
  }

  // --- portable winnowing --------------------------------------------------

  /** Positional char-n-gram hash sequence — the winnowing input. Materialize
    * it as its own projection column (`.select(..., charGramHashes(...)
    * .as("_hs"))`) before calling winnowFromHashes on the attribute: inlined,
    * the whole sequence would re-hash once per window (lambda capture
    * re-evaluation), turning O(len·w) winnowing into O(len²·w). */
  def charGramHashes(text: Column, n: Int): Column =
    transform(TextOps.charShingles(text, n), g => h60(g))

  /** Winnowing fingerprint set (Schleimer/Wilkerson/Aiken): the distinct
    * minima of every w-window over the positional hash sequence `hs` (an
    * attribute — see charGramHashes). The fingerprint set is
    * tie-rule-independent (any window-min selection rule picks the same hash
    * VALUES), which is what makes it expressible in any engine's SQL.
    * Documents shorter than one window fingerprint to their global
    * minimum. */
  def winnowFromHashes(hs: Column, w: Int): Column =
    // empty guard: array_min of an empty array is null — an empty hash
    // sequence must fingerprint to [], matching winnowFromHashesFast
    // (unreachable via charGramHashes, which always emits >= 1 gram, but
    // both forms are public API and documented element-for-element equal)
    when(size(hs) === 0, typedLit(Seq.empty[Long]))
      .when(size(hs) < w, array(array_min(hs)))
      .otherwise(
        array_distinct(transform(sequence(lit(1), size(hs) - (w - 1)),
          i => array_min(slice(hs, i, lit(w))))))

  /** O(len) winnowing via a monotonic deque — same output as
    * winnowFromHashes (pinned element-for-element in PortableSketchSpec),
    * without the O(len·w) per-window slice/min and its allocation churn.
    * The expression-tree form stays as the executable spec the SQL oracle
    * mirrors; this is the path queries run. */
  private val slidingMinDistinct = udf { (hsSeq: Seq[Long], w: Int) =>
    if (hsSeq == null) null
    else {
      val hs = hsSeq.toArray
      if (hs.isEmpty) Seq.empty[Long]
      else if (hs.length < w) Seq(hs.min)
      else {
        val dq = new java.util.ArrayDeque[Int]()
        val out = scala.collection.mutable.LinkedHashSet.empty[Long] // first-occurrence order = array_distinct
        var i = 0
        while (i < hs.length) {
          while (!dq.isEmpty && hs(dq.peekLast) >= hs(i)) dq.removeLast()
          dq.addLast(i)
          if (dq.peekFirst <= i - w) dq.removeFirst()
          if (i >= w - 1) out += hs(dq.peekFirst)
          i += 1
        }
        out.toSeq
      }
    }
  }

  def winnowFromHashesFast(hs: Column, w: Int): Column =
    slidingMinDistinct(hs, lit(w))

  /** Fully fused text → winnow set: one pass that lowercases, walks char
    * n-grams by code point (matching UTF8String.substring semantics), md5s
    * each gram through ONE reused MessageDigest — reading the 60-bit value
    * straight off the digest bytes (big-endian first 8 bytes >>> 4 ≡ parsing
    * the top 15 hex chars), no hex-string round-trip, no materialized
    * hash array — and winnows with the monotonic deque. Pinned
    * element-for-element against charGramHashes→winnowFromHashes in
    * PortableSketchSpec; the cross-engine definition is unchanged. */
  private val winnowTextFused = udf { (textRaw: String, n: Int, w: Int) =>
    if (textRaw == null) null
    else {
      val t = textRaw.toLowerCase(java.util.Locale.ROOT)
      // code-point boundaries (Spark substring counts code points, not chars)
      val cps = {
        val b = scala.collection.mutable.ArrayBuffer.empty[Int]
        var i = 0
        while (i < t.length) { b += i; i = t.offsetByCodePoints(i, 1) }
        b += t.length
        b.toArray
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      def h60of(s: String): Long =
        beLong(md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)), 0) >>> 4
      val nCp = cps.length - 1
      val hs: Array[Long] =
        if (nCp < n) Array(h60of(t))
        else Array.tabulate(nCp - n + 1)(i => h60of(t.substring(cps(i), cps(i + n))))
      if (hs.length < w) Seq(hs.min)
      else {
        val dq = new java.util.ArrayDeque[Int]()
        val out = scala.collection.mutable.LinkedHashSet.empty[Long]
        var i = 0
        while (i < hs.length) {
          while (!dq.isEmpty && hs(dq.peekLast) >= hs(i)) dq.removeLast()
          dq.addLast(i)
          if (dq.peekFirst <= i - w) dq.removeFirst()
          if (i >= w - 1) out += hs(dq.peekFirst)
          i += 1
        }
        out.toSeq
      }
    }
  }

  def winnowText(text: Column, n: Int, w: Int): Column =
    winnowTextFused(text, lit(n), lit(w))

  /** Incremental near-dup ADMISSION: which new-batch documents may enter a
    * corpus that is already deduplicated? A batch doc is rejected when its
    * estimated Jaccard against any PRIOR document — any corpus doc, or a
    * smaller-id batch doc (deterministic arrival order within the batch) —
    * reaches `threshold`; everything else is admitted.
    *
    * This is the steady-state shape of training-data dedup at 100 TB: the
    * corpus is sketched ONCE (in production its band table is a persisted,
    * bucket-partitioned artifact that each arriving batch probes), and the
    * incremental cost is ∝ |batch| × bucket overlap. The candidate join is
    * deliberately asymmetric — batch bands probe (corpus ∪ smaller-id
    * batch) — so corpus×corpus pairs are never formed, unlike re-running
    * the full self-join dedup on corpus+batch, whose cost regrows with the
    * corpus every day. Skew guard: a batch doc needs only SOME prior
    * near-dup to be rejected, so each hot bucket keeps its `maxBucket`
    * smallest prior ids (deterministic; at hot-bucket scale those are
    * boilerplate-identical and any member witnesses the rejection).
    *
    * Returns the admitted rows of `batch`, schema unchanged. */
  def incrementalAdmit(
      corpus: DataFrame, batch: DataFrame, textCol: String, idCol: String,
      k: Int = 16, bands: Int = 4, n: Int = 3, threshold: Double = 0.5,
      maxBucket: Int = 1024): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val rows = k / bands
    graft.expr.GraftFunctions.ensureRegistered(corpus.sparkSession)
    // zero-gram docs are absent from BOTH sketch sides (minhashNearDups'
    // rule): an empty batch doc has no witness and stays ADMITTED via the
    // final anti-join, an empty corpus doc can't witness anything
    def sigs(df: DataFrame): DataFrame = Partitioning.spread(df)
      .select(col(idCol).as("_id"),
        graft.expr.GraftFunctions.wordNGrams(col(textCol), n).as("_grams"))
      .where(size(col("_grams")) > 0)
      .select(col("_id"), minhashSigFromGramsFast(col("_grams"), k).as("_sig"))
    // shuffled band keys are xxhash64 of the portable string key — same
    // 8-byte narrow-intermediate treatment (and output equivalence
    // argument) as minhashNearDups above
    def banded(s: DataFrame): DataFrame = s.select(col("_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), xxhash64(bandKey(col("_sig"), b, rows)).as("key"))
      }: _*)).as("_b"))
      .select(col("_id"), col("_b.band").as("_band"), col("_b.key").as("_key"))
    // both sketch frames are read twice (banding + estimate lookup); same
    // cache ownership rule as q66 — Verify/Bench clear after each query
    val sigB = sigs(batch).persist()
    val sigC = sigs(corpus).persist()
    val newBands = banded(sigB)
    val priorBands = banded(sigC).withColumn("_isCorpus", lit(true))
      .unionByName(newBands.withColumn("_isCorpus", lit(false)))
    // Hot-bucket cap on the PRIOR side only. The hot-key inventory comes
    // from a map-side-combined count (the cappedPairs mechanic) and is tiny
    // by construction, so it broadcasts back; rows in cold buckets (all but
    // pathologies) pass through UNSORTED, and only hot-bucket rows — the
    // rare boilerplate collapse — pay a per-bucket row_number. The previous
    // shape ran that window over the ENTIRE banded prior relation, a full
    // per-batch sort of the corpus that grows with the corpus, not the
    // batch.
    // Corpus rows rank FIRST in the cap window: batch rows in the prior
    // side only witness against LARGER batch ids (the join predicate
    // filters them for smaller probes), so if batch ids ranked ahead of
    // corpus ids in an overflowing bucket they could displace every usable
    // corpus witness and wrongly admit a probe — exactly in the hot-bucket
    // case the cap targets. _id tiebreak keeps the cap deterministic.
    val hotKeys = priorBands.groupBy(col("_band"), col("_key"))
      .agg(count(lit(1)).as("_n")).where(col("_n") > maxBucket)
      .select(col("_band").as("_hband"), col("_key").as("_hkey"))
    val flagged = priorBands.join(broadcast(hotKeys),
      col("_band") === col("_hband") && col("_key") === col("_hkey"),
      "left_outer")
    val byBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_band"), col("_key"))
      .orderBy(col("_isCorpus").desc, col("_id"))
    val cappedHot = flagged.where(col("_hband").isNotNull)
      .drop("_hband", "_hkey")
      .withColumn("_rk", row_number().over(byBucket))
      .where(col("_rk") <= maxBucket).drop("_rk")
    val capped = flagged.where(col("_hband").isNull).drop("_hband", "_hkey")
      .unionByName(cappedHot)
    val cand = newBands.as("nw")
      .join(capped.as("pr"),
        col("nw._band") === col("pr._band") && col("nw._key") === col("pr._key") &&
          (col("pr._isCorpus") || col("pr._id") < col("nw._id")))
      .select(col("nw._id").as("idNew"), col("pr._id").as("idOld")).distinct()
    val priorSigs = sigC.unionByName(sigB)
      .select(col("_id").as("idOld"), col("_sig").as("_sigOld"))
    val rejected = cand
      .join(sigB.select(col("_id").as("idNew"), col("_sig").as("_sigNew")), "idNew")
      .join(priorSigs, "idOld")
      .where(Dedup.minhashEstimate(col("_sigNew"), col("_sigOld"), k) >= threshold)
      .select(col("idNew").as("_rejId")).distinct()
    batch.join(rejected, col(idCol) === col("_rejId"), "left_anti")
  }
}
