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
  * a JVM. Everything below is built from codegen'd Catalyst built-ins
  * (md5/conv/transform/array_min) — no UDF in the minhash or winnow paths.
  */
object PortableSketch {

  /** 60-bit portable hash: top 15 hex chars of md5 as a BIGINT. */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: hash of "<seed>:<value>" — the per-permutation family
    * for minhash (same construction is one string-concat in any engine). */
  def h60Seeded(seed: Int, c: Column): Column = h60(concat(lit(s"$seed:"), c))

  // --- portable minhash ----------------------------------------------------

  /** k-permutation minhash signature from a MATERIALIZED gram-array column
    * (pass an attribute, not the shingling expression: an expression
    * captured inside a lambda re-evaluates per element/permutation — Catalyst
    * caches nothing across lambda invocations — so inlining the shingles
    * here would re-tokenize the document k times). Grams come from
    * TextOps.wordShingles, whose semantics (fewer than n tokens collapse to
    * one whole-text gram) make every signature total, even for empty text. */
  def minhashSigFromGrams(grams: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(grams, g => h60Seeded(i, g)))
    }: _*)

  /** Band key for positions [b*rows, (b+1)*rows): the signature slice joined
    * with commas — a STRING key on purpose (decimal rendering of integers is
    * identical across engines; xxhash64-of-json, which the fast path uses,
    * is not). */
  private def bandKey(sig: Column, b: Int, rows: Int): Column =
    array_join(transform(slice(sig, b * rows + 1, rows), _.cast("string")), ",")

  /** Portable MinHash+LSH near-duplicate pairs: identical pipeline shape to
    * Dedup.minhashNearDups (band explode → capped self-equi-join → estimate
    * screen) over the portable hash family. Returns (idA, idB, est_jaccard
    * rounded to 6) with idA < idB. */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
      k: Int = 16, bands: Int = 4, n: Int = 3, threshold: Double = 0.5,
      maxBucket: Int = 1024): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val rows = k / bands
    // two projections on purpose: "_grams" materializes the tokenize+shingle
    // work once per row before the k-permutation loop reads it k times
    // (CollapseProject leaves multi-referenced non-trivial aliases alone)
    val sigs = Partitioning.spread(df)
      .select(col(idCol).as("_id"), TextOps.wordShingles(col(textCol), n).as("_grams"))
      .select(col("_id"), minhashSigFromGrams(col("_grams"), k).as("_sig"))
      .persist() // compact sketch frame; band explode re-derives per branch
    val banded = sigs.select(col("_id"), explode(array((0 until bands).map { b =>
      struct(lit(b).as("band"), bandKey(col("_sig"), b, rows).as("key"))
    }: _*)).as("_b"))
    Dedup.cappedPairs(banded, maxBucket)
      .join(sigs.select(col("_id").as("idA"), col("_sig").as("sigA")), "idA")
      .join(sigs.select(col("_id").as("idB"), col("_sig").as("sigB")), "idB")
      .withColumn("est_jaccard",
        round(Dedup.minhashEstimate(col("sigA"), col("sigB"), k), 6))
      .where(col("est_jaccard") >= threshold)
      .select("idA", "idB", "est_jaccard")
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

  /** Portable 60-bit simhash over distinct lowercased char n-grams. */
  def simhash60(text: Column, n: Int): Column =
    vote60(array_distinct(transform(TextOps.charShingles(text, n), g => h60(g))))

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
      .select(col(idCol).as("_id"), simhash60(col(textCol), n).as("_sh"))
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
    when(size(hs) < w, array(array_min(hs))).otherwise(
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
      def h60of(s: String): Long = {
        md.reset()
        val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val be = ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
          ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
          ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
          ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
        be >>> 4
      }
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
}
