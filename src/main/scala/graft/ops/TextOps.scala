package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, language ID, quality scoring, fingerprinting. All column
  * expressions are built-in Catalyst functions (whole-stage codegen; no
  * Python/Scala UDF in the hot path) so they scale to 100 TB scans —
  * per-document cost is linear in text length, no shuffle.
  */
object TextOps {

  /** Whitespace tokens, empties removed (leading blanks yield an empty first
    * split element — filtered, matching DuckDB's list_filter oracle). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Non-overlapping chunk-tile width shared by batch chunk dedup (q105)
    * and its streaming mirror. */
  val ChunkTileW = 20

  /** Tile each row's text into non-overlapping [[ChunkTileW]]-token chunks:
    * (carry…, chunk_idx, n_chunk, _chunk) — ONE definition serves the batch
    * q105 dedup and StreamingChunkDedup, so their tiling (and therefore
    * their digests) cannot drift. Tokenless rows produce no tiles (and
    * `sequence(0,-1,s)` throws, so the guard is required, not stylistic).
    * Pure per-row generator — streaming-safe, no state, no shuffle. */
  def chunkTiles(df: DataFrame, textCol: String, carry: Seq[String]): DataFrame =
    df.select(carry.map(col) :+ tokens(col(textCol)).as("_ts"): _*)
      .withColumn("_n", size(col("_ts")))
      .where(col("_n") >= 1)
      .withColumn("_start", explode(sequence(lit(0), col("_n") - 1, lit(ChunkTileW))))
      .select(carry.map(col) ++ Seq(
        (col("_start") / ChunkTileW).cast("long").as("chunk_idx"),
        least(lit(ChunkTileW), col("_n") - col("_start")).as("n_chunk"),
        concat_ws(" ", slice(col("_ts"), col("_start") + 1,
          least(lit(ChunkTileW), col("_n") - col("_start")))).as("_chunk")): _*)

  /** BPE-ish subword count: splits on word/number/punct boundaries the way
    * byte-pair tokenizers pre-segment (a contraction-aware GPT-2-style
    * pre-tokenization regex, simplified to what Java regex supports). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]+"), lit(0)))

  /** Character n-gram shingles of a lowercased text (the unit for MinHash /
    * Jaccard / fingerprinting). Uses sequence+transform — pure Catalyst. */
  def charShingles(text: Column, n: Int): Column = {
    val t = lower(text)
    when(length(t) < n, array(t)).otherwise(
      transform(sequence(lit(1), length(t) - (n - 1)), i => substring(t, i, lit(n))))
  }

  /** Word n-gram shingles (distinct), from whitespace tokens. Zero-token
    * text yields an EMPTY set (no degenerate "" gram — a document with no
    * tokens shares nothing; the expression kernel and the DuckDB oracles
    * agree, see TextHash.wordNGrams). */
  def wordShingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    array_distinct(
      when(size(ts) === 0, typedLit(Seq.empty[String]))
        .when(size(ts) < n, array(concat_ws(" ", ts)))
        .otherwise(transform(sequence(lit(0), size(ts) - n),
          i => concat_ws(" ", slice(ts, i + 1, lit(n))))))
  }

  // --- language ID (n-gram/stopword heuristic) -----------------------------

  /** Tiny per-language marker lexicons (public common stopwords). The score of
    * a language is the fraction of tokens found in its lexicon; CJK scripts
    * are detected by codepoint range first. Deterministic, dependency-free. */
  private val markers: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "in", "is", "a", "that", "for", "with", "as", "on", "are", "this", "it"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von", "für", "auf", "im"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "los", "se", "del", "las", "por", "un", "una", "con", "para"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "est", "en", "que", "une", "un", "du", "dans", "pour", "qui")
  )

  /** Per-language stopword hit counts → best guess. Implemented with
    * size(array_intersect(tokens, lexicon)) per language — still pure
    * Catalyst; ties break by language code, descending (struct max). Texts
    * with a majority of CJK characters classify as "zh". */
  def langId(text: Column): Column = {
    val ts = tokens(lower(text))
    val cjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
    val scores = markers.map { case (lang, lex) =>
      struct(size(array_intersect(ts, array(lex.toSeq.map(lit): _*))).as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(cjk * 2 > length(text), lit("zh"))
      .when(best.getField("hits") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  // --- quality scoring ------------------------------------------------------

  /** Heuristic document-quality features + composite score in [0,1]:
    * length band, punctuation ratio, digit ratio, mean token length,
    * repetition (distinct-token ratio). The standard cheap pre-filters a
    * training-data pipeline applies before expensive dedup/classification. */
  def qualityFeatures(text: Column): Column = {
    val ts = tokens(text)
    val nTok = size(ts)
    val nChar = length(text)
    val punct = size(regexp_extract_all(text, lit("[\\p{Punct}]"), lit(0)))
    val digits = size(regexp_extract_all(text, lit("[0-9]"), lit(0)))
    val distinctRatio = when(nTok > 0, size(array_distinct(ts)).cast("double") / nTok).otherwise(0.0)
    val meanTokLen = when(nTok > 0,
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok).otherwise(0.0)
    struct(
      nTok.as("n_tokens"),
      nChar.as("n_chars"),
      (punct.cast("double") / greatest(nChar, lit(1))).as("punct_ratio"),
      (digits.cast("double") / greatest(nChar, lit(1))).as("digit_ratio"),
      distinctRatio.as("distinct_ratio"),
      meanTokLen.as("mean_token_len"))
  }

  /** Composite score: 1 when all features are in healthy bands, decaying
    * multiplicatively outside them. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lenOk = when(f.getField("n_tokens").between(5, 100000), lit(1.0))
      .otherwise(f.getField("n_tokens").cast("double") / 5.0)
    val punctOk = lit(1.0) - least(f.getField("punct_ratio") * 2, lit(1.0))
    val digitOk = lit(1.0) - least(f.getField("digit_ratio") * 2, lit(1.0))
    val repOk = f.getField("distinct_ratio")
    round(least(lenOk, lit(1.0)) * punctOk * digitOk * (lit(0.5) + repOk / 2), 6)
  }

  /** The q82 Gopher rule set evaluated ARRAY-SIDE on one row — the
    * stateless form a streaming gate needs (no aggregation state, works in
    * append mode with no watermark). Integer arithmetic identical to the
    * relational q82 path: word count in [20,90], mean token length in
    * [4.0,5.0] as `sumlen*10 BETWEEN 40n AND 50n`, stopword fraction
    * ≤ 0.10, max-single-token fraction ≤ 0.15. The max-token count is
    * O(distinct·n) per row via interpreted HOFs — fine for bounded document
    * sizes on a stream; the batch path (CurationQueries.gopherRules) keeps
    * the relational shape for corpus scale. Tokenless docs are keep=false
    * (the batch rollup never sees them — explode drops the row). */
  def gopherFlags(text: Column): Column = {
    val ts = tokens(text)
    val n = size(ts).cast("long")
    val sumlen = aggregate(ts, lit(0L), (acc, t) => acc + length(t))
    val nstop = size(filter(ts, t => t.isin("the", "a"))).cast("long")
    val mx = coalesce(
      array_max(transform(array_distinct(ts), d => size(filter(ts, t => t === d)))),
      lit(0)).cast("long")
    val wcOk = n.between(20L, 90L)
    val mwlOk = sumlen * 10 >= n * 40 && sumlen * 10 <= n * 50
    val stopOk = nstop * 10 <= n
    val repOk = mx * 20 <= n * 3
    struct(
      n.as("n_tokens"),
      coalesce(wcOk, lit(false)).as("wc_ok"),
      coalesce(mwlOk, lit(false)).as("mwl_ok"),
      coalesce(stopOk, lit(false)).as("stop_ok"),
      coalesce(repOk, lit(false)).as("rep_ok"),
      coalesce(n > 0 && wcOk && mwlOk && stopOk && repOk, lit(false)).as("keep"))
  }

  // --- fingerprinting -------------------------------------------------------

  /** Bottom-k sketch fingerprint (winnowing-style): the k smallest xxhash64
    * values over character shingles. Robust to small edits; equal texts give
    * equal fingerprints; containment of sketches approximates containment of
    * documents. Pure Catalyst (sequence/transform/sort/slice). */
  def fingerprint(text: Column, shingle: Int = 8, k: Int = 16): Column =
    slice(array_sort(array_distinct(transform(charShingles(text, shingle), s => xxhash64(s)))), 1, k)

  /** Single 64-bit rolling-style document fingerprint: min shingle hash. */
  def fingerprint64(text: Column, shingle: Int = 8): Column =
    array_min(transform(charShingles(text, shingle), s => xxhash64(s)))

  // --- benchmark decontamination -------------------------------------------

  /** Contamination report: corpus documents sharing at least `minShared`
    * distinct word n-grams with any probe document (the benchmark-
    * decontamination primitive: probes = eval-set items, hits = training
    * documents to quarantine).
    *
    * Shape: both sides explode to (id, gram) and equi-join on the gram —
    * an inverted-index join whose shuffle carries (id, gram) pairs, never
    * documents; the count-distinct-per-pair aggregation clusters on the
    * pair key. The probe side is small by definition (an eval set) so the
    * join broadcasts it; corpus-side grams stream through. */
  /** Containment-scored contamination: like [[contamination]], but each
    * (corpus doc, probe) pair carries `containment` = |G(probe) ∩ G(doc)| /
    * |G(probe)| — the asymmetric overlap that symmetric Jaccard misses when
    * a SHORT benchmark item sits inside a LONG training document (the
    * common contamination shape: Jaccard divides by the big doc's gram
    * count and vanishes; containment divides by the probe's and saturates).
    * Same scale posture as [[contamination]]: inverted-index equi-join on
    * grams with the (small by definition) probe side broadcast, plus one
    * broadcast-joined probe gram total. */
  def containmentScores(
      corpus: DataFrame, corpusText: String, corpusId: String,
      probes: DataFrame, probeText: String, probeId: String,
      n: Int = 3, minShared: Int = 1): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(corpus.sparkSession)
    // graft_word_ngrams returns distinct grams (the fused wordShingles
    // kernel — the interpreted HOF tree dominated this query's scan
    // stage), so the per-pair join-match count IS the distinct shared-gram
    // count. Grams collapse to their 8-byte xxhash64 before the join —
    // hashes, never strings, in the broadcast (see contamination).
    // |G(probe)| is count(*) over the exploded frame, NOT
    // size(array) next to explode(array) in one projection: Catalyst
    // substitutes the generator child into sibling references,
    // re-tokenizing the probe once per EXPLODED ROW (measured 4 s vs
    // 0.2 s on 50 probes at sf0.1)
    val pgx = probes.select(col(probeId).as("probe_id"),
      explode(graft.expr.GraftFunctions.wordNGrams(col(probeText), n)).as("_g"))
      .select(col("probe_id"), xxhash64(col("_g")).as("_h"))
    val ptot = pgx.groupBy("probe_id").agg(count(lit(1)).as("_ptot"))
    val cs = Partitioning.spread(corpus).select(col(corpusId).as("doc_id"),
      explode(graft.expr.GraftFunctions.wordNGrams(col(corpusText), n)).as("_g"))
      .select(col("doc_id"), xxhash64(col("_g")).as("_h"))
    cs.join(broadcast(pgx), "_h")
      .where(col("doc_id") =!= col("probe_id"))
      .groupBy("doc_id", "probe_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .where(col("shared_ngrams") >= minShared)
      .join(broadcast(ptot), "probe_id")
      .withColumn("containment", round(col("shared_ngrams") / col("_ptot"), 6))
      .select("doc_id", "probe_id", "shared_ngrams", "containment")
  }

  /** EXACT-substring contamination: (corpus doc, probe) pairs sharing at
    * least one exact `w`-char window (lowercased; documents shorter than
    * `w` contribute their whole text as one window — charShingles'
    * fallback). The strongest contamination evidence: an n-gram overlap
    * can be coincidence, a long verbatim run cannot. Scale shape: both
    * sides explode to DISTINCT windows and collapse each to the
    * engine-portable 60-bit md5 hash (PortableSketch.h60) BEFORE the join
    * — broadcasts and shuffles carry 8-byte hashes, never window strings —
    * and count(1) over the hash equi-join IS the distinct shared-window
    * count. */
  def sharedWindows(
      corpus: DataFrame, corpusText: String, corpusId: String,
      probes: DataFrame, probeText: String, probeId: String,
      w: Int = 20): DataFrame = {
    def windows(df: DataFrame, text: String, id: String, as: String): DataFrame =
      Partitioning.spread(df).select(col(id).as(as),
        explode(array_distinct(charShingles(col(text), w))).as("_w"))
        .select(col(as), PortableSketch.h60(col("_w")).as("_h"))
    windows(corpus, corpusText, corpusId, "doc_id")
      .join(broadcast(windows(probes, probeText, probeId, "probe_id")), "_h")
      .where(col("doc_id") =!= col("probe_id"))
      .groupBy("doc_id", "probe_id")
      .agg(count(lit(1)).as("shared_windows"))
  }

  /** Bloom-filter decontamination screen — the fixed-size-broadcast scale
    * path for [[contamination]]: at 100 TB the probe-gram relation a direct
    * join must broadcast grows with the benchmark suite, while a Bloom
    * filter is a FIXED `mBits`-bounded structure whatever the probe count.
    * The filter is held as its set-bit POSITION SET (≤ mBits rows of one
    * int — the relational form of the bitmap; bit-packing into longs is an
    * engine-side micro-optimization this op skips so any engine replays it
    * exactly, and DuckDB's checked `<<` can't even form the 2^63 mask).
    * k = 4 positions per gram, sliced from the single engine-portable
    * 60-bit md5 hash at 14-bit strides (bits [14i, 14i+17) ⊂ 60 for
    * i ≤ 3) — no per-seed re-hash. A gram is a CANDIDATE iff all 4 of its
    * positions are set; no true member is ever missed (its own insertion
    * set exactly its own positions), so false negatives are structurally
    * zero and the op returns per-doc candidate AND exact counts so the
    * caller audits the false-positive rate the m/k/|probe| load implies.
    *
    * Returns (doc_id, bloom_shared, exact_shared) for every corpus doc
    * with at least one candidate or shared gram; `bloom_shared >=
    * exact_shared` by construction. Gram unit mirrors [[contamination]]
    * (distinct word n-grams, whole-text fallback), hashed h60 so the
    * positions are engine-portable.
    *
    * Scale: corpus grams collapse to 8-byte hashes at the scan; the
    * position relation broadcasts (≤ mBits ints); the only corpus-sized
    * shuffles are the two (doc, gram)-keyed aggregates. At production
    * scale raise mBits to hold the FP rate (load factor ≈ 1−e^(−4·|probe
    * grams|/mBits), per-gram FP ≈ load^4). */
  def bloomDecontam(
      corpus: DataFrame, corpusText: String, corpusId: String,
      probes: DataFrame, probeText: String, probeId: String,
      n: Int = 3, mBits: Int = 131072): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(corpus.sparkSession)
    def positions = (0 to 3).map(i =>
      expr(s"pmod(shiftright(g, ${14 * i}), $mBits)"))
    val pg = probes.select(
        explode(graft.expr.GraftFunctions.wordNGrams(col(probeText), n)).as("_g"))
      .select(PortableSketch.h60(col("_g")).as("g")).distinct()
    val bloomPos = pg.select(explode(array(positions: _*)).as("p")).distinct()
    // persist: feeds both the candidate screen and the exact audit.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val cg = Partitioning.spread(corpus).select(col(corpusId).as("doc_id"),
        explode(graft.expr.GraftFunctions.wordNGrams(col(corpusText), n)).as("_g"))
      .select(col("doc_id"), PortableSketch.h60(col("_g")).as("g")).persist()
    val bloomShared = cg.select(col("doc_id"), col("g"),
        explode(array(positions: _*)).as("p"))
      .join(broadcast(bloomPos), Seq("p"), "left_semi")
      .groupBy("doc_id", "g").agg(count(lit(1)).as("nhit"))
      .where(col("nhit") === 4)
      .groupBy("doc_id").agg(count(lit(1)).as("bloom_shared"))
    val exactShared = cg.join(broadcast(pg), Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("exact_shared"))
    bloomShared.join(exactShared, Seq("doc_id"), "full_outer")
      .na.fill(0L, Seq("bloom_shared", "exact_shared"))
  }

  def contamination(
      corpus: DataFrame, corpusText: String, corpusId: String,
      probes: DataFrame, probeText: String, probeId: String,
      n: Int = 3, minShared: Int = 2): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(corpus.sparkSession)
    // Fused gram kernel (see containmentScores) — both sides tokenize with
    // the codegen'd graft_word_ngrams, not the interpreted HOF tree — and
    // both sides collapse each gram to its 8-byte xxhash64 BEFORE the join
    // (the q59/q80 rule: shuffles and broadcasts move hashes, never gram
    // strings; a 64-bit collision perturbs a count with ~1e-9 odds at this
    // corpus's gram cardinality, and the string-equality oracle would catch
    // a hit). The kernel's grams are distinct per document, so each
    // (doc, probe, gram) triple is unique after the join and count(1) IS
    // the distinct shared-gram count — a map-side partial sum, where the
    // previous countDistinct shuffled the full gram-string triples.
    val cs = Partitioning.spread(corpus).select(col(corpusId).as("doc_id"),
      explode(graft.expr.GraftFunctions.wordNGrams(col(corpusText), n)).as("_g"))
      .select(col("doc_id"), xxhash64(col("_g")).as("_h"))
    val ps = probes.select(col(probeId).as("probe_id"),
      explode(graft.expr.GraftFunctions.wordNGrams(col(probeText), n)).as("_g"))
      .select(col("probe_id"), xxhash64(col("_g")).as("_h"))
    cs.join(broadcast(ps), "_h")
      .where(col("doc_id") =!= col("probe_id"))
      .groupBy("doc_id", "probe_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .where(col("shared_ngrams") >= minShared)
  }

  // --- content-defined chunking (CDC) ---------------------------------------

  /** CDC parameters, shared verbatim with the SQL oracle: boundary-test
    * window width (chars), boundary modulus (expected gap ≈ mask), and the
    * greedy minimum chunk length. Expected chunk length ≈ minLen + mask.
    * Single source: [[graft.expr.CdcKernel]] (the fused boundary kernel
    * reads them at class-load; re-exported here for the oracle builders). */
  val CdcW: Int = graft.expr.CdcKernel.W
  val CdcMask: Int = graft.expr.CdcKernel.Mask
  val CdcMinLen: Int = graft.expr.CdcKernel.MinLen

  /** Content-defined chunking: split each row's text at positions where the
    * rolling window's content hash satisfies `h60(window) % CdcMask == 0`,
    * greedily skipping boundaries closer than [[CdcMinLen]] to the previous
    * accepted one — the Rabin/FastCDC boundary rule reduced to its
    * deterministic, engine-portable core. Because boundaries are a function
    * of CONTENT, an edited copy re-synchronizes at the first boundary BOTH
    * greedy folds accept, after which every chunk hashes identically
    * (CdcPropertySpec pins this as a conditional theorem: the fold's whole
    * state is "last accepted boundary", so a shared acceptance makes the
    * remainders the same computation; min-length gating can in principle
    * keep two folds out of phase, but in practice they re-sync within
    * ~minLen+mask chars — the q171 replicas measure dup rate 1.0). Fixed
    * tiles ([[chunkTiles]], q105) lack the property by construction (one
    * inserted token shifts every tile).
    *
    * Returns (carry…, chunk_idx, chunk_len, _h) with `_h` the chunk's h60
    * digest. No max-length rule: a boundary-free run yields one chunk per
    * document — the honest degenerate case, documented rather than patched
    * with a positional cut that would break the re-sync property.
    *
    * Shape: pure per-row generator — the candidate scan + greedy fold run
    * inside the fused [[graft.expr.CdcKernel]] expression (one UTF-8 byte
    * walk, one reused MessageDigest — the per-position substring/hex/conv
    * expression tree it replaced allocated per CHARACTER and dominated the
    * sf1.0 CDC drill; CdcKernelSpec pins the kernel against that reference
    * formulation on adversarial corpora), and only (carry, 8-byte digest,
    * len) rows leave the scan. Streaming-safe: no state, no shuffle. */
  def cdcChunks(df: DataFrame, textCol: String, carry: Seq[String]): DataFrame = {
    val t = col("_t")
    graft.expr.GraftFunctions.ensureRegistered(df.sparkSession)
    df.select(carry.map(col) :+ col(textCol).as("_t"): _*)
      .withColumn("_ends", call_function("graft_cdc_ends", t))
      .where(size(col("_ends")) >= 1)
      .withColumn("_j", explode(sequence(lit(1), size(col("_ends")))))
      .withColumn("_s",
        when(col("_j") === 1, lit(0)).otherwise(element_at(col("_ends"), col("_j") - 1)))
      .withColumn("_e", element_at(col("_ends"), col("_j")))
      .select(carry.map(col) ++ Seq(
        (col("_j") - 1).cast("long").as("chunk_idx"),
        (col("_e") - col("_s")).cast("long").as("chunk_len"),
        PortableSketch.h60(col("_t").substr(col("_s") + 1, col("_e") - col("_s")))
          .as("_h")): _*)
  }

  /** REFERENCE formulation of the CDC boundary rule — the original
    * per-position expression tree (sequence → h60-per-window transform →
    * filter → greedy lambda fold → tail close), kept verbatim so
    * CdcKernelSpec can pin the fused [[graft.expr.CdcKernel]] against it
    * on adversarial corpora (the PortableSketch fused-vs-reference
    * discipline). Semantics contract: chunk END char positions, 1-based;
    * empty array for empty text. Never used on a hot path. */
  private[graft] def cdcEndsReference(t: Column): Column = {
    val cands = when(length(t) >= CdcW,
      filter(
        transform(sequence(lit(CdcW), length(t)),
          i => when(pmod(PortableSketch.h60(
            t.substr(i - lit(CdcW - 1), lit(CdcW))), lit(CdcMask)) === 0, i)),
        x => x.isNotNull))
      .otherwise(array().cast("array<int>"))
    val bs = aggregate(cands, array(lit(0)),
      (acc, x) => when(x - element_at(acc, -1) >= CdcMinLen,
        concat(acc, array(x))).otherwise(acc))
    when(length(t) > element_at(bs, -1),
      concat(slice(bs, lit(2), size(bs) - 1), array(length(t))))
      .otherwise(slice(bs, lit(2), size(bs) - 1))
  }

  // --- maximal exact duplicated runs (seed-and-extend ExactSubstr) ----------

  /** MAXIMAL exact duplicated runs — the length-free completion of the
    * stride-1 window family (CurationQueries q124/q125): Lee et al.'s
    * ExactSubstr removes duplicated runs of any length ≥ a threshold with
    * EXACT boundaries; this op reports, for every ordered pair of
    * occurrences, the maximal run itself. One row per (id_a, id_b,
    * diagonal) maximal run of length ≥ `w + stride − 1`, with exact
    * 1-based inclusive char spans in both documents.
    *
    * Seed-and-extend (the suffix-array result re-expressed as joins):
    *  1. SEEDS — every stride-aligned w-char window, hashed h60, joined
    *     against the stride-1 window relation of the whole corpus (the
    *     q124 relation — built once, hash-partitioned, both sides read the
    *     same exchange). Any shared run of length ≥ w + stride − 1
    *     contains a stride-aligned window in each copy, so every such run
    *     seeds; the detection threshold is exact and alignment-free.
    *  2. DIAGONAL CLUSTERING — matched seed positions grouped per (id_a,
    *     id_b, posA − posB); consecutive in-run seeds differ by exactly
    *     `stride`, and seeds of DISTINCT runs on one diagonal are ≥ w+1
    *     apart (a run gap implies a failed window between), so clusters
    *     split exactly at gaps > stride. Cluster [min, max] brackets the
    *     run to within stride−1 chars on each side.
    *  3. VERIFY + EXTEND — per cluster, one substring equality over the
    *     seeded core rejects h60 collisions (both engines hash md5, so an
    *     oracle replays even the collision behavior), then ≤ stride−1
    *     char comparisons per side recover the exact maximal boundaries.
    *
    * Scale shape: the window relation is the q124 O(corpus chars) honest
    * cost; seeds are 1/stride of it — `stride` is the knob trading shuffle
    * volume against the minimum detectable run (w + stride − 1). The pair
    * join is output-proportional in TRUE matches; a corpus-hot window
    * (boilerplate shared by m docs) fans out m²/stride pairs — the
    * documented skew exposure (same as any ExactSubstr all-pairs result,
    * which genuinely HAS m² runs); AQE skew-split handles the residual.
    * Cluster rows are run-proportional; the verify/extend joins carry text
    * only to run rows, never through the shuffle.
    *
    * Reference: Lee et al. 2021 §4.1 (ExactSubstr, suffix-array dedup);
    * MaximalRunSpec pins equality against a plain-Scala diagonal-walk
    * reference on planted and random corpora. */
  def maximalDupRuns(docs: DataFrame, textCol: String, idCol: String,
      w: Int = 40, stride: Int = 8): DataFrame =
    maximalDupRunsHandle(docs, textCol, idCol, w, stride)._1

  /** Handle variant of [[maximalDupRuns]] (the StreamingSplit
    * .assignBatchHandle contract): returns (result, release). The window
    * relation it persists is O(corpus chars) — by far the largest cached
    * frame in the engine — so a long-lived session MUST call release()
    * once the result is materialized; the one-shot [[maximalDupRuns]]
    * relies on the caller's per-query cache clear (Verify/Bench do). */
  def maximalDupRunsHandle(docs: DataFrame, textCol: String, idCol: String,
      w: Int = 40, stride: Int = 8): (DataFrame, () => Unit) = {
    require(w >= 2, s"w=$w must be >= 2")
    require(stride >= 1 && stride < w, s"stride=$stride must be in [1, w)")
    val minRun = w + stride - 1
    val base = Partitioning.spread(docs)
      .select(col(idCol).as("_id"), col(textCol).as("_t"),
        length(col(textCol)).cast("long").as("_len"))
    graft.expr.GraftFunctions.ensureRegistered(docs.sparkSession)
    // fused window kernel (graft.expr.WinKernel): one byte walk + one
    // reused digest per document instead of a substring/hex/conv
    // expression tree per POSITION — same md5, same hashes, oracle
    // untouched (WinHashesSpec pins fused == reference)
    val wins = base.where(col("_len") >= w)
      .select(col("_id"),
        posexplode(call_function("graft_win_hashes", col("_t"), lit(w)))
          .as(Seq("_p0", "_h")))
      .select(col("_id"), (col("_p0") + 1).cast("long").as("_pos"), col("_h"))
      .repartition(col("_h"))
      .persist() // seeds are a filter of this SAME relation: one exchange
    val seeds = wins.where(((col("_pos") - 1) % stride) === 0)
    // orientation: the seed side is the lexicographically smaller
    // occurrence — each direction of a run seeds symmetrically, so keeping
    // one costs nothing and dedupes the (A,B)/(B,A) double report
    val pairs = seeds.as("a").join(wins.as("b"),
        col("a._h") === col("b._h") &&
          (col("a._id") < col("b._id") ||
            (col("a._id") === col("b._id") && col("a._pos") < col("b._pos"))))
      .select(col("a._id").as("_ida"), col("b._id").as("_idb"),
        (col("a._pos") - col("b._pos")).as("_diag"),
        col("a._pos").as("_apos"))
      .distinct()
    val byDiag = org.apache.spark.sql.expressions.Window
      .partitionBy("_ida", "_idb", "_diag").orderBy("_apos")
    val clusters = pairs
      .withColumn("_brk",
        when(coalesce(col("_apos") - lag("_apos", 1).over(byDiag),
          lit(Long.MaxValue)) > stride, 1L).otherwise(0L))
      .withColumn("_cid", sum("_brk").over(byDiag))
      .groupBy("_ida", "_idb", "_diag", "_cid")
      .agg(min("_apos").as("_amin"), max("_apos").as("_amax"))
    val withTexts = clusters
      .join(base.select(col("_id").as("_ida"), col("_t").as("_ta"),
        col("_len").as("_la")), Seq("_ida"))
      .join(base.select(col("_id").as("_idb"), col("_t").as("_tb"),
        col("_len").as("_lb")), Seq("_idb"))
      .withColumn("_bmin", col("_amin") - col("_diag"))
      .withColumn("_bmax", col("_amax") - col("_diag"))
    val coreLen = (col("_amax") - col("_amin") + w).cast("int")
    val verified = withTexts.where(
      col("_ta").substr(col("_amin").cast("int"), coreLen) ===
        col("_tb").substr(col("_bmin").cast("int"), coreLen))
    // boundary extension: the first failing offset in 1..stride−1 (either
    // a char mismatch or running off a document edge via lim) caps the
    // extension; no failure means the full stride−1 (the cluster-bracket
    // guarantee makes more impossible). `k > lim` dominates its OR, so the
    // out-of-range substr operand is never load-bearing — engine-portable.
    def ext(lim: Column, posA: Column, posB: Column, dir: Int): Column =
      if (stride <= 1) lit(0L)
      else {
        val fails = filter(sequence(lit(1L), lit((stride - 1).toLong)), k =>
          (k > lim) ||
            col("_ta").substr((posA + k * dir).cast("int"), lit(1)) =!=
              col("_tb").substr((posB + k * dir).cast("int"), lit(1)))
        coalesce(get(fails, lit(0)) - 1, lit((stride - 1).toLong))
      }
    val limL = least(lit((stride - 1).toLong),
      col("_amin") - 1, col("_bmin") - 1)
    val limR = least(lit((stride - 1).toLong),
      col("_la") - (col("_amax") + (w - 1)),
      col("_lb") - (col("_bmax") + (w - 1)))
    val result = verified
      .withColumn("_extl", ext(limL, col("_amin"), col("_bmin"), -1))
      .withColumn("_extr", ext(limR, col("_amax") + lit((w - 1).toLong),
        col("_bmax") + lit((w - 1).toLong), 1))
      .select(col("_ida").as("id_a"), col("_idb").as("id_b"),
        (col("_amin") - col("_extl")).cast("long").as("a_s"),
        (col("_amax") + (w - 1) + col("_extr")).cast("long").as("a_e"),
        (col("_bmin") - col("_extl")).cast("long").as("b_s"),
        (col("_bmax") + (w - 1) + col("_extr")).cast("long").as("b_e"),
        (col("_amax") - col("_amin") + w + col("_extl") + col("_extr"))
          .cast("long").as("run_len"),
        (col("_amax") - col("_amin") + w).cast("long").as("seeded_len"))
      .where(col("run_len") >= minRun)
    (result, () => { wins.unpersist(); () })
  }

  // --- convenience: full annotation pass -----------------------------------

  /** One projection adding all text-analysis columns — a single scan, no
    * shuffle; every expression codegen'd. */
  def annotate(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_bpeish_tokens", bpeishTokenCount(t))
      .withColumn("lang_guess", langId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fp64", fingerprint64(t))
  }
}
