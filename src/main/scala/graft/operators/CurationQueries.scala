package graft.operators

import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 curation operators: the document-filtering and corpus-shaping
  * verbs of an LLM pretraining pipeline that the earlier rounds hadn't
  * covered — rule-based quality gating (Gopher/C4-style), chunking for
  * context-window preparation, statistical-LM quality scoring (the CCNet
  * recipe), token-entropy profiling, and temperature-scaled source mixing
  * (the data-mix math). Each is DuckDB-oracled; floating-point surfaces
  * follow the §2.5 canonicalization conventions (integer-arithmetic rule
  * thresholds where exactness matters, ROUND elsewhere).
  */
object CurationQueries {
  import ContractQueries.table

  /** q82 — Gopher-style rule gate, rolled up per language. Four rules per
    * document — word count in [20,90], mean token length in [4.0,5.0],
    * stopword fraction ≤ 0.10, max-single-token fraction ≤ 0.15 — each
    * evaluated in INTEGER arithmetic (`sumlen*10 BETWEEN 40*n AND 50*n`
    * instead of a float mean), so the keep decision has no float boundary
    * for the oracle to disagree on. Scale shape: the exploded token frame
    * aggregates immediately to (doc, token) counts, then to per-doc stats,
    * then to the per-language rollup — three shuffles, each one strictly
    * smaller, nothing corpus-sized retained. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("_ts"))
      .select(col("doc_id"), col("lang"), explode(col("_ts")).as("w"))
    val byTok = toks.groupBy("doc_id", "lang", "w")
      .agg(count(lit(1)).as("c"), sum(length(col("w"))).as("lensum"))
    val perDoc = byTok.groupBy("doc_id", "lang").agg(
      sum("c").as("n"), sum("lensum").as("sumlen"),
      sum(when(col("w").isin("the", "a"), col("c")).otherwise(0L)).as("nstop"),
      max("c").as("mx"))
    val rules = perDoc.select(col("lang"),
      col("n").between(20, 90).cast("long").as("wc_ok"),
      (col("sumlen") * 10 >= col("n") * 40 && col("sumlen") * 10 <= col("n") * 50)
        .cast("long").as("mwl_ok"),
      (col("nstop") * 10 <= col("n")).cast("long").as("stop_ok"),
      (col("mx") * 20 <= col("n") * 3).cast("long").as("rep_ok"))
    rules.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(col("wc_ok") * col("mwl_ok") * col("stop_ok") * col("rep_ok")).as("n_keep"),
      sum(lit(1L) - col("wc_ok")).as("v_wordcount"),
      sum(lit(1L) - col("mwl_ok")).as("v_meanlen"),
      sum(lit(1L) - col("stop_ok")).as("v_stopword"),
      sum(lit(1L) - col("rep_ok")).as("v_repetition"))
      .orderBy("lang")
  }

  private val ChunkW = 20 // tokens per chunk
  private val ChunkS = 15 // stride (overlap = W - S = 5)

  /** q83 — context-window chunking: each document split into overlapping
    * token windows (W=20, stride=15), the preparation step that turns a
    * cleaned corpus into training sequences / RAG passages. Every chunk's
    * full content is pinned by an md5 over its space-joined tokens, so the
    * oracle certifies the exact slice boundaries, not just counts. Scale
    * shape: a pure per-row map (explode of a bounded start sequence + array
    * slice) — the only exchanges are the deliberate `spread` round-robin
    * (distribute per-row compute off a single input file) and the output
    * sort; tokens materialize as a column BEFORE the generator projection
    * so the split never re-evaluates per exploded row (the q78
    * explode-sibling trap). */
  def docChunks(spark: SparkSession, dir: String): DataFrame = {
    val tk = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), TextOps.tokens(col("text")).as("_ts"))
      .select(col("doc_id"), col("_ts"), size(col("_ts")).as("_n"))
      // a tokenless doc has no chunks — and Spark's sequence(0, -1, step)
      // THROWS (Illegal sequence boundaries) rather than returning empty,
      // so without this guard one empty document kills its whole task
      .where(col("_n") >= 1)
    tk.select(col("doc_id"), col("_ts"), col("_n"),
      explode(sequence(lit(0), col("_n") - 1, lit(ChunkS))).as("_start"))
      .select(
        col("doc_id"),
        (col("_start") / ChunkS).cast("long").as("chunk_idx"),
        least(lit(ChunkW), col("_n") - col("_start")).as("n_chunk"),
        md5(concat_ws(" ",
          slice(col("_ts"), col("_start") + 1,
            least(lit(ChunkW), col("_n") - col("_start"))))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  private val LmK = 0.5 // add-k smoothing constant

  /** q84 — bigram-LM quality scoring (the CCNet recipe's shape): train
    * bigram counts on the whole corpus, score every document by its mean
    * log-probability under the smoothed model — low scores flag
    * off-distribution documents. P(w2|w1) = (c(w1,w2)+k)/(c(w1·)+k·V) with
    * k=0.5, V = corpus unigram vocabulary. Scale shape: bigrams form
    * ARRAY-SIDE per row (the q68 slice pattern — adjacency is a property of
    * the token array, so no window/sort shuffle keys the corpus by doc to
    * recover it; the first draft paid exactly that), explode, and collapse
    * to per-doc bigram COUNTS whose exchange ships partial-aggregated rows.
    * That compressed frame is the only thing persisted (read 3×: the c2/c1
    * model aggregations and the scoring join). The count tables are
    * vocabulary²-/vocabulary-bounded, never corpus-sized; plain equi-joins
    * let AQE broadcast them when they fit (at web scale the bigram table
    * may not — the shuffle join is the honest default, and token keys are
    * Zipfian, so if the shuffle path is taken, AQE's skew-join split — or
    * ops.Skew.saltedJoin as the manual fallback — handles the stopword-hot
    * w1 partitions). V attaches as a one-row broadcast (q81's constants
    * pattern); scoring weights each distinct (doc,w1,w2) by its count,
    * arithmetically identical to averaging over bigram instances. */
  def bigramLm(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(spark)
    val docs = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
    // bigram formation is the fused codegen kernel (graft_word_bigrams:
    // one joined buffer per row, each pair a zero-copy window of it —
    // replaces the interpreted transform/element_at/struct HOF tree);
    // tokens contain no whitespace, so splitting the pair at its single
    // space with substring_index is exact.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val grouped = docs
      .select(col("doc_id"),
        explode(graft.expr.GraftFunctions.wordBigrams(col("text"))).as("_bg"))
      .select(col("doc_id"),
        substring_index(col("_bg"), " ", 1).as("w1"),
        substring_index(col("_bg"), " ", -1).as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("n"))
      .persist()
    val c2 = grouped.groupBy("w1", "w2").agg(sum("n").as("c2"))
    val c1 = grouped.groupBy("w1").agg(sum("n").as("c1"))
    val vocab = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .agg(countDistinct("w").as("_v"))
    grouped
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("n"),
        log((col("c2") + lit(LmK)) / (col("c1") + lit(LmK) * col("_v"))).as("_lp"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_bigrams"),
        round(sum(col("n") * col("_lp")) / sum("n"), 6).as("avg_logp"))
      .orderBy("doc_id")
  }

  /** q85 — token-entropy profile: per-document Shannon entropy of the token
    * distribution (H = ln n − Σ c·ln c / n — one pass over the (doc, token)
    * counts, no per-token probability column), rolled up per language with
    * a low-entropy count (the "degenerate / repetitive document" screen
    * that complements q68's duplicate-gram rule). */
  def tokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("_ts"))
      .select(col("doc_id"), col("lang"), explode(col("_ts")).as("w"))
      .groupBy("doc_id", "lang", "w").agg(count(lit(1)).as("c"))
    val perDoc = counts.groupBy("doc_id", "lang").agg(
      sum("c").as("n"),
      sum(col("c").cast("double") * log(col("c").cast("double"))).as("_clnc"))
      .select(col("doc_id"), col("lang"),
        (log(col("n").cast("double")) - col("_clnc") / col("n")).as("h"))
    perDoc.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      round(avg("h"), 4).as("avg_entropy"),
      round(min("h"), 4).as("min_entropy"),
      round(max("h"), 4).as("max_entropy"),
      count(when(col("h") < 3.0, 1)).as("n_low"))
      .orderBy("lang")
  }

  private val MixAlpha = 0.3 // temperature exponent for source re-weighting

  /** q86 — temperature-scaled source mixing weights: w_s ∝ (tokens_s/T)^α
    * normalized over sources (α=0.3) — the standard data-mix computation
    * that up-samples small high-value sources and down-samples dominant
    * crawls; `boost` = w_s / natural-share is the resulting up/down-sampling
    * factor a sampler would apply. All-relational: the per-source frame is
    * |sources| rows after one aggregation; the two scalar totals attach as
    * one-row broadcasts (q81's constants pattern — never a window over all
    * rows). */
  def mixWeights(spark: SparkSession, dir: String): DataFrame = {
    // two-level aggregation, NOT count(*)+countDistinct in one agg: that
    // combination plans an Expand that doubles the exploded corpus into the
    // first shuffle; (source,doc) partials then a |docs|-row rollup ship
    // strictly less
    val perSource = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), col("source"), TextOps.tokens(col("text")).as("_ts"))
      .select(col("doc_id"), col("source"), explode(col("_ts")).as("w"))
      .groupBy("source", "doc_id").agg(count(lit(1)).as("_nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("_nt").as("n_tokens"))
    val total = perSource.agg(sum("n_tokens").as("_tot"))
    val raw = perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("_tot")).as("_share"))
      .withColumn("_raw", pow(col("_share"), lit(MixAlpha)))
    val rawSum = raw.agg(sum("_raw").as("_rsum"))
    raw.crossJoin(broadcast(rawSum))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("_raw") / col("_rsum"), 6).as("weight"),
        round(col("_raw") / col("_rsum") / col("_share"), 4).as("boost"))
      .orderBy("source")
  }

  /** q87 — embedding-space source drift: cosine of each label's embedding
    * centroid against the corpus centroid (the embedding-space sibling of
    * q81's token-distribution drift — catches a source whose text stats
    * look fine but whose semantic distribution moved). Scale shape
    * (round-11 rewrite): the corpus-sized pass is ONE generator-free
    * aggregate — per-dimension sums as dims fixed columns with map-side
    * partials, so the 64×-corpus row blow-up of the old posexplode never
    * exists; the dimension count probes from a single limit-1 row
    * (embeddings are fixed-width by contract). The corpus centroid derives
    * from the per-label sums (weighted mean — never a second corpus read),
    * and everything after operates on |labels|×dim rows; that small frame
    * is the only persist. */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.ops.Partitioning.spread(table(spark, dir, "embeddings"))
      .select(col("label"), col("embedding").cast("array<double>").as("_v"))
    val dims = e.select(size(col("_v"))).take(1).headOption
      .map(_.getInt(0)).getOrElse(0)
    if (dims == 0)
      return e.groupBy("label").agg(count(lit(1)).as("n_vecs"))
        .select(col("label"), col("n_vecs"),
          lit(0.0d).as("centroid_cos"), lit(0.0d).as("centroid_norm"))
        .orderBy("label")
    val sums = (0 until dims).map(i =>
      sum(element_at(col("_v"), i + 1)).as(s"_s$i"))
    val bl = e.groupBy("label")
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("label"), col("n"),
        posexplode(array((0 until dims).map(i => col(s"_s$i")): _*)))
      .select(col("label"), (col("pos") + 1).as("pos"),
        (col("col") / col("n")).as("m"), col("n"))
      .persist()
    val corpus = bl.groupBy("pos")
      .agg((sum(col("m") * col("n")) / sum("n")).as("mc"))
    bl.join(corpus, Seq("pos"))
      .groupBy("label")
      .agg(max("n").as("n_vecs"),
        sum(col("m") * col("mc")).as("_dot"),
        sum(col("m") * col("m")).as("_nl"),
        sum(col("mc") * col("mc")).as("_nc"))
      .select(col("label"), col("n_vecs"),
        round(col("_dot") / sqrt(col("_nl") * col("_nc")), 4).as("centroid_cos"),
        round(sqrt(col("_nl")), 4).as("centroid_norm"))
      .orderBy("label")
  }

  private val PackB = 256L // tokens per training sequence

  /** q88 — sequence packing profile: GPT-style pretraining concatenates a
    * shard's documents in a deterministic order and slices fixed-length
    * sequences (B=256 here), crossing document boundaries. Packing is
    * per-SHARD (source), the way distributed packers actually run — one
    * windowed cumulative sum per shard, never a global single-partition
    * sort. Reported per source: total tokens, sequence count, documents
    * straddling a sequence boundary, and the tail waste — all integer
    * arithmetic, no float boundary. */
  def sequencePacking(spark: SparkSession, dir: String): DataFrame = {
    val nTok = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("source"), col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("n"))
      .where(col("n") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val packed = nTok.withColumn("end", sum("n").over(w))
      .withColumn("start", col("end") - col("n"))
      // a doc straddles iff a sequence boundary falls strictly inside it:
      // (end-1) DIV B > start DIV B — integer arithmetic throughout
      .withColumn("straddles",
        (expr(s"(end - 1) DIV $PackB") > expr(s"start DIV $PackB")).cast("long"))
    packed.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n").as("total_tokens"),
      max("end").as("_end"),
      sum("straddles").as("n_straddlers"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        // integer ceil-div (DIV, not /): no float anywhere in the arithmetic
        expr(s"(_end + ${PackB - 1}) DIV $PackB").as("n_seqs"),
        col("n_straddlers"),
        (expr(s"(_end + ${PackB - 1}) DIV $PackB") * PackB - col("_end")).as("tail_waste"))
      .orderBy("source")
  }

  /** q105 — chunk-level GLOBAL dedup (the paragraph-dedup step of the
    * Falcon/RefinedWeb recipe, re-grained): documents split into
    * NON-overlapping [[ChunkW]]-token chunks (stride = width — dedup units
    * must tile, unlike q83's overlapping retrieval windows), each chunk
    * keyed by a content digest, and only the globally FIRST occurrence
    * (min (doc_id, chunk_idx), encoded as one composite long so the
    * keep-first rule is a plain MIN aggregation on both engines) survives.
    * Output: per-document retention — how much of each doc remains after
    * corpus-wide chunk dedup. Scale shape: per-row split/digest (no sort,
    * no window), one digest-keyed aggregation whose partial ships
    * |distinct chunks| rows — and NO membership join back on the digest:
    * the winning occurrence's doc_id decodes from the composite key, so
    * per-doc kept counts come from re-aggregating the |distinct|-sized
    * digest relation. A corpus-wide hot chunk (boilerplate in 90% of docs)
    * therefore collapses map-side in the digest agg instead of routing 90%
    * of the corpus through one join reducer; the only join left is
    * doc-level, both sides |docs|-sized and uniform. The chunk relation is
    * persisted because both aggregations read it. Cost is linear in corpus
    * tokens at any scale. */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame = {
    // tiling via the SHARED TextOps.chunkTiles (one definition with the
    // streaming mirror — digests cannot drift between batch and stream).
    // Ownership: Verify/Bench clear the cache after each query's action.
    val chunks = TextOps.chunkTiles(
        graft.ops.Partitioning.spread(table(spark, dir, "documents")),
        "text", Seq("doc_id", "source"))
      .select(col("doc_id"), col("source"),
        // composite occurrence key: chunk_idx < 1e6 for any real document,
        // so (doc_id, chunk_idx) order == numeric order of this long
        (col("doc_id") * 1000000L + col("chunk_idx")).as("_k"),
        // 60-bit portable digest (the q80/q97 kernel): the dedup agg and the
        // re-aggregation shuffle 8-byte keys, not 32-char md5 hex strings
        graft.ops.PortableSketch.h60(col("_chunk")).as("_h"))
      .persist()
    val perDoc = chunks.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_chunks"))
    val kept = chunks.groupBy("_h").agg(min("_k").as("_first"))
      .select(expr("_first DIV 1000000").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_kept"))
    perDoc.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .withColumn("kept_frac", round(col("n_kept") / col("n_chunks"), 6))
      .orderBy("doc_id")
  }

  /** q110 — TEXT REPAIR profile (the ftfy/normalization pass every crawl
    * corpus runs before anything hashes or tokenizes it): Unicode NFC
    * normalization (combining sequences → composed forms, via the codegen'd
    * [[graft.expr.NfcNormalize]] kernel — a dedup digest must not see
    * e+◌́ and é as different documents), control-character strip, whitespace
    * collapse, trim; reported per source as docs changed + net character
    * delta. Pure projection + one aggregation — at 100 TB this is a
    * scan-side pass whose cost is the scan. Cross-engine: DuckDB's
    * `nfc_normalize` is the same Unicode NFC; regex classes stay in the
    * java.regex ∩ RE2 common subset. */
  def normalizeRepair(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(spark)
    // the repair expression lives in StreamingRepair.clean — ONE definition
    // serves the batch profile and the streaming ingest mirror
    val cleaned = graft.streaming.StreamingRepair.clean(col("text"))
    graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .withColumn("_clean", cleaned)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("_clean") =!= col("text")).cast("long")).as("n_changed"),
        sum(length(col("text")) - length(col("_clean"))).as("char_delta"))
      .orderBy("source")
  }

  /** q120 — SOFT DEDUP / duplicate-aware loss weighting: instead of
    * dropping exact duplicates (q21), weight every document by
    * 1/(its corpus-wide duplicate count) — the data-constrained-regime
    * alternative where repeated text still trains but contributes one
    * document's worth of gradient in total. Report per source: raw docs,
    * distinct texts, and the effective (weight-summed) document count —
    * the corpus-size number a loss-weighted epoch actually delivers.
    * Scale shape: fully collapsed before any join — (source, digest)
    * counts aggregate map-side first, the global duplicate count is a
    * second digest-keyed aggregate, and the join matches two
    * distinct-text-bounded relations (a mega-duplicate is ONE row on each
    * side, never a hot key — the q105/q80 posture). */
  def softDedupWeights(spark: SparkSession, dir: String): DataFrame = {
    val sd = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("source"), md5(col("text").cast("binary")).as("_d"))
      .groupBy("source", "_d").agg(count(lit(1)).as("_c"))
    val g = sd.groupBy("_d").agg(sum("_c").as("_n"))
    sd.join(g, Seq("_d"))
      .groupBy("source")
      .agg(sum("_c").as("docs"),
        count(lit(1)).as("distinct_texts"),
        round(sum(col("_c") / col("_n")), 6).as("effective_docs"))
      .orderBy("source")
  }

  /** q121 — N-GRAM REPETITION PROFILE: the Gopher repetition suite
    * (Rae et al. 2021, Table A1) that q82's max-single-token rule only
    * approximates — per document, the fraction of characters claimed by
    * (a) the most frequent word 2-gram, (b) the most frequent word
    * 3-gram, and (c) ALL word 2-grams occurring more than once, rolled
    * up per language with corpus-calibrated violation thresholds
    * (top-2 > 0.10, top-3 > 0.10, dup-2 > 0.20 — Gopher's dup-{5..10}
    * legs are degenerate on this corpus and would pin zeros). Every
    * keep/violate decision is INTEGER arithmetic (`num*10 > totchars`),
    * so the gate has no float boundary; the reported averages take the
    * §2.5 9-dp-per-doc / 6-dp-rollup canonicalization. Scale shape: ONE
    * corpus scan builds both gram sizes in-row (tagged structs, no
    * second pass), the exploded frame collapses immediately to
    * (doc, n, gram) counts (map-side partials; grouping key contains
    * doc_id so no corpus-wide hot key exists), then to one row per doc,
    * then to the per-language rollup — each stage strictly smaller. */
  def repetitionProfile(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), col("lang"), col("text"),
        TextOps.tokens(col("text")).as("_ts"))
    // Σ token lengths == the non-whitespace char count — computed WITHOUT a
    // second tokenize pass (the gram branch below is the only one), and
    // coalesced so a null text lands at 0 like the oracle's coalesce (a
    // null totchars would NULL the keep predicate and silently drop the
    // doc from n_keep)
    val docStats = base.select(col("doc_id"), col("lang"),
      coalesce(length(regexp_replace(col("text"), "\\s+", "")), lit(0))
        .cast("long").as("totchars"))
    // all 2- and 3-grams WITH multiplicity (graft_word_ngrams is distinct
    // by design — counts are the whole point here), built in one pass;
    // the filter() guard types the empty array for docs shorter than n
    def gramsExpr(n: Int): String =
      s"transform(filter(sequence(0, greatest(size(_ts)-$n, 0)), i -> i <= size(_ts)-$n), " +
        s"i -> named_struct('n', $n, 'g', concat_ws(' ', slice(_ts, i+1, $n))))"
    val cnts = base
      .selectExpr("doc_id", s"explode(concat(${gramsExpr(2)}, ${gramsExpr(3)})) AS gr")
      .select(col("doc_id"), col("gr.n").as("n"), col("gr.g").as("g"))
      .groupBy("doc_id", "n", "g").agg(count(lit(1)).as("c"))
      .withColumn("num", col("c") * (length(col("g")) - (col("n") - lit(1))))
    def top(n: Int) = // (count desc, gram asc) argmax via struct-min
      min(when(col("n") === n,
        struct((-col("c")).as("nc"), col("g").as("g"), col("num").as("num"))))
    val perDoc = cnts.groupBy("doc_id").agg(
      top(2).as("t2"), top(3).as("t3"),
      sum(when(col("n") === 2 && col("c") > 1, col("num")).otherwise(0L)).as("d2"))
    def frac(num: org.apache.spark.sql.Column) =
      when(col("totchars") > 0, round(num / col("totchars"), 9)).otherwise(lit(0.0))
    val joined = docStats.join(perDoc, Seq("doc_id"), "left").select(
      col("lang"), col("totchars"),
      coalesce(col("t2.num"), lit(0L)).as("num2"),
      coalesce(col("t3.num"), lit(0L)).as("num3"),
      coalesce(col("d2"), lit(0L)).as("dup2"))
    joined.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      round(avg(frac(col("num2"))), 6).as("avg_top2_frac"),
      round(avg(frac(col("num3"))), 6).as("avg_top3_frac"),
      round(avg(frac(col("dup2"))), 6).as("avg_dup2_frac"),
      sum((col("num2") * 10 > col("totchars")).cast("long")).as("v_top2"),
      sum((col("num3") * 10 > col("totchars")).cast("long")).as("v_top3"),
      sum((col("dup2") * 5 > col("totchars")).cast("long")).as("v_dup2"),
      sum((col("num2") * 10 <= col("totchars") &&
        col("num3") * 10 <= col("totchars") &&
        col("dup2") * 5 <= col("totchars")).cast("long")).as("n_keep"))
      .orderBy("lang")
  }

  /** q124 — EXACT DUPLICATED-SUBSTRING SPANS: the ExactSubstr formulation
    * (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    * Better") the chunk (q105) and gram (q80) families only approximate —
    * fixed-boundary tiles miss shifted copies and word grams miss
    * sub-token overlap. Every stride-1 40-char window is hashed (60-bit
    * md5 family, the q80 discipline: the shuffle carries 8 bytes, never
    * window text); a position is duplicated iff its window content occurs
    * ≥ 2 times corpus-wide (any doc, including its own — self-repetition
    * is duplication here, exactly as in suffix-array dedup); per doc,
    * duplicated positions coalesce into MAXIMAL spans (positions within W
    * of the previous merge — overlapping or touching extents are one
    * span), rolled up per language.
    *
    * Scale shape: the window relation is O(corpus chars) — the honest
    * cost of exact-substring detection (a suffix array is also O(chars)).
    * It is built once, repartitioned on the 8-byte hash, and persisted:
    * the duplicate-hash aggregation and the flag join both consume that
    * SAME partitioning (exchange reuse — the corpus-sized relation
    * shuffles once). The flag join's build side is one row per duplicated
    * hash; a corpus-hot window (boilerplate) fans out only to its own
    * positions — output-proportional, and AQE's skew split handles the
    * residual imbalance. Span merging is a per-doc window — uniform keys.
    * A full materialized span list is deliberately NOT the output (at
    * 100 TB it rivals the corpus); the per-language rollup is. */
  /** Shared q124/q125 machinery. `SubstrW` is the window width; `substrBase`
    * the narrow doc projection; `windowPairs` the ONE corpus-chars-sized
    * relation (stride-1 windows → 8-byte h60, repartitioned on the hash and
    * persisted — the dup/canonical aggregation and the eligibility join
    * both consume that exchange); `mergeSpans` coalesces eligible (doc,
    * pos) rows into maximal [s, e] char intervals (merge while the next
    * position is within W of the previous — overlapping or touching
    * extents are one span). */
  private val SubstrW = 40

  private def substrBase(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), col("lang"), col("text"),
        length(col("text")).as("_len"))

  /** Returns (relation, release): the persisted window relation is
    * O(corpus chars) — the TextOps.maximalDupRunsHandle contract applies.
    * A long-lived session must call release() once the consuming query is
    * materialized; the one-shot [[substringDupSpans]]/[[substringCut]]
    * forms rely on the caller's per-query cache clear (Verify/Bench both
    * `cacheManager.clearCache()` between queries). */
  private def windowPairs(base: DataFrame): (DataFrame, () => Unit) = {
    graft.expr.GraftFunctions.ensureRegistered(base.sparkSession)
    // fused window kernel (graft.expr.WinKernel — the per-position
    // substring/hex/conv tree it replaced dominated this family's scan);
    // same md5, same hashes, oracle untouched. pos widens int → long,
    // invisible in every q124/q125 output column (span sums were already
    // long; the cut fold renders strings).
    val pairs = base.where(col("_len") >= SubstrW)
      .select(col("doc_id"),
        posexplode(call_function("graft_win_hashes", col("text"), lit(SubstrW)))
          .as(Seq("_p0", "_h")))
      .select(col("doc_id"), (col("_p0") + 1).cast("long").as("pos"), col("_h"))
      .repartition(col("_h"))
      .persist() // read by the hash agg AND the eligibility join (same key)
    (pairs, () => { pairs.unpersist(); () })
  }

  private def mergeSpans(eligible: DataFrame): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    eligible
      .withColumn("_new",
        when(lag("pos", 1).over(byDoc).isNull ||
          col("pos") > lag("pos", 1).over(byDoc) + SubstrW, 1L).otherwise(0L))
      .withColumn("_sid", sum("_new").over(byDoc))
      .groupBy("doc_id", "_sid")
      .agg(min("pos").as("s"), (max("pos") + (SubstrW - 1)).as("e"))
  }

  def substringDupSpans(spark: SparkSession, dir: String): DataFrame =
    substringDupSpansHandle(spark, dir)._1

  /** Handle variant (the TextOps.maximalDupRunsHandle contract): returns
    * (result, release). release() unpersists the O(corpus chars) window
    * relation — long-lived sessions must call it after materializing. */
  def substringDupSpansHandle(
      spark: SparkSession, dir: String): (DataFrame, () => Unit) = {
    val base = substrBase(spark, dir)
    val (pairs, release) = windowPairs(base)
    val dupHashes = pairs.groupBy("_h").agg(count(lit(1)).as("_c"))
      .where(col("_c") >= 2).select("_h")
    val spans = mergeSpans(pairs.join(dupHashes, Seq("_h"))
      .select("doc_id", "pos"))
      .select(col("doc_id"), (col("e") - col("s") + 1).as("_spanLen"))
    val perDoc = spans.groupBy("doc_id").agg(
      sum("_spanLen").as("_dup"), count(lit(1)).as("_nspans"),
      max("_spanLen").as("_mx"))
    val result = base.select("doc_id", "lang", "_len")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("lang"), col("_len"),
        coalesce(col("_dup"), lit(0L)).as("_dup"),
        coalesce(col("_nspans"), lit(0L)).as("_nspans"),
        coalesce(col("_mx"), lit(0L)).as("_mx"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum((col("_nspans") > 0).cast("long")).as("docs_with_dup"),
        round(avg(when(col("_len") > 0,
          round(col("_dup") / col("_len"), 9)).otherwise(0.0)), 6)
          .as("avg_dup_frac"),
        sum("_dup").as("dup_chars"),
        sum("_nspans").as("n_spans"),
        max("_mx").as("max_span"))
      .orderBy("lang")
    (result, release)
  }

  /** q126 — CHARACTER COVERAGE: the SentencePiece `character_coverage`
    * statistic the tokenizer family (q106-q108, q117-q118) presumes but
    * never measures — per language, how much of the raw character stream
    * the top-32 characters cover, and how many distinct characters are
    * RARE (frequency below 1/10000, the byte-fallback candidates). The
    * keep/rare decision is INTEGER arithmetic (`c * 10000 < total`), the
    * single float surface is the 6-dp-rounded coverage ratio. Scale
    * shape: the per-char explode collapses immediately to (lang, char)
    * counts — map-side partials over a ≤ |alphabet|·|langs| result — and
    * every later stage (totals, top-32 rank, rare screen) runs on that
    * tiny persisted relation; the rank window partitions per lang over
    * alphabet-sized groups, never corpus rows. */
  def charCoverage(spark: SparkSession, dir: String): DataFrame = {
    val chars = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .where(length(col("text")) > 0) // sequence(1,0) would DESCEND
      .select(col("lang"),
        explode(transform(sequence(lit(1), length(col("text"))),
          i => col("text").substr(i, lit(1)))).as("ch"))
      .groupBy("lang", "ch").agg(count(lit(1)).as("c"))
      .persist() // alphabet-sized; read by totals, rank, and rare screen
    val tot = chars.groupBy("lang")
      .agg(sum("c").as("n_chars"), count(lit(1)).as("n_distinct"))
    val byFreq = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("c").desc, col("ch").asc)
    val top = chars.withColumn("_rk", row_number().over(byFreq))
      .where(col("_rk") <= 32)
      .groupBy("lang").agg(sum("c").as("_top32"))
    val rare = chars.join(broadcast(tot), Seq("lang"))
      .where(col("c") * 10000 < col("n_chars"))
      .groupBy("lang").agg(count(lit(1)).as("n_rare"))
    tot.join(top, Seq("lang"))
      .join(rare, Seq("lang"), "left_outer")
      .select(col("lang"), col("n_chars"), col("n_distinct"),
        col("_top32").as("top32_chars"),
        round(col("_top32") / col("n_chars"), 6).as("coverage32"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"))
      .orderBy("lang")
  }

  private def q126OracleSql: String =
    """WITH ch AS (SELECT lang, substr(text, i, 1) AS ch
      |  FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
      |  WHERE length(text) > 0),
      |cc AS (SELECT lang, ch, count(*) AS c FROM ch GROUP BY 1, 2),
      |tot AS (SELECT lang, sum(c) AS n_chars, count(*) AS n_distinct
      |  FROM cc GROUP BY 1),
      |tp AS (SELECT lang, sum(c) AS top32 FROM
      |    (SELECT lang, c, row_number() OVER
      |       (PARTITION BY lang ORDER BY c DESC, ch ASC) AS rk FROM cc)
      |  WHERE rk <= 32 GROUP BY lang),
      |rr AS (SELECT cc.lang, count(*) AS n_rare FROM cc
      |  JOIN tot ON tot.lang = cc.lang
      |  WHERE cc.c * 10000 < tot.n_chars GROUP BY cc.lang)
      |SELECT lang, n_chars::BIGINT AS n_chars, n_distinct::BIGINT AS n_distinct,
      |  top32::BIGINT AS top32_chars,
      |  round(top32 / n_chars, 6) AS coverage32,
      |  coalesce(n_rare, 0)::BIGINT AS n_rare
      |FROM tot JOIN tp USING (lang) LEFT JOIN rr USING (lang)
      |ORDER BY lang""".stripMargin

  /** q125 — EXACT DUPLICATED-SUBSTRING CUT: the ACTIONABLE pass behind
    * q124's report — Lee et al.'s ExactSubstr removal. A window position is
    * cut-eligible iff its 40-char content occurs ≥ 2 times corpus-wide AND
    * the position is not the content's CANONICAL occurrence (the corpus-
    * wide smallest (doc_id, pos) — deterministic, engine-portable);
    * eligible positions merge into maximal spans exactly as in q124 and
    * the spans are cut out of the text. Span-union semantics, stated
    * plainly: the canonical occurrence's BYTES may still be cut where a
    * non-canonical window's span overlaps them (a fully periodic doc
    * collapses to its first byte) — the guarantee is that no duplicated
    * window survives in two places, which is the dedup goal; documents
    * that were pure duplicate content rewrite to the empty string rather
    * than vanishing (retention is a downstream filter's call).
    *
    * Output is the per-language rollup — docs, docs cut, chars before /
    * after, and the q93-style order-insensitive rewrite checksum (sum of
    * 60-bit md5 mod 1e9+7 over rewritten texts) that pins the exact byte
    * result cross-engine without shipping a rewritten corpus through the
    * compare. Scale shape: q124's (one corpus-chars-sized relation,
    * shuffled once on the 8-byte hash, persisted for agg + flag join);
    * the rebuild is a per-doc fold over that doc's merged intervals —
    * bounded by len/W per doc, never corpus-sized. */
  def substringCut(spark: SparkSession, dir: String): DataFrame =
    substringCutHandle(spark, dir)._1

  /** Handle variant (the TextOps.maximalDupRunsHandle contract): returns
    * (result, release). release() unpersists the O(corpus chars) window
    * relation — long-lived sessions must call it after materializing. */
  def substringCutHandle(
      spark: SparkSession, dir: String): (DataFrame, () => Unit) = {
    val base = substrBase(spark, dir)
    val (pairs, release) = windowPairs(base)
    // canonical occurrence = corpus-wide min (doc_id, pos). The ENGINE side
    // takes a struct-min — exact at any id scale (no packing overflow);
    // only the ORACLE packs the pair into doc_id·2^32 + pos (same
    // lexicographic order at testdata id ranges — DuckDB's struct-min
    // built a sort state that OOM'd a 125 GB box where the scalar min
    // aggregates map-side)
    val canon = pairs.groupBy("_h").agg(count(lit(1)).as("_c"),
      min(struct(col("doc_id"), col("pos"))).as("_first"))
      .where(col("_c") >= 2)
      .select(col("_h"), col("_first"))
    val ivs = mergeSpans(pairs.join(canon, Seq("_h"))
      .where(!(col("_first.doc_id") === col("doc_id") &&
        col("_first.pos") === col("pos")))
      .select("doc_id", "pos"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("_ivs"))
    val result = base.join(ivs, Seq("doc_id"), "left")
      .withColumn("_rw", when(col("_ivs").isNull, col("text")).otherwise(
        // p seeds as BIGINT: span bounds are long since the fused window
        // kernel widened pos (substring's positional args cast back)
        expr("""aggregate(_ivs, named_struct('p', CAST(1 AS BIGINT), 'acc', ''),
          (a, iv) -> named_struct('p', iv.e + 1,
            'acc', concat(a.acc,
              substring(text, CAST(a.p AS INT), CAST(iv.s - a.p AS INT)))),
          a -> concat(a.acc, substring(text, CAST(a.p AS INT))))""")))
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("_ivs").isNotNull.cast("long")).as("docs_cut"),
        sum("_len").as("chars_before"),
        sum(length(col("_rw"))).as("chars_after"),
        sum(graft.ops.PortableSketch.h60(col("_rw")) % 1000000007L)
          .as("cut_checksum"))
      .orderBy("lang")
    (result, release)
  }

  private def q125OracleSql: String =
    """WITH d AS (SELECT doc_id, lang, text, length(text) AS len FROM documents),
      |w AS (SELECT doc_id, i AS pos,
      |    ('0x'||substr(md5(substr(text, i, 40)),1,15))::BIGINT AS h
      |  FROM d, unnest(range(1, len - 40 + 2)) AS t(i)
      |  WHERE len >= 40),
      |c AS (SELECT h, min(doc_id * 4294967296 + pos) AS firstkey
      |  FROM w GROUP BY h HAVING count(*) >= 2),
      |el AS (SELECT doc_id, pos FROM w JOIN c USING (h)
      |  WHERE w.doc_id * 4294967296 + w.pos <> c.firstkey),
      |p AS (SELECT doc_id, pos,
      |    CASE WHEN lag(pos) OVER dw IS NULL THEN 1
      |         WHEN pos > lag(pos) OVER dw + 40 THEN 1 ELSE 0 END AS nw
      |  FROM el WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
      |iv AS (SELECT doc_id, sid, min(pos) AS s, max(pos) + 39 AS e
      |  FROM (SELECT doc_id, pos, sum(nw) OVER
      |          (PARTITION BY doc_id ORDER BY pos) AS sid FROM p)
      |  GROUP BY doc_id, sid),
      |seg AS (SELECT doc_id,
      |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS ks,
      |    s - 1 AS ke
      |  FROM iv
      |  UNION ALL
      |  SELECT doc_id, max(e) + 1, NULL FROM iv GROUP BY doc_id),
      |reb AS (SELECT seg.doc_id, string_agg(
      |    substr(d.text, ks,
      |      CASE WHEN ke IS NULL THEN d.len - ks + 1 ELSE ke - ks + 1 END),
      |    '' ORDER BY ks) AS rw
      |  FROM seg JOIN d USING (doc_id) GROUP BY seg.doc_id),
      |j AS (SELECT d.lang, d.len,
      |    CASE WHEN reb.doc_id IS NULL THEN d.text ELSE coalesce(rw, '') END AS rw,
      |    reb.doc_id IS NOT NULL AS was_cut
      |  FROM d LEFT JOIN reb ON reb.doc_id = d.doc_id)
      |SELECT lang, count(*) AS n_docs,
      |  sum(CASE WHEN was_cut THEN 1 ELSE 0 END)::BIGINT AS docs_cut,
      |  sum(len)::BIGINT AS chars_before,
      |  sum(length(rw))::BIGINT AS chars_after,
      |  CAST(sum(('0x'||substr(md5(rw),1,15))::BIGINT % 1000000007) AS BIGINT)
      |    AS cut_checksum
      |FROM j GROUP BY lang ORDER BY lang""".stripMargin

  private def q124OracleSql: String =
    """WITH d AS (SELECT doc_id, lang, text, length(text) AS len FROM documents),
      |w AS (SELECT doc_id, i AS pos,
      |    ('0x'||substr(md5(substr(text, i, 40)),1,15))::BIGINT AS h
      |  FROM d, unnest(range(1, len - 40 + 2)) AS t(i)
      |  WHERE len >= 40),
      |c AS (SELECT h FROM w GROUP BY h HAVING count(*) >= 2),
      |p AS (SELECT doc_id, pos,
      |    CASE WHEN lag(pos) OVER dw IS NULL THEN 1
      |         WHEN pos > lag(pos) OVER dw + 40 THEN 1 ELSE 0 END AS nw
      |  FROM w JOIN c USING (h)
      |  WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
      |s AS (SELECT doc_id, sid, max(pos) - min(pos) + 40 AS slen
      |  FROM (SELECT doc_id, pos, sum(nw) OVER
      |          (PARTITION BY doc_id ORDER BY pos) AS sid FROM p)
      |  GROUP BY doc_id, sid),
      |pd AS (SELECT doc_id, sum(slen) AS dup, count(*) AS nspans,
      |    max(slen) AS mx FROM s GROUP BY doc_id),
      |j AS (SELECT d.lang, d.len, coalesce(dup, 0) AS dup,
      |    coalesce(nspans, 0) AS nspans, coalesce(mx, 0) AS mx
      |  FROM d LEFT JOIN pd USING (doc_id))
      |SELECT lang, count(*) AS n_docs,
      |  sum(CASE WHEN nspans > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_with_dup,
      |  round(avg(CASE WHEN len > 0 THEN round(dup/len, 9) ELSE 0 END), 6) AS avg_dup_frac,
      |  sum(dup)::BIGINT AS dup_chars,
      |  sum(nspans)::BIGINT AS n_spans,
      |  max(mx)::BIGINT AS max_span
      |FROM j GROUP BY lang ORDER BY lang""".stripMargin

  private def q121OracleSql: String =
    """WITH tk AS (SELECT doc_id, lang,
      |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |tc AS (SELECT doc_id, lang,
      |    coalesce(list_sum(list_transform(t, x -> len(x))), 0) AS totchars FROM tk),
      |g2 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1),
      |         i -> array_to_string(t[i:i+1], ' '))) AS g FROM tk WHERE len(t) >= 2),
      |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
      |t2 AS (SELECT doc_id, c*(len(g)-1) AS num2 FROM
      |        (SELECT doc_id, g, c, row_number() OVER
      |          (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn FROM c2)
      |       WHERE rn = 1),
      |d2 AS (SELECT doc_id, sum(c*(len(g)-1)) AS dup2 FROM c2 WHERE c > 1 GROUP BY 1),
      |g3 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-2),
      |         i -> array_to_string(t[i:i+2], ' '))) AS g FROM tk WHERE len(t) >= 3),
      |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
      |t3 AS (SELECT doc_id, c*(len(g)-2) AS num3 FROM
      |        (SELECT doc_id, g, c, row_number() OVER
      |          (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn FROM c3)
      |       WHERE rn = 1),
      |d AS (SELECT tc.lang, tc.totchars,
      |        coalesce(num2, 0) AS num2, coalesce(num3, 0) AS num3,
      |        coalesce(dup2, 0) AS dup2
      |      FROM tc LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
      |        LEFT JOIN d2 USING (doc_id))
      |SELECT lang, count(*) AS n_docs,
      |  round(avg(CASE WHEN totchars > 0 THEN round(num2/totchars, 9) ELSE 0 END), 6) AS avg_top2_frac,
      |  round(avg(CASE WHEN totchars > 0 THEN round(num3/totchars, 9) ELSE 0 END), 6) AS avg_top3_frac,
      |  round(avg(CASE WHEN totchars > 0 THEN round(dup2/totchars, 9) ELSE 0 END), 6) AS avg_dup2_frac,
      |  sum(CASE WHEN num2*10 > totchars THEN 1 ELSE 0 END)::BIGINT AS v_top2,
      |  sum(CASE WHEN num3*10 > totchars THEN 1 ELSE 0 END)::BIGINT AS v_top3,
      |  sum(CASE WHEN dup2*5 > totchars THEN 1 ELSE 0 END)::BIGINT AS v_dup2,
      |  sum(CASE WHEN num2*10 <= totchars AND num3*10 <= totchars
      |        AND dup2*5 <= totchars THEN 1 ELSE 0 END)::BIGINT AS n_keep
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  private def q120OracleSql: String =
    """WITH sd AS (SELECT source, md5(text) AS d, count(*) AS c FROM documents GROUP BY 1, 2),
      |g AS (SELECT d, sum(c) AS n FROM sd GROUP BY d)
      |SELECT source, sum(c)::BIGINT AS docs, count(*) AS distinct_texts,
      |  round(sum(c / n), 6) AS effective_docs
      |FROM sd JOIN g USING (d) GROUP BY source ORDER BY source""".stripMargin

  // --- q188: maximal exact duplicated runs (seed-and-extend) ----------------

  /** Planted boilerplate for q188 (the q186/q127 planted-stream discipline:
    * a maximal-run inventory over a corpus with no long exact duplicates
    * proves nothing): every doc_id % 37 == 0 document gets this 64-char
    * block prepended behind a doc-dependent 0–10 char pad, so the copies
    * sit at DIFFERENT alignments — the extension pass, not seed luck, must
    * recover the exact boundaries. */
  private val RunBoiler =
    "TERMS: redistribution permitted only with attribution and notice"

  /** q188 — MAXIMAL-RUN INVENTORY: [[TextOps.maximalDupRuns]] (seed-and-
    * extend ExactSubstr — exact boundaries, any length ≥ w + stride − 1 =
    * 47) over the planted corpus, rolled up per language of the earlier
    * occurrence: run count, duplicated chars, longest run, how many runs
    * the extension pass grew past their seeded core (the evidence the
    * boundaries are NOT stride-quantized), and self-repetition runs.
    * Scale: the q124 window relation + an output-proportional pair join;
    * the rollup is run-keyed. The oracle replays seeds, diagonal
    * clustering, collision verify, and the char-by-char extension. */
  def maximalRunInventory(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        when(col("doc_id") % 37 === 0,
          concat(lit("xxxxxxxxxx").substr(lit(1),
              (col("doc_id") % 11).cast("int")),
            lit(RunBoiler), lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
    val runs = TextOps.maximalDupRuns(docs, "text", "doc_id",
      w = 40, stride = 8)
    runs.join(docs.select(col("doc_id").as("id_a"), col("lang")), Seq("id_a"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_runs"),
        sum("run_len").as("dup_chars"),
        max("run_len").as("max_run"),
        sum((col("run_len") > col("seeded_len")).cast("long")).as("n_extended"),
        sum((col("id_a") === col("id_b")).cast("long")).as("n_self"))
      .orderBy("lang")
  }

  private def q188OracleSql: String =
    s"""WITH d AS (SELECT doc_id, lang,
       |    CASE WHEN doc_id % 37 = 0
       |      THEN substr('xxxxxxxxxx', 1, (doc_id % 11)::INT)
       |        || '$RunBoiler' || ' ' || text
       |      ELSE text END AS text
       |  FROM documents),
       |base AS (SELECT doc_id, text AS t, length(text)::BIGINT AS len FROM d),
       |w AS (SELECT doc_id, i AS pos,
       |    ('0x' || substr(md5(substr(t, i::INT, 40)), 1, 15))::BIGINT AS h
       |  FROM base, unnest(range(1, len - 38)) AS u(i) WHERE len >= 40),
       |s AS (SELECT * FROM w WHERE (pos - 1) % 8 = 0),
       |p AS (SELECT DISTINCT s.doc_id AS ida, w.doc_id AS idb,
       |    s.pos - w.pos AS diag, s.pos AS apos
       |  FROM s JOIN w ON s.h = w.h
       |    AND (s.doc_id < w.doc_id
       |      OR (s.doc_id = w.doc_id AND s.pos < w.pos))),
       |c0 AS (SELECT *, CASE WHEN coalesce(apos - lag(apos) OVER
       |      (PARTITION BY ida, idb, diag ORDER BY apos), 9223372036854775807) > 8
       |    THEN 1 ELSE 0 END AS brk FROM p),
       |c1 AS (SELECT *, sum(brk) OVER (PARTITION BY ida, idb, diag
       |    ORDER BY apos ROWS UNBOUNDED PRECEDING) AS cid FROM c0),
       |cl AS (SELECT ida, idb, diag, cid, min(apos) AS amin, max(apos) AS amax
       |  FROM c1 GROUP BY 1, 2, 3, 4),
       |tx AS (SELECT cl.ida, cl.idb, cl.diag, cl.amin, cl.amax,
       |    cl.amin - cl.diag AS bmin, cl.amax - cl.diag AS bmax,
       |    a.t AS ta, a.len AS la, b.t AS tb, b.len AS lb
       |  FROM cl JOIN base a ON a.doc_id = cl.ida
       |    JOIN base b ON b.doc_id = cl.idb),
       |v AS (SELECT * FROM tx
       |  WHERE substr(ta, amin::INT, (amax - amin + 40)::INT)
       |      = substr(tb, bmin::INT, (amax - amin + 40)::INT)),
       |lm AS (SELECT *, least(7, amin - 1, bmin - 1) AS liml,
       |    least(7, la - (amax + 39), lb - (bmax + 39)) AS limr FROM v),
       |e AS (SELECT *,
       |    coalesce((list_filter(range(1, 8), k -> k > liml
       |      OR substr(ta, (amin - k)::INT, 1)
       |        <> substr(tb, (bmin - k)::INT, 1)))[1] - 1, 7) AS extl,
       |    coalesce((list_filter(range(1, 8), k -> k > limr
       |      OR substr(ta, (amax + 39 + k)::INT, 1)
       |        <> substr(tb, (bmax + 39 + k)::INT, 1)))[1] - 1, 7) AS extr
       |  FROM lm),
       |runs AS (SELECT ida, idb,
       |    (amax - amin + 40 + extl + extr)::BIGINT AS run_len,
       |    (amax - amin + 40)::BIGINT AS seeded_len
       |  FROM e WHERE amax - amin + 40 + extl + extr >= 47)
       |SELECT d.lang, count(*)::BIGINT AS n_runs,
       |  sum(run_len)::BIGINT AS dup_chars,
       |  max(run_len)::BIGINT AS max_run,
       |  sum(CASE WHEN run_len > seeded_len THEN 1 ELSE 0 END)::BIGINT
       |    AS n_extended,
       |  sum(CASE WHEN ida = idb THEN 1 ELSE 0 END)::BIGINT AS n_self
       |FROM runs JOIN d ON d.doc_id = runs.ida
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q120_soft_dedup" -> (softDedupWeights _),
    "q121_repetition_profile" -> (repetitionProfile _),
    "q124_substring_spans" -> (substringDupSpans _),
    "q125_substring_cut" -> (substringCut _),
    "q188_maximal_runs" -> (maximalRunInventory _),
    "q126_char_coverage" -> (charCoverage _),
    "q82_gopher_rules" -> (gopherRules _),
    "q83_doc_chunks" -> (docChunks _),
    "q84_bigram_lm" -> (bigramLm _),
    "q85_token_entropy" -> (tokenEntropy _),
    "q86_mix_weights" -> (mixWeights _),
    "q87_embedding_drift" -> (embeddingDrift _),
    "q88_sequence_packing" -> (sequencePacking _),
    "q105_chunk_dedup" -> (chunkDedup _),
    "q110_normalize_repair" -> (normalizeRepair _)
  )

  val oracles: Map[String, String] = Map(
    "q120_soft_dedup" -> q120OracleSql,
    "q121_repetition_profile" -> q121OracleSql,
    "q124_substring_spans" -> q124OracleSql,
    "q125_substring_cut" -> q125OracleSql,
    "q188_maximal_runs" -> q188OracleSql,
    "q126_char_coverage" -> q126OracleSql,
    "q110_normalize_repair" ->
      """WITH c AS (SELECT source, text,
        |  trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'), '\s+', ' ', 'g')) AS clean
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  sum(CASE WHEN clean <> text THEN 1 ELSE 0 END)::BIGINT AS n_changed,
        |  sum(length(text) - length(clean))::BIGINT AS char_delta
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    "q105_chunk_dedup" ->
      """WITH tk AS (SELECT doc_id, source,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
        |  FROM documents),
        |s AS (SELECT doc_id, source, ts, len(ts) AS n,
        |        unnest(generate_series(0, len(ts)-1, 20)) AS start
        |      FROM tk WHERE len(ts) >= 1),
        |ch AS (SELECT doc_id, source,
        |        doc_id * 1000000 + (start // 20) AS k,
        |        ('0x'||substr(md5(array_to_string(ts[start+1 : start+least(20, n - start)], ' ')),1,15))::BIGINT AS h
        |      FROM s),
        |f AS (SELECT h, min(k) AS fk FROM ch GROUP BY h)
        |SELECT ch.doc_id, ch.source, count(*) AS n_chunks,
        |  sum(CASE WHEN ch.k = f.fk THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  round(sum(CASE WHEN ch.k = f.fk THEN 1 ELSE 0 END) / count(*), 6) AS kept_frac
        |FROM ch JOIN f USING (h)
        |GROUP BY ch.doc_id, ch.source ORDER BY doc_id""".stripMargin,
    "q82_gopher_rules" ->
      """WITH tk AS (SELECT doc_id, lang,
        |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
        |  FROM documents),
        |c AS (SELECT doc_id, lang, w, count(*) AS c, sum(len(w)) AS lensum
        |      FROM tk GROUP BY 1, 2, 3),
        |d AS (SELECT doc_id, lang, sum(c) AS n, sum(lensum) AS sumlen,
        |        sum(CASE WHEN w IN ('the','a') THEN c ELSE 0 END) AS nstop,
        |        max(c) AS mx
        |      FROM c GROUP BY 1, 2),
        |r AS (SELECT lang,
        |    CASE WHEN n BETWEEN 20 AND 90 THEN 1 ELSE 0 END AS wc_ok,
        |    CASE WHEN sumlen*10 >= n*40 AND sumlen*10 <= n*50 THEN 1 ELSE 0 END AS mwl_ok,
        |    CASE WHEN nstop*10 <= n THEN 1 ELSE 0 END AS stop_ok,
        |    CASE WHEN mx*20 <= n*3 THEN 1 ELSE 0 END AS rep_ok
        |  FROM d)
        |SELECT lang, count(*) AS n_docs,
        |  sum(wc_ok*mwl_ok*stop_ok*rep_ok)::BIGINT AS n_keep,
        |  sum(1-wc_ok)::BIGINT AS v_wordcount,
        |  sum(1-mwl_ok)::BIGINT AS v_meanlen,
        |  sum(1-stop_ok)::BIGINT AS v_stopword,
        |  sum(1-rep_ok)::BIGINT AS v_repetition
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    "q83_doc_chunks" ->
      """WITH tk AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
        |  FROM documents),
        |s AS (SELECT doc_id, ts, len(ts) AS n,
        |        unnest(generate_series(0, len(ts)-1, 15)) AS start
        |      FROM tk)
        |SELECT doc_id, (start // 15)::BIGINT AS chunk_idx,
        |  least(20, n - start)::BIGINT AS n_chunk,
        |  md5(array_to_string(ts[start+1 : start+least(20, n - start)], ' ')) AS chunk_md5
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,
    "q84_bigram_lm" ->
      """WITH tk AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
        |  FROM documents),
        |toks AS (SELECT doc_id, unnest(ts) AS w,
        |           unnest(generate_series(1, len(ts))) AS pos FROM tk),
        |big AS (SELECT doc_id, w AS w1,
        |          lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM toks),
        |bg AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |v AS (SELECT count(DISTINCT w) AS v FROM toks)
        |SELECT bg.doc_id, count(*) AS n_bigrams,
        |  round(avg(ln((c2.c2 + 0.5::DOUBLE) / (c1.c1 + 0.5::DOUBLE * v.v))), 6) AS avg_logp
        |FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v
        |GROUP BY bg.doc_id ORDER BY doc_id""".stripMargin,
    "q85_token_entropy" ->
      """WITH tk AS (SELECT doc_id, lang,
        |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
        |  FROM documents),
        |c AS (SELECT doc_id, lang, w, count(*) AS c FROM tk GROUP BY 1, 2, 3),
        |d AS (SELECT doc_id, lang, sum(c) AS n,
        |        sum(c::DOUBLE * ln(c::DOUBLE)) AS clnc
        |      FROM c GROUP BY 1, 2),
        |h AS (SELECT doc_id, lang, ln(n::DOUBLE) - clnc / n AS h FROM d)
        |SELECT lang, count(*) AS n_docs,
        |  round(avg(h), 4) AS avg_entropy,
        |  round(min(h), 4) AS min_entropy,
        |  round(max(h), 4) AS max_entropy,
        |  count(*) FILTER (WHERE h < 3.0) AS n_low
        |FROM h GROUP BY lang ORDER BY lang""".stripMargin,
    "q86_mix_weights" ->
      """WITH tk AS (SELECT doc_id, source,
        |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
        |  FROM documents),
        |ps AS (SELECT source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_tokens
        |       FROM tk GROUP BY 1),
        |t AS (SELECT sum(n_tokens) AS tot FROM ps),
        |r AS (SELECT source, n_docs, n_tokens,
        |        n_tokens::DOUBLE / t.tot AS share,
        |        pow(n_tokens::DOUBLE / t.tot, 0.3::DOUBLE) AS raw
        |      FROM ps, t),
        |rs AS (SELECT sum(raw) AS rsum FROM r)
        |SELECT source, n_docs, n_tokens,
        |  round(r.raw / rs.rsum, 6) AS weight,
        |  round(r.raw / rs.rsum / r.share, 4) AS boost
        |FROM r, rs ORDER BY source""".stripMargin,
    "q87_embedding_drift" ->
      """WITH e AS (SELECT label,
        |    unnest(generate_series(1, len(embedding))) AS pos,
        |    unnest(embedding)::DOUBLE AS v
        |  FROM embeddings),
        |bl AS (SELECT label, pos, sum(v) / count(*) AS m, count(*) AS n
        |       FROM e GROUP BY 1, 2),
        |c AS (SELECT pos, sum(m * n) / sum(n) AS mc FROM bl GROUP BY 1),
        |j AS (SELECT label, max(n) AS n_vecs,
        |        sum(m * mc) AS dot, sum(m * m) AS nl, sum(mc * mc) AS nc
        |      FROM bl JOIN c USING (pos) GROUP BY label)
        |SELECT label, n_vecs,
        |  round(dot / sqrt(nl * nc), 4) AS centroid_cos,
        |  round(sqrt(nl), 4) AS centroid_norm
        |FROM j ORDER BY label""".stripMargin,
    "q88_sequence_packing" ->
      """WITH nt AS (SELECT source, doc_id,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS n
        |  FROM documents),
        |p AS (SELECT source, doc_id, n,
        |    sum(n) OVER (PARTITION BY source ORDER BY doc_id
        |                 ROWS UNBOUNDED PRECEDING) AS e
        |  FROM nt WHERE n > 0),
        |s AS (SELECT source, n, e, e - n AS st,
        |    CASE WHEN (e - 1) // 256 > (e - n) // 256 THEN 1 ELSE 0 END AS straddles
        |  FROM p)
        |SELECT source, count(*) AS n_docs, sum(n)::BIGINT AS total_tokens,
        |  ((max(e) + 255) // 256)::BIGINT AS n_seqs,
        |  sum(straddles)::BIGINT AS n_straddlers,
        |  (((max(e) + 255) // 256) * 256 - max(e))::BIGINT AS tail_waste
        |FROM s GROUP BY source ORDER BY source""".stripMargin
  )
}
