package graft.operators

import graft.model.Span
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import graft.pipeline.{Admission, LinkJob}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** North-star operator surface (builder prompt + SURVEY §7.1.6): dedup,
  * similarity search, text analysis, multimodal plumbing, and the core
  * dependency-link operator — each exposed as a driver-checkable query.
  * Oracle SQL (DuckDB) accompanies every query whose semantics DuckDB can
  * reproduce; the rest get rows-only checks plus ScalaTest fixtures.
  */
object NorthStarQueries {
  import ContractQueries.table

  // --- dedup ---------------------------------------------------------------

  /** Exact dedup, keep-first: one row per distinct text with min doc_id. */
  def dedupKeepFirst(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(table(spark, dir, "documents"), "text", "doc_id")
      .orderBy("doc_id")

  /** Near-duplicate pairs — MinHash LSH candidates verified with EXACT
    * word-3-gram Jaccard ≥ 0.5. The sketch uses the same unit as the verify
    * metric (word 3-grams), so the estimate pre-filter at 0.35 is a valid
    * lower bound screen for true ≥0.5 pairs (k=64 binomial tail: miss
    * probability ≈ 3e-4 at j=0.5, ≈ 0 at the ≥0.9 pairs in this corpus) and
    * background pairs (j≈0.01) never reach the exact verify. Output equals
    * the brute-force all-pairs oracle. */
  def ngramNearDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    // persist: the verify stage consumes candidates twice (broadcast id set +
    // pair join) — without this the whole LSH pipeline would run twice
    val candidates = Dedup.minhashNearDups(docs, "text", "doc_id",
      k = 64, bands = 16, shingle = 3, threshold = 0.35, wordGrams = true)
      .select("idA", "idB").persist()
    Dedup.ngramJaccardVerify(docs, candidates, "text", "doc_id", n = 3, threshold = 0.5)
      .select("idA", "idB", "jaccard")
      .orderBy("idA", "idB")
  }

  /** MinHash estimated-Jaccard near-dup pairs (the pure sketch path). */
  def minhashNearDups(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(table(spark, dir, "documents"), "text", "doc_id",
      k = 64, bands = 16, shingle = 5, threshold = 0.5)
      .orderBy("idA", "idB")

  /** SimHash: closest candidate pairs by hamming distance (4×16-bit block
    * join; exact ≤3 guaranteed found, plus whatever else collides). */
  def simhashNearDups(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDups(table(spark, dir, "documents"), "text", "doc_id",
      shingle = 5, maxDistance = 3)
      .orderBy("idA", "idB")

  // --- similarity search ---------------------------------------------------

  /** Brute-force exact cosine top-5 neighbors for the first 10 vectors. */
  def embeddingTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    Similarity.bruteForceTopK(
      emb, "embedding", "vec_id",
      emb.where(col("vec_id") < 10), "embedding", "vec_id",
      k = 5)
      .select("queryId", "neighborId", "cosine", "rank")
      .orderBy("queryId", "rank")
  }

  /** LSH-bucketed approximate top-5 for the same queries (the scale path). */
  def embeddingLshTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    Similarity.lshTopK(
      emb, "embedding", "vec_id",
      emb.where(col("vec_id") < 10), "embedding", "vec_id",
      dim = 64, k = 5, nPlanes = 8)
      .select("queryId", "neighborId", "cosine", "rank")
      .orderBy("queryId", "rank")
  }

  // --- text analysis -------------------------------------------------------

  /** Whitespace token count per document (DuckDB-checkable). */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"))
      .orderBy("doc_id")

  /** Per-language token/punctuation totals (DuckDB-checkable). */
  def textStatsByLang(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .groupBy("lang")
      .agg(
        sum(TextOps.tokenCount(col("text"))).as("toks"),
        sum(size(regexp_extract_all(col("text"), lit("[\\p{Punct}]"), lit(0)))).as("punct"))
      .orderBy("lang")

  /** Language-ID + quality annotation rollup (heuristics — fixture-tested,
    * rows-only for the driver). */
  def langQualityRollup(spark: SparkSession, dir: String): DataFrame =
    TextOps.annotate(graft.ops.Partitioning.spread(table(spark, dir, "documents")))
      .groupBy("lang_guess")
      .agg(count(lit(1)).as("n"), round(avg("quality"), 4).as("avg_quality"),
        round(avg("n_tokens"), 4).as("avg_tokens"))
      .orderBy("lang_guess")

  /** Bottom-k fingerprint collisions: documents sharing min-shingle-hash
    * (rows-only; the fingerprint itself is hash-family-specific). */
  def fingerprintBuckets(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(spark)
    graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), graft.expr.GraftFunctions.fingerprint64(col("text"), 8).as("fp64"))
      .groupBy("fp64").agg(count(lit(1)).as("n"), min("doc_id").as("first_doc"))
      .where(col("n") > 1)
      .orderBy("fp64")
  }

  // --- multimodal ----------------------------------------------------------

  /** Binary-payload feature extraction rollup: modality → count + mean first
    * histogram bin (deterministic stub decode; Spark plumbing real). */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val assets = Multimodal.fakeAssets(table(spark, dir, "documents"))
    Multimodal.extractFeatures(assets, batchSize = 64)
      .groupBy("modality")
      .agg(count(lit(1)).as("n"), round(avg(element_at(col("features"), 1)), 4).as("avg_bin0"))
      .orderBy("modality")
  }

  /** Frame sampling: video assets → (asset_id, frame_no) rows. */
  def videoFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val assets = Multimodal.fakeAssets(table(spark, dir, "documents"))
    Multimodal.sampleFrames(assets, frames = 4)
      .groupBy("frame_no").agg(count(lit(1)).as("n"))
      .orderBy("frame_no")
  }

  // --- the core graph operator, driver-visible -----------------------------

  /** Dependency links over spans synthesized deterministically from `events`:
    * each event is a span; ~50 events share a trace; parent = previous
    * event id within the trace; service names from event_type; errors where
    * value < 0.05. Exercises the full distributed link pipeline (grouping,
    * linker, final agg) on driver data — semantics pinned by fixtures. */
  def dependencyLinks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val spans = table(spark, dir, "events").select(
      format_string("%016x", expr("event_id DIV 50")).as("traceId"),
      when(pmod(col("event_id"), lit(50)) =!= 0,
        format_string("%016x", col("event_id") - 1)).as("parentId"),
      format_string("%016x", col("event_id")).as("id"),
      element_at(array(lit("CLIENT"), lit("SERVER"), lit("CLIENT"), lit("SERVER")),
        (pmod(col("event_id"), lit(4)) + 1).cast("int")).as("kind"),
      (col("ts").cast("long") / lit(1000)).cast("long").as("timestamp"),
      lit(null).cast("long").as("duration"),
      lit(false).as("shared"),
      concat(lit("svc-"), col("event_type")).as("localServiceName"),
      concat(lit("svc-"), element_at(array(lit("click"), lit("view"), lit("purchase")),
        (pmod(col("user_id"), lit(3)) + 1).cast("int"))).as("remoteServiceName"),
      (col("value") < 0.05).as("errorTag"))
      .as[Span]
    LinkJob.linkSpans(spans, "2024-01-01", Admission.IndexDay)
      .orderBy("parent", "child").toDF()
  }

  /** Approximate distinct (HLL++) vs exact — the §4.3 cardinality surface
    * for 100 TB (exact distinct is a full shuffle of the values; HLL is a
    * fixed-size sketch mergeable map-side). Rows-only: DuckDB's approx
    * sketch differs. The exact column doubles as an in-row accuracy check. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .groupBy("source")
      .agg(
        approx_count_distinct(col("text"), 0.02).as("approx_uniq"),
        countDistinct(col("text")).as("exact_uniq"),
        count(lit(1)).as("n"))
      .orderBy("source")

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q21_dedup_keep_first" -> (dedupKeepFirst _),
    "q22_token_count" -> (tokenCounts _),
    "q23_text_stats_by_lang" -> (textStatsByLang _),
    "q24_ngram_neardups" -> (ngramNearDups _),
    "q25_minhash_neardups" -> (minhashNearDups _),
    "q26_simhash_neardups" -> (simhashNearDups _),
    "q27_embedding_topk" -> (embeddingTopK _),
    "q28_embedding_lsh_topk" -> (embeddingLshTopK _),
    "q29_lang_quality" -> (langQualityRollup _),
    "q30_fingerprint_buckets" -> (fingerprintBuckets _),
    "q31_multimodal_features" -> (multimodalFeatures _),
    "q32_video_frames" -> (videoFrameSample _),
    "q33_dependency_links" -> (dependencyLinks _),
    "q34_approx_distinct" -> (approxDistinct _)
  )

  /** DuckDB oracles for the SQL-expressible subset. */
  val oracles: Map[String, String] = Map(
    "q21_dedup_keep_first" ->
      "SELECT text, MIN(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id",
    "q22_token_count" ->
      "SELECT doc_id, len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens FROM documents ORDER BY doc_id",
    "q23_text_stats_by_lang" ->
      "SELECT lang, SUM(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))) AS toks, SUM(len(regexp_extract_all(text, '[[:punct:]]'))) AS punct FROM documents GROUP BY lang ORDER BY lang",
    "q24_ngram_neardups" ->
      ("WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t FROM documents), " +
        "grams AS (SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')] " +
        "ELSE list_transform(generate_series(1, len(t)-2), i -> array_to_string(t[i:i+2], ' ')) END) AS g FROM toks) " +
        "SELECT a.doc_id AS idA, b.doc_id AS idB, " +
        "ROUND(len(list_intersect(a.g, b.g))::DOUBLE / GREATEST(len(list_distinct(a.g || b.g)), 1), 6) AS jaccard " +
        "FROM grams a JOIN grams b ON a.doc_id < b.doc_id " +
        "WHERE len(list_intersect(a.g, b.g))::DOUBLE / GREATEST(len(list_distinct(a.g || b.g)), 1) >= 0.5 " +
        "ORDER BY idA, idB")
  )
}
