package graft.operators

import graft.ops.{Layout, PortableSketch, Scrub, SemDedup, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-selection operators (round 10): the decisions a training-data
  * pipeline makes about WHICH rows ship — semantic (embedding-space)
  * dedup, mixture-weighted sampling, PII scrubbing, epoch-order
  * materialization, and a model-shaped quality gate. Every query has a
  * DuckDB oracle replaying the exact per-row decision; constants are shared
  * between the Spark code and the generated SQL so they cannot drift.
  */
object SelectionQueries {
  import ContractQueries.table

  // --- q91: semantic dedup (SemDeDup) --------------------------------------

  /** Shared q91 constants (Spark + oracle). */
  private val KmInitEvery = 50
  private val KmInitMax = 800L
  private val KmIters = 2
  private val SemTau = 0.3
  private val SemRepCap = 256

  /** q91 — SemDeDup: deterministic k-means over the embedding corpus
    * (init = every 50th vector below id 800, 2 Lloyd rounds with 6-dp
    * rounded centroid means), then within-cluster cosine pruning at 0.3
    * against each cluster's first-256-by-id representatives. Per-cluster
    * profile: members and pruned count. */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "embeddings")
    val cents = SemDedup.kmeansFit(e, "embedding", "vec_id",
      KmInitEvery, KmInitMax, KmIters)
    SemDedup.assignAndPrune(e, "embedding", "vec_id", cents, SemTau, SemRepCap)
      .groupBy(col("_ci").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("_pruned").cast("long")).as("n_pruned"))
      .orderBy("cluster_id")
  }

  private def cosSql(a: String, b: String): String =
    s"CASE WHEN sqrt(list_dot_product($a,$a)) * sqrt(list_dot_product($b,$b)) = 0 THEN 0.0 " +
      s"ELSE list_dot_product($a,$b) / (sqrt(list_dot_product($a,$a)) * sqrt(list_dot_product($b,$b))) END"

  /** Argmax-cosine assignment of every vector in `e` to centroid CTE
    * `cent` (ci, cv) — ties to the higher ci, the ivfAssign convention. */
  private def assignCte(cent: String, out: String): String =
    s"$out AS (SELECT vec_id, v, ci FROM (SELECT e.vec_id, e.v, c.ci, " +
      s"ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.ci DESC) AS rn " +
      s"FROM e, $cent c) WHERE rn = 1)"

  /** Centroid update from assignment CTE `a`: per-dimension mean rounded
    * to 6 dp (the cross-engine float-parity pin), empty clusters drop. */
  private def updateCte(a: String, out: String): String =
    s"$out AS (SELECT ci, list(m ORDER BY i) AS cv FROM " +
      s"(SELECT ci, i, ROUND(avg(x), 6) AS m FROM " +
      s"(SELECT ci, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM $a) " +
      s"GROUP BY ci, i) GROUP BY ci)"

  private def q91OracleSql: String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS ci, v AS cv " +
      s"FROM (SELECT vec_id, v FROM (SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY vec_id) AS rk FROM e) WHERE (rk - 1) % $KmInitEvery = 0 AND rk <= $KmInitMax)), " +
      assignCte("c0", "a0") + ", " + updateCte("a0", "c1") + ", " +
      assignCte("c1", "a1") + ", " + updateCte("a1", "c2") + ", " +
      assignCte("c2", "a2") + ", " +
      "reps AS (SELECT vec_id, v, ci FROM (SELECT a2.*, " +
      s"ROW_NUMBER() OVER (PARTITION BY ci ORDER BY vec_id) AS rn FROM a2) WHERE rn <= $SemRepCap), " +
      "pruned AS (SELECT DISTINCT b.vec_id FROM a2 b JOIN reps a ON a.ci = b.ci AND a.vec_id < b.vec_id " +
      s"WHERE ${cosSql("a.v", "b.v")} >= $SemTau) " +
      "SELECT a2.ci AS cluster_id, count(*) AS n_members, " +
      "CAST(count(p.vec_id) AS BIGINT) AS n_pruned " +
      "FROM a2 LEFT JOIN pruned p ON a2.vec_id = p.vec_id " +
      "GROUP BY 1 ORDER BY 1"

  /** q155 — cluster-quality audit: the eval verb the embedding-cluster
    * family (q91 SemDeDup, q119 coreset, q47/q89 IVF) presumes but never
    * measured — is the clustering actually tight and separated? Per q91
    * cluster: cohesion (mean cosine to the OWN centroid), nearest-other
    * (mean cosine to the best FOREIGN centroid), the silhouette-style
    * margin (mean of own − other), and how many members sit strictly
    * closer to their own centroid. The per-vector k cosines are computed
    * ONCE (an array of (sim, ci) structs over the broadcast k×dim model);
    * own = struct max (tie → higher ci, the q91 rule), other = max of the
    * rest. Float discipline: the model coordinates are the 6-dp-rounded
    * k-means means (q91), per-vector cosines are engine-identical
    * left-to-right sums, and the only cross-engine float boundary is the
    * cluster AVG rounded to 4 dp (the q56/q81 precedent). */
  def clusterQuality(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "embeddings")
    val cents = SemDedup.kmeansFit(e, "embedding", "vec_id",
      KmInitEvery, KmInitMax, KmIters)
    val v = col("embedding").cast("array<double>")
    val scored = array(cents.map { case (ci, cv) =>
      struct(graft.ops.Similarity.cosine(v,
          array(cv.map(x => lit(x)): _*)).as("sim"),
        lit(ci).as("ci"))
    }: _*)
    e.select(col("vec_id"), scored.as("_s"))
      .withColumn("_own", array_max(col("_s")))
      .withColumn("_other", array_max(filter(col("_s"),
        s => s.getField("ci") =!= col("_own").getField("ci"))))
      .select(col("_own.ci").as("cluster_id"),
        col("_own.sim").as("_os"), col("_other.sim").as("_ns"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        round(avg("_os"), 4).as("cohesion"),
        round(avg("_ns"), 4).as("nearest_other"),
        round(avg(col("_os") - col("_ns")), 4).as("margin"),
        sum(when(col("_os") > col("_ns"), 1L).otherwise(0L)).as("n_separated"))
      .orderBy("cluster_id")
  }

  private def q155OracleSql: String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS ci, v AS cv " +
      s"FROM (SELECT vec_id, v FROM (SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY vec_id) AS rk FROM e) WHERE (rk - 1) % $KmInitEvery = 0 AND rk <= $KmInitMax)), " +
      assignCte("c0", "a0") + ", " + updateCte("a0", "c1") + ", " +
      assignCte("c1", "a1") + ", " + updateCte("a1", "c2") + ", " +
      // all k cosines per vector against the fitted model, then own/other
      s"sc AS (SELECT e.vec_id, c.ci, ${cosSql("e.v", "c.cv")} AS sim FROM e, c2 c), " +
      "own AS (SELECT vec_id, ci, sim FROM (SELECT sc.*, " +
      "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, ci DESC) AS rn FROM sc) WHERE rn = 1), " +
      "oth AS (SELECT sc.vec_id, MAX(sc.sim) AS sim FROM sc JOIN own ON sc.vec_id = own.vec_id " +
      "AND sc.ci <> own.ci GROUP BY 1) " +
      "SELECT own.ci AS cluster_id, count(*)::BIGINT AS n_members, " +
      "ROUND(AVG(own.sim), 4) AS cohesion, ROUND(AVG(oth.sim), 4) AS nearest_other, " +
      "ROUND(AVG(own.sim - oth.sim), 4) AS margin, " +
      "SUM(CASE WHEN own.sim > oth.sim THEN 1 ELSE 0 END)::BIGINT AS n_separated " +
      "FROM own JOIN oth ON own.vec_id = oth.vec_id " +
      "GROUP BY 1 ORDER BY 1"

  // --- q119: cluster-balanced coreset selection -----------------------------

  /** q119 — CLUSTER-BALANCED CORESET: diversity subsampling in embedding
    * space (the D4/SemDeDup-family "balance the clusters" step): the q91
    * k-means blocks the corpus, then each cluster keeps only
    * ceil(sqrt(|cluster|)) members — concentration in over-represented
    * regions is downweighted sublinearly while every region keeps
    * representation. WHICH members survive is a deterministic content-hash
    * shuffle (h60 of 'cs:'+id, ties by id — the q94 epoch-order mechanism),
    * so re-runs and other engines keep identical ids. Scale shape: one
    * assignment pass against the broadcast centroid model (bounded, q91's);
    * quota + rank run inside one cluster-partitioned exchange (count and
    * row_number share the partitioning); the report is cluster-bounded.
    * sqrt/ceil arithmetic is exact-integer-input double math — identical
    * across engines. */
  def coresetSample(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(spark)
    val e = table(spark, dir, "embeddings")
    val cents = SemDedup.kmeansFit(e, "embedding", "vec_id",
      KmInitEvery, KmInitMax, KmIters)
    val assigned = graft.ops.Partitioning.spread(e)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("_v"))
      .withColumn("_ci", SemDedup.assignLabeled(col("_v"), cents))
      .select(col("vec_id"), col("_ci"))
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy("_ci").orderBy(
      PortableSketch.h60(concat(lit("cs:"), col("vec_id").cast("string"))).asc,
      col("vec_id").asc)
    val sz = Window.partitionBy("_ci")
    assigned
      .withColumn("_n", count(lit(1)).over(sz))
      .withColumn("_rn", row_number().over(ord))
      .where(col("_rn") <= ceil(sqrt(col("_n"))))
      .groupBy(col("_ci").as("cluster_id"))
      .agg(max("_n").as("n_members"),
        count(lit(1)).as("n_kept"),
        sum("vec_id").as("kept_id_sum"),
        min("vec_id").as("kept_min_id"))
      .orderBy("cluster_id")
  }

  private def q119OracleSql: String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS ci, v AS cv " +
      s"FROM (SELECT vec_id, v FROM (SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY vec_id) AS rk FROM e) WHERE (rk - 1) % $KmInitEvery = 0 AND rk <= $KmInitMax)), " +
      assignCte("c0", "a0") + ", " + updateCte("a0", "c1") + ", " +
      assignCte("c1", "a1") + ", " + updateCte("a1", "c2") + ", " +
      assignCte("c2", "a2") + ", " +
      "ranked AS (SELECT vec_id, ci, " +
      "COUNT(*) OVER (PARTITION BY ci) AS n, " +
      "ROW_NUMBER() OVER (PARTITION BY ci ORDER BY " +
      "('0x' || substr(md5('cs:' || vec_id), 1, 15))::BIGINT, vec_id) AS rn FROM a2) " +
      "SELECT ci AS cluster_id, max(n)::BIGINT AS n_members, " +
      "count(*) AS n_kept, sum(vec_id)::BIGINT AS kept_id_sum, " +
      "min(vec_id) AS kept_min_id " +
      "FROM ranked WHERE rn <= ceil(sqrt(n)) GROUP BY ci ORDER BY ci"

  // --- q92: mixture-weighted sampling --------------------------------------

  /** Target corpus-token fraction for the sampled epoch. */
  private val MixSampleF = 0.5
  private val MixSampleAlpha = 0.3

  /** q92 — mixture-weighted epoch sampling: per-source keep rates derived
    * from the q86 temperature-scaled weights (rate_s = min(1, F·w_s/share_s),
    * rounded to 6 dp), applied as a deterministic content-hash Bernoulli
    * (16-bit md5 bucket < rate·65536 — the q50 split mechanism, so re-runs
    * and other engines keep the identical documents). One token-count scan,
    * one tiny per-source frame broadcast back onto the corpus. */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), col("source"), col("text"),
        size(TextOps.tokens(col("text"))).as("_nt"))
    val perSource = d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("_nt").as("n_tokens"))
    val tot = perSource.agg(sum("n_tokens").as("_tot"))
    val r = perSource.crossJoin(broadcast(tot))
      .withColumn("_share", col("n_tokens").cast("double") / col("_tot"))
      .withColumn("_raw", pow(col("_share"), lit(MixSampleAlpha)))
    val rsum = r.agg(sum("_raw").as("_rsum"))
    val rates = r.crossJoin(broadcast(rsum))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        least(lit(1.0), round(lit(MixSampleF) * (col("_raw") / col("_rsum")) / col("_share"), 6)).as("rate"))
    val kept = d.join(broadcast(rates.select("source", "rate")), Seq("source"))
      .withColumn("_keep",
        conv(substring(md5(encode(concat(lit("mix"), col("text")), "UTF-8")), 1, 4), 16, 10).cast("long")
          < round(col("rate") * 65536).cast("long"))
      .groupBy("source")
      .agg(sum(col("_keep").cast("long")).as("n_kept"),
        sum(when(col("_keep"), col("_nt")).otherwise(0L)).as("kept_tokens"))
    rates.join(kept, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("rate"),
        col("n_kept"), col("kept_tokens"))
      .orderBy("source")
  }

  private def q92OracleSql: String =
    """WITH d AS (SELECT doc_id, source, text,
      |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS nt
      |  FROM documents),
      |ps AS (SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
      |       FROM d GROUP BY 1),
      |t AS (SELECT sum(n_tokens) AS tot FROM ps),
      |r AS (SELECT source, n_docs, n_tokens,
      |        n_tokens::DOUBLE / t.tot AS share,
      |        pow(n_tokens::DOUBLE / t.tot, 0.3::DOUBLE) AS raw
      |      FROM ps, t),
      |rs AS (SELECT sum(raw) AS rsum FROM r),
      |rt AS (SELECT source, n_docs, n_tokens,
      |        LEAST(1.0, ROUND(0.5 * (raw / rs.rsum) / share, 6)) AS rate
      |      FROM r, rs),
      |k AS (SELECT d.source, d.nt,
      |        ('0x' || substr(md5('mix' || d.text), 1, 4))::BIGINT
      |          < CAST(ROUND(rt.rate * 65536) AS BIGINT) AS keep
      |      FROM d JOIN rt ON d.source = rt.source),
      |ka AS (SELECT source,
      |        CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |        CAST(sum(CASE WHEN keep THEN nt ELSE 0 END) AS BIGINT) AS kept_tokens
      |      FROM k GROUP BY 1)
      |SELECT rt.source, rt.n_docs, rt.n_tokens, rt.rate, ka.n_kept, ka.kept_tokens
      |FROM rt JOIN ka USING (source) ORDER BY source""".stripMargin

  // --- q93: PII scrub profile ----------------------------------------------

  private val ChecksumMod = 1000000007L

  /** q93 — PII scrub profile over the two string surfaces of the corpus
    * (customer names, event property blobs): per source, rows scanned, hits
    * per rule (email, IPv4, digit-run — each counted on the text as earlier
    * rules left it), and an order-insensitive checksum of the MASKED text
    * (sum of 60-bit md5 mod 1e9+7) that pins the exact replacement
    * semantics cross-engine. Single projection per row; the rollup is a
    * 2-group aggregation. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer")
      .select(lit("customer").as("src"), col("c_name").as("s"))
    val ev = table(spark, dir, "events")
      .select(lit("events").as("src"), col("props").as("s"))
    graft.ops.Partitioning.spread(cust.unionByName(ev))
      .withColumn("_r", Scrub.scrub(col("s")))
      .groupBy("src")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("_r.n_email").cast("long")).as("n_email"),
        sum(col("_r.n_ip").cast("long")).as("n_ip"),
        sum(col("_r.n_num").cast("long")).as("n_num"),
        sum(PortableSketch.h60(col("_r.masked")) % ChecksumMod).as("mask_checksum"))
      .orderBy("src")
  }

  private def q93OracleSql: String =
    s"""WITH rows0 AS (SELECT 'customer' AS src, c_name AS s FROM customer
      |  UNION ALL SELECT 'events', props FROM events),
      |m AS (SELECT src, s,
      |    regexp_replace(s, '${Scrub.EmailRe}', '<EMAIL>', 'g') AS s1
      |  FROM rows0),
      |m2 AS (SELECT src, s, s1,
      |    regexp_replace(s1, '${Scrub.Ipv4Re}', '<IP>', 'g') AS s2
      |  FROM m),
      |m3 AS (SELECT src,
      |    len(regexp_extract_all(s, '${Scrub.EmailRe}')) AS n_email,
      |    len(regexp_extract_all(s1, '${Scrub.Ipv4Re}')) AS n_ip,
      |    len(regexp_extract_all(s2, '${Scrub.DigitRunRe}')) AS n_num,
      |    regexp_replace(s2, '${Scrub.DigitRunRe}', '<NUM>', 'g') AS s3
      |  FROM m2)
      |SELECT src, count(*) AS n_rows,
      |  CAST(sum(n_email) AS BIGINT) AS n_email,
      |  CAST(sum(n_ip) AS BIGINT) AS n_ip,
      |  CAST(sum(n_num) AS BIGINT) AS n_num,
      |  CAST(sum(('0x' || substr(md5(s3), 1, 15))::BIGINT % $ChecksumMod) AS BIGINT) AS mask_checksum
      |FROM m3 GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q111: rare-token suppression ----------------------------------------

  /** q111 — RARE-TOKEN suppression (the k-anonymity pass memorization
    * mitigation runs after regex PII scrubbing): any token whose CORPUS
    * frequency is below K masks to `<RARE>` — regexes catch shaped PII
    * (q93), this catches the unshaped long tail (account ids, one-off
    * handles) that a model can only reproduce by memorizing. Runs over the
    * same two high-cardinality string surfaces as q93. Scale shape: the
    * frequency table aggregates first (vocab-bounded, map-side partials);
    * the membership join's MATCHING keys are skew-immune by definition
    * (every rare token has < K occurrences), and the frequent-token probe
    * side carries no matches, so an AQE skew split can always divide it —
    * same posture as the q97 flagged-gram join, measured in BASELINE (q).
    * The rebuild re-assembles each row's token sequence by position
    * (array_sort on (pos, token) structs — no window), and the checksum
    * (Σ h60 mod 1e9+7, q93's mechanism) pins the exact rewritten text
    * cross-engine. */
  def rareScrub(spark: SparkSession, dir: String): DataFrame = {
    val RareK = 3
    val cust = table(spark, dir, "customer")
      .select(lit("customer").as("src"), col("c_custkey").as("rid"), col("c_name").as("s"))
    val ev = table(spark, dir, "events")
      .select(lit("events").as("src"), col("event_id").as("rid"), col("props").as("s"))
    // persist: read by the frequency aggregation and the mask join.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val toks = graft.ops.Partitioning.spread(cust.unionByName(ev))
      .select(col("src"), col("rid"), posexplode(graft.ops.TextOps.tokens(col("s"))))
      .withColumnRenamed("col", "w").persist()
    val rare = toks.groupBy("w").agg(count(lit(1)).as("_c"))
      .where(col("_c") < RareK).select(col("w"), lit(1).as("_rare"))
    toks.join(rare, Seq("w"), "left")
      .select(col("src"), col("rid"), col("pos"),
        when(col("_rare").isNotNull, lit("<RARE>")).otherwise(col("w")).as("_t"),
        coalesce(col("_rare"), lit(0)).as("_r"))
      .groupBy("src", "rid")
      .agg(count(lit(1)).as("_n"), sum("_r").as("_m"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("_t")))),
          x => x.getField("_t"))).as("_rb"))
      .groupBy("src")
      .agg(count(lit(1)).as("n_rows"),
        sum("_n").as("n_tokens"),
        sum("_m").cast("long").as("n_masked"),
        round(sum("_m") / sum("_n"), 6).as("masked_frac"),
        sum(PortableSketch.h60(col("_rb")) % ChecksumMod).as("rare_checksum"))
      .orderBy("src")
  }

  private def q111OracleSql: String =
    s"""WITH rows0 AS (SELECT 'customer' AS src, c_custkey AS rid, c_name AS s FROM customer
      |  UNION ALL SELECT 'events', event_id, props FROM events),
      |tk AS (SELECT src, rid, list_filter(string_split_regex(s, '\\s+'), x -> x <> '') AS ts FROM rows0),
      |toks AS (SELECT src, rid, unnest(ts) AS w,
      |           unnest(generate_series(1, len(ts))) AS pos FROM tk),
      |rare AS (SELECT w FROM (SELECT w, count(*) AS c FROM toks GROUP BY w) WHERE c < 3),
      |m AS (SELECT t.src, t.rid, t.pos,
      |        CASE WHEN r.w IS NULL THEN t.w ELSE '<RARE>' END AS tt,
      |        CASE WHEN r.w IS NULL THEN 0 ELSE 1 END AS msk
      |      FROM toks t LEFT JOIN rare r ON t.w = r.w),
      |d AS (SELECT src, rid, count(*) AS n, sum(msk) AS m2,
      |        string_agg(tt, ' ' ORDER BY pos) AS rb
      |      FROM m GROUP BY 1, 2)
      |SELECT src, count(*) AS n_rows, sum(n)::BIGINT AS n_tokens,
      |  sum(m2)::BIGINT AS n_masked,
      |  round(sum(m2) / sum(n), 6) AS masked_frac,
      |  CAST(sum(('0x' || substr(md5(rb), 1, 15))::BIGINT % $ChecksumMod) AS BIGINT) AS rare_checksum
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q113: importance-weighted selection (DSIR) ---------------------------

  /** Shared q113 constants (Spark + oracle). */
  private val DsirBuckets = 128
  private val DsirTargetLang = "en"

  /** q113 — IMPORTANCE-WEIGHTED data selection (the DSIR shape, Xie et al.
    * 2023): score every document by how target-like its hashed unigram
    * distribution is, where "target" is the in-domain slice (here
    * lang = 'en') and "raw" is the whole corpus. Tokens hash into
    * [[DsirBuckets]] buckets (h60 mod B — engine-portable); both bucket
    * distributions get add-one smoothing; each bucket's log importance
    * ratio ln(p_target / p_raw) is rounded to 9 dp so both engines sum the
    * SAME per-token contributions (the SemDedup float-parity mechanism —
    * summation-order wobble ~1e-12 against a 5e-7 rounding margin); a
    * document's log-weight is the sum over its token positions, and
    * selection keeps logw > 0 (more target-like than the corpus average).
    * Scale shape: the corpus tokenizes ONCE (persisted explode feeds the
    * bucket counts and the per-doc scoring); the distribution estimate is a
    * B-bounded aggregate with map-side partials; the ratio model is a
    * 128-row broadcast — at 100 TB the whole fit is one corpus scan plus a
    * bounded-model join, and scoring a new batch reuses the broadcast
    * model without refitting. */
  def importanceWeights(spark: SparkSession, dir: String): DataFrame = {
    val B = DsirBuckets
    // persist: feeds the bucket-distribution fit AND the per-doc scoring.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val toks = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), col("source"), col("lang"),
        explode(TextOps.tokens(col("text"))).as("w"))
      .select(col("doc_id"), col("source"),
        (PortableSketch.h60(col("w")) % B).as("b"),
        when(col("lang") === DsirTargetLang, 1L).otherwise(0L).as("t"))
      .persist()
    val counts = toks.groupBy("b")
      .agg(count(lit(1)).as("cr"), sum("t").as("ct"))
    // one-row corpus totals: broadcast onto the 128-row bucket frame
    val totals = counts.agg(sum("cr").as("tr"), sum("ct").as("tt"))
    val ratio = counts.crossJoin(broadcast(totals))
      .select(col("b"), round(log(
        ((col("ct") + 1).cast("double") / (col("tt") + B)) /
          ((col("cr") + 1).cast("double") / (col("tr") + B))), 9).as("r"))
    val perDoc = toks.join(broadcast(ratio), Seq("b"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), round(sum("r"), 6).as("logw"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(when(col("logw") > 0, 1L).otherwise(0L)).as("sel_docs"),
        sum("n").as("n_tokens"),
        round(avg("logw"), 6).as("avg_logw"),
        round(max("logw"), 6).as("max_logw"))
      .orderBy("source")
  }

  private def q113OracleSql: String = {
    val b = DsirBuckets
    s"""WITH tk AS (SELECT doc_id, source, lang,
      |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ts FROM documents),
      |toks AS (SELECT doc_id, source,
      |    ('0x' || substr(md5(unnest(ts)), 1, 15))::BIGINT % $b AS b,
      |    CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END AS t FROM tk),
      |cnt AS (SELECT b, count(*) AS cr, sum(t) AS ct FROM toks GROUP BY b),
      |tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM cnt),
      |ratio AS (SELECT b, round(ln(
      |    ((ct + 1)::DOUBLE / (tt + $b)) / ((cr + 1)::DOUBLE / (tr + $b))), 9) AS r
      |  FROM cnt, tot),
      |pd AS (SELECT doc_id, source, count(*) AS n, round(sum(r), 6) AS logw
      |  FROM toks JOIN ratio USING (b) GROUP BY 1, 2)
      |SELECT source, count(*) AS docs,
      |  sum(CASE WHEN logw > 0 THEN 1 ELSE 0 END)::BIGINT AS sel_docs,
      |  sum(n)::BIGINT AS n_tokens,
      |  round(avg(logw), 6) AS avg_logw,
      |  round(max(logw), 6) AS max_logw
      |FROM pd GROUP BY source ORDER BY source""".stripMargin
  }

  // --- q94: epoch-order materialization ------------------------------------

  /** q94 — deterministic training epoch order: every document gets an exact
    * 1-based global position under a content-hash shuffle key (md5 of
    * 'ord:'+text — stable across runs and engines, no RNG state), via the
    * two-pass distributed ranking in Layout.globalSequence (range partition
    * + per-range rank + offsets; no single-partition window). The profile
    * aggregates positions per source — a uniform shuffle shows every source
    * spread across the whole [1, N] range. */
  def epochOrder(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        PortableSketch.h60(concat(lit("ord:"), col("text"))).as("_ord"))
    Layout.globalSequence(o, Seq(col("_ord"), col("doc_id")), "pos")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        min("pos").as("first_pos"), max("pos").as("last_pos"),
        sum("pos").as("pos_sum"))
      .orderBy("source")
  }

  private def q94OracleSql: String =
    """WITH o AS (SELECT doc_id, source,
      |    ('0x' || substr(md5('ord:' || text), 1, 15))::BIGINT AS ord
      |  FROM documents),
      |p AS (SELECT source, ROW_NUMBER() OVER (ORDER BY ord, doc_id) AS pos FROM o)
      |SELECT source, count(*) AS n_docs, min(pos) AS first_pos,
      |  max(pos) AS last_pos, CAST(sum(pos) AS BIGINT) AS pos_sum
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q100: epoch-order continuation across restarts ----------------------

  /** q100 — resumable epoch order: the corpus arrives as two shards (split
    * by the parity of the order hash) and each is sequenced by
    * [[Layout.resumeSequence]] through a durable one-long state file, so
    * the second shard's positions continue exactly where the first
    * stopped — the restartable form of q94 a pipeline needs when training
    * data lands incrementally. Concatenating the shards in call order is
    * exactly `ROW_NUMBER() OVER (ORDER BY shard, ord, doc_id)`, which is
    * what the oracle replays. */
  def epochResume(spark: SparkSession, dir: String): DataFrame = {
    val state = java.nio.file.Files
      .createTempDirectory("graft-seq-state").resolve("state").toString
    val o = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        PortableSketch.h60(concat(lit("ord:"), col("text"))).as("_ord"))
      .withColumn("batch", pmod(col("_ord"), lit(2L)))
    val keys = Seq(col("_ord"), col("doc_id"))
    val s0 = Layout.resumeSequence(o.where(col("batch") === 0L), keys, state)
    val s1 = Layout.resumeSequence(o.where(col("batch") === 1L), keys, state)
    s0.unionByName(s1)
      .groupBy("batch", "source")
      .agg(count(lit(1)).as("n_docs"),
        min("pos").as("first_pos"), max("pos").as("last_pos"),
        sum("pos").as("pos_sum"))
      .orderBy("batch", "source")
  }

  private def q100OracleSql: String =
    """WITH o AS (SELECT doc_id, source,
      |    ('0x' || substr(md5('ord:' || text), 1, 15))::BIGINT AS ord
      |  FROM documents),
      |p AS (SELECT source, ord % 2 AS batch,
      |    ROW_NUMBER() OVER (ORDER BY ord % 2, ord, doc_id) AS pos FROM o)
      |SELECT batch, source, count(*) AS n_docs, min(pos) AS first_pos,
      |  max(pos) AS last_pos, CAST(sum(pos) AS BIGINT) AS pos_sum
      |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --- q95: hashed linear quality gate -------------------------------------

  /** q95 — hashed-bag-of-words linear classifier gate: integer weights
    * derived from each token's 60-bit md5 (bucket % 97 − 48), per-document
    * integer score over token occurrences, gate = score ≥ 0. All-integer
    * arithmetic end to end — the keep decision has no float boundary for
    * an engine to disagree on. Explode → per-doc partial agg → per-(lang,
    * keep) rollup, each shuffle strictly smaller. */
  def classifierGate(spark: SparkSession, dir: String): DataFrame = {
    val tk = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), col("lang"),
        explode(TextOps.tokens(col("text"))).as("w"))
    val perDoc = tk.groupBy("doc_id", "lang")
      .agg(sum(Scrub.tokenWeight(col("w"))).as("_score"),
        count(lit(1)).as("_n"))
    perDoc
      .withColumn("keep", (col("_score") >= 0).cast("int"))
      .groupBy("lang", "keep")
      .agg(count(lit(1)).as("n_docs"),
        sum("_score").as("score_sum"), sum("_n").as("token_sum"))
      .orderBy("lang", "keep")
  }

  private def q95OracleSql: String =
    """WITH tk AS (SELECT doc_id, lang,
      |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
      |  FROM documents),
      |pd AS (SELECT doc_id, lang,
      |    CAST(sum(((('0x' || substr(md5(w), 1, 15))::BIGINT % 1024) % 97) - 48) AS BIGINT) AS score,
      |    count(*) AS n
      |  FROM tk GROUP BY 1, 2)
      |SELECT lang, CAST(score >= 0 AS INTEGER) AS keep, count(*) AS n_docs,
      |  CAST(sum(score) AS BIGINT) AS score_sum, CAST(sum(n) AS BIGINT) AS token_sum
      |FROM pd GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --- q96: embedding-score quality filter ---------------------------------

  /** q96 — embedding-score filtering (the DFN/CLIP-score-filter shape):
    * score every vector by cosine against an anchor direction (the
    * 6-dp-rounded mean of the label-0 embeddings — in a real pipeline, the
    * centroid of a curated seed set), keep everything at or above the 0.75
    * quantile. The threshold comes from an EXACT interpolated percentile of
    * a deterministic 25% content-hash sample — the scale pattern: the exact
    * percentile buffers only the bounded sample, never the corpus, and the
    * sample membership (md5 bucket) is replayable by any engine. Two
    * corpus passes (anchor agg, scoring) + two one-row broadcasts; min/max
    * per label are order-insensitive so the profile is bit-stable. */
  def embeddingFilter(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(spark)
    val e = graft.ops.Partitioning.spread(table(spark, dir, "embeddings"))
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("_v"))
    val anchor = e.where(col("label") === 0)
      .select(posexplode(col("_v")).as(Seq("_pos", "_x")))
      .groupBy("_pos").agg(round(avg("_x"), 6).as("_m"))
      .agg(sort_array(collect_list(struct(col("_pos"), col("_m")))).as("_dims"))
      .select(transform(col("_dims"), d => d.getField("_m")).as("_av"))
    // persist: the scored frame feeds the sample percentile and the final
    // rollup. Ownership: Verify/Bench clear caches per query.
    val scored = e.crossJoin(broadcast(anchor))
      .withColumn("score", graft.ops.Similarity.cosine(col("_v"), col("_av")))
      .withColumn("_in_sample",
        substring(md5(encode(concat(lit("q96"), col("vec_id").cast("string")), "UTF-8")), 1, 4) < "4000")
      .persist()
    val th = scored.where(col("_in_sample"))
      .agg(expr("percentile(score, 0.75D)").as("_th"))
    scored.crossJoin(broadcast(th))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum((col("score") >= col("_th")).cast("long")).as("n_keep"),
        round(min("score"), 6).as("min_score"),
        round(max("score"), 6).as("max_score"))
      .orderBy("label")
  }

  private def q96OracleSql: String =
    "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "a0 AS (SELECT i, ROUND(avg(x), 6) AS m FROM " +
      "(SELECT unnest(v) AS x, generate_subscripts(v, 1) AS i FROM e WHERE label = 0) GROUP BY i), " +
      "anchor AS (SELECT list(m ORDER BY i) AS av FROM a0), " +
      "s AS (SELECT e.vec_id, e.label, " + cosSql("e.v", "anchor.av") + " AS score, " +
      "substr(md5('q96' || CAST(e.vec_id AS VARCHAR)), 1, 4) < '4000' AS in_sample " +
      "FROM e, anchor), " +
      "t AS (SELECT quantile_cont(score, 0.75) AS th FROM s WHERE in_sample) " +
      "SELECT label, count(*) AS n_vecs, " +
      "CAST(sum(CASE WHEN score >= t.th THEN 1 ELSE 0 END) AS BIGINT) AS n_keep, " +
      "ROUND(min(score), 6) AS min_score, ROUND(max(score), 6) AS max_score " +
      "FROM s, t GROUP BY label ORDER BY label"

  // --- q97: corpus-frequency boilerplate screen ----------------------------

  /** Grams repeated in more than this many distinct documents are
    * boilerplate. */
  private val BoilerDf = 3

  /** q97 — corpus-wide boilerplate detection (the C4/Gopher "discard
    * passages repeated across documents" rule): a token position is
    * boilerplate-flagged when the word 3-gram starting there occurs in more
    * than `BoilerDf` distinct documents. Per-source profile: gram starts,
    * flagged starts, boilerplate fraction. Every corpus-sized shuffle
    * carries (doc_id, 8-byte gram hash) — gram strings collapse to h60
    * before leaving the row (the q59/q80 hash-not-strings rule); the gram
    * relation materializes once and feeds both the document-frequency
    * aggregation and the flag join. */
  def boilerplate(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), col("source"), TextOps.tokens(col("text")).as("_t"))
      .withColumn("_starts", greatest(size(col("_t")) - 2, lit(0)))
    // persist: read by the df aggregation and the flag join.
    // Ownership: Verify/Bench clear caches per query.
    val grams = d.where(col("_starts") > 0)
      .select(col("doc_id"), col("_starts"),
        explode(transform(sequence(lit(1), col("_starts")),
          i => PortableSketch.h60(concat_ws(" ", slice(col("_t"), i, lit(3)))))).as("_g"))
      .persist()
    val boiler = grams.select("doc_id", "_g").distinct()
      .groupBy("_g").agg(count(lit(1)).as("_df"))
      .where(col("_df") > BoilerDf).select("_g")
    val flagged = grams.join(boiler, Seq("_g"))
      .groupBy("doc_id").agg(count(lit(1)).as("_fl"))
    d.select(col("doc_id"), col("source"), col("_starts"))
      .join(flagged, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("_starts").as("n_starts"),
        sum(coalesce(col("_fl"), lit(0L))).as("n_flagged"),
        round(sum(coalesce(col("_fl"), lit(0L))).cast("double") / sum("_starts"), 6).as("boiler_frac"))
      .orderBy("source")
  }

  private def q97OracleSql: String =
    s"""WITH toks AS (SELECT doc_id, source,
      |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
      |  FROM documents),
      |d AS (SELECT doc_id, source, greatest(len(t) - 2, 0) AS starts, t FROM toks),
      |g AS (SELECT doc_id,
      |    ('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 15))::BIGINT AS gh
      |  FROM d, unnest(generate_series(1, starts)) AS u(i) WHERE starts > 0),
      |b AS (SELECT gh FROM (SELECT gh, count(DISTINCT doc_id) AS df FROM g GROUP BY 1)
      |      WHERE df > $BoilerDf),
      |f AS (SELECT doc_id, count(*) AS fl FROM g JOIN b USING (gh) GROUP BY 1)
      |SELECT source, count(*) AS n_docs, CAST(sum(starts) AS BIGINT) AS n_starts,
      |  CAST(sum(COALESCE(fl, 0)) AS BIGINT) AS n_flagged,
      |  ROUND(sum(COALESCE(fl, 0))::DOUBLE / sum(starts), 6) AS boiler_frac
      |FROM d LEFT JOIN f USING (doc_id) GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q99: the full selection pipeline, end to end ------------------------

  /** q99 — the training-data pipeline FUNNEL: scrub → model-quality gate →
    * exact dedup → near-dup prune → mixture sampling, composed as one
    * query, reporting surviving documents and tokens after every stage.
    * Every stage is individually oracled (q93, q95, q21, q63, q92); this
    * query certifies the COMPOSITION — masking feeds the gate's tokens,
    * dedup runs on masked text, sampling rates are computed on what
    * actually survives dedup. Stage mechanics keep their scale shapes:
    * row-local scrub/score, digest-keyed exact dedup (text never shuffles;
    * the oracle partitions by the text itself — identical decisions short
    * of a 128-bit collision), banded LSH with capped buckets, broadcast
    * rate table. */
  def pipelineFunnel(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(spark)
    val s0 = graft.ops.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), col("source"), col("text"))
    // S1 scrub: all downstream stages see masked text only. BOTH token
    // counts (raw + masked) and the gate score ride in this one persisted
    // projection, so the regex scrub and tokenization run exactly once —
    // the stage-0/1 reports used to re-run them on unpersisted frames.
    // Ownership: Verify/Bench clear caches per query.
    val s1 = s0
      .withColumn("_nt0", size(TextOps.tokens(col("text"))))
      .withColumn("_m", Scrub.scrub(col("text")).getField("masked"))
      .withColumn("_nt", size(TextOps.tokens(col("_m"))))
      .withColumn("_score", graft.streaming.StreamingScrub.score(col("_m")))
      .persist()
    // S2 quality gate: integer hashed-BoW score on the masked text (array
    // fold — row-local, shared with the streaming mirror); a cheap cached
    // filter, re-read by winners + near-dup input + rate aggregation
    val s2 = s1.where(col("_score") >= 0)
    // S3 exact dedup, keep-first: group on a 128-bit digest pair so text
    // never travels as a shuffle key
    val winners = s2.select(xxhash64(col("_m")).as("_d1"),
        xxhash64(lit(0x9E3779B9L), col("_m")).as("_d2"), col("doc_id"))
      .groupBy("_d1", "_d2").agg(min("doc_id").as("doc_id"))
    val s3 = s2.join(winners.select("doc_id"), Seq("doc_id"), "left_semi").persist()
    // S4 near-dup prune: drop the larger id of every estimated pair
    val dupIds = PortableSketch.minhashNearDups(s3, "_m", "doc_id",
      k = 16, bands = 4, n = 3, threshold = 0.5)
      .select(col("idB").as("doc_id")).distinct()
    val s4 = s3.join(dupIds, Seq("doc_id"), "left_anti").persist()
    // S5 mixture sampling at F=0.5, rates from the S4 survivors
    val ps = s4.groupBy("source").agg(sum("_nt").as("n_tokens"))
    val tot = ps.agg(sum("n_tokens").as("_tot"))
    val r = ps.crossJoin(broadcast(tot))
      .withColumn("_share", col("n_tokens").cast("double") / col("_tot"))
      .withColumn("_raw", pow(col("_share"), lit(MixSampleAlpha)))
    val rsum = r.agg(sum("_raw").as("_rsum"))
    val rates = r.crossJoin(broadcast(rsum))
      .select(col("source"),
        least(lit(1.0), round(lit(MixSampleF) * (col("_raw") / col("_rsum")) / col("_share"), 6)).as("_rate"))
    val s5 = s4.join(broadcast(rates), Seq("source"))
      .where(conv(substring(md5(encode(concat(lit("mix"), col("_m")), "UTF-8")), 1, 4), 16, 10).cast("long")
        < round(col("_rate") * 65536).cast("long"))
    def stage(name: String, df: DataFrame, tokens: Column): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(tokens), lit(0L)).as("n_tokens"))
        .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
    stage("0_ingest", s1, col("_nt0"))
      .unionByName(stage("1_scrub", s1, col("_nt")))
      .unionByName(stage("2_quality", s2, col("_nt")))
      .unionByName(stage("3_exact_dedup", s3, col("_nt")))
      .unionByName(stage("4_near_dedup", s4, col("_nt")))
      .unionByName(stage("5_sampled", s5, col("_nt")))
      .orderBy("stage")
  }

  private def q99OracleSql: String =
    "WITH " +
      s"""m AS (SELECT doc_id, source, text,
      |    regexp_replace(regexp_replace(regexp_replace(text,
      |      '${Scrub.EmailRe}', '<EMAIL>', 'g'),
      |      '${Scrub.Ipv4Re}', '<IP>', 'g'),
      |      '${Scrub.DigitRunRe}', '<NUM>', 'g') AS mt
      |  FROM documents),
      |tok AS (SELECT doc_id, source, text, mt,
      |    list_filter(string_split_regex(mt, '\\s+'), x -> x <> '') AS t
      |  FROM m),
      |sc AS (SELECT *, COALESCE(list_sum(list_transform(t,
      |    w -> ((('0x' || substr(md5(w), 1, 15))::BIGINT % 1024) % 97) - 48)), 0) AS score
      |  FROM tok),
      |s2 AS (SELECT * FROM sc WHERE score >= 0),
      |s3 AS (SELECT * FROM s2 QUALIFY ROW_NUMBER() OVER (PARTITION BY mt ORDER BY doc_id) = 1),
      |s3t AS (SELECT doc_id, mt AS text FROM s3),
      |""".stripMargin +
      graft.operators.PortableQueries.minhashCtesFor("s3t") + ",\n" +
      """d4 AS (SELECT DISTINCT idB FROM j WHERE est_jaccard >= 0.5),
      |s4 AS (SELECT * FROM s3 WHERE doc_id NOT IN (SELECT idB FROM d4)),
      |ps AS (SELECT source, CAST(sum(len(t)) AS BIGINT) AS n_tokens FROM s4 GROUP BY 1),
      |tt AS (SELECT sum(n_tokens) AS tot FROM ps),
      |r AS (SELECT source, n_tokens::DOUBLE / tt.tot AS share,
      |        pow(n_tokens::DOUBLE / tt.tot, 0.3::DOUBLE) AS raw FROM ps, tt),
      |rs AS (SELECT sum(raw) AS rsum FROM r),
      |rt AS (SELECT source, LEAST(1.0, ROUND(0.5 * (raw / rs.rsum) / share, 6)) AS rate FROM r, rs),
      |s5 AS (SELECT s4.* FROM s4 JOIN rt USING (source)
      |       WHERE ('0x' || substr(md5('mix' || mt), 1, 4))::BIGINT
      |             < CAST(ROUND(rt.rate * 65536) AS BIGINT)),
      |rawtok AS (SELECT doc_id, len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS rt0 FROM documents)
      |SELECT stage, n_docs, n_tokens FROM (
      |  SELECT '0_ingest' AS stage, count(*) AS n_docs,
      |    CAST(COALESCE(sum(rt0), 0) AS BIGINT) AS n_tokens FROM rawtok
      |  UNION ALL SELECT '1_scrub', count(*), CAST(COALESCE(sum(len(t)), 0) AS BIGINT) FROM tok
      |  UNION ALL SELECT '2_quality', count(*), CAST(COALESCE(sum(len(t)), 0) AS BIGINT) FROM s2
      |  UNION ALL SELECT '3_exact_dedup', count(*), CAST(COALESCE(sum(len(t)), 0) AS BIGINT) FROM s3
      |  UNION ALL SELECT '4_near_dedup', count(*), CAST(COALESCE(sum(len(t)), 0) AS BIGINT) FROM s4
      |  UNION ALL SELECT '5_sampled', count(*), CAST(COALESCE(sum(len(t)), 0) AS BIGINT) FROM s5
      |) ORDER BY stage""".stripMargin

  // --- q103: TRAINED quality gate (deterministic logistic regression) ------

  /** Shared q103 constants (Spark + oracle). */
  private val GateLr = 1.0
  private val GateIters = 24
  private val GateLabelMinTokens = 50
  /** Feature column names in margin-evaluation order (the order is part of
    * the contract: w·x is summed left-to-right in BOTH engines). */
  private val GateDims = Seq("x_b", "x_t", "x_r", "x_w")

  /** The q103 feature projection: bias, (tokens−50)/100 (CENTERED at the
    * label boundary so the separator is reachable in a few dozen GD steps from
    * zero init), type-token ratio, mean word length/10 — all exact-integer
    * ratios (correctly-rounded double division of the same integers on any
    * engine), plus the weak label y = [n_tokens ≥ 50] a Gopher-style rule
    * would emit. */
  private def gateFeatures(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val nt = greatest(size(toks), lit(1)).cast("double")
    docs.select(col("doc_id"), col("lang"),
      lit(1.0).as("x_b"),
      ((nt - lit(50.0)) / lit(100.0)).as("x_t"),
      (size(array_distinct(toks)).cast("double") / nt).as("x_r"),
      ((length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nt)
        / lit(10.0)).as("x_w"),
      when(size(toks) >= GateLabelMinTokens, lit(1.0)).otherwise(lit(0.0)).as("y"))
  }

  /** q103 — model-TRAINED quality gate: [[graft.ops.TrainedGate]] fits a
    * logistic regression over the four text features by 24 deterministic
    * full-batch GD steps (gradient means rounded to 6 dp per step — the
    * SemDedup mechanism, so the weight trajectory is bit-identical on any
    * engine/partitioning), then gates on the exp-free margin w·x ≥ 0.
    * Output: per-lang keep counts + confusion against the weak labels,
    * with the learned weights (hash-matched by the oracle, which UNROLLS
    * the same 24 training iterations as SQL CTEs). The label is a rule the
    * model can represent, so the confusion doubles as a convergence check:
    * training that drifts shows up as flipped borderline documents. */
  def trainedGate(spark: SparkSession, dir: String): DataFrame = {
    // persist: read 8 times by training + once by scoring. Ownership:
    // Verify/Bench clear the cache after each query.
    val f = gateFeatures(table(spark, dir, "documents")).persist()
    val w = graft.ops.TrainedGate.fitLogistic(f, GateDims, "y", GateLr, GateIters)
    val keep = graft.ops.TrainedGate.margin(w, GateDims.map(col)) >= 0
    f.groupBy("lang").agg(
        count(lit(1)).as("n"),
        sum(when(keep, 1L).otherwise(0L)).as("n_keep"),
        sum(when(keep && col("y") === 1.0, 1L).otherwise(0L)).as("tp"),
        sum(when(keep && col("y") === 0.0, 1L).otherwise(0L)).as("fp"),
        sum(when(!keep && col("y") === 1.0, 1L).otherwise(0L)).as("fn"),
        sum(when(!keep && col("y") === 0.0, 1L).otherwise(0L)).as("tn"))
      .select(col("lang") +: col("n") +: col("n_keep") +: col("tp") +:
        col("fp") +: col("fn") +: col("tn") +:
        GateDims.zipWithIndex.map { case (d, i) => lit(w(i)).as(s"w_$d") }: _*)
      .orderBy("lang")
  }

  private def q103OracleSql: String = {
    // weight column for dim d at iteration t
    def wc(d: String, t: Int) = s"w_${d}_$t"
    def marginSql(t: Int) =
      GateDims.map(d => s"${wc(d, t)} * $d").mkString(" + ")
    val i0 = s"i0 AS (SELECT ${GateDims.map(d => s"0.0 AS ${wc(d, 0)}").mkString(", ")})"
    val its = (1 to GateIters).map { t =>
      val p = t - 1
      val upd = GateDims.map { d =>
        s"${wc(d, p)} + $GateLr * round(avg((y - 1.0/(1.0 + exp(-(${marginSql(p)})))) * $d), 6) AS ${wc(d, t)}"
      }
      s"i$t AS (SELECT ${upd.mkString(", ")} FROM f, i$p GROUP BY ${GateDims.map(wc(_, p)).mkString(", ")})"
    }
    val keepSql = s"(${marginSql(GateIters)}) >= 0"
    s"""WITH f AS (SELECT doc_id, lang,
      |    1.0 AS x_b,
      |    (GREATEST(len(words), 1) - 50) / 100.0 AS x_t,
      |    len(list_distinct(words)) / GREATEST(len(words), 1) AS x_r,
      |    (nchars / GREATEST(len(words), 1)) / 10.0 AS x_w,
      |    CASE WHEN len(words) >= $GateLabelMinTokens THEN 1.0 ELSE 0.0 END AS y
      |  FROM (SELECT doc_id, lang,
      |      list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words,
      |      len(regexp_replace(text, '\\s+', '', 'g')) AS nchars
      |    FROM documents)),
      |$i0,
      |${its.mkString(",\n")}
      |SELECT lang, count(*) AS n,
      |  CAST(sum(CASE WHEN $keepSql THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      |  CAST(sum(CASE WHEN ($keepSql) AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |  CAST(sum(CASE WHEN ($keepSql) AND y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |  CAST(sum(CASE WHEN NOT ($keepSql) AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
      |  CAST(sum(CASE WHEN NOT ($keepSql) AND y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
      |  ${GateDims.map(d => s"${wc(d, GateIters)} AS w_$d").mkString(", ")}
      |FROM f, i$GateIters
      |GROUP BY lang, ${GateDims.map(wc(_, GateIters)).mkString(", ")}
      |ORDER BY lang""".stripMargin
  }

  // --- registry ------------------------------------------------------------

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q91_semantic_dedup" -> (semanticDedup _),
    "q155_cluster_quality" -> (clusterQuality _),
    "q92_mixture_sample" -> (mixtureSample _),
    "q93_pii_scrub" -> (piiScrub _),
    "q94_epoch_order" -> (epochOrder _),
    "q95_classifier_gate" -> (classifierGate _),
    "q96_embedding_filter" -> (embeddingFilter _),
    "q97_boilerplate" -> (boilerplate _),
    "q99_pipeline_funnel" -> (pipelineFunnel _),
    "q111_rare_scrub" -> (rareScrub _),
    "q113_importance_weights" -> (importanceWeights _),
    "q119_coreset_sample" -> (coresetSample _),
    "q100_epoch_resume" -> (epochResume _),
    "q103_trained_gate" -> (trainedGate _)
  )

  val oracles: Map[String, String] = Map(
    "q113_importance_weights" -> q113OracleSql,
    "q119_coreset_sample" -> q119OracleSql,
    "q91_semantic_dedup" -> q91OracleSql,
    "q155_cluster_quality" -> q155OracleSql,
    "q92_mixture_sample" -> q92OracleSql,
    "q93_pii_scrub" -> q93OracleSql,
    "q111_rare_scrub" -> q111OracleSql,
    "q94_epoch_order" -> q94OracleSql,
    "q95_classifier_gate" -> q95OracleSql,
    "q96_embedding_filter" -> q96OracleSql,
    "q97_boilerplate" -> q97OracleSql,
    "q99_pipeline_funnel" -> q99OracleSql,
    "q100_epoch_resume" -> q100OracleSql,
    "q103_trained_gate" -> q103OracleSql
  )
}
