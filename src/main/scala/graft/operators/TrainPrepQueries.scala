package graft.operators

import graft.ops.{Dedup, Layout, Partitioning, PortableSketch, Sampling, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set ASSEMBLY queries (round 13, second wave): the steps between
  * a curated corpus and a training run that the rest of the engine presumes
  * — leakage-safe split assignment at the dup-CLUSTER grain (q175: the
  * eval-hygiene rule per-document splitting like q50 structurally violates,
  * with the violation MEASURED), the padding-waste audit behind length
  * bucketing (q176: what dynamic batching saves, as a number), data-
  * constrained epoch allocation (q177: uniform-target water-filling under a
  * per-source repetition cap — the Muennighoff et al. 2022 mixing question),
  * and the exact rank-based sequence-length percentiles every data card
  * reports (q178: engine-portable because rank-defined — never an engine's
  * interpolating `quantile`).
  */
object TrainPrepQueries {
  import ContractQueries.table

  // --- q175: dup-cluster-aware split + leakage audit ---------------------------

  /** q175 — LEAK-SAFE train/val/test split: q50 assigns splits per DOCUMENT
    * (content-hash Bernoulli), so a near-duplicate pair can straddle train
    * and test — the classic eval-contamination bug (a test doc whose
    * near-copy was trained on). The fix is to assign at the dup-CLUSTER
    * grain: every document inherits the split of its connected-component
    * representative (q48's clusters over the exact-Jaccard pair relation),
    * keyed by the REP's content hash — same q50 mechanism, one grain up.
    * Per split: docs, tokens, clusters, and the audit pair — `leak_pairs`
    * (near-dup pairs straddling splits under the cluster assignment;
    * structurally 0 because a pair shares a component, but MEASURED, the
    * q98/q161/q166 discipline) vs `naive_leak_pairs` (the same count under
    * q50's per-doc assignment — the number this operator exists to remove;
    * each crossing pair is attributed to its idA side's split under the
    * scheme being audited). Scale: the pair relation and CC are the q48
    * shapes (banded candidates, pointer-jumping CC); the rep-split join
    * shuffles by rep — a giant cluster is one hot key, which AQE skew-split
    * handles because the join is a plain equi-join. */
  /** The q175 core, shared with the q184 funnel: per-doc cluster rep,
    * tokens, the per-doc (naive) and per-cluster split labels. Returns
    * (docs, pairs, assigned); `pairs` and `assigned` come back persisted
    * (callers read them repeatedly; Verify/Bench clear caches per query). */
  private def clusterAssignment(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val docs = Partitioning.spread(table(spark, dir, "documents"))
    // persist: feeds CC AND the callers' leak audits.
    val pairs = NorthStarQueries.ngramNearDups(spark, dir)
      .select("idA", "idB").persist()
    val cc = Dedup.dupClusters(pairs).withColumnRenamed("id", "doc_id")
    val perDoc = docs
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("rep"), col("doc_id")).as("cluster_rep"),
        TextOps.tokenCount(col("text")).cast("long").as("tokens"),
        Sampling.hashSplit(col("text"), NorthStarQueries.splitWeights, "v1")
          .as("naive_split"))
    val repSplits = docs.select(col("doc_id").as("cluster_rep"),
      Sampling.hashSplit(col("text"), NorthStarQueries.splitWeights, "v1")
        .as("split"))
    (docs, pairs, perDoc.join(repSplits, Seq("cluster_rep")).persist())
  }

  def leakSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val (_, pairs, assigned) = clusterAssignment(spark, dir)
    val base = assigned.groupBy("split").agg(
      count(lit(1)).as("n_docs"), sum("tokens").as("n_tokens"),
      countDistinct("cluster_rep").as("n_clusters"))
    def leakOf(splitCol: String, outName: String): DataFrame =
      pairs
        .join(assigned.select(col("doc_id").as("idA"),
          col(splitCol).as("_sa")), Seq("idA"))
        .join(assigned.select(col("doc_id").as("idB"),
          col(splitCol).as("_sb")), Seq("idB"))
        .groupBy(col("_sa"))
        .agg(sum(when(col("_sa") =!= col("_sb"), 1L).otherwise(0L)).as(outName))
        .withColumnRenamed("_sa", "split")
    base
      .join(leakOf("split", "leak_pairs"), Seq("split"), "left")
      .join(leakOf("naive_split", "naive_leak_pairs"), Seq("split"), "left")
      .select(col("split"), col("n_docs"), col("n_tokens"), col("n_clusters"),
        coalesce(col("leak_pairs"), lit(0L)).as("leak_pairs"),
        coalesce(col("naive_leak_pairs"), lit(0L)).as("naive_leak_pairs"))
      .orderBy("split")
  }

  /** q175 oracle: the q48 recursive-CTE components over the exact pair
    * relation, the q50 split CASE applied once per doc (naive) and once to
    * each cluster rep's text (cluster split), then the same three-way
    * report. LEFT JOINs mirror the Spark side exactly (a split label with
    * no docs under the cluster scheme would drop that audit row in BOTH
    * engines). */
  private def q175OracleSql: String = {
    val sc = NorthStarQueries.splitCaseSql
    s"""WITH RECURSIVE ${NorthStarQueries.gramsCte},
       |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib FROM grams a JOIN grams b
       |  ON a.doc_id < b.doc_id WHERE ${NorthStarQueries.jaccardGe05}),
       |edges AS (SELECT ia AS s, ib AS d FROM p UNION ALL SELECT ib, ia FROM p),
       |reach(id, r) AS (SELECT s, s FROM edges
       |  UNION SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.d),
       |cl AS (SELECT id, MIN(r) AS rep FROM reach GROUP BY id),
       |d AS (SELECT doc_id, coalesce(cl.rep, doc_id) AS rep,
       |    len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT AS tokens,
       |    $sc AS nsplit
       |  FROM documents LEFT JOIN cl ON cl.id = doc_id),
       |rs AS (SELECT doc_id AS rep, $sc AS csplit FROM documents),
       |asg AS (SELECT d.doc_id, d.rep, d.tokens, d.nsplit, rs.csplit
       |  FROM d JOIN rs USING (rep)),
       |base AS (SELECT csplit AS split, count(*)::BIGINT AS n_docs,
       |    sum(tokens)::BIGINT AS n_tokens,
       |    count(DISTINCT rep)::BIGINT AS n_clusters
       |  FROM asg GROUP BY 1),
       |lc AS (SELECT a.csplit AS split,
       |    sum(CASE WHEN a.csplit <> b.csplit THEN 1 ELSE 0 END)::BIGINT AS leak_pairs
       |  FROM p JOIN asg a ON a.doc_id = p.ia JOIN asg b ON b.doc_id = p.ib
       |  GROUP BY 1),
       |ln2 AS (SELECT a.nsplit AS split,
       |    sum(CASE WHEN a.nsplit <> b.nsplit THEN 1 ELSE 0 END)::BIGINT AS naive_leak_pairs
       |  FROM p JOIN asg a ON a.doc_id = p.ia JOIN asg b ON b.doc_id = p.ib
       |  GROUP BY 1)
       |SELECT base.split, n_docs, n_tokens, n_clusters,
       |  coalesce(lc.leak_pairs, 0)::BIGINT AS leak_pairs,
       |  coalesce(ln2.naive_leak_pairs, 0)::BIGINT AS naive_leak_pairs
       |FROM base LEFT JOIN lc USING (split) LEFT JOIN ln2 USING (split)
       |ORDER BY split""".stripMargin
  }

  // --- q176: padding-waste batching audit --------------------------------------

  /** Shared q176 constant (Spark + oracle): sequences per batch. */
  private val BatchSize = 8L

  /** q176 — PADDING-waste audit: inference/SFT batching pads every sequence
    * in a batch to the batch max, so batch composition decides how many
    * slot-tokens are padding. Two deterministic strategies over the same
    * corpus, batch size 8: `hash_order` (content-hash arrival order — the
    * naive shuffle) vs `length_sorted` (global length-descending order —
    * the bucketing every serving stack ships). Per strategy: batches, real
    * tokens, slot tokens (Σ n·max per batch), padding, and waste in basis
    * points — the measured gap IS the case for length bucketing. Batch
    * formation uses the q94/q160 two-pass global sequence (no
    * single-partition window, plan-asserted pattern); everything after it
    * is one narrow groupBy. The length-sorted order key is made total by
    * (tokens desc, content-hash, doc_id). */
  def paddingAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Partitioning.spread(table(spark, dir, "documents"))
    // persist: both strategy sequences scan the same 3-column frame.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val lens = docs.select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("tokens"),
        PortableSketch.h60(concat(lit("ord:"), col("text"))).as("_ord"))
      .persist()
    def report(name: String, keys: Seq[Column]): DataFrame =
      Layout.globalSequence(lens, keys, "pos")
        .withColumn("_batch", expr(s"(pos - 1) div $BatchSize"))
        .groupBy("_batch")
        .agg(count(lit(1)).as("_n"), max("tokens").as("_m"),
          sum("tokens").as("_s"))
        .agg(count(lit(1)).as("n_batches"), sum("_s").as("real_tokens"),
          sum(col("_n") * col("_m")).as("slot_tokens"))
        .select(lit(name).as("strategy"), col("n_batches"), col("real_tokens"),
          col("slot_tokens"),
          (col("slot_tokens") - col("real_tokens")).as("pad_tokens"),
          expr("(slot_tokens - real_tokens) * 10000 div slot_tokens")
            .as("waste_bp"))
    report("hash_order", Seq(col("_ord"), col("doc_id")))
      .unionByName(report("length_sorted",
        Seq(col("tokens").desc, col("_ord"), col("doc_id"))))
      .orderBy("strategy")
  }

  /** q176 oracle: plain ROW_NUMBER over each order key (the window form the
    * two-pass sequence provably equals), then the same batch rollups. */
  private def q176OracleSql: String = {
    def side(name: String, order: String): String =
      s"""${name}r AS (SELECT tokens,
         |    ROW_NUMBER() OVER (ORDER BY $order) AS rn FROM d),
         |${name}b AS (SELECT (rn - 1) // $BatchSize AS b, count(*)::BIGINT AS n,
         |    max(tokens) AS m, sum(tokens)::BIGINT AS s FROM ${name}r GROUP BY 1),
         |${name}a AS (SELECT count(*)::BIGINT AS n_batches,
         |    sum(s)::BIGINT AS real_tokens, sum(n * m)::BIGINT AS slot_tokens
         |  FROM ${name}b)""".stripMargin
    s"""WITH d AS (SELECT doc_id,
       |    len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT AS tokens,
       |    ('0x' || substr(md5('ord:' || text), 1, 15))::BIGINT AS ord
       |  FROM documents),
       |${side("h", "ord, doc_id")},
       |${side("l", "tokens DESC, ord, doc_id")}
       |SELECT strategy, n_batches, real_tokens, slot_tokens,
       |  slot_tokens - real_tokens AS pad_tokens,
       |  (slot_tokens - real_tokens) * 10000 // slot_tokens AS waste_bp
       |FROM (SELECT 'hash_order' AS strategy, * FROM ha
       |      UNION ALL SELECT 'length_sorted', * FROM la)
       |ORDER BY strategy""".stripMargin
  }

  // --- q177: data-constrained epoch allocation ---------------------------------

  /** Shared q177 constants (Spark + oracle): token budget = 5/2 × corpus
    * tokens, per-source repetition cap = 5/2 epochs, 3 water-fill rounds. */
  private val EpochRounds = 3

  /** q177 — EPOCH water-filling: the data-constrained mixing question
    * (Muennighoff et al. 2022 — when the budget exceeds the corpus, how
    * many epochs of each source?). Target mix is UNIFORM across sources
    * (the upsample-small-sources posture), budget 2.5× corpus tokens, but
    * no source may repeat past 2.5 epochs (`cap = 5·tokens div 2`) — so
    * below-average sources hit the cap and their leftover re-distributes
    * to the still-uncapped pool, round by round (proportional-with-cap
    * water-filling, 3 fixed rounds, the house unrolled-loop discipline;
    * leftovers a 4th round would place stay unallocated — documented, and
    * visible as epochs_u below the cap on the last uncapped sources). All
    * integer: per-round alloc = leftover div |uncapped|. Scale: the state
    * is one row per SOURCE (a mixing decision is |sources|-bounded by
    * nature); the round scalars are one-row aggregates attached by the q86
    * one-row-constants broadcast, so the corpus is scanned exactly once. */
  def epochMix(spark: SparkSession, dir: String): DataFrame =
    epochMixOver(Partitioning.spread(table(spark, dir, "documents")))

  /** The q177 core over any (source, text) frame — exposed for the
    * property spec's plain-Scala water-fill replay. */
  private[operators] def epochMixOver(docs: DataFrame): DataFrame = {
    // persist: the |sources|-row state is re-read by every round's scalar
    // aggregate. Ownership: Verify/Bench clear per query.
    val src = docs.groupBy("source")
      .agg(sum(TextOps.tokenCount(col("text")).cast("long")).as("tokens"))
      .withColumn("cap_tokens", expr("tokens * 5 div 2"))
      .persist()
    val totals = src.agg(sum("tokens").as("_tt"), count(lit(1)).as("_ns"))
    var st = src.crossJoin(broadcast(totals))
      .withColumn("budget", expr("_tt * 5 div 2"))
      .withColumn("alloc", expr("(_tt * 5 div 2) div _ns"))
      .withColumn("capped", col("alloc") > col("cap_tokens"))
      .select("source", "tokens", "cap_tokens", "budget", "alloc", "capped")
    for (_ <- 2 to EpochRounds) {
      val scalars = st.agg(
        sum(when(col("capped"), col("cap_tokens")).otherwise(0L)).as("_cw"),
        sum(when(col("capped"), 0L).otherwise(1L)).as("_nu"))
      st = st.crossJoin(broadcast(scalars))
        .withColumn("alloc", when(col("capped"), col("cap_tokens"))
          .otherwise(expr("(budget - _cw) div greatest(_nu, 1)")))
        .withColumn("capped",
          col("capped") || col("alloc") > col("cap_tokens"))
        .select("source", "tokens", "cap_tokens", "budget", "alloc", "capped")
    }
    st.withColumn("alloc_tokens",
        when(col("capped"), col("cap_tokens")).otherwise(col("alloc")))
      .withColumn("epochs_u", expr("alloc_tokens * 1000000 div tokens"))
      .select("source", "tokens", "alloc_tokens", "epochs_u", "capped")
      .orderBy("source")
  }

  /** q177 oracle: the 3 water-fill rounds unrolled as CTE levels — each
    * round's scalar row (capped mass, uncapped count) joins back on, then
    * the final clamp. */
  private def q177OracleSql: String = {
    val sb = new StringBuilder(
      """WITH s AS (SELECT source,
        |    sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')))::BIGINT AS tokens
        |  FROM documents GROUP BY 1),
        |c AS (SELECT source, tokens, tokens * 5 // 2 AS cap_tokens FROM s),
        |g AS (SELECT sum(tokens)::BIGINT AS tt, count(*)::BIGINT AS ns FROM c),
        |s1 AS (SELECT c.source, c.tokens, c.cap_tokens,
        |    (g.tt * 5 // 2)::BIGINT AS budget,
        |    ((g.tt * 5 // 2) // g.ns)::BIGINT AS alloc,
        |    ((g.tt * 5 // 2) // g.ns) > c.cap_tokens AS capped
        |  FROM c, g),
        |""".stripMargin)
    for (r <- 2 to EpochRounds) {
      sb ++= s"""g$r AS (SELECT sum(CASE WHEN capped THEN cap_tokens ELSE 0 END)::BIGINT AS cw,
                |    sum(CASE WHEN capped THEN 0 ELSE 1 END)::BIGINT AS nu FROM s${r - 1}),
                |s$r AS (SELECT source, tokens, cap_tokens, budget,
                |    CASE WHEN capped THEN cap_tokens
                |      ELSE (budget - g$r.cw) // greatest(g$r.nu, 1) END AS alloc,
                |    capped OR (CASE WHEN capped THEN cap_tokens
                |      ELSE (budget - g$r.cw) // greatest(g$r.nu, 1) END) > cap_tokens AS capped
                |  FROM s${r - 1}, g$r),
                |""".stripMargin
    }
    sb ++= s"""fin AS (SELECT source, tokens,
              |    CASE WHEN capped THEN cap_tokens ELSE alloc END AS alloc_tokens,
              |    capped
              |  FROM s$EpochRounds)
              |SELECT source, tokens, alloc_tokens,
              |  (alloc_tokens * 1000000 // tokens)::BIGINT AS epochs_u, capped
              |FROM fin ORDER BY source""".stripMargin
    sb.toString
  }

  // --- q178: exact sequence-length percentiles ---------------------------------

  /** q178 — sequence-LENGTH percentiles per source, the data-card numbers a
    * context-length decision reads (P50/P90/P99/max token lengths): defined
    * by RANK, not interpolation — P_q = the smallest length whose cumulative
    * count reaches ⌈q·n⌉ — because engines disagree on interpolating
    * `quantile`/`percentile` semantics while rank arithmetic is exact
    * integer everywhere (cum ≥ ⌈q·n⌉ ⇔ den·cum ≥ num·n). Computed over the
    * per-source length HISTOGRAM: one groupBy collapses the corpus to
    * (source, length, count) — the windows then run over histogram rows
    * (bounded by distinct lengths per source, NEVER documents, the q152
    * histogram-window discipline) — so the cumulative scan costs nothing at
    * any corpus size. */
  def lengthPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val docs = Partitioning.spread(table(spark, dir, "documents"))
    val hist = docs
      .select(col("source"), TextOps.tokenCount(col("text")).cast("long").as("tokens"))
      .groupBy("source", "tokens").agg(count(lit(1)).as("_c"))
    val cum = hist
      .withColumn("_cum",
        sum("_c").over(Window.partitionBy("source").orderBy("tokens")))
      .withColumn("_n", sum("_c").over(Window.partitionBy("source")))
    cum.groupBy("source").agg(
        max("_n").as("n_docs"),
        min(when(expr("_cum * 2 >= _n"), col("tokens"))).as("p50_tokens"),
        min(when(expr("_cum * 10 >= _n * 9"), col("tokens"))).as("p90_tokens"),
        min(when(expr("_cum * 100 >= _n * 99"), col("tokens"))).as("p99_tokens"),
        max("tokens").as("max_tokens"))
      .orderBy("source")
  }

  private def q178OracleSql: String =
    """WITH h AS (SELECT source,
      |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS tokens,
      |    count(*)::BIGINT AS c
      |  FROM documents GROUP BY 1, 2),
      |cm AS (SELECT source, tokens, c,
      |    sum(c) OVER (PARTITION BY source ORDER BY tokens
      |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
      |    sum(c) OVER (PARTITION BY source)::BIGINT AS n FROM h)
      |SELECT source, max(n)::BIGINT AS n_docs,
      |  min(CASE WHEN cum * 2 >= n THEN tokens END)::BIGINT AS p50_tokens,
      |  min(CASE WHEN cum * 10 >= n * 9 THEN tokens END)::BIGINT AS p90_tokens,
      |  min(CASE WHEN cum * 100 >= n * 99 THEN tokens END)::BIGINT AS p99_tokens,
      |  max(tokens)::BIGINT AS max_tokens
      |FROM cm GROUP BY source ORDER BY source""".stripMargin

  // --- q179: eval-split decontamination ----------------------------------------

  /** Shared q179 constant (Spark + oracle): distinct shared word-3-grams
    * that flag a train doc. */
  private val DecontamMinShared = 4

  /** q179 — SPLIT decontamination: the partial-overlap complement to q175.
    * Cluster-grain splitting stops near-DUPLICATES from straddling splits;
    * a train doc can still share a verbatim passage with an eval doc
    * without being its near-dup — the GPT-3/Pile n-gram decontamination
    * step exists for exactly that. Here: every train-split document
    * sharing ≥ 4 distinct word-3-grams with ANY val/test document is
    * flagged, reported per source as a removal share in basis points.
    * Split labels use the q50 content-hash rule (the same labels q175
    * assigns every non-clustered doc; production feeds q175's table).
    * Scale: gram hashes, never strings, cross the join (the q51 kernel);
    * the probe side is the EVAL split — fixed-size in production, which is
    * what makes its gram index broadcastable (here it is corpus-
    * proportional by construction; a proportional split would swap the
    * broadcast for a plain equi-join, same semantics). */
  def splitDecontam(spark: SparkSession, dir: String): DataFrame = {
    // persist: train and probe sides both read the split-labelled frame.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val docs = Partitioning.spread(table(spark, dir, "documents"))
      .withColumn("split",
        Sampling.hashSplit(col("text"), NorthStarQueries.splitWeights, "v1"))
      .persist()
    val train = docs.where(col("split") === "train")
    val probes = docs.where(col("split") =!= "train")
    val flagged = TextOps.contamination(train, "text", "doc_id",
        probes, "text", "doc_id", n = 3, minShared = DecontamMinShared)
      .select("doc_id").distinct().withColumn("_f", lit(1L))
    train.join(flagged, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_train"),
        sum(coalesce(col("_f"), lit(0L))).as("n_flagged"))
      .withColumn("flagged_bp", expr("n_flagged * 10000 div n_train"))
      .orderBy("source")
  }

  /** q179 oracle: the q51 gram-intersection replay (string grams — the
    * hash join's documented equivalence) over the q50 split CASE. */
  private def q179OracleSql: String = {
    val sc = NorthStarQueries.splitCaseSql
    s"""WITH ${NorthStarQueries.gramsCte},
       |ds AS (SELECT doc_id, source, $sc AS split FROM documents),
       |tr AS (SELECT g.doc_id, g.g FROM grams g JOIN ds USING (doc_id)
       |  WHERE ds.split = 'train'),
       |pr AS (SELECT g.doc_id AS pid, g.g AS pg FROM grams g
       |  JOIN ds USING (doc_id) WHERE ds.split <> 'train'),
       |fl AS (SELECT DISTINCT tr.doc_id FROM tr JOIN pr
       |  ON len(list_intersect(tr.g, pr.pg)) >= $DecontamMinShared),
       |agg AS (SELECT ds.source, count(*)::BIGINT AS n_train,
       |    sum(CASE WHEN fl.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_flagged
       |  FROM ds LEFT JOIN fl USING (doc_id)
       |  WHERE ds.split = 'train' GROUP BY 1)
       |SELECT source, n_train, n_flagged,
       |  (n_flagged * 10000 // n_train)::BIGINT AS flagged_bp
       |FROM agg ORDER BY source""".stripMargin
  }

  // --- q180: vocabulary growth curve ---------------------------------------------

  /** Shared q180 constant (Spark + oracle): largest prefix exponent. */
  private val VocabCurveMaxK = 20

  /** q180 — VOCABULARY growth curve (the Heaps-law audit): distinct tokens
    * seen within the first 2^k corpus tokens, k = 4..20, in the
    * deterministic content-hash document order — the number a tokenizer
    * budget decision reads (is the vocabulary saturating, or still growing
    * at the corpus edge?). Mechanism: the q160 running total gives every
    * document its exclusive token offset (two-pass, no single-partition
    * window), `pos = offset + in-doc index` numbers every token globally,
    * and each distinct token keeps its FIRST position. The curve then
    * needs only the ⌈log2⌉ histogram of first positions — `kmin =
    * len(bin(pos−1))`, the ANF register trick, no float log — so the
    * per-k rollup runs over ≤ 64 histogram rows joined to 17 k-rows
    * (bounded-model nested loop). Thresholds past the corpus saturate
    * (prefix = total) and report the full vocabulary. */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Partitioning.spread(table(spark, dir, "documents"))
    // persist: the sequence pass and the token-total scalar both read it.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val keyed = docs.select(col("doc_id"),
        TextOps.tokens(col("text")).as("_ts"),
        PortableSketch.h60(concat(lit("ord:"), col("text"))).as("_ord"))
      .withColumn("_nt", size(col("_ts")).cast("long"))
      .persist()
    val seq = Layout.globalSequenceWithRunningTotal(keyed,
      Seq(col("_ord"), col("doc_id")), col("_nt"), "pos", "cum_before")
    val firstPos = seq
      .select(col("cum_before"), posexplode(col("_ts")).as(Seq("_i", "w")))
      .select(col("w"), (col("cum_before") + col("_i") + 1).as("_p"))
      .groupBy("w").agg(min("_p").as("_fpos"))
    val hist = firstPos
      .withColumn("_kmin", when(col("_fpos") === 1L, lit(0))
        .otherwise(length(bin(col("_fpos") - 1))))
      .groupBy("_kmin").agg(count(lit(1)).as("_c"))
    val total = keyed.agg(sum("_nt").as("_tt"))
    val ks = (4 to VocabCurveMaxK).map(k => (k.toLong, 1L << k))
      .toDF("k", "threshold")
    ks.join(hist, col("_kmin") <= col("k"), "left")
      .groupBy("k", "threshold").agg(sum("_c").as("_d"))
      .crossJoin(broadcast(total))
      .select(col("k"),
        least(col("threshold"), col("_tt")).as("prefix_tokens"),
        coalesce(col("_d"), lit(0L)).as("distinct_tokens"))
      .orderBy("k")
  }

  private def q180OracleSql: String =
    s"""WITH d AS (SELECT doc_id,
       |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ts,
       |    ('0x' || substr(md5('ord:' || text), 1, 15))::BIGINT AS ord
       |  FROM documents),
       |sq AS (SELECT doc_id, ts,
       |    (sum(len(ts)) OVER (ORDER BY ord, doc_id ROWS UNBOUNDED PRECEDING)
       |      - len(ts))::BIGINT AS cumb FROM d),
       |tp AS (SELECT unnest(ts) AS w,
       |    cumb + unnest(generate_series(1, len(ts))) AS p FROM sq),
       |fp AS (SELECT w, min(p)::BIGINT AS fpos FROM tp GROUP BY w),
       |km AS (SELECT CASE WHEN fpos = 1 THEN 0
       |      ELSE length(bin(fpos - 1)) END AS kmin, count(*)::BIGINT AS c
       |  FROM fp GROUP BY 1),
       |tt AS (SELECT sum(len(ts))::BIGINT AS t FROM d),
       |ks AS (SELECT unnest(generate_series(4, $VocabCurveMaxK)) AS k)
       |SELECT k::BIGINT AS k,
       |  least(1::BIGINT << k, tt.t)::BIGINT AS prefix_tokens,
       |  coalesce((SELECT sum(c) FROM km WHERE km.kmin <= ks.k), 0)::BIGINT
       |    AS distinct_tokens
       |FROM ks, tt ORDER BY k""".stripMargin

  // --- q181: quality-signal agreement --------------------------------------------

  /** q181 — quality-SIGNAL agreement: does the rule-based quality gate
    * (q82's Gopher rules) agree with the model-based one (q164's
    * perplexity terciles)? Cross-tab of per-doc (tercile bucket ×
    * all-four-rules keep) with the observed/expected LIFT in basis points
    * — lift ≈ 10000 everywhere means the signals are independent (each
    * catches what the other misses and a pipeline should run BOTH; CCNet
    * and Gopher ship together for exactly this reason), lift far above
    * 10000 on (head, keep) means they're redundant. Integer: `lift_bp =
    * ((n·10000 div bucket_total) · N) div keep_total`, truncation defined
    * identically in both engines and documented (the inner div keeps every
    * intermediate under N·10⁴ — no overflow to N < 9·10¹⁴ docs). Scale:
    * both inputs are proven per-doc grains (q164, q82); the cross-tab is
    * ≤ 8 cells; totals join back by key, the grand total by the q86
    * one-row broadcast. */
  def signalAgreement(spark: SparkSession, dir: String): DataFrame = {
    // persist: the token stats feed the per-doc rules once, but docs is
    // read by BOTH the bucket grain and the gopher grain.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val docs = Partitioning.spread(table(spark, dir, "documents")).persist()
    val buckets = Round12Queries.perplexityDocBuckets(spark, docs)
      .select("doc_id", "bucket")
    val byTok = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("c"), sum(length(col("w"))).as("lensum"))
    val keep = byTok.groupBy("doc_id").agg(
        sum("c").as("n"), sum("lensum").as("sumlen"),
        sum(when(col("w").isin("the", "a"), col("c")).otherwise(0L)).as("nstop"),
        max("c").as("mx"))
      .select(col("doc_id"),
        (col("n").between(20, 90) &&
          col("sumlen") * 10 >= col("n") * 40 &&
          col("sumlen") * 10 <= col("n") * 50 &&
          col("nstop") * 10 <= col("n") &&
          col("mx") * 20 <= col("n") * 3).as("gopher_keep"))
    // persist: the cell relation feeds both marginals and the grand total
    val cells = buckets.join(keep, Seq("doc_id"))
      .groupBy("bucket", "gopher_keep").agg(count(lit(1)).as("n_docs"))
      .persist()
    val bt = cells.groupBy("bucket").agg(sum("n_docs").as("_bt"))
    val kt = cells.groupBy("gopher_keep").agg(sum("n_docs").as("_kt"))
    val tot = cells.agg(sum("n_docs").as("_n"))
    cells.join(bt, Seq("bucket")).join(kt, Seq("gopher_keep"))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("gopher_keep"), col("n_docs"),
        expr("((n_docs * 10000 div _bt) * _n) div _kt").as("lift_bp"))
      .orderBy("bucket", "gopher_keep")
  }

  /** q181 oracle: the q172 per-doc bucket CTEs (rank → tercile, unscored
    * lane) joined to the q82 per-doc rule replay, then the same cross-tab
    * and truncated-lift arithmetic. */
  private def q181OracleSql: String =
    """WITH tk AS (SELECT doc_id, lang,
      |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
      |  FROM documents),
      |toks AS (SELECT doc_id, lang, unnest(ts) AS w,
      |    unnest(generate_series(1, len(ts))) AS pos FROM tk),
      |big AS (SELECT doc_id, lang, w AS w1,
      |    lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM toks),
      |bg AS (SELECT doc_id, lang, w1, w2, count(*)::BIGINT AS n FROM big
      |  WHERE w2 IS NOT NULL GROUP BY 1, 2, 3, 4),
      |c2 AS (SELECT lang, w1, w2, sum(n)::BIGINT AS c2 FROM bg GROUP BY 1, 2, 3),
      |c1 AS (SELECT lang, w1, sum(n)::BIGINT AS c1 FROM bg GROUP BY 1, 2),
      |v AS (SELECT lang, count(DISTINCT w)::BIGINT AS v FROM toks GROUP BY 1),
      |sc AS (SELECT bg.doc_id, bg.lang,
      |    sum(bg.n * round(1000000.0 * -ln((c2.c2 + 0.5) /
      |      (c1.c1 + 0.5 * v.v)))::BIGINT)::BIGINT AS sum_u,
      |    sum(bg.n)::BIGINT AS nb
      |  FROM bg JOIN c2 USING (lang, w1, w2) JOIN c1 USING (lang, w1)
      |    JOIN v USING (lang)
      |  GROUP BY 1, 2),
      |avgs AS (SELECT doc_id, lang, sum_u // nb AS avg_u FROM sc),
      |rk AS (SELECT doc_id, avg_u,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY avg_u, doc_id) AS r,
      |    count(*) OVER (PARTITION BY lang) AS nl FROM avgs),
      |bkd AS (SELECT doc_id,
      |    CASE WHEN 3 * (r - 1) < nl THEN 'head'
      |         WHEN 3 * (r - 1) < 2 * nl THEN 'middle'
      |         ELSE 'tail' END AS b FROM rk),
      |db AS (SELECT d.doc_id, coalesce(bkd.b, 'unscored') AS bucket
      |  FROM documents d LEFT JOIN bkd USING (doc_id)),
      |gc AS (SELECT doc_id, w, count(*) AS c, sum(len(w)) AS lensum
      |  FROM toks GROUP BY 1, 2),
      |gd AS (SELECT doc_id, sum(c) AS n, sum(lensum) AS sumlen,
      |    sum(CASE WHEN w IN ('the','a') THEN c ELSE 0 END) AS nstop,
      |    max(c) AS mx
      |  FROM gc GROUP BY 1),
      |gk AS (SELECT doc_id,
      |    (n BETWEEN 20 AND 90 AND sumlen*10 >= n*40 AND sumlen*10 <= n*50
      |      AND nstop*10 <= n AND mx*20 <= n*3) AS gopher_keep FROM gd),
      |cells AS (SELECT db.bucket, gk.gopher_keep, count(*)::BIGINT AS n_docs
      |  FROM db JOIN gk USING (doc_id) GROUP BY 1, 2),
      |bt AS (SELECT bucket, sum(n_docs)::BIGINT AS bt FROM cells GROUP BY 1),
      |kt AS (SELECT gopher_keep, sum(n_docs)::BIGINT AS kt FROM cells GROUP BY 1),
      |tot AS (SELECT sum(n_docs)::BIGINT AS n FROM cells)
      |SELECT cells.bucket, cells.gopher_keep, cells.n_docs,
      |  (((cells.n_docs * 10000 // bt.bt) * tot.n) // kt.kt)::BIGINT AS lift_bp
      |FROM cells JOIN bt USING (bucket) JOIN kt USING (gopher_keep), tot
      |ORDER BY bucket, gopher_keep""".stripMargin

  // --- q182: epoch-order mixing audit -------------------------------------------

  /** q182 — ORDER-mixing audit: is the content-hash epoch order (q94 — the
    * order every packer here replays) actually well mixed, or does some
    * source clump? Per source: adjacent-pair same-source rate vs the
    * uniform-permutation expectation — `same_bp = |pos,pos+1 both s|·10⁴
    * div |pairs starting at s|` against `expected_bp = (n_s−1)·10⁴ div
    * (N−1)` (the without-replacement next-is-same probability). A source
    * far above its expectation clumps — exactly what a curriculum reader
    * would see as a source-correlated gradient batch. Mechanism: the
    * two-pass global sequence numbers docs, adjacency is ONE equi-join on
    * pos+1 (never a global window over documents), the rates are integer
    * bp. */
  def mixingAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Partitioning.spread(table(spark, dir, "documents"))
    val keyed = docs.select(col("doc_id"), col("source"),
      PortableSketch.h60(concat(lit("ord:"), col("text"))).as("_ord"))
    // persist: both sides of the adjacency join read the sequence.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val seq = Layout.globalSequence(keyed,
      Seq(col("_ord"), col("doc_id")), "pos").persist()
    val adj = seq.select(col("pos"), col("source").as("_sa"))
      .join(seq.select((col("pos") - 1).as("pos"), col("source").as("_sb")),
        Seq("pos"))
    val pairs = adj.groupBy(col("_sa").as("source"))
      .agg(count(lit(1)).as("n_adj"),
        sum(when(col("_sa") === col("_sb"), 1L).otherwise(0L)).as("n_same"))
    val sizes = seq.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val total = seq.agg(count(lit(1)).as("_n"))
    sizes.join(pairs, Seq("source"), "left")
      .crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"),
        coalesce(col("n_adj"), lit(0L)).as("n_adj"),
        coalesce(col("n_same"), lit(0L)).as("n_same"),
        expr("coalesce(n_same, 0) * 10000 div greatest(coalesce(n_adj, 0), 1)")
          .as("same_bp"),
        expr("(n_docs - 1) * 10000 div greatest(_n - 1, 1)").as("expected_bp"))
      .orderBy("source")
  }

  private def q182OracleSql: String =
    """WITH d AS (SELECT doc_id, source,
      |    ('0x' || substr(md5('ord:' || text), 1, 15))::BIGINT AS ord
      |  FROM documents),
      |sq AS (SELECT source, ROW_NUMBER() OVER (ORDER BY ord, doc_id) AS pos
      |  FROM d),
      |adj AS (SELECT a.source AS sa, b.source AS sb FROM sq a
      |  JOIN sq b ON b.pos = a.pos + 1),
      |p AS (SELECT sa AS source, count(*)::BIGINT AS n_adj,
      |    sum(CASE WHEN sa = sb THEN 1 ELSE 0 END)::BIGINT AS n_same
      |  FROM adj GROUP BY 1),
      |sz AS (SELECT source, count(*)::BIGINT AS n_docs FROM d GROUP BY 1),
      |tt AS (SELECT count(*)::BIGINT AS n FROM d)
      |SELECT sz.source, sz.n_docs,
      |  coalesce(p.n_adj, 0)::BIGINT AS n_adj,
      |  coalesce(p.n_same, 0)::BIGINT AS n_same,
      |  (coalesce(p.n_same, 0) * 10000 //
      |    greatest(coalesce(p.n_adj, 0), 1))::BIGINT AS same_bp,
      |  ((sz.n_docs - 1) * 10000 // greatest(tt.n - 1, 1))::BIGINT AS expected_bp
      |FROM sz LEFT JOIN p USING (source), tt ORDER BY source""".stripMargin

  // --- q183: fixed-window packing boundary audit ---------------------------------

  /** Shared q183 constant (Spark + oracle + property replay): tokens per
    * training window. */
  private[operators] val PackWindow = 64L

  /** q183 — WINDOW-boundary accounting: GPT-style pretraining packs the
    * epoch-ordered token stream into fixed windows (here 64 tokens,
    * concat-and-cut), so a document either fits inside one window or is
    * SPLIT across a boundary — and the split share is the number the
    * "sample packing" literature trades against padding (q176 measures
    * padding's cost; this measures packing's). Per source: docs, tokens,
    * boundary-crossing docs and their share in bp, mean windows spanned in
    * micro-units. Pure arithmetic on the q160 running total: first window
    * = cum div W, last = (cum+tokens−1) div W — no per-window relation is
    * ever materialized (windows exist only as integer ids). Zero-token
    * docs are excluded by rule (they occupy no window) — both engines. */
  def windowBoundaryAudit(spark: SparkSession, dir: String): DataFrame =
    windowBoundaryAuditOver(
      Partitioning.spread(table(spark, dir, "documents")))

  /** The q183 core over any (doc_id, source, text) frame — exposed for
    * the property spec's plain-Scala running-total replay. */
  private[operators] def windowBoundaryAuditOver(docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("tokens"),
        PortableSketch.h60(concat(lit("ord:"), col("text"))).as("_ord"))
      .where(col("tokens") >= 1L)
    Layout.globalSequenceWithRunningTotal(keyed,
        Seq(col("_ord"), col("doc_id")), col("tokens"), "pos", "cum_before")
      .withColumn("_w0", expr(s"cum_before div $PackWindow"))
      .withColumn("_w1", expr(s"(cum_before + tokens - 1) div $PackWindow"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("n_tokens"),
        sum(when(col("_w1") > col("_w0"), 1L).otherwise(0L)).as("n_crossing"),
        sum(col("_w1") - col("_w0") + 1).as("_spans"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_crossing"),
        expr("n_crossing * 10000 div n_docs").as("crossing_bp"),
        expr("_spans * 1000000 div n_docs").as("mean_windows_u"))
      .orderBy("source")
  }

  private def q183OracleSql: String =
    s"""WITH d AS (SELECT doc_id, source,
       |    len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT AS tokens,
       |    ('0x' || substr(md5('ord:' || text), 1, 15))::BIGINT AS ord
       |  FROM documents),
       |f AS (SELECT * FROM d WHERE tokens >= 1),
       |sq AS (SELECT source, tokens,
       |    (sum(tokens) OVER (ORDER BY ord, doc_id ROWS UNBOUNDED PRECEDING)
       |      - tokens)::BIGINT AS cumb FROM f),
       |w AS (SELECT source, tokens, cumb // $PackWindow AS w0,
       |    (cumb + tokens - 1) // $PackWindow AS w1 FROM sq),
       |a AS (SELECT source, count(*)::BIGINT AS n_docs,
       |    sum(tokens)::BIGINT AS n_tokens,
       |    sum(CASE WHEN w1 > w0 THEN 1 ELSE 0 END)::BIGINT AS n_crossing,
       |    sum(w1 - w0 + 1)::BIGINT AS spans
       |  FROM w GROUP BY 1)
       |SELECT source, n_docs, n_tokens, n_crossing,
       |  (n_crossing * 10000 // n_docs)::BIGINT AS crossing_bp,
       |  (spans * 1000000 // n_docs)::BIGINT AS mean_windows_u
       |FROM a ORDER BY source""".stripMargin

  // --- q184: train-set assembly, end to end ---------------------------------------

  /** Shared q184 constant (Spark + oracle): tokens per shard. */
  private val AssemblyBudget = 2000L

  /** q184 — the TRAIN-SET ASSEMBLY funnel, end to end (the q99/q169
    * composition discipline: each stage is individually green; this
    * certifies them CHAINED, because production runs the chain): corpus →
    * cluster-grain train split (the q175 assignment — near-dups never
    * straddle) → n-gram decontamination against the val/test docs OF THAT
    * SPLIT (the q179 rule, here keyed consistently on the cluster labels)
    * → next-fit shard packing of the survivors (the q160 rule, epoch
    * order). One row per stage with docs/tokens and the final shard
    * count — the per-stage accounting a pipeline owner actually watches
    * (where did my tokens go?). Scale: composes the three proven shapes
    * unchanged; nothing new shuffles. */
  def assemblyFunnel(spark: SparkSession, dir: String): DataFrame = {
    val (docs, _, assigned) = clusterAssignment(spark, dir)
    val trainIds = assigned.where(col("split") === "train").select("doc_id")
    val probeIds = assigned.where(col("split") =!= "train").select("doc_id")
    // trainDocs is read twice (contamination grams, clean-stage rebuild)
    // but deliberately NOT persisted: it is a semi-join over the raw scan
    // and the cached cluster assignment, and caching the full text column
    // measured SLOWER than the rescan (7.5 -> 8.4 s at sf0.1, round 16)
    val trainDocs = docs.join(trainIds, Seq("doc_id"), "left_semi")
    val probeDocs = docs.join(probeIds, Seq("doc_id"), "left_semi")
    val flagged = TextOps.contamination(trainDocs, "text", "doc_id",
        probeDocs, "text", "doc_id", n = 3, minShared = DecontamMinShared)
      .select("doc_id").distinct()
    // persist: the clean stage is counted AND packed.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val clean = trainDocs.join(flagged, Seq("doc_id"), "left_anti")
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("tokens"),
        PortableSketch.h60(concat(lit("ord:"), col("text"))).as("_ord"))
      .persist()
    val packed = Layout.shardAssign(clean,
        Seq(col("_ord"), col("doc_id")), col("tokens"),
        budget = AssemblyBudget)
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("n_tokens"),
        countDistinct("shard").as("n_shards"))
    def stage(name: String, df: DataFrame): DataFrame = df
      .select(lit(name).as("stage"), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("n_shards"))
    stage("1_corpus", docs
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"))
        .withColumn("n_shards", lit(0L)))
      .unionByName(stage("2_train_split", assigned
        .where(col("split") === "train")
        .agg(count(lit(1)).as("n_docs"), sum("tokens").as("n_tokens"))
        .withColumn("n_shards", lit(0L))))
      .unionByName(stage("3_decontaminated", clean
        .agg(count(lit(1)).as("n_docs"), sum("tokens").as("n_tokens"))
        .withColumn("n_shards", lit(0L))))
      .unionByName(stage("4_packed", packed))
      .orderBy("stage")
  }

  /** q184 oracle: the q175 cluster CTEs → the q179 gram screen keyed on
    * the CLUSTER split → the q160 prefix-sum next-fit count. */
  private def q184OracleSql: String = {
    val sc = NorthStarQueries.splitCaseSql
    s"""WITH RECURSIVE ${NorthStarQueries.gramsCte},
       |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib FROM grams a JOIN grams b
       |  ON a.doc_id < b.doc_id WHERE ${NorthStarQueries.jaccardGe05}),
       |edges AS (SELECT ia AS s, ib AS d FROM p UNION ALL SELECT ib, ia FROM p),
       |reach(id, r) AS (SELECT s, s FROM edges
       |  UNION SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.d),
       |cl AS (SELECT id, MIN(r) AS rep FROM reach GROUP BY id),
       |dd AS (SELECT doc_id, coalesce(cl.rep, doc_id) AS rep,
       |    len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT AS tokens,
       |    ('0x' || substr(md5('ord:' || text), 1, 15))::BIGINT AS ord
       |  FROM documents LEFT JOIN cl ON cl.id = doc_id),
       |rs AS (SELECT doc_id AS rep, $sc AS csplit FROM documents),
       |asg AS (SELECT dd.*, rs.csplit FROM dd JOIN rs USING (rep)),
       |tr AS (SELECT g.doc_id, g.g FROM grams g JOIN asg USING (doc_id)
       |  WHERE asg.csplit = 'train'),
       |pb AS (SELECT g.g AS pg FROM grams g JOIN asg USING (doc_id)
       |  WHERE asg.csplit <> 'train'),
       |fl AS (SELECT DISTINCT tr.doc_id FROM tr JOIN pb
       |  ON len(list_intersect(tr.g, pb.pg)) >= $DecontamMinShared),
       |cln AS (SELECT asg.doc_id, asg.tokens, asg.ord FROM asg
       |  WHERE asg.csplit = 'train'
       |    AND asg.doc_id NOT IN (SELECT doc_id FROM fl)),
       |sq AS (SELECT tokens,
       |    (sum(tokens) OVER (ORDER BY ord, doc_id ROWS UNBOUNDED PRECEDING)
       |      - tokens)::BIGINT AS cumb FROM cln),
       |pk AS (SELECT count(*)::BIGINT AS n_docs,
       |    coalesce(sum(tokens), 0)::BIGINT AS n_tokens,
       |    count(DISTINCT cumb // $AssemblyBudget)::BIGINT AS n_shards FROM sq)
       |SELECT '1_corpus' AS stage, count(*)::BIGINT AS n_docs,
       |    coalesce(sum(tokens), 0)::BIGINT AS n_tokens, 0::BIGINT AS n_shards
       |  FROM dd
       |UNION ALL SELECT '2_train_split', count(*)::BIGINT,
       |    coalesce(sum(tokens), 0)::BIGINT, 0::BIGINT
       |  FROM asg WHERE csplit = 'train'
       |UNION ALL SELECT '3_decontaminated', count(*)::BIGINT,
       |    coalesce(sum(tokens), 0)::BIGINT, 0::BIGINT FROM cln
       |UNION ALL SELECT '4_packed', n_docs, n_tokens, n_shards FROM pk
       |ORDER BY stage""".stripMargin
  }

  // --- q185: suffix-blocklist URL filtering ---------------------------------------

  /** q185 — domain-BLOCKLIST filtering, the UT1-style gate every crawl
    * pipeline runs before anything else: a blocklist entry at any grain
    * ("example.com", "ads.example.com") blocks every host UNDER it, so the
    * membership test is a join of each host's DOT-SUFFIXES (≥ 2 labels)
    * against the entry set — never a per-entry regex scan, which is what
    * makes a million-entry blocklist usable (the entry set broadcasts; the
    * suffix fan-out is the label count, ≤ ~6). Pinned inputs (the q142
    * discipline): hosts derive from corpus columns with half the docs on a
    * lang SUBDOMAIN (`lang.srcN.example.com`), so a source-grain entry
    * blocks its subdomained docs only through the suffix walk — the
    * mechanism under test, measured. Entries: source domains with
    * h60('blk:'‖entry) % 4 == 0 plus subdomain hosts with % 7 == 0 →
    * mixed per-source shares. Report per source: docs, blocked, bp. */
  def blocklistFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Partitioning.spread(table(spark, dir, "documents"))
    val hostCol = when(col("doc_id") % 2 === 0,
        concat(col("lang"), lit("."), col("source"), lit(".example.com")))
      .otherwise(concat(col("source"), lit(".example.com")))
    // persist: feeds both blocklist derivations AND the suffix walk.
    // Ownership: Verify/Bench clear the cache after each query's action.
    val hosts = docs.select(col("doc_id"), col("source"), hostCol.as("host"))
      .persist()
    def hashed(c: Column): Column =
      pmod(PortableSketch.h60(concat(lit("blk:"), c)), lit(1000))
    val domainEntries = hosts
      .select(concat(col("source"), lit(".example.com")).as("entry")).distinct()
      .where(hashed(col("entry")) % 4 === 0)
    val subEntries = hosts.select(col("host").as("entry"))
      .where(size(split(col("host"), "\\.")) === 4).distinct()
      .where(hashed(col("entry")) % 7 === 0)
    val blocklist = domainEntries.unionByName(subEntries).distinct()
    val suffixes = hosts
      .withColumn("_labels", split(col("host"), "\\."))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(_labels) - 1), " +
          "i -> array_join(slice(_labels, i, size(_labels) - i + 1), '.'))"))
        .as("_sfx"))
    val blocked = suffixes
      .join(broadcast(blocklist), col("_sfx") === col("entry"), "left_semi")
      .select("doc_id").distinct().withColumn("_b", lit(1L))
    hosts.join(blocked, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("_b"), lit(0L))).as("n_blocked"))
      .withColumn("blocked_bp", expr("n_blocked * 10000 div n_docs"))
      .orderBy("source")
  }

  private def q185OracleSql: String =
    """WITH h AS (SELECT doc_id, source,
      |    CASE WHEN doc_id % 2 = 0 THEN lang || '.' || source || '.example.com'
      |         ELSE source || '.example.com' END AS host
      |  FROM documents),
      |de AS (SELECT DISTINCT source || '.example.com' AS entry FROM h),
      |deb AS (SELECT entry FROM de
      |  WHERE (('0x' || substr(md5('blk:' || entry), 1, 15))::BIGINT % 1000) % 4 = 0),
      |se AS (SELECT DISTINCT host AS entry FROM h
      |  WHERE len(string_split(host, '.')) = 4),
      |seb AS (SELECT entry FROM se
      |  WHERE (('0x' || substr(md5('blk:' || entry), 1, 15))::BIGINT % 1000) % 7 = 0),
      |bl AS (SELECT DISTINCT entry FROM (SELECT * FROM deb UNION ALL SELECT * FROM seb)),
      |sfx AS (SELECT doc_id, unnest(list_transform(
      |      range(1, len(string_split(host, '.'))),
      |      i -> array_to_string(string_split(host, '.')[i:], '.'))) AS s
      |  FROM h),
      |bk AS (SELECT DISTINCT doc_id FROM sfx WHERE s IN (SELECT entry FROM bl))
      |SELECT h.source, count(*)::BIGINT AS n_docs,
      |  sum(CASE WHEN bk.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_blocked,
      |  (sum(CASE WHEN bk.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 10000
      |    // count(*))::BIGINT AS blocked_bp
      |FROM h LEFT JOIN bk USING (doc_id) GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q186: boilerplate template inventory ----------------------------------------

  /** Shared q186 constants (Spark + oracle): a chunk is a TEMPLATE when at
    * least this many distinct docs carry it; the planted per-source
    * boilerplate prefix. */
  private val TemplateMinDocs = 5
  private val TemplateBoiler =
    "terms and conditions copyright holder reserves every right contact the site administrator for"

  /** q186 — TEMPLATE inventory: the boilerplate chunks q173's hot cap
    * excludes from pairing, surfaced as their own report — the site-
    * template census a crawl pipeline uses to build its boilerplate
    * stripper (which exact chunks repeat across ≥ 5 docs, how long, how
    * many sources). Runs on q171's content-defined chunks, so a template
    * is found wherever it sits in the page (the insertion-robustness
    * argument). The natural corpus is template-free (measured: no chunk
    * reaches 4 docs), so docs with doc_id % 3 == 0 PREPEND a per-source
    * boilerplate header (the q127/q168 planted-stream discipline — an
    * inventory over a template-free corpus proves nothing); chunks fully
    * inside the header re-sync across its carriers and surface per
    * source, while junction chunks stay doc-specific. Only (digest, len)
    * rows leave the scan; the rollup is digest-keyed. */
  def templateInventory(spark: SparkSession, dir: String): DataFrame = {
    val docs = Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 3 === 0,
          concat(lit(TemplateBoiler), lit(" "), col("source"),
            lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
    TextOps.cdcChunks(docs, "text", Seq("doc_id", "source"))
      .groupBy("_h")
      .agg(countDistinct("doc_id").as("n_docs"),
        countDistinct("source").as("n_sources"),
        max("chunk_len").as("chunk_len"))
      .where(col("n_docs") >= TemplateMinDocs)
      .select(col("_h").as("chunk_hash"), col("chunk_len"),
        col("n_docs"), col("n_sources"))
      .orderBy(col("n_docs").desc, col("chunk_hash"))
  }

  private def q186OracleSql: String = {
    // the CDC boundary chain is Round13Queries.cdcOracleCtesFor — ONE
    // definition of the rule/constants shared with the q171-family oracles;
    // only the planted-header src and the template rollup are q186's own
    val ctes = Round13Queries.cdcOracleCtesFor(
      s"""SELECT doc_id, source,
         |    CASE WHEN doc_id % 3 = 0
         |      THEN '$TemplateBoiler' || ' ' || source || ' ' || text
         |      ELSE text END AS text
         |  FROM documents""".stripMargin)
    s"""WITH RECURSIVE $ctes,
       |g AS (SELECT h AS chunk_hash, max(clen)::BIGINT AS chunk_len,
       |    count(DISTINCT doc_id)::BIGINT AS n_docs,
       |    count(DISTINCT source)::BIGINT AS n_sources
       |  FROM hk GROUP BY 1)
       |SELECT chunk_hash, chunk_len, n_docs, n_sources FROM g
       |WHERE n_docs >= $TemplateMinDocs
       |ORDER BY n_docs DESC, chunk_hash""".stripMargin
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q175_leak_safe_split" -> (leakSafeSplit _),
    "q176_padding_audit" -> (paddingAudit _),
    "q177_epoch_mix" -> (epochMix _),
    "q178_length_percentiles" -> (lengthPercentiles _),
    "q179_split_decontam" -> (splitDecontam _),
    "q180_vocab_growth" -> (vocabGrowth _),
    "q181_signal_agreement" -> (signalAgreement _),
    "q182_mixing_audit" -> (mixingAudit _),
    "q183_window_boundaries" -> (windowBoundaryAudit _),
    "q184_assembly_funnel" -> (assemblyFunnel _),
    "q185_blocklist_filter" -> (blocklistFilter _),
    "q186_template_inventory" -> (templateInventory _)
  )

  val oracles: Map[String, String] = Map(
    "q175_leak_safe_split" -> q175OracleSql,
    "q176_padding_audit" -> q176OracleSql,
    "q177_epoch_mix" -> q177OracleSql,
    "q178_length_percentiles" -> q178OracleSql,
    "q179_split_decontam" -> q179OracleSql,
    "q180_vocab_growth" -> q180OracleSql,
    "q181_signal_agreement" -> q181OracleSql,
    "q182_mixing_audit" -> q182OracleSql,
    "q183_window_boundaries" -> q183OracleSql,
    "q184_assembly_funnel" -> q184OracleSql,
    "q185_blocklist_filter" -> q185OracleSql,
    "q186_template_inventory" -> q186OracleSql
  )
}
