package graft.streaming

import graft.ops.{Dedup, Sampling}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming split-consistent admission — the ingest mirror of q175
  * (`TrainPrepQueries.leakSafeSplit`): as new documents arrive, each one
  * must land in a train/val/test split that never contradicts its
  * near-duplicates, or the eval hygiene the batch split established erodes
  * one ingest day at a time (a test doc's near-copy admitted to train IS
  * the leak q175 exists to prevent).
  *
  * Deployment shape (the StreamingPerplexity/TrainedGate split): the
  * corpus's per-document split table is a BATCH artifact (global CC is a
  * batch computation by nature); the stream applies it per micro-batch via
  * [[assignBatch]] in `foreachBatch` — the q76/q174 incremental-admission
  * shape, cost ∝ batch, corpus×corpus never formed:
  *
  *  1. batch×corpus near-dup pairs — the exact q175 pair relation (banded
  *     word-3-gram MinHash candidates, k=64/16 bands, exact-Jaccard ≥ 0.5
  *     verify), probed asymmetrically so only batch bands fan out;
  *  2. batch-internal pairs + connected components (`Dedup.dupClusters`
  *     over a batch-sized graph), because two near-dup docs arriving in
  *     the SAME batch must also share a split;
  *  3. per component: the distinct corpus splits its members matched.
  *     Exactly one → every member INHERITS it. Two or more → the component
  *     BRIDGES existing clusters whose splits already differ — any
  *     assignment would leak against one side, so the whole component is
  *     QUARANTINED until the nightly q175 re-run merges the clusters. None
  *     → a genuinely novel component, assigned by its representative's
  *     content hash (the q175 rep rule on the novel subgraph).
  *
  * The no-leak guarantee this preserves (spec-asserted, not assumed): after
  * admission, no verified near-dup pair inside batch ∪ corpus carries two
  * different non-quarantine splits. Caller must keep batch and corpus doc
  * ids disjoint (fresh ingest ids by construction).
  */
object StreamingSplit {

  /** Assign a split to every document of `batch` against a standing
    * `corpus` of (id, text, split). Returns one row per batch doc:
    * (idCol, split, mode) with mode ∈ inherited | novel | quarantine.
    *
    * Scale: the corpus contributes its banded signature index (in
    * production a persisted, bucket-partitioned artifact — the
    * incrementalAdmit posture); per-batch cost is the batch's band
    * fan-out, the verified-candidate joins, and a CC over the BATCH-only
    * pair graph. Weights/salt must equal the batch q175 run's so the
    * novel-component rule is the same hash rule.
    *
    * One-shot convenience over [[assignBatchHandle]] — a long-lived
    * foreachBatch caller MUST use the handle and unpersist per batch, or
    * two cached frames accumulate per micro-batch for the stream's
    * lifetime (and a spark-wide clearCache would also evict the standing
    * corpus band index). */
  def assignBatch(corpus: DataFrame, batch: DataFrame,
      weights: Seq[(String, Double)], salt: String = "v1",
      idCol: String = "doc_id", textCol: String = "text",
      splitCol: String = "split",
      k: Int = 64, bands: Int = 16, n: Int = 3,
      threshold: Double = 0.5, maxBucket: Int = 1024): DataFrame =
    assignBatchHandle(corpus, batch, weights, salt, idCol, textCol,
      splitCol, k, bands, n, threshold, maxBucket)._1

  /** [[assignBatch]] plus the persisted intermediates BACKING the result
    * (the [[graft.ops.Layout.globalSequenceHandle]] contract): consume the
    * result, then unpersist each returned frame. The persists are
    * load-bearing while the result is consumed — batch bands probe corpus
    * and batch sides, and both pair families project out of one verified
    * relation. */
  def assignBatchHandle(corpus: DataFrame, batch: DataFrame,
      weights: Seq[(String, Double)], salt: String = "v1",
      idCol: String = "doc_id", textCol: String = "text",
      splitCol: String = "split",
      k: Int = 64, bands: Int = 16, n: Int = 3,
      threshold: Double = 0.5,
      maxBucket: Int = 1024): (DataFrame, Seq[DataFrame]) = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val rows = k / bands
    val spark = corpus.sparkSession
    graft.expr.GraftFunctions.ensureRegistered(spark)
    def sigs(df: DataFrame): DataFrame = graft.ops.Partitioning.spread(df)
      .select(col(idCol).as("_id"),
        graft.expr.GraftFunctions.wordNGrams(col(textCol), n).as("_grams"))
      .select(col("_id"),
        graft.ops.PortableSketch.minhashSigFromGramsFast(col("_grams"), k)
          .as("_sig"))
    def banded(s: DataFrame): DataFrame = s.select(col("_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(graft.ops.PortableSketch.bandKey(col("_sig"), b, rows))
            .as("key"))
      }: _*)).as("_b"))
      .select(col("_id"), col("_b.band").as("_band"), col("_b.key").as("_key"))
    // persist: batch bands probe corpus AND batch sides; the union text
    // frame feeds the exact verify. Ownership: returned through the handle
    // for the caller to unpersist once the result is consumed.
    val batchBands = banded(sigs(batch)).persist()
    val corpusBands = banded(sigs(corpus))
    // Hot-bucket cap on the corpus side only (the incrementalAdmit skew
    // guard): a batch doc needs only SOME same-bucket corpus witness, and
    // at overflow scale a bucket's members are boilerplate-identical — the
    // smallest ids are kept, deterministically. The cap is PER (bucket,
    // split): keeping maxBucket witnesses of each distinct split means the
    // cap can never drop the one conflicting-split witness that turns an
    // 'inherited' verdict into the correct 'quarantine' — the no-leak
    // invariant survives capping by construction, at a bounded fan-out of
    // maxBucket × |splits| per bucket. Only hot-bucket rows pay the split
    // join (the flagged subset, not the whole index).
    val hotKeys = corpusBands.groupBy("_band", "_key")
      .agg(count(lit(1)).as("_n")).where(col("_n") > maxBucket)
      .select(col("_band").as("_hband"), col("_key").as("_hkey"))
    val flagged = corpusBands.join(broadcast(hotKeys),
      col("_band") === col("_hband") && col("_key") === col("_hkey"),
      "left_outer")
    val byBucketSplit = org.apache.spark.sql.expressions.Window
      .partitionBy("_band", "_key", "_csplit").orderBy("_id")
    val cappedCorpus = flagged.where(col("_hband").isNull)
      .drop("_hband", "_hkey")
      .unionByName(flagged.where(col("_hband").isNotNull)
        .drop("_hband", "_hkey")
        .join(corpus.select(col(idCol).as("_id"), col(splitCol).as("_csplit")),
          Seq("_id"))
        .withColumn("_rk", row_number().over(byBucketSplit))
        .where(col("_rk") <= maxBucket).drop("_rk", "_csplit"))
    def pairsOf(probe: DataFrame, target: DataFrame,
        withinBatch: Boolean): DataFrame = {
      val joined = probe.as("nw").join(target.as("pr"),
        col("nw._band") === col("pr._band") &&
          col("nw._key") === col("pr._key") &&
          (if (withinBatch) col("pr._id") < col("nw._id") else lit(true)))
        .select(col("nw._id").as("idA"), col("pr._id").as("idB")).distinct()
      joined
    }
    val candBC = pairsOf(batchBands, cappedCorpus, withinBatch = false)
    val candBB = pairsOf(batchBands, batchBands, withinBatch = true)
    // one exact-verify pass over the union frame covers both families —
    // ids must be disjoint (documented contract)
    val allDocs = corpus.select(col(idCol), col(textCol))
      .unionByName(batch.select(col(idCol), col(textCol)))
    // persist: both pair families project out of one verified relation
    val verified = Dedup.ngramJaccardVerify(allDocs,
        candBC.unionByName(candBB), textCol, idCol, n = n,
        threshold = threshold)
      .select("idA", "idB").persist()
    val batchIds = batch.select(col(idCol).as("_bid"))
    val pairsBB = verified
      .join(batchIds.withColumnRenamed("_bid", "idA"), Seq("idA"), "left_semi")
      .join(batchIds.withColumnRenamed("_bid", "idB"), Seq("idB"), "left_semi")
    val pairsBC = verified
      .join(batchIds.withColumnRenamed("_bid", "idA"), Seq("idA"), "left_semi")
      .join(batchIds.withColumnRenamed("_bid", "idB"), Seq("idB"), "left_anti")
    // batch components: CC over the batch-only pair graph; singletons are
    // their own rep
    val cc = Dedup.dupClusters(pairsBB)
      .withColumnRenamed("id", "_bid").withColumnRenamed("rep", "_rep")
    val members = batch.select(col(idCol).as("_bid"), col(textCol).as("_text"))
      .join(cc, Seq("_bid"), "left")
      .withColumn("_rep", coalesce(col("_rep"), col("_bid")))
    // distinct corpus splits matched per component
    val anchors = pairsBC
      .join(corpus.select(col(idCol).as("idB"), col(splitCol).as("_cs")),
        Seq("idB"))
      .join(members.select(col("_bid").as("idA"), col("_rep")), Seq("idA"))
      .groupBy("_rep")
      .agg(countDistinct("_cs").as("_nsplits"), min("_cs").as("_anchor"))
    // novel-component rule: the REP's content hash through the exact q175
    // mechanism (weights + salt must match the batch run)
    val repSplit = members.where(col("_bid") === col("_rep"))
      .select(col("_rep"),
        Sampling.hashSplit(col("_text"), weights, salt).as("_hsplit"))
    val result = members
      .join(anchors, Seq("_rep"), "left")
      .join(repSplit, Seq("_rep"), "left")
      .select(col("_bid").as(idCol),
        when(col("_nsplits") >= 2, lit("quarantine"))
          .when(col("_nsplits") === 1, col("_anchor"))
          .otherwise(col("_hsplit")).as(splitCol),
        when(col("_nsplits") >= 2, lit("quarantine"))
          .when(col("_nsplits") === 1, lit("inherited"))
          .otherwise(lit("novel")).as("mode"))
    (result, Seq(batchBands, verified))
  }
}
