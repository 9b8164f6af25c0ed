package graft

import org.apache.spark.sql.functions._

/** Scale sweep for the round-10 text operators (test scope — run with
  * `sbt "Test/runMain graft.ProfScale"`; not part of the shipped artifact).
  *
  * Writes the sf0.1 documents corpus and a 10×-blown-up variant (each
  * replica PREPENDS a distinct token, so chunk boundaries shift and every
  * replica's chunks are distinct — the worst case for chunk dedup: the
  * digest relation grows the full 10×, nothing collapses early) to temp
  * dirs, then times q105/q106/q107 on both. The claim under test is the
  * scale note each operator ships with: cost linear in corpus tokens
  * (q105), vocabulary-bounded after the first aggregation (q106/q107) —
  * so the 10× corpus should cost ≲10× for q105 and well UNDER 10× for the
  * vocab-bounded pair. Results recorded in BASELINE.md.
  */
object ProfScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val blowup = sys.env.getOrElse("SPARK_GRAFT_SCALE_BLOWUP", "10").toInt
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.ensureRegistered(spark)

    val base = spark.read.parquet(s"$dir/documents.parquet")
    val big = base
      .withColumn("_rep", explode(array((0 until blowup).map(lit): _*)))
      .withColumn("doc_id", col("doc_id") * blowup + col("_rep"))
      .withColumn("text", concat(lit("r"), col("_rep"), lit(" "), col("text")))
      .drop("_rep")
    // hot variant, same size as `big`: 90% of docs PREPEND one fixed
    // 20-token chunk (the corpus-wide boilerplate worst case — one digest
    // holds 90% of chunk occurrences), the rest the distinct tag. q105 must
    // run hot ≈ distinct: the hot digest collapses in map-side partials and
    // no corpus-sized relation joins on the digest (BASELINE.md (p) addendum).
    val hotChunk = (1 to 20).map(i => f"h$i%02d").mkString(" ")
    val hot = base
      .withColumn("_rep", explode(array((0 until blowup).map(lit): _*)))
      .withColumn("doc_id", col("doc_id") * blowup + col("_rep"))
      .withColumn("text",
        when(pmod(col("doc_id"), lit(10)) < 9, concat(lit(hotChunk), lit(" "), col("text")))
          .otherwise(concat(lit("r"), col("_rep"), lit(" "), col("text"))))
      .drop("_rep")
    val d1 = java.nio.file.Files.createTempDirectory("profscale-1x").toString
    val dN = java.nio.file.Files.createTempDirectory(s"profscale-${blowup}x").toString
    val dH = java.nio.file.Files.createTempDirectory(s"profscale-hot${blowup}x").toString
    base.write.mode("overwrite").parquet(s"$d1/documents.parquet")
    big.write.mode("overwrite").parquet(s"$dN/documents.parquet")
    hot.write.mode("overwrite").parquet(s"$dH/documents.parquet")
    // embeddings blowup for the cluster-family sweeps (q155): replicas keep
    // ids OUT of the k-means init range (id + rep·1e6, initMax 800), so the
    // centroid model is IDENTICAL at both scales and only assignment work
    // grows — the isolation the "model is bounded, corpus is not" claim needs
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.write.mode("overwrite").parquet(s"$d1/embeddings.parquet")
    emb.withColumn("_rep", explode(array((0 until blowup).map(lit): _*)))
      .withColumn("vec_id", col("vec_id") + col("_rep").cast("long") * 1000000L)
      .drop("_rep")
      .write.mode("overwrite").parquet(s"$dN/embeddings.parquet")
    println(s"[scale] corpus 1x=${base.count()} ${blowup}x=${big.count()} hot=${hot.count()} docs")
    // the hot corpus doubles as the q97 boilerplate stress: the shared
    // 20-token chunk plants ~18 word-3-grams each present in 90% of docs —
    // the flagged-gram join's worst case (every occurrence of a flagged
    // gram meets the boiler relation on that gram's key)
    // the hot corpus is also q124's worst case: every window inside the
    // shared 20-token prefix is duplicated ~45k times — the flag join's
    // hottest key, plus a maximal merged span in 90% of docs
    for (round <- 1 to 3; (name, q) <- Seq[(String, String => org.apache.spark.sql.DataFrame)](
        "q105" -> (d => operators.CurationQueries.chunkDedup(spark, d)),
        "q97" -> (d => operators.SelectionQueries.boilerplate(spark, d)),
        "q124" -> (d => operators.CurationQueries.substringDupSpans(spark, d)));
        (label, d) <- Seq(s"${blowup}x-distinct" -> dN, s"${blowup}x-hot" -> dH)) {
      val t0 = System.nanoTime()
      q(d).write.format("noop").mode("overwrite").save()
      println(f"[scale] r$round $name $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sharedState.cacheManager.clearCache()
    }

    val queries: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      // q146/q152: one tokenize pass each, then vocab-histogram-bounded
      // work — expect ~10x scan against a flat tail
      "q146_distinctive" -> (d => operators.PipelineQueries.distinctiveTerms(spark, d)),
      "q152_concentration" -> (d => operators.PipelineQueries.tokenConcentration(spark, d)),
      // q155: the centroid model is scale-fixed (replica ids dodge the init
      // range), so cost is the assignment map + a k-row agg — expect ~10x
      // scan-bound; q156: postings only for the probe vocabulary, but the
      // blowup grows probes 10x AND the tag vocabulary with them — expect
      // ~10x against the tokenize floor
      "q155_quality" -> (d => operators.SelectionQueries.clusterQuality(spark, d)),
      "q156_mrr" -> (d => operators.PipelineQueries.retrievalEval(spark, d)),
      "q105_chunk_dedup" -> (d => operators.CurationQueries.chunkDedup(spark, d)),
      "q106_bpe_pairs" -> (d => operators.PipelineQueries.bpePairs(spark, d)),
      "q107_oov_rate" -> (d => operators.PipelineQueries.oovRate(spark, d)),
      // round 11: q113 is one-tokenize linear (≲10×); q114's cost is the
      // postings, a small corpus-proportional slice (≲10×); q117/q118 are
      // vocabulary-bounded after the first aggregation (the blowup adds 10
      // vocab entries, so expect far UNDER 10×); q120 is distinct-text
      // bounded (the distinct-prefix blowup grows it the full 10×)
      "q113_importance" -> (d => operators.SelectionQueries.importanceWeights(spark, d)),
      "q114_phrase" -> (d => operators.PipelineQueries.phraseSearch(spark, d)),
      "q117_bpe_merges" -> (d => operators.PipelineQueries.bpeInduct(spark, d)),
      "q118_bpe_encode" -> (d => operators.PipelineQueries.bpeEncodeReport(spark, d)),
      "q120_soft_dedup" -> (d => operators.CurationQueries.softDedupWeights(spark, d)),
      // round 11 late: q121 is one-scan linear in corpus tokens (grouping
      // keys all contain doc_id — expect ≲10×); q122's candidate set grows
      // with per-bucket density (pairs ∝ n²/65k per band under a uniform
      // hash) but the star cap bounds any single bucket — expect ~10× on
      // the distinct corpus, and the const-payload stress below to stay
      // near it rather than exploding quadratically
      "q121_repetition" -> (d => operators.CurationQueries.repetitionProfile(spark, d)),
      "q122_phash" -> (d => operators.NorthStarQueries.phashNearDups(spark, d)),
      "q124_substr" -> (d => operators.CurationQueries.substringDupSpans(spark, d)),
      "q125_cut" -> (d => operators.CurationQueries.substringCut(spark, d)),
      "q126_charcov" -> (d => operators.CurationQueries.charCoverage(spark, d)),
      // round 11 post-close: admission is batch-proportional (the blowup
      // grows batch AND corpus 10x — expect ~10x); clusters add the CC
      // rounds on top of the q122 relations (expect ~10x + a flat round
      // floor — replica chains stay 2-node, so the round count is stable)
      "q123_admit" -> (d => operators.NorthStarQueries.phashAdmitBatch(spark, d)),
      "q127_clusters" -> (d => operators.NorthStarQueries.phashDupClusters(spark, d)),
      // round 12: q158 is two gram passes + a |langs|-bounded model (expect
      // ~10x scan); q159 collapses to the VOCABULARY first — the blowup
      // adds 10 one-token words, so EM rounds stay vocab-bounded (expect
      // far under 10x); q160 is the two-pass prefix sum (~10x); q161 is the
      // q98 family (truth self-join over the sample — ~10x-ish with the
      // pair tail); q162 is a pure scan projection + host rollup (~10x)
      "q158_langid" -> (d => operators.Round12Queries.languageId(spark, d)),
      "q159_unigram" -> (d => operators.Round12Queries.unigramTokenizer(spark, d)),
      "q160_shards" -> (d => operators.Round12Queries.shardPacking(spark, d)),
      "q161_scurve" -> (d => operators.Round12Queries.bandingSCurve(spark, d)),
      "q162_urls" -> (d => operators.Round12Queries.urlCanonicalize(spark, d)),
      // q164: per-lang bigram tables grow with the blowup's distinct
      // prefixes (each replica adds new (r_i, first-word) bigrams) but stay
      // vocab²-bounded; the rank pass shuffles one narrow row per doc —
      // expect ≲10x
      "q164_ppl_buckets" -> (d => operators.Round12Queries.perplexityBuckets(spark, d)),
      // round 13: q165 is the q117/q118 shape over the byte alphabet
      // (vocab-bounded rounds — expect far under 10x); q167/q170 are the
      // q82 rollup + a |hosts|-bounded graph/composition (~10x tokenize
      // floor); q168's truth term is sample² (the blowup grows the sample
      // 10x -> pair tail up to ~100x of a small base; the rate is THE
      // lever — watch it, don't hide it); q169 composes q158 + q164
      // (expect the sum of their shapes); q171 is a per-row candidate scan
      // + digest-keyed dup join (~10x)
      "q165_byte_bpe" -> (d => operators.Round13Queries.byteBpe(spark, d)),
      "q167_host_rep" -> (d => operators.Round13Queries.hostReputation(spark, d)),
      "q168_phash_recall" -> (d => operators.Round13Queries.phashRecallAudit(spark, d)),
      "q169_ccnet" -> (d => operators.Round13Queries.ccnetComposition(spark, d)),
      "q170_rep_select" -> (d => operators.Round13Queries.reputationSelect(spark, d)),
      "q171_cdc" -> (d => operators.Round13Queries.cdcChunkDedup(spark, d)),
      // q172 composes q164's grain with the q160 prefix sum (expect the
      // q164 shape); q173's pair stage is capped per chunk (16 docs max ->
      // <=120 pairs/chunk) — expect ~linear in chunks against the scan
      "q172_curriculum" -> (d => operators.Round13Queries.curriculumPacking(spark, d)),
      "q173_containment" -> (d => operators.Round13Queries.cdcContainment(spark, d)),
      // q174 is batch-side work against the corpus chunk index (~10x both)
      "q174_cdc_admit" -> (d => operators.Round13Queries.cdcAdmit(spark, d)),
      // round 13 second wave: q175 rides the q24/q48 pair+CC shapes (expect
      // their profile — candidate-bounded pairs, CC round floor); q176 is
      // two two-pass sequences + narrow rollups (~10x); q177's state is
      // |sources|-bounded after one scan (~10x scan floor); q178 collapses
      // to the per-source length histogram in one scan (~10x)
      "q175_split" -> (d => operators.TrainPrepQueries.leakSafeSplit(spark, d)),
      "q176_padding" -> (d => operators.TrainPrepQueries.paddingAudit(spark, d)),
      "q177_epochs" -> (d => operators.TrainPrepQueries.epochMix(spark, d)),
      "q178_lenpct" -> (d => operators.TrainPrepQueries.lengthPercentiles(spark, d)),
      // q179 is the q51 gram-hash join with the eval split as probes (the
      // probe side grows with the blowup here — watch the broadcast, the
      // documented production shape keeps it eval-sized); q180 is one
      // sequence pass + a token-grain groupBy (~10x); q181 composes the
      // q164 grain with one more token rollup (expect the q164 shape)
      "q179_decontam" -> (d => operators.TrainPrepQueries.splitDecontam(spark, d)),
      "q180_vocab" -> (d => operators.TrainPrepQueries.vocabGrowth(spark, d)),
      "q181_agreement" -> (d => operators.TrainPrepQueries.signalAgreement(spark, d)),
      // q182/q183 are one sequence pass + narrow rollups (~10x floor);
      // q184 composes the q175 + q179 + q160 shapes (expect their sum)
      "q182_mixing" -> (d => operators.TrainPrepQueries.mixingAudit(spark, d)),
      "q183_windows" -> (d => operators.TrainPrepQueries.windowBoundaryAudit(spark, d)),
      "q184_funnel" -> (d => operators.TrainPrepQueries.assemblyFunnel(spark, d)),
      // q185 is a scan-side suffix fan-out (≤ 4 labels) against a
      // broadcast entry set (~10x scan); q186 is the q171 chunk scan +
      // one digest-keyed rollup (~q171's linear profile)
      "q185_blocklist" -> (d => operators.TrainPrepQueries.blocklistFilter(spark, d)),
      "q186_templates" -> (d => operators.TrainPrepQueries.templateInventory(spark, d)),
      // q187 is the q165 chain + a |langs| rollup (vocab-bounded rounds —
      // expect q165's far-under-10x profile)
      "q187_fertility" -> (d => operators.Round13Queries.byteBpeLangFertility(spark, d)))

    // SPARK_GRAFT_ONLY: comma-separated name substrings (the Verify/Bench
    // convention) — sweep just the named queries when iterating
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = queries.filter { case (n, _) => only.forall(_.exists(n.contains)) }
    for (round <- 1 to 3; (name, q) <- selected; (label, d) <- Seq("1x" -> d1, s"${blowup}x" -> dN)) {
      val t0 = System.nanoTime()
      q(d).write.format("noop").mode("overwrite").save()
      println(f"[scale] r$round $name $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sharedState.cacheManager.clearCache()
    }

    // q122 worst case: 90% of the 10x corpus is ONE payload, so each
    // modality's four band buckets hold ~15k identical hashes — without the
    // star cap this is ~10^8 pairs per modality; with it, O(bucket)
    val constText = (1 to 60).map(i => f"c$i%03d").mkString(" ")
    val ph = base
      .withColumn("_rep", explode(array((0 until blowup).map(lit): _*)))
      .withColumn("doc_id", col("doc_id") * blowup + col("_rep"))
      .withColumn("text",
        when(pmod(col("doc_id"), lit(10)) < 9, lit(constText))
          .otherwise(concat(lit("r"), col("_rep"), lit(" "), col("text"))))
      .drop("_rep")
    val dP = java.nio.file.Files.createTempDirectory(s"profscale-phash-hot${blowup}x").toString
    ph.write.mode("overwrite").parquet(s"$dP/documents.parquet")
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      operators.NorthStarQueries.phashNearDups(spark, dP)
        .write.format("noop").mode("overwrite").save()
      println(f"[scale] r$round q122_phash ${blowup}x-const-hot: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
