package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, PortableSketch}

/** Stage-level profiler for the LSH dedup family (test scope — run with
  * `sbt "Test/runMain graft.ProfLsh"`; not part of the shipped artifact).
  *
  * Attributes q24/q48/q63 wall time to their pipeline stages so a bench
  * regression names a stage, not a query: gram formation, signature
  * materialization, banded candidate generation, exact verify, and the
  * connected-components init/rounds split (the latter also surfaced per-run
  * in BENCH.json via Dedup.lastRoundSecs).
  */
object ProfLsh {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.ensureRegistered(spark)
    // per-block shuffle byte totals: contention sensitivity tracks the WIDTH
    // of what moves, not the quiet-box wall time (BASELINE.md §(k))
    val shuffleW = new java.util.concurrent.atomic.AtomicLong
    val shuffleR = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleW.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        shuffleR.addAndGet(sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
      }
    })
    def t(name: String)(f: => Unit): Unit = {
      val w0 = shuffleW.get; val t0 = System.nanoTime(); f
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; give them a beat
      Thread.sleep(300)
      println(f"[prof] $name: $secs%.2f s  shuffleW=${(shuffleW.get - w0) / 1024}%d KiB")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("warmup count")(docs.count())
    t("warmup q24")(noop(graft.operators.NorthStarQueries.ngramNearDups(spark, dir)))
    spark.sharedState.cacheManager.clearCache()

    for (round <- 1 to 3) {
      println(s"---- round $round ----")
      // q24 split: candidate generation (k=64 banding + cap) vs exact verify
      val candidates = Dedup.minhashCandidatePairs(docs, "text", "doc_id",
        k = 64, bands = 16, shingle = 3, wordGrams = true)
        .select("idA", "idB").persist()
      t("q24 candidates")(candidates.count())
      t("q24 verify (given candidates)")(noop(
        Dedup.ngramJaccardVerify(docs, candidates, "text", "doc_id", n = 3, threshold = 0.5)))
      // q48 split: CC over the persisted verified pairs
      val pairs = Dedup.ngramJaccardVerify(docs, candidates, "text", "doc_id",
        n = 3, threshold = 0.5).select("idA", "idB").persist()
      t("q48 pairs materialize")(pairs.count())
      Dedup.resetRoundSecs()
      t("q48 dupClusters (given pairs)")(noop(Dedup.dupClusters(pairs)))
      println("[prof] q48 rounds: " + Dedup.lastRoundSecs.map { case (l, s) => f"$l=$s%.2f" }.mkString(" "))
      pairs.unpersist(); candidates.unpersist()
      spark.sharedState.cacheManager.clearCache()

      // q63 portable family (k=16, 4×4 string band keys)
      val sigs63 = graft.ops.Partitioning.spread(docs)
        .select(col("doc_id").as("_id"), graft.expr.GraftFunctions.wordNGrams(col("text"), 3).as("_grams"))
        .select(col("_id"), PortableSketch.minhashSigFromGramsFast(col("_grams"), 16).as("_sig"))
      t("q63 sigs")(noop(sigs63))
      t("q63 full")(noop(
        PortableSketch.minhashNearDups(docs, "text", "doc_id", k = 16, bands = 4, n = 3, threshold = 0.5)))
      spark.sharedState.cacheManager.clearCache()

      // q24/q48 end-to-end (what Bench measures)
      t("q24 end-to-end")(noop(graft.operators.NorthStarQueries.ngramNearDups(spark, dir)))
      spark.sharedState.cacheManager.clearCache()
      Dedup.resetRoundSecs()
      t("q48 end-to-end")(noop(graft.operators.NorthStarQueries.dupClusters(spark, dir)))
      println("[prof] q48 e2e rounds: " + Dedup.lastRoundSecs.map { case (l, s) => f"$l=$s%.2f" }.mkString(" "))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
