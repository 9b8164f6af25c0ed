package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, PortableSketch, TextOps}

/** Temporary stage-level profiler for the LSH dedup family (not committed). */
object ProfLsh {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.ensureRegistered(spark)
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("warmup count")(docs.count())

    for (round <- 1 to 3) {
      println(s"---- round $round ----")
      // stage 1: gram formation only
      t("grams")(noop(graft.ops.Partitioning.spread(docs)
        .select(col("doc_id"), graft.expr.GraftFunctions.wordNGrams(col("text"), 3).as("_g"))))
      // stage 2: sigs (grams + fused minhash)
      val sigs = graft.ops.Partitioning.spread(docs)
        .select(col("doc_id").as("_id"), graft.expr.GraftFunctions.wordNGrams(col("text"), 3).as("_grams"))
        .select(col("_id"), PortableSketch.minhashSigFromGramsFast(col("_grams"), 16).as("_sig"))
        .persist()
      t("sigs materialize")(noop(sigs))
      // stage 3: banding + cappedPairs + estimate
      t("pairs (given sigs)")(noop(
        PortableSketch.minhashNearDups(docs, "text", "doc_id", k = 16, bands = 4, n = 3, threshold = 0.5)))
      sigs.unpersist()
      spark.sharedState.cacheManager.clearCache()
      // stage 4: full pairs then CC
      val pairs = PortableSketch.minhashNearDups(docs, "text", "doc_id",
        k = 16, bands = 4, n = 3, threshold = 0.5).select("idA", "idB").persist()
      t("pairs materialize")(pairs.count())
      Dedup.resetRoundSecs()
      t("dupClusters")(noop(Dedup.dupClusters(pairs)))
      println("[prof] rounds: " + Dedup.lastRoundSecs.map { case (l, s) => f"$l=$s%.2f" }.mkString(" "))
      pairs.unpersist()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
