package graft

import org.apache.spark.sql.functions._
import graft.ops.PortableSketch

/** Stage-level profiler for the q98 dedup-recall audit (test scope — run
  * with `sbt "Test/runMain graft.ProfRecall"`; not part of the shipped
  * artifact). Attributes the audit's wall time to its stages so a bench
  * flag names a stage: sample scan, gram-array materialization, exact-truth
  * inverted-index self-join, signature pass, banded candidate pipeline,
  * per-band attribution, and the scalar assembly.
  */
object ProfRecall {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.ensureRegistered(spark)
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    t("warmup full q98")(noop(
      graft.operators.PortableQueries.dedupRecall(spark, dir)))
    spark.sharedState.cacheManager.clearCache()

    for (round <- 1 to 3) {
      println(s"---- round $round ----")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .where(substring(md5(encode(concat(lit("q98"), col("text")), "UTF-8")), 1, 4) <
          graft.operators.PortableQueries.Q98SampleHex)
      val gramsArr = graft.ops.Partitioning.spread(docs)
        .select(col("doc_id"),
          graft.expr.GraftFunctions.wordNGrams(col("text"), 3).as("_grams"))
        .persist()
      t("gramsArr materialize")(gramsArr.count())
      val grams = gramsArr
        .select(col("doc_id"), explode(col("_grams")).as("_g"))
        .select(col("doc_id"), PortableSketch.h60(col("_g")).as("_h"))
        .persist()
      t("truth gram hashes materialize")(grams.count())
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("_sz"))
      val inter = grams.select(col("doc_id").as("idA"), col("_h"))
        .join(grams.select(col("doc_id").as("idB"), col("_h")), Seq("_h"))
        .where(col("idA") < col("idB"))
        .groupBy("idA", "idB").agg(count(lit(1)).as("_ns"))
      val truth = inter
        .join(broadcast(sizes.select(col("doc_id").as("idA"), col("_sz").as("_sa"))), Seq("idA"))
        .join(broadcast(sizes.select(col("doc_id").as("idB"), col("_sz").as("_sb"))), Seq("idB"))
        .where(col("_ns").cast("double") / (col("_sa") + col("_sb") - col("_ns")) >= 0.5)
        .select("idA", "idB").persist()
      t("truth: inverted-index self-join")(truth.count())
      val sigs = gramsArr
        .select(col("doc_id"),
          PortableSketch.minhashSigFromGramsFast(col("_grams"), 16).as("_sig"))
        .persist()
      t("sigs materialize")(sigs.count())
      t("caught: nearDupsFromSigs")(noop(PortableSketch.nearDupsFromSigs(
        sigs.select(col("doc_id").as("_id"), col("_sig")),
        k = 16, bands = 4, threshold = 0.5)))
      val attachA = sigs.select(col("doc_id").as("idA"), col("_sig").as("_sigA"))
        .join(broadcast(truth), Seq("idA"))
      val withSigs = sigs.select(col("doc_id").as("idB"), col("_sig").as("_sigB"))
        .join(broadcast(attachA), Seq("idB"))
      t("attribution joins")(noop(withSigs))
      t("full q98 end-to-end")(noop(
        graft.operators.PortableQueries.dedupRecall(spark, dir)))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
