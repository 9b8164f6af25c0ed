package graft

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc plan/profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.ensureRegistered(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val spreadDocs = graft.ops.Partitioning.spread(docs)
    time("warmup")(noop(spreadDocs))
    // warm the kernel paths first so probes measure steady state, not JIT
    time("warmup-lsh")(noop(Dedup.minhashNearDups(docs, "text", "doc_id",
      k = 64, bands = 16, shingle = 3, threshold = 0.35, wordGrams = true)))
    spark.sharedState.cacheManager.clearCache()

    for (round <- 1 to 2) {
      time(s"q24 full r$round")(noop(graft.operators.NorthStarQueries.ngramNearDups(spark, dir)))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
