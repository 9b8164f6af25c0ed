package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line per run (driver contract).
  *
  * Each query executes through `format("noop")` so the FULL physical plan
  * runs (count() would let Catalyst drop sorts/projections and under-measure).
  * A warmup pass of the flagship query absorbs JVM/classloader costs; each
  * query is then timed once, cold caches, in name order.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.ensureRegistered(spark)

    def exec(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: the flagship query plus one representative of each heavy
    // kernel family (LSH text sketching, embedding similarity) — absorbs
    // JVM/classloader/JIT and filesystem metadata so the measurements
    // reflect the warm engine rather than first-touch compilation of the
    // fused kernels (~+2-4s on whichever query runs one first)
    exec("warmup", (s, d) => SparkEntry.entry(s))
    exec("warmup", (s, d) => SparkEntry.entry(s))
    exec("warmup-lsh", (s, d) => graft.operators.NorthStarQueries.ngramNearDups(s, d))
    exec("warmup-emb", (s, d) => graft.operators.NorthStarQueries.embeddingTopK(s, d))
    exec("warmup-udaf", (s, d) => graft.operators.PipelineQueries.sourceOverlap(s, d))
    spark.sharedState.cacheManager.clearCache()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = math.round(exec(name, fn) * 1000.0) / 1000.0
      // release per-query persisted intermediates (LSH signatures, candidate
      // sets) so no cached blocks leak into the next measurement
      spark.sharedState.cacheManager.clearCache()
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = math.round(results.map(_._2).filter(_ >= 0).sum * 1000.0) / 1000.0
    println(s"""{"metric":"total_wall_sec","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
