package graft

import org.apache.spark.sql.SparkSession

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
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
        f"(persistentRDDs=${spark.sparkContext.getPersistentRDDs.size})")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.ops.TextOps
    import graft.operators.ContractQueries.table
    import org.apache.spark.sql.functions._
    time("warmup entry")(noop(SparkEntry.entry(spark)))
    val docs = table(spark, dir, "documents")
    val probes = docs.where(pmod(col("doc_id"), lit(100)) === 0)
    for (round <- 1 to 3) {
      time(s"q81 r$round")(noop(graft.operators.PipelineQueries.sourceDrift(spark, dir)))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
