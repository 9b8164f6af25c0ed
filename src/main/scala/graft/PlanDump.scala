package graft

import java.nio.file.{Files, Paths}

/** Measurement tool (round-16 optimization): dump `.explain("formatted")`
  * for selected queries so plan claims are auditable without running Spark.
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix>"
  *
  * Query selection mirrors Verify/Bench: SPARK_GRAFT_ONLY comma-separated
  * name substrings (unset = every declared query). Each plan lands at
  * `<outDir>/<name>_<suffix>.txt`. Plans only — nothing is executed, so
  * this is safe to run alongside other work.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix) = args
    val spark = Verify.session()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        Verify.onlyFilter.forall(_.exists(name.contains)) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
        spark.sharedState.cacheManager.clearCache()
      }
    spark.stop()
  }
}
