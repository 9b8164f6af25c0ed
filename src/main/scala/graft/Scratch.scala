package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/profiling main (not part of the driver contract).
  *
  * Usage: `runMain graft.Scratch [queryName ...]` — times each named
  * SparkEntry query for 3 rounds in ONE JVM (the only honest way to A/B a
  * perf claim here; cross-JVM runs confound with first-touch noise).
  * Defaults to q81_source_drift when no names are given.
  */
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

    // `--plan q…` prints formatted physical plans instead of timing
    val plan = args.headOption.contains("--plan")
    val names = (if (plan) args.drop(1).toSeq else args.toSeq) match {
      case Seq() => Seq("q81_source_drift"); case s => s
    }
    def queryOf(name: String) = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name' — keys: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    if (plan) names.foreach { name =>
      println(s"==== $name ====")
      println(queryOf(name)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
    } else {
      time("warmup entry")(noop(SparkEntry.entry(spark)))
      for (round <- 1 to 3; name <- names) {
        time(s"$name r$round")(noop(queryOf(name)(spark, dir)))
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
