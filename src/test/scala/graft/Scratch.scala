package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Ad-hoc dev main (not part of the driver contract). Three modes:
  *
  *  - `Test/runMain graft.Scratch q…`            — time each named SparkEntry
  *    query for 3 rounds in ONE JVM (the only honest way to A/B a perf
  *    claim here; cross-JVM runs confound with first-touch noise).
  *  - `Test/runMain graft.Scratch --plan q…`     — print formatted physical plans.
  *  - `Test/runMain graft.Scratch --verify <sfDir> <outDir> q…` — filtered
  *    Verify: dump just the named queries + their oracle SQL for
  *    tools/oracle_check.py, for fast per-query oracle iteration.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val verify = args.headOption.contains("--verify")
    val spark = SparkSession.builder()
      .master(if (verify) "local[8]" else "local[32]")
      .config("spark.sql.shuffle.partitions", if (verify) "8" else "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.ensureRegistered(spark)

    def queryOf(name: String) = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name' — keys: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))

    if (verify) {
      val sfDir = args(1); val outDir = args(2); val names = args.drop(3).toSet
      new java.io.File(outDir).mkdirs()
      SparkEntry.queries.filter(kv => names.contains(kv._1)).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          println(f"[scratch] $name ok ${(System.nanoTime() - t0) / 1e9}%.2f s")
        } catch { case e: Throwable =>
          System.err.println(s"[scratch] $name FAILED: ${e.getMessage}"); e.printStackTrace()
        }
        spark.sharedState.cacheManager.clearCache()
      }
      def q(s: String): String = "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case '\r' => "\\r"; case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
      val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
      spark.stop(); return
    }

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
        f"(persistentRDDs=${spark.sparkContext.getPersistentRDDs.size})")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val plan = args.headOption.contains("--plan")
    val names = (if (plan) args.drop(1).toSeq else args.toSeq) match {
      case Seq() => Seq("q81_source_drift"); case s => s
    }
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
