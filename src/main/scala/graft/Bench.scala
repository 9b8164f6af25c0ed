package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — prints one JSON line (driver contract) AND writes the
  * same metrics object to a machine-readable artifact file, so per-query
  * numbers survive even when stdout is buried in sbt log noise.
  *
  * Methodology (round-5 bench hygiene):
  *  - Each query executes through `format("noop")` so the FULL physical plan
  *    runs (count() would let Catalyst drop sorts/projections and
  *    under-measure).
  *  - A warmup pass absorbs JVM/classloader/JIT costs per kernel family.
  *  - Each query then runs 1 + SPARK_GRAFT_BENCH_RUNS times (default 1+3)
  *    in this one JVM: the FIRST run is a DISCARD (it carries first-touch
  *    costs — plan-specific codegen compilation, JIT of the generated
  *    classes, file-metadata cache; the r5 artifact showed run-1 outliers
  *    like 13.7 s for a 0.17 s query) and the per-query MEDIAN is taken
  *    over the remaining runs. All raw samples, discard included, are
  *    recorded in raw_runs for audit. Single runs on this box drift
  *    ±1–2 s run-to-run (BASELINE.md documents 35–92 s session spread for
  *    the same suite), so warm medians are the only defensible per-query
  *    number; cross-session single-run comparisons are noise.
  *  - The cache manager is cleared between runs so persisted intermediates
  *    (LSH signatures, candidate sets) never leak into the next measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH.json")
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
    // kernel family (LSH text sketching, embedding similarity, UDAF) —
    // absorbs JVM/classloader/JIT and filesystem metadata so measurements
    // reflect the warm engine rather than first-touch compilation of the
    // fused kernels (~+2-4s on whichever query runs one first)
    exec("warmup", (s, _) => SparkEntry.entry(s))
    exec("warmup", (s, _) => SparkEntry.entry(s))
    exec("warmup-lsh", (s, d) => graft.operators.NorthStarQueries.ngramNearDups(s, d))
    exec("warmup-emb", (s, d) => graft.operators.NorthStarQueries.embeddingTopK(s, d))
    exec("warmup-udaf", (s, d) => graft.operators.PipelineQueries.sourceOverlap(s, d))
    spark.sharedState.cacheManager.clearCache()

    def round3(v: Double): Double = math.round(v * 1000.0) / 1000.0

    // 1 discard + runs measured samples per query, in name order; cache
    // cleared after every run so no query's persisted blocks subsidize its
    // later samples
    val samples: Seq[(String, Seq[Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val ts = (0 to runs).map { _ =>
          val sec = exec(name, fn)
          spark.sharedState.cacheManager.clearCache()
          round3(sec)
        }
        name -> ts
      }

    def median(ts: Seq[Double]): Double = {
      val ok = ts.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0
      else if (ok.size % 2 == 1) ok(ok.size / 2)
      else round3((ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2.0)
    }

    val medians = samples.map { case (name, ts) => name -> median(ts.tail) }
    val qs = medians.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val raw = samples.map { case (k, ts) => "\"" + k + "\":" + ts.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = round3(medians.map(_._2).filter(_ >= 0).sum)
    val json =
      s"""{"metric":"total_wall_sec","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs_per_query":$runs,"aggregation":"median_after_discarding_run1","raw_runs":$raw}"""
    // the artifact file is the number of record — stdout scraping loses the
    // line in sbt noise (r3/r4 artifacts both parsed as null)
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: ${e.getMessage}") }
    println(json)
    spark.stop()
  }
}
