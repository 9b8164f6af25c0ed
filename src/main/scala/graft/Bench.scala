package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — writes the full metrics object to `BENCH.json` (the
  * artifact of record) and prints a COMPACT one-line JSON as the very last
  * stdout line for the driver's stdout scrape.
  *
  * Why two shapes: the driver keeps only a ~2000-char tail of stdout, and
  * the full object (75 queries × raw-run arrays) is several times that, so
  * the line's opening brace fell outside the tail every round and parsed as
  * null (r1–r6). The compact line carries per-query medians under short
  * `qNN` keys (~1.1 KB), printed after `spark.stop()` so nothing can
  * interleave; the full per-run detail lives in the artifact file.
  *
  * Methodology (round-5 bench hygiene + round-7 GC attribution):
  *  - Each query executes through `format("noop")` so the FULL physical plan
  *    runs (count() would let Catalyst drop sorts/projections and
  *    under-measure).
  *  - A warmup pass absorbs JVM/classloader/JIT costs per kernel family.
  *  - Each query then runs 1 + SPARK_GRAFT_BENCH_RUNS times (default 1+3)
  *    in this one JVM: the FIRST run is a DISCARD (it carries first-touch
  *    costs — plan-specific codegen compilation, JIT of the generated
  *    classes, file-metadata cache) and the per-query MEDIAN is taken over
  *    the remaining runs. All raw samples, discard included, are recorded
  *    in raw_runs for audit.
  *  - raw_gc_ms records the JVM GC time that elapsed DURING each run
  *    (collector-bean deltas), so a storage-pressure outlier — like r6's
  *    q48 3.3–17.5 s spread from accumulated checkpoint blocks — is
  *    attributable from the artifact alone.
  *  - The cache manager is cleared and a System.gc() is forced between
  *    runs: persisted intermediates never subsidize the next measurement,
  *    and dropped checkpoint/broadcast references are actually cleaned by
  *    ContextCleaner between samples instead of mid-measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH.json")
    // SPARK_GRAFT_SHUFFLE_PARTITIONS decouples shuffle width from thread
    // count for scale drills: local[32] pins cpus, but at sf1.0+ the
    // honest cluster analogue scales partitions ∝ data (a real deployment
    // sizes spark.sql.shuffle.partitions to the stage volume, not the
    // box) — the q143 drill measures exactly that knob.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      // Driver-housekeeping caps (round-16 optimization, guide §5: the
      // driver should do almost no data work). The UI is disabled, but the
      // status stores still retain 1000 SQL executions' full plan graphs +
      // per-node metrics and up to 100k task wrappers — across a many-query
      // run that live set grows until GC dominates: measured on q156 alone
      // (1 JVM, 7 runs, 8 g heap) wall 7.5→13.9 s RISING with GC 0.4→4.0 s
      // under the defaults, vs a flat 3.7–4.4 s with GC ~0.1 s capped.
      // Scale-neutral: these stores serve only the (disabled) UI/REST.
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.ensureRegistered(spark)

    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
    }

    // returns (wall seconds, gc ms observed during the run); -1 on failure
    def exec(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Long) = {
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return (-1.0, -1L)
      }
      ((System.nanoTime() - t0) / 1e9, gcMillis() - gc0)
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
    // cleared and a GC forced after every run so neither persisted blocks
    // nor deferred ContextCleaner work leaks into the next sample.
    // Queries that run the iterative CC kernel also surface per-round wall
    // times (drained from Dedup.lastRoundSecs after every run) so a slow
    // sample in the artifact names the round that stalled.
    val roundSecs = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    // Loud subset guard (mirrors Verify): a leaked filter must not let a
    // partial capture pass for a full one — warn on stderr and stamp the
    // filter into the artifact (`"subset_filter"` key below).
    val onlyFilter = sys.env.get("SPARK_GRAFT_ONLY")
    onlyFilter.foreach { f =>
      System.err.println(s"[bench] WARNING: SPARK_GRAFT_ONLY=$f — SUBSET run, " +
        "totals are NOT comparable to full captures")
    }
    val samples: Seq[(String, Seq[(Double, Long)])] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) =>
          // local-iteration filter (unset on the driver), as in Verify
          sys.env.get("SPARK_GRAFT_ONLY")
            .forall(_.split(",").exists(name.contains)) }
        .map { case (name, fn) =>
        val ts = (0 to runs).map { _ =>
          graft.ops.Dedup.resetRoundSecs()
          val (sec, gcMs) = exec(name, fn)
          val rounds = graft.ops.Dedup.lastRoundSecs
          if (rounds.nonEmpty) {
            val obj = rounds.map { case (l, s) => "\"" + l + "\":" + round3(s) }
              .mkString("{", ",", "}")
            roundSecs(name) = roundSecs.getOrElse(name, Vector.empty) :+ obj
          }
          spark.sharedState.cacheManager.clearCache()
          System.gc()
          (round3(sec), gcMs)
        }
        name -> ts
      }

    def median(ts: Seq[Double]): Double = {
      val ok = ts.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0
      else if (ok.size % 2 == 1) ok(ok.size / 2)
      else round3((ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2.0)
    }

    val medians = samples.map { case (name, ts) => name -> median(ts.tail.map(_._1)) }
    val qs = medians.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val raw = samples.map { case (k, ts) => "\"" + k + "\":" + ts.map(_._1).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val rawGc = samples.map { case (k, ts) => "\"" + k + "\":" + ts.map(_._2).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = round3(medians.map(_._2).filter(_ >= 0).sum)
    // anchored: "sf1." or a dir without an sf prefix must not fabricate an
    // invalid/zero JSON number — fall back to the quoted dir name instead
    // (escaped: a quote/backslash/control char in the path must not emit
    // invalid JSON)
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sfNum = """sf([0-9]+(?:\.[0-9]+)?)""".r.findFirstMatchIn(sfDir).map(_.group(1))
      .getOrElse(jstr(sfDir))
    val rawRounds = roundSecs.map { case (k, objs) =>
      "\"" + k + "\":" + objs.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val subset = onlyFilter.map(f => s""","subset_filter":${jstr(f)}""").getOrElse("")
    val detail =
      s"""{"metric":"total_wall_sec","value":$total,"unit":"sec","queries":$qs,"sf":$sfNum,"sf_dir":${jstr(sfDir)},"runs_per_query":$runs,"aggregation":"median_after_discarding_run1","raw_runs":$raw,"raw_gc_ms":$rawGc,"raw_cc_round_secs":$rawRounds$subset}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (detail + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: ${e.getMessage}") }
    spark.stop()
    // the compact scrape line is the ONLY stdout line: short qNN keys keep
    // it ~1.1 KB so the whole object sits inside the driver's ~2000-char
    // stdout tail, and not printing the multi-KB detail line avoids the
    // fork-output flush race that truncated it mid-line in testing (the
    // full per-run detail is already in the artifact file)
    val shortQs = medians.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + v }
      .mkString("{", ",", "}")
    val subsetFlag = if (onlyFilter.isDefined) ""","subset":true""" else ""
    println(
      s"""{"metric":"total_wall_sec","value":$total,"unit":"sec","queries":$shortQs,"sf":$sfNum,"runs_per_query":$runs,"detail":"$outPath"$subsetFlag}""")
  }
}
