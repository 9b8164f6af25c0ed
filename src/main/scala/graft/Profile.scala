package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Measurement tool (round-16 optimization, guide §1): run selected queries
  * through the noop sink with a stage-level listener and print, per query,
  * the top stages by wall time with task counts, shuffle bytes, and the
  * job/stage totals — the empirical "where does the time go" loop without
  * the (disabled) Spark UI.
  *
  *   SPARK_GRAFT_ONLY=q128 sbt "runMain graft.Profile <sfDir> [runs]"
  *
  * Same session shape as Bench (local[$SPARK_GRAFT_CPUS], AQE on, 64 MB
  * broadcast threshold) so stage shapes match the graded capture.
  */
object Profile {
  private case class StageRow(id: Int, name: String, tasks: Int,
    wallMs: Long, taskMs: Long, shufReadB: Long, shufWriteB: Long,
    inputB: Long, gcMs: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.ensureRegistered(spark)

    val stages = new java.util.concurrent.ConcurrentHashMap[Int, StageRow]()
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(0L)
        stages.put(si.stageId, StageRow(si.stageId,
          si.name.take(60), si.numTasks, wall, m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.bytesRead, m.jvmGCTime))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def exec(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup mirrors Bench
    exec((s, _) => SparkEntry.entry(s))
    exec((s, d) => graft.operators.NorthStarQueries.ngramNearDups(s, d))
    spark.sharedState.cacheManager.clearCache()

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        Verify.onlyFilter.forall(_.exists(name.contains)) }
    selected.foreach { case (name, fn) =>
      // discard run (codegen/JIT), then measured run(s) with a clean listener
      exec(fn)
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      (1 to runs).foreach { r =>
        stages.clear(); jobs = 0
        val sec = exec(fn)
        // listener events are async — give the bus a moment to drain
        Thread.sleep(600)
        val rows = stages.values().toArray(Array.empty[StageRow])
          .sortBy(-_.wallMs)
        val totalWall = rows.map(_.wallMs).sum
        println(f"== $name run$r: $sec%.3f s, $jobs jobs, ${rows.length} stages, " +
          f"sum(stage wall) ${totalWall / 1000.0}%.3f s ==")
        rows.take(14).foreach { s =>
          println(f"  stage ${s.id}%4d ${s.wallMs}%6d ms wall ${s.taskMs}%7d ms task " +
            f"${s.tasks}%4d tasks gc ${s.gcMs}%5d in ${s.inputB / 1024}%7d K " +
            f"sr ${s.shufReadB / 1024}%6d K sw ${s.shufWriteB / 1024}%6d K  ${s.name}")
        }
        spark.sharedState.cacheManager.clearCache()
        System.gc()
      }
    }
    spark.stop()
  }
}
