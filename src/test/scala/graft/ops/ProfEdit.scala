package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage attribution for q142 (edit linkage) — dev-only, test scope
  * (the ProfGraph discipline). This profiler caught the round-11 AQE
  * coalescing hazard: the pair-dedup shuffle is only a few MB, so AQE
  * collapsed the downstream bounded-levenshtein verify to ONE task (a 22 s
  * single-task stage inside a 24 s query at sf0.1); the fix is the explicit
  * user repartition in Dedup.editNearDups, which AQE must respect. Keeps
  * the listener so a regression shows up as a long 1-task stage here. */
object ProfEdit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.ensureRegistered(spark)
    import graft.operators.ContractQueries.table

    val stages = new scala.collection.mutable.ArrayBuffer[(Int, Long, Int)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for { a <- i.completionTime; b <- i.submissionTime } yield a - b)
          .getOrElse(-1L)
        stages += ((i.stageId, ms, i.numTasks))
      }
    })
    val t0 = System.nanoTime()
    val n = Dedup.editNearDups(table(spark, dir, "documents"), "text", "doc_id")
      .count()
    println(f"  editNearDups rows=$n total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(2000)
    stages.sortBy(-_._2).take(8).foreach { case (id, ms, nt) =>
      println(f"  stage $id%4d $ms%7d ms tasks=$nt%3d" +
        (if (nt == 1 && ms > 3000) "  <-- serialized verify? see scaladoc" else ""))
    }
    spark.stop()
  }
}
