package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.ContractQueries._
    val targets: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "q01 scan+projection" -> q01(spark, dir),
      "q02 filter pushdown" -> q02(spark, dir),
      "q05 broadcast join" -> q05(spark, dir),
      "q08 multiway join" -> q08(spark, dir),
      "q16 topk" -> q16(spark, dir),
      "link pipeline" -> {
        val spans = graft.pipeline.LinkJob.readJsonV2(spark,
          "/root/repo/src/test/resources/fixtures/spans_day.jsonl")
        graft.pipeline.LinkJob.linkSpans(spans, "2025-08-11",
          graft.pipeline.Admission.PerSpanWindow).toDF()
      }
    )
    targets.foreach { case (name, df) =>
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
