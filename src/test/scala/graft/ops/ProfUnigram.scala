package graft.ops

import org.apache.spark.sql.functions._

/** Ad-hoc stage attribution for q159 (unigram-LM induction) — dev-only,
  * test scope (the ProfEdit discipline): times the round-0 candidate
  * inventory (the collect that used to be unbounded) against the EM
  * rounds and the full query, at 1x and a 10x blowup. The blowup plants
  * OVERLONG words (40-char compounds well past MaxWordLen) so the sweep
  * exercises the char-wise fallback path, not just the DP.
  */
object ProfUnigram {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val blowup = 10
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val base = spark.read.parquet(s"$dir/documents.parquet")
    // 10x rows; every 7th replica drags a 40-char compound word into the
    // vocabulary so the fallback path carries real weight in the sweep
    val big = base
      .withColumn("_rep", explode(array((0 until blowup).map(lit): _*)))
      .withColumn("doc_id", col("doc_id") * blowup + col("_rep"))
      .withColumn("text",
        when(col("_rep") % 7 === 0,
          concat(col("text"), lit(" "), lit("overlongcompound"),
            col("_rep").cast("string"), lit("wordpaddingpad")))
          .otherwise(concat(lit("r"), col("_rep"), lit(" "), col("text"))))
      .drop("_rep")
    val dN = java.nio.file.Files.createTempDirectory("profunigram").toString
    big.write.mode("overwrite").parquet(s"$dN/documents.parquet")
    for (round <- 1 to 2; (label, d) <- Seq("1x" -> dir, "10x" -> dN)) {
      println(s"---- round $round $label ----")
      val tf = spark.read.parquet(s"$d/documents.parquet")
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      t("vocab materialize") { tf.count() }
      t("fit (round-0 prune + EM + final seg)") {
        val (_, seg) = UnigramLM.fit(tf); noop(seg)
      }
      t("full q159") {
        noop(graft.operators.Round12Queries.unigramTokenizer(spark, d))
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
