package graft.ops

import org.apache.spark.sql.functions._

/** Ad-hoc stage attribution for q158 (language-ID) — dev-only, test scope
  * (the ProfEdit discipline): splits fit vs scoring at 1x and a 10x
  * blowup so a scale regression names a stage. */
object ProfLang {
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
    val big = base
      .withColumn("_rep", explode(array((0 until blowup).map(lit): _*)))
      .withColumn("doc_id", col("doc_id") * blowup + col("_rep"))
      .withColumn("text", concat(lit("r"), col("_rep"), lit(" "), col("text")))
      .drop("_rep")
    val dN = java.nio.file.Files.createTempDirectory("proflang").toString
    big.write.mode("overwrite").parquet(s"$dN/documents.parquet")
    for (round <- 1 to 2; (label, d) <- Seq("1x" -> dir, "10x" -> dN)) {
      println(s"---- round $round $label ----")
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val isTrain =
        substring(md5(encode(concat(lit("q158"), col("text")), "UTF-8")), 1, 1) < "8"
      val train = docs.where(isTrain)
      val test = docs.where(!isTrain)
      var model: org.apache.spark.sql.DataFrame = null
      var stats: org.apache.spark.sql.DataFrame = null
      t("fit") { val r = LangId.fit(train, "text", "lang", 3); model = r._1; stats = r._2 }
      t("model materialize") { model.count() }
      t("predict") { noop(LangId.predict(test, "text", "doc_id", 3, model, stats)) }
      t("docGramCounts only") { noop(LangId.docGramCounts(test, "text", "doc_id", 3)) }
      t("full q158") { noop(graft.operators.Round12Queries.languageId(spark, d)) }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
