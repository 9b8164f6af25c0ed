package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Skew stress for the selection family (test scope — run with
  * `sbt "Test/runMain graft.ProfSkew"`; not part of the shipped artifact).
  *
  * Plants the power-law crawl shape — ONE source holding ~90% of a corpus
  * blown up to ~600k rows — and times each per-source selection operator
  * against the same corpus with a uniform source column. Operators whose
  * cost is per-row hash arithmetic (mixture sample, stratified keep, hash
  * splits) should be skew-indifferent by construction; the per-key quota is
  * the one with a real hazard, so it runs in both forms: the window
  * (`quotaPerKey`, the hot key sorts in one task) and the bottom-k
  * threshold aggregation (`quotaPerKeyAgg`, the hot key pre-reduces
  * map-side). Results are recorded in BASELINE.md.
  */
object ProfSkew {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val blowup = sys.env.getOrElse("SPARK_GRAFT_SKEW_BLOWUP", "120").toInt
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.GraftFunctions.ensureRegistered(spark)

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[skew] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // blow the 5k-doc corpus up to ~600k rows with unique ids; keep text
    // short-ish columns only (the per-source ops don't read text width)
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "lang", "n_chars")
    val exploded = base
      .withColumn("_rep", explode(array((0 until blowup).map(lit): _*)))
      .withColumn("doc_id", col("doc_id") * blowup + col("_rep"))
      .drop("_rep")
    // uniform: the original ~20 sources, round-robin by id
    val uniform = exploded
      .withColumn("source", concat(lit("src_"), pmod(col("doc_id"), lit(20))))
      .persist()
    // hot: 90% of rows behind one source, the rest round-robin
    val hot = exploded
      .withColumn("source",
        when(pmod(col("doc_id"), lit(10)) < 9, lit("hot_source"))
          .otherwise(concat(lit("src_"), pmod(col("doc_id"), lit(20)))))
      .persist()
    t("materialize uniform")(uniform.count())
    t("materialize hot")(hot.count())

    val weights = (0 until 20).map(i => s"src_$i" -> 0.04) :+ ("hot_source" -> 0.2)
    for (round <- 1 to 3) {
      println(s"---- round $round (rows=${blowup * 5000}) ----")
      for ((label, df) <- Seq("uniform" -> uniform, "hot" -> hot)) {
        t(s"$label quota window")(noop(
          Sampling.quotaPerKey(df, "source", "doc_id", quota = 2000)))
        t(s"$label quota bottom-k agg")(noop(
          Sampling.quotaPerKeyAgg(df, "source", "doc_id", quota = 2000)))
        t(s"$label hash-split")(noop(df.withColumn("split",
          Sampling.hashSplit(col("doc_id").cast("string"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))))
        t(s"$label stratified keep")(noop(df.where(
          Sampling.stratifiedKeep(col("source"), col("doc_id").cast("string"),
            weights.map { case (s, _) => s -> 0.5 }))))
        t(s"$label per-source agg (mix weights shape)")(noop(
          df.groupBy("source").agg(count(lit(1)).as("n"),
            sum("n_chars").as("chars"))))
      }
    }
    spark.stop()
  }
}
