package graft

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("warmup scan")(noop(docs))
    time("scan again")(noop(docs))
    time("shingles only")(noop(docs.select(TextOps.charShingles(col("text"), 5).as("s"))))
    time("shingle hashes")(noop(docs.select(
      array_distinct(transform(TextOps.charShingles(col("text"), 5), s => xxhash64(s))).as("h"))))
    time("minhash sig")(noop(docs.select(Dedup.minhash(col("text")).as("sig"))))
    time("minhash sig 2nd")(noop(docs.select(Dedup.minhash(col("text")).as("sig"))))
    time("full q25")(noop(Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5)))
    time("full q25 again")(noop(Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5)))
    time("simhash sig")(noop(docs.select(Dedup.simhash(col("text")).as("sh"))))
    time("partitions")(println("docs partitions: " + docs.rdd.getNumPartitions))

    time("q24 candidates only") {
      val c = Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.0)
        .select("idA", "idB").persist()
      println("candidates: " + c.count())
    }
    time("q24 full") {
      noop(graft.operators.NorthStarQueries.ngramNearDups(spark, dir))
    }
    time("q24 full again") {
      noop(graft.operators.NorthStarQueries.ngramNearDups(spark, dir))
    }
    spark.stop()
  }
}
