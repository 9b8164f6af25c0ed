package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the q128 PageRank loop (test scope, not shipped):
  * times each stage of Graph.pageRank separately to attribute the
  * per-iteration cost. */
object ProfGraph {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.ContractQueries.table

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val li = table(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val ord = table(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val pair = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).as("w")).persist()
    t("pair materialize") { pair.count() }
    val edges = pair.select(expr("c * 2").as("src"), expr("s * 2 + 1").as("dst"), col("w"))
      .unionByName(pair.select(expr("s * 2 + 1").as("src"), expr("c * 2").as("dst"), col("w")))

    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
    val deg = e.groupBy("src").agg(sum("w").as("wsum"))
    val en = e.join(deg, "src").select("src", "dst", "w", "wsum")
      .repartition(col("src")).persist()
    t("en materialize") { en.count() }
    val n = t("node count") { en.select("src").distinct().count() }
    println(s"  nodes=$n edges=${en.count()}")
    val base = 1000000000L / n
    val hold = 15L * base / 100L
    var ranks = t("rank init") {
      en.select(col("src").as("node")).distinct()
        .withColumn("rank_u", lit(base)).localCheckpoint()
    }
    for (i <- 1 to 10) {
      ranks = t(s"iter $i") {
        graft.ops.Graph.step(en, ranks, 85, hold).localCheckpoint()
      }
    }
    spark.stop()
  }
}
