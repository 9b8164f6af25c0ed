package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the round-11 analytics ops (test scope, not shipped):
  * q128 PageRank stage attribution at sf0.1, then a 10× scale sweep for
  * q128/q129/q130 on blown-up replicas of their input tables.
  *
  * Blowup design: orders/lineitem replicate with order keys `k*10+rep` and
  * customer keys `c + rep*1e6` while SUPPLIERS stay shared — the trade
  * graph grows to ~10× edges and ~10× customer nodes hanging off the same
  * 1k supplier hubs (the realistic shape: hub degree grows, not hub
  * count). events replicate with `user_id + rep*1e6`, so q129's distinct
  * (user, day) relation grows the full 10× and q130's (type, hour) frame
  * stays CONSTANT while its scan grows 10×.
  *
  * Claims under test (each op's scale note): q128 per-iteration cost ∝
  * edges (expect ~10× plus a flat per-round floor), q129 ∝ users×days
  * (expect ~10×), q130 scan-bound (expect ≲10×). Results in BASELINE.md.
  */
object ProfGraph {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val blowup = sys.env.getOrElse("SPARK_GRAFT_SCALE_BLOWUP", "10").toInt
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

    // --- stage attribution of the PageRank loop at 1x ----------------------
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
    pair.unpersist(); en.unpersist()
    spark.sharedState.cacheManager.clearCache()

    // --- 10x sweep ----------------------------------------------------------
    val reps = explode(array((0 until blowup).map(lit): _*))
    val d1 = java.nio.file.Files.createTempDirectory("profgraph-1x").toString
    val dN = java.nio.file.Files.createTempDirectory(s"profgraph-${blowup}x").toString
    val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_suppkey", "l_partkey", "l_quantity")
    val or0 = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val ev0 = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "user_id", "event_type", "ts")
    li0.write.mode("overwrite").parquet(s"$d1/lineitem.parquet")
    or0.write.mode("overwrite").parquet(s"$d1/orders.parquet")
    ev0.write.mode("overwrite").parquet(s"$d1/events.parquet")
    // suppliers stay shared across replicas (the hub set is fixed)
    val su0 = spark.read.parquet(s"$dir/supplier.parquet").select("s_suppkey")
    su0.write.mode("overwrite").parquet(s"$d1/supplier.parquet")
    su0.write.mode("overwrite").parquet(s"$dN/supplier.parquet")
    li0.withColumn("_r", reps)
      .select((col("l_orderkey") * blowup + col("_r")).as("l_orderkey"),
        col("l_suppkey"), col("l_partkey"), col("l_quantity"))
      .write.mode("overwrite").parquet(s"$dN/lineitem.parquet")
    or0.withColumn("_r", reps)
      .select((col("o_orderkey") * blowup + col("_r")).as("o_orderkey"),
        (col("o_custkey") + col("_r") * 1000000L).as("o_custkey"),
        col("o_orderdate"))
      .write.mode("overwrite").parquet(s"$dN/orders.parquet")
    ev0.withColumn("_r", reps)
      .select((col("event_id") * blowup + col("_r")).as("event_id"),
        (col("user_id") + col("_r") * 1000000L).as("user_id"),
        col("event_type"), col("ts"))
      .write.mode("overwrite").parquet(s"$dN/events.parquet")

    val queries: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "q128_pagerank" -> (d => operators.NorthStarQueries.tradePageRank(spark, d)),
      "q129_cohort" -> (d => operators.PipelineQueries.cohortRetention(spark, d)),
      "q130_anomalies" -> (d => operators.PipelineQueries.hourlyAnomalies(spark, d)),
      // q133/q135 share q128's loop floor (expect ~flat at 10x edges);
      // q134's work is frontier-proportional and the trade graph's
      // diameter is unchanged by the blowup (expect flat)
      "q133_trustrank" -> (d => operators.NorthStarQueries.tradeTrustRank(spark, d)),
      "q134_bfs" -> (d => operators.NorthStarQueries.tradeSeedDistances(spark, d)),
      "q135_lpa" -> (d => operators.NorthStarQueries.tradeCommunities(spark, d)),
      // q136: pair rows grow ∝ customers (baskets unchanged) — expect ~10x;
      // q137: user-days grow 10x — expect ~10x, both against a flat floor
      "q136_copurchase" -> (d => operators.NorthStarQueries.coPurchasePairs(spark, d)),
      "q137_rolling" -> (d => operators.PipelineQueries.rollingActiveUsers(spark, d)),
      // q138/q139/q144/q145: the lineitem blowup replicates every order 10x
      // with fresh order keys, so ALL co-occurring part pairs reach support
      // ≥2 and the basket graph DENSIFIES (not just grows) — the stress is
      // deliberately harsher than linear: it exercises the degree-ordered
      // wedge bound (q138/q139), the shrinking-edge peel (q144), and the
      // capped Σdeg² wedge enumeration (q145) on a denser graph
      "q138_triangles" -> (d => operators.NorthStarQueries.triangleCensus(spark, d)),
      "q139_local_cc" -> (d => operators.NorthStarQueries.localClustering(spark, d)),
      "q143_assoc" -> (d => operators.NorthStarQueries.associationRules(spark, d)),
      "q144_kcore" -> (d => operators.NorthStarQueries.basketKCore(spark, d)),
      "q145_linkpred" -> (d => operators.NorthStarQueries.basketLinkPredict(spark, d)),
      // q140: one user-keyed window over 10x users (~10x); q141: sessionize
      // + per-session rollup on the same key (~10x)
      "q140_transitions" -> (d => operators.PipelineQueries.eventTransitions(spark, d)),
      "q141_paths" -> (d => operators.PipelineQueries.sessionPaths(spark, d)),
      // q147: q140's window + a ≤|types|² percentile rollup (~10x);
      // q148: the HITS loop runs on the distinct trading-pair relation —
      // pairs grow ∝ customers (supplier side fixed), expect ~10x against
      // the 8-half-round loop floor; q149: one tiny rollup (expect flat)
      "q147_dwell" -> (d => operators.PipelineQueries.transitionLatency(spark, d)),
      "q148_hits" -> (d => operators.NorthStarQueries.tradeHits(spark, d)),
      // q150: two customer-keyed aggregates (~10x customers); q151: the
      // distinct pair relation grows ∝ customers, the degree HISTOGRAM the
      // windows run on stays tiny; q153: the SPFA loop on 10x edges against
      // a flat round floor (the q134 shape with costs); q154: sessionize
      // over 10x users (~10x)
      "q150_rfm" -> (d => operators.PipelineQueries.rfmSegments(spark, d)),
      "q151_degrees" -> (d => operators.NorthStarQueries.tradeDegreeProfile(spark, d)),
      "q153_costdist" -> (d => operators.NorthStarQueries.tradeCostDistances(spark, d)),
      "q154_patterns" -> (d => operators.PipelineQueries.sessionPatternScreen(spark, d)),
      "q149_weekday" -> (d => operators.PipelineQueries.weekdaySeasonality(spark, d)),
      // q157: per-seed BFS state is (seed, node) pairs — seeds fixed (the
      // supplier side is shared by the blowup), reached nodes grow ~10x,
      // diameter unchanged — expect ~10x frontier work against the 3-round
      // floor (the q134 shape multiplied by the seed sample)
      "q157_harmonic" -> (d => operators.Round12Queries.harmonicCentrality(spark, d)),
      // q163: each round is one edges⋈sketches join + a 16-max aggregate
      // over (node, 16×int) rows — expect ~10x at 10x edges against the
      // 3-round floor; state per node is 16 ints at ANY degree
      "q163_anf" -> (d => operators.Round12Queries.anfCurve(spark, d)))
    // SPARK_GRAFT_ONLY: comma-separated name substrings (the Verify/Bench
    // convention) — sweep just the named queries when iterating
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = queries.filter { case (n, _) => only.forall(_.exists(n.contains)) }
    for (round <- 1 to 3; (name, q) <- selected; (label, d) <- Seq("1x" -> d1, s"${blowup}x" -> dN)) {
      val t0 = System.nanoTime()
      q(d).write.format("noop").mode("overwrite").save()
      println(f"[scale] r$round $name $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
