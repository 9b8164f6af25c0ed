package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) deduplication — the SemDeDup recipe: cluster
  * the corpus embeddings with k-means, then look for near-duplicate pairs
  * ONLY within a cluster, pruning all but the earliest member of each
  * near-dup neighborhood. Clustering turns the quadratic all-pairs cosine
  * scan into |cluster|² work per cluster, and the cluster count grows with
  * the corpus, so per-cluster work stays bounded — the same
  * blocking-not-all-pairs posture as the LSH text families.
  *
  * Everything is deterministic so another engine can replay it exactly:
  *  - init centroids are the corpus vectors at fixed ids (every `initEvery`th
  *    vector below `initMax`) — no RNG;
  *  - assignment is argmax cosine with ties to the HIGHER centroid label
  *    (the `Similarity.ivfAssign` convention);
  *  - updated centroid coordinates are per-dimension means ROUNDED to 6 dp,
  *    so the summation-order ulps of a distributed average can never flip a
  *    later assignment (dot products over identical rounded doubles are
  *    bit-identical in any engine that sums left-to-right);
  *  - a centroid that loses all members is dropped; survivors keep their
  *    original labels.
  *
  * Scale shape: the centroid model (k × dim doubles) is the documented
  * small-model driver exception (same as the IVF codebooks —
  * NorthStarQueries q47/q89): one `collect()` of k×dim rounded means per
  * iteration, re-broadcast as literals. Assignment is a map over the corpus;
  * the update is one (label, dim)-keyed partial-sum aggregation whose output
  * is k×dim rows. The prune self-join is per-cluster and capped (see
  * `semanticPrune`), never corpus×corpus.
  */
object SemDedup {

  /** Deterministic k-means over an embedding column. Returns the final
    * labeled centroids after `iters` (assign → update) rounds. Labels are
    * the initial centroid ordinals (0-based, in `idCol` order); a label
    * vanishes if its cluster empties. */
  /** Deterministic bounded model sample — the rows at 1-based id-RANK 1,
    * every+1, 2·every+1, … among the `maxRank` smallest ids. This is the
    * no-RNG, SQL-replayable seed rule behind every coarse/kmeans/PQ model:
    * rank-based, so ANY id distribution yields the same bounded, non-empty
    * (for a non-empty input) sample. The historical
    * `id % every == 0 && id < maxRank` form assumed dense 0-based ids and
    * matched NOTHING on sparse ids (a tools/fuzz_diff.py corpus class); on
    * dense 0-based ids both rules pick identical rows, so testdata outputs
    * are unchanged. Shape: TakeOrdered(maxRank) then a ≤ maxRank-row local
    * rank — never a corpus-wide window. */
  def idRankSample(df: DataFrame, idCol: String, every: Int,
      maxRank: Int): DataFrame = {
    require(every >= 1 && maxRank >= 1,
      s"idRankSample: every=$every maxRank=$maxRank must be >= 1 " +
        "(a Long-to-Int truncation at a call site lands here loudly " +
        "instead of as a silently empty sample)")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(idCol))
    df.orderBy(col(idCol)).limit(maxRank)
      .withColumn("_rk", row_number().over(w))
      .where(((col("_rk") - 1) % every) === 0).drop("_rk")
  }

  def kmeansFit(df: DataFrame, vecCol: String, idCol: String,
      initEvery: Int, initMax: Long, iters: Int): Seq[(Int, Array[Double])] = {
    graft.expr.GraftFunctions.ensureRegistered(df.sparkSession)
    val e = df.select(col(idCol).as("_id"),
      col(vecCol).cast("array<double>").as("_v"))
    // Init: every initEvery-th vector by id-rank below rank initMax —
    // bounded centroid count at any corpus scale, no RNG, replayable in SQL.
    require(initMax >= 1 && initMax <= Int.MaxValue,
      s"kmeansFit: initMax=$initMax outside [1, Int.MaxValue] — the rank " +
        "cap bounds a driver-side collect and must be a real Int")
    val init = idRankSample(e, "_id", initEvery, initMax.toInt)
      .orderBy("_id").select("_v").collect()
      .map(_.getSeq[Double](0).toArray).zipWithIndex.map(_.swap).toSeq
    require(init.nonEmpty, s"no init centroids: empty input frame")
    var cents = init
    var i = 0
    while (i < iters) {
      val assigned = e.withColumn("_ci", assignLabeled(col("_v"), cents))
      // Per-dimension mean, rounded to 6 dp: kills distributed-sum ulps so
      // the next assignment's dot products are engine-portable.
      val updated = assigned
        .select(col("_ci"), posexplode(col("_v")).as(Seq("_pos", "_x")))
        .groupBy("_ci", "_pos").agg(round(avg("_x"), 6).as("_m"))
        .groupBy("_ci")
        .agg(sort_array(collect_list(struct(col("_pos"), col("_m")))).as("_dims"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1)).toArray))
        .sortBy(_._1).toSeq
      cents = updated
      i += 1
    }
    cents
  }

  /** Argmax-cosine assignment over a small labeled centroid model: ties go
    * to the HIGHER label (the ivfAssign convention), zero vectors score 0
    * against everything. The (sim, label) struct max IS the tie rule —
    * struct ordering is lexicographic. For k beyond codegen comfort the
    * one-array-literal fold form (Similarity.ivfAssignModel) generalizes;
    * the semantic-dedup model is intentionally small. */
  def assignLabeled(vec: Column, cents: Seq[(Int, Array[Double])]): Column = {
    val scored = cents.map { case (ci, cv) =>
      val lit = array(cv.map(x => org.apache.spark.sql.functions.lit(x)): _*)
      struct(Similarity.cosine(vec, lit).as("sim"), org.apache.spark.sql.functions.lit(ci).as("ci"))
    }
    array_max(array(scored: _*)).getField("ci")
  }

  /** Persist a fitted centroid model as parquet (label, vector) — the
    * hand-off from the nightly batch fit to the streaming admission mirror
    * ([[graft.streaming.StreamingSemDedup]]) and to later incremental
    * assignments: fit once, load cheaply anywhere. The model is k×dim
    * doubles — driver-small by design. */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[(Int, Array[Double])], path: String): Unit = {
    import spark.implicits._
    cents.map { case (ci, v) => (ci, v.toSeq) }.toDF("ci", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a model written by [[saveModel]], labels ordered. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(Int, Array[Double])] =
    spark.read.parquet(path)
      .select(col("ci"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq

  /** Assign the corpus to final centroids and prune near-duplicates within
    * each cluster: a row is pruned when an EARLIER-id cluster member among
    * the cluster's first `repCap` rows (by id) has cosine ≥ `threshold`
    * with it. The rep cap is the deterministic hot-bucket guard (same
    * pattern as Dedup.cappedPairs): a pathological mega-cluster costs
    * |cluster| × repCap comparisons, never |cluster|². Returns the per-row
    * frame (_id, _ci, _pruned). */
  def assignAndPrune(df: DataFrame, vecCol: String, idCol: String,
      cents: Seq[(Int, Array[Double])], threshold: Double,
      repCap: Int = 256): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(df.sparkSession)
    // persist: the assigned frame feeds three consumers (rep extraction, the
    // prune join's probe side, and the final flag join) — without this the
    // k cosine assignments re-run per consumer. Ownership: Verify/Bench
    // clear caches after each query's action.
    val e = Partitioning.spread(df).select(col(idCol).as("_id"),
      col(vecCol).cast("array<double>").as("_v"))
      .withColumn("_ci", assignLabeled(col("_v"), cents))
      .persist()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_ci").orderBy("_id")
    val reps = e.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= repCap)
      .select(col("_ci").as("_rci"), col("_id").as("_rid"), col("_v").as("_rv"))
    val prunedIds = e.join(reps,
        col("_rci") === col("_ci") && col("_rid") < col("_id"))
      .where(Similarity.cosine(col("_rv"), col("_v")) >= threshold)
      .select(col("_id")).distinct()
      .withColumn("_pruned", lit(true))
    e.select("_id", "_ci").join(prunedIds, Seq("_id"), "left")
      .select(col("_id"), col("_ci"),
        coalesce(col("_pruned"), lit(false)).as("_pruned"))
  }
}
