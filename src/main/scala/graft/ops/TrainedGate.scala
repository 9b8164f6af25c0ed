package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-TRAINED quality gate: distributed logistic regression by
  * deterministic full-batch gradient descent, expressed as plain Spark
  * aggregations — the trainable upgrade of the fixed-weight hashed gate
  * (Scrub.tokenWeight / q95), and the shape modern curation stacks use
  * (fastText/DCLM-style quality classifiers) reduced to its Spark-native
  * core.
  *
  * Why not MLlib: `ml.classification.LogisticRegression` (LBFGS) is
  * float-sum order-dependent, so coefficients drift in the last ulps
  * across partitionings and engines — unverifiable by a cross-engine
  * oracle. This trainer makes the whole trajectory REPLAYABLE: each
  * iteration is one aggregation computing the per-dimension gradient mean
  * `avg((y − σ(w·x)) · x_k)` ROUNDED to 6 dp (the [[SemDedup]] precedent:
  * rounding kills distributed-sum and libm-exp ulp wobble, which sits at
  * ~1e-14 against a 5e-7 rounding margin), and the weight update
  * `w += lr · grad` runs in exact driver-side double arithmetic from those
  * rounded values. Identical features ⇒ bit-identical weights on any
  * engine, any partitioning — a DuckDB oracle replays training by
  * unrolling the same iterations as SQL.
  *
  * Scale shape: the model state is |dims| doubles on the driver (the
  * bounded-model exception, same as the IVF codebooks); each iteration is
  * one partial-aggregated pass over a persisted narrow feature frame — no
  * shuffle of the corpus, gradient traffic is |partitions| × |dims|
  * partial sums. At 100 TB you fit on a deterministic content-hash sample
  * (the [[Sampling.sampledBy]] mechanism) and SCORE the full corpus with
  * the closed-form projection, which is embarrassingly parallel.
  *
  * Decisions gate on the exp-free margin `w·x ≥ 0` (⇔ σ ≥ ½): with w and
  * x bit-identical and the dot product evaluated left-to-right in both
  * engines, the boundary is deterministic — no libm in the decision path.
  */
object TrainedGate {

  /** Fit logistic weights over `xCols` (label `yCol` ∈ {0.0, 1.0}) by
    * `iters` full-batch GD steps at learning rate `lr`, from w = 0.
    * Returns the learned weights. An empty frame returns the zero vector
    * (no data moves no weights). */
  def fitLogistic(feats: DataFrame, xCols: Seq[String], yCol: String,
      lr: Double, iters: Int): Seq[Double] = {
    require(xCols.nonEmpty && iters >= 0 && lr > 0.0)
    val cached = feats.select((yCol +: xCols).map(col): _*).persist()
    try {
      var w = Seq.fill(xCols.size)(0.0)
      for (_ <- 1 to iters) {
        val err = col(yCol) - sigmoid(margin(w, xCols.map(col)))
        val aggs = xCols.map(c => round(avg(err * col(c)), 6))
        val row = cached.agg(aggs.head, aggs.tail: _*).head()
        if (!row.isNullAt(0)) // empty input: avg is null, keep w
          w = w.indices.map(i => w(i) + lr * row.getDouble(i))
      }
      w
    } finally { cached.unpersist() }
  }

  /** The linear margin w·x as a left-to-right sum — the exact association
    * order the SQL oracle writes, so the doubles are bit-identical. */
  def margin(w: Seq[Double], xs: Seq[Column]): Column =
    w.zip(xs).map { case (wi, x) => lit(wi) * x }.reduceLeft(_ + _)

  def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Gate a frame on the trained margin: annotate with `w·x` and keep
    * margin ≥ 0 rows. A stateless projection — static and STREAMING frames
    * both work (the ingest-time mirror: fit in batch, [[saveModel]], score
    * every arriving micro-batch against the loaded weights with no state
    * store, the same shape as the fixed-weight streaming gate). */
  def gate(docs: DataFrame, w: Seq[Double], xCols: Seq[String]): DataFrame =
    docs.withColumn("margin", margin(w, xCols.map(col)))
      .where(col("margin") >= 0)

  /** Persist trained weights as (idx, feature, weight) parquet — the
    * batch-fit → streaming-score hand-off (the [[SemDedup.saveModel]]
    * pattern: a model is a tiny bounded frame, not JVM state). */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
      w: Seq[Double], xCols: Seq[String], path: String): Unit = {
    require(w.size == xCols.size)
    import spark.implicits._
    w.zip(xCols).zipWithIndex.map { case ((wi, c), i) => (i, c, wi) }
      .toDF("idx", "feature", "weight")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a model written by [[saveModel]]: (featureCols, weights) in the
    * stored margin-evaluation order. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      path: String): (Seq[String], Seq[Double]) = {
    val rows = spark.read.parquet(path)
      .select(col("idx"), col("feature"), col("weight"))
      .collect().sortBy(_.getInt(0))
    (rows.map(_.getString(1)).toSeq, rows.map(_.getDouble(2)).toSeq)
  }
}
