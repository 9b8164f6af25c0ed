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
}
