package graft.streaming

import graft.ops.{PortableSketch, TextOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming importance scoring — the ingest-time counterpart of the batch
  * q113 DSIR selection: fit the hashed-unigram log-ratio model ONCE from a
  * static corpus, then score documents AS they arrive.
  *
  * The model is 128 doubles (one smoothed log importance ratio per hash
  * bucket — the documented bounded-model driver-collect exception, like the
  * IVF centroids), embedded in the plan as an array literal. Scoring is a
  * per-row higher-order fold over the token array — no explode, no shuffle,
  * no state store — so it composes in append mode in front of
  * StreamingCuration / StreamingDedup like the other stateless stages.
  * Arithmetic parity with q113: same h60-mod-128 bucketing, same add-one
  * smoothing, StrictMath.log (Spark's Log expression evaluates via
  * StrictMath) and HALF_UP rounding at 9 dp, so a fit on the same corpus
  * reproduces the batch ratio table bit-for-bit; never-seen buckets take
  * their natural smoothed default ln((tr+B)/(tt+B)), which the batch query
  * never evaluates (it scores only fit-corpus tokens) but a stream needs
  * for out-of-fit-vocabulary arrivals.
  */
object StreamingImportance {

  /** Bucket count — must match SelectionQueries' q113 constant. */
  val Buckets = 128

  private def rnd(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Fit the full B-length ratio table from a static corpus: one tokenize
    * pass, a 128-row bounded aggregate, one driver collect. */
  def fitModel(docs: DataFrame, textCol: String, isTarget: Column): Array[Double] = {
    val counts = docs
      .select(isTarget.cast("long").as("t"),
        explode(TextOps.tokens(col(textCol))).as("w"))
      .select((PortableSketch.h60(col("w")) % Buckets).as("b"), col("t"))
      .groupBy("b").agg(count(lit(1)).as("cr"), sum("t").as("ct"))
      .collect()
      .map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2)))
      .toMap
    val tr = counts.values.map(_._1).sum
    val tt = counts.values.map(_._2).sum
    Array.tabulate(Buckets) { b =>
      val (cr, ct) = counts.getOrElse(b, (0L, 0L))
      rnd(StrictMath.log(((ct + 1).toDouble / (tt + Buckets)) /
        ((cr + 1).toDouble / (tr + Buckets))), 9)
    }
  }

  /** Per-row log importance weight: Σ ratio(bucket(token)) rounded 6 dp —
    * the q113 per-doc value as a single codegen'd projection. */
  def scoreCol(model: Array[Double], text: Column): Column = {
    require(model.length == Buckets, s"model must have $Buckets entries")
    val arr = array(model.toIndexedSeq.map(lit): _*)
    round(aggregate(TextOps.tokens(text), lit(0.0d),
      (acc, w) => acc + element_at(arr,
        (PortableSketch.h60(w) % Buckets).cast("int") + 1)), 6)
  }

  /** Annotate (static or streaming) docs with logw + the q113 selection
    * decision (keep iff more target-like than the corpus average). */
  def annotate(docs: DataFrame, model: Array[Double],
      textCol: String = "text"): DataFrame =
    docs.withColumn("logw", scoreCol(model, col(textCol)))
      .withColumn("selected", col("logw") > 0)

  /** The gate: only target-like documents flow downstream. */
  def gate(docs: DataFrame, model: Array[Double],
      textCol: String = "text"): DataFrame =
    annotate(docs, model, textCol).where(col("selected"))
}
