package graft.streaming

import graft.ops.{Scrub, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming PII scrub + model-shaped quality gate — the ingest-time
  * counterparts of the batch q93 scrubber and q95 classifier gate, so
  * documents are redacted and scored BEFORE anything downstream (dedup
  * state, admission indexes, training shards) ever sees raw text.
  *
  * Both are stateless single-row projections (the scrub is three regex
  * passes, the classifier score a higher-order fold over the token array —
  * no explode, no shuffle), so they run in append mode with no watermark or
  * state store and compose in front of StreamingCuration / StreamingDedup /
  * StreamingAdmission in one ingest query. Arithmetic is shared with the
  * batch operators (Scrub.scrub / Scrub.tokenWeight), and batch↔stream
  * parity is pinned in StreamingScrubSpec.
  */
object StreamingScrub {

  /** Replace `textCol` with its masked form, recording per-rule hit counts.
    * Pure projection — static and streaming frames both work. */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val r = Scrub.scrub(col(textCol))
    docs.withColumn("_r", r)
      .withColumn("n_email", col("_r.n_email"))
      .withColumn("n_ip", col("_r.n_ip"))
      .withColumn("n_num", col("_r.n_num"))
      .withColumn(textCol, col("_r.masked"))
      .drop("_r")
  }

  /** Per-row integer classifier score: Σ tokenWeight over the token array
    * as a fold — the same value q95's explode+sum computes, without
    * leaving the row. */
  def score(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(TextOps.tokens(text),
      lit(0L), (acc, w) => acc + Scrub.tokenWeight(w))

  /** The gate: annotate with the score and keep only score ≥ 0 rows. */
  def classifierGate(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("score", score(col(textCol))).where(col("score") >= 0)
}
