package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming quality gate — the always-on counterpart of the batch Gopher
  * rule gate (CurationQueries.gopherRules / q82), for scoring documents AS
  * they are ingested instead of in the nightly sweep.
  *
  * Stateless by construction: every rule evaluates array-side on the single
  * row (TextOps.gopherFlags), so the gate runs in append mode with no
  * watermark, no state store, and no output-mode constraints — it composes
  * in front of StreamingDedup/StreamingAdmission in the same ingest query.
  * The rule arithmetic is shared with the batch path, and the batch↔stream
  * equivalence (same keeps, same per-language rollup as q82) is pinned in
  * StreamingCurationSpec.
  */
object StreamingCuration {

  /** Annotate each document with its rule flags and keep decision. Works on
    * both static and streaming frames (pure projection). */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val f = TextOps.gopherFlags(col(textCol))
    docs.withColumn("n_tokens", f.getField("n_tokens"))
      .withColumn("wc_ok", f.getField("wc_ok"))
      .withColumn("mwl_ok", f.getField("mwl_ok"))
      .withColumn("stop_ok", f.getField("stop_ok"))
      .withColumn("rep_ok", f.getField("rep_ok"))
      .withColumn("keep", f.getField("keep"))
  }

  /** The gate itself: only documents passing every rule flow downstream. */
  def qualityGate(docs: DataFrame, textCol: String = "text"): DataFrame =
    annotate(docs, textCol).where(col("keep")).drop("keep")
}
