package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming host-reputation gate — the ingest-time application of the
  * q167/q170 domain table, in its deployment shape: the keep/weight
  * decisions are computed in BATCH (quality × centrality over the standing
  * corpus — global statistics by nature), exported as a (host, t_u)
  * threshold table, and every arriving document is admitted iff its
  * content-hash 16-bit value falls under its canonical host's threshold —
  * the exact q170 Bernoulli, so batch selection and ingest admission make
  * the SAME per-document decision (pinned in StreamingReputationSpec).
  *
  * The threshold table attaches via a stream-static BROADCAST join on the
  * canonical host, not a driver-side map: a real crawl has millions of
  * hosts, which is broadcast-sized but not when-chain-sized (the
  * StreamingLangId bounded-model collect is alphabet-bounded; a host table
  * is NOT, so it stays a DataFrame end to end). Hosts absent from the
  * table are REJECTED (inner join) — the conservative default for an
  * admission gate: an unreviewed domain contributes nothing until the
  * next batch reputation pass scores it. Stateless; composes in append
  * mode with the other funnel stages.
  */
object StreamingReputation {

  /** The q170 sampling hash — ONE definition for the batch query and the
    * streaming gate would be ideal; the salt and width are pinned by the
    * parity spec instead (the expression lives in operator code the
    * streaming package cannot reach without a dependency inversion). */
  private def sampleHash(textCol: String) =
    conv(substring(md5(encode(concat(lit("q170"), col(textCol)), "UTF-8")),
      1, 4), 16, 10).cast("long")

  /** Gate a (possibly streaming) frame against a batch-built (host, t_u)
    * threshold table. `urlCol` is canonicalized to its host with
    * [[graft.ops.Urls.host]] — the same node key the batch table uses. */
  def gate(docs: DataFrame, thresholds: DataFrame, urlCol: String = "url",
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("host", graft.ops.Urls.host(col(urlCol)))
      .join(broadcast(thresholds.select(col("host"), col("t_u"))), Seq("host"))
      .where(sampleHash(textCol) < col("t_u"))
      .drop("t_u")
}
