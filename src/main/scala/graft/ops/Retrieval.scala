package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical retrieval scoring — BM25 over a whitespace-token inverted index.
  *
  * Scale design: the posting relation is built by exploding tokens and
  * immediately filtering to the query term set (broadcast literal), so the
  * shuffle carries (term, doc, tf) postings for query terms only — never
  * the corpus. Document frequency is a map-side-combined aggregation of the
  * posting relation; the corpus-level constants (N, average length) are a
  * one-row aggregate that broadcast-joins onto the postings. Everything
  * downstream of the scan is proportional to |postings|, not |corpus|.
  */
object Retrieval {

  /** BM25 scores for every (query term, matching document): columns
    * (term, doc_id=idCol name, tf, score). Standard Robertson/Sparck-Jones
    * parameters k1, b; idf = ln((N - df + 0.5)/(df + 0.5) + 1) (the
    * Lucene-style floor-free variant, positive for all df ≤ N). Determinism:
    * tf/df/len are integers and the per-document factor is plain rational
    * arithmetic, so scores are bit-reproducible across engines up to the
    * final idf multiply. */
  def bm25(df: DataFrame, textCol: String, idCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // One tokenize pass: the corpus collapses to a NARROW (id, len,
    // query-term matches) projection — the token arrays are dropped before
    // anything persists or shuffles, so the cached frame is ~40 B/doc (vs
    // the corpus text), and both downstream reads (postings and the corpus
    // constants) reuse it instead of re-running the split kernel.
    // Ownership: callers' Verify/Bench clear the cache after each action.
    val termsArr = array(terms.map(lit): _*)
    val narrow = Partitioning.spread(df)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("_ts"))
      .select(col(idCol), size(col("_ts")).as("_len"),
        filter(col("_ts"), t => array_contains(termsArr, t)).as("_m"))
      .persist()
    val postings = narrow
      .select(col(idCol), col("_len"), explode(col("_m")).as("term"))
      .groupBy("term", idCol, "_len")
      .agg(count(lit(1)).as("tf"))
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("_df"))
    val stats = narrow.agg(count(lit(1)).as("_n"), avg(col("_len")).as("_avg"))
    postings
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats)) // one row: corpus constants
      .withColumn("score",
        log((col("_n") - col("_df") + 0.5) / (col("_df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("_len") / col("_avg"))))
      .select(col("term"), col(idCol), col("tf"), col("score"))
  }
}
