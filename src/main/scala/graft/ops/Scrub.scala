package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing and lightweight model-based quality gating — the two
  * row-local screens a training-data pipeline runs over every document
  * before anything heavier sees it.
  *
  * Both are single-projection, shuffle-free operators (the rollups their
  * queries add are ordinary shrinking aggregations), and both are defined
  * in engine-portable arithmetic so a DuckDB oracle can replay the exact
  * per-row decision: the regex dialect is the RE2/Java common subset, and
  * the classifier is all-integer (hash-derived weights, integer threshold
  * compare — no float boundary anywhere).
  */
object Scrub {

  /** The scrub rule set, applied in declaration order (earlier masks run
    * first, so a credit-card-length digit run inside an email never
    * double-counts). Patterns stay inside the RE2 ∩ java.util.regex common
    * subset: character classes, bounded repetition, \b — no backrefs, no
    * lookaround. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val DigitRunRe = "[0-9]{2,}"

  /** Per-row scrub: each rule counts its matches on the text as it stands
    * AFTER the earlier rules masked theirs (so the digits of an address
    * already folded into `<EMAIL>`/`<IP>` never double-count as digit
    * runs), then masks them. Returns a struct
    * (n_email, n_ip, n_num, masked). Replacement is global
    * leftmost-non-overlapping in both engines (Spark regexp_replace is
    * global; the oracle passes the 'g' flag). */
  def scrub(s: Column): Column = {
    val s1 = regexp_replace(s, EmailRe, "<EMAIL>")
    val s2 = regexp_replace(s1, Ipv4Re, "<IP>")
    val s3 = regexp_replace(s2, DigitRunRe, "<NUM>")
    struct(
      regexp_count(s, lit(EmailRe)).as("n_email"),
      regexp_count(s1, lit(Ipv4Re)).as("n_ip"),
      regexp_count(s2, lit(DigitRunRe)).as("n_num"),
      s3.as("masked"))
  }

  /** Hashed-bag-of-words linear classifier gate (the fasttext-shaped
    * quality screen, with a deterministic stand-in model so every engine
    * scores identically). Token → 60-bit md5 → bucket = h % `buckets`;
    * weight_b = (b % 97) − 48 ∈ [−48, 48]. A document's raw score is the
    * integer Σ weight over token OCCURRENCES; the gate is score ≥ 0.
    * Real deployments swap the modulus-derived weight for a broadcast
    * (bucket → int-quantized weight) lookup — the pipeline shape (explode,
    * per-doc integer agg, threshold) is exactly this. */
  def tokenWeight(token: Column, buckets: Int = 1024): Column =
    (PortableSketch.h60(token) % buckets) % 97 - 48
}
