package graft.streaming

import graft.expr.ProbeGramIndex
import org.apache.spark.sql.DataFrame

/** The streaming INGEST FUNNEL — the always-on counterpart of the batch q99
  * composition, EXTENDED with a repair front stage the batch funnel does
  * not run: text repair (q110's NFC/control/whitespace pass) → language ID
  * → CCNet perplexity gate → PII scrub → classifier quality gate →
  * benchmark decontamination screen → exact content dedup, as ONE
  * append-mode query. (q99's oracle pins the 5-stage
  * batch composition as-is; a decomposed-vs-composed duplicate therefore
  * dedups here but would survive batch q99 — by design, since ingest sees
  * raw crawl text while q99's corpus is already normalized. The parity
  * pinned in StreamingFunnelSpec is against the batch composition OF THESE
  * stages, repair included.)
  *
  * Within the funnel, repair runs before anything digests
  * or scores the text, then masking runs so the gate scores
  * and the dedup digests see redacted text (a dup pair differing only in
  * the raw PII span still collapses), and the stateless stages (scrub,
  * gate, screen — pure projections/filters, no state store) run BEFORE the
  * stateful dedup so its digest state only ever holds documents that
  * survived every cheap filter. The only state in the whole query is the
  * dedup's 16-byte digest pair per kept document within the watermark
  * horizon — at ingest scale the funnel is a narrow map over each
  * micro-batch plus one bounded state store.
  *
  * Each stage reuses its proven operator (StreamingScrub /
  * StreamingDecontam / StreamingDedup), so batch↔stream parity of the
  * composition follows from the parity of the parts — and is pinned
  * end-to-end in StreamingFunnelSpec anyway, because composition is
  * exactly where ordering bugs live.
  */
object StreamingFunnel {

  def ingest(
      docs: DataFrame,
      probeIndex: ProbeGramIndex,
      textCol: String = "text",
      tsCol: String = "ts",
      minShared: Int = 2,
      n: Int = 3,
      watermarkDelay: String = "10 minutes",
      importanceModel: Option[Array[Double]] = None,
      langModel: Option[StreamingLangId.Model] = None,
      perplexityModel: Option[StreamingPerplexity.Model] = None,
      perplexityCutoffsU: Map[String, Long] = Map.empty): DataFrame = {
    // repair FIRST: decomposed-vs-composed forms of the same text must not
    // carry different digests into the dedup state (q110's rationale)
    val repaired = StreamingRepair.repair(docs, textCol)
    // optional language annotation (q158's batch-fitted model): runs on the
    // REPAIRED text, before any per-language gate downstream would read
    // `lang_pred` — and before masking, since PII spans carry language
    // signal the classifier is allowed to see (the annotation is a label,
    // never retained text). Stateless projection.
    val labeled = langModel match {
      case Some(m) => StreamingLangId.annotate(repaired, m, textCol)
      case None => repaired
    }
    // optional CCNet perplexity gate (q164/q169's batch-fitted per-lang LM
    // against frozen batch cutoffs): requires the lang annotation above —
    // the LM a document is scored under is whatever the classifier routed
    // it to (the q169 composition). Scores the REPAIRED pre-mask text,
    // exactly what the batch LM was fit on; documents in languages the
    // model never saw are rejected (StreamingPerplexity.gate's documented
    // conservative default). Stateless filter.
    val qualified = perplexityModel match {
      case Some(m) =>
        require(langModel.isDefined,
          "perplexity gate needs lang_pred: pass langModel too")
        StreamingPerplexity.gate(labeled, m, perplexityCutoffsU,
          textCol, "lang_pred")
      case None => labeled
    }
    val masked = StreamingScrub.scrub(qualified, textCol)
    val gated = StreamingScrub.classifierGate(masked, textCol)
    // optional DSIR stage (q113's batch-fitted model): importance-gates on
    // the MASKED text — like the classifier, the target-likeness decision
    // must not key on raw PII spans. Stateless, so it slots with the other
    // pre-dedup filters and the dedup state only holds selected docs.
    val targeted = importanceModel match {
      case Some(m) => StreamingImportance.gate(gated, m, textCol)
      case None => gated
    }
    val clean = StreamingDecontam.screen(targeted, probeIndex, minShared, textCol, n)
    StreamingDedup.firstOccurrence(clean, textCol, tsCol, watermarkDelay)
  }
}
