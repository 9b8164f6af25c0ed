package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming perplexity scoring — the ingest-time counterpart of the batch
  * q164/q169 CCNet recipe, in CCNet's actual deployment shape: the
  * per-language bigram LM is FIT once in batch (where the global tercile
  * boundaries are also computed), then arriving documents are scored and
  * gated against those frozen cutoffs with no state store — global ranks
  * are a batch artifact by nature, so the stream applies the batch's
  * boundary instead of pretending to rank (the same fit-batch /
  * apply-stream split as StreamingLangId and TrainedGate).
  *
  * Arithmetic parity with batch q164 (pinned in StreamingPerplexitySpec):
  * identical whitespace tokenization, identical micro-unit per-bigram
  * `nlp_u = round(1e6 · −ln((c2+0.5)/(c1+0.5·V)))`, identical integer
  * per-doc mean (`Σ n·nlp_u div Σ n`) — a document fully in-vocabulary
  * scores bit-equal to the batch query. The stream-only cases the batch
  * never sees (the fit corpus contains every bigram it scores) take the
  * same smoothed formula with the missing count at 0: unseen bigram under
  * a seen w1 → `−ln(0.5/(c1+0.5V))`; unseen w1 → `−ln(0.5/(0.5V)) =
  * ln(V)`; a language absent from the model (or a <2-token text) scores
  * NULL — the q164 `unscored` lane, never silently dropped.
  *
  * Model size: the bigram table is vocab²-bounded per language (the
  * StreamingLangId concern squared) and the w1-floor table vocab-bounded,
  * so `maxBigramsPerLang` bounds BOTH collects to top-N per language by
  * count: a pruned bigram falls to its w1's floor, a pruned w1 to the
  * `ln(V)` floor — a DOCUMENTED divergence from the uncapped batch model,
  * parity-pinned on the capped table. 0 = uncapped (exact batch parity,
  * test-scale default).
  */
object StreamingPerplexity {

  /** Collected per-language bigram LM. All values integer micro-units or
    * exact counts; `vocab` maps lang → V (distinct unigrams at fit time). */
  case class Model(nlpU: Map[(String, String, String), Long],
      c1: Map[(String, String), Long], vocab: Map[String, Long]) {
    require(vocab.nonEmpty, "empty perplexity model")
  }

  private def nlpU(c2: Long, c1: Long, v: Long): Long =
    math.round(1e6 * -math.log((c2 + 0.5) / (c1 + 0.5 * v)))

  /** Fit on a (textCol, langCol) static frame; collect the (optionally
    * capped) model. The count tables aggregate distributed first — the
    * collects ship (lang, w1, w2, c2) and (lang, w1, c1) rows, never
    * documents — and the cap bounds BOTH: the bigram table (vocab² per
    * lang uncapped) to its top-N by count, and the w1-floor table (vocab
    * per lang uncapped) likewise, with pruned w1 falling to the unseen-w1
    * `ln(V)` floor. Kept bigrams carry their EXACT c1 (joined distributed
    * before the collect), so capping c1 never changes a kept bigram's
    * score — only which floors stay addressable. */
  def fitModel(train: DataFrame, textCol: String, langCol: String,
      maxBigramsPerLang: Int = 0): Model = {
    graft.expr.GraftFunctions.ensureRegistered(train.sparkSession)
    def capPerLang(df: DataFrame, orderCols: Seq[Column]): DataFrame =
      if (maxBigramsPerLang <= 0) df
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(orderCols: _*)
        df.withColumn("_rk", row_number().over(w))
          .where(col("_rk") <= maxBigramsPerLang).drop("_rk")
      }
    val bg = graft.ops.Partitioning.spread(train)
      .select(col(langCol).as("lang"),
        explode(graft.expr.GraftFunctions.wordBigrams(col(textCol))).as("_bg"))
      .select(col("lang"),
        substring_index(col("_bg"), " ", 1).as("w1"),
        substring_index(col("_bg"), " ", -1).as("w2"))
      .groupBy("lang", "w1", "w2").agg(count(lit(1)).as("c2"))
      .persist() // feeds the c1 aggregate and the capped table join
    val c1df = bg.groupBy("lang", "w1").agg(sum("c2").as("c1"))
      .persist() // read for the table join AND the floor collect
    val vRows = graft.ops.Partitioning.spread(train)
      .select(col(langCol).as("lang"),
        explode(graft.ops.TextOps.tokens(col(textCol))).as("w"))
      .groupBy("lang").agg(countDistinct("w").as("v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val table = capPerLang(bg, Seq(col("c2").desc, col("w1"), col("w2")))
      .join(c1df, Seq("lang", "w1"))
      .select("lang", "w1", "w2", "c2", "c1")
      .collect().map { r =>
        (r.getString(0), r.getString(1), r.getString(2)) ->
          nlpU(r.getLong(3), r.getLong(4), vRows(r.getString(0)))
      }.toMap
    val c1Rows = capPerLang(c1df, Seq(col("c1").desc, col("w1")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    bg.unpersist(); c1df.unpersist()
    Model(table, c1Rows, vRows)
  }

  /** Annotate a (possibly streaming) frame with `nlp_u` — the micro-unit
    * mean negative log-prob under `model`, NULL when unscorable. A
    * stateless projection; composes in append mode. */
  def annotate(docs: DataFrame, model: Model, textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val scoreUdf = udf { (lang: String, text: String) =>
      val m = bc.value
      m.vocab.get(lang) match {
        case None => Option.empty[Long]
        case Some(v) =>
          val toks =
            if (text == null) Array.empty[String]
            else text.split("\\s+").filterNot(_.isEmpty)
          if (toks.length < 2) Option.empty[Long]
          else {
            var sum = 0L
            var i = 0
            while (i < toks.length - 1) {
              val w1 = toks(i)
              sum += m.nlpU.getOrElse((lang, w1, toks(i + 1)),
                nlpU(0L, m.c1.getOrElse((lang, w1), 0L), v))
              i += 1
            }
            Some(sum / (toks.length - 1))
          }
      }
    }
    docs.withColumn("nlp_u", scoreUdf(col(langCol), col(textCol)))
  }

  /** Gate on frozen per-language cutoffs (micro-units; e.g. each
    * language's batch head/middle→tail boundary): keep scored documents at
    * or under their language's cutoff. Unscorable documents and languages
    * without a cutoff are REJECTED here — the conservative default for a
    * training-data gate; route the `nlp_u IS NULL` lane elsewhere first if
    * it must be audited (the q164 `unscored` discipline). */
  def gate(docs: DataFrame, model: Model, cutoffsU: Map[String, Long],
      textCol: String = "text", langCol: String = "lang"): DataFrame = {
    val cut = cutoffsU.foldLeft(lit(null).cast("long")) {
      case (acc, (l, c)) => when(col(langCol) === l, lit(c)).otherwise(acc)
    }
    annotate(docs, model, textCol, langCol)
      .where(col("nlp_u").isNotNull && col("nlp_u") <= cut)
  }
}
