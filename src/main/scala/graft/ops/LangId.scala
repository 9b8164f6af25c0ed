package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Language identification — the classifier that DERIVES the `lang` column
  * every per-language operator downstream consumes (q18/q19/q57/q82/q121/
  * q126/q152 all take it as given; a real crawl has to infer it). The
  * fastText/CLD shape reduced to its Spark-native, oracle-replayable core:
  * a multinomial Naive Bayes over char n-gram counts.
  *
  * Determinism discipline (the [[TrainedGate]] precedent): the model is
  * INTEGER micro-unit log-likelihoods —
  * `llu(lang, gram) = round(1e6 · ln((c+1) / (tot_lang + V)))` (Laplace),
  * `oov_llu(lang) = round(1e6 · ln(1 / (tot_lang + V)))` for grams unseen
  * in training, `prior_u(lang) = round(1e6 · ln(n_lang / n))` — so scoring
  * is pure BIGINT arithmetic any engine replays exactly; only the ln at
  * FIT time touches libm, rounded with the house 5e-7 margin (the same
  * exposure TrainedGate's 6-dp gradient rounding accepts). Prediction ties
  * are impossible by construction: the argmax ranks `score·8 − langIdx`
  * (alphabetical index, < 8 languages), distinct per language.
  *
  * Scale shape: fitting aggregates (lang, gram) counts — alphabet^n ×
  * |langs| bounded, never corpus-bounded; the model broadcasts. Scoring is
  * a scan-side explode + a broadcast model join + ONE doc-keyed aggregate
  * — embarrassingly parallel, the fit-on-sample / score-everything posture
  * (at 100 TB you fit on a labeled sample, as q158 does via its
  * content-hash split). A streaming mirror scores arriving micro-batches
  * against the saved model with no state store.
  */
object LangId {

  /** Overlapping char n-grams of lower(text), WITH multiplicity
    * (multinomial counts need them); text shorter than n collapses to one
    * whole-text gram, so every document scores. */
  def charGrams(text: Column, n: Int): Column = {
    val t = lower(text)
    when(length(t) < n, array(t))
      .otherwise(transform(sequence(lit(1), length(t) - (n - 1)),
        i => t.substr(i, lit(n))))
  }

  /** Per-document gram-hash counts: (idCol, _h, _cnt). */
  def docGramCounts(docs: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol), explode(charGrams(col(textCol), n)).as("_g"))
      .select(col(idCol), PortableSketch.h60(col("_g")).as("_h"))
      .groupBy(idCol, "_h").agg(count(lit(1)).as("_cnt"))

  /** Fit the NB model on a LABELED frame. Returns (model, langStats):
    * model = (_h, lang, llu); langStats = (lang, lang_idx, prior_u,
    * oov_llu) with lang_idx the alphabetical index. Both are
    * vocabulary-bounded — broadcast them into scoring. */
  def fit(train: DataFrame, textCol: String, langCol: String,
      n: Int): (DataFrame, DataFrame) = {
    val lg = train.select(col(langCol).as("lang"),
        explode(charGrams(col(textCol), n)).as("_g"))
      .select(col("lang"), PortableSketch.h60(col("_g")).as("_h"))
      .groupBy("lang", "_h").agg(count(lit(1)).as("_c"))
      .persist() // feeds totals, vocab size, and the llu projection
    val tot = lg.groupBy("lang").agg(sum("_c").as("_tot"))
    val v = lg.select(countDistinct("_h").as("_v"))
    val nd = train.groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("_nl"))
      .crossJoin(broadcast(train.select(count(lit(1)).as("_n"))))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("lang") // |langs| rows — a bounded-model window, not corpus
    val langStats = tot.crossJoin(broadcast(v))
      .join(nd, Seq("lang"))
      .select(col("lang"),
        (row_number().over(w) - 1).cast("long").as("lang_idx"),
        round(lit(1e6) * log(col("_nl").cast("double") / col("_n")))
          .cast("long").as("prior_u"),
        round(lit(1e6) * log(lit(1.0) / (col("_tot") + col("_v"))))
          .cast("long").as("oov_llu"),
        (col("_tot") + col("_v")).as("_denom"))
    val model = lg.join(broadcast(langStats.select("lang", "_denom")), Seq("lang"))
      .select(col("_h"), col("lang"),
        round(lit(1e6) * log((col("_c") + lit(1)).cast("double") / col("_denom")))
          .cast("long").as("llu"))
    (model, langStats.drop("_denom"))
  }

  /** Score a frame: per document, the argmax language under the model.
    * Returns (idCol, pred). Every gram row fans out to |langs| scored rows
    * (bounded fan-out), unseen grams take the per-language OOV constant,
    * and the per-(doc, lang) sums + the argmax run in one doc-keyed
    * aggregate pass. */
  def predict(docs: DataFrame, textCol: String, idCol: String, n: Int,
      model: DataFrame, langStats: DataFrame): DataFrame = {
    val contrib = docGramCounts(docs, textCol, idCol, n)
      .crossJoin(broadcast(langStats))
      .join(broadcast(model), Seq("_h", "lang"), "left")
      .select(col(idCol), col("lang"), col("lang_idx"), col("prior_u"),
        (col("_cnt") * coalesce(col("llu"), col("oov_llu"))).as("_x"))
    contrib.groupBy(idCol, "lang", "lang_idx", "prior_u")
      .agg(sum("_x").as("_s"))
      .select(col(idCol),
        ((col("prior_u") + col("_s")) * 8 - col("lang_idx")).as("_key"),
        col("lang"))
      .groupBy(idCol)
      .agg(max_by(col("lang"), col("_key")).as("pred"))
  }
}
