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
    * whole-text gram, so every document scores.
    *
    * CALLER CONTRACT: pass an ATTRIBUTE (a projected column), not an
    * expression — Catalyst re-evaluates an expression captured inside the
    * transform lambda PER ELEMENT (the minhashNearDups two-projection
    * lesson), which turns the shingling O(len·n) into O(len²): measured
    * 26 s vs 3 s on the 10× corpus. [[gramRows]] does the projection. */
  def charGrams(text: Column, n: Int): Column = {
    val t = lower(text)
    when(length(t) < n, array(t))
      .otherwise(transform(sequence(lit(1), length(t) - (n - 1)),
        i => t.substr(i, lit(n))))
  }

  /** One row per (carried cols, gram hash): lowercases INTO an attribute
    * first, then shingles from it — the two-projection discipline. */
  private def gramRows(docs: DataFrame, textCol: String,
      carry: Seq[String], n: Int): DataFrame = {
    val t = col("_t")
    val grams = when(length(t) < n, array(t))
      .otherwise(transform(sequence(lit(1), length(t) - (n - 1)),
        i => t.substr(i, lit(n))))
    Partitioning.spread(docs)
      .select(carry.map(col) :+ lower(col(textCol)).as("_t"): _*)
      .select(carry.map(col) :+ explode(grams).as("_g"): _*)
      .select(carry.map(col) :+ PortableSketch.h60(col("_g")).as("_h"): _*)
  }

  /** Per-document gram-hash counts: (idCol, _h, _cnt). */
  def docGramCounts(docs: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame =
    gramRows(docs, textCol, Seq(idCol), n)
      .groupBy(idCol, "_h").agg(count(lit(1)).as("_cnt"))

  /** Fit the NB model on a LABELED frame. Returns (model, langStats):
    * model = (_h, lang, llu); langStats = (lang, lang_idx, prior_u,
    * oov_llu) with lang_idx the alphabetical index. Both are
    * vocabulary-bounded — broadcast them into scoring. */
  def fit(train: DataFrame, textCol: String, langCol: String,
      n: Int): (DataFrame, DataFrame) = {
    val lg = gramRows(train.withColumnRenamed(langCol, "lang"),
        textCol, Seq("lang"), n)
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
    * Returns (idCol, pred).
    *
    * Shape: the |langs| stats rows collect to the driver (bounded-model
    * exception — they parameterize the plan) and the likelihood table
    * pivots WIDE (one row per gram hash, one llu column per language), so
    * scoring is one broadcast join on the gram hash and ONE doc-keyed
    * aggregate of |langs| parallel sums that partially aggregates
    * map-side — no |langs|× row fan-out, no (doc, lang) shuffle (the
    * first shape measured 6× slower at 10× corpus). The argmax stays the
    * tie-free `score·8 − langIdx` total order, folded over scalar
    * columns; identical integer results, addition order immaterial. */
  def predict(docs: DataFrame, textCol: String, idCol: String, n: Int,
      model: DataFrame, langStats: DataFrame): DataFrame = {
    val stats = langStats.select("lang", "lang_idx", "prior_u", "oov_llu")
      .collect().sortBy(_.getLong(1))
    require(stats.nonEmpty, "langId.predict: empty model")
    // the `score·8 − langIdx` key is a total order consistent with scores
    // ONLY while langIdx < 8 — at 9+ languages a 1-micro-unit score edge
    // can be cancelled by the index term and the argmax silently flips.
    // Enforced loudly here (and in StreamingLangId.fitModel) rather than
    // assumed; widening the multiplier must happen in BOTH engines and the
    // oracle SQL at once, so it is a deliberate change, not a default.
    require(stats.length <= 8,
      s"langId tie-free argmax supports at most 8 languages, got " +
        s"${stats.length}: widen the ·8 multiplier in predict AND the " +
        "oracle together")
    val langs = stats.map(_.getString(0))
    val wide = model.groupBy("_h")
      .pivot("lang", langs.toSeq).agg(first("llu"))
    val scores = stats.zipWithIndex.map { case (s, i) =>
      sum(col("_cnt") * coalesce(col(langs(i)), lit(s.getLong(3))))
        .as(s"_s$i")
    }
    val keys = stats.zipWithIndex.map { case (s, i) =>
      ((col(s"_s$i") + lit(s.getLong(2))) * 8 - lit(i)).as(s"_k$i")
    }
    val pred = stats.indices.tail.foldLeft(
      (col("_k0"), lit(langs(0)))) { case ((bestK, bestL), i) =>
      val better = col(s"_k$i") > bestK
      (when(better, col(s"_k$i")).otherwise(bestK),
        when(better, lit(langs(i))).otherwise(bestL))
    }._2
    docGramCounts(docs, textCol, idCol, n)
      .join(broadcast(wide), Seq("_h"), "left")
      .groupBy(idCol)
      .agg(scores.head, scores.tail: _*)
      .select(col(idCol) +: keys: _*)
      .select(col(idCol), pred.as("pred"))
  }
}
