package graft.streaming

import graft.ops.LangId
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming language identification — the ingest-time counterpart of the
  * batch q158 classifier: fit [[LangId]]'s integer naive-Bayes ONCE on a
  * labeled corpus, then annotate documents with their predicted language
  * AS they arrive, in front of every per-language gate downstream
  * (the q18/q57/q82-family operators all consume a `lang` column a real
  * crawl has to derive).
  *
  * The model is the (gram hash → per-language log-likelihood) table plus
  * |langs| prior/OOV rows — gram-VOCABULARY-bounded (alphabet^n × langs),
  * the documented bounded-model driver-collect exception, embedded in the
  * plan as a broadcast map. Scoring is a per-row imperative fold over the
  * document's char n-grams — no explode, no shuffle, no state store — so
  * it composes in append mode with the other stateless funnel stages.
  *
  * Arithmetic parity with batch q158 (pinned in StreamingLangIdSpec): the
  * same lowercased char n-grams WITH multiplicity, the same integer
  * micro-unit scores, and the same tie-free `score·M − langIdx` argmax
  * (M = [[LangId.argmaxMultiplier]] of the fitted language count) —
  * a stream and the batch query predict identically on identical text.
  */
object StreamingLangId {

  /** Collected model: parallel per-language arrays (alphabetical order, so
    * the index IS the batch lang_idx) + the gram-hash likelihood table. */
  case class Model(langs: Array[String], priorU: Array[Long],
      oovLlu: Array[Long], llu: Map[Long, Array[Long]]) {
    require(langs.nonEmpty)
  }

  /** Fit on a labeled static frame and collect the vocabulary-bounded
    * model (one driver collect of |grams|×|langs| + |langs| rows).
    *
    * `maxGramsPerLang` bounds that collect: when > 0, each language keeps
    * only its top-N gram rows by (llu desc, gram-hash asc) — llu is
    * monotone in the training count, so this is top-N-by-count with a
    * deterministic tie-break — and every pruned gram falls to that
    * language's OOV floor at scoring time (the left-miss path that
    * already exists; a DOCUMENTED divergence from the uncapped batch
    * model, pinned by StreamingLangIdSpec against batch predict on the
    * SAME capped table). On multilingual data the uncapped table is
    * alphabet³×|langs| — the largest "bounded" model in the repo — while
    * the capped collect is ≤ maxGramsPerLang×|langs| rows ≈ 16 bytes +
    * 8·|langs| each, a hard byte budget the caller picks. 0 = uncapped
    * (exact batch parity, test-scale default). */
  def fitModel(train: DataFrame, textCol: String, langCol: String,
      n: Int, maxGramsPerLang: Int = 0): Model = {
    val (modelDf0, statsDf) = LangId.fit(train, textCol, langCol, n)
    val modelDf = cappedModel(modelDf0, maxGramsPerLang)
    fitFrom(modelDf, statsDf)
  }

  /** Collect a [[Model]] from a [[LangId.saveModel]] parquet hand-off —
    * fit once in batch, score every arriving micro-batch without refitting
    * (the TrainedGate batch-fit → streaming-score shape). Same optional
    * per-language cap as [[fitModel]]. */
  def modelFromSaved(spark: org.apache.spark.sql.SparkSession, path: String,
      maxGramsPerLang: Int = 0): Model = {
    val (modelDf, statsDf) = LangId.loadModel(spark, path)
    fitFrom(cappedModel(modelDf, maxGramsPerLang), statsDf)
  }

  /** Prune a (_h, lang, llu) model table to its top-N grams per language —
    * distributed, BEFORE any collect. The per-lang window partitions on
    * |langs| keys over a vocabulary-bounded table (model rows, never
    * corpus rows), so the sort is model-sized; exposed so the batch side
    * can score against the IDENTICAL capped table in the parity spec. */
  def cappedModel(modelDf: DataFrame, maxGramsPerLang: Int): DataFrame =
    if (maxGramsPerLang <= 0) modelDf
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("llu").desc, col("_h"))
      modelDf.withColumn("_rk", row_number().over(w))
        .where(col("_rk") <= maxGramsPerLang).drop("_rk")
    }

  /** Collect an (already capped or uncapped) model table + stats into the
    * broadcastable [[Model]]. */
  private def fitFrom(modelDf: DataFrame, statsDf: DataFrame): Model = {
    val stats = statsDf.select("lang", "lang_idx", "prior_u", "oov_llu")
      .collect().sortBy(_.getLong(1))
    require(stats.nonEmpty, "StreamingLangId.fitModel: empty model")
    val langs = stats.map(_.getString(0))
    val idx = langs.zipWithIndex.toMap
    val table = modelDf.select("_h", "lang", "llu").collect()
      .groupBy(_.getLong(0))
      .map { case (h, rows) =>
        val arr = new Array[Long](langs.length)
        // a gram unseen in SOME language falls to that language's OOV floor
        stats.indices.foreach(i => arr(i) = stats(i).getLong(3))
        rows.foreach(r => arr(idx(r.getString(1))) = r.getLong(2))
        h -> arr
      }
    Model(langs, stats.map(_.getLong(2)), stats.map(_.getLong(3)), table)
  }

  /** Annotate a (possibly streaming) frame with `lang_pred` — a stateless
    * projection, batch-identical scores. */
  def annotate(docs: DataFrame, model: Model, textCol: String = "text",
      n: Int = 3): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val predictUdf = udf { (text: String) =>
      val m = bc.value
      val t = if (text == null) ""
        else text.toLowerCase(java.util.Locale.ROOT)
      // gram-hash counts: same collapse rule as LangId.charGrams, walked
      // by CODE POINT (Spark substr semantics — the winnowTextFused parity
      // argument)
      val counts = new scala.collection.mutable.HashMap[Long, Long]()
      val cps = {
        val b = scala.collection.mutable.ArrayBuffer.empty[Int]
        var i = 0
        while (i < t.length) { b += i; i = t.offsetByCodePoints(i, 1) }
        b += t.length
        b.toArray
      }
      val nCp = cps.length - 1
      if (nCp < n) {
        counts(graft.ops.PortableSketch.h60String(t)) = 1L
      } else {
        var i = 0
        while (i <= nCp - n) {
          val h = graft.ops.PortableSketch.h60String(t.substring(cps(i), cps(i + n)))
          counts(h) = counts.getOrElse(h, 0L) + 1L
          i += 1
        }
      }
      val nl = m.langs.length
      val scores = m.priorU.clone()
      counts.foreach { case (h, c) =>
        val arr = m.llu.getOrElse(h, m.oovLlu)
        var i = 0
        while (i < nl) { scores(i) += c * arr(i); i += 1 }
      }
      val mult = LangId.argmaxMultiplier(nl)
      var best = 0
      var bestKey = scores(0) * mult - 0
      var i = 1
      while (i < nl) {
        val key = scores(i) * mult - i
        if (key > bestKey) { best = i; bestKey = key }
        i += 1
      }
      m.langs(best)
    }
    docs.withColumn("lang_pred", predictUdf(col(textCol)))
  }
}
