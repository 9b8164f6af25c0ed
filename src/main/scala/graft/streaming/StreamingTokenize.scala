package graft.streaming

import graft.ops.UnigramLM
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming unigram-LM tokenization — the ingest-time counterpart of the
  * batch q159 encode: fit the piece model ONCE ([[UnigramLM.fit]], persist
  * via saveModel), then annotate arriving documents with their piece count
  * and chars-per-piece as they land — the token accounting a training-data
  * ingest needs live (shard budgeting, per-source compression monitoring)
  * between nightly q159 sweeps.
  *
  * The model is the (piece → integer cost) table — singles + top-K rows,
  * vocabulary-bounded, broadcast. Scoring runs the EXACT fit-time Viterbi
  * per word (same `·16 + (Lmax−k)` tie encoding), summed over the
  * document's whitespace tokens — a stateless projection, no shuffle, no
  * state store, so it composes in append mode with the other funnel
  * stages. Parity with the batch segmentation is pinned in
  * StreamingTokenizeSpec.
  *
  * Out-of-alphabet arrivals: a word containing a char the model never saw
  * is unsegmentable under the fitted pieces — it counts `len(word)` pieces
  * (the byte-fallback convention real tokenizers use) and increments
  * `oov_words` rather than failing the stream.
  */
object StreamingTokenize {

  /** Annotate with `n_words`, `n_pieces`, `oov_words` under the model. */
  def annotate(docs: DataFrame, model: Map[String, Long],
      textCol: String = "text"): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val countUdf = udf { (text: String) =>
      val m = bc.value
      val words =
        if (text == null) Array.empty[String]
        else text.split("\\s+").filter(_.nonEmpty)
      var pieces = 0L
      var oov = 0L
      words.foreach { w =>
        try pieces += UnigramLM.encode(w, m).length.toLong
        catch { case _: IllegalArgumentException =>
          pieces += w.length.toLong; oov += 1L
        }
      }
      (words.length.toLong, pieces, oov)
    }
    docs.withColumn("_tk", countUdf(col(textCol)))
      .withColumn("n_words", col("_tk._1"))
      .withColumn("n_pieces", col("_tk._2"))
      .withColumn("oov_words", col("_tk._3"))
      .drop("_tk")
  }
}
