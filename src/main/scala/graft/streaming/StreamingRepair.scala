package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming TEXT REPAIR — the ingest-time mirror of the batch q110
  * normalization pass, and the funnel's true first stage: NFC composition
  * (the codegen'd [[graft.expr.NfcNormalize]] kernel), control-character
  * strip, whitespace collapse, trim. Stateless single-row projection (no
  * watermark, no state store), so it composes in front of everything —
  * and it MUST run before dedup: the decomposed and composed forms of the
  * same text would otherwise carry different digests and both survive. */
object StreamingRepair {

  /** The repair expression itself — shared verbatim with the batch q110
    * profile so batch and stream can never drift. */
  def clean(text: Column): Column =
    trim(regexp_replace(regexp_replace(
      graft.expr.GraftFunctions.nfc(text),
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""), "\\s+", " "))

  /** Replace `textCol` with its repaired form. Static and streaming frames
    * both work. */
  def repair(docs: DataFrame, textCol: String = "text"): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.withColumn(textCol, clean(col(textCol)))
  }
}
