package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Streaming CONTENT-DEFINED chunk dedup — the ingest-time mirror of batch
  * q171, and the variant of [[StreamingChunkDedup]] that survives edits:
  * because CDC boundaries are a function of content
  * ([[graft.ops.TextOps.cdcChunks]] — ONE definition with the batch
  * operator, so the dedup units cannot drift), a re-post with an inserted
  * preamble re-synchronizes at the next boundary and every downstream
  * chunk deduplicates against the original's state, where the fixed-tile
  * mirror admits the whole shifted document as new.
  *
  * State is one 8-byte h60 digest per distinct chunk within the watermark
  * horizon — the same single-digest keying the batch q171 dup rollup uses
  * (never chunk text), with the usual bounded-state trade: a duplicate
  * arriving after its original aged out is admitted as new and the batch
  * sweep behind the stream removes stragglers. For in-event-order streams
  * the surviving set equals the batch first-arrival decision (pinned in
  * StreamingCdcDedupSpec, along with the re-sync property the fixed-tile
  * mirror fails).
  */
object StreamingCdcDedup {

  def keptChunks(
      docs: DataFrame, textCol: String = "text", tsCol: String = "ts",
      watermarkDelay: String = "10 minutes"): DataFrame =
    TextOps.cdcChunks(docs, textCol, Seq("doc_id", tsCol))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_h")
      .select(col("doc_id"), col("chunk_idx"), col("chunk_len"))
}
