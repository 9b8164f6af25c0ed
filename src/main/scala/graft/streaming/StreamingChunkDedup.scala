package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming CHUNK-level dedup — the ingest-time mirror of the batch q105
  * paragraph-dedup analogue: documents tile into the same non-overlapping
  * 20-token chunks, and only each chunk content's FIRST arrival within the
  * watermark horizon survives. The output is the surviving chunk relation
  * (doc_id, chunk_idx, n_chunk) — the append-mode stream a shard writer or
  * retention monitor consumes; per-doc retention is a downstream
  * aggregation over it.
  *
  * State is two 64-bit content hashes per distinct chunk (16 bytes/key,
  * the StreamingDedup discipline — never the chunk text), bounded by the
  * watermark: a duplicate arriving after its original aged out is admitted
  * as new, and the batch q105 sweeping behind the stream removes the
  * stragglers — the same bounded-state trade every streaming dedup makes.
  * For in-event-order streams the surviving set equals the batch q105
  * keep-first decision (first arrival == min (doc_id, chunk_idx)); pinned
  * in StreamingChunkDedupSpec. */
object StreamingChunkDedup {

  def keptChunks(
      docs: DataFrame, textCol: String = "text", tsCol: String = "ts",
      watermarkDelay: String = "10 minutes"): DataFrame =
    // tiling via the SHARED TextOps.chunkTiles — one definition with the
    // batch q105 operator, so the dedup units cannot drift
    TextOps.chunkTiles(docs, textCol, Seq("doc_id", tsCol))
      .withColumn("_d1", xxhash64(col("_chunk")))
      .withColumn("_d2", xxhash64(lit(0x9E3779B9L), col("_chunk")))
      .drop("_chunk")
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_d1", "_d2")
      .select("doc_id", "chunk_idx", "n_chunk")
}
