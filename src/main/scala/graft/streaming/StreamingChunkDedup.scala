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

  private val ChunkW = 20 // tokens per chunk — must match CurationQueries

  def keptChunks(
      docs: DataFrame, textCol: String = "text", tsCol: String = "ts",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val tk = docs
      .select(col("doc_id"), col(tsCol), TextOps.tokens(col(textCol)).as("_ts"))
      .select(col("doc_id"), col(tsCol), col("_ts"), size(col("_ts")).as("_n"))
      .where(col("_n") >= 1) // sequence(0,-1,s) throws; tokenless docs have no chunks
    tk.select(col("doc_id"), col(tsCol), col("_ts"), col("_n"),
        explode(sequence(lit(0), col("_n") - 1, lit(ChunkW))).as("_start"))
      .select(col("doc_id"), col(tsCol),
        (col("_start") / ChunkW).cast("long").as("chunk_idx"),
        least(lit(ChunkW), col("_n") - col("_start")).as("n_chunk"),
        concat_ws(" ", slice(col("_ts"), col("_start") + 1,
          least(lit(ChunkW), col("_n") - col("_start")))).as("_c"))
      .withColumn("_d1", xxhash64(col("_c")))
      .withColumn("_d2", xxhash64(lit(0x9E3779B9L), col("_c")))
      .drop("_c")
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_d1", "_d2")
      .select("doc_id", "chunk_idx", "n_chunk")
  }
}
