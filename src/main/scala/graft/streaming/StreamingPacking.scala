package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — the always-on counterpart of q88's batch
  * packing profile: as documents arrive, each source shard's running token
  * offset is kept in keyed state, and every document is emitted with its
  * [start, end) slot in the shard's concatenated token stream, its training
  * sequence id, and whether it straddles a sequence boundary — so a
  * downstream writer can materialize fixed-length training sequences
  * incrementally instead of re-packing the corpus nightly.
  *
  * Ordering semantics, stated honestly: a stream packs in ARRIVAL order
  * (within a micro-batch, deterministically by doc_id; across batches, by
  * arrival). When batches arrive in doc_id order the result is exactly the
  * batch q88 packing — pinned in StreamingPackingSpec — and under
  * out-of-order arrival the offsets remain gapless and consistent, they
  * just reflect the arrival permutation, which is what an online packer
  * does. State per source is ONE long (the running end offset) — no
  * watermark needed, nothing to evict.
  */
object StreamingPacking {

  case class DocIn(source: String, doc_id: Long, n: Long)

  /** One packed document: its token slot in the shard's concatenation. */
  case class PackedDoc(source: String, doc_id: Long, n: Long,
      start: Long, end: Long, seq_id: Long, straddles: Boolean)

  val DefaultB = 256L // tokens per training sequence, matching q88

  /** Annotate a (possibly streaming) documents frame with packing slots.
    * Tokenless docs are dropped (they occupy no tokens — q88's rule). */
  def packStream(docs: DataFrame, textCol: String = "text",
      b: Long = DefaultB): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("source"), col("doc_id"),
        TextOps.tokenCount(col(textCol)).cast("long").as("n"))
      .where(col("n") > 0)
      .as[DocIn]
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[DocIn], state: GroupState[Long]) =>
          var end = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val start = end
            end = start + d.n
            PackedDoc(src, d.doc_id, d.n, start, end,
              start / b, (end - 1) / b > start / b)
          }
          state.update(end)
          out.iterator
      }
  }
}
