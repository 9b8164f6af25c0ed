package graft.streaming

import graft.ops.Layout
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming epoch-order continuation — the always-on counterpart of the
  * q100 batch resume: as document shards arrive, each micro-batch is
  * assigned the NEXT contiguous block of global training positions,
  * surviving restarts AND micro-batch replays.
  *
  * Why not `flatMapGroupsWithState`: a single global sequence has a single
  * group, which would funnel every row through one task — exactly the
  * single-partition window [[Layout.globalSequence]] exists to avoid.
  * Instead each micro-batch runs the fully distributed two-pass ranking,
  * and the only cross-batch state is a ledger of `(batch_id, start, end)`
  * offset rows in parquet — one row per micro-batch, read on the driver
  * (the bounded-model exception; compact it on the same cadence as
  * checkpoint cleanup).
  *
  * Replay semantics, stated honestly: Structured Streaming re-delivers a
  * micro-batch after a crash with the SAME batch id. The ledger makes the
  * assignment idempotent — a replayed id re-reads its recorded start
  * offset and hands out the IDENTICAL positions (ranking within a batch is
  * deterministic in `keys` order), so the sink can overwrite-by-batch-id
  * and the sequence stays gapless with no double-assignment. A batch id
  * never seen before starts at the ledger's max end offset.
  */
object StreamingSequence {

  private val LedgerSchema = "batch_id BIGINT, start_off BIGINT, end_off BIGINT"

  private[streaming] def readLedger(
      spark: SparkSession, path: String): Seq[(Long, Long, Long)] = {
    // fs.exists probe, not exception-catching: a missing path's exception
    // class is session-history-dependent (see Layout.loadSequenceOffset)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else spark.read.schema(LedgerSchema).parquet(path)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  private def appendLedger(spark: SparkSession, path: String,
      batchId: Long, start: Long, end: Long): Unit = {
    import spark.implicits._
    Seq((batchId, start, end)).toDF("batch_id", "start_off", "end_off")
      .coalesce(1).write.mode("append").parquet(path)
  }

  /** Assign `batchId`'s block of positions to `batch` through the ledger:
    * a known id re-reads its recorded start (identical positions on
    * replay); a fresh id starts at the ledger's max end and records
    * itself. The per-batch ranking is [[Layout.globalSequenceWithCount]],
    * fully distributed. */
  private[graft] def assignBatch(batch: DataFrame, keys: Seq[Column],
      ledgerPath: String, batchId: Long, posName: String = "pos",
      partitions: Int = 0): DataFrame =
    assignBatchHandle(batch, keys, ledgerPath, batchId, posName, partitions)._1

  /** [[assignBatch]] plus the cached frame backing the ranking, so the
    * per-micro-batch loop can unpersist it — an always-on stream must not
    * accumulate one cached copy per processed batch. */
  private def assignBatchHandle(batch: DataFrame, keys: Seq[Column],
      ledgerPath: String, batchId: Long, posName: String = "pos",
      partitions: Int = 0): (DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    val ledger = readLedger(spark, ledgerPath)
    val (seq, total, handle) =
      Layout.globalSequenceHandle(batch, keys, posName, partitions)
    val start = ledger.find(_._1 == batchId) match {
      case Some((_, s, _)) => s // replayed batch: same positions again
      case None =>
        val s = ledger.foldLeft(0L)((acc, r) => math.max(acc, r._3))
        appendLedger(spark, ledgerPath, batchId, s, s + total)
        s
    }
    (seq.withColumn(posName, col(posName) + lit(start)), handle)
  }

  /** Start a stream that hands each micro-batch to `sink` with a `posName`
    * column carrying its contiguous block of global positions (1-based
    * across the whole stream, `keys`-ordered within the batch). `ledgerPath`
    * holds the offset ledger; pair it with a checkpointLocation on the
    * returned query for end-to-end restart safety. */
  def resumeEachBatch(docs: DataFrame, keys: Seq[Column], ledgerPath: String,
      posName: String = "pos", partitions: Int = 0)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val (assigned, handle) = assignBatchHandle(batch.toDF(), keys,
          ledgerPath, batchId, posName, partitions)
        // unpersist per batch: an always-on stream would otherwise leave
        // one cached copy of every processed micro-batch in executor
        // storage until eviction/OOM
        try sink(assigned, batchId) finally handle.unpersist()
      }
      .start()
}
