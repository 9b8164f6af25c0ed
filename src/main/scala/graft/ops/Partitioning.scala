package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism hygiene for compute-heavy scans. */
object Partitioning {
  /** Heavy per-row compute (shingling, sketching, decode) must not inherit a
    * narrow scan: a single parquet row group = a single task, serializing the
    * whole operator. Spread to the session's parallelism when the source is
    * narrower — at real scale (many files/row groups) this is a no-op and
    * costs nothing. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Two-step check. inputFiles is metadata-only (the relation's cached
    // file listing), so use it as a free pre-filter: many files ⇒ many
    // splits ⇒ nothing to do. Few (or zero: in-memory frames) files does
    // NOT imply few tasks — Spark splits large parquet files by
    // maxPartitionBytes — so only then consult the planned partition
    // count (df.rdd, which forces physical planning; acceptable on the
    // rare narrow path) before paying for a full repartition shuffle.
    val files = df.inputFiles.length
    val narrow = (files == 0 || files < target) && df.rdd.getNumPartitions < target
    if (narrow) df.repartition(target) else df
  }
}
