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
    // inputFiles is metadata-only (the relation's cached file listing) —
    // unlike df.rdd, it doesn't force physical planning of the whole frame.
    // One file can still hold many row groups, but the guard exists for the
    // opposite hazard (fewer splits than cores), for which file count is the
    // right signal; non-file frames (in-memory test data) report no files
    // and fall through to the planned-RDD count.
    val files = df.inputFiles.length
    val narrow =
      if (files > 0) files < target
      else df.rdd.getNumPartitions < target
    if (narrow) df.repartition(target) else df
  }
}
