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
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
