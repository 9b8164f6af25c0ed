package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: space-filling-curve (Z-order/Morton) clustering.
  *
  * At 100 TB the dominant read cost is how much of the table a query must
  * scan; co-locating rows that are close in SEVERAL dimensions at once
  * (user × time, parent × child, key × day) lets min/max file statistics
  * prune multi-predicate scans the way a single-column sort only can for
  * its leading column. Z-ordering does that with plain Spark primitives:
  * interleave the bits of the (range-normalized) dimensions into one Morton
  * key, then `repartitionByRange` + in-partition sort on it before the
  * write — every expression here is codegen'd arithmetic, and the key is
  * engine-portable (the q69 oracle recomputes it in SQL).
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative longs:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1 (a 2·bits-bit
    * key). Statically unrolled — shift distances are Scala constants — so
    * the whole key is one codegen'd arithmetic expression, no UDF. */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Cluster a frame for writing: range-partition on the Morton key of the
    * two dimension columns and sort within partitions, so downstream
    * per-file min/max statistics stay tight on BOTH dimensions. The key
    * column is dropped — layout is a storage property, not data. */
  def zorderRepartition(df: DataFrame, x: Column, y: Column,
      partitions: Int, bits: Int = 16): DataFrame =
    df.withColumn("_z", zorder2(x, y, bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")

  /** Write `df` as a bucketed+sorted table: rows hash-partition into
    * `buckets` files per partition by `key`, pre-sorted on it. Two tables
    * bucketed the same way equi-join WITHOUT any shuffle or sort — the
    * exchange that dominates fact-fact joins at 100 TB disappears because
    * co-location was paid once at write time (BucketingSpec asserts the
    * zero-Exchange plan). Bucketing metadata lives in the session catalog,
    * so readers must go through `spark.table(name)`. */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(name)
}
