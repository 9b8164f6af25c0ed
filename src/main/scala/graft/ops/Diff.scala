package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot comparison — the change-data verb of a batch pipeline: given
  * two snapshots of one logical table, classify every key as added /
  * removed / changed / unchanged. One full-outer join on the key; change
  * detection compares a single content digest per side instead of every
  * column pairwise, so the comparison cost is one hash per row regardless
  * of schema width, and wide rows never widen the join output.
  */
object Diff {

  /** Per-key classification of `next` vs `prev`. Both frames must contain
    * `key` plus the compared columns `cols` (order matters — the digest is
    * computed over `cols` as given). Returns (key, change) with change in
    * {added, removed, changed, unchanged}. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "snapshotDiff needs at least one compared column")
    // 128-bit digest pair (same witness construction as exact dedup): a
    // changed row misclassified as unchanged needs a 2^-128 double collision
    def digested(df: DataFrame, d: String, w: String) = df.select(col(key),
      xxhash64(struct(cols.map(col): _*)).as(d),
      xxhash64(lit(0x9E3779B9L), struct(cols.map(col): _*)).as(w))
    digested(prev, "_dp", "_wp")
      .join(digested(next, "_dn", "_wn"), Seq(key), "full_outer")
      .select(col(key),
        when(col("_dp").isNull, "added")
          .when(col("_dn").isNull, "removed")
          .when(col("_dp") === col("_dn") && col("_wp") === col("_wn"), "unchanged")
          .otherwise("changed").as("change"))
  }
}
