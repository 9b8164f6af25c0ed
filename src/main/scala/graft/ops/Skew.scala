package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for shuffle equi-joins.
  *
  * First-choice tools remain: broadcast the small side (no shuffle at all)
  * and AQE's runtime skew-join splitting (`spark.sql.adaptive.skewJoin`),
  * which handles sort-merge skew transparently. Salting is the remaining
  * case: a shuffled HASH join where one side has pathological hot keys and
  * the other side is too large to broadcast but small enough to replicate
  * `salts`-fold — classic fact-to-mid-size-dim with a power-law key.
  */
object Skew {

  /** Salted equi-join on `key`: each left row gets a deterministic salt in
    * [0, salts) derived from a full-row hash; every right row replicates to
    * all salts; the join runs on (key, salt), spreading a hot key across
    * `salts` reducers instead of serializing on one.
    *
    * Deterministic by construction (content-hash salt, no RNG state), so
    * re-runs shuffle identically. Byte-identical duplicate left rows share
    * a salt — they carry no information to spread. Right-side cost is
    * explicit: `salts`× replication of its shuffle volume; pick the
    * smallest `salts` that flattens the hot reducer.
    *
    * Only left-preserving join types are accepted (inner / left_outer /
    * left_semi / left_anti): the right side is replicated `salts`-fold
    * before the join, so a right- or full-outer variant would emit each
    * unmatched right row once PER SALT — silently wrong. Salt the other
    * side (swap the arguments) for a right-skewed outer join. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val normalized = joinType.toLowerCase.replace("outer", "").replace("_", "").trim
    require(Set("inner", "left", "leftsemi", "semi", "leftanti", "anti")(normalized),
      s"saltedJoin replicates the right side $salts-fold, so only " +
        s"left-preserving join types are correct (inner/left_outer/left_semi/" +
        s"left_anti); got '$joinType'. Swap the sides to salt a right join.")
    val l = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(r, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
