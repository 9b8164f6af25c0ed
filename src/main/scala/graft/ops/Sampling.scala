package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators.
  *
  * Training pipelines need split assignment and downsampling that are
  * STABLE — re-running the pipeline (or running it on another engine) must
  * put every document in the same split, or train/test contamination creeps
  * in across dataset versions. Randomness is therefore derived from the
  * content itself: md5(salt ++ value) — and decisions compare the hex prefix
  * LEXICALLY (hex digits order '0'<'9'<'a'<'f' numerically), which every
  * engine reproduces byte-for-byte, so a DuckDB oracle can replay the exact
  * assignment. All expressions are built-in Catalyst functions — one
  * codegen'd projection, no shuffle, no RNG state.
  */
object Sampling {

  /** First 4 hex chars of md5(salt ++ value) — a uniform deterministic
    * bucket label in '0000'..'ffff' (65536 buckets, compared lexically). */
  def hashKey(value: Column, salt: String = ""): Column =
    substring(md5(encode(concat(lit(salt), value), "UTF-8")), 1, 4)

  /** Hex threshold for a cumulative fraction, or None when the rounded
    * value reaches 65536: no 4-char hex key exists at or above that point,
    * and formatting it would yield the 5-char '10000', which compares
    * lexically BELOW most 4-char keys ('ffff' > '10000') — a match-all
    * fraction would silently keep ~6% of rows. None means "matches every
    * key" and callers must special-case it. */
  private def hexThreshold(cum: Double): Option[String] = {
    val t = (cum * 65536).round
    if (t >= 65536L) None else Some(f"$t%04x")
  }

  /** Deterministic split assignment. `weights` are (name, fraction) in
    * declaration order, summing to 1.0 — e.g. ("train",0.8) :: ("val",0.1)
    * :: ("test",0.1). Equal inputs land in equal splits, forever. */
  def hashSplit(value: Column, weights: Seq[(String, Double)],
      salt: String = ""): Column = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1.0: $weights")
    val key = hashKey(value, salt)
    var cum = 0.0
    val bounded = weights.init.map { case (name, w) =>
      cum += w
      (name, hexThreshold(cum))
    }
    bounded.foldRight(lit(weights.last._1): Column) {
      // A saturated threshold absorbs every remaining key: later splits
      // (necessarily zero-weight) get nothing, matching their fraction.
      case ((name, None), _)        => lit(name)
      case ((name, Some(hi)), rest) => when(key < lit(hi), lit(name)).otherwise(rest)
    }
  }

  /** Deterministic Bernoulli-style sample predicate: keeps ~fraction of
    * rows, always the same ones. */
  def sampledBy(value: Column, fraction: Double, salt: String = ""): Column =
    hexThreshold({ require(fraction >= 0.0 && fraction <= 1.0); fraction }) match {
      case None     => lit(true) // fraction ~1.0: keep everything
      case Some(hi) => hashKey(value, salt) < lit(hi)
    }

  /** Stratified deterministic sampling: each stratum keeps its own fraction
    * (the per-language / per-source downsampling of a corpus mix). Rows in
    * strata not listed are dropped. Same content-hash stability as
    * sampledBy — one codegen'd predicate, no shuffle, no RNG state. */
  def stratifiedKeep(strata: Column, value: Column,
      fractions: Seq[(String, Double)], salt: String = ""): Column =
    fractions.foldLeft(lit(false)) { case (acc, (s, f)) =>
      when(strata === lit(s), sampledBy(value, f, salt)).otherwise(acc)
    }

  /** Per-key quota: keep the first `quota` rows of each key by a
    * deterministic order (the per-domain document cap of a crawl pipeline).
    * One shuffle on the key; ranking stays inside the window stage. */
  def quotaPerKey(df: org.apache.spark.sql.DataFrame, keyCol: String,
      orderCol: String, quota: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(orderCol)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= quota).drop("_rn")
  }

  /** Skew-safe per-key quota for UNIQUE integral order keys: the same rows
    * as [[quotaPerKey]], without the per-key sort.
    *
    * `quotaPerKey`'s window puts EVERY row of a key into one task and sorts
    * it there — at crawl scale a power-law hot domain (90% of the corpus
    * behind one key) serializes the whole job behind a single sorting task,
    * and a window is the one shape AQE cannot split. This variant never
    * ranks: a bounded-state bottom-k aggregation (O(quota) per group,
    * map-side partial aggregation pre-reduces the hot key inside each input
    * partition, so only ~|partitions| sketches of size ≤ quota shuffle per
    * key) computes each key's quota-th smallest order value, and one join
    * filters `order ≤ threshold`. The threshold relation is |keys| rows —
    * broadcastable for any realistic domain count, and when it does have to
    * shuffle, the join (unlike the window) is AQE-skew-splittable.
    *
    * Preconditions, checked by the caller, not enforceable here: `orderCol`
    * must be long-castable and UNIQUE within each key (a deterministic
    * "first K" needs a total order anyway — same requirement quotaPerKey's
    * determinism already imposes) and non-null (null-order rows, which the
    * window variant ranks first, are dropped here). Null KEYS are preserved
    * (null-safe join), matching the window's null-key group. */
  def quotaPerKeyAgg(df: org.apache.spark.sql.DataFrame, keyCol: String,
      orderCol: String, quota: Int): org.apache.spark.sql.DataFrame = {
    require(quota > 0, s"quota must be positive: $quota")
    val ord = col(orderCol).cast("long")
    val thr = df.where(ord.isNotNull)
      .groupBy(col(keyCol).as("_qk"))
      .agg(graft.expr.BottomKSketch.bottomK(ord, quota).as("_bk"))
      // the sketch holds the ≤ quota smallest order values; its last element
      // is the quota-th smallest (or the key's max when the group is small)
      .select(col("_qk"), element_at(col("_bk"), size(col("_bk"))).as("_qthr"))
    df.join(thr, col(keyCol) <=> col("_qk"))
      .where(ord <= col("_qthr"))
      .drop("_qk", "_qthr")
  }

  /** A single fraction's threshold as a SQL literal (None = saturated:
    * render as TRUE), for oracle construction. */
  private[graft] def thresholdFor(fraction: Double): Option[String] =
    hexThreshold(fraction)

  /** The same thresholds as SQL literals, for oracle construction.
    * None mirrors hexThreshold's saturation: render as TRUE in SQL. */
  private[graft] def thresholdsFor(weights: Seq[(String, Double)]): Seq[(String, Option[String])] = {
    var cum = 0.0
    weights.init.map { case (name, w) => cum += w; (name, hexThreshold(cum)) }
  }
}
