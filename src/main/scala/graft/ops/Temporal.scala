package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators a Spark user reaches for and doesn't find built in:
  * as-of join, range (interval) join, gap sessionization. Each is expressed
  * as a composition of Catalyst operators chosen for its 100 TB shape — no
  * custom physical plan is needed because the right logical shape already
  * exists; the wrong one (a non-equi theta join) is what these helpers avoid.
  */
object Temporal {

  /** Backward as-of join: for every left row, attach the single most recent
    * right row of the same key with `rightTs` <= `leftTs` (ties at equal
    * timestamp include the right row; among equal-timestamp right rows the
    * greatest `rightTieBreak` wins — deterministic). Left rows with no prior
    * right row keep NULLs in the picked columns. `tolerance >= 0` (same
    * units as the timestamp columns, which must then be numeric) drops
    * matches older than `leftTs - tolerance` — the max-staleness bound a
    * feature-lookup join needs.
    *
    * Scale design: the naive formulation is a non-equi join (every left row
    * × every earlier right row of the key) — quadratic per key and planned
    * as a nested-loop. This instead tags both inputs, unions them, and runs
    * ONE running `last(_, ignoreNulls)` window per key: a single shuffle on
    * the key, sort within partitions, O(1) state per row, zero candidate
    * explosion — the canonical distributed as-of shape. Skewed keys cost a
    * sort of their own rows only, and never a pairwise blowup.
    *
    * `rightPick` columns must not collide with left column names (pre-alias
    * on the way in — the caller owns naming).
    */
  def asofJoinPrior(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPick: Seq[String],
      rightTieBreak: String, tolerance: Long = -1L): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, rightPick, rightTieBreak,
      forward = false, tolerance)

  /** Forward as-of join: the mirror — the EARLIEST right row with
    * `rightTs` >= `leftTs` (equal timestamps match; among equal-timestamp
    * right rows the smallest `rightTieBreak` wins). `tolerance >= 0` drops
    * matches beyond `leftTs + tolerance`. Same single-shuffle plan, scanned
    * in reverse time order. */
  def asofJoinNext(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPick: Seq[String],
      rightTieBreak: String, tolerance: Long = -1L): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, rightPick, rightTieBreak,
      forward = true, tolerance)

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPick: Seq[String],
      rightTieBreak: String, forward: Boolean, tolerance: Long): DataFrame = {
    val lCols = left.columns.toSeq
    val lrowType = left.select(struct(lCols.map(col): _*)).schema.head.dataType
    // the match's own timestamp always rides the pick struct (for the
    // tolerance screen); "_rts" is reserved inside the struct only
    val rpStruct = struct(col(rightTs).as("_rts") +: rightPick.map(col): _*)
    val rpType = right.select(rpStruct).schema.head.dataType
    val tieType = right.select(col(rightTieBreak)).schema.head.dataType
    val l = left.select(col(key).as("_k"), col(leftTs).as("_ts"),
      lit(1).as("_side"), lit(null).cast(tieType).as("_tie"),
      struct(lCols.map(col): _*).as("_lrow"),
      lit(null).cast(rpType).as("_rp"))
    val r = right.select(col(key).as("_k"), col(rightTs).as("_ts"),
      lit(0).as("_side"), col(rightTieBreak).as("_tie"),
      lit(null).cast(lrowType).as("_lrow"),
      rpStruct.as("_rp"))
    // right rows sort before left rows at the same timestamp (side 0 < 1),
    // so an equal-ts right row is visible to the left row's running frame.
    // Backward scans time ascending (last seen = max (ts, tie)); forward
    // scans descending (last seen = min (ts, tie) among ts >= leftTs).
    val ord =
      if (forward) Seq(col("_ts").desc, col("_side").asc, col("_tie").desc_nulls_first)
      else Seq(col("_ts").asc, col("_side").asc, col("_tie").asc_nulls_first)
    val w = Window.partitionBy("_k").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("_m", last(col("_rp"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    val inTolerance =
      if (tolerance < 0) col("_m").isNotNull
      else if (forward) col("_m._rts") - col("_ts") <= tolerance
      else col("_ts") - col("_m._rts") <= tolerance
    matched
      .withColumn("_m", when(inTolerance, col("_m"))) // null out stale picks
      .select(lCols.map(c => col(s"_lrow.$c").as(c)) ++
        rightPick.map(c => col(s"_m.$c").as(c)): _*)
  }

  /** Range (interval) join: left rows matched to right intervals containing
    * them (`leftTs` BETWEEN `loCol` AND `hiCol`), via equi-join on a time
    * bucket instead of a non-equi theta join.
    *
    * Scale design: each interval explodes to the buckets it covers; each
    * left row computes its single bucket; the join is then a plain hash
    * equi-join on the bucket key (shuffled or broadcast by Catalyst/AQE as
    * sizes dictate) plus a residual BETWEEN filter. No duplicate elimination
    * is needed — a left row matches an interval in exactly one bucket (its
    * own). Pick `bucketWidth` so intervals span few buckets (fan-out =
    * span/width + 1); wide intervals want a coarser width. Negative
    * timestamps are handled (true floor division, not DIV's
    * truncate-toward-zero). Left and right column names must be disjoint —
    * after the join both sides' columns are in scope, so a shared name would
    * make the BETWEEN residual ambiguous. */
  def bucketedRangeJoin(left: DataFrame, leftTs: String,
      right: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint (alias before joining): " +
        overlap.mkString(", "))
    require(!left.columns.contains("_bk") && !right.columns.contains("_bk"),
      "'_bk' is reserved by bucketedRangeJoin")
    // exact floor division on typed columns (no SQL-text splicing, so odd
    // column names are fine; correct for negative timestamps too): integral
    // `div` truncates toward zero, so shift down one bucket when a negative
    // timestamp has a remainder. Stays in long arithmetic throughout —
    // double division would lose exactness past 2^53.
    def bucket(c: Column): Column = {
      val d = call_function("div", c, lit(bucketWidth))
      when(c % bucketWidth < 0, d - 1).otherwise(d)
    }
    val lb = left.withColumn("_bk", bucket(col(leftTs)))
    val rb = right.withColumn("_bk",
      explode(sequence(bucket(col(loCol)), bucket(col(hiCol)))))
    lb.join(rb, "_bk")
      .where(col(leftTs).between(col(loCol), col(hiCol)))
      .drop("_bk")
  }

  /** Gap-based sessionization: rows of a key whose successive timestamps are
    * within `gap` share a session; a longer silence starts the next one.
    * Adds `session_seq` (1-based per key, in time order). `tieBreak` makes
    * the within-key order total when timestamps collide.
    *
    * One shuffle on the key; the lag and the running sum share the same
    * window sort. The classic lag→break-flag→prefix-sum formulation — at
    * scale the cost is the key shuffle, the same lower bound any
    * sessionization has. */
  def sessionize(df: DataFrame, key: String, tsCol: String, tieBreak: String,
      gap: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tsCol).asc, col(tieBreak).asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_prev", lag(col(tsCol), 1).over(w))
      .withColumn("_brk",
        (col("_prev").isNull || (col(tsCol) - col("_prev")) > gap).cast("long"))
      .withColumn("session_seq", sum(col("_brk")).over(run))
      .drop("_prev", "_brk")
  }
}
