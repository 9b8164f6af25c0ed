package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concentration / inequality profiling over a (unit, weight) relation —
  * the skew-profile verb: before choosing a partitioning, salt, or per-key
  * cap at scale, you measure how unequally the weight (degree, token
  * frequency, bytes per key) is distributed. Reports, per group: unit
  * count, total weight, max weight, the Gini coefficient, and the share of
  * weight held by the top 1% of units — all in integer basis points with a
  * single truncating division per metric, so the numbers are hash-exact
  * cross-engine.
  *
  * Shape: the unit relation collapses FIRST to (group, weight, n_units)
  * — every window below runs over ≤ |distinct weights| rows per group,
  * never over units, so a billion-key profile costs one aggregate plus
  * windows over the (typically tiny) weight histogram.
  *
  * Gini over grouped data: with weight values sorted ascending and units
  * ranked 1..n, Gini = (2·Σᵢ i·wᵢ − (n+1)·Σwᵢ) / (n·Σwᵢ). A value group of
  * `cnt` units whose `cum` units precede it contributes
  * w·(cnt·cum + cnt·(cnt+1)/2) to Σᵢ i·wᵢ (consecutive-rank arithmetic
  * series — tie order inside the group cannot matter because the weights
  * are equal). Integer-exact; the one division happens at basis-point
  * rendering. Overflow bound: Σᵢ i·wᵢ ≤ n·T, so the ×10000 rendering needs
  * n·T < 4.6e14 (e.g. 10M units × 10M total weight) — widen to Decimal
  * past that.
  *
  * Top-1% share: k = ceil(n/100) units; descending weight groups contribute
  * min(cnt, k − cum_desc_before)·w (ties split pro-rata by unit count —
  * deterministic, no per-unit ordering needed).
  */
object Concentration {

  /** `units`: one row per unit with `groupCols` and an integral `wCol`
    * (weight ≥ 1). Returns one row per group: n_units, total_w, max_w,
    * gini_bp, top1pct_bp. */
  def profile(units: DataFrame, groupCols: Seq[String], wCol: String): DataFrame = {
    val g = groupCols.map(col)
    val hist = units.groupBy(g :+ col(wCol).as("_w"): _*)
      .agg(count(lit(1)).as("_cnt"))
    val asc = Window.partitionBy(g: _*).orderBy(col("_w").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val desc = Window.partitionBy(g: _*).orderBy(col("_w").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("_cum_asc", coalesce(sum("_cnt").over(asc), lit(0L)))
      .withColumn("_cum_desc", coalesce(sum("_cnt").over(desc), lit(0L)))
      .groupBy(g: _*)
      .agg(sum("_cnt").as("n_units"),
        sum(col("_w") * col("_cnt")).as("total_w"),
        max("_w").as("max_w"),
        sum(expr("_w * (_cnt * _cum_asc + (_cnt * (_cnt + 1)) div 2)")).as("_s"),
        // the top-k contribution needs k = ceil(n/100), known only after
        // the group total — carry the histogram back through a struct
        // (bounded: one entry per DISTINCT weight value, not per unit)
        collect_list(struct(col("_w"), col("_cnt"), col("_cum_desc"))).as("_h"))
      .withColumn("_k", expr("(n_units + 99) div 100"))
      .withColumn("_top", aggregate(col("_h"), lit(0L),
        (acc, e) => acc + e.getField("_w") *
          greatest(lit(0L), least(e.getField("_cnt"),
            col("_k") - e.getField("_cum_desc")))))
      .select(g ++ Seq(col("n_units"), col("total_w"), col("max_w"),
        expr("((2 * _s - (n_units + 1) * total_w) * 10000) div (n_units * total_w)")
          .as("gini_bp"),
        expr("(_top * 10000) div total_w").as("top1pct_bp")): _*)
  }
}
