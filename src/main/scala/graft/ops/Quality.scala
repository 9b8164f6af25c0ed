package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — declarative per-table rules evaluated in ONE
  * scan (plus one narrow aggregation for uniqueness rules), reporting a
  * violation count per rule. The dbt/Great-Expectations verb a pipeline
  * gate needs before publishing a table: at 100 TB the whole report costs a
  * single pass because every row rule is a SUM(CASE) over the same scan,
  * and uniqueness reduces to a count-distinct-style aggregation on the key
  * columns only.
  */
object Quality {

  sealed trait Rule { def name: String }
  /** Violated where `pred` is false or null. */
  final case class RowRule(name: String, pred: Column) extends Rule
  /** Violated rows = rows beyond the first per duplicate key group. */
  final case class UniqueRule(name: String, keys: Seq[String]) extends Rule
  /** Violated rows = rows whose (fully non-null) key has no match in
    * `parent` — standard SQL FK semantics: null keys are not violations
    * (notNull is its own rule). */
  final case class RefRule(name: String, childKeys: Seq[String],
      parent: DataFrame, parentKeys: Seq[String]) extends Rule

  def notNull(c: String): Rule = RowRule(s"not_null($c)", col(c).isNotNull)
  def inRange(c: String, lo: Double, hi: Double): Rule =
    RowRule(s"range($c)", col(c).between(lo, hi))
  def unique(keys: String*): Rule = UniqueRule(s"unique(${keys.mkString(",")})", keys)
  def refIntegrity(childKeys: Seq[String], parent: DataFrame,
      parentKeys: Seq[String]): Rule =
    RefRule(s"ref(${childKeys.mkString(",")})", childKeys, parent, parentKeys)

  /** Violation report: one row per rule — (rule, violations, total_rows).
    * All RowRules evaluate in a single aggregation over one scan; each
    * UniqueRule adds one (keys → count) aggregation that shuffles only the
    * key columns. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val rowRules = rules.collect { case r: RowRule => r }
    val uniqueRules = rules.collect { case r: UniqueRule => r }
    val refRules = rules.collect { case r: RefRule => r }
    val rowReport =
      if (rowRules.isEmpty) None
      else Some(df.agg(
        count(lit(1)).as("_total"),
        rowRules.map(r =>
          // coalesce: sum over zero rows is null — an empty table must read
          // as 0 violations (passing), matching the unique-rule branch
          coalesce(sum(when(coalesce(r.pred, lit(false)), 0L).otherwise(1L)), lit(0L))
            .as(r.name)): _*)
        .select(explode(map(rowRules.flatMap(r =>
          Seq(lit(r.name), col(r.name))): _*)).as(Seq("rule", "violations")),
          col("_total").as("total_rows")))
    val uniqueReports = uniqueRules.map { r =>
      val dups = df.groupBy(r.keys.map(col): _*).agg(count(lit(1)).as("_n"))
        .agg(coalesce(sum(col("_n") - 1), lit(0L)).as("violations"),
          coalesce(sum(col("_n")), lit(0L)).as("total_rows"))
      dups.select(lit(r.name).as("rule"), col("violations"), col("total_rows"))
    }
    // each RefRule: one key-only anti join. The parent side reduces to its
    // DISTINCT keys first (|key domain| rows — broadcastable for dimension
    // tables, AQE-splittable otherwise); the child ships key columns only.
    val refReports = refRules.map { r =>
      require(r.childKeys.length == r.parentKeys.length,
        s"${r.name}: child/parent key arity mismatch")
      val p = r.parent.select(r.parentKeys.map(col): _*)
        .toDF(r.childKeys: _*).distinct()
      val viol = df
        .where(r.childKeys.map(col(_).isNotNull).reduce(_ && _))
        .select(r.childKeys.map(col): _*)
        .join(p, r.childKeys, "left_anti")
        .agg(count(lit(1)).as("violations"))
      viol.crossJoin(df.agg(count(lit(1)).as("total_rows")))
        .select(lit(r.name).as("rule"), col("violations"), col("total_rows"))
    }
    (rowReport.toSeq ++ uniqueReports ++ refReports).reduce(_ unionByName _)
  }
}
