package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extended relational coverage beyond the reference's own operator set —
  * the Catalyst built-ins SURVEY §2.4 declares (set ops, outer/semi/cross
  * joins, grouping sets, cube, analytic windows, scalar families,
  * statistical aggregates), each DuckDB-oracled. */
object ExtendedQueries {
  import ContractQueries.table

  // q35 — cross join (theta-join family).
  def q35(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "region").select(col("r_name"))
      .crossJoin(table(spark, dir, "nation").select(col("n_name")))
      .orderBy("r_name", "n_name")

  // q36 — full outer join.
  def q36(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "full_outer")
      .select(when(col("c_custkey").isNull, "order_only")
        .when(col("o_orderkey").isNull, "cust_only")
        .otherwise("matched").as("side"))
      .groupBy("side").agg(count(lit(1)).as("n"))
      .orderBy("side")

  // q37 — semi join (EXISTS).
  def q37(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("has_order"))

  // q38 — grouping sets (via Catalyst SQL — the declared GROUPING SETS surface).
  def q38(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "orders").createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  // q39 — cube.
  def q39(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  // q40 — analytic windows: lag + rank over the events stream.
  def q40(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    table(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        round(lag(col("value"), 1).over(w), 4).as("prev_v"),
        rank().over(w).as("rnk"))
      .orderBy("user_id", "event_id")
      .limit(500)
  }

  // q41 — math scalar family.
  def q41(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_quantity")), 4).as("s"),
        round(log(col("l_extendedprice")), 4).as("l"),
        round(abs(col("l_discount") - 0.05), 4).as("a"),
        pmod(col("l_orderkey"), lit(7)).as("m"))
      .orderBy("l_orderkey", "l_linenumber")
      .limit(500)

  // q42 — string scalar family (beyond q14).
  def q42(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_brand")).as("b"),
        trim(col("p_name")).as("t"),
        regexp_replace(col("p_type"), " ", "_").as("r"),
        col("p_name").contains("green").as("g"))
      .orderBy("p_partkey")
      .limit(100)

  // q43 — date part extraction + agg.
  def q43(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"))
      .orderBy("y", "m")

  // q44 — EXCEPT set op.
  def q44(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer").select(col("c_nationkey").as("k"))
      .except(table(spark, dir, "supplier").select(col("s_nationkey").as("k")))
      .orderBy("k")

  // q45 — statistical aggregates.
  def q45(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd"),
        round(var_samp(col("l_discount")), 4).as("v"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("c"))
      .orderBy("l_returnflag")

  /** q71 — unpivot/melt: wide numeric lineitem columns to (metric, value)
    * rows, profiled per metric with order-insensitive aggregates. */
  def q71(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .unpivot(Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "metric", "value")
      .groupBy("metric")
      .agg(count(lit(1)).as("n"),
        round(min(col("value")), 4).as("min_v"),
        round(max(col("value")), 4).as("max_v"))
      .orderBy("metric")

  /** q74 — distribution window functions (ntile / percent_rank / cume_dist /
    * first+last value over a running frame): the remaining standard window
    * verbs, on a totally-ordered window (value, then event_id) so every
    * function is tie-deterministic across engines. */
  def q74(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("value"), col("event_id"))
    val run = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    table(spark, dir, "events")
      .where(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd"),
        first(col("event_id")).over(run).as("first_ev"),
        last(col("event_id")).over(run).as("last_ev"))
      .orderBy("user_id", "event_id")
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q71_unpivot_metrics" -> (q71 _),
    "q74_dist_windows" -> (q74 _),
    "q35_cross_join" -> (q35 _),
    "q36_full_outer_join" -> (q36 _),
    "q37_semi_join" -> (q37 _),
    "q38_grouping_sets" -> (q38 _),
    "q39_cube" -> (q39 _),
    "q40_lag_rank_window" -> (q40 _),
    "q41_math_scalar" -> (q41 _),
    "q42_string_funcs" -> (q42 _),
    "q43_date_extract" -> (q43 _),
    "q44_except" -> (q44 _),
    "q45_stats_agg" -> (q45 _)
  )

  val oracles: Map[String, String] = Map(
    "q74_dist_windows" ->
      ("SELECT user_id, event_id, " +
        "ntile(4) OVER w AS quartile, " +
        "ROUND(percent_rank() OVER w, 4) AS pr, " +
        "ROUND(cume_dist() OVER w, 4) AS cd, " +
        "first_value(event_id) OVER wr AS first_ev, " +
        "last_value(event_id) OVER wr AS last_ev " +
        "FROM events WHERE user_id < 20 " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id), " +
        "wr AS (PARTITION BY user_id ORDER BY value, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "ORDER BY user_id, event_id"),
    "q71_unpivot_metrics" ->
      ("SELECT metric, count(*) AS n, ROUND(MIN(value), 4) AS min_v, ROUND(MAX(value), 4) AS max_v " +
        "FROM (UNPIVOT (SELECT l_orderkey, l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem) " +
        "ON l_quantity, l_extendedprice, l_discount, l_tax INTO NAME metric VALUE value) " +
        "GROUP BY metric ORDER BY metric"),
    "q35_cross_join" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name",
    "q36_full_outer_join" ->
      "SELECT CASE WHEN c_custkey IS NULL THEN 'order_only' WHEN o_orderkey IS NULL THEN 'cust_only' ELSE 'matched' END AS side, count(*) AS n FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey GROUP BY side ORDER BY side",
    "q37_semi_join" ->
      "SELECT count(*) AS has_order FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
    "q38_grouping_sets" ->
      "SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority)) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    "q39_cube" ->
      "SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    "q40_lag_rank_window" ->
      "SELECT user_id, event_id, ROUND(LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS prev_v, RANK() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rnk FROM events ORDER BY user_id, event_id LIMIT 500",
    "q41_math_scalar" ->
      "SELECT l_orderkey, l_linenumber, ROUND(SQRT(l_quantity), 4) AS s, ROUND(LN(l_extendedprice), 4) AS l, ROUND(ABS(l_discount - 0.05), 4) AS a, l_orderkey % 7 AS m FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500",
    "q42_string_funcs" ->
      "SELECT p_partkey, UPPER(p_brand) AS b, TRIM(p_name) AS t, REPLACE(p_type, ' ', '_') AS r, p_name LIKE '%green%' AS g FROM part ORDER BY p_partkey LIMIT 100",
    "q43_date_extract" ->
      "SELECT EXTRACT(YEAR FROM o_orderdate) AS y, EXTRACT(MONTH FROM o_orderdate) AS m, count(*) AS n FROM orders GROUP BY y, m ORDER BY y, m",
    "q44_except" ->
      "SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY k",
    "q45_stats_agg" ->
      "SELECT l_returnflag, ROUND(STDDEV_SAMP(l_quantity), 4) AS sd, ROUND(VAR_SAMP(l_discount), 4) AS v, ROUND(CORR(l_quantity, l_extendedprice), 4) AS c FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
  )
}
