package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The declared relational contract surface (SURVEY.md §2.5, Q1-Q20): one
  * query per operator family of the reference's inventory, expressed with the
  * DataFrame API so Catalyst plans them (pushdown, pruning, partial agg,
  * broadcast joins), each hash-checked against DuckDB by the driver.
  *
  * Conventions:
  *  - every computed column is aliased identically to the oracle SQL (the
  *    driver sorts columns by name before hashing);
  *  - ORDER BY matches the oracle's canonical ordering;
  *  - floating aggregates ROUND(·,4).
  *
  * Scale posture: dimension joins (nation, region, supplier-sized) are
  * broadcast; fact-fact joins shuffle on their equi keys and rely on AQE for
  * skew/coalescing. Filters/projections are pure Catalyst expressions so they
  * push into the Parquet scan.
  */
object ContractQueries {

  /** Parquet tables are read per-call; Catalyst prunes columns/filters.
    *
    * `events.ts` has shipped as both TIMESTAMP(NANOS) (older testdata
    * generations — Spark's reader rejects it, so we keep the legacy
    * nanos-as-long conf on) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (current generation — Spark reads TIMESTAMP_NTZ). All ts arithmetic
    * goes through [[tsMicros]]/[[tsDay]], which branch on the engine-side
    * dtype, so either generation yields the same micros DuckDB's
    * `epoch_us(ts)` sees. TestdataSchemaSpec pins the dtypes this relies on. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events.ts → micros since epoch (== DuckDB `epoch_us(ts)` under the
    * pinned UTC session TZ), robust to both testdata generations: long nanos
    * (integer DIV — double division would lose precision on int64 nanos) and
    * TIMESTAMP_NTZ/LTZ micros (NTZ needs the cast: NTZ→BIGINT is not a legal
    * cast, and `unix_micros` takes LTZ only). */
  def tsMicros(events: DataFrame): Column = events.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => expr("ts DIV 1000")
    case _ => unix_micros(col("ts").cast("timestamp"))
  }

  /** events.ts (UTC) → DateType day bucket, same dual-generation contract. */
  private def tsDay(events: DataFrame): Column =
    events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        to_date(timestamp_micros(expr("ts DIV 1000")))
      case _ => to_date(col("ts"))
    }

  // Q1 — scan + projection (P1-P3, P7): column pruning must reach the scan.
  def q01(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  // Q2 — filter/predicate (P4-P6): timestamp between, pushed to Parquet.
  def q02(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .where(col("l_shipdate").between(
        lit("1994-01-01 00:00:00").cast("timestamp"),
        lit("1994-12-31 23:59:59").cast("timestamp")))
      .agg(count(lit(1)).as("n"))

  // Q3 — hash aggregation partial+final (P13).
  def q03(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("qty"))
      .orderBy("l_returnflag", "l_linestatus")

  // Q4 — distinct/dedup (P11).
  def q04(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select("o_orderstatus", "o_orderpriority").distinct()
      .orderBy("o_orderstatus", "o_orderpriority")

  // Q5 — equi inner join (M1 family): nation is tiny → broadcast.
  def q05(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(broadcast(table(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
      .orderBy("n_name")

  // Q6 — left outer join (M1).
  def q06(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .join(table(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"), "left_outer")
      .groupBy("o_orderstatus").agg(count(col("l_orderkey")).as("matched"))
      .orderBy("o_orderstatus")

  // Q7 — anti join (NOT EXISTS → left_anti).
  def q07(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("no_order_cust"))

  // Q8 — multi-way join + agg (graph-edge analogue of the link pipeline).
  // The oracle's correlated scalar subquery on o_orderkey (a key) is exactly
  // an equi join lineitem→orders; dimensions broadcast.
  def q08(spark: SparkSession, dir: String): DataFrame = {
    val nation = table(spark, dir, "nation")
    table(spark, dir, "lineitem")
      .join(broadcast(table(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(table(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(table(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("nk1"), col("n_name").as("parent"))),
        col("s_nationkey") === col("nk1"))
      .join(broadcast(nation.select(col("n_nationkey").as("nk2"), col("n_name").as("child"))),
        col("c_nationkey") === col("nk2"))
      .groupBy("parent", "child").agg(count(lit(1)).as("call_count"))
      .orderBy("parent", "child")
  }

  // Q9 — conditional pivot agg (M2 family).
  def q09(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy("user_id")
      .agg(
        max(when(col("event_type") === "click", col("value"))).as("click_v"),
        max(when(col("event_type") === "view", col("value"))).as("view_v"),
        count(lit(1)).as("n"))
      .orderBy("user_id")
      .limit(100)

  // Q10 — rollup/grouping sets.
  def q10(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  // Q11 — ranking window (the root-span-per-trace idiom).
  def q11(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .where(col("rn") === 1)
      .select("user_id", "event_id")
      .orderBy("user_id")

  // Q12 — analytic window with frame.
  def q12(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        round(sum(col("value")).over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
            .rowsBetween(-2, Window.currentRow)), 4).as("s3"))
      .orderBy("user_id", "event_id")
      .limit(500)

  // Q13 — set ops (INTERSECT).
  def q13(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer").select(col("c_nationkey").as("k"))
      .intersect(table(spark, dir, "supplier").select(col("s_nationkey").as("k")))
      .orderBy("k")

  // Q14 — string scalars (P19).
  def q14(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .select(col("p_partkey"),
        lower(substring(col("p_name"), 1, 8)).as("s"),
        length(col("p_type")).as("n"))
      .orderBy("p_partkey")
      .limit(200)

  // Q15 — date scalar / day bucketing (P18).
  def q15(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    ev.groupBy(tsDay(ev).as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy("day")
  }

  // Q16 — top-k (TakeOrderedAndProject, no full sort at scale).
  def q16(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(25)

  // Q17 — union + agg (re-run idempotency analogue, P16).
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val byStatus = table(spark, dir, "orders")
      .groupBy(col("o_orderstatus").as("k")).agg(count(lit(1)).as("n"))
    byStatus.unionAll(byStatus)
      .groupBy("k").agg(sum("n").as("n"))
      .orderBy("k")
  }

  // Q18 — exact dedup over text (north-star dedup op).
  def q18(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"), countDistinct(col("text")).as("uniq"))
      .orderBy("lang")

  // Q19 — text analysis (length stats).
  def q19(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .groupBy("lang")
      .agg(round(avg("n_chars"), 4).as("avg_chars"), max("n_chars").as("max_chars"))
      .orderBy("lang")

  // Q20 — array/similarity prep (north-star).
  def q20(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .groupBy("label").agg(count(lit(1)).as("n"))
      .orderBy("label")

  /** name → query fn, in contract order. */
  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q01_scan_projection" -> (q01 _),
    "q02_filter_predicate" -> (q02 _),
    "q03_hash_agg" -> (q03 _),
    "q04_distinct" -> (q04 _),
    "q05_equi_join" -> (q05 _),
    "q06_left_outer_join" -> (q06 _),
    "q07_anti_join" -> (q07 _),
    "q08_multiway_join_agg" -> (q08 _),
    "q09_pivot_agg" -> (q09 _),
    "q10_rollup" -> (q10 _),
    "q11_rank_window" -> (q11 _),
    "q12_frame_window" -> (q12 _),
    "q13_set_ops" -> (q13 _),
    "q14_string_scalar" -> (q14 _),
    "q15_date_bucket" -> (q15 _),
    "q16_topk" -> (q16 _),
    "q17_union_agg" -> (q17 _),
    "q18_exact_dedup" -> (q18 _),
    "q19_text_stats" -> (q19 _),
    "q20_embedding_prep" -> (q20 _)
  )

  /** Oracle SQL — verbatim from SURVEY §2.5 (runs on DuckDB over the same
    * parquet tables; column names/aliases match the DataFrame plans above). */
  val oracles: Map[String, String] = Map(
    "q01_scan_projection" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q02_filter_predicate" ->
      "SELECT count(*) AS n FROM lineitem WHERE l_shipdate BETWEEN TIMESTAMP '1994-01-01 00:00:00' AND TIMESTAMP '1994-12-31 23:59:59'",
    "q03_hash_agg" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS n, ROUND(SUM(l_quantity),4) AS qty FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q04_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders ORDER BY o_orderstatus, o_orderpriority",
    "q05_equi_join" ->
      "SELECT n_name, count(*) AS n FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name",
    "q06_left_outer_join" ->
      "SELECT o_orderstatus, count(l_orderkey) AS matched FROM orders LEFT OUTER JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderstatus ORDER BY o_orderstatus",
    "q07_anti_join" ->
      "SELECT count(*) AS no_order_cust FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
    "q08_multiway_join_agg" ->
      "SELECT n1.n_name AS parent, n2.n_name AS child, count(*) AS call_count FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN customer c ON c.c_custkey = (SELECT o_custkey FROM orders WHERE o_orderkey = l_orderkey) JOIN nation n1 ON s_nationkey = n1.n_nationkey JOIN nation n2 ON c.c_nationkey = n2.n_nationkey GROUP BY parent, child ORDER BY parent, child",
    "q09_pivot_agg" ->
      "SELECT user_id, MAX(CASE WHEN event_type='click' THEN value END) AS click_v, MAX(CASE WHEN event_type='view' THEN value END) AS view_v, COUNT(*) AS n FROM events GROUP BY user_id ORDER BY user_id LIMIT 100",
    "q10_rollup" ->
      "SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    "q11_rank_window" ->
      "SELECT user_id, event_id FROM (SELECT user_id, event_id, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events) t WHERE rn = 1 ORDER BY user_id",
    "q12_frame_window" ->
      "SELECT user_id, event_id, ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),4) AS s3 FROM events ORDER BY user_id, event_id LIMIT 500",
    "q13_set_ops" ->
      "SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k",
    "q14_string_scalar" ->
      "SELECT p_partkey, LOWER(SUBSTR(p_name, 1, 8)) AS s, LENGTH(p_type) AS n FROM part ORDER BY p_partkey LIMIT 200",
    "q15_date_bucket" ->
      "SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY day ORDER BY day",
    "q16_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25",
    "q17_union_agg" ->
      "SELECT k, CAST(SUM(n) AS BIGINT) AS n FROM (SELECT o_orderstatus AS k, count(*) AS n FROM orders GROUP BY k UNION ALL SELECT o_orderstatus, count(*) FROM orders GROUP BY o_orderstatus) GROUP BY k ORDER BY k",
    "q18_exact_dedup" ->
      "SELECT lang, count(*) AS docs, count(DISTINCT text) AS uniq FROM documents GROUP BY lang ORDER BY lang",
    "q19_text_stats" ->
      "SELECT lang, ROUND(AVG(n_chars),4) AS avg_chars, MAX(n_chars) AS max_chars FROM documents GROUP BY lang ORDER BY lang",
    "q20_embedding_prep" ->
      "SELECT label, count(*) AS n FROM embeddings GROUP BY label ORDER BY label"
  )
}
